package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import Dsl._

/** The PRERATING stage's core semantics — the reference's other named
  * pipeline (`prerating.sh:14`; SURVEY.md:34-36 "CDR normalization/
  * guiding before rating"): every CDR's dialed/served number is first
  * CANONICALIZED to one E.164 form (international `+CC…`, `00CC…`,
  * national `0…` and bare forms all collapse to the same digit string),
  * then GUIDED — resolved to the owning subscriber/account through the
  * number-plan dimension, a table of allocated number RANGES
  * (`range_start ≤ number ≤ range_end`). Only after guiding does a CDR
  * know whose invoice it belongs on; rating (`gsmrating.sh:14`) consumes
  * the guided stream.
  *
  * Both operators honor the never-drop contract (q195): a number that
  * cannot normalize, or normalizes but matches no range, KEEPS its row
  * with a NULL canonical/account and a machine-readable `reason` code —
  * unguided traffic is a revenue-assurance finding, not a row to lose.
  */
object PreratingQ {

  /** Separators tolerated inside a dialed string (spaces, dots, dashes,
    * parens, slashes — what switches and humans actually emit). */
  private val Separators = "[ .\\-()/]"

  /** MSISDN canonicalization — collapse the four wire forms of one
    * number into a single international digit string:
    *
    *   `+CCnnn…`   → `CCnnn…`   (explicit international)
    *   `00CCnnn…`  → `CCnnn…`   (international dial prefix)
    *   `0nnn…`     → `<defaultCc>nnn…` (national form with trunk zero)
    *   `nnn…`      → `<defaultCc>nnn…` when `bareIsNational` (the
    *                 per-feed nature-of-address default; a feed whose
    *                 bare numbers are already international sets false)
    *
    * Non-normalizable numbers keep their row with `canonical = NULL`
    * and a reason code, checked in this order: `empty` (nothing left
    * after separator stripping), `bad_chars` (a non-digit beyond an
    * optional leading `+`), `too_short` / `too_long` (canonical form
    * outside [8, 15] digits — 15 is the E.164 ceiling).
    *
    * Plan: pure map-side column work (regex strip + CASE) — appends
    * `canonical` and `reason` to the input and touches nothing else, so
    * it fuses into whatever scan precedes it under whole-stage codegen.
    */
  def normalizeMsisdn(df: DataFrame, numCol: String = "raw_number",
      defaultCc: String = "49", bareIsNational: Boolean = true): DataFrame = {
    require(defaultCc.matches("[1-9][0-9]{0,2}"),
      s"defaultCc must be a 1-3 digit country code, got '$defaultCc'")
    val clean = regexp_replace(col(numCol), Separators, "")
    val withClean = df.withColumn("__clean", clean)
    val c = col("__clean")
    val bare = if (bareIsNational) concat(lit(defaultCc), c) else c
    val cand =
      when(c.startsWith("+"), substring(c, 2, 1000))
        .when(c.startsWith("00"), substring(c, 3, 1000))
        .when(c.startsWith("0"), concat(lit(defaultCc), substring(c, 2, 1000)))
        .otherwise(bare)
    withClean
      .withColumn("__cand", cand)
      .withColumn("reason",
        when(c.isNull || c === "", "empty")
          .when(!c.rlike("^\\+?[0-9]+$"), "bad_chars")
          .when(length(col("__cand")) < 8, "too_short")
          .when(length(col("__cand")) > 15, "too_long"))
      .withColumn("canonical",
        when(col("reason").isNull, col("__cand")))
      .drop("__clean", "__cand")
  }

  /** SQL twin of [[normalizeMsisdn]] (DuckDB): given an expression `raw`
    * yielding the raw number, emits a pair of SELECT-able expressions
    * for (canonical, reason) via a `clean` binding the caller CTEs in. */
  private[graft] def normalizeSql(clean: String, defaultCc: String)
      : (String, String) = {
    val cand = s"""CASE
        WHEN starts_with($clean, '+') THEN substr($clean, 2)
        WHEN starts_with($clean, '00') THEN substr($clean, 3)
        WHEN starts_with($clean, '0') THEN '$defaultCc' || substr($clean, 2)
        ELSE '$defaultCc' || $clean END"""
    val reason = s"""CASE
        WHEN $clean IS NULL OR $clean = '' THEN 'empty'
        WHEN NOT regexp_matches($clean, '^\\+?[0-9]+$$') THEN 'bad_chars'
        WHEN length($cand) < 8 THEN 'too_short'
        WHEN length($cand) > 15 THEN 'too_long' END"""
    (cand, reason)
  }

  /** Guiding — resolve each canonical number to its subscriber/account
    * through the number-plan dimension `ranges` (`range_start`,
    * `range_end` as inclusive numeric bounds, plus the payload columns
    * to attach — account_id, operator, …). Unmatched numbers keep NULL
    * payload and reason `unguided`; rows that already failed
    * normalization keep their earlier reason.
    *
    * Plan: NOT the naive `BETWEEN` theta join (calls × ranges under a
    * nested loop) — the dimension is bucketized PER WIDTH CLASS instead
    * (the q256 per-prefix-length cascade discipline): ranges group by
    * ceil-log2 of their width (exact integer arithmetic — `bin()`
    * length, no float hazards), each class gets its own bucket width
    * W = 2^class so every range spans ≤ 2 of ITS OWN buckets, and the
    * probe side runs one BROADCAST HASH join per class present (ONE
    * bounded dim-grain collect for the class set, ≤ 63 classes ever,
    * one for a uniform plan) with the original between-predicate as
    * residual, coalescing payloads across classes — allocation dims
    * never overlap, so at most one class matches. Zero shuffles on the
    * CDR side at any corpus size. A SINGLE global bucket width would be
    * the widest range in the dim — a real plan mixing one nationwide
    * allocation with millions of small ranges then collapses the dim
    * into a handful of buckets and every CDR probe scans a huge
    * residual candidate list; per-class widths keep each probe's
    * candidate list O(1) for any width mix (GuidingSkewProbe-measured).
    * The oracle replays the naive BETWEEN join, pinning the bucketed
    * cascade to textbook interval semantics.
    *
    * A real number plan is an ALLOCATION — ranges never overlap (a
    * number has one owner). Overlapping or inverted ranges would
    * double-guide (and double-bill) every number they cover, so the dim
    * fails loudly on them: a dim-grain sorted sweep (lag over
    * range_start order — the dimension is bounded, the global sort
    * never sees fact data) raises before any join happens.
    */
  /** Width class of a range: ceil(log2(width)) via the binary-digit
    * count of (width - 1) — exact integer arithmetic (a float log2
    * mis-rounds near power-of-two widths on wide longs), capped at 62
    * so the bucket width 2^class never overflows (a capped range spans
    * ≤ 3 buckets instead of ≤ 2 — the explode handles either). */
  private def widthClass: Column =
    least(length(expr("bin(range_end - range_start)")), lit(62)).cast(IntegerType)

  /** Distinct width classes present in a guarded dim, each with ITS OWN
    * bucket width = the widest range in the class (not the power of two
    * — rounding up to 2^c would double the residual candidate lists on
    * a uniform plan). ONE bounded dim-grain job (≤ 63 rows ever). */
  private def collectClasses(guarded: DataFrame): Seq[(Int, Long)] =
    guarded.groupBy(widthClass.as("c"))
      .agg(max(col("range_end") - col("range_start") + 1L).as("w"))
      .collect().map(r => (r.getInt(0), math.max(1L, r.getLong(1))))
      .sortBy(_._1).toSeq

  /** One per-class cascade step: the class-c dim slice keyed by the
    * class's own `w`-wide buckets (every member spans ≤ 2 of them),
    * broadcast-left-joined to the probe on bucket equality with BETWEEN
    * (+ optional validity) residual; payload and bound columns land
    * class-suffixed for the final coalesce. */
  private def classJoin(probe: DataFrame, guarded: DataFrame, c: Int,
      w: Long, carry: Seq[String],
      residual: (DataFrame, Int) => Column): DataFrame = {
    val slice = guarded.filter(widthClass === c)
      .withColumn("__b", explode(expr(
        s"sequence(range_start DIV ${w}L, range_end DIV ${w}L)")))
      .select(col("__b") +: carry.map(p => col(p).as(s"__${p}_$c")): _*)
    probe.join(broadcast(slice),
      expr(s"__num DIV ${w}L") === col("__b") && residual(probe, c), "left")
      .drop("__b")
  }

  def guideRanges(cdrs: DataFrame, ranges: DataFrame,
      numCol: String = "canonical", keepBounds: Boolean = false)
      : DataFrame = {
    val dimW = Window.orderBy(col("range_start"))
    val guarded = ranges
      .withColumn("__prev_end", lag(col("range_end"), 1).over(dimW))
      .withColumn("range_start",
        when(col("range_end") < col("range_start") ||
            col("__prev_end") >= col("range_start"),
          expr("CAST(raise_error('guideRanges: overlapping or inverted " +
            "number range in dim') AS BIGINT)"))
          .otherwise(col("range_start")))
      .drop("__prev_end")
    // Bounded dim-grain collect: the width classes present and their
    // bucket widths (≤ 63 ever; 1 for a uniform plan). Rides the
    // overlap guard.
    val classes = collectClasses(guarded)
    val payload = ranges.columns.filterNot(
      Set("range_start", "range_end").contains).toSeq
    val carry = Seq("range_start", "range_end") ++ payload
    val outCols = if (keepBounds) carry else payload
    val probe = cdrs.withColumn("__num", col(numCol).cast(LongType))
    val joined =
      if (classes.isEmpty) // empty plan: everything is unguided, typed
        outCols.foldLeft(probe) { (d, p) =>
          d.withColumn(p,
            lit(null).cast(ranges.schema(p).dataType))
        }.drop("__num")
      else {
        val cascaded = classes.foldLeft(probe) { case (d, (c, w)) =>
          classJoin(d, guarded, c, w, carry, (_, cc) =>
            col("__num").between(col(s"__range_start_$cc"),
              col(s"__range_end_$cc")))
        }
        outCols.foldLeft(cascaded) { (d, p) =>
          d.withColumn(p,
            coalesce(classes.map { case (c, _) => col(s"__${p}_$c") }: _*))
        }.drop("__num")
          .drop(classes.flatMap { case (c, _) =>
            carry.map(p => s"__${p}_$c") }: _*)
      }
    val hadReason = cdrs.columns.contains("reason")
    if (hadReason) joined.withColumn("reason",
      coalesce(col("reason"),
        when(col(numCol).isNotNull && col(payload.head).isNull,
          "unguided")))
    else joined.withColumn("reason",
      when(col(numCol).isNotNull && col(payload.head).isNull, "unguided"))
  }

  /** Shared messy-number fixture: eight deterministic wire forms over the
    * events table — four that normalize to the same `49`+9-digit
    * canonical, and one each of too_short / bad_chars / empty /
    * too_long. The 9-digit NSN reuses the q256 dialed-number derivation
    * (pure integer arithmetic both engines replay). */
  private def fixtureRaw(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "events").select(
      col("event_id"),
      expr("CAST(100000000 + (event_id * 7919) % 900000000 AS STRING)")
        .as("__nsn"))
      .withColumn("raw_number",
        when(col("event_id") % 8 === 0, concat(lit("+49"), col("__nsn")))
          .when(col("event_id") % 8 === 1,
            concat(lit("0049-"), col("__nsn")))
          .when(col("event_id") % 8 === 2, concat(lit("0"), col("__nsn")))
          .when(col("event_id") % 8 === 3, col("__nsn"))
          .when(col("event_id") % 8 === 4,
            concat(lit("+49"), substring(col("__nsn"), 1, 4)))
          .when(col("event_id") % 8 === 5,
            concat(lit("+49"), col("__nsn"), lit("X")))
          .when(col("event_id") % 8 === 6, lit(""))
          .otherwise(concat(lit("+49"), col("__nsn"), col("__nsn"))))
      .drop("__nsn")

  private val fixtureRawSql =
    """SELECT event_id,
        CASE
          WHEN event_id % 8 = 0 THEN '+49' || nsn
          WHEN event_id % 8 = 1 THEN '0049-' || nsn
          WHEN event_id % 8 = 2 THEN '0' || nsn
          WHEN event_id % 8 = 3 THEN nsn
          WHEN event_id % 8 = 4 THEN '+49' || substr(nsn, 1, 4)
          WHEN event_id % 8 = 5 THEN '+49' || nsn || 'X'
          WHEN event_id % 8 = 6 THEN ''
          ELSE '+49' || nsn || nsn END AS raw_number
      FROM (SELECT event_id,
          CAST(100000000 + (event_id * 7919) % 900000000 AS VARCHAR) AS nsn
        FROM events)"""

  /** Oracle fixture of [[normalizeMsisdn]]: the eight-form fixture
    * through the canonicalizer — every row survives, reasons land
    * exactly on the four malformed forms. */
  private val q263 = GQuery(
    "q263_msisdn_normalize",
    (s, dir) => normalizeMsisdn(fixtureRaw(s, dir))
      .select(col("event_id"), col("raw_number"), col("canonical"),
        col("reason"))
      .orderBy(col("event_id")),
    Some {
      val (cand, reason) = normalizeSql("clean", "49")
      s"""WITH raw AS ($fixtureRawSql),
        c AS (SELECT event_id, raw_number,
            regexp_replace(raw_number, '[ .\\-()/]', '', 'g') AS clean
          FROM raw),
        n AS (SELECT event_id, raw_number, $cand AS cand, $reason AS reason
          FROM c)
        SELECT event_id, raw_number,
          CASE WHEN reason IS NULL THEN cand END AS canonical, reason
        FROM n ORDER BY event_id"""
    })

  /** Oracle fixture of [[guideRanges]] composed after the normalizer —
    * the full prerating card: 225 two-million-number allocations cover
    * half the canonical space (so ~half the normalizable traffic guides
    * and the rest exercises `unguided`), payload carries the account and
    * operator. The oracle replays guiding as the naive BETWEEN join. */
  private val q264 = GQuery(
    "q264_number_guiding",
    (s, dir) => {
      val ranges = s.range(0L, 225L).toDF("r").select(
        (lit(49100000000L) + col("r") * 4000000L).as("range_start"),
        (lit(49100000000L) + col("r") * 4000000L + 1999999L)
          .as("range_end"),
        (lit(1000L) + col("r")).as("account_id"),
        concat(lit("OP"), (col("r") % 5L).cast(StringType)).as("operator"))
      guideRanges(normalizeMsisdn(fixtureRaw(s, dir)), ranges)
        .select(col("event_id"), col("raw_number"), col("canonical"),
          col("account_id"), col("operator"), col("reason"))
        .orderBy(col("event_id"))
    },
    Some {
      val (cand, reason) = normalizeSql("clean", "49")
      s"""WITH raw AS ($fixtureRawSql),
        c AS (SELECT event_id, raw_number,
            regexp_replace(raw_number, '[ .\\-()/]', '', 'g') AS clean
          FROM raw),
        n AS (SELECT event_id, raw_number, $cand AS cand, $reason AS reason
          FROM c),
        norm AS (SELECT event_id, raw_number,
            CASE WHEN reason IS NULL THEN cand END AS canonical, reason
          FROM n),
        ranges AS (SELECT
            49100000000 + r * 4000000 AS range_start,
            49100000000 + r * 4000000 + 1999999 AS range_end,
            1000 + r AS account_id,
            'OP' || CAST(r % 5 AS VARCHAR) AS operator
          FROM UNNEST(generate_series(0, 224)) AS u(r))
        SELECT m.event_id, m.raw_number, m.canonical,
          CAST(g.account_id AS BIGINT) AS account_id, g.operator,
          COALESCE(m.reason, CASE WHEN m.canonical IS NOT NULL
            AND g.account_id IS NULL THEN 'unguided' END) AS reason
        FROM norm m LEFT JOIN ranges g
          ON CAST(m.canonical AS BIGINT) BETWEEN g.range_start AND g.range_end
        ORDER BY m.event_id"""
    })

  /** Number-plan utilization audit — the card the numbering authority
    * (and every porting/capacity process) asks for: per allocated
    * range, how much of it the observed traffic actually uses.
    * Per range: owning account, allocation size, calls, DISTINCT
    * numbers seen, utilization ppm (distinct/size), plus one
    * `__unallocated__` row carrying the traffic that guided nowhere —
    * dark traffic is a misallocation finding, never a dropped row.
    *
    * Plan: the [[guideRanges]] broadcast lookup (zero CDR-side
    * shuffles) + ONE hash aggregation at range grain with a distinct
    * count (two-phase partial agg — the only exchange is range-grain).
    */
  def rangeUtilization(cdrs: DataFrame, ranges: DataFrame,
      numCol: String = "canonical"): DataFrame =
    guideRanges(cdrs, ranges, numCol, keepBounds = true)
      .groupBy(coalesce(col("range_start").cast(StringType),
          lit("__unallocated__")).as("range_key"))
      .agg(
        max(col("account_id")).as("account_id"),
        max(col("range_end") - col("range_start") + 1L).as("range_size"),
        count(lit(1)).as("n_calls"),
        countDistinct(col(numCol)).as("n_numbers"))
      .withColumn("util_ppm",
        when(col("range_size").isNotNull,
          expr("(1000000 * n_numbers) DIV range_size")))

  /** Oracle fixture of [[rangeUtilization]]: the q264 plan and fixture
    * traffic; the oracle replays guiding as the naive BETWEEN join. */
  private val q268 = GQuery(
    "q268_range_utilization",
    (s, dir) => {
      val ranges = s.range(0L, 225L).toDF("r").select(
        (lit(49100000000L) + col("r") * 4000000L).as("range_start"),
        (lit(49100000000L) + col("r") * 4000000L + 1999999L)
          .as("range_end"),
        (lit(1000L) + col("r")).as("account_id"))
      rangeUtilization(
        normalizeMsisdn(fixtureRaw(s, dir)).filter(col("canonical").isNotNull),
        ranges)
        .orderBy(col("range_key"))
    },
    Some {
      val (cand, reason) = normalizeSql("clean", "49")
      s"""WITH raw AS ($fixtureRawSql),
        c AS (SELECT event_id, raw_number,
            regexp_replace(raw_number, '[ .\\-()/]', '', 'g') AS clean
          FROM raw),
        n AS (SELECT event_id, $cand AS cand, $reason AS reason FROM c),
        norm AS (SELECT event_id,
            CASE WHEN reason IS NULL THEN cand END AS canonical
          FROM n),
        traffic AS (SELECT * FROM norm WHERE canonical IS NOT NULL),
        ranges AS (SELECT
            49100000000 + r * 4000000 AS range_start,
            49100000000 + r * 4000000 + 1999999 AS range_end,
            1000 + r AS account_id
          FROM UNNEST(generate_series(0, 224)) AS u(r)),
        g AS (SELECT t.canonical, r.range_start, r.range_end, r.account_id
          FROM traffic t LEFT JOIN ranges r
            ON CAST(t.canonical AS BIGINT)
               BETWEEN r.range_start AND r.range_end)
        SELECT COALESCE(CAST(range_start AS VARCHAR), '__unallocated__')
            AS range_key,
          CAST(MAX(account_id) AS BIGINT) AS account_id,
          CAST(MAX(range_end - range_start + 1) AS BIGINT) AS range_size,
          COUNT(*) AS n_calls,
          CAST(COUNT(DISTINCT canonical) AS BIGINT) AS n_numbers,
          CAST(CASE WHEN MAX(range_end) IS NOT NULL
            THEN (1000000 * COUNT(DISTINCT canonical))
                 // MAX(range_end - range_start + 1) END AS BIGINT)
            AS util_ppm
        FROM g GROUP BY 1 ORDER BY range_key"""
    })

  /** Guiding with NUMBER PORTABILITY — the refinement every live
    * number plan needs: a ported number belongs to its NEW operator,
    * not to the range it was born in, so the ported-numbers dimension
    * (exact number → account) OVERRIDES range guiding. Resolution
    * order: ported exact match wins, then the native range, then
    * `unguided` — and `guide_src` records which path resolved each CDR
    * (the audit column a porting dispute reads first).
    *
    * Plan: one BROADCAST exact-match hash join (the ported dim) + the
    * [[guideRanges]] bucketized broadcast lookup — still zero CDR-side
    * shuffles; the range join only fills rows porting left unresolved
    * (cheap coalesce, not a second pass). */
  def guideWithPorting(cdrs: DataFrame, ranges: DataFrame,
      ported: DataFrame, numCol: String = "canonical"): DataFrame = {
    // a number ported twice in the dim would fan out (and double-bill)
    // every CDR it matches — fail loudly, same contract as the range
    // overlap guard (dim-grain window, never fact-sized)
    val dupW = Window.partitionBy(col("number"))
    val p = ported
      .withColumn("__dup", count(lit(1)).over(dupW))
      .withColumn("number",
        when(col("__dup") > 1L, expr(
          "CAST(raise_error('guideWithPorting: duplicate ported number " +
            "in dim') AS STRING)"))
          .otherwise(col("number")))
      .select(col("number").as("__pnum"), col("account_id").as("__pacct"))
    val ranged = guideRanges(cdrs, ranges, numCol)
      .withColumnRenamed("account_id", "__racct")
    ranged
      .join(broadcast(p), col(numCol) === col("__pnum"), "left")
      .withColumn("account_id", coalesce(col("__pacct"), col("__racct")))
      .withColumn("guide_src",
        when(col("__pacct").isNotNull, "ported")
          .when(col("__racct").isNotNull, "range"))
      .withColumn("reason",
        when(col("account_id").isNotNull, lit(null).cast(StringType))
          .otherwise(col("reason")))
      .drop("__pnum", "__pacct", "__racct")
  }

  /** Oracle fixture of [[guideWithPorting]]: the q264 plan + a ported
    * dim built from every 16th fixture number mapped to a porting
    * account block (9000 + id%100) — so numbers that WOULD range-guide
    * provably resolve to their ported owner instead, and some
    * otherwise-unguided numbers become guided via porting. */
  private val q272 = GQuery(
    "q272_ported_guiding",
    (s, dir) => {
      val ranges = s.range(0L, 225L).toDF("r").select(
        (lit(49100000000L) + col("r") * 4000000L).as("range_start"),
        (lit(49100000000L) + col("r") * 4000000L + 1999999L)
          .as("range_end"),
        (lit(1000L) + col("r")).as("account_id"))
      val ported = normalizeMsisdn(fixtureRaw(s, dir))
        .filter(col("event_id") % 16L === 0L && col("canonical").isNotNull)
        .select(col("canonical").as("number"),
          (lit(9000L) + col("event_id") % 100L).as("account_id"))
        .distinct()
      guideWithPorting(normalizeMsisdn(fixtureRaw(s, dir)), ranges, ported)
        .select(col("event_id"), col("canonical"), col("account_id"),
          col("guide_src"), col("reason"))
        .orderBy(col("event_id"))
    },
    Some {
      val (cand, reason) = normalizeSql("clean", "49")
      s"""WITH raw AS ($fixtureRawSql),
        c AS (SELECT event_id, raw_number,
            regexp_replace(raw_number, '[ .\\-()/]', '', 'g') AS clean
          FROM raw),
        n AS (SELECT event_id, $cand AS cand, $reason AS reason FROM c),
        norm AS (SELECT event_id,
            CASE WHEN reason IS NULL THEN cand END AS canonical, reason
          FROM n),
        ranges AS (SELECT
            49100000000 + r * 4000000 AS range_start,
            49100000000 + r * 4000000 + 1999999 AS range_end,
            1000 + r AS account_id
          FROM UNNEST(generate_series(0, 224)) AS u(r)),
        ported AS (SELECT DISTINCT canonical AS number,
            9000 + event_id % 100 AS account_id
          FROM norm WHERE event_id % 16 = 0 AND canonical IS NOT NULL)
        SELECT m.event_id, m.canonical,
          CAST(COALESCE(p.account_id, r.account_id) AS BIGINT)
            AS account_id,
          CASE WHEN p.account_id IS NOT NULL THEN 'ported'
            WHEN r.account_id IS NOT NULL THEN 'range' END AS guide_src,
          CASE WHEN COALESCE(p.account_id, r.account_id) IS NOT NULL
            THEN NULL
            ELSE COALESCE(m.reason, CASE WHEN m.canonical IS NOT NULL
              THEN 'unguided' END) END AS reason
        FROM norm m
        LEFT JOIN ranges r
          ON CAST(m.canonical AS BIGINT)
             BETWEEN r.range_start AND r.range_end
        LEFT JOIN ported p ON p.number = m.canonical
        ORDER BY m.event_id"""
    })

  /** VERSIONED guiding — the production form of [[guideRanges]]: number
    * allocations change owners over time (ports, operator mergers,
    * re-allocations), so a historical re-rating run must resolve each
    * CDR against the number plan AS OF the call's own time. The
    * dimension carries half-open validity windows
    * `[valid_from_sec, valid_to_sec)` beside the number bounds; a CDR
    * guides to the row whose NUMBER range contains its canonical AND
    * whose validity contains its `secCol`.
    *
    * Plan: the same per-width-class bucketized BROADCAST cascade as
    * [[guideRanges]] (bucket on number per class, residual on BETWEEN +
    * validity) — zero CDR-side shuffles at any width mix. The
    * no-double-guide guard generalizes: two dim rows may overlap in
    * NUMBER space only if DISJOINT in time. Checked dim-grain BEFORE
    * any fact is touched by [[validateVersionedDim]]; a live caller
    * resolving the dim per micro-batch validates ONCE PER DIM VERSION
    * (the [[graft.streaming.VersionedDim]] store does exactly that) and
    * passes `preValidated = true`, so the two guard jobs are never paid
    * per trigger for a dim that didn't change.
    */
  def guideRangesVersioned(cdrs: DataFrame, ranges: DataFrame,
      numCol: String = "canonical", secCol: String = "sec",
      preValidated: Boolean = false): DataFrame = {
    val dimCols = Seq("range_start", "range_end", "valid_from_sec",
      "valid_to_sec")
    val checked = if (preValidated) ranges else validateVersionedDim(ranges)
    val classes = collectClasses(checked)
    val payload = ranges.columns.filterNot(dimCols.toSet.contains).toSeq
    val carry = dimCols ++ payload
    val probe = cdrs.withColumn("__num", col(numCol).cast(LongType))
    val joined =
      if (classes.isEmpty)
        payload.foldLeft(probe) { (d, p) =>
          d.withColumn(p, lit(null).cast(ranges.schema(p).dataType))
        }.drop("__num")
      else {
        val cascaded = classes.foldLeft(probe) { case (d, (c, w)) =>
          classJoin(d, checked, c, w, carry, (_, cc) =>
            col("__num").between(col(s"__range_start_$cc"),
              col(s"__range_end_$cc")) &&
              col(secCol) >= col(s"__valid_from_sec_$cc") &&
              col(secCol) < col(s"__valid_to_sec_$cc"))
        }
        payload.foldLeft(cascaded) { (d, p) =>
          d.withColumn(p,
            coalesce(classes.map { case (c, _) => col(s"__${p}_$c") }: _*))
        }.drop("__num")
          .drop(classes.flatMap { case (c, _) =>
            carry.map(p => s"__${p}_$c") }: _*)
      }
    val hadReason = cdrs.columns.contains("reason")
    if (hadReason) joined.withColumn("reason",
      coalesce(col("reason"),
        when(col(numCol).isNotNull && col(payload.head).isNull,
          "unguided")))
    else joined.withColumn("reason",
      when(col(numCol).isNotNull && col(payload.head).isNull, "unguided"))
  }

  /** EAGER dim-grain integrity check for a versioned number plan — a
    * number+time double coverage would double-guide (and double-bill)
    * every CDR it matches, so it fails HERE, before any fact is
    * touched. Returns the dim with the lazy inverted-window guard
    * attached (rides every downstream read).
    *
    * Checks (both bounded by the dimension, never fact-sized):
    *  - exact duplicates: a grouped count over the four interval
    *    columns;
    *  - overlapping distinct pairs: a PER-WIDTH-CLASS bucketized dim
    *    self-join — for each class c present, every range of class ≤ c
    *    (width ≤ the class's bucket width, so the explode is ≤ 2 buckets
    *    per range — a WIDER range exploded at a narrow class would
    *    materialize a multi-GB bucket sequence) joins the class-c slice,
    *    so a pair of SMALL ranges is only ever compared at a small bucket
    *    width
    *    (under a single global width, one nationwide allocation would
    *    collapse 50k small ranges into a handful of buckets and the
    *    self-join would go quadratic). Every overlapping pair shares a
    *    bucket at the wider member's class, so none escapes; duplicate
    *    sightings across classes are harmless (the check is an
    *    existence test).
    *
    * Cost: two Spark jobs. Pay it once per dim VERSION (cache the
    * verdict), not per batch — [[graft.streaming.VersionedDim]] does. */
  def validateVersionedDim(ranges: DataFrame): DataFrame = {
    val dimCols = Seq("range_start", "range_end", "valid_from_sec",
      "valid_to_sec")
    // inverted windows fail loudly (lazy, rides every downstream read)
    val checked = ranges.withColumn("range_start",
      when(col("range_end") < col("range_start") ||
          col("valid_to_sec") <= col("valid_from_sec"),
        expr("CAST(raise_error('guideRangesVersioned: inverted number " +
          "or validity range in dim') AS BIGINT)"))
        .otherwise(col("range_start")))
    val classes = collectClasses(checked)
    val dupes = checked.groupBy(dimCols.map(col): _*)
      .agg(count(lit(1)).as("n")).filter(col("n") > 1L)
    val conflictSlices = classes.map { case (c, w) =>
      def keyed(pre: String, df: DataFrame) = df
        .withColumn("__b", explode(expr(
          s"sequence(range_start DIV ${w}L, range_end DIV ${w}L)")))
        .select(col("__b") +: dimCols.map(x => col(x).as(s"$pre$x")): _*)
      // a-side restricted to ranges NO WIDER than this class (width ≤ w,
      // since a class-c' ≤ c range has width ≤ max width of class c ≤ w):
      // every such range spans ≤ 2 of the class's buckets, so the explode
      // stays bounded even when the dim mixes a nationwide allocation
      // with single-number entries — exploding ALL ranges at a narrow
      // class's width would materialize a multi-GB sequence for the wide
      // range. Completeness holds: an overlapping pair shares a bucket
      // at the WIDER member's class, where the narrower one is a-side.
      keyed("a_", checked.filter(widthClass <= c))
        .join(keyed("b_", checked.filter(widthClass === c)), Seq("__b"))
        .filter(struct(dimCols.map(x => col(s"a_$x")): _*) =!=
            struct(dimCols.map(x => col(s"b_$x")): _*) &&
          col("a_range_start") <= col("b_range_end") &&
          col("b_range_start") <= col("a_range_end") &&
          col("a_valid_from_sec") < col("b_valid_to_sec") &&
          col("b_valid_from_sec") < col("a_valid_to_sec"))
    }
    val noConflicts = conflictSlices.isEmpty ||
      conflictSlices.reduce(_ union _).isEmpty
    require(dupes.isEmpty && noConflicts,
      "guideRangesVersioned: number+time double coverage in the dim")
    checked
  }

  /** Oracle fixture of [[guideRangesVersioned]]: the q264 plan split
    * into two validity ERAS at a fixed boundary (2024-02-01 UTC) — the
    * same number guides to account 1000+r before the boundary and to
    * 20000+r after (a bulk re-allocation), so the validity residual is
    * provably load-bearing. The oracle replays the naive
    * BETWEEN × validity join. */
  private val q279 = GQuery(
    "q279_versioned_guiding",
    (s, dir) => {
      val mid = 1706745600L // 2024-02-01T00:00:00Z
      val eras = s.range(0L, 225L).toDF("r")
        .withColumn("era", explode(expr("sequence(0, 1)")))
        .select(
          (lit(49100000000L) + col("r") * 4000000L).as("range_start"),
          (lit(49100000000L) + col("r") * 4000000L + 1999999L)
            .as("range_end"),
          when(col("era") === 0, lit(0L)).otherwise(lit(mid))
            .as("valid_from_sec"),
          when(col("era") === 0, lit(mid)).otherwise(lit(4102444800L))
            .as("valid_to_sec"),
          when(col("era") === 0, lit(1000L) + col("r"))
            .otherwise(lit(20000L) + col("r")).as("account_id"))
      val cdrs = normalizeMsisdn(fixtureRaw(s, dir))
        .join(t(s, dir, "events").select(col("event_id"),
          col("ts").cast(LongType).as("sec")), Seq("event_id"))
      guideRangesVersioned(cdrs, eras)
        .select(col("event_id"), col("canonical"), col("sec"),
          col("account_id"), col("reason"))
        .orderBy(col("event_id"))
    },
    Some {
      val (cand, reason) = normalizeSql("clean", "49")
      s"""WITH raw AS ($fixtureRawSql),
        c AS (SELECT event_id, raw_number,
            regexp_replace(raw_number, '[ .\\-()/]', '', 'g') AS clean
          FROM raw),
        n AS (SELECT event_id, $cand AS cand, $reason AS reason FROM c),
        norm AS (SELECT event_id,
            CASE WHEN reason IS NULL THEN cand END AS canonical, reason
          FROM n),
        cdrs AS (SELECT m.event_id, m.canonical, m.reason,
            ${epochSecSql("e.ts")} AS sec
          FROM norm m JOIN events e ON e.event_id = m.event_id),
        eras AS (SELECT
            49100000000 + r * 4000000 AS range_start,
            49100000000 + r * 4000000 + 1999999 AS range_end,
            CASE WHEN era = 0 THEN 0 ELSE 1706745600 END AS valid_from_sec,
            CASE WHEN era = 0 THEN 1706745600 ELSE 4102444800 END
              AS valid_to_sec,
            CASE WHEN era = 0 THEN 1000 + r ELSE 20000 + r END
              AS account_id
          FROM (SELECT r, UNNEST(generate_series(0, 1)) AS era
            FROM UNNEST(generate_series(0, 224)) AS u(r)))
        SELECT m.event_id, m.canonical, m.sec,
          CAST(g.account_id AS BIGINT) AS account_id,
          COALESCE(m.reason, CASE WHEN m.canonical IS NOT NULL
            AND g.account_id IS NULL THEN 'unguided' END) AS reason
        FROM cdrs m LEFT JOIN eras g
          ON CAST(m.canonical AS BIGINT)
             BETWEEN g.range_start AND g.range_end
          AND m.sec >= g.valid_from_sec AND m.sec < g.valid_to_sec
        ORDER BY m.event_id"""
    })

  /** Oracle fixture of [[guideRanges]] on a MIXED-WIDTH plan — the
    * data shape that breaks single-global-width bucketization: one
    * "nationwide" 5×10^8-wide allocation (width class 29) next to 2000
    * small 10^5-wide ranges (class 17), disjoint, with gaps so all
    * three verdicts (nationwide, small, unguided) carry traffic. Under
    * a global bucket width the small ranges would collapse into a
    * handful of nationwide-sized buckets; the per-class cascade keeps
    * both classes O(1) per probe. The oracle replays the naive BETWEEN
    * join — same textbook semantics either way. */
  private val q280 = GQuery(
    "q280_mixed_width_guiding",
    (s, dir) => {
      val small = s.range(0L, 2000L).toDF("r").select(
        (lit(49100000000L) + col("r") * 200000L).as("range_start"),
        (lit(49100000000L) + col("r") * 200000L + 99999L).as("range_end"),
        (lit(1000L) + col("r")).as("account_id"))
      val nationwide = s.range(0L, 1L).toDF("r").select(
        lit(49500000000L).as("range_start"),
        lit(49999999999L).as("range_end"),
        lit(1L).as("account_id"))
      guideRanges(normalizeMsisdn(fixtureRaw(s, dir)),
        small.union(nationwide))
        .select(col("event_id"), col("canonical"), col("account_id"),
          col("reason"))
        .orderBy(col("event_id"))
    },
    Some {
      val (cand, reason) = normalizeSql("clean", "49")
      s"""WITH raw AS ($fixtureRawSql),
        c AS (SELECT event_id, raw_number,
            regexp_replace(raw_number, '[ .\\-()/]', '', 'g') AS clean
          FROM raw),
        n AS (SELECT event_id, $cand AS cand, $reason AS reason FROM c),
        norm AS (SELECT event_id,
            CASE WHEN reason IS NULL THEN cand END AS canonical, reason
          FROM n),
        ranges AS (SELECT
            49100000000 + r * 200000 AS range_start,
            49100000000 + r * 200000 + 99999 AS range_end,
            1000 + r AS account_id
          FROM UNNEST(generate_series(0, 1999)) AS u(r)
          UNION ALL
          SELECT 49500000000, 49999999999, 1)
        SELECT m.event_id, m.canonical,
          CAST(g.account_id AS BIGINT) AS account_id,
          COALESCE(m.reason, CASE WHEN m.canonical IS NOT NULL
            AND g.account_id IS NULL THEN 'unguided' END) AS reason
        FROM norm m LEFT JOIN ranges g
          ON CAST(m.canonical AS BIGINT)
             BETWEEN g.range_start AND g.range_end
        ORDER BY m.event_id"""
    })

  /** Number-plan version diff — the porting-day audit between two
    * committed dim versions (what [[graft.streaming.VersionedDim]]
    * stores): per allocation, who owned it before, who owns it now, and
    * the verdict — `retained` (same owner), `ported` (owner changed),
    * `allocated` (new in v2), `returned` (gone in v2). This is the
    * report a regulator or a porting dispute asks for after a bulk
    * re-allocation, and the sanity gate an operator runs BEFORE
    * publishing a new version (an unexpectedly large `ported` count is
    * a fat-fingered load).
    *
    * Plan: dim-grain only — one full-outer hash join on the range
    * bounds. Fact data never enters. */
  def guidingVersionDiff(oldPlan: DataFrame, newPlan: DataFrame)
      : DataFrame = {
    val a = oldPlan.select(col("range_start"), col("range_end"),
      col("account_id").as("old_account"))
    val b = newPlan.select(col("range_start"), col("range_end"),
      col("account_id").as("new_account"))
    a.join(b, Seq("range_start", "range_end"), "full")
      .withColumn("verdict",
        when(col("old_account").isNull, "allocated")
          .when(col("new_account").isNull, "returned")
          .when(col("old_account") === col("new_account"), "retained")
          .otherwise("ported"))
  }

  /** Oracle fixture of [[guidingVersionDiff]]: v1 = the q264 plan;
    * v2 drops every 10th range (returned), re-owns every 3rd (ported),
    * and adds 25 fresh allocations above the old space (allocated) —
    * all four verdicts carry rows. */
  private val q282 = GQuery(
    "q282_guiding_version_diff",
    (s, dir) => {
      val v1 = s.range(0L, 225L).toDF("r").select(
        (lit(49100000000L) + col("r") * 4000000L).as("range_start"),
        (lit(49100000000L) + col("r") * 4000000L + 1999999L)
          .as("range_end"),
        (lit(1000L) + col("r")).as("account_id"))
      val v2 = s.range(0L, 250L).toDF("r")
        .filter(col("r") % 10L =!= 9L || col("r") >= 225L)
        .select(
          (lit(49100000000L) + col("r") * 4000000L).as("range_start"),
          (lit(49100000000L) + col("r") * 4000000L + 1999999L)
            .as("range_end"),
          when(col("r") % 3L === 0L && col("r") < 225L,
            lit(30000L) + col("r"))
            .otherwise(lit(1000L) + col("r")).as("account_id"))
      guidingVersionDiff(v1, v2).orderBy(col("range_start"))
    },
    Some("""WITH v1 AS (SELECT
          49100000000 + r * 4000000 AS range_start,
          49100000000 + r * 4000000 + 1999999 AS range_end,
          1000 + r AS account_id
        FROM UNNEST(generate_series(0, 224)) AS u(r)),
      v2 AS (SELECT
          49100000000 + r * 4000000 AS range_start,
          49100000000 + r * 4000000 + 1999999 AS range_end,
          CASE WHEN r % 3 = 0 AND r < 225 THEN 30000 + r
            ELSE 1000 + r END AS account_id
        FROM UNNEST(generate_series(0, 249)) AS u(r)
        WHERE r % 10 <> 9 OR r >= 225)
      SELECT COALESCE(a.range_start, b.range_start) AS range_start,
        COALESCE(a.range_end, b.range_end) AS range_end,
        CAST(a.account_id AS BIGINT) AS old_account,
        CAST(b.account_id AS BIGINT) AS new_account,
        CASE WHEN a.account_id IS NULL THEN 'allocated'
          WHEN b.account_id IS NULL THEN 'returned'
          WHEN a.account_id = b.account_id THEN 'retained'
          ELSE 'ported' END AS verdict
      FROM v1 a FULL JOIN v2 b
        ON a.range_start = b.range_start AND a.range_end = b.range_end
      ORDER BY range_start"""))

  /** Prefix-preserving MSISDN pseudonymization — the privacy operator a
    * CDR export runs before data leaves the billing domain (research,
    * vendor tickets, LLM training corpora): every number maps to a
    * same-length pseudonym, deterministically under an integer key, such
    * that
    *  - the first `keepDigits` digits pass through (CC+NDC stay real, so
    *    route/destination analytics still work on the export),
    *  - the map is PREFIX-PRESERVING: numbers sharing an original
    *    prefix share the pseudonym prefix exactly that far (block-level
    *    structure survives — range utilization, LPM and guiding studies
    *    run unchanged on pseudonyms), and
    *  - the map is injective: at the first differing original digit the
    *    per-position shifts coincide and the digits differ, so
    *    pseudonyms differ (no two subscribers collapse).
    * Each position's shift is keyed on the ORIGINAL preceding prefix —
    * `(prefix_value · key + i) mod 10` — pure integer arithmetic, no
    * hash functions, replayable by any engine. NOT cryptography: it
    * resists casual re-identification, not a keyed adversary with the
    * code (a production export would swap the shift for an HMAC per
    * prefix — same plan, one expression).
    *
    * NULL canonicals (unnormalizable rows) keep NULL pseudonyms and
    * their reason codes — never-drop. Plan: one map-side higher-order
    * expression (transform + array_join over ≤ 15 positions), zero
    * shuffles, fuses into the surrounding scan under codegen. */
  def pseudonymizeMsisdn(cdrs: DataFrame, numCol: String = "canonical",
      keepDigits: Int = 4, key: Long = 7919L): DataFrame = {
    require(keepDigits >= 1 && keepDigits <= 15,
      s"keepDigits must be in [1, 15], got $keepDigits")
    cdrs.withColumn("pseudonym", expr(
      s"""array_join(transform(sequence(1, length($numCol)), i ->
        CASE WHEN i <= $keepDigits THEN substr($numCol, i, 1)
        ELSE CAST((CAST(substr($numCol, i, 1) AS INT) +
          CAST((CAST(substr($numCol, 1, i - 1) AS BIGINT) * ${key}L + i)
            % 10 AS INT)) % 10 AS STRING) END), '')"""))
  }

  /** Oracle fixture of [[pseudonymizeMsisdn]]: the eight-form messy
    * fixture normalized then pseudonymized (keep 4, key 7919) — the
    * four malformed forms keep NULL pseudonyms with their reasons. */
  private val q283 = GQuery(
    "q283_msisdn_pseudonymize",
    (s, dir) => pseudonymizeMsisdn(normalizeMsisdn(fixtureRaw(s, dir)))
      .select(col("event_id"), col("canonical"), col("pseudonym"),
        col("reason"))
      .orderBy(col("event_id")),
    Some {
      val (cand, reason) = normalizeSql("clean", "49")
      s"""WITH raw AS ($fixtureRawSql),
        c AS (SELECT event_id, raw_number,
            regexp_replace(raw_number, '[ .\\-()/]', '', 'g') AS clean
          FROM raw),
        n AS (SELECT event_id, $cand AS cand, $reason AS reason FROM c),
        norm AS (SELECT event_id,
            CASE WHEN reason IS NULL THEN cand END AS canonical, reason
          FROM n)
        SELECT event_id, canonical,
          CASE WHEN canonical IS NULL THEN NULL ELSE
            list_aggregate(list_transform(
              generate_series(1, length(canonical)), i ->
              CASE WHEN i <= 4 THEN substr(canonical, i, 1)
              ELSE CAST((CAST(substr(canonical, i, 1) AS INT) +
                CAST((CAST(substr(canonical, 1, i - 1) AS BIGINT) * 7919
                  + i) % 10 AS INT)) % 10 AS VARCHAR) END),
              'string_agg', '') END AS pseudonym,
          reason
        FROM norm ORDER BY event_id"""
    })

  /** Porting FLOW MATRIX between two number-plan versions — the
    * operator-grain roll-up of [[guidingVersionDiff]]'s range verdicts,
    * and the table the regulator (and every carrier's churn desk)
    * actually publishes on porting day: for each (donor → recipient)
    * operator pair, how many ranges and how many NUMBERS moved.
    * Fresh allocations flow from `(none)`, surrendered ranges flow to
    * `(none)`, and an account move INSIDE one operator is not a flow
    * (the matrix is operator-grain by construction). Net porting
    * balance per operator is a free margin sum over the matrix.
    *
    * Plan: one dim-grain full-outer join on the range bounds + one hash
    * aggregation at operator-pair grain — corpus-independent, bounded
    * by the plan size. */
  def portingFlowMatrix(oldPlan: DataFrame, newPlan: DataFrame,
      opCol: String = "operator"): DataFrame = {
    val a = oldPlan.select(col("range_start"), col("range_end"),
      col(opCol).as("__old_op"))
    val b = newPlan.select(col("range_start"), col("range_end"),
      col(opCol).as("__new_op"))
    a.join(b, Seq("range_start", "range_end"), "full")
      .filter(col("__old_op").isNull || col("__new_op").isNull ||
        col("__old_op") =!= col("__new_op"))
      .groupBy(coalesce(col("__old_op"), lit("(none)")).as("donor_op"),
        coalesce(col("__new_op"), lit("(none)")).as("recipient_op"))
      .agg(count(lit(1)).as("n_ranges"),
        sum(col("range_end") - col("range_start") + 1L).as("n_numbers"))
  }

  /** Oracle fixture of [[portingFlowMatrix]]: the q282 two-version plan
    * with operators derived from the range index — every 3rd range
    * ports to the NEXT operator, every 10th is surrendered, 25 fresh
    * allocations land above the old space, so donor→recipient,
    * →(none), and (none)→ flows all carry rows. */
  private val q292 = GQuery(
    "q292_porting_flow_matrix",
    (s, dir) => {
      val v1 = s.range(0L, 225L).toDF("r").select(
        (lit(49100000000L) + col("r") * 4000000L).as("range_start"),
        (lit(49100000000L) + col("r") * 4000000L + 1999999L)
          .as("range_end"),
        concat(lit("OP"), (col("r") % 5L).cast(StringType)).as("operator"))
      val v2 = s.range(0L, 250L).toDF("r")
        .filter(col("r") % 10L =!= 9L || col("r") >= 225L)
        .select(
          (lit(49100000000L) + col("r") * 4000000L).as("range_start"),
          (lit(49100000000L) + col("r") * 4000000L + 1999999L)
            .as("range_end"),
          concat(lit("OP"),
            when(col("r") % 3L === 0L && col("r") < 225L,
              (col("r") + 1L) % 5L)
              .otherwise(col("r") % 5L).cast(StringType)).as("operator"))
      portingFlowMatrix(v1, v2)
        .orderBy(col("donor_op"), col("recipient_op"))
    },
    Some("""WITH v1 AS (SELECT
          49100000000 + r * 4000000 AS range_start,
          49100000000 + r * 4000000 + 1999999 AS range_end,
          'OP' || CAST(r % 5 AS VARCHAR) AS operator
        FROM UNNEST(generate_series(0, 224)) AS u(r)),
      v2 AS (SELECT
          49100000000 + r * 4000000 AS range_start,
          49100000000 + r * 4000000 + 1999999 AS range_end,
          'OP' || CAST(CASE WHEN r % 3 = 0 AND r < 225 THEN (r + 1) % 5
            ELSE r % 5 END AS VARCHAR) AS operator
        FROM UNNEST(generate_series(0, 249)) AS u(r)
        WHERE r % 10 <> 9 OR r >= 225),
      j AS (SELECT COALESCE(a.operator, '(none)') AS donor_op,
          COALESCE(b.operator, '(none)') AS recipient_op,
          COALESCE(a.range_end, b.range_end)
            - COALESCE(a.range_start, b.range_start) + 1 AS width
        FROM v1 a FULL OUTER JOIN v2 b
          ON a.range_start = b.range_start AND a.range_end = b.range_end
        WHERE a.operator IS NULL OR b.operator IS NULL
          OR a.operator <> b.operator)
      SELECT donor_op, recipient_op, COUNT(*) AS n_ranges,
        CAST(SUM(width) AS BIGINT) AS n_numbers
      FROM j GROUP BY 1, 2
      ORDER BY donor_op, recipient_op"""))

  /** Number-plan fragmentation card — the plan-HYGIENE view the
    * utilization (q268) and version-diff (q282) cards don't give: when
    * an owner's allocation accretes through years of ports and splits,
    * it ends up as many small ranges that COULD be one — every extra
    * range is guiding-dim weight and an operator error surface. Per
    * owner: range count, total numbers, the count of ADJACENT
    * same-owner pairs (`next.range_start = range_end + 1` — each one a
    * merge opportunity), the resulting maximal-contiguous-fragment
    * count (`n_ranges − n_merge_pairs` — exact for chains of any
    * length), and the merge opportunity as ppm of ranges.
    *
    * Plan: adjacency via a SELF-EQUI-JOIN on `range_end + 1 =
    * range_start` — never a global-order window, so a 10⁷-range
    * national plan stays fully parallel (the join key is as selective
    * as a primary key). Assumes a non-overlapping plan — the
    * [[validateVersionedDim]] / guide-time checks own that invariant. */
  def planFragmentation(ranges: DataFrame): DataFrame = {
    val r = ranges.select(col("range_start"), col("range_end"),
      col("account_id"))
    val pairs = r.as("a").join(r.as("b"),
        expr("b.range_start = a.range_end + 1 AND " +
          "b.account_id = a.account_id"))
      .select(col("a.account_id").as("account_id"))
      .groupBy(col("account_id"))
      .agg(count(lit(1)).as("n_merge_pairs"))
    r.groupBy(col("account_id"))
      .agg(count(lit(1)).as("n_ranges"),
        sum(expr("range_end - range_start + 1")).as("total_numbers"))
      .join(pairs, Seq("account_id"), "left")
      .withColumn("n_merge_pairs", coalesce(col("n_merge_pairs"), lit(0L)))
      .withColumn("n_fragments", expr("n_ranges - n_merge_pairs"))
      .withColumn("merge_ppm",
        expr("(1000000 * n_merge_pairs) DIV n_ranges"))
  }

  /** Oracle fixture of [[planFragmentation]]: a contiguous 225-range
    * plan allocated in same-owner TRIPLES whose owner comes from a
    * multiplicative hash of the triple index — every owner holds
    * contiguous chunks (2 merge pairs each), and because 75 triples
    * hash onto 50 owners, half the owners hold TWO separate chunks:
    * merge opportunities and genuine multi-fragment owners both carry
    * rows. */
  private val q307 = GQuery(
    "q307_plan_fragmentation",
    (s, dir) => planFragmentation(
      s.range(0L, 225L).toDF("r").select(
        (lit(49100000000L) + col("r") * 2000000L).as("range_start"),
        (lit(49100000000L) + col("r") * 2000000L + 1999999L)
          .as("range_end"),
        (lit(1000L) + expr("((r DIV 3) * 2654435761) % 50"))
          .as("account_id")))
      .orderBy(col("account_id")),
    Some("""WITH ranges AS (SELECT
          49100000000 + r * 2000000 AS range_start,
          49100000000 + r * 2000000 + 1999999 AS range_end,
          1000 + ((r // 3) * 2654435761) % 50 AS account_id
        FROM UNNEST(generate_series(0, 224)) AS u(r)),
      pairs AS (SELECT a.account_id, COUNT(*) AS n_merge_pairs
        FROM ranges a JOIN ranges b
          ON b.range_start = a.range_end + 1
          AND b.account_id = a.account_id
        GROUP BY 1),
      g AS (SELECT account_id, COUNT(*) AS n_ranges,
          CAST(SUM(range_end - range_start + 1) AS BIGINT)
            AS total_numbers
        FROM ranges GROUP BY 1)
      SELECT g.account_id, n_ranges, total_numbers,
        CAST(COALESCE(n_merge_pairs, 0) AS BIGINT) AS n_merge_pairs,
        CAST(n_ranges - COALESCE(n_merge_pairs, 0) AS BIGINT)
          AS n_fragments,
        CAST((1000000 * COALESCE(n_merge_pairs, 0)) // n_ranges
          AS BIGINT) AS merge_ppm
      FROM g LEFT JOIN pairs USING (account_id)
      ORDER BY account_id"""))

  val queries: Seq[GQuery] =
    Seq(q263, q264, q268, q272, q279, q280, q282, q283, q292, q307)
}
