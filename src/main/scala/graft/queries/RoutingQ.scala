package graft.queries

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import Dsl._

/** Call-routing and route-quality operators — the network-facing side of
  * the mediation stack the reference feeds (`gsmrating.sh` rates what the
  * switches already ROUTED; these operators answer how the routing itself
  * is priced and how routes behave): longest-prefix-match destination
  * rating (the E.164 tariff lookup every interconnect biller runs),
  * trunk-group concurrency sweep lines (capacity planning), and the
  * ASR/ACD route-quality card (the interconnect KPI watched for dead
  * routes and fraud).
  */
object RoutingQ {

  /** Longest-prefix-match routing join — the E.164 rating primitive: a
    * dialed digit string matches the LONGEST prefix present in the
    * routing/tariff dimension (destination tariffs key on number
    * prefixes: '49' Germany, '4915' German mobile, '491520' a specific
    * carrier — the most specific entry wins). Calls matching no prefix
    * are NEVER dropped: they keep NULL route/prefix and rate 0 (the q195
    * never-drop contract — unroutable traffic is a revenue-assurance
    * finding, not a row to lose).
    *
    * Plan: NOT the naive theta join (`prefix = substr(dialed, 1,
    * len(prefix))` explodes into calls × dim under a nested loop) and
    * NOT an explode of per-call prefixes (explode + re-aggregate pays a
    * call-grain shuffle). Instead: one BROADCAST left join PER PREFIX
    * LENGTH present in the dimension (the dim splits by length on the
    * driver — bounded-collect class: |lengths| ≤ 15 for E.164), each
    * keyed on the call-side `substring(dialed, 1, L)` projection, then
    * one `coalesce` down descending lengths. All lookups ride the SAME
    * scan in one map-side stage: scan → L broadcast hash joins →
    * projection, ZERO shuffles at any corpus size. The oracle replays
    * the naive theta-join + max-length window formulation, so the
    * hash-match proves the L-join cascade result-identical to textbook
    * LPM semantics.
    *
    * The dimension must be prefix-unique (a duplicate prefix would bill
    * one call twice under ANY formulation); duplicates fail loudly via a
    * dim-sized pre-check rather than silently multiplying rows. An
    * EMPTY-string prefix is valid and matches every number — the
    * standard way a routing table expresses its default route (it loses
    * to any longer match, exactly like a real LCR table).
    *
    * `calls`: (call_id, dialed, dur_min); `prefixes`: (prefix, route,
    * rate_centi). Returns per call: matched prefix/route/rate and
    * `charge_centi = dur_min · rate_centi` (0 when unmatched or
    * non-positive duration). */
  def prefixRoute(calls: DataFrame, prefixes: DataFrame,
      numCol: String = "dialed"): DataFrame = {
    val wDup = Window.partitionBy(col("prefix"))
    val dim = prefixes
      .withColumn("__dup", count(lit(1)).over(wDup))
      .withColumn("prefix",
        when(col("__dup") > 1L, expr(
          "CAST(raise_error('prefixRoute: duplicate prefix in routing dim') AS STRING)"))
          .otherwise(col("prefix")))
      .drop("__dup")
    // Bounded collect (|lengths| ≤ max prefix length, 15 for E.164):
    // the driver needs the length set to emit one join per length.
    val lengths = dim.select(length(col("prefix")).as("l")).distinct()
      .collect().map(_.getInt(0)).sorted.reverse
    require(lengths.nonEmpty, "prefixRoute: empty routing dimension")
    val joined = lengths.foldLeft(calls) { (d, l) =>
      val p = dim.filter(length(col("prefix")) === l).select(
        col("prefix").as(s"__p$l"), col("route").as(s"__r$l"),
        col("rate_centi").as(s"__c$l"))
      d.join(broadcast(p),
        substring(col(numCol), 1, l) === col(s"__p$l"), "left")
    }
    def firstOf(pre: String): Column =
      coalesce(lengths.map(l => col(s"$pre$l")): _*)
    joined
      .withColumn("prefix", firstOf("__p"))
      .withColumn("route", firstOf("__r"))
      .withColumn("rate_centi", firstOf("__c"))
      .withColumn("charge_centi",
        when(col("rate_centi").isNotNull && col("dur_min") > 0L,
          col("dur_min") * col("rate_centi")).otherwise(lit(0L)))
      .drop(lengths.flatMap(l => Seq(s"__p$l", s"__r$l", s"__c$l")): _*)
  }

  /** Shared CDR derivation for the routing fixtures: 9-digit dialed
    * numbers and 1..10-minute durations from events, by pure integer
    * arithmetic both engines replay (no hash functions involved). */
  private def fixtureCalls(s: org.apache.spark.sql.SparkSession,
      dir: String): DataFrame =
    t(s, dir, "events").select(
      col("event_id").as("call_id"),
      expr("CAST(100000000 + (event_id * 7919) % 900000000 AS STRING)")
        .as("dialed"),
      (lit(1L) + abs(expr("CAST(round(value) AS BIGINT)")) % 10L)
        .as("dur_min"))

  private val fixtureCallsSql =
    """SELECT event_id AS call_id,
        CAST(100000000 + (event_id * 7919) % 900000000 AS VARCHAR) AS dialed,
        1 + abs(CAST(round(value) AS BIGINT)) % 10 AS dur_min
      FROM events"""

  /** Oracle fixture of [[prefixRoute]]: a sparse 1–3-digit prefix plan —
    * every 1-digit prefix except '9' (so ~1/9 of calls exercise the
    * unmatched contract), every 4th 2-digit prefix, 3-digit prefixes
    * ending in 1/3/7 — rates and routes derived from the prefix value.
    * The oracle computes LPM the NAIVE way (theta join on the substring
    * predicate + max-length window), pinning the broadcast cascade to
    * textbook semantics. */
  private val q256 = GQuery(
    "q256_prefix_routing",
    (s, dir) => {
      val pfx = s.range(1L, 1000L).toDF("p")
        .filter((col("p") <= 8L) ||
          (col("p").between(10L, 99L) && col("p") % 4L === 1L) ||
          (col("p") >= 100L && (col("p") % 10L).isin(1L, 3L, 7L)))
        .select(col("p").cast(StringType).as("prefix"),
          concat(lit("R"), (col("p") % 7L).cast(StringType)).as("route"),
          (lit(50L) + col("p") % 97L).as("rate_centi"))
      prefixRoute(fixtureCalls(s, dir), pfx)
        .select(col("call_id"), col("dialed"), col("prefix"), col("route"),
          col("rate_centi"), col("dur_min"), col("charge_centi"))
        .orderBy(col("call_id"))
    },
    Some(s"""WITH calls AS ($fixtureCallsSql),
      pfx AS (SELECT CAST(p AS VARCHAR) AS prefix,
          'R' || CAST(p % 7 AS VARCHAR) AS route,
          50 + p % 97 AS rate_centi
        FROM UNNEST(generate_series(1, 999)) AS u(p)
        WHERE p <= 8 OR (p BETWEEN 10 AND 99 AND p % 4 = 1)
           OR (p >= 100 AND p % 10 IN (1, 3, 7))),
      m AS (SELECT c.call_id, p.prefix, p.route, p.rate_centi,
          ROW_NUMBER() OVER (PARTITION BY c.call_id
            ORDER BY length(p.prefix) DESC) AS rn
        FROM calls c JOIN pfx p
          ON p.prefix = substr(c.dialed, 1, length(p.prefix))),
      best AS (SELECT * FROM m WHERE rn = 1)
      SELECT c.call_id, c.dialed, b.prefix, b.route, b.rate_centi,
        c.dur_min,
        CASE WHEN b.rate_centi IS NOT NULL AND c.dur_min > 0
          THEN c.dur_min * b.rate_centi ELSE 0 END AS charge_centi
      FROM calls c LEFT JOIN best b ON b.call_id = c.call_id
      ORDER BY c.call_id"""))

  /** Trunk-group concurrency sweep line — capacity planning's first
    * number: per trunk, the PEAK simultaneous calls and when it was
    * reached, plus offered load in erlang-milli (Σ call-seconds /
    * observed span). Intervals are [start_sec, end_sec): a call ending
    * at second t frees its circuit to one starting at t — the convention
    * falls out of the delta encoding (net delta per second applies at
    * that second) rather than being a tie-break rule.
    *
    * Plan: calls → ±1 deltas → one hash aggregation to (trunk, sec)
    * NET-delta cells (map-side combine collapses same-second traffic),
    * then the running concurrency via [[PrefixSum.exclusive]] with
    * `partitionCols = trunk` and DAY-wide buckets: the per-(trunk, day)
    * windows spread a hot trunk's sort over its active days, and the
    * offset table is (trunk, day)-grain — calendar-bounded per trunk, so
    * NO single reducer ever owns a whole data-sized trunk (the q220
    * lesson, now served by the shared helper). Peak/busy-second reduce
    * at trunk grain. The oracle replays the naive per-trunk global
    * cumsum window, pinning the bucketed construction exact.
    *
    * Zero/negative-length calls contribute no circuit time but still
    * count as attempts in `n_calls` (never-drop). */
  def trunkPeaks(calls: DataFrame): DataFrame = {
    val starts = calls.filter(col("end_sec") > col("start_sec"))
      .select(col("trunk"), col("start_sec").as("sec"), lit(1L).as("d"))
    val ends = calls.filter(col("end_sec") > col("start_sec"))
      .select(col("trunk"), col("end_sec").as("sec"), lit(-1L).as("d"))
    val cells = starts.unionAll(ends)
      .groupBy(col("trunk"), col("sec")).agg(sum(col("d")).as("delta"))
    val cum = PrefixSum.exclusive(cells, "sec", Seq("delta"),
        bucketWidth = 86400L, partitionCols = Seq("trunk"))
      .withColumn("conc", col("delta_cum") + col("delta"))
    val peaks = cum
      .withColumn("__pk",
        max(col("conc")).over(Window.partitionBy(col("trunk"))))
      .groupBy(col("trunk"))
      .agg(max(col("conc")).as("peak_concurrent"),
        min(when(col("conc") === col("__pk"), col("sec")))
          .as("peak_at_sec"))
    val span = calls.agg(
      (max(col("end_sec")) - min(col("start_sec"))).as("span_sec"))
    val totals = calls.groupBy(col("trunk"))
      .agg(count(lit(1)).as("n_calls"),
        sum(greatest(col("end_sec") - col("start_sec"), lit(0L)))
          .as("call_sec"))
    totals.join(peaks, Seq("trunk"), "left")
      .crossJoin(broadcast(span))
      .select(col("trunk"), col("n_calls"),
        coalesce(col("peak_concurrent"), lit(0L)).as("peak_concurrent"),
        col("peak_at_sec"),
        when(col("span_sec") > 0L,
          expr("(1000 * call_sec) DIV span_sec")).otherwise(lit(0L))
          .as("erlang_milli"))
  }

  /** Oracle fixture of [[trunkPeaks]]: trunks are (event_type ×
    * user_id%50) groups — ~350 trunks so the sweep exercises real
    * parallelism; call windows from the q226 CDR derivation. */
  private val q257 = GQuery(
    "q257_trunk_peak",
    (s, dir) => trunkPeaks(
      t(s, dir, "events").select(
        concat(col("event_type"), lit("-"),
          (col("user_id") % 50L).cast(StringType)).as("trunk"),
        col("ts").cast(LongType).as("start_sec"),
        (col("ts").cast(LongType) + lit(60L) *
          (lit(1L) + abs(expr("CAST(round(value) AS BIGINT)")) % 10L))
          .as("end_sec")))
      .orderBy(col("trunk")),
    Some(s"""WITH calls AS (SELECT
          event_type || '-' || CAST(user_id % 50 AS VARCHAR) AS trunk,
          ${epochSecSql("ts")} AS start_sec,
          ${epochSecSql("ts")}
            + 60 * (1 + abs(CAST(round(value) AS BIGINT)) % 10) AS end_sec
        FROM events),
      deltas AS (
        SELECT trunk, start_sec AS sec, 1 AS d FROM calls
          WHERE end_sec > start_sec
        UNION ALL
        SELECT trunk, end_sec AS sec, -1 AS d FROM calls
          WHERE end_sec > start_sec),
      cells AS (SELECT trunk, sec, SUM(d) AS delta
        FROM deltas GROUP BY 1, 2),
      cum AS (SELECT trunk, sec,
          SUM(delta) OVER (PARTITION BY trunk ORDER BY sec) AS conc
        FROM cells),
      pk AS (SELECT trunk, MAX(conc) AS peak_concurrent FROM cum GROUP BY 1),
      at AS (SELECT c.trunk, MIN(c.sec) AS peak_at_sec
        FROM cum c JOIN pk ON pk.trunk = c.trunk
          AND c.conc = pk.peak_concurrent
        GROUP BY 1),
      span AS (SELECT MAX(end_sec) - MIN(start_sec) AS span_sec FROM calls),
      tot AS (SELECT trunk, COUNT(*) AS n_calls,
          SUM(GREATEST(end_sec - start_sec, 0)) AS call_sec
        FROM calls GROUP BY 1)
      SELECT t.trunk, t.n_calls,
        CAST(COALESCE(pk.peak_concurrent, 0) AS BIGINT) AS peak_concurrent,
        at.peak_at_sec,
        CAST(CASE WHEN span.span_sec > 0
          THEN (1000 * t.call_sec) // span.span_sec
          ELSE 0 END AS BIGINT) AS erlang_milli
      FROM tot t
      LEFT JOIN pk ON pk.trunk = t.trunk
      LEFT JOIN at ON at.trunk = t.trunk
      CROSS JOIN span
      ORDER BY t.trunk"""))

  /** ASR/ACD route-quality card — the interconnect KPI watched hourly on
    * every route: per (route, day), attempts, answered calls (positive
    * duration), answer-seizure ratio in ppm, average call duration of
    * ANSWERED calls in exact centi-seconds, and the short-call (≤ 5 s)
    * share of answered — the signature of both dying routes and
    * false-answer-supervision fraud. One hash aggregation at (route,
    * day) grain; every ratio an exact integer DIV. */
  def asrCard(calls: DataFrame): DataFrame =
    calls
      .groupBy(col("route"), col("day"))
      .agg(count(lit(1)).as("attempts"),
        sum(when(col("dur_centi") > 0L, 1L).otherwise(0L)).as("answered"),
        sum(when(col("dur_centi") > 0L, col("dur_centi")).otherwise(0L))
          .as("dur_sum"),
        sum(when(col("dur_centi") > 0L && col("dur_centi") <= 500L, 1L)
          .otherwise(0L)).as("short_calls"))
      .select(col("route"), col("day"), col("attempts"), col("answered"),
        expr("(1000000 * answered) DIV attempts").as("asr_ppm"),
        when(col("answered") > 0L, expr("dur_sum DIV answered"))
          .as("acd_centisec"),
        when(col("answered") > 0L,
          expr("(1000000 * short_calls) DIV answered")).as("short_ppm"))

  /** Oracle fixture of [[asrCard]]: routes are event types, duration
    * from the value column — negative values are unanswered attempts
    * (the fixture's value distribution crosses zero, so the ASR is
    * genuinely fractional). */
  private val q258 = GQuery(
    "q258_asr_card",
    (s, dir) => asrCard(
      t(s, dir, "events").select(
        col("event_type").as("route"),
        dateStr(col("ts")).as("day"),
        expr("CAST(round(value * 100) AS BIGINT)").as("dur_centi")))
      .orderBy(col("route"), col("day")),
    Some("""WITH calls AS (SELECT event_type AS route,
          strftime(ts, '%Y-%m-%d') AS day,
          CAST(round(value * 100) AS BIGINT) AS dur_centi
        FROM events),
      g AS (SELECT route, day, COUNT(*) AS attempts,
          CAST(SUM(CASE WHEN dur_centi > 0 THEN 1 ELSE 0 END) AS BIGINT)
            AS answered,
          CAST(SUM(CASE WHEN dur_centi > 0 THEN dur_centi ELSE 0 END)
            AS BIGINT) AS dur_sum,
          CAST(SUM(CASE WHEN dur_centi > 0 AND dur_centi <= 500
            THEN 1 ELSE 0 END) AS BIGINT) AS short_calls
        FROM calls GROUP BY 1, 2)
      SELECT route, day, attempts, answered,
        (1000000 * answered) // attempts AS asr_ppm,
        CASE WHEN answered > 0 THEN dur_sum // answered END AS acd_centisec,
        CASE WHEN answered > 0 THEN (1000000 * short_calls) // answered END
          AS short_ppm
      FROM g ORDER BY route, day"""))

  /** Erlang-B circuit dimensioning — the capacity answer the sweep line's
    * load number exists for: given each trunk's offered load E (erlangs,
    * milli-precision), the REQUIRED circuit count is the smallest C with
    * blocking probability B(E, C) at or under `targetBlockPpm`. B follows
    * the standard Erlang-B recursion B(E,0) = 1, B(E,k) = E·B(E,k−1) /
    * (k + E·B(E,k−1)) — evaluated ENTIRELY in integer ppm arithmetic
    * (numerators lifted to DECIMAL(38,0)/HUGEINT, one truncating DIV per
    * step), so both engines replay the identical staircase bit-for-bit;
    * no floats, no library gamma calls.
    *
    * Plan: the recursion is a bounded fold (`aggregate(sequence(1,
    * maxCircuits))`) over each trunk's 1-row load — pure map-side
    * compute after whatever produced the loads; the oracle replays it as
    * a recursive CTE. Zero-load trunks need 0 circuits; trunks whose
    * load cannot meet the target within `maxCircuits` report NULL
    * circuits with their residual blocking — loudly visible, never
    * silently clamped.
    *
    * `loads`: (trunk, erlang_milli). Returns (trunk, erlang_milli,
    * circuits_required, block_ppm) where block_ppm is the blocking at
    * the chosen size (or at maxCircuits when NULL). */
  def erlangCapacity(loads: DataFrame, targetBlockPpm: Long = 10000L,
      maxCircuits: Int = 128): DataFrame = {
    require(targetBlockPpm >= 1L && targetBlockPpm < 1000000L,
      s"targetBlockPpm must be in [1, 1e6), got $targetBlockPpm")
    require(maxCircuits >= 1, s"maxCircuits must be >= 1, got $maxCircuits")
    loads.select(col("trunk"), col("erlang_milli"),
        expr(s"""aggregate(
          sequence(1, $maxCircuits),
          named_struct('bp', CAST(1000000 AS BIGINT),
                       'c', CAST(NULL AS BIGINT)),
          (acc, k) -> IF(acc.c IS NOT NULL OR erlang_milli <= 0, acc,
            named_struct(
              'bp', CAST((CAST(1000000 AS DECIMAL(38,0)) * erlang_milli
                  * acc.bp)
                DIV (CAST(k AS DECIMAL(38,0)) * 1000000000
                  + CAST(erlang_milli AS DECIMAL(38,0)) * acc.bp)
                AS BIGINT),
              'c', IF(CAST((CAST(1000000 AS DECIMAL(38,0)) * erlang_milli
                    * acc.bp)
                  DIV (CAST(k AS DECIMAL(38,0)) * 1000000000
                    + CAST(erlang_milli AS DECIMAL(38,0)) * acc.bp)
                  AS BIGINT) <= $targetBlockPpm,
                CAST(k AS BIGINT), CAST(NULL AS BIGINT)))))
          AS st"""))
      .select(col("trunk"), col("erlang_milli"),
        when(col("erlang_milli") <= 0L, lit(0L))
          .otherwise(col("st.c")).as("circuits_required"),
        when(col("erlang_milli") <= 0L, lit(0L))
          .otherwise(col("st.bp")).as("block_ppm"))
  }

  /** Oracle fixture of [[erlangCapacity]] (1% blocking, ≤ 128 circuits):
    * loads per event-type trunk from total call seconds over the corpus
    * span; the oracle replays the integer recursion as a recursive CTE. */
  /** Erlang-C staffing — the QUEUED twin of [[erlangCapacity]]: blocked
    * callers there are LOST (circuits), here they WAIT (agents /
    * call-center trunks with queueing), so the dimensioning question
    * changes from "blocking ≤ target" to "P(wait) ≤ target": the
    * smallest agent count m with Erlang-C
    * `C(E,m) = m·B/(m − E·(1−B))` at or under `targetWaitPpm`, where B
    * is the same Erlang-B staircase q260 walks. A queue is only STABLE
    * at m > E — below that the backlog grows without bound, so those m
    * never qualify regardless of the formula's value.
    *
    * Arithmetic is ENTIRELY integer ppm (DECIMAL(38,0)/HUGEINT lifts,
    * truncating DIV — both engines replay the staircase bit-for-bit;
    * with milli-erlang loads: `C_ppm = (m·B_ppm·10⁹) DIV (m·10⁹ −
    * E_milli·10⁶ + E_milli·B_ppm)`). Zero load → 0 agents; a target
    * unreachable within `maxAgents` → NULL with the residual wait
    * probability at maxAgents surfaced (never clamped) — the q260
    * contract. One bounded fold per queue, pure map-side after the
    * load aggregation. */
  def erlangStaffing(loads: DataFrame, targetWaitPpm: Long = 200000L,
      maxAgents: Int = 128): DataFrame = {
    require(targetWaitPpm >= 1L && targetWaitPpm < 1000000L,
      s"targetWaitPpm must be in [1, 1e6), got $targetWaitPpm")
    require(maxAgents >= 1, s"maxAgents must be >= 1, got $maxAgents")
    val newBp = """CAST((CAST(1000000 AS DECIMAL(38,0)) * erlang_milli
        * acc.bp)
      DIV (CAST(k AS DECIMAL(38,0)) * 1000000000
        + CAST(erlang_milli AS DECIMAL(38,0)) * acc.bp) AS BIGINT)"""
    def cPpm(bp: String) = s"""CAST((CAST(k AS DECIMAL(38,0)) * ($bp)
        * 1000000000)
      DIV (CAST(k AS DECIMAL(38,0)) * 1000000000
        - CAST(erlang_milli AS DECIMAL(38,0)) * 1000000
        + CAST(erlang_milli AS DECIMAL(38,0)) * ($bp)) AS BIGINT)"""
    loads.select(col("trunk"), col("erlang_milli"),
        expr(s"""aggregate(
          sequence(1, $maxAgents),
          named_struct('bp', CAST(1000000 AS BIGINT),
                       'm', CAST(NULL AS BIGINT),
                       'w', CAST(NULL AS BIGINT)),
          (acc, k) -> IF(acc.m IS NOT NULL OR erlang_milli <= 0, acc,
            named_struct(
              'bp', $newBp,
              'm', IF(CAST(k AS BIGINT) * 1000 > erlang_milli
                  AND ${cPpm(newBp)} <= $targetWaitPpm,
                CAST(k AS BIGINT), CAST(NULL AS BIGINT)),
              'w', IF(CAST(k AS BIGINT) * 1000 > erlang_milli,
                ${cPpm(newBp)}, CAST(NULL AS BIGINT)))))
          AS st"""))
      .select(col("trunk"), col("erlang_milli"),
        when(col("erlang_milli") <= 0L, lit(0L))
          .otherwise(col("st.m")).as("agents_required"),
        when(col("erlang_milli") <= 0L, lit(0L))
          .otherwise(col("st.w")).as("wait_ppm"))
  }

  /** Oracle fixture of [[erlangStaffing]]: the q260 load construction
    * (per-type offered milli-erlangs over the corpus span) at a 5%
    * wait-probability target — tight enough that every queue needs
    * agents strictly above its load ceiling. */
  private val q294 = GQuery(
    "q294_erlang_staffing",
    (s, dir) => {
      val ev = t(s, dir, "events").select(
        col("event_type").as("trunk"),
        (lit(60L) * (lit(1L) + abs(expr("CAST(round(value) AS BIGINT)"))
          % 10L)).as("dur_sec"),
        col("ts").cast(LongType).as("sec"))
      val span = ev.agg((max(col("sec")) - min(col("sec"))).as("span_sec"))
      val loads = ev.groupBy(col("trunk"))
        .agg(sum(col("dur_sec")).as("call_sec"))
        .crossJoin(broadcast(span))
        .select(col("trunk"),
          expr("(1000 * call_sec) DIV span_sec").as("erlang_milli"))
      erlangStaffing(loads, targetWaitPpm = 50000L).orderBy(col("trunk"))
    },
    Some(s"""WITH RECURSIVE ev AS (SELECT event_type AS trunk,
          60 * (1 + abs(CAST(round(value) AS BIGINT)) % 10) AS dur_sec,
          ${epochSecSql("ts")} AS sec
        FROM events),
      span AS (SELECT MAX(sec) - MIN(sec) AS span_sec FROM ev),
      loads AS (SELECT trunk,
          (1000 * SUM(dur_sec)) // span.span_sec AS erlang_milli
        FROM ev, span GROUP BY trunk, span.span_sec),
      rec AS (
        SELECT trunk, erlang_milli, 0 AS k,
          CAST(1000000 AS HUGEINT) AS bp
        FROM loads WHERE erlang_milli > 0
        UNION ALL
        SELECT trunk, erlang_milli, k + 1,
          (CAST(1000000 AS HUGEINT) * erlang_milli * bp)
            // (CAST(k + 1 AS HUGEINT) * 1000000000
               + CAST(erlang_milli AS HUGEINT) * bp)
        FROM rec WHERE k < 128),
      cw AS (SELECT trunk, erlang_milli, k, bp,
          CASE WHEN k >= 1 AND CAST(k AS HUGEINT) * 1000 > erlang_milli
            THEN (CAST(k AS HUGEINT) * bp * 1000000000)
              // (CAST(k AS HUGEINT) * 1000000000
                 - CAST(erlang_milli AS HUGEINT) * 1000000
                 + CAST(erlang_milli AS HUGEINT) * bp)
            END AS c_ppm
        FROM rec),
      hit AS (SELECT trunk, MIN(k) AS m FROM cw
        WHERE c_ppm IS NOT NULL AND c_ppm <= 50000 GROUP BY trunk),
      at AS (SELECT c.trunk, h.m, c.c_ppm FROM cw c JOIN hit h
          ON h.trunk = c.trunk AND c.k = h.m),
      last AS (SELECT trunk, c_ppm FROM cw WHERE k = 128)
      SELECT l.trunk, CAST(l.erlang_milli AS BIGINT) AS erlang_milli,
        CAST(CASE WHEN l.erlang_milli <= 0 THEN 0 ELSE a.m END
          AS BIGINT) AS agents_required,
        CAST(CASE WHEN l.erlang_milli <= 0 THEN 0
          ELSE COALESCE(a.c_ppm, la.c_ppm) END AS BIGINT) AS wait_ppm
      FROM loads l
      LEFT JOIN at a ON a.trunk = l.trunk
      LEFT JOIN last la ON la.trunk = l.trunk
      ORDER BY l.trunk"""))

  private val q260 = GQuery(
    "q260_erlang_capacity",
    (s, dir) => {
      val ev = t(s, dir, "events").select(
        col("event_type").as("trunk"),
        (lit(60L) * (lit(1L) + abs(expr("CAST(round(value) AS BIGINT)"))
          % 10L)).as("dur_sec"),
        col("ts").cast(LongType).as("sec"))
      val span = ev.agg((max(col("sec")) - min(col("sec"))).as("span_sec"))
      val loads = ev.groupBy(col("trunk"))
        .agg(sum(col("dur_sec")).as("call_sec"))
        .crossJoin(broadcast(span))
        .select(col("trunk"),
          expr("(1000 * call_sec) DIV span_sec").as("erlang_milli"))
      erlangCapacity(loads).orderBy(col("trunk"))
    },
    Some(s"""WITH RECURSIVE ev AS (SELECT event_type AS trunk,
          60 * (1 + abs(CAST(round(value) AS BIGINT)) % 10) AS dur_sec,
          ${epochSecSql("ts")} AS sec
        FROM events),
      span AS (SELECT MAX(sec) - MIN(sec) AS span_sec FROM ev),
      loads AS (SELECT trunk,
          (1000 * SUM(dur_sec)) // span.span_sec AS erlang_milli
        FROM ev, span GROUP BY trunk, span.span_sec),
      rec AS (
        SELECT trunk, erlang_milli, 0 AS k,
          CAST(1000000 AS HUGEINT) AS bp
        FROM loads WHERE erlang_milli > 0
        UNION ALL
        SELECT trunk, erlang_milli, k + 1,
          (CAST(1000000 AS HUGEINT) * erlang_milli * bp)
            // (CAST(k + 1 AS HUGEINT) * 1000000000
               + CAST(erlang_milli AS HUGEINT) * bp)
        FROM rec WHERE k < 128),
      hit AS (SELECT trunk, MIN(k) AS c FROM rec
        WHERE k >= 1 AND bp <= 10000 GROUP BY trunk),
      at AS (SELECT r.trunk, h.c, r.bp FROM rec r JOIN hit h
          ON h.trunk = r.trunk AND r.k = h.c),
      last AS (SELECT trunk, bp FROM rec WHERE k = 128)
      SELECT l.trunk, CAST(l.erlang_milli AS BIGINT) AS erlang_milli,
        CAST(CASE WHEN l.erlang_milli <= 0 THEN 0 ELSE a.c END
          AS BIGINT) AS circuits_required,
        CAST(CASE WHEN l.erlang_milli <= 0 THEN 0
          ELSE COALESCE(a.bp, la.bp) END AS BIGINT) AS block_ppm
      FROM loads l
      LEFT JOIN at a ON a.trunk = l.trunk
      LEFT JOIN last la ON la.trunk = l.trunk
      ORDER BY l.trunk"""))

  /** Least-cost-routing plan build — the control-plane job every
    * interconnect switch consumes: per destination prefix, carriers
    * ranked by rate (carrier name breaking ties, so two same-priced
    * carriers rank deterministically), emitted as a fixed failover
    * order (primary / alt1 / alt2) plus the carrier count and the
    * price spread that tells procurement where negotiation pays.
    *
    * Plan: one window + one hash aggregation, BOTH at tariff-dimension
    * grain (a carrier price list is bounded — this is a control-plane
    * build, the traffic-side cost of using the plan is q256/q267);
    * partitioned by prefix, so no single reducer ever owns the dim.
    *
    * `tariffs`: (prefix, carrier, rate_centi), one row per offer;
    * duplicate (prefix, carrier) offers fail loudly — a double quote is
    * a dim defect, not a tie to break silently. */
  def lcrPlan(tariffs: DataFrame): DataFrame = {
    val wDup = Window.partitionBy(col("prefix"), col("carrier"))
    val guarded = tariffs
      .withColumn("__dup", count(lit(1)).over(wDup))
      .withColumn("carrier",
        when(col("__dup") > 1L, expr(
          "CAST(raise_error('lcrPlan: duplicate (prefix, carrier) offer') AS STRING)"))
          .otherwise(col("carrier")))
      .drop("__dup")
    val w = Window.partitionBy(col("prefix"))
      .orderBy(col("rate_centi"), col("carrier"))
    guarded
      .withColumn("__rk", row_number().over(w))
      .groupBy(col("prefix"))
      .agg(
        count(lit(1)).as("n_carriers"),
        max(when(col("__rk") === 1, col("carrier"))).as("primary_carrier"),
        max(when(col("__rk") === 1, col("rate_centi"))).as("primary_centi"),
        max(when(col("__rk") === 2, col("carrier"))).as("alt1_carrier"),
        max(when(col("__rk") === 3, col("carrier"))).as("alt2_carrier"),
        (max(col("rate_centi")) - min(col("rate_centi"))).as("spread_centi"))
  }

  /** Shared carrier-tariff fixture: each 1–3-digit prefix of the q256
    * plan quoted by 2–5 of seven carriers, rates by pure integer
    * arithmetic. */
  private def fixtureTariffs(s: org.apache.spark.sql.SparkSession)
      : DataFrame =
    s.range(1L, 1000L).toDF("p")
      .filter((col("p") <= 8L) ||
        (col("p").between(10L, 99L) && col("p") % 4L === 1L) ||
        (col("p") >= 100L && (col("p") % 10L).isin(1L, 3L, 7L)))
      .withColumn("c", explode(expr("sequence(0, 1 + CAST(p % 4 AS INT))")))
      .select(col("p").cast(StringType).as("prefix"),
        concat(lit("C"), ((col("p") * 3L + col("c") * 5L) % 7L)
          .cast(StringType)).as("carrier"),
        (lit(40L) + (col("p") * 13L + col("c") * 29L) % 111L)
          .as("rate_centi"))

  private val fixtureTariffsSql =
    """SELECT CAST(p AS VARCHAR) AS prefix,
        'C' || CAST((p * 3 + c * 5) % 7 AS VARCHAR) AS carrier,
        40 + (p * 13 + c * 29) % 111 AS rate_centi
      FROM (SELECT p, UNNEST(generate_series(0, 1 + CAST(p % 4 AS INT))) AS c
        FROM UNNEST(generate_series(1, 999)) AS u(p)
        WHERE p <= 8 OR (p BETWEEN 10 AND 99 AND p % 4 = 1)
           OR (p >= 100 AND p % 10 IN (1, 3, 7)))"""

  /** Oracle fixture of [[lcrPlan]]. The carrier derivation `(p·3+c·5)%7`
    * is injective over c∈[0,5] for fixed p (gcd(5,7)=1), so no duplicate
    * (prefix, carrier) offers arise and the loud guard stays quiet. */
  private val q266 = GQuery(
    "q266_lcr_plan",
    (s, dir) => lcrPlan(fixtureTariffs(s)).orderBy(col("prefix")),
    Some(s"""WITH t AS ($fixtureTariffsSql),
      r AS (SELECT *, ROW_NUMBER() OVER (PARTITION BY prefix
          ORDER BY rate_centi, carrier) AS rk FROM t)
      SELECT prefix, COUNT(*) AS n_carriers,
        MAX(CASE WHEN rk = 1 THEN carrier END) AS primary_carrier,
        MAX(CASE WHEN rk = 1 THEN rate_centi END) AS primary_centi,
        MAX(CASE WHEN rk = 2 THEN carrier END) AS alt1_carrier,
        MAX(CASE WHEN rk = 3 THEN carrier END) AS alt2_carrier,
        MAX(rate_centi) - MIN(rate_centi) AS spread_centi
      FROM r GROUP BY prefix ORDER BY prefix"""))

  /** Route margin assurance — the interconnect P&L check every carrier
    * closes the day with: each call rates TWICE through the
    * longest-prefix machinery — once against the customer (sell) tariff
    * and once against the supplier (buy) cost deck, usually at
    * different prefix granularities — and the per-sell-route roll-up
    * shows revenue, cost, margin and the negative-margin flag that
    * means a price-deck update is bleeding money on every call.
    *
    * Plan: ONE scan through TWO back-to-back broadcast LPM cascades
    * ([[prefixRoute]] — zero shuffles on the call side at any corpus
    * size) + one hash aggregation at (sell route) grain. Unrouted
    * calls on either side rate 0 there (never dropped) and roll up
    * under the NULL route — unsellable or unbuyable traffic is the
    * first thing this report must surface. */
  def routeMargin(calls: DataFrame, sellTariffs: DataFrame,
      buyTariffs: DataFrame, numCol: String = "dialed"): DataFrame = {
    val sold = prefixRoute(calls, sellTariffs, numCol)
      .withColumnRenamed("prefix", "sell_prefix")
      .withColumnRenamed("route", "sell_route")
      .withColumnRenamed("rate_centi", "sell_rate_centi")
      .withColumnRenamed("charge_centi", "revenue_centi")
    val both = prefixRoute(sold, buyTariffs, numCol)
      .withColumnRenamed("charge_centi", "cost_centi")
    both
      .groupBy(col("sell_route"))
      .agg(count(lit(1)).as("n_calls"),
        sum(col("dur_min")).as("minutes"),
        sum(col("revenue_centi")).as("revenue_centi"),
        sum(col("cost_centi")).as("cost_centi"))
      .withColumn("margin_centi",
        col("revenue_centi") - col("cost_centi"))
      .withColumn("margin_ppm",
        when(col("revenue_centi") > 0L,
          expr("(1000000 * margin_centi) DIV revenue_centi")))
      .withColumn("bleeding", col("margin_centi") < 0L)
  }

  /** Oracle fixture of [[routeMargin]]: the q256 sell plan vs a COARSER
    * buy deck (1–2-digit prefixes only, rates shifted so some routes
    * genuinely go negative); the oracle replays both LPMs the naive
    * theta-join way. */
  private val q267 = GQuery(
    "q267_route_margin",
    (s, dir) => {
      val sell = s.range(1L, 1000L).toDF("p")
        .filter((col("p") <= 8L) ||
          (col("p").between(10L, 99L) && col("p") % 4L === 1L) ||
          (col("p") >= 100L && (col("p") % 10L).isin(1L, 3L, 7L)))
        .select(col("p").cast(StringType).as("prefix"),
          concat(lit("R"), (col("p") % 7L).cast(StringType)).as("route"),
          (lit(50L) + col("p") % 97L).as("rate_centi"))
      val buy = s.range(1L, 100L).toDF("p")
        .filter((col("p") <= 8L) || col("p") % 3L === 1L)
        .select(col("p").cast(StringType).as("prefix"),
          concat(lit("S"), (col("p") % 5L).cast(StringType)).as("route"),
          (lit(45L) + col("p") * 7L % 113L).as("rate_centi"))
      routeMargin(fixtureCalls(s, dir), sell, buy)
        .orderBy(col("sell_route"))
    },
    Some(s"""WITH calls AS ($fixtureCallsSql),
      sell AS (SELECT CAST(p AS VARCHAR) AS prefix,
          'R' || CAST(p % 7 AS VARCHAR) AS route,
          50 + p % 97 AS rate_centi
        FROM UNNEST(generate_series(1, 999)) AS u(p)
        WHERE p <= 8 OR (p BETWEEN 10 AND 99 AND p % 4 = 1)
           OR (p >= 100 AND p % 10 IN (1, 3, 7))),
      buy AS (SELECT CAST(p AS VARCHAR) AS prefix,
          'S' || CAST(p % 5 AS VARCHAR) AS route,
          45 + p * 7 % 113 AS rate_centi
        FROM UNNEST(generate_series(1, 99)) AS u(p)
        WHERE p <= 8 OR p % 3 = 1),
      sm AS (SELECT c.call_id, p.route, p.rate_centi,
          ROW_NUMBER() OVER (PARTITION BY c.call_id
            ORDER BY length(p.prefix) DESC) AS rn
        FROM calls c JOIN sell p
          ON p.prefix = substr(c.dialed, 1, length(p.prefix))),
      sb AS (SELECT * FROM sm WHERE rn = 1),
      bm AS (SELECT c.call_id, p.rate_centi,
          ROW_NUMBER() OVER (PARTITION BY c.call_id
            ORDER BY length(p.prefix) DESC) AS rn
        FROM calls c JOIN buy p
          ON p.prefix = substr(c.dialed, 1, length(p.prefix))),
      bb AS (SELECT * FROM bm WHERE rn = 1),
      per AS (SELECT c.call_id, sb.route AS sell_route, c.dur_min,
          CASE WHEN sb.rate_centi IS NOT NULL AND c.dur_min > 0
            THEN c.dur_min * sb.rate_centi ELSE 0 END AS revenue_centi,
          CASE WHEN bb.rate_centi IS NOT NULL AND c.dur_min > 0
            THEN c.dur_min * bb.rate_centi ELSE 0 END AS cost_centi
        FROM calls c
        LEFT JOIN sb ON sb.call_id = c.call_id
        LEFT JOIN bb ON bb.call_id = c.call_id),
      g AS (SELECT sell_route, COUNT(*) AS n_calls,
          CAST(SUM(dur_min) AS BIGINT) AS minutes,
          CAST(SUM(revenue_centi) AS BIGINT) AS revenue_centi,
          CAST(SUM(cost_centi) AS BIGINT) AS cost_centi
        FROM per GROUP BY 1)
      SELECT sell_route, n_calls, minutes, revenue_centi, cost_centi,
        revenue_centi - cost_centi AS margin_centi,
        CASE WHEN revenue_centi > 0
          THEN (1000000 * (revenue_centi - cost_centi)) // revenue_centi
          END AS margin_ppm,
        revenue_centi - cost_centi < 0 AS bleeding
      FROM g ORDER BY sell_route NULLS FIRST"""))

  /** Wangiri (one-ring) caller screen — the outbound-side fraud card
    * next to the velocity monitor (q246) and the route-side FAS signal
    * (q258's short-call share): a wangiri generator dials MANY DISTINCT
    * numbers with almost no completed talk time, harvesting callbacks
    * to premium numbers. Per caller: attempts, distinct destinations,
    * fan-out ppm (distinct/attempts), unanswered ppm, short-answer ppm
    * (completed but ≤ `shortCentisec`), and the flag — high fan-out AND
    * high unanswered+short share over a minimum attempt floor. Every
    * ratio an exact integer DIV; thresholds are explicit knobs, not
    * buried constants.
    *
    * Plan: ONE hash aggregation at caller grain (the distinct count is
    * the only two-phase term). */
  def wangiriCard(calls: DataFrame, minAttempts: Long = 20L,
      minFanoutPpm: Long = 800000L, minBadPpm: Long = 900000L,
      shortCentisec: Long = 500L): DataFrame =
    calls
      .groupBy(col("caller"))
      .agg(count(lit(1)).as("attempts"),
        countDistinct(col("callee")).as("n_destinations"),
        sum(when(col("dur_centi") <= 0L, 1L).otherwise(0L))
          .as("unanswered"),
        sum(when(col("dur_centi") > 0L &&
            col("dur_centi") <= shortCentisec, 1L).otherwise(0L))
          .as("short_answers"))
      .withColumn("fanout_ppm",
        expr("(1000000 * n_destinations) DIV attempts"))
      .withColumn("bad_ppm",
        expr("(1000000 * (unanswered + short_answers)) DIV attempts"))
      .withColumn("wangiri_flag",
        col("attempts") >= minAttempts &&
          col("fanout_ppm") >= minFanoutPpm &&
          col("bad_ppm") >= minBadPpm)

  /** Oracle fixture of [[wangiriCard]]: callers are users, callees from
    * the q256 dialed derivation, durations from the value column
    * (negatives = ring-outs) — the fixture's users are heavy dialers,
    * so the flag exercises genuinely mixed verdicts at the default
    * knobs only via the bad-share margin. */
  private val q276 = GQuery(
    "q276_wangiri_card",
    (s, dir) => wangiriCard(
      t(s, dir, "events").select(
        col("user_id").as("caller"),
        expr("CAST(100000000 + (event_id * 7919) % 900000000 AS STRING)")
          .as("callee"),
        expr("CAST(round(value * 100) AS BIGINT)").as("dur_centi")),
      minAttempts = 20L, minFanoutPpm = 800000L, minBadPpm = 400000L)
      .orderBy(col("caller")),
    Some("""WITH calls AS (SELECT user_id AS caller,
          CAST(100000000 + (event_id * 7919) % 900000000 AS VARCHAR)
            AS callee,
          CAST(round(value * 100) AS BIGINT) AS dur_centi
        FROM events),
      g AS (SELECT caller, COUNT(*) AS attempts,
          CAST(COUNT(DISTINCT callee) AS BIGINT) AS n_destinations,
          CAST(SUM(CASE WHEN dur_centi <= 0 THEN 1 ELSE 0 END) AS BIGINT)
            AS unanswered,
          CAST(SUM(CASE WHEN dur_centi > 0 AND dur_centi <= 500
            THEN 1 ELSE 0 END) AS BIGINT) AS short_answers
        FROM calls GROUP BY 1)
      SELECT caller, attempts, n_destinations, unanswered, short_answers,
        (1000000 * n_destinations) // attempts AS fanout_ppm,
        (1000000 * (unanswered + short_answers)) // attempts AS bad_ppm,
        (attempts >= 20
          AND (1000000 * n_destinations) // attempts >= 800000
          AND (1000000 * (unanswered + short_answers)) // attempts
              >= 400000) AS wangiri_flag
      FROM g ORDER BY caller"""))

  /** Community-of-interest card — the SIM-box/PBX classifier's first
    * feature set: per caller, the top-`k` call partners by attempt
    * count (callee string breaking count ties) and the partner
    * CONCENTRATION as an exact Herfindahl index in ppm
    * (Σ share² = Σ cnt² · 10⁶ DIV total²): a human's calling circle
    * concentrates (high HHI, few partners), a SIM-box spraying
    * terminations flattens (HHI → 1/partners), a PBX sits between —
    * read together with the wangiri fan-out screen (q276).
    *
    * Plan: one hash agg at (caller, callee) grain, then BOTH the top-k
    * window and the HHI roll-up ride that same exchange (partitioned by
    * caller — a hot caller's partner list is its own partition, never a
    * global sort). */
  def communityCard(calls: DataFrame, k: Int = 3): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    val pairs = calls.groupBy(col("caller"), col("callee"))
      .agg(count(lit(1)).as("cnt"))
    val w = Window.partitionBy(col("caller"))
      .orderBy(col("cnt").desc, col("callee"))
    val ranked = pairs.withColumn("__rk", row_number().over(w))
    val tops = (1 to k).flatMap { i =>
      Seq(max(when(col("__rk") === i, col("callee"))).as(s"partner_$i"),
        max(when(col("__rk") === i, col("cnt"))).as(s"calls_$i"))
    }
    val aggs = Seq(sum(col("cnt")).as("attempts"),
      count(lit(1)).as("n_partners")) ++ tops :+
      sum(col("cnt") * col("cnt")).cast(DecimalType(38, 0)).as("__sq")
    ranked.groupBy(col("caller"))
      .agg(aggs.head, aggs.tail: _*)
      .withColumn("hhi_ppm", expr(
        """CAST((1000000 * __sq)
           DIV (CAST(attempts AS DECIMAL(38,0)) * attempts) AS BIGINT)"""))
      .drop("__sq")
  }

  /** Oracle fixture of [[communityCard]] (k=3): callers are users,
    * callees reuse the 9-digit derivation folded to 40 distinct
    * partners per caller-space so counts genuinely tie and the
    * deterministic tiebreak is exercised. */
  private val q277 = GQuery(
    "q277_community_card",
    (s, dir) => communityCard(
      t(s, dir, "events").select(
        col("user_id").as("caller"),
        concat(lit("N"), ((col("event_id") * 7919L) % 40L)
          .cast(StringType)).as("callee")))
      .orderBy(col("caller")),
    Some("""WITH calls AS (SELECT user_id AS caller,
          'N' || CAST((event_id * 7919) % 40 AS VARCHAR) AS callee
        FROM events),
      pairs AS (SELECT caller, callee, COUNT(*) AS cnt
        FROM calls GROUP BY 1, 2),
      r AS (SELECT *, ROW_NUMBER() OVER (PARTITION BY caller
          ORDER BY cnt DESC, callee) AS rk FROM pairs)
      SELECT caller, CAST(SUM(cnt) AS BIGINT) AS attempts,
        COUNT(*) AS n_partners,
        MAX(CASE WHEN rk = 1 THEN callee END) AS partner_1,
        CAST(MAX(CASE WHEN rk = 1 THEN cnt END) AS BIGINT) AS calls_1,
        MAX(CASE WHEN rk = 2 THEN callee END) AS partner_2,
        CAST(MAX(CASE WHEN rk = 2 THEN cnt END) AS BIGINT) AS calls_2,
        MAX(CASE WHEN rk = 3 THEN callee END) AS partner_3,
        CAST(MAX(CASE WHEN rk = 3 THEN cnt END) AS BIGINT) AS calls_3,
        CAST((1000000 * CAST(SUM(cnt * cnt) AS HUGEINT))
          // (CAST(SUM(cnt) AS HUGEINT) * SUM(cnt)) AS BIGINT) AS hhi_ppm
      FROM r GROUP BY caller ORDER BY caller"""))

  /** CDR feed-hole card — revenue assurance's first morning check: a
    * mediation feed that silently skips an hour is lost revenue nobody
    * bills, invisible to every per-record validation. Per carrier, over
    * its OWN active span [first hour, last hour]: expected hours,
    * observed hours, missing hours, the longest gap in hours and when
    * it started — computed by exploding the bounded per-carrier hour
    * calendar (span-sized, never corpus-sized) and anti-checking it
    * against observed hour cells.
    *
    * Plan: one (carrier, hour) hash agg collapses the corpus, then the
    * calendar explode + gap windows run at HOUR-CELL grain partitioned
    * by carrier — per-carrier calendars are calendar-bounded (the
    * PrefixSum offset-table argument), so no reducer ever sees fact
    * data. */
  def feedGapCard(cdrs: DataFrame): DataFrame = {
    val cells = cdrs
      .groupBy(col("carrier"), expr("sec DIV 3600").as("hr"))
      .agg(count(lit(1)).as("n"))
    val span = cells.groupBy(col("carrier"))
      .agg(min(col("hr")).as("h0"), max(col("hr")).as("h1"),
        count(lit(1)).as("observed_hours"),
        sum(col("n")).as("n_cdrs"))
    val calendar = span.withColumn("hr",
      explode(expr("sequence(h0, h1)")))
    val joined = calendar.join(cells, Seq("carrier", "hr"), "left")
      .withColumn("__miss", col("n").isNull)
    // longest missing RUN per carrier: group consecutive missing hours
    // by (hr - rank-among-missing) — the standard gaps-and-islands key,
    // per-carrier windows only
    val wAll = Window.partitionBy(col("carrier")).orderBy(col("hr"))
    val runs = joined.filter(col("__miss"))
      .withColumn("__rn", row_number().over(wAll))
      .withColumn("__grp", col("hr") - col("__rn"))
      .groupBy(col("carrier"), col("__grp"))
      .agg(count(lit(1)).as("len"), min(col("hr")).as("from_hr"))
    val worst = runs
      .withColumn("__best", max(col("len"))
        .over(Window.partitionBy(col("carrier"))))
      .filter(col("len") === col("__best"))
      .groupBy(col("carrier"))
      .agg(max(col("len")).as("longest_gap_hours"),
        min(col("from_hr")).as("gap_starts_hr"))
    span
      .withColumn("expected_hours", col("h1") - col("h0") + 1L)
      .withColumn("missing_hours",
        col("expected_hours") - col("observed_hours"))
      .join(worst, Seq("carrier"), "left")
      .select(col("carrier"), col("n_cdrs"), col("expected_hours"),
        col("observed_hours"), col("missing_hours"),
        coalesce(col("longest_gap_hours"), lit(0L))
          .as("longest_gap_hours"),
        col("gap_starts_hr"))
  }

  /** Oracle fixture of [[feedGapCard]]: carriers are event types; a
    * PLANTED hole — every hour ≡ 5 (mod 24) of the 'error' feed is
    * dropped before the card runs — so the card provably finds gaps the
    * raw fixture doesn't have. */
  private val q278 = GQuery(
    "q278_feed_gaps",
    (s, dir) => feedGapCard(
      t(s, dir, "events")
        .select(col("event_type").as("carrier"),
          col("ts").cast(LongType).as("sec"))
        .filter(!(col("carrier") === "error" &&
          expr("(sec DIV 3600) % 24 = 5"))))
      .orderBy(col("carrier")),
    Some(s"""WITH cdrs AS (SELECT event_type AS carrier,
          ${epochSecSql("ts")} AS sec
        FROM events
        WHERE NOT (event_type = 'error'
          AND (${epochSecSql("ts")} // 3600) % 24 = 5)),
      cells AS (SELECT carrier, sec // 3600 AS hr, COUNT(*) AS n
        FROM cdrs GROUP BY 1, 2),
      span AS (SELECT carrier, MIN(hr) AS h0, MAX(hr) AS h1,
          COUNT(*) AS observed_hours, CAST(SUM(n) AS BIGINT) AS n_cdrs
        FROM cells GROUP BY 1),
      cal AS (SELECT s.carrier, s.h0, s.h1, s.observed_hours, s.n_cdrs,
          UNNEST(generate_series(s.h0, s.h1)) AS hr
        FROM span s),
      miss AS (SELECT c.carrier, c.hr,
          ROW_NUMBER() OVER (PARTITION BY c.carrier ORDER BY c.hr) AS rn
        FROM cal c LEFT JOIN cells ON cells.carrier = c.carrier
          AND cells.hr = c.hr
        WHERE cells.n IS NULL),
      runs AS (SELECT carrier, hr - rn AS grp, COUNT(*) AS len,
          MIN(hr) AS from_hr
        FROM miss GROUP BY 1, 2),
      worst AS (SELECT r.carrier, MAX(r.len) AS longest_gap_hours,
          MIN(r.from_hr) AS gap_starts_hr
        FROM runs r JOIN (SELECT carrier, MAX(len) AS best FROM runs
          GROUP BY 1) b ON b.carrier = r.carrier AND r.len = b.best
        GROUP BY 1)
      SELECT s.carrier, s.n_cdrs,
        CAST(s.h1 - s.h0 + 1 AS BIGINT) AS expected_hours,
        CAST(s.observed_hours AS BIGINT) AS observed_hours,
        CAST(s.h1 - s.h0 + 1 - s.observed_hours AS BIGINT)
          AS missing_hours,
        CAST(COALESCE(w.longest_gap_hours, 0) AS BIGINT)
          AS longest_gap_hours,
        CAST(w.gap_starts_hr AS BIGINT) AS gap_starts_hr
      FROM span s LEFT JOIN worst w ON w.carrier = s.carrier
      ORDER BY s.carrier"""))

  /** Redial / retry-chain card — the caller-behavior KPI between the
    * route-level ASR (q258) and the fraud screens: when an attempt
    * FAILS, how often does the caller redial within the retry window,
    * and how often does the redial get through? A route whose failures
    * are mostly recovered by redials is congested; one whose redials
    * keep failing is broken — two different tickets, invisible in plain
    * ASR (the industry's NER-vs-ASR distinction). An attempt is a RETRY
    * when the SAME (caller, callee) pair's previous attempt failed no
    * more than `retryWindowSec` earlier.
    *
    * Per route: attempts, failures, retries, recovered (retry that
    * answered), `retry_after_fail_ppm` (failures that produced a
    * redial) and `recovery_ppm` (redials that got through) — exact
    * integer ppm, zero denominators yield NULL, never an error.
    *
    * Plan: ONE window over (caller, callee) ordered by (sec, attempt
    * id — a deterministic total order) for the lag, then ONE hash agg
    * at route grain. The only exchange is the pair-key window
    * partition; per-pair history is the window frame, never a self-join. */
  def redialCard(calls: DataFrame, retryWindowSec: Long = 60L): DataFrame = {
    val w = Window.partitionBy(col("caller"), col("callee"))
      .orderBy(col("sec"), col("attempt_id"))
    calls
      .withColumn("__psec", lag(col("sec"), 1).over(w))
      .withColumn("__pans", lag(col("answered"), 1).over(w))
      .withColumn("__retry", col("__pans") === false &&
        col("sec") - col("__psec") <= retryWindowSec)
      .groupBy(col("route"))
      .agg(count(lit(1)).as("n_attempts"),
        sum(when(!col("answered"), 1L).otherwise(0L)).as("n_failed"),
        sum(when(col("__retry"), 1L).otherwise(0L)).as("n_retries"),
        sum(when(col("__retry") && col("answered"), 1L).otherwise(0L))
          .as("n_recovered"))
      .withColumn("retry_after_fail_ppm",
        when(col("n_failed") > 0L,
          expr("(1000000 * n_retries) DIV n_failed")))
      .withColumn("recovery_ppm",
        when(col("n_retries") > 0L,
          expr("(1000000 * n_recovered) DIV n_retries")))
  }

  /** Oracle fixture of [[redialCard]]: events as call attempts on a
    * compressed deterministic clock (`(event_id·37) mod 3600` — the
    * fixture's real timestamps are too sparse per pair for sub-minute
    * chains), pairs folded so each carries many attempts, answered
    * derived from the value column (~2/3 up) — so retries AND
    * recoveries genuinely occur at every route. */
  private val q286 = GQuery(
    "q286_redial_card",
    (s, dir) => {
      val calls = t(s, dir, "events").select(
        (col("user_id") % 500L).as("caller"),
        (col("user_id") % 7L).as("callee"),
        ((col("event_id") * 37L) % 3600L).as("sec"),
        col("event_id").as("attempt_id"),
        (expr("CAST(round(value * 100) AS BIGINT)") % 3L =!= 0L)
          .as("answered"))
        .withColumn("route",
          concat(lit("R"), (col("callee") % 5L).cast(StringType)))
      redialCard(calls).orderBy(col("route"))
    },
    Some(s"""WITH calls AS (SELECT user_id % 500 AS caller,
          user_id % 7 AS callee,
          (event_id * 37) % 3600 AS sec, event_id AS attempt_id,
          CAST(round(value * 100) AS BIGINT) % 3 <> 0 AS answered,
          'R' || CAST(user_id % 7 % 5 AS VARCHAR) AS route
        FROM events),
      lagged AS (SELECT route, answered,
          LAG(sec) OVER (PARTITION BY caller, callee
            ORDER BY sec, attempt_id) AS psec,
          LAG(answered) OVER (PARTITION BY caller, callee
            ORDER BY sec, attempt_id) AS pans,
          sec
        FROM calls),
      marked AS (SELECT route, answered,
          COALESCE(pans = false AND sec - psec <= 60, false) AS retry
        FROM lagged)
      SELECT route, COUNT(*) AS n_attempts,
        CAST(SUM(CASE WHEN NOT answered THEN 1 ELSE 0 END) AS BIGINT)
          AS n_failed,
        CAST(SUM(CASE WHEN retry THEN 1 ELSE 0 END) AS BIGINT)
          AS n_retries,
        CAST(SUM(CASE WHEN retry AND answered THEN 1 ELSE 0 END)
          AS BIGINT) AS n_recovered,
        CAST(CASE WHEN SUM(CASE WHEN NOT answered THEN 1 ELSE 0 END) > 0
          THEN (1000000 * SUM(CASE WHEN retry THEN 1 ELSE 0 END))
            // SUM(CASE WHEN NOT answered THEN 1 ELSE 0 END) END
          AS BIGINT) AS retry_after_fail_ppm,
        CAST(CASE WHEN SUM(CASE WHEN retry THEN 1 ELSE 0 END) > 0
          THEN (1000000 * SUM(CASE WHEN retry AND answered
              THEN 1 ELSE 0 END))
            // SUM(CASE WHEN retry THEN 1 ELSE 0 END) END
          AS BIGINT) AS recovery_ppm
      FROM marked GROUP BY 1 ORDER BY route"""))

  /** Bot-cadence screen — the TIMING-regularity lens the rate screens
    * miss (q246 velocity asks "how MANY in a window", q276 wangiri
    * "how many DISTINCT targets"; this asks "how MACHINE-LIKE is the
    * spacing"): a dialer fired by a cron or SIM-box emits at
    * near-constant inter-event intervals, while human traffic is
    * bursty. Per caller: the inter-event gaps' lower median, their
    * median-absolute-deviation (both exact order statistics — the
    * q285/q305 discipline), the RELATIVE MAD in milli (`(1000·mad)
    * DIV median`), and the flag: enough events, a nonzero median
    * (zero-median bursts are the velocity monitor's domain, doc'd),
    * and relative MAD at or under the knob. Gap multisets are
    * invariant under same-second reordering, so no tiebreak is needed
    * for determinism.
    *
    * Plan: one (caller)-partitioned lag + two order-statistic window
    * passes, all at per-caller grain — never corpus-sized. */
  def botCadenceCard(calls: DataFrame, minEvents: Long = 10L,
      maxRelMadMilli: Long = 700L): DataFrame = {
    require(minEvents >= 2L, s"minEvents must be >= 2, got $minEvents")
    require(maxRelMadMilli >= 0L,
      s"maxRelMadMilli must be >= 0, got $maxRelMadMilli")
    val wo = Window.partitionBy(col("caller")).orderBy(col("sec"))
    val gaps = calls.select(col("caller"), col("sec"))
      .withColumn("gap", col("sec") - lag(col("sec"), 1).over(wo))
      .filter(col("gap").isNotNull)
    // the lower-median order statistic is shared repo-wide
    // ([[AnalyticsQ.lowerMedianPerKey]]) so tie semantics can't drift
    val med = AnalyticsQ.lowerMedianPerKey(gaps, "caller", "gap",
      "median_iet_sec")
    val mad = AnalyticsQ.lowerMedianPerKey(
      gaps.join(med, Seq("caller"))
        .withColumn("__dev", abs(col("gap") - col("median_iet_sec"))),
      "caller", "__dev", "mad_iet_sec")
    gaps.groupBy(col("caller")).agg(count(lit(1)).as("n_iet"))
      .join(med, Seq("caller")).join(mad, Seq("caller"))
      .withColumn("rel_mad_milli",
        when(col("median_iet_sec") > 0L,
          expr("(1000 * mad_iet_sec) DIV median_iet_sec")))
      .withColumn("machine_flag",
        col("n_iet") >= minEvents && col("median_iet_sec") > 0L &&
          col("rel_mad_milli") <= maxRelMadMilli)
  }

  /** Oracle fixture of [[botCadenceCard]]: callers are users, seconds
    * from the event timestamps; the fixture carries no planted bots,
    * so the knob sits at the fixture population's relative-MAD median
    * — both verdicts carry rows and the spec plants a true clockwork
    * caller to prove the flag's semantics. */
  private val q308 = GQuery(
    "q308_bot_cadence",
    (s, dir) => botCadenceCard(
      t(s, dir, "events").select(col("user_id").as("caller"),
        expr("CAST(ts AS BIGINT)").as("sec")))
      .orderBy(col("caller")),
    Some("""WITH calls AS (SELECT user_id AS caller,
          (epoch_us(ts) // 1000000) AS sec FROM events),
      gaps AS (SELECT caller,
          sec - LAG(sec) OVER (PARTITION BY caller ORDER BY sec) AS gap
        FROM calls),
      gg AS (SELECT caller, CAST(gap AS BIGINT) AS gap FROM gaps
        WHERE gap IS NOT NULL),
      med AS (SELECT caller, gap AS median_iet_sec FROM (
          SELECT caller, gap,
            ROW_NUMBER() OVER (PARTITION BY caller ORDER BY gap) AS rn,
            COUNT(*) OVER (PARTITION BY caller) AS ng FROM gg)
        WHERE rn = (ng + 1) // 2),
      dev AS (SELECT gg.caller, abs(gap - median_iet_sec) AS dv
        FROM gg JOIN med USING (caller)),
      mad AS (SELECT caller, dv AS mad_iet_sec FROM (
          SELECT caller, dv,
            ROW_NUMBER() OVER (PARTITION BY caller ORDER BY dv) AS rn,
            COUNT(*) OVER (PARTITION BY caller) AS ng FROM dev)
        WHERE rn = (ng + 1) // 2),
      n AS (SELECT caller, COUNT(*) AS n_iet FROM gg GROUP BY 1)
      SELECT n.caller, n_iet, median_iet_sec, mad_iet_sec,
        CASE WHEN median_iet_sec > 0
          THEN CAST((1000 * mad_iet_sec) // median_iet_sec AS BIGINT) END
          AS rel_mad_milli,
        (n_iet >= 10 AND median_iet_sec > 0
          AND (1000 * mad_iet_sec) // median_iet_sec <= 700)
          AS machine_flag
      FROM n JOIN med USING (caller) JOIN mad USING (caller)
      ORDER BY caller"""))

  /** SIM-box (interconnect-bypass) screen — the fraud species the
    * wangiri ([[wangiriCard]]), cadence ([[botCadenceCard]]) and
    * velocity (q246) lenses all MISS, because a SIM-box looks like a
    * healthy subscriber on each of them: it terminates international
    * traffic as local calls, so its calls CONNECT (wangiri needs
    * ring-outs), pace like humans (a box mixes many origins), and
    * spread volume across SIMs (velocity caps out). Its tell is
    * DIRECTIONAL: a termination box ORIGINATES toward many distinct
    * destinations and almost never RECEIVES — real subscribers sit
    * near in/out balance. Per subscriber: outgoing attempts, distinct
    * destinations, answered share, INCOMING count (the full-outer
    * side — an inbound-only subscriber keeps a row, never-drop), the
    * exact-ppm incoming share, and the composite verdict
    * (out ≥ minOut ∧ in_share ≤ maxInShare ∧ fanout ≥ minFanout ∧
    * answered ≥ minAnswered — each a knob).
    *
    * Scale shape: two caller/callee-grain hash aggs off the same scan
    * + one subscriber-grain full outer join — no windows, no
    * self-join; hash-partitions cleanly at any corpus size. */
  def simboxCard(calls: DataFrame, minOut: Long = 20L,
      maxInSharePpm: Long = 50000L, minFanoutPpm: Long = 600000L,
      minAnsweredPpm: Long = 500000L): DataFrame = {
    require(minOut >= 1L, s"minOut must be >= 1, got $minOut")
    val out = calls.groupBy(col("caller").as("subscriber"))
      .agg(count(lit(1)).as("out_calls"),
        countDistinct(col("callee")).as("n_destinations"),
        sum(when(col("dur_centi") > 0L, 1L).otherwise(0L)).as("answered"))
    val in = calls.groupBy(col("callee").as("subscriber"))
      .agg(count(lit(1)).as("in_calls"))
    out.join(in, Seq("subscriber"), "full_outer")
      .withColumn("out_calls", coalesce(col("out_calls"), lit(0L)))
      .withColumn("n_destinations",
        coalesce(col("n_destinations"), lit(0L)))
      .withColumn("answered", coalesce(col("answered"), lit(0L)))
      .withColumn("in_calls", coalesce(col("in_calls"), lit(0L)))
      .withColumn("fanout_ppm", expr(
        "CASE WHEN out_calls > 0 THEN " +
          "(1000000 * n_destinations) DIV out_calls END"))
      .withColumn("answered_ppm", expr(
        "CASE WHEN out_calls > 0 THEN " +
          "(1000000 * answered) DIV out_calls END"))
      .withColumn("in_share_ppm", expr(
        "(1000000 * in_calls) DIV (in_calls + out_calls)"))
      .withColumn("simbox_flag",
        col("out_calls") >= minOut &&
          col("in_share_ppm") <= maxInSharePpm &&
          col("fanout_ppm") >= minFanoutPpm &&
          col("answered_ppm") >= minAnsweredPpm)
  }

  /** Oracle fixture of [[simboxCard]]: callers are users; callees hash
    * into the LOW 120 ids only, so subscribers 120–149 receive nothing
    * — the zero-inbound, high-fanout, answering population the screen
    * exists to isolate (30/150 flag; everyone else sits near in/out
    * balance and fails on in_share). */
  private val q317 = GQuery(
    "q317_simbox_card",
    (s, dir) => simboxCard(
      t(s, dir, "events").select(
        col("user_id").as("caller"),
        expr("(event_id * 104729) % 120").as("callee"),
        expr("CAST(round(value * 100) AS BIGINT)").as("dur_centi")))
      .orderBy(col("subscriber")),
    Some("""WITH calls AS (SELECT user_id AS caller,
          (event_id * 104729) % 120 AS callee,
          CAST(round(value * 100) AS BIGINT) AS dur_centi
        FROM events),
      o AS (SELECT caller AS subscriber, CAST(COUNT(*) AS BIGINT)
            AS out_calls,
          CAST(COUNT(DISTINCT callee) AS BIGINT) AS n_destinations,
          CAST(SUM(CASE WHEN dur_centi > 0 THEN 1 ELSE 0 END) AS BIGINT)
            AS answered
        FROM calls GROUP BY 1),
      i AS (SELECT callee AS subscriber, CAST(COUNT(*) AS BIGINT)
            AS in_calls
        FROM calls GROUP BY 1),
      j AS (SELECT COALESCE(o.subscriber, i.subscriber) AS subscriber,
          COALESCE(out_calls, 0) AS out_calls,
          COALESCE(n_destinations, 0) AS n_destinations,
          COALESCE(answered, 0) AS answered,
          COALESCE(in_calls, 0) AS in_calls
        FROM o FULL OUTER JOIN i ON o.subscriber = i.subscriber),
      f AS (SELECT *,
          CASE WHEN out_calls > 0
            THEN (1000000 * n_destinations) // out_calls END AS fanout_ppm,
          CASE WHEN out_calls > 0
            THEN (1000000 * answered) // out_calls END AS answered_ppm,
          (1000000 * in_calls) // (in_calls + out_calls) AS in_share_ppm
        FROM j)
      SELECT subscriber, out_calls, n_destinations, answered, in_calls,
        fanout_ppm, answered_ppm, in_share_ppm,
        (out_calls >= 20 AND in_share_ppm <= 50000
          AND fanout_ppm >= 600000 AND answered_ppm >= 500000)
          AS simbox_flag
      FROM f ORDER BY subscriber"""))

  /** IRSF (international-revenue-share-fraud) screen — the
    * DESTINATION-VALUE lens completing the fraud family
    * ([[wangiriCard]]: ring-and-cut bait; [[botCadenceCard]]: machine
    * pacing; q246 velocity: volume; [[simboxCard]]: directional
    * imbalance). An IRSF runner looks healthy on all four — it places
    * ordinary-looking answered calls — because its tell is WHERE the
    * traffic goes: premium-rate destinations the fraudster collects
    * revenue share from, pumped across several numbers to stay under
    * per-number caps. Per caller, against a broadcast destination rate
    * dim: call/duration totals, the premium slice, distinct premium
    * destinations, the exact-ppm premium DURATION share (duration is
    * what settles, so it is what the screen must weigh), and the
    * composite verdict (calls ≥ minCalls ∧ share ≥ minShare ∧ distinct
    * premium dests ≥ minDests — the spread across destinations is what
    * separates a fraud runner from one legitimate premium-service
    * fan). A destination missing from the dim reads non-premium
    * (never-drop; an unknown rate cannot convict), and a caller with
    * zero total duration keeps NULL share, unflagged.
    *
    * Scale shape: one broadcast join on the |destinations|-sized rate
    * dim + ONE caller-grain hash agg — no windows, no self-join. */
  def irsfCard(calls: DataFrame, rateDim: DataFrame,
      minCalls: Long = 10L, minPremiumSharePpm: Long = 400000L,
      minPremiumDests: Long = 3L): DataFrame = {
    require(minCalls >= 1L, s"minCalls must be >= 1, got $minCalls")
    calls
      .join(broadcast(rateDim.select(col("dest"), col("premium"))),
        Seq("dest"), "left")
      .withColumn("premium", coalesce(col("premium"), lit(false)))
      .groupBy(col("caller").as("subscriber"))
      .agg(count(lit(1)).as("n_calls"),
        sum(col("dur_centi")).as("dur_centi"),
        sum(when(col("premium"), 1L).otherwise(0L)).as("premium_calls"),
        sum(when(col("premium"), col("dur_centi")).otherwise(0L))
          .as("premium_dur_centi"),
        countDistinct(when(col("premium"), col("dest")))
          .as("n_premium_dests"))
      .withColumn("premium_share_ppm", expr(
        """CASE WHEN dur_centi > 0 THEN
             (1000000 * premium_dur_centi) DIV dur_centi END"""))
      .withColumn("irsf_flag",
        col("n_calls") >= minCalls &&
          coalesce(col("premium_share_ppm") >= minPremiumSharePpm,
            lit(false)) &&
          col("n_premium_dests") >= minPremiumDests)
  }

  /** Oracle fixture of [[irsfCard]]: callers are users, destinations
    * hash onto the 25 nations, and the rate dim marks region-4 nations
    * premium (5 of 25) — so every caller spreads ~20% of calls across
    * 5 premium destinations, and the screen separates on the DURATION
    * share: only callers whose premium calls happen to run long clear
    * the 247000-ppm bar (the threshold sits at the fixture's ~P80 so
    * both verdicts carry rows). */
  private val q332 = GQuery(
    "q332_irsf_screen",
    (s, dir) => irsfCard(
      t(s, dir, "events").select(
        col("user_id").as("caller"),
        expr("(event_id * 104729) % 25").as("dest"),
        expr("CAST(round(value * 100) AS BIGINT)").as("dur_centi")),
      t(s, dir, "nation").select(
        col("n_nationkey").cast(LongType).as("dest"),
        (col("n_regionkey") === 4).as("premium")),
      minCalls = 10L, minPremiumSharePpm = 247000L,
      minPremiumDests = 3L)
      .orderBy(col("subscriber")),
    Some("""WITH calls AS (SELECT user_id AS caller,
          (event_id * 104729) % 25 AS dest,
          CAST(round(value * 100) AS BIGINT) AS dur_centi
        FROM events),
      dim AS (SELECT CAST(n_nationkey AS BIGINT) AS dest,
          n_regionkey = 4 AS premium
        FROM nation),
      j AS (SELECT caller, calls.dest, dur_centi,
          COALESCE(premium, FALSE) AS premium
        FROM calls LEFT JOIN dim ON dim.dest = calls.dest),
      a AS (SELECT caller AS subscriber,
          CAST(COUNT(*) AS BIGINT) AS n_calls,
          CAST(SUM(dur_centi) AS BIGINT) AS dur_centi,
          CAST(SUM(CASE WHEN premium THEN 1 ELSE 0 END) AS BIGINT)
            AS premium_calls,
          CAST(SUM(CASE WHEN premium THEN dur_centi ELSE 0 END)
            AS BIGINT) AS premium_dur_centi,
          CAST(COUNT(DISTINCT CASE WHEN premium THEN dest END)
            AS BIGINT) AS n_premium_dests
        FROM j GROUP BY 1),
      f AS (SELECT *,
          CASE WHEN dur_centi > 0 THEN
            (1000000 * premium_dur_centi) // dur_centi END
            AS premium_share_ppm
        FROM a)
      SELECT subscriber, n_calls, dur_centi, premium_calls,
        premium_dur_centi, n_premium_dests, premium_share_ppm,
        (n_calls >= 10
          AND COALESCE(premium_share_ppm >= 247000, FALSE)
          AND n_premium_dests >= 3) AS irsf_flag
      FROM f ORDER BY subscriber"""))

  val queries: Seq[GQuery] = Seq(q256, q257, q258, q260, q266, q267, q294,
    q276, q277, q278, q286, q308, q317, q332)
}
