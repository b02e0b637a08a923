package graft.queries

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import Dsl._

/** Event-stream shapes (SURVEY §2A/§2B streaming rows), run in batch here so
  * the DuckDB oracle can check them; the same expressions run unchanged
  * under `readStream` (see graft.streaming and the streaming specs).
  */
object EventQ {

  final case class Ev(user_id: Long, event_type: String, value: Double)

  import org.apache.spark.sql.{Encoder, Encoders}
  import org.apache.spark.sql.expressions.Aggregator

  object CountEv extends Aggregator[Ev, Long, Long] {
    def zero = 0L
    def reduce(b: Long, a: Ev): Long = b + 1
    def merge(x: Long, y: Long): Long = x + y
    def finish(r: Long): Long = r
    def bufferEncoder: Encoder[Long] = Encoders.scalaLong
    def outputEncoder: Encoder[Long] = Encoders.scalaLong
  }

  object SumUsers extends Aggregator[Ev, Long, Long] {
    def zero = 0L
    def reduce(b: Long, a: Ev): Long = b + a.user_id
    def merge(x: Long, y: Long): Long = x + y
    def finish(r: Long): Long = r
    def bufferEncoder: Encoder[Long] = Encoders.scalaLong
    def outputEncoder: Encoder[Long] = Encoders.scalaLong
  }

  /** Tumbling window aggregation — `window()` is the batch/streaming-shared
    * primitive; oracle reproduces the epoch-aligned 6h buckets
    * arithmetically. */
  private val q36 = GQuery(
    "q36_tumbling_window",
    (s, dir) => {
      t(s, dir, "events")
        .groupBy(window(col("ts"), "6 hours"), col("event_type"))
        .agg(count(lit(1)).as("n"), moneySum(col("value")).as("sum_value"))
        .select(tsStr(col("window.start")).as("window_start"), col("event_type"),
          col("n"), col("sum_value"))
        .orderBy(col("window_start"), col("event_type"))
    },
    Some(s"""SELECT
      strftime(to_timestamp(((epoch_us(ts) // 1000000) // 21600) * 21600), '%Y-%m-%d %H:%M:%S') AS window_start,
      event_type, COUNT(*) AS n, ${moneySumSql("value")} AS sum_value
    FROM events
    GROUP BY 1, 2
    ORDER BY window_start, event_type"""))

  /** Session windows (30-minute inactivity gap) per user — the call/session
    * aggregation shape. Oracle rebuilds sessions with lag + cumulative sum. */
  private val q37 = GQuery(
    "q37_session_window",
    (s, dir) => {
      t(s, dir, "events")
        .groupBy(session_window(col("ts"), "30 minutes"), col("user_id"))
        .agg(count(lit(1)).as("n_events"), moneySum(col("value")).as("sum_value"))
        .select(col("user_id"),
          tsStr(col("session_window.start")).as("session_start"),
          col("n_events"), col("sum_value"))
        .orderBy(col("user_id"), col("session_start"))
    },
    Some(s"""WITH marked AS (
      SELECT user_id, ts, value,
        CASE WHEN LAG(ts) OVER (PARTITION BY user_id ORDER BY ts) IS NULL
               OR ts >= LAG(ts) OVER (PARTITION BY user_id ORDER BY ts)
                        + INTERVAL 30 MINUTE
             THEN 1 ELSE 0 END AS new_session
      FROM events),
    sessions AS (
      SELECT user_id, ts, value,
        SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts
          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_id
      FROM marked)
    SELECT user_id,
      ${tsStrSql("MIN(ts)")} AS session_start,
      COUNT(*) AS n_events, ${moneySumSql("value")} AS sum_value
    FROM sessions
    GROUP BY user_id, session_id
    ORDER BY user_id, session_start"""))

  /** Sliding windows (1h window, 15m slide): each event lands in 4 windows.
    * Oracle expands the window set with generate_series + unnest. */
  private val q38 = GQuery(
    "q38_sliding_window",
    (s, dir) => {
      t(s, dir, "events")
        .groupBy(window(col("ts"), "1 hour", "15 minutes"))
        .agg(count(lit(1)).as("n"), moneySum(col("value")).as("sum_value"))
        .select(tsStr(col("window.start")).as("window_start"), col("n"), col("sum_value"))
        .orderBy(col("window_start"))
    },
    Some(s"""WITH expanded AS (
      SELECT to_timestamp(w) AS window_start, value
      FROM events,
        UNNEST(generate_series(
          (((epoch_us(ts) // 1000000)) // 900) * 900 - 2700,
          (((epoch_us(ts) // 1000000)) // 900) * 900,
          900)) AS t(w))
    SELECT ${tsStrSql("window_start")} AS window_start,
      COUNT(*) AS n, ${moneySumSql("value")} AS sum_value
    FROM expanded
    GROUP BY window_start
    ORDER BY window_start"""))

  /** JSON extraction from the props payload via schema'd `from_json` —
    * ONE Jackson parser per task. The ad-hoc alternative
    * `get_json_object(props, "$.k")` builds a parser per ROW (and its
    * per-row ThreadLocal buffer-recycler lookup degenerates badly on a
    * polluted executor thread — see [[AnalyticsQ.pearsonCorr]]); path
    * extraction is for exploration, schema'd parse is the pipeline
    * shape. */
  private val q22 = GQuery(
    "q22_json_extract",
    (s, dir) => {
      val props = StructType(Seq(StructField("k", LongType)))
      t(s, dir, "events")
        .select(col("event_type"),
          from_json(col("props"), props).getField("k").as("k_val"))
        .groupBy(col("event_type"))
        .agg(sum(col("k_val")).as("sum_k"),
          count(col("k_val")).as("n_with_k"),
          max(col("k_val")).as("max_k"))
        .orderBy(col("event_type"))
    },
    Some("""SELECT event_type,
      CAST(SUM(k_val) AS BIGINT) AS sum_k,
      COUNT(k_val) AS n_with_k,
      MAX(k_val) AS max_k
    FROM (SELECT event_type,
            CAST(json_extract_string(props, '$.k') AS BIGINT) AS k_val
          FROM events)
    GROUP BY event_type
    ORDER BY event_type"""))

  /** Pivot: per-user event-type counts as columns (dynamic demux to a fixed
    * schema — the reference's route-by-type shape, `MFramework.cpp:1372`). */
  private val q23 = GQuery(
    "q23_pivot",
    (s, dir) => {
      val types = Seq("click", "error", "purchase", "signup", "view")
      t(s, dir, "events")
        .groupBy(col("user_id"))
        .pivot("event_type", types)
        .agg(count(lit(1)))
        .na.fill(0, types)
        .orderBy(col("user_id"))
    },
    Some("""SELECT user_id,
      COUNT(CASE WHEN event_type = 'click' THEN 1 END) AS click,
      COUNT(CASE WHEN event_type = 'error' THEN 1 END) AS error,
      COUNT(CASE WHEN event_type = 'purchase' THEN 1 END) AS purchase,
      COUNT(CASE WHEN event_type = 'signup' THEN 1 END) AS signup,
      COUNT(CASE WHEN event_type = 'view' THEN 1 END) AS view
    FROM events
    GROUP BY user_id
    ORDER BY user_id"""))

  /** Typed Dataset pipeline (SURVEY §1.3: `Dataset[T]` for typed stages):
    * case-class rows, groupByKey + typed Aggregators — compile-checked
    * fields; long sums are associative so any merge order is exact. */
  private val q46 = GQuery(
    "q46_typed_agg",
    (s, dir) => {
      import s.implicits._
      val ds = t(s, dir, "events")
        .select(col("user_id"), col("event_type"), col("value")).as[EventQ.Ev]
      ds.groupByKey(_.event_type)
        .agg(EventQ.CountEv.toColumn.name("n"),
          EventQ.SumUsers.toColumn.name("sum_users"))
        .toDF("event_type", "n", "sum_users")
        .orderBy(col("event_type"))
    },
    Some("""SELECT event_type, COUNT(user_id) AS n,
      CAST(SUM(user_id) AS BIGINT) AS sum_users
    FROM events
    GROUP BY event_type
    ORDER BY event_type"""))

  /** Bucketized temporal range self-join: for each event, count OTHER
    * events within ±`windowSec` seconds. The naive formulation is a
    * non-equi self-join (O(n²), and Spark would plan a nested-loop);
    * bucketizing turns it into an EQUI join: each probe event lands in
    * one `windowSec`-wide time cell, the build side replicates into its
    * own and both adjacent cells, and the equi-join on the cell plus a
    * residual |Δ| filter finds every qualifying pair exactly once. Cost
    * is O(pairs-within-window) after one hash shuffle on the cell — the
    * standard range-join-at-scale shape (same trick as the LSH band
    * join). A hot cell (event burst) is a skew key: AQE skew-join
    * handles moderate cases; salt the cell for pathological ones.
    *
    * Left join, so isolated events report n_concurrent = 0 instead of
    * vanishing. Returns (event_id, n_concurrent).
    */
  def concurrentCounts(events: org.apache.spark.sql.DataFrame,
      windowSec: Long): org.apache.spark.sql.DataFrame = {
    require(windowSec >= 1, s"windowSec must be >= 1, got $windowSec")
    val secs = events.select(col("event_id"),
      col("ts").cast(LongType).as("sec"))
    val probe = secs.withColumn("cell", expr(s"sec div $windowSec"))
    val build = secs.select(col("event_id").as("r_id"), col("sec").as("r_sec"))
      .select(col("r_id"), col("r_sec"), explode(expr(
        s"array(r_sec div $windowSec - 1, r_sec div $windowSec, r_sec div $windowSec + 1)")).as("cell"))
    probe.join(build,
        probe("cell") === build("cell") &&
          abs(probe("sec") - build("r_sec")) <= windowSec &&
          probe("event_id") =!= build("r_id"),
        "left_outer")
      .groupBy(probe("event_id"))
      .agg(count(col("r_id")).as("n_concurrent"))
  }

  /** Oracle fixture of [[concurrentCounts]] (±1 hour): DuckDB checks the
    * bucketized plan against the naive inequality join it optimizes. */
  private val q68 = GQuery(
    "q68_range_join",
    (s, dir) => concurrentCounts(t(s, dir, "events"), windowSec = 3600L)
      .orderBy(col("event_id")),
    Some("""WITH e AS (SELECT event_id,
          CAST(epoch_us(ts) // 1000000 AS BIGINT) AS sec FROM events)
      SELECT l.event_id, CAST(COUNT(r.event_id) AS BIGINT) AS n_concurrent
      FROM e l LEFT JOIN e r
        ON abs(l.sec - r.sec) <= 3600 AND l.event_id != r.event_id
      GROUP BY l.event_id
      ORDER BY l.event_id"""))

  /** General interval-overlap join — the two-sided lift of
    * [[concurrentCounts]]'s point band join: pair every left interval
    * `[lStart, lEnd]` with every right interval `[rStart, rEnd]` that
    * overlaps it (closed-interval semantics: touching endpoints match).
    * The workhorse behind session-vs-incident attribution, ad-exposure ×
    * visit windows, and maintenance-window exclusion — queries usually
    * written as the naive `l.s <= r.e AND r.s <= l.e` theta join, which
    * Spark can only plan as a nested loop (O(|L|·|R|) comparisons).
    *
    * Plan: bucketize. Each side explodes into the `cellWidth`-wide cells
    * its interval covers, the join is an equi hash join on the cell, and
    * two residuals restore exactness: the overlap predicate itself, and
    * the de-dup anchor `cell = floor(greatest(lStart, rStart) /
    * cellWidth)` — the overlap's left edge lies in both intervals, so
    * every qualifying pair meets in exactly that one cell and in no
    * other. Cost is O(pairs-in-same-cell), and replication is
    * `len/cellWidth + 1` rows per interval, so pick `cellWidth` near the
    * typical interval length (≈1–2 cells per row). The oracle for q175
    * is the NAIVE theta join, so the hash-match proves the bucketized
    * plan result-identical (the q96 salting / q68 band pattern).
    *
    * Floor division via the pmod subtraction (the [[gapFill]] rule) keeps
    * pre-1970 timestamps in the right cell in both engines. A row whose
    * interval is inverted (`end < start`) or covers more than
    * `maxCellsPerRow` cells fails loudly with a named error instead of
    * silently exploding the replication (the repo-wide guard
    * convention) — a runaway open-ended interval at 100 TB should abort,
    * not OOM a reducer. NULL bounds drop (no cell), matching the naive
    * join which never passes a NULL comparison.
    *
    * Scale shape: one Generate + one hash exchange per side on the cell
    * key; a hot cell (burst of concurrent intervals) is an AQE-skew /
    * salting case like any hot join key. Returns left.* ++ right.*
    * (names must be disjoint — enforced). */
  def overlapJoin(left: org.apache.spark.sql.DataFrame,
      right: org.apache.spark.sql.DataFrame,
      lStart: String, lEnd: String, rStart: String, rEnd: String,
      cellWidth: Long, maxCellsPerRow: Int = 4096)
      : org.apache.spark.sql.DataFrame = {
    require(cellWidth >= 1, s"cellWidth must be >= 1, got $cellWidth")
    require(maxCellsPerRow >= 1,
      s"maxCellsPerRow must be >= 1, got $maxCellsPerRow")
    val shared = left.columns.toSet.intersect(right.columns.toSet)
    require(shared.isEmpty,
      s"left/right column names must be disjoint; shared: ${shared.mkString(", ")}")
    def fdSql(x: String) = s"(($x - pmod($x, $cellWidth)) DIV $cellWidth)"
    // the guard rides inside the sequence bound so column pruning can
    // never drop it: an invalid row errors the moment its cells build
    def cells(df: org.apache.spark.sql.DataFrame, s: String, e: String,
        side: String) =
      df.withColumn("__cell", explode(expr(
        s"""sequence(${fdSql(s)},
          CASE WHEN $e < $s THEN raise_error(concat(
              'graft.overlapJoin: $side interval inverted: [',
              CAST($s AS STRING), ',', CAST($e AS STRING), ']'))
            WHEN ${fdSql(e)} - ${fdSql(s)} >= $maxCellsPerRow THEN raise_error(concat(
              'graft.overlapJoin: $side interval spans >= $maxCellsPerRow cells of width $cellWidth: [',
              CAST($s AS STRING), ',', CAST($e AS STRING), ']'))
            ELSE ${fdSql(e)} END)""")))
    val lc = cells(left, lStart, lEnd, "left")
    val rc = cells(right, rStart, rEnd, "right")
    lc.join(rc, lc("__cell") === rc("__cell") &&
        col(lStart) <= col(rEnd) && col(rStart) <= col(lEnd) &&
        lc("__cell") === expr(
          s"((greatest($lStart, $rStart) - pmod(greatest($lStart, $rStart), $cellWidth)) DIV $cellWidth)"))
      .drop("__cell")
  }

  /** Oracle fixture of [[overlapJoin]]: click exposure windows (30 min)
    * × error incident windows (15 min), checked against the naive
    * inequality join the bucketized plan optimizes. */
  private val q175 = GQuery(
    "q175_overlap_join",
    (s, dir) => {
      val ev = t(s, dir, "events").select(col("event_id"),
        col("ts").cast(LongType).as("sec"), col("event_type"))
      val l = ev.filter(col("event_type") === "click")
        .select(col("event_id").as("l_id"), col("sec").as("l_start"),
          (col("sec") + 1800L).as("l_end"))
      val r = ev.filter(col("event_type") === "error")
        .select(col("event_id").as("r_id"), col("sec").as("r_start"),
          (col("sec") + 900L).as("r_end"))
      overlapJoin(l, r, "l_start", "l_end", "r_start", "r_end",
          cellWidth = 1800L)
        .select(col("l_id"), col("r_id"),
          (least(col("l_end"), col("r_end")) -
            greatest(col("l_start"), col("r_start"))).as("overlap_sec"))
        .orderBy(col("l_id"), col("r_id"))
    },
    Some(s"""WITH e AS (SELECT event_id, ${epochSecSql("ts")} AS sec,
          event_type FROM events),
      l AS (SELECT event_id AS l_id, sec AS l_start, sec + 1800 AS l_end
            FROM e WHERE event_type = 'click'),
      r AS (SELECT event_id AS r_id, sec AS r_start, sec + 900 AS r_end
            FROM e WHERE event_type = 'error')
      SELECT l_id, r_id,
        LEAST(l_end, r_end) - GREATEST(l_start, r_start) AS overlap_sec
      FROM l JOIN r ON l_start <= r_end AND r_start <= l_end
      ORDER BY l_id, r_id"""))

  /** Regular-grid resampling with forward fill — the feature-engineering
    * step that turns an irregular event stream into the fixed-step series
    * a model consumes: time buckets of `stepSec`, one row per (key, cell)
    * from the key's first to last observed cell, gaps carrying the last
    * observed value forward. Cell value = the LATEST event in the cell
    * (ts, then `ordCol` as the replay-stable tiebreak — the same rule as
    * [[WindowQ.latestPerKey]]).
    *
    * Scale shape: the per-cell collapse and the span are aggregations on
    * (key[, cell]); the grid explodes from the tiny per-key span table;
    * fill is ONE window per key ordered by cell. Everything partitions by
    * key — dense keys parallelize across cells only within one partition,
    * so at extreme per-key density bucket the window by coarse time first
    * (the classic two-level fill). The leading cell is observed by
    * construction, so `filled` is never NULL. */
  def gapFill(df: org.apache.spark.sql.DataFrame, keyCol: String,
      tsCol: String, ordCol: String, valueCol: String,
      stepSec: Long): org.apache.spark.sql.DataFrame = {
    require(stepSec >= 1, s"stepSec must be >= 1, got $stepSec")
    val stepUs = stepSec * 1000000L
    val obs = df
      // floor division (DIV truncates toward zero; pre-1970 cells would
      // shift by one vs the oracle's `//`) — subtract the positive pmod
      // first so the quotient is exact floor
      .withColumn("cell", expr(
        s"(unix_micros($tsCol) - pmod(unix_micros($tsCol), $stepUs)) DIV $stepUs"))
      .groupBy(col(keyCol), col("cell"))
      .agg(max(struct(col(tsCol), col(ordCol), col(valueCol))).as("m"))
      .select(col(keyCol), col("cell"), col(s"m.$valueCol").as("v_obs"))
    val grid = obs.groupBy(col(keyCol))
      .agg(min(col("cell")).as("c0"), max(col("cell")).as("c1"))
      .select(col(keyCol), explode(expr("sequence(c0, c1)")).as("cell"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(keyCol)).orderBy(col("cell"))
    grid.join(obs, Seq(keyCol, "cell"), "left")
      .withColumn("filled", last(col("v_obs"), ignoreNulls = true).over(w))
      .withColumn("is_gap", col("v_obs").isNull)
      .select(col(keyCol), col("cell"), col("filled"), col("is_gap"))
  }

  /** Oracle fixture of [[gapFill]]: per-user event values resampled to a
    * 6-hour grid with forward fill. */
  private val q84 = GQuery(
    "q84_gap_fill",
    (s, dir) => gapFill(t(s, dir, "events"), "user_id", "ts", "event_id",
        "value", 21600)
      .orderBy(col("user_id"), col("cell")),
    Some("""WITH obs AS (SELECT user_id, cell, value AS v_obs FROM (
          SELECT user_id, epoch_us(ts) // 21600000000 AS cell, value,
            ROW_NUMBER() OVER (PARTITION BY user_id, epoch_us(ts) // 21600000000
              ORDER BY ts DESC, event_id DESC) AS rn
          FROM events) WHERE rn = 1),
      span AS (SELECT user_id, MIN(cell) AS c0, MAX(cell) AS c1
               FROM obs GROUP BY 1),
      grid AS (SELECT user_id, u.cell
               FROM span, UNNEST(generate_series(c0, c1)) AS u(cell)),
      j AS (SELECT g.user_id, g.cell, o.v_obs
            FROM grid g LEFT JOIN obs o
              ON g.user_id = o.user_id AND g.cell = o.cell)
    SELECT user_id, cell,
      last_value(v_obs IGNORE NULLS)
        OVER (PARTITION BY user_id ORDER BY cell) AS filled,
      v_obs IS NULL AS is_gap
    FROM j
    ORDER BY user_id, cell"""))

  /** Count-min sketch point estimates for the five event types. At
    * width 256 the fixed per-row hashes are verified collision-free for
    * THIS item set (the oracle pins it — see the CountMinSketch doc), so
    * the estimates equal the exact counts and DuckDB can hash-check the
    * whole sketch path (build → merge across partitions → point query);
    * the over-count-under-pressure guarantee is AggregatorsSpec's job.
    * Zero estimates are filtered: the sketch answers every QUERIED item,
    * the oracle's GROUP BY only emits types PRESENT — without the filter
    * the fixture would rely on all five types existing at every scale
    * factor. */
  private val q97 = GQuery(
    "q97_cms_counts",
    (s, dir) => {
      import s.implicits._
      val types = Seq("click", "error", "purchase", "signup", "view")
      val cms = new graft.functions.Aggregators.CountMinSketch(256, 4)
        .queries(types)
      t(s, dir, "events")
        .select(col("event_type")).as[String]
        .select(cms.toColumn.name("sketch"))
        .select(explode(col("sketch")).as(Seq("event_type", "est")))
        .filter(col("est") > 0)
        .orderBy(col("event_type"))
    },
    Some("""SELECT event_type, COUNT(*) AS est
      FROM events
      GROUP BY event_type
      ORDER BY event_type"""))

  /** Leakage-safe temporal train/eval split: assign whole SESSIONS, not
    * events, to each side of the time boundary. A plain `ts < T` split
    * leaks — the tail of a session that straddles T carries answers
    * about its head across the boundary (same user, same intent,
    * minutes apart), which inflates eval exactly like the q81/q134
    * near-dup leakage this engine guards document splits against. Rule:
    * a session goes to train only if it ENDS before the boundary, to
    * eval only if it STARTS at/after it; straddlers are dropped and
    * REPORTED (silently folding them into either side is the leak).
    *
    * The boundary is data-derived and exact — min + (span·permille) DIV
    * 1000 in floor epoch seconds — so re-running on the same corpus
    * reproduces the same split with no wall clock involved. Plan:
    * Spark's native `session_window` aggregation (one shuffle on
    * user_id), a broadcast 1-row bounds join, map-side labeling, and a
    * 3-row summary — sessionization cost, nothing more.
    */
  def temporalSessionSplit(events: org.apache.spark.sql.DataFrame,
      gap: String = "30 minutes",
      trainPermille: Int = 800): org.apache.spark.sql.DataFrame = {
    require(trainPermille > 0 && trainPermille < 1000,
      s"trainPermille must be in (0,1000), got $trainPermille")
    val sec = col("ts").cast(LongType)
    val bounds = events.agg(min(sec).as("mn"), max(sec).as("mx"))
    events
      .groupBy(session_window(col("ts"), gap).as("sw"), col("user_id"))
      .agg(count(lit(1)).as("n_ev"), min(sec).as("first_sec"),
        max(sec).as("last_sec"))
      .crossJoin(broadcast(bounds))
      .withColumn("bd", expr(s"mn + ((mx - mn) * $trainPermille) div 1000"))
      .withColumn("split", expr(
        """CASE WHEN last_sec < bd THEN 'train'
                WHEN first_sec >= bd THEN 'eval'
                ELSE 'dropped' END"""))
      .groupBy(col("split"))
      .agg(count(lit(1)).as("n_sessions"), sum(col("n_ev")).as("n_events"),
        countDistinct(col("user_id")).as("n_users"))
  }

  private val q169 = GQuery(
    "q169_temporal_split",
    (s, dir) => temporalSessionSplit(t(s, dir, "events"))
      .orderBy(col("split")),
    Some("""WITH b AS (
        SELECT MIN(epoch_us(ts) // 1000000) AS mn,
               MAX(epoch_us(ts) // 1000000) AS mx
        FROM events),
      marked AS (
        SELECT user_id, ts,
          CASE WHEN LAG(ts) OVER (PARTITION BY user_id ORDER BY ts) IS NULL
                 OR ts >= LAG(ts) OVER (PARTITION BY user_id ORDER BY ts)
                          + INTERVAL 30 MINUTE
               THEN 1 ELSE 0 END AS new_session
        FROM events),
      sessions AS (
        SELECT user_id, ts,
          SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_id
        FROM marked),
      sess AS (
        SELECT user_id, session_id, COUNT(*) AS n_ev,
          MIN(epoch_us(ts) // 1000000) AS first_sec,
          MAX(epoch_us(ts) // 1000000) AS last_sec
        FROM sessions GROUP BY 1, 2),
      lab AS (
        SELECT user_id, n_ev,
          CASE WHEN last_sec < mn + ((mx - mn) * 800) // 1000 THEN 'train'
               WHEN first_sec >= mn + ((mx - mn) * 800) // 1000 THEN 'eval'
               ELSE 'dropped' END AS split
        FROM sess, b)
    SELECT split, COUNT(*) AS n_sessions,
      CAST(SUM(n_ev) AS BIGINT) AS n_events,
      COUNT(DISTINCT user_id) AS n_users
    FROM lab GROUP BY split
    ORDER BY split"""))

  /** Out-of-order arrival card — how badly does INGESTION order disagree
    * with EVENT TIME: per type, the share of adjacent event-time-ordered
    * pairs whose ingestion sequence (event_id here — monotone with
    * arrival in the fixture's generator, as in most log pipelines) runs
    * BACKWARD, plus the worst timestamp regression a sequential reader
    * would observe. The number that sizes streaming watermarks: a
    * 50 000 ppm inversion rate with 10-minute regressions needs a
    * 10-minute watermark, not a 10-second one ([[graft.streaming]]'s
    * delayThreshold inputs come from exactly this card).
    *
    * Scale shape: the naive form is one window per TYPE — and unlike
    * per-user windows, the type count does NOT grow with the data, so a
    * per-type sort single-threads at scale (a first draft probed 3.06×
    * at 10×). Both passes therefore bucket their SORT-KEY PREFIX
    * (event-time buckets for the adjacency pass, sequence buckets for
    * the running max) so windows run per (type, bucket) in parallel,
    * and the cross-bucket seams stitch through TINY bucket tables: the
    * adjacency pass compares each bucket's first row against the
    * previous bucket's last (buckets partition the sort order, so
    * within-bucket lags + boundary pairs are EXACTLY all adjacent
    * pairs), and the running-max pass adds a broadcast exclusive
    * prefix-max over per-bucket maxima (the q148/q124 bucket-offset
    * construction, with max as the prefix monoid). */
  def outOfOrderCard(events: DataFrame, typeCol: String = "event_type",
      seqCol: String = "event_id", tsCol: String = "ts",
      bucketSec: Long = 86400L, bucketSeq: Long = 100000L): DataFrame = {
    require(bucketSec >= 1 && bucketSeq >= 1,
      s"bucket widths must be >= 1, got $bucketSec/$bucketSeq")
    val base = events.select(col(typeCol).as("ty"), col(seqCol).as("seq"),
      col(tsCol).cast(LongType).as("sec"))
    // --- adjacency pass: (sec, seq) order, bucketed by sec ------------
    val bk = base.withColumn("b",
      expr(s"(sec - pmod(sec, ${bucketSec}L)) DIV ${bucketSec}L"))
    val wIn = Window.partitionBy(col("ty"), col("b"))
      .orderBy(col("sec"), col("seq"))
    val inner = bk.withColumn("prev_seq", lag(col("seq"), 1).over(wIn))
      .filter(col("prev_seq").isNotNull)
      .select(col("ty"),
        when(col("seq") < col("prev_seq"), 1L).otherwise(0L).as("inv"))
    val ends = bk.groupBy(col("ty"), col("b"))
      .agg(min(struct(col("sec"), col("seq"))).as("first"),
        max(struct(col("sec"), col("seq"))).as("last"))
    val wB = Window.partitionBy(col("ty")).orderBy(col("b"))
    val seams = ends
      .withColumn("prev_last", lag(col("last"), 1).over(wB))
      .filter(col("prev_last").isNotNull)
      .select(col("ty"),
        when(col("first.seq") < col("prev_last.seq"), 1L).otherwise(0L)
          .as("inv"))
    val invAgg = inner.unionAll(seams).groupBy(col("ty"))
      .agg(count(lit(1)).as("n_pairs"), sum(col("inv")).as("n_inversions"))
    // --- running-max pass: seq order, bucketed by seq -----------------
    val sk = base.withColumn("sb",
      expr(s"(seq - pmod(seq, ${bucketSeq}L)) DIV ${bucketSeq}L"))
    val offsets = sk.groupBy(col("ty"), col("sb"))
      .agg(max(col("sec")).as("bmax"))
      .withColumn("pre_max", max(col("bmax")).over(
        Window.partitionBy(col("ty")).orderBy(col("sb"))
          .rowsBetween(Window.unboundedPreceding, -1)))
      .select(col("ty"), col("sb"), col("pre_max"))
    val wS = Window.partitionBy(col("ty"), col("sb")).orderBy(col("seq"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val regress = sk
      .withColumn("in_max", max(col("sec")).over(wS))
      .join(offsets, Seq("ty", "sb"))
      .withColumn("max_seen", greatest(
        coalesce(col("in_max"), lit(Long.MinValue)),
        coalesce(col("pre_max"), lit(Long.MinValue))))
      .filter(col("max_seen") =!= Long.MinValue)
      .groupBy(col("ty"))
      .agg(max(greatest(col("max_seen") - col("sec"), lit(0L)))
        .as("max_regression_sec"))
    invAgg.join(regress, Seq("ty"))
      .select(col("ty").as(typeCol), col("n_pairs"), col("n_inversions"),
        expr("(1000000 * n_inversions) DIV n_pairs").as("inversion_ppm"),
        col("max_regression_sec"))
  }

  /** Oracle fixture of [[outOfOrderCard]]. */
  private val q220 = GQuery(
    "q220_out_of_order",
    (s, dir) => outOfOrderCard(t(s, dir, "events"))
      .orderBy(col("event_type")),
    Some(s"""WITH e AS (SELECT event_type, event_id AS seq,
          ${epochSecSql("ts")} AS sec FROM events),
      m AS (SELECT event_type,
          CASE WHEN seq < LAG(seq) OVER (PARTITION BY event_type
            ORDER BY sec, seq) THEN 1 ELSE 0 END AS inv,
          LAG(seq) OVER (PARTITION BY event_type ORDER BY sec, seq)
            AS prev_seq
        FROM e),
      inv AS (SELECT event_type, COUNT(*) AS n_pairs,
          CAST(SUM(inv) AS BIGINT) AS n_inversions
        FROM m WHERE prev_seq IS NOT NULL GROUP BY event_type),
      r AS (SELECT event_type,
          CAST(MAX(greatest(mx - sec, 0)) AS BIGINT) AS max_regression_sec
        FROM (SELECT event_type, sec,
            MAX(sec) OVER (PARTITION BY event_type ORDER BY seq
              ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS mx
          FROM e)
        WHERE mx IS NOT NULL GROUP BY event_type)
      SELECT inv.event_type, n_pairs, n_inversions,
        (1000000 * n_inversions) // n_pairs AS inversion_ppm,
        max_regression_sec
      FROM inv JOIN r USING (event_type)
      ORDER BY event_type"""))

  /** Prepaid balance replay — the stateful scan a prepaid rating engine
    * runs per account: top-ups credit, charges debit, and the balance
    * CLAMPS at zero (an overdraw attempt charges what's left, never goes
    * negative). The clamp makes this NON-ASSOCIATIVE — no window sum
    * expresses it — so each account's flow list folds in event order
    * through one codegen'd `aggregate` lambda (the [[TokenizerQ]]
    * mergeFold pattern applied to numeric state): both the running
    * balance and the overdraw count ride ONE packed BIGINT accumulator
    * (`zeros·10¹² + balance`; balances are bounded far below 10¹² centi,
    * and the fold is identical arithmetic in both engines, DuckDB
    * seeding list_reduce with a prepended 0).
    *
    * Scale shape: one per-account sort-free aggregation (sort_array of
    * the collected flow structs — per-account history, the
    * groupBy-collect bound every per-key scan shares; a pathological
    * account is a [[graft.etl.Skew]] case), then map-side folds. */
  def prepaidBalances(events: DataFrame, creditType: String = "signup",
      debitType: String = "purchase"): DataFrame = {
    require(creditType != debitType, "credit and debit types must differ")
    // Packing-bound guard (the raise_error convention): the packed
    // accumulator carries zeros·10¹² + balance, sound ONLY while the
    // balance stays below 10¹² centi. The clamp keeps the balance ≥ 0,
    // so only a CREDIT can breach the bound — and a 10¹⁰-currency-unit
    // top-up is a data error that must fail loudly, not silently leak
    // into the overdraw count.
    val packedFold =
      """aggregate(ds, CAST(0 AS BIGINT), (p, x) ->
           (p DIV 1000000000000 +
             CASE WHEN pmod(p, 1000000000000) + x < 0 THEN 1 ELSE 0 END)
           * 1000000000000
           + CASE WHEN pmod(p, 1000000000000) + x >= 1000000000000
               THEN raise_error(concat('graft.prepaidBalances: balance ',
                 'exceeds the 10^12-centi packing bound — a top-up this ',
                 'large is a data error, not a balance'))
             ELSE greatest(CAST(0 AS BIGINT), pmod(p, 1000000000000) + x)
             END)"""
    events
      .filter(col("event_type").isin(creditType, debitType))
      .select(col("user_id"), col("event_id"),
        col("ts").cast(LongType).as("sec"),
        when(col("event_type") === creditType,
          expr("CAST(round(value * 100) AS BIGINT)"))
          .otherwise(expr("-CAST(round(value * 100) AS BIGINT)"))
          .as("delta"))
      .groupBy(col("user_id"))
      .agg(count(lit(1)).as("n_flows"),
        sort_array(collect_list(struct(col("sec"), col("event_id"),
          col("delta")))).as("flows"))
      .withColumn("ds", expr("transform(flows, f -> f.delta)"))
      .withColumn("packed", expr(packedFold))
      .select(col("user_id"), col("n_flows"),
        expr("pmod(packed, 1000000000000)").as("final_balance_centi"),
        expr("packed DIV 1000000000000").as("n_overdraw_attempts"))
  }

  /** Oracle fixture of [[prepaidBalances]]: signup tops up, purchase
    * charges; DuckDB replays the identical packed fold via list_reduce
    * seeded with a prepended zero accumulator. */
  private val q219 = GQuery(
    "q219_prepaid_balance",
    (s, dir) => prepaidBalances(t(s, dir, "events"))
      .orderBy(col("user_id")),
    Some(s"""WITH f AS (SELECT user_id, event_id,
          ${epochSecSql("ts")} AS sec,
          CASE WHEN event_type = 'signup'
               THEN CAST(round(value * 100) AS BIGINT)
               ELSE -CAST(round(value * 100) AS BIGINT) END AS delta
        FROM events WHERE event_type IN ('signup', 'purchase')),
      g AS (SELECT user_id, COUNT(*) AS n_flows,
          list_transform(
            list_sort(list(struct_pack(sec := sec, event_id := event_id,
              delta := delta))),
            x -> x.delta) AS ds
        FROM f GROUP BY user_id),
      r AS (SELECT user_id, n_flows,
          list_reduce(list_prepend(CAST(0 AS BIGINT), ds), (p, x) ->
            (p // 1000000000000 +
              CASE WHEN p % 1000000000000 + x < 0 THEN 1 ELSE 0 END)
            * 1000000000000
            + greatest(CAST(0 AS BIGINT), p % 1000000000000 + x)) AS packed
        FROM g)
      SELECT user_id, n_flows,
        packed % 1000000000000 AS final_balance_centi,
        packed // 1000000000000 AS n_overdraw_attempts
      FROM r
      ORDER BY user_id"""))

  /** Duplicate-event suppression — the mediation "duplicate CDR" rule:
    * an event is a DUPLICATE when an identical record (same user, type,
    * and centi-value) was already seen within `windowSec` seconds —
    * retransmits, double-polls, at-least-once ingestion. Emits every
    * event with its verdict and the gap to the previous identical
    * record, so the suppression is auditable (the dead-letter
    * philosophy: never silently drop). First-of-chain semantics: each
    * event compares to its immediate identical PREDECESSOR, so a burst
    * of retransmits spaced just inside the window all suppress against
    * the chain even when the first and last are further apart.
    *
    * One lag window per identity key — single hash exchange; the
    * streaming twin is dropDuplicatesWithinWatermark (StreamingSpec's
    * dedup-in-watermark case) with this batch form as its oracle-checked
    * semantics. */
  def suppressDuplicates(events: DataFrame, windowSec: Long = 300L)
      : DataFrame = {
    require(windowSec >= 1, s"windowSec must be >= 1, got $windowSec")
    val w = Window
      .partitionBy(col("user_id"), col("event_type"), col("cv"))
      .orderBy(col("sec"), col("event_id"))
    events
      .select(col("event_id"), col("user_id"), col("event_type"),
        expr("CAST(round(value * 100) AS BIGINT)").as("cv"),
        col("ts").cast(LongType).as("sec"))
      .withColumn("prev_sec", lag(col("sec"), 1).over(w))
      .select(col("event_id"), col("user_id"), col("event_type"),
        col("cv"), (col("sec") - col("prev_sec")).as("gap_sec"),
        when(col("prev_sec").isNotNull &&
          col("sec") - col("prev_sec") <= windowSec, 1L).otherwise(0L)
          .as("is_duplicate"))
  }

  /** Oracle fixture of [[suppressDuplicates]] at a 1-hour window — wide
    * enough that the fixture's repeated (user, type, value) triples
    * produce both verdicts. */
  private val q212 = GQuery(
    "q212_duplicate_suppression",
    (s, dir) => suppressDuplicates(t(s, dir, "events"), windowSec = 3600L)
      .orderBy(col("event_id")),
    Some(s"""WITH e AS (SELECT event_id, user_id, event_type,
          CAST(round(value * 100) AS BIGINT) AS cv,
          ${epochSecSql("ts")} AS sec
        FROM events),
      m AS (SELECT *,
          LAG(sec) OVER (PARTITION BY user_id, event_type, cv
            ORDER BY sec, event_id) AS prev_sec
        FROM e)
      SELECT event_id, user_id, event_type, cv,
        sec - prev_sec AS gap_sec,
        CAST(CASE WHEN prev_sec IS NOT NULL AND sec - prev_sec <= 3600
             THEN 1 ELSE 0 END AS BIGINT) AS is_duplicate
      FROM m
      ORDER BY event_id"""))

  /** Tiered (progressive) rating — the charge calculation the
    * reference's rating plugins imply beyond a flat rate
    * (`gsmrating.sh:14` launches the GSM rating stage; real tariffs are
    * banded: the first N units at one rate, the next at another, like
    * progressive tax brackets). Given a usage column in integer units
    * and a tier list `(fromUnit, toUnit, rateCentiPerUnit)` (half-open
    * [from, to), last tier unbounded via Long.MaxValue), each record's
    * charge is Σ over tiers of rate · overlap(units, tier) — exact
    * centi-money longs, no floats. Zero/negative-usage records cover no
    * tier but are NEVER dropped (a zero-duration call is a normal CDR
    * and this module's dead-letter philosophy forbids silent loss): the
    * tier join is a LEFT join, so they rate at charge_centi = 0 and
    * still count in n_rated / total_units.
    *
    * Plan: the tier table is a LITERAL broadcast (tariffs are dozens of
    * rows); the per-record decomposition is one inner join on
    * `units > from` (each record matches only its covered tiers, ≤
    * |tiers| rows) plus a map-side overlap expression, then one hash agg
    * back to per-record, one to the report — all shuffles on the
    * grouping key, nothing data²-sized. At 100 TB this is a scan with a
    * fanout bounded by the tier count. */
  def tieredCharges(events: DataFrame, units: org.apache.spark.sql.Column,
      tiers: Seq[(Long, Long, Long)],
      keyCol: String = "event_type"): DataFrame = {
    require(tiers.nonEmpty, "tiers must be non-empty")
    require(tiers.sliding(2).forall {
      case Seq((_, e1, _), (s2, _, _)) => e1 == s2
      case _ => true
    }, s"tiers must be contiguous, got $tiers")
    require(tiers.head._1 == 0L, "first tier must start at 0")
    val spark = events.sparkSession
    import spark.implicits._
    val ttab = tiers.toDF("t_from", "t_to", "t_rate")
    val perTier = events
      .select(col("event_id"), col(keyCol), units.cast(LongType).as("u"))
      .join(broadcast(ttab), col("u") > col("t_from"), "left")
      .select(col("event_id"), col(keyCol),
        col("u"),
        (col("t_rate") * (least(col("u"), col("t_to")) - col("t_from")))
          .as("tier_charge"))
    perTier.groupBy(col("event_id"), col(keyCol))
      .agg(max(col("u")).as("units"),
        coalesce(sum(col("tier_charge")), lit(0L)).as("charge_centi"))
      .groupBy(col(keyCol))
      .agg(count(lit(1)).as("n_rated"),
        sum(col("units")).as("total_units"),
        sum(col("charge_centi")).as("total_charge_centi"),
        max(col("charge_centi")).as("max_charge_centi"))
  }

  /** Oracle fixture of [[tieredCharges]]: three-band tariff over the
    * events' centi-value usage, reported per event type. */
  private val q195 = {
    val tiers = Seq((0L, 5000L, 5L), (5000L, 20000L, 3L),
      (20000L, Long.MaxValue, 1L))
    val tiersSql = tiers.map { case (f, to, r) =>
      s"(${f}::BIGINT, ${to}::BIGINT, ${r}::BIGINT)" }.mkString(", ")
    GQuery(
      "q195_tiered_rating",
      (s, dir) => tieredCharges(t(s, dir, "events"),
          expr("CAST(round(value * 100) AS BIGINT)"), tiers)
        .orderBy(col("event_type")),
      Some(s"""WITH tiers(t_from, t_to, t_rate) AS (VALUES $tiersSql),
        ev AS (SELECT event_id, event_type,
                 CAST(round(value * 100) AS BIGINT) AS u FROM events),
        pt AS (SELECT event_id, event_type, u,
                 t_rate * (least(u, t_to) - t_from) AS tier_charge
               FROM ev LEFT JOIN tiers ON u > t_from),
        pe AS (SELECT event_id, event_type, MAX(u) AS units,
                 CAST(COALESCE(SUM(tier_charge), 0) AS BIGINT) AS charge_centi
               FROM pt GROUP BY 1, 2)
      SELECT event_type, COUNT(*) AS n_rated,
        CAST(SUM(units) AS BIGINT) AS total_units,
        CAST(SUM(charge_centi) AS BIGINT) AS total_charge_centi,
        CAST(MAX(charge_centi) AS BIGINT) AS max_charge_centi
      FROM pe GROUP BY event_type
      ORDER BY event_type"""))
  }

  /** Batch multi-leg (partial CDR) assembly — the oracle-checkable twin
    * of the streaming [[graft.streaming.LegAssembler]] (the reference's
    * prerating core job: partial records of one call arrive out of
    * order, duplicated, sometimes malformed; emit one assembled row per
    * call). Semantics mirror the stateful processor EXACTLY, with
    * end-of-data playing the timeout (every open call flushes
    * `complete = false`):
    *
    *  - legs with `seq` outside [1, 64] or `total < 1` are DROPPED
    *    (the dead-letter philosophy: counted upstream, never thrown on);
    *    a call whose every leg is invalid emits nothing (no state);
    *  - duplicate `seq` redeliveries keep the FIRST arrival's duration
    *    (min `arrival` — the processor's processing-order rule, made
    *    deterministic by the arrival column);
    *  - `declared` = max(total) over ALL valid legs, duplicates
    *    included (the processor updates declared outside the dup check);
    *  - complete ⇔ the distinct seq set is EXACTLY {1..declared}: with
    *    distinct seqs ≥ 1, `n_legs = declared AND max_seq = declared`
    *    is equivalent by pigeonhole — a stray seq > declared or a
    *    missing middle leg both fail it, exactly like the processor's
    *    `mask == want`.
    *
    * Exact integers: durations in centi-units, BIGINT sums. Plan: two
    * hash aggregations — (call_id, seq) first-arrival pick via
    * `min(struct(arrival, …))`, then the per-call roll-up — both with
    * map-side partial aggregation, nothing corpus-pairwise; at 100 TB
    * this is the canonical two-level agg over the CDR scan. */
  def assembleLegsBatch(legs: DataFrame): DataFrame = {
    val valid = legs.filter(
      col("seq") >= 1L && col("seq") <= 64L && col("total") >= 1L)
    val perSeq = valid.groupBy(col("call_id"), col("seq"))
      .agg(min(struct(col("arrival"), col("duration_centi"))).as("f"),
        max(col("total")).as("t"))
    perSeq.groupBy(col("call_id"))
      .agg(max(col("t")).as("declared"),
        count(lit(1)).as("n_legs"),
        sum(col("f.duration_centi")).as("total_duration_centi"),
        max(col("seq")).as("max_seq"))
      .select(col("call_id"), col("declared"), col("n_legs"),
        col("total_duration_centi"),
        (col("declared") <= 64L && col("n_legs") === col("declared") &&
          col("max_seq") === col("declared")).as("complete"))
  }

  /** Oracle fixture of [[assembleLegsBatch]]: legs synthesized from
    * events — call = (user, day), seq cycles 1..6 with signups mapped to
    * the invalid seq 0 (the dropped-garbage path), declared totals cycle
    * 1..4 per leg (so declared = max(total) varies within a call), and
    * event_id is the deterministic arrival order. The cycling seq vs
    * smaller declared produces all three verdicts: complete calls,
    * missing-leg incompletes, and stray-high-seq incompletes. */
  private val q225 = GQuery(
    "q225_leg_assembly",
    (s, dir) => {
      val legs = t(s, dir, "events").select(
        concat(col("user_id").cast(StringType), lit("#"),
          expr("CAST(CAST(ts AS BIGINT) DIV 86400 AS STRING)")).as("call_id"),
        when(col("event_type") === "signup", lit(0L))
          .otherwise(lit(1L) + col("event_id") % 6L).as("seq"),
        (lit(1L) + col("event_id") % 4L).as("total"),
        expr("CAST(round(value * 100) AS BIGINT)").as("duration_centi"),
        col("event_id").as("arrival"))
      assembleLegsBatch(legs).orderBy(col("call_id"))
    },
    Some(s"""WITH legs AS (SELECT
          CAST(user_id AS VARCHAR) || '#' ||
            CAST((${epochSecSql("ts")}) // 86400 AS VARCHAR) AS call_id,
          CASE WHEN event_type = 'signup' THEN 0
               ELSE 1 + event_id % 6 END AS seq,
          1 + event_id % 4 AS total,
          CAST(round(value * 100) AS BIGINT) AS duration_centi,
          event_id AS arrival
        FROM events),
      v AS (SELECT * FROM legs WHERE seq BETWEEN 1 AND 64 AND total >= 1),
      ps AS (SELECT call_id, seq,
          arg_min(duration_centi, arrival) AS dur, MAX(total) AS t
        FROM v GROUP BY 1, 2),
      calls AS (SELECT call_id, CAST(MAX(t) AS BIGINT) AS declared,
          COUNT(*) AS n_legs,
          CAST(SUM(dur) AS BIGINT) AS total_duration_centi,
          MAX(seq) AS max_seq
        FROM ps GROUP BY 1)
      SELECT call_id, declared, n_legs, total_duration_centi,
        (declared <= 64 AND n_legs = declared AND max_seq = declared)
          AS complete
      FROM calls
      ORDER BY call_id"""))

  /** Time-band tariff rating — the full gsmrating composition
    * (`gsmrating.sh:14` launches the GSM rating stage; a real tariff
    * applies ALL of): the tariff VERSION in force as-of the call start
    * (q20b's as-of operator), a TIME-OF-DAY band per started minute
    * (peak/off-peak — bands cross call boundaries, so a call starting
    * 19:58 for 5 minutes bills 2 peak + 3 off-peak minutes), and a
    * per-minute usage TIER (q195's progressive family, indexed by the
    * minute's position in the call).
    *
    * `cdrs`: (call_id, call_type, start_sec, dur_min); `tariffs`:
    * (call_type, valid_from, base_centi) — the versioned per-minute
    * base rate. Minute m (0-based) bills
    * base_centi · band_ppm(hour-of-day of start_sec + 60m) ·
    * tier_ppm(m); per-minute products stay in BIGINT (base ≤ ~10⁶ centi
    * × two ppm factors < 10¹⁸), the per-call sum accumulates in
    * DECIMAL(38,0), and ONE DIV 10¹² converts back to exact centi (the
    * q183 rule). Calls predating every tariff version (the as-of is
    * LEFT) or with zero/negative duration are NEVER dropped: they rate
    * at charge_centi 0 with a NULL version (the q195 contract), and
    * report peak_min 0 — an unrated call contributes no peak usage.
    *
    * Plan: ONE broadcast as-of lookup per call (BroadcastAsOfJoin —
    * tariffs are types × versions), then the per-minute split runs as a
    * map-side `aggregate(sequence(...))` higher-order expression — no
    * explode, NO shuffle at all after the lookup; band and tier dims
    * compile to literal CASE chains. At 100 TB this is scan →
    * broadcast-as-of → projection: the cheapest shape a per-minute
    * rating can have. */
  /** Closed-form peak/tier arithmetic shared by [[timeBandCharges]] and
    * [[rerateDiff]] — round-15 replacement of the per-minute
    * `aggregate(sequence(...))` fold (a higher-order function is
    * interpreted per element with a boxed DECIMAL accumulator: O(dur)
    * lambda evaluations per CDR; at 100 TB a multi-hour call paid
    * thousands of them). The charge is instead computed in O(#tiers)
    * whole-stage-codegen'd integer expressions per row:
    *
    *   Σₘ base·band(m)·tier(m)  =  base · Σᵢ tierᵢ · bandSumᵢ
    *
    * with bandSumᵢ = peakᵢ·peakPpm + (lenᵢ−peakᵢ)·10⁶ over tier segment
    * i, and peakᵢ the count of minutes m in [sᵢ, eᵢ) whose minute-of-day
    * lies in the peak window — a modular interval-overlap count:
    * minute-of-day(m) = pmod(c₀ + m, 1440) with c₀ = floorDiv(start_sec,
    * 60) (the peak bounds are whole hours, so the second-within-minute
    * offset can never flip a minute across the boundary), so a segment
    * of n minutes starting at phase a covers full ⌊n/1440⌋ days plus the
    * wrapped partial window [a, a+r) — two max/min overlaps against
    * [P₁, P₂). Pure integer algebra: the per-term products are grouped,
    * never divided, and the single final `DIV 10¹²` applies to the
    * identical total, so the result is bit-equal to the unrolled
    * per-minute oracle by distributivity. Floor-div/floor-mod
    * throughout (pmod; the `(s − pmod(s,60)) DIV 60` floorDiv), so
    * pre-1970 timestamps keep their calendar hour exactly like the old
    * fold's pmod-on-seconds. */
  /** Adds the shared closed-form columns over (start_sec, dur_min):
    * `__pkall` (whole-call peak-minute count) and `__cf` (the
    * BASE-INDEPENDENT Σᵢ tierᵢ·bandSumᵢ charge factor, DECIMAL(38,0)) —
    * so a charge is one decimal multiply + the final truncating DIV,
    * and [[rerateDiff]]'s two tariff passes share ONE factor
    * computation. Every shared subexpression (the day phase, per-tier
    * segment bounds, phases, peak counts) is a REAL multi-referenced
    * column: Catalyst keeps such non-cheap aliases as stacked projects
    * instead of inlining, so each codegen'd method stays small enough
    * to JIT (the single-expression form expanded to a ~50-pmod tree
    * whose generated method ran interpreted — slower than the O(dur)
    * fold it replaced). The `greatest(0, …)` clamps only bite for
    * dur_min < 1 rows, whose outputs the call-site gate zeroes anyway —
    * they keep ANSI long arithmetic overflow-free on garbage inputs. */
  private def withBandTierCols(df: DataFrame, peakFromHour: Int,
      peakToHour: Int, peakMultPpm: Long,
      tiers: Seq[(Long, Long, Long)]): DataFrame = {
    val p1 = peakFromHour * 60; val p2 = peakToHour * 60; val w = p2 - p1
    def pkExpr(a: String, n: String): String =
      s"""($n DIV 1440L) * ${w}L
        + greatest(0L, least($a + pmod($n, 1440L), ${p2}L)
            - greatest($a, ${p1}L))
        + greatest(0L, least($a + pmod($n, 1440L) - 1440L, ${p2}L)
            - ${p1}L)"""
    var d = df.withColumn("__md0",
      expr("pmod((start_sec - pmod(start_sec, 60L)) DIV 60L, 1440L)"))
      .withColumn("__pkall", expr(pkExpr("__md0",
        "greatest(0L, dur_min)")))
    val terms = tiers.zipWithIndex.map { case ((lo, hi, ppm), i) =>
      val sE = if (lo == 0L) "0L"
        else s"greatest(0L, least(dur_min, ${lo}L))"
      val eE = if (hi == Long.MaxValue) "dur_min"
        else s"least(dur_min, ${hi}L)"
      d = d.withColumn(s"__n$i", expr(s"greatest(0L, ($eE) - ($sE))"))
        .withColumn(s"__a$i", expr(s"pmod(__md0 + ($sE), 1440L)"))
        .withColumn(s"__pk$i", expr(pkExpr(s"__a$i", s"__n$i")))
      s"""(CAST(__pk$i * ${peakMultPpm}L
          + (__n$i - __pk$i) * 1000000L AS DECIMAL(38, 0)) * ${ppm}L)"""
    }
    d.withColumn("__cf", expr(terms.mkString(" + ")))
  }

  /** The closed-form charge over `baseCol` (NULL base ⇒ 0, the q195
    * never-drop contract) from the [[withBandTierCols]] factor: exactly
    * Σₘ base·band(m)·tier(m) = base·__cf by distributivity — grouped,
    * never divided, the single final `DIV 10¹²` applied to the
    * identical total, so bit-equal to the per-minute unrolled oracle. */
  private def chargeFromFactor(baseCol: String)
      : org.apache.spark.sql.Column =
    when(col("dur_min") >= 1L && col(baseCol).isNotNull,
      expr(s"""CAST((CAST($baseCol AS DECIMAL(38, 0)) * __cf)
        DIV CAST(1000000000000 AS DECIMAL(38, 0)) AS BIGINT)"""))
      .otherwise(lit(0L))

  private def requireBandTier(peakFromHour: Int, peakToHour: Int,
      peakMultPpm: Long, tiers: Seq[(Long, Long, Long)]): Unit = {
    require(peakFromHour >= 0 && peakToHour <= 24 &&
      peakFromHour < peakToHour,
      s"invalid peak band [$peakFromHour, $peakToHour)")
    require(peakMultPpm >= 0, s"peakMultPpm must be >= 0, got $peakMultPpm")
    require(tiers.nonEmpty && tiers.head._1 == 0L &&
      tiers.last._2 == Long.MaxValue &&
      tiers.sliding(2).forall {
        case Seq((_, e1, _), (s2, _, _)) => e1 == s2
        case _ => true
      }, s"tiers must be contiguous from 0 to unbounded, got $tiers")
  }

  def timeBandCharges(cdrs: DataFrame, tariffs: DataFrame,
      peakFromHour: Int = 8, peakToHour: Int = 20,
      peakMultPpm: Long = 1500000L,
      tiers: Seq[(Long, Long, Long)] = Seq((0L, 3L, 1000000L),
        (3L, 6L, 800000L), (6L, Long.MaxValue, 600000L))): DataFrame = {
    requireBandTier(peakFromHour, peakToHour, peakMultPpm, tiers)
    val t = tariffs.select(col("call_type").as("t_call_type"),
      col("valid_from"), col("base_centi"))
    val asof = graft.plans.AsOf.join(cdrs, t,
        Seq("call_type"), Seq("t_call_type"), "start_sec", "valid_from")
      .drop("t_call_type")
      .withColumnRenamed("valid_from", "version")
    withBandTierCols(asof, peakFromHour, peakToHour, peakMultPpm, tiers)
      .withColumn("charge_centi", chargeFromFactor("base_centi"))
      .withColumn("peak_min",
        // gated on base_centi like charge_centi: a call predating every
        // tariff version rates at 0 AND reports peak_min 0 — both
        // engines agree that an unrated call contributes no peak usage
        when(col("dur_min") >= 1L && col("base_centi").isNotNull,
          col("__pkall"))
          .otherwise(lit(0L)))
      .select(col("call_id"), col("call_type"), col("version"),
        col("base_centi"), col("dur_min"), col("peak_min"),
        col("charge_centi"))
  }

  /** Oracle fixture of [[timeBandCharges]]: CDRs from events (duration
    * 1..10 minutes from the value column — long enough that band
    * crossings and all three tiers occur), a three-version tariff per
    * event type with length-derived base rates, peak 08–20. */
  private val q226 = GQuery(
    "q226_timeband_rating",
    (s, dir) => {
      import s.implicits._
      val ev = t(s, dir, "events")
      val cdrs = ev.select(col("event_id").as("call_id"),
        col("event_type").as("call_type"),
        col("ts").cast(LongType).as("start_sec"),
        (lit(1L) + abs(expr("CAST(round(value) AS BIGINT)")) % 10L)
          .as("dur_min"))
      val tariffs = ev.select(col("event_type")).distinct()
        .crossJoin(broadcast(Seq((0L, 7L), (1706659200L, 9L),
          (1709251200L, 11L)).toDF("valid_from", "b0")))
        .select(col("event_type").as("call_type"), col("valid_from"),
          (col("b0") + length(col("event_type")).cast(LongType))
            .as("base_centi"))
      timeBandCharges(cdrs, tariffs).orderBy(col("call_id"))
    },
    Some(s"""WITH cdrs AS (SELECT event_id AS call_id,
          event_type AS call_type,
          ${epochSecSql("ts")} AS start_sec,
          1 + abs(CAST(round(value) AS BIGINT)) % 10 AS dur_min
        FROM events),
      tv(valid_from, b0) AS (VALUES (0::BIGINT, 7::BIGINT),
        (1706659200::BIGINT, 9::BIGINT), (1709251200::BIGINT, 11::BIGINT)),
      tariffs AS (SELECT t.event_type AS t_call_type, v.valid_from,
          v.b0 + length(t.event_type) AS base_centi
        FROM (SELECT DISTINCT event_type FROM events) t CROSS JOIN tv v),
      av AS (SELECT * FROM (
          SELECT c.*, tf.valid_from AS version, tf.base_centi,
            ROW_NUMBER() OVER (PARTITION BY c.call_id
              ORDER BY tf.valid_from DESC) AS rn
          FROM cdrs c LEFT JOIN tariffs tf
            ON tf.t_call_type = c.call_type
              AND tf.valid_from <= c.start_sec)
        WHERE rn = 1),
      mins AS (SELECT call_id, u.m, base_centi,
          ((((start_sec + 60 * u.m) % 86400) + 86400) % 86400) // 3600
            AS hod
        FROM av, UNNEST(generate_series(0, dur_min - 1)) AS u(m)
        WHERE dur_min >= 1 AND base_centi IS NOT NULL),
      terms AS (SELECT call_id,
          CAST(base_centi AS HUGEINT) *
            (CASE WHEN hod >= 8 AND hod < 20 THEN 1500000
                  ELSE 1000000 END) *
            (CASE WHEN m < 3 THEN 1000000 WHEN m < 6 THEN 800000
                  ELSE 600000 END) AS term,
          CASE WHEN hod >= 8 AND hod < 20 THEN 1 ELSE 0 END AS pk
        FROM mins),
      agg AS (SELECT call_id, SUM(term) AS sm,
          CAST(SUM(pk) AS BIGINT) AS peak_min
        FROM terms GROUP BY 1)
      SELECT a.call_id, a.call_type, a.version, a.base_centi, a.dur_min,
        COALESCE(g.peak_min, 0) AS peak_min,
        CAST(COALESCE(g.sm, 0) // 1000000000000 AS BIGINT) AS charge_centi
      FROM av a LEFT JOIN agg g USING (call_id)
      ORDER BY a.call_id"""))

  /** Re-rating diff — the mediation back-office job after a tariff
    * correction: every CDR rates under BOTH the originally-applied
    * tariff table and the corrected one, and the output is the
    * adjustment record per CHANGED call (delta ≠ 0) — what a billing
    * system books as credit/debit memos instead of re-issuing invoices.
    * Calls whose as-of version or base rate is identical under both
    * tables produce no adjustment and are filtered; calls predating
    * every version of a table rate at 0 on that side (the q195
    * never-drop contract), so a tariff EXTENSION into older history
    * shows up as pure debits rather than vanishing.
    *
    * Plan: ONE cdr scan → broadcast-as-of (old) → broadcast-as-of (new)
    * → two map-side per-minute folds → filter. Zero shuffles — the
    * re-rating job costs one pass over the CDR store regardless of how
    * many calls changed, never a self-join of two rated outputs. */
  def rerateDiff(cdrs: DataFrame, tariffsOld: DataFrame,
      tariffsNew: DataFrame,
      peakFromHour: Int = 8, peakToHour: Int = 20,
      peakMultPpm: Long = 1500000L,
      tiers: Seq[(Long, Long, Long)] = Seq((0L, 3L, 1000000L),
        (3L, 6L, 800000L), (6L, Long.MaxValue, 600000L))): DataFrame = {
    requireBandTier(peakFromHour, peakToHour, peakMultPpm, tiers)
    val tOld = tariffsOld.select(col("call_type").as("tc_old"),
      col("valid_from").as("vf_old"), col("base_centi").as("base_old"))
    val tNew = tariffsNew.select(col("call_type").as("tc_new"),
      col("valid_from").as("vf_new"), col("base_centi").as("base_new"))
    val both = graft.plans.AsOf.join(
        graft.plans.AsOf.join(cdrs, tOld,
            Seq("call_type"), Seq("tc_old"), "start_sec", "vf_old")
          .drop("tc_old").withColumnRenamed("vf_old", "version_old"),
        tNew, Seq("call_type"), Seq("tc_new"), "start_sec", "vf_new")
      .drop("tc_new").withColumnRenamed("vf_new", "version_new")
    // round-15 (guide §2.3 "project/filter early"): a call whose as-of
    // base rate is IDENTICAL under both tables rates identically —
    // charge = base·factor with the same factor — so delta = 0 and the
    // row cannot survive. This null-safe base inequality is a tiny
    // pushable predicate that eliminates the unchanged bulk BEFORE the
    // charge arithmetic (the classic re-rating prune: only potentially
    // affected calls are re-rated); the exact delta ≠ 0 filter below
    // then runs on the affected slice only. NULL cases covered: both
    // NULL ⇒ both charge 0 ⇒ delta 0 (dropped, correctly); one NULL ⇒
    // kept for the exact check.
    val prefiltered = withBandTierCols(
      both.filter(!(col("base_old") <=> col("base_new"))),
      peakFromHour, peakToHour, peakMultPpm, tiers)
    prefiltered
      .withColumn("charge_old_centi", chargeFromFactor("base_old"))
      .withColumn("charge_new_centi", chargeFromFactor("base_new"))
      .withColumn("delta_centi",
        col("charge_new_centi") - col("charge_old_centi"))
      // pushdown barrier: without it Catalyst substitutes the FULL
      // charge trees into the delta predicate and pushes it below every
      // project — each row then evaluates both charges AGAIN through
      // one generated method too large to JIT (measured 2.6× the whole
      // query). The lazy checkpoint pins the rated AFFECTED-SLICE rows
      // (post-prefilter — adjustment candidates, not the corpus) so the
      // filter reads the computed delta column; still one pass, no
      // extra job, no cross-run state.
      .localCheckpoint(false)
      .filter(col("delta_centi") =!= 0L)
      .select(col("call_id"), col("call_type"), col("version_old"),
        col("version_new"), col("dur_min"), col("charge_old_centi"),
        col("charge_new_centi"), col("delta_centi"))
  }

  /** Oracle fixture of [[rerateDiff]]: the q226 CDRs and tariff table as
    * the ORIGINAL rating; the corrected table adds a mid-timeline
    * version (mid-January, base jumps to 14+len) — calls starting in the new version's window
    * re-rate and emit adjustments, everything else stays silent. The
    * oracle replays both per-minute ratings with the q226 CTE block
    * instantiated twice. */
  private val q244 = {
    def passSql(sfx: String, tariffCte: String): String =
      s"""av$sfx AS (SELECT * FROM (
          SELECT c.*, tf.valid_from AS version$sfx,
            tf.base_centi AS base$sfx,
            ROW_NUMBER() OVER (PARTITION BY c.call_id
              ORDER BY tf.valid_from DESC) AS rn
          FROM cdrs c LEFT JOIN $tariffCte tf
            ON tf.t_call_type = c.call_type
              AND tf.valid_from <= c.start_sec)
        WHERE rn = 1),
      mins$sfx AS (SELECT call_id, base$sfx,
          ((((start_sec + 60 * u.m) % 86400) + 86400) % 86400) // 3600
            AS hod, u.m
        FROM av$sfx, UNNEST(generate_series(0, dur_min - 1)) AS u(m)
        WHERE dur_min >= 1 AND base$sfx IS NOT NULL),
      agg$sfx AS (SELECT call_id, SUM(
          CAST(base$sfx AS HUGEINT) *
            (CASE WHEN hod >= 8 AND hod < 20 THEN 1500000
                  ELSE 1000000 END) *
            (CASE WHEN m < 3 THEN 1000000 WHEN m < 6 THEN 800000
                  ELSE 600000 END)) AS sm
        FROM mins$sfx GROUP BY 1)"""
    GQuery(
      "q244_rerate_diff",
      (s, dir) => {
        import s.implicits._
        val ev = t(s, dir, "events")
        val cdrs = ev.select(col("event_id").as("call_id"),
          col("event_type").as("call_type"),
          col("ts").cast(LongType).as("start_sec"),
          (lit(1L) + abs(expr("CAST(round(value) AS BIGINT)")) % 10L)
            .as("dur_min"))
        // round-15: the type dim feeds BOTH tariff tables — one lazy
        // checkpoint, one distinct scan instead of two
        val types = ev.select(col("event_type")).distinct()
          .localCheckpoint(false)
        def tariffs(rows: Seq[(Long, Long)]) = types
          .crossJoin(broadcast(rows.toDF("valid_from", "b0")))
          .select(col("event_type").as("call_type"), col("valid_from"),
            (col("b0") + length(col("event_type")).cast(LongType))
              .as("base_centi"))
        val vOld = Seq((0L, 7L), (1706659200L, 9L), (1709251200L, 11L))
        val vNew = vOld :+ (1705276800L, 14L)
        rerateDiff(cdrs, tariffs(vOld), tariffs(vNew))
          .orderBy(col("call_id"))
      },
      Some(s"""WITH cdrs AS (SELECT event_id AS call_id,
            event_type AS call_type,
            ${epochSecSql("ts")} AS start_sec,
            1 + abs(CAST(round(value) AS BIGINT)) % 10 AS dur_min
          FROM events),
        tvo(valid_from, b0) AS (VALUES (0::BIGINT, 7::BIGINT),
          (1706659200::BIGINT, 9::BIGINT), (1709251200::BIGINT, 11::BIGINT)),
        tvn(valid_from, b0) AS (VALUES (0::BIGINT, 7::BIGINT),
          (1706659200::BIGINT, 9::BIGINT), (1709251200::BIGINT, 11::BIGINT),
          (1705276800::BIGINT, 14::BIGINT)),
        ty AS (SELECT DISTINCT event_type FROM events),
        tro AS (SELECT ty.event_type AS t_call_type, v.valid_from,
            v.b0 + length(ty.event_type) AS base_centi
          FROM ty CROSS JOIN tvo v),
        trn AS (SELECT ty.event_type AS t_call_type, v.valid_from,
            v.b0 + length(ty.event_type) AS base_centi
          FROM ty CROSS JOIN tvn v),
        ${passSql("_o", "tro")},
        ${passSql("_n", "trn")}
        SELECT o.call_id, o.call_type, o.version_o AS version_old,
          n.version_n AS version_new, o.dur_min,
          CAST(COALESCE(go.sm, 0) // 1000000000000 AS BIGINT)
            AS charge_old_centi,
          CAST(COALESCE(gn.sm, 0) // 1000000000000 AS BIGINT)
            AS charge_new_centi,
          CAST(COALESCE(gn.sm, 0) // 1000000000000
            - COALESCE(go.sm, 0) // 1000000000000 AS BIGINT) AS delta_centi
        FROM av_o o
        JOIN av_n n USING (call_id)
        LEFT JOIN agg_o go ON go.call_id = o.call_id
        LEFT JOIN agg_n gn ON gn.call_id = o.call_id
        WHERE COALESCE(gn.sm, 0) // 1000000000000
          <> COALESCE(go.sm, 0) // 1000000000000
        ORDER BY o.call_id"""))
  }

  /** Interconnect settlement netting — the month-end job between
    * carriers: traffic from operator A terminating on operator B incurs
    * a charge A owes B; settlement NETS the two directions so one
    * payment moves per operator pair. Per unordered pair (op_x < op_y):
    * both directed owed totals, CDR count, and the net (positive ⇒ x
    * pays y). On-net traffic (src = dst) is excluded — it settles
    * nowhere.
    *
    * Plan: one conditional-sum aggregation on the canonicalized pair
    * key — a single hash shuffle with map-side partials, |operators|²-
    * bounded output; centi BIGINT money (Σ bounded by total traffic,
    * far under Long at any scale a carrier bills). */
  def interconnectNetting(cdrs: DataFrame): DataFrame =
    cdrs.filter(col("src_op") =!= col("dst_op"))
      .select(least(col("src_op"), col("dst_op")).as("op_x"),
        greatest(col("src_op"), col("dst_op")).as("op_y"),
        when(col("src_op") < col("dst_op"), col("charge_centi"))
          .otherwise(0L).as("xy"),
        when(col("src_op") > col("dst_op"), col("charge_centi"))
          .otherwise(0L).as("yx"))
      .groupBy(col("op_x"), col("op_y"))
      .agg(count(lit(1)).as("n_cdrs"),
        sum(col("xy")).as("owed_xy_centi"),
        sum(col("yx")).as("owed_yx_centi"))
      .withColumn("net_centi",
        col("owed_xy_centi") - col("owed_yx_centi"))

  /** Oracle fixture of [[interconnectNetting]]: a 7-operator mesh
    * synthesized from events (src from the user, dst shifted by the
    * event id — deterministic, covers every ordered pair). */
  private val q231 = GQuery(
    "q231_interconnect_netting",
    (s, dir) => {
      val cdrs = t(s, dir, "events").select(
        concat(lit("OP"), (col("user_id") % 7L).cast(StringType))
          .as("src_op"),
        concat(lit("OP"), ((col("user_id") + col("event_id")) % 7L)
          .cast(StringType)).as("dst_op"),
        expr("CAST(round(value * 100) AS BIGINT)").as("charge_centi"))
      interconnectNetting(cdrs).orderBy(col("op_x"), col("op_y"))
    },
    Some("""WITH cdrs AS (SELECT
          'OP' || CAST(user_id % 7 AS VARCHAR) AS src_op,
          'OP' || CAST((user_id + event_id) % 7 AS VARCHAR) AS dst_op,
          CAST(round(value * 100) AS BIGINT) AS charge_centi
        FROM events),
      x AS (SELECT LEAST(src_op, dst_op) AS op_x,
          GREATEST(src_op, dst_op) AS op_y,
          CASE WHEN src_op < dst_op THEN charge_centi ELSE 0 END AS xy,
          CASE WHEN src_op > dst_op THEN charge_centi ELSE 0 END AS yx
        FROM cdrs WHERE src_op <> dst_op)
      SELECT op_x, op_y, COUNT(*) AS n_cdrs,
        CAST(SUM(xy) AS BIGINT) AS owed_xy_centi,
        CAST(SUM(yx) AS BIGINT) AS owed_yx_centi,
        CAST(SUM(xy) - SUM(yx) AS BIGINT) AS net_centi
      FROM x GROUP BY op_x, op_y
      ORDER BY op_x, op_y"""))

  /** Cascading tax computation — the charge-to-invoice step of a rating
    * engine: each configured tax applies IN ORDER, either to the bare
    * charge or (cascading) to the charge plus every tax already levied
    * — the compound-on-compound arithmetic real telecom invoices carry
    * (a regulatory fee on top of a municipal tax on top of the federal
    * one). Amounts floor per step (`(taxable · rate_ppm) DIV 10⁶`), so
    * the computation is order-DEPENDENT by design and exact in both
    * engines; `taxes` is (name, rate_ppm, cascading).
    *
    * Plan: pure map-side expression chain over the literal config —
    * zero joins, zero shuffles; the cheapest shape invoicing can have. */
  def cascadedTaxes(charges: DataFrame,
      taxes: Seq[(String, Long, Boolean)]): DataFrame = {
    require(taxes.nonEmpty, "taxes must be non-empty")
    require(taxes.map(_._1).distinct.length == taxes.length,
      s"tax names must be unique, got ${taxes.map(_._1)}")
    require(taxes.forall(t => t._2 >= 0 && t._2 <= 1000000L),
      s"tax rates must be in [0, 1e6] ppm, got $taxes")
    var df = charges
    val levied = scala.collection.mutable.ListBuffer.empty[String]
    taxes.foreach { case (name, ppm, cascading) =>
      // DIV truncates while DuckDB's // floors — identical only for
      // non-negative taxables, which the contract requires (credit
      // notes/adjustments rate on their own path, never through the
      // invoice tax chain)
      val taxable =
        if (cascading) ("charge_centi" +: levied.toList).mkString(" + ")
        else "charge_centi"
      df = df.withColumn(s"tax_${name}_centi",
        expr(s"(($taxable) * $ppm) DIV 1000000"))
      levied += s"tax_${name}_centi"
    }
    df.withColumn("total_centi",
      expr(("charge_centi" +: levied.toList).mkString(" + ")))
  }

  /** Oracle fixture of [[cascadedTaxes]]: a federal 10% on the base,
    * then a cascading 5% municipal and a cascading 1.5% regulatory fee
    * — the three-layer compound invoices actually carry. */
  private val q232 = GQuery(
    "q232_tax_cascade",
    (s, dir) => cascadedTaxes(
        t(s, dir, "events").select(col("event_id"), col("event_type"),
          expr("abs(CAST(round(value * 100) AS BIGINT))").as("charge_centi")),
        Seq(("fed", 100000L, false), ("muni", 50000L, true),
          ("reg", 15000L, true)))
      .orderBy(col("event_id")),
    Some("""WITH c AS (SELECT event_id, event_type,
          abs(CAST(round(value * 100) AS BIGINT)) AS charge_centi
        FROM events),
      t1 AS (SELECT *, (charge_centi * 100000) // 1000000
               AS tax_fed_centi FROM c),
      t2 AS (SELECT *, ((charge_centi + tax_fed_centi) * 50000) // 1000000
               AS tax_muni_centi FROM t1),
      t3 AS (SELECT *,
          ((charge_centi + tax_fed_centi + tax_muni_centi) * 15000)
            // 1000000 AS tax_reg_centi
        FROM t2)
      SELECT event_id, event_type, charge_centi, tax_fed_centi,
        tax_muni_centi, tax_reg_centi,
        charge_centi + tax_fed_centi + tax_muni_centi + tax_reg_centi
          AS total_centi
      FROM t3
      ORDER BY event_id"""))

  /** Marginal (cumulative-tier) rating — the retro-rating shape
    * [[tieredCharges]] cannot express: tiers apply to the account's
    * RUNNING usage across the billing cycle, so each record is charged
    * the marginal cost of moving the accumulator from cum−u to cum —
    * the record that crosses a tier boundary is priced partly at each
    * rate, and every record after the account enters the cheap tier
    * rates there. Implemented via the closed form
    * T(u) = Σ_t rate_t · clamp(u − from_t, 0, to_t − from_t):
    * charge = T(cum) − T(cum − u) — exact telescoping, so Σ charges per
    * account ≡ T(account total) with no drift (spec-pinned).
    * Zero/negative-usage records contribute 0 to the accumulator and
    * rate at 0, never dropped (the q195 contract).
    *
    * Plan: ONE per-account window (running sum in event order, tiebreak
    * event_id) — a single hash exchange; T() is a map-side literal
    * expression evaluated twice per row. */
  def marginalTieredCharges(events: DataFrame,
      usage: org.apache.spark.sql.Column, tiers: Seq[(Long, Long, Long)],
      keyCol: String = "user_id"): DataFrame = {
    require(tiers.nonEmpty, "tiers must be non-empty")
    require(tiers.head._1 == 0L, "first tier must start at 0")
    require(tiers.last._2 == Long.MaxValue, "last tier must be unbounded")
    require(tiers.sliding(2).forall {
      case Seq((_, e1, _), (s2, _, _)) => e1 == s2
      case _ => true
    }, s"tiers must be contiguous, got $tiers")
    def tExpr(u: String): String = tiers.map { case (f, to, r) =>
      if (to == Long.MaxValue)
        s"$r * greatest(CAST(0 AS BIGINT), ($u) - $f)"
      else
        s"$r * least(greatest(CAST(0 AS BIGINT), ($u) - $f), ${to - f})"
    }.mkString("(", " + ", ")")
    val w = Window.partitionBy(col("k"))
      .orderBy(col("sec"), col("event_id"))
    events.select(col("event_id"), col(keyCol).as("k"),
        col("ts").cast(LongType).as("sec"), usage.cast(LongType).as("u"))
      .withColumn("ue", greatest(col("u"), lit(0L)))
      .withColumn("cum", sum(col("ue")).over(w))
      .select(col("event_id"), col("k"), col("u"), col("cum"),
        expr(s"${tExpr("cum")} - ${tExpr("cum - ue")}").as("charge_centi"))
  }

  /** Oracle fixture of [[marginalTieredCharges]]: the q195 tariff
    * applied to running per-user usage. */
  private val q233 = {
    val tiers = Seq((0L, 5000L, 5L), (5000L, 20000L, 3L),
      (20000L, Long.MaxValue, 1L))
    def tSql(u: String): String = tiers.map { case (f, to, r) =>
      if (to == Long.MaxValue)
        s"$r * greatest(CAST(0 AS BIGINT), ($u) - $f)"
      else
        s"$r * least(greatest(CAST(0 AS BIGINT), ($u) - $f), ${to - f})"
    }.mkString("(", " + ", ")")
    GQuery(
      "q233_marginal_rating",
      (s, dir) => marginalTieredCharges(t(s, dir, "events"),
          expr("CAST(round(value * 100) AS BIGINT)"), tiers)
        .orderBy(col("event_id")),
      Some(s"""WITH e AS (SELECT event_id, user_id AS k,
            ${epochSecSql("ts")} AS sec,
            CAST(round(value * 100) AS BIGINT) AS u
          FROM events),
        c AS (SELECT *, greatest(u, CAST(0 AS BIGINT)) AS ue FROM e),
        m AS (SELECT *, CAST(SUM(ue) OVER (PARTITION BY k
            ORDER BY sec, event_id
            ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum
          FROM c)
        SELECT event_id, k, u, cum,
          ${tSql("cum")} - ${tSql("cum - ue")} AS charge_centi
        FROM m
        ORDER BY event_id"""))
  }

  /** Bundle (free-allowance) marginal rating — the OCS feature
    * [[marginalTieredCharges]] cannot express: the account's first
    * `allowance` units of the cycle are INCLUDED (the monthly
    * minutes/GB bundle every consumer plan ships), and only the
    * overflow rates at the marginal tiers. Same closed form shifted by
    * the allowance: B(u) = T(max(u − A, 0)), charge = B(cum) −
    * B(cum − u) — exact telescoping still holds (Σ charges ≡
    * B(cycle total)), and the record that CROSSES the allowance
    * boundary bills only its paid tail. `free_units` reports the
    * record's consumption from the bundle (min(u, remaining allowance))
    * — the "you have N minutes left" counter, derivable per record with
    * no second pass. Zero/negative usage leaves the accumulator
    * unchanged, rates 0, consumes 0 — never dropped (the q233
    * contract).
    *
    * Plan: identical to q233 — ONE per-account window (running sum in
    * event order, event_id tiebreak), B() evaluated twice map-side. */
  def bundleTieredCharges(events: DataFrame,
      usage: org.apache.spark.sql.Column, allowance: Long,
      tiers: Seq[(Long, Long, Long)], keyCol: String = "user_id")
      : DataFrame = {
    require(allowance >= 0L, s"allowance must be >= 0, got $allowance")
    require(tiers.nonEmpty, "tiers must be non-empty")
    require(tiers.head._1 == 0L, "first tier must start at 0")
    require(tiers.last._2 == Long.MaxValue, "last tier must be unbounded")
    require(tiers.sliding(2).forall {
      case Seq((_, e1, _), (s2, _, _)) => e1 == s2
      case _ => true
    }, s"tiers must be contiguous, got $tiers")
    def tExpr(u: String): String = tiers.map { case (f, to, r) =>
      if (to == Long.MaxValue)
        s"$r * greatest(CAST(0 AS BIGINT), ($u) - $f)"
      else
        s"$r * least(greatest(CAST(0 AS BIGINT), ($u) - $f), ${to - f})"
    }.mkString("(", " + ", ")")
    def bExpr(u: String): String =
      tExpr(s"greatest(($u) - ${allowance}L, CAST(0 AS BIGINT))")
    val w = Window.partitionBy(col("k"))
      .orderBy(col("sec"), col("event_id"))
    events.select(col("event_id"), col(keyCol).as("k"),
        col("ts").cast(LongType).as("sec"), usage.cast(LongType).as("u"))
      .withColumn("ue", greatest(col("u"), lit(0L)))
      .withColumn("cum", sum(col("ue")).over(w))
      .select(col("event_id"), col("k"), col("u"), col("cum"),
        expr(s"least(ue, greatest(${allowance}L - (cum - ue), " +
          "CAST(0 AS BIGINT)))").as("free_units"),
        expr(s"${bExpr("cum")} - ${bExpr("cum - ue")}")
          .as("charge_centi"))
  }

  /** Oracle fixture of [[bundleTieredCharges]]: the q233 tariff behind
    * a 200k-centiunit bundle — big enough that every account's early
    * cycle is free, small enough that every account overflows, so the
    * boundary-straddling row (partly free, partly tier-1) appears for
    * every account. */
  private val q320 = {
    val tiers = Seq((0L, 5000L, 5L), (5000L, 20000L, 3L),
      (20000L, Long.MaxValue, 1L))
    val allow = 200000L
    def tSql(u: String): String = tiers.map { case (f, to, r) =>
      if (to == Long.MaxValue)
        s"$r * greatest(CAST(0 AS BIGINT), ($u) - $f)"
      else
        s"$r * least(greatest(CAST(0 AS BIGINT), ($u) - $f), ${to - f})"
    }.mkString("(", " + ", ")")
    def bSql(u: String): String =
      tSql(s"greatest(($u) - $allow, CAST(0 AS BIGINT))")
    GQuery(
      "q320_bundle_rating",
      (s, dir) => bundleTieredCharges(t(s, dir, "events"),
          expr("CAST(round(value * 100) AS BIGINT)"), allow, tiers)
        .orderBy(col("event_id")),
      Some(s"""WITH e AS (SELECT event_id, user_id AS k,
            ${epochSecSql("ts")} AS sec,
            CAST(round(value * 100) AS BIGINT) AS u
          FROM events),
        c AS (SELECT *, greatest(u, CAST(0 AS BIGINT)) AS ue FROM e),
        m AS (SELECT *, CAST(SUM(ue) OVER (PARTITION BY k
            ORDER BY sec, event_id
            ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum
          FROM c)
        SELECT event_id, k, u, cum,
          least(ue, greatest($allow - (cum - ue), CAST(0 AS BIGINT)))
            AS free_units,
          ${bSql("cum")} - ${bSql("cum - ue")} AS charge_centi
        FROM m
        ORDER BY event_id"""))
  }

  /** Invoice run — the rating family composed end-to-end, the
    * gsmrating → billing handoff: every usage record rates at its
    * MARGINAL cumulative-tier cost ([[marginalTieredCharges]]), rolls
    * up per account (telescoping makes the roll-up exactly
    * T(cycle total) — no per-record rounding drift to reconcile), and
    * the account subtotal runs through the ordered
    * [[cascadedTaxes]] chain to the invoice total. One row per
    * account: usage, subtotal, each tax, total.
    *
    * Plan: the per-account window from the rating + one account
    * roll-up + the pure map-side tax chain — shuffles only on the
    * account key, end to end. */
  def invoiceRun(events: DataFrame, usage: org.apache.spark.sql.Column,
      tiers: Seq[(Long, Long, Long)],
      taxes: Seq[(String, Long, Boolean)],
      keyCol: String = "user_id"): DataFrame = {
    val rated = marginalTieredCharges(events, usage, tiers, keyCol)
    val subtotal = rated.groupBy(col("k").as("account_id"))
      .agg(count(lit(1)).as("n_records"),
        sum(greatest(col("u"), lit(0L))).as("total_units"),
        sum(col("charge_centi")).as("charge_centi"))
    cascadedTaxes(subtotal, taxes)
  }

  /** Oracle fixture of [[invoiceRun]]: the q233 tariff + the q232 tax
    * chain, per user. */
  private val q239 = {
    val tiers = Seq((0L, 5000L, 5L), (5000L, 20000L, 3L),
      (20000L, Long.MaxValue, 1L))
    def tSql(u: String): String = tiers.map { case (f, to, r) =>
      if (to == Long.MaxValue)
        s"$r * greatest(CAST(0 AS BIGINT), ($u) - $f)"
      else
        s"$r * least(greatest(CAST(0 AS BIGINT), ($u) - $f), ${to - f})"
    }.mkString("(", " + ", ")")
    GQuery(
      "q239_invoice_run",
      (s, dir) => invoiceRun(t(s, dir, "events"),
          expr("CAST(round(value * 100) AS BIGINT)"), tiers,
          Seq(("fed", 100000L, false), ("muni", 50000L, true),
            ("reg", 15000L, true)))
        .orderBy(col("account_id")),
      Some(s"""WITH e AS (SELECT user_id AS k,
            greatest(CAST(round(value * 100) AS BIGINT),
              CAST(0 AS BIGINT)) AS ue
          FROM events),
        sub AS (SELECT k AS account_id, COUNT(*) AS n_records,
            CAST(SUM(ue) AS BIGINT) AS total_units,
            -- telescoping: Σ marginal charges == T(cycle total)
            ${tSql("CAST(SUM(ue) AS BIGINT)")} AS charge_centi
          FROM e GROUP BY 1),
        t1 AS (SELECT *, (charge_centi * 100000) // 1000000
                 AS tax_fed_centi FROM sub),
        t2 AS (SELECT *,
            ((charge_centi + tax_fed_centi) * 50000) // 1000000
              AS tax_muni_centi FROM t1),
        t3 AS (SELECT *,
            ((charge_centi + tax_fed_centi + tax_muni_centi) * 15000)
              // 1000000 AS tax_reg_centi
          FROM t2)
        SELECT account_id, n_records, total_units, charge_centi,
          tax_fed_centi, tax_muni_centi, tax_reg_centi,
          charge_centi + tax_fed_centi + tax_muni_centi + tax_reg_centi
            AS total_centi
        FROM t3
        ORDER BY account_id"""))
  }

  /** The tariff dim collapsed to ONE row per validity window with its
    * sorted tiers array — the shared shape [[validateTariffTimeline]],
    * [[marginalTieredChargesVersioned]], and the live attach stage all
    * consume. The struct field names (f, t, r) are the
    * [[graft.streaming.TierRow]] wire contract — every consumer reads
    * them, so they live in exactly one place. */
  def planWindows(tariff: DataFrame): DataFrame =
    tariff.groupBy(col("valid_from_sec"), col("valid_to_sec"))
      .agg(sort_array(collect_list(struct(
        col("tier_from").as("f"), col("tier_to").as("t"),
        col("rate_centi").as("r")))).as("tiers"))

  /** EAGER dim-grain integrity check for an SCD2 tariff TIMELINE —
    * the rating twin of [[graft.queries.PreratingQ.validateVersionedDim]]:
    * the dim is one row per (validity window, tier), and a malformed
    * timeline mis-bills every record it touches, so it fails HERE before
    * any fact is scanned. Checks (all bounded by the dimension):
    *
    *  - each validity window's tiers are contiguous from 0 to unbounded
    *    (the [[marginalTieredCharges]] literal-tier contract, now data);
    *  - validity windows are non-inverted and non-overlapping (two plans
    *    active at once would double-rate every straddling record); GAPS
    *    are legal — usage in uncovered time rates NULL (never-drop, held
    *    for a correction run), it is double coverage that is fatal.
    *
    * Used as the `validate` hook of a [[graft.streaming.VersionedDim]]
    * tariff store, so a live chain pays these two jobs once per dim
    * VERSION, never per micro-batch. */
  def validateTariffTimeline(tariff: DataFrame): DataFrame = {
    val byWin = planWindows(tariff).withColumnRenamed("tiers", "ts")
    val badTiers = byWin.filter(!(
        expr("ts[0].f = CAST(0 AS BIGINT)") &&
        expr(s"ts[size(ts) - 1].t = ${Long.MaxValue}L") &&
        expr("forall(ts, x -> x.t > x.f AND x.f >= 0)") &&
        // adjacent-pair contiguity via slice+zip_with (an index-based
        // walk would out-of-bounds under ANSI on a one-tier plan —
        // slice of length 0 is just an empty array, forall-true)
        expr("forall(zip_with(slice(ts, 1, size(ts) - 1)," +
          " slice(ts, 2, size(ts) - 1), (a, b) -> b.f = a.t), x -> x)")))
      .select(col("valid_from_sec"), col("valid_to_sec"))
      .limit(3).collect() // bounded: ≤ 3 window-grain rows
    require(badTiers.isEmpty,
      "validateTariffTimeline: tier plan not contiguous from 0 to " +
        "unbounded in window(s) " + badTiers.mkString(", "))
    val winW = Window.orderBy(col("valid_from_sec"))
    val badWins = byWin.select(col("valid_from_sec"), col("valid_to_sec"))
      .withColumn("__prev_to", lag(col("valid_to_sec"), 1).over(winW))
      .filter(col("valid_to_sec") <= col("valid_from_sec") ||
        col("__prev_to") > col("valid_from_sec"))
      .select(col("valid_from_sec"), col("valid_to_sec"))
      .limit(3).collect() // bounded: ≤ 3 window-grain rows
    require(badWins.isEmpty,
      "validateTariffTimeline: inverted or overlapping validity " +
        "window(s) " + badWins.mkString(", ") +
        " — two tariff plans active at once would double-rate every " +
        "straddling record")
    tariff
  }

  /** Marginal cumulative-tier rating under an SCD2 tariff TIMELINE —
    * the production form of [[marginalTieredCharges]], and the batch
    * twin the LIVE chain's tariff stage is pinned against: tariff plans
    * change mid-cycle (rate amendments are the most frequent dim change
    * after number ports), and each record must rate AT THE PLAN AS OF
    * ITS OWN EVENT TIME (the q279 versioned-guiding discipline) while
    * the cycle accumulator runs on UNINTERRUPTED — the record that
    * arrives after an amendment is charged T_v2(cum) − T_v2(cum − u):
    * the new plan applied at the account's current tier position, which
    * is what a rating amendment means operationally (and what the q281
    * simulation card previews).
    *
    * Records in UNCOVERED time (a timeline gap) charge NULL and do NOT
    * advance the accumulator — unratable usage is held for a correction
    * run, never guessed at and never dropped (each row keeps its
    * `tariff_from` NULL as the audit mark).
    *
    * Plan: ONE broadcast join against the window-grain plan dim (each
    * plan carried as a sorted tiers ARRAY — validity windows never
    * overlap, so the join is ≤ 1 match, no fanout) + the q233
    * per-account running-sum window; the charge is a map-side
    * higher-order `aggregate` over the ≤ |tiers| array. Shuffles only
    * on the account key at any corpus size. */
  def marginalTieredChargesVersioned(events: DataFrame,
      usage: org.apache.spark.sql.Column, tariff: DataFrame,
      keyCol: String = "user_id", preValidated: Boolean = false)
      : DataFrame = {
    val checked = if (preValidated) tariff else validateTariffTimeline(tariff)
    val plans = planWindows(checked)
      .select(col("valid_from_sec").as("__vf"),
        col("valid_to_sec").as("__vt"), col("tiers").as("__tiers"))
    val w = Window.partitionBy(col("k"))
      .orderBy(col("sec"), col("event_id"))
    val clamp = (u: String) =>
      s"least(greatest(($u) - x.f, CAST(0 AS BIGINT)), x.t - x.f)"
    events.select(col("event_id"), col(keyCol).as("k"),
        col("ts").cast(LongType).as("sec"), usage.cast(LongType).as("u"))
      .join(broadcast(plans),
        col("sec") >= col("__vf") && col("sec") < col("__vt"), "left")
      .withColumn("ue",
        when(col("__tiers").isNotNull, greatest(col("u"), lit(0L)))
          .otherwise(lit(0L)))
      .withColumn("cum", sum(col("ue")).over(w))
      .select(col("event_id"), col("k"), col("u"), col("cum"),
        col("__vf").as("tariff_from"),
        when(col("__tiers").isNotNull, expr(
          s"""aggregate(__tiers, CAST(0 AS BIGINT),
             (acc, x) -> acc + x.r * (${clamp("cum")} -
               ${clamp("cum - ue")}))""")).as("charge_centi"))
  }

  /** Oracle fixture of [[marginalTieredChargesVersioned]]: the q233
    * plan valid until 2024-01-15, an amended (steeper, re-banded) plan
    * from 2024-01-18 — with a deliberate three-day GAP between them, so
    * the as-of residual, the mid-cycle plan switch on a running
    * accumulator, AND the uncovered-time NULL contract are all provably
    * load-bearing on the 30-day events fixture. */
  private val q288 = {
    val mid = 1705276800L  // 2024-01-15T00:00:00Z
    val mid2 = 1705536000L // 2024-01-18T00:00:00Z
    val end = 4102444800L
    val rows = Seq(
      (0L, mid, 0L, 5000L, 5L),
      (0L, mid, 5000L, 20000L, 3L),
      (0L, mid, 20000L, Long.MaxValue, 1L),
      (mid2, end, 0L, 3000L, 6L),
      (mid2, end, 3000L, 15000L, 4L),
      (mid2, end, 15000L, Long.MaxValue, 2L))
    val valuesSql = rows.map { case (vf, vt, f, t, r) =>
      s"($vf, $vt, $f, $t, $r)"
    }.mkString(", ")
    GQuery(
      "q288_versioned_rating",
      (s, dir) => {
        import s.implicits._
        val tariff = rows.toDF("valid_from_sec", "valid_to_sec",
          "tier_from", "tier_to", "rate_centi")
        marginalTieredChargesVersioned(t(s, dir, "events"),
          expr("CAST(round(value * 100) AS BIGINT)"), tariff)
          .orderBy(col("event_id"))
      },
      Some(s"""WITH tariff(valid_from_sec, valid_to_sec, tier_from,
            tier_to, rate_centi) AS (VALUES $valuesSql),
        e AS (SELECT event_id, user_id AS k, ${epochSecSql("ts")} AS sec,
            CAST(round(value * 100) AS BIGINT) AS u
          FROM events),
        j AS (SELECT e.*, w.valid_from_sec AS tariff_from
          FROM e LEFT JOIN (SELECT DISTINCT valid_from_sec, valid_to_sec
            FROM tariff) w
          ON e.sec >= w.valid_from_sec AND e.sec < w.valid_to_sec),
        c AS (SELECT *, CASE WHEN tariff_from IS NOT NULL
            THEN greatest(u, CAST(0 AS BIGINT))
            ELSE CAST(0 AS BIGINT) END AS ue FROM j),
        m AS (SELECT *, CAST(SUM(ue) OVER (PARTITION BY k
            ORDER BY sec, event_id
            ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum
          FROM c)
        SELECT m.event_id, m.k, m.u, m.cum,
          CAST(m.tariff_from AS BIGINT) AS tariff_from,
          CAST(SUM(t.rate_centi *
            (least(greatest(m.cum - t.tier_from, 0),
               t.tier_to - t.tier_from) -
             least(greatest(m.cum - m.ue - t.tier_from, 0),
               t.tier_to - t.tier_from))) AS BIGINT) AS charge_centi
        FROM m LEFT JOIN tariff t ON m.tariff_from = t.valid_from_sec
        GROUP BY m.event_id, m.k, m.u, m.cum, m.tariff_from
        ORDER BY m.event_id"""))
  }

  val queries: Seq[GQuery] = Seq(q22, q23, q36, q37, q38, q46, q68, q84,
    q97, q169, q175, q195, q212, q219, q220, q225, q226, q231, q232, q233,
    q239, q244, q288, q320)
}
