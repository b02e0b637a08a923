package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import Dsl._

/** Window-function surface (SURVEY §2B): ranking, analytic lag/lead,
  * running frames, and the as-of join expressed as join + rank — the
  * tariff-version-lookup shape of a rating pipeline.
  */
object WindowQ {

  /** row_number ranking: top-3 orders per customer. */
  private val q07 = GQuery(
    "q07_window_rank",
    (s, dir) => {
      val w = Window.partitionBy(col("o_custkey"))
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))
      t(s, dir, "orders")
        .withColumn("rn", row_number().over(w).cast(LongType))
        .filter(col("rn") <= 3)
        .select(col("o_custkey"), col("o_orderkey"), col("o_totalprice"), col("rn"))
        .orderBy(col("o_custkey"), col("rn"))
    },
    Some("""SELECT o_custkey, o_orderkey, o_totalprice, rn FROM (
      SELECT o_custkey, o_orderkey, o_totalprice,
        ROW_NUMBER() OVER (PARTITION BY o_custkey
                           ORDER BY o_totalprice DESC, o_orderkey) AS rn
      FROM orders)
    WHERE rn <= 3
    ORDER BY o_custkey, rn"""))

  /** Running total over a ROWS frame (per-supplier cumulative quantity).
    * The fixture's (l_orderkey, l_linenumber) is NOT unique, so both the
    * window order and the output order carry value tiebreaks
    * (l_quantity / running_qty) — without them one sf0.1 tie makes the
    * running sums genuinely nondeterministic in both engines. */
  private val q08 = GQuery(
    "q08_running_total",
    (s, dir) => {
      val w = Window.partitionBy(col("l_suppkey"))
        .orderBy(col("l_shipdate"), col("l_orderkey"), col("l_linenumber"),
          col("l_quantity"), col("l_extendedprice"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      t(s, dir, "lineitem")
        .select(
          col("l_suppkey"), col("l_orderkey"), col("l_linenumber"),
          // (18,4) keeps per-row Decimals long-backed (see Dsl.moneySum);
          // exact for quantity magnitudes, same value as the (38,4) twin
          sum(col("l_quantity").cast(DecimalType(18, 4))).over(w)
            .cast(DoubleType).as("running_qty"))
        .orderBy(col("l_suppkey"), col("l_orderkey"), col("l_linenumber"),
          col("running_qty"))
    },
    Some("""SELECT l_suppkey, l_orderkey, l_linenumber,
      CAST(SUM(CAST(l_quantity AS DECIMAL(38,4))) OVER (
        PARTITION BY l_suppkey
        ORDER BY l_shipdate, l_orderkey, l_linenumber, l_quantity, l_extendedprice
        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS running_qty
    FROM lineitem
    ORDER BY l_suppkey, l_orderkey, l_linenumber, running_qty"""))

  /** lag/lead analytics: per-customer order history with day gaps. */
  private val q09 = GQuery(
    "q09_lag_lead",
    (s, dir) => {
      val w = Window.partitionBy(col("o_custkey"))
        .orderBy(col("o_orderdate"), col("o_orderkey"))
      t(s, dir, "orders")
        .select(
          col("o_custkey"), col("o_orderkey"),
          dateStr(col("o_orderdate")).as("order_date"),
          lag(col("o_orderkey"), 1).over(w).as("prev_order"),
          lead(col("o_orderkey"), 1).over(w).as("next_order"),
          datediff(col("o_orderdate"), lag(col("o_orderdate"), 1).over(w))
            .cast(LongType).as("days_since_prev"))
        .orderBy(col("o_custkey"), col("o_orderkey"))
    },
    Some(s"""SELECT o_custkey, o_orderkey,
      ${dateStrSql("o_orderdate")} AS order_date,
      LAG(o_orderkey, 1) OVER w AS prev_order,
      LEAD(o_orderkey, 1) OVER w AS next_order,
      CAST(date_diff('day',
        CAST(LAG(o_orderdate, 1) OVER w AS DATE),
        CAST(o_orderdate AS DATE)) AS BIGINT) AS days_since_prev
    FROM orders
    WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
    ORDER BY o_custkey, o_orderkey"""))

  /** As-of join: for each purchase event, the most recent prior-or-equal
    * click by the same user — join on key + time predicate, then keep
    * rank 1. The reference's tariff lookup (rate valid-from ≤ ts) has this
    * exact shape. At scale both sides shuffle once on user_id; the rank
    * dedup rides the same partitioning. */
  private val q20 = GQuery(
    "q20_asof_join",
    (s, dir) => {
      val ev = t(s, dir, "events")
      val purchases = ev.filter(col("event_type") === "purchase")
        .select(col("event_id").as("p_id"), col("user_id").as("p_user"), col("ts").as("p_ts"))
      val clicks = ev.filter(col("event_type") === "click")
        .select(col("event_id").as("c_id"), col("user_id").as("c_user"), col("ts").as("c_ts"))
      val w = Window.partitionBy(col("p_id"))
        .orderBy(col("c_ts").desc, col("c_id").desc)
      purchases
        .join(clicks, col("p_user") === col("c_user") && col("c_ts") <= col("p_ts"), "left")
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") === 1)
        .select(col("p_id"), col("p_user").as("user_id"), col("c_id").as("last_click_id"),
          (col("p_ts").cast(LongType) - col("c_ts").cast(LongType)).as("secs_since_click"))
        .orderBy(col("p_id"))
    },
    Some("""SELECT p_id, user_id, last_click_id, secs_since_click FROM (
      SELECT p.event_id AS p_id, p.user_id AS user_id, c.event_id AS last_click_id,
        (epoch_us(p.ts) // 1000000) - (epoch_us(c.ts) // 1000000) AS secs_since_click,
        ROW_NUMBER() OVER (PARTITION BY p.event_id
                           ORDER BY c.ts DESC, c.event_id DESC) AS rn
      FROM (SELECT * FROM events WHERE event_type = 'purchase') p
      LEFT JOIN (SELECT * FROM events WHERE event_type = 'click') c
        ON p.user_id = c.user_id AND c.ts <= p.ts)
    WHERE rn = 1
    ORDER BY p_id"""))

  /** The same as-of semantics through the engine's custom Catalyst
    * operator (graft.plans.AsOfJoin: LogicalPlan + Strategy + Exec —
    * binary-search per left row instead of the join+rank blow-up). Same
    * oracle as q20 modulo timestamp ties, which the fixture doesn't have. */
  private val q20b = GQuery(
    "q20b_asof_custom",
    (s, dir) => {
      val ev = t(s, dir, "events")
      val purchases = ev.filter(col("event_type") === "purchase")
        .select(col("event_id").as("p_id"), col("user_id").as("p_user"), col("ts").as("p_ts"))
      val clicks = ev.filter(col("event_type") === "click")
        .select(col("event_id").as("c_id"), col("user_id").as("c_user"), col("ts").as("c_ts"))
      graft.plans.AsOf.join(purchases, clicks,
          Seq("p_user"), Seq("c_user"), "p_ts", "c_ts")
        .select(col("p_id"), col("p_user").as("user_id"),
          col("c_id").as("last_click_id"),
          (col("p_ts").cast(LongType) - col("c_ts").cast(LongType)).as("secs_since_click"))
        .orderBy(col("p_id"))
    },
    Some("""SELECT p_id, user_id, last_click_id, secs_since_click FROM (
      SELECT p.event_id AS p_id, p.user_id AS user_id, c.event_id AS last_click_id,
        (epoch_us(p.ts) // 1000000) - (epoch_us(c.ts) // 1000000) AS secs_since_click,
        ROW_NUMBER() OVER (PARTITION BY p.event_id
                           ORDER BY c.ts DESC, c.event_id DESC) AS rn
      FROM (SELECT * FROM events WHERE event_type = 'purchase') p
      LEFT JOIN (SELECT * FROM events WHERE event_type = 'click') c
        ON p.user_id = c.user_id AND c.ts <= p.ts)
    WHERE rn = 1
    ORDER BY p_id"""))

  /** first/last/nth analytics over frames. */
  private val q07b = GQuery(
    "q07b_first_last",
    (s, dir) => {
      val w = Window.partitionBy(col("o_custkey"))
        .orderBy(col("o_orderdate"), col("o_orderkey"))
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
      t(s, dir, "orders")
        .select(
          col("o_custkey"), col("o_orderkey"),
          first(col("o_orderkey")).over(w).as("first_order"),
          last(col("o_orderkey")).over(w).as("last_order"))
        .orderBy(col("o_custkey"), col("o_orderkey"))
    },
    Some("""SELECT o_custkey, o_orderkey,
      FIRST_VALUE(o_orderkey) OVER w AS first_order,
      LAST_VALUE(o_orderkey) OVER w AS last_order
    FROM orders
    WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                 ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
    ORDER BY o_custkey, o_orderkey"""))

  /** Build a slowly-changing-dimension (SCD type 2) table from a change
    * log: each (key, change_ts, attributes) event becomes a VERSION row
    * with `[valid_from, valid_to)` validity and an `is_current` flag —
    * the versioned dimension the as-of join ([[graft.plans.AsOf]])
    * consumes, and the config-plane maintenance the reference performs
    * on its tariff tables. One window (lead over the key's change
    * order); `tieCol` disambiguates same-timestamp changes so version
    * intervals are deterministic. */
  def scd2(changes: org.apache.spark.sql.DataFrame, keyCol: String,
      tsCol: String, tieCol: String): org.apache.spark.sql.DataFrame = {
    val w = Window.partitionBy(col(keyCol)).orderBy(col(tsCol), col(tieCol))
    changes
      .withColumn("valid_from", col(tsCol))
      .withColumn("valid_to", lead(col(tsCol), 1).over(w))
      .withColumn("is_current", col("valid_to").isNull)
  }

  /** Oracle fixture of [[scd2]]: the events log as a change stream —
    * each user's event_type becomes a versioned attribute. Timestamps
    * render at second granularity (cross-engine safe); open-ended
    * current versions carry NULL valid_to in both engines. */
  private val q70 = GQuery(
    "q70_scd2_versions",
    (s, dir) => scd2(t(s, dir, "events"), "user_id", "ts", "event_id")
      .select(col("user_id"), col("event_id"), col("event_type"),
        tsStr(col("valid_from")).as("valid_from"),
        tsStr(col("valid_to")).as("valid_to"),
        col("is_current"))
      .orderBy(col("user_id"), col("valid_from"), col("event_id")),
    Some(s"""SELECT user_id, event_id, event_type,
        ${tsStrSql("ts")} AS valid_from,
        ${tsStrSql("LEAD(ts, 1) OVER (PARTITION BY user_id ORDER BY ts, event_id)")} AS valid_to,
        LEAD(ts, 1) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
          AS is_current
      FROM events
      ORDER BY user_id, valid_from, event_id"""))

  /** CDC batch compaction: keep only the LATEST row per key (highest
    * `versionCol`, ties broken by `tieCol`) — the step that collapses a
    * change-capture batch to one action per key before it feeds
    * [[graft.etl.MergeWrite.merge]] (whose key contract is one update
    * row per key). One window shuffle on the key. */
  def latestPerKey(changes: org.apache.spark.sql.DataFrame, keyCols: Seq[String],
      versionCol: String, tieCol: String): org.apache.spark.sql.DataFrame = {
    require(keyCols.nonEmpty, "at least one key column required")
    val w = Window.partitionBy(keyCols.map(col): _*)
      .orderBy(col(versionCol).desc, col(tieCol).desc)
    changes.withColumn("_rn", row_number().over(w))
      .filter(col("_rn") === 1).drop("_rn")
  }

  /** Oracle fixture of [[latestPerKey]]: each user's latest event — the
    * compacted state a CDC consumer upserts. */
  private val q75 = GQuery(
    "q75_latest_per_key",
    (s, dir) => latestPerKey(t(s, dir, "events"), Seq("user_id"), "ts", "event_id")
      .select(col("user_id"), col("event_id"), col("event_type"),
        tsStr(col("ts")).as("ts"))
      .orderBy(col("user_id")),
    Some(s"""SELECT user_id, event_id, event_type, ${tsStrSql("ts")} AS ts
      FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY user_id
              ORDER BY ts DESC, event_id DESC) AS rn
            FROM events)
      WHERE rn = 1
      ORDER BY user_id"""))

  /** Keyed diff between two snapshots of one logical table — the dataset-
    * versioning primitive behind audit/drift reports and incremental
    * re-publishes: one row per key present in either snapshot, classified
    * `insert` / `delete` / `update` / `same`, plus a changed-column
    * bitmask (bit i set ⇔ `compareCols(i)` differs, null-safe) so a
    * consumer can re-process only the columns that moved.
    *
    * One full-outer hash join on the key — both sides shuffle once and
    * the classification is pure codegen'd expressions; at 100 TB this is
    * the same plan shape as the merge it usually precedes
    * ([[graft.etl.MergeWrite.merge]]), and bucketing both snapshots on
    * the key removes even that shuffle. Presence is tracked with explicit
    * flags, so null-able keys and all-null compare rows classify
    * correctly.
    */
  def snapshotDiff(oldDf: org.apache.spark.sql.DataFrame,
      newDf: org.apache.spark.sql.DataFrame,
      keyCols: Seq[String], compareCols: Seq[String]): org.apache.spark.sql.DataFrame = {
    require(keyCols.nonEmpty, "at least one key column required")
    require(compareCols.nonEmpty && compareCols.size <= 62,
      s"1..62 compare columns (long bitmask), got ${compareCols.size}")
    val o = oldDf.select(keyCols.map(col) ++
        compareCols.map(c => col(c).as(s"old_$c")): _*)
      .withColumn("_in_old", lit(true))
    val n = newDf.select(keyCols.map(col) ++
        compareCols.map(c => col(c).as(s"new_$c")): _*)
      .withColumn("_in_new", lit(true))
    val mask = compareCols.zipWithIndex.map { case (c, i) =>
      when(!(col(s"old_$c") <=> col(s"new_$c")), lit(1L << i)).otherwise(lit(0L))
    }.reduce(_ + _)
    o.join(n, keyCols, "full_outer")
      .withColumn("op",
        when(col("_in_old").isNull, lit("insert"))
          .when(col("_in_new").isNull, lit("delete"))
          .when(mask > 0, lit("update"))
          .otherwise(lit("same")))
      .withColumn("changed_mask",
        when(col("op") === "update", mask).otherwise(lit(0L)))
      .select(keyCols.map(col) ++ Seq(col("op"), col("changed_mask")) ++
        compareCols.map(c => col(s"new_$c")): _*)
  }

  /** Oracle fixture of [[snapshotDiff]]: per-user latest-event state
    * compacted at Jan 30 ([[latestPerKey]]) diffed against the final
    * state — bit 0 = event_type changed, bit 1 = value changed. */
  private val q79 = GQuery(
    "q79_snapshot_diff",
    (s, dir) => {
      val ev = t(s, dir, "events")
      snapshotDiff(
        latestPerKey(ev.filter(col("ts") < expr("TIMESTAMP '2024-01-30 00:00:00'")),
          Seq("user_id"), "ts", "event_id"),
        latestPerKey(ev, Seq("user_id"), "ts", "event_id"),
        Seq("user_id"), Seq("event_type", "value"))
        .orderBy(col("user_id"))
    },
    Some("""WITH olds AS (SELECT user_id, event_type, value FROM (
          SELECT user_id, event_type, value,
            ROW_NUMBER() OVER (PARTITION BY user_id
              ORDER BY ts DESC, event_id DESC) AS rn
          FROM events WHERE ts < TIMESTAMP '2024-01-30 00:00:00') WHERE rn = 1),
      news AS (SELECT user_id, event_type, value FROM (
          SELECT user_id, event_type, value,
            ROW_NUMBER() OVER (PARTITION BY user_id
              ORDER BY ts DESC, event_id DESC) AS rn
          FROM events) WHERE rn = 1),
      j AS (SELECT COALESCE(o.user_id, n.user_id) AS user_id,
          o.user_id IS NOT NULL AS in_old, n.user_id IS NOT NULL AS in_new,
          o.event_type AS ot, o.value AS ov,
          n.event_type AS nt, n.value AS nv
        FROM olds o FULL OUTER JOIN news n ON o.user_id = n.user_id)
    SELECT user_id,
      CASE WHEN NOT in_old THEN 'insert'
           WHEN NOT in_new THEN 'delete'
           WHEN (ot IS DISTINCT FROM nt) OR (ov IS DISTINCT FROM nv)
             THEN 'update'
           ELSE 'same' END AS op,
      CAST(CASE WHEN in_old AND in_new THEN
          (CASE WHEN ot IS DISTINCT FROM nt THEN 1 ELSE 0 END) +
          (CASE WHEN ov IS DISTINCT FROM nv THEN 2 ELSE 0 END)
        ELSE 0 END AS BIGINT) AS changed_mask,
      nt AS new_event_type, nv AS new_value
    FROM j
    ORDER BY user_id"""))

  /** Time-RANGE moving aggregate: per-key trailing-`windowSec` event count
    * and value sum at every event — the rows-frame (q08) counts
    * neighbors by POSITION; this one by TIME DISTANCE, the semantics a
    * rate limiter / rolling-revenue monitor needs on an irregular
    * stream. Money stays in exact centi-unit longs inside the frame sum
    * (a long sum of cents is order-independent; a double sum is not) and
    * divides back out once per row. Peers at the same timestamp see the
    * same frame by RANGE definition, so output is replay-stable without
    * a tiebreak. One window pass partitioned by key; a pathologically
    * hot key serializes in one partition — pre-bucket by coarse time if
    * a single key's history outgrows an executor (two-level rollup). */
  def movingWindow(events: org.apache.spark.sql.DataFrame, keyCol: String,
      tsCol: String, valCol: String, windowSec: Long,
      idCol: String = "event_id"): org.apache.spark.sql.DataFrame = {
    require(windowSec >= 1, s"windowSec must be >= 1, got $windowSec")
    val w = Window.partitionBy(col(keyCol)).orderBy(col("sec"))
      .rangeBetween(-windowSec, Window.currentRow)
    events
      .select(col(keyCol), col(idCol),
        // ts→long cast = floor epoch seconds, matching the oracle's `//`
        col(tsCol).cast(LongType).as("sec"),
        round(col(valCol) * 100).cast(LongType).as("ly"))
      .withColumn("n_trailing", count(lit(1)).over(w))
      .withColumn("sum_trailing", sum(col("ly")).over(w) / lit(100d))
      .select(col(idCol), col(keyCol), col("n_trailing"), col("sum_trailing"))
  }

  /** Oracle fixture of [[movingWindow]]: per-user trailing 24 h. */
  private val q95 = GQuery(
    "q95_moving_window",
    (s, dir) => movingWindow(t(s, dir, "events"), "user_id", "ts", "value",
        windowSec = 86400L)
      .orderBy(col("event_id")),
    Some("""WITH o AS (
        SELECT event_id, user_id,
          CAST(epoch_us(ts) // 1000000 AS BIGINT) AS sec,
          CAST(round(value * 100) AS BIGINT) AS ly
        FROM events)
      SELECT event_id, user_id,
        COUNT(*) OVER w AS n_trailing,
        CAST(SUM(ly) OVER w AS BIGINT) / 100.0 AS sum_trailing
      FROM o
      WINDOW w AS (PARTITION BY user_id ORDER BY sec
        RANGE BETWEEN 86400 PRECEDING AND CURRENT ROW)
      ORDER BY event_id"""))

  /** Moving median over a time-RANGE frame: the robust companion to
    * [[movingWindow]]'s count/sum — a rate monitor that alerts on the
    * trailing MEDIAN ignores the single spike that would fire a
    * mean-based alert. Same exact-centi-unit discipline; the percentile
    * interpolates between two exact integers, so both engines derive the
    * same double (the q41 cross-engine precedent, here per-frame).
    *
    * Scale note: a percentile over a sliding frame re-aggregates per
    * frame — O(rows × frame) inside each key partition, the honest cost
    * of an exact moving quantile. At 100 TB prefer the cell-collapsed
    * approximation (gapFill's latest-per-cell, then a percentile over
    * cells) unless exactness is the requirement. */
  private val q98 = GQuery(
    "q98_moving_median",
    (s, dir) => {
      val w = Window.partitionBy(col("user_id")).orderBy(col("sec"))
        .rangeBetween(-86400L, Window.currentRow)
      t(s, dir, "events")
        .select(col("event_id"), col("user_id"),
          col("ts").cast(LongType).as("sec"),
          round(col("value") * 100).cast(LongType).as("ly"))
        .withColumn("med_trailing",
          round(expr("percentile(ly, 0.5)").over(w) / lit(100d), 4))
        .select(col("event_id"), col("user_id"), col("med_trailing"))
        .orderBy(col("event_id"))
    },
    Some("""WITH o AS (
        SELECT event_id, user_id,
          CAST(epoch_us(ts) // 1000000 AS BIGINT) AS sec,
          CAST(round(value * 100) AS BIGINT) AS ly
        FROM events)
      SELECT event_id, user_id,
        round(quantile_cont(ly, 0.5) OVER w / 100.0, 4) AS med_trailing
      FROM o
      WINDOW w AS (PARTITION BY user_id ORDER BY sec
        RANGE BETWEEN 86400 PRECEDING AND CURRENT ROW)
      ORDER BY event_id"""))

  /** Distribution-rank window functions — ntile bucketing (the
    * equal-count decile assignment reporting layers ask for) plus
    * percent_rank/cume_dist. ntile/row-counts are exact integers;
    * percent_rank and cume_dist are ratios of small integers computed as
    * the same IEEE division in both engines, so the 6dp round is
    * engine-stable. The (price desc, orderkey) order is total, making
    * every bucket boundary deterministic. Partitioned by CUSTOMER —
    * high-cardinality, so reducers scale with the data; a
    * low-cardinality partition key (priority, region) would funnel the
    * corpus through a handful of reducers, and a GLOBAL ntile at scale
    * is the q124 two-pass bucket construction, not a bare window. */
  private val q144 = GQuery(
    "q144_ntile_ranks",
    (s, dir) => {
      val w = Window.partitionBy(col("o_custkey"))
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))
      t(s, dir, "orders")
        .select(col("o_orderkey"), col("o_custkey"),
          ntile(4).over(w).cast(LongType).as("quartile"),
          round(percent_rank().over(w), 6).as("pct_rank"),
          round(cume_dist().over(w), 6).as("cume"))
        .orderBy(col("o_orderkey"))
    },
    Some("""SELECT o_orderkey, o_custkey,
        CAST(NTILE(4) OVER w AS BIGINT) AS quartile,
        ROUND(PERCENT_RANK() OVER w, 6) AS pct_rank,
        ROUND(CUME_DIST() OVER w, 6) AS cume
      FROM orders
      WINDOW w AS (PARTITION BY o_custkey
        ORDER BY o_totalprice DESC, o_orderkey)
      ORDER BY o_orderkey"""))

  /** SCD2 validity-window audit — the data-quality gate run on a
    * versioned dimension BEFORE the as-of join trusts it: per key, sort
    * versions by (valid_from, valid_to) and flag OVERLAPS (a fact row in
    * the overlap region matches two versions — the as-of pick silently
    * resolves it, hiding a data bug), GAPS (facts in the gap match the
    * older version — usually wrong), and MULTIPLE OPEN versions
    * (valid_to NULL more than once ⇒ "current" is ambiguous). One
    * summary row: key/version counts, per-defect counts, and the number
    * of fully clean keys. [[scd2]]'s own lead() construction is
    * contiguous by construction; this audits dims built ELSEWHERE (the
    * reference's Oracle-maintained config tables are exactly such
    * hand-maintained versioned dims).
    *
    * Each version compares against the RUNNING MAX of all predecessors'
    * coverage, coalescing an open (NULL) valid_to to +infinity — not
    * against the immediate predecessor alone. Lag-of-valid_to audits
    * miss two real defect shapes: an open version followed by later
    * versions reads clean (NULL compares as neither overlap nor gap,
    * when it in fact overlaps EVERYTHING after it), and a short version
    * nested inside an earlier long one makes the NEXT row flag a false
    * gap (its lag sees the short version's early valid_to, not the long
    * version still covering the region) while the true overlap goes
    * uncounted.
    *
    * Plan: one key-partitioned running-max window + one per-key agg +
    * one global agg — a single hash exchange on the key. Times compare
    * as integer epoch seconds (engine-portable); +infinity is
    * Long.MaxValue, unreachable by any epoch cast. */
  def scd2Audit(dim: org.apache.spark.sql.DataFrame, keyCol: String,
      fromCol: String, toCol: String): org.apache.spark.sql.DataFrame = {
    val wPrev = Window.partitionBy(col("k"))
      .orderBy(col("f"), col("t").asc_nulls_last)
      .rowsBetween(Window.unboundedPreceding, -1)
    val marked = dim.select(col(keyCol).as("k"),
        col(fromCol).cast(org.apache.spark.sql.types.LongType).as("f"),
        col(toCol).cast(org.apache.spark.sql.types.LongType).as("t"))
      .withColumn("prev_cov",
        max(coalesce(col("t"), lit(Long.MaxValue))).over(wPrev))
      .select(col("k"),
        when(col("prev_cov").isNotNull && col("f") < col("prev_cov"), 1L)
          .otherwise(0L).as("ovl"),
        when(col("prev_cov").isNotNull && col("f") > col("prev_cov"), 1L)
          .otherwise(0L).as("gap"),
        when(col("t").isNull, 1L).otherwise(0L).as("open"))
    marked.groupBy(col("k"))
      .agg(count(lit(1)).as("nv"), sum(col("ovl")).as("no"),
        sum(col("gap")).as("ng"), sum(col("open")).as("nopen"))
      .agg(count(lit(1)).as("n_keys"),
        sum(col("nv")).as("n_versions"),
        sum(col("no")).as("n_overlaps"),
        sum(col("ng")).as("n_gaps"),
        sum(when(col("nopen") > 1, 1L).otherwise(0L))
          .as("n_keys_multi_open"),
        sum(when(col("no") === 0 && col("ng") === 0 && col("nopen") <= 1, 1L)
          .otherwise(0L)).as("n_keys_clean"))
  }

  /** Oracle fixture of [[scd2Audit]]: a deliberately imperfect versioned
    * dim synthesized from events — valid_to = ts + value-scaled duration,
    * so overlaps AND gaps both occur naturally per user. */
  private val q204 = GQuery(
    "q204_scd2_audit",
    (s, dir) => {
      val dim = t(s, dir, "events").select(col("user_id"),
        col("ts").cast(org.apache.spark.sql.types.LongType).as("vf"),
        when(col("event_type") === "signup", lit(null)
            .cast(org.apache.spark.sql.types.LongType))
          .otherwise(col("ts").cast(org.apache.spark.sql.types.LongType) +
            expr("CAST(round(value * 100) AS BIGINT)")).as("vt"))
      scd2Audit(dim, "user_id", "vf", "vt")
    },
    Some(s"""WITH dim AS (SELECT user_id,
          ${epochSecSql("ts")} AS f,
          CASE WHEN event_type = 'signup' THEN NULL
               ELSE ${epochSecSql("ts")} + CAST(round(value * 100) AS BIGINT)
          END AS t
        FROM events),
      m AS (SELECT user_id AS k, f, t,
          MAX(COALESCE(t, 9223372036854775807)) OVER (PARTITION BY user_id
            ORDER BY f, t ASC NULLS LAST
            ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS prev_cov
        FROM dim),
      fl AS (SELECT k,
          CASE WHEN prev_cov IS NOT NULL AND f < prev_cov THEN 1 ELSE 0 END AS ovl,
          CASE WHEN prev_cov IS NOT NULL AND f > prev_cov THEN 1 ELSE 0 END AS gap,
          CASE WHEN t IS NULL THEN 1 ELSE 0 END AS opn
        FROM m),
      pk AS (SELECT k, COUNT(*) AS nv, SUM(ovl) AS no, SUM(gap) AS ng,
               SUM(opn) AS nopen
             FROM fl GROUP BY k)
      SELECT COUNT(*) AS n_keys,
        CAST(SUM(nv) AS BIGINT) AS n_versions,
        CAST(SUM(no) AS BIGINT) AS n_overlaps,
        CAST(SUM(ng) AS BIGINT) AS n_gaps,
        CAST(SUM(CASE WHEN nopen > 1 THEN 1 ELSE 0 END) AS BIGINT)
          AS n_keys_multi_open,
        CAST(SUM(CASE WHEN no = 0 AND ng = 0 AND nopen <= 1 THEN 1 ELSE 0 END)
          AS BIGINT) AS n_keys_clean
      FROM pk"""))

  /** Time-weighted average (TWAP) — irregular samples weighted by
    * HOLDING TIME, not sample count: each observation holds from its
    * timestamp until the key's next one, and the average weights values
    * by that duration. The metering/rating classic (a gauge sampled
    * bursty-then-idle is wildly mis-averaged by a plain mean — ten
    * samples in one minute and one covering an hour), and the exact
    * form of what streaming "last value carried forward" aggregations
    * approximate. Exact integers: centi-values × second durations
    * accumulate in DECIMAL(38,0); the final milli-average divides once.
    * The last observation of each key has no successor and carries no
    * weight (the oracle-portable convention — extending it to a global
    * horizon is one greatest() away). One lag/lead window per key. */
  def timeWeightedAverage(events: org.apache.spark.sql.DataFrame,
      keyCol: String = "user_id", tsCol: String = "ts",
      valCol: String = "value"): org.apache.spark.sql.DataFrame = {
    val w = Window.partitionBy(col(keyCol))
      .orderBy(col("sec"), col("event_id"))
    events
      .select(col(keyCol), col("event_id"),
        col(tsCol).cast(org.apache.spark.sql.types.LongType).as("sec"),
        expr(s"CAST(round($valCol * 100) AS BIGINT)").as("cv"))
      .withColumn("next_sec", lead(col("sec"), 1).over(w))
      .filter(col("next_sec").isNotNull)
      .groupBy(col(keyCol))
      .agg(count(lit(1)).as("n_intervals"),
        sum(col("next_sec") - col("sec")).as("span_sec"),
        sum(expr("CAST(cv AS DECIMAL(38,0)) * (next_sec - sec)"))
          .as("wsum"))
      .filter(col("span_sec") > 0)
      .select(col(keyCol), col("n_intervals"), col("span_sec"),
        expr("CAST((10 * wsum) DIV span_sec AS BIGINT)").as("twap_milli"))
  }

  /** Oracle fixture of [[timeWeightedAverage]] per user. */
  private val q215 = GQuery(
    "q215_time_weighted_avg",
    (s, dir) => timeWeightedAverage(t(s, dir, "events"))
      .orderBy(col("user_id")),
    Some(s"""WITH e AS (SELECT user_id, event_id,
          ${epochSecSql("ts")} AS sec,
          CAST(round(value * 100) AS BIGINT) AS cv
        FROM events),
      m AS (SELECT *,
          LEAD(sec) OVER (PARTITION BY user_id
            ORDER BY sec, event_id) AS next_sec
        FROM e),
      agg AS (SELECT user_id, COUNT(*) AS n_intervals,
          CAST(SUM(next_sec - sec) AS BIGINT) AS span_sec,
          SUM(CAST(cv AS HUGEINT) * (next_sec - sec)) AS wsum
        FROM m WHERE next_sec IS NOT NULL
        GROUP BY user_id)
      SELECT user_id, n_intervals, span_sec,
        CAST((10 * wsum) // span_sec AS BIGINT) AS twap_milli
      FROM agg WHERE span_sec > 0
      ORDER BY user_id"""))

  val queries: Seq[GQuery] = Seq(q07, q07b, q08, q09, q20, q20b, q70, q75,
    q79, q95, q98, q144, q204, q215)
}
