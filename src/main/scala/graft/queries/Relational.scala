package graft.queries

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import Dsl._

/** Core relational surface (SURVEY §2B): scans, filters, the join family,
  * hash aggregation, rollup/cube, set ops, top-k, scalar functions.
  *
  * The reference delegates all of this to unshipped session plugins (its
  * visible layer only routes packets, `MFramework.cpp:1275-1314`); here it
  * is the declarative DataFrame surface, so Catalyst supplies pushdown,
  * pruning, broadcast selection and whole-stage codegen.
  */
object Relational {

  /** TPC-H Q1-style pricing summary: wide hash aggregate with partial
    * (map-side) aggregation — the shape that must scale by key count, not
    * row count. */
  private val q01 = GQuery(
    "q01_pricing_summary",
    (s, dir) => {
      t(s, dir, "lineitem")
        .filter(col("l_shipdate") <= lit("2000-09-02").cast(TimestampType))
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(
          moneySum(col("l_quantity")).as("sum_qty"),
          moneySum(col("l_extendedprice")).as("sum_base_price"),
          moneySum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))).as("sum_disc_price"),
          moneySum(col("l_extendedprice") * (lit(1.0) - col("l_discount")) * (lit(1.0) + col("l_tax"))).as("sum_charge"),
          avg6(col("l_quantity")).as("avg_qty"),
          avg6(col("l_extendedprice")).as("avg_price"),
          avg6(col("l_discount")).as("avg_disc"),
          count(lit(1)).as("count_order"))
        .orderBy(col("l_returnflag"), col("l_linestatus"))
    },
    Some(s"""SELECT l_returnflag, l_linestatus,
      ${moneySumSql("l_quantity")} AS sum_qty,
      ${moneySumSql("l_extendedprice")} AS sum_base_price,
      ${moneySumSql("l_extendedprice * (1.0 - l_discount)")} AS sum_disc_price,
      ${moneySumSql("l_extendedprice * (1.0 - l_discount) * (1.0 + l_tax)")} AS sum_charge,
      ${avg6Sql("l_quantity")} AS avg_qty,
      ${avg6Sql("l_extendedprice")} AS avg_price,
      ${avg6Sql("l_discount")} AS avg_disc,
      COUNT(*) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '2000-09-02 00:00:00'
    GROUP BY l_returnflag, l_linestatus
    ORDER BY l_returnflag, l_linestatus"""))

  /** Flagship: revenue by region — fact⋈fact sort-merge (lineitem⋈orders)
    * plus broadcast dims, filter pushed to the orders scan, then hash agg.
    * At 100 TB the dims stay broadcast; only one big shuffle (the fact
    * join) survives, and AQE coalesces the agg. */
  private val q02 = GQuery(
    "q02_revenue_by_region",
    (s, dir) => {
      val li = t(s, dir, "lineitem")
      val o = t(s, dir, "orders")
        .filter(col("o_orderdate") >= lit("1996-01-01").cast(TimestampType) &&
          col("o_orderdate") < lit("1998-01-01").cast(TimestampType))
      val c = t(s, dir, "customer")
      val n = t(s, dir, "nation")
      val r = t(s, dir, "region")
      li.join(o, col("l_orderkey") === col("o_orderkey"))
        .join(broadcast(c), col("o_custkey") === col("c_custkey"))
        .join(broadcast(n), col("c_nationkey") === col("n_nationkey"))
        .join(broadcast(r), col("n_regionkey") === col("r_regionkey"))
        .groupBy(col("r_name"))
        .agg(
          moneySum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))).as("revenue"),
          count(lit(1)).as("n_items"))
        .orderBy(col("revenue").desc, col("r_name"))
    },
    Some(s"""SELECT r_name,
      ${moneySumSql("l_extendedprice * (1.0 - l_discount)")} AS revenue,
      COUNT(*) AS n_items
    FROM lineitem
    JOIN orders ON l_orderkey = o_orderkey
    JOIN customer ON o_custkey = c_custkey
    JOIN nation ON c_nationkey = n_nationkey
    JOIN region ON n_regionkey = r_regionkey
    WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
    GROUP BY r_name
    ORDER BY revenue DESC, r_name"""))

  /** Top-k: highest-revenue orders; Catalyst plans the sort+limit as
    * TakeOrderedAndProject (per-partition top-k, no global sort). */
  private val q03 = GQuery(
    "q03_top_orders",
    (s, dir) => {
      val rev = t(s, dir, "lineitem")
        .groupBy(col("l_orderkey"))
        .agg(moneySum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))).as("revenue"))
      t(s, dir, "orders")
        .join(rev, col("o_orderkey") === col("l_orderkey"))
        .select(col("o_orderkey"), dateStr(col("o_orderdate")).as("order_date"),
          col("o_orderpriority"), col("revenue"))
        .orderBy(col("revenue").desc, col("o_orderkey"))
        .limit(10)
    },
    Some(s"""SELECT o_orderkey, ${dateStrSql("o_orderdate")} AS order_date,
      o_orderpriority, revenue
    FROM orders
    JOIN (SELECT l_orderkey,
            ${moneySumSql("l_extendedprice * (1.0 - l_discount)")} AS revenue
          FROM lineitem GROUP BY l_orderkey) r ON o_orderkey = l_orderkey
    ORDER BY revenue DESC, o_orderkey
    LIMIT 10"""))

  /** Left-semi join (EXISTS): order priorities having a big-quantity line. */
  private val q04 = GQuery(
    "q04_semi_join",
    (s, dir) => {
      val big = t(s, dir, "lineitem").filter(col("l_quantity") > 45)
      t(s, dir, "orders")
        .join(big, col("o_orderkey") === col("l_orderkey"), "left_semi")
        .groupBy(col("o_orderpriority"))
        .agg(count(lit(1)).as("order_count"))
        .orderBy(col("o_orderpriority"))
    },
    Some("""SELECT o_orderpriority, COUNT(*) AS order_count
    FROM orders o
    WHERE EXISTS (SELECT 1 FROM lineitem
                  WHERE l_orderkey = o.o_orderkey AND l_quantity > 45)
    GROUP BY o_orderpriority
    ORDER BY o_orderpriority"""))

  /** Left-anti join (NOT EXISTS): customers with no orders, by segment. */
  private val q05 = GQuery(
    "q05_anti_join",
    (s, dir) => {
      t(s, dir, "customer")
        .join(t(s, dir, "orders"), col("c_custkey") === col("o_custkey"), "left_anti")
        .groupBy(col("c_mktsegment"))
        .agg(count(lit(1)).as("n_customers"), moneySum(col("c_acctbal")).as("sum_bal"))
        .orderBy(col("c_mktsegment"))
    },
    Some(s"""SELECT c_mktsegment, COUNT(*) AS n_customers,
      ${moneySumSql("c_acctbal")} AS sum_bal
    FROM customer c
    WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c.c_custkey)
    GROUP BY c_mktsegment
    ORDER BY c_mktsegment"""))

  /** TPC-H Q6-style: tight scan + filter + scalar aggregate; the predicate
    * must reach the parquet scan (PushedFilters). */
  private val q06 = GQuery(
    "q06_filtered_revenue",
    (s, dir) => {
      t(s, dir, "lineitem")
        .filter(col("l_shipdate") >= lit("1997-01-01").cast(TimestampType) &&
          col("l_shipdate") < lit("1998-01-01").cast(TimestampType) &&
          col("l_discount").between(0.05, 0.07) && col("l_quantity") < 24)
        .agg(moneySum(col("l_extendedprice") * col("l_discount")).as("revenue"),
          count(lit(1)).as("n_lines"))
    },
    Some(s"""SELECT ${moneySumSql("l_extendedprice * l_discount")} AS revenue,
      COUNT(*) AS n_lines
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
      AND l_shipdate < TIMESTAMP '1998-01-01 00:00:00'
      AND l_discount BETWEEN 0.05 AND 0.07 AND l_quantity < 24"""))

  /** ROLLUP: hierarchical subtotals (usage-report shape, SURVEY §2B). */
  private val q10 = GQuery(
    "q10_rollup",
    (s, dir) => {
      t(s, dir, "lineitem")
        .rollup(col("l_returnflag"), col("l_linestatus"))
        .agg(moneySum(col("l_quantity")).as("sum_qty"), count(lit(1)).as("n"))
        .orderBy(asc_nulls_first("l_returnflag"), asc_nulls_first("l_linestatus"))
    },
    Some(s"""SELECT l_returnflag, l_linestatus,
      ${moneySumSql("l_quantity")} AS sum_qty, COUNT(*) AS n
    FROM lineitem
    GROUP BY ROLLUP(l_returnflag, l_linestatus)
    ORDER BY l_returnflag NULLS FIRST, l_linestatus NULLS FIRST"""))

  /** CUBE over order status × priority. */
  private val q11 = GQuery(
    "q11_cube",
    (s, dir) => {
      t(s, dir, "orders")
        .cube(col("o_orderstatus"), col("o_orderpriority"))
        .agg(moneySum(col("o_totalprice")).as("sum_price"), count(lit(1)).as("n"))
        .orderBy(asc_nulls_first("o_orderstatus"), asc_nulls_first("o_orderpriority"))
    },
    Some(s"""SELECT o_orderstatus, o_orderpriority,
      ${moneySumSql("o_totalprice")} AS sum_price, COUNT(*) AS n
    FROM orders
    GROUP BY CUBE(o_orderstatus, o_orderpriority)
    ORDER BY o_orderstatus NULLS FIRST, o_orderpriority NULLS FIRST"""))

  /** Exact COUNT(DISTINCT) — expands to a two-phase distinct aggregate. */
  private val q12 = GQuery(
    "q12_count_distinct",
    (s, dir) => {
      t(s, dir, "orders")
        .groupBy(col("o_orderstatus"))
        .agg(
          countDistinct(col("o_custkey")).as("n_customers"),
          countDistinct(col("o_orderpriority")).as("n_priorities"),
          count(lit(1)).as("n_orders"))
        .orderBy(col("o_orderstatus"))
    },
    Some("""SELECT o_orderstatus,
      COUNT(DISTINCT o_custkey) AS n_customers,
      COUNT(DISTINCT o_orderpriority) AS n_priorities,
      COUNT(*) AS n_orders
    FROM orders
    GROUP BY o_orderstatus
    ORDER BY o_orderstatus"""))

  /** HLL sketch (approx_count_distinct) — the sketch VALUE is
    * algorithm-specific (DuckDB cannot replay Spark's HLL++ registers),
    * but its accuracy CONTRACT is oracle-checkable: emit the exact
    * distinct count (both engines compute it identically) plus a boolean
    * `approx_ok` = |approx − exact| ≤ 3σ with σ = the requested rsd 0.02,
    * which the oracle pins as TRUE. A Spark upgrade that broke the sketch
    * (or a config that silently degraded precision) now hash-mismatches
    * instead of sliding through a rows-only check. rsd 0.02: HLL++
    * register count scales with 1/rsd², so 1% precision costs 4× the
    * sketch update/merge work of 2% for no analytical benefit here
    * (q12 carries the exact count). */
  private val q12b = GQuery(
    "q12b_hll_approx",
    (s, dir) => {
      // HLL is duplicate-insensitive, so pre-deduplicating the pairs
      // gives a byte-identical sketch while replacing the expand-based
      // dual distinct aggregation with one partial-agg shuffle on the
      // pair key + a trivial second agg (measured ~3x faster at sf0.1).
      t(s, dir, "lineitem")
        .select(col("l_returnflag"), col("l_orderkey")).distinct()
        .groupBy(col("l_returnflag"))
        .agg(count(lit(1)).as("n_exact"),
          approx_count_distinct(col("l_orderkey"), 0.02).as("approx"))
        .select(col("l_returnflag"), col("n_exact"),
          (abs(col("approx") - col("n_exact")).cast(DoubleType) <=
            lit(0.06) * col("n_exact").cast(DoubleType)).as("approx_ok"))
        .orderBy(col("l_returnflag"))
    },
    Some("""SELECT l_returnflag,
      COUNT(DISTINCT l_orderkey) AS n_exact,
      TRUE AS approx_ok
    FROM lineitem
    GROUP BY l_returnflag
    ORDER BY l_returnflag"""))

  /** Approximate-percentile accuracy contract — q12b's pattern for the
    * quantile sketch: `approx_percentile`'s value is algorithm-specific
    * (DuckDB cannot replay Spark's KLL-style summary), but its RANK
    * guarantee is checkable exactly. With accuracy 1000 the returned
    * median sits within ±0.1% of rank n/2; the gate brackets it between
    * the exact order statistics at ranks ⌈0.49n⌉ and ⌈0.51n⌉ (a 10×
    * margin) and pins `approx_ok` TRUE — a Spark upgrade or config that
    * degraded the sketch hash-mismatches instead of sliding through.
    * Rank arithmetic is `(49·n) DIV 100` / `(51·n + 99) DIV 100` on
    * BIGINTs — positive operands only, where Spark's truncating DIV and
    * DuckDB's flooring `//` agree. The bracket values are data values
    * (identical parquet doubles), so they hash cleanly.
    *
    * Scale note: the exact-rank bracket needs a per-group total order, so
    * the window funnels each returnflag group through one reducer. That
    * is inherent to a discrete order statistic — at 100 TB run the
    * CONTRACT CHECK on a deterministic hash sample per group (the q56
    * coordinate), which bounds the sorted partition while the
    * `approx_percentile` under test still sees the full data. */
  private val q14c = GQuery(
    "q109_percentile_contract",
    (s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val li = t(s, dir, "lineitem")
        .select(col("l_returnflag"), col("l_extendedprice"))
      val wg = Window.partitionBy(col("l_returnflag"))
      val ranked = li
        .withColumn("rn",
          row_number().over(wg.orderBy(col("l_extendedprice"))).cast(LongType))
        .withColumn("n", count(lit(1)).over(wg))
      val bounds = ranked
        .withColumn("lo_rank", greatest(lit(1L), expr("(49L * n) DIV 100L")))
        .withColumn("hi_rank", least(col("n"), expr("(51L * n + 99L) DIV 100L")))
        .groupBy(col("l_returnflag"))
        .agg(max(col("n")).as("n_rows"),
          max(when(col("rn") === col("lo_rank"), col("l_extendedprice"))).as("lo"),
          max(when(col("rn") === col("hi_rank"), col("l_extendedprice"))).as("hi"))
      val approx = li.groupBy(col("l_returnflag"))
        .agg(percentile_approx(col("l_extendedprice"), lit(0.5), lit(1000))
          .as("approx"))
      bounds.join(approx, Seq("l_returnflag"))
        .select(col("l_returnflag"), col("n_rows"), col("lo"), col("hi"),
          (col("approx") >= col("lo") && col("approx") <= col("hi"))
            .as("approx_ok"))
        .orderBy(col("l_returnflag"))
    },
    Some("""WITH r AS (SELECT l_returnflag, l_extendedprice,
          ROW_NUMBER() OVER (PARTITION BY l_returnflag
                             ORDER BY l_extendedprice) AS rn,
          COUNT(*) OVER (PARTITION BY l_returnflag) AS n
        FROM lineitem)
      SELECT l_returnflag, CAST(MAX(n) AS BIGINT) AS n_rows,
        MAX(CASE WHEN rn = GREATEST(1, (49 * n) // 100)
                 THEN l_extendedprice END) AS lo,
        MAX(CASE WHEN rn = LEAST(n, (51 * n + 99) // 100)
                 THEN l_extendedprice END) AS hi,
        TRUE AS approx_ok
      FROM r GROUP BY l_returnflag
      ORDER BY l_returnflag"""))

  /** Set operators: customers ordering in 1996 vs 1997 (INTERSECT /
    * EXCEPT with distinct semantics, tagged and unioned). */
  private val q13 = GQuery(
    "q13_set_ops",
    (s, dir) => {
      val o = t(s, dir, "orders")
      def ofYear(y: Int) = o
        .filter(col("o_orderdate") >= lit(s"$y-01-01").cast(TimestampType) &&
          col("o_orderdate") < lit(s"${y + 1}-01-01").cast(TimestampType))
        .select(col("o_custkey"))
      val a = ofYear(1996)
      val b = ofYear(1997)
      a.intersect(b).withColumn("tag", lit("both"))
        .union(a.except(b).withColumn("tag", lit("only_1996")))
        .union(b.except(a).withColumn("tag", lit("only_1997")))
        .orderBy(col("tag"), col("o_custkey"))
    },
    Some("""WITH a AS (SELECT o_custkey FROM orders
              WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
                AND o_orderdate < TIMESTAMP '1997-01-01 00:00:00'),
         b AS (SELECT o_custkey FROM orders
              WHERE o_orderdate >= TIMESTAMP '1997-01-01 00:00:00'
                AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00')
    SELECT o_custkey, tag FROM (
      SELECT o_custkey, 'both' AS tag FROM (SELECT o_custkey FROM a INTERSECT SELECT o_custkey FROM b)
      UNION ALL
      SELECT o_custkey, 'only_1996' FROM (SELECT o_custkey FROM a EXCEPT SELECT o_custkey FROM b)
      UNION ALL
      SELECT o_custkey, 'only_1997' FROM (SELECT o_custkey FROM b EXCEPT SELECT o_custkey FROM a)
    ) ORDER BY tag, o_custkey"""))

  /** Conditional aggregation: CASE WHEN / filtered counts (rating pipelines
    * bucket charges by status this way). */
  private val q14 = GQuery(
    "q14_conditional_agg",
    (s, dir) => {
      t(s, dir, "orders")
        .groupBy(col("o_orderpriority"))
        .agg(
          moneySum(when(col("o_orderstatus") === "F", col("o_totalprice")).otherwise(0.0)).as("f_total"),
          moneySum(when(col("o_orderstatus") === "O", col("o_totalprice")).otherwise(0.0)).as("o_total"),
          count(when(col("o_totalprice") > 200000, 1)).as("n_big"),
          count(lit(1)).as("n"))
        .orderBy(col("o_orderpriority"))
    },
    Some(s"""SELECT o_orderpriority,
      ${moneySumSql("CASE WHEN o_orderstatus = 'F' THEN o_totalprice ELSE 0.0 END")} AS f_total,
      ${moneySumSql("CASE WHEN o_orderstatus = 'O' THEN o_totalprice ELSE 0.0 END")} AS o_total,
      COUNT(CASE WHEN o_totalprice > 200000 THEN 1 END) AS n_big,
      COUNT(*) AS n
    FROM orders
    GROUP BY o_orderpriority
    ORDER BY o_orderpriority"""))

  /** String function surface: substring/upper/lpad/regexp/concat/replace —
    * the MSISDN/IMSI-normalization shapes of a mediation stage. */
  private val q15 = GQuery(
    "q15_string_funcs",
    (s, dir) => {
      t(s, dir, "customer")
        .select(
          col("c_custkey"),
          upper(substring(col("c_name"), 1, 8)).as("name_prefix"),
          lpad(col("c_custkey").cast(StringType), 12, "0").as("padded_key"),
          regexp_extract(col("c_name"), "([0-9]+)", 1).as("name_digits"),
          concat_ws("|", col("c_mktsegment"), trim(col("c_name"))).as("seg_name"),
          length(col("c_name")).cast(LongType).as("name_len"),
          replace(col("c_mktsegment"), lit("A"), lit("@")).as("seg_repl"))
        .orderBy(col("c_custkey"))
    },
    Some("""SELECT c_custkey,
      upper(substring(c_name, 1, 8)) AS name_prefix,
      lpad(CAST(c_custkey AS VARCHAR), 12, '0') AS padded_key,
      regexp_extract(c_name, '([0-9]+)', 1) AS name_digits,
      concat_ws('|', c_mktsegment, trim(c_name)) AS seg_name,
      length(c_name) AS name_len,
      replace(c_mktsegment, 'A', '@') AS seg_repl
    FROM customer
    ORDER BY c_custkey"""))

  /** Date/time surface: trunc, extract, datediff, interval arithmetic —
    * call-time bucketing shapes. */
  private val q16 = GQuery(
    "q16_date_funcs",
    (s, dir) => {
      t(s, dir, "orders")
        .select(
          col("o_orderkey"),
          dateStr(date_trunc("month", col("o_orderdate"))).as("month_start"),
          year(col("o_orderdate")).cast(LongType).as("yr"),
          quarter(col("o_orderdate")).cast(LongType).as("qtr"),
          dayofmonth(col("o_orderdate")).cast(LongType).as("dom"),
          datediff(col("o_orderdate"), lit("1995-01-01").cast(DateType)).cast(LongType).as("days_since_epoch_start"),
          dateStr(add_months(col("o_orderdate"), 3)).as("plus_3m"))
        .orderBy(col("o_orderkey"))
    },
    Some(s"""SELECT o_orderkey,
      strftime(date_trunc('month', o_orderdate), '%Y-%m-%d') AS month_start,
      CAST(EXTRACT(YEAR FROM o_orderdate) AS BIGINT) AS yr,
      CAST(EXTRACT(QUARTER FROM o_orderdate) AS BIGINT) AS qtr,
      CAST(EXTRACT(DAY FROM o_orderdate) AS BIGINT) AS dom,
      CAST(date_diff('day', DATE '1995-01-01', CAST(o_orderdate AS DATE)) AS BIGINT) AS days_since_epoch_start,
      strftime(o_orderdate + INTERVAL 3 MONTH, '%Y-%m-%d') AS plus_3m
    FROM orders
    ORDER BY o_orderkey"""))

  /** Math/decimal surface: round/floor/ceil/abs/mod/sqrt (charge math). */
  private val q17 = GQuery(
    "q17_math_funcs",
    (s, dir) => {
      t(s, dir, "lineitem")
        .select(
          col("l_orderkey"), col("l_linenumber"),
          round(col("l_extendedprice"), 1).as("price_r1"),
          floor(col("l_extendedprice")).as("price_floor"),
          ceil(col("l_extendedprice")).as("price_ceil"),
          abs(col("l_discount") - 0.05).as("disc_dev"),
          (col("l_orderkey") % 7).as("key_mod7"),
          sqrt(col("l_quantity")).as("qty_sqrt"),
          (col("l_quantity") * col("l_quantity")).as("qty_sq"))
        // (l_orderkey, l_linenumber) is not unique in the fixture — order
        // by value columns too so the output order is total
        .orderBy(col("l_orderkey"), col("l_linenumber"), col("price_r1"),
          col("disc_dev"), col("qty_sq"))
    },
    Some("""SELECT l_orderkey, l_linenumber,
      round(l_extendedprice, 1) AS price_r1,
      CAST(floor(l_extendedprice) AS BIGINT) AS price_floor,
      CAST(ceil(l_extendedprice) AS BIGINT) AS price_ceil,
      abs(l_discount - 0.05) AS disc_dev,
      l_orderkey % 7 AS key_mod7,
      sqrt(l_quantity) AS qty_sqrt,
      l_quantity * l_quantity AS qty_sq
    FROM lineitem
    ORDER BY l_orderkey, l_linenumber, price_r1, disc_dev, qty_sq"""))

  /** Predicate surface: IN / LIKE / BETWEEN / null-safe filters. */
  private val q18 = GQuery(
    "q18_predicates",
    (s, dir) => {
      t(s, dir, "part")
        .filter(col("p_size").isin(1, 5, 10, 15, 20, 25, 30, 35, 40, 45, 50) &&
          col("p_retailprice").between(500.0, 1500.0) &&
          col("p_type").like("%a%") && col("p_brand").isNotNull)
        .groupBy(col("p_brand"))
        .agg(count(lit(1)).as("n_parts"), moneySum(col("p_retailprice")).as("sum_price"))
        .orderBy(col("p_brand"))
    },
    Some(s"""SELECT p_brand, COUNT(*) AS n_parts,
      ${moneySumSql("p_retailprice")} AS sum_price
    FROM part
    WHERE p_size IN (1,5,10,15,20,25,30,35,40,45,50)
      AND p_retailprice BETWEEN 500.0 AND 1500.0
      AND p_type LIKE '%a%' AND p_brand IS NOT NULL
    GROUP BY p_brand
    ORDER BY p_brand"""))

  /** Theta join: equi key plus a range residual (tariff-band shape —
    * quantity must fall in a size-dependent band). Broadcast the dim so the
    * range residual is evaluated stream-side with no extra shuffle. */
  private val q19 = GQuery(
    "q19_theta_join",
    (s, dir) => {
      val p = t(s, dir, "part")
      t(s, dir, "lineitem")
        .join(broadcast(p),
          col("l_partkey") === col("p_partkey") &&
            col("l_quantity") >= col("p_size") &&
            col("l_quantity") < col("p_size") + 10)
        .groupBy(col("p_brand"))
        .agg(count(lit(1)).as("n"), moneySum(col("l_extendedprice")).as("sum_price"))
        .orderBy(col("p_brand"))
    },
    Some(s"""SELECT p_brand, COUNT(*) AS n,
      ${moneySumSql("l_extendedprice")} AS sum_price
    FROM lineitem
    JOIN part ON l_partkey = p_partkey
      AND l_quantity >= p_size AND l_quantity < p_size + 10
    GROUP BY p_brand
    ORDER BY p_brand"""))

  /** GROUPING SETS through the SQL front-end (registered temp views). */
  private val q21 = GQuery(
    "q21_grouping_sets",
    (s, dir) => {
      t(s, dir, "orders").createOrReplaceTempView("orders_v")
      s.sql(s"""SELECT o_orderstatus, o_orderpriority,
        ${moneySumSql("o_totalprice")} AS sum_price, COUNT(*) AS n
      FROM orders_v
      GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
      ORDER BY o_orderstatus NULLS FIRST, o_orderpriority NULLS FIRST""")
    },
    Some(s"""SELECT o_orderstatus, o_orderpriority,
      ${moneySumSql("o_totalprice")} AS sum_price, COUNT(*) AS n
    FROM orders
    GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
    ORDER BY o_orderstatus NULLS FIRST, o_orderpriority NULLS FIRST"""))

  /** unionByName (schema-aligned union across differently-ordered
    * projections) + dropDuplicates — the re-rating reconciliation shape. */
  private val q13b = GQuery(
    "q13b_union_by_name",
    (s, dir) => {
      val c = t(s, dir, "customer")
        .select(col("c_custkey").as("id"), col("c_name").as("name"), lit("customer").as("kind"))
      val sup = t(s, dir, "supplier")
        .select(col("s_name").as("name"), col("s_suppkey").as("id"), lit("supplier").as("kind"))
      c.union(c) // duplicate feed, as when a batch is re-delivered
        .unionByName(sup)
        .dropDuplicates(Seq("id", "kind"))
        .groupBy(col("kind"))
        .agg(count(lit(1)).as("n"), min(col("name")).as("first_name"))
        .orderBy(col("kind"))
    },
    Some("""SELECT kind, COUNT(*) AS n, MIN(name) AS first_name FROM (
      SELECT DISTINCT id, name, kind FROM (
        SELECT c_custkey AS id, c_name AS name, 'customer' AS kind FROM customer
        UNION ALL
        SELECT c_custkey, c_name, 'customer' FROM customer
        UNION ALL
        SELECT s_suppkey, s_name, 'supplier' FROM supplier))
    GROUP BY kind
    ORDER BY kind"""))

  /** Null-handling functions: nullif / coalesce (nvl). */
  private val q14b = GQuery(
    "q14b_null_funcs",
    (s, dir) => {
      t(s, dir, "orders")
        .select(coalesce(nullif(col("o_orderstatus"), lit("O")), lit("OPEN")).as("status2"),
          when(col("o_totalprice") > 150000, col("o_totalprice")).as("big_or_null"))
        .groupBy(col("status2"))
        .agg(count(lit(1)).as("n"),
          count(col("big_or_null")).as("n_big"),
          moneySum(coalesce(col("big_or_null"), lit(0.0))).as("sum_big"))
        .orderBy(col("status2"))
    },
    Some(s"""SELECT COALESCE(NULLIF(o_orderstatus, 'O'), 'OPEN') AS status2,
      COUNT(*) AS n,
      COUNT(CASE WHEN o_totalprice > 150000 THEN 1 END) AS n_big,
      ${moneySumSql("CASE WHEN o_totalprice > 150000 THEN o_totalprice ELSE 0.0 END")} AS sum_big
    FROM orders
    GROUP BY 1
    ORDER BY status2"""))

  /** Generator (UDTF shape): split one record into N legs — the CDR
    * multi-leg expansion (`flatMap`/explode of a computed sequence). */
  private val q39 = GQuery(
    "q39_explode_legs",
    (s, dir) => {
      t(s, dir, "events")
        .withColumn("n_legs", (col("event_id") % 3 + 1).cast(IntegerType))
        .withColumn("leg", explode(expr("sequence(1, n_legs)")))
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("n_leg_rows"),
          moneySum(col("value") / col("n_legs")).as("sum_leg_value"),
          max(col("leg")).cast(LongType).as("max_leg"))
        .orderBy(col("event_type"))
    },
    Some(s"""SELECT event_type, COUNT(*) AS n_leg_rows,
      ${moneySumSql("value / n_legs")} AS sum_leg_value,
      CAST(MAX(leg) AS BIGINT) AS max_leg
    FROM (SELECT event_type, value, CAST(event_id % 3 + 1 AS INT) AS n_legs, leg
          FROM events, UNNEST(generate_series(1, CAST(event_id % 3 + 1 AS INT))) AS t(leg))
    GROUP BY event_type
    ORDER BY event_type"""))

  /** Registered scalar UDF (the rating-formula extension point; built-in
    * functions remain the preference — this declares the UDF surface). */
  private val q40 = GQuery(
    "q40_scalar_udf",
    (s, dir) => {
      s.udf.register("graft_bulk_discount",
        (qty: Double, price: Double) => if (qty > 30) price * 0.9 else price)
      t(s, dir, "lineitem")
        .withColumn("adj", expr("graft_bulk_discount(l_quantity, l_extendedprice)"))
        .groupBy(col("l_returnflag"))
        .agg(moneySum(col("adj")).as("sum_adj"), count(lit(1)).as("n"))
        .orderBy(col("l_returnflag"))
    },
    Some(s"""SELECT l_returnflag,
      ${moneySumSql("CASE WHEN l_quantity > 30 THEN l_extendedprice * 0.9 ELSE l_extendedprice END")} AS sum_adj,
      COUNT(*) AS n
    FROM lineitem
    GROUP BY l_returnflag
    ORDER BY l_returnflag"""))

  /** Exact percentiles with linear interpolation (usage-distribution
    * reporting); both engines implement the same type-7 quantile, rounded
    * to absorb any last-ulp interpolation differences. */
  private val q41 = GQuery(
    "q41_percentile",
    (s, dir) => {
      t(s, dir, "orders")
        .groupBy(col("o_orderpriority"))
        .agg(
          round(expr("percentile(o_totalprice, 0.5)"), 4).as("median_price"),
          round(expr("percentile(o_totalprice, 0.9)"), 4).as("p90_price"),
          count(lit(1)).as("n"))
        .orderBy(col("o_orderpriority"))
    },
    Some("""SELECT o_orderpriority,
      ROUND(quantile_cont(o_totalprice, 0.5), 4) AS median_price,
      ROUND(quantile_cont(o_totalprice, 0.9), 4) AS p90_price,
      COUNT(*) AS n
    FROM orders
    GROUP BY o_orderpriority
    ORDER BY o_orderpriority"""))

  /** Correlated scalar subquery through the SQL front end — Catalyst
    * decorrelates it into a join + aggregate (§4 "free" rewrite; the plan
    * test asserts no per-row subquery survives). */
  private val q44 = GQuery(
    "q44_correlated_subquery",
    (s, dir) => {
      // price > group avg, stated as price*n > sum in exact decimals —
      // float averages tie-break differently across engines when a price
      // equals its group mean exactly
      t(s, dir, "part").createOrReplaceTempView("part_v")
      s.sql(s"""SELECT p_brand, COUNT(*) AS n_above,
        ${moneySumSql("p_retailprice")} AS sum_above
      FROM part_v p
      WHERE CAST(p_retailprice AS DECIMAL(18,4)) *
              (SELECT COUNT(*) FROM part_v p2 WHERE p2.p_brand = p.p_brand)
            > (SELECT SUM(CAST(p3.p_retailprice AS DECIMAL(18,4)))
               FROM part_v p3 WHERE p3.p_brand = p.p_brand)
      GROUP BY p_brand
      ORDER BY p_brand""")
    },
    Some(s"""SELECT p_brand, COUNT(*) AS n_above,
      ${moneySumSql("p_retailprice")} AS sum_above
    FROM part p
    WHERE CAST(p_retailprice AS DECIMAL(18,4)) *
            (SELECT COUNT(*) FROM part p2 WHERE p2.p_brand = p.p_brand)
          > (SELECT SUM(CAST(p3.p_retailprice AS DECIMAL(18,4)))
             FROM part p3 WHERE p3.p_brand = p.p_brand)
    GROUP BY p_brand
    ORDER BY p_brand"""))

  /** Equi-width histogram of a numeric column — the profiling primitive
    * behind data-quality dashboards and AQE-style cardinality checks.
    * `step` is computed ONCE and used identically in both engines (its
    * shortest decimal representation round-trips to the same double), so
    * bin boundaries are bit-identical. Out-of-range values clamp into the
    * edge bins; NULL inputs are excluded (count them with [[profile]] —
    * a silent `bin = NULL` row would make the bin sums lie). One scan,
    * one hash aggregation on the bin id. */
  def histogram(df: DataFrame, c: Column, lo: Double, hi: Double,
      bins: Int): DataFrame = {
    require(bins >= 1, s"bins must be >= 1, got $bins")
    require(hi > lo, s"empty range: [$lo, $hi)")
    val step = (hi - lo) / bins
    df.filter(c.isNotNull)
      .withColumn("bin",
        least(lit(bins - 1L), greatest(lit(0L),
          floor((c - lit(lo)) / lit(step)))).cast(LongType))
      .groupBy(col("bin"))
      .agg(count(lit(1)).as("n"))
  }

  /** Oracle fixture of [[histogram]]: 16 price bins over lineitem. */
  private val q73 = {
    val bins = 16
    val lo = 900.0; val hi = 105000.0
    val step = (hi - lo) / bins
    GQuery(
      "q73_histogram",
      (s, dir) => histogram(t(s, dir, "lineitem"), col("l_extendedprice"),
          lo, hi, bins)
        .orderBy(col("bin")),
      Some(s"""SELECT CAST(least(${bins - 1}, greatest(0,
          floor((l_extendedprice - $lo) / $step))) AS BIGINT) AS bin,
          COUNT(*) AS n
        FROM lineitem
        GROUP BY 1
        ORDER BY bin"""))
  }

  /** Single-pass column profile over NUMERIC columns: per column, row
    * count, null count, exact distinct count, min and max — the
    * data-quality report an ingest stage emits per batch. ONE scan: all
    * per-column aggregates compute in one aggregation (distincts via
    * expand), and the wide result row unpivots with `stack`. */
  def profile(df: DataFrame, cols: Seq[String]): DataFrame = {
    require(cols.nonEmpty, "at least one column to profile")
    val numeric = cols.forall(c => df.schema(c).dataType.isInstanceOf[
      org.apache.spark.sql.types.NumericType])
    require(numeric, s"profile() supports numeric columns, got: $cols")
    val aggs = count(lit(1)).as("n_rows") +: cols.flatMap(c => Seq(
      count(when(col(c).isNull, 1)).as(s"nn_$c"),
      countDistinct(col(c)).as(s"nd_$c"),
      min(col(c)).cast(DoubleType).as(s"mn_$c"),
      max(col(c)).cast(DoubleType).as(s"mx_$c")))
    val stackArgs = cols.map(c =>
      s"'$c', nn_$c, nd_$c, mn_$c, mx_$c").mkString(", ")
    df.agg(aggs.head, aggs.tail: _*)
      .selectExpr("n_rows",
        s"stack(${cols.size}, $stackArgs) AS (col_name, n_null, n_distinct, min_v, max_v)")
      .select(col("col_name"), col("n_rows"), col("n_null"),
        col("n_distinct"), col("min_v"), col("max_v"))
  }

  /** Oracle fixture of [[profile]] over three orders columns (the DuckDB
    * twin is a UNION ALL of per-column aggregates — same values, its
    * planner fuses the scans). */
  private val q74 = {
    def row(c: String) =
      s"""SELECT '$c' AS col_name, COUNT(*) AS n_rows,
          COUNT(CASE WHEN $c IS NULL THEN 1 END) AS n_null,
          COUNT(DISTINCT $c) AS n_distinct,
          CAST(MIN($c) AS DOUBLE) AS min_v, CAST(MAX($c) AS DOUBLE) AS max_v
        FROM orders"""
    GQuery(
      "q74_profile",
      (s, dir) => profile(t(s, dir, "orders"),
          Seq("o_custkey", "o_orderkey", "o_totalprice"))
        .orderBy(col("col_name")),
      Some(Seq("o_custkey", "o_orderkey", "o_totalprice").map(row)
        .mkString("SELECT * FROM (", " UNION ALL ", ") ORDER BY col_name")))
  }

  /** Distribution drift between two snapshots of one column — the check a
    * dataset re-publish runs before promoting a new version: both sides
    * bin with the SAME fixed boundaries ([[histogram]]'s clamp-to-edge
    * rule, so a shifted tail is visible in the edge bins instead of
    * silently dropped), per-bin shares compare in exact integer ppm, and
    * `diff_ppm = |p_new − p_old|` per bin; Σ diff_ppm / 2 is the total
    * variation distance in ppm — the integer-exact drift score (PSI's log
    * ratio is float-hazardous cross-engine and ranks the same shifts).
    *
    * Cost: one scan per snapshot into a ≤`bins`-row table, then all
    * comparison arithmetic on the tiny joined result with the totals
    * broadcast back — at 100 TB the drift report costs two aggregated
    * scans and nothing else. An EMPTY snapshot side fails loudly with
    * the side named (the ksDrift guard pattern) rather than dividing by
    * its zero total; both sides empty yields an empty report. */
  def drift(oldDf: DataFrame, newDf: DataFrame, c: Column, lo: Double,
      hi: Double, bins: Int): DataFrame = {
    val j = histogram(oldDf, c, lo, hi, bins).withColumnRenamed("n", "n_old")
      .join(histogram(newDf, c, lo, hi, bins).withColumnRenamed("n", "n_new"),
        Seq("bin"), "full_outer")
      .withColumn("n_old", coalesce(col("n_old"), lit(0L)))
      .withColumn("n_new", coalesce(col("n_new"), lit(0L)))
    val tot = j.agg(sum(col("n_old")).as("t_old"), sum(col("n_new")).as("t_new"))
      .select(
        expr("CASE WHEN t_old IS NULL OR t_old = 0 THEN raise_error(" +
          "'graft.drift: the OLD snapshot has no rows in range — nothing " +
          "to compare against') ELSE t_old END").as("t_old"),
        expr("CASE WHEN t_new IS NULL OR t_new = 0 THEN raise_error(" +
          "'graft.drift: the NEW snapshot has no rows in range — nothing " +
          "to compare') ELSE t_new END").as("t_new"))
    j.crossJoin(broadcast(tot))
      .withColumn("p_old_ppm",
        expr("CAST((n_old * CAST(1000000 AS BIGINT)) DIV t_old AS BIGINT)"))
      .withColumn("p_new_ppm",
        expr("CAST((n_new * CAST(1000000 AS BIGINT)) DIV t_new AS BIGINT)"))
      .withColumn("diff_ppm", abs(col("p_new_ppm") - col("p_old_ppm")))
      .select(col("bin"), col("n_old"), col("n_new"),
        col("p_old_ppm"), col("p_new_ppm"), col("diff_ppm"))
  }

  /** Oracle fixture of [[drift]]: the events value distribution, first
    * half of January vs the full month, 20 bins over [0, 500). */
  private val q83 = {
    val bins = 20
    val lo = 0.0; val hi = 500.0
    val step = (hi - lo) / bins
    val binSql = s"CAST(least(${bins - 1}, greatest(0, " +
      s"floor((value - $lo) / $step))) AS BIGINT)"
    GQuery(
      "q83_drift",
      (s, dir) => {
        val ev = t(s, dir, "events")
        drift(ev.filter(col("ts") < expr("TIMESTAMP '2024-01-16 00:00:00'")),
            ev, col("value"), lo, hi, bins)
          .orderBy(col("bin"))
      },
      Some(s"""WITH ho AS (SELECT $binSql AS bin, COUNT(*) AS n_old
                 FROM events
                 WHERE ts < TIMESTAMP '2024-01-16 00:00:00' AND value IS NOT NULL
                 GROUP BY 1),
        hn AS (SELECT $binSql AS bin, COUNT(*) AS n_new
               FROM events WHERE value IS NOT NULL GROUP BY 1),
        j AS (SELECT COALESCE(ho.bin, hn.bin) AS bin,
                COALESCE(n_old, 0) AS n_old, COALESCE(n_new, 0) AS n_new
              FROM ho FULL OUTER JOIN hn ON ho.bin = hn.bin),
        tot AS (SELECT SUM(n_old) AS t_old, SUM(n_new) AS t_new FROM j)
      SELECT bin, n_old, n_new,
        CAST((n_old * 1000000) // t_old AS BIGINT) AS p_old_ppm,
        CAST((n_new * 1000000) // t_new AS BIGINT) AS p_new_ppm,
        abs(CAST((n_new * 1000000) // t_new AS BIGINT)
          - CAST((n_old * 1000000) // t_old AS BIGINT)) AS diff_ppm
      FROM j, tot
      ORDER BY bin"""))
  }

  /** Bounded per-group top-k via the [[graft.functions.Aggregators.TopK]]
    * aggregator instead of a window sort. The window form shuffles and
    * sorts EVERY order inside each priority partition; this plan's
    * map-side partials carry at most k rows per (group, partition), so
    * the exchange moves `groups × k` entries regardless of table size —
    * the shape that survives "top 3 per key" at 100 TB. The oracle IS
    * the window form, so the hash-match proves the aggregator computes
    * identical results to the full sort. */
  private val q107 = GQuery(
    "q107_topk_agg",
    (s, dir) => {
      val topk = udaf(new graft.functions.Aggregators.TopK(3),
        org.apache.spark.sql.Encoders.product[graft.functions.Aggregators.Scored])
      t(s, dir, "orders")
        .groupBy(col("o_orderpriority"))
        .agg(topk(col("o_totalprice"), col("o_orderkey")).as("top"))
        .select(col("o_orderpriority").as("priority"),
          posexplode(col("top")).as(Seq("pos", "sc")))
        .select(col("priority"), (col("pos") + 1).cast(LongType).as("rank"),
          col("sc.id").as("order_id"), col("sc.score").as("price"))
        .orderBy(col("priority"), col("rank"))
    },
    Some("""SELECT o_orderpriority AS priority, CAST(rank AS BIGINT) AS rank,
        o_orderkey AS order_id, o_totalprice AS price
      FROM (SELECT o_orderpriority, o_orderkey, o_totalprice,
              ROW_NUMBER() OVER (PARTITION BY o_orderpriority
                ORDER BY o_totalprice DESC, o_orderkey) AS rank
            FROM orders)
      WHERE rank <= 3
      ORDER BY priority, rank"""))

  /** UNPIVOT (wide→long melt) — the inverse of q23's pivot: lineitem's
    * four measure columns become (metric, value) rows, then a per-metric
    * exact-decimal sum keeps the fixture compact. Spark's native
    * `unpivot` is a map-side generator (no shuffle before the agg); the
    * oracle spells the same relation as a UNION ALL, the portable
    * formulation. */
  private val q145 = GQuery(
    "q145_unpivot",
    (s, dir) => t(s, dir, "lineitem")
      .select(col("l_orderkey"), col("l_quantity"), col("l_extendedprice"),
        col("l_discount"), col("l_tax"))
      .unpivot(Array(col("l_orderkey")),
        Array(col("l_quantity"), col("l_extendedprice"), col("l_discount"),
          col("l_tax")),
        "metric", "value")
      .groupBy(col("metric"))
      .agg(count(lit(1)).as("n"), moneySum(col("value")).as("total"))
      .orderBy(col("metric")),
    Some(s"""SELECT metric, COUNT(*) AS n,
        ${moneySumSql("value")} AS total
      FROM (
        SELECT l_orderkey, 'l_quantity' AS metric, l_quantity AS value FROM lineitem
        UNION ALL
        SELECT l_orderkey, 'l_extendedprice', l_extendedprice FROM lineitem
        UNION ALL
        SELECT l_orderkey, 'l_discount', l_discount FROM lineitem
        UNION ALL
        SELECT l_orderkey, 'l_tax', l_tax FROM lineitem)
      GROUP BY metric
      ORDER BY metric"""))

  /** Referential-integrity audit — the foreign-key trust gate run before
    * joins are believed: one row with child/parent volumes, NULL child
    * keys (they silently vanish from inner joins), ORPHAN child keys (no
    * parent — an inner join drops the rows, a left join fabricates
    * nulls; either way revenue goes missing quietly), and CHILDLESS
    * parents. The mediation classic: CDR user ids that never resolve to
    * a customer are exactly how a billing pipeline leaks money.
    *
    * Plan: null counts are map-side; the two orphan directions are
    * distinct-key anti-joins (key-table-sized, hash-partitioned); no
    * row-level joins anywhere. */
  def referentialAudit(child: DataFrame, parent: DataFrame,
      childKey: String, parentKey: String): DataFrame = {
    val ck = child.select(col(childKey).as("k"))
    val pk = parent.select(col(parentKey).as("k"))
    val childStats = ck.agg(count(lit(1)).as("n_child"),
      sum(when(col("k").isNull, 1L).otherwise(0L)).as("n_child_null_key"))
    val nParent = pk.agg(count(lit(1)).as("n_parent"))
    val ckd = ck.filter(col("k").isNotNull).distinct()
    val pkd = pk.filter(col("k").isNotNull).distinct()
    val orphans = ckd.join(pkd, Seq("k"), "left_anti")
      .agg(count(lit(1)).as("n_orphan_child_keys"))
    val childless = pkd.join(ckd, Seq("k"), "left_anti")
      .agg(count(lit(1)).as("n_childless_parent_keys"))
    childStats.crossJoin(broadcast(nParent))
      .crossJoin(broadcast(orphans))
      .crossJoin(broadcast(childless))
      .select(col("n_child"), col("n_parent"), col("n_child_null_key"),
        col("n_orphan_child_keys"), col("n_childless_parent_keys"))
  }

  /** Oracle fixture of [[referentialAudit]]: events.user_id against
    * customer.c_custkey — the fixture's user population only partially
    * overlaps the customer table, so both defect directions are
    * non-zero. */
  private val q209 = GQuery(
    "q209_referential_audit",
    (s, dir) => referentialAudit(t(s, dir, "events"),
      t(s, dir, "customer"), "user_id", "c_custkey"),
    Some("""WITH ck AS (SELECT user_id AS k FROM events),
      pk AS (SELECT c_custkey AS k FROM customer),
      ckd AS (SELECT DISTINCT k FROM ck WHERE k IS NOT NULL),
      pkd AS (SELECT DISTINCT k FROM pk WHERE k IS NOT NULL)
      SELECT (SELECT COUNT(*) FROM ck) AS n_child,
        (SELECT COUNT(*) FROM pk) AS n_parent,
        (SELECT CAST(SUM(CASE WHEN k IS NULL THEN 1 ELSE 0 END) AS BIGINT)
         FROM ck) AS n_child_null_key,
        (SELECT COUNT(*) FROM ckd WHERE k NOT IN (SELECT k FROM pkd))
          AS n_orphan_child_keys,
        (SELECT COUNT(*) FROM pkd WHERE k NOT IN (SELECT k FROM ckd))
          AS n_childless_parent_keys"""))

  /** Revenue reconciliation — the billing-assurance sibling of
    * [[referentialAudit]]: recompute each order's total from its line
    * items (Σ extendedprice·(1+tax)·(1−discount), the TPC-H charge
    * formula) and compare against the RECORDED header total. Headers and
    * detail drift apart through partial loads, late line items, and
    * rounding bugs — the exact failure class a mediation/billing
    * pipeline reconciles nightly. Per order status: orders checked,
    * matched within 1 centi (header rounding tolerance), mismatched,
    * the worst absolute gap, and both grand totals in centi.
    *
    * Determinism: the per-line charge multiplies DOUBLES in identical
    * op order in both engines (bit-equal from equal inputs), per-order
    * sums accumulate in DECIMAL(38,8) and compare in centi longs — the
    * moneySum discipline. One join keyed on the order, all aggs
    * partial. */
  def revenueReconciliation(orders: DataFrame, lineitem: DataFrame)
      : DataFrame = {
    val recomputed = lineitem
      .select(col("l_orderkey").as("o_orderkey"),
        expr("""CAST(l_extendedprice AS DOUBLE)
                * (1.0 + CAST(l_tax AS DOUBLE))
                * (1.0 - CAST(l_discount AS DOUBLE))""").as("chg"))
      .groupBy(col("o_orderkey"))
      .agg(expr("CAST(round(SUM(CAST(chg AS DECIMAL(38,8))) * 100) AS BIGINT)")
        .as("recomputed_centi"))
    orders.select(col("o_orderkey"), col("o_orderstatus"),
        expr("CAST(round(CAST(o_totalprice AS DOUBLE) * 100) AS BIGINT)")
          .as("recorded_centi"))
      .join(recomputed, Seq("o_orderkey"), "left")
      .withColumn("diff",
        abs(coalesce(col("recomputed_centi"), lit(0L)) - col("recorded_centi")))
      .groupBy(col("o_orderstatus"))
      .agg(count(lit(1)).as("n_orders"),
        sum(when(col("diff") <= 1L, 1L).otherwise(0L)).as("n_matched"),
        sum(when(col("diff") > 1L, 1L).otherwise(0L)).as("n_mismatched"),
        max(col("diff")).as("max_diff_centi"),
        sum(col("recorded_centi")).as("recorded_total_centi"),
        sum(coalesce(col("recomputed_centi"), lit(0L)))
          .as("recomputed_total_centi"))
  }

  /** Oracle fixture of [[revenueReconciliation]]. */
  private val q218 = GQuery(
    "q218_revenue_reconciliation",
    (s, dir) => revenueReconciliation(t(s, dir, "orders"),
        t(s, dir, "lineitem"))
      .orderBy(col("o_orderstatus")),
    Some("""WITH rc AS (SELECT l_orderkey AS o_orderkey,
          CAST(round(SUM(CAST(
              CAST(l_extendedprice AS DOUBLE)
              * (1.0 + CAST(l_tax AS DOUBLE))
              * (1.0 - CAST(l_discount AS DOUBLE)) AS DECIMAL(38,8))) * 100)
            AS BIGINT) AS recomputed_centi
        FROM lineitem GROUP BY 1),
      j AS (SELECT o.o_orderstatus,
          CAST(round(CAST(o_totalprice AS DOUBLE) * 100) AS BIGINT)
            AS recorded_centi,
          COALESCE(rc.recomputed_centi, 0) AS recomputed_centi,
          abs(COALESCE(rc.recomputed_centi, 0)
            - CAST(round(CAST(o_totalprice AS DOUBLE) * 100) AS BIGINT))
            AS diff
        FROM orders o LEFT JOIN rc USING (o_orderkey))
      SELECT o_orderstatus, COUNT(*) AS n_orders,
        CAST(SUM(CASE WHEN diff <= 1 THEN 1 ELSE 0 END) AS BIGINT)
          AS n_matched,
        CAST(SUM(CASE WHEN diff > 1 THEN 1 ELSE 0 END) AS BIGINT)
          AS n_mismatched,
        CAST(MAX(diff) AS BIGINT) AS max_diff_centi,
        CAST(SUM(recorded_centi) AS BIGINT) AS recorded_total_centi,
        CAST(SUM(recomputed_centi) AS BIGINT) AS recomputed_total_centi
      FROM j GROUP BY o_orderstatus
      ORDER BY o_orderstatus"""))

  /** Fulfillment-lag SLA card — order-to-ship latency per priority
    * class: exact day-lag quantiles (P50/P95 via the q165/q170 histogram
    * construction — distinct-lag-sized windows, no row-level sort), the
    * share beyond an SLA threshold in ppm, and the worst lag. The
    * operational question priority classes exist to answer ("do URGENT
    * orders actually ship faster?"), and the SLA breach share is what a
    * fulfillment contract bills against. Day lag = integer day
    * difference of the two timestamps (epoch-second DIV 86400, engine
    * portable). One join keyed on the order, one histogram agg. */
  def fulfillmentLagCard(orders: DataFrame, lineitem: DataFrame,
      slaDays: Long = 60L): DataFrame = {
    require(slaDays >= 1, s"slaDays must be >= 1, got $slaDays")
    val lags = lineitem
      .select(col("l_orderkey").as("o_orderkey"),
        expr("CAST(l_shipdate AS BIGINT) DIV 86400").as("ship_d"))
      .join(orders.select(col("o_orderkey"), col("o_orderpriority"),
        expr("CAST(o_orderdate AS BIGINT) DIV 86400").as("order_d")),
        Seq("o_orderkey"))
      .select(col("o_orderpriority"), (col("ship_d") - col("order_d")).as("lag"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("o_orderpriority")).orderBy(col("lag"))
    val wg = org.apache.spark.sql.expressions.Window
      .partitionBy(col("o_orderpriority"))
    lags.groupBy(col("o_orderpriority"), col("lag"))
      .agg(count(lit(1)).as("c"))
      .withColumn("cum", sum(col("c")).over(w))
      .withColumn("n", sum(col("c")).over(wg))
      .groupBy(col("o_orderpriority"))
      .agg(max(col("n")).as("n_lines"),
        min(when(col("cum") >= expr("(n * 500 + 999) div 1000"), col("lag")))
          .as("p50_days"),
        min(when(col("cum") >= expr("(n * 950 + 999) div 1000"), col("lag")))
          .as("p95_days"),
        max(col("lag")).as("max_days"),
        sum(when(col("lag") > slaDays, col("c")).otherwise(0L))
          .as("n_breach"))
      .select(col("o_orderpriority"), col("n_lines"), col("p50_days"),
        col("p95_days"), col("max_days"),
        expr("(1000000 * n_breach) DIV n_lines").as("breach_ppm"))
  }

  /** Oracle fixture of [[fulfillmentLagCard]] (SLA 60 days). */
  private val q224 = GQuery(
    "q224_fulfillment_lag",
    (s, dir) => fulfillmentLagCard(t(s, dir, "orders"),
        t(s, dir, "lineitem"))
      .orderBy(col("o_orderpriority")),
    Some("""WITH lags AS (SELECT o_orderpriority,
          (epoch_us(l_shipdate) // 1000000) // 86400
            - (epoch_us(o_orderdate) // 1000000) // 86400 AS lag
        FROM lineitem JOIN orders ON l_orderkey = o_orderkey),
      h AS (SELECT o_orderpriority, lag, COUNT(*) AS c
            FROM lags GROUP BY 1, 2),
      cc AS (SELECT *,
          SUM(c) OVER (PARTITION BY o_orderpriority ORDER BY lag) AS cum,
          SUM(c) OVER (PARTITION BY o_orderpriority) AS n
        FROM h)
      SELECT o_orderpriority, CAST(MAX(n) AS BIGINT) AS n_lines,
        MIN(CASE WHEN cum >= (n * 500 + 999) // 1000 THEN lag END) AS p50_days,
        MIN(CASE WHEN cum >= (n * 950 + 999) // 1000 THEN lag END) AS p95_days,
        MAX(lag) AS max_days,
        (1000000 * CAST(SUM(CASE WHEN lag > 60 THEN c ELSE 0 END) AS BIGINT))
          // CAST(MAX(n) AS BIGINT) AS breach_ppm
      FROM cc GROUP BY o_orderpriority
      ORDER BY o_orderpriority"""))

  /** Accounts-receivable aging card — the back-office report a billing
    * system closes its month with: every OPEN order (status ≠ 'F')
    * bucketed by its age against the corpus high-watermark date
    * (0–30 / 31–60 / 61–90 / 91+ days), with order and customer counts,
    * the outstanding centi total, and each bucket's ppm share of the
    * whole receivable. Mass migrating rightward is the collections
    * alarm; the high-watermark reference (not wall-clock now()) keeps
    * re-runs bit-identical (the q168 rule).
    *
    * Orders with a NULL order date classify as the oldest bucket
    * (unknown age reads as the collections worst case — the CASE
    * chain's else branch, identical in both engines).
    *
    * Exactness: dates compare as epoch-days (integer DIV), money in
    * centi BIGINT; the share multiplies in DECIMAL(38,0)/HUGEINT so a
    * 100 TB receivable total cannot overflow the ppm product. Plan:
    * broadcast 1-row watermark, map-side bucket expression, one
    * |buckets|-row aggregation, window share over the 4-row result. */
  def arAgingCard(orders: DataFrame): DataFrame = {
    val hw = orders
      .agg(max(expr("CAST(o_orderdate AS BIGINT) DIV 86400")).as("hw"))
    orders.filter(col("o_orderstatus") =!= "F")
      .select(col("o_custkey"),
        expr("CAST(round(o_totalprice * 100) AS BIGINT)").as("centi"),
        expr("CAST(o_orderdate AS BIGINT) DIV 86400").as("d"))
      .crossJoin(broadcast(hw))
      .withColumn("age", col("hw") - col("d"))
      .withColumn("age_bucket",
        when(col("age") <= 30, "a_0_30")
          .when(col("age") <= 60, "b_31_60")
          .when(col("age") <= 90, "c_61_90")
          .otherwise("d_over_90"))
      .groupBy(col("age_bucket"))
      .agg(count(lit(1)).as("n_orders"),
        countDistinct(col("o_custkey")).as("n_customers"),
        sum(col("centi")).as("total_centi"))
      .withColumn("share_ppm",
        expr("""CAST((CAST(1000000 AS DECIMAL(38,0)) * total_centi)
          DIV (SUM(total_centi) OVER ()) AS BIGINT)"""))
  }

  /** Oracle fixture of [[arAgingCard]]. */
  private val q229 = GQuery(
    "q229_ar_aging",
    (s, dir) => arAgingCard(t(s, dir, "orders"))
      .orderBy(col("age_bucket")),
    Some("""WITH hw AS (SELECT
          MAX((epoch_us(o_orderdate) // 1000000) // 86400) AS hw
        FROM orders),
      open_o AS (SELECT o_custkey,
          CAST(round(o_totalprice * 100) AS BIGINT) AS centi,
          hw.hw - (epoch_us(o_orderdate) // 1000000) // 86400 AS age
        FROM orders, hw WHERE o_orderstatus <> 'F'),
      b AS (SELECT CASE WHEN age <= 30 THEN 'a_0_30'
              WHEN age <= 60 THEN 'b_31_60'
              WHEN age <= 90 THEN 'c_61_90'
              ELSE 'd_over_90' END AS age_bucket,
            o_custkey, centi FROM open_o),
      g AS (SELECT age_bucket, COUNT(*) AS n_orders,
          COUNT(DISTINCT o_custkey) AS n_customers,
          CAST(SUM(centi) AS BIGINT) AS total_centi
        FROM b GROUP BY 1)
      SELECT age_bucket, n_orders, n_customers, total_centi,
        CAST((1000000::HUGEINT * total_centi)
          // (SUM(total_centi) OVER ()) AS BIGINT) AS share_ppm
      FROM g
      ORDER BY age_bucket"""))

  val queries: Seq[GQuery] =
    Seq(q01, q02, q03, q04, q05, q06, q10, q11, q12, q12b, q13, q13b, q14,
      q14b, q14c, q15, q16, q17, q18, q19, q21, q39, q40, q41, q44, q73, q74,
      q83, q107, q145, q209, q218, q224, q229)
}
