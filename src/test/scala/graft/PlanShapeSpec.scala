package graft

import graft.queries.Registry

/** Plan-shape assertions (SURVEY §5.4): the "free" Catalyst optimizations
  * must actually be present — broadcast joins for dims, filter pushdown
  * into the parquet scan, top-k as TakeOrderedAndProject. These guard the
  * 100 TB story: if a dim join stops broadcasting or a filter stops
  * pushing down, correctness tests stay green but the plan is wrong.
  */
class PlanShapeSpec extends SparkSpec {

  private def planOf(name: String): String =
    Registry.byName(name).build(spark, sfDir).queryExecution.executedPlan.toString

  test("q02 joins dims with BroadcastHashJoin") {
    assert(planOf("q02_revenue_by_region").contains("BroadcastHashJoin"))
  }

  test("q316's null-safe grid join (<=>) still plans a " +
      "BroadcastHashJoin, not a nested loop") {
    // EqualNullSafe is a valid hash-join key; the round-14 NULL-class
    // fix must not have degraded the grid join. The join sides are
    // aggregates (sizes unknown statically), so the broadcast decision
    // is AQE's — materialize first and read the FINAL plan. The only
    // BroadcastNestedLoopJoins allowed are the two deliberate tiny
    // crossJoins (broadcast global distribution + scalar total).
    val df = Registry.byName("q316_t_closeness").build(spark, sfDir)
    df.collect()
    // AdaptiveSparkPlan prints final + initial sections; read the final
    val p = df.queryExecution.executedPlan.toString
      .split("== Initial Plan ==").head
    assert(p.contains("BroadcastHashJoin") && p.contains("LeftOuter"),
      p.take(600))
    val bnlj = "BroadcastNestedLoopJoin".r.findAllIn(p).size
    assert(bnlj <= 2, s"unexpected nested-loop joins ($bnlj):\n$p")
  }

  test("q332 resolves the rate dim with a broadcast join and q331 " +
      "builds its grid from broadcast margins") {
    assert(planOf("q332_irsf_screen").contains("BroadcastHashJoin"))
    assert(planOf("q331_cramers_v2").contains("BroadcastHashJoin"))
  }

  test("q337 applies the isotonic map with a broadcast join") {
    assert(planOf("q337_calibrated_reliability")
      .contains("BroadcastHashJoin"))
  }

  test("q06 pushes predicates into the parquet scan") {
    val plan = planOf("q06_filtered_revenue")
    assert(plan.contains("PushedFilters: ["))
    assert(plan.contains("IsNotNull(l_shipdate)") || plan.contains("GreaterThanOrEqual(l_shipdate"))
  }

  test("q06 prunes columns: scan reads only needed fields") {
    val plan = planOf("q06_filtered_revenue")
    // ReadSchema must not include unneeded wide columns like l_returnflag
    val read = plan.split("ReadSchema:").last.takeWhile(_ != '\n')
    assert(!read.contains("l_returnflag"), s"unpruned scan: $read")
    assert(read.contains("l_extendedprice"))
  }

  test("q03 plans top-k, not global sort") {
    assert(planOf("q03_top_orders").contains("TakeOrderedAndProject"))
  }

  test("q04 semi-join stays a join, not a cartesian") {
    val plan = planOf("q04_semi_join")
    assert(plan.contains("LeftSemi"))
    assert(!plan.contains("CartesianProduct"))
  }

  test("q01 aggregation is partial (map-side combine) via HashAggregate") {
    val plan = planOf("q01_pricing_summary")
    assert(plan.contains("HashAggregate"))
  }

  test("whole-stage codegen covers the q01 pipeline") {
    // AQE finalizes subplans lazily — execute, then inspect the final plan.
    // Codegen'd spans print as "*(n)" in the tree string.
    val df = Registry.byName("q01_pricing_summary").build(spark, sfDir)
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("isFinalPlan=true"))
    assert(plan.contains("*(1)"), s"no codegen span in:\n$plan")
  }

  test("q29 broadcasts the query side of the similarity join") {
    assert(planOf("q29_cosine_topk").contains("BroadcastNestedLoopJoin") ||
      planOf("q29_cosine_topk").contains("BroadcastHashJoin"))
  }

  test("repartition(n) plans RoundRobinPartitioning (reference operator #8)") {
    val df = Registry.byName("q01_pricing_summary").build(spark, sfDir).repartition(4)
    assert(df.queryExecution.executedPlan.toString.contains("RoundRobinPartitioning"))
  }

  test("q44 correlated subqueries decorrelate into joins") {
    val plan = planOf("q44_correlated_subquery")
    // no per-row subquery execution survives the rewrite
    assert(!plan.contains("ScalarSubquery"), plan)
    assert(plan.contains("Join") || plan.contains("BroadcastHashJoin"), plan)
  }

  test("q30 bucketed ANN is an equi-join (hash-partitionable)") {
    val plan = planOf("q30_ann_bucketed")
    assert(plan.contains("BroadcastHashJoin") || plan.contains("SortMergeJoin"))
  }

  test("q68 bucketized range join plans as an equi-join, not a nested loop") {
    val plan = planOf("q68_range_join")
    assert(plan.contains("BroadcastHashJoin") || plan.contains("SortMergeJoin"), plan)
    assert(!plan.contains("BroadcastNestedLoopJoin") && !plan.contains("CartesianProduct"), plan)
  }

  test("concurrentCounts matches a naive O(n²) reference on seeded random data") {
    import spark.implicits._
    import org.apache.spark.sql.functions.{col, timestamp_seconds}
    val rnd = new scala.util.Random(20260812L) // seeded: reproducible
    val secs = Array.fill(300)(rnd.nextInt(100000).toLong)
    val naive = secs.indices.map { i =>
      i.toLong -> secs.indices.count(j =>
        j != i && math.abs(secs(i) - secs(j)) <= 997L).toLong
    }.toMap
    val ev = secs.zipWithIndex.map { case (s, i) => (i.toLong, s) }.toSeq
      .toDF("event_id", "s").select(col("event_id"), timestamp_seconds(col("s")).as("ts"))
    val got = graft.queries.EventQ.concurrentCounts(ev, windowSec = 997L)
      .as[(Long, Long)].collect().toMap
    assert(got == naive, "bucketized result diverged from the naive reference")
  }

  test("q94 broadcasts the eval band side; train corpus never shuffles for the join") {
    val plan = planOf("q94_fuzzy_decontamination")
    assert(plan.contains("BroadcastHashJoin"), plan)
  }

  test("q92 key-skew report plans top-k, not a global sort") {
    assert(planOf("q92_key_skew").contains("TakeOrderedAndProject"))
  }

  test("q90 correlation keeps the scan pipeline in one codegen'd aggregate") {
    val plan = planOf("q90_correlation")
    assert(plan.contains("HashAggregate"), plan)
    // the per-row extraction must not fall back to a non-codegen project
    assert(!plan.contains("BatchEvalPython") && !plan.contains("Generate"), plan)
  }

  test("q122 random projection plans with no exchange at all") {
    val plan = planOf("q122_random_projection")
    // map-side only up to the fixture's presentation sort
    val beforeSort = plan.split("Sort ").head
    assert(!beforeSort.contains("Exchange hashpartitioning"),
      s"projection must not shuffle:\n$plan")
  }

  test("q120 token encode broadcasts the vocabulary") {
    val plan = planOf("q120_token_encode")
    assert(plan.contains("BroadcastHashJoin"), plan)
    assert(plan.contains("TakeOrderedAndProject"),
      s"vocab top-K must be TakeOrdered, not a global sort:\n$plan")
  }

  test("q116 epoch shuffle is one hash exchange on the shard") {
    val plan = planOf("q116_epoch_shuffle")
    val n = "Exchange hashpartitioning".r.findAllIn(plan).length
    assert(n == 1, s"expected exactly one hash exchange, got $n:\n$plan")
  }

  test("q117 repeat-by-factor stays map-side (broadcast lookup, no hash exchange)") {
    val plan = planOf("q117_repeat_factor")
    assert(plan.contains("BroadcastHashJoin"), plan)
    val beforeSort = plan.split("Sort ").head
    assert(!beforeSort.contains("Exchange hashpartitioning"),
      s"factor application must not shuffle:\n$plan")
  }

  test("q138 BPE apply joins the word map and aggregates partially") {
    val plan = planOf("q138_bpe_encode")
    // the vocabulary-sized segmentation map must come in as a join (AQE
    // broadcasts it at fixture scale), never a cartesian; the per-doc
    // rollup must be a partial HashAggregate
    assert(!plan.contains("CartesianProduct"), plan)
    assert(plan.contains("HashAggregate"), plan)
  }

  test("q139 pagerank iterations are equi-joins over the checkpointed edges") {
    val plan = planOf("q139_dup_pagerank")
    assert(!plan.contains("CartesianProduct"), plan)
    assert(!plan.contains("BroadcastNestedLoopJoin"), plan)
    assert(plan.contains("HashAggregate"), plan)
  }

  test("q146 novelty curve is one window pass, no joins") {
    val plan = planOf("q146_novelty_curve")
    assert(!plan.contains("Join"), s"hash-window construction needs no join:\n$plan")
    assert(plan.contains("Window"), plan)
  }

  test("q148 KS drift aggregates values before the domain-sized window") {
    val plan = planOf("q148_ks_drift")
    assert(plan.contains("HashAggregate"), plan)
    assert(!plan.contains("CartesianProduct"), plan)
    assert(plan.contains("TakeOrderedAndProject"),
      s"top-1 must be TakeOrdered, not global sort:\n$plan")
  }

  private def execPlanOf(name: String): org.apache.spark.sql.execution.SparkPlan =
    Registry.byName(name).build(spark, sfDir).queryExecution.executedPlan

  /** Every un-partitioned WindowExec must ride a bounded table: either a
    * doubly-aggregated one (the bucket-offset construction — ≥2
    * HashAggregates below it) or a limit result (≤topK rows). */
  private def assertGlobalWindowsBounded(name: String): Unit = {
    import org.apache.spark.sql.execution.window.WindowExec
    val plan = execPlanOf(name)
    val bad = plan.collect {
      case w: WindowExec if w.partitionSpec.isEmpty =>
        val aggs = w.child.collect {
          case a: org.apache.spark.sql.execution.aggregate.HashAggregateExec => a
        }.size
        val limited = w.child.collectFirst {
          case t: org.apache.spark.sql.execution.TakeOrderedAndProjectExec => t
          case l: org.apache.spark.sql.execution.GlobalLimitExec => l
        }.isDefined
        (w, aggs, limited)
    }.filter { case (_, aggs, limited) => aggs < 2 && !limited }
    assert(bad.isEmpty,
      s"un-partitioned window over data-proportional input in $name:\n" +
        bad.map(_._1.toString).mkString("\n"))
  }

  test("q183 top-K is TakeOrdered; rank window only over the limit result") {
    val plan = planOf("q183_join_blowup")
    assert(plan.contains("TakeOrderedAndProject"),
      s"top-K must be TakeOrdered, not global sort:\n$plan")
    assertGlobalWindowsBounded("q183_join_blowup")
  }

  test("q148 global windows ride the bucket table, never the value table") {
    assertGlobalWindowsBounded("q148_ks_drift")
  }

  test("q197 Hamming candidates are equi-joins, never a distance cross product") {
    val plan = planOf("q197_hamming_radius")
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoopJoin"), plan)
    assert(plan.contains("BroadcastHashJoin") || plan.contains("SortMergeJoin"),
      plan)
  }

  test("q196 market basket self-join stays an equi-join with partial aggs") {
    val plan = planOf("q196_market_basket")
    // the only nested-loop allowed is the 1-row scalar-total broadcast
    // cross join (the keySkewReport pattern); the basket self-join must
    // be a hash equi-join on the basket key
    assert(!plan.contains("CartesianProduct"), plan)
    assert(plan.contains("BroadcastHashJoin [bk") ||
      plan.contains("SortMergeJoin [bk"), plan)
    assert(plan.contains("HashAggregate"), plan)
    assert(plan.contains("TakeOrderedAndProject"),
      s"top-K must be TakeOrdered:\n$plan")
  }

  test("concurrentCounts finds every pair exactly once, across cell borders") {
    import spark.implicits._
    import org.apache.spark.sql.functions.{col, timestamp_seconds}
    // cells of 10s: ids 1,2 same cell; 3 in next cell but within range of 2;
    // 4 far away; 5 exactly at the window boundary from 3 (inclusive)
    val ev = Seq((1L, 100L), (2L, 105L), (3L, 112L), (4L, 500L), (5L, 122L))
      .toDF("event_id", "s").select(col("event_id"), timestamp_seconds(col("s")).as("ts"))
    val got = graft.queries.EventQ.concurrentCounts(ev, windowSec = 10L)
      .as[(Long, Long)].collect().toMap
    assert(got == Map(1L -> 1L, 2L -> 2L, 3L -> 2L, 4L -> 0L, 5L -> 1L), got.toString)
  }
}
