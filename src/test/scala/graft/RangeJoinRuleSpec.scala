package graft

import graft.plans.RangeJoin
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The band-range-join rewrite rule: a naive `abs(l - r) <= C` inner join
  * must plan as a hash equi-join on synthesized cells (not a nested
  * loop), return exactly the naive result, and leave out-of-scope joins
  * untouched.
  */
class RangeJoinRuleSpec extends SparkSpec {

  RangeJoin.ensureRule(spark) // attach the rewrite before any test runs

  import spark.implicits._

  private def naiveAndRewritten(l: DataFrame, r: DataFrame, cond: org.apache.spark.sql.Column)
      : (Array[(Long, Long)], Array[(Long, Long)], String) = {
    val joined = l.join(r, cond)
      .select(col("lid"), col("rid")).as[(Long, Long)]
    val plan = joined.queryExecution.executedPlan.toString
    val viaRule = joined.collect().sorted
    val naive = (for {
      lr <- l.as[(Long, Long)].collect()
      rr <- r.as[(Long, Long)].collect()
    } yield (lr, rr)).collect {
      case ((lid, lv), (rid, rv)) if math.abs(lv - rv) <= 50L => (lid, rid)
    }.sorted
    (naive, viaRule, plan)
  }

  private def fixture(seed: Long): (DataFrame, DataFrame) = {
    val rnd = new scala.util.Random(seed)
    // negative values included on purpose: truncated-div cells must stay safe
    val l = Seq.tabulate(120)(i => (i.toLong, rnd.nextLong(4000) - 2000L)).toDF("lid", "lv")
    val r = Seq.tabulate(130)(i => (i.toLong, rnd.nextLong(4000) - 2000L)).toDF("rid", "rv")
    (l, r)
  }

  test("abs-band join rewrites to a hash join and matches the naive result") {
    val (l, r) = fixture(42L)
    val (naive, viaRule, plan) = naiveAndRewritten(l, r,
      abs(col("lv") - col("rv")) <= 50L)
    assert(!plan.contains("NestedLoop") && !plan.contains("CartesianProduct"), plan)
    assert(plan.contains("BroadcastHashJoin") || plan.contains("SortMergeJoin"), plan)
    assert(naive.nonEmpty && viaRule.sameElements(naive),
      s"rule=${viaRule.length} naive=${naive.length}")
  }

  test("strict < and extra conjuncts are preserved") {
    val (l, r) = fixture(7L)
    val joined = l.join(r,
        abs(col("lv") - col("rv")) < 51L && col("lid") =!= col("rid"))
      .select(col("lid"), col("rid")).as[(Long, Long)]
    val plan = joined.queryExecution.executedPlan.toString
    assert(!plan.contains("NestedLoop") && !plan.contains("CartesianProduct"), plan)
    val naive = (for {
      lr <- l.as[(Long, Long)].collect()
      rr <- r.as[(Long, Long)].collect()
    } yield (lr, rr)).collect {
      case ((lid, lv), (rid, rv)) if math.abs(lv - rv) < 51L && lid != rid =>
        (lid, rid)
    }.sorted
    assert(joined.collect().sorted.sameElements(naive))
  }

  test("joins with an equi key or outer type are left to Spark") {
    val (l, r) = fixture(3L)
    // equi conjunct present: Spark hash-joins already; no __cell columns appear
    val equi = l.join(r, col("lid") === col("rid") &&
      abs(col("lv") - col("rv")) <= 50L)
    assert(!equi.queryExecution.optimizedPlan.toString.contains("__cell_"),
      equi.queryExecution.optimizedPlan.toString)
    // null-safe equality is hash-joinable too — must not be rewritten
    val nullSafe = l.join(r, col("lid") <=> col("rid") &&
      abs(col("lv") - col("rv")) <= 50L)
    assert(!nullSafe.queryExecution.optimizedPlan.toString.contains("__cell_"))
    // outer band joins keep their (nested-loop) semantics untouched
    val outer = l.join(r, abs(col("lv") - col("rv")) <= 50L, "left_outer")
    assert(!outer.queryExecution.optimizedPlan.toString.contains("__cell_"))
    assert(outer.count() >= l.count()) // every left row survives
  }

  test("null band operands produce no pairs, as in the naive join") {
    val l = Seq((1L, Some(10L)), (2L, None)).toDF("lid", "lv")
    val r = Seq((5L, Some(12L)), (6L, None)).toDF("rid", "rv")
    val out = l.join(r, abs(col("lv") - col("rv")) <= 50L)
      .select(col("lid"), col("rid")).as[(Long, Long)].collect().sorted
    assert(out.toSeq == Seq((1L, 5L)), out.toSeq.toString)
  }

  private def asymNaive(l: DataFrame, r: DataFrame,
      lo: Long, hi: Long): Array[(Long, Long)] =
    (for {
      lr <- l.as[(Long, Long)].collect()
      rr <- r.as[(Long, Long)].collect()
    } yield (lr, rr)).collect {
      case ((lid, lv), (rid, rv))
          if lv - rv >= lo && lv - rv <= hi => (lid, rid)
    }.sorted

  test("asymmetric band written as two offset inequalities rewrites and matches") {
    val (l, r) = fixture(11L)
    // lv <= rv + 30 AND rv <= lv + 70  <=>  lv - rv in [-70, 30]
    val joined = l.join(r,
        col("lv") <= col("rv") + 30L && col("rv") <= col("lv") + 70L)
      .select(col("lid"), col("rid")).as[(Long, Long)]
    val plan = joined.queryExecution.executedPlan.toString
    assert(!plan.contains("NestedLoop") && !plan.contains("CartesianProduct"), plan)
    val naive = asymNaive(l, r, -70L, 30L)
    assert(naive.nonEmpty && joined.collect().sorted.sameElements(naive))
  }

  test("one-sided window with a bare <= anchor rewrites (the funnel shape)") {
    val (l, r) = fixture(19L)
    // lv <= rv AND rv <= lv + 100  <=>  lv - rv in [-100, 0]
    val joined = l.join(r,
        col("lv") <= col("rv") && col("rv") <= col("lv") + 100L)
      .select(col("lid"), col("rid")).as[(Long, Long)]
    val plan = joined.queryExecution.executedPlan.toString
    assert(!plan.contains("NestedLoop") && !plan.contains("CartesianProduct"), plan)
    val naive = asymNaive(l, r, -100L, 0L)
    assert(naive.nonEmpty && joined.collect().sorted.sameElements(naive))
    // strict < variant
    val strict = l.join(r,
        col("lv") < col("rv") && col("rv") < col("lv") + 100L)
      .select(col("lid"), col("rid")).as[(Long, Long)]
    assert(!strict.queryExecution.executedPlan.toString.contains("NestedLoop"))
    assert(strict.collect().sorted.sameElements(asymNaive(l, r, -99L, -1L)))
  }

  test("interval-overlap on four distinct columns is NOT rewritten (scope guard)") {
    // l.s <= r.e AND r.s <= l.e pairs different columns: no shared
    // difference to bucketize — must stay un-rewritten (use
    // EventQ.overlapJoin for that shape)
    val l = Seq((1L, 0L, 10L)).toDF("lid", "ls", "le")
    val r = Seq((5L, 5L, 15L)).toDF("rid", "rs", "re")
    val j = l.join(r, col("ls") <= col("re") && col("rs") <= col("le"))
    assert(!j.queryExecution.optimizedPlan.toString.contains("__cell_"),
      j.queryExecution.optimizedPlan.toString)
    assert(j.count() == 1L)
  }
}
