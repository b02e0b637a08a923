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

  test("shifted band on int operands gets span-width cells, rewrites, matches naive") {
    val rnd = new scala.util.Random(23L)
    // Int operands: the re-centering shift is overflow-provable (cast to
    // Long is bounded by ±2^31), so span-width cells apply. Values spread
    // over ~3 "days" so day-wide cells would be a real loss.
    val l = Seq.tabulate(150)(i => (i, rnd.nextInt(260000))).toDF("lid", "lv")
    val r = Seq.tabulate(150)(i => (i, rnd.nextInt(260000))).toDF("rid", "rv")
    // lv - rv in [86300, 86400]: span 100, offsets ~1 day. The cell width
    // must track the SPAN (~50 after re-centering), not the 86400 offset.
    val joined = l.join(r,
        col("lv") - col("rv") <= 86400 && col("rv") - col("lv") <= -86300)
      .select(col("lid"), col("rid")).as[(Int, Int)]
    val plan = joined.queryExecution.executedPlan.toString
    assert(!plan.contains("NestedLoop") && !plan.contains("CartesianProduct"), plan)
    val opt = joined.queryExecution.optimizedPlan.toString
    assert(opt.contains("__cell_"), opt)
    // span 100 => re-centered width max(ceil(100/2), 2) = 50, never 86400
    assert(opt.contains(" 50)") || opt.contains(", 50"), s"cell width not span-based:\n$opt")
    val naive = (for {
      lr <- l.as[(Int, Int)].collect(); rr <- r.as[(Int, Int)].collect()
    } yield (lr, rr)).collect {
      case ((lid, lv), (rid, rv))
          if lv - rv >= 86300 && lv - rv <= 86400 => (lid, rid)
    }.sorted
    assert(naive.nonEmpty, "fixture must produce in-band pairs")
    assert(joined.collect().sorted.sameElements(naive))
  }

  test("shifted band on Long operands keeps Long-boundary pairs (no re-centering)") {
    // The ADVICE scenario: x - y in [-4, 0] (mid = -2) with data AT the
    // Long boundary. A synthesized `x - (-2)` would overflow for
    // x = Long.MaxValue - 1 — ANSI throws, non-ANSI wraps the cell id and
    // silently drops the qualifying (MaxValue-1, MaxValue) pair. LongType
    // operands therefore take the un-shifted max(|c1|,|c2|) cell path.
    val l = Seq((1L, Long.MaxValue - 1L), (2L, Long.MinValue + 1L), (3L, 100L))
      .toDF("lid", "lv")
    val r = Seq((5L, Long.MaxValue), (6L, Long.MinValue + 2L), (7L, 103L))
      .toDF("rid", "rv")
    // lv - rv in [-4, 0]: written as two offset inequalities
    val joined = l.join(r,
        col("lv") - col("rv") <= 0L && col("rv") - col("lv") <= 4L)
      .select(col("lid"), col("rid")).as[(Long, Long)]
    val opt = joined.queryExecution.optimizedPlan.toString
    assert(opt.contains("__cell_"), opt)
    assert(joined.collect().sorted.toSeq == Seq((1L, 5L), (2L, 6L), (3L, 7L)),
      "Long-boundary qualifying pairs must survive the rewrite")
  }

  test("equality written as two bare inequalities rewrites without arithmetic hazards") {
    // x <= y AND y <= x ⟺ x = y: c1 = c2 = 0, mid = 0 — no re-centering
    // subtraction may be synthesized, and the width floor of 2 keeps the
    // ±1 cell replication away from Long-boundary wrap.
    val l = Seq((1L, 10L), (2L, Long.MaxValue), (3L, Long.MinValue)).toDF("lid", "lv")
    val r = Seq((5L, 10L), (6L, Long.MaxValue), (7L, Long.MinValue), (8L, 11L)).toDF("rid", "rv")
    val joined = l.join(r, col("lv") <= col("rv") && col("rv") <= col("lv"))
      .select(col("lid"), col("rid")).as[(Long, Long)]
    assert(joined.queryExecution.optimizedPlan.toString.contains("__cell_"))
    assert(joined.collect().sorted.toSeq == Seq((1L, 5L), (2L, 6L), (3L, 7L)))
  }

  test("literals near the Long boundary are left un-rewritten (overflow guard)") {
    val (l, r) = fixture(31L)
    // abs form with a near-MaxValue band: satisfiable but unsafe to bucketize
    val wide = l.join(r, abs(col("lv") - col("rv")) <= Long.MaxValue - 2L)
    assert(!wide.queryExecution.optimizedPlan.toString.contains("__cell_"),
      wide.queryExecution.optimizedPlan.toString)
    assert(wide.count() == 120L * 130L) // everything within the band
    // strict-inequality Long.MinValue literal: c - 1 would wrap; skip
    val minLit = l.join(r, col("lv") - col("rv") < Long.MinValue + 1L &&
      col("rv") - col("lv") <= Long.MaxValue - 1L)
    assert(!minLit.queryExecution.optimizedPlan.toString.contains("__cell_"))
    assert(minLit.count() == 0L)
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
