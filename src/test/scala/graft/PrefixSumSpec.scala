package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop, Test => ScTest}

import graft.queries.PrefixSum

/** The shared bucket-offset prefix-sum construction: result-identical
  * to a global single-partition window, without ever being one.
  */
class PrefixSumSpec extends SparkSpec {

  import spark.implicits._

  test("exclusive prefix equals the global window on random histograms") {
    val keys = Gen.nonEmptyListOf(
      Gen.zip(Gen.chooseNum(-500L, 500L), Gen.chooseNum(0L, 99L)))
    val prop = Prop.forAll(keys) { rows =>
      val h = rows.toMap.toSeq // distinct keys: a histogram
      val df = h.toDF("k", "w")
      val got = PrefixSum.exclusive(df, "k", Seq("w"), bucketWidth = 64L)
        .select(col("k"), col("w_cum")).as[(Long, Long)].collect().toMap
      val want = df.withColumn("w_cum",
          coalesce(sum(col("w")).over(Window.orderBy(col("k"))
            .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
        .select(col("k"), col("w_cum")).as[(Long, Long)].collect().toMap
      got == want
    }
    val res = ScTest.check(
      ScTest.Parameters.default.withMinSuccessfulTests(20), prop)
    assert(res.passed, res.status.toString)
  }

  test("descending + tie columns reproduce rank and inclusive coverage") {
    val rows = Seq(("a", 50L), ("b", 30L), ("c", 50L), ("d", 10L),
      ("e", 30L)).toDF("stratum", "tokens").withColumn("one", lit(1L))
    val got = PrefixSum.exclusive(rows, "tokens", Seq("one", "tokens"),
        bucketWidth = 16L, tieCols = Seq("stratum"), descending = true)
      .select(col("stratum"), (col("one_cum") + 1L).as("rank"),
        (col("tokens_cum") + col("tokens")).as("cum"))
      .as[(String, Long, Long)].collect()
      .map { case (s, r, c) => s -> ((r, c)) }.toMap
    // order: a(50) c(50) b(30) e(30) d(10)
    assert(got == Map("a" -> ((1L, 50L)), "c" -> ((2L, 100L)),
      "b" -> ((3L, 130L)), "e" -> ((4L, 160L)), "d" -> ((5L, 170L))),
      got.toString)
  }

  test("multiple weights accumulate independently in one pass") {
    val df = Seq((1L, 10L, 1L), (2L, 20L, 2L), (5L, 5L, 3L))
      .toDF("k", "wa", "wb")
    val got = PrefixSum.exclusive(df, "k", Seq("wa", "wb"), bucketWidth = 2L)
      .orderBy(col("k")).select("k", "wa_cum", "wb_cum")
      .as[(Long, Long, Long)].collect().toSeq
    assert(got == Seq((1L, 0L, 0L), (2L, 10L, 1L), (5L, 30L, 3L)), got.toString)
  }

  test("the plan has no unpartitioned window over the data side") {
    // a continuous metric: every key distinct, 10k rows — the case the
    // global window serializes and this construction must not
    val df = spark.range(9972).select(
      (col("id") * 7L % 9973L).as("k"), lit(1L).as("w"))
    val out = PrefixSum.exclusive(df, "k", Seq("w"), bucketWidth = 256L)
    assert(out.count() == 9972)
    val plan = out.queryExecution.executedPlan.toString
    // the only single-partition exchange feeds the |buckets|-row offset
    // table; the data-side window is hash-partitioned by bucket
    assert(plan.contains("hashpartitioning(__psb"), plan)
    val single = "SinglePartition".r.findAllIn(plan).length
    assert(single <= 1, s"expected at most one SinglePartition exchange:\n$plan")
    // exactness on the continuous case: w_cum of key k = #keys < k —
    // spot-check a few against a direct count
    val sample = out.orderBy(col("k")).limit(3)
      .select(col("k"), col("w_cum")).as[(Long, Long)].collect()
    sample.foreach { case (k, cum) =>
      val direct = df.filter(col("k") < k).count()
      assert(cum == direct, s"k=$k cum=$cum direct=$direct")
    }
  }
}
