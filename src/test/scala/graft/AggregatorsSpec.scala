package graft

import graft.functions.Aggregators
import org.apache.spark.sql.functions._

class AggregatorsSpec extends SparkSpec {

  import spark.implicits._

  test("BitmaskOr accumulates level masks like the reference logger") {
    // levels: INFO=1, DEBUG=2, WARN=4 (LoggerWriter.cpp:182-205 bit codes)
    val masks = Seq(1L, 2L, 4L, 1L).toDS()
    val or = masks.select(Aggregators.BitmaskOr.toColumn).head()
    assert(or == 7L)
    // filter semantics: globalLevel & msgLevel (LoggerWriter.cpp:178)
    val global = 5L // INFO | WARN
    assert(masks.filter(m => (global & m) != 0).collect().sorted.sameElements(Array(1L, 1L, 4L)))
  }

  test("VectorMean computes the per-group centroid distributively") {
    val vecs = Seq(
      (0, Array(1.0f, 3.0f)),
      (0, Array(3.0f, 5.0f)),
      (1, Array(10.0f, 0.0f))).toDS()
    val centroid = new Aggregators.VectorMean(2).toColumn
    val rows = vecs.groupByKey(_._1).mapValues(_._2).agg(centroid)
      .collect().toMap
    assert(rows(0).sameElements(Array(2.0, 4.0)))
    assert(rows(1).sameElements(Array(10.0, 0.0)))
  }

  test("FrequentItems is exact when capacity covers the domain") {
    val toks = Seq.fill(50)("hot") ++ Seq.fill(20)("warm") ++ Seq.fill(5)("cold")
    val got = toks.toDS().repartition(7) // force several partials + a merge
      .select(udaf(new Aggregators.FrequentItems(10),
        org.apache.spark.sql.Encoders.STRING).apply(col("value")))
      .head.getMap[String, Long](0)
    assert(got == Map("hot" -> 50L, "warm" -> 20L, "cold" -> 5L))
  }

  test("FrequentItems under pressure keeps heavy hitters within the MG bound") {
    // n=130: one heavy item (100) + 30 singletons, capacity 4
    // → guarantee: any item with count > n/(cap+1) = 26 survives, and
    // estimates under-count by at most 26
    val toks = Seq.fill(100)("heavy") ++ (1 to 30).map(i => s"noise$i")
    val got = toks.toDS().repartition(5)
      .select(udaf(new Aggregators.FrequentItems(4),
        org.apache.spark.sql.Encoders.STRING).apply(col("value")))
      .head.getMap[String, Long](0)
    assert(got.size <= 4, s"sketch exceeded capacity: $got")
    assert(got.contains("heavy"), s"heavy hitter evicted: $got")
    val est = got("heavy")
    assert(est <= 100L && est >= 100L - 26L, s"estimate $est outside MG bound")
  }

  test("CountMinSketch never under-counts and is exact without collisions") {
    import graft.functions.Aggregators.{CmsBuf, CountMinSketch}
    val items = (1 to 400).map(i => s"item_${i % 37}") // 37 distinct, skewed
    val truth = items.groupBy(identity).view.mapValues(_.size.toLong).toMap

    // tiny sketch: estimates must bound truth from ABOVE (CMS over-counts)
    val tight = new CountMinSketch(8, 3)
    val bt = items.foldLeft(tight.zero)((b, a) => tight.reduce(b, a))
    truth.foreach { case (k, t) => assert(tight.estimate(bt, k) >= t, k) }

    // wide sketch: collision-free regime is exact, and a two-way merge
    // equals single-pass accumulation (partials are element-wise adds)
    val wide = new CountMinSketch(4096, 4)
    val (l, r) = items.splitAt(137)
    val merged = wide.merge(
      l.foldLeft(wide.zero)((b, a) => wide.reduce(b, a)),
      r.foldLeft(wide.zero)((b, a) => wide.reduce(b, a)))
    truth.foreach { case (k, t) => assert(wide.estimate(merged, k) == t, k) }
    assert(wide.estimate(merged, "never_seen") == 0L)
  }

  test("VectorMean over the embeddings fixture matches the SQL centroid") {
    val emb = graft.core.Tables.load(spark, sfDir, "embeddings")
    val typed = emb.select(col("label"), col("embedding"))
      .as[(Int, Array[Float])]
    val got = typed.groupByKey(_._1).mapValues(_._2)
      .agg(new Aggregators.VectorMean(64).toColumn).collect().toMap
    val expected = emb
      .select(col("label"), expr("CAST(element_at(embedding, 1) AS DOUBLE)").as("e1"))
      .groupBy("label").agg(avg("e1")).as[(Int, Double)].collect().toMap
    expected.foreach { case (label, e1avg) =>
      assert(math.abs(got(label)(0) - e1avg) < 1e-9)
    }
  }

  test("TopK keeps the exact k best across partials, ties broken by id") {
    import Aggregators.{Scored, TopK}
    val agg = new TopK(3)
    // single-pass truth on a shuffled input with a score tie
    val rows = Seq(Scored(5.0, 7), Scored(9.0, 2), Scored(5.0, 3),
      Scored(1.0, 9), Scored(9.0, 8), Scored(7.0, 1))
    val expected = Seq(Scored(9.0, 2), Scored(9.0, 8), Scored(7.0, 1))
    val single = rows.foldLeft(agg.zero)(agg.reduce)
    assert(single == expected)
    // merge of two partials == top-k of the union, any split point
    (1 until rows.length).foreach { cut =>
      val (l, r) = rows.splitAt(cut)
      val m = agg.merge(l.foldLeft(agg.zero)(agg.reduce),
        r.foldLeft(agg.zero)(agg.reduce))
      assert(m == expected, s"split at $cut")
    }
    // fewer rows than k: all kept, in order
    assert(rows.take(2).foldLeft(agg.zero)(agg.reduce) ==
      Seq(Scored(9.0, 2), Scored(5.0, 7)))
  }

  test("TopK through a real shuffle matches the window form") {
    val topk = udaf(new Aggregators.TopK(3),
      org.apache.spark.sql.Encoders.product[Aggregators.Scored])
    val orders = graft.core.Tables.load(spark, sfDir, "orders")
    val viaAgg = orders.groupBy(col("o_orderpriority"))
      .agg(topk(col("o_totalprice"), col("o_orderkey")).as("top"))
      .select(col("o_orderpriority"), posexplode(col("top")).as(Seq("pos", "sc")))
      .select(col("o_orderpriority"), col("sc.id"), col("sc.score"))
    val viaWindow = orders
      .withColumn("rn", row_number().over(
        org.apache.spark.sql.expressions.Window
          .partitionBy(col("o_orderpriority"))
          .orderBy(col("o_totalprice").desc, col("o_orderkey"))))
      .filter(col("rn") <= 3)
      .select(col("o_orderpriority"), col("o_orderkey"), col("o_totalprice"))
    assert(viaAgg.collect().toSet.map((r: org.apache.spark.sql.Row) =>
        (r.getString(0), r.getLong(1), r.getDouble(2))) ==
      viaWindow.collect().toSet.map((r: org.apache.spark.sql.Row) =>
        (r.getString(0), r.getLong(1), r.getDouble(2))))
    // the aggregator plan must not contain a Window/full-sort node
    val plan = viaAgg.queryExecution.executedPlan.toString
    assert(!plan.contains("Window"), "TopK plan fell back to a window sort")
    assert(plan.contains("ObjectHashAggregate"),
      "TopK should run as partial ObjectHashAggregate")
  }
}
