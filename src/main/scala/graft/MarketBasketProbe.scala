package graft

import org.apache.spark.sql.DataFrame

/** Dev probe pinning q196_market_basket's 10× ratio to its cause: the
  * plan shape (distinct → mega-basket cap → basket-key self-join → pair
  * agg) is the standard one and pair volume grows linearly under the
  * replica fixture, so the round-7 overshoot (2.56 at 10×) was
  * attributed — unpinned — to the FIXED 32 shuffle partitions carrying
  * 10× the pair-aggregation traffic. This probe measures the query at
  * 1× and 10× under 32 partitions, then re-measures the 10× run with
  * `spark.sql.shuffle.partitions` scaled 10× (the TablesSpec sizing
  * rule: partitions scale with data so per-partition state stays
  * constant). Ratio dropping to ~linear under the scaled knob = pinned.
  */
object MarketBasketProbe {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = core.GraftSession.builder(s"local[$cpus]", cpus.toInt).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val oneX = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val tenX = sys.env.getOrElse("SPARK_GRAFT_SCALE_DIR", "/tmp/graft_scale")
    def noop(df: DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()
    def time(f: => Unit): Double = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }
    val q = queries.Registry.byName("q196_market_basket")
    def measure(dir: String, parts: Int): Double = {
      spark.conf.set("spark.sql.shuffle.partitions", parts)
      try {
        noop(q.build(spark, dir)) // warm
        Seq.fill(3)(time(noop(q.build(spark, dir)))).min
      } finally spark.conf.set("spark.sql.shuffle.partitions", 32)
    }
    val t1 = measure(oneX, 32)
    val t10 = measure(tenX, 32)
    val t10s = measure(tenX, 320)
    println(f"q196 1x(parts=32)=$t1%.2fs 10x(parts=32)=$t10%.2fs " +
      f"ratio=${t10 / t1}%.2f 10x(parts=320)=$t10s%.2fs " +
      f"scaled_ratio=${t10s / t1}%.2f")
    spark.stop()
  }
}
