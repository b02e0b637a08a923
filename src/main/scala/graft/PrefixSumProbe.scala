package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.queries.AnalyticsQ

/** Dev probe: the round-9 bucket-offset routing of the histogram-cumsum
  * call sites (q240/q186/q213/q179), on the one fixture the histogram
  * argument does NOT cover — a NEAR-UNIQUE metric (every value
  * distinct), where the old global `Window.orderBy` serializes the
  * whole distinct-value table onto one reducer (the pre-fix q148
  * shape). Measures q240's rankAucCard (now routed through
  * PrefixSum.exclusive) against an inline replica of the OLD
  * single-partition construction, at 1× and 10×. Results → SCALING.md.
  */
object PrefixSumProbe {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = core.GraftSession.builder(s"local[$cpus]", cpus.toInt)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val n1 = sys.env.getOrElse("SPARK_GRAFT_PS_ROWS", "2000000").toLong

    // near-unique metric: value = id/100 + a per-id jitter, so round(v*100)
    // yields ~n distinct cv keys — the continuous case
    def events(n: Long): DataFrame =
      spark.range(n).select(
        when(col("id") % 2L === 0L, "purchase").otherwise("click")
          .as("event_type"),
        ((col("id") * 37L % n) + col("id") % 7L * 0.13)
          .cast("double").as("value"))
        .repartition(cpus.toInt)

    def oldAuc(ev: DataFrame): DataFrame = {
      // the pre-round-9 construction: global single-partition window
      val h = ev.filter(col("event_type").isin("purchase", "click"))
        .select((col("event_type") === "purchase").as("isa"),
          expr("CAST(round(value * 100) AS BIGINT)").as("cv"))
        .groupBy(col("cv"))
        .agg(sum(when(col("isa"), 1L).otherwise(0L)).as("ca"),
          sum(when(!col("isa"), 1L).otherwise(0L)).as("cb"))
      val w = Window.orderBy(col("cv"))
        .rowsBetween(Window.unboundedPreceding, -1)
      h.withColumn("k", coalesce(sum(col("ca") + col("cb")).over(w), lit(0L)))
        .agg(sum(col("ca")).as("n_a"), sum(col("cb")).as("n_b"),
          sum(expr(
            "CAST(ca AS DECIMAL(38,0)) * (2 * k + ca + cb + 1)")).as("r2a"))
        .select(col("n_a"), col("n_b"),
          expr("""CAST((CAST(1000 AS DECIMAL(38,0)) *
              (r2a - CAST(n_a AS DECIMAL(38,0)) * (n_a + 1)))
            DIV (CAST(2 AS DECIMAL(38,0)) * n_a * n_b) AS BIGINT)""")
            .as("auc_milli"))
    }

    def time(label: String, df: => DataFrame): (Double, Seq[Any]) = {
      df.write.format("noop").mode("overwrite").save() // warm
      val t0 = System.nanoTime()
      val out = df.collect()
      val dt = (System.nanoTime() - t0) / 1e9
      (dt, out.head.toSeq)
    }

    for (mult <- Seq(1L, 10L)) {
      val ev = events(n1 * mult).localCheckpoint()
      val distinctCv = ev.select(expr("CAST(round(value*100) AS BIGINT)"))
        .distinct().count()
      val (tNew, rNew) = time("bucketed", AnalyticsQ.rankAucCard(
        ev, "purchase", "click"))
      val (tOld, rOld) = time("global", oldAuc(ev))
      println(f"prefixsum ${mult}x rows=${n1 * mult} distinct_cv=$distinctCv " +
        f"bucketed=$tNew%.2fs global_window=$tOld%.2fs " +
        f"speedup=${tOld / tNew}%.2fx equal=${rNew.take(2) == rOld.take(2)}")
    }
    spark.stop()
  }
}
