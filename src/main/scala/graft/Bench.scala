package graft

import org.apache.spark.sql.DataFrame

/** Benchmark main: runs every declared query on SPARK_GRAFT_SF_DIR and
  * prints ONE JSON line. Protocol per BASELINE.md: one warm-up execution,
  * then the median of 3 timed runs per query.
  *
  * Each run fully materializes the result through a `noop`-format write:
  * under `count()` Catalyst prunes projections and drops sorts, so
  * projection-only queries would measure a row-count scan instead of the
  * declared work.
  */
object Bench {

  private def time[A](f: => A): Double = {
    val t0 = System.nanoTime()
    f
    (System.nanoTime() - t0) / 1e9
  }

  /** Execute the full plan — every output column, every sort — without
    * collecting to the driver or touching disk.
    */
  private def materialize(df: DataFrame): Unit =
    df.write.format("noop").mode("overwrite").save()

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val runs = sys.env.getOrElse("SPARK_GRAFT_BENCH_RUNS", "3").toInt
    val spark = core.GraftSession.builder(s"local[$cpus]", cpus.toInt).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // dev-loop filter: SPARK_GRAFT_BENCH_ONLY=q26b_neardup_components,q01_…
    // times just those queries; unset (the driver's mode) runs everything
    val only = sys.env.get("SPARK_GRAFT_BENCH_ONLY")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSet)
    val results = queries.Registry.all
      .filter(q => q.bench && only.forall(_.contains(q.name))).map { q =>
      val med =
        try {
          time(materialize(q.build(spark, sfDir))) // warm-up (plans + page cache)
          val ts = Seq.fill(runs)(time(materialize(q.build(spark, sfDir)))).sorted
          ts(ts.length / 2)
        } catch { case _: Throwable => -1.0 }
      q.name -> med
    }
    val qs = results.map { case (k, v) => "\"" + k + "\":" + v }.mkString("{", ",", "}")
    val total = results.map(_._2).filter(_ >= 0).sum
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir"}""")
    spark.stop()
  }
}
