package graft

import org.apache.spark.sql.DataFrame

/** Dev probe: wall-clock of the composed CurationPipeline at 1× vs the
  * ScaleProbe 10× replica, with and without the joint-balance stage
  * (SCALING.md "composed CurationPipeline" sections). Requires the 10×
  * replica on disk (run ScaleProbe first, or set
  * SPARK_GRAFT_SCALE_DIR); min of 3 after a warm-up, noop write. */
object PipelineProbe {
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
    def run(dir: String, balance: Option[String]): Double = {
      val docs = core.Tables.load(spark, dir, "documents")
      noop(pipelines.CurationPipeline.run(docs, jointBalanceCol = balance))
      Seq.fill(3)(time(noop(
        pipelines.CurationPipeline.run(docs, jointBalanceCol = balance)))).min
    }
    Seq(("plain", None), ("balanced", Some("source"))).foreach {
      case (label, bal) =>
        val t1 = run(oneX, bal)
        val tk = run(tenX, bal)
        println(f"pipeline $label 1x=$t1%.2fs 10x=$tk%.2fs ratio=${tk / t1}%.2f")
    }
    spark.stop()
  }
}
