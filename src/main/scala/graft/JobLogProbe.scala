package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart}

import scala.collection.concurrent.TrieMap

/** Per-job attribution for one query (round-15 harness): prints every job's
  * wall time, task count, and call site so job-count-bound queries
  * (ProfileProbe's 30-70-job rows) show WHICH actions the jobs are.
  * Usage: `SPARK_GRAFT_JOBLOG_ONLY=q323_… sbt "runMain graft.JobLogProbe"`.
  */
object JobLogProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = core.GraftSession.builder(s"local[$cpus]", cpus.toInt).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val starts = TrieMap.empty[Int, (Long, Int, String)]
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(j: SparkListenerJobStart): Unit = {
        val site = Option(j.properties)
          .flatMap(p => Option(p.getProperty("callSite.short"))).getOrElse("?")
        starts(j.jobId) = (System.nanoTime(), j.stageInfos.map(_.numTasks).sum, site)
      }
      override def onJobEnd(j: SparkListenerJobEnd): Unit =
        starts.remove(j.jobId).foreach { case (t0, nt, site) =>
          println(f"job ${j.jobId}%3d ${(System.nanoTime() - t0) / 1e6}%8.1f ms  tasks=$nt%4d  $site")
        }
    })
    val name = sys.env.getOrElse("SPARK_GRAFT_JOBLOG_ONLY", "q323_drift_log_audit")
    val q = queries.Registry.byName(name)
    q.build(spark, sfDir).write.format("noop").mode("overwrite").save() // warm-up
    println(s"=== $name timed run ===")
    val t0 = System.nanoTime()
    q.build(spark, sfDir).write.format("noop").mode("overwrite").save()
    Thread.sleep(500)
    println(f"wall ${(System.nanoTime() - t0) / 1e9}%.3f s")
    spark.stop()
  }
}
