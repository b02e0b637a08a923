package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart, SparkListenerStageCompleted}
import org.apache.spark.sql.DataFrame

import java.util.concurrent.atomic.{AtomicInteger, AtomicLong}

/** Optimization-round measurement harness (guide §1): runs named queries
  * (default: the slowest per BASELINE.md) with a listener that attributes
  * wall time to job count, stage count, task count, executor task time,
  * and shuffle bytes — the split that says whether a query is bound by
  * scheduling overhead (many tiny jobs/stages), by shuffle, or by compute.
  *
  * Usage: `SPARK_GRAFT_PROFILE_ONLY=q242_…,q139_… sbt "runMain graft.ProfileProbe"`
  * Prints one line per query: wall seconds + the counters.
  */
object ProfileProbe {

  private final class Counters extends SparkListener {
    val jobs = new AtomicInteger(0)
    val stages = new AtomicInteger(0)
    val tasks = new AtomicInteger(0)
    val taskTimeMs = new AtomicLong(0)
    val shuffleRead = new AtomicLong(0)
    val shuffleWrite = new AtomicLong(0)
    override def onJobStart(j: SparkListenerJobStart): Unit = jobs.incrementAndGet()
    override def onStageCompleted(sc: SparkListenerStageCompleted): Unit = {
      stages.incrementAndGet()
      tasks.addAndGet(sc.stageInfo.numTasks)
      taskTimeMs.addAndGet(sc.stageInfo.taskMetrics.executorRunTime)
      shuffleRead.addAndGet(sc.stageInfo.taskMetrics.shuffleReadMetrics.totalBytesRead)
      shuffleWrite.addAndGet(sc.stageInfo.taskMetrics.shuffleWriteMetrics.bytesWritten)
    }
    def reset(): Unit = {
      jobs.set(0); stages.set(0); tasks.set(0)
      taskTimeMs.set(0); shuffleRead.set(0); shuffleWrite.set(0)
    }
  }

  private def materialize(df: DataFrame): Unit =
    df.write.format("noop").mode("overwrite").save()

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = core.GraftSession.builder(s"local[$cpus]", cpus.toInt).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val c = new Counters
    spark.sparkContext.addSparkListener(c)

    val names = sys.env.get("SPARK_GRAFT_PROFILE_ONLY")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSeq)
      .getOrElse(Seq(
        "q242_components_star", "q323_drift_log_audit", "q361_fetch_funnel",
        "q140_canonical_centrality", "q359_brown_forsythe",
        "q312_semdedup_rebuild", "q203_lpa_communities", "q199_kfold_split",
        "q139_dup_pagerank", "q134_split_leakage"))

    println(f"${"query"}%-28s ${"wall_s"}%8s ${"jobs"}%5s ${"stages"}%7s ${"tasks"}%6s ${"taskT_s"}%8s ${"shufR_MB"}%9s ${"shufW_MB"}%9s")
    names.foreach { name =>
      val q = queries.Registry.byName(name)
      spark.sparkContext.setJobDescription(s"profile:$name")
      materialize(q.build(spark, sfDir)) // warm-up
      c.reset()
      val t0 = System.nanoTime()
      materialize(q.build(spark, sfDir))
      val wall = (System.nanoTime() - t0) / 1e9
      // listener events are async; give the bus a moment to drain
      Thread.sleep(400)
      println(f"$name%-28s $wall%8.3f ${c.jobs.get}%5d ${c.stages.get}%7d ${c.tasks.get}%6d ${c.taskTimeMs.get / 1e3}%8.2f ${c.shuffleRead.get / 1e6}%9.2f ${c.shuffleWrite.get / 1e6}%9.2f")
    }
    spark.stop()
  }
}
