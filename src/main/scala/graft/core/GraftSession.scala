package graft.core

import org.apache.spark.sql.SparkSession

/** SparkSession factory with the engine's standard settings.
  *
  * Where the reference wires its topology from Oracle config tables at boot
  * (`MFramework.cpp:438-647`), the Spark-native engine's "boot" is just a
  * session with sane scale-oriented defaults: AQE on (runtime re-plan,
  * skew-join splitting), UTC timezone (oracle parity), shuffle parallelism
  * sized to the machine rather than the 200 default.
  */
object GraftSession {

  def builder(master: String = "local[*]", shufflePartitions: Int = 32): SparkSession.Builder =
    SparkSession.builder()
      .master(master)
      .appName("graft")
      .config("spark.sql.shuffle.partitions", shufflePartitions.toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      // Singleton execution guard (reference: flock'd config file,
      // MFramework.cpp:487-601): a checkpoint dir is an instance lock —
      // a second start on it must FAIL FAST, not silently stop the live
      // instance (Spark's default latest-wins takeover).
      .config("spark.sql.streaming.stopActiveRunOnRestart", "false")
      .config("spark.ui.enabled", "false")

  def getOrCreate(master: String = "local[*]"): SparkSession = {
    val spark = builder(master).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark
  }
}
