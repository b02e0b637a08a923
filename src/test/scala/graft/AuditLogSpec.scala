package graft

import java.nio.file.Files
import java.sql.Timestamp

import graft.etl.AuditLog
import org.apache.spark.sql.functions._

class AuditLogSpec extends SparkSpec {

  import spark.implicits._

  private val logs = Seq(
    ("comp_a", "I", "s1", Timestamp.valueOf("2026-08-12 05:00:00"), "started"),
    ("comp_a", "D", "s1", Timestamp.valueOf("2026-08-12 05:00:01"), "debug detail"),
    ("comp_a", "E", "s2", Timestamp.valueOf("2026-08-12 05:00:02"), "read failed"),
    ("comp_b", "A", "s3", Timestamp.valueOf("2026-08-13 05:00:03"), "alert!"))
    .toDF("component", "level", "session", "ts", "text")

  test("bitmask filter matches the reference semantics (global & msg)") {
    // global = INFO | ERROR = 1 | 16 = 17
    val kept = AuditLog.levelFilter(logs, col("level"), 17)
      .select("level").as[String].collect().sorted
    assert(kept.sameElements(Array("E", "I")))
  }

  test("log packets serialize in the s/c/l/m wire layout") {
    val pkt = logs.limit(1).select(AuditLog.formatPacket(
      col("component"), col("level"), col("session"), col("ts"), col("text")).as("w"))
      .as[String].head()
    assert(pkt == "s=1\nc=comp_a\nl=I\nm=2026/08/12 05:00:00|s1|started")
    // and parses back through the packet codec
    val m = graft.etl.PacketCodec.parseLocal(pkt)
    assert(m("c") == "comp_a" && m("l") == "I" && m("m").endsWith("|started"))
  }

  test("audit sink partitions by day and level") {
    val dir = Files.createTempDirectory("graft_audit").toString
    AuditLog.write(logs, "level", "ts", globalMask = 0x7f, path = dir)
    val back = spark.read.parquet(dir)
    assert(back.count() == 4)
    val days = new java.io.File(dir).listFiles().map(_.getName).filter(_.startsWith("log_day=")).sorted
    assert(days.sameElements(Array("log_day=2026-08-12", "log_day=2026-08-13")))
  }

  test("observed() collects row/null counters during the action, no extra job") {
    import spark.implicits._
    val df = Seq((1L, Some("a")), (2L, None), (3L, Some("c")), (4L, None))
      .toDF("id", "v")
    val (out, obs) = graft.etl.AuditLog.observed(df.filter($"id" =!= 3L),
      "stage_audit", Seq("v"))
    val jobsBefore = spark.sparkContext.statusTracker.getJobIdsForGroup(null).length
    out.write.format("noop").mode("overwrite").save() // the one materializing action
    val row = obs.get
    assert(row("n_rows") == 3L && row("n_null_v") == 2L, row.toString)
    val jobsAfter = spark.sparkContext.statusTracker.getJobIdsForGroup(null).length
    assert(jobsAfter - jobsBefore <= 1, s"metrics must not add jobs: $jobsBefore -> $jobsAfter")
  }
}
