package graft

import java.nio.file.Files

import graft.streaming.{PipelineRunner, Topology}
import org.apache.spark.sql.DataFrame

/** Config-driven topology assembly (the reference's M_COMPONENT /
  * M_LINKED_SESSIONS / M_QUEUE plane): a config RELATION — here written
  * and read back over JDBC like the reference's Oracle tables — declares
  * stages, their SQL, and their links; loading validates the DAG and
  * wires the runner; the chained pipeline then flows end-to-end.
  */
class TopologySpec extends SparkSpec {

  import spark.implicits._

  private def tmp(prefix: String): String =
    Files.createTempDirectory(prefix).toString

  private def configDf(rows: (String, String, String, String, String, String)*): DataFrame =
    rows.toSeq
      .toDF("stage", "input_dir", "format", "transform_sql", "output_dir", "downstream")
      .withColumn("downstream",
        org.apache.spark.sql.functions.when(
          org.apache.spark.sql.functions.col("downstream") === "", null)
          .otherwise(org.apache.spark.sql.functions.col("downstream")))

  test("a JDBC-loaded two-stage topology flows end-to-end through file handoff") {
    val in = tmp("topo_in"); val mid = tmp("topo_mid"); val out = tmp("topo_out")
    val ckpt = tmp("topo_ckpt")
    // seed the source dir so schema inference has something to read
    Seq((1L, "view", 10.0), (2L, "error", -1.0), (3L, "purchase", 30.0))
      .toDF("id", "event_type", "value").write.mode("overwrite").parquet(in)

    // the reference keeps topology in DB tables — round-trip ours over JDBC
    val dbDir = tmp("topo_derby")
    val url = s"jdbc:derby:$dbDir/topodb;create=true"
    val props = new java.util.Properties()
    props.setProperty("driver", "org.apache.derby.jdbc.EmbeddedDriver")
    configDf(
      ("clean", in, "parquet",
        s"SELECT id, event_type, value FROM ${Topology.InputView} WHERE value >= 0",
        mid, "score"),
      ("score", mid, "parquet",
        s"SELECT id, event_type, value * 2 AS scored FROM ${Topology.InputView}",
        out, ""))
      .write.mode("overwrite").jdbc(url, "m_topology", props)

    val runner = new PipelineRunner(spark)
    val order = Topology.load(spark,
      spark.read.jdbc(url, "m_topology", props), runner, ckpt)
    assert(order == Seq("clean", "score"))

    runner.start("clean")
    try {
      assert(eventually(20000) {
        spark.streams.active.filter(_.name == "clean").foreach(_.processAllAvailable())
        spark.read.parquet(mid).count() == 2 // error row filtered
      })
      runner.start("score")
      assert(eventually(20000) {
        spark.streams.active.filter(_.name == "score").foreach(_.processAllAvailable())
        scala.util.Try(spark.read.parquet(out).count()).getOrElse(0L) == 2L
      })
      val scored = spark.read.parquet(out).select("id", "scored")
        .collect().map(r => (r.getLong(0), r.getDouble(1))).toMap
      assert(scored == Map(1L -> 20.0, 3L -> 60.0))
    } finally runner.stopAll()
  }

  test("control-start of an unknown stage loads it from the config relation") {
    val in = tmp("topo_cs_in"); val out = tmp("topo_cs_out"); val ckpt = tmp("topo_cs_ckpt")
    Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("id", "tag")
      .write.mode("overwrite").parquet(in)
    val dbDir = tmp("topo_cs_derby")
    val url = s"jdbc:derby:$dbDir/topodb;create=true"
    val props = new java.util.Properties()
    props.setProperty("driver", "org.apache.derby.jdbc.EmbeddedDriver")
    configDf(("late_stage", in, "parquet",
      s"SELECT id, tag FROM ${Topology.InputView} WHERE id > 1", out, ""))
      .write.mode("overwrite").jdbc(url, "m_topology", props)

    val runner = new PipelineRunner(spark)
    // nothing loaded up front — the runner has never heard of late_stage
    Topology.wireControlStart(spark,
      () => spark.read.jdbc(url, "m_topology", props), runner, ckpt)
    assert(runner.registered.isEmpty)
    try {
      // the reference's m_HandleControlStart DB-reload path: a control
      // packet for an unknown id consults the config plane and starts it
      runner.control("s=late_stage\na=startsession")
      assert(runner.isRunning("late_stage"))
      assert(runner.registered == Seq("late_stage"))
      assert(eventually(20000) {
        spark.streams.active.filter(_.name == "late_stage").foreach(_.processAllAvailable())
        scala.util.Try(spark.read.parquet(out).count()).getOrElse(0L) == 2L
      })
    } finally runner.stopAll()
    // a stage in neither runner nor config still fails loudly
    intercept[IllegalArgumentException](runner.control("s=ghost\na=startsession"))
  }

  test("stage names that are not identifiers fail at parse, not at start") {
    val a = tmp("topo_id_a"); val b = tmp("topo_id_b")
    val sql = s"SELECT * FROM ${Topology.InputView}"
    val e = intercept[IllegalArgumentException](
      Topology.parse(configDf(("my-stage", a, "parquet", sql, b, ""))))
    assert(e.getMessage.contains("my-stage"))
  }

  test("validation rejects dangling links, handoff mismatch, dup names, cycles") {
    val a = tmp("topo_a"); val b = tmp("topo_b")
    def sql = s"SELECT * FROM ${Topology.InputView}"
    intercept[IllegalArgumentException] { // dangling downstream
      Topology.parse(configDf(("s1", a, "parquet", sql, b, "ghost")))
    }
    intercept[IllegalArgumentException] { // handoff dir mismatch
      Topology.parse(configDf(
        ("s1", a, "parquet", sql, b, "s2"),
        ("s2", tmp("topo_other"), "parquet", sql, tmp("topo_o2"), "")))
    }
    intercept[IllegalArgumentException] { // duplicate stage names
      Topology.parse(configDf(
        ("s1", a, "parquet", sql, b, ""),
        ("s1", a, "parquet", sql, b, "")))
    }
    val e = intercept[IllegalArgumentException] { // 2-cycle
      Topology.parse(configDf(
        ("s1", a, "parquet", sql, b, "s2"),
        ("s2", b, "parquet", sql, a, "s1")))
    }
    assert(e.getMessage.contains("cycle"))
    intercept[IllegalArgumentException] { // empty required field
      Topology.parse(configDf(("", a, "parquet", sql, b, "")))
    }
  }

  test("__input inside a string literal passes through unrewritten") {
    def rw(sql: String) =
      Topology.rewriteOutsideLiterals(sql, "__input", "stageA__input")
    // the table reference rewrites; the quoted literal does not
    assert(rw("SELECT '__input' AS tag, id FROM __input") ==
      "SELECT '__input' AS tag, id FROM stageA__input")
    // '' doubling escape: literal stays intact, reference still rewrites
    assert(rw("SELECT 'it''s __input here' AS t FROM __input") ==
      "SELECT 'it''s __input here' AS t FROM stageA__input")
    // backslash escape inside the literal does not end it early
    assert(rw("SELECT 'a\\'__input' AS t FROM __input") ==
      "SELECT 'a\\'__input' AS t FROM stageA__input")
    // word boundary still respected outside literals
    assert(rw("SELECT x__input2 FROM __input") ==
      "SELECT x__input2 FROM stageA__input")
    // unterminated literal (malformed SQL): no rewrite inside it, no crash
    assert(rw("SELECT '__input FROM __input") == "SELECT '__input FROM __input")
  }
}
