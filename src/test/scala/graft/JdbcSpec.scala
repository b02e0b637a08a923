package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

/** JDBC source/sink (SURVEY §2B scans row; the reference's config plane is
  * Oracle tables read at boot, `MFramework.cpp:341-432`). Embedded Derby
  * stands in for Oracle: write the config dimension over JDBC, read it
  * back, broadcast-join it against facts — the reference's
  * config-lookup pattern end-to-end.
  */
class JdbcSpec extends SparkSpec {

  import spark.implicits._

  private lazy val url = {
    val dir = Files.createTempDirectory("graft_derby").toString
    s"jdbc:derby:$dir/configdb;create=true"
  }
  private val props = new java.util.Properties()
  props.setProperty("driver", "org.apache.derby.jdbc.EmbeddedDriver")

  test("config tables round-trip over JDBC and broadcast-join the facts") {
    // M_SYSTEM_SETTINGS-shaped config (MFramework.cpp:406-417)
    val settings = Seq(
      ("click", 1.0), ("error", 0.0), ("purchase", 5.0),
      ("signup", 2.0), ("view", 0.5))
      .toDF("event_type_key", "weight")
    settings.write.mode("overwrite").jdbc(url, "m_event_weights", props)

    val back = spark.read.jdbc(url, "m_event_weights", props)
    assert(back.count() == 5)
    assert(back.schema.fieldNames.map(_.toLowerCase).sorted
      .sameElements(Array("event_type_key", "weight")))

    val events = graft.core.Tables.load(spark, sfDir, "events")
    val joined = events
      .join(broadcast(back), col("event_type") === col("event_type_key"))
      .groupBy(col("event_type"))
      .agg(round(sum(col("value") * col("weight")), 2).as("weighted"))
    assert(joined.count() == 5)
    val plan = joined.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), plan)
    assert(plan.contains("JDBCRelation"), plan)
  }

  test("streaming foreachBatch upserts to JDBC exactly-once (replay-safe)") {
    import graft.etl.JdbcUpsert
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val ctx = spark.sqlContext
    val upsert = new JdbcUpsert(url, props,
      target = "rated_totals", staging = "rated_stage", ledger = "sink_ledger",
      keyCols = Seq("event_type"))
    val in = MemoryStream[(String, Double)]
    val agg = in.toDF().toDF("event_type", "value")
      .groupBy(col("event_type")).agg(sum(col("value")).as("total"))
    val q = agg.writeStream.outputMode("update")
      .foreachBatch(upsert.sink).start()
    def table() = spark.read.jdbc(url, "rated_totals", props)
      .as[(String, Double)].collect().toMap
    try {
      in.addData(("click", 1.0), ("click", 2.0), ("view", 5.0))
      q.processAllAvailable()
      assert(table() == Map("click" -> 3.0, "view" -> 5.0))
      // later batch updates an existing key (delete+insert, not append)
      in.addData(("click", 4.0))
      q.processAllAvailable()
      assert(table() == Map("click" -> 7.0, "view" -> 5.0))
    } finally q.stop()
    // crash-replay simulation: re-apply the last committed batch id with
    // stale data — the ledger makes it a no-op
    val staleReplay = Seq(("click", 999.0)).toDF("event_type", "total")
    val lastBatch = spark.read.jdbc(url, "sink_ledger", props)
      .agg(max(col("batch_id"))).head().getLong(0)
    upsert.sink(staleReplay, lastBatch)
    assert(table() == Map("click" -> 7.0, "view" -> 5.0),
      "replayed batch id must not re-apply")
    // a genuinely new batch id applies
    upsert.sink(Seq(("view", 6.0)).toDF("event_type", "total"), lastBatch + 1)
    assert(table() == Map("click" -> 7.0, "view" -> 6.0))
  }

  test("over-length strings truncate by default; strict mode names the column") {
    import graft.etl.JdbcUpsert
    val long = "x" * 40
    val batch = Seq(("k1", long), ("k2", "short")).toDF("k", "payload")

    // default: right-truncate — the batch applies instead of poisoning
    // every replay with a dialect write error
    val lax = new JdbcUpsert(url, props, target = "ovf_t", staging = "ovf_s",
      ledger = "ovf_ledger", keyCols = Seq("k"), maxStringLen = 16)
    lax.sink(batch, 0L)
    val got = spark.read.jdbc(url, "ovf_t", props)
      .as[(String, String)].collect().toMap
    assert(got("k1") == "x" * 16 && got("k2") == "short")

    // strict: fails fast, naming the offending column and observed width
    val strict = new JdbcUpsert(url, props, target = "ovf_t2", staging = "ovf_s2",
      ledger = "ovf_ledger2", keyCols = Seq("k"), maxStringLen = 16,
      truncateOverflow = false)
    val e = intercept[IllegalArgumentException](strict.sink(batch, 0L))
    assert(e.getMessage.contains("payload (max 40)"), e.getMessage)
  }

  test("ensureTables resolves schema-qualified and quoted table names") {
    import graft.etl.JdbcUpsert
    // APP is Derby's default schema — a qualified name must not break the
    // existence check (the unqualified lookup used to scan all schemas)
    val up = new JdbcUpsert(url, props, target = "APP.qual_t",
      staging = "qual_s", ledger = "\"qual_ledger\"", keyCols = Seq("k"))
    up.sink(Seq(("a", 1.0)).toDF("k", "total"), 0L)
    up.sink(Seq(("a", 2.0)).toDF("k", "total"), 1L) // second batch: tables exist
    val got = spark.read.jdbc(url, "APP.qual_t", props)
      .as[(String, Double)].collect().toMap
    assert(got == Map("a" -> 2.0))
  }

  test("predicate pushdown reaches the JDBC scan") {
    Seq((1, "a"), (2, "b"), (3, "c")).toDF("id", "v")
      .write.mode("overwrite").jdbc(url, "m_push", props)
    val df = spark.read.jdbc(url, "m_push", props).filter(col("id") > 1)
    assert(df.count() == 2)
    assert(df.queryExecution.executedPlan.toString.contains("PushedFilters"),
      df.queryExecution.executedPlan.toString)
  }
}
