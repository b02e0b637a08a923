package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

import graft.streaming.{HardenedIngest, LiveRatingChain, PipelineRunner}

/** The hardened ingest: content-hash re-delivery dedup (the same CDR
  * batch landing under a NEW name must not double-bill) and the live
  * profile-drift gate (a schema-drifted wave fails loudly BEFORE it
  * pollutes the legs store).
  */
class HardenedIngestSpec extends SparkSpec {

  import spark.implicits._

  private val tiers = Seq((0L, 100L, 5L), (100L, 300L, 3L),
    (300L, Long.MaxValue, 1L))

  private def writeCsv(path: String, rows: Seq[String]): Unit = {
    Files.createDirectories(Paths.get(path).getParent)
    Files.write(Paths.get(path),
      ("call_id,seq,total,duration_sec" +: rows).mkString("\n")
        .getBytes("UTF-8"))
  }

  private def withRocks[A](f: => A): A = {
    val prior = spark.conf.getOption("spark.sql.streaming.stateStore.providerClass")
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try f finally prior match {
      case Some(v) =>
        spark.conf.set("spark.sql.streaming.stateStore.providerClass", v)
      case None =>
        spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
    }
  }

  test("a re-delivered file under a new name does not double-bill") {
    withRocks {
      val base = Files.createTempDirectory("graft_hardened").toString
      val runner = new PipelineRunner(spark)
      try {
        writeCsv(s"$base/inbox/w1.csv", Seq(
          "1:101,1,1,100.0", "2:201,1,1,250.0"))
        val ss = HardenedIngest.stages(spark, s"$base/inbox",
          s"$base/legs", s"$base/ledger", s"$base/calls", s"$base/rated",
          s"$base/ckpt", tiers)
        ss.foreach(runner.register)
        val qs = ss.map(s => runner.start(s.name))
        qs.foreach(_.processAllAvailable())
        def invoice() = spark.read.parquet(s"$base/rated")
          .groupBy(col("account_id").cast(LongType).as("a"))
          .agg(sum(col("charge_centi")).as("c"))
          .as[(Long, Long)].collect().toMap
        val first = invoice()
        assert(first == Map(1L -> 500L, 2L -> 950L), first.toString)

        // the classic duplicate-batch failure: SAME content, NEW name —
        // the path-keyed file source would re-bill; the digest must not
        writeCsv(s"$base/inbox/retry_0712.csv", Seq(
          "1:101,1,1,100.0", "2:201,1,1,250.0"))
        qs.foreach(_.processAllAvailable())
        assert(invoice() == first, s"double-billed: ${invoice()} vs $first")

        // genuinely NEW content still flows (the dedup keys on content,
        // not on having seen a batch before)
        writeCsv(s"$base/inbox/w2.csv", Seq("1:102,1,1,50.0"))
        qs.foreach(_.processAllAvailable())
        // acct 1: T(150) - T(100) = 150
        assert(invoice() == Map(1L -> 650L, 2L -> 950L), invoice().toString)
      } finally runner.stopAll()
    }
  }

  test("two identical files inside one micro-batch bill once") {
    withRocks {
      val base = Files.createTempDirectory("graft_hardened2").toString
      val runner = new PipelineRunner(spark)
      try {
        // same content, two names, one wave — intra-batch collapse
        writeCsv(s"$base/inbox/a.csv", Seq("5:501,1,1,100.0"))
        writeCsv(s"$base/inbox/b.csv", Seq("5:501,1,1,100.0"))
        val ss = HardenedIngest.stages(spark, s"$base/inbox",
          s"$base/legs", s"$base/ledger", s"$base/calls", s"$base/rated",
          s"$base/ckpt", tiers)
        ss.foreach(runner.register)
        val qs = ss.map(s => runner.start(s.name))
        qs.foreach(_.processAllAvailable())
        val legs = spark.read.schema(HardenedIngest.hardenedLegsSchema)
          .parquet(s"$base/legs")
        assert(legs.count() == 1, "intra-batch duplicate file not collapsed")
        assert(spark.read.parquet(s"$base/rated").count() == 1)
      } finally runner.stopAll()
    }
  }

  test("a replayed micro-batch reproduces its writes instead of doubling them") {
    // simulate the crash-between-ledger-write-and-checkpoint-commit
    // replay by driving writeBatch twice with the same batch id
    val base = Files.createTempDirectory("graft_hardened3").toString
    val batch = Seq(("7:701", 1, 1, 10.0, s"$base/inbox/w1.csv", true))
      .toDF("call_id", "seq", "total", "duration_sec", "__src", "valid")
    HardenedIngest.writeBatch(spark, batch, 0L, s"$base/legs",
      s"$base/ledger", None)
    HardenedIngest.writeBatch(spark, batch, 0L, s"$base/legs",
      s"$base/ledger", None)
    assert(spark.read.schema(HardenedIngest.hardenedLegsSchema)
      .parquet(s"$base/legs").count() == 1)
    assert(spark.read.parquet(s"$base/ledger").count() == 1)
  }

  test("a schema-drifted wave trips the gate before polluting the store") {
    withRocks {
      val base = Files.createTempDirectory("graft_driftgate").toString
      val runner = new PipelineRunner(spark)
      try {
        val gate = Some(HardenedIngest.DriftGate(s"$base/refprofile",
          Seq("call_id", "seq", "total", "duration_sec"),
          maxNullDriftPpm = 200000L))
        writeCsv(s"$base/inbox/w1.csv", Seq(
          "1:101,1,1,100.0", "2:201,1,1,250.0"))
        val ss = HardenedIngest.stages(spark, s"$base/inbox",
          s"$base/legs", s"$base/ledger", s"$base/calls", s"$base/rated",
          s"$base/ckpt", tiers, gate = gate)
        ss.foreach(runner.register)
        val qs = ss.map(s => runner.start(s.name))
        qs.foreach(_.processAllAvailable())
        assert(spark.read.parquet(s"$base/rated").count() == 2)

        // the broken-extractor wave: duration_sec 100% null (vs 0 in
        // the bootstrapped reference) — an upstream break, not per-row
        // garbage; it must fail the QUERY, not dead-letter quietly
        writeCsv(s"$base/inbox/w2.csv", Seq(
          "1:102,1,1,", "2:202,1,1,", "3:301,1,1,"))
        val e = intercept[Exception] {
          spark.streams.active.find(_.name == "cdr_ingest")
            .get.processAllAvailable()
        }
        assert(String.valueOf(e.getMessage).contains("drift gate tripped")
          || String.valueOf(e.getCause).contains("drift gate tripped"),
          e.toString)
        // nothing from the drifted wave reached the store — not even as
        // dead letters
        assert(spark.read.schema(HardenedIngest.hardenedLegsSchema)
          .parquet(s"$base/legs").count() == 2)
      } finally runner.stopAll()
    }
  }
}
