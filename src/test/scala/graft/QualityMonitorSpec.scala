package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.streaming.QualityMonitor

/** Streaming quality monitor: per-batch cards, drift alarms, retry
  * idempotency. */
class QualityMonitorSpec extends SparkSpec {

  import spark.implicits._

  private val schema = StructType(Seq(
    StructField("doc_id", LongType), StructField("text", StringType)))

  // ≥20 tokens, stopword-bearing, shingle-distinct (no repetition bit)
  private def goodDoc(i: Long) = (i,
    "the quick data table joins a filter and the window sorts a merge " +
      "scan of the batch while a query groups the rows")
  private def badDoc(i: Long) = (i, "tiny")

  test("card computes integer reject rate and reason breakdown") {
    val docs = (Seq(goodDoc(1), goodDoc(2), goodDoc(3)) :+ badDoc(4))
      .toDF("doc_id", "text")
    val c = QualityMonitor.card(docs)
      .select("n_docs", "n_reject", "n_short", "reject_ppm")
      .as[(Long, Long, Long, Long)].head()
    assert(c == ((4L, 1L, 1L, 250000L)), c.toString)
  }

  test("streaming batches get cards; clean batches quiet, degraded batches alarm") {
    val src = Files.createTempDirectory("graft_qm_src").toString
    val ckpt = Files.createTempDirectory("graft_qm_ckpt").toString
    val cards = Files.createTempDirectory("graft_qm_cards").toString + "/cards"

    // batch 0: clean (reject 0) — matches the reference profile
    (1L to 8L).map(goodDoc).toDF("doc_id", "text")
      .write.mode("append").parquet(src)
    val q = spark.readStream.schema(schema).parquet(src)
      .writeStream
      .foreachBatch(QualityMonitor.sink(spark, refRejectPpm = 0L, cards,
        maxDriftPpm = 300000L))
      .option("checkpointLocation", ckpt)
      .trigger(graft.streaming.Triggers.microBatch("100 milliseconds"))
      .start()
    q.processAllAvailable()

    // batch 1: degraded push — half the docs are garbage
    ((9L to 12L).map(goodDoc) ++ (13L to 16L).map(badDoc))
      .toDF("doc_id", "text").write.mode("append").parquet(src)
    q.processAllAvailable()
    q.stop()

    val got = spark.read.parquet(cards)
      .select("batch_id", "n_docs", "reject_ppm", "alarm")
      .as[(Long, Long, Long, Boolean)].collect().sortBy(_._1)
    assert(got.length == 2, got.toSeq.toString)
    assert(got(0) == ((0L, 8L, 0L, false)), got.toSeq.toString)
    assert(got(1) == ((1L, 8L, 500000L, true)), got.toSeq.toString)
  }

  test("a replayed batch id overwrites its own card (retry idempotency)") {
    val cards = Files.createTempDirectory("graft_qm_retry").toString + "/cards"
    val sink = QualityMonitor.sink(spark, refRejectPpm = 0L, cards)
    val batch = (1L to 4L).map(goodDoc).toDF("doc_id", "text")
    sink(batch, 7L)
    sink(batch, 7L) // retry of the same micro-batch
    val rows = spark.read.parquet(cards)
    assert(rows.count() == 1, "retried batch must replace, not duplicate")
    assert(rows.select("batch_id").as[Long].head() == 7L)
  }

  test("sink validates its parameters") {
    intercept[IllegalArgumentException](
      QualityMonitor.sink(spark, refRejectPpm = 2000000L, "/tmp/x"))
    intercept[IllegalArgumentException](
      QualityMonitor.sink(spark, refRejectPpm = 0L, "/tmp/x", maxDriftPpm = 0L))
  }
}
