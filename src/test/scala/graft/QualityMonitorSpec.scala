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
    intercept[IllegalArgumentException](
      QualityMonitor.sinkWithNovelty(spark, 0L, "/tmp/x", "/tmp/y",
        minNovelPpm = 2000000L))
  }

  // quality-passing text that is shingle-DISTINCT per seed (every
  // shingle carries a seed token, so different seeds share ~nothing)
  private def distinctDoc(id: Long, seed: Long) = (id,
    s"the alpha$seed beta$seed gamma$seed delta$seed and a epsilon$seed " +
      s"zeta$seed eta$seed theta$seed of the iota$seed kappa$seed " +
      s"lambda$seed mu$seed with some nu$seed xi$seed omicron$seed pi$seed")

  test("novelty sink: a 90%-duplicate re-push alarms, fresh batches stay quiet") {
    val base = Files.createTempDirectory("graft_qm_novel").toString
    val cards = base + "/cards"; val store = base + "/store"
    val sink = QualityMonitor.sinkWithNovelty(spark, refRejectPpm = 0L,
      cards, store, maxDriftPpm = 300000L, minNovelPpm = 500000L)

    // batch 0: ten fresh docs against an empty store — fully novel
    sink((1L to 10L).map(i => distinctDoc(i, i)).toDF("doc_id", "text"), 0L)
    // batch 1: re-push — 9 of 10 docs repeat batch 0's CONTENT under new
    // doc_ids (the re-crawl shape), 1 genuinely new. Quality is perfect,
    // so only the novelty signal can catch it.
    sink(((101L to 109L).map(i => distinctDoc(i, i - 100L)) :+
      distinctDoc(110L, 900L)).toDF("doc_id", "text"), 1L)
    // batch 2: ten fresh docs — novel again (measured against batches 0+1)
    sink((21L to 30L).map(i => distinctDoc(i, i + 500L)).toDF("doc_id", "text"), 2L)

    val got = spark.read.parquet(cards)
      .select("batch_id", "n_docs", "n_dup", "novel_ppm", "alarm")
      .as[(Long, Long, Long, Long, Boolean)].collect().sortBy(_._1)
    assert(got.length == 3, got.toSeq.toString)
    assert(got(0) == ((0L, 10L, 0L, 1000000L, false)), got.toSeq.toString)
    assert(got(1) == ((1L, 10L, 9L, 100000L, true)), got.toSeq.toString)
    assert(got(2) == ((2L, 10L, 0L, 1000000L, false)), got.toSeq.toString)
  }

  test("novelty sink retry: a replayed batch never self-matches") {
    val base = Files.createTempDirectory("graft_qm_novel_retry").toString
    val cards = base + "/cards"; val store = base + "/store"
    val sink = QualityMonitor.sinkWithNovelty(spark, refRejectPpm = 0L,
      cards, store)
    val batch = (1L to 5L).map(i => distinctDoc(i, i)).toDF("doc_id", "text")
    sink(batch, 3L)
    sink(batch, 3L) // retry: store already holds batch 3's signatures
    val got = spark.read.parquet(cards)
      .select("batch_id", "n_dup", "novel_ppm", "alarm")
      .as[(Long, Long, Long, Boolean)].collect()
    assert(got.length == 1, "retried batch must replace its card")
    assert(got.head == ((3L, 0L, 1000000L, false)),
      s"retry must not count its own half-written signatures: ${got.head}")
  }
}
