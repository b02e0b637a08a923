package graft

import java.nio.file.Files

import graft.etl.IncrementalDedup

/** Signature-store incremental dedup: a delta batch finds its near-dups
  * against all of history via the band store, without re-reading corpus
  * text, and the store grows with appends.
  */
class IncrementalDedupSpec extends SparkSpec {

  import spark.implicits._

  private val corpusText1 =
    "alpha beta gamma delta epsilon zeta eta theta iota kappa"
  private val corpusText2 =
    "one two three four five six seven eight nine ten eleven"
  private val freshText =
    "crimson amber violet indigo teal maroon ochre cyan sepia jade"

  test("delta batch dedups against the store; appends extend history") {
    val store = Files.createTempDirectory("graft_sigstore").toString + "/bands"
    IncrementalDedup.initStore(
      Seq((1L, corpusText1), (2L, corpusText2)).toDF("doc_id", "text"), store)
    assert(spark.read.parquet(store).count() == 8) // 4 band rows per doc

    // delta A: doc 10 duplicates corpus doc 1; doc 11 is genuinely new
    val deltaA = Seq((10L, corpusText1), (11L, freshText)).toDF("doc_id", "text")
    val hitsA = IncrementalDedup.dedupDelta(spark, deltaA, store)
      .select("new_id", "corpus_id", "est_jaccard")
      .as[(Long, Long, Double)].collect().sortBy(_._1)
    assert(hitsA.toSeq == Seq((10L, 1L, 1.0)), hitsA.toSeq.toString)

    // history grows: after appending delta A, a copy of doc 11 is caught
    IncrementalDedup.append(deltaA, store)
    val deltaB = Seq((20L, freshText)).toDF("doc_id", "text")
    val hitsB = IncrementalDedup.dedupDelta(spark, deltaB, store)
      .select("new_id", "corpus_id").as[(Long, Long)].collect().sortBy(_._2)
    assert(hitsB.toSeq == Seq((20L, 11L)), hitsB.toSeq.toString)
    assert(spark.read.parquet(store).count() == 16)
  }

  test("degenerate store buckets are excluded by the band-size guard") {
    val store = Files.createTempDirectory("graft_sigstore_skew").toString + "/bands"
    // 30 identical corpus docs collapse into the same band keys
    val poisoned = (1L to 30L).map(i => (i, corpusText1)).toDF("doc_id", "text")
    IncrementalDedup.initStore(poisoned, store)
    val delta = Seq((100L, corpusText1)).toDF("doc_id", "text")
    // cap below the bucket size: the hot bucket contributes no pairs...
    assert(IncrementalDedup.dedupDelta(spark, delta, store, maxBandSize = 10)
      .count() == 0)
    // ...while the default cap finds all 30 duplicates
    assert(IncrementalDedup.dedupDelta(spark, delta, store).count() == 30)
  }

  test("delta dedup never window-shuffles the store side") {
    val store = Files.createTempDirectory("graft_sigstore_plan").toString + "/bands"
    IncrementalDedup.initStore(
      Seq((1L, corpusText1), (2L, corpusText2)).toDF("doc_id", "text"), store)
    val plan = IncrementalDedup.dedupDelta(spark,
        Seq((9L, corpusText1)).toDF("doc_id", "text"), store)
      .queryExecution.executedPlan.toString
    // the skew guard must be an aggregate + anti-join, not a Window over
    // (band, bkey) — a window would sort the whole store every batch
    assert(!plan.contains("Window"), plan)
  }

  test("streaming sink dedups each batch against history; retries are idempotent") {
    implicit val ctx = spark.sqlContext
    val root = Files.createTempDirectory("graft_sigstream").toString
    val (store, cands) = (s"$root/bands", s"$root/cands")
    val sink = IncrementalDedup.sink(spark, store, cands, minJaccard = 0.5)
    val in = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[(Long, String)]
    val q = in.toDF().toDF("doc_id", "text")
      .writeStream.foreachBatch(sink)
      .option("checkpointLocation", s"$root/ckpt").start()
    try {
      // batch 0: two fresh docs — no history, so the candidate output has
      // no data files yet (an empty DF under dynamic partition overwrite
      // touches no partition)
      in.addData((1L, corpusText1), (2L, corpusText2))
      q.processAllAvailable()
      val candFiles = new java.io.File(cands)
      assert(!candFiles.exists() ||
        candFiles.listFiles().forall(f => !f.getName.startsWith("batch_id=")))
      // batch 1: doc 10 duplicates doc 1 from batch 0; doc 11 is new
      in.addData((10L, corpusText1), (11L, freshText))
      q.processAllAvailable()
      val hits = spark.read.parquet(cands)
        .select("new_id", "corpus_id").as[(Long, Long)].collect()
      assert(hits.toSeq == Seq((10L, 1L)), hits.toSeq.toString)
      assert(spark.read.parquet(store).count() == 16)
    } finally q.stop()
    // simulate a RETRY of batch 1 (foreachBatch redelivery after a crash):
    // same data, same batch id — output must be byte-identical, with no
    // self-matches through the batch's own half-written store partition
    sink(Seq((10L, corpusText1), (11L, freshText)).toDF("doc_id", "text"), 1L)
    val after = spark.read.parquet(cands)
      .select("new_id", "corpus_id").as[(Long, Long)].collect()
    assert(after.toSeq == Seq((10L, 1L)), after.toSeq.toString)
    assert(spark.read.parquet(store).count() == 16)
  }
}
