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
}
