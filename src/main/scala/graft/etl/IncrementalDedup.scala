package graft.etl

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.queries.TextQ

/** Incremental near-duplicate detection for an append-only corpus — the
  * shape ingestion actually has at 100 TB. Re-running full-corpus dedup
  * per arriving batch is quadratic in corpus size over time; instead the
  * corpus keeps a SIGNATURE STORE (MinHash band rows — tens of bytes per
  * document, ~10⁴× smaller than text), and a delta batch dedups against
  * all of history by joining its band rows against the store: candidates
  * share a (band, bkey) bucket, so work is proportional to collisions,
  * never to corpus size, and corpus TEXT is never re-read.
  *
  * Store layout is plain parquet. At real scale, bucket it by `bkey` so
  * the delta join shuffles only the (small) delta side; the store is
  * append-only, so [[append]] composes with streaming `foreachBatch`.
  */
object IncrementalDedup {

  /** Build (or rebuild) the signature store from a corpus slice. */
  def initStore(docs: DataFrame, storePath: String): Unit =
    TextQ.minhashBands(docs)
      .write.mode("overwrite").parquet(storePath)

  /** Add a new batch's signatures to the store (call AFTER [[dedupDelta]]
    * so the batch does not match itself through the store). */
  def append(newDocs: DataFrame, storePath: String): Unit =
    TextQ.minhashBands(newDocs)
      .write.mode("append").parquet(storePath)

  /** Near-dup candidates of `newDocs` against everything in the store:
    * (new_id, corpus_id, est_jaccard) with est_jaccard from the 8
    * signature lanes carried on the band rows — no join back to any
    * signature table. The store side streams from parquet; only band
    * rows sharing a bucket with the delta ever pair, and store band
    * keys shared by more than `maxBandSize` docs are excluded (the same
    * degenerate-boilerplate guard as `TextQ.lshCandidates` — one hot
    * bucket would otherwise pair every matching delta doc against
    * millions of store rows). The guard is an aggregate + broadcast
    * anti-join, NOT a window: a window over (band, bkey) would force a
    * full-store shuffle+sort per delta batch, while the aggregate is a
    * map-side partial count whose hot-key output is tiny — the store
    * itself never shuffles, keeping delta cost ∝ collisions. */
  def dedupDelta(spark: SparkSession, newDocs: DataFrame, storePath: String,
      minJaccard: Double = 0.25, maxBandSize: Int = 1000): DataFrame = {
    val bands = spark.read.parquet(storePath)
    val hot = bands.groupBy(col("band"), col("bkey"))
      .agg(count(lit(1)).as("n")).filter(col("n") > maxBandSize)
      .select(col("band"), col("bkey"))
    val store = bands.join(broadcast(hot), Seq("band", "bkey"), "left_anti")
    TextQ.minhashBands(newDocs).as("x")
      .join(store.as("y"),
        col("x.band") === col("y.band") && col("x.bkey") === col("y.bkey"))
      .select(col("x.doc_id").as("new_id"), col("y.doc_id").as("corpus_id"),
        TextQ.laneAgreement.as("est_jaccard"))
      .distinct()
      .filter(col("est_jaccard") >= minJaccard)
  }
}
