package graft.etl

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

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
  * Store layout is parquet partitioned by `batch_id` (bootstrap slices
  * land in `batch_id=-1`). The partition column is what makes the
  * streaming path idempotent: a retried micro-batch OVERWRITES its own
  * partition instead of duplicating signatures. At real scale,
  * additionally bucket the store by `bkey` so the delta join shuffles
  * only the (small) delta side.
  */
object IncrementalDedup {

  /** Build (or rebuild) the signature store from a corpus slice. */
  def initStore(docs: DataFrame, storePath: String): Unit =
    TextQ.minhashBands(docs).withColumn("batch_id", lit(-1L))
      .write.partitionBy("batch_id").mode("overwrite").parquet(storePath)

  /** Add a new batch's signatures to the store (call AFTER [[dedupDelta]]
    * so the batch does not match itself through the store). */
  def append(newDocs: DataFrame, storePath: String, batchId: Long = -1L): Unit =
    TextQ.minhashBands(newDocs).withColumn("batch_id", lit(batchId))
      .write.partitionBy("batch_id").mode("append").parquet(storePath)

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
      minJaccard: Double = 0.25, maxBandSize: Int = 1000): DataFrame =
    dedupDelta(newDocs, spark.read.parquet(storePath), minJaccard, maxBandSize)

  /** [[dedupDelta]] against an already-loaded (possibly pre-filtered)
    * store DataFrame — the streaming path uses this to exclude a retried
    * batch's own half-written partition. */
  def dedupDelta(newDocs: DataFrame, bands: DataFrame,
      minJaccard: Double, maxBandSize: Int): DataFrame =
    dedupDeltaBands(TextQ.minhashBands(newDocs), bands, minJaccard,
      maxBandSize)

  /** [[dedupDelta]] over PRE-BUILT delta band rows — the [[sink]] seam
    * (round-15): the micro-batch's shingle→signature pass is computed
    * once and shared with the store append instead of running twice. */
  private def dedupDeltaBands(newBands: DataFrame, bands: DataFrame,
      minJaccard: Double, maxBandSize: Int): DataFrame = {
    val hot = bands.groupBy(col("band"), col("bkey"))
      .agg(count(lit(1)).as("n")).filter(col("n") > maxBandSize)
      .select(col("band"), col("bkey"))
    val store = bands.join(broadcast(hot), Seq("band", "bkey"), "left_anti")
    newBands.as("x")
      .join(store.as("y"),
        col("x.band") === col("y.band") && col("x.bkey") === col("y.bkey"))
      .select(col("x.doc_id").as("new_id"), col("y.doc_id").as("corpus_id"),
        TextQ.laneAgreement.as("est_jaccard"))
      .distinct()
      .filter(col("est_jaccard") >= minJaccard)
  }

  private val candidateSchema = StructType(Seq(
    StructField("new_id", LongType), StructField("corpus_id", LongType),
    StructField("est_jaccard", DoubleType)))

  /** Streaming composition: a `foreachBatch` body that, per micro-batch
    * of (doc_id, text) rows, (1) writes the batch's near-dup candidates
    * against ALL corpus history into `candidatesPath` and (2) appends
    * the batch's signatures to the store. Both land in a
    * `batch_id=<id>` partition under dynamic partition overwrite, so a
    * RETRIED micro-batch replaces its own output instead of duplicating
    * it — and the store read excludes the retried batch's half-written
    * partition, so a retry can never self-match (the parquet analogue
    * of JdbcUpsert's batch ledger). The first batch against an empty
    * store emits an empty candidate partition; bootstrap history loaded
    * via [[initStore]] participates as `batch_id=-1`.
    *
    * Usage: `docs.writeStream.foreachBatch(IncrementalDedup.sink(spark,
    * store, cands)).start()`.
    */
  def sink(spark: SparkSession, storePath: String, candidatesPath: String,
      minJaccard: Double = 0.25, maxBandSize: Int = 1000): (DataFrame, Long) => Unit =
    (batch, batchId) => {
      val fs = new org.apache.hadoop.fs.Path(storePath)
        .getFileSystem(spark.sparkContext.hadoopConfiguration)
      val hasHistory = fs.exists(new org.apache.hadoop.fs.Path(storePath))
      // round-15: ONE shingle→signature pass per micro-batch (lazy
      // checkpoint), shared by the candidate derivation and the append
      val newBands = TextQ.minhashBands(batch).localCheckpoint(false)
      val cands =
        if (hasHistory)
          dedupDeltaBands(newBands,
            spark.read.parquet(storePath).filter(col("batch_id") =!= batchId),
            minJaccard, maxBandSize)
        else
          spark.createDataFrame(
            spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], candidateSchema)
      cands.withColumn("batch_id", lit(batchId))
        .write.partitionBy("batch_id")
        .option("partitionOverwriteMode", "dynamic")
        .mode("overwrite").parquet(candidatesPath)
      newBands.withColumn("batch_id", lit(batchId))
        .write.partitionBy("batch_id")
        .option("partitionOverwriteMode", "dynamic")
        .mode("overwrite").parquet(storePath)
    }
}
