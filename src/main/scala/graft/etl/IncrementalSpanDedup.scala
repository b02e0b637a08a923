package graft.etl

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.queries.TextQ

/** Incremental SPAN-level dedup for an append-only corpus — the
  * substring analogue of [[IncrementalDedup]] (that store answers "is
  * this a near-duplicate DOCUMENT of history"; this one answers "which
  * PASSAGES of this document already exist anywhere in history", the
  * `TextQ.spanDuplication` signal without ever re-reading corpus text).
  *
  * The store keeps one 8-byte xxhash64 per DISTINCT `width`-token span —
  * proportional to corpus token count, the honest price of
  * substring-level dedup (a suffix-array index is the same order), but
  * text-free and append-only. A delta batch marks each of its spans
  * duplicated if the span's hash exists in the store OR occurs more than
  * once within the batch, then folds marks into per-doc covered-token
  * stats via the exact interval union shared with `spanDuplication`.
  *
  * Scale notes: the store↔delta membership probe is an equi-join on the
  * hash — at real scale write the store bucketed by `h`
  * (`Layout`-style `bucketBy`) so only the (small) delta side shuffles;
  * the store partition column (`batch_id`) is what makes streaming
  * retries idempotent, exactly as in [[IncrementalDedup]]. Hash
  * collisions (~2⁻⁶⁴ per pair) can only over-mark a span as duplicated —
  * the conservative direction for a trim/drop signal.
  */
object IncrementalSpanDedup {

  private def spanHashes(docs: DataFrame, width: Int): DataFrame =
    TextQ.spanRows(docs, width)
      .select(col("doc_id"), col("i"), xxhash64(col("span")).as("h"))

  /** Build (or rebuild) the span-hash store from a corpus slice
    * (bootstrap history lands in `batch_id=-1`). */
  def initStore(docs: DataFrame, storePath: String, width: Int = 8): Unit =
    spanHashes(docs, width).select(col("h")).distinct()
      .withColumn("batch_id", lit(-1L))
      .write.partitionBy("batch_id").mode("overwrite").parquet(storePath)

  /** Add a batch's distinct span hashes (call AFTER [[coverageDelta]] so
    * the batch does not match itself through the store). */
  def append(newDocs: DataFrame, storePath: String, width: Int = 8,
      batchId: Long = -1L): Unit =
    spanHashes(newDocs, width).select(col("h")).distinct()
      .withColumn("batch_id", lit(batchId))
      .write.partitionBy("batch_id").mode("append").parquet(storePath)

  /** Per-doc span-duplication stats of `newDocs` against ALL history in
    * the store plus within-batch repeats — same output shape as
    * `TextQ.spanDuplication` (n_toks, n_spans, n_dup_spans,
    * covered_tokens, dup_token_ratio). */
  def coverageDelta(spark: SparkSession, newDocs: DataFrame,
      storePath: String, width: Int = 8): DataFrame =
    coverageDelta(newDocs, spark.read.parquet(storePath), width)

  /** [[coverageDelta]] against an already-loaded (possibly pre-filtered)
    * store — the streaming path uses this to exclude a retried batch's
    * own half-written partition. */
  def coverageDelta(newDocs: DataFrame, store: DataFrame,
      width: Int): DataFrame =
    coverageDeltaFrom(newDocs, spanHashes(newDocs, width), store, width)

  /** [[coverageDelta]] over the PRE-BUILT span-hash rows of `newDocs` —
    * the [[sink]] seam (round-15): the batch's tokenize+span+hash pass
    * is computed once and shared with the store append. */
  private def coverageDeltaFrom(newDocs: DataFrame, sp: DataFrame,
      store: DataFrame, width: Int): DataFrame = {
    require(width >= 2, s"span width must be >= 2, got $width")
    val inStore = store.select(col("h")).distinct()
      .withColumn("in_store", lit(true))
    val marked = sp
      .join(inStore, Seq("h"), "left")
      .withColumn("dup",
        coalesce(col("in_store"), lit(false)) ||
          count(lit(1)).over(
            org.apache.spark.sql.expressions.Window.partitionBy(col("h"))) > 1)
    TextQ.withCoverageRatio(newDocs, TextQ.spanCoverage(marked, width))
  }

  /** Streaming composition mirroring [[IncrementalDedup.sink]]: per
    * micro-batch, write the batch's per-doc coverage against all prior
    * history to `coveragePath` and its distinct span hashes to the
    * store, both under dynamic partition overwrite in a
    * `batch_id=<id>` partition — a retried batch replaces its own
    * output and never self-matches through its half-written store
    * partition. */
  def sink(spark: SparkSession, storePath: String, coveragePath: String,
      width: Int = 8): (DataFrame, Long) => Unit =
    (batch, batchId) => {
      val fs = new org.apache.hadoop.fs.Path(storePath)
        .getFileSystem(spark.sparkContext.hadoopConfiguration)
      val hasHistory = fs.exists(new org.apache.hadoop.fs.Path(storePath))
      val store =
        if (hasHistory)
          spark.read.parquet(storePath).filter(col("batch_id") =!= batchId)
        else
          spark.createDataFrame(
            spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
            StructType(Seq(StructField("h", LongType))))
      // round-15: ONE tokenize+span+hash pass per micro-batch (lazy
      // checkpoint), shared by the coverage derivation and the append
      val sp = spanHashes(batch, width).localCheckpoint(false)
      coverageDeltaFrom(batch, sp, store, width)
        .withColumn("batch_id", lit(batchId))
        .write.partitionBy("batch_id")
        .option("partitionOverwriteMode", "dynamic")
        .mode("overwrite").parquet(coveragePath)
      sp.select(col("h")).distinct()
        .withColumn("batch_id", lit(batchId))
        .write.partitionBy("batch_id")
        .option("partitionOverwriteMode", "dynamic")
        .mode("overwrite").parquet(storePath)
    }
}
