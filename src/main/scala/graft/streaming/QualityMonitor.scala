package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.queries.CurationQ

/** Streaming QUALITY monitor — the per-micro-batch drift gate an
  * ingestion pipeline runs so a bad crawl push is caught while it
  * arrives, not at the next full-corpus audit.
  *
  * Per batch of (doc_id, text, …) rows it computes the quality card —
  * doc count, reject rate of [[CurationQ.curationVerdict]] in ppm, and
  * the per-reason breakdown from the verdict bitmask — compares against
  * a REFERENCE card (the accepted corpus profile, loaded once at start),
  * and appends one row per batch to `cardPath` with `alarm = true`
  * whenever the batch's reject rate drifts more than `maxDriftPpm` from
  * the reference. All integer-exact (counts, ppm) like the batch
  * operators the oracle pins.
  *
  * Idempotency: the card lands in a `batch_id=<id>` partition under
  * dynamic partition overwrite, so a retried micro-batch replaces its
  * own row — the [[graft.etl.IncrementalDedup.sink]] pattern.
  *
  * Scale: the verdict is a codegen'd scan over the batch; the card is
  * ONE row per batch; the reference is a one-row broadcast. Nothing in
  * the monitor grows with corpus size.
  *
  * Usage:
  * `docs.writeStream.foreachBatch(QualityMonitor.sink(spark, refCard, cards)).start()`
  */
object QualityMonitor {

  /** Quality card of a (static or micro-batch) document slice: one row —
    * n_docs, reject_ppm, and per-reason counts (bit 1 = too short,
    * 2 = low stopword ratio, 4 = repetitive, 8 = PII). */
  def card(docs: DataFrame): DataFrame =
    CurationQ.curationVerdict(docs)
      .agg(count(lit(1)).as("n_docs"),
        sum(when(col("keep") === 0L, 1L).otherwise(0L)).as("n_reject"),
        sum(expr("CASE WHEN (reason & 1) > 0 THEN 1 ELSE 0 END")).as("n_short"),
        sum(expr("CASE WHEN (reason & 2) > 0 THEN 1 ELSE 0 END")).as("n_lowstop"),
        sum(expr("CASE WHEN (reason & 4) > 0 THEN 1 ELSE 0 END")).as("n_repetitive"),
        sum(expr("CASE WHEN (reason & 8) > 0 THEN 1 ELSE 0 END")).as("n_pii"))
      .withColumn("reject_ppm", expr(
        "CASE WHEN n_docs = 0 THEN 0 ELSE (1000000 * n_reject) DIV n_docs END"))

  /** foreachBatch body: per batch, write its card + alarm verdict
    * against the reference reject rate. `refRejectPpm` is read from the
    * accepted-corpus card ONCE by the caller (a scalar, not a stream). */
  def sink(spark: SparkSession, refRejectPpm: Long, cardPath: String,
      maxDriftPpm: Long = 100000L): (DataFrame, Long) => Unit = {
    require(refRejectPpm >= 0 && refRejectPpm <= 1000000L,
      s"refRejectPpm must be a ppm, got $refRejectPpm")
    require(maxDriftPpm > 0, s"maxDriftPpm must be > 0, got $maxDriftPpm")
    (batch, batchId) =>
      card(batch)
        .withColumn("ref_ppm", lit(refRejectPpm))
        .withColumn("drift_ppm", abs(col("reject_ppm") - lit(refRejectPpm)))
        .withColumn("alarm", col("drift_ppm") > maxDriftPpm)
        .withColumn("batch_id", lit(batchId))
        .write.partitionBy("batch_id")
        .option("partitionOverwriteMode", "dynamic")
        .mode("overwrite").parquet(cardPath)
  }

  /** [[sink]] + per-batch NOVELTY against the corpus's incremental-dedup
    * signature store — the streaming form of the q146 novelty curve: a
    * re-crawl push that is 90% already-seen content has a perfect
    * quality profile, so reject-rate drift alone never alarms on it.
    * Per batch, the batch's docs near-dup-join the store
    * ([[graft.etl.IncrementalDedup.dedupDelta]] — work ∝ bucket
    * collisions, never corpus size), `novel_ppm = 10⁶ ·
    * (n_docs − n_dup) DIV n_docs`, and the alarm fires on reject drift
    * OR `novel_ppm < minNovelPpm`. The batch's signatures then append to
    * the store, so later batches measure novelty against this one too.
    *
    * Retry-safe like [[graft.etl.IncrementalDedup.sink]]: the store read
    * excludes the current batch's own (possibly half-written) partition,
    * and both the card and the signatures land under dynamic partition
    * overwrite in `batch_id=<id>` partitions. The only driver traffic is
    * the one duplicate-count scalar. */
  def sinkWithNovelty(spark: SparkSession, refRejectPpm: Long,
      cardPath: String, storePath: String, maxDriftPpm: Long = 100000L,
      minNovelPpm: Long = 500000L, minJaccard: Double = 0.25,
      maxBandSize: Int = 1000): (DataFrame, Long) => Unit = {
    require(refRejectPpm >= 0 && refRejectPpm <= 1000000L,
      s"refRejectPpm must be a ppm, got $refRejectPpm")
    require(maxDriftPpm > 0, s"maxDriftPpm must be > 0, got $maxDriftPpm")
    require(minNovelPpm >= 0 && minNovelPpm <= 1000000L,
      s"minNovelPpm must be a ppm, got $minNovelPpm")
    (batch, batchId) => {
      val b = batch.localCheckpoint() // three consumers: card, dedup, store
      val fs = new org.apache.hadoop.fs.Path(storePath)
        .getFileSystem(spark.sparkContext.hadoopConfiguration)
      val nDup =
        if (fs.exists(new org.apache.hadoop.fs.Path(storePath)))
          graft.etl.IncrementalDedup.dedupDelta(b,
              spark.read.parquet(storePath)
                .filter(col("batch_id") =!= batchId),
              minJaccard, maxBandSize)
            .select(col("new_id")).distinct().count()
        else 0L
      card(b)
        .withColumn("n_dup", lit(nDup))
        .withColumn("novel_ppm", expr(
          "CASE WHEN n_docs = 0 THEN 1000000 " +
            "ELSE (1000000 * (n_docs - n_dup)) DIV n_docs END"))
        .withColumn("ref_ppm", lit(refRejectPpm))
        .withColumn("drift_ppm", abs(col("reject_ppm") - lit(refRejectPpm)))
        .withColumn("alarm", col("drift_ppm") > maxDriftPpm ||
          col("novel_ppm") < minNovelPpm)
        .withColumn("batch_id", lit(batchId))
        .write.partitionBy("batch_id")
        .option("partitionOverwriteMode", "dynamic")
        .mode("overwrite").parquet(cardPath)
      graft.queries.TextQ.minhashBands(b).withColumn("batch_id", lit(batchId))
        .write.partitionBy("batch_id")
        .option("partitionOverwriteMode", "dynamic")
        .mode("overwrite").parquet(storePath)
    }
  }
}
