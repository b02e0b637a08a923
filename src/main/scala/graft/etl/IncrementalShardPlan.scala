package graft.etl

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths, StandardCopyOption}

import org.apache.spark.sql.DataFrame

import graft.queries.CurationQ

/** Append-only output sharding — the incremental sibling of
  * [[graft.queries.CurationQ.planShards]] (q130), following the marker
  * protocol of [[IncrementalBatch]] (reference behavior:
  * `MFramework.cpp:821-903`'s resume-from-marker delta pattern): training
  * shards are written in waves as crawl drops land, already-written
  * shards are immutable, and each new batch must CONTINUE the global
  * token prefix exactly where the last wave stopped — the first docs of
  * wave N fill wave N−1's final partial shard before opening a new one,
  * so shard sizes stay within the budget bound across wave seams and no
  * shard is ever rewritten.
  *
  * The state is one number: the committed global token total. Each run
  * plans the new batch with `startTokens` = that total (the batch itself
  * still uses the decorrelating hash order within the wave), hands the
  * plan to `process` (the shard writer), then commits total + batch
  * tokens via temp-file + atomic rename — a torn state file is
  * impossible. Crash contract is [[IncrementalBatch]]'s at-least-once:
  * the commit happens AFTER `process` succeeds, so a crash replays the
  * same wave with the same offsets — pair with an idempotent
  * partitioned-overwrite sink keyed on shard_id for effective
  * exactly-once.
  *
  * Scale shape: identical to q130 per wave (map-side hash + bucket,
  * broadcast offset table, per-bucket cumsum windows) plus ONE scalar
  * aggregate for the batch token total; history is never re-read — cost
  * tracks the wave, not the corpus.
  */
object IncrementalShardPlan {

  /** Committed global token total; None before the first wave. */
  def tokenTotal(statePath: String): Option[Long] = {
    val f = Paths.get(statePath, "token_total")
    if (Files.exists(f))
      Some(new String(Files.readAllBytes(f), StandardCharsets.UTF_8)
        .trim.toLong)
    else None
  }

  private def commit(statePath: String, total: Long): Unit = {
    val dir = Paths.get(statePath)
    Files.createDirectories(dir)
    val tmp = dir.resolve(".token_total.tmp")
    Files.write(tmp, total.toString.getBytes(StandardCharsets.UTF_8))
    Files.move(tmp, dir.resolve("token_total"),
      StandardCopyOption.ATOMIC_MOVE, StandardCopyOption.REPLACE_EXISTING)
  }

  /** Streaming-ledger state: (batch_id, tokens before it, tokens after
    * it); None before the first committed micro-batch. */
  def batchState(statePath: String): Option[(Long, Long, Long)] = {
    val f = Paths.get(statePath, "batch_ledger")
    if (Files.exists(f)) {
      val parts = new String(Files.readAllBytes(f), StandardCharsets.UTF_8)
        .trim.split(",")
      Some((parts(0).toLong, parts(1).toLong, parts(2).toLong))
    } else None
  }

  private def commitBatch(statePath: String, id: Long, before: Long,
      after: Long): Unit = {
    val dir = Paths.get(statePath)
    Files.createDirectories(dir)
    val tmp = dir.resolve(".batch_ledger.tmp")
    Files.write(tmp, s"$id,$before,$after".getBytes(StandardCharsets.UTF_8))
    Files.move(tmp, dir.resolve("batch_ledger"),
      StandardCopyOption.ATOMIC_MOVE, StandardCopyOption.REPLACE_EXISTING)
  }

  /** `foreachBatch` shard writer — the streaming face of [[run]]: every
    * micro-batch continues the committed token prefix and lands as
    * parquet under `batch_id=N/shard_id=M` with dynamic partition
    * overwrite, so a RETRIED micro-batch replaces exactly its own
    * partitions (never a predecessor's rows in a shared seam shard) and
    * replays with the SAME start offset — the ledger records (batch_id,
    * tokens-before, tokens-after), and a repeated batch_id re-plans from
    * tokens-before instead of double-advancing. A shard's full content
    * is the union of its `shard_id=M` slices across batch dirs — shards
    * are append-defined across waves exactly as in [[run]].
    *
    * Usage: `docs.writeStream.foreachBatch(IncrementalShardPlan.sink(
    * tokenBudget, shardsPath, statePath)).start()`. */
  def sink(tokenBudget: Long, shardsPath: String, statePath: String,
      bucketWidth: Long = 100000L): (DataFrame, Long) => Unit =
    (batch, batchId) => {
      require(tokenBudget >= 1, s"tokenBudget must be >= 1, got $tokenBudget")
      val start = batchState(statePath) match {
        case Some((bid, before, _)) if bid == batchId => before // retry
        case Some((bid, _, after)) =>
          require(batchId > bid,
            s"batch $batchId arrived after committed batch $bid")
          after
        case None => 0L
      }
      val nRow = batch.selectExpr(
        "sum(CAST(size(split(text, ' ')) AS BIGINT)) AS n").head()
      if (!nRow.isNullAt(0)) {
        val waveTokens = nRow.getLong(0)
        val plan = CurationQ.planShards(batch, tokenBudget, bucketWidth,
          startTokens = start)
        batch.join(plan.select("doc_id", "shard_id"), "doc_id")
          .withColumn("batch_id", org.apache.spark.sql.functions.lit(batchId))
          .write.partitionBy("batch_id", "shard_id")
          .option("partitionOverwriteMode", "dynamic")
          .mode("overwrite").parquet(shardsPath)
        commitBatch(statePath, batchId, start, start + waveTokens)
      }
    }

  /** Plan one wave: shard-assign `batch` continuing from the committed
    * token total, hand (plan, firstShard) to `process`, then commit the
    * advanced total. Returns the new committed total, or the unchanged
    * prior total when the batch is empty (then `process` is not invoked
    * and the state file is untouched). `firstShard` is the id the wave
    * starts filling — usually the previous wave's final, partial shard. */
  def run(batch: DataFrame, tokenBudget: Long, statePath: String,
      bucketWidth: Long = 100000L)
      (process: (DataFrame, Long) => Unit): Long = {
    require(tokenBudget >= 1, s"tokenBudget must be >= 1, got $tokenBudget")
    val start = tokenTotal(statePath).getOrElse(0L)
    // one scalar aggregate over the wave (never the history)
    val nRow = batch.selectExpr(
      "sum(CAST(size(split(text, ' ')) AS BIGINT)) AS n").head()
    if (nRow.isNullAt(0)) start
    else {
      val waveTokens = nRow.getLong(0)
      val plan = CurationQ.planShards(batch, tokenBudget, bucketWidth,
        startTokens = start)
      process(plan, start / tokenBudget)
      val total = start + waveTokens
      commit(statePath, total)
      total
    }
  }
}
