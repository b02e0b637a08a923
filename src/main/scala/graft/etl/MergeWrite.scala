package graft.etl

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Copy-on-write upsert and small-file compaction for partitioned parquet
  * — the lake side of the reference's update flows ([[JdbcUpsert]] is the
  * warehouse side; the reference merges CDR batches into Oracle,
  * `MFramework.cpp:1261-1302` stages them as files first).
  *
  * No table-format dependency: merged partition data is written to a
  * staging directory FIRST, then swapped into the base with directory
  * renames, so a concurrent reader never observes a half-written
  * partition and the job never reads and overwrites the same path (which
  * Spark refuses). Merge cost scales with the UPDATE footprint — only
  * partitions that updates touch are read and rewritten; at 100 TB an
  * upsert of one day's keys rewrites one day's partitions, never the
  * table. Renames are atomic on HDFS-like filesystems; on object stores
  * they are copies — front with a metastore/format commit there.
  */
object MergeWrite {

  /** Partitions swapped and the staging row count — the numbers an
    * orchestrator logs per merge commit. */
  final case class MergeStats(partitionsRewritten: Seq[String], rowsWritten: Long)

  /** Upsert `updates` into the partitioned parquet dataset at `basePath`:
    * base rows matching an update's `keyCols` are replaced, unmatched
    * update rows append, base partitions without updates are NOT touched
    * (their files keep their identity — no rewrite amplification).
    *
    * Keys are scoped within a partition: a key's partition value must be
    * stable across versions (the standard partitioned-upsert contract —
    * a key that "moves" partitions needs a delete in the old partition,
    * which this operator does not synthesize).
    */
  def merge(spark: SparkSession, basePath: String, updates: DataFrame,
      keyCols: Seq[String], partitionCol: String): MergeStats = {
    require(keyCols.nonEmpty, "at least one merge key required")
    require(!keyCols.contains(partitionCol),
      s"partition column $partitionCol cannot be a merge key")
    val fs = FileSystem.get(new Path(basePath).toUri, spark.sessionState.newHadoopConf())
    val base = new Path(basePath)
    val staging = new Path(basePath + s"_staging_${System.nanoTime()}")

    val touched = updates.select(col(partitionCol)).distinct()
      .collect().map(_.get(0)) // partition-count sized, never row-sized
    if (touched.isEmpty) return MergeStats(Seq.empty, 0L) // empty batch: no-op
    val merged =
      if (!fs.exists(base) || fs.listStatus(base).isEmpty) updates
      else {
        val current = spark.read.parquet(basePath)
          .filter(col(partitionCol).isin(touched.toIndexedSeq: _*)) // partition pruning
        current
          .join(updates.select(keyCols.map(col): _*).distinct(),
            keyCols, "left_anti")
          .unionByName(updates.select(current.columns.map(col): _*))
      }
    merged.write.mode("overwrite").partitionBy(partitionCol)
      .parquet(staging.toString)

    // swap: every staged <partitionCol>=<value> directory replaces its
    // base counterpart. Directory names come from what Spark actually
    // wrote (escaping included), never reconstructed.
    val stagedParts = fs.listStatus(staging)
      .filter(s => s.isDirectory && s.getPath.getName.startsWith(s"$partitionCol="))
    val swapped = stagedParts.map { part =>
      val target = new Path(base, part.getPath.getName)
      if (fs.exists(target)) fs.delete(target, true)
      if (!fs.exists(base)) fs.mkdirs(base)
      require(fs.rename(part.getPath, target),
        s"failed to swap partition ${part.getPath.getName}")
      part.getPath.getName
    }.toSeq.sorted
    val rows = spark.read.parquet(
      swapped.map(p => new Path(base, p).toString): _*).count()
    fs.delete(staging, true)
    MergeStats(swapped, rows)
  }

  /** A `foreachBatch` sink lifting [[merge]] into Structured Streaming:
    * each micro-batch upserts into the lake table. Idempotent under
    * batch replay only if the batch's keys are — pair with a batch
    * ledger (see [[JdbcUpsert]]) for exactly-once. */
  def sink(basePath: String, keyCols: Seq[String], partitionCol: String)
      : (DataFrame, Long) => Unit =
    (batch, _) => { merge(batch.sparkSession, basePath, batch, keyCols, partitionCol); () }

  /** Remove leftover staging directories from merges or compactions that
    * crashed between the staged write and the swap. Safe to run any time
    * — a LIVE staging dir belongs to an in-flight job, so only staging
    * siblings older than `olderThanMs` are deleted (default 1 h, far
    * beyond any swap window). Returns the deleted paths. */
  def vacuum(spark: SparkSession, basePath: String,
      olderThanMs: Long = 3600L * 1000): Seq[String] = {
    val base = new Path(basePath)
    val fs = FileSystem.get(base.toUri, spark.sessionState.newHadoopConf())
    val parent = base.getParent
    if (parent == null || !fs.exists(parent)) return Seq.empty
    val cutoff = System.currentTimeMillis() - olderThanMs
    fs.listStatus(parent)
      .filter(s => s.isDirectory &&
        (s.getPath.getName.startsWith(base.getName + "_staging_") ||
          s.getPath.getName.startsWith(base.getName + "_compact_")) &&
        s.getModificationTime < cutoff)
      .map { s => fs.delete(s.getPath, true); s.getPath.toString }
      .toSeq.sorted
  }

  /** Files and bytes before/after a compaction pass. */
  final case class CompactStats(filesBefore: Int, filesAfter: Int, bytes: Long)

  /** Rewrite the parquet files in ONE directory into
    * ceil(bytes/targetBytes) files — the periodic small-file compaction
    * every streaming ingest needs (thousands of micro-batch files make
    * scans task-bound, not byte-bound). `coalesce` packs existing
    * partitions without a shuffle; the swap is staged like [[merge]].
    * For a partitioned table, compact each partition directory — that
    * keeps the operation per-partition atomic and trivially parallel
    * across an orchestrator's workers. */
  def compact(spark: SparkSession, dir: String, targetBytes: Long): CompactStats = {
    require(targetBytes >= 1, s"targetBytes must be >= 1, got $targetBytes")
    val fs = FileSystem.get(new Path(dir).toUri, spark.sessionState.newHadoopConf())
    val d = new Path(dir)
    val files = fs.listStatus(d).filter(f => f.isFile && f.getPath.getName.endsWith(".parquet"))
    val bytes = files.map(_.getLen).sum
    val n = math.max(1L, (bytes + targetBytes - 1) / targetBytes).toInt
    if (files.length <= n) return CompactStats(files.length, files.length, bytes)

    val staging = new Path(dir + s"_compact_${System.nanoTime()}")
    spark.read.parquet(dir).coalesce(n)
      .write.mode("overwrite").parquet(staging.toString)
    files.foreach(f => fs.delete(f.getPath, false))
    val out = fs.listStatus(staging).filter(f => f.isFile && f.getPath.getName.endsWith(".parquet"))
    out.foreach(f => require(fs.rename(f.getPath, new Path(d, f.getPath.getName)),
      s"failed to move compacted file ${f.getPath}"))
    fs.delete(staging, true)
    CompactStats(files.length, out.length, bytes)
  }
}
