package graft.etl

import org.apache.hadoop.fs.{FileStatus, FileSystem, Path}
import org.apache.spark.sql.{DataFrame, Observation, SparkSession}
import org.apache.spark.sql.functions._

/** Copy-on-write upsert and small-file compaction for partitioned parquet
  * — the lake side of the reference's update flows ([[JdbcUpsert]] is the
  * warehouse side; the reference merges CDR batches into Oracle,
  * `MFramework.cpp:1261-1302` stages them as files first).
  *
  * No table-format dependency. The commit protocol is staged and
  * CRASH-RECOVERABLE under the module's single-writer-per-table contract:
  *
  *  1. the merged/compacted data is fully written to a DOT-PREFIXED
  *     staging sibling (`.<base>_staging_*` / `.<dir>_compact_*` — the
  *     leading dot keeps Spark's file/partition discovery from ever
  *     reading staging as data, even when the sibling sits inside a
  *     partitioned table directory); Spark's committer drops `_SUCCESS`
  *     when — and only when — the staged copy is complete;
  *  2. the swap replaces each target directory by delete+rename (renames
  *     are metadata operations on HDFS-like filesystems; object stores
  *     copy — front with a metastore/format commit there);
  *  3. the staging dir is removed.
  *
  * Crash recovery runs at the START of every [[merge]]/[[compact]] on the
  * same path — single-writer means any leftover is a past crash, so a
  * `_SUCCESS`-marked leftover has its swap completed (oldest first) and
  * an unmarked one is reaped BEFORE new work reads the base. That
  * ordering is what keeps "staging is authoritative" true: a leftover
  * can never linger across later successful commits and then clobber
  * them. [[vacuum]] does the same for tables nobody writes anymore,
  * guarded by an age window. A reader overlapping step 2 sees the old or
  * the new partition, or — for the sub-second delete→rename window — a
  * missing one; closing that last window needs a commit log (a table
  * format), which is out of scope and documented honestly here.
  *
  * Merge cost scales with the UPDATE footprint — only partitions that
  * updates touch are read and rewritten; at 100 TB an upsert of one
  * day's keys rewrites one day's partitions, never the table.
  */
object MergeWrite {

  /** Partitions swapped and the staging row count — the numbers an
    * orchestrator logs per merge commit. */
  final case class MergeStats(partitionsRewritten: Seq[String], rowsWritten: Long)

  private def fsFor(spark: SparkSession, p: Path): FileSystem =
    FileSystem.get(p.toUri, spark.sessionState.newHadoopConf())

  private def stagingName(base: Path, kind: String): Path =
    new Path(base.getParent, s".${base.getName}_${kind}_${System.nanoTime()}")

  /** Move every staged child directory (the partition dirs) over its
    * same-named child under `base`. Idempotent: re-applying after a
    * partial swap skips the children already moved. */
  private def applyPartitionSwap(fs: FileSystem, staging: Path, base: Path): Seq[String] = {
    if (!fs.exists(base)) fs.mkdirs(base)
    fs.listStatus(staging).filter(_.isDirectory).map { part =>
      val target = new Path(base, part.getPath.getName)
      if (fs.exists(target)) fs.delete(target, true)
      require(fs.rename(part.getPath, target),
        s"failed to swap partition ${part.getPath.getName}")
      part.getPath.getName
    }.toSeq.sorted
  }

  /** Leftover staging siblings of `base`, oldest first. */
  private def leftoversOf(fs: FileSystem, base: Path): Seq[FileStatus] = {
    val parent = base.getParent
    if (parent == null || !fs.exists(parent)) return Seq.empty
    fs.listStatus(parent)
      .filter(s => s.isDirectory &&
        (s.getPath.getName.startsWith(s".${base.getName}_staging_") ||
          s.getPath.getName.startsWith(s".${base.getName}_compact_")))
      .sortBy(_.getModificationTime)
      .toSeq
  }

  /** Complete (`_SUCCESS` present) or reap (absent) one leftover.
    * Returns true when the leftover was recovered, false when reaped. */
  private def recoverOrReap(fs: FileSystem, base: Path, s: FileStatus): Boolean = {
    val complete = fs.exists(new Path(s.getPath, "_SUCCESS"))
    if (complete) {
      if (s.getPath.getName.startsWith(s".${base.getName}_compact_")) {
        if (fs.exists(base)) fs.delete(base, true)
        require(fs.rename(s.getPath, base), s"failed to recover ${s.getPath}")
      } else {
        applyPartitionSwap(fs, s.getPath, base)
        fs.delete(s.getPath, true)
      }
    } else fs.delete(s.getPath, true)
    complete
  }

  /** Upsert `updates` into the partitioned parquet dataset at `basePath`:
    * base rows matching an update's `keyCols` are replaced, unmatched
    * update rows append, base partitions without updates are NOT touched
    * (their files keep their identity — no rewrite amplification). Any
    * leftover from a previously crashed commit is recovered first.
    *
    * Keys are scoped within a partition: a key's partition value must be
    * stable across versions (the standard partitioned-upsert contract —
    * a key that "moves" partitions needs a delete in the old partition,
    * which this operator does not synthesize). A null partition value is
    * a partition like any other (Hive default-partition layout).
    */
  def merge(spark: SparkSession, basePath: String, updates: DataFrame,
      keyCols: Seq[String], partitionCol: String): MergeStats = {
    require(keyCols.nonEmpty, "at least one merge key required")
    require(!keyCols.contains(partitionCol),
      s"partition column $partitionCol cannot be a merge key")
    val base = new Path(basePath)
    val fs = fsFor(spark, base)
    leftoversOf(fs, base).foreach(recoverOrReap(fs, base, _)) // crash recovery
    val staging = stagingName(base, "staging")

    val touched = updates.select(col(partitionCol)).distinct()
      .collect().map(_.get(0)) // partition-count sized, never row-sized
    if (touched.isEmpty) return MergeStats(Seq.empty, 0L) // empty batch: no-op
    val merged =
      if (!fs.exists(base) || fs.listStatus(base).isEmpty) updates
      else {
        val nonNull = touched.filter(_ != null).toIndexedSeq
        // isin() never matches null — a null-partition update must still
        // pull the existing null-partition rows into the merge
        val touchedPred =
          if (!touched.contains(null)) col(partitionCol).isin(nonNull: _*)
          else if (nonNull.isEmpty) col(partitionCol).isNull
          else col(partitionCol).isin(nonNull: _*) || col(partitionCol).isNull
        val current = spark.read.parquet(basePath).filter(touchedPred) // partition pruning
        current
          .join(updates.select(keyCols.map(col): _*).distinct(),
            keyCols, "left_anti")
          .unionByName(updates.select(current.columns.map(col): _*))
      }
    // row count rides the staged write as an Observation — no second scan
    val obs = Observation(s"merge_${System.nanoTime()}")
    merged.observe(obs, count(lit(1)).as("rows"))
      .write.mode("overwrite").partitionBy(partitionCol)
      .parquet(staging.toString)
    val rows = obs.get("rows").asInstanceOf[Long]

    val swapped = applyPartitionSwap(fs, staging, base)
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

  /** What [[vacuum]] did with each leftover staging dir. */
  final case class VacuumStats(recovered: Seq[String], deleted: Seq[String])

  /** Reap or RECOVER leftover staging directories of a table no writer
    * is expected to touch again (active tables recover themselves at the
    * start of each [[merge]]/[[compact]]).
    *
    * A stale leftover carrying `_SUCCESS` is a completed write whose
    * swap crashed: its swap is re-applied, oldest first (deleting it
    * would lose the only copy of a swapped-out partition). A stale dir
    * without the marker is an aborted write and is deleted.
    *
    * Staleness uses the newest modification time across the dir and its
    * direct children, so a long-running staged write keeps refreshing its
    * own liveness; `olderThanMs` (default 1 h) must still exceed any gap
    * between the job's directory touches. */
  def vacuum(spark: SparkSession, basePath: String,
      olderThanMs: Long = 3600L * 1000): VacuumStats = {
    val base = new Path(basePath)
    val fs = fsFor(spark, base)
    val cutoff = System.currentTimeMillis() - olderThanMs
    def lastTouched(s: FileStatus): Long =
      (s.getModificationTime +: fs.listStatus(s.getPath).map(_.getModificationTime).toSeq).max
    val stale = leftoversOf(fs, base).filter(lastTouched(_) < cutoff)
    val (recovered, deleted) = stale.partition(recoverOrReap(fs, base, _))
    VacuumStats(recovered.map(_.getPath.toString).sorted,
      deleted.map(_.getPath.toString).sorted)
  }

  /** Files and bytes before/after a compaction pass. */
  final case class CompactStats(filesBefore: Int, filesAfter: Int, bytes: Long)

  /** Rewrite the parquet files in ONE directory into
    * ceil(bytes/targetBytes) files — the periodic small-file compaction
    * every streaming ingest needs (thousands of micro-batch files make
    * scans task-bound, not byte-bound). `coalesce` packs existing
    * partitions without a shuffle; the swap follows the staged protocol
    * above (whole-directory replacement — one delete + one rename,
    * recovered on the next call or by [[vacuum]] after a crash).
    *
    * The directory is treated as pure parquet data: its replacement
    * holds the compacted files (plus Spark's `_SUCCESS`), so sidecar
    * files a table FORMAT would track (manifests, checksums) do not
    * survive — formatless layouts have none, formats bring their own
    * compaction. For a partitioned table, compact each partition
    * directory — per-partition atomic, trivially parallel across an
    * orchestrator's workers, and the dot-prefixed staging sibling stays
    * invisible to partition discovery meanwhile. */
  def compact(spark: SparkSession, dir: String, targetBytes: Long): CompactStats = {
    require(targetBytes >= 1, s"targetBytes must be >= 1, got $targetBytes")
    val d = new Path(dir)
    val fs = fsFor(spark, d)
    leftoversOf(fs, d).foreach(recoverOrReap(fs, d, _)) // crash recovery
    val files = fs.listStatus(d).filter(f => f.isFile && f.getPath.getName.endsWith(".parquet"))
    val bytes = files.map(_.getLen).sum
    val n = math.max(1L, (bytes + targetBytes - 1) / targetBytes).toInt
    if (files.length <= n) return CompactStats(files.length, files.length, bytes)

    val staging = stagingName(d, "compact")
    spark.read.parquet(dir).coalesce(n)
      .write.mode("overwrite").parquet(staging.toString)
    val out = fs.listStatus(staging)
      .count(f => f.isFile && f.getPath.getName.endsWith(".parquet"))
    fs.delete(d, true)
    require(fs.rename(staging, d), s"failed to swap compacted ${staging.getName}")
    CompactStats(files.length, out, bytes)
  }
}
