package graft.etl

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths, StandardCopyOption}

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, TimestampType}

/** High-watermark incremental batch runner — the engine's analogue of the
  * reference's marker-file delta protocol (`MFramework.cpp:821-903`: a
  * marker records how far the last run got; the next run resumes from the
  * marker, never re-reading completed work). Here the marker is a
  * committed watermark over an event-time column: each run processes only
  * rows STRICTLY AFTER the committed watermark, then atomically advances
  * it to the delta's max.
  *
  * The delta filter is a literal comparison, so it reaches the parquet
  * scan as a pushed predicate — with time-clustered files
  * ([[Layout.writeRangeClustered]]) or date partitioning, an incremental
  * run over a 100 TB history READS only the new tail, which is the entire
  * point: cost tracks the delta, not the table.
  *
  * Crash contract — at-least-once, mirroring Structured Streaming's
  * replayed-batch semantics: the watermark commits AFTER `process`
  * succeeds, so a crash between the two replays the same delta on the
  * next run. Pair with an idempotent sink ([[MergeWrite.merge]],
  * [[JdbcUpsert]]) for effective exactly-once. The commit itself is a
  * temp-file write + atomic rename: a torn state file is impossible.
  */
object IncrementalBatch {

  /** The committed watermark: micros-since-epoch for TIMESTAMP columns,
    * the raw value for BIGINT columns; None before the first commit. */
  def watermark(statePath: String): Option[Long] = {
    val f = Paths.get(statePath, "watermark")
    if (Files.exists(f))
      Some(new String(Files.readAllBytes(f), StandardCharsets.UTF_8).trim.toLong)
    else None
  }

  private def commit(statePath: String, wm: Long): Unit = {
    val dir = Paths.get(statePath)
    Files.createDirectories(dir)
    val tmp = dir.resolve(".watermark.tmp")
    Files.write(tmp, wm.toString.getBytes(StandardCharsets.UTF_8))
    Files.move(tmp, dir.resolve("watermark"), StandardCopyOption.ATOMIC_MOVE,
      StandardCopyOption.REPLACE_EXISTING)
  }

  /** Run one incremental step: filter `source` to rows with
    * `tsCol` > committed watermark, hand the delta to `process`, then
    * commit the delta's max as the new watermark. Returns the committed
    * watermark, or None when the delta was empty (then `process` is not
    * invoked and the state file is untouched).
    *
    * `tsCol` must be TIMESTAMP or BIGINT and must be append-monotone at
    * the SOURCE level for exactly-the-delta semantics: a row landing with
    * an event time at or below an already-committed watermark is skipped
    * forever (the same contract a streaming watermark imposes on late
    * data — route genuinely late rows through a dedicated late channel).
    */
  def run(source: DataFrame, tsCol: String, statePath: String)
      (process: DataFrame => Unit): Option[Long] = {
    val isTs = source.schema(tsCol).dataType match {
      case TimestampType => true
      case LongType      => false
      case other => throw new IllegalArgumentException(
        s"watermark column '$tsCol' must be TIMESTAMP or BIGINT, got $other")
    }
    def bound(w: Long): Column = if (isTs) timestamp_micros(lit(w)) else lit(w)
    val delta = watermark(statePath)
      .map(w => source.filter(col(tsCol) > bound(w))).getOrElse(source)
    // one scalar aggregate over the (pushdown-pruned) delta; computed
    // BEFORE process so a sink that mutates the source can't move the mark
    val mxRow = delta.agg(
      max(if (isTs) unix_micros(col(tsCol)) else col(tsCol))).head()
    if (mxRow.isNullAt(0)) None
    else {
      val mx = mxRow.getLong(0)
      process(delta)
      commit(statePath, mx)
      Some(mx)
    }
  }
}
