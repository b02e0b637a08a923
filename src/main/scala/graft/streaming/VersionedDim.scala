package graft.streaming

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** Versioned dimension store — the seam that lets a RUNNING streaming
  * stage pick up dimension changes (number-plan ports, tariff updates)
  * without a restart. The reference's answer is restart-to-refresh: a
  * control `startsession` reloads session config from the DB when the
  * id is unknown (`MFramework.cpp:1802-1812`), so a port executed
  * mid-run misguides until an operator bounces the stage. Here the dim
  * lives in a versioned store and the consuming transform re-resolves
  * it per micro-batch, so the NEXT batch guides against the new
  * version — no restart, no misguided window longer than one trigger.
  *
  * Layout (the packet-protocol commit discipline — data first, marker
  * second, marker rename-in is the commit):
  * {{{
  *   dimDir/data/<version>/   parquet snapshot of the dim
  *   dimDir/commits/<version> empty marker file (atomic rename-in)
  * }}}
  * A writer crash between data write and marker leaves an invisible
  * orphan snapshot — never a half-visible version. Versions are dense
  * increasing longs; the latest committed marker wins.
  *
  * `validate` runs ONCE PER VERSION when the version is first resolved
  * (e.g. [[graft.queries.PreratingQ.validateVersionedDim]]'s eager
  * number+time double-coverage check) and its verdict is cached with
  * the snapshot — per-batch consumers never re-pay the guard jobs for
  * a dim that didn't change (the round-10 What's-wrong #4 fix).
  * [[refresh]] drops the cache so the next resolve reloads AND
  * re-validates even at an unchanged version — the control-plane
  * `refreshsession` hook for operators recovering from storage
  * trouble.
  *
  * Scale: the store holds DIMENSIONS (bounded, broadcastable) — the
  * marker listing is one `listStatus` of empty files per resolve, and
  * snapshots are small parquet; fact data never lands here.
  */
final class VersionedDim(spark: SparkSession, dimDir: String,
    validate: DataFrame => DataFrame = identity) {

  private def fs = new Path(dimDir)
    .getFileSystem(spark.sparkContext.hadoopConfiguration)

  private def dataPath(v: Long) = new Path(s"$dimDir/data/$v")
  private def commitPath(v: Long) = new Path(s"$dimDir/commits/$v")

  @volatile private var cached: Option[(Long, DataFrame)] = None

  /** Latest committed version, or None for an empty store. */
  def latestVersion(): Option[Long] = {
    val commits = new Path(s"$dimDir/commits")
    if (!fs.exists(commits)) None
    else {
      val vs = fs.listStatus(commits).toSeq.filter(_.isFile)
        .flatMap(_.getPath.getName.toLongOption)
      if (vs.isEmpty) None else Some(vs.max)
    }
  }

  /** Publish a new dim version: write the snapshot, then rename-in the
    * commit marker. Returns the version number. Concurrent publishers
    * are the operator's problem (dims have one owner); a version
    * collision fails loudly on the marker rename. */
  def publish(dim: DataFrame): Long = {
    val v = latestVersion().getOrElse(0L) + 1L
    // a publisher that crashed between data write and marker left an
    // ORPHAN snapshot at this version number (invisible to readers —
    // no marker). Reclaim it: the orphan is by definition abandoned,
    // and failing forever on ErrorIfExists would wedge publishing.
    if (fs.exists(dataPath(v)) && !fs.exists(commitPath(v)))
      fs.delete(dataPath(v), true)
    dim.write.mode(SaveMode.ErrorIfExists).parquet(dataPath(v).toString)
    val tmp = new Path(s"$dimDir/commits/.tmp-$v")
    fs.mkdirs(new Path(s"$dimDir/commits"))
    val out = fs.create(tmp, false)
    out.close()
    require(fs.rename(tmp, commitPath(v)),
      s"VersionedDim: commit marker collision at version $v ($dimDir)")
    v
  }

  /** Resolve the latest committed version, validating once per
    * version. Cheap when unchanged (one marker listing + cache hit);
    * a new version pays one parquet read + the validate jobs. Throws
    * on an empty store — a consumer with no dim must not guess. */
  def resolve(): (Long, DataFrame) = {
    val v = latestVersion().getOrElse(throw new IllegalStateException(
      s"VersionedDim: no committed version in $dimDir"))
    cached match {
      case Some((cv, df)) if cv == v => (v, df)
      case _ =>
        val df = validate(spark.read.parquet(dataPath(v).toString))
        cached = Some((v, df))
        (v, df)
    }
  }

  /** Drop the cached snapshot+verdict: the next [[resolve]] reloads and
    * re-validates even if the version is unchanged. */
  def refresh(): Unit = cached = None
}
