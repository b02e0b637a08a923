package graft.sources

import java.nio.charset.StandardCharsets

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.streaming.DataStreamWriter

import graft.core.NaturalOrder
import graft.etl.PacketCodec

/** "Packet queue" streaming SINK — the write side of the reference's
  * inter-component data plane, closing the loop the [[PacketQueueProvider]]
  * source opened: its dispatcher thread SERIALIZES records downstream and
  * emits `k=v` packets whose `f=` key points at the data file
  * (`MFramework.cpp:1333-1485` dispatch, `:1552-1560` serialize), so two
  * chain stages can hand off via the reference's exact contract with the
  * queue carrying human-scale pointers and the data staying on shared
  * storage.
  *
  * Per micro-batch:
  *  1. the batch writes as headered CSV into a work dir, one part file
  *     per partition (executor-parallel — the driver never touches fact
  *     data);
  *  2. each part renames to its FINAL name
  *     `dataDir/b<batch>_<i>.csv` (zero-padded, monotone);
  *  3. only then does each data file get its packet
  *     `queueDir/p<batch>_<i>.pkt` = `s=<session>\nf=<data path>`,
  *     written tmp-then-rename — the packet IS the commit marker, so a
  *     half-written data file is never referenced by a visible packet
  *     (the producer drop contract the source documents).
  *
  * Replay idempotence: everything is keyed by (batchId, partition index)
  * with deterministic names; a replayed batch first SWEEPS any files and
  * packets of its own batch id (data and packets), then reproduces them.
  * The sweep matters beyond tidiness — a replay that repartitioned
  * differently would otherwise strand an orphan (data file + packet)
  * from the crashed attempt beside the new set and double-deliver its
  * rows. Sweeping a packet a downstream already COUNTED shrinks the
  * queue listing, which the source fails on loudly — consistent with
  * the kill-the-topology crash model (producer and consumer restart
  * together; the consumer never runs ahead through a producer crash
  * window).
  *
  * Round-trip constraint (same as the reference's line-oriented wire):
  * values must not contain the delimiter or newlines — the source's
  * reader splits lines, it does not un-quote. Numeric/id payloads (the
  * chain's leg schema) are safe by construction, and
  * [[graft.etl.PacketCodec.serializeLocal]] fails LOUDLY on a custom
  * session string a future caller passes with a line break in it.
  */
object PacketQueueSink {

  private def fmtData(batchId: Long, i: Int) = f"b$batchId%020d_$i%05d.csv"
  private def fmtPkt(batchId: Long, i: Int) = f"p$batchId%020d_$i%05d.pkt"

  /** One micro-batch through the packet protocol (see object doc).
    * Exposed for specs; wire into a stream with [[sink]]. */
  def writeBatch(spark: SparkSession, batch: DataFrame, batchId: Long,
      dataDir: String, queueDir: String, session: String = "1"): Unit = {
    val conf = spark.sparkContext.hadoopConfiguration
    val data = new Path(dataDir)
    val queue = new Path(queueDir)
    val fs = data.getFileSystem(conf)
    fs.mkdirs(data)
    fs.mkdirs(queue)

    // replay sweep: remove THIS batch's previous attempt, packets first
    // (un-commit before the data disappears), then data files
    val batchPrefixPkt = f"p$batchId%020d_"
    val batchPrefixData = f"b$batchId%020d_"
    fs.listStatus(queue).filter(s => s.isFile &&
        s.getPath.getName.startsWith(batchPrefixPkt))
      .foreach(s => fs.delete(s.getPath, false))
    fs.listStatus(data).filter(s => s.isFile &&
        s.getPath.getName.startsWith(batchPrefixData))
      .foreach(s => fs.delete(s.getPath, false))

    // 1. executor-parallel CSV write into the work dir
    val work = new Path(data, f".work-b$batchId%020d")
    if (fs.exists(work)) fs.delete(work, true)
    batch.write.option("header", "true").csv(work.toString)

    // 2+3. rename parts into place, then commit each with its packet.
    // Driver-side loop over PART FILES (bounded by batch partition
    // count, the controlIngress bounded-collect class), not rows.
    val parts = fs.listStatus(work).map(_.getPath)
      .filter(p => p.getName.startsWith("part-"))
      .sortBy(p => NaturalOrder.key(p.getName))
    parts.zipWithIndex.foreach { case (part, i) =>
      val target = new Path(data, fmtData(batchId, i))
      require(fs.rename(part, target),
        s"packetqueue sink: rename failed for $target")
      val body = PacketCodec.serializeLocal(Map(
        PacketCodec.SessionKey -> session,
        PacketCodec.FileKey -> target.toString))
      val tmp = new Path(queue, f".tmp-${fmtPkt(batchId, i)}")
      val out = fs.create(tmp, true)
      try out.write(body.getBytes(StandardCharsets.UTF_8))
      finally out.close()
      require(fs.rename(tmp, new Path(queue, fmtPkt(batchId, i))),
        s"packetqueue sink: packet rename failed for batch $batchId/$i")
    }
    fs.delete(work, true)
  }

  /** A [[graft.streaming.StageSpec]]-shaped sink: every micro-batch goes
    * through [[writeBatch]] under the given checkpoint. */
  def sink(spark: SparkSession, dataDir: String, queueDir: String,
      checkpointLocation: String, session: String = "1")
      : DataFrame => DataStreamWriter[Row] =
    df => df.writeStream
      .option("checkpointLocation", checkpointLocation)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        writeBatch(spark, batch, batchId, dataDir, queueDir, session)
      }

  /** One (dataDir, queueDir) destination queue a component type is
    * registered on. */
  final case class Dest(dataDir: String, queueDir: String)

  private def fmtDataT(batchId: Long, t: String, i: Int) =
    f"b$batchId%020d_${t}_$i%05d.csv"
  private def fmtPktT(batchId: Long, t: String, i: Int) =
    f"p$batchId%020d_${t}_$i%05d.pkt"

  /** The dispatcher's `t=`-routed DEMUX — the multi-destination form of
    * [[writeBatch]], completing the reference's output-dispatcher
    * semantics: each record routes by its COMPONENT-TYPE column to the
    * queues registered for that type, and when a type has several
    * queues the dispatcher round-robins across them
    * (`MFramework.cpp:1372-1385` routes by type, `:1537-1571`
    * round-robins the per-type writer list) — one stage fanning out to
    * heterogeneous consumers over the packet plane.
    *
    * Per micro-batch:
    *  1. ONE executor-parallel write of the batch partitioned by the
    *     route column into a work dir (`.work/<routeCol>=T/part-*`) —
    *     the route column itself stays OUT of the data files, exactly
    *     like the reference's dispatcher, which consumes the routing
    *     key and forwards the record;
    *  2. a route value with no registered destination fails the batch
    *     LOUDLY (a misroute is a config error, not a dead letter —
    *     checked from the work-dir listing, zero extra jobs, before
    *     anything becomes visible);
    *  3. each type's part files (natural order) rename to
    *     `b<batch>_<type>_<i>.csv` in destination `i mod N`'s data dir,
    *     then commit with packet `p<batch>_<type>_<i>.pkt` =
    *     `f=<data path>\ns=<session>\nt=<type>` — data first, packet
    *     rename-in second, so a half-written file is never referenced.
    *
    * Replay idempotence is [[writeBatch]]'s, per (type, destination):
    * a replayed batch sweeps its own packets (then data) from EVERY
    * registered destination before reproducing them, so a replay that
    * repartitioned differently — or whose dim-driven routing CHANGED —
    * strands nothing. Type names must be path-safe (`[A-Za-z0-9_-]+`,
    * enforced) since they ride in file names; several types may share
    * a queue (names are type-scoped, no collision).
    */
  def writeBatchDemux(spark: SparkSession, batch: DataFrame,
      batchId: Long, routeCol: String,
      destinations: Map[String, Seq[Dest]], session: String = "1")
      : Unit = {
    require(destinations.nonEmpty, "packetqueue demux: no destinations")
    destinations.foreach { case (t, ds) =>
      require(t.matches("[A-Za-z0-9_-]+"),
        s"packetqueue demux: type '$t' is not path-safe")
      require(ds.nonEmpty,
        s"packetqueue demux: type '$t' has no registered queues")
    }
    val conf = spark.sparkContext.hadoopConfiguration
    def fsOf(p: Path) = p.getFileSystem(conf)

    // replay sweep FIRST, across every destination this batch could
    // have touched: packets (un-commit), then data
    destinations.foreach { case (t, ds) =>
      ds.foreach { d =>
        val queue = new Path(d.queueDir)
        val data = new Path(d.dataDir)
        val fs = fsOf(queue)
        fs.mkdirs(queue); fs.mkdirs(data)
        val pktPre = f"p$batchId%020d_${t}_"
        val dataPre = f"b$batchId%020d_${t}_"
        fs.listStatus(queue).filter(s => s.isFile &&
            s.getPath.getName.startsWith(pktPre))
          .foreach(s => fs.delete(s.getPath, false))
        fs.listStatus(data).filter(s => s.isFile &&
            s.getPath.getName.startsWith(dataPre))
          .foreach(s => fs.delete(s.getPath, false))
      }
    }

    // 1. one executor-parallel partitioned write; the route column is
    // consumed by the layout (not repeated inside the data files).
    // Work-dir host pinned to the lexicographically-smallest data dir:
    // Map iteration order is not stable across JVMs, and a replay that
    // picked a different host would strand the crashed attempt's
    // (invisible, dot-prefixed) work dir instead of sweeping it.
    val work = new Path(
      destinations.values.flatten.map(_.dataDir).min,
      f".work-demux-b$batchId%020d")
    val workFs = fsOf(work)
    if (workFs.exists(work)) workFs.delete(work, true)
    batch.write.option("header", "true").partitionBy(routeCol)
      .csv(work.toString)

    // 2. misroute guard off the work-dir listing (no extra Spark job)
    val routeDirs = workFs.listStatus(work).filter(_.isDirectory)
      .map(_.getPath).filter(_.getName.startsWith(s"$routeCol="))
    val seen = routeDirs.map(_.getName.stripPrefix(s"$routeCol="))
    val unknown = seen.filterNot(destinations.contains)
    require(unknown.isEmpty,
      s"packetqueue demux: batch $batchId carries route value(s) " +
        s"${unknown.mkString(", ")} with no registered destination " +
        s"(have: ${destinations.keys.toSeq.sorted.mkString(", ")}) — " +
        "a misroute is a config error, not a dead letter")

    // 3. per type: rename parts into the round-robin destination, then
    // commit each with its packet (driver-side loop over PART FILES —
    // bounded by partition count × types, never rows)
    routeDirs.sortBy(p => NaturalOrder.key(p.getName)).foreach { rd =>
      val t = rd.getName.stripPrefix(s"$routeCol=")
      val ds = destinations(t)
      val parts = workFs.listStatus(rd).map(_.getPath)
        .filter(p => p.getName.startsWith("part-"))
        .sortBy(p => NaturalOrder.key(p.getName))
      parts.zipWithIndex.foreach { case (part, i) =>
        val d = ds(i % ds.size)
        val fs = fsOf(new Path(d.dataDir))
        val target = new Path(d.dataDir, fmtDataT(batchId, t, i))
        require(fs.rename(part, target),
          s"packetqueue demux: rename failed for $target")
        val body = PacketCodec.serializeLocal(Map(
          PacketCodec.SessionKey -> session,
          PacketCodec.FileKey -> target.toString,
          PacketCodec.TargetKey -> t))
        val tmp = new Path(d.queueDir, f".tmp-${fmtPktT(batchId, t, i)}")
        val out = fs.create(tmp, true)
        try out.write(body.getBytes(StandardCharsets.UTF_8))
        finally out.close()
        require(fs.rename(tmp,
          new Path(d.queueDir, fmtPktT(batchId, t, i))),
          s"packetqueue demux: packet rename failed for batch $batchId/" +
            s"$t/$i")
      }
    }
    workFs.delete(work, true)
  }

  /** A [[graft.streaming.StageSpec]]-shaped demux sink: every
    * micro-batch routes through [[writeBatchDemux]]. */
  def demuxSink(spark: SparkSession, routeCol: String,
      destinations: Map[String, Seq[Dest]], checkpointLocation: String,
      session: String = "1"): DataFrame => DataStreamWriter[Row] =
    df => df.writeStream
      .option("checkpointLocation", checkpointLocation)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        writeBatchDemux(spark, batch, batchId, routeCol, destinations,
          session)
      }
}
