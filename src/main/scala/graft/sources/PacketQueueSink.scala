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
}
