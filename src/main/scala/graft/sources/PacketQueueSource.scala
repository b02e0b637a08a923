package graft.sources

import java.io.{BufferedReader, InputStreamReader}
import java.nio.charset.StandardCharsets
import java.util.{Collections => JCollections}

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.{InputPartition, PartitionReader, PartitionReaderFactory, Scan, ScanBuilder}
import org.apache.spark.sql.connector.read.streaming.{MicroBatchStream, Offset}
import org.apache.spark.sql.sources.DataSourceRegister
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String
import org.apache.spark.util.SerializableConfiguration

import graft.etl.PacketCodec

/** "Packet queue" streaming source — the reference's inter-component data
  * plane exercised IN-REPO without a broker: its queue reader threads
  * receive `k=v` control packets whose `f=` key points at the data file
  * to ingest (the file-pointer convention of `MFramework.cpp:1261-1302`;
  * wire format `MFramework.cpp:1230-1243`), so the QUEUE carries
  * human-scale pointers while the DATA stays on shared storage. This
  * DataSourceV2 micro-batch source replays that exact protocol from an
  * append-only packet directory:
  *
  *  - arrival order = natural packet-file-name order (producers name
  *    packets monotonically — the same contract as the reference's
  *    queue FIFO); the stream offset is simply the COUNT of consumed
  *    packets, checkpointed by the engine, so kill-and-restart resumes
  *    at the exact packet boundary with no reprocessing;
  *  - packets parse with [[PacketCodec]]; a packet without an `f` key is
  *    skipped (a control/noise packet in a data queue), never a crash —
  *    the poison-pill rule;
  *  - each referenced data file becomes ONE input partition read on the
  *    executors (the driver touches only the tiny packets, the
  *    controlIngress bounded-collect class), parsed as headered CSV
  *    into the user-declared schema;
  *  - an optional `root` option confines `f=` targets: a packet pointing
  *    outside it fails LOUDLY (a traversal breach is an attack, not a
  *    dead letter — the Connectors.scala confinement discipline).
  *
  * Producer drop contract (same as the reference's marker protocol and
  * the chain inbox): write the DATA file first, then the packet, both
  * atomically (rename-in) — the packet IS the commit marker, so a
  * half-written data file is never referenced by a visible packet.
  *
  * Usage — the §2A#1 seam swap, zero operator changes downstream:
  * {{{
  *   spark.readStream.format("packetqueue")
  *     .schema(legSchema).option("path", queueDir).load()
  * }}}
  */
class PacketQueueProvider extends TableProvider with DataSourceRegister {
  override def shortName(): String = "packetqueue"
  override def supportsExternalMetadata(): Boolean = true

  /** Schema-less use yields raw lines (`value`, `src`). */
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    PacketQueueProvider.RawSchema

  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: java.util.Map[String, String]): Table =
    new PacketQueueTable(schema,
      new CaseInsensitiveStringMap(properties))
}

object PacketQueueProvider {
  val RawSchema: StructType = StructType(Seq(
    StructField("value", StringType),
    StructField("src", StringType)))
}

private final class PacketQueueTable(schema0: StructType,
    options: CaseInsensitiveStringMap) extends Table with SupportsRead {
  require(options.containsKey("path"),
    "packetqueue: required option 'path' (the packet directory)")
  override def name(): String = s"packetqueue(${options.get("path")})"
  override def schema(): StructType = schema0
  override def capabilities(): java.util.Set[TableCapability] =
    JCollections.singleton(TableCapability.MICRO_BATCH_READ)
  override def newScanBuilder(opts: CaseInsensitiveStringMap): ScanBuilder =
    new ScanBuilder {
      override def build(): Scan = new Scan {
        override def readSchema(): StructType = schema
        override def toMicroBatchStream(checkpointLocation: String)
            : MicroBatchStream =
          new PacketQueueStream(schema, options)
      }
    }
}

/** Offset = number of packets consumed from the queue head. */
private final case class PacketQueueOffset(n: Long) extends Offset {
  override def json(): String = n.toString
}

private final class PacketQueueStream(schema: StructType,
    options: CaseInsensitiveStringMap) extends MicroBatchStream {

  private val queueDir = options.get("path")
  private val rootOpt = Option(options.get("root"))
  private val header = Option(options.get("header")).forall(_.toBoolean)
  private val delimiter = Option(options.get("delimiter")).getOrElse(",")
  private val raw = schema == PacketQueueProvider.RawSchema

  private def hadoopConf =
    SparkSession.active.sessionState.newHadoopConf()

  /** Packet files in arrival (natural-name) order. Sorting makes the
    * [start, end) offset slice deterministic across restarts — the
    * producer contract is monotone packet names, and NATURAL order
    * (digit runs compared numerically, [[graft.core.NaturalOrder]])
    * honors it even for unpadded names: lexicographic order would put
    * `p10` before `p9`, silently SHIFTING the consumed prefix across a
    * restart (packets skipped or replayed) with nothing for the
    * beyond-listing guard to catch. */
  private def listPackets(): Seq[Path] = {
    val p = new Path(queueDir)
    val fs = p.getFileSystem(hadoopConf)
    if (!fs.exists(p)) Seq.empty
    else fs.listStatus(p).toSeq.filter(_.isFile).map(_.getPath)
      .sortBy(p => graft.core.NaturalOrder.key(p.getName))
  }

  override def initialOffset(): Offset = PacketQueueOffset(0L)
  override def latestOffset(): Offset =
    PacketQueueOffset(listPackets().size.toLong)
  override def deserializeOffset(json: String): Offset =
    PacketQueueOffset(json.toLong)

  /** Queue retention is the operator's: consumed packets stay in place
    * (the offset log is the consumption record), mirroring the chain's
    * file-source inbox discipline. */
  override def commit(end: Offset): Unit = ()
  override def stop(): Unit = ()

  override def planInputPartitions(start: Offset, end: Offset)
      : Array[InputPartition] = {
    val (s, e) = (start.asInstanceOf[PacketQueueOffset].n,
      end.asInstanceOf[PacketQueueOffset].n)
    val packets = listPackets()
    require(e <= packets.size,
      s"packetqueue: offset $e beyond the ${packets.size} packets present " +
        "— packets must be append-only with monotone names")
    val fs = new Path(queueDir).getFileSystem(hadoopConf)
    val rootResolved = rootOpt.map(r =>
      fs.resolvePath(new Path(r)).toUri.getPath)
    packets.slice(s.toInt, e.toInt).flatMap { pkt =>
      // packets are human-scale control records: read driver-side, the
      // controlIngress bounded class (size-guarded)
      val st = fs.getFileStatus(pkt)
      require(st.getLen <= 65536,
        s"packetqueue: packet ${pkt.getName} is ${st.getLen} bytes — a " +
          "data file landed in the control queue?")
      val in = fs.open(pkt)
      val body = try {
        val buf = new Array[Byte](st.getLen.toInt)
        in.readFully(buf)
        new String(buf, StandardCharsets.UTF_8)
      } finally in.close()
      PacketCodec.parseLocal(body).get(PacketCodec.FileKey).map { f =>
        val dataPath = fs.resolvePath(new Path(f))
        rootResolved.foreach { root =>
          val resolved = dataPath.toUri.getPath
          require(resolved == root || resolved.startsWith(root + "/"),
            s"packetqueue: packet ${pkt.getName} points outside root: $f")
        }
        PacketFilePartition(dataPath.toString): InputPartition
      }
    }.toArray
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new PacketFileReaderFactory(schema, raw, header, delimiter,
      new SerializableConfiguration(hadoopConf))
}

private final case class PacketFilePartition(dataFile: String)
  extends InputPartition

private final class PacketFileReaderFactory(schema: StructType,
    raw: Boolean, header: Boolean, delimiter: String,
    conf: SerializableConfiguration) extends PartitionReaderFactory {

  override def createReader(partition: InputPartition)
      : PartitionReader[InternalRow] = {
    val file = partition.asInstanceOf[PacketFilePartition].dataFile
    new PartitionReader[InternalRow] {
      private val path = new Path(file)
      private val reader = new BufferedReader(new InputStreamReader(
        path.getFileSystem(conf.value).open(path), StandardCharsets.UTF_8))
      private var line: String = _
      private var first = true

      override def next(): Boolean = {
        line = reader.readLine()
        if (first && !raw && header && line != null) {
          first = false
          line = reader.readLine()
        }
        first = false
        line != null
      }

      override def get(): InternalRow =
        if (raw) InternalRow(UTF8String.fromString(line),
          UTF8String.fromString(file))
        else {
          val parts = line.split(java.util.regex.Pattern.quote(delimiter), -1)
          InternalRow.fromSeq(schema.fields.zipWithIndex.map { case (f, i) =>
            val v = if (i < parts.length) parts(i) else null
            if (v == null || v.isEmpty) null
            else f.dataType match {
              case StringType => UTF8String.fromString(v)
              case IntegerType => v.toIntOption.map(Int.box).orNull
              case LongType => v.toLongOption.map(Long.box).orNull
              case DoubleType => v.toDoubleOption.map(Double.box).orNull
              case BooleanType => v.toBooleanOption.map(Boolean.box).orNull
              case TimestampType =>
                // micros since epoch on the wire (the chain's fixtures
                // carry integral-second surrogates; a richer feed would
                // extend the codec, not this reader)
                v.toLongOption.map(s => java.lang.Long.valueOf(s * 1000000L))
                  .orNull
              case other => throw new IllegalArgumentException(
                s"packetqueue: unsupported field type $other for ${f.name}")
            }
          }.toSeq)
        }

      override def close(): Unit = reader.close()
    }
  }
}
