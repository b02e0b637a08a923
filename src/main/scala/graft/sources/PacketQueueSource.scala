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
  *    dead letter — the Connectors.scala confinement discipline);
  *  - optional `archive=true` retention: each commit moves the
  *    durably-consumed packet prefix into `_consumed/` under a tiny
  *    manifest, keeping the per-trigger listing O(backlog) instead of
  *    O(all packets ever) at production cadence.
  *
  * The WRITE side of the protocol is [[PacketQueueSink]] — two chain
  * stages can hand off with BOTH ends on the reference's contract.
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
  private val archive = Option(options.get("archive")).exists(_.toBoolean)
  private val raw = schema == PacketQueueProvider.RawSchema

  private def hadoopConf =
    SparkSession.active.sessionState.newHadoopConf()

  // ---- consumed-prefix archival (option archive=true) ----------------
  // Without it, consumed packets stay in place and latestOffset()
  // re-lists the ENTIRE history every trigger — O(all packets ever) of
  // driver work after a month at production cadence. With it, commit()
  // moves the consumed prefix into `_consumed/` under a tiny manifest
  // (`<count>\n<last archived name>`, written tmp-then-rename BEFORE
  // the moves — a crash mid-move leaves stragglers that the listing
  // excludes by name and the next commit re-moves), so the live listing
  // stays O(unconsumed backlog). Offsets keep their meaning: global
  // position = manifest count + live position, and restart offsets are
  // exact because commit() only ever archives below the durably
  // committed offset. A FRESH checkpoint cannot start against an
  // already-archived queue (offset 0 is below the archived prefix —
  // fails loudly; restore `_consumed/` or point at a fresh queue).

  private def consumedDir = new Path(queueDir, "_consumed")
  private def legacyManifestPath = new Path(consumedDir, "_manifest")

  /** The manifest is VERSIONED by its own archived count
    * (`_manifest.<count>`), written tmp-then-rename, and the reader
    * resolves the HIGHEST count present: a crash at any point leaves
    * either the previous manifest (the moves re-run next commit) or
    * both (latest wins; older ones are swept on the next write). A
    * delete-then-rename swap of one fixed name would have a window
    * with NO manifest at all — a crash there reads archN as 0 while the
    * checkpointed offsets still include the archived count, wedging
    * every subsequent trigger on the below-archived-prefix guard.
    * Pre-round-12 stores with the single legacy `_manifest` name are
    * read as count-version 0-of-precedence (any versioned manifest
    * supersedes it) and swept on the first write. */
  private def manifestEntries(fs: org.apache.hadoop.fs.FileSystem)
      : Seq[(Long, Path)] = {
    if (!fs.exists(consumedDir)) return Seq.empty
    fs.listStatus(consumedDir).toSeq.filter(_.isFile).map(_.getPath)
      .flatMap { p =>
        val n = p.getName
        if (n.startsWith("_manifest."))
          n.stripPrefix("_manifest.").toLongOption.map(_ -> p)
        else None
      }
  }

  /** (archived count, last archived packet name). */
  private def readManifest(fs: org.apache.hadoop.fs.FileSystem)
      : (Long, Option[String]) = {
    if (!archive) return (0L, None)
    val versioned = manifestEntries(fs)
    val chosen =
      if (versioned.nonEmpty) Some(versioned.maxBy(_._1))
      else if (fs.exists(legacyManifestPath)) Some((-1L, legacyManifestPath))
      else None
    chosen match {
      case None => (0L, None)
      case Some((_, path)) =>
        val in = fs.open(path)
        val body = try {
          val len = fs.getFileStatus(path).getLen.toInt
          val buf = new Array[Byte](len)
          in.readFully(buf)
          new String(buf, StandardCharsets.UTF_8)
        } finally in.close()
        val lines = body.split("\n", -1)
        (lines(0).toLong,
          if (lines.length > 1 && lines(1).nonEmpty) Some(lines(1))
          else None)
    }
  }

  private def writeManifest(fs: org.apache.hadoop.fs.FileSystem,
      count: Long, last: String): Unit = {
    fs.mkdirs(consumedDir)
    val stale = manifestEntries(fs).map(_._2) ++
      (if (fs.exists(legacyManifestPath)) Seq(legacyManifestPath)
       else Seq.empty)
    val target = new Path(consumedDir, s"_manifest.$count")
    val tmp = new Path(consumedDir, s"._manifest.$count.tmp")
    val out = fs.create(tmp, true)
    try out.write(s"$count\n$last".getBytes(StandardCharsets.UTF_8))
    finally out.close()
    require(fs.rename(tmp, target),
      s"packetqueue: manifest rename failed in $queueDir")
    // sweep superseded manifests LAST — only after the new one is
    // durably in place is any older count safe to lose
    stale.filterNot(_ == target).foreach(p => fs.delete(p, false))
  }

  /** Packet files in arrival (natural-name) order. Sorting makes the
    * [start, end) offset slice deterministic across restarts — the
    * producer contract is monotone packet names, and NATURAL order
    * (digit runs compared numerically, [[graft.core.NaturalOrder]])
    * honors it even for unpadded names: lexicographic order would put
    * `p10` before `p9`, silently SHIFTING the consumed prefix across a
    * restart (packets skipped or replayed) with nothing for the
    * beyond-listing guard to catch. */
  /** (archived count, live packets beyond the archived prefix, in
    * natural order). Stragglers of a crashed archive pass (already in
    * the manifest, not yet moved) are excluded by name. */
  private def listState(): (Long, Seq[Path]) = {
    val p = new Path(queueDir)
    val fs = p.getFileSystem(hadoopConf)
    if (!fs.exists(p)) return (0L, Seq.empty)
    val (archN, lastName) = readManifest(fs)
    val lastKey = lastName.map(graft.core.NaturalOrder.key)
    val live = visiblePackets(fs, p)
      .filter(q => lastKey.forall(lk =>
        graft.core.NaturalOrder.key(q.getName) > lk))
    (archN, live)
  }

  /** Visible (committed) packets: dot/underscore-prefixed names are
    * in-flight tmp files or metadata by the Hadoop convention — a
    * producer's rename-in target is the only thing that may count
    * toward the offset, or a listing racing a rename would shrink. */
  private def visiblePackets(fs: org.apache.hadoop.fs.FileSystem,
      p: Path): Seq[Path] =
    fs.listStatus(p).toSeq.filter(_.isFile).map(_.getPath)
      .filterNot(q => q.getName.startsWith(".") ||
        q.getName.startsWith("_"))
      .sortBy(q => graft.core.NaturalOrder.key(q.getName))

  override def initialOffset(): Offset = PacketQueueOffset(0L)
  override def latestOffset(): Offset = {
    val (archN, live) = listState()
    PacketQueueOffset(archN + live.size)
  }
  override def deserializeOffset(json: String): Offset =
    PacketQueueOffset(json.toLong)

  /** Default retention is the operator's: consumed packets stay in
    * place (the offset log is the consumption record), mirroring the
    * chain's file-source inbox discipline. With `archive=true` the
    * durably-committed prefix moves to `_consumed/` here — manifest
    * first (the intent record), moves second, so a crash between the
    * two leaves excluded-by-name stragglers the next commit re-moves. */
  override def commit(end: Offset): Unit = if (archive) {
    val n = end.asInstanceOf[PacketQueueOffset].n
    val p = new Path(queueDir)
    val fs = p.getFileSystem(hadoopConf)
    if (!fs.exists(p)) return
    val (archN, lastName) = readManifest(fs)
    val lastKey = lastName.map(graft.core.NaturalOrder.key)
    val all = visiblePackets(fs, p)
    val (stragglers, rest) = all.partition(q =>
      lastKey.exists(lk => graft.core.NaturalOrder.key(q.getName) <= lk))
    val toArchive = rest.take(math.max(0L, n - archN).toInt)
    if (toArchive.nonEmpty)
      writeManifest(fs, archN + toArchive.size, toArchive.last.getName)
    fs.mkdirs(consumedDir)
    (stragglers ++ toArchive).foreach { q =>
      val dst = new Path(consumedDir, q.getName)
      // A producer replay can rewrite an ALREADY-ARCHIVED packet into
      // the queue (its foreachBatch checkpoint lagged the consumer's
      // commit through a crash window); the rewrite lists as a
      // straggler here, and renaming onto the existing archived copy
      // would fail on HDFS (rename → false) and wedge every subsequent
      // commit — or silently overwrite on a local FS. The archived copy
      // IS the durably-consumed record, so the queue-side duplicate is
      // dropped — but ONLY after proving it byte-identical: a
      // same-named packet with DIFFERENT content is not a replay, it is
      // a reset/misconfigured producer reusing archived batch ids, and
      // silently deleting it would lose its wave unread. Packets are
      // ≤ 64 KiB control records, so the compare is two tiny reads.
      if (fs.exists(dst)) {
        def bytes(p: Path): Array[Byte] = {
          val len = fs.getFileStatus(p).getLen.toInt
          val in = fs.open(p)
          try { val b = new Array[Byte](len); in.readFully(b); b }
          finally in.close()
        }
        if (java.util.Arrays.equals(bytes(q), bytes(dst)))
          require(fs.delete(q, false),
            s"packetqueue: duplicate-archive delete failed for ${q.getName}")
        else {
          // DIFFERENT content under a consumed name: a reset producer,
          // a second producer, or a replay whose routing config moved a
          // destination. Not a benign replay — but THROWING here would
          // wedge commit() forever (the straggler re-lists every
          // trigger). Quarantine it LOUDLY instead: moved aside intact
          // for the operator, never silently dropped, never re-read
          // (underscore prefix keeps it out of every listing).
          val qdir = new Path(queueDir, "_conflict")
          fs.mkdirs(qdir)
          require(fs.rename(q, new Path(qdir, q.getName)),
            s"packetqueue: conflict quarantine failed for ${q.getName}")
          System.err.println(s"[packetqueue] QUARANTINED ${q.getName}: " +
            "content differs from the archived copy of the same name — " +
            s"a producer is reusing consumed batch ids; inspect $qdir")
        }
      } else require(fs.rename(q, dst),
        s"packetqueue: archive move failed for ${q.getName}")
    }
  }
  override def stop(): Unit = ()

  override def planInputPartitions(start: Offset, end: Offset)
      : Array[InputPartition] = {
    val (s, e) = (start.asInstanceOf[PacketQueueOffset].n,
      end.asInstanceOf[PacketQueueOffset].n)
    val (archN, live) = listState()
    require(s >= archN,
      s"packetqueue: offset $s is below the archived prefix ($archN) — " +
        "a fresh checkpoint cannot start against an archived queue; " +
        s"restore ${consumedDir} or point at a fresh queue")
    require(e - archN <= live.size,
      s"packetqueue: offset $e beyond the ${archN + live.size} packets " +
        "present — packets must be append-only with monotone names")
    val fs = new Path(queueDir).getFileSystem(hadoopConf)
    // resolved lazily: the confinement root need not exist before the
    // producer's first write (an empty plan resolves nothing)
    lazy val rootResolved = rootOpt.map(r =>
      fs.resolvePath(new Path(r)).toUri.getPath)
    live.slice((s - archN).toInt, (e - archN).toInt).flatMap { pkt =>
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
