package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column support (SURVEY §2C): media payloads as opaque binary
  * columns with typed metadata, plus per-partition batched decode /
  * feature-extract / frame-sample operators.
  *
  * The decode step is a STUB behind [[MediaDecoder]] — no image/audio
  * codecs ship in this environment — with [[FakeDecoder]] as a
  * deterministic stand-in. The Spark-side plumbing is the real, tested
  * part: the schema (binary + metadata map), the typed row model, the
  * mapPartitions batch shape (decoder initialized once per partition, the
  * expensive-resource pattern), and partition sizing by byte budget.
  */
final case class MediaRow(
    media_id: Long,
    payload: Array[Byte],
    mime: String,
    meta: Map[String, String])

final case class MediaFeatures(
    media_id: Long,
    n_bytes: Long,
    width: Int,
    height: Int,
    n_frames: Int,
    fingerprint: Long,
    frame_hashes: Array[Long])

/** One sampled frame of a media payload: the per-frame row a vision
  * pipeline feeds to feature extraction / embedding. */
final case class MediaFrame(
    media_id: Long,
    frame_idx: Int,
    n_frames: Int,
    payload: Array[Byte],
    meta: Map[String, String])

/** One decoder instance per partition; implementations wrap the actual
  * codec (JNI, javacv, …) and are expected to be expensive to construct. */
trait MediaDecoder extends Serializable {
  def decode(payload: Array[Byte], mime: String): (Int, Int, Int) // width, height, frames
}

/** Deterministic fake: derives plausible dimensions from payload bytes —
  * stands in for the codec so the pipeline shape is testable end-to-end. */
final class FakeDecoder extends MediaDecoder {
  def decode(payload: Array[Byte], mime: String): (Int, Int, Int) = {
    val h = java.util.Arrays.hashCode(payload)
    val w = 16 + math.abs(h % 16) * 16
    val ht = 16 + math.abs((h / 16) % 16) * 16
    val frames = if (mime.startsWith("video")) 1 + math.abs(h % 30) else 1
    (w, ht, frames)
  }
}

/** Per-partition transcoder: resize a payload to fit (maxW, maxH),
  * returning the new payload and actual output dimensions. Real
  * implementations wrap an image codec; construction is expensive. */
trait MediaTranscoder extends Serializable {
  def resize(payload: Array[Byte], mime: String,
      maxW: Int, maxH: Int): (Array[Byte], Int, Int)
}

/** Deterministic stub resize: scales the [[FakeDecoder]] dimensions to
  * fit the box preserving aspect ratio, and shrinks the payload
  * proportionally to the pixel reduction (what a real re-encode roughly
  * does) — byte-deterministic so specs can pin it. */
final class FakeTranscoder extends MediaTranscoder {
  private val dec = new FakeDecoder
  def resize(payload: Array[Byte], mime: String,
      maxW: Int, maxH: Int): (Array[Byte], Int, Int) = {
    val (w, h, _) = dec.decode(payload, mime)
    val scale = math.min(1.0, math.min(maxW.toDouble / w, maxH.toDouble / h))
    val (nw, nh) = (math.max(1, (w * scale).toInt), math.max(1, (h * scale).toInt))
    val keep = math.max(1, (payload.length * (nw.toLong * nh) / (w.toLong * h)).toInt)
    (payload.take(keep), nw, nh)
  }
}

object Media {

  /** Wrap any table into the media schema: payload binary + metadata map.
    * Mirrors the reference's bulk-plane pattern (packets carry file
    * pointers, SURVEY §1.1): payloads can equally be path references
    * resolved at decode time. */
  def asMedia(df: DataFrame, idCol: String, payloadCol: String, mime: String): Dataset[MediaRow] = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(
      col(idCol).cast("long").as("media_id"),
      col(payloadCol).cast("binary").as("payload"),
      lit(mime).as("mime"),
      map(lit("src"), lit(payloadCol)).as("meta"))
      .as[MediaRow]
  }

  /** Batched decode + feature extraction: decoder built once per
    * partition (mapPartitions, not per-row UDF), rows streamed through.
    * This is the Scala analogue of the mapInPandas batch shape. */
  def extractFeatures(media: Dataset[MediaRow], mkDecoder: () => MediaDecoder,
      frameSample: Int = 4): Dataset[MediaFeatures] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.mapPartitions { rows =>
      val decoder = mkDecoder() // once per partition
      rows.map { r =>
        val (w, h, frames) = decoder.decode(r.payload, r.mime)
        val n = r.payload.length
        // strided frame sampling over the payload bytes
        val stride = math.max(1, n / math.max(frameSample, 1))
        val frameHashes = (0 until math.min(frameSample, n)).map { i =>
          val off = i * stride
          val end = math.min(off + stride, n)
          var acc = 1125899906842597L
          var j = off
          while (j < end) { acc = acc * 31 + r.payload(j); j += 1 }
          acc
        }.toArray
        MediaFeatures(r.media_id, n.toLong, w, h, frames,
          frameHashes.foldLeft(17L)(_ * 31 + _), frameHashes)
      }
    }
  }

  /** Ingest raw on-disk media: Spark's binaryFile source reads each file
    * as (path, modificationTime, length, content) with the payload kept
    * opaque — the production ingestion path (fixture tests fake payloads
    * from text). media_id is the leading integer of the file's base name;
    * source path and size ride along as metadata. */
  def fromBinaryFiles(spark: org.apache.spark.sql.SparkSession, dir: String,
      mime: String): Dataset[MediaRow] = {
    import spark.implicits._
    spark.read.format("binaryFile").load(dir)
      .select(
        regexp_extract(col("path"), "([0-9]+)[^/]*$", 1).cast("long").as("media_id"),
        col("content").as("payload"),
        lit(mime).as("mime"),
        map(lit("src"), col("path"),
          lit("len"), col("length").cast("string")).as("meta"))
      .as[MediaRow]
  }

  /** Batched resize: transcoder built once per partition, payloads
    * streamed through; output rows carry the new dimensions in `meta`
    * (out_w/out_h) next to the untouched source metadata. The write-side
    * of a thumbnail/normalization pass. */
  def resizeTo(media: Dataset[MediaRow], maxW: Int, maxH: Int,
      mkTranscoder: () => MediaTranscoder): Dataset[MediaRow] = {
    require(maxW >= 1 && maxH >= 1, s"target box must be positive: ${maxW}x$maxH")
    val spark = media.sparkSession
    import spark.implicits._
    media.mapPartitions { rows =>
      val t = mkTranscoder() // once per partition
      rows.map { r =>
        val (bytes, w, h) = t.resize(r.payload, r.mime, maxW, maxH)
        r.copy(payload = bytes,
          meta = r.meta + ("out_w" -> w.toString) + ("out_h" -> h.toString))
      }
    }
  }

  /** Frame sampling: one output row per KEPT frame (every `everyN`-th),
    * payload sliced per frame by the stub in lieu of a codec. The
    * iterator flatMap streams frames — a 10k-frame video never
    * materializes whole in memory, and downstream per-frame work
    * (embedding, hashing) parallelizes over frames, not videos. */
  def sampleFrames(media: Dataset[MediaRow], everyN: Int,
      mkDecoder: () => MediaDecoder): Dataset[MediaFrame] = {
    require(everyN >= 1, s"everyN must be >= 1, got $everyN")
    val spark = media.sparkSession
    import spark.implicits._
    media.mapPartitions { rows =>
      val decoder = mkDecoder() // once per partition
      rows.flatMap { r =>
        val (_, _, frames) = decoder.decode(r.payload, r.mime)
        val stride = math.max(1, r.payload.length / math.max(frames, 1))
        (0 until frames by everyN).iterator.map { i =>
          val off = math.min(i * stride, math.max(r.payload.length - 1, 0))
          val end = math.min(off + stride, r.payload.length)
          MediaFrame(r.media_id, i, frames,
            java.util.Arrays.copyOfRange(r.payload, off, end),
            r.meta + ("frame" -> i.toString))
        }
      }
    }
  }

  /** Repartition a media set by byte budget, not row count — payload sizes
    * are wildly skewed, so partitions are sized by total bytes per task. */
  def repartitionByBytes(media: Dataset[MediaRow], targetBytesPerPartition: Long): Dataset[MediaRow] = {
    // coalesce: sum() is NULL on an empty dataset
    val totalBytes = media.select(coalesce(sum(length(col("payload"))), lit(0L))).head().getLong(0)
    val parts = math.max(1, (totalBytes / math.max(targetBytesPerPartition, 1L)).toInt)
    media.repartition(parts)
  }

  /** Fixed-stride frame signatures, expression-level (codegen, no UDF):
    * the payload splits into `frameBytes`-sized frames (the last partial
    * frame kept), each hashed — the per-frame fingerprint table behind
    * frame-level video/image-sequence dedup. Works on any string/binary
    * payload column via substring. */
  def frameSignatures(df: DataFrame, idCol: String, payloadCol: String,
      frameBytes: Int): DataFrame = {
    require(frameBytes >= 1, s"frameBytes must be >= 1, got $frameBytes")
    df.select(col(idCol).as("media_id"), col(payloadCol).as("p"))
      .filter(length(col("p")) > 0)
      .select(col("media_id"), explode(expr(
        s"sequence(0, CAST((length(p) - 1) DIV $frameBytes AS INT))"))
        .as("frame_idx"), col("p"))
      .select(col("media_id"), col("frame_idx").cast("long").as("frame_idx"),
        md5(expr(s"substring(p, frame_idx * $frameBytes + 1, $frameBytes)"))
          .as("h"))
  }

  /** Frame-overlap near-dup pairs — the multimodal dedup verdict: for
    * every media pair sharing at least `minShared` DISTINCT frame
    * signatures, the shared count and the containment ppm against the
    * smaller side (a clip cut from a longer video reaches ~10⁶ even
    * though Jaccard is low — the q159 containment rule, frame-aligned).
    * Frames shared by more than `maxFrameDocs` media (intros, color
    * bars, black frames) are excluded from pairing by an aggregate +
    * broadcast anti-join — the LSH band-cap convention; one hot frame
    * would otherwise pair every video against every other.
    *
    * Scale shape: signatures are one map-side explode; pairing is a
    * self-join on the frame HASH (hash-partitionable, collision-sized);
    * the per-pair count and the two distinct-frame-count lookups shuffle
    * pair/media-sized tables only. */
  def frameOverlap(sigs: DataFrame, minShared: Int = 2,
      maxFrameDocs: Int = 1000): DataFrame = {
    require(minShared >= 1, s"minShared must be >= 1, got $minShared")
    require(maxFrameDocs >= 2, s"maxFrameDocs must be >= 2, got $maxFrameDocs")
    val dist = sigs.select(col("media_id"), col("h")).distinct()
    val hot = dist.groupBy(col("h")).agg(count(lit(1)).as("n"))
      .filter(col("n") > maxFrameDocs).select(col("h"))
    val cold = dist.join(broadcast(hot), Seq("h"), "left_anti")
    val nf = dist.groupBy(col("media_id")).agg(count(lit(1)).as("nf"))
    cold.as("a").join(cold.as("b"),
        col("a.h") === col("b.h") && col("a.media_id") < col("b.media_id"))
      .groupBy(col("a.media_id").as("id_a"), col("b.media_id").as("id_b"))
      .agg(count(lit(1)).as("shared_frames"))
      .filter(col("shared_frames") >= minShared)
      .join(nf.select(col("media_id").as("id_a"), col("nf").as("nf_a")), Seq("id_a"))
      .join(nf.select(col("media_id").as("id_b"), col("nf").as("nf_b")), Seq("id_b"))
      .select(col("id_a"), col("id_b"), col("shared_frames"),
        col("nf_a"), col("nf_b"),
        expr("(1000000 * shared_frames) DIV least(nf_a, nf_b)")
          .as("containment_ppm"))
  }
}
