package graft

import graft.multimodal.{FakeDecoder, Media}
import org.apache.spark.sql.functions._

class MediaSpec extends SparkSpec {

  import spark.implicits._

  private def mediaSet() = {
    val docs = graft.core.Tables.load(spark, sfDir, "documents")
    Media.asMedia(docs, "doc_id", "text", "video/mp4")
  }

  test("media schema wraps payload as binary with metadata") {
    val m = mediaSet()
    val st = m.schema
    assert(st("payload").dataType.typeName == "binary")
    assert(st("meta").dataType.typeName == "map")
    assert(m.count() == 500)
  }

  test("feature extraction runs batched per partition and is deterministic") {
    val f1 = Media.extractFeatures(mediaSet(), () => new FakeDecoder)
      .collect().sortBy(_.media_id)
    val f2 = Media.extractFeatures(mediaSet().repartition(7), () => new FakeDecoder)
      .collect().sortBy(_.media_id)
    assert(f1.length == 500)
    // repartitioning must not change any feature (decoder is per-row pure)
    assert(f1.map(_.fingerprint).sameElements(f2.map(_.fingerprint)))
    assert(f1.forall(f => f.n_frames >= 1 && f.width >= 16 && f.frame_hashes.length == 4))
    // n_bytes matches the source text length (ASCII corpus)
    val lens = graft.core.Tables.load(spark, sfDir, "documents")
      .select(col("doc_id"), length(col("text")).cast("long")).as[(Long, Long)].collect().toMap
    assert(f1.forall(f => f.n_bytes == lens(f.media_id)))
  }

  test("resizeTo shrinks payloads into the box, preserving aspect and determinism") {
    val dec = new FakeDecoder
    val resized = Media.resizeTo(mediaSet(), 64, 64, () => new graft.multimodal.FakeTranscoder)
      .collect().sortBy(_.media_id)
    val originals = mediaSet().collect().sortBy(_.media_id)
    assert(resized.length == originals.length)
    resized.zip(originals).foreach { case (r, o) =>
      val (w0, h0, _) = dec.decode(o.payload, o.mime)
      val (w, h) = (r.meta("out_w").toInt, r.meta("out_h").toInt)
      assert(w <= 64 && h <= 64, s"${r.media_id}: ${w}x$h not in box")
      assert(r.payload.length <= o.payload.length)
      // aspect ratio preserved within integer truncation
      if (w0 >= h0) assert(w >= h) else assert(h >= w)
      // no-op when already inside the box
      if (w0 <= 64 && h0 <= 64) assert(w == w0 && h == h0)
    }
    val again = Media.resizeTo(mediaSet().repartition(5), 64, 64,
      () => new graft.multimodal.FakeTranscoder).collect().sortBy(_.media_id)
    assert(resized.map(_.payload.length).sameElements(again.map(_.payload.length)))
  }

  test("sampleFrames yields every Nth frame as its own row") {
    val dec = new FakeDecoder
    val media = mediaSet()
    val frames = Media.sampleFrames(media, everyN = 3, () => new FakeDecoder)
      .collect().groupBy(_.media_id)
    media.collect().foreach { m =>
      val (_, _, n) = dec.decode(m.payload, m.mime)
      val expected = (0 until n by 3).toArray
      val got = frames(m.media_id).map(_.frame_idx).sorted
      assert(got.sameElements(expected), s"media ${m.media_id}: ${got.toSeq}")
      assert(frames(m.media_id).forall(_.n_frames == n))
      assert(frames(m.media_id).forall(f => f.meta("frame") == f.frame_idx.toString))
    }
  }

  test("repartitionByBytes sizes partitions by payload volume") {
    val m = mediaSet()
    val total = m.selectExpr("sum(length(payload))").as[Long].head()
    val parts = Media.repartitionByBytes(m, total / 8).rdd.getNumPartitions
    assert(parts == 8)
  }

  test("binaryFile source ingests on-disk media files as opaque payloads") {
    val dir = java.nio.file.Files.createTempDirectory("graft_binmedia")
    (1 to 5).foreach { i =>
      java.nio.file.Files.write(dir.resolve(s"${i}_clip.bin"),
        Array.fill(i * 100)(i.toByte))
    }
    val m = Media.fromBinaryFiles(spark, dir.toString, "video/mp4")
    val rows = m.collect().sortBy(_.media_id)
    assert(rows.map(_.media_id).sameElements(Array(1L, 2L, 3L, 4L, 5L)))
    assert(rows.forall(r => r.payload.length == r.media_id * 100))
    assert(rows.forall(r => r.meta("len").toLong == r.payload.length))
    // ingested rows flow straight into the feature extractor
    val feats = Media.extractFeatures(m, () => new FakeDecoder).collect()
    assert(feats.length == 5 && feats.forall(_.n_bytes > 0))
  }

  test("repartitionByBytes handles an empty media set") {
    val empty = mediaSet().filter(col("media_id") < 0)
    assert(Media.repartitionByBytes(empty, 1024).rdd.getNumPartitions == 1)
  }

  test("frameOverlap: a clip cut from a longer video reads full containment") {
    import spark.implicits._
    val long = ("abcd" * 8) + ("efgh" * 8) + ("ijkl" * 8) // 3 16-byte x2 frames
    val clip = "abcd" * 8                                  // the first segment
    val other = "zzzz" * 24
    val df = Seq((1L, long), (2L, clip), (3L, other)).toDF("media_id", "payload")
    val sigs = Media.frameSignatures(df, "media_id", "payload", frameBytes = 16)
    val got = Media.frameOverlap(sigs, minShared = 1)
      .as[(Long, Long, Long, Long, Long, Long)].collect()
    assert(got.length == 1, got.toSeq.toString)
    val (a, b, shared, nfA, nfB, cont) = got.head
    assert((a, b) == ((1L, 2L)))
    // clip frames are all inside the long video: containment = 1e6
    assert(shared == nfB && cont == 1000000L, got.head.toString)
    assert(nfA > nfB)
  }

  test("frameOverlap: hot frames are excluded from pairing") {
    import spark.implicits._
    // every media shares one 'intro' frame; cap 2 excludes it, so no pairs
    val intro = "i" * 16
    val df = (1L to 4L).map(i => (i, intro + (i.toString * 16)))
      .toDF("media_id", "payload")
    val sigs = Media.frameSignatures(df, "media_id", "payload", frameBytes = 16)
    assert(Media.frameOverlap(sigs, minShared = 1, maxFrameDocs = 2)
      .count() == 0)
    // with the cap relaxed the intro frame pairs everyone
    assert(Media.frameOverlap(sigs, minShared = 1, maxFrameDocs = 1000)
      .count() == 6)
  }
}
