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

  test("repartitionByBytes sizes partitions by payload volume") {
    val m = mediaSet()
    val total = m.selectExpr("sum(length(payload))").as[Long].head()
    val parts = Media.repartitionByBytes(m, total / 8).rdd.getNumPartitions
    assert(parts == 8)
  }

  test("repartitionByBytes handles an empty media set") {
    val empty = mediaSet().filter(col("media_id") < 0)
    assert(Media.repartitionByBytes(empty, 1024).rdd.getNumPartitions == 1)
  }
}
