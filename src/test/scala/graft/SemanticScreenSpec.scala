package graft

import java.nio.file.Files

import graft.etl.SemanticScreen

/** Streaming semantic-decontamination screen over a static train corpus. */
class SemanticScreenSpec extends SparkSpec {
  import spark.implicits._

  private def vec(xs: Float*): Array[Float] = xs.toArray

  test("per-batch screen flags embedding leaks; retries are idempotent") {
    implicit val ctx = spark.sqlContext
    val root = Files.createTempDirectory("graft_semscreen").toString
    val verdicts = s"$root/verdicts"
    val train = Seq(
      (1L, vec(1f, 0f, 0f, 0f)),
      (2L, vec(0f, 1f, 0f, 0f))
    ).toDF("vec_id", "embedding")
    val sink = SemanticScreen.sink(train, verdicts, bits = 2, probeHamming = 2)
    val in = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[(Long, Array[Float])]
    val q = in.toDF().toDF("vec_id", "embedding")
      .writeStream.foreachBatch(sink)
      .option("checkpointLocation", s"$root/ckpt").start()
    try {
      // batch 0: one scaled leak of train#2 + one clean orthogonal vector
      in.addData((101L, vec(0f, 3f, 0f, 0f)), (102L, vec(0f, 0f, 1f, 0f)))
      q.processAllAvailable()
      val hits = spark.read.parquet(verdicts)
        .select("eval_id", "train_id").as[(Long, Long)].collect()
      assert(hits.toSeq === Seq((101L, 2L)))
      // batch 1: all clean — its partition exists but carries no rows
      in.addData((103L, vec(0f, 0f, 0f, 1f)))
      q.processAllAvailable()
      assert(spark.read.parquet(verdicts).count() === 1)
    } finally q.stop()
    // retried redelivery of batch 0 replaces its own partition only
    sink(Seq((101L, vec(0f, 3f, 0f, 0f)), (102L, vec(0f, 0f, 1f, 0f)))
      .toDF("vec_id", "embedding"), 0L)
    val after = spark.read.parquet(verdicts)
      .select("eval_id", "train_id").as[(Long, Long)].collect()
    assert(after.toSeq === Seq((101L, 2L)))
  }
}
