package graft

import org.apache.spark.sql.functions._

/** Dev probe: per-batch cost of the streaming quality+novelty sink
  * ([[graft.streaming.QualityMonitor.sinkWithNovelty]]) as the signature
  * STORE grows — the claim under test is that a micro-batch's cost is
  * batch-sized + bucket-collision-sized, with only a flat store SCAN
  * growing as history accumulates (never a store shuffle or a
  * corpus-sized join).
  *
  * Protocol: N batches of `SPARK_GRAFT_STREAM_BATCH` synthetic docs
  * (seeded RNG text over a shared vocabulary — novel content each batch,
  * realistic band-bucket distribution), driven directly through the
  * foreachBatch body; per batch print wall seconds and store rows so
  * far. A final batch RE-SENDS batch 1's content under fresh ids — the
  * 100%-duplicate case whose cost bounds the collision-side work and
  * whose card must alarm on novelty. Results → SCALING.md.
  */
object StreamingSinkProbe {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = core.GraftSession.builder(s"local[$cpus]", cpus.toInt).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    val batchSize = sys.env.getOrElse("SPARK_GRAFT_STREAM_BATCH", "5000").toInt
    val nBatches = sys.env.getOrElse("SPARK_GRAFT_STREAM_N", "12").toInt
    val base = sys.env.getOrElse("SPARK_GRAFT_STREAM_DIR", "/tmp/graft_streamprobe")
    val cardPath = s"$base/cards"
    val storePath = s"$base/store"
    val fs = new org.apache.hadoop.fs.Path(base)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.delete(new org.apache.hadoop.fs.Path(base), true)

    val vocab = {
      val rnd = new scala.util.Random(7L)
      Vector.fill(5000)((1 to (3 + rnd.nextInt(7)))
        .map(_ => ('a' + rnd.nextInt(26)).toChar).mkString)
    }
    def batchDocs(id: Int) = {
      val rnd = new scala.util.Random(1000L + id)
      (0 until batchSize).map { i =>
        val text = (1 to 80 + rnd.nextInt(40))
          .map(_ => vocab(rnd.nextInt(vocab.size))).mkString(" ")
        (id.toLong * 1000000L + i, text)
      }.toDF("doc_id", "text").repartition(cpus.toInt)
    }

    val sink = streaming.QualityMonitor.sinkWithNovelty(spark,
      refRejectPpm = 0L, cardPath, storePath)
    def drive(label: String, id: Long, docs: org.apache.spark.sql.DataFrame): Unit = {
      val t0 = System.nanoTime()
      sink(docs, id)
      val dt = (System.nanoTime() - t0) / 1e9
      val store = spark.read.parquet(storePath).count()
      val cardRow = spark.read.parquet(cardPath)
        .filter(col("batch_id") === id)
        .select("novel_ppm", "alarm").collect().head
      println(f"stream batch=$id%3d $label wall=$dt%.2fs store_rows=$store " +
        f"novel_ppm=${cardRow.getLong(0)} alarm=${cardRow.getBoolean(1)}")
    }
    (1 to nBatches).foreach(i => drive("novel", i.toLong, batchDocs(i)))
    drive("dup-resend", nBatches + 1L,
      batchDocs(1).withColumn("doc_id", col("doc_id") + 500000000L))
    spark.stop()
  }
}
