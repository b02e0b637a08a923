package graft

/** Dev probe: q180's DP wall-clock across `dpBatch` settings at sf0.1 —
  * the measured basis for the batched-relaxation default (SCALING.md
  * tokenizer section). Env: SPARK_GRAFT_SF_DIR, SPARK_GRAFT_UG_BATCHES
  * (default "1,4,6"), SPARK_GRAFT_CPUS. Each setting runs twice
  * (warm-up + timed). */
object UnigramDpProbe {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = core.GraftSession.builder(s"local[$cpus]", cpus.toInt).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val docs = core.Tables.load(spark, dir, "documents")
    val batches = sys.env.getOrElse("SPARK_GRAFT_UG_BATCHES", "1,4,6")
      .split(",").map(_.trim.toInt).toSeq
    def run(k: Int): Double = {
      val t0 = System.nanoTime()
      queries.TokenizerQ.unigramSegmentCosts(docs, dpBatch = k)
        .write.format("noop").mode("overwrite").save()
      (System.nanoTime() - t0) / 1e9
    }
    batches.foreach { k =>
      run(k)
      println(f"unigram dpBatch=$k wall=${run(k)}%.2fs")
    }
    spark.stop()
  }
}
