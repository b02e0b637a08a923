package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.pipelines.{CurationPipeline, DedupGraphPipeline}
import graft.queries.CurationQ

/** Dev probe for the FULL curation run with REAL sinks (not noop):
  * dedup-graph audit sinks (canonical verdict + cluster histogram to
  * parquet) plus the verdict → dedup → joint-balance → split →
  * shard-plan → partitioned parquet write chain, at 1× and 10×. The
  * question it answers: do the lineage cuts hold when actual I/O is in
  * the path (a write re-executes its whole upstream unless the cuts
  * are materialized), and what does the end-to-end wall look like when
  * the output is durable bytes instead of a noop materialize. Prints
  * one line per scale for SCALING.md.
  */
object EndToEndProbe {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = core.GraftSession.builder(s"local[$cpus]", cpus.toInt).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val oneX = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val tenX = sys.env.getOrElse("SPARK_GRAFT_SCALE_DIR", "/tmp/graft_scale")
    val outBase = sys.env.getOrElse("SPARK_GRAFT_E2E_OUT", "/tmp/graft_e2e")
    def time(f: => Unit): Double = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }

    def run(dir: String, out: String): Unit = {
      val docs = core.Tables.load(spark, dir, "documents")
      // dedup-graph audit sinks: the gates a real run persists before
      // deciding its keep policy, both fed from ONE materialized cut
      val g = DedupGraphPipeline.build(docs)
      g.canonical().write.mode("overwrite").parquet(s"$out/canonical")
      g.clusterHistogram.write.mode("overwrite").parquet(s"$out/histogram")
      // curation chain: verdict -> dedup -> mixture -> joint balance ->
      // split, then shard-plan the survivors and write the corpus
      // partitioned by split (the dataloader layout)
      val lineage = CurationPipeline
        .run(docs, jointBalanceCol = Some("source"))
        .localCheckpoint() // feeds the survivor filter AND the write below
      val survivors = lineage
        .filter(col("cut_stage") === CurationPipeline.KeptCode)
        .select(col("doc_id"), col("split"), col("n_copies"))
        .join(docs, Seq("doc_id"))
      val shards = CurationQ.planShards(survivors, tokenBudget = 50000L)
        .select(col("doc_id"), col("shard_id"))
      survivors.join(shards, Seq("doc_id"))
        .write.mode("overwrite").partitionBy("split")
        .parquet(s"$out/corpus")
      lineage.write.mode("overwrite").parquet(s"$out/lineage")
    }

    Seq("1x" -> oneX, "10x" -> tenX).foreach { case (label, dir) =>
      val out = s"$outBase/$label"
      run(dir, out) // warm (plans + page cache; output overwritten below)
      val t = Seq.fill(2)(time(run(dir, out))).min
      val nOut = spark.read.parquet(s"$out/corpus").count()
      println(f"e2e $label wall=$t%.2fs corpus_rows=$nOut")
    }
    spark.stop()
  }
}
