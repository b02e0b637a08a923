package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.pipelines.DedupGraphPipeline
import graft.queries.{GraphQ, TextQ}

/** Dev probe for the composed [[DedupGraphPipeline]]: at 1× (sf0.1) and
  * 10× (the ScaleProbe replica), measure the COMPOSED wall — one
  * candidate build + components, then all 14 gates materialized — next
  * to the SUM of the standalone operators (each rebuilding its own
  * candidate pipeline, which is exactly what the bench suite measures
  * per query). Both sides call the same operator functions WITHOUT the
  * oracle fixtures' final orderBy, so the comparison isolates the
  * candidate-rebuild cost, not output-sort noise. Prints one line per
  * scale with composed/standalone-sum/ratio for SCALING.md.
  */
object DedupGraphProbe {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = core.GraftSession.builder(s"local[$cpus]", cpus.toInt).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val oneX = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val tenX = sys.env.getOrElse("SPARK_GRAFT_SCALE_DIR", "/tmp/graft_scale")
    def noop(df: DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()
    def time(f: => Unit): Double = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }

    def composed(docs: DataFrame): Unit = {
      val quality = docs.select(col("doc_id"), col("n_chars"))
      val g = DedupGraphPipeline.build(docs)
      noop(g.components)
      noop(g.bestKeeper(quality, "n_chars"))
      noop(g.editConfirmed())
      noop(g.minhashAgreement)
      noop(g.leakageSplit())
      noop(g.kFold())
      noop(g.clusterHistogram)
      noop(g.splitLeakage)
      noop(g.pagerank())
      noop(g.canonical())
      noop(g.triangles)
      noop(g.embeddedness)
      noop(g.communities())
      noop(g.kCore())
    }

    def standaloneSum(docs: DataFrame): Double = {
      val quality = docs.select(col("doc_id"), col("n_chars"))
      def cand() = TextQ.lshCandidates(TextQ.minhashBands(docs))
        .filter(col("est_jaccard") >= 0.25)
      val gates: Seq[(String, () => DataFrame)] = Seq(
        "q26b" -> (() => TextQ.connectedComponents(cand())),
        "q69" -> (() => TextQ.keepBestPerCluster(
          TextQ.connectedComponents(cand()), quality, "n_chars")),
        "q77" -> (() => TextQ.editConfirmedPairs(docs)),
        "q128" -> (() => TextQ.minhashAgreement(docs)),
        "q81" -> (() => TextQ.leakageSafeSplit(docs)),
        "q199" -> (() => TextQ.kFoldSplit(docs)),
        "q208" -> (() => TextQ.clusterSizeHistogram(docs)),
        "q134" -> (() => TextQ.splitLeakageAudit(docs)),
        "q139" -> (() => GraphQ.pagerankPpm(cand(), 3)),
        "q140" -> (() => GraphQ.canonicalByCentrality(cand())),
        "q176" -> (() => GraphQ.triangleStats(cand())),
        "q227" -> (() => GraphQ.edgeEmbeddedness(cand())),
        "q203" -> (() => GraphQ.labelPropagation(cand(), 3)),
        "q214" -> (() => GraphQ.kCore(cand())))
      gates.map { case (_, g) => time(noop(g())) }.sum
    }

    Seq("1x" -> oneX, "10x" -> tenX).foreach { case (label, dir) =>
      val docs = core.Tables.load(spark, dir, "documents")
      composed(docs) // warm (plans + page cache)
      val tc = Seq.fill(2)(time(composed(docs))).min
      val ts = standaloneSum(docs)
      println(f"dedup_graph $label composed=$tc%.2fs standalone_sum=$ts%.2fs " +
        f"speedup=${ts / tc}%.2fx")
    }
    spark.stop()
  }
}
