package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.pipelines.DedupGraphPipeline
import graft.queries.{GraphQ, TextQ}

/** Composition proof for [[DedupGraphPipeline]]: every gate served from
  * the shared materialized candidates/components cut must be VALUE-
  * identical to the standalone operator the oracle gate pins — same
  * columns, same rows, bit-for-bit (the gates share code through the
  * `*From` entry points, so this pins that the plumbing — the cut, the
  * lazy components, the parameter defaults — changes nothing).
  */
class DedupGraphPipelineSpec extends SparkSpec {

  private lazy val docs = graft.core.Tables.load(spark, sfDir, "documents")
  private lazy val graph = DedupGraphPipeline.build(docs)

  // standalone candidate set, built the way each standalone query does
  private lazy val standaloneCand =
    TextQ.lshCandidates(TextQ.minhashBands(docs))
      .filter(col("est_jaccard") >= 0.25)

  private def assertSame(got: DataFrame, want: DataFrame): Unit = {
    assert(got.columns.toSeq == want.columns.toSeq,
      s"columns ${got.columns.toSeq} vs ${want.columns.toSeq}")
    val ra = got.collect().map(_.toSeq.map(String.valueOf).mkString("|")).sorted
    val rb = want.collect().map(_.toSeq.map(String.valueOf).mkString("|")).sorted
    assert(ra.length == rb.length, s"${ra.length} vs ${rb.length} rows")
    assert(ra.sameElements(rb),
      ra.zip(rb).collectFirst { case (a, b) if a != b => s"$a != $b" }
        .getOrElse(""))
  }

  test("candidate cut is non-trivial at fixture scale") {
    assert(graph.candidates.count() > 0, "fixture must produce candidates")
    assert(graph.components.count() > 0)
  }

  test("components gate == standalone q26b operator") {
    assertSame(graph.components,
      TextQ.connectedComponents(standaloneCand))
  }

  test("bestKeeper gate == standalone q69 operator") {
    val quality = docs.select(col("doc_id"), col("n_chars"))
    assertSame(graph.bestKeeper(quality, "n_chars"),
      TextQ.keepBestPerCluster(
        TextQ.connectedComponents(standaloneCand), quality, "n_chars"))
  }

  test("editConfirmed gate == standalone q77 operator") {
    assertSame(graph.editConfirmed(), TextQ.editConfirmedPairs(docs))
  }

  test("minhashAgreement gate == standalone q128 operator") {
    assertSame(graph.minhashAgreement, TextQ.minhashAgreement(docs))
  }

  test("leakageSplit gate == standalone q81 operator") {
    assertSame(graph.leakageSplit(), TextQ.leakageSafeSplit(docs))
  }

  test("kFold gate == standalone q199 operator") {
    assertSame(graph.kFold(), TextQ.kFoldSplit(docs))
  }

  test("clusterHistogram gate == standalone q208 operator") {
    assertSame(graph.clusterHistogram, TextQ.clusterSizeHistogram(docs))
  }

  test("splitLeakage gate == standalone q134 operator") {
    assertSame(graph.splitLeakage, TextQ.splitLeakageAudit(docs))
  }

  test("pagerank gate == standalone q139 operator") {
    assertSame(graph.pagerank(), GraphQ.pagerankPpm(standaloneCand, 3))
  }

  test("canonical gate == standalone q140 operator") {
    assertSame(graph.canonical(),
      GraphQ.canonicalByCentrality(standaloneCand))
  }

  test("triangles gate == standalone q176 operator") {
    assertSame(graph.triangles, GraphQ.triangleStats(standaloneCand))
  }

  test("embeddedness gate == standalone q227 operator") {
    assertSame(graph.embeddedness, GraphQ.edgeEmbeddedness(standaloneCand))
  }

  test("communities gate == standalone q203 operator") {
    assertSame(graph.communities(), GraphQ.labelPropagation(standaloneCand, 3))
  }

  test("kCore gate == standalone q214 operator") {
    assertSame(graph.kCore(), GraphQ.kCore(standaloneCand))
  }
}
