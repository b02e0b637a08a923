package graft

import org.apache.spark.sql.functions._

import graft.pipelines.CurationPipeline

/** End-to-end composition invariants for the curation pipeline — the
  * stages are each oracle-pinned individually; this suite pins that they
  * COMPOSE: stage order respected (first cut wins), survivors carry a
  * split, rejects don't, dedup keeps exactly one member per surviving
  * near-dup family, and the whole thing is deterministic.
  */
class CurationPipelineSpec extends SparkSpec {

  import spark.implicits._

  private lazy val docs = graft.core.Tables.load(spark, sfDir, "documents")

  test("every input doc gets exactly one lineage row; survivors get a split") {
    val out = CurationPipeline.run(docs)
    assert(out.count() == docs.count(), "one row per input doc")
    assert(out.select("doc_id").distinct().count() == docs.count())
    val kept = out.filter(col("cut_stage") === CurationPipeline.KeptCode)
    assert(kept.filter(col("split").isNull).count() == 0,
      "every survivor has a split")
    assert(out.filter(col("cut_stage") =!= CurationPipeline.KeptCode)
      .filter(col("split").isNotNull).count() == 0,
      "no rejected doc carries a split")
    assert(kept.count() > 0 && kept.count() < docs.count(),
      "pipeline neither drops everything nor nothing")
  }

  test("dedup stage keeps at most one member of an exact-duplicate pair") {
    val out = CurationPipeline.run(docs)
    val kept = out.filter(col("cut_stage") === CurationPipeline.KeptCode)
      .select("doc_id")
    val dupPairs = docs.as("a").join(docs.as("b"),
        col("a.doc_id") < col("b.doc_id") &&
          sha2(col("a.text"), 256) === sha2(col("b.text"), 256))
      .select(col("a.doc_id").as("da"), col("b.doc_id").as("db"))
    val bothKept = dupPairs
      .join(kept.withColumnRenamed("doc_id", "da"), Seq("da"))
      .join(kept.withColumnRenamed("doc_id", "db"), Seq("db"))
      .count()
    assert(bothKept == 0,
      s"$bothKept exact-duplicate pairs survived dedup together")
  }

  test("cut stages are ordered: quality rejects never reappear downstream") {
    val out = CurationPipeline.run(docs)
    val counts = out.groupBy("cut_stage").count()
      .as[(Long, Long)].collect().toMap
    // the fixture corpus exercises every stage
    assert(counts.contains(CurationPipeline.CutByQuality), counts.toString)
    assert(counts.contains(CurationPipeline.CutAsDuplicate), counts.toString)
    assert(counts.contains(CurationPipeline.KeptCode), counts.toString)
  }

  test("joint-balance weights hit BOTH margins within 1 ppm of uniform") {
    // the stage's weight table: IPF raking over (source, lang) — after
    // enough rounds each margin's weighted share must be 1/n_margin
    val w = graft.queries.CurationQ.rakeWeights(docs, "source", "lang",
      rounds = 8)
    val tot = w.agg(sum(expr("CAST(o AS DECIMAL(38,0)) * weight_ppm"))
      .as("t")).as[java.math.BigDecimal].collect().head
    def marginsOk(mCol: String): Unit = {
      val m = w.groupBy(col(mCol))
        .agg(sum(expr("CAST(o AS DECIMAL(38,0)) * weight_ppm")).as("mw"))
        .as[(String, java.math.BigDecimal)].collect()
      val share = m.map { case (k, mw) =>
        k -> mw.multiply(new java.math.BigDecimal(1000000))
          .divide(tot, java.math.MathContext.DECIMAL64).doubleValue }
      val want = 1000000.0 / m.length
      share.foreach { case (k, s) =>
        assert(math.abs(s - want) <= 1.0,
          s"$mCol margin '$k': ${s}ppm vs uniform ${want}ppm")
      }
    }
    marginsOk("a")
    marginsOk("b")
  }

  test("joint-balance stage composes: per-doc copies, cuts, determinism") {
    val out = CurationPipeline.run(docs, jointBalanceCol = Some("source"))
    assert(out.count() == docs.count(), "still one lineage row per doc")
    val kept = out.filter(col("cut_stage") === CurationPipeline.KeptCode)
    assert(kept.filter(col("n_copies") < 1L).count() == 0,
      "every survivor emits at least one copy")
    // raking a skewed fixture must actually resample: some cell ≠ ×1
    assert(kept.filter(col("n_copies") =!= 1L).count() > 0,
      "balance stage changed no cell — fixture should be skewed")
    // disabled stage: n_copies is constant 1 and no CutByBalance appears
    val off = CurationPipeline.run(docs)
    assert(off.filter(col("cut_stage") === CurationPipeline.KeptCode)
      .filter(col("n_copies") =!= 1L).count() == 0)
    assert(off.filter(col("cut_stage") === CurationPipeline.CutByBalance)
      .count() == 0)
    // deterministic including the copy counts
    val a = CurationPipeline.run(docs, jointBalanceCol = Some("source"))
      .select("doc_id", "cut_stage", "n_copies")
      .as[(Long, Long, Option[Long])].collect().sortBy(_._1)
    val b = CurationPipeline.run(docs, jointBalanceCol = Some("source"))
      .select("doc_id", "cut_stage", "n_copies")
      .as[(Long, Long, Option[Long])].collect().sortBy(_._1)
    assert(a.sameElements(b))
  }

  test("pipeline is deterministic end-to-end") {
    val a = CurationPipeline.run(docs)
      .select("doc_id", "split", "cut_stage")
      .as[(Long, Option[String], Long)].collect().sortBy(_._1)
    val b = CurationPipeline.run(docs)
      .select("doc_id", "split", "cut_stage")
      .as[(Long, Option[String], Long)].collect().sortBy(_._1)
    assert(a.sameElements(b))
  }
}
