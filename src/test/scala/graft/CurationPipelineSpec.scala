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
