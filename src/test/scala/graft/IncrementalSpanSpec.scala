package graft

import java.nio.file.Files

import org.apache.spark.sql.DataFrame

import graft.etl.IncrementalSpanDedup
import graft.queries.TextQ

/** Span-hash-store incremental dedup: a delta batch learns which of its
  * passages already exist anywhere in history without re-reading corpus
  * text, and the result agrees with the full-corpus spanDuplication run.
  */
class IncrementalSpanSpec extends SparkSpec {

  import spark.implicits._

  private def toks(p: String, a: Int, b: Int) =
    (a to b).map(i => s"$p$i").mkString(" ")

  private val history = Seq(
    (1L, toks("h", 1, 12)),             // the block doc 100 will re-use
    (2L, toks("g", 1, 10))
  )

  private def cover(df: DataFrame): Map[Long, (Long, Long)] =
    df.select($"doc_id", $"n_dup_spans", $"covered_tokens")
      .as[(Long, Long, Long)].collect().map(t => t._1 -> (t._2, t._3)).toMap

  test("delta coverage: history passages found, fresh text untouched") {
    val store = Files.createTempDirectory("graft_spanstore").toString + "/spans"
    IncrementalSpanDedup.initStore(history.toDF("doc_id", "text"), store)

    val delta = Seq(
      (100L, toks("h", 1, 12) + " " + toks("u", 1, 4)), // 12-token verbatim reuse
      (101L, toks("v", 1, 10))                          // genuinely new
    ).toDF("doc_id", "text")
    val r = cover(IncrementalSpanDedup.coverageDelta(spark, delta, store))
    // doc 100: spans at starts 0..4 hit the store -> 12 covered tokens
    assert(r(100L) == ((5L, 12L)), s"got $r")
    assert(r(101L) == ((0L, 0L)))

    // history grows: after append, a copy of doc 101's text is caught
    IncrementalSpanDedup.append(delta, store)
    val again = Seq((200L, toks("v", 1, 10))).toDF("doc_id", "text")
    val r2 = cover(IncrementalSpanDedup.coverageDelta(spark, again, store))
    assert(r2(200L) == ((3L, 10L)), s"got $r2")
  }

  test("within-batch repeats mark without any history") {
    val empty = Seq.empty[Long].toDF("h")
    val delta = Seq(
      (10L, toks("w", 1, 8)), (11L, toks("w", 1, 8)), (12L, toks("x", 1, 8))
    ).toDF("doc_id", "text")
    val r = cover(IncrementalSpanDedup.coverageDelta(delta, empty, width = 8))
    assert(r(10L) == ((1L, 8L)) && r(11L) == ((1L, 8L)))
    assert(r(12L) == ((0L, 0L)))
  }

  test("delta against store == full spanDuplication restricted to the delta") {
    val store = Files.createTempDirectory("graft_spanstore2").toString + "/spans"
    val hist = history.toDF("doc_id", "text")
    IncrementalSpanDedup.initStore(hist, store)
    val delta = Seq(
      (100L, toks("h", 1, 12) + " " + toks("u", 1, 9)),
      (101L, toks("z", 1, 9) + " " + toks("z", 1, 9)), // self-repeating
      (102L, toks("q", 1, 20))
    ).toDF("doc_id", "text")
    val inc = cover(IncrementalSpanDedup.coverageDelta(spark, delta, store))
    val full = cover(TextQ.spanDuplication(hist.union(delta), width = 8)
      .filter($"doc_id" >= 100L))
    assert(inc == full, s"incremental $inc vs full $full")
  }

  test("sink: a retried micro-batch replaces its output and never self-matches") {
    val base = Files.createTempDirectory("graft_spansink").toString
    val store = s"$base/store"; val covPath = s"$base/cov"
    val sink = IncrementalSpanDedup.sink(spark, store, covPath)
    val b0 = Seq((1L, toks("h", 1, 12))).toDF("doc_id", "text")
    sink(b0, 0L)
    val b1 = Seq((2L, toks("h", 1, 12))).toDF("doc_id", "text")
    sink(b1, 1L)
    sink(b1, 1L) // retry: must overwrite, not append or self-match
    val cov = spark.read.parquet(covPath)
      .select($"batch_id", $"doc_id", $"covered_tokens")
      .as[(Long, Long, Long)].collect().toSet
    assert(cov == Set((0L, 1L, 0L), (1L, 2L, 12L)), s"got $cov")
    // store holds exactly the two batches' distinct hashes once each
    val perBatch = spark.read.parquet(store).groupBy($"batch_id").count()
      .as[(Long, Long)].collect().toMap
    assert(perBatch == Map(0L -> 5L, 1L -> 5L), s"got $perBatch")
  }
}
