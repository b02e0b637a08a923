package graft

import org.apache.spark.sql.functions._

import graft.queries.{AnalyticsQ, EventQ, GraphQ, WindowQ}

/** Hand-computed fixtures for the round-8 hardening fixes — each pins a
  * defect shape the ADVICE review found that a random corpus fixture may
  * never exercise (open-version coverage, nested validity windows,
  * zero-usage CDRs, fully-absent Benford digits).
  */
class RoundEightOpsSpec extends SparkSpec {

  import spark.implicits._

  // --- scd2Audit running-coverage semantics ----------------------------

  test("scd2Audit flags an open version overlapping every later version") {
    // Key "a": an open (NULL valid_to) version followed by a later one.
    // A lag-of-valid_to audit reads this clean (NULL compares as
    // neither); the running-coverage audit sees +infinity and flags it.
    val dim = Seq(
      ("a", 1L, Option.empty[Long]), ("a", 5L, Some(10L)),
      // Key "b": a short version NESTED inside an earlier long one —
      // (2,3) sits inside (1,100), and (5,6) does too. Both later rows
      // overlap the running coverage (100); neither is a gap, though a
      // lag audit would flag [3,5] as a false gap.
      ("b", 1L, Some(100L)), ("b", 2L, Some(3L)), ("b", 5L, Some(6L)),
      // Key "c": a true gap — [5,10) is covered by nobody.
      ("c", 1L, Some(5L)), ("c", 10L, Some(20L)),
      // Key "d": clean contiguous versions.
      ("d", 1L, Some(5L)), ("d", 5L, Some(9L))
    ).toDF("k", "vf", "vt")
    val got = WindowQ.scd2Audit(dim, "k", "vf", "vt")
      .as[(Long, Long, Long, Long, Long, Long)].head()
    val (nKeys, nVersions, nOverlaps, nGaps, nMultiOpen, nClean) = got
    assert(nKeys == 4L && nVersions == 9L, got.toString)
    assert(nOverlaps == 3L, s"a's open-version overlap + b's two nested: $got")
    assert(nGaps == 1L, s"only c's true gap, no false gap after b's nest: $got")
    assert(nMultiOpen == 0L && nClean == 1L, got.toString)
  }

  // --- tieredCharges zero/negative usage -------------------------------

  test("tieredCharges keeps zero- and negative-usage records at charge 0") {
    val tiers = Seq((0L, 5000L, 5L), (5000L, Long.MaxValue, 3L))
    val ev = Seq(
      (1L, "z", 0.0),    // zero-duration call: a normal CDR, never dropped
      (2L, "z", -5.0),   // negative adjustment record
      (3L, "z", 10.0)    // 1000 units: 1000*5 = 5000
    ).toDF("event_id", "event_type", "value")
    val got = EventQ.tieredCharges(ev,
        expr("CAST(round(value * 100) AS BIGINT)"), tiers)
      .as[(String, Long, Long, Long, Long)].head()
    assert(got == (("z", 3L, 500L, 5000L, 5000L)),
      s"all three records rated, zero/negative at charge 0: $got")
  }

  // --- q227 edge embeddedness ------------------------------------------

  test("edgeEmbeddedness grades K4 edges vs a bridge by hand") {
    // K4 on {1,2,3,4} plus the bridge (4,5): every K4 edge is embedded
    // (two common neighbors); the bridge shares none — the exact edge an
    // ER gate cuts before closure.
    val pairs = Seq((1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L),
      (3L, 4L), (4L, 5L)).toDF("doc_a", "doc_b")
    val got = GraphQ.edgeEmbeddedness(pairs)
      .as[(Long, Long, Long, Long, Long, Long)].collect()
      .map(r => (r._1, r._2) -> ((r._3, r._6))).toMap
    // edges among {1,2,3}: cn=2, union = 3+3-2-2 = 2 -> 1e6 ppm
    assert(got((1L, 2L)) == ((2L, 1000000L)), got.toString)
    assert(got((2L, 3L)) == ((2L, 1000000L)), got.toString)
    // edges into node 4 (degree 4): cn=2, union = 3+4-2-2 = 3 -> 666666
    assert(got((1L, 4L)) == ((2L, 666666L)), got.toString)
    assert(got((3L, 4L)) == ((2L, 666666L)), got.toString)
    // the bridge: no common neighbor, emb 0
    assert(got((4L, 5L)) == ((0L, 0L)), got.toString)
    // a two-node graph: both degrees 1, denominator empty -> 0, not a throw
    val tiny = GraphQ.edgeEmbeddedness(Seq((7L, 9L)).toDF("doc_a", "doc_b"))
      .as[(Long, Long, Long, Long, Long, Long)].head()
    assert(tiny == ((7L, 9L, 0L, 1L, 1L, 0L)), tiny.toString)
  }

  // --- benfordCard absent digits ---------------------------------------

  test("benfordCard charges absent digits their full expected share") {
    // Every value leads with digit 1 => obs(1) = 1e6 ppm, obs(2..9) = 0.
    // tv_ppm must include the eight absent digits' expected shares:
    // dev(1) = 1e6 - 301030 = 698970, sum |dev(2..9)| = 698970.
    val ev = Seq.tabulate(10)(i => (i.toLong, "only1", 1.0 + i * 0.001))
      .toDF("event_id", "event_type", "value")
    val got = AnalyticsQ.benfordCard(ev)
      .as[(String, Long, Long, Long, Long)].head()
    assert(got == (("only1", 10L, 1397940L, 1L, 698970L)),
      s"tv_ppm must be 2 * 698970 with absent digits charged: $got")
  }
}
