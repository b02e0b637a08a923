package graft

import org.apache.spark.sql.functions._

import graft.queries.{AnalyticsQ, EventQ, WindowQ}

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
