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

  // --- q232 cascading taxes --------------------------------------------

  test("cascadedTaxes compounds in order and floors per step") {
    val ch = Seq((1L, 10000L)).toDF("event_id", "charge_centi")
    val got = EventQ.cascadedTaxes(ch,
        Seq(("fed", 100000L, false), ("muni", 50000L, true),
          ("reg", 15000L, true)))
      .as[(Long, Long, Long, Long, Long, Long)].head()
    // fed = 10% of 10000 = 1000 (non-cascading);
    // muni = 5% of (10000+1000) = 550 (cascading);
    // reg = 1.5% of (10000+1000+550) = 173 (floor of 173.25)
    assert(got == ((1L, 10000L, 1000L, 550L, 173L, 11723L)), got.toString)
    // the same rates NON-cascading yield a different (smaller) invoice —
    // order/cascade semantics are load-bearing, not cosmetic
    val flat = EventQ.cascadedTaxes(ch,
        Seq(("fed", 100000L, false), ("muni", 50000L, false),
          ("reg", 15000L, false)))
      .as[(Long, Long, Long, Long, Long, Long)].head()
    assert(flat == ((1L, 10000L, 1000L, 500L, 150L, 11650L)), flat.toString)
  }

  // --- q226 time-band rating: pre-1970 hour-of-day ----------------------

  test("timeBandCharges bands pre-1970 timestamps by true hour-of-day") {
    // 10:00 the day before epoch: sign-of-dividend % would read hod -14
    // (silently off-peak); floor-mod reads hod 10 — peak.
    val cdrs = Seq(("c1", "x", -86400L + 36000L, 2L))
      .toDF("call_id", "call_type", "start_sec", "dur_min")
    val tariffs = Seq(("x", -100000L, 10L))
      .toDF("call_type", "valid_from", "base_centi")
    val got = EventQ.timeBandCharges(cdrs, tariffs)
      .as[(String, String, Long, Long, Long, Long, Long)].head()
    // 2 peak minutes at tier-1: 2 * (10 * 1.5e6 * 1e6) DIV 1e12 = 30
    assert(got == (("c1", "x", -100000L, 10L, 2L, 2L, 30L)), got.toString)
  }

  test("timeBandCharges rates a call older than every tariff at 0/0") {
    // the call starts BEFORE the earliest valid_from: the LEFT as-of
    // yields a NULL version and the call must report charge 0 AND
    // peak_min 0 (an unrated call contributes no peak usage), matching
    // the oracle's base_centi IS NOT NULL minute generation
    val cdrs = Seq(("c0", "x", 36000L, 5L))  // 10:00 epoch day — peak hours
      .toDF("call_id", "call_type", "start_sec", "dur_min")
    val tariffs = Seq(("x", 100000L, 10L))   // first version is later
      .toDF("call_type", "valid_from", "base_centi")
    val got = EventQ.timeBandCharges(cdrs, tariffs)
      .select("call_id", "dur_min", "peak_min", "charge_centi")
      .as[(String, Long, Long, Long)].head()
    assert(got == (("c0", 5L, 0L, 0L)), got.toString)
  }

  // --- q233 marginal cumulative-tier rating ----------------------------

  test("marginalTieredCharges telescopes: per-record marginals sum to T(total)") {
    val tiers = Seq((0L, 5000L, 5L), (5000L, 20000L, 3L),
      (20000L, Long.MaxValue, 1L))
    // one account crossing both boundaries mid-record, plus a
    // zero-usage record that must appear with charge 0
    val ev = Seq(
      (1L, 7L, 100L, 30.0),   // u=3000, cum 3000: all tier1 -> 15000
      (2L, 7L, 200L, 40.0),   // u=4000, cum 7000: 2000@5 + 2000@3 = 16000
      (3L, 7L, 300L, 0.0),    // u=0: charge 0, accumulator unchanged
      (4L, 7L, 400L, 180.0)   // u=18000, cum 25000: 13000@3 + 5000@1 = 44000
    ).toDF("event_id", "user_id", "ts", "value")
    val got = EventQ.marginalTieredCharges(ev,
        expr("CAST(round(value * 100) AS BIGINT)"), tiers)
      .as[(Long, Long, Long, Long, Long)].collect()
      .map(r => r._1 -> ((r._4, r._5))).toMap
    assert(got == Map(1L -> ((3000L, 15000L)), 2L -> ((7000L, 16000L)),
      3L -> ((7000L, 0L)), 4L -> ((25000L, 44000L))), got.toString)
    // telescoping: sum of marginals == the closed-form total at cum=25000
    // T(25000) = 5000*5 + 15000*3 + 5000*1 = 75000
    assert(got.values.map(_._2).sum == 75000L)
  }

  // --- q234 Kaplan-Meier survival --------------------------------------

  test("kmSurvival: censored subjects leave at-risk without depressing S") {
    def d(day: Long, off: Long = 0L) = day * 86400L + off
    // horizon = day 10; gap 1 day. u1/u3 churn at lifetime-bucket 2,
    // u4 churns at 5, u2 censored at 10, u5 censored at 2.
    val ev = Seq(
      (1L, d(0)), (1L, d(2)),
      (2L, d(0)), (2L, d(10)),
      (3L, d(1)), (3L, d(3)),
      (4L, d(0)), (4L, d(5)),
      (5L, d(8)), (5L, d(10))
    ).toDF("user_id", "ts")
    val got = AnalyticsQ.kmSurvival(ev, intervalDays = 1,
        churnGapSec = 86400L)
      .as[(Long, Long, Long, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4, r._5))).toMap
    assert(got == Map(
      2L -> ((5L, 2L, 1L, 600000L)),  // (5-2)/5
      5L -> ((2L, 1L, 0L, 300000L)),  // 600000 * (2-1) DIV 2
      10L -> ((1L, 0L, 1L, 300000L))  // pure censoring: S unchanged
    ), got.toString)
  }

  // --- q230 hard negatives ---------------------------------------------

  test("hardNegatives keeps only different-label candidates under the cap") {
    def vec(xs: Double*): Seq[Float] =
      (xs ++ Seq.fill(8 - xs.length)(0.0)).map(_.toFloat)
    val emb = Seq(
      (0L, vec(1.0, 1.0, 1.0), 1),        // query (vec_id % 20 == 0)
      (1L, vec(1.0, 1.0, 1.0), 1),        // same label: excluded
      (2L, vec(1.0, 1.0, 1.0), 2),        // identical, diff label: cos 1.0 >= cap
      (3L, vec(1.0, 1.0, 0.5), 2),        // hard negative (high cos, under cap)
      (4L, vec(0.9, 0.1, 0.1), 3)         // same bucket, lower cos
    ).toDF("vec_id", "embedding", "label")
    val got = graft.queries.VectorQ.hardNegatives(emb, bits = 3, k = 2)
      .as[(Long, Long, Long, Long, Double, Long)].collect()
      .filter(_._1 == 0L).map(r => (r._3, r._6)).toSet
    assert(got == Set((3L, 1L), (4L, 2L)),
      s"expected the under-cap different-label candidates ranked: $got")
  }

  // --- q240 rank AUC ----------------------------------------------------

  test("rankAucCard: separation, exchangeability, and tie midpoint by hand") {
    def df(rows: (String, Double)*) = rows.zipWithIndex
      .map { case ((t, v), i) => (i.toLong, t, v) }
      .toDF("event_id", "event_type", "value")
    // complete separation: every a > every b -> AUC 1000
    val sep = AnalyticsQ.rankAucCard(
        df(("a", 10.0), ("a", 11.0), ("b", 1.0), ("b", 2.0)), "a", "b")
      .as[(Long, Long, Long, Long)].head()
    assert(sep == ((2L, 2L, 8L, 1000L)), sep.toString)
    // identical distributions -> AUC exactly 500 (all ties at midpoint)
    val tie = AnalyticsQ.rankAucCard(
        df(("a", 5.0), ("a", 7.0), ("b", 5.0), ("b", 7.0)), "a", "b")
      .as[(Long, Long, Long, Long)].head()
    assert(tie == ((2L, 2L, 4L, 500L)), tie.toString)
    // one a between the two b's: U = 1 win + 0 ties -> 2U=2, AUC 500
    val mid = AnalyticsQ.rankAucCard(
        df(("a", 5.0), ("b", 1.0), ("b", 9.0)), "a", "b")
      .as[(Long, Long, Long, Long)].head()
    assert(mid == ((1L, 2L, 2L, 500L)), mid.toString)
  }

  // --- q241 Spearman ----------------------------------------------------

  test("spearmanCorr scores any monotone relation exactly 1.0") {
    // y = 10^x: perfectly monotone but wildly nonlinear — Pearson is
    // dominated by the 10000 outlier, Spearman reads exactly 1
    val ev = Seq.tabulate(5)(i =>
        (i.toLong, "m", math.pow(10.0, i), s"""{"k": ${i + 1}}"""))
      .toDF("event_id", "event_type", "value", "props")
    val rho = AnalyticsQ.spearmanCorr(ev)
      .as[(String, Long, Double)].head()
    assert(rho == (("m", 5L, 1.0)), rho.toString)
    val pearson = AnalyticsQ.pearsonCorr(ev)
      .as[(String, Long, Double)].head()._3
    assert(pearson < 0.9, s"Pearson should be outlier-dominated: $pearson")
    // one swapped pair breaks perfection but stays high
    val swapped = Seq((0L, "m", 10.0, """{"k": 1}"""),
        (1L, "m", 1.0, """{"k": 2}"""), (2L, "m", 100.0, """{"k": 3}"""),
        (3L, "m", 1000.0, """{"k": 4}"""))
      .toDF("event_id", "event_type", "value", "props")
    val rho2 = AnalyticsQ.spearmanCorr(swapped)
      .as[(String, Long, Double)].head()._3
    assert(rho2 > 0.5 && rho2 < 1.0, rho2.toString)
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
