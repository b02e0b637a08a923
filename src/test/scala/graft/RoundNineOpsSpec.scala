package graft

import org.apache.spark.sql.functions._

import graft.queries.{AnalyticsQ, EventQ}

/** Hand-computed pins for the round-9 operators (the oracle proves
  * engine parity; these prove the MATH on cases small enough to rank by
  * hand). */
class RoundNineOpsSpec extends SparkSpec {

  import spark.implicits._

  // --- q243 Kruskal–Wallis ---------------------------------------------

  test("kruskalWallisCard: separated groups by hand, exact staircase") {
    // A = {1.0, 2.0}, B = {3.0, 4.0}: ranks 1,2 vs 3,4 — full separation
    // R2_A = 6, R2_B = 14; staircase S = 36 DIV 8 terms = 4 + 24 = 28;
    // h_milli = 12000*28 DIV 20 - 3000*5 = 1800; no ties -> c_ppm = 1e6
    val ev = Seq(("a", 1.0), ("a", 2.0), ("b", 3.0), ("b", 4.0))
      .toDF("event_type", "value")
    val got = AnalyticsQ.kruskalWallisCard(ev)
      .as[(Long, Long, Long, Long, Long)].head()
    assert(got == ((2L, 4L, 1800L, 1000000L, 1800L)), got.toString)
  }

  test("kruskalWallisCard: tie correction by hand") {
    // A = {1,1}, B = {1,2}: value 1 spans ranks 1-3 (2*avg = 4), value 2
    // is rank 4. R2_A = 8, R2_B = 12; S = 8 + 18 = 26 (exact, no
    // truncation); H = 12/20*26 - 15 = 0.6; ties t3 = 24, C = 0.6 ->
    // h_adj = exactly 1.0
    val ev = Seq(("a", 1.0), ("a", 1.0), ("b", 1.0), ("b", 2.0))
      .toDF("event_type", "value")
    val got = AnalyticsQ.kruskalWallisCard(ev)
      .as[(Long, Long, Long, Long, Long)].head()
    assert(got == ((2L, 4L, 600L, 600000L, 1000L)), got.toString)
  }

  test("kruskalWallisCard: all-tied input yields C = 0 and NULL h_adj") {
    val ev = Seq(("a", 5.0), ("b", 5.0), ("c", 5.0))
      .toDF("event_type", "value")
    val r = AnalyticsQ.kruskalWallisCard(ev).head()
    assert(r.getLong(3) == 0L, r.toString)     // c_ppm
    assert(r.isNullAt(4), r.toString)          // h_adj_milli
  }

  // --- q247 Wilcoxon signed-rank ---------------------------------------

  test("signedRankCard: tied ranks, zero drop, and W+ + W- = n(n+1) by hand") {
    // per-user diffs (purchase − view, centi): +5, −3, +3, +10, and one
    // exact zero (user 5: equal sums) that must drop into n_zero.
    // |d| ranks: {3,3} share 2·avg-rank 3 each; 5 -> 6; 10 -> 8.
    // W2+ = 3+6+8 = 17, W2− = 3 (sum 20 = n(n+1)); t3 = 6;
    // z = (8.5−5)/sqrt(7.375) = 1.288804
    val ev = Seq(
      (1L, "purchase", 0.05), (1L, "view", 0.00),
      (2L, "purchase", 0.00), (2L, "view", 0.03),
      (3L, "purchase", 0.03), (3L, "view", 0.00),
      (4L, "purchase", 0.10), (4L, "view", 0.00),
      (5L, "purchase", 0.07), (5L, "view", 0.07)
    ).toDF("user_id", "event_type", "value")
    val got = AnalyticsQ.signedRankCard(ev, "purchase", "view")
      .as[(Long, Long, Long, Long, Double)].head()
    assert(got == ((4L, 1L, 17L, 3L, 1.288804)), got.toString)
  }

  test("signedRankCard: all-tied magnitudes with symmetric signs -> z = 0") {
    val ev = Seq(
      (1L, "purchase", 0.02), (1L, "view", 0.00),   // +2
      (2L, "purchase", 0.00), (2L, "view", 0.02)    // −2
    ).toDF("user_id", "event_type", "value")
    val got = AnalyticsQ.signedRankCard(ev, "purchase", "view")
      .as[(Long, Long, Long, Long, Double)].head()
    // both |d| = 2: 2·avg-rank = 3 each; W2+ = W2− = 3; t3 = 6;
    // σ² = 2·3·5/24 − 6/48 = 1.125 > 0 → z = (1.5−1.5)/σ = 0
    assert(got == ((2L, 0L, 3L, 3L, 0.0)), got.toString)
  }

  // --- q244 re-rating diff ---------------------------------------------

  test("rerateDiff emits adjustments only for calls whose charge changed") {
    // call cx at 10:00 (peak), 2 min: old tariff base 10 -> 30 centi;
    // corrected table adds a version at 30000s with base 20 -> 60 centi
    // -> adjustment +30. call cy at 05:33 (off-peak) predates the new
    // version on both sides -> identical 20 centi -> NO adjustment row.
    val cdrs = Seq(("cx", "x", 36000L, 2L), ("cy", "x", 20000L, 2L))
      .toDF("call_id", "call_type", "start_sec", "dur_min")
    val tOld = Seq(("x", 0L, 10L))
      .toDF("call_type", "valid_from", "base_centi")
    val tNew = Seq(("x", 0L, 10L), ("x", 30000L, 20L))
      .toDF("call_type", "valid_from", "base_centi")
    val got = EventQ.rerateDiff(cdrs, tOld, tNew)
      .as[(String, String, Long, Long, Long, Long, Long, Long)].collect()
    assert(got.toSeq == Seq(
      ("cx", "x", 0L, 30000L, 2L, 30L, 60L, 30L)), got.toSeq.toString)
  }

  test("rerateDiff: a tariff extension into older history books pure debits") {
    // the old table has NO version covering the call (starts before
    // every valid_from) -> rates 0 (the q195 never-drop contract); the
    // corrected table backfills valid_from 0 -> the whole charge is the
    // adjustment
    val cdrs = Seq(("c0", "x", 36000L, 1L))
      .toDF("call_id", "call_type", "start_sec", "dur_min")
    val tOld = Seq(("x", 100000L, 10L))
      .toDF("call_type", "valid_from", "base_centi")
    val tNew = Seq(("x", 0L, 10L))
      .toDF("call_type", "valid_from", "base_centi")
    val got = EventQ.rerateDiff(cdrs, tOld, tNew)
      .select("call_id", "charge_old_centi", "charge_new_centi",
        "delta_centi")
      .as[(String, Long, Long, Long)].head()
    // 1 peak minute tier-1: 10 * 1.5e6 * 1e6 DIV 1e12 = 15
    assert(got == (("c0", 0L, 15L, 15L)), got.toString)
  }
}
