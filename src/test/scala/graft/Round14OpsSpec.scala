package graft

import org.apache.spark.sql.functions._

import graft.queries.{AnalyticsQ, CurationQ, RoutingQ}

/** Hand-computed pins for the round-14 wave: Cochran's Q (q324),
  * Kendall τ (q325), Mann–Kendall (q326), seasonal backtest (q327),
  * average precision (q328), Brier decomposition (q329), Nelson–Aalen
  * (q330), Cramér's V² (q331), IRSF (q332), EWMA chart (q333). */
class Round14OpsSpec extends SparkSpec {

  import spark.implicits._

  // ---- q324 Cochran's Q ---------------------------------------------------

  test("cochran Q: k=2 reduces to McNemar's uncorrected chi2, a " +
      "unanimous panel keeps NULL Q and a false flag, a strict rater " +
      "in a k=3 panel flags") {
    // k = 2: Q == uncorrected McNemar chi2 (the textbook identity)
    val two = Seq.fill(12)((true, false)) ++ Seq.fill(2)((false, true)) ++
      Seq.fill(6)((true, true))
    val df2 = two.toDF("a", "b")
    val q2 = AnalyticsQ.cochranQ(df2, Seq(col("a"), col("b")))
      .select(col("q_milli")).as[Option[Long]].head()
    val m2 = AnalyticsQ.mcnemarCard(df2, col("a"), col("b"))
      .select(col("chi2_milli")).as[Option[Long]].head()
    // d = 10: chi2 = 100*1000/14 = 7142 milli
    assert(q2 == m2 && q2 == Some(7142L), s"q=$q2 mcnemar=$m2")

    // unanimous: every item all-true or all-false -> denominator 0
    val unan = (Seq.fill(4)((true, true, true)) ++
      Seq.fill(4)((false, false, false))).toDF("a", "b", "c")
    val u = AnalyticsQ.cochranQ(unan, Seq(col("a"), col("b"), col("c")))
      .select(col("q_milli"), col("treatments_differ"))
      .as[(Option[Long], Boolean)].head()
    assert(u == ((None, false)), u.toString)

    // one strict rater: a/b pass 10/10, c passes 0 -> flags
    val strict = Seq.fill(10)((true, true, false)).toDF("a", "b", "c")
    val st = AnalyticsQ.cochranQ(strict,
        Seq(col("a"), col("b"), col("c")))
      .select(col("s_total"), col("q_milli"), col("treatments_differ"))
      .as[(Long, Option[Long], Boolean)].head()
    // L_i = 2 each: S = 20, sl2 = 40; G = (10,10,0): num = 2*(3*200-400)
    // = 400, den = 60-40 = 20 -> Q = 20.0
    assert(st == ((20L, Some(20000L), true)), st.toString)
  }

  // ---- q325 Kendall tau ---------------------------------------------------

  test("kendall tau: monotone series scores ±1e6, the pair partition " +
      "identity holds, a singleton series keeps NULL stats") {
    val rows = Seq(
      ("up", 1L, 1L, 10L), ("up", 2L, 2L, 20L), ("up", 3L, 3L, 30L),
      ("dn", 1L, 1L, 30L), ("dn", 2L, 2L, 20L), ("dn", 3L, 3L, 10L),
      ("tie", 1L, 1L, 5L), ("tie", 2L, 1L, 9L), ("tie", 3L, 2L, 9L),
      ("solo", 1L, 7L, 7L))
      .toDF("g", "o", "x", "y")
    val out = AnalyticsQ.kendallTauSeries(rows, "g", "o", "x", "y")
      .orderBy(col("g"))
      .select(col("g"), col("n_obs"), col("n_pairs"), col("concordant"),
        col("discordant"), col("ties_x"), col("ties_y"), col("ties_xy"),
        col("tau_a_ppm"))
      .as[(String, Long, Option[Long], Option[Long], Option[Long],
        Option[Long], Option[Long], Option[Long], Option[Long])]
      .collect().toSeq
    assert(out.find(_._1 == "up").get ==
      (("up", 3L, Some(3L), Some(3L), Some(0L), Some(0L), Some(0L),
        Some(0L), Some(1000000L))))
    assert(out.find(_._1 == "dn").get._9 == Some(-1000000L))
    // tie: pairs (1,2) x tied y up -> ties_x; (1,3) concordant;
    // (2,3) x up y tied -> ties_y; tau = (1-0)/3
    assert(out.find(_._1 == "tie").get ==
      (("tie", 3L, Some(3L), Some(1L), Some(0L), Some(1L), Some(1L),
        Some(0L), Some(333333L))))
    assert(out.find(_._1 == "solo").get ==
      (("solo", 1L, None, None, None, None, None, None, None)))
    // partition identity: C + D + ties = n(n-1)/2 everywhere
    out.filter(_._3.isDefined).foreach { r =>
      assert(r._3.get == r._4.get + r._5.get + r._6.get + r._7.get
        + r._8.get, r.toString)
    }
  }

  // ---- q326 Mann-Kendall --------------------------------------------------

  test("mann-kendall: a strict ramp flags with direction +1, a " +
      "constant series keeps zero variance unflagged with NULL " +
      "direction, a stationary series stays quiet") {
    val ramp = (1L to 12L).map(i => ("ramp", i, 100L + i))
    val const = (1L to 12L).map(i => ("const", i, 5L))
    val flat = (1L to 12L).map(i => ("flat", i, 10L + (i % 2)))
    val out = AnalyticsQ.mannKendallTest(
        (ramp ++ const ++ flat).toDF("g", "o", "x"), "g", "o", "x")
      .orderBy(col("g"))
      .select(col("g"), col("n_obs"), col("s_stat"), col("var_num18"),
        col("trending"), col("direction"))
      .as[(String, Long, Long, Long, Boolean, Option[Int])]
      .collect().toSeq
    val r = out.find(_._1 == "ramp").get
    // n=12 untied: S = 66, VN = 12*11*29 = 3828; (65^2)*18e7 > 384e5*3828
    assert(r == (("ramp", 12L, 66L, 3828L, true, Some(1))), r.toString)
    val c = out.find(_._1 == "const").get
    assert(c == (("const", 12L, 0L, 0L, false, None)), c.toString)
    val f = out.find(_._1 == "flat").get
    assert(!f._5 && f._3.abs < 12, f.toString)
  }

  // ---- q327 seasonal backtest --------------------------------------------

  test("seasonal backtest: an exact period-7 cycle gives the seasonal " +
      "lag zero error and the win, a short series keeps NULL stats") {
    val cyc = (0 until 21).map(i =>
      ("cyc", i.toLong, 100L + 50L * (i % 7)))
    val short = (0 until 5).map(i => ("short", i.toLong, i.toLong))
    val out = AnalyticsQ.seasonalBacktest(
        (cyc ++ short).toDF("g", "o", "y"), "g", "o", "y", period = 7)
      .select(col("g"), col("n_obs"), col("n_eval"),
        col("sae_seasonal"), col("sae_naive"), col("smase_milli"),
        col("seasonal_beats_naive"))
      .as[(String, Long, Long, Option[Long], Option[Long], Option[Long],
        Option[Boolean])].collect().toSeq
    val c = out.find(_._1 == "cyc").get
    // 14 evaluable rows; seasonal error 0; naive |step| = 50 six times
    // then 300 at each wrap: per 7 days = 6*50+300 = 600, 2 full weeks
    assert(c == (("cyc", 21L, 14L, Some(0L), Some(1200L), Some(0L),
      Some(true))), c.toString)
    assert(out.find(_._1 == "short").get ==
      (("short", 5L, 0L, None, None, None, None)))
  }

  // ---- q328 average precision --------------------------------------------

  test("average precision: the textbook ranked list scores exactly, " +
      "all-negative labels keep NULL AP, short lists divide by n") {
    // ranking by score desc: ids 1..5, labels T,F,T,F,T
    val rows = Seq((1L, 500000L, true), (2L, 400000L, false),
      (3L, 300000L, true), (4L, 200000L, false), (5L, 100000L, true))
    val out = CurationQ.averagePrecisionCard(
        rows.toDF("id", "score_ppm", "label"))
      .select(col("n"), col("n_pos"), col("ap_ppm"), col("p10_ppm"),
        col("p100_ppm"))
      .as[(Long, Long, Option[Long], Long, Long)].head()
    // AP = (1/1 + 2/3 + 3/5)/3 = (1000000 + 666666 + 600000)/3
    assert(out == ((5L, 3L, Some(755555L), 600000L, 600000L)),
      out.toString)
    val neg = CurationQ.averagePrecisionCard(
        rows.map { case (i, s, _) => (i, s, false) }
          .toDF("id", "score_ppm", "label"))
      .select(col("ap_ppm")).as[Option[Long]].head()
    assert(neg.isEmpty, s"all-negative AP must be NULL: $neg")
  }

  // ---- q329 Brier decomposition ------------------------------------------

  test("brier decomposition: a perfect scorer zeroes brier and " +
      "reliability with resolution = uncertainty; a base-rate scorer " +
      "zeroes resolution with brier = uncertainty") {
    val perfect = (Seq.fill(6)((1000000L, true)) ++
      Seq.fill(4)((0L, false))).toDF("score_ppm", "label")
    val p = CurationQ.brierDecomposition(perfect)
      .select(col("brier_ppm"), col("reliability_ppm"),
        col("resolution_ppm"), col("uncertainty_ppm"))
      .as[(Long, Long, Long, Long)].head()
    // obar = 600000: unc = 0.24, resolution = mean (acc-obar)^2 = same
    assert(p == ((0L, 0L, 240000L, 240000L)), p.toString)

    val base = (Seq.fill(6)((600000L, true)) ++
      Seq.fill(4)((600000L, false))).toDF("score_ppm", "label")
    val b = CurationQ.brierDecomposition(base)
      .select(col("brier_ppm"), col("reliability_ppm"),
        col("resolution_ppm"), col("uncertainty_ppm"))
      .as[(Long, Long, Long, Long)].head()
    // brier = .6*(.4)^2 + .4*(.6)^2 = 0.24; conf==acc in the one bin
    assert(b == ((240000L, 0L, 0L, 240000L)), b.toString)
  }

  // ---- q330 Nelson-Aalen --------------------------------------------------

  test("nelson-aalen: H cumulates the exact per-bucket d/n terms off " +
      "the same life table KM folds, and is monotone non-decreasing") {
    import java.sql.Timestamp
    // users with event spans: lifetimes 0,0,1,2 days; horizon at day 3
    def ts(day: Long) = new Timestamp(day * 86400000L)
    val ev = Seq((1L, ts(0)), (1L, ts(0)), (2L, ts(0)), (2L, ts(1)),
      (3L, ts(0)), (3L, ts(2)), (4L, ts(3)), (4L, ts(3)))
      .toDF("user_id", "ts")
    val na = AnalyticsQ.nelsonAalen(ev, intervalDays = 1,
        churnGapSec = 86400L)
      .orderBy(col("bucket"))
      .select(col("bucket"), col("n_at_risk"), col("n_churned"),
        col("h_ppm")).as[(Long, Long, Long, Long)].collect().toSeq
    // h terms: bucket by bucket (1e6*d DIV n) cumulated
    var run = 0L
    na.foreach { case (_, n, d, h) =>
      run += (1000000L * d) / n
      assert(h == run, s"cumulative hazard mismatch at $na")
    }
    assert(na == na.sortBy(_._1) &&
      na.map(_._4) == na.map(_._4).sorted, "H must be non-decreasing")
  }

  // ---- q331 Cramér's V² ---------------------------------------------------

  test("cramér V²: a deterministic 2x2 table scores 1e6, independence " +
      "scores ~0, a single-column table keeps NULL") {
    val perfect = (Seq.fill(5)(("a", "x")) ++ Seq.fill(5)(("b", "y")))
      .toDF("r", "c")
    val p = AnalyticsQ.cramersV2(perfect, "r", "c")
      .select(col("chi2_milli"), col("v2_ppm"))
      .as[(Long, Option[Long])].head()
    // chi2 = N = 10 -> 10000 milli; V2 = 1
    assert(p == ((10000L, Some(1000000L))), p.toString)

    val indep = (for { r <- Seq("a", "b"); c <- Seq("x", "y");
      _ <- 0 until 5 } yield (r, c)).toDF("r", "c")
    val i = AnalyticsQ.cramersV2(indep, "r", "c")
      .select(col("chi2_milli"), col("v2_ppm"))
      .as[(Long, Option[Long])].head()
    assert(i == ((0L, Some(0L))), i.toString)

    val single = Seq.fill(4)(("a", "x")).toDF("r", "c")
    val s1 = AnalyticsQ.cramersV2(single, "r", "c")
      .select(col("v2_ppm")).as[Option[Long]].head()
    assert(s1.isEmpty, s"1x1 table must read NULL V²: $s1")
  }

  // ---- q332 IRSF ----------------------------------------------------------

  test("irsf: the premium-pumping caller flags, a balanced caller and " +
      "an unknown-destination caller do not, zero duration keeps NULL " +
      "share unflagged") {
    val dim = Seq((1L, true), (2L, true), (3L, true), (4L, false))
      .toDF("dest", "premium")
    val calls =
      // fraudster: 10 calls, 90% duration to 3 premium dests
      (1L to 9L).map(i => (100L, 1L + (i % 3), 100L)) ++
        Seq((100L, 4L, 100L)) ++
        // normal: 10 calls, all to the non-premium dest
        (1L to 10L).map(_ => (200L, 4L, 100L)) ++
        // unknown dests (not in dim): never premium
        (1L to 10L).map(_ => (300L, 99L, 100L)) ++
        // zero-duration caller
        (1L to 10L).map(i => (400L, 1L + (i % 3), 0L))
    val out = RoutingQ.irsfCard(calls.toDF("caller", "dest", "dur_centi"),
        dim, minCalls = 10L, minPremiumSharePpm = 400000L,
        minPremiumDests = 3L)
      .orderBy(col("subscriber"))
      .select(col("subscriber"), col("n_premium_dests"),
        col("premium_share_ppm"), col("irsf_flag"))
      .as[(Long, Long, Option[Long], Boolean)].collect().toSeq
    assert(out == Seq(
      (100L, 3L, Some(900000L), true),
      (200L, 0L, Some(0L), false),
      (300L, 0L, Some(0L), false),
      (400L, 3L, None, false)), out.toString)
  }

  // ---- q334 isotonic calibration -------------------------------------------

  test("isotonic calibration: the textbook violator pools exactly, a " +
      "monotone input is returned untouched, and the fit conserves " +
      "the positive mass per block") {
    // scores 1,2,3 with rates 0.2, 0.8, 0.5: the (2,3) pair violates
    // and pools to (0.8*5 + 0.5*10)/15 = 9/15 = 0.6
    def mk(spec: Seq[(Long, Int, Int)]) = spec.flatMap { case (s, n, p) =>
      (0 until n).map(i => (s, i < p)) }.toDF("score_ppm", "label")
    val pooled = CurationQ.isotonicCalibration(
        mk(Seq((1L, 5, 1), (2L, 5, 4), (3L, 10, 5))))
      .orderBy(col("score_ppm"))
      .select(col("score_ppm"), col("cal_ppm"))
      .as[(Long, Long)].collect().toSeq
    assert(pooled == Seq((1L, 200000L), (2L, 600000L), (3L, 600000L)),
      pooled.toString)
    // already-monotone input: identity
    val id = CurationQ.isotonicCalibration(
        mk(Seq((1L, 10, 1), (2L, 10, 5), (3L, 10, 9))))
      .orderBy(col("score_ppm"))
      .select(col("cal_ppm")).as[Long].collect().toSeq
    assert(id == Seq(100000L, 500000L, 900000L), id.toString)
    // a fully reversed scorer pools to ONE block at the base rate
    val rev = CurationQ.isotonicCalibration(
        mk(Seq((1L, 10, 9), (2L, 10, 5), (3L, 10, 1))))
      .select(col("cal_ppm")).distinct().as[Long].collect().toSeq
    assert(rev == Seq(500000L), rev.toString)
  }

  // ---- q335 PR curve --------------------------------------------------------

  test("pr curve: the textbook curve computes exactly with the integer " +
      "F1 identity, recall is monotone down the thresholds") {
    // scores 3,2,1 with (n, pos) = (2,2), (2,1), (2,0); P = 3
    val rows = Seq((3L, true), (3L, true), (2L, true), (2L, false),
      (1L, false), (1L, false)).toDF("score_ppm", "label")
    val out = CurationQ.prCurve(rows)
      .orderBy(col("threshold_ppm").desc)
      .select(col("threshold_ppm"), col("n_kept"), col("tp"),
        col("precision_ppm"), col("recall_ppm"), col("f1_ppm"))
      .as[(Long, Long, Long, Long, Option[Long], Long)].collect().toSeq
    // t=3: P=1, R=2/3, F1=2*2/(2+3)=0.8; t=2: P=3/4, R=1, F1=6/7;
    // t=1: P=1/2, R=1, F1=2*3/(6+3)
    assert(out == Seq(
      (3L, 2L, 2L, 1000000L, Some(666666L), 800000L),
      (2L, 4L, 3L, 750000L, Some(1000000L), 857142L),
      (1L, 6L, 3L, 500000L, Some(1000000L), 666666L)), out.toString)
    assert(out.map(_._5.get) == out.map(_._5.get).sorted,
      "recall must be monotone as the threshold loosens")
  }

  // ---- q336 threshold pick --------------------------------------------------

  test("threshold pick: each criterion lands on its hand-computed " +
      "optimum, criterion ties break to the HIGHEST threshold, and " +
      "the no-gate cost prices missing every positive") {
    val rows = Seq((3L, true), (3L, true), (2L, true), (2L, false),
      (1L, false), (1L, false)).toDF("score_ppm", "label")
    val out = CurationQ.thresholdPick(rows, costFnMilli = 2000L,
        costFpMilli = 1000L)
      .select(col("n"), col("n_pos"), col("best_f1_threshold_ppm"),
        col("best_f1_ppm"), col("best_j_threshold_ppm"),
        col("best_j_ppm"), col("best_cost_threshold_ppm"),
        col("min_cost"), col("no_gate_cost"))
      .as[(Long, Long, Long, Long, Long, Long, Long, Long, Long)]
      .head()
    // F1: t=2 wins (857142). J: t=2 -> 10^6 - trunc(10^6/3) = 666667
    //   beats t=3 -> trunc(2*10^6/3) - 0 = 666666 (the truncation
    //   direction decides — exactly why the gate must be integer-exact
    //   in both engines). cost: t=3 fn=1 -> 2; t=2 fp=1 -> 1;
    //   t=1 fp=3 -> 3 -> t=2 wins.
    assert(out == ((6L, 3L, 2L, 857142L, 2L, 666667L, 2L, 1L, 6L)),
      out.toString)

    // tie case: a perfect scorer — J = 10^6 at every pure threshold?
    // scores 2 (all pos), 1 (all neg): J(t=2) = 10^6; J(t=1) = 0;
    // F1(t=2) = 10^6, F1(t=1) = 2P/(n+P). Degenerate all-positive
    // input: J undefined -> NULL threshold, row kept
    val allPos = Seq((5L, true), (4L, true)).toDF("score_ppm", "label")
    val deg = CurationQ.thresholdPick(allPos)
      .select(col("best_j_threshold_ppm"), col("best_j_ppm"))
      .as[(Option[Long], Option[Long])].head()
    assert(deg == ((None, None)), deg.toString)
  }

  // ---- q337 calibrated re-diagnosis ----------------------------------------

  test("calibrated reliability: after the isotonic map the card's " +
      "per-bin gap sits at the ppm truncation floor and ECE collapses") {
    // a deliberately OVERCONFIDENT scorer: claims 90% where rate is 50%
    val raw = (Seq.fill(10)((900000L, true)) ++
      Seq.fill(10)((900000L, false)) ++
      Seq.fill(10)((100000L, true)) ++ Seq.fill(30)((100000L, false)))
      .toDF("score_ppm", "label")
    val pre = CurationQ.reliabilityCard(raw)
      .select(col("ece_ppm")).as[Long].head()
    val fit = CurationQ.isotonicCalibration(raw)
      .select(col("score_ppm"), col("cal_ppm"))
    val post = CurationQ.reliabilityCard(
        raw.join(broadcast(fit), Seq("score_ppm"))
          .select(col("cal_ppm").as("score_ppm"), col("label")))
      .select(col("gap_ppm"), col("ece_ppm"))
      .as[(Long, Long)].collect().toSeq
    assert(pre > 200000L, s"fixture must start miscalibrated: $pre")
    assert(post.forall(r => r._1 <= 1L && r._2 <= 1L),
      s"calibrated gaps must sit at the truncation floor: $post")
  }

  // ---- q338 KS gate ----------------------------------------------------------

  test("ks gate: a planted location shift flags, identical samples do " +
      "not, and the inequality matches the exact replay") {
    def mk(a: Seq[Long], b: Seq[Long]) =
      (a.map(v => (v, "A")) ++ b.map(v => (v, "B"))).toDF("m", "source")
    // 40 vs 40, disjoint supports: D = 1e6 — flags at any sane n
    val shifted = AnalyticsQ.ksGate(
        mk((1L to 40L), (41L to 80L)), col("m"), "A", "B")
      .select(col("ks_ppm"), col("drifted")).as[(Long, Boolean)].head()
    assert(shifted == ((1000000L, true)), shifted.toString)
    // identical samples: D = 0, never flags
    val same = AnalyticsQ.ksGate(
        mk((1L to 40L), (1L to 40L)), col("m"), "A", "B")
      .select(col("ks_ppm"), col("drifted")).as[(Long, Boolean)].head()
    assert(same == ((0L, false)), same.toString)
    // exact boundary arithmetic: n = m = 8, one-value difference gives
    // D = 125000 ppm; 125000^2*2*64 = 2e15 < 3688880e6*16 = 5.9e16 ->
    // quiet (underpowered small samples never flag — the DKW floor)
    val small = AnalyticsQ.ksGate(
        mk((1L to 8L), (1L to 7L) :+ 99L), col("m"), "A", "B")
      .select(col("ks_ppm"), col("drifted")).as[(Long, Boolean)].head()
    assert(small == ((125000L, false)), small.toString)
  }

  // ---- q339 chi-square gate --------------------------------------------------

  test("chi2 gate: a deterministic association flags, independence " +
      "stays quiet, and a single-category margin keeps a NULL verdict") {
    // deterministic 2x2, n=40: chi2 = n = 40 -> 40000 milli*1000 =
    // 4e7 micro > 3841458 -> flags
    val assoc = (Seq.fill(20)(("a", "x")) ++ Seq.fill(20)(("b", "y")))
      .toDF("u", "v")
    val a = AnalyticsQ.chiSquareGate(assoc, "u", "v")
      .select(col("dof"), col("chi2_milli"), col("independence_rejected"))
      .as[(Long, Long, Option[Boolean])].head()
    assert(a == ((1L, 40000L, Some(true))), a.toString)
    // perfectly balanced 2x2: chi2 = 0 -> quiet
    val indep = (for { u <- Seq("a", "b"); v <- Seq("x", "y");
      _ <- 0 until 10 } yield (u, v)).toDF("u", "v")
    val i = AnalyticsQ.chiSquareGate(indep, "u", "v")
      .select(col("chi2_milli"), col("independence_rejected"))
      .as[(Long, Option[Boolean])].head()
    assert(i == ((0L, Some(false))), i.toString)
    // 1xc margin: dof = 0, untested -> NULL (never "independent")
    val one = Seq.fill(8)(("a", "x")).toDF("u", "v")
    val o = AnalyticsQ.chiSquareGate(one, "u", "v")
      .select(col("dof"), col("independence_rejected"))
      .as[(Long, Option[Boolean])].head()
    assert(o == ((0L, None)), o.toString)
  }

  // ---- q340 forecast interval ------------------------------------------------

  test("forecast interval: the hand fold gives the exact level and " +
      "residual band (including the toward-zero truncation of a " +
      "negative update), singletons keep NULL bands") {
    // alpha 0.3: lv 100 -> r=10, lv 103 -> r=-3, lv stays 103 (the
    // -900 DIV 1000 = 0 truncation) -> r=17, lv 108
    val rows = Seq(("a", 1L, 100L), ("a", 2L, 110L), ("a", 3L, 100L),
      ("a", 4L, 120L), ("solo", 1L, 5L))
    val out = AnalyticsQ.forecastIntervalCard(
        rows.toDF("g", "o", "y"), "g", "o", "y", alphaMilli = 300L,
        loPct = 10, hiPct = 90)
      .orderBy(col("g"))
      .select(col("g"), col("n_obs"), col("level"), col("lo_resid"),
        col("hi_resid"), col("next_lo"), col("next_hi"))
      .as[(String, Int, Option[Long], Option[Long], Option[Long],
        Option[Long], Option[Long])].collect().toSeq
    assert(out == Seq(
      ("a", 4, Some(108L), Some(-3L), Some(17L), Some(105L),
        Some(125L)),
      ("solo", 1, None, None, None, None, None)), out.toString)
  }

  // ---- q333 EWMA chart ----------------------------------------------------

  test("ewma chart: the fold replays the exact flooring recurrence, " +
      "the first row keeps NULL prediction, and a planted spike " +
      "alarms while steady days stay quiet") {
    val rows = Seq(("a", 1L, 100L), ("a", 2L, 110L), ("a", 3L, 100L),
      ("a", 4L, 500L), ("a", 5L, 100L))
    val out = AnalyticsQ.ewmaChart(rows.toDF("g", "o", "x"), "g", "o",
        "x", alphaMilli = 200L, limitPpm = 400000L)
      .orderBy(col("o"))
      .select(col("o"), col("pred_milli"), col("resid_milli"),
        col("alarm"))
      .as[(Long, Option[Long], Option[Long], Boolean)].collect().toSeq
    // e1 = 100000; e2 = 100000 + .2*10000 = 102000;
    // e3 = 102000 + (200*(-2000)) DIV 1000 = 101600;
    // e4 = 101600 + .2*398400 = 181280
    assert(out == Seq(
      (1L, None, None, false),
      (2L, Some(100000L), Some(10000L), false),
      (3L, Some(102000L), Some(-2000L), false),
      (4L, Some(101600L), Some(398400L), true),
      (5L, Some(181280L), Some(-81280L), true)), out.toString)
  }
}
