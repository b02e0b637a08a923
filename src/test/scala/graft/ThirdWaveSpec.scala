package graft

import org.apache.spark.sql.functions._

import graft.queries.{AnalyticsQ, CurationQ, GraphQ, PreratingQ, RoutingQ, TextQ}

/** Hand-computed pins for the round-12 third-wave cards (q298–q302):
  * the oracle proves engine parity; these prove the MATH on cases small
  * enough to work by hand. */
class ThirdWaveSpec extends SparkSpec {

  import spark.implicits._

  // --- q298 RFM ----------------------------------------------------------

  test("rfmSegments: five customers rank into the five pure segments") {
    // n = 5 → score = 5 − (rank − 1): each rank gets its own quintile.
    // c1 is best on all three axes, c5 worst; frequency ties (c3=c4=c5=1)
    // break on custkey ascending.
    val orders = Seq(
      (1L, "2024-01-10", 100.0), (1L, "2024-01-09", 100.0),
      (1L, "2024-01-08", 100.0),
      (2L, "2024-01-09", 100.0), (2L, "2024-01-08", 100.0),
      (3L, "2024-01-08", 100.0),
      (4L, "2024-01-05", 50.0),
      (5L, "2024-01-01", 10.0))
      .toDF("o_custkey", "o_orderdate", "o_totalprice")
    val got = AnalyticsQ.rfmSegments(orders).orderBy(col("custkey"))
      .select(col("custkey"), col("recency_days"), col("frequency"),
        col("monetary_centi"), col("rfm_segment"))
      .as[(Long, Long, Long, Long, Long)].collect().toSeq
    assert(got == Seq(
      (1L, 0L, 3L, 30000L, 555L),
      (2L, 1L, 2L, 20000L, 444L),
      (3L, 2L, 1L, 10000L, 333L),
      (4L, 5L, 1L, 5000L, 222L),
      (5L, 9L, 1L, 1000L, 111L)), got.toString)
  }

  test("rfmSegments: uneven quintile fill follows the explicit formula") {
    // n = 7, recency ranks 1..7: score = 5 − ((rk−1)·5) DIV 7 →
    // rk 1,2 → 5; rk 3 → 4; rk 4,5 → 3; rk 6 → 2; rk 7 → 1.
    val orders = (1 to 7).map(i =>
        (i.toLong, f"2024-01-${11 - i}%02d", 100.0))
      .toDF("o_custkey", "o_orderdate", "o_totalprice")
    val got = AnalyticsQ.rfmSegments(orders).orderBy(col("custkey"))
      .select(col("custkey"), col("r_score"))
      .as[(Long, Long)].collect().toSeq
    assert(got == Seq((1L, 5L), (2L, 5L), (3L, 4L), (4L, 3L), (5L, 3L),
      (6L, 2L), (7L, 1L)), got.toString)
  }

  // --- q299 Holt ---------------------------------------------------------

  test("holtForecast: a perfectly linear series is the fold's fixed " +
      "point — level tracks, trend equals the slope, forecast is exact") {
    // y = 100 + 10·t: seed (l, b) = (100, 10); every step keeps
    // l = y_t and b = 10 exactly (the smoothing terms cancel), so the
    // 7-step forecast is last_y + 70 with zero truncation error.
    val series = (0 to 9).map(t => ("g1", t.toLong, 100L + 10L * t))
      .toDF("g", "x", "y")
    val got = AnalyticsQ.holtForecast(series, "g", "x", "y")
      .select(col("n_obs"), col("last_y"), col("holt_level"),
        col("holt_trend"), col("forecast_7"))
      .as[(Int, Long, Long, Long, Long)].head()
    assert(got == ((10, 190L, 190L, 10L, 260L)), got.toString)
  }

  test("holtForecast: one- and two-observation series seed exactly") {
    val series = Seq(("solo", 1L, 500L),
      ("pair", 1L, 100L), ("pair", 2L, 130L)).toDF("g", "x", "y")
    val got = AnalyticsQ.holtForecast(series, "g", "x", "y")
      .orderBy(col("g"))
      .select(col("g"), col("n_obs"), col("holt_level"),
        col("holt_trend"), col("forecast_7"))
      .as[(String, Int, Long, Long, Long)].collect().toSeq
    // pair: one step over y₂ = 130 from seed (100, 30) — the linear
    // fixed point lands it exactly on (130, 30); solo: (500, 0).
    assert(got == Seq(("pair", 2, 130L, 30L, 340L),
      ("solo", 1, 500L, 0L, 500L)), got.toString)
  }

  test("holtForecast: one truncating step by hand") {
    // seed (l, b) = (100, 20); the y₂ = 120 step is the fixed point
    // (120, 20); then y₃ = 95, α = 0.3, β = 0.2:
    // l' = (300·95 + 700·140) DIV 1000 = 126500 DIV 1000 = 126
    // b' = (200·(126 − 120) + 800·20) DIV 1000 = 17200 DIV 1000 = 17
    val series = Seq(("g", 1L, 100L), ("g", 2L, 120L), ("g", 3L, 95L))
      .toDF("g", "x", "y")
    val got = AnalyticsQ.holtForecast(series, "g", "x", "y")
      .select(col("holt_level"), col("holt_trend"))
      .as[(Long, Long)].head()
    assert(got == ((126L, 17L)), got.toString)
  }

  test("holtWinters: a pure seasonal pattern is the fold's fixed " +
      "point — level flat, trend zero, seasonals exact") {
    // y = 1000 + s[t % 7] with the weekly deviations summing to 0:
    // l0 = 1000 exactly, b0 = 0, seed seasonals = the pattern, and
    // every fold step reproduces all three (the smoothing terms
    // cancel) — so the 1-step forecast is the true next value.
    val s = Seq(70L, -70L, 35L, -35L, 0L, 21L, -21L)
    val series = (0 until 21).map(t =>
      ("g", t.toLong, 1000L + s(t % 7))).toDF("g", "x", "y")
    val got = AnalyticsQ.holtWinters(series, "g", "x", "y")
      .select(col("n_obs"), col("hw_level"), col("hw_trend"),
        col("hw_seasonal_next"), col("forecast_1"))
      .as[(Int, Long, Long, Long, Long)].head()
    // n = 21 → next slot is 21 % 7 = 0 → seasonal 70
    assert(got == ((21, 1000L, 0L, 70L, 1070L)), got.toString)
  }

  test("holtWinters: series shorter than two periods keep a row with " +
      "NULL model columns") {
    val series = (0 until 10).map(t => ("g", t.toLong, 100L))
      .toDF("g", "x", "y")
    val got = AnalyticsQ.holtWinters(series, "g", "x", "y")
      .select(col("n_obs"), col("hw_level"), col("forecast_1"))
      .as[(Int, Option[Long], Option[Long])].head()
    assert(got == ((10, None, None)), got.toString)
  }

  // --- q300 CUSUM --------------------------------------------------------

  test("cusumShift: a small persistent shift alarms when the excursion " +
      "crosses h; flat and one-sided series stay clamped at zero") {
    // Reference week at y = 10 → μ = 10000 milli, k = 500, h = 12000.
    // up:   9 monitored days at 12 → C⁺ grows 1500/day, crosses 12000
    //       on the 9th (13500) at x = 16; C⁻ clamps at 0 throughout.
    // down: 5 monitored days at 7 → C⁻ grows 2500/day, crosses on the
    //       5th (12500) at x = 12.
    // flat: deviations are −500/day on BOTH sides → both clamp at 0.
    def series(g: String, post: Seq[Long]) =
      (1 to 7).map(i => (g, i.toLong, 10L)) ++
        post.zipWithIndex.map { case (y, i) => (g, 8L + i, y) }
    val df = (series("up", Seq.fill(9)(12L)) ++
      series("down", Seq.fill(5)(7L)) ++
      series("flat", Seq.fill(6)(10L))).toDF("g", "x", "y")
    val got = AnalyticsQ.cusumShift(df, "g", "x", "y")
      .orderBy(col("g"))
      .select(col("g"), col("n_monitored"), col("mu_milli"),
        col("peak_hi"), col("peak_lo"), col("alarm_x"), col("shifted"))
      .as[(String, Long, Long, Long, Long, Option[Long], Boolean)]
      .collect().toSeq
    assert(got == Seq(
      ("down", 5L, 10000L, 0L, 12500L, Some(12L), true),
      ("flat", 6L, 10000L, 0L, 0L, None, false),
      ("up", 9L, 10000L, 13500L, 0L, Some(16L), true)), got.toString)
  }

  test("cusumShift: a transient spike decays instead of latching") {
    // One +10 day inside an otherwise on-mean stream: C⁺ jumps to
    // 9500, then bleeds 500/day (y = μ costs k) — never reaches h,
    // so no alarm; the peak records the excursion.
    val df = ((1 to 7).map(i => ("g", i.toLong, 10L)) ++
      Seq(("g", 8L, 20L)) ++ (9 to 14).map(i => ("g", i.toLong, 10L)))
      .toDF("g", "x", "y")
    val got = AnalyticsQ.cusumShift(df, "g", "x", "y")
      .select(col("peak_hi"), col("alarm_x"), col("shifted"))
      .as[(Long, Option[Long], Boolean)].head()
    assert(got == ((9500L, None, false)), got.toString)
  }

  // --- q301 vocabulary growth --------------------------------------------

  test("vocabGrowth: hand corpus with genuine type growth") {
    // batchSize = 1 → batches are the docs themselves.
    // d0 "a b a": 3 tokens, types {a, b} → 2 new
    // d1 "b c":   2 tokens, {c} new
    // d2 "a d e": 3 tokens, {d, e} new
    val docs = Seq((0L, "a b a"), (1L, "b c"), (2L, "a d e"))
      .toDF("doc_id", "text")
    val got = TextQ.vocabGrowth(docs, batchSize = 1L)
      .orderBy(col("batch"))
      .as[(Long, Long, Long, Long, Long, Long)].collect().toSeq
    assert(got == Seq(
      (0L, 3L, 2L, 3L, 2L, 666666L),
      (1L, 2L, 1L, 5L, 3L, 600000L),
      (2L, 3L, 2L, 8L, 5L, 625000L)), got.toString)
  }

  test("vocabGrowth: case folding merges types; empty tokens drop; a " +
      "batch of only empty docs keeps its row with zero tokens") {
    val docs = Seq((0L, "The the  THE"), (1L, ""), (2L, "the")).toDF(
      "doc_id", "text")
    val got = TextQ.vocabGrowth(docs, batchSize = 1L)
      .orderBy(col("batch"))
      .as[(Long, Long, Long, Long, Long, Option[Long])].collect().toSeq
    // d0: double space yields an empty token that must not count.
    // d1: no tokens at all — the batch row SURVIVES with zero tokens
    // and the cumulative curve carried forward (never-drop).
    assert(got == Seq(
      (0L, 3L, 1L, 3L, 1L, Some(333333L)),
      (1L, 0L, 0L, 3L, 1L, Some(333333L)),
      (2L, 1L, 0L, 4L, 1L, Some(250000L))), got.toString)
  }

  // --- q307 plan fragmentation ---------------------------------------------

  test("planFragmentation: chains collapse to one fragment; islands " +
      "stay separate") {
    // owner 1: [0,9][10,19][30,39] — first two adjacent → 1 merge
    // pair, 2 fragments. owner 2: a single range → 1 fragment, 0 ppm.
    val ranges = Seq((0L, 9L, 1L), (10L, 19L, 1L), (30L, 39L, 1L),
      (50L, 59L, 2L)).toDF("range_start", "range_end", "account_id")
    val got = PreratingQ.planFragmentation(ranges)
      .orderBy(col("account_id"))
      .select(col("account_id"), col("n_ranges"), col("total_numbers"),
        col("n_merge_pairs"), col("n_fragments"), col("merge_ppm"))
      .as[(Long, Long, Long, Long, Long, Long)].collect().toSeq
    assert(got == Seq(
      (1L, 3L, 30L, 1L, 2L, 333333L),
      (2L, 1L, 10L, 0L, 1L, 0L)), got.toString)
  }

  test("planFragmentation: a full chain of three is one fragment") {
    val ranges = Seq((0L, 9L, 1L), (10L, 19L, 1L), (20L, 29L, 1L))
      .toDF("range_start", "range_end", "account_id")
    val got = PreratingQ.planFragmentation(ranges)
      .select(col("n_merge_pairs"), col("n_fragments"))
      .as[(Long, Long)].head()
    assert(got == ((2L, 1L)), got.toString)
  }

  // --- q308 bot cadence -----------------------------------------------------

  test("botCadenceCard: clockwork flags, human jitter survives, thin " +
      "histories never flag") {
    // bot: 11 events 60s apart → 10 gaps of 60, MAD 0, rel 0 → flag.
    // human: gaps (10,100,20,200,30,300,40,400,50,500) → lower median
    //   50, deviations' lower median 40 → rel (1000·40) DIV 50 = 800.
    // thin: 3 perfectly regular events — below the 10-gap floor.
    val bot = (0 to 10).map(i => (1L, 60L * i))
    val humanGaps = Seq(10L, 100L, 20L, 200L, 30L, 300L, 40L, 400L,
      50L, 500L)
    val human = humanGaps.scanLeft(0L)(_ + _).map(s => (2L, s))
    val thin = (0 to 2).map(i => (3L, 60L * i))
    val calls = (bot ++ human ++ thin).toDF("caller", "sec")
    val got = RoutingQ.botCadenceCard(calls).orderBy(col("caller"))
      .select(col("caller"), col("n_iet"), col("median_iet_sec"),
        col("mad_iet_sec"), col("rel_mad_milli"), col("machine_flag"))
      .as[(Long, Long, Long, Long, Option[Long], Boolean)]
      .collect().toSeq
    assert(got == Seq(
      (1L, 10L, 60L, 0L, Some(0L), true),
      (2L, 10L, 50L, 40L, Some(800L), false),
      (3L, 2L, 60L, 0L, Some(0L), false)), got.toString)
  }

  // --- q309 MMR ------------------------------------------------------------

  test("mmrRerank: the second pick trades relevance for diversity — a " +
      "near-duplicate of the first pick loses to a fresh direction") {
    // query (1,0,0); c1 = (4,3,0)/5 → cos 0.8; c2 ≈ c1 with a 0.01
    // wiggle → cos 0.799998 but sim(c2,c1) = 0.999998; c3 = (4,-3,0)/5
    // → cos 0.8 yet sim(c3,c1) = 7/25 = 0.28. Pure top-2 cosine picks
    // (c1, c2); MMR at λ=0.7 scores step 2 as
    //   c2: 700·799998 − 300·999998 = 259,999,200
    //   c3: 700·800000 − 300·280000 = 476,000,000 → c3 wins.
    val emb = Seq(
      (0L, Array(1f, 0f, 0f)),
      (1L, Array(0.8f, 0.6f, 0f)),
      (2L, Array(0.8f, 0.6f, 0.002f)),
      (3L, Array(0.8f, -0.6f, 0f))).toDF("vec_id", "embedding")
    val got = graft.queries.VectorQ.mmrRerank(emb, k = 2, m = 3)
      .orderBy(col("rank"))
      .select(col("query_id"), col("cand_id"), col("rank"),
        col("mmr_nano"))
      .as[(Long, Long, Long, Long)].collect().toSeq
    assert(got.map(r => (r._2, r._3)) == Seq((1L, 1L), (3L, 2L)),
      got.toString)
    assert(got.head._4 == 700L * 800000L, got.toString)
    assert(got(1)._4 == 700L * 800000L - 300L * 280000L, got.toString)
  }

  // --- q302 nDCG ---------------------------------------------------------

  // --- q303 HITS ---------------------------------------------------------

  test("hitsPpm: one iteration on a three-edge graph by hand") {
    // h1→a1, h1→a2, h2→a1.
    // a raw: a1 = 2e6, a2 = 1e6 → max-norm: a1 = 1e6, a2 = 500000
    // h raw: h1 = a1+a2 = 1.5e6, h2 = a1 = 1e6
    //        → max-norm: h1 = 1e6, h2 = (1e6·1e6) DIV 1.5e6 = 666666
    val edges = Seq(("h1", "a1"), ("h1", "a2"), ("h2", "a1"))
      .toDF("src", "dst")
    val got = GraphQ.hitsPpm(edges, iterations = 1)
      .orderBy(col("role"), col("node"))
      .as[(String, String, Long)].collect().toSeq
    assert(got == Seq(
      ("a1", "authority", 1000000L), ("a2", "authority", 500000L),
      ("h1", "hub", 1000000L), ("h2", "hub", 666666L)), got.toString)
  }

  test("hitsPpm: a second iteration separates hubs the first cannot") {
    // Same graph, iteration 2: a1 = h1+h2 = 1666666 → 1e6;
    // a2 = h1 = 1e6 → (1e6·1e6) DIV 1666666 = 600000;
    // h1 = 1600000 → 1e6; h2 = 1e6 → 625000.
    val edges = Seq(("h1", "a1"), ("h1", "a2"), ("h2", "a1"))
      .toDF("src", "dst")
    val got = GraphQ.hitsPpm(edges, iterations = 2)
      .orderBy(col("role"), col("node"))
      .as[(String, String, Long)].collect().toSeq
    assert(got == Seq(
      ("a1", "authority", 1000000L), ("a2", "authority", 600000L),
      ("h1", "hub", 1000000L), ("h2", "hub", 625000L)), got.toString)
  }

  // --- q304 gains/lift ----------------------------------------------------

  test("gainsDeciles: a perfect score captures all positives in the " +
      "top buckets with the exact lift") {
    // 10 rows, scores 10..1, the three positives hold the top scores.
    val df = (1 to 10).map(i =>
        (i.toLong, (11 - i).toLong, if (i <= 3) 1L else 0L))
      .toDF("id", "score", "label")
    val got = AnalyticsQ.gainsDeciles(df, "score", "label", "id")
      .orderBy(col("bucket"))
      .select(col("bucket"), col("cum_positives"), col("gain_ppm"),
        col("lift_ppm"))
      .as[(Long, Long, Long, Long)].collect().toSeq
    // lift derives from the PUBLISHED gain (gain_ppm·tn DIV cum_rows)
    // so a reader can recompute it from the table: b1 333333·10 DIV 1,
    // b3 1000000·10 DIV 3
    assert(got.take(3) == Seq(
      (1L, 1L, 333333L, 3333330L),
      (2L, 2L, 666666L, 3333330L),
      (3L, 3L, 1000000L, 3333333L)), got.toString)
    assert(got.drop(3).forall(r => r._3 == 1000000L) &&
      got.last == ((10L, 3L, 1000000L, 1000000L)), got.toString)
  }

  test("gainsDeciles: NULL scores and non-binary labels fail loudly") {
    val nullScore = Seq((1L, Option.empty[Long], 0L), (2L, Some(5L), 1L))
      .toDF("id", "score", "label")
    val e1 = intercept[IllegalArgumentException] {
      AnalyticsQ.gainsDeciles(nullScore, "score", "label", "id")
    }
    assert(e1.getMessage.contains("non-NULL"), e1.getMessage)
    val badLabel = Seq((1L, 5L, 2L)).toDF("id", "score", "label")
    val e2 = intercept[IllegalArgumentException] {
      AnalyticsQ.gainsDeciles(badLabel, "score", "label", "id")
    }
    assert(e2.getMessage.contains("{0, 1}"), e2.getMessage)
  }

  // --- q305 purchase regularity -------------------------------------------

  test("purchaseRegularity: gaps, lower median, and the single-day " +
      "never-drop row by hand") {
    // c1 orders on days 1, 4, 10 (gaps 3, 6; lower median 3;
    // mean 4500 milli); a same-day duplicate must not mint a 0 gap.
    // c2 has one order day → NULL gap stats, row kept.
    val orders = Seq(
      (1L, "2024-01-01", 1.0), (1L, "2024-01-04", 1.0),
      (1L, "2024-01-04", 1.0), (1L, "2024-01-10", 1.0),
      (2L, "2024-01-05", 1.0))
      .toDF("o_custkey", "o_orderdate", "o_totalprice")
    val got = AnalyticsQ.purchaseRegularity(orders).orderBy(col("custkey"))
      .as[(Long, Long, Long, Option[Long], Option[Long], Option[Long],
        Option[Long])].collect().toSeq
    assert(got == Seq(
      (1L, 3L, 2L, Some(3L), Some(6L), Some(4500L), Some(3L)),
      (2L, 1L, 0L, None, None, None, None)), got.toString)
  }

  // --- q306 Gopher gate ----------------------------------------------------

  test("gopherGate: bullet lists, ellipsis spam, and a clean doc get " +
      "the exact reason bits") {
    val clean = Seq.fill(10)("the data table scan merge").mkString(" ")
    val bullets = "- a b\n- c d\n- e f"
    val ellipsis = "a b...\nc d...\nx y"
    val docs = Seq((0L, clean), (1L, bullets), (2L, ellipsis),
      (3L, null.asInstanceOf[String])).toDF("doc_id", "text")
    val got = CurationQ.gopherGate(docs).orderBy(col("doc_id"))
      .select(col("doc_id"), col("reason"), col("keep"))
      .as[(Long, Long, Long)].collect().toSeq
    // clean: 50 words, mean 4200 milli, 20 stopwords → keep.
    // bullets: 6 one-char words → bits 1+2+64; 3/3 bullet lines → 8.
    // ellipsis: words split on SPACE only, so newlines ride inside
    //   tokens → 4 words ('a','b...\nc','d...\nx','y', mean 3500 — no
    //   bit 2); 2 '...' over 4 words (500000 ppm > 10%) → 4; 2/3
    //   ellipsis-ended lines → 16; too short → 1; one stopword → 64.
    //   1+4+16+64 = 85.
    // NULL text: empty → 1 + 2 + 32 + 64 = 99.
    assert(got == Seq((0L, 0L, 1L), (1L, 75L, 0L), (2L, 85L, 0L),
      (3L, 99L, 0L)), got.toString)
  }

  test("ndcgAtK: a perfect ranking scores exactly 1e6 ppm") {
    val df = Seq((1L, 9.0, 1L, 3L), (1L, 8.0, 2L, 2L), (1L, 7.0, 3L, 0L))
      .toDF("q", "s", "t", "rel")
    val got = AnalyticsQ.ndcgAtK(df, "q", "s", "t", "rel")
      .select(col("ndcg_ppm")).as[Long].head()
    assert(got == 1000000L, got.toString)
  }

  test("ndcgAtK: a reversed two-item ranking pays the rank-2 discount") {
    // Actual: pos1 rel 0, pos2 rel 3 → DCG = 3·630930 = 1892790
    // Ideal:  rel 3 first → IDCG = 3·10⁶ → nDCG = 630930 ppm
    val df = Seq((1L, 9.0, 1L, 0L), (1L, 5.0, 2L, 3L)).toDF(
      "q", "s", "t", "rel")
    val got = AnalyticsQ.ndcgAtK(df, "q", "s", "t", "rel")
      .select(col("dcg_micro"), col("idcg_micro"), col("ndcg_ppm"))
      .as[(Long, Long, Long)].head()
    assert(got == ((1892790L, 3000000L, 630930L)), got.toString)
  }

  test("ndcgAtK: NULL rank-domain columns and negative grades fail " +
      "loudly instead of silently shifting positions") {
    val nullScore = Seq((1L, Some(9.0), 1L, 1L), (1L, None, 2L, 1L))
      .toDF("q", "s", "t", "rel")
    val e1 = intercept[IllegalArgumentException] {
      AnalyticsQ.ndcgAtK(nullScore, "q", "s", "t", "rel")
    }
    assert(e1.getMessage.contains("non-NULL"), e1.getMessage)
    val negRel = Seq((1L, 9.0, 1L, -1L)).toDF("q", "s", "t", "rel")
    val e2 = intercept[IllegalArgumentException] {
      AnalyticsQ.ndcgAtK(negRel, "q", "s", "t", "rel")
    }
    assert(e2.getMessage.contains("non-negative"), e2.getMessage)
  }

  test("ndcgAtK: items beyond k never contribute, and an all-zero " +
      "query reads NULL, not a fake zero") {
    // k = 2: the rel-3 item sits at pos 3 in BOTH orders... except the
    // ideal order promotes it to pos 1 — so DCG counts only the two
    // rel-1s and IDCG counts (3, 1).
    val df = Seq(
      (1L, 9.0, 1L, 1L), (1L, 8.0, 2L, 1L), (1L, 7.0, 3L, 3L),
      (2L, 9.0, 1L, 0L), (2L, 8.0, 2L, 0L)).toDF("q", "s", "t", "rel")
    val got = AnalyticsQ.ndcgAtK(df, "q", "s", "t", "rel", k = 2)
      .orderBy(col("q"))
      .as[(Long, Long, Long, Option[Long])].collect().toSeq
    // q1: DCG = 1·10⁶ + 1·630930; IDCG = 3·10⁶ + 1·630930
    assert(got == Seq(
      (1L, 1630930L, 3630930L, Some((1630930L * 1000000L) / 3630930L)),
      (2L, 0L, 0L, None)), got.toString)
  }
}
