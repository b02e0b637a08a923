package graft

import org.apache.spark.sql.functions._

import graft.queries.{AnalyticsQ, TextQ}

/** Hand-computed pins for the round-9 second-wave statistical operators
  * (the oracle proves engine parity; these prove the MATH on cases small
  * enough to rank by hand). */
class SecondWaveSpec extends SparkSpec {

  import spark.implicits._

  // --- q251 Friedman -----------------------------------------------------

  test("friedmanCard: reversed blocks cancel to chi2 = 0") {
    // Block 1 ranks A<B<C, block 2 reverses: every rank sum is equal.
    val ev = Seq(
      ("b1", "A", 0.01), ("b1", "B", 0.02), ("b1", "C", 0.03),
      ("b2", "A", 0.03), ("b2", "B", 0.02), ("b2", "C", 0.01))
      .toDF("b0", "event_type", "value")
    val got = AnalyticsQ.friedmanCard(ev, col("b0"))
      .as[(Long, Long, Long, Long, Long)].head()
    assert(got == ((3L, 2L, 0L, 1000000L, 0L)), got.toString)
  }

  test("friedmanCard: consistent ordering hits the n(k-1) maximum") {
    // Both blocks rank A<B<C: R2 = (4, 8, 12), S = 224,
    // chi2 = 3*224/24 - 24 = 4 = n(k-1) — the full-consistency maximum.
    val ev = Seq(
      ("b1", "A", 0.01), ("b1", "B", 0.02), ("b1", "C", 0.03),
      ("b2", "A", 0.02), ("b2", "B", 0.03), ("b2", "C", 0.04))
      .toDF("b0", "event_type", "value")
    val got = AnalyticsQ.friedmanCard(ev, col("b0"))
      .as[(Long, Long, Long, Long, Long)].head()
    assert(got == ((3L, 2L, 4000L, 1000000L, 4000L)), got.toString)
  }

  test("friedmanCard: within-block tie takes average ranks + correction") {
    // One block, A = B < C: r2 = (3, 3, 6), S = 54,
    // chi2 = 13500/12 - 12000 milli = 1500; ties t3 = 2^3-2 = 6,
    // C = 1 - 6/(1*3*8) = 0.75 -> adjusted 2000 milli.
    val ev = Seq(("b1", "A", 0.01), ("b1", "B", 0.01), ("b1", "C", 0.02))
      .toDF("b0", "event_type", "value")
    val got = AnalyticsQ.friedmanCard(ev, col("b0"))
      .as[(Long, Long, Long, Long, Long)].head()
    assert(got == ((3L, 1L, 1500L, 750000L, 2000L)), got.toString)
  }

  test("friedmanCard: incomplete blocks are excluded from the design") {
    // b2 misses treatment C entirely -> only b1 counts (n_blocks = 1).
    val ev = Seq(
      ("b1", "A", 0.01), ("b1", "B", 0.02), ("b1", "C", 0.03),
      ("b2", "A", 0.05), ("b2", "B", 0.06))
      .toDF("b0", "event_type", "value")
    val got = AnalyticsQ.friedmanCard(ev, col("b0"))
      .select("n_blocks").as[Long].head()
    assert(got == 1L, s"n_blocks $got")
  }

  // --- q252 Poisson bootstrap ---------------------------------------------

  test("bootstrapMeanCi: constant metric collapses the interval exactly") {
    val docs = (1L to 200L).map(i => (i, 42L)).toDF("doc_id", "n_chars")
    val got = AnalyticsQ.bootstrapMeanCi(docs)
      .as[(Long, Long, Double, Double, Double)].head()
    assert(got == ((200L, 64L, 42.0, 42.0, 42.0)), got.toString)
  }

  test("bootstrapMeanCi: deterministic across runs and ordered") {
    val docs = (1L to 500L).map(i => (i, i % 97L)).toDF("doc_id", "n_chars")
    val a = AnalyticsQ.bootstrapMeanCi(docs)
      .as[(Long, Long, Double, Double, Double)].head()
    val b = AnalyticsQ.bootstrapMeanCi(
        docs.repartition(7)) // physical layout must not matter
      .as[(Long, Long, Double, Double, Double)].head()
    assert(a == b, s"$a vs $b")
    assert(a._4 <= a._5, s"ci_lo ${a._4} > ci_hi ${a._5}")
    assert(a._4 <= a._3 && a._3 <= a._5,
      s"full mean ${a._3} outside [${a._4}, ${a._5}]")
  }

  // --- q254 commitment true-up ---------------------------------------------

  test("commitmentTrueup: shortfall bills the gap, surplus bills nothing") {
    val d1 = java.sql.Date.valueOf("2024-01-01")
    val d2 = java.sql.Date.valueOf("2024-02-01")
    val usage = Seq(
      (1L, d1, 60L), (1L, d2, 150L), // commit 100: short 40, then over
      (2L, d1, 5L))                  // commit 0: never short
      .toDF("account_id", "m", "amount_centi")
    val commits = Seq((1L, 100L), (2L, 0L)).toDF("account_id", "commit_centi")
    val got = graft.queries.BillingQ.commitmentTrueup(usage, commits)
      .orderBy("month").as[(String, Long, Long, Long, Long)].collect().toSeq
    assert(got == Seq(
      ("2024-01-01", 2L, 1L, 65L, 40L),
      ("2024-02-01", 1L, 0L, 150L, 0L)), got.toString)
  }

  // --- q255 reliability card -------------------------------------------------

  test("reliabilityCard: per-bin gaps and volume-weighted ECE by hand") {
    // bin 0: scores 50000/50000, labels F/T -> conf 50000, acc 500000,
    //   gap 450000; bin 9: score 950000, label T -> gap 50000.
    // ECE = (2*450000 + 1*50000) DIV 3 = 316666.
    val sc = Seq((50000L, false), (50000L, true), (950000L, true))
      .toDF("score_ppm", "label")
    val got = graft.queries.CurationQ.reliabilityCard(sc)
      .orderBy("bin")
      .as[(Long, Long, Long, Long, Long, Long, Long)].collect().toSeq
    assert(got == Seq(
      (0L, 2L, 1L, 50000L, 500000L, 450000L, 316666L),
      (9L, 1L, 1L, 950000L, 1000000L, 50000L, 316666L)), got.toString)
  }

  test("reliabilityCard: a perfectly calibrated score has ECE 0") {
    // Every score 500000, half the labels positive.
    val sc = (1 to 100).map(i => (500000L, i % 2 == 0))
      .toDF("score_ppm", "label")
    val got = graft.queries.CurationQ.reliabilityCard(sc)
      .select("ece_ppm").as[Long].head()
    assert(got == 0L, s"ece $got")
  }

  test("reliabilityCard: the top bin absorbs the exact-1e6 boundary") {
    val sc = Seq((1000000L, true)).toDF("score_ppm", "label")
    val got = graft.queries.CurationQ.reliabilityCard(sc)
      .select("bin").as[Long].head()
    assert(got == 9L, s"bin $got")
  }

  // --- q253 source-overlap sketch -----------------------------------------

  test("sourceOverlapSketch: identical sources match all lanes, disjoint none") {
    val docs = (
      (1L to 30L).map(i => (i, s"text $i", "a")) ++
        (1L to 30L).map(i => (i + 100L, s"text $i", "b")) ++ // a clone of a
        (1L to 30L).map(i => (i + 200L, s"other $i", "c"))   // disjoint
      ).toDF("doc_id", "text", "source")
    val got = TextQ.sourceOverlapSketch(docs)
      .orderBy("src_x", "src_y")
      .as[(String, String, Long, Long, Long)].collect().toSeq
    assert(got == Seq(
      ("a", "b", 12L, 12L, 1000000L),
      ("a", "c", 12L, 0L, 0L),
      ("b", "c", 12L, 0L, 0L)), got.toString)
  }

  test("sourceOverlapSketch: estimate is insensitive to duplicate rows") {
    // MinHash works on SETS: repeating a doc inside a source must not
    // move any lane minimum.
    val base = (1L to 20L).map(i => (i, s"t$i", "a")) ++
      (1L to 10L).map(i => (i + 50L, s"t$i", "b"))
    val dups = base ++ Seq((999L, "t3", "b"), (998L, "t3", "b"))
    val g1 = TextQ.sourceOverlapSketch(base.toDF("doc_id", "text", "source"))
      .select("n_match").as[Long].head()
    val g2 = TextQ.sourceOverlapSketch(dups.toDF("doc_id", "text", "source"))
      .select("n_match").as[Long].head()
    assert(g1 == g2, s"$g1 vs $g2")
  }
}
