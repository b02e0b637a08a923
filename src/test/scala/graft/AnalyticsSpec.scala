package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.queries.{AnalyticsQ, TextQ}

/** Hand-computed fixtures for the event-analytics operators (AnalyticsQ)
  * and the round-4 text additions; the sf0.01 oracle gate checks the same
  * code at scale, this pins the SEMANTICS on cases small enough to verify
  * by eye (funnel ordering rules, tiebreaks, caps).
  */
class AnalyticsSpec extends SparkSpec {

  private def events(rows: (Long, Long, String, String, Double)*): DataFrame = {
    import spark.implicits._
    rows.toSeq.toDF("event_id", "user_id", "event_type", "ts_s", "value")
      .withColumn("ts", to_timestamp(col("ts_s")))
      .drop("ts_s")
  }

  test("funnelReach counts stage reach with strict temporal ordering") {
    val ev = events(
      (1, 1, "view", "2024-01-01 00:00:01", 0.0),
      (2, 1, "click", "2024-01-01 00:00:02", 0.0),
      (3, 1, "purchase", "2024-01-01 00:00:03", 0.0),
      // user 2: click BEFORE first view — must not count at stage 2
      (4, 2, "click", "2024-01-01 00:00:01", 0.0),
      (5, 2, "view", "2024-01-01 00:00:02", 0.0),
      // user 3: skips click — must not count at stage 2 or 3
      (6, 3, "view", "2024-01-01 00:00:01", 0.0),
      (7, 3, "purchase", "2024-01-01 00:00:02", 0.0),
      // user 4: click at the SAME instant as view — >= counts it
      (8, 4, "view", "2024-01-01 00:00:01", 0.0),
      (9, 4, "click", "2024-01-01 00:00:01", 0.0))
    val got = AnalyticsQ.funnelReach(ev, Seq("view", "click", "purchase"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    assert(got.toSeq == Seq((1L, "view", 4L), (2L, "click", 2L),
      (3L, "purchase", 1L)))
  }

  test("attributionCredit: first/last/linear models, exact ppm per conversion") {
    val ev = events(
      // user 1: view@1, click@2 -> purchase@3 (both in window)
      (1, 1, "view", "2024-01-01 00:00:01", 0.0),
      (2, 1, "click", "2024-01-01 00:00:02", 0.0),
      (3, 1, "purchase", "2024-01-01 00:00:03", 0.0),
      // user 2: three views -> linear 333333+333333+333334 (remainder to last)
      (4, 2, "view", "2024-01-01 00:00:01", 0.0),
      (5, 2, "view", "2024-01-01 00:00:02", 0.0),
      (6, 2, "view", "2024-01-01 00:00:03", 0.0),
      (7, 2, "purchase", "2024-01-01 00:00:04", 0.0),
      // user 3: conversion with NO touch in window -> (none)
      (8, 3, "purchase", "2024-01-01 00:00:05", 0.0),
      // user 4: touch AFTER conversion and touch OUTSIDE window: excluded
      (9, 4, "purchase", "2024-01-01 12:00:00", 0.0),
      (10, 4, "click", "2024-01-01 12:00:01", 0.0),
      (11, 4, "view", "2023-12-30 00:00:00", 0.0))
    val got = AnalyticsQ.attributionCredit(ev, Seq("view", "click"),
        "purchase", windowSec = 3600L)
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
          r.getLong(5)))).toMap
    // (none): users 3 and 4 (user 4's touches are out of window)
    assert(got("(none)") == ((2L, 2L, 2000000L, 2000000L, 2000000L)),
      got.toString)
    // view: first of conv1 (1e6) + all of conv2's first (1e6);
    //       last of conv2 (1e6); linear 500000 + 1000000
    assert(got("view") == ((2L, 4L, 2000000L, 1000000L, 1500000L)),
      got.toString)
    // click: conv1's last touch
    assert(got("click") == ((1L, 1L, 0L, 1000000L, 500000L)), got.toString)
    // credit conservation: every model sums to 1e6 x 4 conversions
    assert(Seq(3, 4, 5).forall(i =>
      got.values.map(v => i match {
        case 3 => v._3; case 4 => v._4; case 5 => v._5
      }).sum == 4000000L))
  }

  test("chiSquareCard: perfect association scores phi2 = 1, independence 0") {
    import spark.implicits._
    val assoc = Seq(("s1", "en"), ("s1", "en"), ("s1", "en"),
      ("s2", "de"), ("s2", "de"), ("s2", "de")).toDF("source", "lang")
    val a = AnalyticsQ.chiSquareCard(assoc, "source", "lang")
      .select("n_rows", "dof", "chi2_milli", "phi2_micro")
      .as[(Long, Long, Long, Long)].collect().head
    // 2x2, N=6: every cell (incl. the two UNOBSERVED zero cells)
    // contributes 1500 milli -> chi2 = 6.000 = N, phi2 = 1
    assert(a == ((6L, 1L, 6000L, 1000000L)), a.toString)
    val indep = Seq(("s1", "en"), ("s1", "de"), ("s2", "en"), ("s2", "de"))
      .toDF("source", "lang")
    val i = AnalyticsQ.chiSquareCard(indep, "source", "lang")
      .select("chi2_milli", "phi2_micro").as[(Long, Long)].collect().head
    assert(i == ((0L, 0L)), i.toString)
  }

  test("seasonalAnomalies: a quiet same-weekday day flags; steady weekdays don't") {
    import spark.implicits._
    // four Mondays with counts 5,5,5,1 and four steady Tuesdays (3 each)
    def day(base: String, week: Int, cnt: Int, idBase: Int) =
      (0 until cnt).map { k =>
        (idBase + week * 100 + k.toLong, 1L, "error",
          f"2024-01-${base.toInt + week * 7}%02d 10:00:${k}%02d", 0.0)
      }
    val rows = (0 to 3).flatMap(w => day("01", w, if (w == 3) 1 else 5, 1000)) ++
      (0 to 3).flatMap(w => day("02", w, 3, 5000))
    val ev = events(rows: _*)
    val got = AnalyticsQ.seasonalAnomalies(ev, threshold = 1.5)
      .select("day", "n").as[(String, Long)].collect().toSet
    // z of the quiet Monday = (4*1-16)/sqrt(4*76-256) = -1.7321
    assert(got == Set(("2024-01-22", 1L)), got.toString)
  }

  test("conversionLagBands: exact P50/P95 over first-view->first-purchase lags") {
    val ev = events(
      // lags 10, 20, 30, 40 across four users
      (1, 1, "view", "2024-01-01 00:00:00", 0.0),
      (2, 1, "purchase", "2024-01-01 00:00:10", 0.0),
      (3, 2, "view", "2024-01-01 00:00:00", 0.0),
      (4, 2, "purchase", "2024-01-01 00:00:20", 0.0),
      (5, 2, "purchase", "2024-01-01 00:01:40", 0.0), // later one ignored
      (6, 3, "view", "2024-01-01 00:00:00", 0.0),
      (7, 3, "purchase", "2024-01-01 00:00:30", 0.0),
      (8, 4, "view", "2024-01-01 00:00:00", 0.0),
      (9, 4, "purchase", "2024-01-01 00:00:40", 0.0),
      // purchase BEFORE any view: excluded
      (10, 5, "purchase", "2024-01-01 00:00:01", 0.0),
      (11, 5, "view", "2024-01-01 00:00:02", 0.0),
      // view with no purchase: excluded
      (12, 6, "view", "2024-01-01 00:00:00", 0.0))
    import spark.implicits._
    val got = AnalyticsQ.conversionLagBands(ev, "view", "purchase")
      .select("n_conversions", "p500", "p950")
      .as[(Long, Long, Long)].collect().head
    assert(got == ((4L, 20L, 40L)), got.toString)
  }

  test("burstinessCard: exact Fano factor per type, zero for a metronome") {
    val ev = events(
      // steady: 2 events on each of 3 days -> variance 0, fano 0
      (1, 1, "view", "2024-01-01 01:00:00", 0.0),
      (2, 1, "view", "2024-01-01 02:00:00", 0.0),
      (3, 1, "view", "2024-01-02 01:00:00", 0.0),
      (4, 1, "view", "2024-01-02 02:00:00", 0.0),
      (5, 1, "view", "2024-01-03 01:00:00", 0.0),
      (6, 1, "view", "2024-01-03 02:00:00", 0.0),
      // bursty: 1 then 5 -> pop var 4, mean 3 -> fano 1333 milli
      (7, 1, "error", "2024-01-01 01:00:00", 0.0),
      (8, 1, "error", "2024-01-02 01:00:00", 0.0),
      (9, 1, "error", "2024-01-02 02:00:00", 0.0),
      (10, 1, "error", "2024-01-02 03:00:00", 0.0),
      (11, 1, "error", "2024-01-02 04:00:00", 0.0),
      (12, 1, "error", "2024-01-02 05:00:00", 0.0))
    import spark.implicits._
    val got = AnalyticsQ.burstinessCard(ev)
      .select("event_type", "n_days", "mean_milli", "fano_milli")
      .as[(String, Long, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    assert(got("view") == ((3L, 2000L, 0L)), got.toString)
    assert(got("error") == ((2L, 3000L, 1333L)), got.toString)
  }

  test("churnLifeTable: censoring, per-bucket hazard, reverse at-risk") {
    val ev = events(
      // u1: lifetime 2 days, last seen day 2 -> churned (gap 8d), bucket 2
      (1, 1, "click", "2024-01-01 00:00:00", 0.0),
      (2, 1, "click", "2024-01-03 00:00:00", 0.0),
      // u2: last event AT the horizon -> censored, bucket 10
      (3, 2, "click", "2024-01-01 00:00:00", 0.0),
      (4, 2, "click", "2024-01-11 00:00:00", 0.0),
      // u3: single event, gap exactly one day -> NOT censored (strict <)
      (5, 3, "click", "2024-01-10 00:00:00", 0.0),
      // u4: single event half a day before horizon -> censored
      (6, 4, "click", "2024-01-10 12:00:00", 0.0))
    import spark.implicits._
    val got = AnalyticsQ.churnLifeTable(ev, intervalDays = 1,
        churnGapSec = 86400L)
      .select("bucket", "n_at_risk", "n_churned", "n_censored", "hazard_ppm")
      .as[(Long, Long, Long, Long, Long)].collect().sortBy(_._1)
    assert(got.toSeq == Seq(
      (0L, 4L, 1L, 1L, 250000L),
      (2L, 2L, 1L, 0L, 500000L),
      (10L, 1L, 0L, 1L, 0L)), got.toSeq.toString)
  }

  test("attributionCredit counts a touch at the conversion instant") {
    val ev = events(
      (1, 1, "click", "2024-01-01 00:00:05", 0.0),
      (2, 1, "purchase", "2024-01-01 00:00:05", 0.0))
    val got = AnalyticsQ.attributionCredit(ev, Seq("click"), "purchase", 60L)
      .collect().map(r => r.getString(0) -> r.getLong(4)).toMap
    assert(got == Map("click" -> 1000000L), got.toString)
  }

  test("attributionCredit rejects a conversion type listed as a touch") {
    intercept[IllegalArgumentException] {
      AnalyticsQ.attributionCredit(events(), Seq("view", "purchase"),
        "purchase", 60L)
    }
  }

  test("funnelReach rejects duplicate stages") {
    intercept[IllegalArgumentException] {
      AnalyticsQ.funnelReach(events(), Seq("view", "view"))
    }
  }

  test("transitionMatrix orders by ts with event_id tiebreak") {
    val ev = events(
      (1, 1, "A", "2024-01-01 00:00:01", 0.0),
      (2, 1, "B", "2024-01-01 00:00:02", 0.0),
      // same timestamp: event_id 3 then 4 → C before D
      (3, 1, "C", "2024-01-01 00:00:03", 0.0),
      (4, 1, "D", "2024-01-01 00:00:03", 0.0))
    val got = AnalyticsQ.transitionMatrix(ev)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSet
    assert(got == Set(("A", "B", 1L), ("B", "C", 1L), ("C", "D", 1L)))
  }

  test("retentionCohorts offsets against first-activity date") {
    val ev = events(
      (1, 1, "view", "2024-01-01 10:00:00", 0.0),
      (2, 1, "view", "2024-01-01 23:00:00", 0.0), // same day — one row
      (3, 1, "view", "2024-01-03 01:00:00", 0.0),
      (4, 2, "view", "2024-01-02 05:00:00", 0.0))
    val got = AnalyticsQ.retentionCohorts(ev)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    assert(got == Set(("2024-01-01", 0L, 1L), ("2024-01-01", 2L, 1L),
      ("2024-01-02", 0L, 1L)))
  }

  test("trendSlope recovers an exact linear trend") {
    // value = 1 + 2 * (seconds since 2024-01-01) → slope 2/sec = 172800/day
    val ev = events(
      (1, 1, "g", "2024-01-01 00:00:00", 1.0),
      (2, 1, "g", "2024-01-01 00:00:01", 3.0),
      (3, 1, "g", "2024-01-01 00:00:02", 5.0))
    val row = AnalyticsQ.trendSlope(ev).collect().head
    assert(row.getLong(1) == 3L)
    assert(row.getDouble(2) == 172800.0)
  }

  test("zscore variants agree and flag the planted outlier") {
    val base = (1 to 20).map(i => (i.toLong, 1L, "g", "2024-01-01 00:00:01", 10.0))
    val ev = events(base :+ ((99L, 1L, "g", "2024-01-01 00:00:01", 500.0)): _*)
    val a = AnalyticsQ.zscoreOutliers(ev)
      .collect().map(r => (r.getLong(0), r.getDouble(3)))
    val b = AnalyticsQ.zscoreOutliersBroadcast(ev)
      .collect().map(r => (r.getLong(0), r.getDouble(3)))
    assert(a.toSeq == b.toSeq)
    assert(a.map(_._1).toSeq == Seq(99L))
    assert(a.head._2 > 4.0) // lone spike in 21 rows is > 4 sigma
  }

  test("madOutliers catches the spike family z-score masking hides") {
    // Six co-located spikes inflate the stddev enough that each sits
    // ~2.2σ (z ≈ √(n/k) = √(30/6), below the 2.5 z gate) — but MAD
    // ignores the minority entirely.
    val base = (1 to 30).map(i => (i.toLong, 1L, "g", "2024-01-01 00:00:01",
      10.0 + (i % 3) * 0.02))
    val spikeIds = (94L to 99L)
    val spikes = spikeIds.map(i => (i, 1L, "g", "2024-01-01 00:00:01", 200.0))
    val ev = events(base ++ spikes: _*)
    val z = AnalyticsQ.zscoreOutliers(ev).collect().map(_.getLong(0)).toSet
    val m = AnalyticsQ.madOutliers(ev).collect().map(_.getLong(0)).toSet
    assert(z === Set.empty) // masked: 6/36 spikes drag sigma up
    assert(m === spikeIds.toSet)
  }

  test("madOutliers: MAD=0 constant group flags exactly the differing rows") {
    val ev = events(
      (1, 1, "c", "2024-01-01 00:00:01", 5.0),
      (2, 1, "c", "2024-01-01 00:00:01", 5.0),
      (3, 1, "c", "2024-01-01 00:00:01", 5.0),
      (4, 1, "c", "2024-01-01 00:00:01", 5.01))
    val out = AnalyticsQ.madOutliers(ev).collect()
    assert(out.map(_.getLong(0)).toSeq === Seq(4L))
    assert(out.head.getLong(5) === 0L) // mad
    assert(out.head.getLong(4) === 1L) // dev = 1 cent
  }

  test("madOutliers: even-n group uses the LOWER median (rank (n+1) div 2)") {
    // values 1,2,3,4 → lower median 2 (not 2.5): dev of the max is 2.00
    val ev = events(
      (1, 1, "e", "2024-01-01 00:00:01", 1.0),
      (2, 1, "e", "2024-01-01 00:00:01", 2.0),
      (3, 1, "e", "2024-01-01 00:00:01", 3.0),
      (4, 1, "e", "2024-01-01 00:00:01", 4.0))
    val meds = AnalyticsQ.madOutliers(ev, kTenThousandths = 1L)
      .select(col("med")).distinct().collect().map(_.getDouble(0))
    assert(meds.toSeq === Seq(2.0))
  }

  test("quantileBands: exact order statistics at ceil(q*n) ranks") {
    // values 1..100 cents 0.01..1.00 → p500 = 50th = 0.50, p950 = 0.95,
    // p990 = 0.99 (rank = ceil(q·n) order statistic, 1-based)
    val ev = events((1 to 100).map(i =>
      (i.toLong, 1L, "g", "2024-01-01 00:00:01", i / 100.0)): _*)
    val r = AnalyticsQ.quantileBands(ev).head
    assert(r.getLong(1) === 100L)
    assert(r.getDouble(2) === 0.50)
    assert(r.getDouble(3) === 0.95)
    assert(r.getDouble(4) === 0.99)
    // n=1: every band is the single value
    val one = events((1L, 1L, "h", "2024-01-01 00:00:01", 7.77))
    val r1 = AnalyticsQ.quantileBands(one).head
    assert(r1.getDouble(2) === 7.77 && r1.getDouble(4) === 7.77)
  }

  test("rollingActiveUsers: wau unions trailing window, stickiness exact") {
    // day 0: users 1,2; day 1: user 2; day 8: user 3 (outside day 1's
    // window start but inside nothing else)
    val ev = events(
      (1, 1, "g", "2024-01-01 01:00:00", 0.0),
      (2, 2, "g", "2024-01-01 02:00:00", 0.0),
      (3, 2, "g", "2024-01-02 01:00:00", 0.0),
      (4, 3, "g", "2024-01-09 01:00:00", 0.0))
    val r = AnalyticsQ.rollingActiveUsers(ev)
      .collect().map(x => x.getString(0) -> (x.getLong(1), x.getLong(2), x.getLong(3))).toMap
    assert(r("2024-01-01") === ((2L, 2L, 1000000L)))
    assert(r("2024-01-02") === ((1L, 2L, 500000L))) // trailing window holds both users
    assert(r("2024-01-09") === ((1L, 1L, 1000000L))) // day-0/1 users aged out
    assert(r.size === 3) // only observed days reported
  }

  test("decayedEngagement: staircase half-life weights, hand-computed") {
    // ref = max ts; ages 0d/7d/14d/140d+ → weights 1e6/5e5/2.5e5/0
    val ev = events(
      (1, 1, "g", "2024-06-01 00:00:00", 1.00), // w=0
      (2, 1, "g", "2024-05-25 00:00:00", 1.00), // exactly 7d → w=1
      (3, 1, "g", "2024-05-18 00:00:01", 1.00), // 13d23h59m59s → w=1
      (4, 1, "g", "2024-05-18 00:00:00", 1.00), // exactly 14d → w=2
      (5, 1, "g", "2023-06-01 00:00:00", 1.00)) // 366d → w=52 → weight 0
    val r = AnalyticsQ.decayedEngagement(ev).collect()
    assert(r.length === 1)
    assert(r.head.getLong(1) === 5L)
    assert(r.head.getLong(2) === (1000000L + 500000L + 500000L + 250000L))
    assert(r.head.getLong(3) === 100L * (1000000L + 500000L + 500000L + 250000L))
  }

  test("temporalSessionSplit: straddling session dropped and reported") {
    // span 00:00-10:00 → boundary at 08:00 (80%); user 3's single session
    // crosses it, user 2's two eval sessions start after it.
    val ev = events(
      (1, 1, "g", "2024-01-01 00:00:00", 0.0),
      (2, 1, "g", "2024-01-01 00:10:00", 0.0),
      (3, 2, "g", "2024-01-01 09:00:00", 0.0),
      (4, 2, "g", "2024-01-01 09:10:00", 0.0),
      (5, 2, "g", "2024-01-01 10:00:00", 0.0), // 50m gap → own session
      (6, 3, "g", "2024-01-01 07:59:00", 0.0),
      (7, 3, "g", "2024-01-01 08:10:00", 0.0))
    val r = graft.queries.EventQ.temporalSessionSplit(ev)
      .collect().map(x => x.getString(0) -> (x.getLong(1), x.getLong(2), x.getLong(3))).toMap
    assert(r("train") === ((1L, 2L, 1L)))
    assert(r("eval") === ((2L, 3L, 1L)))
    assert(r("dropped") === ((1L, 2L, 1L)))
  }

  test("pearsonCorr is 1 for a perfectly linear relation") {
    import spark.implicits._
    val ev = (1 to 10).map(i => (i.toLong, "g", i * 2.0, s"""{"k": $i}"""))
      .toDF("event_id", "event_type", "value", "props")
    val row = AnalyticsQ.pearsonCorr(ev).collect().head
    assert(row.getDouble(2) == 1.0)
  }

  test("keySkewReport ranks hot keys with stable tiebreak") {
    import spark.implicits._
    val df = (Seq.fill(6)("a") ++ Seq.fill(3)("b") ++ Seq.fill(3)("c"))
      .toDF("k")
    val got = AnalyticsQ.keySkewReport(df, "k", topK = 2)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))
    assert(got.toSeq == Seq(("a", 6L, 50.0), ("b", 3L, 25.0)))
  }

  test("audienceOverlap counts users per unordered type pair") {
    val ev = events(
      (1, 1, "view", "2024-01-01 00:00:01", 0.0),
      (2, 1, "click", "2024-01-01 00:00:02", 0.0),
      (3, 1, "click", "2024-01-01 00:00:03", 0.0), // dup (user,type)
      (4, 2, "view", "2024-01-01 00:00:01", 0.0))
    val got = AnalyticsQ.audienceOverlap(ev)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSet
    assert(got == Set(("click", "click", 1L), ("click", "view", 1L),
      ("view", "view", 2L)))
  }

  test("invertedIndex caps postings but keeps the exact df") {
    import spark.implicits._
    val docs = Seq((1L, "x y"), (2L, "x"), (3L, "x")).toDF("doc_id", "text")
    val got = TextQ.invertedIndex(docs, maxPostings = 2)
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getString(2))))
      .toMap
    assert(got("x") == ((3L, "1,2"))) // df counts all 3, postings capped at 2
    assert(got("y") == ((1L, "1")))
  }

  test("funnelReach reports zero reach (not zero rows) when no stage-1 events exist") {
    val ev = events((1, 1, "click", "2024-01-01 00:00:01", 0.0))
    val got = AnalyticsQ.funnelReach(ev, Seq("view", "click"))
      .collect().map(r => (r.getLong(0), r.getLong(2)))
    assert(got.toSeq == Seq((1L, 0L), (2L, 0L)))
  }

  test("funnelReach with maxGapSec drops conversions outside the window") {
    val ev = events(
      (1, 1, "view", "2024-01-01 00:00:00", 0.0),
      (2, 1, "click", "2024-01-01 02:00:00", 0.0), // 2h later
      (3, 2, "view", "2024-01-01 00:00:00", 0.0),
      (4, 2, "click", "2024-01-01 00:30:00", 0.0)) // within the hour
    val got = AnalyticsQ.funnelReach(ev, Seq("view", "click"),
        maxGapSec = Some(3600L))
      .collect().map(r => (r.getLong(0), r.getLong(2)))
    assert(got.toSeq == Seq((1L, 2L), (2L, 1L)))
  }

  test("movingWindow honors a custom id column and single-row keys") {
    import spark.implicits._
    val df = Seq((7L, 42L, "2024-01-01 00:00:00", 1.25))
      .toDF("k", "rid", "ts_s", "value")
      .withColumn("ts", to_timestamp(col("ts_s")))
    val got = graft.queries.WindowQ
      .movingWindow(df, "k", "ts", "value", 60L, idCol = "rid")
      .collect().map(r => (r.getLong(0), r.getLong(2), r.getDouble(3)))
    assert(got.toSeq == Seq((42L, 1L, 1.25)))
  }

  test("fuzzyDecontamination flags a paraphrase, not an unrelated doc") {
    import spark.implicits._
    val train = Seq(
      (1L, "the quick brown fox jumps over the lazy dog today"),
      (2L, "completely different content about spark shuffles here now")
    ).toDF("doc_id", "text")
    val eval = Seq(
      (100L, "the quick brown fox jumps over the lazy dog tonight")
    ).toDF("doc_id", "text")
    val got = TextQ.fuzzyDecontamination(train, eval, minEstJaccard = 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(got.toSeq == Seq((1L, 1L)))
  }

  test("signal kappa: perfect, independent, and inverted raters") {
    import spark.implicits._
    val docs = (0L until 100L).map(i => (i, i % 2 == 0, i % 4 < 2))
      .toDF("doc_id", "a", "b")
    def kappa(a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column) =
      AnalyticsQ.signalKappa(docs, a, b)
        .select("kappa_ppm").as[Long].head()
    assert(kappa(col("a"), col("a")) == 1000000L, "self-agreement is 1")
    // a (period 2) vs b (period 4) are exactly independent on 100 rows
    assert(kappa(col("a"), col("b")) == 0L, "independent raters score 0")
    assert(kappa(col("a"), !col("a")) < -900000L, "inversion is strongly negative")
  }

  test("KS drift: identical distributions 0, disjoint distributions 1e6") {
    import spark.implicits._
    val same = ((0L until 50L).map(i => (i, i % 10, "src0")) ++
      (0L until 50L).map(i => (i + 100, i % 10, "src1")))
      .toDF("doc_id", "n_chars", "source")
    val s0 = AnalyticsQ.ksDrift(same, col("n_chars"), "src0", "src1")
      .select("ks_ppm").as[Long].head()
    assert(s0 == 0L, s"identical dists must give 0, got $s0")
    val disjoint = ((0L until 20L).map(i => (i, i % 5, "src0")) ++
      (0L until 20L).map(i => (i + 100, 50 + i % 5, "src1")))
      .toDF("doc_id", "n_chars", "source")
    val s1 = AnalyticsQ.ksDrift(disjoint, col("n_chars"), "src0", "src1")
      .select("ks_ppm").as[Long].head()
    assert(s1 == 1000000L, s"disjoint dists must give 1e6, got $s1")
  }

  test("KS drift: an empty or misspelled source fails loudly, not div/0") {
    import spark.implicits._
    val docs = (0L until 20L).map(i => (i, i % 10, "src0"))
      .toDF("doc_id", "n_chars", "source")
    // one side present, the other absent
    val e1 = intercept[Exception] {
      AnalyticsQ.ksDrift(docs, col("n_chars"), "src0", "srcTYPO").collect()
    }
    assert(e1.getMessage.contains("srcTYPO") ||
      e1.getCause != null && e1.getCause.getMessage.contains("srcTYPO"),
      s"error must name the empty source, got: ${e1.getMessage}")
    // both sides absent (filter leaves zero rows)
    val e2 = intercept[Exception] {
      AnalyticsQ.ksDrift(docs, col("n_chars"), "nopeA", "nopeB").collect()
    }
    val msg2 = Option(e2.getCause).map(_.getMessage).getOrElse("") + e2.getMessage
    assert(msg2.contains("nope"),
      s"both-empty case must still fail with a named source, got: ${e2.getMessage}")
  }
}
