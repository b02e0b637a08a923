package graft

import org.apache.spark.sql.functions._

import graft.queries.{AnalyticsQ, BillingQ, PreratingQ, RoutingQ, TextQ}

/** Hand-value unit tests for the round-10 second wave: LCR plan build,
  * route margin assurance, number-plan utilization, data-volume block
  * rating, exact Kendall τ-b, and overlap chunking.
  */
class RoundTenOpsSpec extends SparkSpec {

  import spark.implicits._

  test("lcrPlan ranks carriers by rate with a deterministic tiebreak") {
    val t = Seq(
      ("49", "Cb", 100L), ("49", "Ca", 100L), ("49", "Cc", 90L),
      ("1", "Cz", 50L))
      .toDF("prefix", "carrier", "rate_centi")
    val out = RoutingQ.lcrPlan(t).orderBy(col("prefix"))
      .as[(String, Long, String, Long, String, String, Long)].collect()
    // prefix 1: single quote, no alternates, zero spread
    assert(out(0) == (("1", 1L, "Cz", 50L, null, null, 0L)), out(0))
    // prefix 49: cheapest first, then the price tie breaks on carrier
    assert(out(1) == (("49", 3L, "Cc", 90L, "Ca", "Cb", 10L)), out(1))
  }

  test("lcrPlan fails loudly on a duplicate (prefix, carrier) offer") {
    val t = Seq(("49", "Ca", 100L), ("49", "Ca", 90L))
      .toDF("prefix", "carrier", "rate_centi")
    val e = intercept[Exception] { RoutingQ.lcrPlan(t).collect() }
    assert(String.valueOf(e.getMessage).contains("duplicate") ||
      String.valueOf(e.getCause).contains("duplicate"), e.toString)
  }

  test("routeMargin flags bleeding routes and keeps unsellable traffic") {
    val calls = Seq(
      (1L, "4915", 10L),  // sells at 100, buys at 150 -> bleeding
      (2L, "4915", 5L),
      (3L, "1999", 10L),  // sells at 200, buys at 50 -> healthy
      (4L, "7777", 10L))  // matches NO sell prefix -> NULL route, rev 0
      .toDF("call_id", "dialed", "dur_min")
    val sell = Seq(("49", "RX", 100L), ("19", "RY", 200L))
      .toDF("prefix", "route", "rate_centi")
    val buy = Seq(("4", "S1", 150L), ("1", "S2", 50L))
      .toDF("prefix", "route", "rate_centi")
    val out = RoutingQ.routeMargin(calls, sell, buy)
      .select(col("sell_route"), col("revenue_centi"), col("cost_centi"),
        col("margin_centi"), col("bleeding"))
      .collect().map(r => Option(r.getString(0)) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getBoolean(4))))
      .toMap
    assert(out(Some("RX")) == ((1500L, 2250L, -750L, true)), out.toString)
    assert(out(Some("RY")) == ((2000L, 500L, 1500L, false)), out.toString)
    // never-drop: the unsellable call rolls up under NULL at 0 revenue
    assert(out(None) == ((0L, 0L, 0L, false)), out.toString)
  }

  test("rangeUtilization counts distinct numbers per range, dark traffic kept") {
    val traffic = Seq("100", "101", "101", "105", "999")
      .toDF("canonical")
    val ranges = Seq((100L, 109L, 7L)).toDF(
      "range_start", "range_end", "account_id")
    val out = PreratingQ.rangeUtilization(traffic, ranges)
      .orderBy(col("range_key"))
      .as[(String, Option[Long], Option[Long], Long, Long, Option[Long])]
      .collect()
    // 3 distinct numbers of 10 allocated -> 300000 ppm, 4 calls
    assert(out(0) == (("100", Some(7L), Some(10L), 4L, 3L, Some(300000L))),
      out(0).toString)
    assert(out(1) == (("__unallocated__", None, None, 1L, 1L, None)),
      out(1).toString)
  }

  test("volumeRating rounds up to whole blocks, failed sessions bill zero") {
    val block = 102400L
    val sess = Seq(
      (1L, "apn1", block),      // exactly one block
      (1L, "apn1", block + 1L), // one byte over -> 2 blocks
      (1L, "apn1", 1L),         // 1 byte -> 1 block (round-up rule)
      (2L, "apn1", -5L),        // failed session -> 0 blocks, counted
      (2L, "apn2", 0L))         // zero bytes -> 0 blocks
      .toDF("account_id", "apn", "bytes")
    val rates = Seq(("apn1", 3L), ("apn2", 10L))
      .toDF("apn", "rate_centi")
    val out = BillingQ.volumeRating(sess, rates)
      .select(col("account_id"), col("apn"), col("n_sessions"),
        col("blocks"), col("charge_centi"))
      .as[(Long, String, Long, Long, Long)].collect().toSet
    assert(out == Set(
      (1L, "apn1", 3L, 4L, 12L),
      (2L, "apn1", 1L, 0L, 0L),
      (2L, "apn2", 1L, 0L, 0L)), out.toString)
  }

  test("kendallTau is exact at the poles and under ties") {
    // perfect concordance: tau = +1 -> sign 1, tau^2 = 1e6 exactly
    val up = (1 to 20).map(i => (i.toLong, i.toLong * 3L))
      .toDF("x", "y")
    val g1 = AnalyticsQ.kendallTau(up, "x", "y")
      .select(col("tau_sign"), col("tau2_ppm")).as[(Long, Long)].head()
    assert(g1 == ((1L, 1000000L)), g1.toString)
    // perfect discordance
    val down = (1 to 20).map(i => (i.toLong, -i.toLong)).toDF("x", "y")
    val g2 = AnalyticsQ.kendallTau(down, "x", "y")
      .select(col("tau_sign"), col("tau2_ppm")).as[(Long, Long)].head()
    assert(g2 == ((-1L, 1000000L)), g2.toString)
    // hand case with ties: pairs (1,1),(1,2),(2,1),(2,2) -> C=1, D=1,
    // tau = 0
    val tied = Seq((1L, 1L), (1L, 2L), (2L, 1L), (2L, 2L)).toDF("x", "y")
    val g3 = AnalyticsQ.kendallTau(tied, "x", "y")
      .select(col("concordant"), col("discordant"), col("ties_x_pairs"),
        col("ties_y_pairs"), col("tau_sign"), col("tau2_ppm"))
      .as[(Long, Long, Long, Long, Long, Long)].head()
    assert(g3 == ((1L, 1L, 2L, 2L, 0L, 0L)), g3.toString)
  }

  test("ported numbers override their native range; dup porting is loud") {
    val traffic = Seq(("100", 1L), ("105", 2L), ("999", 3L), ("998", 4L))
      .toDF("canonical", "event_id")
    val ranges = Seq((100L, 109L, 7L)).toDF(
      "range_start", "range_end", "account_id")
    val ported = Seq(("105", 9001L), ("999", 9002L)).toDF(
      "number", "account_id")
    val out = PreratingQ.guideWithPorting(traffic, ranges, ported)
      .select(col("canonical"), col("account_id"), col("guide_src"),
        col("reason"))
      .as[(String, Option[Long], String, String)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    assert(out("100") == ((Some(7L), "range", null)))    // native range
    assert(out("105") == ((Some(9001L), "ported", null))) // ported WINS
    assert(out("999") == ((Some(9002L), "ported", null))) // ported-in
    assert(out("998") == ((None, null, "unguided")))      // never-drop
    val dup = Seq(("105", 1L), ("105", 2L)).toDF("number", "account_id")
    val e = intercept[Exception] {
      PreratingQ.guideWithPorting(traffic, ranges, dup).collect()
    }
    assert(String.valueOf(e.getMessage).contains("duplicate ported") ||
      String.valueOf(e.getCause).contains("duplicate ported"), e.toString)
  }

  test("boilerplateChunks finds planted repeated blocks, unique text clean") {
    val footer = "x" * 40 // one exact 40-char block shared by 3 docs
    val docs = Seq(
      (1L, "a" * 40 + footer),
      (2L, "b" * 40 + footer),
      (3L, "c" * 40 + footer),
      (4L, "d" * 40 + "e" * 40))
      .toDF("doc_id", "text")
    val out = TextQ.boilerplateChunks(docs, window = 40, minDocs = 2)
      .orderBy(col("doc_id"))
      .as[(Long, Long, Long, Long)].collect().toSeq
    assert(out == Seq(
      (1L, 2L, 1L, 500000L), (2L, 2L, 1L, 500000L),
      (3L, 2L, 1L, 500000L), (4L, 2L, 0L, 0L)), out.toString)
  }

  test("incrementRating applies first-period + increment rounding exactly") {
    // 60/6 rule at 120 centi/min: d=1 -> 60s billed; d=61 -> 66; d=60
    // -> 60; d=0/neg -> 0 billed but counted
    val calls = Seq(("X", 1L), ("X", 60L), ("X", 61L), ("X", 0L),
      ("X", -9L)).toDF("carrier", "dur_sec")
    val rules = Seq(("X", 60L, 6L, 120L))
      .toDF("carrier", "first_sec", "inc_sec", "rate_centi_per_min")
    val out = BillingQ.incrementRating(calls, rules)
      .as[(String, Long, Long, Long, Long, Option[Long])].head()
    // spoken 1+60+61 = 122; billed 60+60+66 = 186; charge 186*120/60=372
    assert(out == (("X", 5L, 122L, 186L, 372L,
      Some(1000000L * 64L / 122L))), out.toString)
  }

  test("mannKendallTrend detects direction per group, constant series null") {
    val series =
      (1 to 12).map(i => ("up", i.toLong, 10L + i)) ++
      (1 to 12).map(i => ("down", i.toLong, 100L - 3L * i)) ++
      (1 to 12).map(i => ("flat", i.toLong, 7L))
    val out = AnalyticsQ.mannKendallTrend(
        series.toDF("grp", "x", "y"), "grp", "x", "y")
      .select(col("grp"), col("s_stat"), col("trend_sign"), col("tau2_ppm"))
      .as[(String, Long, Long, Option[Long])].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    assert(out("up") == ((66L, 1L, Some(1000000L))), out.toString)
    assert(out("down") == ((-66L, -1L, Some(1000000L))), out.toString)
    // all-ties y: tau undefined -> NULL, sign 0, never a divide error
    assert(out("flat") == ((0L, 0L, None)), out.toString)
  }

  test("wangiriCard flags high-fanout unanswered bursts only") {
    val calls =
      // fraudster: 25 attempts, 25 distinct callees, all ring-outs
      (1 to 25).map(i => (666L, s"dest$i", 0L)) ++
      // call-center: high fanout but every call answered long
      (1 to 25).map(i => (42L, s"cust$i", 30000L)) ++
      // chatty user: many calls to ONE number, all unanswered
      (1 to 25).map(_ => (7L, "home", 0L)) ++
      // below the attempt floor
      (1 to 5).map(i => (8L, s"d$i", 0L))
    val out = RoutingQ.wangiriCard(
        calls.toDF("caller", "callee", "dur_centi"))
      .select(col("caller"), col("wangiri_flag"))
      .as[(Long, Boolean)].collect().toMap
    assert(out == Map(666L -> true, 42L -> false, 7L -> false,
      8L -> false), out.toString)
  }

  test("communityCard: concentration poles and deterministic top-k") {
    val calls =
      (1 to 10).map(_ => (1L, "only")) ++           // loyal: HHI = 1e6
      (1 to 4).flatMap(i => (1 to 5).map(_ => (2L, s"p$i"))) ++ // uniform 4
      Seq((3L, "a"), (3L, "a"), (3L, "b"), (3L, "c")) // tie b/c on count
    val out = RoutingQ.communityCard(calls.toDF("caller", "callee"))
      .select(col("caller"), col("n_partners"), col("partner_1"),
        col("partner_2"), col("hhi_ppm"))
      .as[(Long, Long, String, String, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4, r._5))).toMap
    assert(out(1L) == ((1L, "only", null, 1000000L)), out.toString)
    assert(out(2L) == ((4L, "p1", "p2", 250000L)), out.toString)
    // caller 3: counts a=2,b=1,c=1 -> HHI = (4+1+1)*1e6/16 = 375000;
    // the b/c count tie breaks on callee
    assert(out(3L) == ((3L, "a", "b", 375000L)), out.toString)
  }

  test("feedGapCard finds the longest hole inside each carrier's span") {
    // hours 0,1,2,5,6,7,9 -> missing 3,4 (run of 2) and 8 (run of 1)
    val cdrs = Seq(0L, 1L, 2L, 5L, 6L, 7L, 9L)
      .map(h => ("X", h * 3600L + 17L)).toDF("carrier", "sec")
    val out = RoutingQ.feedGapCard(cdrs)
      .select(col("expected_hours"), col("observed_hours"),
        col("missing_hours"), col("longest_gap_hours"),
        col("gap_starts_hr"))
      .as[(Long, Long, Long, Long, Option[Long])].head()
    assert(out == ((10L, 7L, 3L, 2L, Some(3L))), out.toString)
    // a gapless feed reports zero missing and no gap start
    val clean = RoutingQ.feedGapCard(
      Seq(0L, 1L, 2L).map(h => ("Y", h * 3600L)).toDF("carrier", "sec"))
      .select(col("missing_hours"), col("longest_gap_hours"),
        col("gap_starts_hr"))
      .as[(Long, Long, Option[Long])].head()
    assert(clean == ((0L, 0L, None)), clean.toString)
  }

  test("versioned guiding resolves by the CDR's own time, era boundary exact") {
    // one number range, two owners: acct 1 until sec 100 (exclusive),
    // acct 2 from 100 on — a call AT the boundary second is the new
    // owner's (half-open validity)
    val eras = Seq(
      (500L, 599L, 0L, 100L, 1L),
      (500L, 599L, 100L, 1000L, 2L))
      .toDF("range_start", "range_end", "valid_from_sec", "valid_to_sec",
        "account_id")
    val cdrs = Seq(("550", 99L), ("550", 100L), ("550", 101L),
      ("700", 50L)).toDF("canonical", "sec")
    val out = PreratingQ.guideRangesVersioned(cdrs, eras)
      .select(col("canonical"), col("sec"), col("account_id"),
        col("reason"))
      .as[(String, Long, Option[Long], String)].collect()
      .map(r => (r._1, r._2) -> ((r._3, r._4))).toMap
    assert(out(("550", 99L)) == ((Some(1L), null)))
    assert(out(("550", 100L)) == ((Some(2L), null))) // boundary -> new
    assert(out(("550", 101L)) == ((Some(2L), null)))
    assert(out(("700", 50L)) == ((None, "unguided")))
  }

  test("versioned guiding rejects number+time double coverage loudly") {
    // overlapping numbers AND overlapping validity -> double-guide risk
    val bad = Seq(
      (500L, 599L, 0L, 200L, 1L),
      (550L, 650L, 150L, 300L, 2L))
      .toDF("range_start", "range_end", "valid_from_sec", "valid_to_sec",
        "account_id")
    val cdrs = Seq(("560", 160L)).toDF("canonical", "sec")
    val e = intercept[IllegalArgumentException] {
      PreratingQ.guideRangesVersioned(cdrs, bad)
    }
    assert(e.getMessage.contains("double coverage"), e.toString)
    // the SAME number overlap is fine when the validity windows are
    // disjoint (that is exactly what a port looks like)
    val ok = Seq(
      (500L, 599L, 0L, 150L, 1L),
      (550L, 650L, 150L, 300L, 2L))
      .toDF("range_start", "range_end", "valid_from_sec", "valid_to_sec",
        "account_id")
    val got = PreratingQ.guideRangesVersioned(cdrs, ok)
      .select(col("account_id")).as[Long].head()
    assert(got == 2L)
  }

  test("chunkWithOverlap covers every char and keeps the short tail") {
    val docs = Seq((1L, "abcdefghij"), (2L, "")).toDF("doc_id", "text")
    val out = TextQ.chunkWithOverlap(docs, window = 4, stride = 3)
      .orderBy(col("doc_id"), col("chunk_idx"))
      .select(col("doc_id"), col("chunk_idx"), col("start_char"),
        col("chunk_chars"))
      .as[(Long, Long, Long, Long)].collect().toSeq
    // len 10, stride 3 -> starts 0,3,6,9; windows 4,4,4 and tail 1
    assert(out == Seq(
      (1L, 0L, 0L, 4L), (1L, 1L, 3L, 4L), (1L, 2L, 6L, 4L),
      (1L, 3L, 9L, 1L),
      (2L, 0L, 0L, 0L)), out.toString) // empty doc -> its one empty chunk
    // overlap contract: consecutive chunks share window - stride chars
    val hashes = TextQ.chunkWithOverlap(docs.filter(col("doc_id") === 1L),
      window = 4, stride = 3)
      .select(col("chunk_md5")).as[String].collect()
    assert(hashes.distinct.length == 4, "chunks must differ")
  }
}
