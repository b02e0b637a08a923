package graft

import org.apache.spark.sql.functions._

import graft.queries.{CurationQ, PrefixSum, RoutingQ}

/** Hand-computed pins for the routing/sampling wave (q256–q259): the
  * oracle proves engine parity; these prove the SEMANTICS on cases small
  * enough to route, sweep, and rank by hand — plus the plan-shape and
  * loud-failure contracts the scaladocs promise. */
class RoutingSpec extends SparkSpec {

  import spark.implicits._

  // --- q256 longest-prefix routing ----------------------------------------

  private val pfx = Seq(
    ("4", "R4", 10L), ("49", "R49", 20L), ("4915", "R4915", 30L),
    ("1", "R1", 5L))
    .toDF("prefix", "route", "rate_centi")

  test("prefixRoute: the most specific prefix wins") {
    val calls = Seq(
      (1L, "491520000", 2L), // matches 4, 49, 4915 -> 4915
      (2L, "490000000", 3L), // matches 4, 49 -> 49
      (3L, "400000000", 1L), // matches 4 only
      (4L, "100000000", 4L)) // matches 1 only
      .toDF("call_id", "dialed", "dur_min")
    val got = RoutingQ.prefixRoute(calls, pfx)
      .select("call_id", "prefix", "route", "charge_centi")
      .as[(Long, String, String, Long)].collect().sortBy(_._1)
    assert(got.toSeq == Seq(
      (1L, "4915", "R4915", 60L), (2L, "49", "R49", 60L),
      (3L, "4", "R4", 10L), (4L, "1", "R1", 20L)))
  }

  test("prefixRoute: unmatched and non-positive-duration calls never drop") {
    val calls = Seq(
      (1L, "900000000", 5L), // no '9' prefix -> unmatched
      (2L, "400000000", 0L)) // matched but zero duration
      .toDF("call_id", "dialed", "dur_min")
    val got = RoutingQ.prefixRoute(calls, pfx)
      .select("call_id", "route", "charge_centi")
      .as[(Long, Option[String], Long)].collect().sortBy(_._1)
    assert(got.toSeq == Seq((1L, None, 0L), (2L, Some("R4"), 0L)))
  }

  test("prefixRoute: a duplicate prefix in the dimension fails loudly") {
    val calls = Seq((1L, "400000000", 1L)).toDF("call_id", "dialed", "dur_min")
    val dup = pfx.unionAll(Seq(("4", "R4b", 99L))
      .toDF("prefix", "route", "rate_centi"))
    val e = intercept[Exception] {
      RoutingQ.prefixRoute(calls, dup).collect()
    }
    assert(e.getMessage.contains("duplicate prefix"), e.getMessage)
  }

  test("prefixRoute: the plan is broadcast joins only — no exchange") {
    val calls = Seq((1L, "491520000", 2L)).toDF("call_id", "dialed", "dur_min")
    val routed = RoutingQ.prefixRoute(calls, pfx)
    routed.collect()
    val plan = routed.queryExecution.executedPlan.toString
    // the dim-side dup-guard window exchanges the TINY dimension; the
    // call-side lineage must stay shuffle-free (broadcasts only)
    assert(plan.contains("BroadcastHashJoin"), plan)
    assert(!plan.contains("SortMergeJoin"), plan)
  }

  // --- q257 trunk sweep line ----------------------------------------------

  test("trunkPeaks: overlap counts, end-at-start frees the circuit") {
    val calls = Seq(
      // t1: [0,100) and [50,150) overlap -> peak 2 at sec 50;
      //     [150, 200) starts exactly when the second ends -> stays 1
      ("t1", 0L, 100L), ("t1", 50L, 150L), ("t1", 150L, 200L),
      // t2: zero-length call — an attempt, no circuit time
      ("t2", 10L, 10L))
      .toDF("trunk", "start_sec", "end_sec")
    val got = RoutingQ.trunkPeaks(calls)
      .as[(String, Long, Long, Option[Long], Long)].collect()
      .sortBy(_._1)
    // span = 200 - 0; t1 call_sec = 100+100+50 = 250 -> 1250 erlang-milli
    assert(got.toSeq == Seq(
      ("t1", 3L, 2L, Some(50L), 1250L),
      ("t2", 1L, 0L, None, 0L)))
  }

  test("trunkPeaks: peak_at is the EARLIEST second reaching the peak") {
    val calls = Seq(
      ("t", 0L, 10L), ("t", 5L, 15L), // peak 2 first at 5
      ("t", 20L, 30L), ("t", 25L, 35L)) // peak 2 again at 25
      .toDF("trunk", "start_sec", "end_sec")
    val got = RoutingQ.trunkPeaks(calls)
      .as[(String, Long, Long, Option[Long], Long)].head()
    assert(got._3 == 2L && got._4 == Some(5L), got.toString)
  }

  test("trunkPeaks: the cumsum windows partition by (trunk, day bucket)") {
    // the scale claim: no window partition is a whole trunk — the
    // PrefixSum partitionCols path must key every sort by the day
    // bucket as well, so a hot trunk spreads over its active days
    val calls = (0 until 300).map(i =>
      ("hot", i * 7000L, i * 7000L + 600L))
      .toDF("trunk", "start_sec", "end_sec")
    val df = RoutingQ.trunkPeaks(calls)
    df.collect()
    val analyzed = df.queryExecution.analyzed.toString
    assert(analyzed.contains("windowspecdefinition(trunk"), analyzed)
    assert(analyzed.contains("__psb"), analyzed)
  }

  // --- q258 ASR/ACD card ---------------------------------------------------

  test("asrCard: ASR, ACD and short-call share by hand") {
    val calls = Seq(
      ("r1", "2026-01-01", 1000L), ("r1", "2026-01-01", 300L),
      ("r1", "2026-01-01", -50L), ("r1", "2026-01-01", 0L))
      .toDF("route", "day", "dur_centi")
    val got = RoutingQ.asrCard(calls)
      .as[(String, String, Long, Long, Long, Option[Long], Option[Long])]
      .head()
    // 4 attempts, 2 answered -> ASR 500000 ppm; ACD (1000+300)/2 = 650;
    // short: 300 <= 500 -> 1 of 2 answered -> 500000 ppm
    assert(got == (("r1", "2026-01-01", 4L, 2L, 500000L,
      Some(650L), Some(500000L))), got.toString)
  }

  test("asrCard: a fully-unanswered route reports NULL ACD, ASR 0") {
    val calls = Seq(("r2", "2026-01-01", -10L))
      .toDF("route", "day", "dur_centi")
    val got = RoutingQ.asrCard(calls)
      .as[(String, String, Long, Long, Long, Option[Long], Option[Long])]
      .head()
    assert(got._5 == 0L && got._6.isEmpty && got._7.isEmpty, got.toString)
  }

  // --- q259 priority sampling ----------------------------------------------

  private def naiveTopK(rows: org.apache.spark.sql.DataFrame, k: Int) = {
    // the single-window textbook form the salted tournament must equal
    import org.apache.spark.sql.expressions.Window
    val scored = rows.select(col("stratum"), col("id"),
        col("w").cast("long").as("w"))
      .withColumn("u", expr(
        "CAST(conv(substring(md5(CAST(id AS STRING)), 1, 8), 16, 10) AS BIGINT) + 1L"))
      .withColumn("priority", expr("(w * 4294967296L) DIV u"))
      .withColumn("rn", row_number().over(Window.partitionBy(col("stratum"))
        .orderBy(col("priority").desc, col("id"))).cast("long"))
    val tau = scored.filter(col("rn") === k + 1)
      .select(col("stratum"), col("priority").as("tau"))
    scored.filter(col("rn") <= k).join(tau, Seq("stratum"), "left")
      .select(col("stratum"), col("rn"), col("id"), col("w"),
        col("priority"), col("tau"),
        greatest(col("w"), coalesce(col("tau"), lit(0L))).as("w_hat"))
  }

  test("prioritySample: salted tournament equals the naive single window") {
    val rows = (1 to 500).map(i =>
      (s"s${i % 3}", i.toLong, 1L + (i * 37L) % 1000L))
      .toDF("stratum", "id", "w")
    val got = CurationQ.prioritySample(rows, "stratum", "id", "w",
      k = 7, buckets = 4).collect().map(_.toSeq).toSet
    val want = naiveTopK(rows, 7).collect().map(_.toSeq).toSet
    assert(got == want)
  }

  test("prioritySample: a stratum smaller than k returns whole, NULL tau") {
    val rows = Seq(("s", 1L, 10L), ("s", 2L, 20L)).toDF("stratum", "id", "w")
    val got = CurationQ.prioritySample(rows, "stratum", "id", "w", k = 5)
      .as[(String, Long, Long, Long, Long, Option[Long], Long)]
      .collect().sortBy(_._2)
    assert(got.length == 2)
    assert(got.forall(_._6.isEmpty))
    // with no threshold the HT weight is the raw weight, exactly
    assert(got.map(r => (r._4, r._7)).forall { case (w, wh) => w == wh })
  }

  test("prioritySample: partition-layout independent (distributed-exact)") {
    val rows = (1 to 300).map(i =>
      (s"s${i % 2}", i.toLong, 1L + (i * 53L) % 500L))
      .toDF("stratum", "id", "w")
    val a = CurationQ.prioritySample(rows.repartition(1), "stratum", "id",
      "w", k = 9, buckets = 4).collect().map(_.toSeq).toSet
    val b = CurationQ.prioritySample(rows.repartition(13, col("id")),
      "stratum", "id", "w", k = 9, buckets = 4).collect().map(_.toSeq).toSet
    assert(a == b)
  }

  test("prioritySample: out-of-range weights fail loudly") {
    val rows = Seq(("s", 1L, 0L)).toDF("stratum", "id", "w")
    val e = intercept[Exception] {
      CurationQ.prioritySample(rows, "stratum", "id", "w", k = 1).collect()
    }
    assert(e.getMessage.contains("weight out of"), e.getMessage)
  }

  test("prioritySample: selected rows carry w_hat = max(w, tau)") {
    val rows = (1 to 100).map(i => ("s", i.toLong, 100L)).toDF("stratum", "id", "w")
    val got = CurationQ.prioritySample(rows, "stratum", "id", "w", k = 10)
      .as[(String, Long, Long, Long, Long, Option[Long], Long)].collect()
    assert(got.length == 10)
    val tau = got.head._6.get
    assert(got.forall(r => r._7 == math.max(r._4, tau)))
  }

  // --- q260 Erlang-B capacity ----------------------------------------------

  test("erlangCapacity: textbook values, zero load, unreachable target") {
    val loads = Seq(
      ("a", 250L), // 0.25 erlangs: B(2)≈2.4% > 1%, B(3)≈0.2% -> 3 circuits
      ("z", 0L), // no load -> 0 circuits
      ("big", 1000000L)) // 1000 erlangs cannot reach 1% within 128 -> NULL
      .toDF("trunk", "erlang_milli")
    val got = RoutingQ.erlangCapacity(loads,
        targetBlockPpm = 10000L, maxCircuits = 128)
      .as[(String, Long, Option[Long], Long)].collect()
      .map(r => r._1 -> r).toMap
    assert(got("a")._3 == Some(3L), got("a").toString)
    assert(got("a")._4 > 0L && got("a")._4 <= 10000L, got("a").toString)
    assert(got("z") == (("z", 0L, Some(0L), 0L)), got("z").toString)
    assert(got("big")._3.isEmpty && got("big")._4 > 10000L,
      got("big").toString)
  }

  test("erlangCapacity: blocking decreases and more circuits for more load") {
    val loads = Seq(("lo", 1000L), ("hi", 10000L))
      .toDF("trunk", "erlang_milli")
    val got = RoutingQ.erlangCapacity(loads)
      .as[(String, Long, Option[Long], Long)].collect()
      .map(r => r._1 -> r._3.get).toMap
    assert(got("hi") > got("lo"), got.toString)
  }

  // --- q261 profile drift ----------------------------------------------------

  test("profileDrift: null rates, cardinality and extremes by hand") {
    val df = Seq(
      (true, Some("a"), 1L), (true, Some("b"), 2L),
      (true, None, 3L), (true, Some("a"), 4L),
      (false, Some("a"), 5L), (false, None, 6L))
      .toDF("is_ref", "s", "k")
    val got = graft.queries.CurationQ.profileDrift(df, Seq("s", "k"))
      .as[(String, Long, Long, Long, Long, Long, Long,
        Option[String], Option[String], Option[String], Option[String], Long)]
      .collect().map(r => r._1 -> r).toMap
    val s = got("s")
    // ref: 4 rows, 1 null -> 250000 ppm, 2 distinct, min a max b;
    // cur: 2 rows, 1 null -> 500000 ppm, 1 distinct
    assert(s == (("s", 4L, 2L, 250000L, 500000L, 2L, 1L,
      Some("a"), Some("b"), Some("a"), Some("a"), 250000L)), s.toString)
    val k = got("k")
    assert(k._6 == 4L && k._7 == 2L && k._8 == Some("1") &&
      k._9 == Some("4") && k._12 == 0L, k.toString)
  }

  test("profileDrift: an empty side reports zero rows without dividing") {
    val df = Seq((true, Some("x"))).toDF("is_ref", "s")
    val got = graft.queries.CurationQ.profileDrift(df, Seq("s"))
      .as[(String, Long, Long, Long, Long, Long, Long,
        Option[String], Option[String], Option[String], Option[String], Long)]
      .head()
    assert(got._3 == 0L && got._5 == 0L && got._10.isEmpty, got.toString)
  }

  // --- q262 waterfilling -----------------------------------------------------

  test("waterfillAllocation: capped slack redistributes by share, by hand") {
    // a=100 tokens at 50% share, b=10_000 at 30%, c=10_000 at 20%;
    // budget 1000: a demands 500 but holds 100 -> caps; level solves
    // (1000-100)/(0.5) = 1800 -> b gets 540, c gets 360
    val d = Seq(("a", 100L, 500000L), ("b", 10000L, 300000L),
      ("c", 10000L, 200000L)).toDF("domain", "avail", "share_ppm")
    val got = graft.queries.CurationQ.waterfillAllocation(d, budget = 1000L)
      .as[(String, Long, Long, Boolean, Long, Long, Long)]
      .collect().map(r => r._1 -> r).toMap
    assert(got("a") == (("a", 100L, 500000L, true, 100L, 1000L, 0L)),
      got("a").toString)
    assert(got("b")._4 == false && got("b")._5 == 540L, got("b").toString)
    assert(got("c")._5 == 360L, got("c").toString)
  }

  test("waterfillAllocation: a budget beyond the corpus caps everyone") {
    val d = Seq(("a", 50L, 600000L), ("b", 30L, 400000L))
      .toDF("domain", "avail", "share_ppm")
    val got = graft.queries.CurationQ.waterfillAllocation(d, budget = 500L)
      .as[(String, Long, Long, Boolean, Long, Long, Long)].collect()
    assert(got.forall(_._4), got.mkString(","))
    assert(got.head._6 == 80L && got.head._7 == 420L, got.mkString(","))
  }

  test("waterfillAllocation: shares that do not sum to 1e6 fail loudly") {
    val d = Seq(("a", 50L, 600000L), ("b", 30L, 500000L))
      .toDF("domain", "avail", "share_ppm")
    val e = intercept[Exception] {
      graft.queries.CurationQ.waterfillAllocation(d, 100L).collect()
    }
    assert(e.getMessage.contains("sum to 1e6"), e.getMessage)
  }

  test("waterfillAllocation: truncation loss is bounded by |domains|") {
    val d = Seq(("a", 1000L, 333333L), ("b", 1000L, 333333L),
      ("c", 1000L, 333334L)).toDF("domain", "avail", "share_ppm")
    val got = graft.queries.CurationQ.waterfillAllocation(d, budget = 1000L)
      .as[(String, Long, Long, Boolean, Long, Long, Long)].collect()
    val shortfall = got.head._7
    assert(shortfall >= 0L && shortfall <= 3L, got.mkString(","))
  }

  // --- PrefixSum partitionCols --------------------------------------------

  test("PrefixSum.exclusive with partitionCols equals per-group windows") {
    import org.apache.spark.sql.expressions.Window
    val rows = (1 to 400).map(i =>
      (s"g${i % 5}", (i * 131L) % 2000L, (i % 13).toLong))
      .toDF("g", "k", "w")
      .dropDuplicates("g", "k")
    val got = PrefixSum.exclusive(rows, "k", Seq("w"), bucketWidth = 64L,
        partitionCols = Seq("g"))
      .select(col("g"), col("k"), col("w_cum"))
      .collect().map(_.toSeq).toSet
    val naive = rows.withColumn("w_cum",
        coalesce(sum(col("w")).over(Window.partitionBy(col("g"))
          .orderBy(col("k"))
          .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .select(col("g"), col("k"), col("w_cum"))
      .collect().map(_.toSeq).toSet
    assert(got == naive)
  }
}
