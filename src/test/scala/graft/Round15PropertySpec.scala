package graft

import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop, Test => ScTest}

import graft.queries.{AnalyticsQ, CrawlQ}

/** Randomized equivalence for the round-15 kernels: each distributed
  * construction pinned against an independent in-memory replay of its
  * contract on arbitrary inputs (the RoundEight..Fourteen PropertySpec
  * convention). JVM `Long` division truncates toward zero exactly like
  * Spark's `DIV` and DuckDB's `//`, so the replays fold with plain `/`. */
class Round15PropertySpec extends SparkSpec {

  import spark.implicits._

  private def check(p: Prop, n: Int = 10): Unit = {
    val res = ScTest.check(
      ScTest.Parameters.default.withMinSuccessfulTests(n), p)
    assert(res.passed, res.status.toString)
  }

  // ---- q349 winsorized mean ------------------------------------------------

  test("winsorizedMeanCard equals the in-memory clamp-and-fold at any " +
      "alpha, including the all-trimmed degenerate") {
    val gen = for {
      n <- Gen.chooseNum(1, 60)
      xs <- Gen.listOfN(n, Gen.chooseNum(-50L, 50L))
      a <- Gen.chooseNum(1, 40)
    } yield (xs, a)
    check(Prop.forAll(gen) { case (xs, a) =>
      val got = AnalyticsQ.winsorizedMeanCard(
          xs.map(Tuple1(_)).toDF("x"), "x", alphaPct = a)
        .select(col("n"), col("k"), col("lo_val"), col("hi_val"),
          col("win_sum"), col("win_mean_milli"))
        .as[(Long, Long, Option[Long], Option[Long], Option[Long],
          Option[Long])].head()
      val n = xs.size.toLong
      val k = (a * n + 99) / 100
      val exp =
        if (n <= 2 * k) (n, k, None, None, None, None)
        else {
          val s = xs.sorted
          val lo = s(k.toInt)            // rank k+1, 0-indexed
          val hi = s((n - k - 1).toInt)  // rank n-k
          val win = s.zipWithIndex.map { case (v, i) =>
            if (i < k) lo else if (i >= n - k) hi else v }.sum
          (n, k, Some(lo), Some(hi), Some(win),
            Some((1000L * win) / n))
        }
      got == exp
    })
  }

  // ---- q347 Mood's median test --------------------------------------------

  test("moodMedianTest equals the in-memory 2xk chi-square over the " +
      "exact lower median on arbitrary grouped values") {
    val gen = for {
      k <- Gen.chooseNum(2, 4)
      n <- Gen.chooseNum(2, 50)
      rows <- Gen.listOfN(n, Gen.zip(Gen.chooseNum(0, k - 1),
        Gen.chooseNum(-9L, 9L)))
    } yield rows.map { case (g, x) => (s"g$g", x) }
    check(Prop.forAll(gen) { rows =>
      val got = AnalyticsQ.moodMedianTest(rows.toDF("g", "x"), "g", "x")
        .select(col("n_rows"), col("n_groups"), col("median"),
          col("dof"), col("chi2_milli"), col("medians_differ"))
        .as[(Long, Long, Long, Long, Long, Option[Boolean])].head()
      val n = rows.size
      val med = rows.map(_._2).sorted.apply((n + 1) / 2 - 1)
      val cells = rows.groupBy(r => (r._1, r._2 > med))
        .view.mapValues(_.size.toLong).toMap
      val groups = rows.map(_._1).distinct.sorted
      val sides = cells.keys.map(_._2).toSeq.distinct
      val rt = groups.map(g => g -> sides.map(s =>
        cells.getOrElse((g, s), 0L)).sum).toMap
      val ct = sides.map(s => s -> groups.map(g =>
        cells.getOrElse((g, s), 0L)).sum).toMap
      val chi2 = (for { g <- groups; s <- sides } yield {
        val o = BigInt(cells.getOrElse((g, s), 0L))
        val d = o * n - BigInt(rt(g)) * ct(s)
        (BigInt(1000) * d * d) / (BigInt(n) * rt(g) * ct(s))
      }).sum.toLong
      val dof = (groups.size - 1L) * (sides.size - 1L)
      val expFlag =
        if (dof < 1) None
        else AnalyticsQ.chi2Crit05Micro.get(dof.toInt)
          .map(c => chi2 * 1000 > c)
      got == ((n.toLong, groups.size.toLong, med, dof, chi2, expFlag))
    })
  }

  // ---- q348 log-rank -------------------------------------------------------

  test("logRankTest equals the in-memory hypergeometric fold on " +
      "arbitrary two-group censored cohorts") {
    val gen = for {
      n <- Gen.chooseNum(2, 60)
      rows <- Gen.listOfN(n, Gen.zip(Gen.oneOf(true, false),
        Gen.chooseNum(0L, 5L), Gen.oneOf(true, false)))
    } yield rows
    check(Prop.forAll(gen) { rows =>
      val got = AnalyticsQ.logRankTest(
          rows.toDF("a", "b", "d"), col("a"), "b", "d")
        .select(col("n_subjects"), col("n_deaths"), col("o1"),
          col("e1_milli"), col("v_milli"), col("chi2_milli"),
          col("survival_differs"))
        .as[(Long, Long, Long, Long, Long, Option[Long], Boolean)]
        .head()
      val buckets = rows.map(_._2).distinct.sorted
      def atRisk(b: Long) = rows.count(_._2 >= b).toLong
      def atRiskA(b: Long) = rows.count(r => r._1 && r._2 >= b).toLong
      val o1 = rows.count(r => r._1 && r._3).toLong
      val deaths = rows.count(_._3).toLong
      val e1 = buckets.map { b =>
        val (nj, n1j) = (atRisk(b), atRiskA(b))
        val dj = rows.count(r => r._2 == b && r._3).toLong
        (1000L * n1j * dj) / nj
      }.sum
      val v = buckets.map { b =>
        val (nj, n1j) = (atRisk(b), atRiskA(b))
        val dj = rows.count(r => r._2 == b && r._3).toLong
        if (nj >= 2)
          (1000L * n1j * (nj - n1j) * dj * (nj - dj)) /
            (nj * nj * (nj - 1))
        else 0L
      }.sum
      val delta = BigInt(1000L * o1 - e1)
      val expChi = if (v > 0) Some((delta * delta / v).toLong) else None
      val expFlag = v > 0 && delta * delta * 1000 > BigInt(3841458L) * v
      got == ((rows.size.toLong, deaths, o1, e1, v, expChi, expFlag))
    })
  }

  // ---- q352 Mann-Whitney gate ----------------------------------------------

  test("mannWhitneyGate equals the in-memory tie-corrected z-square on " +
      "arbitrary two-group samples, including the all-tied degenerate") {
    val gen = for {
      na <- Gen.chooseNum(0, 30)
      nb <- Gen.chooseNum(1, 30)
      tied <- Gen.oneOf(true, false)
      as <- Gen.listOfN(na,
        if (tied) Gen.const(5.0) else Gen.chooseNum(0L, 12L).map(_ * 0.25))
      bs <- Gen.listOfN(nb,
        if (tied) Gen.const(5.0) else Gen.chooseNum(0L, 12L).map(_ * 0.25))
    } yield (as, bs)
    check(Prop.forAll(gen) { case (as, bs) =>
      val df = (as.map(("purchase", _)) ++ bs.map(("click", _)))
        .toDF("event_type", "value")
      val got = AnalyticsQ.mannWhitneyGate(df, "purchase", "click")
        .select(col("n_a"), col("n_b"), col("u2_a"), col("tie_ppm"),
          col("z2_milli"), col("groups_differ"))
        .as[(Long, Long, Long, Option[Long], Option[Long], Boolean)]
        .head()
      val av = as.map(v => math.round(v * 100))
      val bv = bs.map(v => math.round(v * 100))
      val u2 = 2L * av.map(a =>
        bv.count(_ < a).toLong).sum + av.map(a => bv.count(_ == a).toLong).sum
      val n = av.size + bv.size
      val t3 = (av ++ bv).groupBy(identity).values
        .map(g => { val t = g.size.toLong; t * t * t - t }).sum
      val w = (n + 1L) * n * (n - 1L) - t3
      val tiePpm = if (n >= 2)
        Some((BigInt(1000000) * t3 /
          (BigInt(n.toLong) * n * n - n)).toLong) else None
      val delta = BigInt(u2) - BigInt(av.size.toLong) * bv.size
      // the shipped two-quotient split, replayed verbatim
      val z2 = if (w > 0 && av.nonEmpty && bv.nonEmpty) {
        val a2 = delta * delta / (BigInt(av.size.toLong) * bv.size)
        Some((BigInt(3000) * n * (n - 1) * a2 / w).toLong)
      } else None
      val flag = z2.exists(z => BigInt(z) * 1000 > BigInt(3841458L))
      got == ((av.size.toLong, bv.size.toLong, u2, tiePpm, z2, flag))
    })
  }

  // ---- q351 RMST -----------------------------------------------------------

  test("rmstCard equals the in-memory KM grid fold on a hand cohort " +
      "with censoring and an unobserved-bucket gap") {
    // horizon = max ts; users: u1 span 0d (ends day0, censored? horizon
    // - last >= gap -> churned), u2 span 1d churned, u3 span 3d
    // straddles the gap at bucket 2, u4 alive at horizon (censored)
    def ev(u: Long, d: Int) = (u, f"2024-01-${d + 1}%02d 12:00:00")
    val rows = Seq(ev(1, 0), ev(2, 0), ev(2, 1), ev(3, 0), ev(3, 3),
      ev(4, 6), ev(4, 9))
    val df = rows.toDF("user_id", "ts0")
      .select(col("user_id"), col("ts0").cast("timestamp").as("ts"))
    val got = AnalyticsQ.rmstCard(df, horizonBuckets = 6,
        intervalDays = 1, churnGapSec = 86400L)
      .select(col("horizon_buckets"), col("rmst_ppm_buckets"),
        col("rmst_milli_days"))
      .as[(Long, Long, Long)].head()
    // in-memory replay: spans 0,1,3,3(censored u4: horizon-last=0<1d)
    val aged = Seq((0L, false), (1L, false), (3L, false), (3L, true))
    val buckets = aged.map(_._1).distinct.sorted
    var s = 1000000L
    val sAfter = buckets.map { b =>
      val nAtRisk = aged.count(_._1 >= b).toLong
      val churned = aged.count(a => a._1 == b && !a._2).toLong
      s = (s * (nAtRisk - churned)) / nAtRisk
      b -> s
    }.toMap
    val rmst = (0L until 6L).map { b =>
      buckets.filter(_ < b).lastOption.map(sAfter).getOrElse(1000000L)
    }.sum
    assert(got == ((6L, rmst, rmst / 1000L)), s"$got vs rmst=$rmst")
  }

  // ---- q350 URL shape card -------------------------------------------------

  test("urlShapeCard counts depth, query and tracking shares exactly") {
    val docs = Seq(
      ("http://a.com/x/y?b=2", 1L), ("https://www.A.com/", 2L),
      ("http://a.com/x?utm_source=rss&a=1", 3L),
      ("http://b.co.uk/one/two/three", 4L))
      .toDF("url", "doc_id")
    val got = graft.queries.CrawlQ.urlShapeCard(docs, "url")
      .orderBy(col("domain"))
      .as[(String, Long, Long, Long, Long)].collect().toSeq
    assert(got == Seq(
      // a.com: depths 2,0,1 -> mean 1000; 2/3 with query; 1/3 tracking
      ("a.com", 3L, 1000L, 666666L, 333333L),
      ("b.co.uk", 1L, 3000L, 0L, 0L)), got.toString)
  }

  // ---- q345 crawl funnel ---------------------------------------------------

  test("the crawl funnel is monotone per language and its dedup stage " +
      "keeps exactly one doc per canonical URL") {
    val docs = (0 until 200).map(i =>
      (i.toLong, s"src${i % 7}", s"l${i % 3}"))
      .toDF("doc_id", "source", "lang")
      .withColumn("url", expr(CrawlQ.fixtureUrlSpark))
    val keepers = CrawlQ.canonicalUrlDedup(docs, "url")
    val kept = docs.join(keepers.select(col("keeper").as("doc_id")),
      Seq("doc_id"), "left_semi")
    assert(kept.count() ==
      docs.select(CrawlQ.canonicalUrl("url")).distinct().count(),
      "dedup stage must keep one doc per canonical URL")
    val capped = CrawlQ.domainCap(kept, "url", 2)
    val funnel = docs.groupBy(col("lang")).agg(count(lit(1)).as("r"))
      .join(kept.groupBy(col("lang")).agg(count(lit(1)).as("d")),
        Seq("lang"), "left")
      .join(capped.groupBy(col("lang")).agg(count(lit(1)).as("c")),
        Seq("lang"), "left")
      .select(col("r"), coalesce(col("d"), lit(0L)),
        coalesce(col("c"), lit(0L)))
      .as[(Long, Long, Long)].collect()
    funnel.foreach { case (r, d, c) =>
      assert(c <= d && d <= r, s"funnel not monotone: $r/$d/$c")
    }
    // every domain respects the cap
    val perDomain = capped.groupBy(col("domain")).count()
      .agg(max(col("count"))).head.getLong(0)
    assert(perDomain <= 2, s"cap breached: $perDomain")
  }
}
