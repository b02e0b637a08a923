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
