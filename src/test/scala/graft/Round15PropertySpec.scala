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

  // ---- q353/q354 mean-difference family -----------------------------------

  test("meanDiffCard and welchGate equal the in-memory two-quotient / " +
      "ceil-denominator replay on arbitrary samples, including empty " +
      "and constant sides") {
    val gen = for {
      na <- Gen.chooseNum(0, 40)
      nb <- Gen.chooseNum(0, 40)
      as <- Gen.listOfN(na, Gen.chooseNum(0L, 10000L))
      bs <- Gen.listOfN(nb, Gen.chooseNum(0L, 10000L))
      if na + nb > 0
    } yield (as, bs)
    check(Prop.forAll(gen) { case (as, bs) =>
      val df = (as.map(("purchase", _)) ++ bs.map(("click", _)))
        .map { case (t, cv) => (t, cv / 100.0) }
        .toDF("event_type", "value")
      val smd = AnalyticsQ.meanDiffCard(df, "purchase", "click")
        .select(col("n_a"), col("n_b"), col("mean_diff_milli"),
          col("d2_ppm"), col("direction"))
        .as[(Long, Long, Option[Long], Option[Long], Option[Int])]
        .head()
      val wg = AnalyticsQ.welchGate(df, "purchase", "click")
        .select(col("n_a"), col("n_b"), col("z2_milli"),
          col("means_differ"))
        .as[(Long, Long, Option[Long], Boolean)].head()
      val (na, nb) = (BigInt(as.size), BigInt(bs.size))
      val (sa, sb) = (BigInt(as.sum), BigInt(bs.sum))
      val qa = as.map(v => BigInt(v) * v).sum
      val qb = bs.map(v => BigInt(v) * v).sum
      val diff = sa * nb - sb * na
      val (va, vb) = (na * qa - sa * sa, nb * qb - sb * sb)
      val md = if (na > 0 && nb > 0)
        Some(((1000 * diff) / (na * nb)).toLong) else None
      val a1 = if (na > 0 && nb > 0)
        Some((diff * diff) / (na * nb)) else None
      val d2 = a1.filter(_ => va * nb + vb * na > 0)
        .map(a => ((BigInt(1000000) * a * (na + nb - 2))
          / (va * nb + vb * na)).toLong)
      val dir = if (na > 0 && nb > 0) Some(diff.signum) else None
      // welch replay: numerator twice-truncated down, denominator ceil'd
      val b = a1.map(x => (BigInt(1000000000) * x) / (na * nb))
      def ceilDiv(x: BigInt, d: BigInt) = (x + d - 1) / d
      val se2k = if (na >= 2 && nb >= 2)
        Some(ceilDiv(BigInt(1000000) * va, na * na * (na - 1))
          + ceilDiv(BigInt(1000000) * vb, nb * nb * (nb - 1)))
        else None
      val z2 = for { s <- se2k if s > 0; bb <- b } yield (bb / s).toLong
      val flag = z2.exists(z => BigInt(z) * 1000 > BigInt(3841458L))
      smd == ((na.toLong, nb.toLong, md, d2, dir)) &&
        wg == ((na.toLong, nb.toLong, z2, flag))
    })
  }

  test("welchGate z2 never exceeds the true z-squared (every rounding " +
      "is conservative) and fires on a planted shift") {
    val as = (1 to 60).map(i => ("purchase", 10.0 + (i % 7)))
    val bs = (1 to 60).map(i => ("click", 25.0 + (i % 5)))
    val df = (as ++ bs).toDF("event_type", "value")
    val (z2, flag) = AnalyticsQ.welchGate(df, "purchase", "click")
      .select(col("z2_milli"), col("means_differ"))
      .as[(Option[Long], Boolean)].head()
    // true z2 via doubles
    def stats(xs: Seq[Double]) = {
      val n = xs.size; val m = xs.sum / n
      (n, m, xs.map(x => (x - m) * (x - m)).sum / (n - 1))
    }
    val (n1, m1, v1) = stats(as.map(_._2 * 100))
    val (n2, m2, v2) = stats(bs.map(_._2 * 100))
    val trueZ2 = (m1 - m2) * (m1 - m2) / (v1 / n1 + v2 / n2)
    assert(flag && z2.isDefined)
    assert(z2.get <= math.ceil(trueZ2 * 1000).toLong,
      s"z2_milli ${z2.get} overstates true ${trueZ2 * 1000}")
    assert(z2.get >= (trueZ2 * 1000 * 0.99).toLong - 2,
      s"z2_milli ${z2.get} far below true ${trueZ2 * 1000}")
  }

  // ---- q355 Ljung-Box -----------------------------------------------------

  test("ljungBoxGate equals the in-memory fraction-cleared replay on " +
      "arbitrary series, including constant and single-row series") {
    val gen = for {
      n <- Gen.chooseNum(1, 40)
      xs <- Gen.listOfN(n, Gen.chooseNum(0L, 50L))
    } yield xs
    check(Prop.forAll(gen) { xs =>
      val rows = xs.zipWithIndex.map { case (x, i) =>
        ("g", i.toLong, x) }
      val got = AnalyticsQ.ljungBoxGate(rows.toDF("g", "o", "x"),
          "g", "o", "x")
        .select(col("n_obs"), col("dof"), col("q_milli"),
          col("nonwhite"))
        .as[(Long, Long, Option[Long], Boolean)].head()
      val n = BigInt(xs.size)
      val sx = BigInt(xs.sum)
      val qx = xs.map(v => BigInt(v) * v).sum
      val dn = n * (n * qx - sx * sx)
      val dof = math.min(10L, xs.size - 1L)
      val qm: Option[Long] = if (dof >= 1 && dn != 0) {
        val terms = (1 to dof.toInt).map { k =>
          val pk = (0 until xs.size - k)
            .map(t => BigInt(xs(t)) * xs(t + k)).sum
          val hk = BigInt(xs.dropRight(k).sum)
          val tk = BigInt(xs.drop(k).sum)
          val nk = n * n * pk - n * sx * (hk + tk) + (n - k) * sx * sx
          val r = (BigInt(1000000) * nk) / dn
          (r * r) / (n - k)
        }
        Some(((n * (n + 2) * terms.sum) / BigInt(1000000000)).toLong)
      } else None
      val crit = AnalyticsQ.chi2Crit05Micro.get(dof.toInt)
      val flag = qm.exists(q => crit.exists(c => BigInt(q) * 1000 > c))
      got == ((n.toLong, math.max(dof, 0L), qm, flag))
    })
  }

  // ---- q356 Holm screen ---------------------------------------------------

  test("holmScreen equals the full in-memory step-down replay on an " +
      "arbitrary battery, and a failing upper rank blocks a lower rank " +
      "that passes its own laxer threshold") {
    val gen = for {
      m <- Gen.chooseNum(2, 7)
      series <- Gen.listOfN(m, for {
        n <- Gen.chooseNum(2, 25)
        xs <- Gen.listOfN(n, Gen.chooseNum(0L, 20L))
      } yield xs)
    } yield series
    check(Prop.forAll(gen) { series =>
      val named = series.zipWithIndex.map { case (xs, i) =>
        (s"s$i", xs) }
      val rows = named.flatMap { case (g, xs) =>
        xs.zipWithIndex.map { case (x, o) => (g, o.toLong, x) } }
      val got = AnalyticsQ.holmScreen(rows.toDF("g", "o", "x"),
          "g", "o", "x")
        .select(col("g"), col("z2c_micro"), col("rnk"),
          col("holm_reject"), col("bonf_reject"))
        .as[(String, Option[Long], Long, Boolean, Boolean)]
        .collect().toSeq.sortBy(_._3)
      // in-memory MK per series -> z2c_micro
      val stats = named.map { case (g, xs) =>
        val n = BigInt(xs.size)
        val s = (for { i <- xs.indices; j <- xs.indices if i < j }
          yield java.lang.Long.signum(xs(j) - xs(i)).toLong).sum
        val tc = xs.groupBy(identity).values.map(_.size)
          .map(t => BigInt(t) * (t - 1) * (2 * t + 5)).sum
        val vn = n * (n - 1) * (2 * n + 5) - tc
        val z = if (vn > 0 && s != 0)
          Some(((BigInt(s.abs - 1) * (s.abs - 1) * 18 * 1000000) / vn)
            .toLong)
          else None
        (g, s, vn, z)
      }
      val m = stats.size
      val ordered = stats.sortBy { case (g, _, _, z) =>
        (z.map(v => -v).getOrElse(Long.MaxValue), g) }
      val crit = AnalyticsQ.chi2Crit05DivKMicroDf1
      val passes = ordered.zipWithIndex.map { case ((_, s, vn, _), i) =>
        val k = m - i
        crit.get(k).exists(c =>
          vn > 0 && s != 0 &&
            BigInt(s.abs - 1) * (s.abs - 1) * 18 * 1000000 >
              BigInt(c) * vn)
      }
      val holm = passes.scanLeft(true)(_ && _).tail
      val bonf = ordered.map { case (_, s, vn, _) =>
        crit.get(m).exists(c =>
          vn > 0 && s != 0 &&
            BigInt(s.abs - 1) * (s.abs - 1) * 18 * 1000000 >
              BigInt(c) * vn)
      }
      val exp = ordered.zipWithIndex.map { case ((g, _, _, z), i) =>
        (g, z, (i + 1).toLong, holm(i), bonf(i)) }
      got == exp
    })
    // deterministic blocking pin: two tie-free 20-point series with
    // S = 66 (z2 = 4.447) and S = 64 (z2 = 4.178) — BOTH above the
    // uncorrected 3.841 threshold, but rank 1 fails its alpha/2 gate
    // (crit 5.024), so the step-down blocks BOTH: exactly the
    // 1-in-20-null false positive the family-wise screen exists to
    // kill (and Bonferroni agrees here).
    val s66 = Seq(10, 9, 8, 7, 11, 6, 5, 4, 3, 2, 1, 0, 12, 13, 14,
      15, 16, 17, 18, 19)
    val s64 = Seq(10, 9, 8, 11, 7, 6, 5, 4, 3, 2, 1, 0, 12, 13, 14,
      15, 16, 17, 18, 19)
    val rows = s66.zipWithIndex.map { case (x, o) =>
        ("a66", o.toLong, x.toLong) } ++
      s64.zipWithIndex.map { case (x, o) =>
        ("b64", o.toLong, x.toLong) }
    val scr = AnalyticsQ.holmScreen(rows.toDF("g", "o", "x"),
        "g", "o", "x")
      .select(col("g"), col("z2c_micro"), col("rnk"),
        col("holm_reject"), col("bonf_reject"))
      .as[(String, Option[Long], Long, Boolean, Boolean)]
      .collect().map(r => r._1 -> r).toMap
    assert(scr("a66") == (("a66", Some(4447368L), 1L, false, false)))
    assert(scr("b64") == (("b64", Some(4177894L), 2L, false, false)))
    assert(scr.values.forall(_._2.exists(_ > 3841459L)),
      "both series must individually exceed the uncorrected gate")
  }

  // ---- q359 Brown-Forsythe ------------------------------------------------

  test("brownForsytheGate equals the in-memory median-deviation ANOVA " +
      "replay on arbitrary groups, including internally-constant ones") {
    val gen = for {
      k <- Gen.chooseNum(1, 5)
      groups <- Gen.listOfN(k, for {
        n <- Gen.chooseNum(1, 25)
        xs <- Gen.listOfN(n, Gen.chooseNum(0L, 60L))
      } yield xs)
    } yield groups
    check(Prop.forAll(gen) { groups =>
      val rows = groups.zipWithIndex.flatMap { case (xs, i) =>
        xs.map((s"g$i", _)) }
      val got = AnalyticsQ.brownForsytheGate(rows.toDF("g", "x"),
          "g", "x")
        .select(col("n_rows"), col("n_groups"), col("dof"),
          col("chi2_milli"), col("variances_differ"))
        .as[(Long, Long, Long, Option[Long], Option[Boolean])].head()
      def lowerMedian(xs: Seq[Long]): Long =
        xs.sorted.apply(((xs.size + 1) / 2) - 1)
      val zs = groups.map { xs =>
        val m = lowerMedian(xs); xs.map(x => math.abs(x - m)) }
      val nT = BigInt(zs.map(_.size).sum)
      val k = zs.size
      val ss = BigInt(zs.map(_.sum).sum)
      val qq = zs.flatMap(_.map(z => BigInt(z) * z)).sum
      val sb = zs.map { z =>
        val si = BigInt(z.sum); (si * si) / z.size }.sum
      val a3 = zs.map { z =>
        val si = BigInt(z.sum); val ni = BigInt(z.size)
        val e = (nT * si - ni * ss) / ni
        ni * e * e }.sum
      val b2 = qq - sb
      val chi2 = if (k >= 2 && b2 > 0)
        Some((((nT - k) * ((BigInt(1000) * a3) / (nT * nT))) / b2)
          .toLong) else None
      val crit = AnalyticsQ.chi2Crit05Micro.get(k - 1)
      val flag: Option[Boolean] = chi2.flatMap(c =>
        crit.map(cr => BigInt(c) * 1000 > cr))
      got == ((nT.toLong, k.toLong, k - 1L, chi2, flag))
    })
  }

  // ---- q360 Friedman ------------------------------------------------------

  test("friedmanTest equals the in-memory double-rank replay on " +
      "arbitrary complete-plus-ragged block designs") {
    val gen = for {
      k <- Gen.chooseNum(2, 5)
      n <- Gen.chooseNum(1, 15)
      blocks <- Gen.listOfN(n, Gen.listOfN(k, Gen.chooseNum(0L, 8L)))
      ragged <- Gen.listOfN(3, Gen.chooseNum(1, k - 1))
    } yield (k, blocks, ragged)
    check(Prop.forAll(gen) { case (k, blocks, ragged) =>
      // complete blocks 0..n-1, plus ragged blocks that must be DROPPED
      val rows = blocks.zipWithIndex.flatMap { case (ys, b) =>
        ys.zipWithIndex.map { case (y, t) =>
          (b.toLong, s"t$t", y) } } ++
        ragged.zipWithIndex.flatMap { case (nt, i) =>
          (0 until nt).map(t => (1000L + i, s"t$t", 1L)) }
      val got = AnalyticsQ.friedmanTest(rows.toDF("b", "tr", "y"),
          "b", "tr", "y")
        .select(col("k_treatments"), col("n_blocks"), col("dof"),
          col("q_milli"), col("treatments_differ"))
        .as[(Long, Long, Long, Option[Long], Option[Boolean])].head()
      // in-memory: double ranks within each complete block
      val ds = blocks.map { ys =>
        ys.map(y => 2L * (ys.count(_ < y) + 1) + ys.count(_ == y) - 1L) }
      val n = BigInt(blocks.size)
      val djs = (0 until k).map(t => ds.map(row => BigInt(row(t))).sum)
      val num = djs.map(dj => (dj - n * (k + 1)) * (dj - n * (k + 1))).sum
      val sd2 = ds.flatten.map(d => BigInt(d) * d).sum
      val den = sd2 - n * k * (k + 1) * (k + 1)
      val q = if (k >= 2 && n >= 1 && den > 0)
        Some(((BigInt(1000) * (k - 1) * num) / den).toLong) else None
      val crit = AnalyticsQ.chi2Crit05Micro.get(k - 1)
      val flag: Option[Boolean] = q.flatMap(v =>
        crit.map(cr => BigInt(v) * 1000 > cr))
      got == ((k.toLong, n.toLong, k - 1L, q, flag))
    })
  }
}
