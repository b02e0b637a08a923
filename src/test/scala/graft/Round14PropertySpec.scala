package graft

import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop, Test => ScTest}

import graft.queries.{AnalyticsQ, CurationQ, RoutingQ}

/** Randomized equivalence for the round-14 kernels: each distributed
  * construction pinned against an independent in-memory replay of its
  * contract on arbitrary inputs (the RoundEight..Thirteen PropertySpec
  * convention). JVM `Long` division truncates toward zero exactly like
  * Spark's `DIV` and DuckDB's `//`, so the replays fold with plain `/`. */
class Round14PropertySpec extends SparkSpec {

  import spark.implicits._

  private def check(p: Prop, n: Int = 12): Unit = {
    val res = ScTest.check(
      ScTest.Parameters.default.withMinSuccessfulTests(n), p)
    assert(res.passed, res.status.toString)
  }

  // ---- q324 Cochran's Q ---------------------------------------------------

  private val panelGen = for {
    n <- Gen.chooseNum(1, 50)
    rows <- Gen.listOfN(n, Gen.zip(Gen.oneOf(true, false),
      Gen.oneOf(true, false), Gen.oneOf(true, false)))
  } yield rows

  test("cochranQ equals the in-memory fold and is invariant under " +
      "rater permutation") {
    check(Prop.forAll(panelGen) { rows =>
      val df = rows.toDF("a", "b", "c")
      def run(order: Seq[String]) =
        AnalyticsQ.cochranQ(df, order.map(col))
          .select(col("s_total"), col("q_milli"))
          .as[(Long, Option[Long])].head()
      val got = run(Seq("a", "b", "c"))
      val l = rows.map(r =>
        Seq(r._1, r._2, r._3).count(identity).toLong)
      val g = Seq(rows.count(_._1), rows.count(_._2), rows.count(_._3))
        .map(_.toLong)
      val s = l.sum
      val num = 2L * (3L * g.map(x => x * x).sum - s * s)
      val den = 3L * s - l.map(x => x * x).sum
      val expQ = if (den > 0) Some((1000L * num) / den) else None
      got == ((s, expQ)) && run(Seq("c", "a", "b")) == got
    })
  }

  // ---- q325 Kendall tau (series) -----------------------------------------

  private val seriesGen = for {
    n <- Gen.chooseNum(1, 25)
    rows <- Gen.listOfN(n, Gen.zip(Gen.chooseNum(-20L, 20L),
      Gen.chooseNum(-20L, 20L)))
  } yield rows.zipWithIndex.map { case ((x, y), i) => (i.toLong, x, y) }

  test("kendallTauSeries equals the in-memory pair count, and negating " +
      "y swaps concordant/discordant with an exactly mirrored tau") {
    check(Prop.forAll(seriesGen) { rows =>
      def run(flip: Boolean) = AnalyticsQ.kendallTauSeries(
          rows.map { case (o, x, y) => ("g", o, x, if (flip) -y else y) }
            .toDF("g", "o", "x", "y"), "g", "o", "x", "y")
        .select(col("n_pairs"), col("concordant"), col("discordant"),
          col("ties_x"), col("ties_y"), col("ties_xy"), col("tau_a_ppm"))
        .as[(Option[Long], Option[Long], Option[Long], Option[Long],
          Option[Long], Option[Long], Option[Long])].head()
      val got = run(flip = false)
      val pairs = for {
        i <- rows.indices; j <- rows.indices if i < j
      } yield (java.lang.Long.signum(rows(j)._2 - rows(i)._2),
        java.lang.Long.signum(rows(j)._3 - rows(i)._3))
      val np = pairs.size.toLong
      if (np == 0) got._1.isEmpty
      else {
        val c = pairs.count(p => p._1 * p._2 > 0).toLong
        val d = pairs.count(p => p._1 * p._2 < 0).toLong
        val tx = pairs.count(p => p._1 == 0 && p._2 != 0).toLong
        val ty = pairs.count(p => p._2 == 0 && p._1 != 0).toLong
        val txy = pairs.count(p => p._1 == 0 && p._2 == 0).toLong
        val tau = (1000000L * (c - d)) / np
        val mirrored = run(flip = true)
        got == ((Some(np), Some(c), Some(d), Some(tx), Some(ty),
          Some(txy), Some(tau))) &&
          mirrored._2 == Some(d) && mirrored._3 == Some(c) &&
          mirrored._7 == Some(-tau)
      }
    })
  }

  // ---- q326 Mann-Kendall --------------------------------------------------

  test("mannKendallTest equals the in-memory S and tie-corrected variance, " +
      "and negating the series negates S with the same variance") {
    check(Prop.forAll(seriesGen) { rows =>
      def run(flip: Boolean) = AnalyticsQ.mannKendallTest(
          rows.map { case (o, x, _) => ("g", o, if (flip) -x else x) }
            .toDF("g", "o", "x"), "g", "o", "x")
        .select(col("n_obs"), col("s_stat"), col("var_num18"))
        .as[(Long, Long, Long)].head()
      val got = run(flip = false)
      val n = rows.size.toLong
      val s = (for { i <- rows.indices; j <- rows.indices if i < j }
        yield java.lang.Long.signum(rows(j)._2 - rows(i)._2).toLong).sum
      val tc = rows.groupBy(_._2).values.map(_.size.toLong)
        .map(t => t * (t - 1) * (2 * t + 5)).sum
      val vn = n * (n - 1) * (2 * n + 5) - tc
      val m = run(flip = true)
      got == ((n, s, vn)) && m._2 == -s && m._3 == vn
    })
  }

  // ---- q327 seasonal backtest --------------------------------------------

  test("seasonalBacktest equals the in-memory lag replay") {
    val gen = for {
      n <- Gen.chooseNum(1, 30)
      ys <- Gen.listOfN(n, Gen.chooseNum(-100L, 100L))
      m <- Gen.chooseNum(2, 9)
    } yield (ys, m)
    check(Prop.forAll(gen) { case (ys, m) =>
      val rows = ys.zipWithIndex.map { case (y, i) => ("g", i.toLong, y) }
      val got = AnalyticsQ.seasonalBacktest(rows.toDF("g", "o", "y"),
          "g", "o", "y", period = m)
        .select(col("n_obs"), col("n_eval"), col("sae_seasonal"),
          col("sae_naive"), col("smase_milli"))
        .as[(Long, Long, Option[Long], Option[Long], Option[Long])]
        .head()
      val evalIdx = ys.indices.filter(_ >= m)
      val saeS = evalIdx.map(i => math.abs(ys(i) - ys(i - m)).toLong).sum
      val saeN = evalIdx.map(i => math.abs(ys(i) - ys(i - 1)).toLong).sum
      val ne = evalIdx.size.toLong
      val exp: (Long, Long, Option[Long], Option[Long], Option[Long]) =
        if (ne == 0) ((ys.size.toLong, 0L, None, None, None))
        else ((ys.size.toLong, ne, Some(saeS), Some(saeN),
          if (saeN > 0) Some((1000L * saeS) / saeN) else None))
      got == exp
    })
  }

  // ---- q328 average precision --------------------------------------------

  test("averagePrecisionCard equals the in-memory ranked replay") {
    val gen = for {
      n <- Gen.chooseNum(1, 40)
      rows <- Gen.listOfN(n, Gen.zip(Gen.chooseNum(0L, 5L),
        Gen.oneOf(true, false)))
    } yield rows.zipWithIndex.map { case ((s, l), i) =>
      (i.toLong, s * 200000L, l) }
    check(Prop.forAll(gen) { rows =>
      val got = CurationQ.averagePrecisionCard(
          rows.toDF("id", "score_ppm", "label"))
        .select(col("n"), col("n_pos"), col("ap_ppm"), col("p10_ppm"))
        .as[(Long, Long, Option[Long], Long)].head()
      val ranked = rows.sortBy { case (id, s, _) => (-s, id) }
      var cum = 0L
      val terms = ranked.zipWithIndex.map { case ((_, _, l), i) =>
        if (l) { cum += 1; Some((1000000L * cum) / (i + 1)) } else None }
      val npos = ranked.count(_._3).toLong
      val ap = if (npos > 0) Some(terms.flatten.sum / npos) else None
      val h10 = ranked.take(10).count(_._3).toLong
      val p10 = (1000000L * h10) / math.min(10L, rows.size.toLong)
      got == ((rows.size.toLong, npos, ap, p10))
    })
  }

  // ---- q329 Brier decomposition ------------------------------------------

  test("brierDecomposition equals the in-memory binned replay") {
    val gen = for {
      n <- Gen.chooseNum(1, 60)
      rows <- Gen.listOfN(n, Gen.zip(Gen.chooseNum(0L, 1000000L),
        Gen.oneOf(true, false)))
    } yield rows
    check(Prop.forAll(gen) { rows =>
      val got = CurationQ.brierDecomposition(
          rows.toDF("score_ppm", "label"))
        .select(col("n"), col("n_pos"), col("brier_ppm"),
          col("reliability_ppm"), col("resolution_ppm"),
          col("uncertainty_ppm"))
        .as[(Long, Long, Long, Long, Long, Long)].head()
      val n = rows.size.toLong
      val npos = rows.count(_._2).toLong
      val obar = (1000000L * npos) / n
      val bins = rows.groupBy { case (s, _) => math.min(s / 100000L, 9L) }
      val sq = rows.map { case (s, l) =>
        val d = BigInt(s - (if (l) 1000000L else 0L)); d * d }.sum
      val rel = bins.values.map { rs =>
        val nk = rs.size.toLong
        val conf = rs.map(_._1).sum / nk
        val acc = (1000000L * rs.count(_._2)) / nk
        BigInt(nk) * BigInt(conf - acc) * BigInt(conf - acc) }.sum
      val res = bins.values.map { rs =>
        val nk = rs.size.toLong
        val acc = (1000000L * rs.count(_._2)) / nk
        BigInt(nk) * BigInt(acc - obar) * BigInt(acc - obar) }.sum
      val den = BigInt(n) * BigInt(1000000L)
      got == ((n, npos, (sq / den).toLong, (rel / den).toLong,
        (res / den).toLong, (obar * (1000000L - obar)) / 1000000L))
    })
  }

  // ---- q331 Cramér's V² ---------------------------------------------------

  test("cramersV2 equals the in-memory grid replay and is symmetric " +
      "in its two columns") {
    val gen = for {
      n <- Gen.chooseNum(1, 60)
      rows <- Gen.listOfN(n, Gen.zip(Gen.oneOf("a", "b", "c"),
        Gen.chooseNum(0L, 3L)))
    } yield rows
    check(Prop.forAll(gen) { rows =>
      val df = rows.toDF("r", "c")
      val got = AnalyticsQ.cramersV2(df, "r", "c")
        .select(col("n"), col("n_rows"), col("n_cols"),
          col("chi2_milli"), col("v2_ppm"))
        .as[(Long, Long, Long, Long, Option[Long])].head()
      val n = rows.size.toLong
      val rks = rows.map(_._1).distinct
      val cks = rows.map(_._2).distinct
      val chi2 = (for { r <- rks; c <- cks } yield {
        val o = rows.count(p => p._1 == r && p._2 == c).toLong
        val rt = rows.count(_._1 == r).toLong
        val ct = rows.count(_._2 == c).toLong
        val d = BigInt(n) * o - BigInt(rt) * ct
        (BigInt(1000) * d * d) / (BigInt(n) * rt * ct)
      }).sum.toLong
      val m = math.min(rks.size - 1L, cks.size - 1L)
      val v2 = if (m > 0) Some((1000L * chi2) / (n * m)) else None
      val sym = AnalyticsQ.cramersV2(
          df.select(col("c").as("r"), col("r").as("c")), "r", "c")
        .select(col("chi2_milli")).as[Long].head()
      got == ((n, rks.size.toLong, cks.size.toLong, chi2, v2)) &&
        sym == chi2
    })
  }

  // ---- q332 IRSF ----------------------------------------------------------

  test("irsfCard equals the in-memory replay on arbitrary calls and " +
      "rate dims") {
    val gen = for {
      n <- Gen.chooseNum(1, 60)
      calls <- Gen.listOfN(n, Gen.zip(Gen.chooseNum(1L, 5L),
        Gen.chooseNum(0L, 8L), Gen.chooseNum(0L, 500L)))
      prem <- Gen.listOfN(6, Gen.oneOf(true, false))
    } yield (calls, prem.zipWithIndex.map { case (p, d) => (d.toLong, p) })
    check(Prop.forAll(gen) { case (calls, dim) =>
      val got = RoutingQ.irsfCard(
          calls.toDF("caller", "dest", "dur_centi"),
          dim.toDF("dest", "premium"),
          minCalls = 5L, minPremiumSharePpm = 300000L,
          minPremiumDests = 2L)
        .select(col("subscriber"), col("n_calls"),
          col("premium_dur_centi"), col("n_premium_dests"),
          col("premium_share_ppm"), col("irsf_flag"))
        .as[(Long, Long, Long, Long, Option[Long], Boolean)]
        .collect().toSeq.sortBy(_._1)
      val pm = dim.toMap
      val exp = calls.groupBy(_._1).toSeq.sortBy(_._1).map {
        case (caller, cs) =>
          val dur = cs.map(_._3).sum
          val pcs = cs.filter(c => pm.getOrElse(c._2, false))
          val pdur = pcs.map(_._3).sum
          val pdst = pcs.map(_._2).distinct.size.toLong
          val share = if (dur > 0) Some((1000000L * pdur) / dur) else None
          (caller, cs.size.toLong, pdur, pdst, share,
            cs.size >= 5 && share.exists(_ >= 300000L) && pdst >= 2)
      }
      got == exp
    })
  }

  // ---- q334 isotonic calibration -------------------------------------------

  test("isotonicCalibration equals the minimax closed form (an " +
      "independent construction) on arbitrary histograms, and is " +
      "always nondecreasing") {
    val gen = for {
      m <- Gen.chooseNum(1, 10)
      cells <- Gen.listOfN(m, Gen.zip(Gen.chooseNum(1, 6),
        Gen.chooseNum(0, 6)))
    } yield cells.zipWithIndex.map { case ((n, p), s) =>
      (s.toLong * 1000L, n, math.min(p, n)) }
    check(Prop.forAll(gen) { cells =>
      val rows = cells.flatMap { case (s, n, p) =>
        (0 until n).map(i => (s, i < p)) }
      val got = CurationQ.isotonicCalibration(
          rows.toDF("score_ppm", "label"))
        .orderBy(col("score_ppm"))
        .select(col("score_ppm"), col("cal_ppm"))
        .as[(Long, Long)].collect().toSeq
      // minimax replay with exact BigInt rationals:
      // cal(i) = max_{j<=i} min_{k>=i} (sum p[j..k]) / (sum n[j..k])
      val ns = cells.map(_._2.toLong); val ps = cells.map(_._3.toLong)
      def rate(j: Int, k: Int) =
        (BigInt(ps.slice(j, k + 1).sum), BigInt(ns.slice(j, k + 1).sum))
      def le(a: (BigInt, BigInt), b: (BigInt, BigInt)) =
        a._1 * b._2 <= b._1 * a._2
      val exp = cells.indices.map { i =>
        val best = cells.indices.filter(_ <= i).map { j =>
          cells.indices.filter(_ >= i).map(k => rate(j, k))
            .reduce((a, b) => if (le(a, b)) a else b)
        }.reduce((a, b) => if (le(a, b)) b else a)
        (cells(i)._1, (BigInt(1000000) * best._1 / best._2).toLong)
      }
      got == exp && got.map(_._2) == got.map(_._2).sorted
    }, n = 10)
  }

  // ---- q335/q336 PR curve + threshold pick ---------------------------------

  test("prCurve and thresholdPick equal the in-memory sweep on " +
      "arbitrary scored sets") {
    val gen = for {
      n <- Gen.chooseNum(1, 50)
      rows <- Gen.listOfN(n, Gen.zip(Gen.chooseNum(0L, 8L),
        Gen.oneOf(true, false)))
    } yield rows.map { case (s, l) => (s * 125000L, l) }
    check(Prop.forAll(gen) { rows =>
      val df = rows.toDF("score_ppm", "label")
      val curve = CurationQ.prCurve(df)
        .orderBy(col("threshold_ppm").desc)
        .select(col("threshold_ppm"), col("n_kept"), col("tp"),
          col("precision_ppm"), col("recall_ppm"), col("f1_ppm"))
        .as[(Long, Long, Long, Long, Option[Long], Long)]
        .collect().toSeq
      val np = rows.count(_._2).toLong
      val thr = rows.map(_._1).distinct.sorted.reverse
      val exp = thr.map { t =>
        val kept = rows.filter(_._1 >= t)
        val nk = kept.size.toLong
        val tp = kept.count(_._2).toLong
        (t, nk, tp, (1000000L * tp) / nk,
          if (np > 0) Some((1000000L * tp) / np) else None,
          (2000000L * tp) / (nk + np))
      }
      val pick = CurationQ.thresholdPick(df, costFnMilli = 2500L,
          costFpMilli = 500L)
        .select(col("best_f1_threshold_ppm"), col("best_f1_ppm"),
          col("best_cost_threshold_ppm"), col("min_cost"))
        .as[(Long, Long, Long, Long)].head()
      val bestF1 = exp.map(r => (r._6, r._1)).maxBy(identity)
      val costs = thr.map { t =>
        val kept = rows.filter(_._1 >= t)
        val fp = kept.count(!_._2).toLong
        val fn = np - kept.count(_._2).toLong
        ((2500L * fn + 500L * fp) / 1000L, t)
      }
      val bestCost = costs.minBy(c => (c._1, -c._2))
      curve == exp &&
        pick == ((bestF1._2, bestF1._1, bestCost._2, bestCost._1))
    })
  }

  // ---- q323 drift-log audit fold -------------------------------------------

  test("the drift log folded to latest-row-per-day equals the batch " +
      "card under ARBITRARY wave partitions with compaction between " +
      "waves — deltaDrift re-emits every movable row") {
    import org.apache.spark.sql.expressions.Window
    val gen = for {
      n <- Gen.chooseNum(4, 40)
      rows <- Gen.listOfN(n, Gen.zip(Gen.chooseNum(0, 6),
        Gen.oneOf("A", "B", "C"), Gen.chooseNum(0, 3)))
      compactAfter <- Gen.chooseNum(0, 3)
    } yield (rows, compactAfter)
    check(Prop.forAll(gen) { case (rows, compactAfter) =>
      val store = java.nio.file.Files
        .createTempDirectory("graft_p14drift").toString
      val log = s"$store/driftlog"
      val sink = graft.etl.IncrementalDrift.sink(spark, store, log)
      def ev(rs: Seq[(Int, String, Int)]) =
        rs.map { case (d, t, _) => (f"2024-01-${d + 1}%02d 12:00:00", t) }
          .toDF("ts0", "event_type")
          .select(col("ts0").cast("timestamp").as("ts"),
            col("event_type"))
      // the wave index is part of the GENERATED data — any partition
      // of the corpus into arrival waves must fold to the same table
      (0 to 3).foreach { w =>
        sink(ev(rows.filter(_._3 == w)), w.toLong)
        if (w == compactAfter)
          graft.etl.IncrementalDrift.compact(spark, store)
      }
      val wDay = Window.partitionBy(col("day"))
        .orderBy(col("batch_id").desc)
      val folded = spark.read.parquet(log)
        .withColumn("__rn",
          org.apache.spark.sql.functions.row_number().over(wDay))
        .filter(col("__rn") === 1)
        .select(col("day"), col("n_events"), col("tv_ppm"))
        .as[(Long, Long, Option[Long])].collect().toSeq.sortBy(_._1)
      val batch = AnalyticsQ.tvDriftCard(ev(rows))
        .select(col("day"), col("n_events"), col("tv_ppm"))
        .as[(Long, Long, Option[Long])].collect().toSeq.sortBy(_._1)
      folded == batch
    }, n = 6)
  }

  // ---- q340 forecast interval ------------------------------------------------

  test("forecastIntervalCard equals the in-memory fold + order " +
      "statistics at any alpha") {
    val gen = for {
      n <- Gen.chooseNum(1, 30)
      ys <- Gen.listOfN(n, Gen.chooseNum(-500L, 500L))
      a <- Gen.chooseNum(0L, 1000L)
    } yield (ys, a)
    check(Prop.forAll(gen) { case (ys, a) =>
      val rows = ys.zipWithIndex.map { case (y, i) => ("g", i.toLong, y) }
      val got = AnalyticsQ.forecastIntervalCard(rows.toDF("g", "o", "y"),
          "g", "o", "y", alphaMilli = a, loPct = 25, hiPct = 75)
        .select(col("level"), col("lo_resid"), col("hi_resid"))
        .as[(Option[Long], Option[Long], Option[Long])].head()
      var lv = ys.head
      val rs = ys.drop(1).map { y =>
        val r = y - lv; lv += (a * r) / 1000L; r }
      val exp: (Option[Long], Option[Long], Option[Long]) =
        if (ys.size < 2) ((None, None, None))
        else {
          val srt = rs.sorted
          val m = srt.size
          def at(pct: Int) =
            srt(math.max(1L, (pct * m + 99L) / 100L).toInt - 1)
          ((Some(lv), Some(at(25)), Some(at(75))))
        }
      got == exp
    })
  }

  // ---- q333 EWMA chart ----------------------------------------------------

  test("ewmaChart equals the in-memory flooring fold at any alpha") {
    val gen = for {
      n <- Gen.chooseNum(1, 30)
      xs <- Gen.listOfN(n, Gen.chooseNum(0L, 1000L))
      a <- Gen.chooseNum(0L, 1000L)
    } yield (xs, a)
    check(Prop.forAll(gen) { case (xs, a) =>
      val rows = xs.zipWithIndex.map { case (x, i) => ("g", i.toLong, x) }
      val got = AnalyticsQ.ewmaChart(rows.toDF("g", "o", "x"), "g", "o",
          "x", alphaMilli = a, limitPpm = 300000L)
        .orderBy(col("o"))
        .select(col("pred_milli"), col("resid_milli"))
        .as[(Option[Long], Option[Long])].collect().toSeq
      var e = 1000L * xs.head
      val exp = xs.zipWithIndex.map { case (x, i) =>
        if (i == 0) (None, None)
        else {
          val pred = e
          val resid = 1000L * x - pred
          e = pred + (a * resid) / 1000L
          (Some(pred), Some(resid))
        }
      }
      got == exp
    })
  }
}
