package graft

import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop, Test => ScTest}

import graft.queries.{AnalyticsQ, CurationQ, RoutingQ}

/** Randomized equivalence for the round-13 kernels: each distributed
  * construction pinned against an independent in-memory replay of its
  * contract on arbitrary inputs (the RoundEight..Twelve PropertySpec
  * convention). JVM `Long` division truncates toward zero exactly like
  * Spark's `DIV` and DuckDB's `//`, so the replays fold with plain `/`. */
class Round13PropertySpec extends SparkSpec {

  import spark.implicits._

  private def check(p: Prop, n: Int = 15): Unit = {
    val res = ScTest.check(
      ScTest.Parameters.default.withMinSuccessfulTests(n), p)
    assert(res.passed, res.status.toString)
  }

  // ---- q147/q311 Cohen + q314 McNemar ------------------------------------

  private val pairGen = for {
    n <- Gen.chooseNum(1, 60)
    rows <- Gen.listOfN(n, Gen.zip(Gen.oneOf(true, false),
      Gen.oneOf(true, false)))
  } yield rows

  test("signalKappa equals the in-memory contingency fold at every sign") {
    check(Prop.forAll(pairGen) { rows =>
      val df = rows.toDF("a", "b")
      val got = AnalyticsQ.signalKappa(df, col("a"), col("b"))
        .select(col("po_ppm"), col("pe_ppm"), col("kappa_ppm"))
        .as[(Long, Long, Long)].head()
      val n11 = rows.count(r => r._1 && r._2).toLong
      val n10 = rows.count(r => r._1 && !r._2).toLong
      val n01 = rows.count(r => !r._1 && r._2).toLong
      val n00 = rows.count(r => !r._1 && !r._2).toLong
      val n = n11 + n10 + n01 + n00
      val po = (1000000L * (n11 + n00)) / n
      val pe = ((1000000L * (n11 + n10) / n) * (n11 + n01) / n) +
        ((1000000L * (n01 + n00) / n) * (n10 + n00) / n)
      val k = if (pe >= 1000000L) 1000000L
        else ((po - pe) * 1000000L) / (1000000L - pe)
      got == ((po, pe, k))
    })
  }

  test("mcnemar equals the in-memory fold, and swapping the raters " +
      "mirrors the discordant cells with the same statistic") {
    check(Prop.forAll(pairGen) { rows =>
      val df = rows.toDF("a", "b")
      def run(x: String, y: String) =
        AnalyticsQ.mcnemarCard(df, col(x), col(y))
          .select(col("n10"), col("n01"), col("chi2_milli"),
            col("chi2c_milli"))
          .as[(Long, Long, Option[Long], Option[Long])].head()
      val got = run("a", "b")
      val swapped = run("b", "a")
      val n10 = rows.count(r => r._1 && !r._2).toLong
      val n01 = rows.count(r => !r._1 && r._2).toLong
      val nd = n10 + n01
      val chi2 = if (nd == 0) None
        else Some(((n10 - n01) * (n10 - n01) * 1000L) / nd)
      val d1 = math.max(math.abs(n10 - n01) - 1L, 0L)
      val chi2c = if (nd == 0) None else Some((d1 * d1 * 1000L) / nd)
      got == ((n10, n01, chi2, chi2c)) &&
        swapped == ((n01, n10, chi2, chi2c))
    })
  }

  // ---- q318 Fleiss -------------------------------------------------------

  private val panelGen = for {
    n <- Gen.chooseNum(1, 40)
    rows <- Gen.listOfN(n, Gen.listOfN(3, Gen.oneOf(true, false)))
  } yield rows

  test("fleissKappa equals the in-memory panel fold and never exceeds 1e6") {
    check(Prop.forAll(panelGen) { rows =>
      val df = rows.map(r => (r(0), r(1), r(2))).toDF("a", "b", "c")
      val got = AnalyticsQ.fleissKappa(df,
        Seq(col("a"), col("b"), col("c")))
        .select(col("pbar_ppm"), col("p1_ppm"), col("pe_ppm"),
          col("kappa_ppm"))
        .as[(Long, Long, Long, Long)].head()
      val n = rows.length.toLong
      val s1 = rows.map(_.count(identity).toLong).sum
      val sp = rows.map { r =>
        val n1 = r.count(identity).toLong; n1 * n1 + (3 - n1) * (3 - n1)
      }.sum
      val pbar = (1000000L * (sp - n * 3)) / (n * 6)
      val p1 = (1000000L * s1) / (n * 3)
      val pe = (p1 * p1 + (1000000L - p1) * (1000000L - p1)) / 1000000L
      val k = if (pe >= 1000000L) 1000000L
        else ((pbar - pe) * 1000000L) / (1000000L - pe)
      got == ((pbar, p1, pe, k)) && got._4 <= 1000000L
    })
  }

  // ---- q315 TV drift -----------------------------------------------------

  private val tvGen = for {
    nDays <- Gen.chooseNum(1, 8)
    nTypes <- Gen.chooseNum(1, 4)
    cells <- Gen.listOfN(nDays * nTypes, Gen.chooseNum(0L, 12L))
  } yield (nDays, nTypes, cells)

  test("tvDriftCard equals the in-memory grid replay; drift is bounded " +
      "by 1e6 and the first observed day is NULL") {
    check(Prop.forAll(tvGen) { case (nDays, nTypes, cells) =>
      val counts = (for {
        d <- 0 until nDays; t <- 0 until nTypes
        c = cells(d * nTypes + t)
      } yield (d, s"T$t", c)).filter(_._3 > 0L)
      // at least one row per generated corpus (else no days at all)
      val rows0 = if (counts.nonEmpty) counts else Seq((0, "T0", 1L))
      val ev = rows0.flatMap { case (d, t, c) =>
        Seq.fill(c.toInt)((f"2024-01-${d + 1}%02d 12:00:00", t))
      }.toDF("ts0", "event_type")
        .select(col("ts0").cast("timestamp").as("ts"), col("event_type"))
      val got = AnalyticsQ.tvDriftCard(ev)
        .select(col("day"), col("n_events"), col("tv_ppm"))
        .as[(Long, Long, Option[Long])].collect().toSeq.sortBy(_._1)
      // replay: grid over observed days × observed types
      val byDT = rows0.groupBy(r => (r._1.toLong, r._2))
        .view.mapValues(_.map(_._3).sum).toMap
      val days = rows0.map(_._1.toLong).distinct.sorted
      val types = rows0.map(_._2).distinct
      val nD = days.map(d => d -> types.map(t =>
        byDT.getOrElse((d, t), 0L)).sum).toMap
      def p(d: Long, t: String) =
        (1000000L * byDT.getOrElse((d, t), 0L)) / nD(d)
      val want = days.zipWithIndex.map { case (d, i) =>
        val tv = if (i == 0) None
          else Some(types.map(t =>
            math.abs(p(d, t) - p(days(i - 1), t))).sum / 2)
        (d, nD(d), tv)
      }
      got == want && got.forall(_._3.forall(v => v >= 0L && v <= 1000000L))
    })
  }

  // ---- q316 t-closeness --------------------------------------------------

  private val tcGen = for {
    nG <- Gen.chooseNum(1, 5)
    nS <- Gen.chooseNum(1, 4)
    rows <- Gen.listOfN(30, Gen.zip(Gen.chooseNum(0, nG - 1),
      Gen.chooseNum(0L, nS - 1L)))
  } yield rows

  test("tClosenessCard equals the in-memory grid replay; a group that " +
      "IS the whole corpus reads zero distance") {
    check(Prop.forAll(tcGen) { rows =>
      val df = rows.map { case (g, sv) => (s"g$g", sv) }.toDF("qi", "s")
      val t = 300000L
      val got = CurationQ.tClosenessCard(df, Seq("qi"), "s", t)
        .select(col("qi"), col("n"), col("tv_ppm"), col("meets_t"),
          col("exposed_ppm"))
        .as[(String, Long, Long, Boolean, Long)].collect().toSeq.sortBy(_._1)
      val g = rows.groupBy(r => (s"g${r._1}", r._2))
        .view.mapValues(_.size.toLong).toMap
      val qis = rows.map(r => s"g${r._1}").distinct.sorted
      val svs = rows.map(_._2).distinct
      val nQi = qis.map(q => q -> svs.map(s => g.getOrElse((q, s), 0L)).sum)
        .toMap
      val big = rows.size.toLong
      def qp(s: Long) = (1000000L * rows.count(_._2 == s)) / big
      val tvs = qis.map { q =>
        q -> svs.map { s =>
          math.abs((1000000L * g.getOrElse((q, s), 0L)) / nQi(q) - qp(s))
        }.sum / 2
      }.toMap
      val failN = qis.filter(q => tvs(q) > t).map(nQi).sum
      val exposed = (1000000L * failN) / big
      val want = qis.map(q => (q, nQi(q), tvs(q), tvs(q) <= t, exposed))
      (got == want) && {
        // single-group corpus IS the global distribution: tv = 0
        qis.size != 1 || tvs(qis.head) == 0L
      }
    })
  }

  // ---- q320 bundle rating --------------------------------------------------

  private val usageGen = for {
    n <- Gen.chooseNum(1, 30)
    allow <- Gen.chooseNum(0L, 300L)
    rows <- Gen.listOfN(n, Gen.chooseNum(-20L, 120L))
  } yield (allow, rows)

  test("bundleTieredCharges equals the in-memory shifted fold; charges " +
      "telescope to B(total) and free units sum to min(total, allowance)") {
    import java.sql.Timestamp
    val tiers = Seq((0L, 50L, 5L), (50L, 200L, 3L), (200L, Long.MaxValue, 1L))
    def t(u: Long): Long = tiers.map { case (f, to, r) =>
      val over = math.max(u - f, 0L)
      r * (if (to == Long.MaxValue) over else math.min(over, to - f))
    }.sum
    check(Prop.forAll(usageGen) { case (allow, us) =>
      def b(u: Long) = t(math.max(u - allow, 0L))
      val df = us.zipWithIndex.map { case (u, i) =>
        (i.toLong, 7L, new Timestamp(i * 1000L), u)
      }.toDF("event_id", "user_id", "ts", "units")
      val got = queries.EventQ.bundleTieredCharges(df, col("units"),
          allow, tiers)
        .orderBy(col("event_id"))
        .select(col("cum"), col("free_units"), col("charge_centi"))
        .as[(Long, Long, Long)].collect().toSeq
      var c = 0L
      val want = us.map { u =>
        val ue = math.max(u, 0L)
        val free = math.min(ue, math.max(allow - c, 0L))
        val next = c + ue
        val row = (next, free, b(next) - b(c))
        c = next
        row
      }
      got == want &&
        got.map(_._3).sum == b(c) &&
        got.map(_._2).sum == math.min(c, allow)
    })
  }

  // ---- q317 SIM-box ------------------------------------------------------

  private val cdrGen = for {
    n <- Gen.chooseNum(1, 60)
    rows <- Gen.listOfN(n, for {
      a <- Gen.chooseNum(0L, 7L); b <- Gen.chooseNum(0L, 7L)
      d <- Gen.oneOf(0L, 0L, 60L, 120L)
    } yield (a, b, d))
  } yield rows

  test("simboxCard equals the in-memory replay on random call graphs") {
    check(Prop.forAll(cdrGen) { rows =>
      val df = rows.toDF("caller", "callee", "dur_centi")
      val got = RoutingQ.simboxCard(df, minOut = 3L,
        maxInSharePpm = 100000L, minFanoutPpm = 500000L,
        minAnsweredPpm = 400000L)
        .select(col("subscriber"), col("out_calls"), col("in_calls"),
          col("n_destinations"), col("fanout_ppm"), col("answered_ppm"),
          col("in_share_ppm"), col("simbox_flag"))
        .as[(Long, Long, Long, Long, Option[Long], Option[Long], Long,
          Boolean)]
        .collect().toSeq.sortBy(_._1)
      val subs = (rows.map(_._1) ++ rows.map(_._2)).distinct.sorted
      val want = subs.map { s =>
        val out = rows.filter(_._1 == s)
        val oc = out.size.toLong
        val nd = out.map(_._2).distinct.size.toLong
        val an = out.count(_._3 > 0L).toLong
        val ic = rows.count(_._2 == s).toLong
        val f = if (oc > 0) Some((1000000L * nd) / oc) else None
        val ap = if (oc > 0) Some((1000000L * an) / oc) else None
        val is = (1000000L * ic) / (ic + oc)
        val flag = oc >= 3L && is <= 100000L &&
          f.exists(_ >= 500000L) && ap.exists(_ >= 400000L)
        (s, oc, ic, nd, f, ap, is, flag)
      }
      got == want
    })
  }
}
