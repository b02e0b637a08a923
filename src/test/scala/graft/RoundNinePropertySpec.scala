package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalacheck.{Gen, Prop, Test => ScTest}

import graft.queries.{AnalyticsQ, EventQ}

/** Randomized equivalence for the round-9 operators: each distributed
  * implementation is pinned against an independent in-memory replay of
  * its contract on arbitrary inputs (the RoundEightPropertySpec
  * convention) — the oracle proves engine parity on one corpus shape,
  * these prove the distributed machinery (PrefixSum routing, RANGE
  * frames, double as-ofs) equals the plain loop everywhere.
  */
class RoundNinePropertySpec extends SparkSpec {

  import spark.implicits._

  // --- velocityFlags vs brute-force window count ------------------------

  test("velocityFlags == brute-force trailing-window count") {
    val evGen = Gen.zip(Gen.choose(1L, 4L), Gen.choose(0L, 500L))
    val feedGen = Gen.choose(1, 40).flatMap(n => Gen.listOfN(n, evGen))
    val prop = Prop.forAll(feedGen, Gen.choose(1L, 120L),
        Gen.choose(1L, 4L)) { (evs, w, k) =>
      val rows = evs.zipWithIndex.map { case ((u, sec), i) =>
        (i.toLong, u, sec)
      }
      val got = AnalyticsQ.velocityFlags(
          rows.toDF("event_id", "user_id", "sec")
            .withColumn("ts", col("sec").cast(TimestampType)),
          windowSec = w, threshold = k)
        .select("event_id", "n_window")
        .as[(Long, Long)].collect().toMap
      val want = rows.flatMap { case (id, u, sec) =>
        val n = rows.count { case (_, u2, s2) =>
          u2 == u && s2 >= sec - w + 1 && s2 <= sec
        }.toLong
        if (n >= k) Some(id -> n) else None
      }.toMap
      got == want
    }
    val res = ScTest.check(
      ScTest.Parameters.default.withMinSuccessfulTests(25), prop)
    assert(res.passed, res.status.toString)
  }

  // --- kruskalWallisCard vs in-memory staircase replay ------------------

  private def naiveKw(rows: Seq[(String, Long)])
      : (Long, Long, Long, Long, Option[Long]) = {
    val n = BigInt(rows.size)
    val tot = rows.groupBy(_._2).view.mapValues(r => BigInt(r.size)).toMap
    val vals = tot.keys.toSeq.sorted
    val k0 = vals.zip(vals.scanLeft(BigInt(0))((a, v) => a + tot(v)).init).toMap
    val perG = rows.groupBy(_._1).map { case (_, rs) =>
      val r2 = rs.map { case (_, cv) => 2 * k0(cv) + tot(cv) + 1 }.sum
      val d = 4 * BigInt(rs.size)
      (r2 / d) * r2 + ((r2 % d) * r2) / d
    }.toSeq
    val s = perG.sum
    val h = (12000 * s) / (n * (n + 1)) - 3000 * (n + 1)
    val t3 = tot.values.map(c => c * c * c - c).sum
    val cppm = BigInt(1000000) - (BigInt(1000000) * t3) / (n * n * n - n)
    val hadj =
      if (cppm > 0) Some(((h.max(BigInt(0))) * 1000000 / cppm).toLong)
      else None
    (perG.size.toLong, n.toLong, h.toLong, cppm.toLong, hadj)
  }

  test("kruskalWallisCard == in-memory staircase on random groupings") {
    val rowGen = Gen.zip(Gen.oneOf("a", "b", "c"), Gen.choose(-30L, 30L))
    val feedGen = Gen.choose(2, 50).flatMap(n => Gen.listOfN(n, rowGen))
    val prop = Prop.forAll(feedGen) { rows =>
      val ev = rows.toDF("event_type", "cv")
        .select(col("event_type"), (col("cv").cast(DoubleType) / 100.0).as("value"))
      val r = AnalyticsQ.kruskalWallisCard(ev).head()
      val got = (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        if (r.isNullAt(4)) None else Some(r.getLong(4)))
      got == naiveKw(rows)
    }
    val res = ScTest.check(
      ScTest.Parameters.default.withMinSuccessfulTests(25), prop)
    assert(res.passed, res.status.toString)
  }

  // --- signedRankCard vs in-memory staircase ----------------------------

  private def naiveSr(diffs: Seq[Long]): (Long, Long, Long, Long) = {
    val nz = diffs.count(_ == 0L).toLong
    val d = diffs.filter(_ != 0L)
    val tot = d.groupBy(a => math.abs(a)).view
      .mapValues(r => BigInt(r.size)).toMap
    val vals = tot.keys.toSeq.sorted
    val k0 = vals.zip(vals.scanLeft(BigInt(0))((a, v) => a + tot(v)).init).toMap
    def w2(sign: Long => Boolean) = d.filter(sign)
      .map(x => 2 * k0(math.abs(x)) + tot(math.abs(x)) + 1).sum
    (d.size.toLong, nz, w2(_ > 0).toLong, w2(_ < 0).toLong)
  }

  test("signedRankCard == in-memory staircase; W2+ + W2- == n(n+1)") {
    // one pair per user: a purchase with value d (can be negative) and a
    // view with value 0 makes the user's diff exactly round(d*100)
    val feedGen = Gen.choose(1, 40).flatMap(n =>
      Gen.listOfN(n, Gen.choose(-25L, 25L)))
    val prop = Prop.forAll(feedGen) { ds =>
      val ev = ds.zipWithIndex.flatMap { case (cd, u) =>
        Seq((u.toLong, "purchase", cd.toDouble / 100.0),
          (u.toLong, "view", 0.0))
      }.toDF("user_id", "event_type", "value")
      val r = AnalyticsQ.signedRankCard(ev, "purchase", "view").head()
      val gotN = if (r.isNullAt(0)) 0L else r.getLong(0)
      val got = (gotN, r.getLong(1),
        if (r.isNullAt(2)) 0L else r.getLong(2),
        if (r.isNullAt(3)) 0L else r.getLong(3))
      val want = naiveSr(ds)
      got == want && got._3 + got._4 == gotN * (gotN + 1)
    }
    val res = ScTest.check(
      ScTest.Parameters.default.withMinSuccessfulTests(25), prop)
    assert(res.passed, res.status.toString)
  }

  // --- rerateDiff vs per-minute loop over both tariff tables ------------

  private def naiveCharge(base: Option[Long], dur: Long, start: Long): Long =
    base match {
      case Some(b) if dur >= 1 =>
        var acc = BigInt(0)
        (0L until dur).foreach { m =>
          val hod = Math.floorMod(start + 60 * m, 86400L) / 3600
          val band = if (hod >= 8 && hod < 20) 1500000L else 1000000L
          val tier = if (m < 3) 1000000L else if (m < 6) 800000L else 600000L
          acc += BigInt(b) * band * tier
        }
        (acc / BigInt("1000000000000")).toLong
      case _ => 0L
    }

  test("rerateDiff == per-minute loop under both tariff tables") {
    val callGen = Gen.zip(Gen.oneOf("x", "y"), Gen.choose(-90000L, 90000L),
      Gen.choose(0L, 9L))
    val tariffGen = Gen.choose(1, 3).flatMap(n =>
      Gen.listOfN(n, Gen.zip(Gen.choose(-1L, 8L), Gen.choose(1L, 30L))))
    val prop = Prop.forAll(Gen.choose(1, 20).flatMap(Gen.listOfN(_, callGen)),
        tariffGen, tariffGen) { (calls, vo, vn) =>
      // distinct valid_from per type (as-of tie-break is out of contract)
      def tariffs(v: Seq[(Long, Long)]) = Seq("x", "y").flatMap(t =>
        v.map(_._1).distinct.zip(v.map(_._2))
          .map { case (f, b) => (t, f * 20000L, b) })
      val to = tariffs(vo); val tn = tariffs(vn)
      val cdrs = calls.zipWithIndex.map { case ((ct, st, dur), i) =>
        (s"c$i", ct, st, dur)
      }
      val got = EventQ.rerateDiff(
          cdrs.toDF("call_id", "call_type", "start_sec", "dur_min"),
          to.toDF("call_type", "valid_from", "base_centi"),
          tn.toDF("call_type", "valid_from", "base_centi"))
        .select("call_id", "charge_old_centi", "charge_new_centi")
        .as[(String, Long, Long)].collect()
        .map(r => r._1 -> ((r._2, r._3))).toMap
      def asof(ts: Seq[(String, Long, Long)], ct: String, st: Long) =
        ts.filter(t => t._1 == ct && t._2 <= st)
          .sortBy(-_._2).headOption.map(_._3)
      val want = cdrs.flatMap { case (id, ct, st, dur) =>
        val co = naiveCharge(asof(to, ct, st), dur, st)
        val cn = naiveCharge(asof(tn, ct, st), dur, st)
        if (co != cn) Some(id -> ((co, cn))) else None
      }.toMap
      got == want
    }
    val res = ScTest.check(
      ScTest.Parameters.default.withMinSuccessfulTests(20), prop)
    assert(res.passed, res.status.toString)
  }

  // --- crossCorrLags vs in-memory identical-order double math -----------

  test("crossCorrLags == in-memory sufficient-stats replay") {
    val dayGen = Gen.zip(Gen.choose(0L, 14L), Gen.choose(1, 5), Gen.choose(0, 5))
    val prop = Prop.forAll(Gen.choose(3, 15).flatMap(Gen.listOfN(_, dayGen))) { days =>
      val byDay = days.groupBy(_._1).view
        .mapValues(r => (r.map(_._2).sum, r.map(_._3).sum)).toMap
      // synthesize events: per day, nA views and nB purchases at that
      // day's first second
      val ev = byDay.toSeq.flatMap { case (d, (na, nb)) =>
        Seq.fill(na)(("view", d * 86400L)) ++
          Seq.fill(nb)(("purchase", d * 86400L))
      }
      ev.isEmpty || !ev.exists(_._1 == "view") ||
        !ev.exists(_._1 == "purchase") || {
        val df = ev.toDF("event_type", "sec")
          .withColumn("ts", col("sec").cast(TimestampType))
        val got = AnalyticsQ.crossCorrLags(df, "view", "purchase", maxLagDays = 3)
          .select("lag", "n_days", "corr")
          .collect().map(r => r.getLong(0) ->
            ((r.getLong(1), if (r.isNullAt(2)) None else Some(r.getDouble(2)))))
          .toMap
        val a = byDay.collect { case (d, (na, _)) if na > 0 => d -> na.toLong }
        val b = byDay.collect { case (d, (_, nb)) if nb > 0 => d -> nb.toLong }
        val want = (-3L to 3L).map { lag =>
          val pairs = a.toSeq.flatMap { case (d, x) =>
            b.get(d + lag).map(y => (x, y)) }
          val n = pairs.size.toLong
          val sx = pairs.map(p => BigInt(p._1)).sum
          val sy = pairs.map(p => BigInt(p._2)).sum
          val sxy = pairs.map(p => BigInt(p._1) * p._2).sum
          val sxx = pairs.map(p => BigInt(p._1) * p._1).sum
          val syy = pairs.map(p => BigInt(p._2) * p._2).sum
          val corr =
            if (n * sxx - sx * sx > 0 && n * syy - sy * sy > 0) {
              val v = (n.toDouble * sxy.toDouble - sx.toDouble * sy.toDouble) /
                (math.sqrt(n.toDouble * sxx.toDouble - sx.toDouble * sx.toDouble) *
                  math.sqrt(n.toDouble * syy.toDouble - sy.toDouble * sy.toDouble))
              Some(BigDecimal(v).setScale(6, BigDecimal.RoundingMode.HALF_UP)
                .toDouble)
            } else None
          lag -> ((n, corr))
        }.toMap
        // only lags with at least one overlapping day appear in the result
        got == want.filter(_._2._1 > 0)
      }
    }
    val res = ScTest.check(
      ScTest.Parameters.default.withMinSuccessfulTests(20), prop)
    assert(res.passed, res.status.toString)
  }
}
