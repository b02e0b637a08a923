package graft

import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop, Test => ScTest}

import graft.etl.IncrementalSemDedup
import graft.queries.{AnalyticsQ, BillingQ, EventQ, VectorQ}

/** Randomized equivalence for the round-12 operators: each distributed
  * construction pinned against an independent in-memory replay of its
  * contract on arbitrary inputs (the RoundEight..ElevenPropertySpec
  * convention).
  */
class Round12PropertySpec extends SparkSpec {

  import spark.implicits._

  private def check(p: Prop, n: Int = 20): Unit = {
    val res = ScTest.check(
      ScTest.Parameters.default.withMinSuccessfulTests(n), p)
    assert(res.passed, res.status.toString)
  }

  // ---- q288: versioned marginal rating vs an in-memory fold -----------

  test("marginalTieredChargesVersioned equals the per-account as-of fold " +
      "on random usage and timelines") {
    val END = 1000000L
    // a 2-window timeline with a possible GAP between them, random
    // contiguous plans per window
    val planGen = Gen.listOfN(2, Gen.chooseNum(1L, 9L)).flatMap { rates =>
      Gen.chooseNum(10L, 500L).map { b1 =>
        Seq((0L, b1, rates.head), (b1, Long.MaxValue, rates(1)))
      }
    }
    val tlGen = for {
      mid <- Gen.chooseNum(100L, 5000L)
      gap <- Gen.chooseNum(0L, 2000L)
      p1 <- planGen
      p2 <- planGen
    } yield (Seq((0L, mid, p1)), Seq((mid + gap, END, p2)))
    val usageGen = Gen.listOfN(30, for {
      acct <- Gen.chooseNum(1L, 4L)
      sec <- Gen.chooseNum(0L, 9000L)
      u <- Gen.chooseNum(-50L, 500L)
    } yield (acct, sec, u))

    def tTotal(u: Long, plan: Seq[(Long, Long, Long)]): Long =
      plan.map { case (f, t, r) =>
        val over = math.max(u - f, 0L)
        r * (if (t == Long.MaxValue) over else math.min(over, t - f))
      }.sum

    val prop = Prop.forAll(tlGen, usageGen) { case ((w1, w2), usage0) =>
      val usage = usage0.zipWithIndex.map { case ((a, s, u), i) =>
        (i.toLong, a, s, u)
      }
      val windows = w1 ++ w2
      val dim = windows.flatMap { case (vf, vt, plan) =>
        plan.map { case (f, t, r) => (vf, vt, f, t, r) }
      }.toDF("valid_from_sec", "valid_to_sec", "tier_from", "tier_to",
        "rate_centi")
      val got = EventQ.marginalTieredChargesVersioned(
        usage.toDF("event_id", "user_id", "ts", "u"), col("u"), dim)
        .select(col("event_id"), col("cum"), col("charge_centi"))
        .collect()
        .map(r => r.getLong(0) -> ((r.getLong(1),
          if (r.isNullAt(2)) None else Some(r.getLong(2))))).toMap
      // independent replay: per account in (sec, event_id) order
      val ref = usage.groupBy(_._2).flatMap { case (_, rows) =>
        var cum = 0L
        rows.sortBy(r => (r._3, r._1)).map { case (id, _, sec, u) =>
          val plan = windows.collectFirst {
            case (vf, vt, p) if sec >= vf && sec < vt => p
          }
          plan match {
            case None => id -> ((cum, None: Option[Long]))
            case Some(p) =>
              val ue = math.max(u, 0L)
              val next = cum + ue
              val charge = tTotal(next, p) - tTotal(cum, p)
              cum = next
              id -> ((cum, Some(charge)))
          }
        }
      }.toMap
      got == ref
    }
    check(prop)
  }

  // ---- q291: streak card vs brute force --------------------------------

  test("streakCard equals the brute-force run census on random day sets") {
    val gen = Gen.listOfN(60, for {
      u <- Gen.chooseNum(1L, 5L)
      d <- Gen.chooseNum(0, 25)
    } yield (u, d))
    val prop = Prop.forAll(gen) { rows0 =>
      val rows = rows0.distinct // listOfN(60, ...) is never empty
      val df = rows.zipWithIndex.map { case ((u, d), i) =>
          (i.toLong, u, java.sql.Timestamp.valueOf(
            java.time.LocalDate.of(2024, 1, 1).plusDays(d.toLong)
              .atStartOfDay()))
      }.toDF("event_id", "user_id", "ts")
      val got = AnalyticsQ.streakCard(df)
        .select(col("user_id"), col("n_active_days"), col("n_streaks"),
          col("longest_streak"), col("current_streak"))
        .as[(Long, Long, Long, Long, Long)].collect()
        .map(t => t._1 -> ((t._2, t._3, t._4, t._5))).toMap
      val gmax = rows.map(_._2).max
      val ref = rows.groupBy(_._1).map { case (u, rs) =>
        val days = rs.map(_._2).distinct.sorted
        // brute-force runs: split where the step is not +1
        val runs = days.foldLeft(List.empty[List[Int]]) {
          case (acc, d) => acc match {
            case (h @ (last :: _)) :: t if d == last + 1 =>
              (d :: h) :: t
            case _ => List(d) :: acc
          }
        }
        val cur = runs.find(_.contains(gmax)).map(_.size.toLong)
          .getOrElse(0L)
        u -> ((days.size.toLong, runs.size.toLong,
          runs.map(_.size).max.toLong, cur))
      }
      got == ref
    }
    check(prop)
  }

  // ---- q293: SLA interval union vs brute force --------------------------

  test("slaCredits downtime equals the brute-force union of seconds, " +
      "across a month boundary") {
    val M = 2592000L
    val gen = Gen.listOfN(12, for {
      acct <- Gen.chooseNum(1L, 3L)
      // starts straddle the first month boundary
      s <- Gen.chooseNum(M - 300L, M + 300L)
      len <- Gen.chooseNum(0L, 200L)
    } yield (acct, s, s + len))
    val tiers = Seq((0L, 0L), (50L, 100000L), (150L, 300000L))
    val prop = Prop.forAll(gen) { iv =>
      val df = iv.toDF("account_id", "s", "e")
      val got = BillingQ.slaCredits(df, tiers, monthlyFeeCenti = 1000L)
        .select(col("account_id"), col("month"), col("downtime_sec"),
          col("credit_centi"))
        .collect()
        .map(r => (r.getLong(0), r.getLong(1)) ->
          ((r.getLong(2), r.getLong(3)))).toMap
      // brute force: per (account, START-month), the union of covered
      // seconds of its intervals (start-month attribution)
      val ref = iv.filter { case (_, s, e) => e > s }
        .groupBy { case (a, s, _) => (a, s / M) }
        .map { case (k, rs) =>
          val secs = rs.flatMap { case (_, s, e) => s until e }.toSet
          val dt = secs.size.toLong
          val ppm = tiers.reverse.collectFirst {
            case (f, p) if dt >= f => p
          }.get
          k -> ((dt, 1000L * ppm / 1000000L))
        }
      got == ref
    }
    check(prop)
  }

  // ---- q289: incremental verdicts ≡ batch semDedup on random vectors ---

  test("IncrementalSemDedup verdicts equal batch semDedup on the union " +
      "for random embeddings and splits") {
    val gen = for {
      n <- Gen.chooseNum(6, 16)
      split <- Gen.chooseNum(3, n - 1) // history holds the seed ids
      vecs <- Gen.listOfN(n, Gen.listOfN(3,
        Gen.chooseNum(-10, 10).map(_.toFloat / 10f)))
    } yield (vecs.zipWithIndex.map { case (v, i) =>
      (i.toLong, v.toArray)
    }, split)
    val tau = 0.3
    val prop = Prop.forAll(gen) { case (vecs, split) =>
      // zero vectors make cosine NULL-ish (0/0); keep them out — the
      // operator contract is normalized embeddings
      val clean = vecs.map { case (id, v) =>
        if (v.forall(_ == 0f)) (id, v.updated(0, 1f)) else (id, v)
      }
      val all = clean.toDF("vec_id", "embedding")
      val hist = clean.filter(_._1 < split).toDF("vec_id", "embedding")
      val delta = clean.filter(_._1 >= split).toDF("vec_id", "embedding")
      val seeds = hist.orderBy(col("vec_id")).limit(2)
        .select(col("vec_id").as("cluster"),
          expr("transform(embedding, x -> CAST(x AS DOUBLE))")
            .as("centroid"))
      val mh = VectorQ.assignToCentroids(
        hist.withColumn("nrm",
          graft.functions.VectorFunctions.vec_norm2(col("embedding"))),
        seeds)
      val p1 = IncrementalSemDedup.deltaPairs(hist, seeds,
        mh.filter(lit(false)), tau)
      val p2 = IncrementalSemDedup.deltaPairs(delta, seeds, mh, tau)
      val md = VectorQ.assignToCentroids(
        delta.withColumn("nrm",
          graft.functions.VectorFunctions.vec_norm2(col("embedding"))),
        seeds)
      val derived = IncrementalSemDedup.verdicts(mh.union(md),
          p1.union(p2))
        .select(col("vec_id"), col("keep")).as[(Long, Boolean)]
        .collect().toMap
      val batch = VectorQ.semDedup(all, cells = 2, threshold = tau)
        .select(col("vec_id"), col("keep")).as[(Long, Boolean)]
        .collect().toMap
      derived == batch
    }
    check(prop, n = 15)
  }
}
