package graft

import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop, Test => ScTest}

import graft.queries.{AnalyticsQ, PreratingQ}

/** Randomized equivalence for the round-11 operators: each distributed
  * construction pinned against an independent in-memory replay of its
  * contract on arbitrary inputs (the RoundEight/Nine/TenPropertySpec
  * convention).
  */
class Round11PropertySpec extends SparkSpec {

  import spark.implicits._

  /** In-memory replay of the pseudonymization kernel (the spec of
    * pseudonymizeMsisdn, independently coded). */
  private def pseudoRef(n: String, keep: Int, key: Long): String =
    n.zipWithIndex.map { case (ch, i0) =>
      val i = i0 + 1
      if (i <= keep) ch
      else {
        val prefix = n.substring(0, i - 1).toLong
        val shift = ((prefix * key + i) % 10).toInt
        (((ch - '0') + shift) % 10 + '0').toChar
      }
    }.mkString

  test("pseudonymizeMsisdn equals the positional replay on random numbers") {
    val numGen = Gen.chooseNum(10000000L, 999999999999999L).map(_.toString)
    val prop = Prop.forAll(Gen.listOfN(8, numGen)) { nums0 =>
      val nums = nums0.distinct
      val out = PreratingQ.pseudonymizeMsisdn(nums.toDF("canonical"))
        .select(col("canonical"), col("pseudonym"))
        .as[(String, String)].collect().toMap
      nums.forall(n => out(n) == pseudoRef(n, 4, 7919L))
    }
    val res = ScTest.check(
      ScTest.Parameters.default.withMinSuccessfulTests(30), prop)
    assert(res.passed, res.status.toString)
  }

  test("pseudonymizeMsisdn preserves the longest-common-prefix length") {
    // numbers sharing m >= keep leading digits share EXACTLY m pseudonym
    // digits (prefix-preserving AND first-divergence-separating)
    val g = for {
      base <- Gen.chooseNum(100000000L, 999999999L).map(_.toString)
      m <- Gen.chooseNum(4, base.length - 1)
      d <- Gen.chooseNum(1, 9)
    } yield {
      val other = base.updated(m,
        (((base(m) - '0') + d) % 10 + '0').toChar)
      (base, other, m)
    }
    val prop = Prop.forAll(g) { case (a, b, m) =>
      val out = PreratingQ.pseudonymizeMsisdn(Seq(a, b).toDF("canonical"))
        .select(col("canonical"), col("pseudonym"))
        .as[(String, String)].collect().toMap
      val (pa, pb) = (out(a), out(b))
      pa.take(m) == pb.take(m) && pa(m) != pb(m)
    }
    val res = ScTest.check(
      ScTest.Parameters.default.withMinSuccessfulTests(40), prop)
    assert(res.passed, res.status.toString)
  }

  test("theilSenSlope equals the in-memory median of pairwise slopes") {
    val seriesGen = Gen.listOfN(12,
      Gen.zip(Gen.chooseNum(0L, 40L), Gen.chooseNum(-5000L, 5000L)))
      .map(_.toMap.toSeq) // distinct x
      .suchThat(_.size >= 2)
    val prop = Prop.forAll(seriesGen) { pts =>
      val slopes = (for {
        (x1, y1) <- pts; (x2, y2) <- pts if x1 < x2
      } yield {
        val num = 1000L * (y2 - y1); val den = x2 - x1
        num / den // JVM division truncates toward zero = Spark DIV
      }).sorted
      val want = slopes((slopes.size + 1) / 2 - 1)
      val got = AnalyticsQ.theilSenSlope(
        pts.toDF("x", "y").withColumn("g", lit("s")), "g", "x", "y")
        .select(col("ts_slope_milli")).as[Long].head()
      got == want
    }
    val res = ScTest.check(
      ScTest.Parameters.default.withMinSuccessfulTests(30), prop)
    assert(res.passed, res.status.toString)
  }

  test("sesForecast equals the in-memory fold for any alpha") {
    val g = for {
      alpha <- Gen.chooseNum(0L, 1000L)
      ys <- Gen.nonEmptyListOf(Gen.chooseNum(-100000L, 100000L))
        .map(_.take(20))
    } yield (alpha, ys)
    val prop = Prop.forAll(g) { case (alpha, ys) =>
      val want = ys.tail.foldLeft(ys.head) { (acc, y) =>
        acc + (alpha * (y - acc)) / 1000L
      }
      val df = ys.zipWithIndex.map { case (y, i) => (i.toLong, y) }
        .toDF("x", "y").withColumn("g", lit("s"))
      val got = AnalyticsQ.sesForecast(df, "g", "x", "y", alpha)
        .select(col("ses_level")).as[Long].head()
      got == want
    }
    val res = ScTest.check(
      ScTest.Parameters.default.withMinSuccessfulTests(30), prop)
    assert(res.passed, res.status.toString)
  }
}
