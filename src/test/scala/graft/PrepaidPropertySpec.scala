package graft

import org.scalacheck.{Gen, Prop, Test => ScTest}

import graft.queries.EventQ

/** Property test for the q219 packed-fold accumulator: the codegen'd
  * `zeros·10¹² + balance` fold must agree with a naive in-memory
  * clamped replay on arbitrary flow sequences, and a credit that would
  * push the balance past the packing bound must fail LOUDLY (the
  * raise_error convention) instead of silently corrupting the overdraw
  * count in the high digits.
  */
class PrepaidPropertySpec extends SparkSpec {

  import spark.implicits._

  /** Reference replay: clamp at zero, count overdraw attempts. */
  private def naive(deltas: Seq[Long]): (Long, Long) = {
    var bal = 0L; var od = 0L
    deltas.foreach { d =>
      if (bal + d < 0) { od += 1; bal = 0L } else bal += d
    }
    (bal, od)
  }

  // mix coarse and fine magnitudes so clamps and plain flows both occur
  private val deltaGen = Gen.oneOf(
    Gen.choose(-1000000L, 1000000L), Gen.choose(-500L, 500L))
  private val flowsGen =
    Gen.choose(1, 15).flatMap(n => Gen.listOfN(n, deltaGen))

  test("prepaidBalances == in-memory clamped fold on random flows") {
    val prop = Prop.forAll(Gen.listOfN(8, flowsGen)) { users =>
      val rows = users.zipWithIndex.flatMap { case (ds, u) =>
        ds.zipWithIndex.map { case (d, i) =>
          (u.toLong, (u * 1000 + i).toLong, 1700000000L + i,
            if (d >= 0) "signup" else "purchase", math.abs(d) / 100.0)
        }
      }
      val got = EventQ.prepaidBalances(
          rows.toDF("user_id", "event_id", "ts", "event_type", "value"))
        .as[(Long, Long, Long, Long)].collect()
        .map(r => r._1 -> ((r._3, r._4))).toMap
      users.indices.forall { u =>
        got.get(u.toLong).contains(naive(users(u)))
      }
    }
    val res = ScTest.check(
      ScTest.Parameters.default.withMinSuccessfulTests(25), prop)
    assert(res.passed, res.status.toString)
  }

  test("a top-up beyond the packing bound fails loudly, not silently") {
    // 2e10 currency units = 2e12 centi >= the 10^12 packing bound
    val df = Seq((1L, 1L, 1700000000L, "signup", 2.0e10))
      .toDF("user_id", "event_id", "ts", "event_type", "value")
    val e = intercept[Throwable] { EventQ.prepaidBalances(df).collect() }
    def chain(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x =>
        Option(x.getMessage).toSeq ++ Option(x.getCause).toSeq.flatMap(chain))
    assert(chain(e).exists(_.contains("packing bound")),
      s"expected the packing-bound raise_error, got: ${chain(e)}")
  }
}
