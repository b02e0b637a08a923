package graft

import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop, Test => ScTest}

import graft.queries.{AnalyticsQ, GraphQ}

/** Randomized equivalence for the round-12 third-wave kernels: each
  * distributed construction pinned against an independent in-memory
  * replay of its contract on arbitrary inputs (the RoundEight..Twelve
  * PropertySpec convention). JVM `Long` division truncates toward zero
  * exactly like Spark's `DIV`, so the replays fold with plain `/`. */
class ThirdWavePropertySpec extends SparkSpec {

  import spark.implicits._

  private def check(p: Prop, n: Int = 15): Unit = {
    val res = ScTest.check(
      ScTest.Parameters.default.withMinSuccessfulTests(n), p)
    assert(res.passed, res.status.toString)
  }

  private val seriesGen = for {
    n <- Gen.chooseNum(1, 24)
    ys <- Gen.listOfN(n, Gen.chooseNum(-1000L, 1000L))
  } yield ys

  // ---- q299 Holt -------------------------------------------------------

  test("holtForecast equals the in-memory integer fold on random series") {
    check(Prop.forAll(seriesGen) { ys =>
      val df = ys.zipWithIndex.map { case (y, i) => ("g", i.toLong, y) }
        .toDF("g", "x", "y")
      val got = AnalyticsQ.holtForecast(df, "g", "x", "y")
        .select(col("holt_level"), col("holt_trend"), col("forecast_7"))
        .as[(Long, Long, Long)].head()
      var (l, b) =
        if (ys.length >= 2) (ys.head, ys(1) - ys.head) else (ys.head, 0L)
      if (ys.length >= 2) ys.drop(1).foreach { y =>
        val ln = (300L * y + 700L * (l + b)) / 1000L
        b = (200L * (ln - l) + 800L * b) / 1000L
        l = ln
      }
      got == ((l, b, l + 7L * b))
    })
  }

  // ---- q310 Holt–Winters -------------------------------------------------

  test("holtWinters equals the in-memory seasonal fold; short series " +
      "read NULL") {
    val gen = for {
      n <- Gen.chooseNum(1, 30)
      ys <- Gen.listOfN(n, Gen.chooseNum(-1000L, 1000L))
    } yield ys
    check(Prop.forAll(gen) { ys =>
      val df = ys.zipWithIndex.map { case (y, i) => ("g", i.toLong, y) }
        .toDF("g", "x", "y")
      val got = AnalyticsQ.holtWinters(df, "g", "x", "y")
        .select(col("hw_level"), col("hw_trend"), col("hw_seasonal_next"),
          col("forecast_1"))
        .as[(Option[Long], Option[Long], Option[Long], Option[Long])]
        .head()
      if (ys.length < 14) got == ((None, None, None, None))
      else {
        var l = ys.take(7).sum / 7L
        var b = (0 until 7).map(i => ys(i + 7) - ys(i)).sum / 49L
        val s = Array.tabulate(7)(i => ys(i) - l)
        (7 until ys.length).foreach { t =>
          val y = ys(t); val si = t % 7
          val ln = (300L * (y - s(si)) + 700L * (l + b)) / 1000L
          b = (100L * (ln - l) + 900L * b) / 1000L
          s(si) = (300L * (y - ln) + 700L * s(si)) / 1000L
          l = ln
        }
        val sn = s(ys.length % 7)
        got == ((Some(l), Some(b), Some(sn), Some(l + b + sn)))
      }
    }, n = 12)
  }

  // ---- q300 CUSUM --------------------------------------------------------

  test("cusumShift equals the max(0, C+d) recurrence on random series") {
    check(Prop.forAll(seriesGen, Gen.chooseNum(1L, 3000L)) { (ys, h) =>
      val df = ys.zipWithIndex.map { case (y, i) => ("g", i.toLong, y) }
        .toDF("g", "x", "y")
      val rows = AnalyticsQ.cusumShift(df, "g", "x", "y", refDays = 5,
          kMilli = 100L, hMilli = h)
        .select(col("n_monitored"), col("peak_hi"), col("peak_lo"),
          col("alarm_x"), col("shifted"))
        .as[(Long, Long, Long, Option[Long], Boolean)].collect().toSeq
      if (ys.length <= 5) rows.isEmpty
      else {
        val mu = (1000L * ys.take(5).sum) / 5L
        var (hi, lo) = (0L, 0L)
        var (pH, pL) = (0L, 0L)
        var alarm: Option[Long] = None
        ys.zipWithIndex.drop(5).foreach { case (y, i) =>
          hi = math.max(0L, hi + 1000L * y - mu - 100L)
          lo = math.max(0L, lo + mu - 1000L * y - 100L)
          pH = math.max(pH, hi); pL = math.max(pL, lo)
          if (alarm.isEmpty && (hi > h || lo > h)) alarm = Some(i.toLong)
        }
        rows == Seq(((ys.length - 5).toLong, pH, pL, alarm,
          pH > h || pL > h))
      }
    })
  }

  // ---- shared lower median -----------------------------------------------

  test("lowerMedianPerKey equals sorted(v)((n+1) DIV 2 - 1) per key") {
    val gen = Gen.listOf(for {
      k <- Gen.chooseNum(1L, 4L)
      v <- Gen.chooseNum(-100L, 100L)
    } yield (k, v)).suchThat(_.nonEmpty)
    check(Prop.forAll(gen) { rows =>
      val got = AnalyticsQ.lowerMedianPerKey(
        rows.toDF("k", "v"), "k", "v", "med")
        .as[(Long, Long)].collect().toMap
      val want = rows.groupBy(_._1).map { case (k, vs) =>
        val sorted = vs.map(_._2).sorted
        k -> sorted((sorted.length + 1) / 2 - 1)
      }
      got == want
    })
  }

  // ---- q303 HITS ----------------------------------------------------------

  test("hitsPpm equals the in-memory max-normalized iteration on " +
      "random bipartite graphs") {
    val edgeGen = Gen.listOfN(18, for {
      s <- Gen.chooseNum(0, 5)
      d <- Gen.chooseNum(10, 16)
    } yield (s"s$s", s"d$d")).map(_.distinct).suchThat(_.nonEmpty)
    check(Prop.forAll(edgeGen) { edges =>
      val got = GraphQ.hitsPpm(edges.toDF("src", "dst"), iterations = 2)
        .as[(String, String, Long)].collect()
        .map(r => (r._1, r._2) -> r._3).toMap
      var h = edges.map(_._1).distinct.map(_ -> 1000000L).toMap
      var a = Map.empty[String, Long]
      def norm(m: Map[String, Long]): Map[String, Long] = {
        val mx = m.values.max
        val s = if (mx > 9000000000000L) mx / 1000000L else 1L
        m.map { case (k, v) => k -> ((v / s) * 1000000L) / (mx / s) }
      }
      (1 to 2).foreach { _ =>
        a = norm(edges.groupBy(_._2).map { case (d, es) =>
          d -> es.map(e => h(e._1)).sum })
        h = norm(edges.groupBy(_._1).map { case (s, es) =>
          s -> es.map(e => a(e._2)).sum })
      }
      got == (h.map { case (k, v) => (k, "hub") -> v } ++
        a.map { case (k, v) => (k, "authority") -> v })
    }, n = 12)
  }
}
