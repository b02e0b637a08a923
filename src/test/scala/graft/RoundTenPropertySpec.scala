package graft

import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop, Test => ScTest}

import graft.queries.{AnalyticsQ, BillingQ, PreratingQ, RoutingQ, TextQ}

/** Randomized equivalence for the round-10 operators: each distributed
  * implementation is pinned against an independent in-memory replay of
  * its contract on arbitrary inputs (the RoundEight/NinePropertySpec
  * convention) — the oracle proves engine parity on one corpus shape,
  * these prove the construction (bucketized range join, LPM cascade,
  * cell-grain τ, chunk grid, increment rounding) equals the plain loop
  * everywhere.
  */
class RoundTenPropertySpec extends SparkSpec {

  import spark.implicits._

  // --- normalizeMsisdn: the four wire forms of one NSN collapse ---------

  test("normalizeMsisdn collapses all four wire forms of any valid NSN") {
    val nsnGen = Gen.chooseNum(1000000L, 9999999999999L) // 7–13 digits
      .map(_.toString)
    val prop = Prop.forAll(nsnGen) { nsn =>
      val forms = Seq(s"+49$nsn", s"0049$nsn", s"0$nsn", nsn,
        s"+49 $nsn", s"0049-$nsn")
      val out = PreratingQ.normalizeMsisdn(forms.toDF("raw_number"))
        .select(col("canonical"), col("reason"))
        .as[(String, String)].collect()
      val want = s"49$nsn"
      if (want.length >= 8 && want.length <= 15)
        out.forall(_ == ((want, null)))
      else out.forall(r => r._1 == null && r._2 != null)
    }
    val res = ScTest.check(
      ScTest.Parameters.default.withMinSuccessfulTests(40), prop)
    assert(res.passed, res.status.toString)
  }

  // --- guideRanges vs in-memory interval lookup -------------------------

  test("guideRanges == plain interval lookup on random allocations") {
    // random non-overlapping ranges with gaps + random probe numbers
    val caseGen = for {
      seed <- Gen.choose(0L, Long.MaxValue / 2)
      nRanges <- Gen.choose(1, 40)
      nNums <- Gen.choose(1, 120)
    } yield (seed, nRanges, nNums)
    val prop = Prop.forAll(caseGen) { case (seed, nRanges, nNums) =>
      val rnd = new scala.util.Random(seed)
      var cursor = 10000000L
      val ranges = (0 until nRanges).map { i =>
        val start = cursor + 1 + rnd.nextInt(5000)
        val width = 1L + rnd.nextInt(20000)
        cursor = start + width - 1
        (start, cursor, 100L + i)
      }
      val nums = (0 until nNums).map { i =>
        (i.toLong,
          (10000000L + math.abs(rnd.nextLong()) %
            (cursor - 10000000L + 40000L)).toString)
      }
      val got = PreratingQ.guideRanges(
          nums.toDF("id", "canonical"),
          ranges.toDF("range_start", "range_end", "account_id"))
        .select(col("id"), col("account_id"))
        .as[(Long, Option[Long])].collect().toMap
      val want = nums.map { case (id, s) =>
        val v = s.toLong
        id -> ranges.collectFirst {
          case (lo, hi, a) if v >= lo && v <= hi => a
        }
      }.toMap
      got == want
    }
    val res = ScTest.check(
      ScTest.Parameters.default.withMinSuccessfulTests(15), prop)
    assert(res.passed, res.status.toString)
  }

  // --- prefixRoute (the q266/q267 substrate) vs in-memory LPM -----------

  test("prefixRoute == plain longest-prefix scan on random plans") {
    val caseGen = for {
      seed <- Gen.choose(0L, Long.MaxValue / 2)
      nPfx <- Gen.choose(1, 30)
      nCalls <- Gen.choose(1, 80)
    } yield (seed, nPfx, nCalls)
    val prop = Prop.forAll(caseGen) { case (seed, nPfx, nCalls) =>
      val rnd = new scala.util.Random(seed)
      val prefixes = Iterator.continually {
        val len = 1 + rnd.nextInt(4)
        (1 to len).map(_ => ('0' + rnd.nextInt(10)).toChar).mkString
      }.distinct.take(nPfx).toSeq
      val dim = prefixes.zipWithIndex.map { case (p, i) =>
        (p, s"R$i", 10L + i)
      }
      val calls = (0 until nCalls).map { i =>
        (i.toLong,
          (1 to 7).map(_ => ('0' + rnd.nextInt(10)).toChar).mkString,
          1L + rnd.nextInt(9))
      }
      val got = RoutingQ.prefixRoute(
          calls.toDF("call_id", "dialed", "dur_min"),
          dim.toDF("prefix", "route", "rate_centi"))
        .select(col("call_id"), col("prefix"), col("charge_centi"))
        .as[(Long, Option[String], Long)].collect()
        .map(r => r._1 -> ((r._2, r._3))).toMap
      val want = calls.map { case (id, dialed, dur) =>
        val best = dim.filter(d => dialed.startsWith(d._1))
          .sortBy(-_._1.length).headOption
        id -> ((best.map(_._1), best.map(dur * _._3).getOrElse(0L)))
      }.toMap
      got == want
    }
    val res = ScTest.check(
      ScTest.Parameters.default.withMinSuccessfulTests(15), prop)
    assert(res.passed, res.status.toString)
  }

  // --- kendallTau vs the O(n²) definition --------------------------------

  test("kendallTau cell construction == the textbook pairwise definition") {
    val pairGen = Gen.zip(Gen.choose(0L, 8L), Gen.choose(0L, 8L))
    val feedGen = Gen.choose(2, 60).flatMap(n => Gen.listOfN(n, pairGen))
    val prop = Prop.forAll(feedGen) { pairs =>
      val got = AnalyticsQ.kendallTau(pairs.toDF("x", "y"), "x", "y")
        .select(col("concordant"), col("discordant"),
          col("ties_x_pairs"), col("ties_y_pairs"))
        .as[(Long, Long, Long, Long)].head()
      var (c, d, tx, ty) = (0L, 0L, 0L, 0L)
      for (i <- pairs.indices; j <- i + 1 until pairs.size) {
        val ((x1, y1), (x2, y2)) = (pairs(i), pairs(j))
        if (x1 == x2) tx += 1
        if (y1 == y2) ty += 1
        if (x1 != x2 && y1 != y2) {
          if ((x1 < x2) == (y1 < y2)) c += 1 else d += 1
        }
      }
      got == ((c, d, tx, ty))
    }
    val res = ScTest.check(
      ScTest.Parameters.default.withMinSuccessfulTests(25), prop)
    assert(res.passed, res.status.toString)
  }

  // --- chunkWithOverlap: coverage + reassembly ---------------------------

  test("chunking reassembles the document and covers every char") {
    val caseGen = for {
      text <- Gen.choose(0, 300).flatMap(n =>
        Gen.listOfN(n, Gen.alphaNumChar).map(_.mkString))
      window <- Gen.choose(1, 50)
      stride <- Gen.choose(1, 50)
    } yield (text, window, math.min(window, stride))
    val prop = Prop.forAll(caseGen) { case (text, window, stride) =>
      val chunks = TextQ.chunkWithOverlap(
          Seq((1L, text)).toDF("doc_id", "text"), window, stride)
        .orderBy(col("chunk_idx"))
        .select(col("start_char"), col("chunk_chars"))
        .as[(Long, Long)].collect().toSeq
      val starts = 0L until math.max(text.length.toLong, 1L) by stride.toLong
      val want = starts.map(s =>
        (s, math.min(window.toLong, text.length - s))).toSeq
      // reassembly: non-overlapping prefix of each chunk concatenates
      // back to the doc (stride chars each, last chunk to the end)
      val rebuilt = chunks.map { case (s, n) =>
        text.substring(s.toInt,
          math.min(s.toInt + math.min(stride.toLong, n).toInt, text.length))
      }.mkString
      chunks == want && rebuilt == text
    }
    val res = ScTest.check(
      ScTest.Parameters.default.withMinSuccessfulTests(40), prop)
    assert(res.passed, res.status.toString)
  }

  // --- incrementRating vs the per-call loop -------------------------------

  test("incrementRating == the per-call rounding loop") {
    val caseGen = for {
      durs <- Gen.choose(1, 60).flatMap(n =>
        Gen.listOfN(n, Gen.choose(-30L, 400L)))
      first <- Gen.choose(1L, 90L)
      inc <- Gen.choose(1L, 60L)
      rate <- Gen.choose(1L, 300L)
    } yield (durs, first, inc, rate)
    val prop = Prop.forAll(caseGen) { case (durs, first, inc, rate) =>
      val got = BillingQ.incrementRating(
          durs.map(d => ("X", d)).toDF("carrier", "dur_sec"),
          Seq(("X", first, inc, rate))
            .toDF("carrier", "first_sec", "inc_sec", "rate_centi_per_min"))
        .select(col("spoken_sec"), col("billed_sec"), col("charge_centi"))
        .as[(Long, Long, Long)].head()
      def billed(d: Long): Long =
        if (d <= 0L) 0L
        else if (d <= first) first
        else first + ((d - first + inc - 1) / inc) * inc
      val want = (
        durs.map(d => math.max(d, 0L)).sum,
        durs.map(billed).sum,
        durs.map(d => billed(d) * rate / 60L).sum)
      got == want
    }
    val res = ScTest.check(
      ScTest.Parameters.default.withMinSuccessfulTests(25), prop)
    assert(res.passed, res.status.toString)
  }
}
