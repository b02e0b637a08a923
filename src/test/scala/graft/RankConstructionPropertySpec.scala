package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop, Test => ScTest}

import graft.queries.CurationQ

/** Property tests for the two-pass rank constructions (bucket histogram +
  * broadcast offsets + per-bucket windows): on ARBITRARY score/length/
  * source distributions — including heavy ties, empty buckets, and
  * single-element strata — they must equal the naive single-partition
  * global window they replace. The oracle fixtures pin one dataset;
  * these pin the construction.
  */
class RankConstructionPropertySpec extends SparkSpec {

  import spark.implicits._

  private val docGen = Gen.listOfN(60,
    Gen.zip(Gen.choose(0, 500), Gen.choose(1, 12), Gen.oneOf("s0", "s1", "s2", "s3")))

  test("globalRankBy == naive global ROW_NUMBER on random scores") {
    val prop = Prop.forAll(docGen, Gen.oneOf(1L, 7L, 64L, 1000L)) { (rows, width) =>
      val docs = rows.zipWithIndex
        .map { case ((score, _, _), i) => (i.toLong, score.toLong) }
        .toDF("doc_id", "n_chars")
      val fast = CurationQ.globalRankBy(docs, "n_chars", width)
        .select($"doc_id", $"grank").as[(Long, Long)].collect().toMap
      val naive = docs.withColumn("grank",
          row_number().over(Window.orderBy($"n_chars", $"doc_id")).cast("long"))
        .select($"doc_id", $"grank").as[(Long, Long)].collect().toMap
      fast == naive
    }
    val res = ScTest.check(ScTest.Parameters.default.withMinSuccessfulTests(15), prop)
    assert(res.passed, res.status.toString)
  }

  test("planShards == naive global token cumsum on random lengths") {
    val prop = Prop.forAll(docGen, Gen.oneOf(5L, 16L, 64L)) { (rows, budget) =>
      val docs = rows.zipWithIndex
        .map { case ((_, len, _), i) => (i.toLong, ("t " * len).trim) }
        .toDF("doc_id", "text")
      val fast = CurationQ.planShards(docs, budget, bucketWidth = 100000L)
        .select($"doc_id", $"shard_id").as[(Long, Long)].collect().toMap
      val naive = docs.selectExpr("doc_id",
          "CAST(size(split(text, ' ')) AS BIGINT) AS n",
          "conv(substr(md5(concat('shard:', doc_id)), 1, 5), 16, 10) % 1000000 AS hk")
        .withColumn("cum",
          sum($"n").over(Window.orderBy($"hk", $"doc_id")
            .rowsBetween(Window.unboundedPreceding, -1)))
        .selectExpr("doc_id", s"coalesce(cum, 0L) DIV ${budget}L AS shard_id")
        .as[(Long, Long)].collect().toMap
      fast == naive
    }
    val res = ScTest.check(ScTest.Parameters.default.withMinSuccessfulTests(15), prop)
    assert(res.passed, res.status.toString)
  }

  test("interleaveBySource == naive (level, source) ROW_NUMBER on random mixes") {
    // levelBucket 1 and 4 force level-bucket boundary crossings the
    // 4096 default never hits at test scale
    val prop = Prop.forAll(docGen, Gen.oneOf(1L, 4L, 4096L)) { (rows, lb) =>
      val docs = rows.zipWithIndex
        .map { case ((_, _, src), i) => (i.toLong, src) }
        .toDF("doc_id", "source")
      val fast = CurationQ.interleaveBySource(docs, levelBucket = lb)
        .select($"doc_id", $"ilv_rank").as[(Long, Long)].collect().toMap
      val naive = docs.selectExpr("doc_id", "source",
          "conv(substr(md5(concat('ilv:', doc_id)), 1, 5), 16, 10) % 1000000 AS hk")
        .withColumn("r", row_number().over(
          Window.partitionBy($"source").orderBy($"hk", $"doc_id")))
        .withColumn("ilv_rank", row_number().over(
          Window.orderBy($"r", $"source")).cast("long"))
        .select($"doc_id", $"ilv_rank").as[(Long, Long)].collect().toMap
      fast == naive
    }
    val res = ScTest.check(ScTest.Parameters.default.withMinSuccessfulTests(15), prop)
    assert(res.passed, res.status.toString)
  }

  test("quantileBands == naive sorted order statistics on random multisets") {
    import graft.queries.AnalyticsQ
    val rowGen = Gen.listOfN(50,
      Gen.zip(Gen.oneOf("a", "b"), Gen.choose(-200, 200)))
    val prop = Prop.forAll(rowGen) { rows =>
      val ev = rows.zipWithIndex
        .map { case ((g, cents), i) => (i.toLong, g, cents / 100.0) }
        .toDF("event_id", "event_type", "value")
      val fast = AnalyticsQ.quantileBands(ev)
        .select($"event_type", $"p500", $"p950", $"p990")
        .as[(String, Double, Double, Double)].collect()
        .map { case (k, a, b, c) => k -> ((a, b, c)) }.toMap
      val naive = rows.groupBy(_._1).map { case (g, vs) =>
        val sorted = vs.map(_._2).sorted
        def pick(p: Int) = sorted(((sorted.size * p + 999) / 1000) - 1) / 100.0
        g -> ((pick(500), pick(950), pick(990)))
      }
      fast == naive
    }
    val res = ScTest.check(ScTest.Parameters.default.withMinSuccessfulTests(20), prop)
    assert(res.passed, res.status.toString)
  }

  test("madOutliers flag set == naive median/MAD computation") {
    import graft.queries.AnalyticsQ
    val rowGen = Gen.listOfN(40, Gen.zip(Gen.oneOf("a", "b"), Gen.choose(-50, 50)))
    val prop = Prop.forAll(rowGen) { rows =>
      val ev = rows.zipWithIndex
        .map { case ((g, cents), i) => (i.toLong, g, cents / 100.0) }
        .toDF("event_id", "event_type", "value")
      val fast = AnalyticsQ.madOutliers(ev)
        .select($"event_id").as[Long].collect().toSet
      def lowerMedian(xs: Seq[Long]): Long = xs.sorted.apply((xs.size + 1) / 2 - 1)
      val naive = rows.zipWithIndex.groupBy(_._1._1).flatMap { case (_, vs) =>
        val ly = vs.map(_._1._2.toLong)
        val med = lowerMedian(ly)
        val mad = lowerMedian(ly.map(v => math.abs(v - med)))
        vs.collect { case ((_, v), i) if math.abs(v - med) * 10000L > 44478L * mad =>
          i.toLong }
      }.toSet
      fast == naive
    }
    val res = ScTest.check(ScTest.Parameters.default.withMinSuccessfulTests(20), prop)
    assert(res.passed, res.status.toString)
  }
}
