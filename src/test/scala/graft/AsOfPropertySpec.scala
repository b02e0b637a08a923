package graft

import java.sql.Timestamp

import graft.plans.AsOf
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop, Test => ScTest}

/** Property test (SURVEY §7 "hard parts"): the custom as-of operator must
  * agree with the composed join+rank formulation on arbitrary key/time
  * data, including open intervals (no version yet) and boundary equality.
  * Times are generated at second granularity with unique (key, time)
  * version rows, matching the operator's documented tie contract.
  */
class AsOfPropertySpec extends SparkSpec {

  import spark.implicits._

  private val keyGen = Gen.oneOf("VOICE", "SMS", "DATA", "MMS")
  private val timeGen = Gen.choose(0L, 100L) // small domain → frequent boundary hits

  private val leftGen = Gen.listOfN(40, Gen.zip(keyGen, timeGen))
  private val rightGen = Gen.listOfN(25, Gen.zip(keyGen, timeGen)).map(_.distinct)

  private def ts(offset: Long) = new Timestamp(1700000000000L + offset * 1000L)

  test("custom as-of == composed join+rank on random inputs") {
    val prop = Prop.forAll(leftGen, rightGen) { (ls, rs) =>
      val left = ls.zipWithIndex.map { case ((k, t), i) => (i.toLong, k, ts(t)) }
        .toDF("lid", "lk", "lt")
      val right = rs.zipWithIndex.map { case ((k, t), i) => (i.toLong, k, ts(t)) }
        .toDF("rid", "rk", "rt")

      val custom = AsOf.join(left, right, Seq("lk"), Seq("rk"), "lt", "rt")
        .select(col("lid"), col("rid")).as[(Long, Option[Long])].collect().toMap

      val w = Window.partitionBy(col("lid")).orderBy(col("rt").desc, col("rid").desc)
      val composed = left
        .join(right, col("lk") === col("rk") && col("rt") <= col("lt"), "left")
        .withColumn("rn", row_number().over(w)).filter(col("rn") === 1)
        .select(col("lid"), col("rid")).as[(Long, Option[Long])].collect().toMap

      // rid ties are impossible (distinct (key,time) versions), so maps
      // must agree exactly — including None for open intervals
      custom == composed
    }
    val res = ScTest.check(ScTest.Parameters.default.withMinSuccessfulTests(20), prop)
    assert(res.passed, res.status.toString)
  }
}
