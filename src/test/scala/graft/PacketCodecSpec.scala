package graft

import graft.etl.{PacketCodec, PacketOps}
import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop, Test => ScTest}

/** Packet wire-format codec: round-trip property (FIXTURES.md §B) mirroring
  * `MFramework.cpp:1230-1243 / 1552-1560`, plus the column-level codec and
  * the validation/dead-letter split.
  */
class PacketCodecSpec extends SparkSpec {

  private def check(p: Prop): Unit = {
    val res = ScTest.check(ScTest.Parameters.default.withMinSuccessfulTests(200), p)
    assert(res.passed, res.status.toString)
  }

  private val keyGen: Gen[String] =
    Gen.alphaLowerChar.map(_.toString)
  private val valGen: Gen[String] =
    Gen.listOf(Gen.frequency(
      (9, Gen.alphaNumChar),
      (1, Gen.oneOf('|', ':', '.', '/', ' ')))).map(_.mkString)
  private val mapGen: Gen[Map[String, String]] =
    Gen.mapOf(Gen.zip(keyGen, valGen))

  test("parse(serialize(m)) == m for single-char-key maps") {
    check(Prop.forAll(mapGen) { m =>
      PacketCodec.parseLocal(PacketCodec.serializeLocal(m)) == m
    })
  }

  test("lines without '=' at index 1 are ignored, as in the reference") {
    assert(PacketCodec.parseLocal("s=12\ngarbage\nxx=nope\nf=a.dat") ==
      Map("s" -> "12", "f" -> "a.dat"))
  }

  test("column codec round-trips through str_to_map") {
    import spark.implicits._
    val wires = Seq("s=1\nf=CDR_1.dat\nt=GSMRATING", "s=2\nt=PRERATING").toDF("wire")
    val roundTripped = wires
      .withColumn("m", PacketCodec.parse(col("wire")))
      .withColumn("back", PacketCodec.serializeSorted(col("m")))
      .select("back").as[String].collect().toSet
    assert(roundTripped == Set("f=CDR_1.dat\ns=1\nt=GSMRATING", "s=2\nt=PRERATING"))
  }

  test("validate splits valid packets from dead letters on the 's' key") {
    import spark.implicits._
    val df = Seq("s=1\nf=a.dat", "f=orphan.dat", "s=2\nf=b.dat").toDF("wire")
      .withColumn("pkt", PacketCodec.parse(col("wire")))
    val (valid, dead) = PacketOps.validate(df, col("pkt"))
    assert(valid.count() == 2)
    assert(dead.count() == 1)
    assert(dead.select(element_at(col("pkt"), "f")).as[String].collect().sameElements(Array("orphan.dat")))
  }

  test("routeKey defaults unrouted packets") {
    import spark.implicits._
    val df = Seq("s=1\nt=RATING", "s=2").toDF("wire")
      .withColumn("pkt", PacketCodec.parse(col("wire")))
    val keys = df.select(PacketOps.routeKey(col("pkt"))).as[String].collect().toSet
    assert(keys == Set("RATING", "_unrouted"))
  }
}
