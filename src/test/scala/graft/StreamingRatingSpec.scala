package graft

import java.nio.file.{Files, Path}
import java.sql.Timestamp

import graft.pipelines.RatingPipeline
import graft.streaming.{PipelineRunner, StageSpec, Triggers}
import org.apache.spark.sql.functions._

/** The reference's whole deployment as streaming stages: CDR files land in
  * a directory (the AMQP-file handoff, SURVEY §1.1), `prerating`
  * normalizes and splits dead letters, `gsmrating` rates via the as-of
  * operator inside foreachBatch (per-record version pick is batch
  * semantics — foreachBatch is the idiomatic streaming bridge for it),
  * all driven by PipelineRunner control packets.
  */
class StreamingRatingSpec extends SparkSpec {

  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  private val tariffs = Seq(
    ("VOICE", ts("2026-01-01 00:00:00"), 1.00, 0.50),
    ("VOICE", ts("2026-08-12 05:00:00"), 2.00, 0.25),
    ("SMS", ts("2026-01-01 00:00:00"), 0.10, 0.00))
    .toDF("call_type", "valid_from", "rate_per_min", "setup_fee")

  private def writeBatch(dir: String, name: String, rows: Seq[String]): Unit = {
    val header = "record_type,imsi,msisdn,other_party,call_start_ts,duration_sec,cell_id,call_type,partial_seq"
    Files.writeString(Path.of(dir, name), (header +: rows).mkString("\n") + "\n")
  }

  test("three-stage streaming mediation: normalize → dead-letter → rate → bill") {
    val in = Files.createTempDirectory("graft_srp_in").toString
    val valid = Files.createTempDirectory("graft_srp_valid").toString
    val dead = Files.createTempDirectory("graft_srp_dead").toString
    val rated = Files.createTempDirectory("graft_srp_rated").toString
    val ck1 = Files.createTempDirectory("graft_srp_ck1").toString
    val ck2 = Files.createTempDirectory("graft_srp_ck2").toString

    writeBatch(in, "b1.csv", Seq(
      "MOC,404551234567890,+919812345678,919876543210,2026-08-12 04:58:11,124,c1,VOICE,1",
      "MOC,BADIMSI,9812345681,919876543210,2026-08-12 07:00:00,10,c2,VOICE,1"))

    val runner = new PipelineRunner(spark)
    runner.register(StageSpec("prerating",
      s => s.readStream.schema(RatingPipeline.cdrSchema).option("header", "true").csv(in),
      df => RatingPipeline.normalize(df),
      df => df.writeStream.outputMode("append")
        .option("checkpointLocation", ck1)
        .trigger(Triggers.microBatch("100 milliseconds"))
        .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
          val (ok, dl) = RatingPipeline.split(batch)
          ok.write.mode("append").parquet(valid)
          dl.write.mode("append").parquet(dead)
        }))
    // the valid-output schema equals the CDR schema (normalize rewrites
    // msisdn in place; split drops its flag column)
    runner.register(StageSpec("gsmrating",
      s => s.readStream.schema(RatingPipeline.cdrSchema).parquet(valid),
      df => df,
      df => df.writeStream.outputMode("append")
        .option("checkpointLocation", ck2)
        .trigger(Triggers.microBatch("100 milliseconds"))
        .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
          RatingPipeline.rate(RatingPipeline.assembleLegs(batch), tariffs)
            .write.mode("append").parquet(rated)
        }))

    runner.control("s=0\na=startsession")
    try {
      runner.start("prerating").processAllAvailable()
      runner.start("gsmrating").processAllAvailable()
      assert(spark.read.parquet(dead).count() == 1)
      val r1 = spark.read.parquet(rated)
      assert(r1.count() == 1)
      assert(r1.select("charge").as[java.math.BigDecimal].head().doubleValue == 3.5) // ceil(124/60)=3 min * 1.0 + 0.5 setup

      // second file lands → incremental processing picks up only new rows
      writeBatch(in, "b2.csv", Seq(
        "MTC,404551234567892,009812345680,919876543210,2026-08-12 06:00:00,1,c3,SMS,1"))
      runner.start("prerating").processAllAvailable()
      runner.start("gsmrating").processAllAvailable()
      val r2 = spark.read.parquet(rated)
      assert(r2.count() == 2)
      val charges = r2.select("call_type", "charge")
        .as[(String, java.math.BigDecimal)].collect()
        .map(x => x._1 -> x._2.doubleValue).toMap
      assert(charges == Map("VOICE" -> 3.5, "SMS" -> 0.1))

      // stage 3: billing — per-type totals land exactly-once in the RDBMS
      // (the reference's Oracle write-back), replay-safe via JdbcUpsert
      val ck3 = Files.createTempDirectory("graft_srp_ck3").toString
      val url = s"jdbc:derby:${Files.createTempDirectory("graft_srp_db")}/bill;create=true"
      val props = new java.util.Properties()
      props.setProperty("driver", "org.apache.derby.jdbc.EmbeddedDriver")
      val upsert = new graft.etl.JdbcUpsert(url, props,
        target = "billing_totals", staging = "billing_stage",
        ledger = "billing_ledger", keyCols = Seq("call_type"))
      val ratedSchema = spark.read.parquet(rated).schema
      runner.register(StageSpec("billing",
        s => s.readStream.schema(ratedSchema).parquet(rated),
        df => df.groupBy(col("call_type"))
          .agg(sum(col("charge").cast("double")).as("total_charge"),
            count(lit(1)).as("n_calls")),
        df => df.writeStream.outputMode("update")
          .option("checkpointLocation", ck3)
          .trigger(Triggers.microBatch("100 milliseconds"))
          .foreachBatch(upsert.sink)))
      runner.start("billing").processAllAvailable()
      val bill = spark.read.jdbc(url, "billing_totals", props)
        .as[(String, Double, Long)].collect()
        .map(r => r._1 -> ((r._2, r._3))).toMap
      assert(bill == Map("VOICE" -> ((3.5, 1L)), "SMS" -> ((0.1, 1L))),
        s"billing totals wrong: $bill")
    } finally runner.stopAll()
  }
}
