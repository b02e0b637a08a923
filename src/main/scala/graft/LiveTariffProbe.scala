package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

import graft.streaming.{LiveRatingChain, PipelineRunner, VersionedDim}

/** Dev probe: the round-12 LIVE TARIFF rating path under volume. The
  * LiveTariffSpec proves the SEMANTICS (an amendment published mid-run
  * rates the next batch, exact parity with batch q288); this measures
  * the COST of the extra attach stage + per-batch dim re-resolution at
  * 2M assembled calls / 50k accounts — variant A is the round-9 static
  * rating stage (tiers frozen at construction), variant B is
  * tariff_attach → rating(plan-on-record) with an amendment published
  * between waves. Checks: post-amendment rows rate under tariff_ver 2,
  * and the streamed invoice equals the batch
  * `marginalTieredChargesVersioned` run on the SAME usage under the
  * final timeline — EXACT. Results → SCALING.md.
  */
object LiveTariffProbe {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "16")
    val spark = core.GraftSession.builder(s"local[$cpus]", cpus.toInt)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    import spark.implicits._
    val nCalls = sys.env.getOrElse("SPARK_GRAFT_TARIFF_CALLS", "2000000").toInt
    val nAcct = sys.env.getOrElse("SPARK_GRAFT_TARIFF_ACCOUNTS", "50000").toInt
    val waves = 4
    val perWave = nCalls / waves
    val base = sys.env.getOrElse("SPARK_GRAFT_TARIFF_DIR",
      "/tmp/graft_tariffprobe")
    val fs = new org.apache.hadoop.fs.Path(base)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.delete(new org.apache.hadoop.fs.Path(base), true)

    val END = 4102444800L
    // amendment boundary: the start of wave 2's event-time range
    val mid = 2L * perWave
    def planA(vf: Long, vt: Long) = Seq(
      (vf, vt, 0L, 300L, 5L), (vf, vt, 300L, 1200L, 3L),
      (vf, vt, 1200L, Long.MaxValue, 1L))
    def planB(vf: Long, vt: Long) = Seq(
      (vf, vt, 0L, 500L, 4L), (vf, vt, 500L, Long.MaxValue, 2L))
    def toDim(rows: Seq[(Long, Long, Long, Long, Long)]) =
      rows.toDF("valid_from_sec", "valid_to_sec", "tier_from", "tier_to",
        "rate_centi")
    val staticTiers = Seq((0L, 300L, 5L), (300L, 1200L, 3L),
      (1200L, Long.MaxValue, 1L))

    // calls land as parquet waves (event time = event id; duration
    // deterministic). Same input for both variants.
    def waveDf(w: Int) = spark.range(w.toLong * perWave,
        (w + 1).toLong * perWave)
      .select(
        concat(((col("id") % nAcct) + 1L).cast("string"), lit(":"),
          col("id").cast("string")).as("call_id"),
        lit(1).cast("int").as("n_legs"),
        ((col("id") % 90L) + 1.0).cast("double").as("total_duration"),
        lit(true).as("complete"))
    def landWave(variant: String, w: Int): Unit =
      waveDf(w).write.mode("append").parquet(s"$base/$variant/calls")

    // ---- variant A: static tiers (rating stage from the base chain) ---
    // pre-create every handoff dir (the registerWithLiveTariff convention
    // — a stage must be able to start before its upstream's first batch)
    Seq(s"$base/static/calls", s"$base/live/calls",
        s"$base/live/enriched", s"$base/live/rated").foreach { d =>
      fs.mkdirs(new org.apache.hadoop.fs.Path(d))
    }
    val runnerA = new PipelineRunner(spark)
    runnerA.register(LiveRatingChain.stages(spark, s"$base/static/inbox",
      s"$base/static/legs", s"$base/static/calls", s"$base/static/rated",
      s"$base/static/ckpt", staticTiers).last)
    val qA = runnerA.start("rating")
    var wallA = 0.0
    (0 until waves).foreach { w =>
      landWave("static", w)
      val t0 = System.nanoTime()
      qA.processAllAvailable()
      val dt = (System.nanoTime() - t0) / 1e9
      wallA += dt
      println(f"livetariff static wave=$w wall=$dt%.2fs")
    }
    runnerA.stopAll()

    // ---- variant B: live tariff, amendment published after wave 1 ----
    val dim = new VersionedDim(spark, s"$base/live/dim",
      graft.queries.EventQ.validateTariffTimeline)
    dim.publish(toDim(planA(0L, END)))
    val runnerB = new PipelineRunner(spark)
    runnerB.register(LiveRatingChain.tariffAttachStage(spark,
      s"$base/live/calls", s"$base/live/enriched", s"$base/live/ckpt", dim))
    runnerB.register(LiveRatingChain.ratingStageLiveTariff(spark,
      s"$base/live/enriched", s"$base/live/rated", s"$base/live/ckpt"))
    val qB1 = runnerB.start("tariff_attach")
    val qB2 = runnerB.start("rating")
    var wallB = 0.0
    (0 until waves).foreach { w =>
      if (w == 2) {
        val t = System.nanoTime()
        dim.publish(toDim(planA(0L, mid) ++ planB(mid, END)))
        println(f"livetariff AMENDMENT published (v2) in ${(System.nanoTime() - t) / 1e9}%.2fs")
      }
      landWave("live", w)
      val t0 = System.nanoTime()
      qB1.processAllAvailable(); qB2.processAllAvailable()
      val dt = (System.nanoTime() - t0) / 1e9
      wallB += dt
      println(f"livetariff live   wave=$w wall=$dt%.2fs")
    }
    runnerB.stopAll()

    // ---- verification --------------------------------------------------
    val rated = spark.read.parquet(s"$base/live/rated")
    val postAmendV2 = rated.filter(col("event_id") >= mid &&
      col("tariff_ver") === 2L).count()
    val postAmendV1 = rated.filter(col("event_id") >= mid &&
      col("tariff_ver") === 1L).count()
    // batch twin on the same usage under the FINAL timeline — the
    // attach stage rates by event time, so waves 0..1 (< mid) rate at
    // plan A either way and waves 2..3 at plan B; invoice must be EXACT
    val usage = (0 until waves).map(w => waveDf(w)).reduce(_ union _)
      .select(
        split(col("call_id"), ":").getItem(1).cast(LongType)
          .as("event_id"),
        split(col("call_id"), ":").getItem(0).cast(LongType)
          .as("user_id"),
        split(col("call_id"), ":").getItem(1).cast(LongType).as("ts"),
        expr("CAST(round(total_duration) AS BIGINT)").as("u"))
    val expected = graft.queries.EventQ.marginalTieredChargesVersioned(
        usage, col("u"), toDim(planA(0L, mid) ++ planB(mid, END)))
      .groupBy(col("k").as("account_id"))
      .agg(sum(col("charge_centi")).as("c"))
    val streamed = rated.groupBy(col("account_id"))
      .agg(sum(col("charge_centi")).as("c"))
    val diff = streamed.join(expected, Seq("account_id"), "full")
      .filter(streamed("c") =!= expected("c") ||
        streamed("c").isNull || expected("c").isNull)
      .count()
    println(f"livetariff total static=$wallA%.1fs live=$wallB%.1fs " +
      f"overhead=${(wallB - wallA) / wallA * 100}%.0f%% " +
      f"post_amend_v2=$postAmendV2 post_amend_v1=$postAmendV1 " +
      f"invoice_mismatches=$diff (must be 0)")
    require(postAmendV2 > 0L, "amendment never took effect")
    require(postAmendV1 == 0L,
      "a post-amendment record rated under the old version")
    require(diff == 0L, "streamed invoice != batch under the timeline")
    spark.stop()
  }
}
