package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

import graft.streaming.{LiveRatingChain, PipelineRunner, VersionedDim}

/** Dev probe: the FULLY LIVE topology under volume — prerating guided
  * by a versioned NUMBER PLAN and rating by a versioned TARIFF, both
  * re-resolved per micro-batch, with a 1%-of-blocks PORT and a tariff
  * AMENDMENT published between waves while 2M CDRs flow through all
  * five stages (prerating → ingest → assembly → attach → rating).
  *
  * The check is the composed determinism statement FullyLiveChainSpec
  * pins at toy size, here at 2M CDRs / 50k accounts: because both dims
  * are event-time-versioned and each publish lands before the traffic
  * its era covers, the whole streamed run must equal ONE batch replay
  * under the FINAL timelines — `guideRangesVersioned(final plan)` →
  * `marginalTieredChargesVersioned(final timeline)` — EXACT per-account
  * invoice parity, ports and amendments included. Results → SCALING.md.
  */
object LiveTopologyProbe {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "16")
    val spark = core.GraftSession.builder(s"local[$cpus]", cpus.toInt)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    import spark.implicits._
    val nCdrs = sys.env.getOrElse("SPARK_GRAFT_LIVE_CDRS", "2000000").toInt
    val nAcct = sys.env.getOrElse("SPARK_GRAFT_LIVE_ACCOUNTS", "50000").toInt
    val waves = 4
    val perWave = nCdrs / waves
    val tp = 2L * perWave // port + amendment effective time
    val END = 4102444800L
    val base = sys.env.getOrElse("SPARK_GRAFT_LIVE_DIR",
      "/tmp/graft_livetopo")
    val fs = new org.apache.hadoop.fs.Path(base)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.delete(new org.apache.hadoop.fs.Path(base), true)

    // ---- dims -----------------------------------------------------------
    // number plan: one 100-number block per account; every 100th block
    // ports WHOLE to owner a+1e6 at tp in v2
    def planRows(v2: Boolean) = spark.range(1L, nAcct + 1L).toDF("a")
      .select(
        (lit(49100000000L) + col("a") * 100L).as("range_start"),
        (lit(49100000000L) + col("a") * 100L + 99L).as("range_end"),
        col("a"))
      .withColumn("era", explode(
        when(lit(v2) && col("a") % 100L === 0L,
          expr("sequence(0, 1)")).otherwise(expr("sequence(0, 0)"))))
      .select(col("range_start"), col("range_end"),
        when(col("era") === 1L, lit(tp)).otherwise(lit(0L))
          .as("valid_from_sec"),
        when(lit(v2) && col("a") % 100L === 0L && col("era") === 0L,
          lit(tp)).otherwise(lit(END)).as("valid_to_sec"),
        when(col("era") === 1L, col("a") + 1000000L).otherwise(col("a"))
          .as("account_id"))
    def planA(vf: Long, vt: Long) = Seq(
      (vf, vt, 0L, 300L, 5L), (vf, vt, 300L, 1200L, 3L),
      (vf, vt, 1200L, Long.MaxValue, 1L))
    def planB(vf: Long, vt: Long) = Seq(
      (vf, vt, 0L, 500L, 4L), (vf, vt, 500L, Long.MaxValue, 2L))
    def tariffDf(rows: Seq[(Long, Long, Long, Long, Long)]) =
      rows.toDF("valid_from_sec", "valid_to_sec", "tier_from", "tier_to",
        "rate_centi")

    val numberDim = new VersionedDim(spark, s"$base/numdim",
      graft.queries.PreratingQ.validateVersionedDim)
    val tariffDim = new VersionedDim(spark, s"$base/tardim",
      graft.queries.EventQ.validateTariffTimeline)
    numberDim.publish(planRows(v2 = false))
    tariffDim.publish(tariffDf(planA(0L, END)))

    // ---- raw CDR waves (event time = event id, waves contiguous) -------
    def msisdn(acct: Long, e: Long): String = {
      val num = (49100000000L + acct * 100L + e % 100L).toString
      (e % 4L) match {
        case 0L => s"+$num"
        case 1L => s"00$num"
        case 2L => s"0${num.drop(2)}"
        case _ => num.drop(2)
      }
    }
    def writeWave(w: Int): Int = {
      val dir = java.nio.file.Paths.get(s"$base/inbox")
      java.nio.file.Files.createDirectories(dir)
      val tmp = java.nio.file.Paths.get(base, s"w$w.tmp")
      val pw = new java.io.PrintWriter(tmp.toFile)
      pw.println("msisdn,event_id,seq,total,duration_sec")
      (w * perWave until (w + 1) * perWave).foreach { e =>
        val acct = 1L + (e * 7919L) % nAcct
        pw.println(s"${msisdn(acct, e.toLong)},$e,1,1,${e % 90 + 1}.0")
      }
      // a planted velocity burst rides the LAST wave: 100 consecutive-
      // second calls from account 1 (fresh event ids past every wave),
      // so the packet-plane fraud consumer has something to alarm on
      if (w == waves - 1)
        (0 until 100).foreach { i =>
          val e = nCdrs.toLong + i
          pw.println(s"${msisdn(1L, e)},$e,1,1,5.0")
        }
      pw.close()
      java.nio.file.Files.move(tmp, dir.resolve(s"wave_$w.csv"),
        java.nio.file.StandardCopyOption.ATOMIC_MOVE)
      perWave
    }

    // ---- run ------------------------------------------------------------
    // the fully-live 5 stages PLUS the round-13 packet-plane fan-out:
    // rated records demux to invoice + fraud consumers, each on its own
    // archived packetqueue, routing rule itself a live VersionedDim
    val runner = new PipelineRunner(spark)
    val routeDim = LiveRatingChain.routingDim(spark, s"$base/routedim")
    routeDim.publish(Seq(("invoice", true), ("fraud", true))
      .toDF("dest", "enabled"))
    val names = LiveRatingChain.registerFullyLive(runner, spark,
      s"$base/inbox", numberDim, tariffDim, s"$base/prerated",
      s"$base/legs", s"$base/calls", s"$base/enriched", s"$base/rated",
      s"$base/ckpt") ++
      LiveRatingChain.registerFanout(runner, spark, s"$base/rated",
        routeDim, s"$base/fan", s"$base/export", s"$base/alarms",
        s"$base/ckpt", windowSec = 3600L, threshold = 3L)
    val qs = names.map(runner.start)
    var wall = 0.0
    (0 until waves).foreach { w =>
      if (w == 2) {
        val t = System.nanoTime()
        numberDim.publish(planRows(v2 = true))
        tariffDim.publish(tariffDf(planA(0L, tp) ++ planB(tp, END)))
        // the routing dim advances too (same class set — the hop is the
        // point: route_ver must move 1 → 2 mid-run, no stage restart)
        routeDim.publish(Seq(("invoice", true), ("fraud", true))
          .toDF("dest", "enabled"))
        println(f"livetopo PORT+AMENDMENT published in ${(System.nanoTime() - t) / 1e9}%.2fs")
      }
      val n = writeWave(w)
      val t0 = System.nanoTime()
      (1 to 2).foreach(_ => qs.foreach(_.processAllAvailable()))
      val dt = (System.nanoTime() - t0) / 1e9
      wall += dt
      println(f"livetopo wave=$w cdrs=$n wall=$dt%.2fs")
    }
    runner.stopAll()

    // ---- verification ----------------------------------------------------
    val rated = spark.read.parquet(s"$base/rated")
    val portedNew = rated.filter(col("account_id") > 1000000L).count()
    val postAmendV1 = rated.filter(col("event_id") >= tp &&
      col("tariff_ver") === 1L).count()

    // the batch replay under the FINAL timelines
    val raw = spark.read.option("header", "true")
      .schema(LiveRatingChain.rawCdrSchema).csv(s"$base/inbox")
    val guided = graft.queries.PreratingQ.guideRangesVersioned(
      graft.queries.PreratingQ.normalizeMsisdn(raw, "msisdn")
        .withColumn("sec", col("event_id")),
      planRows(v2 = true))
    val usage = guided.filter(col("account_id").isNotNull)
      .select(col("event_id"), col("account_id").as("user_id"),
        col("sec").as("ts"),
        expr("CAST(round(duration_sec) AS BIGINT)").as("u"))
    val expected = graft.queries.EventQ.marginalTieredChargesVersioned(
        usage, col("u"), tariffDf(planA(0L, tp) ++ planB(tp, END)))
      .groupBy(col("k").as("account_id"))
      .agg(sum(col("charge_centi")).as("c"))
    val streamed = rated.groupBy(col("account_id").cast(LongType)
        .as("account_id"))
      .agg(sum(col("charge_centi")).as("c"))
    val diff = streamed.join(expected, Seq("account_id"), "full")
      .filter(streamed("c") =!= expected("c") ||
        streamed("c").isNull || expected("c").isNull)
      .count()
    val legs = rated.count()
    println(f"livetopo total wall=$wall%.1fs rated=$legs " +
      f"ported_new_owner=$portedNew post_amend_v1=$postAmendV1 " +
      f"invoice_mismatches=$diff (must be 0)")
    require(portedNew > 0L, "port never took effect")
    require(postAmendV1 == 0L,
      "a post-amendment record rated under the old tariff version")
    require(diff == 0L,
      "streamed fully-live chain != batch replay under final timelines")

    // ---- the packet-plane fan-out, verified at volume --------------------
    val export = spark.read.parquet(s"$base/export")
    val exportN = export.count()
    val fanDiff = export.groupBy(col("account_id"))
      .agg(sum(col("charge_centi")).as("ec"))
      .join(rated.groupBy(col("account_id").cast(LongType)
          .as("account_id"))
        .agg(sum(col("charge_centi")).as("rc")),
        Seq("account_id"), "full")
      .filter(col("ec") =!= col("rc") ||
        col("ec").isNull || col("rc").isNull)
      .count()
    val routeVers = export.select(col("route_ver")).distinct()
      .as[Long].collect().toSet
    val alarms = spark.read.parquet(s"$base/alarms")
      .filter(col("user_id") === 1L).count()
    println(f"livetopo fanout: export=$exportN " +
      f"fan_mismatches=$fanDiff route_vers=$routeVers " +
      f"burst_alarms=$alarms")
    require(exportN == legs && fanDiff == 0L,
      "invoice consumer over the packet plane lost or duplicated " +
        "rated records")
    require(routeVers == Set(1L, 2L),
      s"route_ver never advanced mid-run: $routeVers")
    require(alarms >= 90L,
      s"packet-plane VelocityMonitor missed the planted burst: $alarms")
    spark.stop()
  }
}
