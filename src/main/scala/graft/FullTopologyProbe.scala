package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.queries.EventQ
import graft.streaming.{HardenedIngest, LiveRatingChain, PipelineRunner}

/** Dev probe: the COMPLETE production topology at volume — prerating
  * (MSISDN normalize + range guiding) → HARDENED ingest (content-hash
  * redelivery dedup) → LegAssembler → MarginalRater — with a mid-run
  * kill-and-restart AND a whole redelivered wave. The claims under
  * test beyond the plain-chain probe (LiveRatingChainProbe):
  *
  *  1. prerating + the dedup ledger add BOUNDED per-wave cost (each is
  *     batch-sized work: map-side normalize, one broadcast range join,
  *     one file-grain digest agg + ledger anti-join);
  *  2. a 500k-leg wave REDELIVERED under a new name reaches the ledger
  *     and drops whole — zero effect on the invoice at volume;
  *  3. the streamed invoice through all four stages still equals the
  *     q239 batch run over the deduped raw legs — EXACTLY.
  *
  * Raw CDRs carry wire-form MSISDNs (4 spellings round-robin); each
  * account owns a 100-number range, so guiding is a real
  * number→account resolution, not a pass-through. Results → SCALING.md.
  */
object FullTopologyProbe {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "16")
    val spark = core.GraftSession.builder(s"local[$cpus]", cpus.toInt)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    import spark.implicits._

    val nLegs = sys.env.getOrElse("SPARK_GRAFT_CHAIN_LEGS", "2000000").toInt
    val nAcct = sys.env.getOrElse("SPARK_GRAFT_CHAIN_ACCOUNTS", "50000").toInt
    val waves = 4
    val base = sys.env.getOrElse("SPARK_GRAFT_CHAIN_DIR", "/tmp/graft_fullprobe")
    val fs = new org.apache.hadoop.fs.Path(base)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.delete(new org.apache.hadoop.fs.Path(base), true)
    Seq("raw", "prerated", "legs", "calls", "rated").foreach(d =>
      java.nio.file.Files.createDirectories(
        java.nio.file.Paths.get(s"$base/$d")))

    val tiers = Seq((0L, 5000L, 5L), (5000L, 20000L, 3L),
      (20000L, Long.MaxValue, 1L))
    val taxes = Seq(("fed", 100000L, false), ("muni", 50000L, true))

    // each account owns [49100000000 + a*100, +99]; a call by account a
    // with event e dials suffix e%100 in one of four wire spellings
    val ranges = spark.range(1L, nAcct + 1L).toDF("a").select(
      (lit(49100000000L) + col("a") * 100L).as("range_start"),
      (lit(49100000000L) + col("a") * 100L + 99L).as("range_end"),
      col("a").as("account_id"))
    def msisdn(acct: Long, e: Long): String = {
      val num = (49100000000L + acct * 100L + e % 100L).toString
      val nsn = num.drop(2) // the digits after country code 49
      (e % 4L) match {
        case 0L => s"+$num"
        case 1L => s"00$num"
        case 2L => s"0$nsn"
        case _ => nsn // bare national (defaultCc prepends)
      }
    }

    // ---- synthesize raw legs (the plain probe's shape, messy numbers)
    val rnd = new scala.util.Random(42L)
    final case class L(wave: Int, m: String, e: Long, seq: Int,
      total: Int, dur: Double)
    val buf = scala.collection.mutable.ArrayBuffer.empty[L]
    var eventId = 0L
    while (buf.size < nLegs) {
      eventId += 1
      val acct = 1 + rnd.nextInt(nAcct)
      val total = 1 + rnd.nextInt(4)
      val wave = rnd.nextInt(waves)
      val straggle = rnd.nextDouble() < 0.07 && wave < waves - 1
      (1 to total).foreach { seq =>
        val w = if (straggle && seq == total) wave + 1 else wave
        buf += L(w, msisdn(acct, eventId), eventId, seq, total,
          (1 + rnd.nextInt(600)).toDouble)
      }
    }
    val byWave = buf.groupBy(_.wave)
    def writeWave(w: Int, name: String): Int = {
      val rows = byWave.getOrElse(w, Seq.empty)
      val tmp = java.nio.file.Paths.get(base, s"$name.tmp")
      val pw = new java.io.PrintWriter(tmp.toFile)
      pw.println("msisdn,event_id,seq,total,duration_sec")
      rows.foreach(l => pw.println(s"${l.m},${l.e},${l.seq},${l.total},${l.dur}"))
      pw.close()
      java.nio.file.Files.move(tmp,
        java.nio.file.Paths.get(s"$base/raw", s"$name.csv"),
        java.nio.file.StandardCopyOption.ATOMIC_MOVE)
      rows.size
    }

    def buildStages(runner: PipelineRunner): Seq[String] = {
      runner.register(LiveRatingChain.preratingStage(spark, s"$base/raw",
        ranges, s"$base/prerated", s"$base/ckpt", maxFilesPerTrigger = 8))
      runner.register(HardenedIngest.stageFromPrerated(spark,
        s"$base/prerated", s"$base/legs", s"$base/ledger", s"$base/ckpt"))
      val std = LiveRatingChain.stages(spark, "/unused", s"$base/legs",
        s"$base/calls", s"$base/rated", s"$base/ckpt", tiers)
      runner.register(std(1).copy(source = s => s.readStream
        .schema(HardenedIngest.hardenedLegsSchema)
        .parquet(s"$base/legs").drop("batch_id")))
      runner.register(std(2))
      Seq("prerating", "cdr_ingest", "leg_assembly", "rating")
    }

    def runWaves(from: Int, until: Int, runner: PipelineRunner): Unit = {
      val names = buildStages(runner)
      val qs = names.map(runner.start)
      (from until until).foreach { w =>
        val n = writeWave(w, s"wave_$w")
        val t0 = System.nanoTime()
        // ONE ordered pass: each stage blocks until its input is fully
        // drained, and the stages are registered upstream-first
        qs.foreach(_.processAllAvailable())
        val dt = (System.nanoTime() - t0) / 1e9
        println(f"fulltopo wave=$w legs=$n wall=$dt%.2fs " +
          f"(${n / math.max(dt, 1e-9)}%.0f legs/s)")
      }
      // stragglers of cross-stage asynchrony before the kill
      qs.foreach(_.processAllAvailable())
      runner.stopAll()
    }

    val tAll = System.nanoTime()
    runWaves(0, 1, new PipelineRunner(spark))
    println("fulltopo: KILLED after wave 0; restarting from checkpoints")
    runWaves(1, waves, new PipelineRunner(spark))

    // ---- volume redelivery: wave 1's CONTENT under a new name --------
    val runner3 = new PipelineRunner(spark)
    val names3 = buildStages(runner3)
    val qs3 = names3.map(runner3.start)
    val legsBefore = spark.read
      .schema(HardenedIngest.hardenedLegsSchema)
      .parquet(s"$base/legs").count()
    val nDup = writeWave(1, "retry_wave_1")
    val tDup = System.nanoTime()
    (1 to 2).foreach(_ => qs3.foreach(_.processAllAvailable()))
    val dtDup = (System.nanoTime() - tDup) / 1e9
    runner3.stopAll()
    val legsAfter = spark.read
      .schema(HardenedIngest.hardenedLegsSchema)
      .parquet(s"$base/legs").count()
    println(f"fulltopo redelivery legs=$nDup wall=$dtDup%.2fs " +
      s"legs_store ${legsBefore} -> ${legsAfter} " +
      s"(${if (legsBefore == legsAfter) "DROPPED WHOLE" else "LEAKED"})")
    val wallAll = (System.nanoTime() - tAll) / 1e9

    // ---- verdicts ----------------------------------------------------
    val out = spark.read.parquet(s"$base/rated")
      .select(col("account_id").cast(LongType), col("event_id"))
    val nOut = out.count()
    val nDups = nOut - out.distinct().count()
    val streamed = LiveRatingChain.invoice(spark, s"$base/rated", taxes)
      .orderBy(col("account_id")).collect().map(_.toSeq).toSeq
    // batch twin from the RAW inbox (incl. the redelivered file): the
    // same normalize+guide arithmetic, dedup by (call, seq), complete
    // calls only, q239 invoice
    val raw = spark.read.schema(LiveRatingChain.rawCdrSchema)
      .option("header", "true").csv(s"$base/raw")
    val guided = graft.queries.PreratingQ.guideRanges(
      graft.queries.PreratingQ.normalizeMsisdn(raw, "msisdn"), ranges)
    val usage = guided.filter(col("account_id").isNotNull)
      .select(concat(col("account_id").cast(StringType), lit(":"),
          col("event_id").cast(StringType)).as("call_id"),
        col("seq"), col("total"), col("duration_sec"))
      .dropDuplicates("call_id", "seq")
      .groupBy(col("call_id"))
      .agg(sum(col("duration_sec")).as("dur"), max(col("total")).as("t"),
        count(lit(1)).as("n"))
      .filter(col("n") === col("t"))
      .select(
        split(col("call_id"), ":").getItem(1).cast(LongType).as("event_id"),
        split(col("call_id"), ":").getItem(0).cast(LongType).as("user_id"),
        split(col("call_id"), ":").getItem(1).cast(LongType)
          .cast(TimestampType).as("ts"),
        expr("CAST(round(dur) AS BIGINT)").as("units"))
    val batch = EventQ.invoiceRun(usage, col("units"), tiers, taxes)
      .orderBy(col("account_id")).collect().map(_.toSeq).toSeq
    val parity = streamed == batch
    println(f"fulltopo total legs=${buf.size} rated_calls=$nOut " +
      f"dups=$nDups wall=$wallAll%.2fs accounts=${streamed.size} " +
      s"batch_parity=${if (parity) "EXACT" else "MISMATCH"}")
    require(legsBefore == legsAfter, "redelivered wave leaked into legs")
    require(nDups == 0, "duplicate billing rows")
    require(parity, "streamed invoice != q239 batch over deduped raw legs")
    spark.stop()
  }
}
