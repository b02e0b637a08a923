package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.queries.EventQ
import graft.streaming.{LiveRatingChain, PipelineRunner}

/** Dev probe: the composed live rating chain (ingest → LegAssembler →
  * MarginalRater → partitioned invoice store) at volume — the claims
  * under test are (1) per-stage cost is batch-sized (state lookups, one
  * exchange per stateful stage, never history-sized), (2) a mid-run
  * kill-and-restart loses nothing and double-bills nothing, and (3) the
  * streamed invoice is value-identical to the q239 batch invoice run
  * over the same legs at every scale.
  *
  * Protocol: `SPARK_GRAFT_CHAIN_LEGS` legs (default 200k) over
  * `SPARK_GRAFT_CHAIN_ACCOUNTS` accounts, 1-4 legs per call with ~7%
  * straggler calls whose last leg arrives one wave later (crossing a
  * wave boundary exercises cross-batch state), split into
  * `SPARK_GRAFT_CHAIN_WAVES` CSV waves; the topology is killed after
  * wave 1 and restarted. Prints per-wave wall seconds, total rows, and
  * the parity verdict. Results → SCALING.md.
  */
object LiveRatingChainProbe {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = core.GraftSession.builder(s"local[$cpus]", cpus.toInt)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")

    val nLegs = sys.env.getOrElse("SPARK_GRAFT_CHAIN_LEGS", "200000").toInt
    val nAcct = sys.env.getOrElse("SPARK_GRAFT_CHAIN_ACCOUNTS", "5000").toInt
    val waves = sys.env.getOrElse("SPARK_GRAFT_CHAIN_WAVES", "4").toInt
    val base = sys.env.getOrElse("SPARK_GRAFT_CHAIN_DIR", "/tmp/graft_chainprobe")
    val fs = new org.apache.hadoop.fs.Path(base)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.delete(new org.apache.hadoop.fs.Path(base), true)
    val (inbox, legs, calls, rated, ckpt) =
      (s"$base/inbox", s"$base/legs", s"$base/calls", s"$base/rated",
        s"$base/ckpt")

    val tiers = Seq((0L, 5000L, 5L), (5000L, 20000L, 3L),
      (20000L, Long.MaxValue, 1L))
    val taxes = Seq(("fed", 100000L, false), ("muni", 50000L, true),
      ("reg", 15000L, true))

    // ---- synthesize legs: calls of 1-4 legs, integral durations; ~7%
    // of calls hold their LAST leg back one wave (cross-wave state) ----
    val rnd = new scala.util.Random(42L)
    final case class L(wave: Int, callId: String, seq: Int, total: Int,
      dur: Double)
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
        buf += L(w, s"$acct:$eventId", seq, total,
          (1 + rnd.nextInt(600)).toDouble)
      }
    }
    val legsByWave = buf.groupBy(_.wave)
    new java.io.File(inbox).mkdirs()
    def writeWave(w: Int): Int = {
      val rows = legsByWave.getOrElse(w, Seq.empty)
      // write-then-ATOMIC-rename into the watched inbox: a file written
      // in place is listed by the live source MID-write and marked
      // processed at its then-current length — the rest of the file is
      // silently never read (measured: 44% leg loss at 2M legs). The
      // rename is the reference's own marker-file drop discipline.
      val tmp = java.nio.file.Paths.get(base, s"wave_$w.csv.tmp")
      val pw = new java.io.PrintWriter(tmp.toFile)
      pw.println("call_id,seq,total,duration_sec")
      rows.foreach(l => pw.println(s"${l.callId},${l.seq},${l.total},${l.dur}"))
      pw.close()
      java.nio.file.Files.move(tmp,
        java.nio.file.Paths.get(inbox, s"wave_$w.csv"),
        java.nio.file.StandardCopyOption.ATOMIC_MOVE)
      rows.size
    }

    // SPARK_GRAFT_CHAIN_TAPS=1 registers the fraud tap (VelocityMonitor)
    // and the live trunk gauge (TrunkGauge) as 4th/5th consumers — the
    // multi-consumer fan-out cost and the gauge's batch parity are the
    // claims under test. The probe's waves are arrival-SHUFFLED (built to
    // stress assembly state), so the gauge runs with horizon/cap sized to
    // the whole span: this validates sweep CORRECTNESS under maximal
    // disorder; bounded-horizon is the production mode for time-ordered
    // feeds (collapse semantics pinned in StreamingSpec).
    val taps = sys.env.get("SPARK_GRAFT_CHAIN_TAPS").contains("1")
    val nTrunks = 50

    def runWaves(from: Int, until: Int, runner: PipelineRunner): Unit = {
      val names0 = LiveRatingChain.register(runner, spark, inbox, legs,
        calls, rated, ckpt, tiers)
      val names = if (!taps) names0 else {
        runner.register(LiveRatingChain.fraudStage(spark, legs,
          s"$base/alarms", ckpt, windowSec = 3600L, threshold = 10L))
        runner.register(LiveRatingChain.gaugeStage(spark, legs,
          s"$base/gauge", ckpt, trunks = nTrunks,
          horizonSec = Long.MaxValue / 4, maxDeltas = 1 << 22))
        names0 ++ Seq("fraud_tap", "trunk_gauge")
      }
      val qs = names.map(runner.start)
      (from until until).foreach { w =>
        val n = writeWave(w)
        val t0 = System.nanoTime()
        qs.foreach(_.processAllAvailable())
        val dt = (System.nanoTime() - t0) / 1e9
        val ratedRows = spark.read.parquet(rated).count()
        println(f"chain wave=$w legs=$n wall=$dt%.2fs " +
          f"rated_total=$ratedRows (${n / math.max(dt, 1e-9)}%.0f legs/s)")
      }
      // last-micro-batch physical plan per stage (for PLANS.md pinning)
      if (until == waves && sys.env.contains("SPARK_GRAFT_CHAIN_PLANS"))
        names.zip(qs).foreach { case (n, q) =>
          println(s"==== stage plan: $n ====")
          q.explain()
        }
      runner.stopAll()
    }

    val tAll = System.nanoTime()
    runWaves(0, 1, new PipelineRunner(spark))
    println("chain: KILLED after wave 0; restarting from checkpoints")
    runWaves(1, waves, new PipelineRunner(spark))
    val wallAll = (System.nanoTime() - tAll) / 1e9

    // ---- verdicts ----------------------------------------------------
    val out = spark.read.parquet(rated)
      .select(col("account_id").cast(LongType), col("event_id"))
    val nOut = out.count()
    val nDup = nOut - out.distinct().count()
    val streamed = LiveRatingChain.invoice(spark, rated, taxes)
      .orderBy(col("account_id")).collect().map(_.toSeq).toSeq
    val raw = spark.read.schema(LiveRatingChain.legSchema)
      .option("header", "true").csv(inbox)
    val usage = raw
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
    println(f"chain total legs=${buf.size} rated_calls=$nOut dups=$nDup " +
      f"wall=$wallAll%.2fs accounts=${streamed.size} " +
      s"batch_parity=${if (parity) "EXACT" else "MISMATCH"}")
    require(nDup == 0, "duplicate billing rows after restart")
    require(parity, "streamed invoice != q239 batch invoice run")

    // ---- tap verdicts: gauge final peaks vs the batch q257 sweep ------
    if (taps) {
      val gauge = spark.read.parquet(s"$base/gauge")
        .groupBy(col("trunk"))
        .agg(max(col("peak_concurrent")).as("peak"))
        .orderBy(col("trunk"))
        .collect().map(r => r.getString(0) -> r.getLong(1)).toSeq
      val trunkCalls = raw.select(
        concat(lit("T"), (split(col("call_id"), ":").getItem(0)
          .cast(LongType) % nTrunks).cast(StringType)).as("trunk"),
        split(col("call_id"), ":").getItem(1).cast(LongType)
          .as("start_sec"),
        (split(col("call_id"), ":").getItem(1).cast(LongType) +
          expr("CAST(round(duration_sec) AS BIGINT)")).as("end_sec"))
      val batchPeaks = graft.queries.RoutingQ.trunkPeaks(trunkCalls)
        .select(col("trunk"), col("peak_concurrent"))
        .orderBy(col("trunk"))
        .collect().map(r => r.getString(0) -> r.getLong(1)).toSeq
      val gaugeParity = gauge == batchPeaks
      val alarms = spark.read.parquet(s"$base/alarms").count()
      println(s"taps: trunks=${gauge.size} gauge_parity=" +
        s"${if (gaugeParity) "EXACT" else "MISMATCH"} fraud_alarms=$alarms")
      require(gaugeParity, "live gauge peaks != batch q257 sweep")
    }
    spark.stop()
  }
}
