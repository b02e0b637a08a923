package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

import graft.streaming.{LiveRatingChain, PipelineRunner, VersionedDim}

/** Dev probe: the round-11 live-dim prerating stage under volume. The
  * VersionedDimSpec proves the SEMANTICS (a mid-run port guides the
  * next batch, no restart); this measures the COST of per-batch dim
  * re-resolution at 2M raw CDRs / 50k ranges — the static stage
  * captures the dim once, the live stage lists the commit dir and
  * re-reads the 50k-row snapshot every micro-batch (validation is
  * cached per version by the store). A port lands between waves and
  * the probe checks the next wave's rows guided to the new owner and
  * carry the new guide_ver. Results → SCALING.md.
  */
object LiveDimProbe {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "16")
    val spark = core.GraftSession.builder(s"local[$cpus]", cpus.toInt)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val nCdrs = sys.env.getOrElse("SPARK_GRAFT_DIM_CDRS", "2000000").toInt
    val nAcct = sys.env.getOrElse("SPARK_GRAFT_DIM_ACCOUNTS", "50000").toInt
    val waves = 4
    val base = sys.env.getOrElse("SPARK_GRAFT_DIM_DIR", "/tmp/graft_dimprobe")
    val fs = new org.apache.hadoop.fs.Path(base)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.delete(new org.apache.hadoop.fs.Path(base), true)
    Seq("static", "live").foreach(v => java.nio.file.Files
      .createDirectories(java.nio.file.Paths.get(s"$base/$v/raw")))

    def ranges(portEvery: Long) = spark.range(1L, nAcct + 1L).toDF("a")
      .select(
        (lit(49100000000L) + col("a") * 100L).as("range_start"),
        (lit(49100000000L) + col("a") * 100L + 99L).as("range_end"),
        when(lit(portEvery) > 0L && col("a") % lit(portEvery) === 0L,
          col("a") + 1000000L).otherwise(col("a")).as("account_id"))

    def msisdn(acct: Long, e: Long): String = {
      val num = (49100000000L + acct * 100L + e % 100L).toString
      (e % 4L) match {
        case 0L => s"+$num"
        case 1L => s"00$num"
        case 2L => s"0${num.drop(2)}"
        case _ => num.drop(2)
      }
    }

    // synthesize the waves once (identical input for both variants)
    val rnd = new scala.util.Random(42L)
    val rows = (1 to nCdrs).map { e =>
      (rnd.nextInt(waves), msisdn(1L + rnd.nextInt(nAcct), e.toLong),
        e.toLong)
    }
    val byWave = rows.groupBy(_._1)
    def writeWave(variant: String, w: Int): Int = {
      val dir = java.nio.file.Paths.get(s"$base/$variant/raw")
      java.nio.file.Files.createDirectories(dir)
      val tmp = java.nio.file.Paths.get(base, s"$variant-$w.tmp")
      val pw = new java.io.PrintWriter(tmp.toFile)
      pw.println("msisdn,event_id,seq,total,duration_sec")
      val ws = byWave.getOrElse(w, Seq.empty)
      ws.foreach { case (_, m, e) => pw.println(s"$m,$e,1,1,60.0") }
      pw.close()
      java.nio.file.Files.move(tmp, dir.resolve(s"wave_$w.csv"),
        java.nio.file.StandardCopyOption.ATOMIC_MOVE)
      ws.size
    }

    // ---- variant A: static dim (round-10 preratingStage) -------------
    val runnerA = new PipelineRunner(spark)
    runnerA.register(LiveRatingChain.preratingStage(spark,
      s"$base/static/raw", ranges(0L), s"$base/static/prerated",
      s"$base/static/ckpt", maxFilesPerTrigger = 8))
    val qA = runnerA.start("prerating")
    var wallA = 0.0
    (0 until waves).foreach { w =>
      val n = writeWave("static", w)
      val t0 = System.nanoTime()
      qA.processAllAvailable()
      val dt = (System.nanoTime() - t0) / 1e9
      wallA += dt
      println(f"livedim static wave=$w cdrs=$n wall=$dt%.2fs")
    }
    runnerA.stopAll()

    // ---- variant B: live dim, port published after wave 1 ------------
    val dim = new VersionedDim(spark, s"$base/live/dim")
    dim.publish(ranges(0L))
    val runnerB = new PipelineRunner(spark)
    runnerB.register(LiveRatingChain.preratingStageLive(spark,
      s"$base/live/raw", dim, s"$base/live/prerated",
      s"$base/live/ckpt", maxFilesPerTrigger = 8))
    val qB = runnerB.start("prerating")
    var wallB = 0.0
    (0 until waves).foreach { w =>
      if (w == 2) {
        val t = System.nanoTime()
        dim.publish(ranges(100L)) // 1% of blocks port to new owners
        println(f"livedim PORT published (v2) in ${(System.nanoTime() - t) / 1e9}%.2fs")
      }
      val n = writeWave("live", w)
      val t0 = System.nanoTime()
      qB.processAllAvailable()
      val dt = (System.nanoTime() - t0) / 1e9
      wallB += dt
      println(f"livedim live   wave=$w cdrs=$n wall=$dt%.2fs")
    }
    runnerB.stopAll()

    // verification: post-port rows of ported blocks guide to +1000000
    // owners under guide_ver >= 2; pre-port rows kept the old owner
    val pre = spark.read.parquet(s"$base/live/prerated")
      .filter(col("guided").cast("boolean"))
      .select(split(col("call_id"), ":").getItem(0).cast(LongType)
        .as("acct"), col("guide_ver"))
    val portedNew = pre.filter(col("acct") > 1000000L).count()
    val portedOldEra = pre.filter(col("acct") > 1000000L &&
      col("guide_ver") === 1L).count()
    val guided = pre.count()
    println(f"livedim total static=$wallA%.1fs live=$wallB%.1fs " +
      f"overhead=${(wallB - wallA) / wallA * 100}%.0f%% " +
      f"guided=$guided ported_new_owner=$portedNew " +
      f"ported_under_v1=$portedOldEra (must be 0)")
    require(portedNew > 0L, "port never took effect")
    require(portedOldEra == 0L, "a v1-guided row carries a ported owner")
    spark.stop()
  }
}
