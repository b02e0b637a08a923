package graft

import java.nio.file.{Files, Paths}


import graft.streaming.LiveRatingChain

/** Dev probe: packet-queue retention (round-11 verdict task 5). After a
  * month at production cadence a queue holds O(all packets ever); the
  * offset-listing work per trigger must follow the live BACKLOG, not
  * history. Consumes N tiny packets through the `packetqueue` source
  * with and without `archive=true`, then measures the per-trigger
  * listing surface (files the source must list + the wall of an
  * empty-queue drain) and proves restart offsets stay exact against the
  * archived prefix. Local-FS listings are cheap in absolute terms — the
  * number that matters at scale is ENTRIES LISTED per trigger (object
  * stores page list calls per 1000 entries). Results → SCALING.md.
  */
object PacketQueueProbe {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = core.GraftSession.builder(s"local[$cpus]", cpus.toInt)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val n = sys.env.getOrElse("SPARK_GRAFT_PKT_N", "10000").toInt

    for (archive <- Seq(false, true)) {
      val base = Files.createTempDirectory(s"graft_pktprobe_$archive")
        .toString
      Files.createDirectories(Paths.get(s"$base/data"))
      Files.createDirectories(Paths.get(s"$base/queue"))
      // one shared data file; n packets pointing at it
      Files.write(Paths.get(s"$base/data/f.csv"),
        "call_id,seq,total,duration_sec\n1:1,1,1,10.0".getBytes("UTF-8"))
      (0 until n).foreach { i =>
        Files.write(Paths.get(f"$base/queue/p$i%08d.pkt"),
          s"s=1\nf=$base/data/f.csv".getBytes("UTF-8"))
      }
      def start() = spark.readStream.format("packetqueue")
        .schema(LiveRatingChain.legSchema)
        .option("path", s"$base/queue")
        .option("archive", archive.toString)
        .load()
        .writeStream.format("noop")
        .option("checkpointLocation", s"$base/ckpt")
        .outputMode("append").start()

      val t0 = System.nanoTime()
      val q = start()
      q.processAllAvailable()
      val consumeWall = (System.nanoTime() - t0) / 1e9
      // land one more packet so a commit fires and the prefix archives,
      // then measure the empty-drain (pure listing) wall
      Files.write(Paths.get(f"$base/queue/p$n%08d.pkt"),
        s"s=1\nf=$base/data/f.csv".getBytes("UTF-8"))
      q.processAllAvailable()
      val t1 = System.nanoTime()
      (1 to 20).foreach(_ => q.processAllAvailable())
      val drainWall = (System.nanoTime() - t1) / 1e9
      val liveEntries = Files.list(Paths.get(s"$base/queue")).count()
      q.stop()

      // restart: offsets exact, nothing reprocessed, a fresh packet flows
      Files.write(Paths.get(f"$base/queue/p${n + 1}%08d.pkt"),
        s"s=1\nf=$base/data/f.csv".getBytes("UTF-8"))
      val q2 = start()
      q2.processAllAvailable()
      q2.stop()
      val off = spark.read.text(s"$base/ckpt/offsets").count()
      println(f"pktqueue archive=$archive n=$n consume=$consumeWall%.1fs " +
        f"empty_drain_20=$drainWall%.3fs live_entries_after=$liveEntries " +
        f"offset_log_batches=$off restart=ok")
    }
    spark.stop()
  }
}
