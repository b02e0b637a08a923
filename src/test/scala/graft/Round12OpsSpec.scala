package graft

import java.nio.file.{Files, Paths}

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.etl.PacketCodec
import graft.queries.{AnalyticsQ, PreratingQ}
import graft.streaming.HardenedIngest

/** Round-12 robustness guards: the v1-ledger loud fail, the bounded
  * mixed-width conflict validation, the versioned archive manifest, the
  * producer-replay-tolerant archive commit, the packet-wire value
  * constraint, and the Theil–Sen pair budget.
  */
class Round12OpsSpec extends SparkSpec {

  import spark.implicits._

  private def write(path: String, body: String): Unit = {
    Files.createDirectories(Paths.get(path).getParent)
    Files.write(Paths.get(path), body.getBytes("UTF-8"))
  }

  private def legsCsv(rows: Seq[String]): String =
    ("call_id,seq,total,duration_sec" +: rows).mkString("\n")

  private def listNames(dir: String): Seq[String] =
    if (!Files.exists(Paths.get(dir))) Seq.empty
    else {
      val s = Files.list(Paths.get(dir))
      try s.iterator().asScala.map(_.getFileName.toString).toSeq
      finally s.close()
    }

  // ---- HardenedIngest: a v1 ledger (no hsum) fails the batch loudly ----

  test("a pre-upgrade v1 ledger kills the batch instead of silently " +
      "losing redelivery protection") {
    val base = Files.createTempDirectory("graft_v1ledger").toString
    // hand-write a v1 ledger: (digest, n_rows, batch_id) — no hsum.
    // Reading it with the v2 schema yields NULL hsum rows that the
    // triple anti-join could never match.
    Seq((123456789L, 2L, 0L)).toDF("digest", "n_rows", "batch_id")
      .write.partitionBy("batch_id").parquet(s"$base/ledger")
    val batch = Seq(("1:101", 1, 1, 100.0, s"$base/inbox/w1.csv"))
      .toDF("call_id", "seq", "total", "duration_sec", "__src")
      .withColumn("valid", lit(true))
    val e = intercept[IllegalArgumentException] {
      HardenedIngest.writeBatch(spark, batch, 1L, s"$base/legs",
        s"$base/ledger", None)
    }
    assert(e.getMessage.contains("NULL hsum"), e.getMessage)
    // nothing was written: the batch died before the legs store
    assert(!Files.exists(Paths.get(s"$base/legs")))
  }

  // ---- validateVersionedDim: bounded on mixed-width plans --------------

  test("versioned-dim conflict check stays bounded on a nationwide + " +
      "single-number mix and still catches cross-class overlap") {
    // ADVICE round-11 scenario: one ~5e8-wide allocation beside width-1
    // ported entries. Exploding ALL ranges at the narrow class's bucket
    // width would materialize a ~5e8-element sequence (OOM); the a-side
    // class restriction keeps every explode ≤ 2 buckets.
    val wide = Seq((49100000000L, 49599999999L, 0L, 4102444800L, 1L))
    val singles = (0 until 2000).map { i =>
      (49700000000L + i, 49700000000L + i, 0L, 4102444800L, 100L + i)
    }
    val clean = (wide ++ singles).toDF("range_start", "range_end",
      "valid_from_sec", "valid_to_sec", "account_id")
    // completes (and fast): no conflict in the clean plan
    assert(PreratingQ.validateVersionedDim(clean).count() == 2001L)

    // a single-number entry INSIDE the nationwide range with overlapping
    // validity — the cross-class pair the wider member's class must catch
    val conflicted = (wide ++ singles :+
      ((49300000005L, 49300000005L, 100L, 4102444800L, 999L)))
      .toDF("range_start", "range_end", "valid_from_sec", "valid_to_sec",
        "account_id")
    val e = intercept[IllegalArgumentException] {
      PreratingQ.validateVersionedDim(conflicted).count()
    }
    assert(e.getMessage.contains("double coverage"), e.getMessage)
  }

  // ---- packetqueue archive: versioned manifest, latest wins -----------

  test("archive manifest is versioned: latest wins after a crashed " +
      "sweep, and the legacy name is superseded") {
    val base = Files.createTempDirectory("graft_manifest").toString
    (1 to 4).foreach { i =>
      write(s"$base/data/f$i.csv", legsCsv(Seq(s"1:$i,1,1,$i.0")))
    }
    // pre-round-12 store state: p1 archived under the LEGACY manifest
    write(s"$base/queue/_consumed/p1.pkt", s"s=1\nf=$base/data/f1.csv")
    write(s"$base/queue/_consumed/_manifest", "1\np1.pkt")
    (2 to 3).foreach { i =>
      write(s"$base/queue/p$i.pkt", s"s=1\nf=$base/data/f$i.csv")
    }
    def start() = spark.readStream.format("packetqueue")
      .schema(graft.streaming.LiveRatingChain.legSchema)
      .option("path", s"$base/queue").option("root", s"$base/data")
      .option("archive", "true")
      .load()
      .writeStream.format("parquet")
      .option("path", s"$base/out")
      .option("checkpointLocation", s"$base/ckpt")
      .outputMode("append").start()
    // seed the checkpoint at the archived offset the legacy manifest
    // claims: a fresh checkpoint starts at 0 and must fail loudly, so
    // consume from a checkpoint whose offsets we build by running once
    val q1 = start()
    try {
      val e = intercept[Exception] { q1.processAllAvailable() }
      assert(String.valueOf(e.getMessage).contains("archived prefix") ||
        String.valueOf(e.getCause).contains("archived prefix"),
        s"legacy manifest not honored: $e")
    } finally q1.stop()

    // a fresh queue from scratch: run, archive, then simulate a crashed
    // sweep by resurrecting an OLDER versioned manifest beside the new
    // one — the reader must resolve the latest and restart exactly
    val b2 = Files.createTempDirectory("graft_manifest2").toString
    (1 to 4).foreach { i =>
      write(s"$b2/data/f$i.csv", legsCsv(Seq(s"1:$i,1,1,$i.0")))
      write(s"$b2/queue/p$i.pkt", s"s=1\nf=$b2/data/f$i.csv")
    }
    def start2() = spark.readStream.format("packetqueue")
      .schema(graft.streaming.LiveRatingChain.legSchema)
      .option("path", s"$b2/queue").option("root", s"$b2/data")
      .option("archive", "true")
      .load()
      .writeStream.format("parquet")
      .option("path", s"$b2/out")
      .option("checkpointLocation", s"$b2/ckpt")
      .outputMode("append").start()
    val q2 = start2()
    try {
      q2.processAllAvailable()
      // commit fires when the NEXT batch runs
      write(s"$b2/data/f5.csv", legsCsv(Seq("1:5,1,1,5.0")))
      write(s"$b2/queue/p5.pkt", s"s=1\nf=$b2/data/f5.csv")
      q2.processAllAvailable()
    } finally q2.stop()
    val manifests = listNames(s"$b2/queue/_consumed")
      .filter(_.startsWith("_manifest."))
    assert(manifests.nonEmpty, "no versioned manifest")
    // resurrect a STALE older manifest (the crashed-sweep window state:
    // two manifests present) — latest must win on restart
    write(s"$b2/queue/_consumed/_manifest.1", "1\np1.pkt")
    write(s"$b2/data/f6.csv", legsCsv(Seq("1:6,1,1,6.0")))
    write(s"$b2/queue/p6.pkt", s"s=1\nf=$b2/data/f6.csv")
    val q3 = start2()
    try {
      q3.processAllAvailable()
      val out = spark.read.parquet(s"$b2/out")
        .select(col("call_id")).as[String].collect().sorted.toSeq
      assert(out == Seq("1:1", "1:2", "1:3", "1:4", "1:5", "1:6"),
        s"stale manifest perturbed offsets: $out")
    } finally q3.stop()
  }

  test("archive commit tolerates a producer-replayed already-archived " +
      "packet (drops the queue-side duplicate, never wedges)") {
    val base = Files.createTempDirectory("graft_dupaarch").toString
    (1 to 2).foreach { i =>
      write(s"$base/data/f$i.csv", legsCsv(Seq(s"1:$i,1,1,$i.0")))
      write(s"$base/queue/p$i.pkt", s"s=1\nf=$base/data/f$i.csv")
    }
    def start() = spark.readStream.format("packetqueue")
      .schema(graft.streaming.LiveRatingChain.legSchema)
      .option("path", s"$base/queue").option("root", s"$base/data")
      .option("archive", "true")
      .load()
      .writeStream.format("parquet")
      .option("path", s"$base/out")
      .option("checkpointLocation", s"$base/ckpt")
      .outputMode("append").start()
    val q1 = start()
    try {
      q1.processAllAvailable()
      // commit lags one batch: push p3 through so [p1,p2] archive
      write(s"$base/data/f3.csv", legsCsv(Seq("1:3,1,1,3.0")))
      write(s"$base/queue/p3.pkt", s"s=1\nf=$base/data/f3.csv")
      q1.processAllAvailable()
      assert(listNames(s"$base/queue/_consumed").contains("p1.pkt"))

      // producer replay window: the same-named packet reappears in the
      // queue although its archived copy exists. The next commit must
      // classify it as a straggler and DELETE it (the archived copy is
      // the durable record) — renaming onto the existing name would
      // wedge the consumer on HDFS forever.
      write(s"$base/queue/p1.pkt", s"s=1\nf=$base/data/f1.csv")
      write(s"$base/data/f4.csv", legsCsv(Seq("1:4,1,1,4.0")))
      write(s"$base/queue/p4.pkt", s"s=1\nf=$base/data/f4.csv")
      q1.processAllAvailable()
      // one more batch so the straggler-bearing commit definitely ran
      write(s"$base/data/f5.csv", legsCsv(Seq("1:5,1,1,5.0")))
      write(s"$base/queue/p5.pkt", s"s=1\nf=$base/data/f5.csv")
      q1.processAllAvailable()
      val out = spark.read.parquet(s"$base/out")
        .select(col("call_id")).as[String].collect().sorted.toSeq
      assert(out == Seq("1:1", "1:2", "1:3", "1:4", "1:5"),
        s"replayed packet double-delivered or wedged: $out")
      assert(!listNames(s"$base/queue").contains("p1.pkt"),
        "queue-side duplicate not swept")

      // a same-named packet with DIFFERENT content is NOT a benign
      // replay (a reset producer reusing consumed batch ids): it must
      // be QUARANTINED loudly — neither silently dropped (data loss)
      // nor left in place (a straggler that would wedge every commit)
      write(s"$base/queue/p2.pkt", s"s=1\nf=$base/data/DIFFERENT.csv")
      write(s"$base/data/f6.csv", legsCsv(Seq("1:6,1,1,6.0")))
      write(s"$base/queue/p6.pkt", s"s=1\nf=$base/data/f6.csv")
      q1.processAllAvailable()
      write(s"$base/data/f7.csv", legsCsv(Seq("1:7,1,1,7.0")))
      write(s"$base/queue/p7.pkt", s"s=1\nf=$base/data/f7.csv")
      q1.processAllAvailable()
      assert(listNames(s"$base/queue/_conflict") == Seq("p2.pkt"),
        s"conflicting packet not quarantined: " +
          listNames(s"$base/queue/_conflict"))
      val out2 = spark.read.parquet(s"$base/out")
        .select(col("call_id")).as[String].collect().sorted.toSeq
      assert(out2 == Seq("1:1", "1:2", "1:3", "1:4", "1:5", "1:6", "1:7"),
        s"conflict wedged or corrupted the stream: $out2")
    } finally q1.stop()
  }

  // ---- packet wire constraint ------------------------------------------

  test("serializeLocal fails loudly on values the wire cannot carry") {
    intercept[IllegalArgumentException] {
      PacketCodec.serializeLocal(Map("s" -> "line1\nline2"))
    }
    intercept[IllegalArgumentException] {
      PacketCodec.serializeLocal(Map("ss" -> "two-char key"))
    }
    // the happy path is unchanged (sorted, round-trips)
    assert(PacketCodec.serializeLocal(Map("f" -> "a.dat", "s" -> "1")) ==
      "f=a.dat\ns=1")
  }

  // ---- readability hand cases -------------------------------------------

  test("readabilityCard: hand-computed grade, fragment, and empty doc") {
    val docs = Seq(
      (1L, "The cat sat. The dog ran!"), // 6 words, 2 sentences, 6 syll
      (2L, "no terminal punctuation here"), // fragment: 1 sentence
      (3L, "")) // empty: NULL grade, never dropped
      .toDF("doc_id", "text")
    val out = graft.queries.TextQ.readabilityCard(docs)
      .orderBy(col("doc_id"))
      .collect()
    // doc 1: 390*6/2 + 11800*6/6 - 15590 = 1170 + 11800 - 15590 = -2620
    assert(out(0).getLong(1) == 6L && out(0).getLong(2) == 2L &&
      out(0).getLong(3) == 6L && out(0).getLong(4) == -2620L,
      out(0).toString)
    // doc 2: 4 words / 1 sentence; syllables: no=1, ter-mi-nal≈vowel
    // runs (e,i,a)=3, punc-tu-a-tion≈(u,ua,io)=3, here≈(e,e)=2 → 9
    assert(out(1).getLong(2) == 1L && out(1).getLong(3) == 9L,
      out(1).toString)
    assert(out(2).getLong(1) == 0L && out(2).isNullAt(4), out(2).toString)
  }

  test("bhFdrGate: the step-up rejects through the largest qualifying " +
      "rank, not just individually-passing tests") {
    // m=5, α=40%: sorted p = 300,350,360,395,400 (milli).
    // Individually NO rank 1..4 qualifies (p·m > i·α: 1500>400,
    // 1750>800, 1800>1200, 1975>1600) but i=5 does (2000 ≤ 2000) — the
    // step-up must reject ALL FIVE. An implementation that only flags
    // individually-passing rows (no largest-k sweep) rejects nothing.
    val tests = Seq(("a", 300L), ("b", 350L), ("c", 360L), ("d", 395L),
      ("e", 400L)).toDF("id", "p_milli")
    val out = graft.queries.AnalyticsQ.bhFdrGate(tests, Seq("id"),
      alphaMilli = 400L)
      .select(col("id"), col("rejected")).as[(String, Boolean)]
      .collect().toMap
    assert(out == Map("a" -> true, "b" -> true, "c" -> true,
      "d" -> true, "e" -> true), out.toString)
    // a NULL p fails loudly instead of silently shifting every rank
    val e = intercept[IllegalArgumentException] {
      graft.queries.AnalyticsQ.bhFdrGate(
        Seq(("a", Some(10L)), ("b", None))
          .toDF("id", "p_milli"), Seq("id"))
    }
    assert(e.getMessage.contains("p_milli"), e.getMessage)
  }

  // ---- Theil–Sen pair budget --------------------------------------------

  test("theilSenSlope fails loudly above the pair budget and names the " +
      "group") {
    // second-grain x over a "year": 3000 distinct abscissae = ~4.5M
    // pairs per group, over a budget of 1M
    val fine = spark.range(0L, 3000L)
      .select(lit("cpu").as("g"), col("id").as("x"),
        (col("id") % 97L).as("y"))
    val e = intercept[IllegalArgumentException] {
      AnalyticsQ.theilSenSlope(fine, "g", "x", "y",
        maxSlopePairs = 1000000L).collect()
    }
    assert(e.getMessage.contains("pair budget") &&
      e.getMessage.contains("cpu"), e.getMessage)
    // a deliberate budget raise runs it
    val ok = AnalyticsQ.theilSenSlope(fine.filter(col("x") < 100L),
      "g", "x", "y", maxSlopePairs = 1000000L).collect()
    assert(ok.length == 1)
  }
}
