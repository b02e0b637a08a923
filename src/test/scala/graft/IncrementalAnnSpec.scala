package graft

import java.nio.file.Files

import graft.etl.IncrementalAnn

/** Bucket-indexed incremental vector store: a delta batch finds its
  * cosine neighbors against all of history via the store (norms carried
  * on store rows, never recomputed), history grows with appends, hot
  * buckets are guarded, and the streaming sink is retry-idempotent.
  */
class IncrementalAnnSpec extends SparkSpec {

  import spark.implicits._

  private def vec(xs: Double*): Seq[Float] =
    (xs ++ Seq.fill(8 - xs.length)(0.0)).map(_.toFloat)

  // bucket (bits=3) = sign bits of the first 3 components
  private val aAxis = vec(1.0, 1.0, 1.0)    // bucket 7
  private val aNear = vec(1.0, 1.0, 0.5)    // bucket 7
  private val bAxis = vec(-1.0, 1.0, 1.0)   // bucket 3

  test("delta finds neighbors in history; appends extend it") {
    val store = Files.createTempDirectory("graft_vstore").toString + "/vecs"
    IncrementalAnn.initStore(
      Seq((1L, aAxis), (2L, bAxis)).toDF("vec_id", "embedding"), store)
    assert(spark.read.parquet(store).count() == 2)

    // delta: vec 10 lands in bucket 7 -> matches corpus vec 1 only
    val deltaA = Seq((10L, aNear)).toDF("vec_id", "embedding")
    val hitsA = IncrementalAnn.deltaNeighbors(spark, deltaA, store,
        bits = 3, k = 3)
      .as[(Long, Long, Double, Long)].collect()
    assert(hitsA.map(r => (r._1, r._2, r._4)).toSeq == Seq((10L, 1L, 1L)),
      hitsA.toSeq.toString)
    assert(hitsA.head._3 > 0.9 && hitsA.head._3 < 1.0)

    // history grows: after appending delta A, its vector is findable
    IncrementalAnn.append(deltaA, store, batchId = 1L)
    val hitsB = IncrementalAnn.deltaNeighbors(spark,
        Seq((20L, aAxis)).toDF("vec_id", "embedding"), store,
        bits = 3, k = 3)
      .as[(Long, Long, Double, Long)].collect().sortBy(_._4)
    assert(hitsB.map(_._2).toSeq == Seq(1L, 10L), hitsB.toSeq.toString)
    assert(spark.read.parquet(store).count() == 3)
  }

  test("hot store buckets are excluded by the guard, not window-shuffled") {
    val store = Files.createTempDirectory("graft_vstore_skew").toString + "/vecs"
    val crowd = (1L to 30L).map(i => (i, aAxis)).toDF("vec_id", "embedding")
    IncrementalAnn.initStore(crowd, store)
    val delta = Seq((100L, aNear)).toDF("vec_id", "embedding")
    assert(IncrementalAnn.deltaNeighbors(spark, delta, store,
      bits = 3, k = 100).count() == 30)
    val guarded = IncrementalAnn.deltaNeighbors(delta,
      spark.read.parquet(store), bits = 3, k = 100, maxBucketSize = 10)
    assert(guarded.count() == 0)
    // the guard itself (hot-bucket detection) is an aggregate + a
    // BROADCAST anti-join — never a window over store rows. Verify the
    // plan shape on an unguarded-but-nonempty run, where the one
    // legitimate window appears partitioned by the DELTA's new_id (k
    // ranking), and the anti-join side is a broadcast:
    val open = IncrementalAnn.deltaNeighbors(delta,
      spark.read.parquet(store), bits = 3, k = 100)
    assert(open.count() == 30)
    val openPlan = open.queryExecution.executedPlan.toString
    assert(openPlan.contains("Window"), openPlan)
    assert(openPlan.contains("partitionspec=[new_id") ||
      openPlan.contains("windowspecdefinition(new_id"), openPlan)
    assert(openPlan.contains("BroadcastHashJoin") &&
      openPlan.contains("LeftAnti"), openPlan)
  }

  test("store records its bits; a mismatched query fails loudly") {
    val store = Files.createTempDirectory("graft_vbits").toString + "/vecs"
    IncrementalAnn.initStore(
      Seq((1L, aAxis)).toDF("vec_id", "embedding"), store, bits = 3)
    assert(IncrementalAnn.storedBits(spark.read.parquet(store))
      .contains(3))
    // querying with different bits would silently bucket-mismatch and
    // miss every neighbor in history — it must throw instead
    val e = intercept[IllegalArgumentException] {
      IncrementalAnn.deltaNeighbors(spark,
        Seq((9L, aNear)).toDF("vec_id", "embedding"), store,
        bits = 4, k = 3).count()
    }
    assert(e.getMessage.contains("bits=3"), e.getMessage)
    // and so must an append that would mix bucketings in one store
    val e2 = intercept[IllegalArgumentException] {
      IncrementalAnn.append(
        Seq((9L, aNear)).toDF("vec_id", "embedding"), store,
        batchId = 1L, bits = 4)
    }
    assert(e2.getMessage.contains("bits=3"), e2.getMessage)
  }

  test("rebuild re-buckets history at newBits and swaps atomically") {
    val store = Files.createTempDirectory("graft_vrebuild").toString + "/vecs"
    IncrementalAnn.initStore(
      Seq((1L, aAxis), (2L, bAxis)).toDF("vec_id", "embedding"),
      store, bits = 1)
    IncrementalAnn.append(Seq((3L, aNear)).toDF("vec_id", "embedding"),
      store, batchId = 1L, bits = 1)
    // at bits=1 vectors 1/3 (+x) and 2 (-x... actually bAxis starts -1)
    // share fewer sign bits; query results before the rebuild:
    val before = IncrementalAnn.deltaNeighbors(spark,
        Seq((20L, aAxis)).toDF("vec_id", "embedding"), store,
        bits = 1, k = 10)
      .as[(Long, Long, Double, Long)].collect().map(r => (r._2, r._3)).toSet
    IncrementalAnn.rebuild(spark, store, newBits = 3)
    val after = spark.read.parquet(store)
    assert(IncrementalAnn.storedBits(after).contains(3))
    // history is intact: same rows, same batch partitions, same norms
    assert(after.count() == 3)
    assert(after.select("batch_id").distinct().as[Long].collect().toSet
      == Set(-1L, 1L))
    // deltaNeighbors at the new bits returns the same neighbor set for
    // a query whose bucket membership is unchanged by widening (all
    // candidates share sign on the first 3 dims)
    val got = IncrementalAnn.deltaNeighbors(spark,
        Seq((20L, aAxis)).toDF("vec_id", "embedding"), store,
        bits = 3, k = 10)
      .as[(Long, Long, Double, Long)].collect().map(r => (r._2, r._3)).toSet
    assert(got == before.filter { case (id, _) => id != 2L } || got == before,
      s"before=$before after=$got")
    assert(got.map(_._1).contains(1L) && got.map(_._1).contains(3L))
    // old bits now rejected
    intercept[IllegalArgumentException] {
      IncrementalAnn.deltaNeighbors(spark,
        Seq((21L, aAxis)).toDF("vec_id", "embedding"), store,
        bits = 1, k = 10).count()
    }
    // idempotence: a COMPLETED temp left by a crashed run (store already
    // deleted) is finished by a re-run — simulate the crash window
    val fsPath = new org.apache.hadoop.fs.Path(store)
    val fs = fsPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.rename(fsPath, new org.apache.hadoop.fs.Path(store + ".rebuild.tmp"))
    IncrementalAnn.rebuild(spark, store, newBits = 3)
    assert(spark.read.parquet(store).count() == 3)
    assert(IncrementalAnn.storedBits(spark.read.parquet(store)).contains(3))
  }

  test("streaming sink searches history per batch; retries are idempotent") {
    implicit val ctx = spark.sqlContext
    val dir = Files.createTempDirectory("graft_vstream").toString
    val store = s"$dir/store"
    val out = s"$dir/neighbors"
    val sinkFn = IncrementalAnn.sink(spark, store, out, bits = 3, k = 3)
    // batch 0: empty history -> no neighbor data files yet (an empty DF
    // under dynamic partition overwrite touches no partition — the
    // IncrementalDedup.sink convention), store seeded
    sinkFn(Seq((1L, aAxis)).toDF("vec_id", "embedding"), 0L)
    val outDir = new java.io.File(out)
    assert(!outDir.exists() ||
      outDir.listFiles().forall(f => !f.getName.startsWith("batch_id=")))
    assert(spark.read.parquet(store).count() == 1)
    // batch 1: finds batch 0's vector
    sinkFn(Seq((2L, aNear)).toDF("vec_id", "embedding"), 1L)
    val n1 = spark.read.parquet(out)
      .select("new_id", "corpus_id").as[(Long, Long)].collect().toSet
    assert(n1 == Set((2L, 1L)), n1.toString)
    // RETRY of batch 1 replaces its own partitions byte-identically:
    // no duplicate store rows, no self-match through the half-written
    // partition, same neighbor verdicts
    sinkFn(Seq((2L, aNear)).toDF("vec_id", "embedding"), 1L)
    assert(spark.read.parquet(store).count() == 2)
    val n2 = spark.read.parquet(out)
      .select("new_id", "corpus_id").as[(Long, Long)].collect().toSet
    assert(n2 == Set((2L, 1L)), n2.toString)
  }
}
