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
    val plan = guarded.queryExecution.executedPlan.toString
    assert(!plan.contains("Window") || guarded.count() == 0, plan)
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
