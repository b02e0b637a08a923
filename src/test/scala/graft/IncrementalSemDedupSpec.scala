package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.etl.IncrementalSemDedup
import graft.queries.VectorQ

/** Incremental SEMANTIC dedup: a delta wave answers "cosine ≥ τ vs
  * ANYTHING in history" at cell-collision cost under the store's fixed
  * centroids — cross-history hits, clean fresh docs, retry idempotence,
  * and the derived census EXACTLY equal to batch semDedup on the union.
  */
class IncrementalSemDedupSpec extends SparkSpec {

  import spark.implicits._

  private val tau = 0.5

  // bootstrap: ids 0/1 are the seeds (two near-orthogonal directions);
  // id 2 is a near-dup of 0's direction, id 3 lives alone in cell 1
  private def boot = Seq(
    (0L, Array(1f, 0f, 0f, 0f)),
    (1L, Array(0f, 1f, 0f, 0f)),
    (2L, Array(0.9f, 0.1f, 0f, 0f)),
    (3L, Array(0f, 0.9f, 0.6f, 0f))).toDF("vec_id", "embedding")

  // delta 1: id 10 is a cross-HISTORY near-dup (of 0 and 2); id 11 is
  // fresh (orthogonal to everything in its cell at τ=0.5)
  private def delta1 = Seq(
    (10L, Array(0.95f, 0.05f, 0f, 0f)),
    (11L, Array(0f, 0f, 0f, 1f))).toDF("vec_id", "embedding")

  // delta 2: id 20 near-dups id 10 — history that itself arrived as a
  // DELTA, proving the store accumulates
  private def delta2 = Seq(
    (20L, Array(0.97f, 0.03f, 0f, 0f))).toDF("vec_id", "embedding")

  test("delta waves hit history (including prior deltas), leave fresh " +
      "docs clean, retry idempotently, and derive the exact batch census") {
    val base = Files.createTempDirectory("graft_semstore").toString
    val store = s"$base/store"
    val pairs = s"$base/pairs"
    // the bootstrap is RAW, so its own intra pairs seed the pairs store
    // (0↔2 share a direction; 1↔3 are within τ in cell 1)
    IncrementalSemDedup.initStore(boot, store, cells = 2,
      pairsPath = Some(pairs), threshold = tau)
    val sink = IncrementalSemDedup.sink(spark, store, pairs, tau)
    val bootPairs = Set((0L, 2L), (1L, 3L))
    def pairSet() = spark.read.parquet(pairs)
      .select(col("lo_id"), col("hi_id")).as[(Long, Long)]
      .collect().toSet
    assert(pairSet() == bootPairs, pairSet().toString)

    sink(delta1, 0L)
    // cross-history hits: 10 pairs with BOTH 0 and 2; fresh 11 nowhere
    assert(pairSet() == bootPairs ++ Set((0L, 10L), (2L, 10L)),
      pairSet().toString)

    // idempotent retry: the same batch replays (repartitioned) — the
    // store must hold ONE copy of its members and the pairs must not
    // double (a self-match through the half-written partition would
    // also show up here)
    sink(delta1.repartition(3), 0L)
    assert(pairSet() == bootPairs ++ Set((0L, 10L), (2L, 10L)),
      pairSet().toString)
    val members = spark.read.parquet(s"$store/members")
    assert(members.filter(col("vec_id") === 10L).count() == 1L)

    // a second delta near-dups a member that ARRIVED as a delta
    sink(delta2, 1L)
    assert(pairSet() == bootPairs ++ Set((0L, 10L), (2L, 10L), (0L, 20L),
      (2L, 20L), (10L, 20L)), pairSet().toString)

    // the derived census ≡ batch semDedup on the UNION (same centroids:
    // the bootstrap holds the union's lowest ids)
    val derived = IncrementalSemDedup.verdicts(
        spark.read.parquet(s"$store/members"),
        spark.read.parquet(pairs))
      .select(col("vec_id"), col("cluster"), col("keep"))
      .as[(Long, Long, Boolean)].collect().toSet
    val batch = VectorQ.semDedup(boot.union(delta1).union(delta2),
        cells = 2, threshold = tau)
      .select(col("vec_id"), col("cluster"), col("keep"))
      .as[(Long, Long, Boolean)].collect().toSet
    assert(derived == batch, s"derived $derived vs batch $batch")
    // and the policy did its job: in the {0,2,10,20} near-dup group the
    // FARTHEST-from-centroid member (2, dist² 0.02) survives; 3 beats 1
    // the same way in cell 1; fresh 11 stands alone
    val kept = derived.filter(_._3).map(_._1)
    assert(kept == Set(2L, 3L, 11L), kept.toString)
  }

  test("rebuild re-clusters the store (the √n lever) and recovers from " +
      "a crash between delete and swap") {
    val base = Files.createTempDirectory("graft_semrebuild").toString
    val store = s"$base/store"
    // two seed directions; v10/v11 are COSINE near-dups but land in
    // DIFFERENT cells (each hugs its own centroid), so the 2-cell store
    // can never pair them
    val boot = Seq(
      (0L, Array(1f, 0f, 0f)),
      (1L, Array(0f, 1f, 0f)),
      (10L, Array(0.75f, 0.70f, 0f)),
      (11L, Array(0.70f, 0.75f, 0f))).toDF("vec_id", "embedding")
    IncrementalSemDedup.initStore(boot, store, cells = 2)
    val members0 = spark.read.parquet(s"$store/members")
    assert(members0.select(col("cluster")).distinct().count() == 2L)

    // rebuild to ONE cell: everything co-locates; batch partitions and
    // member count survive the swap
    IncrementalSemDedup.rebuild(spark, store, newCells = 1)
    val members1 = spark.read.parquet(s"$store/members")
    assert(members1.count() == 4L)
    assert(members1.select(col("cluster")).distinct().count() == 1L)
    assert(spark.read.parquet(s"$store/cells").count() == 1L)
    // a fresh delta near the v10/v11 direction now pairs with BOTH —
    // the old cells would have hidden one of them
    val probe = Seq((20L, Array(0.72f, 0.72f, 0f)))
      .toDF("vec_id", "embedding")
    val hits = IncrementalSemDedup.deltaPairs(probe,
        spark.read.parquet(s"$store/cells"), members1, threshold = 0.9)
      .select(col("lo_id")).as[Long].collect().toSet
    assert(Set(10L, 11L).subsetOf(hits), hits.toString)

    // crash recovery: simulate "temp complete, store already deleted"
    // (the window between delete(dst) and the rename) — re-running the
    // rebuild must complete the swap, not wedge
    val fs = new org.apache.hadoop.fs.Path(store)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val tmp = new org.apache.hadoop.fs.Path(store + ".rebuild.tmp")
    assert(fs.rename(new org.apache.hadoop.fs.Path(store), tmp))
    fs.create(new org.apache.hadoop.fs.Path(tmp, "_REBUILT"), true).close()
    IncrementalSemDedup.rebuild(spark, store, newCells = 1)
    assert(spark.read.parquet(s"$store/members").count() == 4L)
    assert(!fs.exists(tmp), "completed temp must be swapped in")
  }

  test("a store without centroids fails loudly — ad-hoc cells would " +
      "silently miss cross-batch near-dups") {
    val base = Files.createTempDirectory("graft_semnocells").toString
    val e = intercept[IllegalArgumentException] {
      IncrementalSemDedup.sink(spark, s"$base/store", s"$base/pairs",
        tau)(delta1, 0L)
    }
    assert(e.getMessage.contains("initStore"), e.getMessage)
  }

  test("the int8 qv prefilter changes cost, not the contract: " +
      "identical pairs and verdicts at margin 0.1 on the real fixture, " +
      "and the store's qv column family survives append and rebuild") {
    // the REAL 64-dim fixture geometry (measured max |cos8 - cos| =
    // 0.006, so 0.1 carries 16x headroom), split into bootstrap + delta
    val emb = graft.core.Tables.load(spark, sfDir, "embeddings")
      .select(col("vec_id"), col("embedding"))
    val hist = emb.filter(col("vec_id") < 250L)
    val delta = emb.filter(col("vec_id") >= 250L)
    def run(storeQv: Boolean, margin: Double) = {
      val base = Files.createTempDirectory("graft_semqv").toString
      IncrementalSemDedup.initStore(hist, s"$base/store", cells = 4,
        pairsPath = Some(s"$base/pairs"), threshold = 0.2,
        storeQv = storeQv)
      IncrementalSemDedup.sink(spark, s"$base/store", s"$base/pairs",
        threshold = 0.2, qvMargin = margin)(delta, 0L)
      val pairSet = spark.read.parquet(s"$base/pairs")
        .select(col("lo_id"), col("hi_id"), col("cosine"))
        .as[(Long, Long, Double)].collect().toSet
      val census = IncrementalSemDedup.verdicts(
        spark.read.parquet(s"$base/store/members"),
        spark.read.parquet(s"$base/pairs"))
        .select(col("vec_id"), col("keep")).as[(Long, Boolean)]
        .collect().toSet
      (base, pairSet, census)
    }
    val (_, pOff, vOff) = run(storeQv = false, margin = -1.0)
    val (qvBase, pOn, vOn) = run(storeQv = true, margin = 0.1)
    assert(pOn == pOff,
      s"prefilter changed the pair set: missing ${pOff -- pOn}, " +
        s"extra ${pOn -- pOff}")
    assert(vOn == vOff, "prefilter changed the keep census")
    assert(pOff.nonEmpty && vOff.exists(!_._2),
      "degenerate fixture: no pairs or no drops — the test proves nothing")
    // the column family is store-state: fixed at init, followed by the
    // sink append, carried through a rebuild
    def memberCols() =
      spark.read.parquet(s"$qvBase/store/members").columns.toSet
    assert(memberCols().contains("qv"), memberCols().toString)
    IncrementalSemDedup.rebuild(spark, s"$qvBase/store", 16)
    assert(memberCols().contains("qv"),
      s"rebuild dropped the qv column family: ${memberCols()}")
    // and deltaPairs REUSES the stored qv (no embedding-side recompute
    // needed for history): a second wave over the qv store still
    // matches the exact path
    val wave2 = emb.filter(col("vec_id") >= 480L)
      .select(col("vec_id") + 1000L as "vec_id", col("embedding"))
    val cells = spark.read.parquet(s"$qvBase/store/cells")
    val members = spark.read.parquet(s"$qvBase/store/members")
    val exact = IncrementalSemDedup.deltaPairs(wave2, cells, members,
      threshold = 0.2)
      .select(col("lo_id"), col("hi_id")).as[(Long, Long)].collect().toSet
    val pre = IncrementalSemDedup.deltaPairs(wave2, cells, members,
      threshold = 0.2, qvMargin = 0.1)
      .select(col("lo_id"), col("hi_id")).as[(Long, Long)].collect().toSet
    assert(pre == exact && exact.nonEmpty,
      s"qv-store wave mismatch: missing ${exact -- pre}, extra ${pre -- exact}")
  }
}
