package graft

import org.apache.spark.sql.functions._

import graft.queries.VectorQ

/** Scale mechanics for the ANN family (VERDICT r1 task 3): bucket/cell
  * counts are parameters, and growing them must shrink per-bucket candidate
  * sets — the difference between O(n²/b) pairwise work melting at 100 TB
  * and a bounded per-partition cost.
  */
class VectorScaleSpec extends SparkSpec {

  import spark.implicits._

  private lazy val emb = graft.core.Tables.load(spark, sfDir, "embeddings")

  /** Total same-bucket candidate pairs Σ c·(c−1)/2 for a bucketing column. */
  private def pairWork(counts: Seq[Long]): Long =
    counts.map(c => c * (c - 1) / 2).sum

  private def bucketCounts(bits: Int): Seq[Long] =
    emb.select(VectorQ.signBucket(col("embedding"), bits).as("b"))
      .groupBy("b").count().collect().map(_.getLong(1)).toSeq

  test("sign-LSH: more bits => smaller max bucket and less pairwise work") {
    val byBits = Seq(1, 3, 6).map(b => b -> bucketCounts(b)).toMap
    // buckets multiply...
    assert(byBits(1).size < byBits(3).size && byBits(3).size < byBits(6).size)
    // ...so the biggest candidate set shrinks...
    assert(byBits(3).max < byBits(1).max)
    assert(byBits(6).max < byBits(3).max)
    // ...and total pairwise comparisons drop monotonically.
    assert(pairWork(byBits(3)) < pairWork(byBits(1)))
    assert(pairWork(byBits(6)) < pairWork(byBits(3)))
  }

  test("annBucketed at higher bits stays a subset-quality search with bounded buckets") {
    // With more bits each query still gets ranked neighbors, and every
    // returned neighbor shares the query's (finer) bucket.
    val res = VectorQ.annBucketed(emb, bits = 6, k = 3)
    val rows = res.collect()
    assert(rows.nonEmpty)
    val ranks = rows.groupBy(_.getLong(0)).values
    assert(ranks.forall(g => g.map(_.getLong(4)).sorted.sameElements(1L to g.length)))
  }

  test("IVF: more cells => smaller max cell population") {
    def cellCounts(cells: Int): Seq[Long] = {
      val v = emb.select(col("vec_id"), col("embedding"))
        .withColumn("nrm", graft.functions.VectorFunctions.vec_norm2(col("embedding")))
      // reuse the library assignment by running annIvf's parent: count via
      // a tiny local reimplementation would defeat the test, so derive the
      // assignment from annIvf's output cluster column over all queries.
      VectorQ.annIvf(emb, cells = cells, k = 1, queryMod = 1)
        .groupBy(col("cluster")).count().collect().map(_.getLong(1)).toSeq
    }
    val c2 = cellCounts(2)
    val c16 = cellCounts(16)
    assert(c16.size > c2.size)
    assert(c16.max < c2.max)
  }

  test("annRecall measures the speed/quality trade: coarser buckets recall more") {
    val exact = VectorQ.cosineTopK(emb, k = 3).select("query_id", "neighbor_id")
    def meanRecall(bits: Int): Double = {
      val r = VectorQ.annRecall(exact,
          VectorQ.annBucketed(emb, bits = bits, k = 3)
            .select("query_id", "neighbor_id"))
        .agg(sum(col("n_hits")).cast("double") / sum(col("n_exact"))).head.getDouble(0)
      r
    }
    val coarse = meanRecall(1)   // 2 buckets: half the corpus per candidate set
    val fine = meanRecall(6)     // 64 buckets: tiny candidate sets
    assert(coarse > fine,
      s"recall must degrade as buckets shrink: bits=1 → $coarse, bits=6 → $fine")
    assert(coarse >= 0.5, s"2-bucket LSH should catch most true neighbors: $coarse")
    // every query keeps its denominator: no rows lost by the left join
    val perQuery = VectorQ.annRecall(exact,
      VectorQ.annBucketed(emb, bits = 6, k = 3).select("query_id", "neighbor_id"))
    assert(perQuery.filter(col("n_exact") =!= 3).count() == 0)
  }

  private def inertia(cents: org.apache.spark.sql.DataFrame): Double = {
    val v = emb.select(col("vec_id"), col("embedding"))
      .withColumn("nrm", graft.functions.VectorFunctions.vec_norm2(col("embedding")))
    VectorQ.assignToCentroids(v, cents)
      .agg(sum(col("dist_sq"))).head.getDouble(0)
  }

  test("kmeans: zero iterations returns the seed vectors as centroids") {
    val seeds = VectorQ.kmeansCentroids(emb, cells = 3, iters = 0)
      .orderBy(col("cluster")).collect()
    val lowest = emb.orderBy(col("vec_id")).limit(3)
      .select(col("vec_id"), col("embedding")).collect()
    assert(seeds.map(_.getLong(0)).sameElements(lowest.map(_.getLong(0))))
    val s0 = seeds(0).getSeq[Double](1)
    val l0 = lowest(0).getSeq[Float](1).map(_.toDouble)
    assert(s0 == l0, "iters=0 centroid must be the raw seed embedding")
  }

  test("kmeans: Lloyd iterations do not increase inertia, and training helps") {
    val i0 = inertia(VectorQ.kmeansCentroids(emb, cells = 8, iters = 0))
    val i1 = inertia(VectorQ.kmeansCentroids(emb, cells = 8, iters = 1))
    val i3 = inertia(VectorQ.kmeansCentroids(emb, cells = 8, iters = 3))
    // 6-dp centroid rounding can wiggle the tail, so allow 0.01% slack
    assert(i1 <= i0 * 1.0001, s"iter1 inertia $i1 > iter0 $i0")
    assert(i3 <= i1 * 1.0001, s"iter3 inertia $i3 > iter1 $i1")
    assert(i3 < i0 * 0.95, s"training barely moved inertia: $i0 -> $i3")
  }

  test("kmeans is deterministic across runs") {
    val a = VectorQ.kmeansCentroids(emb, cells = 4, iters = 2)
      .orderBy(col("cluster")).collect().map(r => (r.getLong(0), r.getSeq[Double](1)))
    val b = VectorQ.kmeansCentroids(emb, cells = 4, iters = 2)
      .orderBy(col("cluster")).collect().map(r => (r.getLong(0), r.getSeq[Double](1)))
    assert(a.sameElements(b))
  }

  test("trained IVF search returns complete ranked neighbor lists") {
    val cents = VectorQ.kmeansCentroids(emb, cells = 4, iters = 2)
    val res = VectorQ.annIvfTrained(emb, cents, k = 3).collect()
    assert(res.nonEmpty)
    val byQuery = res.groupBy(_.getLong(0)).values
    assert(byQuery.forall(g =>
      g.map(_.getLong(3)).sorted.sameElements(1L to g.length)))
  }

  test("IVF nprobe dial: probing more cells never lowers recall") {
    val cents = VectorQ.kmeansCentroids(emb, cells = 8, iters = 2)
    val exact = VectorQ.cosineTopK(emb, k = 3).select("query_id", "neighbor_id")
    def recall(nprobe: Int): Double =
      VectorQ.annRecall(exact,
          VectorQ.annIvfTrained(emb, cents, k = 3, nprobe = nprobe)
            .select("query_id", "neighbor_id"))
        .agg(sum(col("n_hits")).cast("double") / sum(col("n_exact"))).head.getDouble(0)
    val r1 = recall(1)
    val r2 = recall(2)
    val r8 = recall(8) // probe every cell == exact search
    assert(r1 <= r2 + 1e-9, s"nprobe=2 recall $r2 below nprobe=1 $r1")
    assert(r2 <= r8 + 1e-9, s"nprobe=8 recall $r8 below nprobe=2 $r2")
    assert(math.abs(r8 - 1.0) < 1e-9,
      s"probing all cells must recover exact top-k, got $r8")
  }

  test("multi-probe LSH: recall climbs with probe distance, exact at bits") {
    val exact = VectorQ.cosineTopK(emb, k = 3).select("query_id", "neighbor_id")
    def recall(h: Int): Double =
      VectorQ.annRecall(exact,
          VectorQ.annBucketedMultiProbe(emb, bits = 3, k = 3, probeHamming = h)
            .select("query_id", "neighbor_id"))
        .agg(sum(col("n_hits")).cast("double") / sum(col("n_exact"))).head.getDouble(0)
    val r0 = recall(0) // own bucket only == annBucketed
    val r1 = recall(1)
    val r3 = recall(3) // every bucket probed == exact search
    assert(r0 <= r1 + 1e-9, s"h=1 recall $r1 below h=0 $r0")
    assert(r1 <= r3 + 1e-9, s"h=3 recall $r3 below h=1 $r1")
    assert(math.abs(r3 - 1.0) < 1e-9, s"probing all buckets must be exact: $r3")
    // h=0 must coincide with the plain bucketed search
    val plain = VectorQ.annBucketed(emb, bits = 3, k = 3)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    val h0 = VectorQ.annBucketedMultiProbe(emb, bits = 3, k = 3, probeHamming = 0)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    assert(h0 == plain)
  }

  test("semDedup census covers the corpus and keeps the marginal exemplar") {
    val census = VectorQ.semDedup(emb, cells = 4, threshold = 0.2)
    val rows = census.collect()
    assert(rows.length == emb.count(), "every vector classifies exactly once")
    // SemDeDup's keep policy: the member farthest from its centroid can
    // never be dropped (nothing in the cluster beats it)
    rows.groupBy(_.getLong(1)).foreach { case (_, members) =>
      val far = members.maxBy(r => (r.getDouble(2), -r.getLong(0)))
      assert(far.getBoolean(3), s"farthest member ${far.getLong(0)} was dropped")
    }
    // the fixture corpus has semantic mass to shed at threshold 0.2
    val kept = rows.count(_.getBoolean(3))
    assert(kept > 0 && kept < rows.length)
  }

  test("semDedup with an unreachable threshold keeps everything") {
    val census = VectorQ.semDedup(emb, cells = 4, threshold = 1.1)
    assert(census.filter(!col("keep")).count() == 0)
  }

  test("semDedup keep-set is stable under repartitioning") {
    def keptIds(df: org.apache.spark.sql.DataFrame): Set[Long] =
      VectorQ.semDedup(df, cells = 4, threshold = 0.2)
        .filter(col("keep")).select("vec_id").as[Long].collect().toSet
    assert(keptIds(emb) == keptIds(emb.repartition(13)))
  }

  test("pqEncode maps each codeword donor to its own code at distance 0") {
    val cb = VectorQ.pqCodebook(emb, subs = 4, codes = 4)
    val seedIds = cb.select("code").distinct().as[Long].collect().sorted
    val enc = VectorQ.pqEncode(emb, cb, subs = 4)
      .filter(col("vec_id").isin(seedIds: _*)).collect()
    // a donor's subvector is IN the codebook, so its nearest codeword is
    // itself (fixture vectors are distinct — no zero-distance ties)
    enc.foreach(r => assert(r.getLong(2) == r.getLong(0),
      s"vec ${r.getLong(0)} sub ${r.getInt(1)} encoded to ${r.getLong(2)}"))
    assert(enc.length == 4 * 4)
  }

  test("annPq returns k candidates per query with non-decreasing ADC") {
    val res = VectorQ.annPq(emb, k = 3).collect()
      .groupBy(_.getLong(0)).values
    res.foreach { rows =>
      assert(rows.length == 3)
      val byRank = rows.sortBy(_.getLong(3)).map(_.getDouble(2))
      assert(byRank.zip(byRank.tail).forall { case (a, b) => a <= b })
      assert(byRank.forall(_ >= 0.0))
    }
  }

  test("annIvfPq with nprobe=cells degenerates to annPq's full compressed scan") {
    def key(r: org.apache.spark.sql.Row) =
      (r.getLong(0), r.getLong(3)) -> (r.getLong(1), r.getDouble(2))
    val full = VectorQ.annPq(emb).collect().map(key).toMap
    val ivf = VectorQ.annIvfPq(emb, nprobe = 4).collect().map(key).toMap
    assert(ivf == full, "probing every cell must score every candidate")
  }

  test("annIvfPq neighbors come only from the query's probed cell") {
    val v = emb
    val res = VectorQ.annIvfPq(v, nprobe = 1)
    // recompute the assignment independently and check cluster agreement
    val seeds = v.orderBy(col("vec_id")).limit(4)
      .select(col("vec_id").as("cluster"),
        expr("transform(embedding, x -> CAST(x AS DOUBLE))").as("centroid"))
    val asg = VectorQ.assignToCentroids(
      v.select(col("vec_id"), col("embedding"))
        .withColumn("nrm", graft.functions.VectorFunctions.vec_norm2(col("embedding"))),
      seeds).select(col("vec_id"), col("cluster"))
    val qc = asg.select(col("vec_id").as("query_id"), col("cluster").as("qc"))
    val nc = asg.select(col("vec_id").as("neighbor_id"), col("cluster").as("nc"))
    val crossCell = res.join(qc, "query_id").join(nc, "neighbor_id")
      .filter(col("qc") =!= col("nc"))
    assert(crossCell.isEmpty, "a neighbor outside the probed cell leaked in")
  }

  // ---- explicit-query ANN API (VERDICT r4 task 2) --------------------

  private lazy val queryTable = emb.filter(col("vec_id") % 40 === 17)
    .select((col("vec_id") + 100000).as("query_id"), col("embedding"))

  test("explicit-query search: own vector tops, all-probe IVF matches brute force") {
    val brute = VectorQ.cosineTopK(emb, queryTable, 3)
    val top = brute.filter(col("rank") === 1).collect()
    assert(top.nonEmpty)
    top.foreach { r =>
      assert(r.getLong(1) == r.getLong(0) - 100000,
        "a corpus-drawn query's own vector must be its top hit")
      assert(math.abs(r.getDouble(2) - 1.0) < 1e-9)
    }
    val cents = VectorQ.kmeansCentroids(emb, cells = 4, iters = 1)
    val ivf = VectorQ.annIvfTrained(emb, cents, queryTable, 3, nprobe = 4)
    def keys(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getLong(3))).toSet
    assert(keys(ivf) == keys(brute), "probing every cell must recover exact top-k")
  }

  test("explicit-query IVF-PQ with all cells probed matches explicit-query PQ") {
    val cents = VectorQ.kmeansCentroids(emb, cells = 4, iters = 0)
    def keys(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getLong(3))).toSet
    val pq = keys(VectorQ.annPq(emb, queryTable, 4, 4, 3, trained = false))
    val ivfpq = keys(VectorQ.annIvfPq(emb, cents, queryTable, 4, 4, 3,
      nprobe = 4, trained = false))
    assert(ivfpq == pq)
  }

  test("explicit-query LSH family: self top-hit, all-probe recovers brute force") {
    val brute = VectorQ.cosineTopK(emb, queryTable, 3)
    // bucketed: a corpus-drawn query shares its own vector's bucket
    val b = VectorQ.annBucketed(emb, queryTable, 3, 3)
    b.filter(col("rank") === 1).collect().foreach(r =>
      assert(r.getLong(2) == r.getLong(0) - 100000))
    // multi-probe at h=bits probes every bucket == exact over the query table
    val mp = VectorQ.annBucketedMultiProbe(emb, queryTable, 3, 3, 3)
    def keys(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getLong(3))).toSet
    assert(keys(mp) == keys(brute))
    // quantized: complete contiguous ranked lists per query
    val qz = VectorQ.annQuantized(emb, queryTable, 3, 3).collect()
    assert(qz.nonEmpty)
    qz.groupBy(_.getLong(0)).values.foreach(g =>
      assert(g.map(_.getLong(4)).sorted.sameElements(1L to g.length)))
  }

  test("explicit-query ANN carries no forced query-side broadcast") {
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val cents = VectorQ.kmeansCentroids(emb, cells = 4, iters = 0)
      val big = emb.select((col("vec_id") + 100000).as("query_id"), col("embedding"))
      // with auto-broadcast off and no hint, the candidate join must fall
      // back to a shuffled join — the plan a 100 TB corpus needs when the
      // query set is a full request log rather than an eval batch
      val plan = VectorQ.annIvfTrained(emb, cents, big, 3, 1)
        .queryExecution.sparkPlan.toString
      assert(plan.contains("SortMergeJoin") || plan.contains("ShuffledHashJoin"),
        s"expected a shuffled candidate join with broadcast disabled:\n$plan")
      // the corpus-sample variant still forces its (hinted) broadcast
      val legacy = VectorQ.annIvfTrained(emb, cents, k = 3)
        .queryExecution.sparkPlan.toString
      assert(legacy.contains("BroadcastHashJoin") ||
        legacy.contains("BroadcastNestedLoopJoin"))
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  // ---- trained PQ codebooks (VERDICT r4 task 3) ----------------------

  /** Deterministic clustered corpus: 8 well-separated centers, 25 members
    * each, ids ordered so the first `codes` vectors (the seed-codebook
    * donors) all come from ONE cluster — the layout where untrained
    * codewords quantize worst. */
  private lazy val clustered = {
    val rnd = new scala.util.Random(42)
    val centers = Array.fill(8, 64)(rnd.nextDouble() * 2 - 1)
    (0 until 200).map { i =>
      val c = centers(i / 25)
      (i.toLong, c.map(x => (x + (rnd.nextDouble() - 0.5) * 0.1).toFloat).toSeq)
    }.toDF("vec_id", "embedding")
  }

  private def quantError(df: org.apache.spark.sql.DataFrame,
      cb: org.apache.spark.sql.DataFrame, subs: Int): Double = {
    val subDim = 64 / subs
    val sliced = df.select(col("vec_id"), posexplode(array((0 until subs).map(m =>
      expr(s"transform(slice(embedding, ${m * subDim + 1}, $subDim), x -> CAST(x AS DOUBLE))")): _*))
      .as(Seq("sub", "sv")))
    val dExpr = (1 to subDim)
      .map(k => s"(element_at(sv,$k)-element_at(cw,$k))*(element_at(sv,$k)-element_at(cw,$k))")
      .mkString(" + ")
    sliced.join(cb, Seq("sub")).withColumn("d", expr(dExpr))
      .groupBy(col("vec_id"), col("sub")).agg(min(col("d")).as("d"))
      .agg(sum(col("d"))).head.getDouble(0)
  }

  test("pqCodebookTrained with zero iterations is the seed codebook") {
    def rows(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getSeq[Double](2))).toSet
    assert(rows(VectorQ.pqCodebookTrained(emb, 4, 4, iters = 0)) ==
      rows(VectorQ.pqCodebook(emb, 4, 4)))
  }

  test("per-subspace Lloyd training strictly reduces quantization error") {
    val e0 = quantError(clustered, VectorQ.pqCodebook(clustered, 4, 8), 4)
    val e3 = quantError(clustered, VectorQ.pqCodebookTrained(clustered, 4, 8, iters = 3), 4)
    assert(e3 < e0 * 0.8, s"training barely moved quantization error: $e0 -> $e3")
  }

  test("trained codebooks lift ADC-vs-exact agreement on clustered data") {
    val exact = VectorQ.cosineTopK(clustered, k = 3).select("query_id", "neighbor_id")
    def recall(trained: Boolean): Double = VectorQ.annRecall(exact,
        VectorQ.annPq(clustered, subs = 4, codes = 8, k = 3, trained = trained)
          .select("query_id", "neighbor_id"))
      .agg(sum(col("n_hits")).cast("double") / sum(col("n_exact"))).head.getDouble(0)
    val seed = recall(false)
    val trained = recall(true)
    assert(trained > seed,
      s"trained codebook must beat one-cluster seeds: seed=$seed trained=$trained")
  }

  test("pq rejects a subspace count that does not divide the dimension") {
    intercept[IllegalArgumentException](VectorQ.pqCodebook(emb, subs = 7))
    intercept[IllegalArgumentException](VectorQ.pqEncode(emb,
      VectorQ.pqCodebook(emb), subs = 7))
  }

  test("signBucket rejects degenerate bit counts") {
    intercept[IllegalArgumentException](VectorQ.signBucket(col("embedding"), 0))
    intercept[IllegalArgumentException](VectorQ.signBucket(col("embedding"), 63))
  }
}
