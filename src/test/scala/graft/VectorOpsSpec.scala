package graft

import org.apache.spark.sql.DataFrame

import graft.queries.VectorQ

/** Semantics of the embedding curation operators (prototypes, outlier
  * pruning, nearest-class-mean eval) on planted fixtures where the right
  * answer is computable by hand.
  */
class VectorOpsSpec extends SparkSpec {

  import spark.implicits._

  private def vec(xs: Float*): Array[Float] = xs.toArray

  private def centroids(rows: (Long, Seq[Double])*): DataFrame =
    rows.toDF("cluster", "centroid")

  test("prototypes: the m nearest members per cluster, in distance order") {
    val emb = Seq(
      (1L, vec(10f, 0f)),  // dist 0 to centroid A
      (2L, vec(9f, 0f)),   // dist 1
      (3L, vec(7f, 0f)),   // dist 9
      (4L, vec(0f, 10f)),  // dist 0 to centroid B
      (5L, vec(0f, 6f))    // dist 16
    ).toDF("vec_id", "embedding")
    val cents = centroids(0L -> Seq(10.0, 0.0), 1L -> Seq(0.0, 10.0))
    val r = VectorQ.clusterPrototypes(emb, cents, m = 2)
      .as[(Long, Long, Long)].collect().toSet
    assert(r == Set((0L, 1L, 1L), (0L, 2L, 2L), (1L, 1L, 4L), (1L, 2L, 5L)))
  }

  test("outliers: far member flagged relative to its own cluster's scale") {
    val emb = Seq(
      (1L, vec(10f, 0f)), (2L, vec(11f, 0f)), (3L, vec(9f, 0f)),
      (4L, vec(10f, 1f)),
      (5L, vec(30f, 0f)), // dist 400 to A (closer to A than B): the junk
      (6L, vec(0f, 10f)), (7L, vec(0f, 11f))
    ).toDF("vec_id", "embedding")
    val cents = centroids(0L -> Seq(10.0, 0.0), 1L -> Seq(0.0, 10.0))
    val r = VectorQ.embeddingOutliers(emb, cents, threshold = 2.0)
      .select($"vec_id", $"is_outlier").as[(Long, Boolean)]
      .collect().toMap
    assert(r(5L), "planted far vector must be flagged")
    assert(Seq(1L, 2L, 3L, 4L, 6L, 7L).forall(id => !r(id)),
      s"near-centroid members must not be flagged: $r")
  }

  test("outliers: a zero-spread cluster yields rel_dist 0, no flags") {
    val emb = Seq((1L, vec(5f, 5f)), (2L, vec(5f, 5f)))
      .toDF("vec_id", "embedding")
    val r = VectorQ.embeddingOutliers(emb, centroids(0L -> Seq(5.0, 5.0)))
      .select($"rel_dist", $"is_outlier").as[(Double, Boolean)].collect()
    assert(r.forall { case (d, f) => d == 0.0 && !f })
  }

  test("class-mean eval: separable labels diagonal; planted mislabel lands off-diagonal") {
    val emb = Seq(
      (1L, vec(10f, 0f), 0), (2L, vec(11f, 0f), 0),
      (3L, vec(0f, 10f), 0), // labeled 0 but sits in label-1 territory
      (4L, vec(0f, 10f), 1), (5L, vec(0f, 9f), 1)
    ).toDF("vec_id", "embedding", "label")
    val r = VectorQ.nearestClassMeanEval(emb)
      .as[(Long, Long, Long)].collect().toSet
    assert(r == Set((0L, 0L, 2L), (0L, 1L, 1L), (1L, 1L, 2L)))
  }

  test("contrastive pairs: positives same-label, the nearest other-label is the hard negative") {
    val emb = Seq(
      (0L, vec(10f, 0f), 0),   // query (vec_id % 20 == 0)
      (1L, vec(9f, 1f), 0),    // near positive
      (2L, vec(0f, 10f), 0),   // far positive
      (3L, vec(10f, 1f), 1),   // HARD negative: nearest of the other label
      (4L, vec(0f, 9f), 1)     // easy negative
    ).toDF("vec_id", "embedding", "label")
    val r = VectorQ.contrastivePairs(emb, k = 1, queryMod = 20)
      .select($"query_id", $"kind", $"candidate_id")
      .as[(Long, String, Long)].collect().toSet
    assert(r == Set((0L, "pos", 1L), (0L, "neg", 3L)), s"got $r")
  }

  test("random projection is linear and keeps near/far ordering") {
    val base = Array.tabulate(64)(i => (i % 7).toFloat)
    val near = base.clone(); near(0) += 0.1f
    val far = Array.tabulate(64)(i => ((i * 13) % 11).toFloat)
    val emb = Seq((1L, base), (2L, near), (3L, far), (4L, base.map(_ * 2f)))
      .toDF("vec_id", "embedding")
    val p = VectorQ.randomProject(emb, outDim = 8).collect()
      .map(r => r.getLong(0) -> (1 to 8).map(j => r.getDouble(j)).toArray).toMap
    def d2(a: Array[Double], b: Array[Double]): Double =
      a.zip(b).map { case (x, y) => (x - y) * (x - y) }.sum
    // linearity: proj(2x) == 2 * proj(x), exactly (same fold order)
    assert(p(4L).zip(p(1L)).forall { case (a, b) => a == 2 * b })
    // JL sanity: the near vector projects nearer than the far one
    assert(d2(p(1L), p(2L)) < d2(p(1L), p(3L)))
    // the 8 components are not all identical (sign grid is non-trivial)
    assert(p(3L).distinct.length > 1)
  }

  test("class means come back in kmeans' (cluster, centroid) shape, rounded") {
    val emb = Seq(
      (1L, vec(1f, 0f), 3), (2L, vec(2f, 0f), 3), (3L, vec(0f, 7f), 8)
    ).toDF("vec_id", "embedding", "label")
    val m = VectorQ.classMeans(emb).as[(Long, Seq[Double])]
      .collect().sortBy(_._1)
    assert(m.map(_._1).toSeq == Seq(3L, 8L))
    assert(m(0)._2 == Seq(1.5, 0.0) && m(1)._2 == Seq(0.0, 7.0))
  }

  test("cluster purity: exact ppm, majority ties break to the lowest label") {
    val emb = Seq(
      // cluster 0 (around x-axis): labels 7,7,9 -> majority 7, purity 2/3
      (1L, vec(10f, 0f), 7), (2L, vec(11f, 0f), 7), (3L, vec(9f, 0f), 9),
      // cluster 1 (around y-axis): labels 2,5 tied 1-1 -> lowest label 2
      (4L, vec(0f, 10f), 5), (5L, vec(0f, 11f), 2)
    ).toDF("vec_id", "embedding", "label")
    val cents = centroids(0L -> Seq(10.0, 0.0), 1L -> Seq(0.0, 10.0))
    val r = VectorQ.clusterPurity(emb, cents)
      .select($"cluster", $"n", $"top_label", $"n_top", $"purity_ppm")
      .as[(Long, Long, Int, Long, Long)].collect().sortBy(_._1)
    assert(r.toSeq == Seq(
      (0L, 3L, 7, 2L, 666666L),   // (1000000 * 2) / 3 truncated
      (1L, 2L, 2, 1L, 500000L)))
  }

  test("hybrid rrf: both-modality doc outranks either single-modality doc") {
    val docs = Seq(
      (1L, "apple banana"), (2L, "apple cherry"), (3L, "dog fox")
    ).toDF("doc_id", "text")
    val emb = Seq(
      (1L, vec(0f, 1f)),      // orthogonal to the query
      (2L, vec(1f, 0f)),      // cosine 1.0 -> vec rank 1
      (3L, vec(0.9f, 0.1f))   // cosine ~0.994 -> vec rank 2
    ).toDF("vec_id", "embedding")
    val tq = Seq((7L, "apple")).toDF("query_id", "qtext")
    val vq = Seq((7L, vec(1f, 0f))).toDF("query_id", "embedding")
    // text ranks: docs 1,2 tie on score -> doc_id break: r(1)=1, r(2)=2
    // fusion: doc2 in both = 1e6/62 + 1e6/61; docs 1,3 single = 1e6/61
    val r = VectorQ.hybridRrf(docs, emb, tq, vq, topK = 2)
      .as[(Long, Long, Long, Long)].collect().sortBy(_._4)
    assert(r.toSeq == Seq(
      (7L, 2L, 1000000L / 62 + 1000000L / 61, 1L),
      (7L, 1L, 1000000L / 61, 2L)), s"got ${r.toSeq}")
  }

  test("embedding drift: identical halves drift 0, planted shift exact") {
    // find each id's hash half with the operator's own coordinate
    val ids = (1L to 40L) ++ (101L to 140L)
    val halves = ids.toDF("vec_id").selectExpr("vec_id",
        "conv(substr(md5(concat('drift:', vec_id)), 1, 5), 16, 10) % 1000000 AS h")
      .as[(Long, String)].collect()
      .map(t => t._1 -> (t._2.toLong < 500000L)).toMap
    def nA(r: Seq[Long]) = r.count(halves(_)).toLong
    assert(nA(1L to 40L) > 0 && nA(1L to 40L) < 40 &&
      nA(101L to 140L) > 0 && nA(101L to 140L) < 40,
      "fixture needs both halves populated for both labels")
    // label 0: every vector identical -> drift2 exactly 0
    // label 1: half a = 0.5, half b = 0.6 in dim 0 -> drift2 exactly 0.01
    // label 2: a single vector (one half only) -> absent from output
    val emb = (1L to 40L).map { id =>
      (id, 0, vec(0.25f, -1.5f))
    } ++ (101L to 140L).map { id =>
      val x = if (halves(id)) 0.5f else 0.6f
      (id, 1, vec(x, 2.0f))
    } :+ ((999L, 2, vec(1f, 1f)))
    val r = VectorQ.embeddingDrift(
        emb.toDF("vec_id", "label", "embedding"))
      .as[(Long, Long, Long, Double)].collect()
      .map(t => t._1 -> (t._2, t._3, t._4)).toMap
    assert(r(0L) == (nA(1L to 40L), 40L - nA(1L to 40L), 0.0),
      s"got ${r.get(0L)}")
    assert(r(1L) == (nA(101L to 140L), 40L - nA(101L to 140L), 0.01),
      s"got ${r.get(1L)}")
    assert(!r.contains(2L), "single-half label must be absent")
  }

  test("power PCA: planted dominant axis recovered at exactly ±1e6 ppm") {
    // Dim 7 carries ±2.0 (alternating sign), every other dim tiny fixed
    // noise — the top principal direction of Σxxᵀ is e₇.
    val rows = (0L until 40L).map { i =>
      val v = Array.fill(8)(0.001f * ((i % 3).toInt + 1))
      v(7) = if (i % 2 == 0) 2.0f else -2.0f
      (i, v)
    }
    val out = VectorQ.topComponentPpm(rows.toDF("vec_id", "embedding"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sortBy(_._1)
    val l2 = out.map(_._3)
    assert(math.abs(l2(7)) === 1000000L, s"dominant dim must peg the scale: ${l2.toSeq}")
    assert(l2.zipWithIndex.filter(_._2 != 7).forall(x => math.abs(x._1) < 10000),
      s"off-axis loadings must be noise-sized: ${l2.toSeq}")
    // convergence: iteration 2 concentrates at least as hard as iteration 1
    val off1 = out.map(_._2).zipWithIndex.filter(_._2 != 7).map(x => math.abs(x._1)).max
    val off2 = l2.zipWithIndex.filter(_._2 != 7).map(x => math.abs(x._1)).max
    assert(off2 <= off1, s"iteration must not de-concentrate: $off1 -> $off2")
  }

  test("anisotropy card: collapsed corpus ~1e6, spread corpus ~1/d") {
    // Collapsed: every vector on the same axis (±) → mean cos² pegs ~1e6.
    val collapsed = (0L until 20L).map { i =>
      val v = Array.fill(8)(0.0f); v(3) = if (i % 2 == 0) 1.0f else -2.0f; (i, v)
    }
    val c = VectorQ.anisotropyCard(collapsed.toDF("vec_id", "embedding")).head
    assert(c.getLong(0) === 20L)
    assert(c.getLong(1) > 990000L, s"collapsed corpus must read ~1e6: $c")
    assert(c.getLong(2) === 125000L) // 1e6 / 8 dims
    // Spread: equal mass on every axis → mean cos²(x, v₁) ≈ 1/d.
    val spread = (0L until 32L).map { i =>
      val v = Array.fill(8)(0.0f); v((i % 8).toInt) = 1.0f; (i, v)
    }
    val s = VectorQ.anisotropyCard(spread.toDF("vec_id", "embedding")).head
    assert(s.getLong(1) < 200000L, s"spread corpus must sit near 1/d: $s")
  }

  test("semantic decontamination: exact and scaled leaks flagged, clean eval absent") {
    val train = Seq(
      (1L, vec(1f, 0f, 0f, 0f)),
      (2L, vec(0f, 1f, 0f, 0f)),
      (3L, vec(0.7f, 0.7f, 0f, 0f))
    ).toDF("vec_id", "embedding")
    val evalQ = Seq(
      (101L, vec(1f, 0f, 0f, 0f)),   // verbatim leak
      (102L, vec(0f, 2f, 0f, 0f)),   // scaled leak — cosine is norm-blind
      (103L, vec(0f, 0f, 1f, 0f))    // clean: orthogonal to everything
    ).toDF("query_id", "embedding")
    val out = VectorQ.semanticDecontamination(train, evalQ, bits = 2,
      probeHamming = 2, threshold = 0.9)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(out.toSet === Set((101L, 1L, 1.0), (102L, 2L, 1.0)))
  }

  test("power PCA: all-zero corpus fails loudly, not div/0") {
    val rows = (0L until 4L).map(i => (i, Array.fill(4)(0.0f)))
    val e = intercept[IllegalArgumentException] {
      VectorQ.topComponentPpm(rows.toDF("vec_id", "embedding")).collect()
    }
    assert(e.getMessage.contains("zero iteration vector"))
  }
}
