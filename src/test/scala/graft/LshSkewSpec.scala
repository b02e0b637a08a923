package graft

import org.apache.spark.sql.functions._

import graft.queries.TextQ

/** Band-skew guard for MinHash-LSH (VERDICT r1 task 7): identical
  * boilerplate text collapses signatures into one band key whose reducer
  * would do O(size²) pairwise work; the guard excludes such keys from
  * pairing and surfaces them as a metric.
  */
class LshSkewSpec extends SparkSpec {

  import spark.implicits._

  // 40 docs of identical boilerplate (signatures collapse → every band key
  // shared by all 40) + 3 distinct docs + 2 genuine near-dups.
  private lazy val docs = {
    val boiler = (1L to 40L).map(i => (i, "please subscribe to our newsletter for updates today"))
    val distinct = Seq(
      (101L, "alpha bravo charlie delta echo foxtrot golf"),
      (102L, "one two three four five six seven eight"),
      (103L, "red orange yellow green blue indigo violet"))
    val nearDup = Seq(
      (201L, "the quick brown fox jumps over the lazy dog"),
      (202L, "the quick brown fox jumps over the lazy cat"))
    (boiler ++ distinct ++ nearDup).toDF("doc_id", "text")
  }

  test("simhash rejects bit widths a signed long fingerprint can't hold") {
    intercept[IllegalArgumentException](TextQ.simhash(docs, bits = 63))
    intercept[IllegalArgumentException](TextQ.simhash(docs, bits = 0))
    // 62 is the widest valid fingerprint — must build and stay positive-safe
    assert(TextQ.simhash(docs, bits = 62).limit(1).count() == 1)
  }

  test("poisoned boilerplate band keys are excluded from pairing and surfaced") {
    val bands = TextQ.minhashBands(docs)

    // Unguarded: the 40-doc boilerplate group alone yields 40*39/2 = 780
    // pairs per matching band — the degenerate blow-up.
    val unguarded = TextQ.lshCandidates(bands, maxBandSize = Int.MaxValue)
    assert(unguarded.filter(col("doc_a") <= 40 && col("doc_b") <= 40).count() == 780)

    // Guarded at cap 10: boilerplate pairs are gone...
    val guarded = TextQ.lshCandidates(bands, maxBandSize = 10)
    assert(guarded.filter(col("doc_a") <= 40 && col("doc_b") <= 40).count() == 0)
    // ...but genuinely similar small groups still pair
    assert(guarded.filter(col("doc_a") === 201 && col("doc_b") === 202).count() == 1)

    // and the skew metric names the degenerate keys with their size
    val skew = TextQ.bandSkew(bands, maxBandSize = 10).collect()
    assert(skew.nonEmpty)
    assert(skew.forall(_.getLong(2) == 40))
    // 4 bands of identical signatures → 4 degenerate keys
    assert(skew.length == 4)
  }

  test("connectedComponents labels chains, cliques and disjoint pairs correctly") {
    // chain 1-2-3-4 (diameter > 1 forces multiple propagation rounds),
    // clique {10,11,12}, disjoint pair {20,21}
    val pairs = Seq(
      (1L, 2L), (2L, 3L), (3L, 4L),
      (10L, 11L), (10L, 12L), (11L, 12L),
      (20L, 21L)).toDF("doc_a", "doc_b")
    val comp = TextQ.connectedComponents(pairs)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(comp == Map(
      1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L,
      10L -> 10L, 11L -> 10L, 12L -> 10L,
      20L -> 20L, 21L -> 20L))
  }

  test("connectedComponents reliable mode and non-convergence guard") {
    val pairs = Seq((1L, 2L), (2L, 3L)).toDF("doc_a", "doc_b")
    // fault-tolerant checkpoints (the cluster-scale path)
    val ckptDir = java.nio.file.Files.createTempDirectory("graft_cc_ckpt").toString
    spark.sparkContext.setCheckpointDir(ckptDir)
    val comp = TextQ.connectedComponents(pairs, reliable = true)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(comp == Map(1L -> 1L, 2L -> 1L, 3L -> 1L))
    // a diameter beyond the round budget fails loud, not silently split
    val chain = (1L to 6L).sliding(2).map(w => (w.head, w.last)).toSeq
      .toDF("doc_a", "doc_b")
    val e = intercept[IllegalStateException](
      TextQ.connectedComponents(chain, maxIter = 2))
    assert(e.getMessage.contains("did not converge"))
  }

  test("guard is inert when no band exceeds the cap (oracle fixture path)") {
    val fixture = graft.core.Tables.load(spark, sfDir, "documents")
    val bands = TextQ.minhashBands(fixture)
    val a = TextQ.lshCandidates(bands, maxBandSize = 1000)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val b = TextQ.lshCandidates(bands, maxBandSize = Int.MaxValue)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(a == b)
  }

  test("split leakage audit: cluster-atomic split leaks exactly zero") {
    val sf = graft.core.Tables.load(spark, sfDir, "documents")
    val r = TextQ.splitLeakageAudit(sf)
      .as[(String, Long, Long, Long)].collect()
      .map(t => t._1 -> (t._2, t._3, t._4)).toMap
    val (np, nc, _) = r("hash_split")
    val (sp, sc, sl) = r("leakage_safe")
    assert(np == sp, "both policies audit the same candidate pairs")
    assert(np > 0, "fixture must produce near-dup candidates")
    assert(sc == 0L && sl == 0L,
      s"leakage-safe split must never cross: $sc cross of $sp")
    assert(nc >= 0L && nc <= np)
  }

  test("minhash agreement: identical pair exact, near-dup pair's true Jaccard") {
    val d = Seq(
      (1L, "the quick brown fox jumps over the lazy dog"),
      (2L, "the quick brown fox jumps over the lazy dog"),   // exact dup of 1
      (3L, "the quick brown fox jumps over the lazy cat")    // 1-token edit
    ).toDF("doc_id", "text")
    val r = TextQ.minhashAgreement(d)
      .as[(Long, Long, Long, Long, Long)].collect()
      .map(t => (t._1, t._2) -> (t._3, t._4, t._5)).toMap
    // identical docs: every lane agrees AND every shingle is shared
    assert(r((1L, 2L)) == (1000000L, 1000000L, 0L), s"got ${r.get((1L, 2L))}")
    // 9-token docs -> 7 distinct 3-shingles each; the last token appears in
    // exactly ONE shingle, so the edit changes one: inter 6, union 8
    // -> exact 750000 ppm on both edit pairs
    for (p <- Seq((1L, 3L), (2L, 3L)); (est, ex, err) <- r.get(p)) {
      assert(ex == 750000L, s"pair $p exact: $ex")
      assert(err == (est - ex).abs, s"pair $p err: $err")
    }
  }

  test("winnowing: shared-substring guarantee, density bound, determinism") {
    import org.apache.spark.sql.functions.col
    // two docs sharing a 12-token passage (>= window+shingle-1 = 10
    // tokens at w=8,k=3) surrounded by distinct context: the guarantee
    // says at least one fingerprint of the shared region must match
    val passage = "alpha bravo charlie delta echo foxtrot golf hotel " +
      "india juliet kilo lima"
    def ctx(p: String, n: Int) = (1 to n).map(j => s"$p$j").mkString(" ")
    val docs = Seq(
      (1L, s"${ctx("x", 15)} $passage ${ctx("y", 15)}"),
      (2L, s"${ctx("p", 15)} $passage ${ctx("q", 15)}"),
      (3L, ctx("z", 40))) // fully distinct doc
      .toDF("doc_id", "text")
    val cands = TextQ.winnowCandidates(docs, window = 8, minShared = 1L)
      .select("doc_a", "doc_b").as[(Long, Long)].collect().toSet
    assert(cands.contains((1L, 2L)),
      s"shared 12-token passage must produce a fingerprint match: $cands")
    assert(!cands.exists(p => p._1 == 3L || p._2 == 3L),
      s"the distinct doc must not pair: $cands")
    // density: n_fp/n_sh stays near 2/(w+1) and never exceeds n_sh
    val card = TextQ.winnowFingerprints(docs, window = 8)
      .groupBy(col("doc_id")).count().as[(Long, Long)].collect().toMap
    val nsh = TextQ.winnowFingerprints(docs, window = 8)
      .select("doc_id", "n_sh").distinct().as[(Long, Long)].collect().toMap
    card.foreach { case (d, nfp) =>
      assert(nfp <= nsh(d) && nfp >= nsh(d) / 8,
        s"doc $d: $nfp fingerprints of ${nsh(d)} shingles")
    }
    // deterministic across runs (rightmost-min tie rule is total)
    val a = TextQ.winnowFingerprints(docs, 8).collect().map(_.toSeq).toSet
    val b = TextQ.winnowFingerprints(docs, 8).collect().map(_.toSeq).toSet
    assert(a == b)
  }

  test("winnowing: short doc yields one truncated frame, one fingerprint") {
    val tiny = Seq((1L, "only three tokens here")).toDF("doc_id", "text")
    // 4 tokens -> 2 shingles < window=8 -> single frame over all shingles
    val fp = TextQ.winnowFingerprints(tiny, window = 8).collect()
    assert(fp.length == 1, fp.mkString(","))
  }

  test("idf simhash: boilerplate-only overlap separates, rare-content overlap collides") {
    import org.apache.spark.sql.functions.col
    // 6 docs share a 40-token template; each pair (1,2) (3,4) (5,6)
    // shares rare distinctive tokens. Unweighted simhash is dominated by
    // the template (df = n_docs, weight collapses to 1 under idf).
    val boiler = (1 to 40).map(j => s"tmpl$j").mkString(" ")
    def doc(id: Long, rare: String) =
      (id, s"$boiler $rare $rare $rare $rare $rare $rare $rare $rare")
    val docs = Seq(
      doc(1L, "uniqalpha"), doc(2L, "uniqalpha"),
      doc(3L, "uniqbeta"), doc(4L, "uniqbeta"),
      doc(5L, "uniqgamma"), doc(6L, "uniqgamma"))
      .toDF("doc_id", "text")
    def hashes(df: org.apache.spark.sql.DataFrame) =
      df.select("doc_id", "simhash").as[(Long, Long)].collect().toMap
    val plain = hashes(TextQ.simhash(docs, bits = 32))
    val idf = hashes(TextQ.simhashIdf(docs, bits = 32))
    def ham(m: Map[Long, Long], a: Long, b: Long) =
      java.lang.Long.bitCount(m(a) ^ m(b))
    // same-rare pairs collide under BOTH schemes (identical text)
    assert(ham(idf, 1L, 2L) == 0 && ham(idf, 3L, 4L) == 0)
    // template-only pairs: unweighted is boilerplate-dominated (40 of 48
    // votes identical -> small hamming); idf weighting (template weight
    // collapses to 1, rare weight ~log2 n_docs) pushes them further apart
    Seq((1L, 3L), (1L, 5L), (3L, 5L)).foreach { case (a, b) =>
      val p = ham(plain, a, b); val i = ham(idf, a, b)
      assert(i > p,
        s"idf must separate template-only pair ($a,$b): plain=$p idf=$i")
    }
  }

  test("containment confirm: subset doc reads ~1e6 one way, low the other") {
    import org.apache.spark.sql.functions.col
    val passage = "alpha bravo charlie delta echo foxtrot golf hotel " +
      "india juliet kilo lima"
    val docs = Seq(
      (1L, passage),                                  // A: the quote
      (2L, s"$passage mike november oscar"))          // B: superset
      .toDF("doc_id", "text")
    val got = TextQ.containmentConfirm(docs, minJaccard = 0.25)
      .select("doc_a", "doc_b", "n_a", "n_b", "n_common",
        "cont_a_ppm", "cont_b_ppm")
      .as[(Long, Long, Long, Long, Long, Long, Long)].collect()
    assert(got.length == 1, s"A-B must be an LSH candidate: ${got.toSeq}")
    val (a, b, na, nb, nc, ca, cb) = got.head
    assert((a, b) == ((1L, 2L)))
    assert(na == 10L && nb == 13L && nc == 10L, got.head.toString)
    assert(ca == 1000000L, s"A wholly contained: $ca")
    assert(cb == (1000000L * 10 / 13), s"B only partially: $cb")
  }

  test("cross-source dup matrix: mirrors charge the right (source, source) cell") {
    import org.apache.spark.sql.functions.col
    val mirror = "the quick brown fox jumps over the lazy dog again and " +
      "again until the fence falls over entirely tonight"
    def fresh(i: Long) = s"totally distinct content number $i with words " +
      s"w${i}a w${i}b w${i}c w${i}d w${i}e w${i}f w${i}g w${i}h w${i}i w${i}j"
    val docs = Seq(
      (1L, mirror, "crawlA"), (2L, mirror, "crawlB"), // cross-source mirror
      (3L, mirror, "crawlA"),                         // intra-A dup of 1
      (4L, fresh(4), "crawlA"), (5L, fresh(5), "crawlB"))
      .toDF("doc_id", "text", "source")
    val got = TextQ.crossSourceDupMatrix(docs)
      .select("src_x", "src_y", "n_pairs")
      .as[(String, String, Long)].collect().toSet
    // pairs: (1,2) A-B, (1,3) A-A, (2,3) A-B → diagonal 1, off-diagonal 2
    assert(got == Set(("crawlA", "crawlA", 1L), ("crawlA", "crawlB", 2L)),
      got.toString)
  }
}
