package graft

import org.apache.spark.sql.functions._

import graft.queries.{GraphQ, TokenizerQ}

/** BPE merge learning and candidate-graph PageRank (round 5). */
class TokenizerGraphSpec extends SparkSpec {

  import spark.implicits._

  private def docsOf(texts: String*) =
    texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("doc_id", "text")

  test("BPE first merge is the most frequent adjacent pair, greedily applied") {
    // 'ab' appears: 3 (abab ×2? no—) count pairs by word freq:
    // words: "abab" ×2, "aaa" ×1 → pairs: (a,b)=2·2=4, (b,a)=2·1=2, (a,a)=2
    val docs = docsOf("abab abab aaa")
    val m = TokenizerQ.bpeMerges(docs, rounds = 1).collect()
    assert(m.length == 1)
    assert(m(0).getAs[String]("left_sym") == "a")
    assert(m(0).getAs[String]("right_sym") == "b")
    assert(m(0).getAs[String]("merged") == "ab")
    assert(m(0).getAs[Long]("pair_freq") == 4L)
  }

  test("BPE merge is leftmost-first non-overlapping: 'aaa' + (a,a) -> [aa, a]") {
    val docs = docsOf("aaaa aaa aa")
    val m = TokenizerQ.bpeMerges(docs, rounds = 1).collect()
    assert(m(0).getAs[String]("merged") == "aa")
    // after merging (a,a): aaaa->2 toks, aaa->2 toks (aa+a), aa->1 tok
    val counts = TokenizerQ.bpeTokenCounts(docs, rounds = 1)
      .select("n_words", "n_chars", "n_bpe_tokens").as[(Long, Long, Long)]
      .collect().head
    assert(counts == ((3L, 9L, 5L)))
  }

  test("BPE merged symbol participates in later rounds") {
    // round 1 merges the dominant (a,b) -> 'ab'; round 2 must be able to
    // pick a pair whose left side IS 'ab' ('ab','c') from "abc" words
    val docs = docsOf("abc abc abc ab ab")
    val m = TokenizerQ.bpeMerges(docs, rounds = 2).collect()
    assert(m(0).getAs[String]("merged") == "ab")
    assert(m(0).getAs[Long]("pair_freq") == 5L)
    assert(m(1).getAs[String]("left_sym") == "ab")
    assert(m(1).getAs[String]("right_sym") == "c")
    assert(m(1).getAs[Long]("pair_freq") == 3L)
  }

  test("BPE fails loudly when rounds exceed available merges") {
    val docs = docsOf("ab ab")
    intercept[IllegalStateException](
      TokenizerQ.bpeMerges(docs, rounds = 5).collect())
  }

  test("BPE batch=m equals sequential m=1 when top pairs are disjoint") {
    // distinct-frequency disjoint pairs: (a,b)x5, (c,d)x3, (e,f)x2 —
    // merging one changes no other's count, so one batched round of 3
    // must reproduce three sequential rounds merge-for-merge
    val docs = docsOf("ab ab ab ab ab cd cd cd ef ef")
    val seq1 = TokenizerQ.bpeMerges(docs, rounds = 3, batch = 1)
      .orderBy("round").collect().map(_.toSeq).toSeq
    val bat3 = TokenizerQ.bpeMerges(docs, rounds = 3, batch = 3)
      .orderBy("round").collect().map(_.toSeq).toSeq
    assert(seq1 == bat3, s"batched diverged:\n$seq1\n$bat3")
    // the apply path must agree too
    val c1 = TokenizerQ.bpeTokenCounts(docs, rounds = 3, batch = 1)
      .orderBy("doc_id").collect().map(_.toSeq).toSeq
    val c3 = TokenizerQ.bpeTokenCounts(docs, rounds = 3, batch = 3)
      .orderBy("doc_id").collect().map(_.toSeq).toSeq
    assert(c1 == c3)
  }

  test("BPE batch skips conflicting pairs and picks the next disjoint one") {
    // (a,b)x5 and (b,c)x3 share 'b'; (d,e)x2 is disjoint. A batch of 2
    // must keep (a,b) then skip (b,c) and take (d,e); the skipped pair
    // remains available to the NEXT round
    val docs = docsOf("ab ab ab ab ab bc bc bc de de")
    val m = TokenizerQ.bpeMerges(docs, rounds = 3, batch = 2)
      .orderBy("round").collect()
    assert(m(0).getAs[String]("merged") == "ab", m.mkString(","))
    assert(m(1).getAs[String]("merged") == "de", m.mkString(","))
    assert(m(2).getAs[String]("merged") == "bc", m.mkString(","))
  }

  test("BPE follow-up merge onto a fresh product lands the next batch round") {
    // batch round 1 merges (a,b); the (ab,c) pair only EXISTS once 'ab'
    // does, so it must surface in round 2's candidates and merge second —
    // same two merges sequential BPE learns, across one batch boundary
    val docs = docsOf("abc abc abc ab ab")
    val m = TokenizerQ.bpeMerges(docs, rounds = 2, batch = 2)
      .orderBy("round").collect()
    assert(m(0).getAs[String]("merged") == "ab")
    assert(m(1).getAs[String]("left_sym") == "ab")
    assert(m(1).getAs[String]("right_sym") == "c")
    // round numbering stays the merge index even across batch rounds
    assert(m.map(_.getAs[Long]("round")).toSeq == Seq(1L, 2L))
  }

  test("BPE token counts shrink monotonically with more merges") {
    val docs = graft.core.Tables.load(spark, sfDir, "documents")
    val t1 = TokenizerQ.bpeTokenCounts(docs, rounds = 1)
      .agg(sum("n_bpe_tokens")).as[Long].head()
    val t3 = TokenizerQ.bpeTokenCounts(docs, rounds = 3)
      .agg(sum("n_bpe_tokens")).as[Long].head()
    val chars = TokenizerQ.bpeTokenCounts(docs, rounds = 1)
      .agg(sum("n_chars")).as[Long].head()
    assert(t3 < t1, s"more merges must compress: r3=$t3 !< r1=$t1")
    assert(t1 < chars, s"one merge must beat char-level: $t1 !< $chars")
  }

  test("pagerank matches a hand-rolled integer fixed point on a known graph") {
    // path a-b-c plus pendant d on b: degrees a=1,b=3,c=1,d=1
    val pairs = Seq((1L, 2L), (2L, 3L), (2L, 4L))
      .toDF("doc_a", "doc_b")
    val got = GraphQ.pagerankPpm(pairs, iterations = 3)
      .orderBy("doc_id")
      .select("doc_id", "rank_ppm", "degree").as[(Long, Long, Long)]
      .collect()
    // replay the exact integer recurrence in Scala
    val edges = Seq(1L -> 2L, 2L -> 1L, 2L -> 3L, 3L -> 2L, 2L -> 4L, 4L -> 2L)
    val deg = edges.groupBy(_._1).view.mapValues(_.size.toLong).toMap
    var rank = deg.keys.map(_ -> 1000000L).toMap
    for (_ <- 1 to 3) {
      val in = edges.groupBy(_._2).view.mapValues(
        _.map { case (u, _) => rank(u) / deg(u) }.sum).toMap
      rank = in.map { case (v, s) => v -> (150000L + 850000L * s / 1000000L) }
    }
    val want = rank.toSeq.sortBy(_._1)
      .map { case (k, v) => (k, v, deg(k)) }
    assert(got.toSeq == want)
    // the hub must dominate its leaves
    val byId = got.map(r => r._1 -> r._2).toMap
    assert(byId(2L) > byId(1L) && byId(2L) > byId(4L))
    // symmetric leaves tie
    assert(byId(1L) == byId(4L))
  }

  test("pagerank mass stays near uniform total (teleport conserves ppm)") {
    val pairs = Seq((1L, 2L), (2L, 3L), (3L, 1L)).toDF("doc_a", "doc_b")
    val ranks = GraphQ.pagerankPpm(pairs, iterations = 4)
      .select("rank_ppm").as[Long].collect()
    // a symmetric cycle is already at the fixed point: every rank is
    // exactly 1e6 minus only integer-division dust
    assert(ranks.forall(r => r >= 999998L && r <= 1000000L), ranks.toSeq)
  }

  test("pagerank validates parameters") {
    val pairs = Seq((1L, 2L)).toDF("doc_a", "doc_b")
    intercept[IllegalArgumentException](GraphQ.pagerankPpm(pairs, 0))
    intercept[IllegalArgumentException](
      GraphQ.pagerankPpm(pairs, 1, dampPpm = 2000000L))
  }

  test("canonical-by-centrality keeps exactly the hub of each component") {
    // component A: star around 2 (2-1, 2-3, 2-4); component B: pair 10-11
    val pairs = Seq((1L, 2L), (2L, 3L), (2L, 4L), (10L, 11L))
      .toDF("doc_a", "doc_b")
    val got = GraphQ.canonicalByCentrality(pairs)
      .select("doc_id", "component", "is_canonical")
      .as[(Long, Long, Boolean)].collect().toSeq.sortBy(_._1)
    val canon = got.filter(_._3).map(g => g._2 -> g._1).toMap
    assert(canon(1L) == 2L, s"star hub must be canonical: $got")
    assert(canon(10L) == 10L, s"symmetric pair ties break to min id: $got")
    // exactly one canonical per component
    assert(got.filter(_._3).map(_._2).distinct.size == 2)
    assert(got.groupBy(_._2).forall { case (_, ms) => ms.count(_._3) == 1 })
  }

  test("novelty curve counts first occurrences per batch, cumulative uniques") {
    import graft.queries.TextQ
    // batch 0: ids 0,1,2 (1 and 2 duplicate content); batch 1: ids 10
    // (dup of 0 — NOT novel), 11 (new)
    val docs = Seq(
      (0L, "alpha"), (1L, "beta"), (2L, "beta"),
      (10L, "alpha"), (11L, "gamma"))
      .toDF("doc_id", "text")
    val got = TextQ.noveltyCurve(docs, batchSize = 10L)
      .orderBy(col("batch"))
      .select("batch", "n_docs", "n_novel", "novelty_ppm", "cum_unique")
      .as[(Long, Long, Long, Long, Long)].collect().toSeq
    assert(got == Seq((0L, 3L, 2L, 666666L, 2L), (1L, 2L, 1L, 500000L, 3L)),
      got.toString)
  }

  test("self-retrieval finds distinctive origins at rank 1, MRR exact") {
    import graft.queries.TextQ
    // distinct vocabularies → each snippet-query re-finds its origin
    val docs = Seq(
      (0L, "alpha beta gamma delta alpha beta"),
      (25L, "epsilon zeta eta theta epsilon zeta"),
      (50L, "iota kappa lam mu iota kappa"),
      (7L, "noise words here only"))
      .toDF("doc_id", "text")
    val got = TextQ.selfRetrievalEval(docs, sampleMod = 25L,
      snippetToks = 4, topK = 3)
      .select("n_queries", "hit_at_1", "hit_at_k", "mrr_ppm")
      .as[(Long, Long, Long, Long)].collect().head
    assert(got == ((3L, 3L, 3L, 1000000L)), got.toString)
  }

  test("self-retrieval on a realistic planted vocabulary: group-shared + " +
      "per-doc tokens, every origin re-found") {
    import graft.queries.TextQ
    // the q149 fixture's 31-token corpus vocabulary makes every query
    // match every doc (documented degenerate case); this corpus has the
    // REAL shape — tokens shared within ~25-doc groups plus per-doc
    // distinctive tokens — so the candidate join is query-vocab-bounded
    val docs = spark.range(500).selectExpr("id AS doc_id",
      """concat(
         'grp', CAST(id DIV 25 AS STRING), 'a ',
         'grp', CAST(id DIV 25 AS STRING), 'b ',
         'grp', CAST(id DIV 25 AS STRING), 'c ',
         'grp', CAST(id DIV 25 AS STRING), 'd ',
         'doc', CAST(id AS STRING), 'a ',
         'doc', CAST(id AS STRING), 'b ',
         'doc', CAST(id AS STRING), 'c ',
         'doc', CAST(id AS STRING), 'd ',
         'fil', CAST(id AS STRING), 'e ',
         'fil', CAST(id AS STRING), 'f ') AS text""")
    val got = TextQ.selfRetrievalEval(docs, sampleMod = 5L,
      snippetToks = 8, topK = 3)
      .select("n_queries", "hit_at_1", "hit_at_k", "mrr_ppm")
      .as[(Long, Long, Long, Long)].collect().head
    // 100 queries; the 4 per-doc snippet tokens are unique to the
    // origin, so BM25 must rank it first for every query
    assert(got == ((100L, 100L, 100L, 1000000L)), got.toString)
  }

  test("domain affinity ranks target-characteristic docs above generic ones") {
    import graft.queries.CurationQ
    val docs = Seq(
      (1L, "alpha alpha beta", "en"),   // target, characteristic tokens
      (2L, "alpha beta beta", "en"),    // target
      (3L, "alpha alpha alpha", "de"),  // non-target but target-like text
      (4L, "gamma gamma delta", "de"),  // non-target, disjoint vocabulary
      (5L, "gamma delta delta", "de"))
      .toDF("doc_id", "text", "lang")
    val got = CurationQ.domainAffinity(docs, col("lang") === "en")
      .select("doc_id", "affinity_ppm").as[(Long, Long)].collect().toMap
    assert(got(3L) > got(4L),
      s"target-like vocabulary must outscore disjoint vocabulary: $got")
    assert(got(1L) > got(4L) && got(2L) > got(5L), got.toString)
    // disjoint-vocab docs sit below the neutral 1e6 line, target docs above
    assert(got(4L) < 1000000L && got(1L) > 1000000L, got.toString)
  }

  private def graphOf(edges: (Long, Long)*) =
    edges.toDF("doc_a", "doc_b")

  test("triangleStats: a 4-clique is fully clustered, a path is not") {
    // K4 on 1..4 plus the path 4-5-6: node 4 bridges both
    val g = graphOf((1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L),
      (3L, 4L), (4L, 5L), (5L, 6L))
    val got = GraphQ.triangleStats(g).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3))))
      .toMap
    // clique members: deg 3, all 3 of their triangles, cc = 1e6
    assert(got(1L) == ((3L, 3L, 1000000L)), got.toString)
    assert(got(2L) == ((3L, 3L, 1000000L)), got.toString)
    assert(got(3L) == ((3L, 3L, 1000000L)), got.toString)
    // bridge: deg 4 (+edge to 5), still only the 3 clique triangles:
    // cc = 2*3*1e6/(4*3) = 500000
    assert(got(4L) == ((4L, 3L, 500000L)), got.toString)
    // path interior and leaf: no triangles; deg-1 leaf reports 0 ppm
    assert(got(5L) == ((2L, 0L, 0L)), got.toString)
    assert(got(6L) == ((1L, 0L, 0L)), got.toString)
  }

  test("triangleStats: hub-and-spoke star has zero clustering at high degree") {
    // the over-merge signature: one template doc 'linked' to 6 unrelated
    // docs — high degree, zero triangles
    val g = graphOf((1L, 2L), (1L, 3L), (1L, 4L), (1L, 5L), (1L, 6L), (1L, 7L))
    val got = GraphQ.triangleStats(g).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3))))
      .toMap
    assert(got(1L) == ((6L, 0L, 0L)), got.toString)
    assert(got(2L) == ((1L, 0L, 0L)), got.toString)
  }

  test("triangleStats normalizes unordered/duplicate/self edges") {
    // same triangle given with flipped orientation, a dup edge and a
    // self loop: counts must not inflate
    val g = graphOf((2L, 1L), (2L, 3L), (1L, 3L), (3L, 2L), (3L, 3L))
    val got = GraphQ.triangleStats(g).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3))))
      .toMap
    assert(got == Map(1L -> ((2L, 1L, 1000000L)), 2L -> ((2L, 1L, 1000000L)),
      3L -> ((2L, 1L, 1000000L))), got.toString)
  }

  test("triangleStats degree orientation matches a naive reference on a random graph") {
    val rnd = new scala.util.Random(7)
    val edges = (1 to 240).map { _ =>
      (rnd.nextInt(30).toLong, rnd.nextInt(30).toLong)
    }.filter { case (a, b) => a != b }.distinct
    val adj: Map[Long, Set[Long]] = {
      val sym = edges.flatMap { case (a, b) => Seq(a -> b, b -> a) }
      sym.groupBy(_._1).map { case (k, vs) => k -> vs.map(_._2).toSet }
    }
    val expected = adj.map { case (n, ns) =>
      val tri = ns.toSeq.combinations(2)
        .count { case Seq(x, y) => adj(x).contains(y) }
      n -> ((ns.size.toLong, tri.toLong,
        if (ns.size < 2) 0L
        else 2L * tri * 1000000L / (ns.size.toLong * (ns.size - 1L))))
    }
    val got = GraphQ.triangleStats(graphOf(edges: _*)).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3))))
      .toMap
    assert(got == expected)
  }
}
