package graft

import org.apache.spark.sql.functions._

import graft.queries.{CurationQ, Relational, TextQ, VectorQ}

/** Curation operators (SURVEY §2C additions round 3): deterministic
  * sampling, PII redaction, TF-IDF, Bloom-prefiltered decontamination and
  * int8-quantized ANN.
  */
class CurationSpec extends SparkSpec {

  import spark.implicits._

  private lazy val docs = graft.core.Tables.load(spark, sfDir, "documents")

  test("stratified sample is deterministic and respects per-stratum rates") {
    val rates = Map("en" -> 20, "de" -> 50, "es" -> 50, "fr" -> 50, "zh" -> 50)
    val s1 = CurationQ.stratifiedSample(docs, "lang", rates)
      .select("doc_id").as[Long].collect().sorted
    val s2 = CurationQ.stratifiedSample(docs, "lang", rates)
      .select("doc_id").as[Long].collect().sorted
    assert(s1.sameElements(s2), "same docs on every run")
    // per-stratum keep fraction ≈ rate (md5 buckets, so binomial noise):
    // just assert the en rate is well below the others' on this fixture
    val kept = CurationQ.stratifiedSample(docs, "lang", rates)
      .groupBy("lang").count().as[(String, Long)].collect().toMap
    val total = docs.groupBy("lang").count().as[(String, Long)].collect().toMap
    val enFrac = kept("en").toDouble / total("en")
    val deFrac = kept("de").toDouble / total("de")
    assert(enFrac < deFrac, s"en=$enFrac must undersample vs de=$deFrac")
    assert(enFrac > 0.05 && enFrac < 0.40, s"en frac out of band: $enFrac")
  }

  test("stratified sample validates rates and stratum keys") {
    intercept[IllegalArgumentException](
      CurationQ.stratifiedSample(docs, "lang", Map("en" -> 101)))
    intercept[IllegalArgumentException](
      CurationQ.stratifiedSample(docs, "lang", Map.empty))
    intercept[IllegalArgumentException](
      CurationQ.stratifiedSample(docs, "lang", Map("x' OR '1" -> 10)))
  }

  test("uniform sample returns exactly N, stable, via TakeOrderedAndProject") {
    val s = CurationQ.uniformSampleN(docs, 37)
    assert(s.count() == 37)
    val a = s.select("doc_id").as[Long].collect().sorted
    val b = CurationQ.uniformSampleN(docs, 37).select("doc_id").as[Long].collect().sorted
    assert(a.sameElements(b))
    val plan = s.queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"), plan)
  }

  test("redactPii strips emails, IPs and phones; counts each span once") {
    val df = Seq(
      (1L, "mail bob.smith@corp.example.org and 192.168.1.254 then +4915512345678"),
      (2L, "no pii here at all"),
      (3L, "two mails a@b.co c@d.io one ip 10.0.0.1")).toDF("doc_id", "raw")
    val r = CurationQ.redactPii(df, "raw")
      .select("doc_id", "n_email", "n_ip", "n_phone", "redacted")
      .as[(Long, Long, Long, Long, String)].collect().sortBy(_._1)
    assert(r(0) == ((1L, 1L, 1L, 1L, "mail <EMAIL> and <IP> then <PHONE>")))
    assert(r(1) == ((2L, 0L, 0L, 0L, "no pii here at all")))
    assert(r(2) == ((3L, 2L, 1L, 0L, "two mails <EMAIL> <EMAIL> one ip <IP>")))
  }

  test("cardScan validates Luhn checksums and enforces length bounds") {
    val df = Seq(
      // canonical valid test number
      (1L, "pay 4532015112830366 now"),
      // same digits, last one bumped: checksum must fail
      (2L, "pay 4532015112830367 now"),
      // 12 digits (too short) and 20 digits (too long): not candidates
      (3L, "id 123456789012 and 12345678901234567890"),
      // two valid runs in one doc; hash covers both, sorted
      (4L, "a 4532015112830366 b 6011000990139424"),
      (5L, "no digits at all")).toDF("doc_id", "raw")
    val r = CurationQ.cardScan(df, "raw")
      .select("doc_id", "n_candidates", "n_valid")
      .as[(Long, Long, Long)].collect().sortBy(_._1)
    assert(r(0) == ((1L, 1L, 1L)), r(0).toString)
    assert(r(1) == ((2L, 1L, 0L)), r(1).toString)
    assert(r(2) == ((3L, 0L, 0L)), r(2).toString)
    assert(r(3) == ((4L, 2L, 2L)), r(3).toString)
    assert(r(4) == ((5L, 0L, 0L)), r(4).toString)
    // a 20-digit run never leaks a 19-digit sub-candidate
    val runs = CurationQ.cardScan(df, "raw")
      .filter(col("doc_id") === 3L)
      .select("card_candidates").as[Seq[String]].collect().head
    assert(runs.isEmpty, runs.toString)
  }

  test("rakeWeights equals an independent IPF replication and balances margins") {
    def naiveRake(cells: Seq[(String, String, Long)],
        rounds: Int): Map[(String, String), Long] = {
      val n = BigInt(cells.map(_._3).sum)
      val ta = (n * 1000000) / cells.map(_._1).distinct.size
      val tb = (n * 1000000) / cells.map(_._2).distinct.size
      var w = cells.map(c => (c._1, c._2) -> BigInt(1000000)).toMap
      for (_ <- 1 to rounds) {
        val ma = cells.groupBy(_._1).map { case (a, g) =>
          a -> g.map(c => BigInt(c._3) * w((c._1, c._2))).sum }
        w = cells.map(c =>
          (c._1, c._2) -> (w((c._1, c._2)) * ta / ma(c._1)).max(1)).toMap
        val mb = cells.groupBy(_._2).map { case (b, g) =>
          b -> g.map(c => BigInt(c._3) * w((c._1, c._2))).sum }
        w = cells.map(c =>
          (c._1, c._2) -> (w((c._1, c._2)) * tb / mb(c._2)).max(1)).toMap
      }
      w.map { case (k, v) => k -> v.toLong }
    }
    val rnd = new scala.util.Random(31)
    for (trial <- 1 to 3) {
      val cells = (for (a <- 1 to 3; b <- 1 to 3
        if rnd.nextDouble() > 0.2)
        yield (s"s$a", s"l$b", 1L + rnd.nextInt(50))).toSeq
      val rows = cells.flatMap { case (a, b, c) =>
        Seq.fill(c.toInt)((a, b)) }
      val df = rows.toDF("source", "lang")
      val got = CurationQ.rakeWeights(df, "source", "lang")
        .select("a", "b", "weight_ppm").as[(String, String, Long)]
        .collect().map(r => (r._1, r._2) -> r._3).toMap
      assert(got == naiveRake(cells, 3), s"trial $trial diverged")
    }
    // margin balance: a 9x-skewed 2x2 ends with near-equal row masses
    val skew = Seq.fill(90)(("s1", "en")) ++ Seq.fill(10)(("s1", "de")) ++
      Seq.fill(10)(("s2", "en")) ++ Seq.fill(90)(("s2", "de"))
    val w = CurationQ.rakeWeights(skew.toDF("source", "lang"),
        "source", "lang", rounds = 6)
      .select("a", "b", "o", "weight_ppm")
      .as[(String, String, Long, Long)].collect()
    val rowMass = w.groupBy(_._1).map { case (a, g) =>
      a -> g.map(c => c._3 * c._4).sum }
    val Seq(m1, m2) = rowMass.values.toSeq.sorted
    assert((m2 - m1).toDouble / m2 < 0.01, rowMass.toString)
  }

  test("tfidf ranks rare terms above corpus-wide ones") {
    val corpus = Seq(
      (1L, "common common rare1"),
      (2L, "common zebra zebra zebra"),
      (3L, "common plain")).toDF("doc_id", "text")
    val top = CurationQ.tfidfTop(corpus, perDoc = 1)
      .select("doc_id", "tok").as[(Long, String)].collect().toMap
    // 'common' is in every doc (df=3 → idf 1M·3/3=1M); rare terms df=1 → 3M
    assert(top(1L) == "rare1")
    assert(top(2L) == "zebra")
    assert(top(3L) == "plain")
  }

  test("bloom decontamination returns exactly the exact-join result") {
    val train = docs.filter(col("doc_id") % 89 =!= 0)
    val eval = docs.filter(col("doc_id") % 89 === 0)
    val exact = TextQ.decontaminationHits(train, eval)
      .as[(Long, Long)].collect().sortBy(_._1)
    // even a sloppy 30% fpp sketch must not change the answer — the
    // confirm join removes every false positive
    val bloom = TextQ.decontaminationHitsBloom(train, eval, fpp = 0.3)
      .as[(Long, Long)].collect().sortBy(_._1)
    assert(bloom.sameElements(exact))
    assert(exact.nonEmpty, "fixture must actually have contamination hits")
  }

  test("int8 quantization bounds components and zero-vectors quantize to zero") {
    val vecs = Seq(
      (1L, Array(0.5f, -1.0f, 0.25f)),
      (2L, Array(0.0f, 0.0f, 0.0f))).toDF("vec_id", "embedding")
    val q = VectorQ.quantizeInt8(vecs)
      .select("vec_id", "qv").as[(Long, Array[Long])].collect().toMap
    assert(q(1L).sameElements(Array(64L, -127L, 32L))) // 0.5*127=63.5→64
    assert(q(2L).sameElements(Array(0L, 0L, 0L)))
    val fixture = VectorQ.quantizeInt8(
      graft.core.Tables.load(spark, sfDir, "embeddings"))
    val mx = fixture.select(max(expr(
      "array_max(transform(qv, x -> abs(x)))"))).head.getLong(0)
    assert(mx <= 127L, s"quantized component out of int8 range: $mx")
  }

  test("boilerplate chunks: repeated segments drop, text rebuilds in order") {
    val corpus = Seq(
      (1L, "copyright notice acme corp all rights reserved alpha beta unique one two"),
      (2L, "copyright notice acme corp all rights reserved gamma delta something else here"),
      (3L, "copyright notice acme corp all rights reserved epsilon zeta other words go"),
      (4L, "copyright notice acme corp all rights reserved"),
      (5L, "entirely original document with no shared text")).toDF("doc_id", "text")
    // 7-word chunks: docs 1-4 share the leading 7-word copyright banner
    // (4 docs > maxDocs=2 → boilerplate); their tails are unique and kept
    val r = CurationQ.boilerplateChunks(corpus, chunkWords = 7, maxDocs = 2)
      .select("doc_id", "n_chunks", "n_kept", "cleaned")
      .as[(Long, Long, Long, String)].collect().sortBy(_._1)
    assert(r(0) == ((1L, 2L, 1L, "alpha beta unique one two")))
    assert(r(1) == ((2L, 2L, 1L, "gamma delta something else here")))
    assert(r(2) == ((3L, 2L, 1L, "epsilon zeta other words go")))
    // doc 4 is ALL boilerplate — must survive with empty text, not vanish
    assert(r(3) == ((4L, 1L, 0L, "")))
    assert(r(4) == ((5L, 1L, 1L, "entirely original document with no shared text")))
  }

  test("boilerplate chunks reassemble multi-chunk docs in document order") {
    // 12 words at chunkWords=3 → 4 chunks; none repeated → text unchanged
    val one = Seq((9L, "w01 w02 w03 w04 w05 w06 w07 w08 w09 w10 w11 w12"))
      .toDF("doc_id", "text")
    val r = CurationQ.boilerplateChunks(one, chunkWords = 3, maxDocs = 1)
      .select("n_chunks", "cleaned").as[(Long, String)].head()
    assert(r == ((4L, "w01 w02 w03 w04 w05 w06 w07 w08 w09 w10 w11 w12")))
  }

  test("sequence packing: offsets bounded, bins monotone, totals conserved") {
    val budget = 256
    val packed = CurationQ.packSequences(docs, "source", budget)
      .select("source", "doc_id", "n_tokens", "end_tok", "bin", "offset")
      .as[(String, Long, Long, Long, Long, Long)].collect()
    assert(packed.nonEmpty)
    packed.foreach { case (_, id, n, end, bin, off) =>
      assert(off >= 0 && off < budget, s"doc $id offset $off out of [0,$budget)")
      assert(bin == (end - n) / budget, s"doc $id bin/cumsum mismatch")
    }
    packed.groupBy(_._1).foreach { case (src, rows) =>
      val ordered = rows.sortBy(_._2)
      // first doc of each shard starts the first sequence at position 0
      assert(ordered.head._5 == 0L && ordered.head._6 == 0L, s"shard $src start")
      // bins never decrease as docs concatenate
      assert(ordered.map(_._5).sliding(2).forall(p => p.length < 2 || p(0) <= p(1)))
      // the running total ends at the shard's token sum (nothing dropped)
      assert(ordered.last._4 == ordered.map(_._3).sum, s"shard $src total")
    }
  }

  test("curation verdict: every filter sets its own reason bit") {
    val corpus = Seq(
      (1L, (1 to 40).map(i => if (i % 5 == 0) "the" else s"w$i").mkString(" ")), // clean → keep
      (2L, "too short but the of and"),                          // bit 1
      (3L, "zz yy xx ww vv uu tt ss rr qq pp oo nn mm ll " * 2), // bit 2 (no stopwords)
      (4L, "the of and " + Seq.fill(40)("loop loop loop").mkString(" ")), // bit 4
      (5L, ("the of and data row mail bob@x.io now " * 5).trim)  // bit 8
    ).toDF("doc_id", "text")
    val v = CurationQ.curationVerdict(corpus)
      .select("doc_id", "reason", "keep").as[(Long, Long, Long)]
      .collect().map(r => r._1 -> (r._2, r._3)).toMap
    assert(v(1L) == ((0L, 1L)), s"clean doc: ${v(1L)}")
    assert((v(2L)._1 & 1L) != 0 && v(2L)._2 == 0L, s"short: ${v(2L)}")
    assert((v(3L)._1 & 2L) != 0 && v(3L)._2 == 0L, s"gibberish: ${v(3L)}")
    assert((v(4L)._1 & 4L) != 0 && v(4L)._2 == 0L, s"repetitive: ${v(4L)}")
    assert((v(5L)._1 & 8L) != 0 && v(5L)._2 == 0L, s"pii: ${v(5L)}")
    // reasons accumulate: a short gibberish doc carries both bits
    val both = CurationQ.curationVerdict(
        Seq((9L, "xq zr wt")).toDF("doc_id", "text"))
      .select("reason").as[Long].head()
    assert((both & 1L) != 0 && (both & 2L) != 0, s"expected 1|2 in $both")
  }

  test("mixture weights hit the target mix by downsampling only") {
    val targets = Seq("de", "en", "es", "fr", "zh").map(_ -> 200000L).toMap
    val w = CurationQ.mixtureWeights(docs, "lang", targets)
      .select("lang", "n_docs", "rate_ppm", "expected_kept")
      .as[(String, Long, Long, Long)].collect()
    assert(w.length == targets.size)
    w.foreach { case (lang, n, rate, kept) =>
      assert(rate >= 0 && rate <= 1000000, s"$lang rate $rate")
      assert(kept <= n, s"$lang asked to produce $kept of $n docs")
    }
    // the binding (scarcest-vs-target) stratum keeps ~everything
    assert(w.map(_._3).max >= 999000, s"no stratum at full rate: ${w.toSeq}")
    // equal targets → expected counts equal up to ppm rounding
    val keps = w.map(_._4)
    assert(keps.max - keps.min <= 1, s"unequal mix: ${w.toSeq}")
    // the applied filter lands within binomial noise of expectation
    val got = CurationQ.rebalanceToMix(docs, "lang", targets)
      .groupBy("lang").count().as[(String, Long)].collect().toMap
    w.foreach { case (lang, n, _, kept) =>
      val tol = math.max(6.0, 4 * math.sqrt(n.toDouble)) // ±4σ
      assert(math.abs(got.getOrElse(lang, 0L) - kept) <= tol,
        s"$lang kept ${got.getOrElse(lang, 0L)} vs expected $kept (n=$n)")
    }
  }

  test("mixture weights validate targets") {
    intercept[IllegalArgumentException](
      CurationQ.mixtureWeights(docs, "lang", Map.empty))
    intercept[IllegalArgumentException](
      CurationQ.mixtureWeights(docs, "lang", Map("en" -> 0L)))
    intercept[IllegalArgumentException](
      CurationQ.mixtureWeights(docs, "lang", Map("en" -> 1000001L)))
  }

  test("mixture weights fail loudly when a target stratum has no docs") {
    val ex = intercept[Exception] {
      CurationQ.mixtureWeights(docs, "lang",
        Map("en" -> 500000L, "xx" -> 500000L)).collect()
    }
    assert(ex.getMessage != null &&
      (ex.getMessage.contains("absent from corpus") ||
        Option(ex.getCause).exists(_.getMessage.contains("absent from corpus"))),
      s"unexpected failure: $ex")
  }

  test("lm transition score ranks natural text above shuffled gibberish") {
    // corpus with a strong bigram structure: "a b" dominates transitions
    val natural = Seq.tabulate(8)(i => (i.toLong, "a b a b a b a b a b"))
    val gibberish = Seq((100L, "b b a a b a a b b a"))
    val scores = CurationQ.lmTransitionScore(
        (natural ++ gibberish).toDF("doc_id", "text"))
      .select("doc_id", "avg_ppm").as[(Long, Long)].collect().toMap
    assert(scores(0L) > scores(100L),
      s"natural ${scores(0L)} must outscore shuffled ${scores(100L)}")
    // single-token docs carry no bigram — they drop out, not crash
    val one = CurationQ.lmTransitionScore(Seq((7L, "solo")).toDF("doc_id", "text"))
    assert(one.count() == 0)
  }

  test("chunk overlap: strided windows cover every token, short docs survive") {
    val r = CurationQ.chunkOverlap(
        Seq((1L, "t1 t2 t3 t4 t5 t6 t7 t8"), (2L, "tiny doc")).toDF("doc_id", "text"),
        window = 4, stride = 2)
      .select("doc_id", "chunk_idx", "chunk")
      .as[(Long, Long, String)].collect().sortBy(c => (c._1, c._2))
    // 8 tokens, w=4 s=2 → ceil(4/2)+1 = 3 chunks, overlapping by 2
    assert(r.filter(_._1 == 1L).map(_._3).toSeq == Seq(
      "t1 t2 t3 t4", "t3 t4 t5 t6", "t5 t6 t7 t8"))
    // shorter than the window → its single (whole-doc) chunk
    assert(r.filter(_._1 == 2L).map(_._3).toSeq == Seq("tiny doc"))
    intercept[IllegalArgumentException](
      CurationQ.chunkOverlap(docs, window = 2, stride = 3))
  }

  test("per-stratum cap keeps exactly min(n, stratum size), stably") {
    val capped = CurationQ.capPerStratum(docs, "lang", 60)
    val byLang = capped.groupBy("lang").count().as[(String, Long)].collect().toMap
    val totals = docs.groupBy("lang").count().as[(String, Long)].collect().toMap
    totals.foreach { case (lang, n) =>
      assert(byLang.getOrElse(lang, 0L) == math.min(60L, n), s"$lang: ${byLang.get(lang)}")
    }
    // stable across runs and partitionings
    val a = capped.select("doc_id").as[Long].collect().sorted
    val b = CurationQ.capPerStratum(docs.repartition(7), "lang", 60)
      .select("doc_id").as[Long].collect().sorted
    assert(a.sameElements(b))
    // a huge cap keeps everything
    assert(CurationQ.capPerStratum(docs, "lang", Int.MaxValue).count() == docs.count())
  }

  test("weighted sample keeps higher-weight docs at a higher rate, stably") {
    import org.apache.spark.sql.functions.{expr, lit}
    val a = CurationQ.weightedSample(docs, expr("least(1000000L, n_chars * 2000L)"))
      .select("doc_id").as[Long].collect().sorted
    val b = CurationQ.weightedSample(docs.repartition(9),
        expr("least(1000000L, n_chars * 2000L)"))
      .select("doc_id").as[Long].collect().sorted
    assert(a.sameElements(b), "same docs on every run and partitioning")
    // weight 1e6 keeps everything; weight 0 keeps nothing
    assert(CurationQ.weightedSample(docs, lit(1000000L)).count() == docs.count())
    assert(CurationQ.weightedSample(docs, lit(0L)).count() == 0)
    // a 30% flat weight lands within binomial noise of 30%
    val n = docs.count().toDouble
    val kept = CurationQ.weightedSample(docs, lit(300000L)).count().toDouble
    assert(math.abs(kept / n - 0.3) < 4 * math.sqrt(0.3 * 0.7 / n),
      s"flat 30% weight kept ${kept / n}")
  }

  test("scd2 builds versioned intervals: abutting, ordered, one current per key") {
    import org.apache.spark.sql.functions.col
    val v = graft.queries.WindowQ.scd2(
        graft.core.Tables.load(spark, sfDir, "events"), "user_id", "ts", "event_id")
      .select(col("user_id"), col("event_id"),
        col("valid_from").cast("long"), col("valid_to").cast("long"))
      .as[(Long, Long, Long, Option[Long])].collect()
    v.groupBy(_._1).foreach { case (uid, rows) =>
      val ordered = rows.sortBy(r => (r._3, r._2))
      // exactly one open-ended current version per key — the latest
      assert(ordered.count(_._4.isEmpty) == 1, s"user $uid currents")
      assert(ordered.last._4.isEmpty, s"user $uid: current must be last")
      // every closed version ends exactly where the next one starts
      ordered.sliding(2).filter(_.length == 2).foreach { pair =>
        val (prev, next) = (pair(0), pair(1))
        assert(prev._4.contains(next._3), s"user $uid: gap at ${prev._2}")
      }
    }
  }

  test("quantized ANN agrees with float ANN on most neighbors") {
    val emb = graft.core.Tables.load(spark, sfDir, "embeddings")
    val fq = VectorQ.annBucketed(emb).select("query_id", "neighbor_id")
      .as[(Long, Long)].collect().toSet
    val iq = VectorQ.annQuantized(emb).select("query_id", "neighbor_id")
      .as[(Long, Long)].collect().toSet
    assert(iq.size == fq.size)
    // int8 ranks by unnormalized dot, float by cosine — identical sets
    // are not expected, but most wildly-nearest neighbors should agree
    val overlap = (fq intersect iq).size.toDouble / fq.size
    assert(overlap >= 0.5, s"quantized/float neighbor overlap too low: $overlap")
  }

  test("span duplication: coverage is an interval union, not span*width") {
    // A's 12 tokens reappear as B's prefix: width-8 spans at starts 0..4
    // are all duplicated, but they overlap — covered tokens must be the
    // union (all 12 of A), not 5 spans x 8 tokens = 40.
    val shared = (1 to 12).map(i => s"t$i").mkString(" ")
    val docs = Seq(
      (1L, shared),
      (2L, shared + " u1 u2 u3 u4"),
      (3L, "v1 v2 v3 v4 v5 v6 v7 v8 v9"), // unique: no duplicated span
      (4L, "w1 w2 w3")                     // shorter than width: no spans
    ).toDF("doc_id", "text")
    val r = TextQ.spanDuplication(docs, width = 8)
      .select($"doc_id", $"n_toks", $"n_spans", $"n_dup_spans",
        $"covered_tokens")
      .as[(Long, Long, Long, Long, Long)].collect().map(t => t._1 -> t).toMap
    assert(r(1L) == ((1L, 12L, 5L, 5L, 12L)))
    assert(r(2L) == ((2L, 16L, 9L, 5L, 12L)))
    assert(r(3L) == ((3L, 9L, 2L, 0L, 0L)))
    assert(r(4L) == ((4L, 3L, 0L, 0L, 0L)))
  }

  test("span duplication: disjoint duplicated regions sum their lengths") {
    val a = (1 to 8).map(i => s"a$i").mkString(" ")
    val b = (1 to 8).map(i => s"b$i").mkString(" ")
    val gap = (1 to 10).map(i => s"g$i").mkString(" ")
    val docs = Seq(
      (1L, s"$a $gap $b"),        // both blocks duplicated, gap unique
      (2L, a), (3L, b)
    ).toDF("doc_id", "text")
    val r = TextQ.spanDuplication(docs, width = 8)
      .where($"doc_id" === 1L)
      .select($"n_dup_spans", $"covered_tokens")
      .as[(Long, Long)].head()
    assert(r == ((2L, 16L)), s"expected two disjoint 8-token blocks: $r")
  }

  test("bm25: rare-term doc outranks common-term doc; k and rn bounded") {
    val docs = Seq(
      (1L, "rare apple pear plum"),
      (2L, "common apple pear plum"),
      (3L, "common pear apple fig"),
      (4L, "common fig plum apple"),
      (5L, "kiwi mango papaya guava")
    ).toDF("doc_id", "text")
    val queries = Seq((1L, "rare common")).toDF("query_id", "qtext")
    val r = TextQ.bm25TopK(docs, queries, topK = 3)
      .select($"doc_id", $"score", $"rn").as[(Long, Long, Long)]
      .collect().sortBy(_._3)
    assert(r.length == 3)
    assert(r.map(_._3).toSeq == Seq(1L, 2L, 3L))
    // 'rare' has df=1 vs 'common' df=3: doc 1 must rank first
    assert(r.head._1 == 1L, s"rare-term doc should win: ${r.toSeq}")
    // docs 2-4 tie on tf/df/dl; doc_id breaks the tie deterministically
    assert(r(1)._1 == 2L && r(2)._1 == 3L)
  }

  test("packed spans: chunks tile exactly; only the last is short") {
    // source A: 10 + 7 + 5 = 22 tokens at seqLen=8 -> chunks of 8, 8, 6;
    // doc 1 spans chunks 0-1, doc 2 spans 1-2, doc 3 sits inside chunk 2.
    def txt(p: String, n: Int) = (1 to n).map(i => s"$p$i").mkString(" ")
    val docs = Seq(
      (1L, "A", txt("a", 10)), (2L, "A", txt("b", 7)), (3L, "A", txt("c", 5)),
      (4L, "B", txt("d", 3))
    ).toDF("doc_id", "source", "text")
    val r = CurationQ.packedChunkSpans(docs, seqLen = 8)
      .select($"source", $"chunk_id", $"doc_id", $"offset_in_chunk",
        $"n_chunk_toks")
      .as[(String, Long, Long, Long, Long)].collect().toSet
    assert(r == Set(
      ("A", 0L, 1L, 0L, 8L), ("A", 1L, 1L, 0L, 2L),
      ("A", 1L, 2L, 2L, 6L), ("A", 2L, 2L, 0L, 1L),
      ("A", 2L, 3L, 1L, 5L),
      ("B", 0L, 4L, 0L, 3L)))
    // every chunk except each group's last sums to exactly seqLen
    val fills = r.groupBy(t => (t._1, t._2))
      .map { case (k, v) => k -> v.map(_._5).sum }
    val lastChunk = Map("A" -> 2L, "B" -> 0L)
    fills.foreach { case ((src, c), tot) =>
      if (c < lastChunk(src)) assert(tot == 8L, s"chunk ($src,$c): $tot")
      else assert(tot <= 8L)
    }
  }

  test("bm25: shorter doc wins at equal tf (length normalization)") {
    val docs = Seq(
      (1L, "x y"),
      (2L, "x y " + (1 to 30).map(i => s"pad$i").mkString(" ")),
      (3L, "unrelated tokens only here")
    ).toDF("doc_id", "text")
    val queries = Seq((7L, "x")).toDF("query_id", "qtext")
    val r = TextQ.bm25TopK(docs, queries, topK = 5)
      .select($"doc_id", $"rn").as[(Long, Long)].collect().sortBy(_._2)
    assert(r.map(_._1).toSeq == Seq(1L, 2L), s"got ${r.toSeq}")
  }

  test("epoch shuffle: a permutation per epoch, different epochs differ") {
    val docs = (1L to 200L).map(i => (i, s"d$i")).toDF("doc_id", "text")
    def order(epoch: Int): Seq[Long] =
      CurationQ.epochShuffle(docs, epoch, shards = 4)
        .orderBy($"shard", $"pos").select($"doc_id").as[Long].collect().toSeq
    val e1 = order(1); val e2 = order(2)
    // every doc exactly once, in every epoch
    assert(e1.sorted == (1L to 200L) && e2.sorted == (1L to 200L))
    // and the epochs are genuinely different permutations
    assert(e1 != e2)
    // shards partition the id space within bounds; pos is 1..|shard|
    val byShard = CurationQ.epochShuffle(docs, 1, shards = 4)
      .as[(Long, Long, Long)].collect().groupBy(_._1)
    assert(byShard.keySet.forall(s => s >= 0 && s < 4))
    byShard.values.foreach { g =>
      assert(g.map(_._2).sorted.sameElements(1L to g.length))
    }
  }

  test("repeat-by-factor: integer factors exact, fractional bounded, 1x default") {
    val docs = (1L to 300L).map(i =>
      (i, if (i <= 100) "tripled" else if (i <= 200) "halved" else "other"))
      .toDF("doc_id", "lang")
    val r = CurationQ.repeatByFactor(docs, "lang",
        Map("tripled" -> 3.0, "halved" -> 0.5))
      .as[(Long, String, Long)].collect()
    val byLang = r.groupBy(_._2).view.mapValues(_.length).toMap
    assert(byLang("tripled") == 300, s"3.0 must emit exactly 3 copies: $byLang")
    assert(byLang("other") == 100, "unlisted stratum passes through at 1x")
    // 0.5 keeps a hash-chosen subset: strictly between none and all
    assert(byLang("halved") > 20 && byLang("halved") < 80, s"$byLang")
    // copies are 1-based and dense per doc
    val copies = r.filter(_._2 == "tripled").groupBy(_._1).values
    assert(copies.forall(_.map(_._3).sorted.sameElements(1L to 3L)))
    // a factor-0.5 doc appears at most once; factor-0 strata would vanish
    assert(r.filter(_._2 == "halved").groupBy(_._1).values.forall(_.length == 1))
  }

  test("vocab overlap: exact shared-token Jaccard; zero-overlap pairs absent") {
    val docs = Seq(
      (1L, "A", "x y z"), (2L, "A", "x"),   // vocab(A) = {x,y,z}
      (3L, "B", "x y w"),                   // vocab(B) = {x,y,w}
      (4L, "C", "p q")                      // vocab(C) disjoint
    ).toDF("doc_id", "source", "text")
    val r = TextQ.vocabOverlap(docs)
      .select($"source_a", $"source_b", $"vocab_a", $"vocab_b",
        $"n_shared", $"jaccard_ppm")
      .as[(String, String, Long, Long, Long, Long)].collect().toSet
    // shared {x,y} of union {x,y,z,w}: 2/4 = 500000 ppm, exactly
    assert(r == Set(("A", "B", 3L, 3L, 2L, 500000L)),
      s"zero-overlap pairs must not appear: $r")
  }

  test("best cap keeps the top-n by score, random cap keeps a hash-chosen n") {
    val docs = (1L to 10L).map(i => (i, "en", i * 10L))
      .toDF("doc_id", "lang", "n_chars")
    val best = CurationQ.capPerStratumBest(docs, "lang", 3, "n_chars")
      .select($"doc_id").as[Long].collect().toSet
    assert(best == Set(10L, 9L, 8L), s"top scores must survive: $best")
  }

  test("token encode: frequency-ranked ids, OOV to 0, positions preserved") {
    val docs = Seq(
      (1L, "b b b a a c"),
      (2L, "a rare b")
    ).toDF("doc_id", "text")
    // freq: b=4, a=3, c=1, rare=1 -> ids b=1, a=2, c=3 (vocab 3); rare OOV
    val vocab = TextQ.buildVocab(docs, vocabSize = 3)
      .as[(String, Long, Long)].collect().map(t => t._1 -> t._3).toMap
    assert(vocab == Map("b" -> 1L, "a" -> 2L, "c" -> 3L), s"got $vocab")
    val enc = TextQ.encodeTokens(docs, TextQ.buildVocab(docs, 3))
      .as[(Long, Long, Long)].collect().toSet
    assert(enc == Set(
      (1L, 0L, 1L), (1L, 1L, 1L), (1L, 2L, 1L), (1L, 3L, 2L), (1L, 4L, 2L),
      (1L, 5L, 3L),
      (2L, 0L, 2L), (2L, 1L, 0L), (2L, 2L, 1L)), s"got $enc")
  }

  test("global rank: two-pass bucket construction is the exact global order") {
    // ties inside and across bucket boundaries, empty buckets in between
    val docs = Seq(
      (1L, 5L), (2L, 5L), (3L, 7L),          // bucket 0 (width 8)
      (4L, 8L), (5L, 8L),                    // bucket 1 boundary ties
      (6L, 300L), (7L, 301L)                 // far bucket, gaps between
    ).toDF("doc_id", "n_chars")
    val r = CurationQ.globalRankBy(docs, "n_chars", bucketWidth = 8L)
      .select($"doc_id", $"grank").as[(Long, Long)].collect().sortBy(_._2)
    assert(r.map(_._2).toSeq == (1L to 7L), s"dense permutation: ${r.toSeq}")
    assert(r.map(_._1).toSeq == Seq(1L, 2L, 3L, 4L, 5L, 6L, 7L),
      s"(score, doc_id) order: ${r.toSeq}")
  }

  test("repeat-by-factor: factor 0 drops the stratum entirely") {
    val docs = Seq((1L, "junk"), (2L, "junk"), (3L, "keep"))
      .toDF("doc_id", "lang")
    val r = CurationQ.repeatByFactor(docs, "lang", Map("junk" -> 0.0))
      .as[(Long, String, Long)].collect()
    assert(r.toSet == Set((3L, "keep", 1L)))
  }

  test("distinctive tokens: planted drift ranks first with exact ppm rates") {
    val d = Seq(
      (1L, "a b common common", "A"),
      (2L, "a SPAM SPAM SPAM", "A"),   // SPAM only in A: 3/8 of A's tokens
      (3L, "a b common common", "B"),
      (4L, "a b only_b common", "B")   // only_b only in B -> negative delta
    ).toDF("doc_id", "text", "source")
    val r = TextQ.distinctiveTokens(d, "A", "B", k = 2)
      .as[(String, Long, Long, Long, Long, Long)].collect()
    // A: 8 tokens, B: 8 tokens. SPAM: 3/8 = 375000 ppm vs 0.
    assert(r(0) == ("SPAM", 3L, 0L, 375000L, 0L, 375000L), s"got ${r(0)}")
    // next-largest |delta|: "b" 1/8 vs 2/8 -> -125000; "common" 2/8 vs 3/8
    // -> -125000 too; tie breaks on token ("b" < "common")
    assert(r(1) == ("b", 1L, 2L, 125000L, 250000L, -125000L), s"got ${r(1)}")
  }

  test("sequence assembly: dense chunks, boundary straddle, OOV id 0") {
    // one group, seqLen 4; doc 1 has 3 tokens (one an empty-token gap),
    // doc 2 has 3 tokens and straddles the chunk-0/chunk-1 boundary
    val d = Seq(
      (1L, "x  y x", "s"),        // double space: empty token dropped
      (2L, "y z_oov y", "s")
    ).toDF("doc_id", "text", "source")
    val vocab = TextQ.buildVocab(d, vocabSize = 2) // x,y in; z_oov -> 0
    val r = CurationQ.assembleSequences(d, vocab, seqLen = 4, "source")
      .as[(String, Long, Long, Long)].collect()
      .sortBy(t => (t._2, t._3))
    val ids = vocab.as[(String, Long, Long)].collect()
      .map(v => v._1 -> v._3).toMap
    val (x, y) = (ids("x"), ids("y"))
    // stream: x y x | y z y  -> chunk 0 = [x y x y], chunk 1 = [0 y]
    assert(r.toSeq == Seq(
      ("s", 0L, 0L, x), ("s", 0L, 1L, y), ("s", 0L, 2L, x), ("s", 0L, 3L, y),
      ("s", 1L, 0L, 0L), ("s", 1L, 1L, y)), s"got ${r.toSeq}")
    // every slot filled exactly once (no holes, no overlaps)
    assert(r.map(t => (t._2, t._3)).distinct.length == r.length)
  }

  test("doc repetition: degenerate loop maxes out, all-distinct doc is 0") {
    val d = Seq(
      (1L, "a a a a"),             // bigrams: "a a" x3 -> dup 2/3, top 3/3
      (2L, "w x y z"),             // 3 distinct bigrams -> dup 0, top 1/3
      (3L, "p q p q p"),           // "p q" x2, "q p" x2 -> dup 2/4, top 2/4
      (4L, "solo")                 // <2 tokens: absent from output
    ).toDF("doc_id", "text")
    val r = TextQ.docRepetition(d).as[(Long, Long, Long, Long)]
      .collect().map(t => t._1 -> (t._2, t._3, t._4)).toMap
    assert(r(1L) == (3L, 666666L, 1000000L), s"got ${r(1L)}")
    assert(r(2L) == (3L, 0L, 333333L), s"got ${r(2L)}")
    assert(r(3L) == (4L, 500000L, 500000L), s"got ${r(3L)}")
    assert(!r.contains(4L), "sub-bigram doc must be absent")
  }

  test("shard plan matches the naive global cumsum and respects the budget") {
    val plan = CurationQ.planShards(docs, tokenBudget = 2000L)
      .as[(Long, Long, Long)].collect()
    // re-derive the naive single-threaded answer: order by (hash, id),
    // running token prefix DIV budget
    val hk = docs.selectExpr("doc_id",
        "CAST(size(split(text, ' ')) AS BIGINT) AS n",
        "conv(substr(md5(concat('shard:', doc_id)), 1, 5), 16, 10) % 1000000 AS h")
      .as[(Long, Long, String)].collect()
      .map(t => (t._1, t._2, t._3.toLong)).sortBy(t => (t._3, t._1))
    var cum = 0L
    val naive = hk.map { case (id, n, _) =>
      val s = cum / 2000L; cum += n; id -> s
    }.toMap
    assert(plan.length == naive.size)
    plan.foreach { case (id, _, sh) =>
      assert(sh == naive(id), s"doc $id: $sh vs naive ${naive(id)}") }
    // shard ids are dense from 0
    val shards = plan.map(_._3).distinct.sorted
    assert(shards.head == 0L && shards.sameElements(shards.indices.map(_.toLong)))
    // every non-final shard's token total lands within one doc of budget
    val perShard = plan.groupBy(_._3).view.mapValues(_.map(_._2).sum).toMap
    val maxDoc = plan.map(_._2).max
    for ((sh, tot) <- perShard if sh < shards.last) {
      assert(tot < 2000L + maxDoc, s"shard $sh overfull: $tot")
      assert(tot + maxDoc >= 2000L, s"shard $sh underfull: $tot")
    }
  }

  test("source interleave: consecutive ranks rotate over live sources") {
    // 3 sources: a=4 docs, b=4, c=2 -> levels 1,2 hold {a,b,c}, levels
    // 3,4 hold {a,b} once c exhausts
    val d = Seq(
      (1L, "a"), (2L, "a"), (3L, "a"), (4L, "a"),
      (5L, "b"), (6L, "b"), (7L, "b"), (8L, "b"),
      (9L, "c"), (10L, "c")
    ).toDF("doc_id", "source")
    val r = CurationQ.interleaveBySource(d)
      .as[(Long, String, Long)].collect().sortBy(_._3)
    assert(r.map(_._3).toSeq == (1L to 10L), "dense permutation")
    val bySrc = r.map(_._2)
    // first two levels: all three sources, in source order within level
    assert(bySrc.take(6).toSeq == Seq("a", "b", "c", "a", "b", "c"))
    // after c exhausts, a/b alternate
    assert(bySrc.drop(6).toSeq == Seq("a", "b", "a", "b"))
    // every source's own docs appear in a deterministic (hash) order:
    // re-run is identical
    val r2 = CurationQ.interleaveBySource(d)
      .as[(Long, String, Long)].collect().sortBy(_._3)
    assert(r.toSeq == r2.toSeq)
  }

  test("padding waste: sorted batching never wastes more than hash order") {
    val r = CurationQ.paddingWaste(docs, batchSize = 16, seqLen = 64)
      .as[(String, Long, Long, Long, Long)].collect()
      .map(t => t._1 -> (t._2, t._3, t._4, t._5)).toMap
    val (hB, hTok, hSlots, hWaste) = r("hash_order")
    val (sB, sTok, sSlots, sWaste) = r("length_sorted")
    val n = docs.count()
    val expectBatches = (n + 15) / 16
    assert(hB == expectBatches && sB == expectBatches)
    assert(hTok == sTok, "both policies batch the same tokens")
    assert(hSlots >= hTok && sSlots >= sTok)
    assert(sWaste <= hWaste,
      s"sorted $sWaste must not exceed hash-order $hWaste")
    assert(hWaste == (hSlots - hTok) * 1000000L / hSlots)
  }

  test("padding waste: uniform lengths waste zero under both policies") {
    val d = (1L to 40L).map(i => (i, "a b c d e")).toDF("doc_id", "text")
    val r = CurationQ.paddingWaste(d, batchSize = 8, seqLen = 64)
      .as[(String, Long, Long, Long, Long)].collect()
    assert(r.length == 2)
    r.foreach { case (p, nb, tok, slots, waste) =>
      assert(nb == 5L && tok == 200L && slots == 200L && waste == 0L,
        s"$p: ($nb, $tok, $slots, $waste)")
    }
  }

  test("soft quality sample: keep rate tracks keepPpm, endpoints exact") {
    import org.apache.spark.sql.functions.{lit => flit}
    val n = docs.count()
    assert(CurationQ.softQualitySample(docs, flit(1000000L)).count() == n)
    assert(CurationQ.softQualitySample(docs, flit(0L)).count() == 0L)
    // a 30% keep rate lands near 30% (md5 coordinate, binomial noise)
    val k = CurationQ.softQualitySample(docs, flit(300000L)).count()
    assert(k > n * 15 / 100 && k < n * 45 / 100, s"kept $k of $n at 30%")
    // deterministic: identical survivor set on re-run
    val a = CurationQ.softQualitySample(docs, flit(300000L))
      .select("doc_id").as[Long].collect().sorted
    val b = CurationQ.softQualitySample(docs, flit(300000L))
      .select("doc_id").as[Long].collect().sorted
    assert(a.sameElements(b))
  }

  test("temperature mix lifts tail strata and caps head strata") {
    val w = CurationQ.temperatureMixWeights(docs, "lang")
      .select("lang", "n_docs", "actual_ppm", "target_ppm", "rate_ppm")
      .as[(String, Long, Long, Long, Long)].collect()
    val byLang = w.map(r => r._1 -> r).toMap
    val head = w.maxBy(_._2)
    val tail = w.minBy(_._2)
    // sqrt smoothing: the dominant stratum's target share drops below its
    // actual share, the rarest one's rises above it
    assert(head._4 < head._3, s"head must be downweighted: $head")
    assert(tail._4 > tail._3, s"tail must be upweighted: $tail")
    assert(w.forall(_._5 <= 1000000L))
    // isqrt anchor is exact on awkward counts: 15 -> 3, 16 -> 4, 17 -> 4
    val synth = (1L to 15L).map(i => (i, "a")) ++
      (1L to 16L).map(i => (i + 100, "b")) ++ (1L to 17L).map(i => (i + 200, "c"))
    val sdf = synth.toDF("doc_id", "lang")
    val roots = CurationQ.temperatureMixWeights(sdf, "lang")
      .select("lang", "sqrt_n").as[(String, Long)].collect().toMap
    assert(roots == Map("a" -> 3L, "b" -> 4L, "c" -> 4L), roots.toString)
  }

  test("temperature rebalance keeps ~rate_ppm of each stratum, deterministically") {
    val rates = CurationQ.temperatureMixWeights(docs, "lang")
      .select("lang", "n_docs", "rate_ppm").as[(String, Long, Long)]
      .collect().map(r => r._1 -> (r._2, r._3)).toMap
    val kept = CurationQ.temperatureRebalance(docs, "lang")
      .groupBy("lang").count().as[(String, Long)].collect().toMap
    rates.foreach { case (lang, (n, ppm)) =>
      val k = kept.getOrElse(lang, 0L)
      val expect = n * ppm / 1000000L
      // md5-bucket binomial noise: allow a generous band around expectation
      assert(math.abs(k - expect) <= math.max(6L, n / 4),
        s"$lang kept $k expected ~$expect of $n at $ppm ppm")
    }
    val a = CurationQ.temperatureRebalance(docs, "lang")
      .select("doc_id").as[Long].collect().sorted
    val b = CurationQ.temperatureRebalance(docs, "lang")
      .select("doc_id").as[Long].collect().sorted
    assert(a.sameElements(b))
  }

  test("NB classifier separates disjoint vocabularies perfectly") {
    val d = Seq(
      (1L, "foo foo bar", "x"), (2L, "bar foo baz", "x"),
      (3L, "qux quux corge", "y"), (4L, "corge qux qux", "y"))
      .toDF("doc_id", "text", "lang")
    val conf = CurationQ.nbConfusion(d, "lang")
      .as[(String, String, Long)].collect().toSet
    assert(conf == Set(("x", "x", 2L), ("y", "y", 2L)), conf.toString)
  }

  test("NB classifier assigns a mixed doc to its majority vocabulary class") {
    val d = Seq(
      (1L, "foo foo foo bar", "x"), (2L, "foo bar bar foo", "x"),
      (3L, "qux qux corge corge", "y"), (4L, "corge qux corge qux", "y"),
      // true label y, but its tokens are mostly class-x vocabulary
      (5L, "foo bar foo qux", "y"))
      .toDF("doc_id", "text", "lang")
    val asMap = CurationQ.nbConfusion(d, "lang")
      .select("true_label", "pred_label", "n_docs")
      .as[(String, String, Long)].collect()
      .map(r => (r._1, r._2) -> r._3).toMap
    assert(asMap(("y", "x")) == 1L, s"mixed doc must flip to x: $asMap")
    assert(asMap(("x", "x")) == 2L && asMap(("y", "y")) == 2L)
  }

  test("class tokens: exclusive token tops its class, shared token stays near 1x") {
    val d = Seq(
      (1L, "shared shared unique_x shared", "x"),
      (2L, "shared unique_x shared shared", "x"),
      (3L, "shared shared shared shared", "y"),
      (4L, "shared shared shared shared", "y"))
      .toDF("doc_id", "text", "lang")
    val got = CurationQ.classTokens(d, "lang", k = 2)
      .select("cls", "rn", "tok", "or_ppm")
      .as[(String, Long, String, Long)].collect()
    // hand-computed smoothed ORs: unique_x@x (a=2,b=0,r1=8,r0=8) =
    // (3·9)/(1·7) = 3857142 ppm; shared@x (a=6,b=8) = (7·1)/(9·3) =
    // 259259; shared@y (a=8,b=6) = (9·3)/(7·1) = 3857142
    val byKey = got.map(r => (r._1, r._3) -> (r._2, r._4)).toMap
    assert(byKey(("x", "unique_x")) == ((1L, 3857142L)), got.toSeq.toString)
    assert(byKey(("x", "shared")) == ((2L, 259259L)), got.toSeq.toString)
    assert(byKey(("y", "shared")) == ((1L, 3857142L)), got.toSeq.toString)
    assert(got.length == 3, "unique_x has no y row (zero count)")
  }

  test("class tokens: fully exclusive common token saturates at the 1e9 cap") {
    val xs = (1L to 30L).map(i => (i, "only_x only_x only_x", "x"))
    val ys = (100L to 130L).map(i => (i, "only_y only_y only_y", "y"))
    val got = CurationQ.classTokens((xs ++ ys).toDF("doc_id", "text", "lang"),
      "lang", k = 1)
      .select("cls", "tok", "or_ppm").as[(String, String, Long)].collect()
    assert(got.forall(_._3 == 1000000000L), got.toSeq.toString)
  }

  test("NB confusion on the fixture is well-formed and deterministic") {
    // the fixture's langs share ONE 31-token vocabulary (no lexical
    // signal by construction — see q143's doc), so assert structure, not
    // accuracy: every doc classified exactly once, labels in-domain
    val conf = CurationQ.nbConfusion(docs, "lang")
      .select("true_label", "pred_label", "n_docs")
      .as[(String, String, Long)].collect()
    assert(conf.map(_._3).sum == docs.count(), "every doc classified once")
    val langs = docs.select("lang").distinct().as[String].collect().toSet
    assert(conf.forall(r => langs(r._1) && langs(r._2)))
    val again = CurationQ.nbConfusion(docs, "lang")
      .select("true_label", "pred_label", "n_docs")
      .as[(String, String, Long)].collect()
    assert(conf.toSet == again.toSet, "deterministic confusion")
  }

  test("packing bucket-offset cumsum is invariant to bucketDocs") {
    // one dominant group (18 of 20 docs), deliberately non-contiguous
    // doc_ids; the within-group sub-shard construction must agree with
    // the serialized single-window result at EVERY bucket width,
    // including bucketDocs=1 (every doc its own bucket) and a width
    // larger than the corpus (degenerates to the single window)
    val docs = (0L until 20L).map { i =>
      val src = if (i % 10 == 9) "minor" else "mega"
      (i * 7 + 3, src, (1 to (i % 5 + 1).toInt).map(j => s"t${i}_$j").mkString(" "))
    }.toDF("doc_id", "source", "text")
    def run(bd: Long) =
      CurationQ.packedChunkSpans(docs, seqLen = 4, bucketDocs = bd)
        .select($"source", $"chunk_id", $"doc_id", $"offset_in_chunk",
          $"n_chunk_toks")
        .as[(String, Long, Long, Long, Long)].collect().toSet
    val wide = run(1000000L) // single bucket = the naive serialized window
    Seq(1L, 2L, 8L).foreach { bd =>
      assert(run(bd) == wide, s"bucketDocs=$bd diverges from single-window")
    }
    val vocab = TextQ.buildVocab(docs, vocabSize = 50)
    def runAsm(bd: Long) =
      CurationQ.assembleSequences(docs, vocab, seqLen = 4, "source", bd)
        .select($"source", $"chunk_id", $"pos_in_chunk", $"tok_id")
        .as[(String, Long, Long, Long)].collect().toSet
    val wideAsm = runAsm(1000000L)
    Seq(1L, 2L, 8L).foreach { bd =>
      assert(runAsm(bd) == wideAsm, s"assembly bucketDocs=$bd diverges")
    }
  }

  test("length-bucketed batches: tight padding, batch runs, rank equivalence") {
    // lengths 4,5,6,7 land in bucket 0 (width 16); 20,21 in bucket 1.
    // batchSize 2 in (n_toks, doc_id) order: batches pair similar lengths
    def doc(i: Long, n: Int) = (i, (1 to n).map(j => s"w${i}_$j").mkString(" "))
    val docs = Seq(doc(1, 4), doc(2, 4), doc(3, 5), doc(4, 7),
      doc(5, 20), doc(6, 21), doc(7, 21)).toDF("doc_id", "text")
    val got = CurationQ.lengthBucketedBatches(docs, bucketWidth = 16L,
        batchSize = 2L)
      .select($"bucket", $"batch", $"n_docs", $"max_toks", $"sum_toks",
        $"pad_ppm")
      .as[(Long, Long, Long, Long, Long, Long)].collect().toSet
    assert(got == Set(
      (0L, 0L, 2L, 4L, 8L, 0L),        // the two 4-token docs: zero pad
      (0L, 1L, 2L, 7L, 12L, 142857L),  // 5+7 padded to 7: 2/14
      (1L, 0L, 2L, 21L, 41L, 23809L),  // 20+21: 1/42
      (1L, 1L, 1L, 21L, 21L, 0L)),     // trailing singleton
      got.toString)
    // offset construction ≡ naive: identical under a degenerate single
    // length bucket (all docs same bucket, many distinct lengths)
    val many = (1L to 40L).map(i => doc(i, 3 + (i % 13).toInt)).toDF("doc_id", "text")
    val a = CurationQ.lengthBucketedBatches(many, 1000L, 8L)
      .collect().map(_.toSeq).toSet
    val b = CurationQ.lengthBucketedBatches(many, 1000L, 8L)
      .collect().map(_.toSeq).toSet
    assert(a == b && a.nonEmpty)
  }

  test("budget waterfill: saturation, re-flow, floors, degenerate budgets") {
    val strata = Seq(("a", 100L, 500000L), ("b", 1000L, 300000L),
      ("c", 1000L, 200000L)).toDF("stratum", "capacity", "weight_ppm")
    def run(budget: Long) =
      CurationQ.budgetWaterfill(strata, budget)
        .select($"stratum", $"saturated", $"allocated")
        .as[(String, Boolean, Long)].collect().sortBy(_._1)
    // a (cap 100, wants 300) saturates; its unmet 200 re-flows to b/c
    // proportionally to 3:2 -> b 300, c 200
    assert(run(600L).toSeq == Seq(("a", true, 100L), ("b", false, 300L),
      ("c", false, 200L)))
    // floor remainder stays unallocated: 601 allocates the same 600
    val r601 = run(601L)
    assert(r601.map(_._3).sum == 600L, r601.toSeq.toString)
    // budget >= total capacity: everything saturates at capacity
    assert(run(5000L).toSeq == Seq(("a", true, 100L), ("b", true, 1000L),
      ("c", true, 1000L)))
    // zero budget: nothing saturates, nothing allocates
    assert(run(0L).forall(r => !r._2 && r._3 == 0L))
  }

  test("apportionment: exact total, within-1 quotas, remainder ranking") {
    val strata = Seq(("a", 334L), ("b", 333L), ("c", 333L))
      .toDF("stratum", "n")
    // 10 seats over 1000: quotas 3.34/3.33/3.33 -> bases 3/3/3, the one
    // leftover seat goes to the largest remainder (a)
    val got = CurationQ.apportion(strata, seats = 10L)
      .select($"stratum", $"allocated").as[(String, Long)].collect().toMap
    assert(got == Map("a" -> 4L, "b" -> 3L, "c" -> 3L), got.toString)
    // invariants on a skewed split: total exact, every stratum within 1
    // of its exact quota
    val skew = Seq(("x", 1L), ("y", 7L), ("z", 992L)).toDF("stratum", "n")
    val alloc = CurationQ.apportion(skew, seats = 97L)
      .select($"stratum", $"n", $"allocated")
      .as[(String, Long, Long)].collect()
    assert(alloc.map(_._3).sum == 97L, alloc.toSeq.toString)
    alloc.foreach { case (s0, n, a) =>
      val quota = 97.0 * n / 1000.0
      assert(math.abs(a - quota) < 1.0, s"$s0: $a vs quota $quota")
    }
    // remainder tie broken by stratum name: equal strata, one seat
    val tie = Seq(("p", 500L), ("q", 500L)).toDF("stratum", "n")
    val t = CurationQ.apportion(tie, seats = 3L)
      .select($"stratum", $"allocated").as[(String, Long)].collect().toMap
    assert(t == Map("p" -> 2L, "q" -> 1L), t.toString)
  }

  test("quantile normalize: per-source endpoints, comparability, bucket invariance") {
    // source A: scores 10,20,30,40 — source B: scores 1000,2000 (scales
    // differ 100x; quantile ranks make them comparable)
    val docs = Seq((1L, "A", 10L), (2L, "A", 20L), (3L, "A", 30L),
      (4L, "A", 40L), (5L, "B", 1000L), (6L, "B", 2000L),
      (7L, "C", 777L)) // singleton source
      .toDF("doc_id", "source", "score")
    def run(bw: Long) = CurationQ.quantileNormalize(docs, "score",
        "source", bw)
      .select($"doc_id", $"qrank_ppm").as[(Long, Long)].collect().toMap
    val got = run(16L)
    assert(got(1L) == 0L && got(4L) == 1000000L, got.toString)
    assert(got(2L) == 333333L && got(3L) == 666666L, got.toString)
    assert(got(5L) == 0L && got(6L) == 1000000L, "B spans [0, 1e6] too")
    assert(got(7L) == 0L, "singleton source reads 0")
    // bucket width never changes the result (offset construction ≡ naive)
    Seq(1L, 3L, 1000000L).foreach(bw => assert(run(bw) == got, s"bw=$bw"))
    // negative scores keep monotone buckets (pmod floor-div)
    val neg = Seq((1L, "A", -30L), (2L, "A", -10L), (3L, "A", 10L))
      .toDF("doc_id", "source", "score")
    val g2 = CurationQ.quantileNormalize(neg, "score", "source", 7L)
      .select($"doc_id", $"qrank_ppm").as[(Long, Long)].collect().toMap
    assert(g2 == Map(1L -> 0L, 2L -> 500000L, 3L -> 1000000L), g2.toString)
  }

  test("degenerate inputs fail loudly across the div-guarded operators") {
    def msgOf(e: Exception): String =
      Option(e.getCause).map(_.getMessage).getOrElse("") + e.getMessage
    // waterfill: zero weight names the stratum
    val e1 = intercept[Exception] {
      CurationQ.budgetWaterfill(
        Seq(("bad", 10L, 0L)).toDF("stratum", "capacity", "weight_ppm"),
        100L).collect()
    }
    assert(msgOf(e1).contains("bad"), msgOf(e1))
    // apportion: all-zero counts
    val e2 = intercept[Exception] {
      CurationQ.apportion(
        Seq(("a", 0L), ("b", 0L)).toDF("stratum", "n"), 10L).collect()
    }
    assert(msgOf(e2).contains("nothing to apportion"), msgOf(e2))
    // distinctive tokens: misspelled source names the source
    val docs = Seq((1L, "alpha beta", "src0")).toDF("doc_id", "text", "source")
    val e3 = intercept[Exception] {
      TextQ.distinctiveTokens(docs, "src0", "srcTYPO", k = 3).collect()
    }
    assert(msgOf(e3).contains("srcTYPO"), msgOf(e3))
    // self-retrieval: a sampleMod that selects no queries
    val e4 = intercept[Exception] {
      TextQ.selfRetrievalEval(
        Seq((1L, "alpha beta gamma delta")).toDF("doc_id", "text"),
        sampleMod = 1000L).collect()
    }
    assert(msgOf(e4).contains("sampled no query docs"), msgOf(e4))
    // drift: an empty old snapshot names the side
    val e5 = intercept[Exception] {
      Relational.drift(
        Seq((1L, 5.0)).toDF("id", "v").filter($"id" < 0),
        Seq((1L, 5.0)).toDF("id", "v"),
        col("v"), 0.0, 10.0, 4).collect()
    }
    assert(msgOf(e5).contains("OLD snapshot"), msgOf(e5))
  }

  test("calibration curve: bands, clamping, exact observed rates") {
    val rows = Seq(
      (1L, 50000L, 1L), (2L, 99999L, 0L),     // band 0: 1/2 positive
      (3L, 450000L, 1L), (4L, 450000L, 1L),   // band 4: 2/2
      (5L, 1000000L, 0L), (6L, 999999L, 1L),  // top scores clamp to band 9
      (7L, -5L, 0L))                          // negative clamps to band 0
      .toDF("doc_id", "score_ppm", "pos")
    val got = CurationQ.calibrationCurve(rows, col("score_ppm"),
        col("pos") === 1L, buckets = 10)
      .select($"band", $"n_docs", $"n_pos", $"observed_ppm")
      .as[(Long, Long, Long, Long)].collect().toSet
    assert(got == Set(
      (0L, 3L, 1L, 333333L),
      (4L, 2L, 2L, 1000000L),
      (9L, 2L, 1L, 500000L)), got.toString)
    intercept[IllegalArgumentException](
      CurationQ.calibrationCurve(rows, col("score_ppm"), col("pos") === 1L,
        buckets = 7))
  }

  test("domain affinity survives ppm-rate underflow on a mega corpus") {
    // ~3e6 corpus tokens push a once-seen token's smoothed corpus rate
    // (1e6*(cc+1)) DIV (tc+v) to 0; the 1-ppm floor keeps the affinity
    // denominator nonzero where unguarded arithmetic is an ANSI div/0
    val bulk = spark.range(30)
      .selectExpr("id AS doc_id", "trim(repeat('filler ', 100000)) AS text",
        "'en' AS lang")
    val rare = Seq((999L, "rareword", "de")).toDF("doc_id", "text", "lang")
    val got = CurationQ.domainAffinity(bulk.unionByName(rare),
        col("lang") === "en")
      .filter(col("doc_id") === 999L)
      .select("affinity_ppm").as[Long].collect()
    assert(got.length == 1, "the rare doc must score without a div/0")
    assert(got.head >= 0L, got.toSeq.toString)
  }

  test("NB confusion survives ppm-rate underflow on a mega corpus") {
    val bulk = spark.range(30)
      .selectExpr("id AS doc_id", "trim(repeat('filler ', 100000)) AS text",
        "'en' AS lang")
    val rare = Seq((999L, "rareword", "de")).toDF("doc_id", "text", "lang")
    val conf = CurationQ.nbConfusion(bulk.unionByName(rare), "lang")
      .select("true_label", "pred_label", "n_docs")
      .as[(String, String, Long)].collect()
    assert(conf.map(_._3).sum == 31L, "every doc classified once")
  }
}
