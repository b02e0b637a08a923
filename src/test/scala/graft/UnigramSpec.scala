package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.queries.TokenizerQ

/** The q180/q181 oracles replay the unrolled DP in DuckDB at sf0.01;
  * this pins the construction against a fully independent in-memory
  * reimplementation (n-gram counting, top-K tie rule, staircase costs,
  * Viterbi DP) on randomized corpora, plus the coverage and guard edges.
  */
class UnigramSpec extends SparkSpec {

  import spark.implicits._

  private def docsOf(texts: String*): DataFrame =
    texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("doc_id", "text")

  /** Independent reference: same semantics, plain Scala. */
  private def naiveCosts(words: Map[String, Long], maxPieceLen: Int,
      topK: Int): Map[String, Long] = {
    val cnts = scala.collection.mutable.Map[String, Long]()
    for ((w, f) <- words; s <- 0 until w.length;
         l <- 1 to math.min(maxPieceLen, w.length - s)) {
      val p = w.substring(s, s + l)
      cnts(p) = cnts.getOrElse(p, 0L) + f
    }
    val total = cnts.values.sum
    val ranked = cnts.toSeq.sortBy { case (p, c) => (-c, p) }
    val keep = ranked.take(topK).map(_._1).toSet ++
      cnts.keys.filter(_.length == 1)
    def bl(x: Long): Long = 64L - java.lang.Long.numberOfLeadingZeros(x)
    val cost = keep.map(p => p -> (bl(total) - bl(cnts(p)))).toMap
    words.keys.map { w =>
      val dp = Array.fill(w.length + 1)(Long.MaxValue / 2)
      dp(0) = 0L
      for (j <- 1 to w.length; l <- 1 to math.min(maxPieceLen, j)) {
        val p = w.substring(j - l, j)
        cost.get(p).foreach(c => dp(j) = math.min(dp(j), dp(j - l) + c))
      }
      w -> dp(w.length)
    }.toMap
  }

  private def sparkCosts(df: DataFrame, maxPieceLen: Int, topK: Int,
      maxWordLen: Int): Map[String, Long] =
    TokenizerQ.unigramSegmentCosts(df, maxPieceLen, topK, maxWordLen)
      .select("word", "cost_bits").as[(String, Long)].collect().toMap

  test("unigram segmentation equals the independent reference on random corpora") {
    val rnd = new scala.util.Random(23)
    for (trial <- 1 to 3) {
      val alphabet = "abcde"
      val words = (1 to 30).map { _ =>
        val len = 1 + rnd.nextInt(10)
        (1 to len).map(_ => alphabet(rnd.nextInt(alphabet.length))).mkString
      }.distinct
      val bag = words.flatMap(w => Seq.fill(1 + rnd.nextInt(5))(w))
      val shuffled = rnd.shuffle(bag)
      val docs = docsOf(shuffled.grouped(12).map(_.mkString(" ")).toSeq: _*)
      val freq = bag.groupBy(identity).map { case (w, g) => w -> g.size.toLong }
      for (topK <- Seq(8, 64)) {
        val got = sparkCosts(docs, 3, topK, 12)
        val want = naiveCosts(freq, 3, topK)
        assert(got == want, s"trial $trial topK $topK diverged")
      }
    }
  }

  test("a word that IS a frequent vocabulary piece costs exactly that piece") {
    // 'abcd' dominates: it enters the top-K as a whole piece, so the
    // min segmentation is the single edge covering the word
    val docs = docsOf(Seq.fill(20)("abcd").mkString(" "), "xyz")
    val got = sparkCosts(docs, 4, 16, 12)
    val want = naiveCosts(Map("abcd" -> 20L, "xyz" -> 1L), 4, 16)
    assert(got == want)
    // single-char fallback: every char of 'xyz' is hapax but still covered
    assert(got.contains("xyz"))
  }

  test("batched DP (dpBatch>1) equals per-position DP (dpBatch=1)") {
    val rnd = new scala.util.Random(91)
    val alphabet = "abcd"
    val words = (1 to 40).map { _ =>
      val len = 1 + rnd.nextInt(11)
      (1 to len).map(_ => alphabet(rnd.nextInt(alphabet.length))).mkString
    }.distinct
    val docs = docsOf(rnd.shuffle(words.flatMap(w =>
      Seq.fill(1 + rnd.nextInt(4))(w))).mkString(" "))
    val seq1 = TokenizerQ.unigramSegmentCosts(docs, dpBatch = 1)
      .select("word", "cost_bits").as[(String, Long)].collect().toMap
    for (k <- Seq(2, 4, 7)) {
      val bat = TokenizerQ.unigramSegmentCosts(docs, dpBatch = k)
        .select("word", "cost_bits").as[(String, Long)].collect().toMap
      assert(bat == seq1, s"dpBatch=$k diverged from sequential DP")
    }
  }

  test("unigramSegmentCosts rejects words longer than maxWordLen loudly") {
    val docs = docsOf("short toolongword")
    val e = intercept[Exception] {
      TokenizerQ.unigramSegmentCosts(docs, maxWordLen = 6).collect()
    }
    assert(e.getMessage.contains("graft.unigramSegmentCosts"), e.getMessage)
  }

  test("unigramCorpusCard totals re-derive from the per-word table") {
    val docs = docsOf("aa bb aa cc", "aa dd")
    val seg = TokenizerQ.unigramSegmentCosts(docs)
      .select("freq", "word_len", "bits_total")
      .as[(Long, Long, Long)].collect()
    val card = TokenizerQ.unigramCorpusCard(docs)
      .select("n_words", "total_chars", "total_bits", "bpc_milli")
      .as[(Long, Long, Long, Long)].collect().head
    assert(card._1 == seg.length.toLong)
    assert(card._2 == seg.map(r => r._1 * r._2).sum)
    assert(card._3 == seg.map(_._3).sum)
    assert(card._4 == 1000L * card._3 / card._2)
  }
}
