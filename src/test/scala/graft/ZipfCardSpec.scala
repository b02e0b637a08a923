package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.queries.TextQ

/** The q179 oracle proves the closed-form rank-range decomposition equals
  * the naive global-rank construction at sf0.01; this pins the same
  * equivalence on randomized small corpora (any tie order, any freq
  * profile), the degenerate-corpus error, and the flat-corpus zero.
  */
class ZipfCardSpec extends SparkSpec {

  import spark.implicits._

  private def card(df: DataFrame): (Long, Long, Long) =
    TextQ.zipfCard(df).select("n_types", "n_occurrences", "slope_ppm")
      .as[(Long, Long, Long)].collect().head

  /** Naive reference: global rank by (freq desc), staircase logs, exact
    * BigInt least squares — the oracle's construction in Scala. */
  private def naive(df: DataFrame): (Long, Long, Long) = {
    val tf = df.select(explode(split(col("text"), " ")).as("tok"))
      .filter(length(col("tok")) > 0)
      .groupBy("tok").agg(count(lit(1)).as("freq"))
      .select("freq").as[Long].collect().sortBy(-_)
    def fl(m: Long): Long = 63 - java.lang.Long.numberOfLeadingZeros(m)
    val pts = tf.zipWithIndex.map { case (f, i) => (fl(i + 1L), fl(f)) }
    val n = BigInt(pts.length)
    val sx = pts.map(p => BigInt(p._1)).sum
    val sy = pts.map(p => BigInt(p._2)).sum
    val sxy = pts.map(p => BigInt(p._1) * p._2).sum
    val sx2 = pts.map(p => BigInt(p._1) * p._1).sum
    val num = n * sxy - sx * sy
    val den = n * sx2 - sx * sx
    val slope =
      if (num < 0) -((BigInt(1000000) * -num) / den)
      else (BigInt(1000000) * num) / den
    (pts.length.toLong, tf.sum, slope.toLong)
  }

  test("zipfCard equals the naive global-rank construction on random corpora") {
    val rnd = new scala.util.Random(11)
    for (trial <- 1 to 4) {
      // skewed synthetic corpus: token k drawn with weight ~ 1/k
      val vocab = 40 + trial * 30
      val docs = (1 to 60).map { d =>
        val words = (1 to 50).map { _ =>
          val k = math.min(vocab, (1 / (rnd.nextDouble() + 1e-9)).toInt + 1)
          s"w$k"
        }
        (d.toLong, words.mkString(" "))
      }.toDF("doc_id", "text")
      assert(card(docs) == naive(docs), s"trial $trial diverged")
    }
  }

  test("zipfCard slope is 0 on an all-hapax corpus and steep on a geometric one") {
    val flat = (1 to 8).map(i => (i.toLong, s"u${i}a u${i}b u${i}c"))
      .toDF("doc_id", "text")
    val (nt, occ, slope) = card(flat)
    assert(nt == 24L && occ == 24L && slope == 0L)
    // token k appears 2^(8-k) times: y falls one step per freq group
    val geo = Seq((1L, (1 to 8).flatMap(k =>
      Seq.fill(1 << (8 - k))(s"g$k")).mkString(" "))).toDF("doc_id", "text")
    val s2 = card(geo)._3
    assert(s2 < -400000L, s"expected a steep negative slope, got $s2")
    assert(card(geo) == naive(geo))
  }

  test("zipfCard fails loudly on a single-type corpus") {
    val one = Seq((1L, "same same same")).toDF("doc_id", "text")
    val e = intercept[Exception](card(one))
    assert(e.getMessage.contains("graft.zipfCard"), e.getMessage)
  }
}
