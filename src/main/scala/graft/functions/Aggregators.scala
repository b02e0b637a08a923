package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Typed custom aggregators (SURVEY §2B "UDx" row) — the idiomatic Spark
  * extension point for aggregation semantics the built-ins lack.
  */
object Aggregators {

  /** Bitwise-OR accumulation — the reference's log-level mask semantics
    * (`globalLevel & msgLevel` filtering over an OR-accumulated mask,
    * `LoggerWriter.cpp:171-224`). */
  object BitmaskOr extends Aggregator[Long, Long, Long] {
    def zero: Long = 0L
    def reduce(b: Long, a: Long): Long = b | a
    def merge(b1: Long, b2: Long): Long = b1 | b2
    def finish(r: Long): Long = r
    def bufferEncoder: Encoder[Long] = Encoders.scalaLong
    def outputEncoder: Encoder[Long] = Encoders.scalaLong
  }

  /** Misra–Gries heavy-hitters sketch: tracks at most `capacity`
    * counters; any item with true frequency > n/(capacity+1) is
    * guaranteed present, and estimates under-count by at most
    * n/(capacity+1). The mergeable-summary counterpart to the HLL
    * surface (q12b) for FREQUENT items — at 100 TB the full token
    * histogram of a skewed column doesn't fit a shuffle, the sketch
    * always does: each partial is ≤ capacity entries regardless of
    * partition size.
    *
    * When `capacity` ≥ the number of distinct items no decrement ever
    * fires and the sketch is EXACT — which is what the oracle query
    * checks; the approximation guarantee under pressure is spec-tested.
    */
  final class FrequentItems(capacity: Int)
      extends Aggregator[String, Map[String, Long], Map[String, Long]] {
    require(capacity >= 1, s"capacity must be >= 1, got $capacity")

    def zero: Map[String, Long] = Map.empty

    def reduce(b: Map[String, Long], a: String): Map[String, Long] =
      b.get(a) match {
        case Some(c) => b.updated(a, c + 1)
        case None if b.size < capacity => b.updated(a, 1L)
        case None => // decrement-all step: drop zeroed counters
          b.view.mapValues(_ - 1).filter(_._2 > 0).toMap
      }

    def merge(x: Map[String, Long], y: Map[String, Long]): Map[String, Long] = {
      val sum = y.foldLeft(x) { case (acc, (k, c)) =>
        acc.updated(k, acc.getOrElse(k, 0L) + c)
      }
      if (sum.size <= capacity) sum
      else { // subtract the (capacity+1)-th largest count from everything
        val d = sum.values.toSeq.sorted(Ordering[Long].reverse)(capacity)
        sum.view.mapValues(_ - d).filter(_._2 > 0).toMap
      }
    }

    def finish(r: Map[String, Long]): Map[String, Long] = r
    def bufferEncoder: Encoder[Map[String, Long]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Map[String, Long]]()
    def outputEncoder: Encoder[Map[String, Long]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Map[String, Long]]()
  }

  final case class CmsBuf(rows: Array[Long], n: Long)

  /** Count-min sketch: point-frequency estimates over a stream in
    * `depth × width` longs, regardless of cardinality — the mergeable
    * counterpart to [[FrequentItems]] when the QUERY side needs
    * arbitrary-item lookups rather than a top list. Estimates
    * OVER-count only: est(x) ≥ true(x), and est(x) ≤ true(x) + εn with
    * ε ≈ e/width at the usual confidence for `depth` rows. Merge is
    * element-wise addition, so partials are fixed-size no matter the
    * partition — the same always-shuffleable property as the other
    * sketches.
    *
    * Hashing: row i uses murmur-ish mixing of (seed=i, item hash) — the
    * standard pairwise-independent-per-row construction; deterministic
    * across JVMs (String.hashCode + fixed mixing), so results are
    * replay-stable and oracle-checkable. Width ≥ distinct items makes
    * collisions unlikely, NOT impossible (exactness needs the fixed
    * per-row hashes to be injective on the item set, which is only
    * probabilistic); the q97 fixture's 256/4 and the spec's configs are
    * collision-free for THEIR item sets — pinned by the oracle — and
    * over-count under pressure is spec-tested.
    */
  final class CountMinSketch(width: Int, depth: Int)
      extends Aggregator[String, CmsBuf, Map[String, Long]] {
    require(width >= 1 && depth >= 1, s"need width,depth >= 1: $width,$depth")

    /** Items to report in finish (the sketch itself answers any item;
      * an Aggregator must emit a value, so callers name their queries). */
    private var queryItems: Seq[String] = Nil
    def queries(items: Seq[String]): CountMinSketch = { queryItems = items; this }

    private def cell(row: Int, item: String): Int = {
      var h = item.hashCode * 0x9E3779B9 + row * 0x85EBCA6B
      h ^= h >>> 16; h *= 0x45D9F3B; h ^= h >>> 16
      math.floorMod(h, width) + row * width
    }

    def zero: CmsBuf = CmsBuf(new Array[Long](width * depth), 0L)

    def reduce(b: CmsBuf, a: String): CmsBuf = {
      var r = 0
      while (r < depth) { b.rows(cell(r, a)) += 1; r += 1 }
      CmsBuf(b.rows, b.n + 1)
    }

    def merge(x: CmsBuf, y: CmsBuf): CmsBuf = {
      var i = 0
      while (i < x.rows.length) { x.rows(i) += y.rows(i); i += 1 }
      CmsBuf(x.rows, x.n + y.n)
    }

    /** Min over the depth rows — the count-min estimate. */
    def estimate(b: CmsBuf, item: String): Long = {
      var best = Long.MaxValue
      var r = 0
      while (r < depth) {
        val c = b.rows(cell(r, item)); if (c < best) best = c; r += 1
      }
      best
    }

    def finish(r: CmsBuf): Map[String, Long] =
      queryItems.map(q => q -> estimate(r, q)).toMap
    def bufferEncoder: Encoder[CmsBuf] = Encoders.product[CmsBuf]
    def outputEncoder: Encoder[Map[String, Long]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Map[String, Long]]()
  }

  final case class VecBuf(sum: Array[Double], n: Long)

  /** Element-wise mean of embedding vectors (centroid) — partial
    * aggregation (merge) keeps it one shuffle of dim-sized buffers, never
    * rows, so it scales to any corpus size. */
  final class VectorMean(dim: Int) extends Aggregator[Array[Float], VecBuf, Array[Double]] {
    def zero: VecBuf = VecBuf(new Array[Double](dim), 0L)
    def reduce(b: VecBuf, a: Array[Float]): VecBuf = {
      var i = 0
      while (i < dim) { b.sum(i) += a(i); i += 1 }
      VecBuf(b.sum, b.n + 1)
    }
    def merge(x: VecBuf, y: VecBuf): VecBuf = {
      var i = 0
      while (i < dim) { x.sum(i) += y.sum(i); i += 1 }
      VecBuf(x.sum, x.n + y.n)
    }
    def finish(r: VecBuf): Array[Double] =
      if (r.n == 0) r.sum else r.sum.map(_ / r.n)
    def bufferEncoder: Encoder[VecBuf] = Encoders.product[VecBuf]
    def outputEncoder: Encoder[Array[Double]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Double]]()
  }

  final case class Scored(score: Double, id: Long)

  /** Bounded per-group top-k: keeps the k best (score DESC, id ASC)
    * rows per group with a k-element sorted buffer. The scale rationale
    * vs the window form (`row_number() <= k`): a window ranks by
    * shuffling and SORTING every row of every group, while this
    * aggregator's map-side partials are already ≤ k rows per group per
    * partition — the shuffle carries `groups × k` entries no matter how
    * large the table is. At 100 TB "top 3 per key" that's the
    * difference between sorting the corpus and sorting almost nothing.
    * Exact (not a sketch): merge of two top-k partials is the top-k of
    * the union because any global top-k row is in its partition's
    * top-k. Ties broken by id so results are deterministic and
    * oracle-comparable.
    */
  final class TopK(k: Int) extends Aggregator[Scored, Seq[Scored], Seq[Scored]] {
    require(k >= 1, s"k must be >= 1, got $k")

    private val ord: Ordering[Scored] =
      Ordering.by((s: Scored) => (-s.score, s.id))

    def zero: Seq[Scored] = Seq.empty

    def reduce(b: Seq[Scored], a: Scored): Seq[Scored] =
      if (b.length >= k && ord.lteq(b.last, a)) b // not better than the worst kept
      else {
        val (pre, post) = b.span(ord.lteq(_, a))
        ((pre :+ a) ++ post).take(k)
      }

    def merge(x: Seq[Scored], y: Seq[Scored]): Seq[Scored] = {
      // merge of two sorted runs, truncated to k
      val out = collection.mutable.ArrayBuffer[Scored]()
      var (i, j) = (0, 0)
      while (out.length < k && (i < x.length || j < y.length)) {
        if (j >= y.length || (i < x.length && ord.lteq(x(i), y(j)))) {
          out += x(i); i += 1
        } else { out += y(j); j += 1 }
      }
      out.toSeq
    }

    def finish(r: Seq[Scored]): Seq[Scored] = r
    def bufferEncoder: Encoder[Seq[Scored]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Scored]]()
    def outputEncoder: Encoder[Seq[Scored]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Scored]]()
  }

  /** One series observation for [[KendallPairs]]: per-group DENSE ranks
    * of the ord / x / y columns (ranks preserve `<`, `=`, `>` exactly,
    * so the pair partition over ranks equals the partition over raw
    * values while keeping the aggregator input fixed-width and the
    * operator generic over column types). */
  final case class SeriesPoint(o: Long, x: Long, y: Long)

  /** The full Kendall pair partition of a per-group series. Field names
    * are the wire names ([[graft.queries.AnalyticsQ.kendallTauSeries]]
    * exposes them verbatim); `s_ox` is the Mann–Kendall S statistic —
    * Σ sign(x₂−x₁) over ord-ordered pairs — which falls out of the same
    * counts for free ([[graft.queries.AnalyticsQ.mannKendallTest]]). */
  final case class PairCounts(n: Long, n_pairs: Long, concordant: Long,
    discordant: Long, ties_x: Long, ties_y: Long, ties_xy: Long,
    s_ox: Long)

  /** Exact O(d log d) Kendall pair-partition counts per group — the
    * round-15 replacement for the day×day self-join plan (the ONE
    * design watch of round 14: pairs grew ×100 for days ×10). Instead
    * of materializing d²/2 pair rows, the counts derive from
    * inversion/tie identities over ONE buffered copy of the series:
    *
    *  - n_pairs = n(n−1)/2; tie pair counts Tx/Ty/Txy are run-length
    *    sums over sorted copies (ties_x = Tx−Txy etc., so the exposed
    *    five-way partition C + D + ties_x + ties_y + ties_xy ≡ n_pairs
    *    stays spec-pinned);
    *  - D (discordant) = strict inversions of the y sequence under the
    *    (x asc, y asc) sort — x-tied pairs sort y-ascending so they
    *    never count, exactly the pairs the sign product excludes;
    *  - C = n_pairs − D − Tx − Ty + Txy;
    *  - s_ox = (n_pairs − Tx) − 2·inv(x in ord order), the Mann–Kendall
    *    S (ord is REQUIRED distinct per group — the series-grain
    *    contract, enforced loudly below, matching the old plan's
    *    `o1 < o2` pair filter which equal-ord duplicates would break).
    *
    * Inversions count by merge sort — O(d log d), executor-local, per
    * group. The buffer is the series itself: bounded by the
    * [[graft.core.GrainGuard]] cap (a 270-year daily timeline by
    * default), checked in reduce/merge so an event-grain misuse fails
    * loudly BEFORE it can build an OOM-sized buffer. Partials merge by
    * concatenation, so the map side ships series fragments — (group ×
    * days)-grain, never corpus-grain.
    */
  final class KendallPairs(maxLen: Int, op: String)
      extends Aggregator[SeriesPoint, Vector[SeriesPoint], PairCounts] {
    require(maxLen >= 1, s"maxLen must be >= 1, got $maxLen")

    private def cap(n: Int): Unit =
      if (n > maxLen) throw new IllegalArgumentException(
        graft.core.GrainGuard.contract(op, maxLen) + s" (got $n elements)")

    def zero: Vector[SeriesPoint] = Vector.empty

    def reduce(b: Vector[SeriesPoint], a: SeriesPoint)
        : Vector[SeriesPoint] = { cap(b.length + 1); b :+ a }

    def merge(x: Vector[SeriesPoint], y: Vector[SeriesPoint])
        : Vector[SeriesPoint] = { cap(x.length + y.length); x ++ y }

    /** Strict inversions (i < j with a(i) > a(j)) by counting merge
      * sort; mutates `a` into sorted order. */
    private def inversions(a: Array[Long]): Long = {
      val tmp = new Array[Long](a.length)
      def rec(lo: Int, hi: Int): Long = // [lo, hi)
        if (hi - lo <= 1) 0L
        else {
          val mid = (lo + hi) >>> 1
          var inv = rec(lo, mid) + rec(mid, hi)
          var i = lo; var j = mid; var k = lo
          while (i < mid && j < hi) {
            if (a(i) <= a(j)) { tmp(k) = a(i); i += 1 }
            else { tmp(k) = a(j); inv += mid - i; j += 1 }
            k += 1
          }
          while (i < mid) { tmp(k) = a(i); i += 1; k += 1 }
          while (j < hi) { tmp(k) = a(j); j += 1; k += 1 }
          System.arraycopy(tmp, lo, a, lo, hi - lo)
          inv
        }
      rec(0, a.length)
    }

    /** Σ c(c−1)/2 over equal-key runs of a SORTED array. */
    private def tiePairs[T](sorted: Array[T]): Long = {
      var total = 0L; var run = 1L; var i = 1
      while (i < sorted.length) {
        if (sorted(i) == sorted(i - 1)) run += 1
        else { total += run * (run - 1) / 2; run = 1 }
        i += 1
      }
      total + run * (run - 1) / 2
    }

    def finish(buf: Vector[SeriesPoint]): PairCounts = {
      val n = buf.length
      if (n == 0) return PairCounts(0L, 0L, 0L, 0L, 0L, 0L, 0L, 0L)
      val byO = buf.toArray
      java.util.Arrays.sort(byO, Ordering.by((p: SeriesPoint) => p.o))
      var i = 1
      while (i < n) {
        if (byO(i).o == byO(i - 1).o) throw new IllegalArgumentException(
          s"$op: duplicate ord value within a group - the input must be " +
            "at (group, ord) SERIES grain (one row per ord per group); " +
            "aggregate to the series first (the q275 cell-grain form " +
            "covers duplicate-ord inputs)")
        i += 1
      }
      val nPairs = n.toLong * (n - 1) / 2
      val xInO = byO.map(_.x)
      val dOx = inversions(xInO) // sorts xInO; sorted x no longer needed
      val tx = tiePairs(xInO) // post-sort: equal-x runs are adjacent
      val yArr = buf.toArray.map(_.y)
      java.util.Arrays.sort(yArr)
      val ty = tiePairs(yArr)
      val byXY = buf.toArray
      java.util.Arrays.sort(byXY,
        Ordering.by((p: SeriesPoint) => (p.x, p.y)))
      val txy = tiePairs(byXY.map(p => (p.x, p.y)))
      val d = inversions(byXY.map(_.y))
      val c = nPairs - d - tx - ty + txy
      PairCounts(n.toLong, nPairs, c, d, tx - txy, ty - txy, txy,
        (nPairs - tx) - 2L * dOx)
    }

    def bufferEncoder: Encoder[Vector[SeriesPoint]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Vector[SeriesPoint]]()
    def outputEncoder: Encoder[PairCounts] = Encoders.product[PairCounts]
  }
}
