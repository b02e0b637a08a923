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
}
