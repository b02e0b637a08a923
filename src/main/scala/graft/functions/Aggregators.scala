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
