package graft.etl

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Data-layout writers — how a 100 TB table should land on disk.
  *
  * Parquet keeps per-column min/max statistics per file and row group;
  * a scan with a selective predicate skips every file whose range can't
  * match. That skip is only effective if the writer CLUSTERED the data:
  * rows sorted/partitioned so each file covers a narrow key range. The
  * reference stages CDR batches as flat files per session
  * (`MFramework.cpp:1261-1302` — files are the bulk-data plane); these
  * writers are the Spark-native equivalent with pruning built in.
  *
  * - [[writeRangeClustered]]: disjoint key ranges per file — best for
  *   one dominant filter/sort dimension (time, id).
  * - [[writeZOrdered]]: interleaved-bit (Morton) ordering over two
  *   dimensions — each file covers a compact rectangle in (x, y) space,
  *   so selective filters on EITHER dimension skip most files. The
  *   standard lakehouse trick for two-dimensional access patterns.
  */
object Layout {

  /** Morton (Z-order) interleave of the low `bits` bits of two
    * non-negative integer columns: bit i of `x` lands at position 2i,
    * bit i of `y` at 2i+1. Monotone locality: numerically close z-values
    * are close in BOTH x and y. Pure bit arithmetic — stays inside
    * whole-stage codegen. */
  def zorder2(x: Column, y: Column, bits: Int = 16): Column = {
    require(bits >= 1 && bits <= 31, s"zorder2 bits must be in [1,31], got $bits")
    (0 until bits).map { i =>
      shiftleft(shiftright(x.cast(LongType), i).bitwiseAND(lit(1L)), 2 * i) +
        shiftleft(shiftright(y.cast(LongType), i).bitwiseAND(lit(1L)), 2 * i + 1)
    }.reduce(_ + _).cast(LongType)
  }

  /** SQL twin of [[zorder2]] (identical term order; `>>`/`<<`/`&` parse
    * in both Spark SQL and DuckDB). */
  def zorder2Sql(x: String, y: String, bits: Int = 16): String = {
    require(bits >= 1 && bits <= 31, s"zorder2 bits must be in [1,31], got $bits")
    (0 until bits).map { i =>
      s"(((($x >> $i) & 1) << ${2 * i}) + ((($y >> $i) & 1) << ${2 * i + 1}))"
    }.mkString("CAST(", " + ", " AS BIGINT)")
  }

  /** Write `df` as `numFiles` parquet files with DISJOINT `keys` ranges:
    * repartitionByRange samples the key distribution for balanced
    * boundaries, sortWithinPartitions makes row groups internally ordered
    * so min/max stats are tight. A later scan filtering on a key prefix
    * reads ~1/numFiles of the data instead of all of it. */
  def writeRangeClustered(df: DataFrame, path: String, keys: Seq[String],
      numFiles: Int): Unit = {
    require(keys.nonEmpty, "at least one clustering key required")
    require(numFiles >= 1, s"numFiles must be >= 1, got $numFiles")
    val cols = keys.map(col)
    df.repartitionByRange(numFiles, cols: _*)
      .sortWithinPartitions(cols: _*)
      .write.mode("overwrite").parquet(path)
  }

  /** Write `df` z-ordered on two integer dimensions: each of the
    * `numFiles` files covers one compact segment of the Morton curve —
    * a bounded rectangle in (x, y) — so min/max pruning works for
    * selective filters on either column. `bits` must cover the columns'
    * value range (values are taken mod 2^bits by the interleave). */
  def writeZOrdered(df: DataFrame, path: String, xCol: String, yCol: String,
      numFiles: Int, bits: Int = 16): Unit = {
    require(numFiles >= 1, s"numFiles must be >= 1, got $numFiles")
    df.withColumn("__z", zorder2(col(xCol), col(yCol), bits))
      .repartitionByRange(numFiles, col("__z"))
      .sortWithinPartitions(col("__z"))
      .drop("__z") // projection after the sort keeps the order
      .write.mode("overwrite").parquet(path)
  }
}
