package graft.queries

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Exact cumulative sums over histogram/rank tables WITHOUT a global
  * single-partition window — the q124 `globalRankBy` / q148 KS
  * bucket-offset construction, factored into one shared helper
  * (round-9): a `Window.orderBy(key)` with no partition spec serializes
  * every row onto one reducer, which is fine while the table is a
  * distinct-value histogram (the q165/q170/q217 argument) but
  * degenerates exactly like the pre-fix q148 the moment the metric is
  * genuinely continuous. This construction has no such cliff, so the
  * histogram-cumsum call sites route through it unconditionally.
  *
  * Construction: keys bucket by `bucketWidth` (one map-side truncating
  * DIV — truncation is monotone, so buckets are contiguous ordered key
  * ranges even across zero); per-bucket weight totals aggregate to a
  * TINY offset table whose single-partition window runs over |buckets|
  * rows (bounded by key-range/width, never by data), broadcast back;
  * the full prefix is bucket offset + an in-bucket running sum over a
  * PARTITIONED window — the sort work spreads over |buckets| reducers.
  * Result-identical to the global window by construction (PrefixSumSpec
  * pins it property-style, and the routed queries' DuckDB oracles pin
  * it end-to-end against plain `SUM() OVER (ORDER BY ...)`).
  */
object PrefixSum {

  /** For each weight column `w`, adds `<w>_cum` = the EXCLUSIVE running
    * sum of `w` over rows ordered by `keyCol` (ascending, or descending
    * with `descending = true`), tie-broken by `tieCols` when key values
    * repeat across rows (a pure histogram needs none). `keyCol` must be
    * BIGINT-castable. Inclusive prefixes are `<w>_cum + w` at the call
    * site; a global rank is an exclusive count prefix + 1.
    *
    * `partitionCols` (round-9 second wave) makes the prefix PER KEYED
    * GROUP — the keyed sweep-line case (one cumsum per trunk/account/
    * series). The offset window then partitions by the group, so its
    * per-partition row count is the group's BUCKET count (bounded by
    * key-range/width — e.g. calendar days for a time key — never by
    * data), and the offset table is joined back instead of broadcast
    * (it is group-grain, which can be large even though each group's
    * slice is tiny). `partitionCols = Nil` keeps the original global
    * construction with its broadcast offset table. */
  def exclusive(h: DataFrame, keyCol: String, weightCols: Seq[String],
      bucketWidth: Long = 1L << 20, tieCols: Seq[String] = Nil,
      descending: Boolean = false,
      partitionCols: Seq[String] = Nil): DataFrame = {
    require(weightCols.nonEmpty, "need at least one weight column")
    require(bucketWidth >= 1, s"bucketWidth must be >= 1, got $bucketWidth")
    val sign = if (descending) "-" else ""
    val withB = h.withColumn("__psb",
      expr(s"($sign CAST($keyCol AS BIGINT)) DIV ${bucketWidth}L"))
    val pcols = partitionCols.map(col)
    val gkeys = partitionCols :+ "__psb"
    val aggs = weightCols.map(w => sum(col(w)).as(s"__t_$w"))
    val totals = withB.groupBy(gkeys.map(col): _*).agg(aggs.head, aggs.tail: _*)
    val wOff = (if (pcols.isEmpty) Window.orderBy(col("__psb"))
      else Window.partitionBy(pcols: _*).orderBy(col("__psb")))
      .rowsBetween(Window.unboundedPreceding, -1)
    val offsets = totals.select(gkeys.map(col) ++ weightCols.map(w =>
      coalesce(sum(col(s"__t_$w")).over(wOff), lit(0L)).as(s"__o_$w")): _*)
    val ord = (if (descending) col(keyCol).desc else col(keyCol).asc) +:
      tieCols.map(col)
    val wIn = Window.partitionBy(gkeys.map(col): _*).orderBy(ord: _*)
      .rowsBetween(Window.unboundedPreceding, -1)
    val joined =
      if (pcols.isEmpty) withB.join(broadcast(offsets), gkeys)
      else withB.join(offsets, gkeys)
    weightCols.foldLeft(joined) { (d, w) =>
      d.withColumn(s"${w}_cum",
        col(s"__o_$w") + coalesce(sum(col(w)).over(wIn), lit(0L)))
    }.drop("__psb" +: weightCols.map(w => s"__o_$w"): _*)
  }
}
