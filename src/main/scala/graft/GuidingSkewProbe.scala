package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

import graft.queries.PreratingQ

/** Dev probe: width-skew hardening of the number-range guiding join
  * (round-11 verdict task 3). A REAL number plan mixes one nationwide
  * allocation with tens of thousands of small ranges; under the old
  * single-global-width bucketization the bucket width becomes the
  * nationwide width, every small range collapses into a handful of
  * buckets, and each CDR's hash-bucket probe scans a huge residual
  * candidate list. The per-width-class cascade (PreratingQ.widthClass)
  * keeps every class's candidate lists O(1).
  *
  * Measures [[PreratingQ.guideRanges]] (cascade) against an inline
  * replica of the old global-width construction on:
  *   - a UNIFORM plan (50k equal ranges — the shape the old code was
  *     tuned on; the cascade must not regress here), and
  *   - a PATHOLOGICAL plan (1 nationwide + 50k small ranges).
  * Results → SCALING.md.
  */
object GuidingSkewProbe {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = core.GraftSession.builder(s"local[$cpus]", cpus.toInt)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val n = sys.env.getOrElse("SPARK_GRAFT_GUIDE_ROWS", "2000000").toLong

    // probe traffic: canonical numbers spread over the whole plan space
    val cdrs = spark.range(n).select(
      col("id").as("event_id"),
      (lit(49100000000L) + (col("id") * 7919L) % 900000000L)
        .cast("string").as("canonical"))
      .repartition(cpus.toInt).localCheckpoint()

    // 50k small ranges of width 10^4 with gaps, covering the low half
    def small = spark.range(0L, 50000L).toDF("r").select(
      (lit(49100000000L) + col("r") * 9000L).as("range_start"),
      (lit(49100000000L) + col("r") * 9000L + 4999L).as("range_end"),
      (lit(1000L) + col("r")).as("account_id"))
    // one nationwide allocation over the upper half
    def nationwide = spark.range(0L, 1L).toDF("r").select(
      lit(49550000000L).as("range_start"),
      lit(49999999999L).as("range_end"),
      lit(1L).as("account_id"))

    /** The OLD construction, faithfully: the same overlap guard (a
      * dim-grain lag window riding the broadcast build) and one global
      * bucket width = the widest range. */
    def globalWidth(ranges: DataFrame): DataFrame = {
      val dimW = org.apache.spark.sql.expressions.Window
        .orderBy(col("range_start"))
      val guarded = ranges
        .withColumn("__prev_end", lag(col("range_end"), 1).over(dimW))
        .withColumn("range_start",
          when(col("range_end") < col("range_start") ||
              col("__prev_end") >= col("range_start"),
            expr("CAST(raise_error('overlap') AS BIGINT)"))
            .otherwise(col("range_start")))
        .drop("__prev_end")
      val width = math.max(1L, guarded
        .agg(max(col("range_end") - col("range_start") + 1L)).collect()(0)
        .getLong(0))
      val dim = guarded.withColumn("__b", explode(expr(
        s"sequence(range_start DIV ${width}L, range_end DIV ${width}L)")))
      val probe = cdrs.withColumn("__num", col("canonical").cast(LongType))
        .withColumn("__b", expr(s"__num DIV ${width}L"))
      probe.join(broadcast(dim), probe("__b") === dim("__b") &&
          col("__num").between(col("range_start"), col("range_end")), "left")
        .drop("__b", "__num", "range_start", "range_end")
    }

    def agg(df: DataFrame): DataFrame =
      df.agg(count(lit(1)).as("n"),
        sum(when(col("account_id").isNotNull, 1L).otherwise(0L))
          .as("guided"),
        sum(coalesce(col("account_id"), lit(0L))).as("chk"))

    // the plans are BUILT ONCE outside the timer: construction-time
    // dim-grain jobs (overlap guard, class/width collect) are per-dim-
    // VERSION costs, not per-probe costs — what's timed is the per-CDR
    // work a micro-batch or batch scan actually pays
    def time(df: DataFrame): (Double, Seq[Any]) = {
      agg(df).write.format("noop").mode("overwrite").save() // warm plan
      val t0 = System.nanoTime()
      val out = agg(df).collect()
      ((System.nanoTime() - t0) / 1e9, out.head.toSeq)
    }

    for ((label, plan) <- Seq(
        ("uniform", small),
        ("pathological", small.union(nationwide)))) {
      val p = plan.localCheckpoint()
      val (tC, rC) = time(PreratingQ.guideRanges(
        cdrs, p, keepBounds = false).drop("reason"))
      val (tG, rG) = time(globalWidth(p))
      println(f"guideskew $label rows=$n ranges=${p.count()} " +
        f"cascade=$tC%.2fs global_width=$tG%.2fs " +
        f"speedup=${tG / tC}%.2fx equal=${rC == rG}")
    }
    spark.stop()
  }
}
