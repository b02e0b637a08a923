package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.queries.AnalyticsQ

/** Dev probe for the round-15 Kendall/Mann–Kendall re-plan (the round-14
  * design watch): the OLD plan built a day×day self-join per group —
  * pairs grow ×10⁴ for days ×100 — while the new
  * [[graft.functions.Aggregators.KendallPairs]] aggregator counts
  * inversions in O(d log d). This times `kendallTauSeries` at a 1×
  * timeline (default 300 days — the fixture's scale) and a 100×
  * timeline (30 000 days) against an inline replica of the old
  * pair-join plan, and checks the two plans agree cell-for-cell at 1×.
  * Results → SCALING.md "Round-15" table.
  *
  * Env: SPARK_GRAFT_KT_DAYS (1× days, default 300),
  * SPARK_GRAFT_KT_GROUPS (default 5), SPARK_GRAFT_CPUS.
  */
object KendallTimelineProbe {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = core.GraftSession.builder(s"local[$cpus]", cpus.toInt)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val days1 = sys.env.getOrElse("SPARK_GRAFT_KT_DAYS", "300").toInt
    val groups = sys.env.getOrElse("SPARK_GRAFT_KT_GROUPS", "5").toInt

    // deterministic per-(group, day) series with ties and mixed trend
    def series(days: Int): DataFrame =
      spark.range(days.toLong * groups).select(
        concat(lit("g"), (col("id") % groups).cast("string")).as("g"),
        (col("id") / groups).as("o"),
        ((col("id") / groups) * 13L % 97L + (col("id") % groups) * 5L)
          .as("x"),
        ((col("id") / groups) * 7L % 89L).as("y"))
        .repartition(cpus.toInt)

    // the pre-round-15 plan, verbatim shape: per-group pair self-join
    def oldPlan(s1: DataFrame): DataFrame = {
      val a = s1.toDF("g", "o1", "x1", "y1")
      val b = s1.toDF("g", "o2", "x2", "y2")
      val sgn = (p: String, q: String) =>
        when(col(p) > col(q), 1).when(col(p) < col(q), -1).otherwise(0)
      val pairs = a.join(b, Seq("g")).filter(col("o1") < col("o2"))
        .select(col("g"), sgn("x2", "x1").as("sx"), sgn("y2", "y1").as("sy"))
      pairs.groupBy(col("g"))
        .agg(count(lit(1)).as("n_pairs"),
          sum(when(col("sx") * col("sy") > 0, 1L).otherwise(0L))
            .as("concordant"),
          sum(when(col("sx") * col("sy") < 0, 1L).otherwise(0L))
            .as("discordant"))
    }

    def time(df: => DataFrame): (Double, Long) = {
      df.write.format("noop").mode("overwrite").save() // warm
      val t0 = System.nanoTime()
      val n = df.count()
      ((System.nanoTime() - t0) / 1e9, n)
    }

    // 1×: equality of plans, then timings at 1× and 100×
    val s1x = series(days1).localCheckpoint()
    val newAt1 = AnalyticsQ.kendallTauSeries(s1x, "g", "o", "x", "y")
      .select(col("g"), col("n_pairs"), col("concordant"),
        col("discordant")).collect().map(_.toSeq).sortBy(_.head.toString)
    val oldAt1 = oldPlan(s1x).collect().map(_.toSeq)
      .sortBy(_.head.toString)
    println(s"kendall probe: plans agree at 1x = ${newAt1.sameElements(oldAt1) ||
      newAt1.toSeq == oldAt1.toSeq}")

    for (mult <- Seq(1, 10, 100)) {
      val d = days1 * mult
      val s = series(d).localCheckpoint()
      val (tNew, nN) = time(AnalyticsQ.kendallTauSeries(s, "g", "o", "x", "y"))
      val (tMk, _) = time(AnalyticsQ.mannKendallTest(s, "g", "o", "x"))
      // old plan timed at every step (SPARK_GRAFT_KT_OLD=0 skips the
      // 100x run: its pair table is groups × 4.5e8 rows — the cliff)
      val tOld = if (mult <= 10 ||
          sys.env.getOrElse("SPARK_GRAFT_KT_OLD", "1") == "1") {
        val (t, _) = time(oldPlan(s)); t
      } else -1.0
      println(f"kendall ${mult}x days=$d groups=$nN tau_new=$tNew%.2fs " +
        f"mk_new=$tMk%.2fs tau_oldplan=" +
        (if (tOld >= 0) f"$tOld%.2fs" else "skipped(quadratic)"))
    }
    spark.stop()
  }
}
