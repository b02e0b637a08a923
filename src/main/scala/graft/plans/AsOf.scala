package graft.plans

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.expressions.Attribute
import org.apache.spark.sql.graft.bridge
import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}

/** User-facing as-of join API. */
object AsOf {

  /** Ensure the planner knows the strategy (idempotent; also injectable at
    * session build via [[graft.GraftExtensions]]). */
  def ensureStrategy(spark: SparkSession): Unit = {
    val cur = spark.experimental.extraStrategies
    if (!cur.contains(AsOfJoinStrategy))
      spark.experimental.extraStrategies = cur :+ AsOfJoinStrategy
    val opts = spark.experimental.extraOptimizations
    if (!opts.contains(PushLeftFilterThroughAsOfJoin))
      spark.experimental.extraOptimizations = opts :+ PushLeftFilterThroughAsOfJoin
  }

  /** Left as-of join: for each left row, the latest right row (by
    * `rightTimeCol`) with time <= the left row's `leftTimeCol`, matching
    * pairwise on `leftKeys`/`rightKeys`. All right columns appear in the
    * output (nulled when no version qualifies); keep names disjoint from
    * the left side to avoid ambiguity downstream. */
  def join(left: DataFrame, right: DataFrame,
      leftKeys: Seq[String], rightKeys: Seq[String],
      leftTimeCol: String, rightTimeCol: String): DataFrame = {
    require(leftKeys.length == rightKeys.length, "key lists must align")
    val spark = left.sparkSession
    ensureStrategy(spark)
    val lp = bridge.plan(left)
    val rp = bridge.plan(right)
    def resolve(p: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan, n: String): Attribute =
      p.output.find(_.name == n).getOrElse(
        throw new IllegalArgumentException(s"column '$n' not in ${p.output.map(_.name).mkString(", ")}"))
    // The probe's binary search compares long-backed time values; anything
    // else (DateType is int-backed) would ClassCastException deep inside a
    // task — reject it here with a buildable error instead.
    def checkTime(a: Attribute): Attribute = a.dataType match {
      case TimestampType | TimestampNTZType | LongType => a
      case dt => throw new IllegalArgumentException(
        s"as-of time column '${a.name}' must be TIMESTAMP or BIGINT, got ${dt.simpleString}")
    }
    val node = AsOfJoin(lp, rp,
      leftKeys.map(resolve(lp, _)), rightKeys.map(resolve(rp, _)),
      checkTime(resolve(lp, leftTimeCol)), checkTime(resolve(rp, rightTimeCol)))
    bridge.dataset(spark, node)
  }
}
