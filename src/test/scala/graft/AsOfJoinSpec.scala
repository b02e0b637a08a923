package graft

import java.sql.Timestamp

import graft.plans.AsOf
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Custom as-of join operator (graft.plans.AsOfJoin): semantics vs the
  * composed join+rank formulation, boundary/tie/no-match behavior, and
  * plan shape.
  */
class AsOfJoinSpec extends SparkSpec {

  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  private val calls = Seq(
    (1L, "VOICE", ts("2026-08-12 04:58:00")),
    (2L, "VOICE", ts("2026-08-12 05:00:00")), // exactly at version boundary
    (3L, "SMS", ts("2026-08-12 06:00:00")),
    (4L, "DATA", ts("2026-08-12 06:00:00")), // key with no versions
    (5L, "VOICE", ts("2025-12-31 23:59:59"))) // before all versions
    .toDF("call_id", "ct", "call_ts")

  private val tariffs = Seq(
    ("VOICE", ts("2026-01-01 00:00:00"), 1.0),
    ("VOICE", ts("2026-08-12 05:00:00"), 2.0),
    ("SMS", ts("2026-01-01 00:00:00"), 0.1))
    .toDF("t_ct", "valid_from", "rate")

  test("picks latest version at or before the left time; outer on no match") {
    val got = AsOf.join(calls, tariffs, Seq("ct"), Seq("t_ct"), "call_ts", "valid_from")
      .select(col("call_id"), col("rate"))
      .as[(Long, Option[Double])].collect().toMap
    assert(got == Map(
      1L -> Some(1.0), // before 05:00 boundary → old version
      2L -> Some(2.0), // exactly at boundary → inclusive
      3L -> Some(0.1),
      4L -> None, // no versions for DATA
      5L -> None)) // predates all versions
  }

  test("matches the composed join+rank formulation on the events fixture") {
    val ev = graft.core.Tables.load(spark, sfDir, "events")
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("event_id").as("p_id"), col("user_id").as("p_user"), col("ts").as("p_ts"))
    val clicks = ev.filter(col("event_type") === "click")
      .select(col("event_id").as("c_id"), col("user_id").as("c_user"), col("ts").as("c_ts"))

    val custom = AsOf.join(purchases, clicks, Seq("p_user"), Seq("c_user"), "p_ts", "c_ts")
      .select(col("p_id"), col("c_id")).as[(Long, Option[Long])].collect().toMap

    val w = Window.partitionBy(col("p_id")).orderBy(col("c_ts").desc, col("c_id").desc)
    val composed = purchases
      .join(clicks, col("p_user") === col("c_user") && col("c_ts") <= col("p_ts"), "left")
      .withColumn("rn", row_number().over(w)).filter(col("rn") === 1)
      .select(col("p_id"), col("c_id")).as[(Long, Option[Long])].collect().toMap

    assert(custom == composed)
  }

  test("small right side plans BroadcastAsOfJoin — fact side unshuffled") {
    val df = AsOf.join(calls, tariffs, Seq("ct"), Seq("t_ct"), "call_ts", "valid_from")
    val plan = df.queryExecution.executedPlan.toString
    // exec nodes print without the Exec suffix
    assert(plan.contains("BroadcastAsOfJoin"), plan)
    assert(!plan.contains("Exchange hashpartitioning"),
      s"broadcast as-of must not shuffle anything:\n$plan")
  }

  test("large right side plans the shuffled variant with co-partitioned children") {
    val prior = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val df = AsOf.join(calls, tariffs, Seq("ct"), Seq("t_ct"), "call_ts", "valid_from")
      val plan = df.queryExecution.executedPlan.toString
      assert(plan.contains("AsOfJoin "), plan)
      assert(plan.split("\n").count(_.contains("Exchange hashpartitioning")) == 2,
        s"expected exactly one clustering shuffle per side:\n$plan")
      // same results on the shuffled path
      val got = df.select(col("call_id"), col("rate"))
        .as[(Long, Option[Double])].collect().toMap
      assert(got(2L) == Some(2.0) && got(4L).isEmpty)
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prior)
  }

  test("left-side filters above the as-of join reach the parquet scan") {
    val ev = graft.core.Tables.load(spark, sfDir, "events")
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("event_id").as("p_id"), col("user_id").as("p_user"), col("ts").as("p_ts"))
    val clicks = ev.filter(col("event_type") === "click")
      .select(col("event_id").as("c_id"), col("user_id").as("c_user"), col("ts").as("c_ts"))
    val df = AsOf.join(purchases, clicks, Seq("p_user"), Seq("c_user"), "p_ts", "c_ts")
      .filter(col("p_id") > 500) // written ABOVE the custom node
    val plan = df.queryExecution.executedPlan.toString
    // PushLeftFilterThroughAsOfJoin + Catalyst pushdown must land it in
    // the left scan's Filter/PushedFilters (plan strings truncate long
    // filter lists, so match the data-filter form), not above the join.
    assert(plan.contains("> 500)"), plan)
    assert(plan.contains("GreaterThan(event_id,5"), plan)
  }

  test("multi-key as-of join") {
    val l = Seq((1L, "a", 1, ts("2026-01-02 00:00:00"))).toDF("id", "k1", "k2", "t")
    val r = Seq(
      ("a", 1, ts("2026-01-01 00:00:00"), "right-a1"),
      ("a", 2, ts("2026-01-01 00:00:00"), "right-a2"))
      .toDF("rk1", "rk2", "rt", "tag")
    val got = AsOf.join(l, r, Seq("k1", "k2"), Seq("rk1", "rk2"), "t", "rt")
      .select("tag").as[String].collect()
    assert(got.sameElements(Array("right-a1")))
  }

  test("unknown column errors clearly") {
    val e = intercept[IllegalArgumentException](
      AsOf.join(calls, tariffs, Seq("nope"), Seq("t_ct"), "call_ts", "valid_from"))
    assert(e.getMessage.contains("'nope' not in"))
  }

  test("join output feeds UnsafeRow-requiring parents without a Project") {
    // Shuffle (repartition) and sort directly above the raw join output —
    // regression for emitting JoinedRow/GenericInternalRow upward.
    val raw = AsOf.join(calls, tariffs, Seq("ct"), Seq("t_ct"), "call_ts", "valid_from")
    val viaShuffle = raw.repartition(3).orderBy(col("call_id")).collect()
    assert(viaShuffle.length == 5)
    // and on the shuffled-join path too
    val prior = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val shuffled = AsOf.join(calls, tariffs, Seq("ct"), Seq("t_ct"), "call_ts", "valid_from")
        .repartition(3).orderBy(col("call_id")).collect()
      assert(shuffled.length == 5)
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prior)
  }

  test("non-long-backed time columns are rejected at build time") {
    val datedCalls = calls.withColumn("call_d", to_date(col("call_ts")))
    val e = intercept[IllegalArgumentException](
      AsOf.join(datedCalls, tariffs, Seq("ct"), Seq("t_ct"), "call_d", "valid_from"))
    assert(e.getMessage.contains("must be TIMESTAMP or BIGINT"))
    val datedTariffs = tariffs.withColumn("valid_d", to_date(col("valid_from")))
    val e2 = intercept[IllegalArgumentException](
      AsOf.join(calls, datedTariffs, Seq("ct"), Seq("t_ct"), "call_ts", "valid_d"))
    assert(e2.getMessage.contains("must be TIMESTAMP or BIGINT"))
  }
}
