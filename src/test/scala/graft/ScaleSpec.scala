package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

/** Scale-mechanics specs: bucketed co-located joins (shuffle elimination
  * for repeated fact-fact joins) and dynamic partition pruning — the two
  * cluster-side behaviors SURVEY §2B/§4 rely on that plan-shape tests on
  * plain scans can't show.
  */
class ScaleSpec extends SparkSpec {

  import spark.implicits._

  test("bucketed tables join without a shuffle (co-located fact-fact join)") {
    val wh = Files.createTempDirectory("graft_warehouse").toString
    val orders = graft.core.Tables.load(spark, sfDir, "orders")
    val lineitem = graft.core.Tables.load(spark, sfDir, "lineitem")
    spark.sql("DROP TABLE IF EXISTS orders_b")
    spark.sql("DROP TABLE IF EXISTS lineitem_b")
    orders.write.bucketBy(8, "o_orderkey").sortBy("o_orderkey")
      .option("path", s"$wh/orders_b").saveAsTable("orders_b")
    lineitem.write.bucketBy(8, "l_orderkey").sortBy("l_orderkey")
      .option("path", s"$wh/lineitem_b").saveAsTable("lineitem_b")
    val joined = spark.table("lineitem_b")
      .join(spark.table("orders_b"), col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("o_orderstatus")).agg(sum(col("l_quantity")).as("q"))
    // disable broadcast so the join must pick a shuffle-or-bucket strategy
    val prior = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      joined.collect()
      val plan = joined.queryExecution.executedPlan.toString
      // the agg may shuffle on o_orderstatus; the JOIN keys must not
      val joinExchanges = plan.split("\n")
        .filter(l => l.contains("Exchange hashpartitioning(l_orderkey") ||
          l.contains("Exchange hashpartitioning(o_orderkey"))
      assert(joinExchanges.isEmpty,
        s"bucketed join must not shuffle either side:\n$plan")
      assert(plan.contains("SortMergeJoin"), plan)
      assert(plan.contains("SelectedBucketsCount"), plan)
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prior)
  }

  test("dynamic partition pruning kicks in for partitioned fact × filtered dim") {
    val dir = Files.createTempDirectory("graft_dpp").toString
    graft.core.Tables.load(spark, sfDir, "orders")
      .withColumn("status", col("o_orderstatus"))
      .write.mode("overwrite").partitionBy("status").parquet(dir)
    val fact = spark.read.parquet(dir)
    val dim = Seq(("F", "final"), ("O", "open"), ("P", "pending"))
      .toDF("status_key", "label")
      .filter(col("label") === "final") // selective dim filter
    val joined = fact.join(dim, col("status") === col("status_key"))
      .agg(count(lit(1)))
    val analyzed = joined.queryExecution.executedPlan.toString
    assert(analyzed.contains("dynamicpruning") || analyzed.contains("DynamicPruning") ||
      analyzed.contains("PartitionFilters: [isnotnull(status"),
      s"no partition pruning in:\n$analyzed")
    assert(joined.head().getLong(0) ==
      fact.filter(col("status") === "F").count())
  }
}
