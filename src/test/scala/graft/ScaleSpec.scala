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

  test("AQE splits a skewed join partition at runtime") {
    // The planned-ahead path is Skew.saltedJoin; this proves the runtime
    // half of the story: AQE's OptimizeSkewedJoin carves the hot key's
    // oversized shuffle partition into parallel splits. Thresholds are
    // lowered so fixture-sized data exhibits what a 100 TB hot key would.
    val conf = spark.conf
    val saved = Seq(
      "spark.sql.autoBroadcastJoinThreshold",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes",
      "spark.sql.adaptive.coalescePartitions.enabled").map(k => k -> conf.get(k))
    conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "64KB")
    conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "16KB")
    conf.set("spark.sql.adaptive.coalescePartitions.enabled", "false")
    try {
      // 99.9% of 300k rows land on join key 1 (data-driven, not a foldable
      // literal) vs a uniform small side
      val hot = spark.range(300000)
        .select(when(col("id") % 1000 =!= 0, 1L).otherwise(col("id")).as("k"),
          col("id").as("payload"))
      val uniform = spark.range(100).select((col("id") % 50).as("k"), col("id").as("v"))
      val joined = hot.join(uniform, Seq("k"))
      joined.collect() // execute THIS queryExecution so AQE finalizes it
                       // (write/foreach spawn a separate execution)
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("skew=true"), s"AQE skew split did not fire:\n$plan")
    } finally saved.foreach { case (k, v) => conf.set(k, v) }
  }

  test("runtime bloom filter prunes the fact side of a selective fact-fact join") {
    // At 100 TB a selective dim-side filter should cut fact-scan output
    // BEFORE the shuffle: Spark's runtime bloom filter builds a sketch of
    // the filtered build side and injects might_contain on the probe side.
    val conf = spark.conf
    val saved = Seq(
      "spark.sql.autoBroadcastJoinThreshold",
      "spark.sql.optimizer.runtime.bloomFilter.enabled",
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold")
      .map(k => k -> conf.get(k))
    conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    conf.set("spark.sql.optimizer.runtime.bloomFilter.enabled", "true")
    // fixture-sized fact side; production default (10GB) stays for clusters
    conf.set("spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold", "1KB")
    try {
      val li = graft.core.Tables.load(spark, sfDir, "lineitem")
      val o = graft.core.Tables.load(spark, sfDir, "orders")
        .filter(col("o_orderstatus") === "P") // selective dim-side filter
      val j = li.join(o, col("l_orderkey") === col("o_orderkey")).agg(count(lit(1)))
      j.collect()
      val plan = j.queryExecution.executedPlan.toString
      assert(plan.contains("bloom_filter_agg") || plan.contains("BloomFilter"),
        s"runtime bloom filter not injected:\n$plan")
    } finally saved.foreach { case (k, v) => conf.set(k, v) }
  }

  test("HLL sketches are partition-layout independent (mergeable partials)") {
    // q12b's approx_count_distinct has no DuckDB oracle (algorithm-
    // specific); this pins the property that makes it safe at cluster
    // scale: partial sketches merged across ANY partitioning produce the
    // identical estimate.
    val li = graft.core.Tables.load(spark, sfDir, "lineitem")
    def est(df: org.apache.spark.sql.DataFrame): Seq[(String, Long)] =
      df.groupBy(col("l_returnflag"))
        .agg(approx_count_distinct(col("l_partkey"), 0.02).as("e"))
        .collect().map(r => (r.getString(0), r.getLong(1))).toSeq.sortBy(_._1)
    val base = est(li)
    assert(est(li.repartition(17)) == base)
    assert(est(li.repartition(2, col("l_suppkey"))) == base)
    assert(est(li.coalesce(1)) == base)
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
