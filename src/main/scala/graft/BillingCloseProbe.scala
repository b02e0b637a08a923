package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.pipelines.BillingClose
import graft.queries.BillingQ

/** Dev probe for the composed [[BillingClose]]: at 1× (sf0.1) and 10×
  * (the ScaleProbe replica), measure the COMPOSED close — one
  * materialized charge base, then dunning + true-up + reconciliation —
  * next to the SUM of the standalone paths (each rebuilding the
  * proration base, which is exactly what the per-query bench measures).
  * Prints one line per scale with composed/standalone-sum/ratio for
  * SCALING.md.
  */
object BillingCloseProbe {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = core.GraftSession.builder(s"local[$cpus]", cpus.toInt).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val oneX = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val tenX = sys.env.getOrElse("SPARK_GRAFT_SCALE_DIR", "/tmp/graft_scale")
    def noop(df: DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()
    def time(f: => Unit): Double = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }

    // the q248/q250/q254 fixture shapes, from one orders scan
    def inputs(dir: String): (DataFrame, DataFrame, DataFrame, DataFrame) = {
      val o = core.Tables.load(spark, dir, "orders")
      val changes = o.groupBy(col("o_custkey").as("account_id"),
          to_date(col("o_orderdate")).as("change_date"))
        .agg(max(col("o_orderkey")).as("k"))
        .withColumn("price_centi", lit(500L) + (col("k") % 50L) * 10L)
        .drop("k")
      val payments = o.filter(col("o_orderstatus") =!= "F")
        .select(col("o_custkey").as("cust"),
          expr("CAST(round(o_totalprice * 100) AS BIGINT)").as("pay_centi"))
      val commits = core.Tables.load(spark, dir, "customer")
        .select(col("c_custkey").as("account_id"),
          greatest(expr("CAST(round(c_acctbal) AS BIGINT)"), lit(0L))
            .as("commit_centi"))
      val asof = o.agg(max(to_date(col("o_orderdate"))).as("asof"))
      (changes, payments, commits, asof)
    }

    def run(tag: String, dir: String): Unit = {
      val (changes, payments, commits, asof) = inputs(dir)
      val tComposed = time {
        val c = BillingClose.build(spark, changes, payments, commits, asof)
        noop(c.dunning); noop(c.trueup); noop(c.reconciliation)
      }
      val tStandalone = time {
        // each consumer pays the proration base itself (per-query shape)
        val inv = BillingQ.prorationCharges(changes).select(
          col("account_id").as("cust"),
          expr("CAST(add_months(CAST(month AS DATE), 1) AS DATE)").as("d"),
          col("month").as("k"), col("charge_centi").as("amt"))
        noop(BillingQ.dunningCard(inv, payments, asof))
        noop(BillingQ.commitmentTrueup(
          BillingQ.prorationCharges(changes).select(col("account_id"),
            to_date(col("month")).as("m"),
            col("charge_centi").as("amount_centi")), commits))
        noop(BillingQ.prorationCharges(changes)
          .agg(sum(col("charge_centi")).as("charged_centi")))
      }
      println(f"billing_close,$tag,composed=$tComposed%.2fs," +
        f"standalone_sum=$tStandalone%.2fs,speedup=${tStandalone / tComposed}%.2f")
    }

    // one discarded pass: JVM/codegen/page-cache warm-up, so neither
    // side pays the cold-start (the bench protocol's warm-up rule)
    run("warmup_discard", oneX)
    run("1x", oneX)
    if (new java.io.File(tenX).exists) run("10x", tenX)
    spark.stop()
  }
}
