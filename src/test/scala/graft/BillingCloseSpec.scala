package graft

import java.sql.Date

import org.apache.spark.sql.functions._

import graft.pipelines.BillingClose
import graft.queries.BillingQ

/** The composed month-end close must be value-identical to the
  * standalone oracle-pinned operators it wires, and its reconciliation
  * gate must actually prove the books. */
class BillingCloseSpec extends SparkSpec {

  import spark.implicits._

  private def changes = Seq(
    (1L, Date.valueOf("2026-01-01"), 3000L), // 3 full months Jan-Mar
    (1L, Date.valueOf("2026-03-16"), 6000L), // mid-March upgrade
    (2L, Date.valueOf("2026-02-10"), 1000L))
    .toDF("account_id", "change_date", "price_centi")

  private def payments =
    Seq((1L, 5000L)).toDF("cust", "pay_centi")

  private def commits =
    Seq((1L, 4000L), (2L, 2000L)).toDF("account_id", "commit_centi")

  private def asOf =
    Seq(Tuple1(Date.valueOf("2026-06-30"))).toDF("asof")

  private def close =
    BillingClose.build(spark, changes, payments, commits, asOf)

  test("composed cards are value-identical to the standalone operators") {
    val c = close
    val base = BillingQ.prorationCharges(changes)
    val inv = base.select(col("account_id").as("cust"),
      expr("CAST(add_months(CAST(month AS DATE), 1) AS DATE)").as("d"),
      col("month").as("k"), col("charge_centi").as("amt"))
    val wantDunning = BillingQ.dunningCard(inv, payments, asOf)
      .collect().map(_.toSeq).toSet
    val wantTrueup = BillingQ.commitmentTrueup(
      base.select(col("account_id"), to_date(col("month")).as("m"),
        col("charge_centi").as("amount_centi")), commits)
      .collect().map(_.toSeq).toSet
    assert(c.dunning.collect().map(_.toSeq).toSet == wantDunning)
    assert(c.trueup.collect().map(_.toSeq).toSet == wantTrueup)
  }

  test("reconciliation balances and pins the hand numbers") {
    val c = close
    val r = c.reconciliation
      .as[(Long, Long, Long, Long, Boolean)].head()
    val (charged, invoiced, open, applied, ok) = r
    assert(ok, r.toString)
    assert(charged == invoiced)
    assert(open == invoiced - applied)
    // account 1 pays 5000 of its ledger; account 2 pays nothing, so
    // applied is exactly account 1's pool (its charges exceed 5000:
    // Jan+Feb alone are 3000+3000)
    assert(applied == 5000L, r.toString)
    // every row of the charge base survives into the ledger
    assert(c.charges.count() == c.invoices.count())
  }

  test("the charge base is materialized once (checkpointed plan)") {
    val c = close
    // localCheckpoint shows up as a scan over an RDD, not a re-derivation
    val plan = c.dunning.queryExecution.optimizedPlan.toString
    assert(plan.contains("LogicalRDD") || plan.contains("Scan ExistingRDD"),
      plan)
  }
}
