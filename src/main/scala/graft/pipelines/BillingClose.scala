package graft.pipelines

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.queries.BillingQ

/** The month-end billing close as ONE composed run — the back-office
  * sequence the reference's rated output ultimately feeds (mediation →
  * rating → BILLING): proration turns the plan-change history into the
  * (account, month) charge base, the charge base becomes the invoice
  * ledger, collections grade the ledger against the payment pool, the
  * commit contracts true up against the same base, and a reconciliation
  * card proves the books balance before anything ships downstream.
  *
  * Standalone, the dunning and true-up queries each rebuild the charge
  * base (that is their oracle contract); a real close reads ALL of these
  * from one base. [[BillingClose.build]] follows the [[DedupGraph]] /
  * [[CurationPipeline]] lineage-cut convention: the proration output
  * materializes ONCE (`localCheckpoint`, or durable `checkpoint` with
  * `reliable = true`), and every downstream card is the SAME
  * oracle-pinned operator ([[BillingQ.dunningCard]],
  * [[BillingQ.commitmentTrueup]], [[BillingQ.revenueRecognition]])
  * called on the shared cut — so each card is value-identical to its
  * standalone query by construction (BillingCloseSpec proves it).
  *
  * Scale shape at 100 TB: the charge base is the one change-history-
  * sized pass (lead window per account + bounded month explode);
  * everything after is billing-grain — (account, month) and smaller.
  * Composing k cards costs 1 × base + Σ(billing-grain card work)
  * instead of k × base.
  */
final class BillingClose private[pipelines] (
    val charges: DataFrame, payments: DataFrame, commits: DataFrame,
    asOfDay: DataFrame) {

  /** The charge base as an invoice ledger: one invoice per (account,
    * month), dated the FIRST day of the FOLLOWING month (a month's
    * usage bills when the month closes — the standard cycle-forward
    * invoice date), keyed by the month date (unique per account). */
  lazy val invoices: DataFrame = charges.select(
    col("account_id").as("cust"),
    expr("CAST(add_months(CAST(month AS DATE), 1) AS DATE)").as("d"),
    col("month").as("k"), col("charge_centi").as("amt"))

  /** q250's card on the composed ledger: FIFO payment application +
    * dunning levels. */
  lazy val dunning: DataFrame =
    BillingQ.dunningCard(invoices, payments, asOfDay)

  /** q254's card on the composed base: commit shortfall billing. */
  lazy val trueup: DataFrame = BillingQ.commitmentTrueup(
    charges.select(col("account_id"),
      to_date(col("month")).as("m"),
      col("charge_centi").as("amount_centi")),
    commits)

  /** The close's balance proof — the revenue-assurance gate read before
    * the invoice files ship: (a) Σ invoiced ≡ Σ charged (the ledger
    * reshape lost nothing), (b) Σ open dunning balances ≡ Σ invoiced −
    * applied payments (FIFO application conserves money: applied =
    * min(pool, invoiced) per customer). One row; `books_balance` must
    * be true. */
  lazy val reconciliation: DataFrame = {
    val charged = charges.agg(sum(col("charge_centi")).as("charged_centi"))
    val invoiced = invoices.agg(sum(col("amt")).as("invoiced_centi"))
    val open = dunning.agg(sum(col("balance_centi")).as("open_centi"))
    val applied = invoices.groupBy(col("cust"))
      .agg(sum(col("amt")).as("inv_c"))
      .join(payments.groupBy(col("cust"))
        .agg(sum(col("pay_centi")).as("paid_c")), Seq("cust"), "left")
      .agg(sum(least(col("inv_c"), coalesce(col("paid_c"), lit(0L))))
        .as("applied_centi"))
    charged.crossJoin(invoiced).crossJoin(open).crossJoin(applied)
      .withColumn("books_balance",
        col("charged_centi") === col("invoiced_centi") &&
        col("open_centi") === col("invoiced_centi") - col("applied_centi"))
  }
}

object BillingClose {

  /** Materialize the proration charge base once and wire the close.
    *
    * `changes`: (account_id, change_date DATE, price_centi) — the plan
    * history [[BillingQ.prorationCharges]] takes. `payments`: (cust,
    * pay_centi). `commits`: (account_id, commit_centi). `asOfDay`:
    * 1-row (asof DATE) aging reference — a WATERMARK, not wall-clock
    * (the q168 re-run rule). */
  def build(spark: SparkSession, changes: DataFrame, payments: DataFrame,
      commits: DataFrame, asOfDay: DataFrame,
      reliable: Boolean = false): BillingClose = {
    val base = BillingQ.prorationCharges(changes)
    val cut = if (reliable) base.checkpoint() else base.localCheckpoint()
    new BillingClose(cut, payments, commits, asOfDay)
  }
}
