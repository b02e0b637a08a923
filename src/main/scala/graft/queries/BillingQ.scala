package graft.queries

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import Dsl._

/** Subscription-billing back-office jobs — the monthly batch the reference's
  * rated output feeds (rating produces charges; these produce the bill).
  * Mirrors the mediation→billing hand-off of the reference pipeline
  * (gsmrating output → billing ingest): mid-cycle proration, deferred
  * revenue recognition, and receivables dunning. All money is exact centi
  * BIGINT; calendar math is DATE-typed in both engines (the one domain
  * where epoch-day arithmetic is NOT enough — months have shapes).
  */
object BillingQ {

  /** Mid-cycle plan-change proration — the subscription biller's core job:
    * an account's plan history is a list of (change_date, monthly
    * price_centi) rows; each calendar month bills every plan segment that
    * overlaps it at `price * overlap_days DIV days_in_month` (floor — the
    * customer-favorable rounding billers use; the dropped sub-centi
    * remainder is bounded by n_segments per month).
    *
    * Input contract: one row per (account_id, change_date) — same-day
    * re-changes must be pre-collapsed to the effective one (the fixture
    * keeps the max-key order). A segment runs [change_date, next change)
    * and the last segment runs to the corpus high-watermark + 1 day
    * (exclusive), so every account bills through the same as-of month.
    *
    * Plan: one window (lead per account — hash-partitioned by account, no
    * global sort) → month explode (bounded by timeline months per segment,
    * linear in output rows) → one hash aggregation on (account, month).
    * The watermark is a broadcast 1-row aggregate (q229 idiom). At 100 TB
    * the explode is the dominant term and it is proportional to the
    * BILLED month-segments — exactly the output a biller must produce;
    * nothing is quadratic and no shuffle carries more than the billing
    * grain. */
  def prorationCharges(changes: DataFrame): DataFrame = {
    val wm = changes.agg(date_add(max(col("change_date")), 1).as("wm_end"))
    val w = Window.partitionBy(col("account_id")).orderBy(col("change_date"))
    // LOUD guard on the input contract: a duplicate (account, change_date)
    // would make the lead window's tie order nondeterministic AND produce
    // an empty segment whose month `sequence(...)` silently RUNS BACKWARD
    // (Spark's sequence auto-negates its step when start > stop) — a
    // wrong bill, not an error, so it must never get that far.
    val wDup = Window.partitionBy(col("account_id"), col("change_date"))
    changes
      .withColumn("__dup", count(lit(1)).over(wDup))
      .withColumn("change_date",
        when(col("__dup") > 1L, expr(
          "CAST(raise_error('prorationCharges: duplicate (account, change_date) — pre-collapse same-day re-changes') AS DATE)"))
          .otherwise(col("change_date")))
      .drop("__dup")
      .withColumn("seg_next", lead(col("change_date"), 1).over(w))
      .crossJoin(broadcast(wm))
      .withColumn("seg_end", coalesce(col("seg_next"), col("wm_end")))
      .withColumn("m", explode(expr(
        "sequence(trunc(change_date, 'MM'), trunc(date_sub(seg_end, 1), 'MM'), interval 1 month)")))
      .withColumn("ov", datediff(
        least(col("seg_end"), add_months(col("m"), 1)),
        greatest(col("change_date"), col("m"))))
      .withColumn("dim", datediff(add_months(col("m"), 1), col("m")))
      .withColumn("charge",
        expr("(price_centi * CAST(ov AS BIGINT)) DIV CAST(dim AS BIGINT)"))
      .groupBy(col("account_id"), col("m"))
      .agg(count(lit(1)).as("n_segments"), sum(col("charge")).as("charge_centi"))
      .select(col("account_id"), dateStr(col("m")).as("month"),
        col("n_segments"), col("charge_centi"))
  }

  /** Oracle fixture of [[prorationCharges]]: each order is a plan change at
    * its order date (same-day collisions collapse to the max order key),
    * price derived deterministically from the key. Deliberately NOT
    * globally sorted: the output is billing-grain (accounts × months — the
    * largest result any fixture dumps) and a total sort of it is pure
    * ceremony a biller would never pay (measured: the sort alone was
    * 2.7s of a 4.8s sf0.1 run); the driver's compare canon-sorts rows,
    * and the oracle keeps its ORDER BY only for readability. */
  private val q248 = GQuery(
    "q248_proration",
    (s, dir) => {
      val ch = t(s, dir, "orders")
        .select(col("o_custkey").as("account_id"),
          to_date(col("o_orderdate")).as("change_date"), col("o_orderkey"))
        .groupBy(col("account_id"), col("change_date"))
        .agg(max(col("o_orderkey")).as("k"))
        .withColumn("price_centi", lit(500L) + (col("k") % 50L) * 10L)
        .drop("k")
      prorationCharges(ch)
    },
    Some("""WITH ch AS (SELECT o_custkey AS account_id,
          CAST(o_orderdate AS DATE) AS change_date,
          500 + (MAX(o_orderkey) % 50) * 10 AS price_centi
        FROM orders GROUP BY 1, 2),
      wm AS (SELECT MAX(change_date) + 1 AS wm_end FROM ch),
      seg AS (SELECT account_id, change_date, price_centi,
          COALESCE(LEAD(change_date) OVER (PARTITION BY account_id
            ORDER BY change_date), (SELECT wm_end FROM wm)) AS seg_end
        FROM ch),
      mon AS (SELECT account_id, change_date, price_centi, seg_end,
          CAST(u.m AS DATE) AS m
        FROM seg, UNNEST(generate_series(date_trunc('month', change_date),
          date_trunc('month', seg_end - 1), INTERVAL 1 MONTH)) AS u(m)),
      pro AS (SELECT account_id, m,
          (price_centi * CAST(LEAST(seg_end, CAST(m + INTERVAL 1 MONTH AS DATE))
             - GREATEST(change_date, m) AS BIGINT))
            // CAST(CAST(m + INTERVAL 1 MONTH AS DATE) - m AS BIGINT) AS charge
        FROM mon)
      SELECT account_id, strftime(m, '%Y-%m-%d') AS month,
        COUNT(*) AS n_segments, CAST(SUM(charge) AS BIGINT) AS charge_centi
      FROM pro GROUP BY 1, 2 ORDER BY account_id, month"""))

  /** Deferred revenue recognition — finance's view of a prepaid contract:
    * the amount bills up front but RECOGNIZES ratably over the service
    * term. Each contract (amount_centi, n months, start month) emits one
    * recognition row per month: `amount DIV n`, with the integer remainder
    * recognized in the final month (the standard last-period true-up so
    * the schedule sums exactly to the contract). `backlog_centi` is the
    * still-deferred balance after each month — the liability line.
    *
    * Plan: one scan → bounded explode (≤ term months per contract) → one
    * hash aggregation by calendar month. Map-side partial aggregation
    * collapses the explode before the shuffle, so the exchange carries
    * |months| rows per task regardless of contract count — the cheapest
    * shape a recognition schedule can have at 100 TB. */
  def revenueRecognition(contracts: DataFrame): DataFrame =
    contracts
      // a non-positive term would make sequence() run backward (silent
      // negative schedule) — fail loudly instead
      .withColumn("n_months",
        when(col("n_months") < 1L, expr(
          "CAST(raise_error('revenueRecognition: n_months must be >= 1') AS BIGINT)"))
          .otherwise(col("n_months")))
      .withColumn("i", explode(expr("sequence(0L, n_months - 1L)")))
      .withColumn("m", add_months(col("start_month"), col("i").cast(IntegerType)))
      .withColumn("rec", expr("""amount_centi DIV n_months +
        CASE WHEN i = n_months - 1 THEN amount_centi % n_months ELSE 0L END"""))
      .withColumn("rem", expr("""amount_centi - ((i + 1L) * (amount_centi DIV n_months)
        + CASE WHEN i = n_months - 1 THEN amount_centi % n_months ELSE 0L END)"""))
      .groupBy(col("m"))
      .agg(count(lit(1)).as("n_active"), sum(col("rec")).as("recognized_centi"),
        sum(col("rem")).as("backlog_centi"))
      .select(dateStr(col("m")).as("month"), col("n_active"),
        col("recognized_centi"), col("backlog_centi"))

  /** Oracle fixture of [[revenueRecognition]]: each order is a contract —
    * amount from the total price, a 1–12 month term from the key, service
    * starting the order month. */
  private val q249 = GQuery(
    "q249_rev_recognition",
    (s, dir) => revenueRecognition(
      t(s, dir, "orders").select(
        expr("CAST(round(o_totalprice * 100) AS BIGINT)").as("amount_centi"),
        (col("o_orderkey") % 12L + 1L).as("n_months"),
        trunc(to_date(col("o_orderdate")), "MM").as("start_month")))
      .orderBy(col("month")),
    Some("""WITH c AS (SELECT
          CAST(round(o_totalprice * 100) AS BIGINT) AS amt,
          o_orderkey % 12 + 1 AS n,
          date_trunc('month', CAST(o_orderdate AS DATE)) AS start_m
        FROM orders),
      e AS (SELECT amt, n, u.i AS i,
          CAST(start_m + TO_MONTHS(CAST(u.i AS INTEGER)) AS DATE) AS m
        FROM c, UNNEST(generate_series(0, n - 1)) AS u(i)),
      r AS (SELECT m,
          amt // n + CASE WHEN i = n - 1 THEN amt % n ELSE 0 END AS rec,
          amt - ((i + 1) * (amt // n)
            + CASE WHEN i = n - 1 THEN amt % n ELSE 0 END) AS rem
        FROM e)
      SELECT strftime(m, '%Y-%m-%d') AS month, COUNT(*) AS n_active,
        CAST(SUM(rec) AS BIGINT) AS recognized_centi,
        CAST(SUM(rem) AS BIGINT) AS backlog_centi
      FROM r GROUP BY 1 ORDER BY month"""))

  /** Dunning card with FIFO payment application — collections' month-end
    * state: a customer's payments are a single pool applied to their
    * invoices OLDEST-FIRST (the legal default application order), without
    * ever joining payments to invoices row-by-row: per invoice,
    * `applied = clamp(total_paid − older_invoices_cum, 0, amount)`. Open
    * balance then grades into dunning levels by days past due (due =
    * invoice + 30d; >7 reminder, >30 demand, >60 suspend) against the
    * corpus high-watermark date.
    *
    * The card aggregates per level — n_invoices / n_customers / open
    * balance / worst overdue age — the collections work-queue summary.
    *
    * Plan: payments pre-aggregate per customer (map-side combine), one
    * hash join invoice⋈paid on customer, one window (cumulative older-
    * invoice sum, partitioned by customer — no global sort), then a
    * 4-row aggregation. The FIFO application is O(invoices) — the naive
    * formulation is a payments×invoices interval join that explodes at
    * scale; the clamp-of-prefix-sums identity is the MPP-standard
    * replacement. */
  def dunningCard(invoices: DataFrame, payments: DataFrame,
      asOfDay: DataFrame): DataFrame = {
    val paid = payments.groupBy(col("cust"))
      .agg(sum(col("pay_centi")).as("paid_centi"))
    val w = Window.partitionBy(col("cust")).orderBy(col("d"), col("k"))
      .rowsBetween(Window.unboundedPreceding, -1)
    invoices
      .join(paid, Seq("cust"), "left")
      .withColumn("paid_centi", coalesce(col("paid_centi"), lit(0L)))
      .withColumn("cum_prev", coalesce(sum(col("amt")).over(w), lit(0L)))
      .withColumn("bal", col("amt") -
        least(col("amt"), greatest(lit(0L), col("paid_centi") - col("cum_prev"))))
      .crossJoin(broadcast(asOfDay))
      .withColumn("days_over",
        datediff(col("asof"), date_add(col("d"), 30)).cast(LongType))
      .withColumn("level",
        when(col("bal") > 0L,
          when(col("days_over") > 60, 3).when(col("days_over") > 30, 2)
            .when(col("days_over") > 7, 1).otherwise(0))
          .otherwise(0))
      .groupBy(col("level"))
      .agg(count(lit(1)).as("n_invoices"),
        countDistinct(col("cust")).as("n_customers"),
        sum(col("bal")).as("balance_centi"),
        max(when(col("bal") > 0L, col("days_over"))).as("max_days_overdue"))
  }

  /** Oracle fixture of [[dunningCard]]: finalized orders are the invoice
    * ledger; the rest are the payment pool (no per-invoice remittance
    * advice — exactly the FIFO-application case). */
  private val q250 = GQuery(
    "q250_dunning_fifo",
    (s, dir) => {
      val o = t(s, dir, "orders")
      val inv = o.filter(col("o_orderstatus") === "F")
        .select(col("o_custkey").as("cust"), col("o_orderkey").as("k"),
          to_date(col("o_orderdate")).as("d"),
          expr("CAST(round(o_totalprice * 100) AS BIGINT)").as("amt"))
      val pay = o.filter(col("o_orderstatus") =!= "F")
        .select(col("o_custkey").as("cust"),
          expr("CAST(round(o_totalprice * 100) AS BIGINT)").as("pay_centi"))
      val asof = o.agg(max(to_date(col("o_orderdate"))).as("asof"))
      dunningCard(inv, pay, asof).orderBy(col("level"))
    },
    Some("""WITH inv AS (SELECT o_custkey AS cust, o_orderkey AS k,
          CAST(o_orderdate AS DATE) AS d,
          CAST(round(o_totalprice * 100) AS BIGINT) AS amt
        FROM orders WHERE o_orderstatus = 'F'),
      pay AS (SELECT o_custkey AS cust,
          CAST(SUM(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS paid
        FROM orders WHERE o_orderstatus <> 'F' GROUP BY 1),
      wm AS (SELECT MAX(CAST(o_orderdate AS DATE)) AS asof FROM orders),
      f AS (SELECT i.cust, i.k, i.d, i.amt,
          COALESCE(SUM(i.amt) OVER (PARTITION BY i.cust ORDER BY i.d, i.k
            ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cum_prev,
          COALESCE(p.paid, 0) AS paid
        FROM inv i LEFT JOIN pay p USING (cust)),
      g AS (SELECT cust, k, amt,
          amt - LEAST(amt, GREATEST(0, paid - cum_prev)) AS bal,
          wm.asof - (d + 30) AS days_over
        FROM f, wm),
      h AS (SELECT cust, bal, days_over,
          CASE WHEN bal > 0 THEN
            (CASE WHEN days_over > 60 THEN 3 WHEN days_over > 30 THEN 2
                  WHEN days_over > 7 THEN 1 ELSE 0 END)
          ELSE 0 END AS level
        FROM g)
      SELECT level, COUNT(*) AS n_invoices, COUNT(DISTINCT cust) AS n_customers,
        CAST(SUM(bal) AS BIGINT) AS balance_centi,
        MAX(CASE WHEN bal > 0 THEN days_over END) AS max_days_overdue
      FROM h GROUP BY 1 ORDER BY level"""))

  /** Minimum-spend true-up — the enterprise-contract month-end charge: an
    * account committed to `commit_centi` per month; months where actual
    * usage falls short bill the difference (`trueup = max(0, commit −
    * usage))`. The card aggregates per month: how many active accounts,
    * how many fell short, the usage billed and the true-up recovered —
    * the revenue-assurance view of commit contracts.
    *
    * Only months where the account shows ANY activity participate (a
    * dormant account is a contract-lifecycle question, not a usage one —
    * and at 100 TB it keeps the operator one aggregation over actuals
    * instead of an account×months densification).
    *
    * Plan: one (account, month) hash aggregation over the usage fact →
    * key join against the commit dimension (broadcast when it fits, plain
    * shuffle join otherwise — Spark decides by size) → month-grain
    * roll-up. Two shuffles total, both at billing grain. */
  def commitmentTrueup(usage: DataFrame, commits: DataFrame): DataFrame =
    usage
      // commits are MONTHLY: month-truncate the usage grain here so a
      // caller passing day-grain rows can't silently compare each DAY
      // against the monthly commit (idempotent for month-grain input)
      .withColumn("m", trunc(col("m"), "MM"))
      .groupBy(col("account_id"), col("m"))
      .agg(sum(col("amount_centi")).as("usage_centi"))
      .join(commits, Seq("account_id"))
      .withColumn("trueup_centi",
        greatest(lit(0L), col("commit_centi") - col("usage_centi")))
      .groupBy(col("m"))
      .agg(count(lit(1)).as("n_accounts"),
        sum(when(col("trueup_centi") > 0L, 1L).otherwise(0L)).as("n_short"),
        sum(col("usage_centi")).as("usage_centi"),
        sum(col("trueup_centi")).as("trueup_centi"))
      .select(dateStr(col("m")).as("month"), col("n_accounts"),
        col("n_short"), col("usage_centi"), col("trueup_centi"))

  /** Oracle fixture of [[commitmentTrueup]]: orders are the usage fact
    * (order month × customer), the customer's balance sets a nonnegative
    * monthly commit. */
  private val q254 = GQuery(
    "q254_commitment_trueup",
    (s, dir) => commitmentTrueup(
      t(s, dir, "orders").select(col("o_custkey").as("account_id"),
        trunc(to_date(col("o_orderdate")), "MM").as("m"),
        expr("CAST(round(o_totalprice * 100) AS BIGINT)").as("amount_centi")),
      t(s, dir, "customer").select(col("c_custkey").as("account_id"),
        expr("greatest(0L, CAST(round(c_acctbal * 100) AS BIGINT) * 20)")
          .as("commit_centi")))
      .orderBy(col("month")),
    Some("""WITH u AS (SELECT o_custkey AS account_id,
          date_trunc('month', CAST(o_orderdate AS DATE)) AS m,
          CAST(SUM(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
            AS usage_centi
        FROM orders GROUP BY 1, 2),
      cm AS (SELECT c_custkey AS account_id,
          GREATEST(0, CAST(round(c_acctbal * 100) AS BIGINT) * 20)
            AS commit_centi
        FROM customer),
      j AS (SELECT u.m, u.usage_centi,
          GREATEST(0, cm.commit_centi - u.usage_centi) AS trueup_centi
        FROM u JOIN cm USING (account_id))
      SELECT strftime(m, '%Y-%m-%d') AS month, COUNT(*) AS n_accounts,
        CAST(SUM(CASE WHEN trueup_centi > 0 THEN 1 ELSE 0 END) AS BIGINT)
          AS n_short,
        CAST(SUM(usage_centi) AS BIGINT) AS usage_centi,
        CAST(SUM(trueup_centi) AS BIGINT) AS trueup_centi
      FROM j GROUP BY 1 ORDER BY month"""))

  /** Closed-form cumulative-tier total T(u) as a SQL expression — the
    * q233/q239 tariff shape, shared with the reconciliation operator. */
  private[graft] def tierTotalSql(tiers: Seq[(Long, Long, Long)],
      u: String): String = {
    require(tiers.nonEmpty && tiers.head._1 == 0L &&
      tiers.last._2 == Long.MaxValue &&
      tiers.sliding(2).forall {
        case Seq((_, e1, _), (s2, _, _)) => e1 == s2
        case _ => true
      }, s"tiers must be contiguous from 0 to unbounded, got $tiers")
    tiers.map { case (f, to, r) =>
      if (to == Long.MaxValue)
        s"$r * greatest(CAST(0 AS BIGINT), ($u) - $f)"
      else
        s"$r * least(greatest(CAST(0 AS BIGINT), ($u) - $f), ${to - f})"
    }.mkString("(", " + ", ")")
  }

  /** Late-CDR correction lines — the reconciliation run that consumes
    * what the live chain deliberately leaves behind (timeout-flushed
    * incomplete calls and legs arriving after their call was flushed):
    * given the FINAL per-call usage recomputed from the complete leg set
    * and the invoice lines the stream already billed, emit one
    * correction line per CHANGED account (the q244 changed-only
    * discipline) so that Σ(original + corrections) ≡ the batch invoice
    * over the full usage — exact by tier telescoping, since the correct
    * cycle charge is T(final total) and the stream billed Σ marginal =
    * T(streamed total).
    *
    * `finalUsage`: (account_id, units) at call grain over ALL complete
    * calls; `original`: (account_id, charge_centi) — the streamed
    * invoice lines. Negative corrections (usage revoked by a re-rate)
    * emit too; zero-delta accounts are suppressed.
    *
    * Plan: two account-grain hash aggregations + one full-outer join on
    * the account key — shuffles only on account, no window, no sort. */
  def correctionLines(finalUsage: DataFrame, original: DataFrame,
      tiers: Seq[(Long, Long, Long)]): DataFrame = {
    val fin = finalUsage.groupBy(col("account_id"))
      .agg(sum(greatest(col("units"), lit(0L))).as("total_units"))
      .withColumn("corrected_centi",
        expr(tierTotalSql(tiers, "total_units")))
    val orig = original.groupBy(col("account_id"))
      .agg(sum(col("charge_centi")).as("original_centi"))
    fin.join(orig, Seq("account_id"), "full")
      .select(col("account_id"),
        coalesce(col("total_units"), lit(0L)).as("total_units"),
        coalesce(col("original_centi"), lit(0L)).as("original_centi"),
        coalesce(col("corrected_centi"), lit(0L)).as("corrected_centi"))
      .withColumn("correction_centi",
        col("corrected_centi") - col("original_centi"))
      .filter(col("correction_centi") =!= 0L)
  }

  /** Oracle fixture of [[correctionLines]]: every 7th event is a LATE
    * CDR the stream missed at cycle close (billed the on-time subset
    * only, via the q233 marginal rater whose per-account sum telescopes
    * to T(on-time total)); the reconciliation recomputes T(full total)
    * and emits the changed-only deltas. The oracle replays both sides
    * closed-form. */
  private val q265 = {
    val tiers = Seq((0L, 5000L, 5L), (5000L, 20000L, 3L),
      (20000L, Long.MaxValue, 1L))
    GQuery(
      "q265_late_corrections",
      (s, dir) => {
        val ev = t(s, dir, "events")
        val usage = expr("CAST(round(value * 100) AS BIGINT)")
        val finalUsage = ev.select(col("user_id").as("account_id"),
          usage.as("units"))
        val original = EventQ.marginalTieredCharges(
            ev.filter(col("event_id") % 7 =!= 0L), usage, tiers)
          .select(col("k").as("account_id"), col("charge_centi"))
        correctionLines(finalUsage, original, tiers)
          .orderBy(col("account_id"))
      },
      Some(s"""WITH e AS (SELECT user_id AS account_id, event_id,
            greatest(CAST(round(value * 100) AS BIGINT),
              CAST(0 AS BIGINT)) AS ue
          FROM events),
        fin AS (SELECT account_id, CAST(SUM(ue) AS BIGINT) AS total_units
          FROM e GROUP BY 1),
        -- telescoping: the stream's Σ marginal == T(on-time total)
        ontime AS (SELECT account_id, CAST(SUM(ue) AS BIGINT) AS u
          FROM e WHERE event_id % 7 <> 0 GROUP BY 1),
        j AS (SELECT f.account_id, f.total_units,
            ${tierTotalSql(Seq((0L, 5000L, 5L), (5000L, 20000L, 3L), (20000L, Long.MaxValue, 1L)), "f.total_units")} AS corrected_centi,
            COALESCE(${tierTotalSql(Seq((0L, 5000L, 5L), (5000L, 20000L, 3L), (20000L, Long.MaxValue, 1L)), "o.u")}, 0) AS original_centi
          FROM fin f LEFT JOIN ontime o ON o.account_id = f.account_id)
        SELECT account_id, total_units, original_centi, corrected_centi,
          corrected_centi - original_centi AS correction_centi
        FROM j WHERE corrected_centi - original_centi <> 0
        ORDER BY account_id"""))
  }

  /** Data-usage block rating — the packet-switched sibling of the
    * voice raters (q226/q233): every data session bills in WHOLE
    * blocks (the industry round-up rule — a partially used block bills
    * entirely), at a per-APN block rate. charged_blocks =
    * ceil(bytes / blockBytes) as exact integer arithmetic
    * `(bytes + block − 1) DIV block`; zero/negative byte counts bill 0
    * blocks but stay counted (never-drop). Roll-up per (account, apn):
    * sessions, bytes, blocks, exact centi charge, and the overage ppm —
    * billed-but-unused capacity `(blocks·block − bytes) / bytes` — the
    * number a customer-facing fairness review asks for.
    *
    * Plan: broadcast rate lookup + map-side block math + ONE hash
    * aggregation at (account, apn) grain. */
  def volumeRating(sessions: DataFrame, rates: DataFrame,
      blockBytes: Long = 102400L): DataFrame = {
    require(blockBytes >= 1L, s"blockBytes must be >= 1, got $blockBytes")
    sessions
      .join(broadcast(rates), Seq("apn"), "left")
      .withColumn("__blocks",
        when(col("bytes") > 0L,
          expr(s"(bytes + ${blockBytes}L - 1) DIV ${blockBytes}L"))
          .otherwise(lit(0L)))
      .groupBy(col("account_id"), col("apn"))
      .agg(count(lit(1)).as("n_sessions"),
        sum(greatest(col("bytes"), lit(0L))).as("bytes"),
        sum(col("__blocks")).as("blocks"),
        sum(col("__blocks") * coalesce(col("rate_centi"), lit(0L)))
          .as("charge_centi"))
      .withColumn("overage_ppm",
        when(col("bytes") > 0L,
          expr(s"(1000000 * (blocks * ${blockBytes}L - bytes)) DIV bytes")))
  }

  /** Oracle fixture of [[volumeRating]]: events as data sessions —
    * bytes from the value column (negatives = failed sessions, billed
    * 0), APN from the event type, per-APN block rates. */
  private val q269 = GQuery(
    "q269_volume_rating",
    (s, dir) => {
      val sessions = t(s, dir, "events").select(
        col("user_id").as("account_id"),
        col("event_type").as("apn"),
        expr("CAST(round(value * 10000) AS BIGINT)").as("bytes"))
      val rates = t(s, dir, "events").select(col("event_type").as("apn"))
        .distinct()
        .withColumn("rate_centi", (length(col("apn")) % 5L) + 2L)
      volumeRating(sessions, rates)
        .orderBy(col("account_id"), col("apn"))
    },
    Some("""WITH sess AS (SELECT user_id AS account_id,
          event_type AS apn,
          CAST(round(value * 10000) AS BIGINT) AS bytes
        FROM events),
      rates AS (SELECT DISTINCT event_type AS apn,
          (length(event_type) % 5) + 2 AS rate_centi
        FROM events),
      b AS (SELECT s.account_id, s.apn, s.bytes, r.rate_centi,
          CASE WHEN s.bytes > 0
            THEN (s.bytes + 102400 - 1) // 102400 ELSE 0 END AS blocks
        FROM sess s LEFT JOIN rates r ON r.apn = s.apn),
      g AS (SELECT account_id, apn, COUNT(*) AS n_sessions,
          CAST(SUM(GREATEST(bytes, 0)) AS BIGINT) AS bytes,
          CAST(SUM(blocks) AS BIGINT) AS blocks,
          CAST(SUM(blocks * COALESCE(rate_centi, 0)) AS BIGINT)
            AS charge_centi
        FROM b GROUP BY 1, 2)
      SELECT account_id, apn, n_sessions, bytes, blocks, charge_centi,
        CAST(CASE WHEN bytes > 0
          THEN (1000000 * (blocks * 102400 - bytes)) // bytes END
          AS BIGINT) AS overage_ppm
      FROM g ORDER BY account_id, apn"""))

  /** Billing-increment rating — the interconnect rounding rule that
    * moves real money: a carrier bills a call's duration as a FIRST
    * PERIOD of `first_sec` seconds minimum, then whole increments of
    * `inc_sec` (the "60/6", "30/6", "1/1" notation on every rate
    * sheet). billed_sec = first + ceil((d − first)/inc)·inc for
    * d > first, = first for 0 < d ≤ first, = 0 for non-positive d
    * (failed call — counted, never billed, never dropped). Charge is
    * exact: billed_sec · rate_centi_per_min DIV 60 — the truncating
    * per-CDR division every switch applies. The roll-up carries
    * `padding_ppm` = billed-but-unspoken seconds / spoken seconds, the
    * number a rate-sheet negotiation is actually about (a cheap 60/60
    * rate can cost more than an expensive 1/1).
    *
    * Plan: broadcast increment-rule lookup + map-side integer math +
    * ONE hash aggregation at carrier grain. */
  def incrementRating(calls: DataFrame, rules: DataFrame): DataFrame =
    calls
      .join(broadcast(rules), Seq("carrier"), "left")
      .withColumn("__billed",
        when(col("dur_sec") <= 0L, lit(0L))
          .when(col("dur_sec") <= col("first_sec"), col("first_sec"))
          .otherwise(col("first_sec") +
            expr("((dur_sec - first_sec + inc_sec - 1) DIV inc_sec)") *
              col("inc_sec")))
      .withColumn("__charge",
        expr("(__billed * rate_centi_per_min) DIV 60"))
      .groupBy(col("carrier"))
      .agg(count(lit(1)).as("n_calls"),
        sum(greatest(col("dur_sec"), lit(0L))).as("spoken_sec"),
        sum(col("__billed")).as("billed_sec"),
        sum(coalesce(col("__charge"), lit(0L))).as("charge_centi"))
      .withColumn("padding_ppm",
        when(col("spoken_sec") > 0L, expr(
          "(1000000 * (billed_sec - spoken_sec)) DIV spoken_sec")))

  /** Oracle fixture of [[incrementRating]]: events as calls (carrier =
    * event type, durations 1–600 s with negatives as failed attempts),
    * per-carrier 60/6-style rules derived from the carrier name. */
  private val q274 = GQuery(
    "q274_increment_rating",
    (s, dir) => {
      val calls = t(s, dir, "events").select(
        col("event_type").as("carrier"),
        expr("CAST(round(value) AS BIGINT)").as("dur_sec"))
      val rules = t(s, dir, "events").select(col("event_type").as("carrier"))
        .distinct()
        .select(col("carrier"),
          (lit(1L) + (length(col("carrier")) % 3L) * 29L).as("first_sec"),
          (lit(1L) + (length(col("carrier")) % 4L) * 5L).as("inc_sec"),
          (lit(80L) + length(col("carrier")) * 7L)
            .as("rate_centi_per_min"))
      incrementRating(calls, rules).orderBy(col("carrier"))
    },
    Some("""WITH calls AS (SELECT event_type AS carrier,
          CAST(round(value) AS BIGINT) AS dur_sec
        FROM events),
      rules AS (SELECT DISTINCT event_type AS carrier,
          1 + (length(event_type) % 3) * 29 AS first_sec,
          1 + (length(event_type) % 4) * 5 AS inc_sec,
          80 + length(event_type) * 7 AS rate_centi_per_min
        FROM events),
      b AS (SELECT c.carrier, c.dur_sec, r.rate_centi_per_min,
          CASE WHEN c.dur_sec <= 0 THEN 0
            WHEN c.dur_sec <= r.first_sec THEN r.first_sec
            ELSE r.first_sec
              + ((c.dur_sec - r.first_sec + r.inc_sec - 1) // r.inc_sec)
                * r.inc_sec END AS billed
        FROM calls c LEFT JOIN rules r ON r.carrier = c.carrier),
      g AS (SELECT carrier, COUNT(*) AS n_calls,
          CAST(SUM(GREATEST(dur_sec, 0)) AS BIGINT) AS spoken_sec,
          CAST(SUM(billed) AS BIGINT) AS billed_sec,
          CAST(SUM(COALESCE((billed * rate_centi_per_min) // 60, 0))
            AS BIGINT) AS charge_centi
        FROM b GROUP BY 1)
      SELECT carrier, n_calls, spoken_sec, billed_sec, charge_centi,
        CAST(CASE WHEN spoken_sec > 0
          THEN (1000000 * (billed_sec - spoken_sec)) // spoken_sec END
          AS BIGINT) AS padding_ppm
      FROM g ORDER BY carrier"""))

  /** Tariff-change simulation (re-rating delta) — the run every pricing
    * decision requires before it ships: rate the SAME cycle usage under
    * the current and the proposed tier plans and report the per-account
    * delta. DISTINCT from q244's re-rating diff, which re-rates each
    * CALL under a corrected flat tariff TABLE (as-of lookups, call
    * grain, changed-only adjustments): a cumulative-TIER structure
    * change is nonlinear in the cycle total — it cannot be computed per
    * call at all, only from the account's aggregate usage, which is why
    * this simulation exists as its own operator. Both charges are the
    * closed-form cumulative-tier total
    * T(u) ([[tierTotalSql]] — exact integer arithmetic, the telescoping
    * contract), so the simulation is two expressions over ONE
    * account-grain aggregate: no second pass over the facts, no join.
    * Every account reports (a pricing review wants the full
    * distribution, not just movers); `delta_centi` signs the winner.
    *
    * Plan: one fact scan → one hash agg at account grain (two-phase) →
    * map-side tier math. One shuffle, on the blocking key. */
  def rerateDelta(events: DataFrame, current: Seq[(Long, Long, Long)],
      proposed: Seq[(Long, Long, Long)]): DataFrame =
    events
      .select(col("user_id").as("account_id"),
        greatest(expr("CAST(round(value * 100) AS BIGINT)"), lit(0L))
          .as("__u"))
      .groupBy(col("account_id"))
      .agg(sum(col("__u")).as("total_units"))
      .withColumn("current_centi",
        expr(tierTotalSql(current, "total_units")))
      .withColumn("proposed_centi",
        expr(tierTotalSql(proposed, "total_units")))
      .withColumn("delta_centi",
        col("proposed_centi") - col("current_centi"))

  /** Oracle fixture of [[rerateDelta]]: the q265 tariff as current, a
    * flatter proposal (cheaper first tier, pricier tail) as proposed —
    * so deltas genuinely change sign across the account distribution. */
  private val q281 = {
    val cur = Seq((0L, 5000L, 5L), (5000L, 20000L, 3L),
      (20000L, Long.MaxValue, 1L))
    val prop = Seq((0L, 5000L, 4L), (5000L, 20000L, 3L),
      (20000L, Long.MaxValue, 2L))
    GQuery(
      "q281_rerate_delta",
      (s, dir) => rerateDelta(t(s, dir, "events"), cur, prop)
        .orderBy(col("account_id")),
      Some(s"""WITH u AS (SELECT user_id AS account_id,
            CAST(SUM(greatest(CAST(round(value * 100) AS BIGINT),
              CAST(0 AS BIGINT))) AS BIGINT) AS total_units
          FROM events GROUP BY 1)
        SELECT account_id, total_units,
          ${tierTotalSql(cur, "total_units")} AS current_centi,
          ${tierTotalSql(prop, "total_units")} AS proposed_centi,
          ${tierTotalSql(prop, "total_units")} -
            ${tierTotalSql(cur, "total_units")} AS delta_centi
        FROM u ORDER BY account_id"""))
  }

  /** SLA downtime credits — the availability side of the billing close:
    * outage reports arrive as (account, start_sec, end_sec) intervals
    * that OVERLAP (monitors double-report, flaps re-open), so the
    * credit basis is the measured downtime of their UNION per account
    * per month, run through a credit tier table (ppm of the monthly fee
    * per downtime band — every real SLA reads this way). An outage
    * bills WHOLLY to the month it started in (the industry attribution
    * rule — no mid-incident proration), so the month key is taken from
    * the interval start. Emits one
    * credit line per (account, month): incidents (union islands),
    * downtime seconds, the tier's credit ppm, and the credit amount in
    * centi-money (`fee · ppm DIV 10⁶`, exact integer).
    *
    * Plan: the interval-union sweep is ONE window per (account, month)
    * (running max of interval end; an interval starting past it opens a
    * new island — the q257/trunk-sweep discipline, union length =
    * island max(end) − min(start) because islands are overlap-chained),
    * then one hash aggregation; the tier lookup is a ≤ |tiers| CASE,
    * map-side. Shuffles only on (account, month).
    */
  def slaCredits(outages: DataFrame, tiers: Seq[(Long, Long)],
      monthlyFeeCenti: Long): DataFrame = {
    require(tiers.nonEmpty && tiers.head._1 == 0L &&
      tiers.sliding(2).forall {
        case Seq((f1, _), (f2, _)) => f2 > f1
        case _ => true
      }, s"tiers must start at 0 with increasing thresholds, got $tiers")
    // tier = the LAST band whose threshold the downtime reaches
    // ascending fold leaves the HIGHEST reached threshold outermost
    val tierCase = tiers.foldLeft(lit(null).cast(LongType)) {
      case (acc, (fromSec, ppm)) =>
        when(col("downtime_sec") >= fromSec, lit(ppm)).otherwise(acc)
    }
    val w = Window.partitionBy(col("account_id"), col("month"))
      .orderBy(col("s"), col("e"))
    val iv = outages
      .filter(col("e") > col("s"))
      .withColumn("month", expr("CAST(s DIV 2592000L AS BIGINT)"))
      .withColumn("__pmax",
        max(col("e")).over(w.rowsBetween(Window.unboundedPreceding, -1)))
      .withColumn("__new",
        when(col("__pmax").isNull || col("s") > col("__pmax"), 1L)
          .otherwise(0L))
      .withColumn("__isl", sum(col("__new")).over(w))
    iv.groupBy(col("account_id"), col("month"), col("__isl"))
      .agg((max(col("e")) - min(col("s"))).as("island_sec"))
      .groupBy(col("account_id"), col("month"))
      .agg(count(lit(1)).as("n_incidents"),
        sum(col("island_sec")).as("downtime_sec"))
      .withColumn("credit_ppm", tierCase)
      .withColumn("credit_centi",
        expr(s"($monthlyFeeCenti * credit_ppm) DIV 1000000L"))
  }

  /** Oracle fixture of [[slaCredits]]: outage intervals derived from
    * every 7th event (start = the event's epoch second, length =
    * |centi-value| seconds — long enough that some overlap and chain),
    * a three-band SLA (≥ 30 min: 5%, ≥ 4 h: 15%, else 0) on a 29.99
    * monthly fee. The 30-day window spans a month boundary in the
    * 30-day-epoch month key, so per-month splitting is load-bearing. */
  private val q293 = {
    val tiers = Seq((0L, 0L), (1800L, 50000L), (14400L, 150000L))
    GQuery(
      "q293_sla_credits",
      (s, dir) => slaCredits(
        t(s, dir, "events").filter(col("event_id") % 7L === 0L)
          .select(col("user_id").as("account_id"),
            col("ts").cast(LongType).as("s"),
            (col("ts").cast(LongType) +
              expr("abs(CAST(round(value * 100) AS BIGINT))")).as("e")),
        tiers, monthlyFeeCenti = 2999L)
        .orderBy(col("account_id"), col("month")),
      Some(s"""WITH o AS (SELECT user_id AS account_id,
            ${epochSecSql("ts")} AS s,
            ${epochSecSql("ts")} + abs(CAST(round(value * 100) AS BIGINT))
              AS e
          FROM events WHERE event_id % 7 = 0),
        iv AS (SELECT *, s // 2592000 AS month FROM o WHERE e > s),
        m AS (SELECT *, MAX(e) OVER (PARTITION BY account_id, month
            ORDER BY s, e ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
            AS pmax
          FROM iv),
        isl AS (SELECT *, CAST(SUM(CASE WHEN pmax IS NULL OR s > pmax
            THEN 1 ELSE 0 END) OVER (PARTITION BY account_id, month
            ORDER BY s, e ROWS UNBOUNDED PRECEDING) AS BIGINT) AS isl
          FROM m),
        runs AS (SELECT account_id, month, isl,
            MAX(e) - MIN(s) AS island_sec
          FROM isl GROUP BY 1, 2, 3),
        card AS (SELECT account_id, month,
            COUNT(*) AS n_incidents,
            CAST(SUM(island_sec) AS BIGINT) AS downtime_sec
          FROM runs GROUP BY 1, 2)
        SELECT account_id, month, n_incidents, downtime_sec,
          CAST(CASE WHEN downtime_sec >= 14400 THEN 150000
            WHEN downtime_sec >= 1800 THEN 50000
            ELSE 0 END AS BIGINT) AS credit_ppm,
          CAST((2999 * CASE WHEN downtime_sec >= 14400 THEN 150000
            WHEN downtime_sec >= 1800 THEN 50000
            ELSE 0 END) // 1000000 AS BIGINT) AS credit_centi
        FROM card
        ORDER BY account_id, month"""))
  }

  val queries: Seq[GQuery] = Seq(q248, q249, q250, q254, q265, q269, q274,
    q281, q293)
}
