package graft

import java.sql.Date

import org.apache.spark.sql.functions._

import graft.queries.BillingQ

/** Hand-computed pins for the subscription-billing operators (the oracle
  * proves engine parity; these prove the MATH on cases small enough to
  * bill by hand — including a leap February and the FIFO clamp edges). */
class BillingSpec extends SparkSpec {

  import spark.implicits._

  test("prorationCharges: mid-month change across a leap February") {
    // One account: plan 3100c from Jan 15, plan 2900c from Feb 10;
    // watermark end = Feb 11 (max change + 1).
    //   Jan (31d): seg1 overlaps 17d -> 3100*17 DIV 31 = 1700
    //   Feb (29d, 2024 is leap): seg1 9d -> 3100*9 DIV 29 = 962;
    //                            seg2 1d -> 2900*1 DIV 29 = 100
    val ch = Seq(
      (1L, Date.valueOf("2024-01-15"), 3100L),
      (1L, Date.valueOf("2024-02-10"), 2900L))
      .toDF("account_id", "change_date", "price_centi")
    val got = BillingQ.prorationCharges(ch)
      .orderBy("month").as[(Long, String, Long, Long)].collect().toSeq
    assert(got == Seq(
      (1L, "2024-01-01", 1L, 1700L),
      (1L, "2024-02-01", 2L, 1062L)), got.toString)
  }

  test("prorationCharges: full months bill the full price exactly") {
    // Change on the 1st, next change exactly 2 months later: each full
    // month bills price * dim DIV dim = price, no rounding loss.
    val ch = Seq(
      (7L, Date.valueOf("2024-03-01"), 999L),
      (7L, Date.valueOf("2024-05-01"), 1L))
      .toDF("account_id", "change_date", "price_centi")
    val got = BillingQ.prorationCharges(ch)
      .orderBy("month").as[(Long, String, Long, Long)].collect().toSeq
    assert(got == Seq(
      (7L, "2024-03-01", 1L, 999L),
      (7L, "2024-04-01", 1L, 999L),
      // wm end = May 2: 1c for 1 of 31 days floors to 0 (sub-centi drop)
      (7L, "2024-05-01", 1L, 0L)), got.toString)
  }

  test("revenueRecognition: remainder lands in the final month only") {
    // 1000c over 3 months: 333 + 333 + 334; backlog 667 / 334 / 0.
    // A second 1-month 500c contract starts in Feb.
    val c = Seq(
      (1000L, 3L, Date.valueOf("2024-01-01")),
      (500L, 1L, Date.valueOf("2024-02-01")))
      .toDF("amount_centi", "n_months", "start_month")
    val got = BillingQ.revenueRecognition(c)
      .orderBy("month").as[(String, Long, Long, Long)].collect().toSeq
    assert(got == Seq(
      ("2024-01-01", 1L, 333L, 667L),
      ("2024-02-01", 2L, 833L, 334L),
      ("2024-03-01", 1L, 334L, 0L)), got.toString)
  }

  test("dunningCard: FIFO clamp, level grading, paid invoices age as 0") {
    // Cust 1 paid 120 against invoices of 100 (old) and 50 (recent):
    // oldest-first application settles the 100 fully (level 0, closed),
    // leaves 30 open on the recent one (11 days past due -> level 1).
    // Cust 2 never paid: 200 open, 91 days past due -> level 3.
    val inv = Seq(
      (1L, 1L, Date.valueOf("2023-12-01"), 100L),
      (1L, 2L, Date.valueOf("2024-01-20"), 50L),
      (2L, 3L, Date.valueOf("2023-11-01"), 200L))
      .toDF("cust", "k", "d", "amt")
    val pay = Seq((1L, 120L)).toDF("cust", "pay_centi")
    val asof = Seq(Date.valueOf("2024-03-01")).toDF("asof")
    val got = BillingQ.dunningCard(inv, pay, asof)
      .orderBy("level")
      .as[(Int, Long, Long, Long, Option[Long])].collect().toSeq
    assert(got == Seq(
      (0, 1L, 1L, 0L, None), // settled invoice: no open age to report
      (1, 1L, 1L, 30L, Some(11L)),
      (3, 1L, 1L, 200L, Some(91L))), got.toString)
  }

  test("prorationCharges: a duplicate (account, change_date) fails loudly") {
    import java.sql.Date
    val ch = Seq(
      (1L, Date.valueOf("2026-01-01"), 100L),
      (1L, Date.valueOf("2026-01-01"), 200L))
      .toDF("account_id", "change_date", "price_centi")
    val e = intercept[Exception] {
      BillingQ.prorationCharges(ch).collect()
    }
    assert(e.getMessage.contains("duplicate (account, change_date)"),
      e.getMessage)
  }

  test("revenueRecognition: a non-positive term fails loudly") {
    import java.sql.Date
    val c = Seq((1200L, 0L, Date.valueOf("2026-01-01")))
      .toDF("amount_centi", "n_months", "start_month")
    val e = intercept[Exception] {
      BillingQ.revenueRecognition(c).collect()
    }
    assert(e.getMessage.contains("n_months must be >= 1"), e.getMessage)
  }

  test("commitmentTrueup: day-grain usage aggregates to the month") {
    import java.sql.Date
    // two days of the same month must compare ONCE against the monthly
    // commit, not once per day
    val usage = Seq(
      (1L, Date.valueOf("2026-03-05"), 600L),
      (1L, Date.valueOf("2026-03-20"), 500L))
      .toDF("account_id", "m", "amount_centi")
    val commits = Seq((1L, 1000L)).toDF("account_id", "commit_centi")
    val got = BillingQ.commitmentTrueup(usage, commits)
      .as[(String, Long, Long, Long, Long)].head()
    // usage 1100 >= commit 1000 -> no shortfall; day-grain comparison
    // would have billed 400 + 500 of bogus true-up
    assert(got == (("2026-03-01", 1L, 0L, 1100L, 0L)), got.toString)
  }

  test("dunningCard: same-day invoices apply in key order") {
    // Two same-day invoices: the key breaks the FIFO tie deterministically
    // (k=1 first). 60 of payment covers k=1 (50) then 10 of k=2.
    val inv = Seq(
      (9L, 1L, Date.valueOf("2024-01-01"), 50L),
      (9L, 2L, Date.valueOf("2024-01-01"), 40L))
      .toDF("cust", "k", "d", "amt")
    val pay = Seq((9L, 60L)).toDF("cust", "pay_centi")
    val asof = Seq(Date.valueOf("2024-01-10")).toDF("asof")
    val got = BillingQ.dunningCard(inv, pay, asof)
      .agg(sum($"balance_centi")).as[Long].head()
    assert(got == 30L, s"open balance $got") // 90 invoiced - 60 paid
  }
}
