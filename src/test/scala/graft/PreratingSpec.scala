package graft

import org.apache.spark.sql.functions._

import graft.queries.PreratingQ

/** The prerating stage's core semantics (q263/q264): MSISDN
  * canonicalization collapses every wire form to one number, guiding
  * resolves it through the number-range dim with a bucketed broadcast
  * hash join that matches the naive BETWEEN join exactly, and a broken
  * dimension fails loudly before it can double-bill.
  */
class PreratingSpec extends SparkSpec {

  import spark.implicits._

  test("the four wire forms of one number collapse to a single canonical") {
    val raws = Seq("+4915550001", "00 4915550001", "0-1555.0001",
      "(1555)/0001").toDF("raw_number")
    val out = PreratingQ.normalizeMsisdn(raws)
      .select(col("canonical"), col("reason")).as[(String, String)].collect()
    assert(out.forall(_ == (("4915550001", null))), out.mkString(";"))
  }

  test("non-normalizable numbers keep their rows with reason codes") {
    val raws = Seq(
      ("a", "+49155X0001"), // non-digit
      ("b", "+4912"),       // canonical < 8 digits
      ("c", "+49" + "9" * 16), // > 15 digits
      ("d", ""),            // empty
      ("e", " -() "),       // separators only -> empty after cleaning
      ("f", null)           // null -> empty
    ).toDF("id", "raw_number")
    val out = PreratingQ.normalizeMsisdn(raws)
      .select(col("id"), col("canonical"), col("reason"))
      .as[(String, String, String)].collect().map(r => r._1 -> r).toMap
    assert(out.size == 6, "never-drop: every row survives")
    assert(out.values.forall(_._2 == null))
    assert(out("a")._3 == "bad_chars")
    assert(out("b")._3 == "too_short")
    assert(out("c")._3 == "too_long")
    assert(out("d")._3 == "empty")
    assert(out("e")._3 == "empty")
    assert(out("f")._3 == "empty")
  }

  test("a feed whose bare numbers are international can say so") {
    val raws = Seq("4915550001").toDF("raw_number")
    val nat = PreratingQ.normalizeMsisdn(raws)
      .select(col("canonical")).as[String].head()
    val intl = PreratingQ.normalizeMsisdn(raws, bareIsNational = false)
      .select(col("canonical")).as[String].head()
    assert(nat == "494915550001" && intl == "4915550001")
  }

  test("guiding matches the naive BETWEEN join on a randomized number plan") {
    // non-overlapping random-width allocations with gaps, numbers spread
    // across covered and uncovered space — the bucketed broadcast join
    // must agree with textbook interval semantics row for row
    val rnd = new scala.util.Random(20260815L)
    var cursor = 4910000000L
    val ranges = (0 until 300).map { i =>
      val start = cursor + 1 + rnd.nextInt(50000)
      val width = 1L + rnd.nextInt(200000)
      cursor = start + width - 1
      (start, cursor, 1000L + i)
    }.toDF("range_start", "range_end", "account_id")
    val nums = (0 until 5000).map { i =>
      (i.toLong, (4910000000L + math.abs(rnd.nextLong()) %
        (cursor - 4910000000L + 2000000L)).toString)
    }.toDF("id", "canonical")
    val got = PreratingQ.guideRanges(nums, ranges)
      .select(col("id"), col("account_id")).as[(Long, Option[Long])]
      .collect().toMap
    val want = nums.join(ranges,
        nums("canonical").cast("long").between(col("range_start"),
          col("range_end")), "left")
      .select(col("id"), col("account_id")).as[(Long, Option[Long])]
      .collect().toMap
    assert(got.size == 5000, "never-drop: one output row per input row")
    assert(got == want)
  }

  test("an overlapping number plan fails loudly before it can double-bill") {
    val ranges = Seq((100L, 200L, 1L), (150L, 300L, 2L))
      .toDF("range_start", "range_end", "account_id")
    val nums = Seq("170").toDF("canonical")
    val e = intercept[Exception] {
      PreratingQ.guideRanges(nums, ranges).collect()
    }
    assert(e.getMessage != null &&
      (e.getMessage.contains("overlapping") ||
        String.valueOf(e.getCause).contains("overlapping")), e.toString)
  }

  test("an inverted range fails loudly too") {
    val ranges = Seq((200L, 100L, 1L)).toDF("range_start", "range_end",
      "account_id")
    val nums = Seq("170").toDF("canonical")
    val e = intercept[Exception] {
      PreratingQ.guideRanges(nums, ranges).collect()
    }
    assert(e.getMessage != null &&
      (e.getMessage.contains("overlapping") ||
        String.valueOf(e.getCause).contains("overlapping")), e.toString)
  }

  test("guiding plans a broadcast hash join, never a nested loop") {
    val ranges = Seq((4915550000L, 4915559999L, 7L))
      .toDF("range_start", "range_end", "account_id")
    val nums = Seq("4915550001").toDF("canonical")
    val plan = PreratingQ.guideRanges(nums, ranges)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), plan)
    assert(!plan.contains("BroadcastNestedLoopJoin") &&
      !plan.contains("CartesianProduct"), plan)
  }
}
