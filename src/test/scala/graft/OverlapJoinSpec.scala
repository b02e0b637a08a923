package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.queries.EventQ

/** Semantics of the bucketized interval-overlap join: the q175 oracle
  * proves the plan hash-matches the naive theta join at sf0.01; this pins
  * the edge rules (touching endpoints, cell-straddling, negative
  * coordinates, the de-dup anchor) on frames small enough to verify by
  * eye, plus a seeded randomized equivalence sweep against the naive
  * crossJoin + filter reference.
  */
class OverlapJoinSpec extends SparkSpec {

  private def ivals(prefix: String, rows: (Long, Long, Long)*): DataFrame = {
    import spark.implicits._
    rows.toSeq.toDF(s"${prefix}_id", s"${prefix}_start", s"${prefix}_end")
  }

  private def pairs(df: DataFrame): Set[(Long, Long)] =
    df.select(col("l_id"), col("r_id")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet

  test("overlapJoin matches closed-interval semantics incl. touching endpoints") {
    val l = ivals("l", (1L, 0L, 10L), (2L, 20L, 30L), (3L, 100L, 100L))
    val r = ivals("r",
      (10L, 10L, 15L),  // touches l1's right edge -> overlap
      (11L, 31L, 40L),  // disjoint from everything
      (12L, 5L, 25L),   // spans l1 and l2
      (13L, 100L, 100L)) // point-point coincidence with l3
    val got = pairs(EventQ.overlapJoin(l, r,
      "l_start", "l_end", "r_start", "r_end", cellWidth = 7L))
    assert(got == Set((1L, 10L), (1L, 12L), (2L, 12L), (3L, 13L)))
  }

  test("overlapJoin emits each qualifying pair exactly once across cells") {
    // both intervals span many 5-wide cells and share many of them: the
    // anchor-cell residual must still emit one row, not one per shared cell
    val l = ivals("l", (1L, 0L, 100L))
    val r = ivals("r", (10L, 50L, 160L))
    val got = EventQ.overlapJoin(l, r,
      "l_start", "l_end", "r_start", "r_end", cellWidth = 5L)
    assert(got.count() == 1L)
  }

  test("overlapJoin handles negative coordinates with exact floor cells") {
    // pre-1970-style negatives: truncating division would misplace the
    // cell of -3 at width 10 (0 instead of -1) and lose the match
    val l = ivals("l", (1L, -13L, -3L))
    val r = ivals("r", (10L, -4L, 2L), (11L, -30L, -14L))
    val got = pairs(EventQ.overlapJoin(l, r,
      "l_start", "l_end", "r_start", "r_end", cellWidth = 10L))
    assert(got == Set((1L, 10L)))
  }

  test("overlapJoin equals the naive crossJoin reference on a seeded sweep") {
    import spark.implicits._
    val rnd = new scala.util.Random(42)
    val ls = (1 to 120).map { i =>
      val s = rnd.nextInt(500).toLong - 250; (i.toLong, s, s + rnd.nextInt(60))
    }
    val rs = (1 to 120).map { i =>
      val s = rnd.nextInt(500).toLong - 250; (i.toLong, s, s + rnd.nextInt(60))
    }
    val l = ls.toDF("l_id", "l_start", "l_end")
    val r = rs.toDF("r_id", "r_start", "r_end")
    val naive = l.crossJoin(r)
      .filter(col("l_start") <= col("r_end") && col("r_start") <= col("l_end"))
    for (w <- Seq(1L, 7L, 64L, 1000L)) {
      val got = EventQ.overlapJoin(l, r,
        "l_start", "l_end", "r_start", "r_end", cellWidth = w)
      assert(pairs(got) == pairs(naive), s"cellWidth=$w diverged")
      assert(got.count() == naive.count(), s"cellWidth=$w multiplicity")
    }
  }

  test("overlapJoin rejects inverted intervals and runaway spans loudly") {
    val l = ivals("l", (1L, 10L, 0L))
    val r = ivals("r", (10L, 0L, 5L))
    val e = intercept[Exception] {
      EventQ.overlapJoin(l, r, "l_start", "l_end", "r_start", "r_end",
        cellWidth = 5L).collect()
    }
    assert(e.getMessage.contains("graft.overlapJoin"))
    val l2 = ivals("l", (1L, 0L, 1000000L))
    val r2 = ivals("r", (10L, 0L, 5L))
    val e2 = intercept[Exception] {
      EventQ.overlapJoin(l2, r2, "l_start", "l_end", "r_start", "r_end",
        cellWidth = 5L, maxCellsPerRow = 100).collect()
    }
    assert(e2.getMessage.contains("spans >= 100 cells"))
  }

  test("overlapJoin rejects shared column names up front") {
    val l = ivals("x", (1L, 0L, 1L))
    intercept[IllegalArgumentException] {
      EventQ.overlapJoin(l, l, "x_start", "x_end", "x_start", "x_end", 5L)
    }
  }

  test("overlapJoin plans a hash/merge equi join on the cell, not a nested loop") {
    val l = ivals("l", (1L, 0L, 10L))
    val r = ivals("r", (10L, 5L, 15L))
    val plan = EventQ.overlapJoin(l, r,
      "l_start", "l_end", "r_start", "r_end", cellWidth = 10L)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin") &&
      !plan.contains("CartesianProduct"), plan)
  }
}
