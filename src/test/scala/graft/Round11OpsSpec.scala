package graft

import org.apache.spark.sql.functions._

import graft.queries.PreratingQ

/** Round-11 operator specs: per-width-class guiding cascade (the
  * mixed-width number-plan shape), versioned-dim validation seam. */
class Round11OpsSpec extends SparkSpec {

  import spark.implicits._

  test("guideRanges resolves across width classes (nationwide + small)") {
    val ranges = Seq(
      (100L, 199L, 7L),            // small allocation (class ~7)
      (1000000L, 99999999L, 1L))   // "nationwide" (class ~27)
      .toDF("range_start", "range_end", "account_id")
    val cdrs = Seq("150", "5000000", "500", "199", "1000000", "99999999")
      .toDF("canonical")
    val out = PreratingQ.guideRanges(cdrs, ranges)
      .select(col("canonical"), col("account_id"), col("reason"))
      .as[(String, Option[Long], Option[String])].collect().toSet
    assert(out == Set(
      ("150", Some(7L), None), ("5000000", Some(1L), None),
      ("500", None, Some("unguided")), ("199", Some(7L), None),
      ("1000000", Some(1L), None), ("99999999", Some(1L), None)),
      out.toString)
  }

  test("guideRanges on an empty plan leaves everything unguided, typed") {
    val ranges = Seq.empty[(Long, Long, Long)]
      .toDF("range_start", "range_end", "account_id")
    val out = PreratingQ.guideRanges(Seq("49123456789").toDF("canonical"),
      ranges)
    assert(out.schema("account_id").dataType ==
      org.apache.spark.sql.types.LongType)
    val rows = out.select(col("account_id"), col("reason"))
      .as[(Option[Long], Option[String])].collect().toSeq
    assert(rows == Seq((None, Some("unguided"))))
  }

  test("versioned-dim conflict check catches a cross-class overlap") {
    // a nationwide range and a small range overlapping in BOTH number
    // and time: under a single global bucket width this pair is cheap
    // to find; the per-class check must ALSO find it (the small member
    // shares a coarse bucket with the wide one at the wide class)
    val bad = Seq(
      (0L, 99999999L, 0L, 1000L, 1L),    // wide, era [0, 1000)
      (5000L, 5999L, 500L, 600L, 2L))    // small, inside both intervals
      .toDF("range_start", "range_end", "valid_from_sec", "valid_to_sec",
        "account_id")
    val e = intercept[IllegalArgumentException] {
      PreratingQ.validateVersionedDim(bad)
    }
    assert(e.getMessage.contains("double coverage"), e.getMessage)
    // the same pair DISJOINT in time is a legal SCD2 dim
    val good = Seq(
      (0L, 99999999L, 0L, 500L, 1L),
      (5000L, 5999L, 500L, 600L, 2L))
      .toDF("range_start", "range_end", "valid_from_sec", "valid_to_sec",
        "account_id")
    PreratingQ.validateVersionedDim(good) // must not throw
  }

  test("guideRangesVersioned honors preValidated (no re-validation jobs)") {
    // an INVALID dim passed with preValidated=true must still guide
    // mechanically (garbage in, garbage out — the caller owns the
    // validation cadence); the point is that no eager guard job runs
    val dim = Seq(
      (100L, 199L, 0L, 1000L, 1L),
      (100L, 199L, 0L, 1000L, 2L)) // duplicate coverage — invalid
      .toDF("range_start", "range_end", "valid_from_sec", "valid_to_sec",
        "account_id")
    val cdrs = Seq(("150", 500L)).toDF("canonical", "sec")
    // unvalidated: fails loudly
    intercept[IllegalArgumentException] {
      PreratingQ.guideRangesVersioned(cdrs, dim)
    }
    // preValidated: the caller vouched; the join itself runs
    val out = PreratingQ.guideRangesVersioned(cdrs, dim,
      preValidated = true)
    assert(out.count() == 2) // double coverage fans out — why the
                             // validation exists
  }
}
