package graft

import org.apache.spark.sql.functions._

import graft.queries.{AnalyticsQ, PreratingQ}

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

  test("pseudonymizeMsisdn is prefix-preserving, injective, never-drop") {
    val nums = Seq("491512340042", "491512340043", "491512999999",
      "4915123", null)
    val df = nums.toDF("canonical")
    val out = PreratingQ.pseudonymizeMsisdn(df)
      .select(col("canonical"), col("pseudonym"))
      .as[(Option[String], Option[String])].collect().toMap
    // same length, kept CC+NDC, NULL passthrough
    assert(out(None).isEmpty, "NULL canonical must keep NULL pseudonym")
    nums.filter(_ != null).foreach { n =>
      val p = out(Some(n)).get
      assert(p.length == n.length, s"$n -> $p length")
      assert(p.startsWith(n.take(4)), s"$n -> $p lost the kept prefix")
      assert(p.forall(_.isDigit))
    }
    // prefix-preserving: the two numbers sharing 11 digits share 11
    // pseudonym digits; the diverging pair diverges at its first
    // differing original position
    val (a, b) = (out(Some("491512340042")).get,
      out(Some("491512340043")).get)
    assert(a.take(11) == b.take(11) && a(11) != b(11), s"$a vs $b")
    val c = out(Some("491512999999")).get
    assert(a.take(6) == c.take(6) && a(6) != c(6), s"$a vs $c")
    // injective over a dense block: 1000 consecutive numbers -> 1000
    // distinct pseudonyms
    val block = spark.range(0L, 1000L)
      .select(concat(lit("49151234"), format_string("%04d", col("id")))
        .as("canonical"))
    assert(PreratingQ.pseudonymizeMsisdn(block)
      .select("pseudonym").distinct().count() == 1000L)
  }

  test("cupedAdjust: zero pooled variance degrades to raw means") {
    val units = Seq(("A", 100L, 10L), ("A", 100L, 30L), ("B", 100L, 20L))
      .toDF("variant", "x", "y")
    val out = AnalyticsQ.cupedAdjust(units)
      .select(col("variant"), col("mean_y_milli"),
        col("adj_mean_y_milli"), col("theta_milli"))
      .as[(String, Long, Long, Long)].collect().toSet
    assert(out == Set(("A", 20000L, 20000L, 0L), ("B", 20000L, 20000L, 0L)),
      out.toString)
  }

  test("cupedAdjust: a perfectly covariate-explained metric flattens") {
    // y = x exactly: theta = 1, every unit's adjustment removes the
    // covariate spread, so both arms' adjusted means equal the pooled
    // mean even though raw means differ
    val units = Seq(("A", 100L, 100L), ("A", 300L, 300L),
      ("B", 500L, 500L), ("B", 700L, 700L)).toDF("variant", "x", "y")
    val out = AnalyticsQ.cupedAdjust(units)
      .select(col("variant"), col("mean_y_milli"),
        col("adj_mean_y_milli"), col("theta_milli"))
      .as[(String, Long, Long, Long)].collect().toSet
    assert(out == Set(("A", 200000L, 400000L, 1000L),
      ("B", 600000L, 400000L, 1000L)), out.toString)
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
