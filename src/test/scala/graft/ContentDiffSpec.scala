package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.queries.CurationQ

/** Classification rules of the content-signature diff (the wide-row
  * companion to WindowQ.snapshotDiff/q79): the q177 oracle
  * checks the md5 plumbing at sf0.01; this pins the semantics — class
  * assignment, NULL-vs-empty distinction, hash-column order sensitivity,
  * duplicate-key rejection — on hand-written snapshots.
  */
class ContentDiffSpec extends SparkSpec {

  import spark.implicits._

  private def snap(rows: (Long, String, String)*): DataFrame =
    rows.toSeq.toDF("id", "body", "tag")

  private def classes(df: DataFrame): Map[Long, String] =
    df.select(col("id"), col("change")).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap

  test("contentDiff assigns all four classes") {
    val oldSnap = snap((1L, "a", "x"), (2L, "b", "x"), (3L, "c", "x"))
    val newSnap = snap((1L, "a", "x"), (2L, "B", "x"), (4L, "d", "x"))
    val got = classes(CurationQ.contentDiff(oldSnap, newSnap, "id",
      Seq("body", "tag")))
    assert(got == Map(1L -> "unchanged", 2L -> "changed",
      3L -> "removed", 4L -> "added"), got.toString)
  }

  test("contentDiff: NULL -> empty string is a change, NULL -> NULL is not") {
    val oldSnap = snap((1L, null, "x"), (2L, null, "x"))
    val newSnap = snap((1L, "", "x"), (2L, null, "x"))
    val got = classes(CurationQ.contentDiff(oldSnap, newSnap, "id",
      Seq("body", "tag")))
    assert(got == Map(1L -> "changed", 2L -> "unchanged"), got.toString)
  }

  test("contentDiff signature covers only the named columns, in order") {
    val oldSnap = snap((1L, "a", "x"))
    val newSnap = snap((1L, "a", "y"))
    // tag not hashed -> unchanged; hashed -> changed
    assert(classes(CurationQ.contentDiff(oldSnap, newSnap, "id",
      Seq("body"))) == Map(1L -> "unchanged"))
    assert(classes(CurationQ.contentDiff(oldSnap, newSnap, "id",
      Seq("body", "tag"))) == Map(1L -> "changed"))
    // swapped values across columns must not collide via the separator
    val o2 = snap((1L, "ab", ""))
    val n2 = snap((1L, "a", "b"))
    assert(classes(CurationQ.contentDiff(o2, n2, "id",
      Seq("body", "tag"))) == Map(1L -> "changed"))
  }

  test("contentDiff rejects duplicate keys loudly") {
    val oldSnap = snap((1L, "a", "x"), (1L, "a2", "x"))
    val newSnap = snap((1L, "a", "x"))
    val e = intercept[Exception] {
      CurationQ.contentDiff(oldSnap, newSnap, "id",
        Seq("body", "tag")).collect()
    }
    assert(e.getMessage.contains("graft.contentDiff: duplicate key"))
  }
}
