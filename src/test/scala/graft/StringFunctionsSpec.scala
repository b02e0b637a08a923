package graft

import org.apache.spark.sql.functions._
import graft.functions.{JaroWinkler, StringFunctions}
import graft.queries.TextQ

/** JaroWinkler codegen expression + blocked fuzzy name linkage. */
class StringFunctionsSpec extends SparkSpec {
  import spark.implicits._

  /** Naive reference implementation (textbook definition, DuckDB
    * semantics: empty → 0, boost threshold 0.7, prefix cap 4). */
  private def refJw(s1: String, s2: String): Double = {
    if (s1.isEmpty || s2.isEmpty) return 0.0
    if (s1 == s2) return 1.0
    val (l1, l2) = (s1.length, s2.length)
    val md = math.max(0, math.max(l1, l2) / 2 - 1)
    val m1 = Array.fill(l1)(false)
    val m2 = Array.fill(l2)(false)
    var m = 0
    for (i <- 0 until l1) {
      var j = math.max(0, i - md)
      var hit = false
      while (j < math.min(l2, i + md + 1) && !hit) {
        if (!m2(j) && s1(i) == s2(j)) { m1(i) = true; m2(j) = true; m += 1; hit = true }
        j += 1
      }
    }
    if (m == 0) return 0.0
    var (t, k) = (0, 0)
    for (i <- 0 until l1 if m1(i)) {
      while (!m2(k)) k += 1
      if (s1(i) != s2(k)) t += 1
      k += 1
    }
    t /= 2
    var j = (m.toDouble / l1 + m.toDouble / l2 + (m - t).toDouble / m) / 3.0
    if (j > 0.7) {
      val l = s1.zip(s2).take(4).takeWhile { case (a, b) => a == b }.size
      j = j + 0.1 * l * (1.0 - j)
    }
    j
  }

  private def jwOf(a: String, b: String): Double =
    Seq((a, b)).toDF("a", "b")
      .select(StringFunctions.jaro_winkler(col("a"), col("b")))
      .head.getDouble(0)

  test("textbook values (the record-linkage literature's canon)") {
    assert(math.abs(jwOf("martha", "marhta") - 0.9611111111111111) < 1e-12)
    assert(math.abs(jwOf("dwayne", "duane") - 0.84) < 1e-12)
    assert(math.abs(jwOf("dixon", "dicksonx") - 0.8133333333333332) < 1e-9)
  }

  test("edge cases match DuckDB: empty 0, equal 1, disjoint 0") {
    assert(jwOf("", "abc") === 0.0)
    assert(jwOf("abc", "") === 0.0)
    assert(jwOf("", "") === 0.0)
    assert(jwOf("same", "same") === 1.0)
    assert(jwOf("abc", "xyz") === 0.0)
  }

  test("boost threshold: prefix bonus NOT applied at jaro <= 0.7") {
    // "abcdefghij" vs "abwxyzuvst": long shared prefix but low jaro —
    // the 0.7 gate must suppress the Winkler bonus.
    val plain = refJw("abcdefghij", "abzzzzzzzz")
    assert(jwOf("abcdefghij", "abzzzzzzzz") === plain)
  }

  test("fuzz: codegen kernel == naive reference on 2000 random pairs") {
    val rnd = new scala.util.Random(42)
    val pairs = Seq.fill(2000) {
      def s = (0 until rnd.nextInt(12)).map(_ => ('a' + rnd.nextInt(6)).toChar).mkString
      (s, s)
    }.map { case (a, _) =>
      def s = (0 until rnd.nextInt(12)).map(_ => ('a' + rnd.nextInt(6)).toChar).mkString
      (a, s)
    }
    val got = pairs.toDF("a", "b")
      .select(col("a"), col("b"), StringFunctions.jaro_winkler(col("a"), col("b")).as("jw"))
      .collect()
    got.foreach { r =>
      val want = refJw(r.getString(0), r.getString(1))
      assert(r.getDouble(2) === want,
        s"mismatch on (${r.getString(0)}, ${r.getString(1)})")
    }
  }

  test("null propagates (nullIntolerant binary expression)") {
    val r = Seq((Some("a"), Option.empty[String])).toDF("a", "b")
      .select(StringFunctions.jaro_winkler(col("a"), col("b"))).head
    assert(r.isNullAt(0))
  }

  test("interpreted eval agrees with codegen path") {
    import org.apache.spark.sql.catalyst.expressions.Literal
    val e = JaroWinkler(Literal("martha"), Literal("marhta"))
    assert(e.eval(null).asInstanceOf[Double] === jwOf("martha", "marhta"))
  }

  test("fuzzyNameLinkage: planted typo family links, distinct nouns don't") {
    val recs = Seq(
      (1L, "acme widget"), (2L, "acme widget"), (3L, "acmee widget"),
      (4L, "zenith widget"), (5L, "acme gizmo")
    ).toDF("key", "name")
    val out = TextQ.fuzzyNameLinkage(recs, "name", "key", minJw = 0.9)
      .collect()
    assert(out.length === 1)
    val r = out.head
    assert(r.getString(0) === "acme widget" && r.getString(1) === "acmee widget")
    assert(r.getLong(3) === 2L && r.getLong(4) === 1L) // row counts carried
    assert(r.getLong(5) === 1L) // canonical key = least
  }

  test("resolveEntities: transitive chain merges, dominant spelling wins") {
    // "acmee widget" links to both "acme widget" and "acmeee widget",
    // which do NOT link directly (jw < 0.9 gap too wide? they do via
    // chain regardless) — the entity is the transitive closure.
    val recs = Seq(
      (1L, "acme widget"), (2L, "acme widget"), (3L, "acme widget"),
      (4L, "acmee widget"), (5L, "acmeee widget"), (6L, "acmeee widget"),
      (7L, "zenith gizmo")
    ).toDF("key", "name")
    val out = TextQ.resolveEntities(recs, "name", "key")
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getBoolean(4)))
    val byEntity = out.groupBy(_._1)
    assert(byEntity.size === 2, s"expected 2 entities: ${out.toSeq}")
    val acme = byEntity("acme widget").sortBy(_._2)
    assert(acme.map(_._2).toSeq ===
      Seq("acme widget", "acmee widget", "acmeee widget"))
    // canonical = most records ("acme widget", 3 rows)
    assert(acme.filter(_._4).map(_._2).toSeq === Seq("acme widget"))
    // singleton is its own canonical entity
    assert(byEntity("zenith gizmo").head._4)
  }

  test("fuzzyNameLinkage: maxBlockSize cap drops a degenerate block") {
    val recs = (1L to 20L).map(i => (i, s"name$i common")).toDF("key", "name")
    assert(TextQ.fuzzyNameLinkage(recs, "name", "key", minJw = 0.1,
      maxBlockSize = 10).count() === 0)
  }

  test("sortedNeighborLinkage catches the head-noun blocking blind spot") {
    // typo in the BLOCKING (last) token: head-noun blocks differ
    // ('corp' vs 'corpp') so fuzzyNameLinkage misses the pair; in sort
    // order the names are adjacent and the neighbor window catches it
    val recs = Seq((1L, "acme corp"), (2L, "acme corpp"), (3L, "zeta ltd"))
      .toDF("key", "name")
    assert(TextQ.fuzzyNameLinkage(recs, "name", "key").count() === 0)
    val got = TextQ.sortedNeighborLinkage(recs, "name", "key")
      .select("name_a", "name_b").collect()
      .map(r => (r.getString(0), r.getString(1)))
    assert(got.toSeq === Seq(("acme corp", "acme corpp")), got.toSeq)
  }

  test("sortedNeighborLinkage pairs only within the rank window") {
    val recs = Seq((1L, "alpha one"), (2L, "alpha two"), (3L, "alpha zz"))
      .toDF("key", "name")
    def pairs(w: Int) =
      TextQ.sortedNeighborLinkage(recs, "name", "key", windowSize = w,
        minJw = 0.5)
        .select("name_a", "name_b").collect()
        .map(r => (r.getString(0), r.getString(1))).toSet
    assert(!pairs(1).contains(("alpha one", "alpha zz")))
    assert(pairs(2).contains(("alpha one", "alpha zz")))
  }

  test("sortedNeighborLinkage band join plans as a hash join via the rewrite rule") {
    val recs = Seq((1L, "a x"), (2L, "b y")).toDF("key", "name")
    val plan = TextQ.sortedNeighborLinkage(recs, "name", "key")
      .queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin") &&
      !plan.contains("CartesianProduct"), plan)
  }
}
