package graft

import org.apache.spark.sql.functions._

import graft.queries.{TextQ, WindowQ}

/** Round-4 operators: snapshot diff (dataset versioning), edit-distance
  * confirmation of LSH candidates, integer-PMI collocation mining, and the
  * leakage-safe split. The oracle gate pins fixture values; these tests pin
  * the semantics the fixtures can't reach (deletes, null transitions,
  * hand-computed lifts, planted cross-split leaks).
  */
class DiffConfirmSpec extends SparkSpec {

  import spark.implicits._

  // ---- snapshotDiff ------------------------------------------------------

  private def diffFixture = {
    val old = Seq(
      (1L, "a", Option(1.0)), // unchanged
      (2L, "a", Option(2.0)), // value changes
      (3L, "a", Option(3.0)), // type changes
      (4L, "a", Option(4.0)), // both change
      (5L, "a", None), // null -> value (update via null-safe compare)
      (6L, "a", Option(6.0)) // deleted
    ).toDF("k", "t", "v")
    val nw = Seq(
      (1L, "a", Option(1.0)),
      (2L, "a", Option(2.5)),
      (3L, "b", Option(3.0)),
      (4L, "b", Option(4.5)),
      (5L, "a", Option(5.0)),
      (7L, "a", Option(7.0)) // inserted
    ).toDF("k", "t", "v")
    WindowQ.snapshotDiff(old, nw, Seq("k"), Seq("t", "v"))
      .collect().map(r => r.getLong(0) -> ((r.getString(1), r.getLong(2)))).toMap
  }

  test("snapshotDiff classifies insert/delete/update/same with column bits") {
    val d = diffFixture
    assert(d(1L) == ("same", 0L))
    assert(d(2L) == ("update", 2L)) // bit 1 = v
    assert(d(3L) == ("update", 1L)) // bit 0 = t
    assert(d(4L) == ("update", 3L)) // both bits
    assert(d(5L) == ("update", 2L)) // null -> 5.0 is a change (null-safe)
    assert(d(6L) == ("delete", 0L))
    assert(d(7L) == ("insert", 0L))
    assert(d.size == 7)
  }

  test("snapshotDiff carries the new-side values (null for deletes)") {
    val old = Seq((1L, "x")).toDF("k", "c")
    val nw = Seq((2L, "y")).toDF("k", "c")
    val rows = WindowQ.snapshotDiff(old, nw, Seq("k"), Seq("c"))
      .orderBy(col("k")).collect()
    assert(rows(0).getString(1) == "delete" && rows(0).isNullAt(3))
    assert(rows(1).getString(1) == "insert" && rows(1).getString(3) == "y")
  }

  // ---- editConfirmedPairs --------------------------------------------------

  test("editConfirmedPairs: identical docs confirm at distance 0, sim 1e6") {
    val base = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    val docs = Seq(1L -> base, 2L -> base, 3L -> (base + "X"))
      .toDF("doc_id", "text")
    val rows = TextQ.editConfirmedPairs(docs, maxDist = 8)
      .orderBy(col("doc_a"), col("doc_b")).collect()
    val exact = rows.find(r => r.getLong(0) == 1L && r.getLong(1) == 2L).get
    assert(exact.getLong(2) == 0L && exact.getLong(3) == 1000000L)
    // the single-char variant confirms at distance 1 with sim < 1e6
    val near = rows.find(r => r.getLong(1) == 3L).get
    assert(near.getLong(2) == 1L && near.getLong(3) < 1000000L)
  }

  test("editConfirmedPairs rejects candidates over the distance budget") {
    // cyclic repetition: both docs have the IDENTICAL 3-shingle SET
    // {x y z, y z x, z x y}, so every MinHash lane agrees and the pair is
    // a guaranteed full-band candidate (est 1.0) — yet the texts differ
    // by ~180 chars, far over the 10-char confirm budget.
    def cycles(n: Int) = Seq.fill(n)("x y z").mkString(" ")
    val docs = Seq(1L -> cycles(3), 2L -> cycles(40)).toDF("doc_id", "text")
    val cand = TextQ.lshCandidates(TextQ.minhashBands(docs)).count()
    val confirmed = TextQ.editConfirmedPairs(docs, maxDist = 10,
      minEstJaccard = 0.0).count()
    assert(cand == 1L, "the pair must be an LSH candidate for the test to bite")
    assert(confirmed == 0L, "a 200-char length gap cannot pass a 10-char budget")
  }

  test("editConfirmedPairs on the fixture keeps true near-dups, drops LSH noise") {
    val docs = graft.core.Tables.load(spark, sfDir, "documents")
    val cand = TextQ.lshCandidates(TextQ.minhashBands(docs))
      .filter(col("est_jaccard") >= 0.25)
    val conf = TextQ.editConfirmedPairs(docs)
    val (nc, nf) = (cand.count(), conf.count())
    assert(nf > 0 && nf < nc, s"confirm must reject some of $nc candidates, kept $nf")
  }

  // ---- collocations --------------------------------------------------------

  test("collocations computes the exact integer lift for a planted bigram") {
    // Per doc "new york a b a b": bigrams (new,york) (york,a) (a,b) (b,a)
    // (a,b) -> over 5 docs N = 25, c12(new,york) = 5, c1(new) = 5,
    // c2(york) = 5 => lift = 5 * 1e6 * 25 / 25 = 5_000_000. The diluted
    // filler pairs all come out at 2_500_000, so (new, york) ranks first.
    val docs = Seq.tabulate(5)(i => (i.toLong, "new york a b a b"))
      .toDF("doc_id", "text")
    val rows = TextQ.collocations(docs, minCount = 5, topK = 10).collect()
    val ny = rows.find(r => r.getString(0) == "new" && r.getString(1) == "york").get
    assert(ny.getLong(2) == 5L && ny.getLong(5) == 5000000L)
    assert(rows.head.getString(0) == "new" && rows.head.getString(1) == "york")
    assert(rows.tail.forall(_.getLong(5) == 2500000L))
  }

  test("collocations minCount filters hapax pairs out of the ranking") {
    val docs = Seq(
      (1L, "rare pair common common common common common common"),
      (2L, "common common common common common common common common"))
      .toDF("doc_id", "text")
    val rows = TextQ.collocations(docs, minCount = 2, topK = 100).collect()
    assert(!rows.exists(r => r.getString(0) == "rare"),
      "a count-1 bigram must not survive minCount=2")
  }

  // ---- drift ---------------------------------------------------------------

  test("drift pins a planted full shift at 1e6 ppm in the moved bins") {
    val old = Seq.fill(10)(5.0).toDF("v") // all mass in bin 0
    val nw = Seq.fill(40)(95.0).toDF("v") // all mass in bin 9 (different total)
    val d = graft.queries.Relational.drift(old, nw, col("v"), 0.0, 100.0, 10)
      .collect().map(r => r.getLong(0) -> r).toMap
    assert(d(0L).getLong(3) == 1000000L && d(0L).getLong(4) == 0L)
    assert(d(9L).getLong(3) == 0L && d(9L).getLong(4) == 1000000L)
    assert(d(0L).getLong(5) == 1000000L && d(9L).getLong(5) == 1000000L)
    // total variation = sum(diff)/2 = the whole distribution moved
    assert(d.values.map(_.getLong(5)).sum / 2 == 1000000L)
  }

  test("drift of a snapshot against itself is zero in every bin") {
    val df = Seq(1.0, 2.0, 50.0, 99.0, 150.0).toDF("v") // 150 clamps to top bin
    val d = graft.queries.Relational.drift(df, df, col("v"), 0.0, 100.0, 10)
    assert(d.filter(col("diff_ppm") =!= 0L).isEmpty)
    assert(d.agg(sum(col("n_old"))).head().getLong(0) == 5L, "clamped rows counted")
  }

  // ---- gapFill -------------------------------------------------------------

  test("gapFill carries the last observed value across gaps with flags") {
    val step = 10L // seconds per cell
    def at(cellFrac: Double) =
      new java.sql.Timestamp((cellFrac * step * 1000).toLong)
    val ev = Seq(
      (1L, at(0.1), 100L, 1.0), // cell 0
      (1L, at(0.5), 101L, 2.0), // cell 0, later ts -> wins the cell
      (1L, at(3.2), 102L, 9.0) // cell 3; cells 1-2 are gaps
    ).toDF("user_id", "ts", "event_id", "value")
    val rows = graft.queries.EventQ
      .gapFill(ev, "user_id", "ts", "event_id", "value", step)
      .orderBy(col("cell")).collect()
      .map(r => (r.getLong(1), r.getDouble(2), r.getBoolean(3)))
    assert(rows.toSeq == Seq(
      (0L, 2.0, false), (1L, 2.0, true), (2L, 2.0, true), (3L, 9.0, false)))
  }

  test("gapFill ties within a cell break by the ord column, replay-stable") {
    val t0 = new java.sql.Timestamp(0L)
    val ev = Seq((1L, t0, 7L, 7.0), (1L, t0, 9L, 9.0), (1L, t0, 8L, 8.0))
      .toDF("user_id", "ts", "event_id", "value")
    val r = graft.queries.EventQ
      .gapFill(ev, "user_id", "ts", "event_id", "value", 10L).collect()
    assert(r.length == 1 && r.head.getDouble(2) == 9.0)
  }

  // ---- leakageSafeSplit ----------------------------------------------------

  test("leakageSafeSplit keeps every near-dup cluster in exactly one split") {
    val docs = graft.core.Tables.load(spark, sfDir, "documents")
    val lab = TextQ.leakageSafeSplit(docs)
    assert(lab.count() == docs.count(), "every doc labels exactly once")
    val mixed = lab.groupBy(col("cluster"))
      .agg(countDistinct(col("split")).as("n_splits"))
      .filter(col("n_splits") > 1)
    assert(mixed.isEmpty, "a cluster straddles splits")
  }

  test("leakageSafeSplit prevents the leak an independent hash split allows") {
    // 20 copies of one document: per-doc hashing scatters them across
    // splits (train would see the eval copies); cluster hashing moves the
    // whole family together
    val text = "the quick brown fox jumps over the lazy dog again and again"
    val docs = Seq.tabulate(20)(i => (i + 1L, text)).toDF("doc_id", "text")
    val perDoc = TextQ.hashSplit(docs, trainPct = 50, valPct = 25)
      .select("split").distinct().count()
    val safe = TextQ.leakageSafeSplit(docs, trainPct = 50, valPct = 25)
    assert(perDoc > 1, "fixture must scatter under per-doc hashing to bite")
    assert(safe.select("split").distinct().count() == 1)
    assert(safe.select("cluster").distinct().count() == 1)
  }
}
