package graft

import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop, Test => ScTest}

import graft.queries.TokenizerQ

/** Property test: the codegen'd BPE merge fold must agree with a naive
  * imperative greedy leftmost-first merge on arbitrary symbol sequences
  * and pairs — including the overlapping-run case (l == r) where greedy
  * semantics are easiest to get wrong, and merged-symbol collisions
  * (a symbol equal to l+r already present in the sequence).
  */
class BpePropertySpec extends SparkSpec {

  import spark.implicits._

  /** Reference implementation: scan left to right, merging (l, r) and
    * consuming both operands so an overlapping second match cannot fire. */
  private def naiveMerge(syms: List[String], l: String, r: String): List[String] = {
    val out = scala.collection.mutable.ListBuffer.empty[String]
    var i = 0
    while (i < syms.length) {
      if (i + 1 < syms.length && syms(i) == l && syms(i + 1) == r) {
        out += (l + r); i += 2
      } else { out += syms(i); i += 1 }
    }
    out.toList
  }

  // tiny alphabet → dense overlaps; include the two-char symbol "aa" so
  // merged-output collisions (merging (a,a) where "aa" already exists)
  // are generated
  private val symGen = Gen.oneOf("a", "b", "c", "aa")
  private val seqGen = Gen.choose(1, 12).flatMap(n => Gen.listOfN(n, symGen))
  private val pairGen = Gen.zip(symGen, symGen)

  test("mergeFold == naive greedy merge on random sequences and pairs") {
    val prop = Prop.forAll(Gen.listOfN(25, seqGen), pairGen) { (seqs, pair) =>
      val (l, r) = pair
      // one round of bpeMerges is driven by the corpus argmax, so drive
      // the fold directly through bpeTokenCounts' apply path instead:
      // build docs whose words ARE the symbol sequences (joined by a
      // char that never appears in symbols), learn nothing — use the
      // package-private fold via a 1-round corpus where (l, r) wins
      val docs = seqs.zipWithIndex
        .map { case (s, i) => (i.toLong, s.mkString(" ")) }
        .toDF("doc_id", "sym")
      val got = docs
        .withColumn("merged", TokenizerQ.testMergeFold(col("sym"), l, r))
        .select("doc_id", "merged").as[(Long, String)].collect().toMap
      seqs.zipWithIndex.forall { case (s, i) =>
        got(i.toLong) == naiveMerge(s, l, r).mkString(" ")
      }
    }
    val res = ScTest.check(ScTest.Parameters.default.withMinSuccessfulTests(30), prop)
    assert(res.passed, res.status.toString)
  }

  test("batched fold == sequential naive merges, in any order, for disjoint pairs") {
    // symbol-disjoint pair pool (left, right, AND merged products all
    // distinct across pairs — the invariant learn()'s selection enforces)
    val pool = List(("a", "b"), ("c", "d"), ("e", "e"), ("f", "g"))
    val wordGen = Gen.choose(1, 14).flatMap(n =>
      Gen.listOfN(n, Gen.oneOf("a", "b", "c", "d", "e", "f", "g", "ab", "cd")))
    val batchGen = Gen.choose(1, pool.size)
      .flatMap(k => Gen.pick(k, pool).map(_.toList))
    val prop = Prop.forAll(Gen.listOfN(15, wordGen), batchGen) { (seqs, pairs) =>
      val docs = seqs.zipWithIndex
        .map { case (s, i) => (i.toLong, s.mkString(" ")) }
        .toDF("doc_id", "sym")
      val got = docs
        .withColumn("merged", TokenizerQ.testBatchMergeFold(col("sym"), pairs))
        .select("doc_id", "merged").as[(Long, String)].collect().toMap
      seqs.zipWithIndex.forall { case (s, i) =>
        val fwd = pairs.foldLeft(s) { case (acc, (l, r)) => naiveMerge(acc, l, r) }
        val rev = pairs.reverse.foldLeft(s) { case (acc, (l, r)) => naiveMerge(acc, l, r) }
        fwd == rev && got(i.toLong) == fwd.mkString(" ")
      }
    }
    val res = ScTest.check(ScTest.Parameters.default.withMinSuccessfulTests(30), prop)
    assert(res.passed, res.status.toString)
  }

  test("incremental pair counts == full recount after several merge rounds") {
    // the learner keeps a running pair-count table updated by ± deltas of
    // touched words only; after any number of rounds it must equal the
    // from-scratch recount of the current word table — for both batch=1
    // (sequential BPE) and batch>1 (disjoint batches)
    val wordGen = Gen.choose(2, 10).flatMap(n =>
      Gen.listOfN(n, Gen.oneOf("a", "b", "c", "d")).map(_.mkString))
    val docGen = Gen.choose(3, 8).flatMap(n =>
      Gen.listOfN(n, wordGen).map(_.mkString(" ")))
    val prop = Prop.forAll(Gen.listOfN(12, docGen), Gen.oneOf(1, 2, 3)) {
      (texts, batch) =>
        val docs = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
          .toDF("doc_id", "text")
        val (words, pc) = TokenizerQ.testLearnState(docs, rounds = 5, batch)
        val full = words.select(col("freq"),
            explode(expr(
              """zip_with(slice(split(sym, ' '), 1, size(split(sym, ' ')) - 1),
                          slice(split(sym, ' '), 2, size(split(sym, ' ')) - 1),
                          (a, b) -> struct(a AS l, b AS r))""")).as("p"))
          .groupBy(col("p.l").as("l"), col("p.r").as("r"))
          .agg(sum(col("freq")).as("pf"))
          .as[(String, String, Long)].collect().toSet
        val incr = pc.as[(String, String, Long)].collect().toSet
        incr == full
    }
    val res = ScTest.check(ScTest.Parameters.default.withMinSuccessfulTests(8), prop)
    assert(res.passed, res.status.toString)
  }
}
