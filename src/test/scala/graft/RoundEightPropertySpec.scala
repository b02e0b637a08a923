package graft

import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop, Test => ScTest}

import graft.queries.{EventQ, GraphQ}

/** Randomized equivalence for the round-8 operators whose oracle
  * fixtures exercise one corpus shape: each is pinned against an
  * independent in-memory reference implementation on arbitrary inputs
  * (the TokenizerGraphSpec / PrepaidPropertySpec convention).
  */
class RoundEightPropertySpec extends SparkSpec {

  import spark.implicits._

  // --- edgeEmbeddedness vs naive adjacency-set reference ----------------

  private def naiveEmbeddedness(edges: Seq[(Long, Long)])
      : Map[(Long, Long), (Long, Long)] = {
    val canon = edges.map { case (a, b) => (math.min(a, b), math.max(a, b)) }
      .filter { case (a, b) => a != b }.distinct
    val adj = canon.flatMap { case (a, b) => Seq(a -> b, b -> a) }
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    canon.map { case (a, b) =>
      val cn = (adj(a) & adj(b)).size.toLong
      val denom = adj(a).size + adj(b).size - cn - 2
      (a, b) -> ((cn, if (denom <= 0) 0L else 1000000L * cn / denom))
    }.toMap
  }

  test("edgeEmbeddedness == naive adjacency reference on random graphs") {
    val edgeGen = Gen.zip(Gen.choose(0L, 9L), Gen.choose(0L, 9L))
    val graphGen = Gen.choose(1, 24).flatMap(n => Gen.listOfN(n, edgeGen))
    val prop = Prop.forAll(graphGen) { edges =>
      val clean = edges.filter { case (a, b) => a != b }
      clean.isEmpty || {
        val got = GraphQ.edgeEmbeddedness(clean.toDF("doc_a", "doc_b"))
          .as[(Long, Long, Long, Long, Long, Long)].collect()
          .map(r => (r._1, r._2) -> ((r._3, r._6))).toMap
        got == naiveEmbeddedness(clean)
      }
    }
    val res = ScTest.check(
      ScTest.Parameters.default.withMinSuccessfulTests(25), prop)
    assert(res.passed, res.status.toString)
  }

  // --- assembleLegsBatch vs in-memory LegAssembler-semantics fold -------

  /** Reference replay of the processor semantics over arrival order. */
  private def naiveAssemble(legs: Seq[(String, Long, Long, Long, Long)])
      : Map[String, (Long, Long, Long, Boolean)] =
    legs.sortBy(_._5).groupBy(_._1).flatMap { case (call, ls) =>
      var seen = Set.empty[Long]
      var declared = 0L; var sum = 0L
      ls.foreach { case (_, seq, total, dur, _) =>
        if (seq >= 1 && seq <= 64 && total >= 1) {
          if (!seen(seq)) { seen += seq; sum += dur }
          if (total > declared) declared = total
        }
      }
      if (seen.isEmpty) None
      else Some(call -> ((declared, seen.size.toLong, sum,
        declared <= 64 && seen.size == declared && seen.max == declared)))
    }

  test("assembleLegsBatch == in-memory processor replay on random feeds") {
    // small seq/total ranges force dense collisions of every verdict;
    // include invalid seqs (0, 70) to exercise the drop path
    val legGen = for {
      call <- Gen.oneOf("a", "b", "c")
      seq <- Gen.oneOf(Gen.choose(1L, 5L), Gen.oneOf(0L, 70L))
      total <- Gen.choose(1L, 5L)
      dur <- Gen.choose(1L, 500L)
    } yield (call, seq, total, dur)
    val feedGen = Gen.choose(1, 20).flatMap(n => Gen.listOfN(n, legGen))
    val prop = Prop.forAll(feedGen) { raw =>
      val legs = raw.zipWithIndex.map { case ((c, s, t, d), i) =>
        (c, s, t, d, i.toLong) }
      val got = EventQ.assembleLegsBatch(
          legs.toDF("call_id", "seq", "total", "duration_centi", "arrival"))
        .as[(String, Long, Long, Long, Boolean)].collect()
        .map(r => r._1 -> ((r._2, r._3, r._4, r._5))).toMap
      got == naiveAssemble(legs)
    }
    val res = ScTest.check(
      ScTest.Parameters.default.withMinSuccessfulTests(25), prop)
    assert(res.passed, res.status.toString)
  }

  // --- marginalTieredCharges vs in-memory running fold ------------------

  private val tiers = Seq((0L, 500L, 5L), (500L, 2000L, 3L),
    (2000L, Long.MaxValue, 1L))

  private def tTotal(u: Long): Long = tiers.map { case (f, to, r) =>
    val over = math.max(u - f, 0L)
    r * (if (to == Long.MaxValue) over else math.min(over, to - f))
  }.sum

  test("marginalTieredCharges == in-memory running fold on random usage") {
    val flowGen = Gen.choose(1, 12)
      .flatMap(n => Gen.listOfN(n, Gen.choose(-300L, 900L)))
    val prop = Prop.forAll(Gen.listOfN(4, flowGen)) { users =>
      val rows = users.zipWithIndex.flatMap { case (us, a) =>
        us.zipWithIndex.map { case (u, i) =>
          ((a * 100 + i).toLong, a.toLong, i.toLong, u / 100.0) }
      }
      val got = EventQ.marginalTieredCharges(
          rows.toDF("event_id", "user_id", "ts", "value"),
          expr("CAST(round(value * 100) AS BIGINT)"), tiers)
        .as[(Long, Long, Long, Long, Long)].collect()
        .map(r => r._1 -> ((r._4, r._5))).toMap
      users.zipWithIndex.forall { case (us, a) =>
        var cum = 0L
        us.zipWithIndex.forall { case (u, i) =>
          val ue = math.max(u, 0L)
          val want = (cum + ue, tTotal(cum + ue) - tTotal(cum))
          cum += ue
          got.get((a * 100 + i).toLong).contains(want)
        }
      }
    }
    val res = ScTest.check(
      ScTest.Parameters.default.withMinSuccessfulTests(20), prop)
    assert(res.passed, res.status.toString)
  }
}
