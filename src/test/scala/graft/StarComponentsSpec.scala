package graft

import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop, Test => ScTest}

import graft.queries.TextQ

/** Large-star/small-star connected components: label-identical to
  * min-label propagation everywhere, and O(log d) rounds where
  * propagation needs O(d).
  */
class StarComponentsSpec extends SparkSpec {

  import spark.implicits._

  test("star components == min-label propagation on random graphs") {
    val edgeGen = Gen.nonEmptyListOf(
      Gen.zip(Gen.chooseNum(1L, 60L), Gen.chooseNum(1L, 60L)))
    val prop = Prop.forAll(edgeGen) { es =>
      val pairs = es.filter { case (a, b) => a != b }
      pairs.isEmpty || {
        val df = pairs.toDF("doc_a", "doc_b")
        val star = TextQ.connectedComponentsStar(df)
          .as[(Long, Long)].collect().toMap
        val prop0 = TextQ.connectedComponents(df, maxIter = 60)
          .as[(Long, Long)].collect().toMap
        star == prop0
      }
    }
    val res = ScTest.check(
      ScTest.Parameters.default.withMinSuccessfulTests(15), prop)
    assert(res.passed, res.status.toString)
  }

  test("a long chain converges in O(log d) star rounds, not O(d)") {
    // planted 200-link chain: diameter 200. Propagation at maxIter=20
    // (its default budget) must throw its loud non-convergence error;
    // the star variant must land the same labels within ~log2 budget.
    val chain = (0L until 200L).map(i => (i, i + 1L)).toDF("doc_a", "doc_b")
    intercept[IllegalStateException] {
      TextQ.connectedComponents(chain, maxIter = 20).collect()
    }
    val (labels, rounds) =
      TextQ.starComponentsWithRounds(chain, maxIter = 30)
    val got = labels.as[(Long, Long)].collect()
    assert(got.length == 201 && got.forall(_._2 == 0L), got.take(5).toSeq.toString)
    assert(rounds <= 12, s"star took $rounds rounds on a 200-chain")
  }

  test("multiple components, reversed ids, and duplicate edges") {
    // component A: {5,6,7} (given big-to-small), B: {1,2}, C: singleton
    // edge dupes both orientations
    val df = Seq((7L, 6L), (6L, 5L), (5L, 6L), (2L, 1L), (1L, 2L),
      (9L, 9L)).toDF("doc_a", "doc_b")
    val got = TextQ.connectedComponentsStar(df)
      .as[(Long, Long)].collect().toMap
    assert(got == Map(5L -> 5L, 6L -> 5L, 7L -> 5L, 1L -> 1L, 2L -> 1L,
      9L -> 9L), got.toString)
  }
}
