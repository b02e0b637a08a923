package graft

import graft.queries.Registry

/** Every declared query runs end-to-end at sf0.001 and produces a sane
  * result. Value-level correctness is enforced by the DuckDB oracle gate
  * (tools/check_oracle.py / the driver); this guards regressions fast.
  */
class QueriesSpec extends SparkSpec {

  // Queries that legitimately return zero rows at sf0.001 (e.g. every
  // customer has an order there; near-dup pairs may not exist).
  private val mayBeEmpty = Set("q05_anti_join", "q18_predicates",
    "q26_minhash_lsh", "q26b_neardup_components", "q28_ngram_jaccard",
    "q50_decontamination")

  Registry.all.foreach { q =>
    test(s"${q.name} runs and is well-formed") {
      val df = q.build(spark, sfDir)
      assert(df.columns.nonEmpty)
      val n = df.count()
      if (!mayBeEmpty(q.name)) assert(n > 0, s"${q.name} returned no rows")
    }
  }

  test("oracle names match query names") {
    val qnames = Registry.all.map(_.name).toSet
    assert(SparkEntry.oracleSql.keySet.subsetOf(qnames))
  }

  test("entry (flagship) returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("registry names are unique") {
    val names = Registry.all.map(_.name)
    assert(names.distinct.size == names.size)
  }
}
