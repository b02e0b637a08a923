package graft

import org.apache.spark.sql.functions._

import graft.queries.TextQ

/** Dev probe: large-star/small-star vs min-label propagation on the
  * pathological fixture propagation is worst at — a planted LONG CHAIN
  * (diameter = links), where propagation needs one shuffle round per
  * link and the star rewrite needs O(log links). Also replays a
  * realistic shallow mirror-family graph (many small cliques) to show
  * the default keeps its edge there. Results → SCALING.md.
  */
object StarComponentsProbe {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = core.GraftSession.builder(s"local[$cpus]", cpus.toInt)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    val links = sys.env.getOrElse("SPARK_GRAFT_CHAIN_LINKS", "1000").toInt
    val chain = (0L until links.toLong).map(i => (i, i + 1L))
      .toDF("doc_a", "doc_b").localCheckpoint()

    val t0 = System.nanoTime()
    val (starLabels, rounds) =
      TextQ.starComponentsWithRounds(chain, maxIter = 40)
    val nStar = starLabels.filter(col("component") === 0L).count()
    val tStar = (System.nanoTime() - t0) / 1e9
    println(f"starcc chain=$links star rounds=$rounds wall=$tStar%.2fs " +
      s"all_in_component_0=${nStar == links + 1}")

    val t1 = System.nanoTime()
    val propLabels = TextQ.connectedComponents(chain, maxIter = links + 5)
    val nProp = propLabels.filter(col("component") === 0L).count()
    val tProp = (System.nanoTime() - t1) / 1e9
    println(f"starcc chain=$links propagation rounds<=${links + 5} " +
      f"wall=$tProp%.2fs all_in_component_0=${nProp == links + 1} " +
      f"speedup=${tProp / tStar}%.1fx")

    // shallow mirror families (the dedup fixture shape): 2000 cliques of
    // 5 — diameter 1, where propagation's 2-3 rounds are hard to beat
    val cliques = (0L until 2000L).flatMap { c =>
      val ids = (0 until 5).map(i => c * 10L + i)
      ids.combinations(2).map(p => (p(0), p(1)))
    }.toDF("doc_a", "doc_b").localCheckpoint()
    val t2 = System.nanoTime()
    TextQ.connectedComponents(cliques).count()
    val tp = (System.nanoTime() - t2) / 1e9
    val t3 = System.nanoTime()
    TextQ.connectedComponentsStar(cliques).count()
    val ts = (System.nanoTime() - t3) / 1e9
    println(f"starcc cliques=2000x5 propagation=$tp%.2fs star=$ts%.2fs " +
      "(shallow graphs: propagation stays the default)")
    spark.stop()
  }
}
