package graft

import java.nio.file.Files

import graft.etl.IncrementalShardPlan

/** Append-only sharding: a second wave continues the first wave's final
  * partial shard (no rewrite, no gap), empty waves leave the state
  * untouched, and the committed token total is the exact sum of wave
  * tokens.
  */
class IncrementalShardSpec extends SparkSpec {

  import spark.implicits._

  private def tmp(prefix: String) = Files.createTempDirectory(prefix).toString

  test("waves continue the token prefix across the seam") {
    val state = tmp("graft_is_state")
    // wave 1: 5 docs x 4 tokens = 20 tokens, budget 8 -> shards 0,1,2
    val w1 = (1L to 5L).map(i => (i, "a b c d")).toDF("doc_id", "text")
    var plans = Seq.empty[(Long, Long, Long)]
    var firstShards = Seq.empty[Long]
    def step(df: org.apache.spark.sql.DataFrame): Long =
      IncrementalShardPlan.run(df, tokenBudget = 8L, state) { (p, fs) =>
        plans = p.as[(Long, Long, Long)].collect().toSeq
        firstShards :+= fs
      }
    assert(step(w1) == 20L)
    val s1 = plans.map(_._3)
    assert(firstShards == Seq(0L))
    assert(s1.min == 0L && s1.max == 2L, s"wave-1 shards: $s1")
    // wave 2 starts at token 20 -> first shard is 20 DIV 8 = 2 (the
    // wave-1 partial shard gets FILLED, not abandoned)
    val w2 = (11L to 14L).map(i => (i, "x y z")).toDF("doc_id", "text")
    assert(step(w2) == 32L)
    assert(firstShards == Seq(0L, 2L))
    val s2 = plans.map(_._3)
    assert(s2.min == 2L, s"wave-2 must continue shard 2, got $s2")
    assert(s2.max == 3L, s"32 tokens / 8 ends in shard 3, got $s2")
    assert(IncrementalShardPlan.tokenTotal(state) == Some(32L))
    // empty wave: process must not run, state must not move
    plans = Seq((-1L, -1L, -1L))
    val empty = Seq.empty[(Long, String)].toDF("doc_id", "text")
    assert(step(empty) == 32L)
    assert(plans == Seq((-1L, -1L, -1L)))
    assert(IncrementalShardPlan.tokenTotal(state) == Some(32L))
  }

  test("streaming sink: seam shards accumulate, retries replace not duplicate") {
    val state = tmp("graft_is_sink_state")
    val shards = tmp("graft_is_sink_out") + "/shards"
    val sink = IncrementalShardPlan.sink(tokenBudget = 8L, shards, state)
    val b0 = (1L to 5L).map(i => (i, "a b c d")).toDF("doc_id", "text")
    val b1 = (11L to 14L).map(i => (i, "x y z")).toDF("doc_id", "text")
    sink(b0, 0L)
    assert(IncrementalShardPlan.batchState(state) == Some((0L, 0L, 20L)))
    sink(b1, 1L)
    assert(IncrementalShardPlan.batchState(state) == Some((1L, 20L, 32L)))
    val out = spark.read.parquet(shards)
      .select($"doc_id", $"shard_id".cast("long"), $"batch_id".cast("long"))
      .as[(Long, Long, Long)].collect()
    assert(out.length == 9, "all docs written once")
    // the seam: shard 2 holds rows from BOTH batches
    val seam = out.filter(_._2 == 2L).map(_._3).distinct.sorted
    assert(seam.toSeq == Seq(0L, 1L), s"seam shard batches: ${seam.toSeq}")
    // retry batch 1: same offsets, output replaced (no duplicates)
    sink(b1, 1L)
    assert(IncrementalShardPlan.batchState(state) == Some((1L, 20L, 32L)))
    val out2 = spark.read.parquet(shards)
      .select($"doc_id").as[Long].collect()
    assert(out2.length == 9 && out2.distinct.length == 9,
      s"retry must not duplicate: ${out2.length}")
    // out-of-order batch id fails loudly
    intercept[IllegalArgumentException](sink(b0, 0L))
  }

  test("two waves' token accounting equals the one-shot total") {
    val stateA = tmp("graft_is_a")
    val stateB = tmp("graft_is_b")
    val docs = (1L to 30L).map(i => (i, ("t " * (i % 5 + 1).toInt).trim))
      .toDF("doc_id", "text")
    val (h1, h2) = (docs.filter($"doc_id" <= 15), docs.filter($"doc_id" > 15))
    def total(state: String, waves: Seq[org.apache.spark.sql.DataFrame]) =
      waves.map(w =>
        IncrementalShardPlan.run(w, 16L, state) { (_, _) => () }).last
    assert(total(stateA, Seq(h1, h2)) == total(stateB, Seq(docs)))
  }
}
