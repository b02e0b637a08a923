package graft

import org.apache.spark.sql.functions._

/** Dev probe: wall-clock of a realistic BPE merge budget on a synthetic
  * corpus with a real-sized vocabulary (the oracle fixture's 31-word
  * vocabulary exhausts after ~107 merges, so budget timings need a
  * planted one). Prints one line per (budget, batch) config; results are
  * recorded in SCALING.md's tokenizer section.
  *
  * Corpus: `SPARK_GRAFT_BPE_WORDS` (default 20000) distinct words of
  * 3–10 lowercase chars from a seeded RNG, Zipf-ish frequency via rank
  * (freq = 1 + N/rank), laid out as one document per 50 words.
  * Deterministic, so runs are comparable across rounds.
  *
  * Env: SPARK_GRAFT_BPE_BUDGETS="256:32,256:64" (budget:batch pairs),
  * SPARK_GRAFT_CPUS (default 32).
  */
object BpeBudgetProbe {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = core.GraftSession.builder(s"local[$cpus]", cpus.toInt).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    val nWords = sys.env.getOrElse("SPARK_GRAFT_BPE_WORDS", "20000").toInt
    val rnd = new scala.util.Random(42L)
    val vocab = (1 to nWords).map { rank =>
      val len = 3 + rnd.nextInt(8)
      val w = (1 to len).map(_ => ('a' + rnd.nextInt(26)).toChar).mkString
      (w, 1L + nWords.toLong / rank)
    }
    val tokens = vocab.flatMap { case (w, f) =>
      Seq.fill(math.min(f, 200L).toInt)(w)
    }
    val docs = tokens.grouped(50).zipWithIndex
      .map { case (ws, i) => (i.toLong, ws.mkString(" ")) }
      .toSeq.toDF("doc_id", "text")
      .repartition(cpus.toInt).localCheckpoint()
    println(s"corpus: ${docs.count()} docs, $nWords distinct words")

    // configs: "budget:batch" (frequency BPE) or "budget:batch:wp"
    // (WordPiece likelihood scoring — same incremental/batched learner)
    val configs = sys.env.getOrElse("SPARK_GRAFT_BPE_BUDGETS", "256:32,256:64")
      .split(",").map(_.trim.split(":"))
    configs.foreach { a =>
      val (budget, batch) = (a(0).toInt, a(1).toInt)
      val wp = a.length > 2 && a(2) == "wp"
      val t0 = System.nanoTime()
      val n =
        if (wp) graft.queries.TokenizerQ
          .wordpieceMerges(docs, rounds = budget, batch = batch).count()
        else graft.queries.TokenizerQ
          .bpeMerges(docs, rounds = budget, batch = batch).count()
      val dt = (System.nanoTime() - t0) / 1e9
      val mode = if (wp) "wordpiece" else "bpe"
      println(f"$mode budget=$budget batch=$batch merges=$n wall=$dt%.1fs")
    }
    spark.stop()
  }
}
