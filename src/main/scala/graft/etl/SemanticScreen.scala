package graft.etl

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.queries.VectorQ

/** Live semantic-decontamination screen: every micro-batch of incoming
  * eval/benchmark vectors is checked against a STATIC training corpus
  * before it is accepted — the streaming lift of
  * [[graft.queries.VectorQ.semanticDecontamination]], the same shape as
  * [[IncrementalDedup.sink]]'s lexical screen but over embeddings, so a
  * paraphrased leak that defeats the MinHash store is still caught.
  *
  * The train side is the big, FIXED side here (opposite of the dedup
  * store, which grows): it is cached on first use and only its map-side
  * norm/bucket derivation re-runs per batch, while the micro-batch is the
  * broadcast-sized query side. Verdicts land partitioned by `batch_id`
  * with dynamic overwrite — a retried batch replaces exactly its own
  * partition (the repo-wide idempotent-sink convention), and an
  * uncontaminated batch writes an empty partition, which downstream reads
  * as "screened and clean", distinct from "never screened".
  */
object SemanticScreen {

  /** foreachBatch sink: flagged (eval_id, train_id, cosine) per batch. */
  def sink(train: DataFrame, verdictsPath: String, bits: Int = 3,
      probeHamming: Int = 1, threshold: Double = 0.9): (DataFrame, Long) => Unit = {
    val corpus = train.cache()
    (batch, batchId) => {
      val q = batch.select(col("vec_id").as("query_id"), col("embedding"))
      VectorQ.semanticDecontamination(corpus, q, bits, probeHamming, threshold)
        .withColumn("batch_id", lit(batchId))
        .write.partitionBy("batch_id")
        .option("partitionOverwriteMode", "dynamic")
        .mode("overwrite").parquet(verdictsPath)
    }
  }
}
