package graft.pipelines

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.queries.{CurationQ, GraphQ, TextQ}

/** The curation stages composed END-TO-END — the path a corpus actually
  * takes from raw crawl to training-ready rows, wired from the operators
  * the oracle gate pins individually:
  *
  *   1. quality gate   — [[CurationQ.curationVerdict]] (PII redaction,
  *      token/stopword/repetition thresholds, reason bitmask)
  *   2. near-dup dedup — [[GraphQ.canonicalByCentrality]] over the
  *      MinHash-LSH candidate graph: each mirror family keeps its
  *      highest-centrality member
  *   3. mixture        — [[CurationQ.temperatureRebalance]] (α = 1/2
  *      smoothing over a stratum column)
  *   4. split          — [[TextQ.leakageSafeSplit]] (cluster-atomic, so
  *      near-dups never straddle train/eval)
  *
  * Each stage consumes only the previous stage's SURVIVORS, which is the
  * order that matters at 100 TB: the quality gate is a codegen'd scan
  * that cheaply shrinks the corpus before the (more expensive) candidate
  * join, and dedup runs before mixture weights so duplicate families
  * can't inflate a stratum's measured share. Stage costs and scale
  * shapes are each documented at the operator.
  *
  * Returns (doc_id, stratum, split, keep_reason_bitmask) for every INPUT
  * doc: survivors carry their split assignment, rejected docs carry the
  * stage that cut them — the per-doc lineage a data card needs.
  */
object CurationPipeline {

  /** Rejection stages, as a small integer (0 = survived). */
  val KeptCode = 0L
  val CutByQuality = 1L
  val CutAsDuplicate = 2L
  val CutByMixture = 3L
  val CutByBalance = 4L

  /** @param jointBalanceCol optional SECOND stratum column: when set, a
    *   joint-balance stage runs after the mixture — IPF raking
    *   ([[CurationQ.rakeWeights]]) over (strataCol, jointBalanceCol)
    *   computes per-cell ppm weights whose BOTH margins approach uniform,
    *   and [[CurationQ.repeatByCellWeights]] resamples each cell by its
    *   weight (⌊w⌋ copies + hash-chosen remainder). Down-weighted cells
    *   can drop docs (cut_stage = [[CutByBalance]]); survivors carry
    *   `n_copies` (1 when the stage is off). The split then runs on the
    *   balanced survivors so eval mixtures match train mixtures.
    * @param rakeRounds IPF rounds for the balance stage (each round is
    *   two cell-table-sized window passes — corpus-size-independent). */
  def run(docs: DataFrame, strataCol: String = "lang",
      reliable: Boolean = false,
      jointBalanceCol: Option[String] = None,
      rakeRounds: Int = 6): DataFrame = {
    // Every stage output below has TWO consumers — the next stage and
    // the final lineage join — so each is materialized once (lineage
    // cut: `localCheckpoint`, or durable `checkpoint` with `reliable`,
    // the operator convention). Without the cuts the lineage join
    // re-executed the whole upstream chain per consumer — including
    // curationVerdict's corpus-sized shingle explode, ~4-5 extra corpus
    // scans in one action (the q143 nbConfusion lesson: its probe
    // measured 5 scans / 5.6x wall before its checkpoint, ~2x after).
    def snap(df: DataFrame): DataFrame =
      if (reliable) df.checkpoint() else df.localCheckpoint()

    // 1. quality verdict over the full input
    val verdict = snap(CurationQ.curationVerdict(docs)
      .select(col("doc_id"), col("keep")))
    val afterQuality = snap(docs.join(verdict, Seq("doc_id"))
      .filter(col("keep") === 1L).drop("keep"))

    // 2. canonical selection over the quality survivors' candidate graph
    val canon = GraphQ.canonicalByCentrality(
      TextQ.lshCandidates(TextQ.minhashBands(afterQuality))
        .filter(col("est_jaccard") >= 0.25))
      .select(col("doc_id"), col("is_canonical"))
    // docs with no candidate edge are their own canonical
    val afterDedup = snap(afterQuality.join(canon, Seq("doc_id"), "left")
      .filter(coalesce(col("is_canonical"), lit(true)))
      .drop("is_canonical"))

    // 3. temperature mixture over the deduplicated corpus
    val afterMix = snap(CurationQ.temperatureRebalance(afterDedup, strataCol))

    // 3b. optional joint balance: rake (strataCol × jointBalanceCol) to
    // uniform margins, then per-cell repetition. n_copies is recorded per
    // doc (max copy index = exact emitted count); cells raked below 1
    // can cut docs entirely. Both rake and the copy collapse are snapped:
    // each feeds the next stage AND the lineage join.
    val afterBalance = jointBalanceCol match {
      case None => afterMix.withColumn("n_copies", lit(1L))
      case Some(bCol) =>
        val weights = CurationQ.rakeWeights(afterMix, strataCol, bCol,
          rounds = rakeRounds, reliable = reliable)
        val copies = snap(CurationQ.repeatByCellWeights(afterMix,
            strataCol, bCol, weights)
          .groupBy(col("doc_id")).agg(max(col("copy")).as("n_copies")))
        snap(afterMix.join(copies, Seq("doc_id")))
    }

    // 4. cluster-atomic split over the final survivors
    val split = TextQ.leakageSafeSplit(afterBalance)
      .select(col("doc_id"), col("split"))

    // lineage: LEFT joins back onto the input, first cut wins
    docs.select(col("doc_id"), col(strataCol).as("stratum"))
      .join(verdict.withColumnRenamed("keep", "q_keep"), Seq("doc_id"), "left")
      .join(afterDedup.select(col("doc_id"), lit(1L).as("d_keep")),
        Seq("doc_id"), "left")
      .join(afterMix.select(col("doc_id"), lit(1L).as("m_keep")),
        Seq("doc_id"), "left")
      .join(afterBalance.select(col("doc_id"), col("n_copies")),
        Seq("doc_id"), "left")
      .join(split, Seq("doc_id"), "left")
      .select(col("doc_id"), col("stratum"), col("split"),
        when(col("q_keep") =!= 1L, lit(CutByQuality))
          .when(col("d_keep").isNull, lit(CutAsDuplicate))
          .when(col("m_keep").isNull, lit(CutByMixture))
          .when(col("n_copies").isNull, lit(CutByBalance))
          .otherwise(lit(KeptCode)).as("cut_stage"),
        col("n_copies"))
  }
}
