package graft.etl

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.functions.VectorFunctions.{vec_dot, vec_norm2}
import graft.queries.VectorQ

/** Incremental similarity search for an append-only embedding corpus —
  * the vector twin of [[IncrementalDedup]]: re-running full-corpus ANN
  * per arriving batch is quadratic in corpus size over time, so the
  * corpus keeps a BUCKET-INDEXED VECTOR STORE (sign-bucket id + norm
  * carried per row — the norm is computed once at append time, never
  * re-derived), and a delta batch finds its neighbors against all of
  * history by joining its bucket rows against the store: candidates
  * share a sign bucket, so work is proportional to bucket collisions,
  * never to corpus size.
  *
  * Store layout is parquet partitioned by `batch_id` (bootstrap slices
  * land in `batch_id=-1`), the [[IncrementalDedup]] convention: the
  * partition column is what makes the streaming path idempotent — a
  * retried micro-batch OVERWRITES its own partition, and the delta read
  * excludes the retried batch's half-written partition so a retry can
  * never self-match. At real scale, additionally bucket the store
  * files by `bucket` so the delta join shuffles only the (small) delta
  * side.
  *
  * The `bits` knob is the [[VectorQ.signBucket]] contract: choose
  * `bits ≈ log2(corpus / targetBucketSize)` and REBUILD the store when
  * the corpus outgrows it (the store is derived data — a rebuild is one
  * scan of the embeddings, not of any raw text).
  */
object IncrementalAnn {

  private def indexRows(vecs: DataFrame, bits: Int): DataFrame =
    vecs.select(col("vec_id"), col("embedding"))
      .withColumn("nrm", vec_norm2(col("embedding")))
      .withColumn("bucket", VectorQ.signBucket(col("embedding"), bits))
      // the store records the bits it was built with (a constant column
      // — RLE-encodes to nothing in parquet) so every later reader can
      // verify it queries with the SAME bucketing; a silent mismatch
      // would miss neighbors across all of history with no error
      .withColumn("bits", lit(bits))

  /** The `bits` the store was built with, validated single-valued.
    * Stores written before the bits column existed return None (the
    * caller's `bits` argument is trusted, pre-round-9 behavior). The
    * distinct aggregate scans one RLE'd int column — metadata-cheap. */
  def storedBits(store: DataFrame): Option[Int] = {
    if (!store.columns.contains("bits")) None
    else {
      val vs = store.select(col("bits").cast(IntegerType))
        .distinct().limit(3).collect().map(_.getInt(0)).sorted
      require(vs.length <= 1,
        s"IncrementalAnn: store holds MIXED bits values ${vs.mkString(",")}" +
          " — appends used inconsistent bucketing; rebuild(newBits) it")
      vs.headOption
    }
  }

  private def requireBits(store: DataFrame, bits: Int): Unit =
    storedBits(store).foreach { b =>
      require(b == bits,
        s"IncrementalAnn: store was built with bits=$b but the call " +
          s"passed bits=$bits — buckets would silently mismatch and " +
          "miss neighbors; pass bits=" + b + " or rebuild(newBits)")
    }

  /** Build (or rebuild) the bucket-indexed store from a corpus slice. */
  def initStore(vecs: DataFrame, storePath: String, bits: Int = 3): Unit =
    indexRows(vecs, bits).withColumn("batch_id", lit(-1L))
      .write.partitionBy("batch_id").mode("overwrite").parquet(storePath)

  /** Add a new batch's index rows to the store (call AFTER
    * [[deltaNeighbors]] so the batch does not match itself). Fails
    * loudly if `bits` disagrees with what the store was built with. */
  def append(newVecs: DataFrame, storePath: String, batchId: Long = -1L,
      bits: Int = 3): Unit = {
    val spark = newVecs.sparkSession
    val fs = new org.apache.hadoop.fs.Path(storePath)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(new org.apache.hadoop.fs.Path(storePath)))
      requireBits(spark.read.parquet(storePath), bits)
    indexRows(newVecs, bits).withColumn("batch_id", lit(batchId))
      .write.partitionBy("batch_id").mode("append").parquet(storePath)
  }

  /** Re-bucket the whole store at `newBits` — the documented upgrade
    * path when the corpus outgrows its bucket width (`bits ≈
    * log2(corpus/targetBucketSize)`). One scan of the store (vectors and
    * norms are reused; only `bucket`/`bits` are recomputed), written to
    * a sibling temp dir and atomically swapped in. IDEMPOTENT across
    * crashes: re-running after ANY failure point completes the rebuild —
    * the temp dir is only trusted once its `_SUCCESS` marker exists, and
    * the final swap (rename) is re-entered if a previous run deleted the
    * old store but died before the rename landed. */
  def rebuild(spark: SparkSession, storePath: String, newBits: Int): Unit = {
    val hadoop = spark.sparkContext.hadoopConfiguration
    val dst = new org.apache.hadoop.fs.Path(storePath)
    val tmp = new org.apache.hadoop.fs.Path(storePath + ".rebuild.tmp")
    val fs = dst.getFileSystem(hadoop)
    val tmpComplete = fs.exists(tmp) &&
      fs.exists(new org.apache.hadoop.fs.Path(tmp, "_SUCCESS"))
    if (!tmpComplete) {
      require(fs.exists(dst),
        s"IncrementalAnn.rebuild: no store at $storePath and no completed " +
          "rebuild temp — nothing to rebuild from")
      spark.read.parquet(storePath)
        .select(col("vec_id"), col("embedding"), col("nrm"),
          col("batch_id"))
        .withColumn("bucket", VectorQ.signBucket(col("embedding"), newBits))
        .withColumn("bits", lit(newBits))
        .write.partitionBy("batch_id").mode("overwrite")
        .parquet(tmp.toString)
    }
    // swap: from here on the temp is complete (this run's write or a
    // prior crashed run's) — delete-then-rename, each step re-entrant
    if (fs.exists(dst)) fs.delete(dst, true)
    require(fs.rename(tmp, dst),
      s"IncrementalAnn.rebuild: rename $tmp -> $dst failed; re-run " +
        "rebuild to complete the swap (the completed temp is kept)")
  }

  /** Top-k cosine neighbors of `newVecs` against everything in the
    * store: (new_id, corpus_id, cosine, rank), cosine ≥ `minCos`,
    * compared AFTER the 6-dp round (engine-exact, the q230 discipline).
    * Buckets held by more than `maxBucketSize` store rows are excluded
    * (the [[IncrementalDedup.dedupDelta]] hot-bucket guard: an
    * aggregate + broadcast anti-join, never a window — the store itself
    * never shuffles, keeping delta cost ∝ collisions); report such
    * buckets and raise `bits` rather than paying one hot reducer. */
  def deltaNeighbors(newVecs: DataFrame, store: DataFrame, bits: Int = 3,
      k: Int = 3, minCos: Double = -1.0, maxBucketSize: Int = 100000)
      : DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    require(maxBucketSize >= 1,
      s"maxBucketSize must be >= 1, got $maxBucketSize")
    requireBits(store, bits)
    deltaNeighborsFrom(indexRows(newVecs, bits), store, k, minCos,
      maxBucketSize)
  }

  /** [[deltaNeighbors]] over PRE-BUILT delta index rows — the [[sink]]
    * seam (round-15): the micro-batch's norm+bucket pass is computed
    * once and shared with the store append. Callers have already
    * checked `requireBits`. */
  private def deltaNeighborsFrom(newIdx: DataFrame, store: DataFrame,
      k: Int, minCos: Double, maxBucketSize: Int): DataFrame = {
    val hot = store.groupBy(col("bucket"))
      .agg(count(lit(1)).as("n")).filter(col("n") > maxBucketSize)
      .select(col("bucket"))
    val s = store.join(broadcast(hot), Seq("bucket"), "left_anti")
    val d = newIdx
      .select(col("vec_id").as("new_id"), col("embedding").as("qe"),
        col("nrm").as("qn"), col("bucket"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("new_id"))
      .orderBy(col("cosine").desc, col("corpus_id"))
    d.join(s.select(col("bucket"), col("vec_id").as("corpus_id"),
        col("embedding"), col("nrm")), Seq("bucket"))
      .withColumn("cosine",
        round(vec_dot(col("qe"), col("embedding")) /
          (sqrt(col("qn")) * sqrt(col("nrm"))), 6))
      .filter(col("cosine") >= minCos)
      .withColumn("rank", row_number().over(w).cast(LongType))
      .filter(col("rank") <= k)
      .select(col("new_id"), col("corpus_id"), col("cosine"), col("rank"))
  }

  /** [[deltaNeighbors]] reading the store from disk. */
  def deltaNeighbors(spark: SparkSession, newVecs: DataFrame,
      storePath: String, bits: Int, k: Int): DataFrame =
    deltaNeighbors(newVecs, spark.read.parquet(storePath), bits, k)

  private val neighborSchema = StructType(Seq(
    StructField("new_id", LongType), StructField("corpus_id", LongType),
    StructField("cosine", DoubleType), StructField("rank", LongType)))

  /** Streaming composition, the [[IncrementalDedup.sink]] pattern: per
    * micro-batch of (vec_id, embedding) rows, (1) write the batch's
    * top-k neighbors against ALL corpus history into `neighborsPath`
    * and (2) append the batch's index rows to the store — both under
    * `batch_id=<id>` dynamic-overwrite partitions, so a retried batch
    * replaces its own output and the store read excludes the retried
    * batch's half-written partition (a retry can never self-match). */
  def sink(spark: SparkSession, storePath: String, neighborsPath: String,
      bits: Int = 3, k: Int = 3): (DataFrame, Long) => Unit =
    (batch, batchId) => {
      val fs = new org.apache.hadoop.fs.Path(storePath)
        .getFileSystem(spark.sparkContext.hadoopConfiguration)
      val hasHistory = fs.exists(new org.apache.hadoop.fs.Path(storePath))
      // round-15: ONE norm+bucket pass per micro-batch (lazy
      // checkpoint), shared by the neighbor derivation and the append
      val newIdx = indexRows(batch, bits).localCheckpoint(false)
      val out =
        if (hasHistory) {
          val store = spark.read.parquet(storePath)
            .filter(col("batch_id") =!= batchId)
          requireBits(store, bits)
          deltaNeighborsFrom(newIdx, store, k, minCos = -1.0,
            maxBucketSize = 100000)
        } else
          // under dynamic partition overwrite an empty DF touches no
          // partition at all — batch 0 leaves the neighbors path without
          // data files (the IncrementalDedup.sink convention; readers
          // arrive after history exists)
          spark.createDataFrame(
            spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
            neighborSchema)
      out.withColumn("batch_id", lit(batchId))
        .write.partitionBy("batch_id")
        .option("partitionOverwriteMode", "dynamic")
        .mode("overwrite").parquet(neighborsPath)
      newIdx.withColumn("batch_id", lit(batchId))
        .write.partitionBy("batch_id")
        .option("partitionOverwriteMode", "dynamic")
        .mode("overwrite").parquet(storePath)
    }
}
