package graft.etl

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.functions.VectorFunctions.{vec_dot, vec_norm2}
import graft.queries.VectorQ

/** Incremental SEMANTIC dedup for an append-only embedding corpus — the
  * embedding sibling of [[IncrementalDedup]] (MinHash) and
  * [[IncrementalSpanDedup]] (spans), closing the family: batch
  * `semDedup` (q76) re-clusters the whole corpus per run, so a delta
  * wave could not ask "is this embedding a near-dup of ANYTHING in
  * history" without quadratic-over-time work. Here the corpus keeps a
  * CELL-INDEXED member store under FIXED centroids, and a delta batch
  * answers against all of history at cell-collision cost:
  *
  *  - `cells/` — the centroids, fixed at [[initStore]] (the semDedup
  *    seed rule: the bootstrap's lowest `cells` vec_ids; swap in
  *    [[VectorQ.kmeansCentroids]] for trained cells). Centroids are a
  *    MODELING choice: all batches must assign under the same cells or
  *    near-dups across batches land in different cells and are missed —
  *    so a missing cells dir fails loudly, and re-clustering is an
  *    explicit store rebuild (the [[IncrementalAnn]] `bits` contract);
  *  - `members/batch_id=N/` — (vec_id, embedding, nrm, cluster,
  *    dist_sq) per corpus vector, partitioned by the arrival batch (the
  *    idempotence key: a retried micro-batch overwrites its own
  *    partition and the delta read excludes it, so a retry never
  *    self-matches).
  *
  * The delta emits PAIRS, not verdicts ([[IncrementalDedup]]'s
  * contract): every same-cell pair at cosine ≥ τ between the delta and
  * history PLUS within the delta, carrying both members' centroid
  * distances. Verdicts are a pure fold over the accumulated pairs
  * ([[verdicts]]): because the keep policy ("farthest from the centroid
  * survives, ties to the lowest id") is decidable from a pair's two
  * (dist_sq, id) tuples, the derived census is EXACTLY the batch
  * `semDedup` census on the union whenever the store's centroids equal
  * the union's — proven cross-engine by the q289 card and by
  * IncrementalSemDedupSpec. History is never re-read beyond its cell
  * collisions and never re-clustered.
  *
  * Scale: the only join is a cluster equi-join that hash-partitions
  * cleanly; cells follow the √n rule, so per-cell pair work is bounded;
  * cells held by more than `maxCellSize` HISTORY members are excluded
  * by the [[IncrementalDedup.dedupDelta]] hot-bucket guard (aggregate +
  * broadcast anti-join — the store itself never shuffles), trading
  * completeness for boundedness exactly like the ANN store: raise
  * `cells` (rebuild) rather than paying one hot reducer. The 100 TB
  * column plan is LANDED as an opt-in: `initStore(storeQv = true)`
  * fixes the q55 int8 `qv` column family on the member store (append/
  * sink/rebuild follow the store schema), and
  * `deltaPairs(qvMargin = m)` gates each candidate pair on the cheap
  * integer qv cosine before the exact float cosine — identical
  * verdicts whenever the margin covers the quantization error
  * (spec-pinned at 0.1 on the fixture). Dropping the float embedding
  * entirely is the final step of that plan and stays out: the
  * exact-cosine column keeps the oracle-exact contract the cards pin.
  */
object IncrementalSemDedup {

  private def cellsPath(store: String) = s"$store/cells"
  private def membersPath(store: String) = s"$store/members"

  private def withNorm(raw: DataFrame): DataFrame =
    raw.select(col("vec_id"), col("embedding"))
      .withColumn("nrm", vec_norm2(col("embedding")))

  /** Symmetric per-vector int8 quantization of `embCol` into `out`
    * (the [[VectorQ.quantizeInt8]] recipe: round(x·127/max_abs),
    * floor(x+0.5) rounding) — the optional member-store column behind
    * the 100 TB plan named in the class doc: 1-byte components, integer
    * dot products, 4× less store/shuffle footprint than the float
    * embedding on the candidate path. */
  private def withQv(df: DataFrame, embCol: String, out: String)
      : DataFrame = df
    .withColumn("__mx", expr(
      s"array_max(transform($embCol, x -> abs(CAST(x AS DOUBLE))))"))
    .withColumn(out, expr(
      s"""CASE WHEN __mx = 0
            THEN transform($embCol, x -> CAST(0 AS BIGINT))
          ELSE transform($embCol, x ->
            CAST(floor(CAST(x AS DOUBLE) * 127.0 / __mx + 0.5) AS BIGINT))
          END"""))
    .drop("__mx")

  private def cosine(qe: org.apache.spark.sql.Column,
      qn: org.apache.spark.sql.Column, e: org.apache.spark.sql.Column,
      n: org.apache.spark.sql.Column) =
    round(vec_dot(qe, e) / (sqrt(qn) * sqrt(n)), 6)

  /** Member-store schema (what [[deltaPairs]] reads back). */
  private[graft] val memberSchema: StructType = StructType(Seq(
    StructField("vec_id", LongType),
    StructField("embedding", ArrayType(FloatType)),
    StructField("nrm", DoubleType),
    StructField("cluster", LongType),
    StructField("dist_sq", DoubleType),
    StructField("batch_id", LongType)))

  /** Build (or rebuild) the store from a bootstrap corpus slice: fix
    * the centroids (semDedup's seed rule) and index every bootstrap
    * vector under `batch_id=-1`. When `pairsPath` is given, the
    * bootstrap's own intra pairs are seeded there under the same
    * batch id — without them the derived census would silently treat
    * the bootstrap as already-deduped (only give a pairs store when the
    * bootstrap really is raw; a pre-deduped bootstrap seeds none). */
  def initStore(vecs: DataFrame, storePath: String, cells: Int = 4,
      pairsPath: Option[String] = None, threshold: Double = 0.2,
      maxCellSize: Int = 100000, storeQv: Boolean = false): Unit = {
    require(cells >= 1, s"cells must be >= 1, got $cells")
    val spark = vecs.sparkSession
    val v = withNorm(vecs)
    val seeds = v.orderBy(col("vec_id")).limit(cells)
      .select(col("vec_id").as("cluster"),
        expr("transform(embedding, x -> CAST(x AS DOUBLE))").as("centroid"))
    seeds.coalesce(1).write.mode("overwrite").parquet(cellsPath(storePath))
    // storeQv fixes the store's COLUMN FAMILY at init (append/sink/
    // rebuild follow the store schema from here on — a per-call flag
    // could silently mix partitions with and without the column)
    // round-15: ONE assignment pass feeds both the member write and the
    // bootstrap pair seed (lazy checkpoint — the member write
    // materializes it, the pair derivation re-reads the cached blocks
    // instead of re-running nearest-cell over the bootstrap)
    val asg0 = VectorQ.assignToCentroids(v, seeds).localCheckpoint(false)
    val asg = if (storeQv) withQv(asg0, "embedding", "qv") else asg0
    asg.withColumn("batch_id", lit(-1L))
      .write.partitionBy("batch_id").mode("overwrite")
      .parquet(membersPath(storePath))
    pairsPath.foreach { pp =>
      val empty = spark.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], memberSchema)
      deltaPairsAssigned(asg0, empty, threshold, maxCellSize)
        .withColumn("batch_id", lit(-1L))
        .write.partitionBy("batch_id").mode("overwrite").parquet(pp)
    }
  }

  /** Does the member store carry the int8 `qv` column family? */
  private def storeHasQv(spark: SparkSession, storePath: String): Boolean = {
    val mp = new org.apache.hadoop.fs.Path(membersPath(storePath))
    val fs = mp.getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.exists(mp) &&
      scala.util.Try(spark.read.parquet(membersPath(storePath))
        .columns.contains("qv")).getOrElse(false)
  }

  /** Add a new batch's member rows (call AFTER [[deltaPairs]] so the
    * batch does not match itself through the store). The batch follows
    * the store's column family — qv is written iff [[initStore]] fixed
    * it (mixed partitions would silently drop the column on read). */
  def append(newVecs: DataFrame, storePath: String, batchId: Long): Unit = {
    val spark = newVecs.sparkSession
    val asg0 = VectorQ.assignToCentroids(withNorm(newVecs),
      readCells(spark, storePath))
    val asg = if (storeHasQv(spark, storePath))
      withQv(asg0, "embedding", "qv") else asg0
    asg.withColumn("batch_id", lit(batchId))
      .write.partitionBy("batch_id").mode("append")
      .parquet(membersPath(storePath))
  }

  /** Re-cluster the WHOLE store at `newCells` centroids — the mechanical
    * lever behind the √n contract (`cells ≈ √corpus`; the 10× probe
    * shows why: at fixed cells, per-cell pair work grows with n²/cells).
    * Centroids re-seed from the store's lowest `newCells` ids (pass
    * `centroids` to use trained cells instead); one scan of the members
    * (embeddings and norms reused, only cluster/dist reassigned),
    * written to a sibling temp and atomically swapped — IDEMPOTENT
    * across crashes, the [[IncrementalAnn.rebuild]] discipline: the
    * temp is only trusted once its `_REBUILT` marker exists and the
    * final swap re-enters.
    *
    * Accumulated PAIRS stay VALID after a rebuild (cosine does not
    * depend on the cells) but are possibly INCOMPLETE w.r.t. the new
    * cells: a pair the OLD cells separated was never emitted and stays
    * missing — the same semantics as any LSH parameter change. Rebuild
    * widens recall from here on; re-deriving history's missing pairs is
    * a batch `semDedup` run, not a store operation. */
  def rebuild(spark: SparkSession, storePath: String, newCells: Int,
      centroids: Option[DataFrame] = None): Unit = {
    require(newCells >= 1, s"newCells must be >= 1, got $newCells")
    val hadoop = spark.sparkContext.hadoopConfiguration
    val dst = new org.apache.hadoop.fs.Path(storePath)
    val tmp = new org.apache.hadoop.fs.Path(storePath + ".rebuild.tmp")
    val fs = dst.getFileSystem(hadoop)
    // the WHOLE store (cells + members) swaps as one unit under one
    // completion marker — swapping the two dirs separately would have a
    // crash window holding new cells beside old members (or a deleted
    // members dir with its replacement stranded in the temp)
    val marker = new org.apache.hadoop.fs.Path(tmp, "_REBUILT")
    if (!fs.exists(marker)) {
      require(fs.exists(new org.apache.hadoop.fs.Path(
          membersPath(storePath))),
        s"IncrementalSemDedup.rebuild: no member store at $storePath " +
          "and no completed rebuild temp — nothing to rebuild from")
      val raw = spark.read.parquet(membersPath(storePath))
      val hasQv = raw.columns.contains("qv") // carry the column family
      val members = raw.select(Seq(col("vec_id"), col("embedding"),
        col("nrm"), col("batch_id")) ++
        (if (hasQv) Seq(col("qv")) else Nil): _*)
      val seeds = centroids.getOrElse(
        members.orderBy(col("vec_id")).limit(newCells)
          .select(col("vec_id").as("cluster"),
            expr("transform(embedding, x -> CAST(x AS DOUBLE))")
              .as("centroid")))
      seeds.coalesce(1).write.mode(SaveMode.Overwrite)
        .parquet(s"$tmp/cells")
      VectorQ.assignToCentroids(members, seeds)
        .join(members.select(Seq(col("vec_id"), col("batch_id")) ++
          (if (hasQv) Seq(col("qv")) else Nil): _*), Seq("vec_id"))
        .write.partitionBy("batch_id").mode(SaveMode.Overwrite)
        .parquet(s"$tmp/members")
      fs.create(marker, true).close()
    }
    // swap: from here on the temp is complete (this run's write or a
    // prior crashed run's) — delete-then-rename, each step re-entrant
    if (fs.exists(dst)) fs.delete(dst, true)
    require(fs.rename(tmp, dst),
      s"IncrementalSemDedup.rebuild: rename $tmp -> $dst failed; re-run " +
        "rebuild to complete the swap (the completed temp is kept)")
    // the marker is temp-state, not store-state
    fs.delete(new org.apache.hadoop.fs.Path(dst, "_REBUILT"), false)
  }

  private def readCells(spark: SparkSession, storePath: String): DataFrame = {
    val p = new org.apache.hadoop.fs.Path(cellsPath(storePath))
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    require(fs.exists(p),
      s"IncrementalSemDedup: no centroids at ${cellsPath(storePath)} — " +
        "run initStore first; assigning under ad-hoc cells would " +
        "silently miss every cross-batch near-dup")
    spark.read.parquet(cellsPath(storePath))
  }

  /** Semantic near-dup PAIRS of `newVecs` against the given member
    * history AND within itself: one row per same-cell pair at cosine ≥
    * `threshold`, as `(lo_id, hi_id, cluster, cosine, lo_dist, hi_dist)`
    * with `lo_id < hi_id` canonical orientation — everything
    * [[verdicts]] needs to replay the semDedup keep policy.
    *
    * `qvMargin ≥ 0` turns on the int8 PREFILTER (the class doc's 100 TB
    * column plan): each candidate pair first takes the cheap integer
    * cosine over the quantized `qv` vectors and is discarded when it
    * reads below `threshold − qvMargin`; only survivors pay the exact
    * float cosine. The margin absorbs quantization error — measure it
    * on the corpus geometry (the 64-dim fixture's max |cos₈ − cos| is
    * 0.006, so the spec's 0.1 margin carries 16× headroom; the loose
    * analytic bound ~2√d/127 overstates it) — and pairs whose qv is
    * degenerate (a zero vector) always pass through to the exact check,
    * so the filter can only drop pairs it can price. History members
    * that already CARRY a `qv` column (a store written with
    * `storeQv = true`) are used as-is; otherwise qv is derived on the
    * fly from the float embedding. The emitted pairs are EXACT-cosine
    * either way — the prefilter changes cost, never the contract,
    * whenever the margin covers the true quantization error. */
  def deltaPairs(newVecs: DataFrame, cells: DataFrame, members: DataFrame,
      threshold: Double = 0.2, maxCellSize: Int = 100000,
      qvMargin: Double = -1.0): DataFrame = {
    require(maxCellSize >= 1, s"maxCellSize must be >= 1, got $maxCellSize")
    deltaPairsAssigned(
      VectorQ.assignToCentroids(withNorm(newVecs), cells)
        .localCheckpoint(false),
      members, threshold, maxCellSize, qvMargin)
  }

  /** [[deltaPairs]] over a PRE-ASSIGNED delta (vec_id, embedding, nrm,
    * cluster, dist_sq) — the seam that lets [[initStore]]/[[sink]] share
    * ONE nearest-cell assignment between the pair derivation and the
    * member append instead of computing it twice per batch (round-15).
    * The input is referenced by both sides of the intra-batch pair
    * enumeration plus the history cross side, so callers pass it
    * lazily checkpointed (one assignment pass, materialized inside the
    * consumer's own job). */
  private[etl] def deltaPairsAssigned(assigned0: DataFrame,
      members: DataFrame, threshold: Double = 0.2,
      maxCellSize: Int = 100000, qvMargin: Double = -1.0): DataFrame = {
    require(maxCellSize >= 1, s"maxCellSize must be >= 1, got $maxCellSize")
    val pre = qvMargin >= 0.0
    val assigned = if (pre) withQv(assigned0, "embedding", "qv")
      else assigned0
    val hot = members.groupBy(col("cluster"))
      .agg(count(lit(1)).as("n")).filter(col("n") > maxCellSize)
      .select(col("cluster"))
    val members1 =
      if (!pre) members
      else if (members.columns.contains("qv")) members
      else withQv(members, "embedding", "qv")
    val histCols = Seq(col("cluster"), col("vec_id").as("b_id"),
      col("embedding").as("b_emb"), col("nrm").as("b_nrm"),
      col("dist_sq").as("b_dist")) ++
      (if (pre) Seq(col("qv").as("b_qv")) else Nil)
    val hist = members1.join(broadcast(hot), Seq("cluster"), "left_anti")
      .select(histCols: _*)
    val aCols = Seq(col("cluster"), col("vec_id").as("a_id"),
      col("embedding").as("a_emb"), col("nrm").as("a_nrm"),
      col("dist_sq").as("a_dist")) ++
      (if (pre) Seq(col("qv").as("a_qv")) else Nil)
    val a = assigned.select(aCols: _*)
    val cross = a.join(hist, Seq("cluster"))
    val intraCols = Seq(col("cluster"), col("a_id").as("b_id"),
      col("a_emb").as("b_emb"), col("a_nrm").as("b_nrm"),
      col("a_dist").as("b_dist")) ++
      (if (pre) Seq(col("a_qv").as("b_qv")) else Nil)
    val intra = a.join(a.select(intraCols: _*), Seq("cluster"))
      .filter(col("a_id") < col("b_id"))
    val cand0 = cross.union(intra)
    val cand = if (!pre) cand0 else {
      // the int8 gate: drop only pairs whose quantized cosine sits
      // below threshold − margin AND whose qv norms are both nonzero
      // (a zero qv prices nothing — pass it to the exact check)
      val qn = (c: String) =>
        expr(s"aggregate($c, CAST(0 AS BIGINT), (acc, x) -> acc + x * x)")
      cand0
        .withColumn("__d8", graft.functions.VectorFunctions
          .vec_dot_long(col("a_qv"), col("b_qv")))
        .withColumn("__na8", qn("a_qv"))
        .withColumn("__nb8", qn("b_qv"))
        .filter(col("__na8") === 0L || col("__nb8") === 0L ||
          col("__d8").cast("double") >=
            lit(threshold - qvMargin) *
              sqrt(col("__na8").cast("double")) *
              sqrt(col("__nb8").cast("double")))
    }
    cand
      .withColumn("cosine",
        cosine(col("a_emb"), col("a_nrm"), col("b_emb"), col("b_nrm")))
      .filter(col("cosine") >= threshold)
      .select(
        least(col("a_id"), col("b_id")).as("lo_id"),
        greatest(col("a_id"), col("b_id")).as("hi_id"),
        col("cluster"), col("cosine"),
        when(col("a_id") < col("b_id"), col("a_dist"))
          .otherwise(col("b_dist")).as("lo_dist"),
        when(col("a_id") < col("b_id"), col("b_dist"))
          .otherwise(col("a_dist")).as("hi_dist"))
  }

  /** The keep census derived from members + accumulated pairs — one
    * row per corpus vector `(vec_id, cluster, dist_sq, keep)`, EXACTLY
    * the batch [[VectorQ.semDedup]] census on the union (same
    * centroids): a vector is dropped iff some τ-neighbor in its cell
    * beats it on the keep policy (farther from the centroid, ties to
    * the lower id) — decidable per pair, so the fold is pair-grain. */
  def verdicts(members: DataFrame, pairs: DataFrame): DataFrame = {
    // drop rule per pair, lo_id < hi_id canonical: lo is dropped only
    // when hi sits strictly farther out (a distance tie keeps the LOWER
    // id, which lo is); hi is dropped when lo sits farther OR ties
    val dropped = pairs.filter(col("hi_dist") > col("lo_dist"))
      .select(col("lo_id").as("__d"))
      .union(pairs.filter(col("lo_dist") >= col("hi_dist"))
        .select(col("hi_id").as("__d")))
      .distinct()
    members.select(col("vec_id"), col("cluster"), col("dist_sq"))
      .join(dropped.withColumn("__dup", lit(true)),
        col("vec_id") === col("__d"), "left")
      .withColumn("keep", col("__dup").isNull)
      .select(col("vec_id"), col("cluster"), col("dist_sq"), col("keep"))
  }

  private val pairSchema: StructType = StructType(Seq(
    StructField("lo_id", LongType), StructField("hi_id", LongType),
    StructField("cluster", LongType), StructField("cosine", DoubleType),
    StructField("lo_dist", DoubleType), StructField("hi_dist", DoubleType)))

  /** Streaming composition, the [[IncrementalDedup.sink]] pattern: per
    * micro-batch of (vec_id, embedding) rows, (1) write the batch's
    * near-dup pairs against ALL history (and within itself) into
    * `pairsPath` and (2) append the batch's member rows — both under
    * `batch_id=<id>` dynamic-overwrite partitions, and the member read
    * excludes the retried batch's half-written partition, so a retry
    * replaces its own output and can never self-match. The store must
    * be [[initStore]]'d first (fixed centroids — fails loudly). */
  def sink(spark: SparkSession, storePath: String, pairsPath: String,
      threshold: Double = 0.2, maxCellSize: Int = 100000,
      qvMargin: Double = -1.0): (DataFrame, Long) => Unit =
    (batch, batchId) => {
      val cells = readCells(spark, storePath)
      val mp = new org.apache.hadoop.fs.Path(membersPath(storePath))
      val fs = mp.getFileSystem(spark.sparkContext.hadoopConfiguration)
      val members =
        if (fs.exists(mp))
          spark.read.parquet(membersPath(storePath))
            .filter(col("batch_id") =!= batchId)
        else
          spark.createDataFrame(
            spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
            memberSchema)
      // round-15: ONE nearest-cell assignment per micro-batch, shared by
      // the pair derivation and the member append (lazy checkpoint)
      val asg0 = VectorQ.assignToCentroids(withNorm(batch), cells)
        .localCheckpoint(false)
      deltaPairsAssigned(asg0, members, threshold, maxCellSize, qvMargin)
        .withColumn("batch_id", lit(batchId))
        .write.partitionBy("batch_id")
        .option("partitionOverwriteMode", "dynamic")
        .mode("overwrite").parquet(pairsPath)
      val asg = if (storeHasQv(spark, storePath))
        withQv(asg0, "embedding", "qv") else asg0
      asg.withColumn("batch_id", lit(batchId))
        .write.partitionBy("batch_id")
        .option("partitionOverwriteMode", "dynamic")
        .mode("overwrite").parquet(membersPath(storePath))
    }
}
