package graft.streaming

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** The chain's ingest stage hardened against the two classic mediation
  * ingest failures the plain file source cannot see:
  *
  *  1. '''Re-delivered batches under new names.''' The streaming file
  *     source dedups by PATH, so the same CDR file landing again as
  *     `retry_0712.csv` double-bills every call in it — exactly the
  *     failure the reference's marker-file protocol guards
  *     (`MFramework.cpp:1286-1302`). Here every inbox file gets a
  *     CONTENT digest — (bit_xor of per-row xxhash64, exact SUM of the
  *     same hashes, row count): order independent, so a re-sorted
  *     redelivery still matches, and the sum component is load-bearing —
  *     xor alone CANCELS rows repeated an even number of times, so two
  *     distinct equal-count files like {A,B,B} and {A,C,C} would
  *     collide on (xor, count) and the second would be dropped as a
  *     "redelivery"; a sum never cancels duplicates (decimal
  *     accumulation: exact and overflow-free under ANSI). A file whose
  *     digest triple is already in the ingest ledger is dropped whole. The ledger is itself written per-batch (partitioned by
  *     batch id, dynamic overwrite), so a replayed micro-batch
  *     reproduces its own writes instead of doubling them, and the
  *     anti-join EXCLUDES the replaying batch's own ledger partition —
  *     otherwise a crash between ledger write and checkpoint commit
  *     would make the retry see its own digests and drop the data.
  *
  *  2. '''Schema/extraction drift.''' Before ANY write, the batch's
  *     POST-DEDUP rows' per-column profile card (rows, nulls, null-rate
  *     ppm — the live core of the q261 drift card) is checked against
  *     the stored reference profile; a column whose null rate drifts
  *     beyond the threshold throws BEFORE the batch touches the legs
  *     store — the gate a 100 TB append runs so one broken upstream
  *     extractor cannot silently poison a cycle of invoices. Profiling
  *     AFTER the dedup anti-join matters twice: a redelivered drifted
  *     file that the ledger would drop whole must not kill the query
  *     (it contributes nothing), and a duplicate-only first batch must
  *     not seed the reference profile. The reference profile bootstraps
  *     from the first batch with accepted rows (or is pre-seeded by the
  *     operator at `refProfileDir`).
  *
  * Write order inside the batch: dedup → gate → legs (dynamic partition
  * overwrite into `valid=…/batch_id=N`) → ledger. Every write is keyed
  * by batch id, so any crash point replays idempotently. The downstream
  * file source lists the directory (no `_spark_metadata` — foreachBatch
  * owns the layout) and dedups by path; the replay-overwrite window is
  * only racy against a downstream that kept running through the crash,
  * which the kill-the-topology model excludes.
  */
object HardenedIngest {

  /** Per-column live profile card: one scan → one aggregate row →
    * |cols| rows. The bounded-collect/explode shape of q261
    * ([[graft.queries.CurationQ.profileDrift]]), reduced to the
    * volume-independent metric a per-batch gate can threshold
    * (null-rate ppm; distinct counts scale with batch size and belong
    * to the batch-mode card). */
  def profileCard(df: DataFrame, cols: Seq[String]): DataFrame = {
    require(cols.nonEmpty, "profileCard: empty column list")
    val aggs = cols.flatMap { c =>
      Seq(count(lit(1)).as(s"__n_$c"),
        sum(when(col(c).isNull, 1L).otherwise(0L)).as(s"__z_$c"))
    }
    val one = df.agg(aggs.head, aggs.tail: _*)
    val rows = cols.map { c =>
      struct(lit(c).as("column"), col(s"__n_$c").as("n_rows"),
        col(s"__z_$c").as("n_null"),
        expr(s"(1000000 * __z_$c) DIV greatest(__n_$c, 1L)")
          .as("null_ppm"))
    }
    one.select(explode(array(rows: _*)).as("r")).select(col("r.*"))
  }

  /** Drift-gate configuration: `cols` profiled each batch, a batch
    * fails when any column's null-rate moves more than
    * `maxNullDriftPpm` from the stored reference. */
  final case class DriftGate(refProfileDir: String, cols: Seq[String],
      maxNullDriftPpm: Long = 100000L)

  /** Ledger layout (v2 — the `hsum` column joined the digest triple in
    * round 11; a pre-existing v1 ledger must be rebuilt or dropped —
    * ENFORCED in [[writeBatch]]: any NULL `hsum` row kills the batch,
    * because NULL sums would never match and redelivery protection
    * would silently vanish). */
  private def ledgerSchema = StructType(Seq(
    StructField("digest", LongType),
    StructField("hsum", DecimalType(38, 0)),
    StructField("n_rows", LongType),
    StructField("batch_id", LongType)))

  /** The hardened ingest stage: same validation verdict and dead-letter
    * partitioning as the plain `cdr_ingest`, plus the content-dedup
    * ledger and the optional drift gate. Output layout:
    * `legsDir/valid=…/batch_id=N/` (the batch id partition is the
    * replay-idempotence key). */
  def stage(spark: SparkSession, inboxDir: String, legsDir: String,
      ledgerDir: String, checkpointRoot: String,
      gate: Option[DriftGate] = None, maxFilesPerTrigger: Int = 8)
      : StageSpec =
    StageSpec(
      "cdr_ingest",
      source = s => s.readStream.schema(LiveRatingChain.legSchema)
        .option("header", "true")
        .option("maxFilesPerTrigger", maxFilesPerTrigger)
        .csv(inboxDir)
        .select(col("*"), col("_metadata.file_path").as("__src")),
      transform = df => df.withColumn("valid",
        col("call_id").rlike("^[0-9]+:[0-9]+$") &&
          col("seq").isNotNull && col("total").isNotNull &&
          col("duration_sec").isNotNull && col("duration_sec") >= 0.0),
      sink = df => df.writeStream
        .option("checkpointLocation", s"$checkpointRoot/cdr_ingest")
        .foreachBatch { (batch: DataFrame, batchId: Long) =>
          writeBatch(spark, batch, batchId, legsDir, ledgerDir, gate)
        })

  /** One micro-batch of the hardened ingest — separated so specs can
    * drive it directly. */
  private[graft] def writeBatch(spark: SparkSession, batch0: DataFrame,
      batchId: Long, legsDir: String, ledgerDir: String,
      gate: Option[DriftGate]): Unit = {
    val batch = batch0.cache()
    try {
      // ---- content-dedup FIRST: digest per inbox file ----------------
      val rowHash = xxhash64(col("call_id"), col("seq"), col("total"),
        col("duration_sec"))
      // digest triple: xor (cheap, order-free) + exact decimal sum
      // (duplicates never cancel) + count. ANSI-safe: a bigint sum of
      // full-range hashes overflows, the (38,0) decimal cannot.
      val digested = batch.withColumn("__h", rowHash)
        .groupBy(col("__src"))
        .agg(expr("bit_xor(__h)").as("digest"),
          sum(col("__h").cast(DecimalType(38, 0))).as("hsum"),
          count(lit(1)).as("n_rows"))
      // intra-batch duplicates: keep the first path per digest
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("digest"), col("hsum"), col("n_rows"))
        .orderBy(col("__src"))
      val dedupInBatch = digested
        .withColumn("__rn", row_number().over(w)).filter(col("__rn") === 1)
        .drop("__rn")
      // The ledger read fails LOUDLY on anything but a missing path: a
      // corrupt or unreadable ledger must kill the batch, not silently
      // disable the dedup guard exactly when redelivery is most likely
      // (after a storage incident). Only first-run absence is "empty".
      val ledgerPath = new org.apache.hadoop.fs.Path(ledgerDir)
      val ledgerFs = ledgerPath.getFileSystem(
        spark.sparkContext.hadoopConfiguration)
      val ledger =
        if (!ledgerFs.exists(ledgerPath))
          spark.createDataFrame(
            spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
            ledgerSchema)
        else {
          val read = spark.read.schema(ledgerSchema).parquet(ledgerDir)
            .filter(col("batch_id") =!= batchId) // a replay must not see
                                                 // its own prior write
          // v1-ledger loud guard: a pre-round-11 (digest, n_rows) ledger
          // read with the v2 schema yields NULL hsum rows the triple
          // anti-join can never match — every previously-ingested file
          // would silently look fresh on redelivery, the exact
          // double-billing this module exists to prevent. DELIBERATELY
          // re-checked EVERY batch (round-12 deliberated a once-per-JVM
          // cache and rejected it): the guard exists precisely for the
          // post-incident window where an operator may restore an old
          // backup UNDER a running stream, which a cached verdict would
          // wave through; the scan is one bounded job over a file-grain
          // table, and on the money path loud beats fast.
          require(read.filter(col("hsum").isNull).isEmpty,
            s"HardenedIngest: ledger at $ledgerDir contains NULL hsum " +
              "rows (a v1 ledger read with the v2 schema) — redelivery " +
              "protection would be silently lost; drop the ledger and " +
              "accept redelivery exposure for pre-upgrade files (their " +
              "per-FILE grouping is not recoverable from the legs " +
              "store), or restore a v2 backup, before restarting")
          read
        }
      val fresh = dedupInBatch
        .join(ledger.select("digest", "hsum", "n_rows"),
          Seq("digest", "hsum", "n_rows"), "left_anti").cache()
      try {
        val keep = batch.join(broadcast(fresh.select("__src")),
          Seq("__src"), "left_semi").cache()
        try {
          // ---- drift gate on the POST-DEDUP rows only ----------------
          // (a redelivered drifted file is dropped, not fatal; a
          // duplicate-only batch cannot seed the reference profile)
          gate.filter(_ => !keep.isEmpty).foreach { g =>
            val cur = profileCard(keep.drop("__src", "valid"), g.cols)
            val refPath = new org.apache.hadoop.fs.Path(g.refProfileDir)
            val fs = refPath.getFileSystem(
              spark.sparkContext.hadoopConfiguration)
            if (!fs.exists(refPath)) {
              // bootstrap: the first accepted batch defines the reference
              cur.coalesce(1).write.mode(SaveMode.Overwrite)
                .parquet(g.refProfileDir)
            } else {
              val ref = spark.read.parquet(g.refProfileDir)
                .select(col("column"), col("null_ppm").as("null_ppm_ref"))
              val bad = cur.join(ref, Seq("column"))
                .filter(abs(col("null_ppm") - col("null_ppm_ref")) >
                  g.maxNullDriftPpm)
                .select(col("column"), col("null_ppm_ref"),
                  col("null_ppm"))
                .collect() // bounded: <= |cols| rows
              if (bad.nonEmpty) throw new IllegalStateException(
                "HardenedIngest drift gate tripped (batch " + batchId +
                  " NOT written): " + bad.mkString("; "))
            }
          }

          keep.drop("__src").withColumn("batch_id", lit(batchId))
            .write.mode(SaveMode.Overwrite)
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("valid", "batch_id")
            .parquet(legsDir)
          fresh.select(col("digest"), col("hsum"), col("n_rows"))
            .withColumn("batch_id", lit(batchId))
            .coalesce(1)
            .write.mode(SaveMode.Overwrite)
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("batch_id")
            .parquet(ledgerDir)
        } finally keep.unpersist()
      } finally fresh.unpersist()
    } finally batch.unpersist()
  }

  /** The hardened ingest fed by the PRERATING store instead of a raw
    * CSV inbox — the full production wiring: prerating normalizes and
    * guides, this stage content-dedups and drift-gates what prerating
    * admitted, and only then do legs reach assembly. Only the SOURCE
    * differs from [[stage]] (the StageSpec seam): the prerated store's
    * `guided=true` partition, with the file path carried for the
    * content digest. */
  def stageFromPrerated(spark: SparkSession, preratedDir: String,
      legsDir: String, ledgerDir: String, checkpointRoot: String,
      gate: Option[DriftGate] = None): StageSpec = {
    val preratedSchema = StructType(Seq(
      StructField("call_id", StringType),
      StructField("seq", IntegerType),
      StructField("total", IntegerType),
      StructField("duration_sec", DoubleType),
      StructField("reason", StringType),
      StructField("src_file", StringType),
      StructField("guided", BooleanType)))
    stage(spark, inboxDir = "/unused", legsDir, ledgerDir,
      checkpointRoot, gate).copy(
      source = s => s.readStream.schema(preratedSchema)
        .parquet(preratedDir)
        .filter(col("guided"))
        // digest at the RAW-DELIVERY grain (src_file, carried through
        // prerating since round 12): prerated output file boundaries
        // are a bin-packing artifact — a retry sharing a trigger with
        // fresh traffic shares output files, and a per-output-file
        // digest would wave the redelivered rows through. Pre-round-12
        // stores without the column fall back to the output-file grain
        // (the old, same-trigger-vulnerable behavior).
        .select(col("call_id"), col("seq"), col("total"),
          col("duration_sec"),
          coalesce(col("src_file"), col("_metadata.file_path"))
            .as("__src")))
  }

  /** Legs-store schema the downstream assembly declares when the chain
    * runs on the hardened ingest (the batch_id partition column joins
    * the layout). */
  val hardenedLegsSchema: StructType = StructType(Seq(
    StructField("call_id", StringType),
    StructField("seq", IntegerType),
    StructField("total", IntegerType),
    StructField("duration_sec", DoubleType),
    StructField("valid", BooleanType),
    StructField("batch_id", LongType)))

  /** The full chain on the hardened ingest: assembly's source declares
    * the extended schema; everything downstream is the registered
    * standard stage. */
  def stages(spark: SparkSession, inboxDir: String, legsDir: String,
      ledgerDir: String, callsDir: String, ratedDir: String,
      checkpointRoot: String, tiers: Seq[(Long, Long, Long)],
      gate: Option[DriftGate] = None, legTimeoutMs: Long = -1L)
      : Seq[StageSpec] = {
    // pre-create the handoff dirs so every stage can start before its
    // upstream commits a first batch (the register() convention)
    val hadoop = spark.sparkContext.hadoopConfiguration
    Seq(inboxDir, legsDir, callsDir, ratedDir).foreach { d =>
      val p = new org.apache.hadoop.fs.Path(d)
      p.getFileSystem(hadoop).mkdirs(p)
    }
    val base = LiveRatingChain.stages(spark, "/nonexistent", legsDir,
      callsDir, ratedDir, checkpointRoot, tiers, legTimeoutMs)
    val assembly = base(1).copy(source = s => s.readStream
      .schema(hardenedLegsSchema).parquet(legsDir)
      .drop("batch_id"))
    stage(spark, inboxDir, legsDir, ledgerDir, checkpointRoot, gate) +:
      assembly +: base.drop(2)
  }
}
