package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{OutputMode, TimeMode}
import org.apache.spark.sql.types._

import graft.queries.EventQ

/** The reference's live mediation pipeline composed END-TO-END as one
  * [[PipelineRunner]] topology — its linked-session chain
  * (`M_LINKED_SESSIONS`, MFramework.cpp:981-1011) where `prerating.sh`
  * feeds `gsmrating.sh` through the queue plane, with RATING inside the
  * running chain rather than as separate demos:
  *
  *   cdr_ingest    file-source CSV leg files → validated legs store
  *                 (dead letters kept as a `valid=false` partition —
  *                  one sink, nothing silently dropped)
  *   leg_assembly  legs store → [[LegAssembler]] (transformWithState:
  *                 duplicate/out-of-order legs, state survives restart)
  *                 → assembled-calls store
  *   rating        assembled calls → [[MarginalRater]] (online
  *                 cumulative-tier OCS rating, exact telescoping)
  *                 → invoice-line store partitioned by account
  *
  * Stage handoff is by parquet directories: each stage's streaming file
  * sink commits atomically through its `_spark_metadata` log and the
  * downstream file source reads THAT log, so a record crosses a stage
  * boundary exactly once even across kill-and-restart — the Structured
  * Streaming replacement for the reference's Dir1/Dir2 marker protocol
  * (`MFramework.cpp:821-903`). Every stage checkpoints independently;
  * killing the whole app and restarting resumes all three from their
  * checkpoints with no loss and no double-billing (spec-pinned, and
  * streamed per-account totals are proven ≡ the q239 batch invoice run
  * on the same input — the telescoping T(total) contract).
  *
  * Scale: ingest is an embarrassingly parallel scan→filter; assembly
  * and rating shuffle once each on their state key (call_id / account)
  * into RocksDB-backed state (requires
  * `spark.sql.streaming.stateStore.providerClass` = RocksDB, which
  * transformWithState mandates); the invoice sink partitions by a
  * BOUNDED account bucket (`account_id % invoiceBuckets`) — one
  * directory per bucket, never one per account: partitioning by raw
  * account id creates |accounts| directories PER MICRO-BATCH, which is
  * the probe-measured scale killer (50k accounts pushed a 2M-leg run
  * past 10 minutes on the file-creation path alone). A billing cycle
  * key would join the partition spec in production. Incomplete calls
  * flushed by the assembly
  * timeout (`complete=false`) are NOT rated: they stay in the calls
  * store as the late-leg reconciliation input.
  */
object LiveRatingChain {

  /** Inbound CDR-leg file layout (CSV with header). `call_id` is
    * `<account_id>:<event_id>` — the account key rides inside the call
    * key the way an MSISDN rides inside a real CDR's session id, and
    * the rating stage splits it back out.
    *
    * DROP CONTRACT: producers must land files in the inbox ATOMICALLY
    * (write elsewhere, then rename in) — a file written in place is
    * listed by the live source mid-write and marked processed at its
    * then-current length, silently truncating the tail (probe-measured:
    * 44% loss on a 2M-leg in-place write). This is the reference's own
    * marker-file drop discipline (`MFramework.cpp:821-903`). */
  val legSchema: StructType = StructType(Seq(
    StructField("call_id", StringType),
    StructField("seq", IntegerType),
    StructField("total", IntegerType),
    StructField("duration_sec", DoubleType)))

  /** Output schema of the legs store (ingest adds the `valid` flag the
    * store is partitioned by). */
  private def legsStoreSchema: StructType =
    StructType(legSchema.fields :+ StructField("valid", BooleanType))

  private val callIdShape = "^[0-9]+:[0-9]+$"

  /** The three composed stages. Register them in the returned order
    * (upstream first, the [[Topology.load]] convention). */
  def stages(spark: SparkSession, inboxDir: String, legsDir: String,
      callsDir: String, ratedDir: String, checkpointRoot: String,
      tiers: Seq[(Long, Long, Long)], legTimeoutMs: Long = -1L,
      maxFilesPerTrigger: Int = 8, invoiceBuckets: Int = 64): Seq[StageSpec] = {
    require(invoiceBuckets >= 1,
      s"invoiceBuckets must be >= 1, got $invoiceBuckets")
    import spark.implicits._

    val ingest = StageSpec(
      "cdr_ingest",
      source = s => s.readStream.schema(legSchema)
        .option("header", "true")
        .option("maxFilesPerTrigger", maxFilesPerTrigger)
        .csv(inboxDir),
      // validation verdict rides as a column and the sink PARTITIONS on
      // it: invalid legs land under valid=false — the dead-letter path
      // as a partition of the same exactly-once sink, never a drop
      transform = df => df.withColumn("valid",
        col("call_id").rlike(callIdShape) &&
          col("seq").isNotNull && col("total").isNotNull &&
          col("duration_sec").isNotNull && col("duration_sec") >= 0.0),
      sink = df => df.writeStream.format("parquet")
        .partitionBy("valid")
        .option("path", legsDir)
        .option("checkpointLocation", s"$checkpointRoot/cdr_ingest")
        .outputMode("append"))

    val timeMode =
      if (legTimeoutMs >= 0) TimeMode.ProcessingTime() else TimeMode.None()
    val assembly = StageSpec(
      "leg_assembly",
      source = s => s.readStream.schema(legsStoreSchema).parquet(legsDir),
      transform = df => df.filter(col("valid"))
        .select(col("call_id"), col("seq"), col("total"),
          col("duration_sec"))
        .as[Leg]
        .groupByKey(_.call_id)
        .transformWithState(new LegAssembler(legTimeoutMs), timeMode,
          OutputMode.Append())
        .toDF(),
      sink = df => {
        val w = df.writeStream.format("parquet")
          .option("path", callsDir)
          .option("checkpointLocation", s"$checkpointRoot/leg_assembly")
          .outputMode("append")
        // Processing-time timers make the engine schedule micro-batches
        // CONTINUOUSLY (each batch checks for expired timers), and every
        // batch commits a file-sink entry — unpaced, a quiet timeout-mode
        // chain writes an empty parquet file per second per partition
        // forever (measured: ~70k files in 20 min of idle). Pace timer
        // polls at half the timeout: flush latency stays within ~1.5x
        // the declared timeout and the empty-batch storm is gone.
        if (legTimeoutMs >= 0)
          w.trigger(org.apache.spark.sql.streaming.Trigger.ProcessingTime(
            math.max(legTimeoutMs / 2, 500L)))
        else w
      })

    val rating = StageSpec(
      "rating",
      source = s => s.readStream.schema(StructType(Seq(
          StructField("call_id", StringType),
          StructField("n_legs", IntegerType),
          StructField("total_duration", DoubleType),
          StructField("complete", BooleanType))))
        .parquet(callsDir),
      // only COMPLETE calls rate; the timeout's complete=false flushes
      // stay in the calls store for late-leg reconciliation. Units =
      // rounded total duration (the fixture carries integral seconds;
      // a production feed carries centi-units end to end, the q225
      // discipline).
      transform = df => df.filter(col("complete"))
        .select(
          split(col("call_id"), ":").getItem(0).cast(LongType)
            .as("account_id"),
          split(col("call_id"), ":").getItem(1).cast(LongType)
            .as("event_id"),
          expr("CAST(round(total_duration) AS BIGINT)").as("units"))
        .as[UsageRec]
        .groupByKey(_.account_id)
        .transformWithState(new MarginalRater(tiers), TimeMode.None(),
          OutputMode.Append())
        .toDF()
        .withColumn("invoice_bucket",
          pmod(col("account_id"), lit(invoiceBuckets.toLong))),
      sink = df => df.writeStream.format("parquet")
        .partitionBy("invoice_bucket")
        .option("path", ratedDir)
        .option("checkpointLocation", s"$checkpointRoot/rating")
        .outputMode("append"))

    Seq(ingest, assembly, rating)
  }

  /** Inbound RAW CDR layout for the prerated topology: the dialed/served
    * number arrives as a messy wire-form MSISDN (not yet an account),
    * exactly what `prerating.sh` exists to fix before rating ever sees
    * the record. */
  val rawCdrSchema: StructType = StructType(Seq(
    StructField("msisdn", StringType),
    StructField("event_id", LongType),
    StructField("seq", IntegerType),
    StructField("total", IntegerType),
    StructField("duration_sec", DoubleType)))

  /** The PRERATING stage (`prerating.sh:14` — the reference's first named
    * pipeline): normalize each CDR's MSISDN to one E.164 canonical form,
    * GUIDE it to the owning account through the number-range dimension
    * ([[graft.queries.PreratingQ]] — oracle-pinned as q263/q264), and
    * emit chain-shaped legs (`call_id = <account>:<event>`) into the
    * prerated store, partitioned by the guiding verdict: `guided=false`
    * rows keep their reason code (never-drop — unguided traffic is a
    * revenue-assurance finding). The dimension is static and broadcast;
    * the stage itself is stateless map-side work, so it scales as pure
    * scan throughput.
    */
  def preratingStage(spark: SparkSession, rawInbox: String,
      ranges: DataFrame, preratedDir: String, checkpointRoot: String,
      defaultCc: String = "49", maxFilesPerTrigger: Int = 8): StageSpec =
    StageSpec(
      "prerating",
      source = s => s.readStream.schema(rawCdrSchema)
        .option("header", "true")
        .option("maxFilesPerTrigger", maxFilesPerTrigger)
        .csv(rawInbox)
        // the RAW delivery file rides every row: downstream content
        // dedup must digest at the DELIVERY grain — prerated output
        // file boundaries are a bin-packing artifact (a retry landing
        // in the same trigger as fresh traffic shares output files)
        .select(col("*"), col("_metadata.file_path").as("src_file")),
      transform = df => {
        val guided = graft.queries.PreratingQ.guideRanges(
          graft.queries.PreratingQ.normalizeMsisdn(df, "msisdn", defaultCc),
          ranges)
        guided.select(
          when(col("account_id").isNotNull,
            concat(col("account_id").cast(StringType), lit(":"),
              col("event_id").cast(StringType))).as("call_id"),
          col("seq"), col("total"), col("duration_sec"), col("reason"),
          col("src_file"),
          col("account_id").isNotNull.as("guided"))
      },
      sink = df => df.writeStream.format("parquet")
        .partitionBy("guided")
        .option("path", preratedDir)
        .option("checkpointLocation", s"$checkpointRoot/prerating")
        .outputMode("append"))

  /** The LIVE-DIM prerating stage — [[preratingStage]] with the static
    * captured `ranges` replaced by a [[VersionedDim]] resolved PER
    * MICRO-BATCH: a number port published to the store mid-run guides
    * the NEXT batch to the new owner with no stage restart (where the
    * reference reloads config from the DB only on a control restart,
    * `MFramework.cpp:1802-1812`). Validation cost is paid once per dim
    * VERSION inside the store, never per trigger.
    *
    * With `versionedGuiding = true` the dim carries SCD2 validity
    * windows and each CDR guides against the plan AS OF ITS OWN
    * event time ([[graft.queries.PreratingQ.guideRangesVersioned]],
    * pre-validated by the store — construct the dim with
    * [[VersionedDim]]`(spark, dir, PreratingQ.validateVersionedDim)`),
    * so a redelivered HISTORICAL wave guides to its era's owner while
    * live traffic guides to the current one. Event time = `event_id`
    * as seconds (the fraud-tap/gauge fixture wire convention; a
    * production feed carries a real timestamp column).
    *
    * Sink: `foreachBatch` into `preratedDir/batch_id=N/guided=…`. The
    * batch partition is deleted before the append — NOT dynamic
    * overwrite: the dim may ADVANCE between a crash and its replay,
    * moving rows across verdict partitions, and overwrite-by-written-
    * partition would strand the stale verdict's files. Each emitted row
    * carries `guide_ver`, the dim version that guided it — the audit
    * column a porting dispute reads.
    *
    * CRASH MODEL: the downstream ingest lists this directory and dedups
    * by path, so the replay rewrite is exactly-once only under the
    * kill-the-topology model (producer and consumer restart together —
    * the [[HardenedIngest]] stance); per-stage auto-restart topologies
    * must bounce the whole chain on a prerating failure or hand off
    * over the packet plane instead. */
  def preratingStageLive(spark: SparkSession, rawInbox: String,
      dim: VersionedDim, preratedDir: String, checkpointRoot: String,
      defaultCc: String = "49", versionedGuiding: Boolean = false,
      maxFilesPerTrigger: Int = 8): StageSpec =
    StageSpec(
      "prerating",
      source = s => s.readStream.schema(rawCdrSchema)
        .option("header", "true")
        .option("maxFilesPerTrigger", maxFilesPerTrigger)
        .csv(rawInbox)
        // raw delivery file per row — the downstream dedup grain
        .select(col("*"), col("_metadata.file_path").as("src_file")),
      transform = identity,
      sink = df => df.writeStream
        .option("checkpointLocation", s"$checkpointRoot/prerating")
        .foreachBatch { (batch: DataFrame, batchId: Long) =>
          val (ver, ranges) = dim.resolve()
          val normalized = graft.queries.PreratingQ.normalizeMsisdn(
            batch, "msisdn", defaultCc)
          val guided =
            if (versionedGuiding)
              graft.queries.PreratingQ.guideRangesVersioned(
                normalized.withColumn("sec", col("event_id")), ranges,
                preValidated = true).drop("sec")
            else
              graft.queries.PreratingQ.guideRanges(normalized, ranges)
          val out = guided.select(
            when(col("account_id").isNotNull,
              concat(col("account_id").cast(StringType), lit(":"),
                col("event_id").cast(StringType))).as("call_id"),
            col("seq"), col("total"), col("duration_sec"), col("reason"),
            col("src_file"),
            lit(ver).as("guide_ver"),
            lit(batchId).as("batch_id"),
            col("account_id").isNotNull.as("guided"))
          val p = new org.apache.hadoop.fs.Path(
            s"$preratedDir/batch_id=$batchId")
          val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
          if (fs.exists(p)) fs.delete(p, true)
          out.write.mode(org.apache.spark.sql.SaveMode.Append)
            .partitionBy("batch_id", "guided").parquet(preratedDir)
        })

  /** Live-prerated-store schema (both partition columns declared
    * explicitly — single-valued partition values would otherwise infer
    * as STRING). */
  private def preratedLiveSchema: StructType = StructType(Seq(
    StructField("call_id", StringType),
    StructField("seq", IntegerType),
    StructField("total", IntegerType),
    StructField("duration_sec", DoubleType),
    StructField("reason", StringType),
    StructField("src_file", StringType),
    StructField("guide_ver", LongType),
    StructField("batch_id", LongType),
    StructField("guided", BooleanType)))

  /** Register the full chain on the LIVE-DIM prerating stage:
    * prerating (per-batch dim resolve) → ingest → assembly → rating,
    * plus the stage's `refreshsession` hook (`dim.refresh` — force a
    * reload+revalidate at an unchanged version). Publish at least one
    * dim version BEFORE starting: a consumer with no number plan fails
    * loudly rather than guessing. */
  def registerWithLiveDim(runner: PipelineRunner, spark: SparkSession,
      rawInbox: String, dim: VersionedDim, preratedDir: String,
      legsDir: String, callsDir: String, ratedDir: String,
      checkpointRoot: String, tiers: Seq[(Long, Long, Long)],
      defaultCc: String = "49", versionedGuiding: Boolean = false,
      legTimeoutMs: Long = -1L): Seq[String] = {
    val hadoop = spark.sparkContext.hadoopConfiguration
    Seq(rawInbox, preratedDir, legsDir, callsDir, ratedDir).foreach { d =>
      val p = new org.apache.hadoop.fs.Path(d)
      p.getFileSystem(hadoop).mkdirs(p)
    }
    val pre = preratingStageLive(spark, rawInbox, dim, preratedDir,
      checkpointRoot, defaultCc, versionedGuiding)
    val base = stages(spark, "/nonexistent-inbox", legsDir, callsDir,
      ratedDir, checkpointRoot, tiers, legTimeoutMs)
    val ingest = base.head.copy(source = s => s.readStream
      .schema(preratedLiveSchema).parquet(preratedDir)
      .filter(col("guided"))
      .select(col("call_id"), col("seq"), col("total"),
        col("duration_sec")))
    val ss = pre +: ingest +: base.tail
    ss.foreach(runner.register)
    runner.onRefresh(pre.name, () => dim.refresh())
    ss.map(_.name)
  }

  /** The TARIFF-ATTACH stage — the rating-side twin of
    * [[preratingStageLive]], removing the chain's LAST
    * restart-to-refresh ceiling: [[stages]]' rating stage freezes
    * `tiers` at construction, so a tariff amendment mid-cycle required
    * a stage bounce (the reference's reload-on-control-restart,
    * `MFramework.cpp:1802-1812`). Here the tier plan lives in a
    * [[VersionedDim]] as an SCD2 TIMELINE (one row per validity window
    * per tier, validated once per version by
    * [[graft.queries.EventQ.validateTariffTimeline]]), the stage
    * re-resolves it EVERY micro-batch, and each complete call is
    * stamped with the plan AS OF ITS OWN event time (event time =
    * `event_id` seconds, the chain's fixture wire convention) plus
    * `tariff_ver`, the rating-side audit column — so an amendment
    * published mid-run rates the NEXT batch with no restart, and a
    * redelivered historical wave rates at its ERA's plan (the q279
    * versioned-guiding discipline applied to money).
    *
    * Calls in UNCOVERED time (a timeline gap) land under
    * `covered=false` with a NULL plan — held for a correction run,
    * never guessed at, never dropped. Sink is the
    * [[preratingStageLive]] replay discipline: the batch partition is
    * DELETED before append (the timeline may advance between a crash
    * and its replay, moving rows across `covered` partitions — dynamic
    * overwrite would strand the stale verdict's files).
    *
    * CRASH MODEL (the [[HardenedIngest]] stance, stated here because
    * this handoff carries money): the downstream rating stage lists the
    * enriched DIRECTORY (foreachBatch owns the layout — no
    * `_spark_metadata`) and dedups by path, so the delete-then-rewrite
    * replay is only racy against a consumer that kept running through
    * the producer's crash — attempt-1 files it already counted are
    * replaced by differently-named attempt-2 files it would count
    * AGAIN. The kill-the-topology model excludes that (producer and
    * consumer restart together); operators who instead auto-restart
    * individual stages (SupervisorListener) must either restart the
    * whole chain on an attach failure or route this handoff over the
    * packet plane, whose sweep makes a producer replay LOUD at the
    * consumer rather than silent.
    *
    * Plan shape per batch: one bounded dim read + ONE broadcast join
    * (validity windows never overlap, so ≤ 1 match per call, no
    * fanout) — the call side never shuffles here. */
  def tariffAttachStage(spark: SparkSession, callsDir: String,
      enrichedDir: String, checkpointRoot: String, tariff: VersionedDim)
      : StageSpec = {
    // the window-grain plan aggregation is cached PER DIM VERSION (the
    // VersionedDim validate-once discipline): resolve() is cheap when
    // the version is unchanged, but re-aggregating the plan every
    // trigger would pay an identical dim-grain job between publishes.
    // The cache keys on the resolved snapshot's IDENTITY beside the
    // version: `refreshsession` (dim.refresh) forces resolve() to hand
    // back a NEW DataFrame at the SAME version — keying on the version
    // alone would keep joining a plan materialized from the pre-repair
    // read, silently defeating the recovery verb this stage registers.
    val cachedPlans = new java.util.concurrent.atomic.AtomicReference[
      (Long, DataFrame, DataFrame)](null)
    def plansFor(ver: Long, dim: DataFrame): DataFrame = {
      val c = cachedPlans.get()
      if (c != null && c._1 == ver && (c._2 eq dim)) c._3
      else {
        val p = graft.queries.EventQ.planWindows(dim)
          .select(col("valid_from_sec").as("__vf"),
            col("valid_to_sec").as("__vt"), col("tiers"))
          .cache()
        p.count() // materialize the (bounded, window-grain) dim once
        cachedPlans.getAndSet((ver, dim, p)) match {
          case null => ()
          case (_, _, old) => old.unpersist()
        }
        p
      }
    }
    StageSpec(
      "tariff_attach",
      source = s => s.readStream.schema(StructType(Seq(
          StructField("call_id", StringType),
          StructField("n_legs", IntegerType),
          StructField("total_duration", DoubleType),
          StructField("complete", BooleanType))))
        .parquet(callsDir),
      transform = identity,
      sink = df => df.writeStream
        .option("checkpointLocation", s"$checkpointRoot/tariff_attach")
        .foreachBatch { (batch: DataFrame, batchId: Long) =>
          val (ver, dim) = tariff.resolve()
          val plans = plansFor(ver, dim)
          val out = batch.filter(col("complete"))
            .select(
              split(col("call_id"), ":").getItem(0).cast(LongType)
                .as("account_id"),
              split(col("call_id"), ":").getItem(1).cast(LongType)
                .as("event_id"),
              expr("CAST(round(total_duration) AS BIGINT)").as("units"))
            .join(broadcast(plans),
              col("event_id") >= col("__vf") &&
                col("event_id") < col("__vt"), "left")
            .select(col("account_id"), col("event_id"), col("units"),
              col("__vf").as("tariff_from"), lit(ver).as("tariff_ver"),
              col("tiers"),
              lit(batchId).as("batch_id"),
              col("tiers").isNotNull.as("covered"))
          val p = new org.apache.hadoop.fs.Path(
            s"$enrichedDir/batch_id=$batchId")
          val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
          if (fs.exists(p)) fs.delete(p, true)
          out.write.mode(org.apache.spark.sql.SaveMode.Append)
            .partitionBy("batch_id", "covered").parquet(enrichedDir)
        })
  }

  /** Enriched-usage store schema (both partition columns declared — the
    * [[preratedLiveSchema]] convention). */
  private def enrichedTariffSchema: StructType = StructType(Seq(
    StructField("account_id", LongType),
    StructField("event_id", LongType),
    StructField("units", LongType),
    StructField("tariff_from", LongType),
    StructField("tariff_ver", LongType),
    StructField("tiers", ArrayType(StructType(Seq(
      StructField("f", LongType), StructField("t", LongType),
      StructField("r", LongType))))),
    StructField("batch_id", LongType),
    StructField("covered", BooleanType)))

  /** The LIVE-TARIFF rating stage: reads the enriched store's
    * `covered=true` partition (partition-pruned) and rates each record
    * under the plan IT CARRIES through [[VersionedTierRater]] — the
    * per-account accumulator runs uninterrupted across plan versions,
    * pinned record-for-record against the oracle-checked batch q288. */
  def ratingStageLiveTariff(spark: SparkSession, enrichedDir: String,
      ratedDir: String, checkpointRoot: String, invoiceBuckets: Int = 64)
      : StageSpec = {
    import spark.implicits._
    require(invoiceBuckets >= 1,
      s"invoiceBuckets must be >= 1, got $invoiceBuckets")
    StageSpec(
      "rating",
      source = s => s.readStream.schema(enrichedTariffSchema)
        .parquet(enrichedDir)
        .filter(col("covered")),
      transform = df => df
        .select(col("account_id"), col("event_id"), col("units"),
          col("tariff_ver"), col("tiers"))
        .as[TariffUsageRec]
        .groupByKey(_.account_id)
        .transformWithState(new VersionedTierRater, TimeMode.None(),
          OutputMode.Append())
        .toDF()
        .withColumn("invoice_bucket",
          pmod(col("account_id"), lit(invoiceBuckets.toLong))),
      sink = df => df.writeStream.format("parquet")
        .partitionBy("invoice_bucket")
        .option("path", ratedDir)
        .option("checkpointLocation", s"$checkpointRoot/rating")
        .outputMode("append"))
  }

  /** Register the chain with the LIVE TARIFF path: ingest → assembly →
    * tariff_attach (per-batch dim resolve) → rating (plan-on-record),
    * plus the stage's `refreshsession` hook. Publish at least one
    * timeline version BEFORE starting — a rater with no tariff fails
    * loudly rather than guessing. Construct the dim with
    * `new VersionedDim(spark, dir, EventQ.validateTariffTimeline)` so a
    * malformed amendment is rejected AT PUBLISH-RESOLVE time, once per
    * version. */
  def registerWithLiveTariff(runner: PipelineRunner, spark: SparkSession,
      inboxDir: String, legsDir: String, callsDir: String,
      enrichedDir: String, ratedDir: String, checkpointRoot: String,
      tariff: VersionedDim, legTimeoutMs: Long = -1L): Seq[String] = {
    val hadoop = spark.sparkContext.hadoopConfiguration
    Seq(inboxDir, legsDir, callsDir, enrichedDir, ratedDir).foreach { d =>
      val p = new org.apache.hadoop.fs.Path(d)
      p.getFileSystem(hadoop).mkdirs(p)
    }
    // ingest + assembly from the standard chain; its constant-tier
    // rating stage is DISCARDED (the placeholder tiers never rate)
    val base = stages(spark, inboxDir, legsDir, callsDir,
      "/nonexistent-rated", checkpointRoot,
      Seq((0L, Long.MaxValue, 0L)), legTimeoutMs).take(2)
    val attach = tariffAttachStage(spark, callsDir, enrichedDir,
      checkpointRoot, tariff)
    val rating = ratingStageLiveTariff(spark, enrichedDir, ratedDir,
      checkpointRoot)
    val ss = base :+ attach :+ rating
    ss.foreach(runner.register)
    runner.onRefresh(attach.name, () => tariff.refresh())
    ss.map(_.name)
  }

  /** Register the FULLY LIVE chain — every dimension a running query
    * consults is now refreshable without a restart, closing the loop the
    * two halves opened: prerating resolves the NUMBER PLAN from a
    * [[VersionedDim]] per micro-batch with SCD2 era guiding
    * (`versionedGuiding = true` — each CDR guides as of its own event
    * time), and rating resolves the TARIFF timeline the same way
    * (attach + plan-on-record). Both stages expose `refreshsession`
    * hooks.
    *
    * The composed determinism statement this buys (spec- and
    * probe-pinned): because BOTH dims are event-time-versioned, the
    * streamed chain's output depends only on the FINAL dimension
    * timelines, not on when publishes landed — provided each publish
    * lands before the traffic its new era covers (the operational
    * porting-day rule). So the whole streamed run, ports and
    * amendments included, must equal ONE batch replay:
    * `guideRangesVersioned(final plan)` →
    * `marginalTieredChargesVersioned(final timeline)` — EXACT.
    *
    * Stage order: prerating(live plan) → ingest → assembly →
    * tariff_attach(live tariff) → rating. Publish at least one version
    * of EACH dim before starting. */
  def registerFullyLive(runner: PipelineRunner, spark: SparkSession,
      rawInbox: String, numberDim: VersionedDim, tariffDim: VersionedDim,
      preratedDir: String, legsDir: String, callsDir: String,
      enrichedDir: String, ratedDir: String, checkpointRoot: String,
      defaultCc: String = "49", legTimeoutMs: Long = -1L): Seq[String] = {
    val hadoop = spark.sparkContext.hadoopConfiguration
    Seq(rawInbox, preratedDir, legsDir, callsDir, enrichedDir,
        ratedDir).foreach { d =>
      val p = new org.apache.hadoop.fs.Path(d)
      p.getFileSystem(hadoop).mkdirs(p)
    }
    val pre = preratingStageLive(spark, rawInbox, numberDim, preratedDir,
      checkpointRoot, defaultCc, versionedGuiding = true)
    val base = stages(spark, "/nonexistent-inbox", legsDir, callsDir,
      "/nonexistent-rated", checkpointRoot,
      Seq((0L, Long.MaxValue, 0L)), legTimeoutMs).take(2)
    val ingest = base.head.copy(source = s => s.readStream
      .schema(preratedLiveSchema).parquet(preratedDir)
      .filter(col("guided"))
      .select(col("call_id"), col("seq"), col("total"),
        col("duration_sec")))
    val attach = tariffAttachStage(spark, callsDir, enrichedDir,
      checkpointRoot, tariffDim)
    val rating = ratingStageLiveTariff(spark, enrichedDir, ratedDir,
      checkpointRoot)
    val ss = Seq(pre, ingest, base(1), attach, rating)
    ss.foreach(runner.register)
    runner.onRefresh(pre.name, () => numberDim.refresh())
    runner.onRefresh(attach.name, () => tariffDim.refresh())
    ss.map(_.name)
  }

  /** [[registerFullyLive]] with the HARDENED ingest between prerating
    * and assembly — the full production wiring: live number-plan
    * guiding, content-hash redelivery dedup + optional drift gate on
    * what prerating admitted, stateful assembly, live tariff rating.
    * A CDR wave redelivered under a new name anywhere upstream is
    * dropped WHOLE by the digest ledger before it can double-bill,
    * while ports and amendments still land with no restart — and the
    * batch-replay determinism statement still holds on the deduped
    * traffic. */
  def registerFullyLiveHardened(runner: PipelineRunner,
      spark: SparkSession, rawInbox: String, numberDim: VersionedDim,
      tariffDim: VersionedDim, preratedDir: String, legsDir: String,
      ledgerDir: String, callsDir: String, enrichedDir: String,
      ratedDir: String, checkpointRoot: String,
      gate: Option[HardenedIngest.DriftGate] = None,
      defaultCc: String = "49", legTimeoutMs: Long = -1L): Seq[String] = {
    val hadoop = spark.sparkContext.hadoopConfiguration
    Seq(rawInbox, preratedDir, legsDir, callsDir, enrichedDir,
        ratedDir).foreach { d =>
      val p = new org.apache.hadoop.fs.Path(d)
      p.getFileSystem(hadoop).mkdirs(p)
    }
    val pre = preratingStageLive(spark, rawInbox, numberDim, preratedDir,
      checkpointRoot, defaultCc, versionedGuiding = true)
    // hardened ingest with its SOURCE swapped to the LIVE prerated
    // store. The content digest keys on src_file — the RAW DELIVERY
    // file carried through prerating — NOT on the prerated output file
    // path: output file boundaries are a bin-packing artifact, and a
    // retry landing in the same trigger as fresh traffic would share
    // output files, so a per-output-file digest would never match the
    // ledger and the redelivered wave would double-bill.
    val ingest = HardenedIngest.stage(spark, inboxDir = "/unused",
      legsDir, ledgerDir, checkpointRoot, gate).copy(
      source = s => s.readStream.schema(preratedLiveSchema)
        .parquet(preratedDir)
        .filter(col("guided"))
        .select(col("call_id"), col("seq"), col("total"),
          col("duration_sec"), col("src_file").as("__src")))
    // assembly reads the hardened legs store (extended schema with the
    // batch_id partition column)
    val base = stages(spark, "/nonexistent-inbox", legsDir, callsDir,
      "/nonexistent-rated", checkpointRoot,
      Seq((0L, Long.MaxValue, 0L)), legTimeoutMs)
    val assembly = base(1).copy(source = s => s.readStream
      .schema(HardenedIngest.hardenedLegsSchema).parquet(legsDir)
      .drop("batch_id"))
    val attach = tariffAttachStage(spark, callsDir, enrichedDir,
      checkpointRoot, tariffDim)
    val rating = ratingStageLiveTariff(spark, enrichedDir, ratedDir,
      checkpointRoot)
    val ss = Seq(pre, ingest, assembly, attach, rating)
    ss.foreach(runner.register)
    runner.onRefresh(pre.name, () => numberDim.refresh())
    runner.onRefresh(attach.name, () => tariffDim.refresh())
    ss.map(_.name)
  }

  /** Prerated-store schema the downstream ingest reads (the partition
    * column `guided` included so the filter prunes whole partitions). */
  private def preratedSchema: StructType = StructType(Seq(
    StructField("call_id", StringType),
    StructField("seq", IntegerType),
    StructField("total", IntegerType),
    StructField("duration_sec", DoubleType),
    StructField("reason", StringType),
    StructField("src_file", StringType),
    StructField("guided", BooleanType)))

  /** Register the FULL mediation chain with prerating ahead of leg
    * assembly: prerating → ingest (validating, reading the prerated
    * store's guided partition) → assembly → rating. The ingest stage is
    * the standard one with only its SOURCE swapped to the prerated
    * store — the [[StageSpec.source]] seam; transform and sink are
    * untouched. */
  def registerWithPrerating(runner: PipelineRunner, spark: SparkSession,
      rawInbox: String, ranges: DataFrame, preratedDir: String,
      legsDir: String, callsDir: String, ratedDir: String,
      checkpointRoot: String, tiers: Seq[(Long, Long, Long)],
      defaultCc: String = "49", legTimeoutMs: Long = -1L): Seq[String] = {
    val hadoop = spark.sparkContext.hadoopConfiguration
    Seq(rawInbox, preratedDir, legsDir, callsDir, ratedDir).foreach { d =>
      val p = new org.apache.hadoop.fs.Path(d)
      p.getFileSystem(hadoop).mkdirs(p)
    }
    val pre = preratingStage(spark, rawInbox, ranges, preratedDir,
      checkpointRoot, defaultCc)
    val base = stages(spark, "/nonexistent-inbox", legsDir, callsDir,
      ratedDir, checkpointRoot, tiers, legTimeoutMs)
    val ingest = base.head.copy(source = s => s.readStream
      .schema(preratedSchema).parquet(preratedDir)
      .filter(col("guided"))
      .select(col("call_id"), col("seq"), col("total"),
        col("duration_sec")))
    val ss = pre +: ingest +: base.tail
    ss.foreach(runner.register)
    ss.map(_.name)
  }

  /** Optional FOURTH stage: a fraud tap — a SECOND consumer of the legs
    * store (the reference's multi-consumer queue fan-out,
    * `MFramework.cpp:1537-1571`) running [[VelocityMonitor]] over leg
    * arrivals per account and appending alarms to `alarmsDir`. Reading
    * the same store as `leg_assembly` through the same `_spark_metadata`
    * log with its OWN checkpoint demonstrates the one-producer/
    * many-consumer property: each consumer tracks its own offsets, and
    * killing/restarting either never perturbs the other. The tap is
    * side-channel — registering it changes nothing about the billing
    * path. */
  def fraudStage(spark: SparkSession, legsDir: String, alarmsDir: String,
      checkpointRoot: String, windowSec: Long = 3600L,
      threshold: Long = 3L): StageSpec = {
    import spark.implicits._
    StageSpec(
      "fraud_tap",
      source = s => s.readStream.schema(legsStoreSchema).parquet(legsDir),
      transform = df => df.filter(col("valid"))
        .select(
          split(col("call_id"), ":").getItem(0).cast(LongType)
            .as("user_id"),
          split(col("call_id"), ":").getItem(1).cast(LongType)
            .as("event_id"),
          // leg arrival "time": the event id doubles as arrival seconds
          // in the fixture wire; a production feed carries a leg ts
          split(col("call_id"), ":").getItem(1).cast(LongType)
            .as("sec"))
        .as[VEvent]
        .groupByKey(_.user_id)
        .transformWithState(new VelocityMonitor(windowSec, threshold),
          TimeMode.None(), OutputMode.Append())
        .toDF(),
      sink = df => df.writeStream.format("parquet")
        .option("path", alarmsDir)
        .option("checkpointLocation", s"$checkpointRoot/fraud_tap")
        .outputMode("append"))
  }

  /** Optional FIFTH stage: the live trunk-concurrency gauge — a THIRD
    * consumer of the legs store running [[TrunkGauge]] (the streaming
    * twin of the oracle-checked q257 sweep line): each valid leg becomes
    * a [start, end) circuit interval on its account-derived trunk, and
    * every micro-batch appends the updated per-trunk gauge (calls, now,
    * peak, peak second). Peak is monotone, so the store's
    * `max(peak_concurrent)` per trunk IS the final answer — probe-pinned
    * equal to the batch q257 on the same legs.
    *
    * `horizonSec`/`maxDeltas` bound state for time-ordered feeds (the
    * production mode); a feed with unbounded arrival disorder (the
    * chain probe's shuffled waves) must size them to the full span or
    * accept the documented collapsed-past trade-off
    * (`TrunkGauge.scala:26-31`). */
  def gaugeStage(spark: SparkSession, legsDir: String, gaugeDir: String,
      checkpointRoot: String, trunks: Int = 50,
      horizonSec: Long = 86400L, maxDeltas: Int = 8192): StageSpec = {
    import spark.implicits._
    require(trunks >= 1, s"trunks must be >= 1, got $trunks")
    StageSpec(
      "trunk_gauge",
      source = s => s.readStream.schema(legsStoreSchema).parquet(legsDir),
      transform = df => df.filter(col("valid"))
        .select(
          concat(lit("T"), (split(col("call_id"), ":").getItem(0)
            .cast(LongType) % trunks).cast(StringType)).as("trunk"),
          // leg "time": the event id doubles as start seconds in the
          // fixture wire (the fraudStage convention); a production feed
          // carries a real start ts
          split(col("call_id"), ":").getItem(1).cast(LongType)
            .as("start_sec"),
          (split(col("call_id"), ":").getItem(1).cast(LongType) +
            expr("CAST(round(duration_sec) AS BIGINT)")).as("end_sec"))
        .as[TCall]
        .groupByKey(_.trunk)
        .transformWithState(new TrunkGauge(horizonSec, maxDeltas),
          TimeMode.None(), OutputMode.Append())
        .toDF(),
      sink = df => df.writeStream.format("parquet")
        .option("path", gaugeDir)
        .option("checkpointLocation", s"$checkpointRoot/trunk_gauge")
        .outputMode("append"))
  }

  /** Rated-record wire layout of the packet-plane fan-out: the rating
    * stage's [[RatedRec]] columns plus the `route_ver` audit stamp
    * (which dim version fanned this record — the guiding/tariff audit
    * discipline applied to routing). The demux layout consumes the
    * `dest` routing column itself; it never rides in the data files. */
  val fanoutWireSchema: StructType = StructType(Seq(
    StructField("account_id", LongType),
    StructField("event_id", LongType),
    StructField("units", LongType),
    StructField("cum_units", LongType),
    StructField("charge_centi", LongType),
    StructField("route_ver", LongType)))

  private def ratedStoreSchema: StructType = StructType(Seq(
    StructField("account_id", LongType),
    StructField("event_id", LongType),
    StructField("units", LongType),
    StructField("cum_units", LongType),
    StructField("charge_centi", LongType),
    StructField("invoice_bucket", LongType)))

  /** The fan-out ROUTING dimension as a [[VersionedDim]] with
    * fail-at-resolve validation (the [[VersionedDim]] contract — the
    * first consumer of a bad version fails its batch loudly, nothing
    * half-routes): `(dest: String, enabled: Boolean)`, one row per
    * consumer class, dest path-safe and unique, and AT LEAST ONE class
    * enabled — a version that disables every consumer would make the
    * fan-out stage commit batches that no consumer ever sees (the
    * rated store keeps the records, but the delivery is
    * checkpoint-committed and will not replay when a class re-enables;
    * pausing a delivery is a consumer-side stop, not an empty dim). */
  def routingDim(spark: SparkSession, dimDir: String): VersionedDim =
    new VersionedDim(spark, dimDir, validate = dim => {
      val rows = dim.select(col("dest").cast(StringType),
        col("enabled").cast(BooleanType)).collect() // dim-grain: |classes|
      require(rows.nonEmpty, "routing dim: no consumer classes")
      val dests = rows.map(_.getString(0))
      require(dests.forall(d => d != null && d.matches("[A-Za-z0-9_-]+")),
        s"routing dim: dest values must be path-safe, got " +
          dests.mkString(", "))
      require(dests.distinct.length == dests.length,
        s"routing dim: duplicate dest class in ${dests.mkString(", ")}")
      require(rows.exists(_.getBoolean(1)),
        "routing dim: every consumer class is disabled — rated records " +
          "would be committed past delivery; stop the consumer instead")
      dim
    })

  /** Optional fan-out stage — the reference dispatcher's `t=` demux
    * COMPOSED into the running chain (`MFramework.cpp:1372-1385,
    * 1537-1571`): every rated invoice line leaves the chain over the
    * packet plane, fanned to EVERY enabled consumer class of the
    * routing dim (invoice + fraud tap in the shipped topology), one
    * [[PacketQueueSink.writeBatchDemux]] per micro-batch. The dim is
    * re-resolved EVERY batch (the live-dim discipline — a re-route is a
    * published dim version, `route_ver` stamps each record with the
    * version that fanned it, and the NEXT batch lands on the new class
    * set with no stage restart), and each consumer class reads its own
    * archived packetqueue downstream — the archival-compatible fan-out
    * the SCALING.md round-12 decision prescribes (archival is safe
    * exactly because every consumer owns its queue).
    *
    * Scale: the fan-out multiplies rows by |enabled classes| (a config
    * constant, broadcast join) and the demux write is one
    * executor-parallel partitioned CSV job; the driver touches only
    * part files × classes (never rows). Misroutes — a dim class with no
    * registered queue — fail the batch loudly inside the demux. */
  def demuxFanoutStage(spark: SparkSession, ratedDir: String,
      routeDim: VersionedDim,
      destinations: Map[String, Seq[graft.sources.PacketQueueSink.Dest]],
      checkpointRoot: String, session: String = "1"): StageSpec =
    StageSpec(
      "rated_fanout",
      source = s => s.readStream.schema(ratedStoreSchema)
        .parquet(ratedDir),
      // column order pinned to fanoutWireSchema minus route_ver (the
      // wire is positional headered CSV); invoice_bucket is the rated
      // store's sink-layout artifact, not a wire column
      transform = df => df.select(col("account_id"), col("event_id"),
        col("units"), col("cum_units"), col("charge_centi")),
      sink = df => df.writeStream
        .option("checkpointLocation", s"$checkpointRoot/rated_fanout")
        .foreachBatch { (batch: DataFrame, batchId: Long) =>
          val (ver, route) = routeDim.resolve()
          val enabled = route.filter(col("enabled")).select(col("dest"))
          val fanned = batch.withColumn("route_ver", lit(ver))
            .crossJoin(broadcast(enabled)) // |enabled| is config-grain
          graft.sources.PacketQueueSink.writeBatchDemux(spark, fanned,
            batchId, "dest", destinations, session)
        })

  /** Downstream INVOICE consumer of the fan-out: its own archived
    * packetqueue → parquet invoice-export store. Exactly-once comes
    * from the packetqueue source's offset log + its own checkpoint —
    * killing/restarting producer or consumer never loses or duplicates
    * a rated line (spec-pinned in DemuxChainSpec). */
  def invoiceConsumerStage(spark: SparkSession, queueDir: String,
      exportDir: String, checkpointRoot: String): StageSpec =
    StageSpec(
      "invoice_consumer",
      source = s => s.readStream.format("packetqueue")
        .schema(fanoutWireSchema)
        .option("path", queueDir).option("archive", "true").load(),
      transform = identity,
      sink = df => df.writeStream.format("parquet")
        .option("path", exportDir)
        .option("checkpointLocation", s"$checkpointRoot/invoice_consumer")
        .outputMode("append"))

  /** Downstream FRAUD consumer of the fan-out: its own archived
    * packetqueue feeding [[VelocityMonitor]] UNCHANGED (the q246
    * streaming screen — user is the account, the event id doubles as
    * arrival seconds, the [[fraudStage]] fixture convention). The same
    * stateful operator that tapped the legs store now rides the packet
    * plane: only the SOURCE seam moved. */
  def fraudConsumerStage(spark: SparkSession, queueDir: String,
      alarmsDir: String, checkpointRoot: String,
      windowSec: Long = 3600L, threshold: Long = 3L): StageSpec = {
    import spark.implicits._
    StageSpec(
      "fraud_consumer",
      source = s => s.readStream.format("packetqueue")
        .schema(fanoutWireSchema)
        .option("path", queueDir).option("archive", "true").load(),
      transform = df => df
        .select(col("account_id").as("user_id"), col("event_id"),
          col("event_id").as("sec"))
        .as[VEvent]
        .groupByKey(_.user_id)
        .transformWithState(new VelocityMonitor(windowSec, threshold),
          TimeMode.None(), OutputMode.Append())
        .toDF(),
      sink = df => df.writeStream.format("parquet")
        .option("path", alarmsDir)
        .option("checkpointLocation", s"$checkpointRoot/fraud_consumer")
        .outputMode("append"))
  }

  /** Register the packet-plane fan-out behind an existing chain's rated
    * store: fan-out stage + the two shipped consumers (invoice export,
    * fraud tap), each consuming its own archived queue. Returns stage
    * names in start order (fan-out first — the consumers' queues are
    * pre-created so either side may start first, the [[register]]
    * convention). */
  def registerFanout(runner: PipelineRunner, spark: SparkSession,
      ratedDir: String, routeDim: VersionedDim, fanBase: String,
      exportDir: String, alarmsDir: String, checkpointRoot: String,
      windowSec: Long = 3600L, threshold: Long = 3L): Seq[String] = {
    val dests = Map(
      "invoice" -> Seq(graft.sources.PacketQueueSink.Dest(
        s"$fanBase/invoice/data", s"$fanBase/invoice/queue")),
      "fraud" -> Seq(graft.sources.PacketQueueSink.Dest(
        s"$fanBase/fraud/data", s"$fanBase/fraud/queue")))
    val hadoop = spark.sparkContext.hadoopConfiguration
    (dests.values.flatten.flatMap(d => Seq(d.dataDir, d.queueDir)).toSeq
        :+ ratedDir).foreach { d =>
      val p = new org.apache.hadoop.fs.Path(d)
      p.getFileSystem(hadoop).mkdirs(p)
    }
    val ss = Seq(
      demuxFanoutStage(spark, ratedDir, routeDim, dests, checkpointRoot),
      invoiceConsumerStage(spark, s"$fanBase/invoice/queue", exportDir,
        checkpointRoot),
      fraudConsumerStage(spark, s"$fanBase/fraud/queue", alarmsDir,
        checkpointRoot, windowSec, threshold))
    ss.foreach(runner.register)
    ss.map(_.name)
  }

  /** Register the chain into a runner; returns stage names in start
    * order. */
  def register(runner: PipelineRunner, spark: SparkSession,
      inboxDir: String, legsDir: String, callsDir: String,
      ratedDir: String, checkpointRoot: String,
      tiers: Seq[(Long, Long, Long)], legTimeoutMs: Long = -1L)
      : Seq[String] = {
    // pre-create the handoff dirs so every stage can start before its
    // upstream has committed a first batch (the reference pre-creates
    // its queue directories the same way)
    val hadoop = spark.sparkContext.hadoopConfiguration
    Seq(inboxDir, legsDir, callsDir, ratedDir).foreach { d =>
      val p = new org.apache.hadoop.fs.Path(d)
      p.getFileSystem(hadoop).mkdirs(p)
    }
    val ss = stages(spark, inboxDir, legsDir, callsDir, ratedDir,
      checkpointRoot, tiers, legTimeoutMs)
    ss.foreach(runner.register)
    ss.map(_.name)
  }

  /** Late-leg reconciliation — the batch run that consumes what the
    * chain deliberately leaves behind ([[stages]] keeps timeout-flushed
    * `complete=false` calls unrated, and legs that arrive after their
    * call's flush re-open state but never complete): recompute the
    * per-call usage from the FULL leg store under exactly the
    * assembler's semantics (valid legs, seq ∈ [1,64], first arrival per
    * (call, seq), complete ⇔ seqs are exactly {1..declared}, declared ≤
    * 64 — LegAssembler's bitmask contract), then emit changed-only
    * correction invoice lines against the streamed rated store via
    * [[graft.queries.BillingQ.correctionLines]] (oracle-pinned q265).
    * By tier telescoping, Σ(streamed + corrections) ≡ the batch invoice
    * over the complete leg set — spec-pinned.
    *
    * Redelivered legs must be byte-identical to their original (the
    * mediation duplicate contract); the assembler keeps the first
    * arrival and this recompute keeps an arbitrary one, which only
    * coincide under that contract. */
  def reconcile(spark: SparkSession, legsDir: String, ratedDir: String,
      tiers: Seq[(Long, Long, Long)]): DataFrame = {
    // explicit schema: partition-value inference would type the `valid`
    // partition column STRING when only one verdict is present
    val calls = spark.read.schema(legsStoreSchema).parquet(legsDir)
      .filter(col("valid") && col("seq").between(1, 64) &&
        col("total") >= 1)
      .dropDuplicates("call_id", "seq")
      .groupBy(col("call_id"))
      .agg(count(lit(1)).as("n"), max(col("total")).as("t"),
        max(col("seq")).as("mx"), sum(col("duration_sec")).as("dur"))
      .filter(col("n") === col("t") && col("mx") <= col("t") &&
        col("t") <= 64)
    val finalUsage = calls.select(
      split(col("call_id"), ":").getItem(0).cast(LongType)
        .as("account_id"),
      expr("CAST(round(dur) AS BIGINT)").as("units"))
    val original = spark.read.parquet(ratedDir)
      .select(col("account_id").cast(LongType).as("account_id"),
        col("charge_centi"))
    graft.queries.BillingQ.correctionLines(finalUsage, original, tiers)
  }

  /** The billing handoff: roll the streamed invoice lines up per
    * account and run the ordered tax chain — the q239
    * [[EventQ.invoiceRun]] shape (same columns), reading the rated
    * store the chain maintains. Because the online rater telescopes
    * exactly (Σ marginal charges ≡ T(cycle total)), this equals the
    * batch invoice run on the same usage — no streamed-vs-batch drift
    * to reconcile. */
  def invoice(spark: SparkSession, ratedDir: String,
      taxes: Seq[(String, Long, Boolean)]): DataFrame =
    EventQ.cascadedTaxes(
      spark.read.parquet(ratedDir)
        .groupBy(col("account_id"))
        .agg(count(lit(1)).as("n_records"),
          sum(greatest(col("units"), lit(0L))).as("total_units"),
          sum(col("charge_centi")).as("charge_centi")),
      taxes)
}
