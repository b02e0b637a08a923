package graft.etl

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Incremental day-over-day TOTAL-VARIATION drift for an append-only
  * event feed — the categorical-mix monitor
  * ([[graft.queries.AnalyticsQ.tvDriftCard]], oracle-checked as q315)
  * joined to the incremental-store family ([[IncrementalDedup]] /
  * [[IncrementalSpanDedup]] / [[IncrementalSemDedup]] /
  * [[IncrementalAnn]]): batch q315 re-aggregates the whole corpus per
  * run, so a live feed could not ask "did tonight's class mix move"
  * without re-scanning history. Here the store keeps per-batch
  * (day, class, count) DELTAS — (day, class)-grain rows, microscopic
  * next to the events that produced them — and drift derives from the
  * store alone:
  *
  *  - `counts/batch_id=N/` — the batch's day×class count deltas,
  *    partitioned by the arrival batch. The partition IS the
  *    idempotence key: a retried micro-batch overwrites its own
  *    partition (dynamic overwrite), so a replay can never
  *    double-count a day — the [[IncrementalDedup.sink]] contract.
  *    Late rows for an OLD day are just more deltas for that day;
  *    the fold below re-reads them into the day's mix, so drift
  *    self-corrects as stragglers land (the q265 reconciliation
  *    stance, here with no state to corrupt).
  *
  * [[drift]] folds the store to the SAME table the batch card computes
  * on the union of all batches — spec-pinned exact, including the
  * first-day NULL and vanished-class mass — so the store is always
  * auditable against one batch replay. [[deltaDrift]] is the per-batch
  * read: only the days the batch TOUCHED plus each one's next observed
  * day (the two rows whose TVD a new delta can move) — the live
  * monitor emits those into its drift log with the batch id, an
  * append-only "drift as of batch N" audit trail.
  *
  * Scale: the store is (day × class × batches)-grain — never
  * event-grain; the fold is one store read + |days|·|classes| grid
  * windows (the q315 plan on a tiny input). A years-long store with
  * thousands of batches compacts by rewriting `counts/` at one
  * partition per day (an offline rebuild, the family's standard
  * lever); until then parquet min/max pruning on `day` keeps
  * [[deltaDrift]] reads at touched-days cost. */
object IncrementalDrift {

  private def countsPath(store: String) = s"$store/counts"

  /** Store-row schema. */
  private[graft] val countSchema: StructType = StructType(Seq(
    StructField("day", LongType),
    StructField("t", StringType),
    StructField("c", LongType),
    StructField("batch_id", LongType)))

  /** Aggregate a batch of events (`ts`, `typeCol`) to its (day, class)
    * deltas — the only event-grain work in the family. */
  private def deltas(batch: DataFrame, typeCol: String): DataFrame =
    batch.select(
        datediff(expr("CAST(ts AS DATE)"), lit("2024-01-01"))
          .cast(LongType).as("day"),
        col(typeCol).as("t"))
      .groupBy(col("day"), col("t")).agg(count(lit(1)).as("c"))

  /** Append a batch's deltas under its own `batch_id` partition
    * (dynamic overwrite — a retry replaces itself, never double-counts). */
  def append(batch: DataFrame, storePath: String, batchId: Long,
      typeCol: String = "event_type"): Unit =
    deltas(batch, typeCol)
      .withColumn("batch_id", lit(batchId))
      .write.partitionBy("batch_id")
      .option("partitionOverwriteMode", "dynamic")
      .mode("overwrite").parquet(countsPath(storePath))

  private def readCounts(spark: SparkSession, storePath: String)
      : DataFrame = {
    val p = new org.apache.hadoop.fs.Path(countsPath(storePath))
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(p)) spark.read.parquet(countsPath(storePath))
    else spark.createDataFrame(
      spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], countSchema)
  }

  /** The full drift table from the store — EXACTLY
    * [[graft.queries.AnalyticsQ.tvDriftCard]] on the union of every
    * appended batch (spec-pinned): (day, n_events, tv_ppm), first
    * observed day NULL, classes absent from a day contributing their
    * lost mass through the day×class grid. */
  def drift(spark: SparkSession, storePath: String): DataFrame = {
    // compact the per-batch deltas to (day, class) — tiny — then the
    // q315 grid construction verbatim
    val c = readCounts(spark, storePath)
      .groupBy(col("day"), col("t")).agg(sum(col("c")).as("c"))
      .localCheckpoint()
    val grid = c.select(col("day")).distinct()
      .crossJoin(broadcast(c.select(col("t")).distinct()))
      .join(c, Seq("day", "t"), "left")
      .withColumn("c", coalesce(col("c"), lit(0L)))
    val wd = Window.partitionBy(col("day"))
    val wt = Window.partitionBy(col("t")).orderBy(col("day"))
    grid
      .withColumn("n", sum(col("c")).over(wd))
      .withColumn("p_ppm", expr("(1000000 * c) DIV n"))
      .withColumn("prev_ppm", lag(col("p_ppm"), 1).over(wt))
      .groupBy(col("day"))
      .agg(max(col("n")).as("n_events"),
        sum(abs(col("p_ppm") - col("prev_ppm"))).as("__s"))
      .withColumn("tv_ppm", expr("__s DIV 2"))
      .select(col("day"), col("n_events"), col("tv_ppm"))
  }

  /** The rows a batch's deltas can MOVE: the days the batch touched
    * plus each one's next observed day (its mix is the `prev` of that
    * pair). Derived from the store AFTER [[append]]; day-grain. */
  def deltaDrift(spark: SparkSession, storePath: String, batchId: Long)
      : DataFrame = {
    val touched = readCounts(spark, storePath)
      .filter(col("batch_id") === batchId)
      .select(col("day")).distinct()
    val full = drift(spark, storePath)
    val wAll = Window.orderBy(col("day"))
    val affected = full
      .withColumn("prev_day", lag(col("day"), 1).over(wAll))
      .join(touched.select(col("day").as("__td")),
        col("day") === col("__td") || col("prev_day") === col("__td"),
        "left_semi")
    affected.select(col("day"), col("n_events"), col("tv_ppm"))
  }

  /** Streaming composition ([[IncrementalDedup.sink]] pattern): per
    * micro-batch, append the batch's deltas under `batch_id=<id>` and
    * emit the affected days' drift rows — stamped with the batch id —
    * into `driftLogPath` (append-only audit: "the drift as of batch N";
    * the latest row per day is the current verdict, and a late
    * straggler's correction is VISIBLE as a new row rather than a
    * silent rewrite). */
  def sink(spark: SparkSession, storePath: String, driftLogPath: String,
      typeCol: String = "event_type"): (DataFrame, Long) => Unit =
    (batch, batchId) => {
      append(batch, storePath, batchId, typeCol)
      deltaDrift(spark, storePath, batchId)
        .withColumn("batch_id", lit(batchId))
        .write.partitionBy("batch_id")
        .option("partitionOverwriteMode", "dynamic")
        .mode("overwrite").parquet(driftLogPath)
    }
}
