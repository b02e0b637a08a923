package graft.core

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Table loaders for the driver-provided parquet fixtures (TESTDATA.md).
  *
  * The reference engine moves bulk data as files referenced from control
  * packets (`MFramework.cpp:1261-1302`); here the bulk plane is parquet read
  * through Spark's vectorized reader so Catalyst can push filters/pruning
  * into the scan.
  */
object Tables {

  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  /** Load one fixture table from a scale-factor directory.
    *
    * `events.ts` has shipped in two physical forms across fixture
    * generations: parquet TIMESTAMP(NANOS) — which Spark reads as a long
    * under `nanosAsLong` (set by [[GraftSession.builder]]) and we
    * normalize to a microsecond TIMESTAMP here (truncating, matching
    * DuckDB's nanos→micros read path) — and plain micros with
    * isAdjustedToUTC=false, which the session reads directly as a
    * session-timezone TIMESTAMP (`inferTimestampNTZ` off). Either way
    * every downstream operator sees one plain timestamp column, and
    * `load` itself never mutates session conf so concurrent queries see
    * a stable session.
    */
  def load(spark: SparkSession, dir: String, name: String): DataFrame = {
    val df = spark.read.parquet(s"$dir/$name.parquet")
    if (name == "events") normalizeNanos(df) else df
  }

  private def normalizeNanos(df: DataFrame): DataFrame = {
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.types._
    df.schema.fields.find(f => f.name == "ts" && f.dataType == LongType) match {
      case Some(_) => df.withColumn("ts", expr("timestamp_micros(ts div 1000)"))
      case None    => df
    }
  }
}
