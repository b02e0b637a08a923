package graft.etl

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Audit/log sink — the reference's LoggerWriter as data
  * (`LoggerWriter.cpp:171-224`): single-char level codes, a bitmask
  * global filter (`globalLevel & msgLevel`, `:178`), the
  * `s/c/l/m` log-packet layout (`:208-213`), and a partitioned sink in
  * place of the AMQP LOGGER_DATA queue.
  */
object AuditLog {

  /** Level bits and codes per the reference's switch (`LoggerWriter.cpp:
    * 182-205`). */
  val Levels: Map[String, Int] = Map(
    "I" -> 1, "D" -> 2, "W" -> 4, "C" -> 8, "E" -> 16, "A" -> 32, "N" -> 64)

  private val levelBit: Column => Column = c =>
    Levels.foldLeft(lit(0)) { case (acc, (code, bit)) =>
      when(c === code, bit).otherwise(acc)
    }

  /** Keep messages whose level passes the global mask. */
  def levelFilter(df: DataFrame, levelCol: Column, globalMask: Int): DataFrame =
    df.filter((lit(globalMask).bitwiseAND(levelBit(levelCol))) =!= 0)

  /** Format rows as reference log packets:
    * `s=1\nc=<component>\nl=<level>\nm=<time>|<session>|<text>`. */
  def formatPacket(component: Column, level: Column, session: Column,
      time: Column, text: Column): Column =
    concat(
      lit("s=1\nc="), component,
      lit("\nl="), level,
      lit("\nm="), date_format(time, "yyyy/MM/dd HH:mm:ss"), lit("|"), session, lit("|"), text)

  /** Level-filtered, day/level-partitioned audit sink. */
  def write(df: DataFrame, levelCol: String, timeCol: String,
      globalMask: Int, path: String): Unit =
    levelFilter(df, col(levelCol), globalMask)
      .withColumn("log_day", to_date(col(timeCol)))
      .write.mode("append").partitionBy("log_day", levelCol).parquet(path)

  /** Attach free data-quality counters to a pipeline stage: row count
    * plus a null count per listed column, collected by Spark's
    * `Observation` machinery DURING the action that materializes `df` —
    * no second scan, no extra job, works at any scale because the
    * metrics are accumulator-merged map-side. Read
    * `observation.get` AFTER an action has run. The batch analogue of
    * the reference's per-session processed/error counters
    * (`MFramework.cpp:1261-1302` audits batches as they land). */
  def observed(df: DataFrame, name: String, nullCheckCols: Seq[String])
      : (DataFrame, org.apache.spark.sql.Observation) = {
    val obs = org.apache.spark.sql.Observation(name)
    val metrics = count(lit(1)).as("n_rows") +:
      nullCheckCols.map(c => count(when(col(c).isNull, 1)).as(s"n_null_$c"))
    (df.observe(obs, metrics.head, metrics.tail: _*), obs)
  }
}
