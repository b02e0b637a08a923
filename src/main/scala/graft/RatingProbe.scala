package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Dev probe isolating q226_timeband_rating's 10× ratio: the fixture =
  * tariff-dim build (a distinct over the corpus feeding the broadcast)
  * + the as-of/minute-fold operator + a global orderBy(call_id) string
  * sort. Times the operator with and without the fixture sort at 1×
  * and 10× so the ratio's owner is measured, not guessed.
  */
object RatingProbe {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = core.GraftSession.builder(s"local[$cpus]", cpus.toInt).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val oneX = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val tenX = sys.env.getOrElse("SPARK_GRAFT_SCALE_DIR", "/tmp/graft_scale")
    def noop(df: DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()
    def time(f: => Unit): Double = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }
    def rated(dir: String): DataFrame = {
      val s = spark
      import s.implicits._
      val ev = core.Tables.load(spark, dir, "events")
      val cdrs = ev.select(col("event_id").as("call_id"),
        col("event_type").as("call_type"),
        col("ts").cast(LongType).as("start_sec"),
        (lit(1L) + abs(expr("CAST(round(value) AS BIGINT)")) % 10L)
          .as("dur_min"))
      val tariffs = ev.select(col("event_type")).distinct()
        .crossJoin(broadcast(Seq((0L, 7L), (1706659200L, 9L),
          (1709251200L, 11L)).toDF("valid_from", "b0")))
        .select(col("event_type").as("call_type"), col("valid_from"),
          (col("b0") + length(col("event_type")).cast(LongType))
            .as("base_centi"))
      queries.EventQ.timeBandCharges(cdrs, tariffs)
    }
    Seq("1x" -> oneX, "10x" -> tenX).foreach { case (label, dir) =>
      noop(rated(dir).orderBy(col("call_id"))) // warm
      val tSorted = Seq.fill(3)(time(noop(rated(dir)
        .orderBy(col("call_id"))))).min
      val tPlain = Seq.fill(3)(time(noop(rated(dir)))).min
      println(f"q226 $label sorted=$tSorted%.2fs unsorted=$tPlain%.2fs")
    }
    spark.stop()
  }
}
