package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.etl.IncrementalBatch

/** High-watermark incremental batch: exactly-the-delta per run, skipped
  * empty runs, at-least-once replay after a crash between process and
  * commit, and the pushed-down watermark predicate that makes the
  * incremental read cheap at scale.
  */
class IncrementalBatchSpec extends SparkSpec {

  import spark.implicits._

  private def tmp(prefix: String) = Files.createTempDirectory(prefix).toString

  test("first run takes everything; later runs take only the new tail") {
    val data = tmp("graft_ib_data")
    val state = tmp("graft_ib_state")
    Seq((1L, 10L, "a"), (2L, 20L, "b")).toDF("id", "ts", "v")
      .write.mode("overwrite").parquet(data)
    var seen = Seq.empty[Long]
    def step(): Option[Long] =
      IncrementalBatch.run(spark.read.parquet(data), "ts", state) { d =>
        seen = d.select("id").as[Long].collect().toSeq.sorted
      }
    assert(step() == Some(20L) && seen == Seq(1L, 2L))
    // append newer rows + one late row at the old watermark (skipped)
    Seq((3L, 20L, "late"), (4L, 30L, "c"), (5L, 40L, "d"))
      .toDF("id", "ts", "v").write.mode("append").parquet(data)
    assert(step() == Some(40L) && seen == Seq(4L, 5L))
    // nothing new: process must not run, watermark must not move
    seen = Seq(-1L)
    assert(step() == None && seen == Seq(-1L))
    assert(IncrementalBatch.watermark(state) == Some(40L))
  }

  test("a crash after process but before commit replays the same delta") {
    val data = tmp("graft_ib_data2")
    val state = tmp("graft_ib_state2")
    Seq((1L, 10L)).toDF("id", "ts").write.mode("overwrite").parquet(data)
    var calls = 0
    intercept[RuntimeException] {
      IncrementalBatch.run(spark.read.parquet(data), "ts", state) { _ =>
        calls += 1; throw new RuntimeException("sink died")
      }
    }
    assert(IncrementalBatch.watermark(state).isEmpty, "no commit after a crash")
    IncrementalBatch.run(spark.read.parquet(data), "ts", state)(_ => calls += 1)
    assert(calls == 2 && IncrementalBatch.watermark(state) == Some(10L))
  }

  test("timestamp watermark columns round-trip through epoch micros") {
    val data = tmp("graft_ib_data3")
    val state = tmp("graft_ib_state3")
    Seq("2024-01-01 00:00:00", "2024-01-02 00:00:00").toDF("s")
      .select(col("s").cast("timestamp").as("ts"))
      .write.mode("overwrite").parquet(data)
    var n = -1L
    IncrementalBatch.run(spark.read.parquet(data), "ts", state)(d => n = d.count())
    assert(n == 2)
    IncrementalBatch.run(spark.read.parquet(data), "ts", state)(d => n = d.count())
    assert(n == 2, "no new data: process skipped, count unchanged from run 1")
    Seq("2024-01-03 00:00:00").toDF("s")
      .select(col("s").cast("timestamp").as("ts"))
      .write.mode("append").parquet(data)
    IncrementalBatch.run(spark.read.parquet(data), "ts", state)(d => n = d.count())
    assert(n == 1)
  }

  test("the watermark predicate pushes down into the parquet scan") {
    val data = tmp("graft_ib_data4")
    val state = tmp("graft_ib_state4")
    Seq((1L, 10L)).toDF("id", "ts").write.mode("overwrite").parquet(data)
    IncrementalBatch.run(spark.read.parquet(data), "ts", state)(_ => ())
    Seq((2L, 20L)).toDF("id", "ts").write.mode("append").parquet(data)
    var plan = ""
    IncrementalBatch.run(spark.read.parquet(data), "ts", state) { d =>
      plan = d.queryExecution.executedPlan.toString
    }
    assert(plan.contains("GreaterThan(ts,10)"),
      s"watermark filter not pushed into the scan:\n$plan")
  }

  test("non-time watermark column types are rejected") {
    val df = Seq(("x", 1L)).toDF("s", "ts")
    intercept[IllegalArgumentException] {
      IncrementalBatch.run(df, "s", tmp("graft_ib_state5"))(_ => ())
    }
  }
}
