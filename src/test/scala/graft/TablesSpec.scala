package graft

import org.apache.spark.sql.types.TimestampType

/** Regression for moving the `nanosAsLong` conf out of [[graft.core.Tables.load]]:
  * a factory-default session must still read the TIMESTAMP(NANOS) `events`
  * table correctly, with no conf mutation happening inside `load`.
  */
class TablesSpec extends SparkSpec {

  test("factory-built session reads events (nanos ts) without load-time conf mutation") {
    // The shared session comes from GraftSession.builder — the only place
    // nanosAsLong is now set.
    assert(spark.conf.get("spark.sql.legacy.parquet.nanosAsLong") == "true")

    val events = core.Tables.load(spark, sfDir, "events")
    assert(events.schema("ts").dataType == TimestampType)
    assert(events.limit(1).count() == 1)
  }

  test("load does not mutate session conf") {
    val before = spark.conf.getAll
    core.Tables.load(spark, sfDir, "lineitem")
    core.Tables.load(spark, sfDir, "events")
    assert(spark.conf.getAll == before)
  }

  test("scaledConf sizes partitions with the data, clamped at both ends") {
    import graft.core.GraftSession.scaledConf
    // tiny local volume → the floor
    assert(scaledConf(1L << 20)("spark.sql.shuffle.partitions") == "32")
    // 1 TB / 256MB = 4096
    assert(scaledConf(1L << 40)("spark.sql.shuffle.partitions") == "4096")
    // 100 TB hits the 200k cap (AQE coalesces, skew splits have headroom)
    val conf100tb = scaledConf(100L << 40)
    assert(conf100tb("spark.sql.shuffle.partitions") == "200000")
    assert(conf100tb("spark.sql.files.maxPartitionBytes") == (256L << 20).toString)
    // scan and shuffle targets stay consistent at a custom target size
    val c = scaledConf(1L << 40, targetPartitionBytes = 128L << 20)
    assert(c("spark.sql.shuffle.partitions") == "8192")
    assert(c("spark.sql.adaptive.advisoryPartitionSizeInBytes") == (128L << 20).toString)
  }
}
