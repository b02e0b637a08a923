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
}
