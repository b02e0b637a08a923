package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.etl.Layout

/** Data-layout writers: range clustering and z-ordering must produce
  * files whose key ranges are narrow/disjoint — that is what parquet
  * min/max pruning skips on at scale.
  */
class LayoutSpec extends SparkSpec {

  import spark.implicits._

  test("zorder2 interleaves bits exactly") {
    // x=0b101, y=0b011 → z bits (x0,y0,x1,y1,x2,y2) = 1,1,0,1,1,0 → 0b011011
    val z = Seq((5L, 3L)).toDF("x", "y")
      .select(Layout.zorder2(col("x"), col("y"), bits = 3)).head.getLong(0)
    assert(z == 27L)
    // origin maps to origin; max 3-bit corner to max 6-bit value
    val corners = Seq((0L, 0L), (7L, 7L)).toDF("x", "y")
      .select(Layout.zorder2(col("x"), col("y"), bits = 3)).as[Long].collect()
    assert(corners.sameElements(Array(0L, 63L)))
    intercept[IllegalArgumentException](Layout.zorder2(col("x"), col("y"), 0))
    intercept[IllegalArgumentException](Layout.zorder2(col("x"), col("y"), 32))
  }

  test("range-clustered write yields disjoint per-file key ranges") {
    val dir = Files.createTempDirectory("graft_layout_range").toString
    val li = graft.core.Tables.load(spark, sfDir, "lineitem")
      .select("l_orderkey", "l_shipdate", "l_quantity")
    Layout.writeRangeClustered(li, dir, Seq("l_shipdate"), numFiles = 8)
    val ranges = spark.read.parquet(dir)
      .groupBy(input_file_name().as("f"))
      .agg(date_format(min("l_shipdate"), "yyyy-MM-dd HH:mm:ss").as("lo"),
        date_format(max("l_shipdate"), "yyyy-MM-dd HH:mm:ss").as("hi"))
      .collect().map(r => (r.getString(1), r.getString(2)))
      .sorted
    assert(ranges.length > 1 && ranges.length <= 8)
    // each file's range must end before (or where) the next begins:
    // overlap would mean a selective date scan reads several files
    ranges.sliding(2).foreach {
      case Array((_, hi), (lo2, _)) =>
        assert(hi <= lo2, s"overlapping file ranges: $hi > $lo2")
      case _ =>
    }
  }

  test("z-ordered write keeps per-file bounding boxes compact in BOTH dims") {
    val dir = Files.createTempDirectory("graft_layout_z").toString
    // a 128x128 grid: ids 0..16383 → (x, y)
    val grid = spark.range(16384)
      .select(col("id"), (col("id") % 128).as("x"), expr("id div 128").as("y"))
    Layout.writeZOrdered(grid, dir, "x", "y", numFiles = 16, bits = 7)
    val boxes = spark.read.parquet(dir)
      .groupBy(input_file_name().as("f"))
      .agg((max("x") - min("x")).as("dx"), (max("y") - min("y")).as("dy"),
        count(lit(1)).as("n"))
      .collect().map(r => (r.getLong(1), r.getLong(2)))
    assert(boxes.length > 4)
    // 16 curve segments over a 128-wide grid: every file's bounding box
    // must span well under the full extent in BOTH dimensions (a plain
    // row-major sort would give dx = 127 for every file)
    val (dxs, dys) = boxes.unzip
    assert(dxs.max <= 64, s"x-extent not localized: ${dxs.toSeq}")
    assert(dys.max <= 64, s"y-extent not localized: ${dys.toSeq}")
  }
}
