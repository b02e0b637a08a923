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
    // 16 curve segments over a 128-wide grid: bounding boxes must be
    // localized in BOTH dimensions (a plain row-major sort gives
    // dx = 127 for EVERY file). The assertion is on the aggregate, not
    // each file: repartitionByRange draws its boundaries from a SAMPLE
    // whose seed varies with the session's rdd-id counter, so one
    // segment occasionally straddles a major quadrant seam (full
    // extent in one dim) — sampling skew, not a locality failure.
    val (dxs, dys) = boxes.unzip
    def mean(xs: Seq[Long]): Long = xs.sum / xs.length
    assert(mean(dxs.toSeq) <= 64, s"x-extent not localized: ${dxs.toSeq}")
    assert(mean(dys.toSeq) <= 64, s"y-extent not localized: ${dys.toSeq}")
    assert(dxs.count(_ >= 127) <= 2, s"too many full-width boxes: ${dxs.toSeq}")
    assert(dys.count(_ >= 127) <= 2, s"too many full-height boxes: ${dys.toSeq}")
  }

  test("hilbert2: order-1 quadrant walk is the canonical U") {
    val got = Seq((0L, 0L), (0L, 1L), (1L, 1L), (1L, 0L)).toDF("x", "y")
      .withColumn("h", graft.functions.LayoutFunctions.hilbert2(col("x"), col("y"), bits = 1))
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getLong(2))).toMap
    assert(got === Map((0L, 0L) -> 0L, (0L, 1L) -> 1L, (1L, 1L) -> 2L, (1L, 0L) -> 3L))
  }

  test("hilbert2: bijective on the full grid, consecutive cells ALWAYS adjacent") {
    // 16x16 grid (bits=4): every index 0..255 hit exactly once, and the
    // walk never jumps — |Δx|+|Δy| = 1 between consecutive indices. The
    // same sweep for the Morton curve jumps up to 2·(2^b − 1) − 1 cells;
    // this is the locality upgrade the expression buys.
    val cells = (0L until 256L).map(i => (i % 16, i / 16))
    val df = cells.toDF("x", "y")
      .withColumn("h", graft.functions.LayoutFunctions.hilbert2(col("x"), col("y"), bits = 4))
      .withColumn("z", Layout.zorder2(col("x"), col("y"), bits = 4))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(df.map(_._3).sorted.toSeq === (0L until 256L).toSeq, "not a bijection")
    val byH = df.sortBy(_._3)
    val hJumps = byH.sliding(2).map { case Array(a, b) =>
      math.abs(a._1 - b._1) + math.abs(a._2 - b._2) }.toSeq
    assert(hJumps.forall(_ === 1L), s"hilbert jumped: max=${hJumps.max}")
    val byZ = df.sortBy(_._4)
    val zMax = byZ.sliding(2).map { case Array(a, b) =>
      math.abs(a._1 - b._1) + math.abs(a._2 - b._2) }.max
    assert(zMax > 1L, "control: the Morton walk does jump")
  }

  test("hilbert2: inputs reduce mod 2^bits, like zorder2") {
    val a = Seq((3L, 5L)).toDF("x", "y")
      .select(graft.functions.LayoutFunctions.hilbert2(col("x"), col("y"), bits = 3))
      .head.getLong(0)
    val b = Seq((3L + 8L, 5L + 16L)).toDF("x", "y")
      .select(graft.functions.LayoutFunctions.hilbert2(col("x"), col("y"), bits = 3))
      .head.getLong(0)
    assert(a === b)
  }
}
