package graft

import java.nio.file.Files

import graft.etl.MergeWrite
import org.apache.spark.sql.functions._

/** Copy-on-write parquet merge + compaction: updates replace, inserts
  * append, untouched partitions keep their exact files, and compaction
  * shrinks file counts without changing content.
  */
class MergeWriteSpec extends SparkSpec {

  import spark.implicits._

  private def filesOf(dir: String): Map[String, Long] = {
    import org.apache.hadoop.fs.Path
    val fs = new Path(dir).getFileSystem(spark.sessionState.newHadoopConf())
    if (!fs.exists(new Path(dir))) Map.empty
    else fs.listStatus(new Path(dir)).filter(_.isFile)
      .filter(_.getPath.getName.endsWith(".parquet"))
      .map(f => f.getPath.toString -> f.getModificationTime).toMap
  }

  test("merge replaces keys, appends inserts, and leaves other partitions alone") {
    val dir = Files.createTempDirectory("graft_merge").toString + "/table"
    Seq((1L, "alpha", "p1"), (2L, "beta", "p1"), (3L, "gamma", "p2"))
      .toDF("id", "v", "part")
      .write.partitionBy("part").parquet(dir)
    val untouchedBefore = filesOf(s"$dir/part=p2")

    val updates = Seq(
      (1L, "alpha-v2", "p1"), // replace in p1
      (9L, "new-in-p1", "p1"), // insert into p1
      (7L, "first-in-p3", "p3")) // insert into a brand-new partition
      .toDF("id", "v", "part")
    val stats = MergeWrite.merge(spark, dir, updates, Seq("id"), "part")

    assert(stats.partitionsRewritten == Seq("part=p1", "part=p3"))
    assert(stats.rowsWritten == 4) // p1: ids 1,2,9; p3: id 7
    val after = spark.read.parquet(dir).select("id", "v", "part")
      .as[(Long, String, String)].collect().sortBy(_._1)
    assert(after.toSeq == Seq(
      (1L, "alpha-v2", "p1"), (2L, "beta", "p1"), (3L, "gamma", "p2"),
      (7L, "first-in-p3", "p3"), (9L, "new-in-p1", "p1")))
    // p2 was not rewritten: identical file paths and modification times
    assert(filesOf(s"$dir/part=p2") == untouchedBefore)
  }

  test("merge into a missing base is a plain partitioned write") {
    val dir = Files.createTempDirectory("graft_merge_new").toString + "/t"
    val stats = MergeWrite.merge(spark,
      dir, Seq((1L, "x", "a")).toDF("id", "v", "part"), Seq("id"), "part")
    assert(stats.partitionsRewritten == Seq("part=a") && stats.rowsWritten == 1)
    assert(spark.read.parquet(dir).count() == 1)
  }

  test("merge of an empty batch is a no-op") {
    val dir = Files.createTempDirectory("graft_merge_empty").toString + "/t"
    MergeWrite.merge(spark, dir,
      Seq((1L, "x", "a")).toDF("id", "v", "part"), Seq("id"), "part")
    val stats = MergeWrite.merge(spark, dir,
      Seq.empty[(Long, String, String)].toDF("id", "v", "part"), Seq("id"), "part")
    assert(stats.partitionsRewritten.isEmpty && stats.rowsWritten == 0)
    assert(spark.read.parquet(dir).count() == 1)
  }

  test("merge validates key columns") {
    val df = Seq((1L, "x", "a")).toDF("id", "v", "part")
    intercept[IllegalArgumentException](
      MergeWrite.merge(spark, "/tmp/never", df, Seq.empty, "part"))
    intercept[IllegalArgumentException](
      MergeWrite.merge(spark, "/tmp/never", df, Seq("part"), "part"))
  }

  test("compact shrinks many small files to a byte-budgeted few, content intact") {
    val dir = Files.createTempDirectory("graft_compact").toString + "/d"
    val df = spark.range(0, 2000).select(col("id"), (col("id") * 7).as("v"))
    df.repartition(20).write.parquet(dir)
    assert(filesOf(dir).size == 20)
    val before = spark.read.parquet(dir).as[(Long, Long)].collect().sorted

    val bytes = filesOf(dir).size // just to pin: stats reported below
    val stats = MergeWrite.compact(spark, dir, targetBytes = Long.MaxValue)
    assert(stats.filesBefore == 20 && stats.filesAfter == 1, stats.toString)
    assert(bytes == 20)
    val after = spark.read.parquet(dir).as[(Long, Long)].collect().sorted
    assert(after.sameElements(before))
    // idempotent: already compacted -> no rewrite
    val again = MergeWrite.compact(spark, dir, targetBytes = Long.MaxValue)
    assert(again.filesBefore == 1 && again.filesAfter == 1)
  }

  test("vacuum deletes stale aborted staging, keeps fresh ones and the table") {
    val root = Files.createTempDirectory("graft_vacuum").toString
    val dir = root + "/t"
    MergeWrite.merge(spark, dir,
      Seq((1L, "x", "a")).toDF("id", "v", "part"), Seq("id"), "part")
    // no _SUCCESS marker -> aborted writes, reaped once stale
    Files.createDirectory(java.nio.file.Paths.get(root + "/.t_staging_123"))
    Files.createDirectory(java.nio.file.Paths.get(root + "/.t_compact_456"))
    // cutoff in the future -> both leftovers qualify as stale
    val stats = MergeWrite.vacuum(spark, dir, olderThanMs = -60000L)
    assert(stats.recovered.isEmpty)
    assert(stats.deleted.map(_.split('/').last).sorted ==
      Seq(".t_compact_456", ".t_staging_123"))
    assert(spark.read.parquet(dir).count() == 1) // the table itself untouched
    // default window: a just-created staging dir is NOT stale
    Files.createDirectory(java.nio.file.Paths.get(root + "/.t_staging_789"))
    val fresh = MergeWrite.vacuum(spark, dir)
    assert(fresh.recovered.isEmpty && fresh.deleted.isEmpty)
  }

  test("vacuum completes the swap of a crashed merge instead of losing data") {
    val root = Files.createTempDirectory("graft_vacuum_rec").toString
    val dir = root + "/t"
    MergeWrite.merge(spark, dir,
      Seq((1L, "old", "a"), (2L, "keep", "b")).toDF("id", "v", "part"),
      Seq("id"), "part")
    // simulate a crash between staged write and swap: a _SUCCESS-marked
    // staging dir exists AND the target partition was already deleted
    val staging = root + "/.t_staging_999"
    Seq((1L, "recovered", "a")).toDF("id", "v", "part")
      .write.partitionBy("part").parquet(staging)
    val fs = new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sessionState.newHadoopConf())
    fs.delete(new org.apache.hadoop.fs.Path(dir + "/part=a"), true)

    val stats = MergeWrite.vacuum(spark, dir, olderThanMs = -60000L)
    assert(stats.recovered.map(_.split('/').last) == Seq(".t_staging_999"))
    val rows = spark.read.parquet(dir).select("id", "v")
      .as[(Long, String)].collect().sortBy(_._1)
    assert(rows.toSeq == Seq((1L, "recovered"), (2L, "keep")), rows.toSeq.toString)
    assert(!fs.exists(new org.apache.hadoop.fs.Path(staging)))
  }

  test("a new merge recovers a crashed predecessor before reading the base") {
    val root = Files.createTempDirectory("graft_merge_rec").toString
    val dir = root + "/t"
    MergeWrite.merge(spark, dir,
      Seq((1L, "v1", "a")).toDF("id", "v", "part"), Seq("id"), "part")
    // crashed predecessor: staged v2 for id 1, partition already deleted
    Seq((1L, "v2", "a")).toDF("id", "v", "part")
      .write.partitionBy("part").parquet(root + "/.t_staging_111")
    val fs = new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sessionState.newHadoopConf())
    fs.delete(new org.apache.hadoop.fs.Path(dir + "/part=a"), true)
    // the next merge must see v2 (recovered) as the base it merges into
    MergeWrite.merge(spark, dir,
      Seq((2L, "other", "a")).toDF("id", "v", "part"), Seq("id"), "part")
    val rows = spark.read.parquet(dir).select("id", "v")
      .as[(Long, String)].collect().sortBy(_._1)
    assert(rows.toSeq == Seq((1L, "v2"), (2L, "other")), rows.toSeq.toString)
    assert(!fs.exists(new org.apache.hadoop.fs.Path(root + "/.t_staging_111")))
  }

  test("vacuum recovers a crashed whole-dir compact; staging is invisible to reads") {
    val root = Files.createTempDirectory("graft_compact_rec").toString
    // partitioned table with a per-partition compact crash
    val table = root + "/t"
    Seq((1L, "a", "p1"), (2L, "b", "p2")).toDF("id", "v", "part")
      .write.partitionBy("part").parquet(table)
    val partDir = table + "/part=p1"
    // staged replacement written, original partition dir already deleted
    Seq((1L, "a")).toDF("id", "v").coalesce(1)
      .write.parquet(table + "/.part=p1_compact_42")
    // the dot-prefixed staging must NOT surface in table-level reads
    assert(spark.read.parquet(table).count() == 2)
    val fs = new org.apache.hadoop.fs.Path(table)
      .getFileSystem(spark.sessionState.newHadoopConf())
    fs.delete(new org.apache.hadoop.fs.Path(partDir), true)

    val stats = MergeWrite.vacuum(spark, partDir, olderThanMs = -60000L)
    assert(stats.recovered.map(_.split('/').last) == Seq(".part=p1_compact_42"))
    val rows = spark.read.parquet(table).select("id", "v")
      .as[(Long, String)].collect().sortBy(_._1)
    assert(rows.toSeq == Seq((1L, "a"), (2L, "b")), rows.toSeq.toString)
  }

  test("merge treats a null partition value as a partition like any other") {
    val root = Files.createTempDirectory("graft_merge_null").toString + "/t"
    Seq((1L, "a-null", Option.empty[String]), (2L, "b-null", Option.empty[String]),
      (3L, "c", Option("p1")))
      .toDF("id", "v", "part").write.partitionBy("part").parquet(root)
    // an update touching the null partition must MERGE with its existing
    // rows, not replace the whole partition with just the update
    MergeWrite.merge(spark, root,
      Seq((1L, "a-null-v2", Option.empty[String])).toDF("id", "v", "part"),
      Seq("id"), "part")
    val rows = spark.read.parquet(root).select("id", "v")
      .as[(Long, String)].collect().sortBy(_._1)
    assert(rows.toSeq == Seq((1L, "a-null-v2"), (2L, "b-null"), (3L, "c")),
      rows.toSeq.toString)
  }

  test("streaming sink upserts each micro-batch into the lake table") {
    val dir = Files.createTempDirectory("graft_merge_stream").toString + "/t"
    MergeWrite.merge(spark, dir,
      Seq((1L, "old", "a")).toDF("id", "v", "part"), Seq("id"), "part")
    val sink = MergeWrite.sink(dir, Seq("id"), "part")
    sink(Seq((1L, "newer", "a"), (2L, "other", "b")).toDF("id", "v", "part"), 0L)
    val rows = spark.read.parquet(dir).select("id", "v")
      .as[(Long, String)].collect().sortBy(_._1)
    assert(rows.toSeq == Seq((1L, "newer"), (2L, "other")))
  }
}
