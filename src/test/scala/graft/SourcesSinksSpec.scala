package graft

import java.nio.file.Files

import graft.etl.Skew
import org.apache.spark.sql.functions._

/** Source/sink format coverage (SURVEY §2B rows 1-2): CSV, JSON, text
  * round-trips; partitioned and append/overwrite writes; plus the salted
  * skew join. JDBC needs an external database and is covered by the
  * ConnectorRegistry design (prod path per SURVEY §1.3).
  */
class SourcesSinksSpec extends SparkSpec {

  import spark.implicits._

  private lazy val nation = graft.core.Tables.load(spark, sfDir, "nation")

  test("csv round-trip preserves rows and schema-on-read types") {
    val dir = Files.createTempDirectory("graft_csv").toString
    nation.write.mode("overwrite").option("header", "true").csv(dir)
    val back = spark.read.option("header", "true").option("inferSchema", "true").csv(dir)
    assert(back.count() == 25)
    assert(back.select(sum(col("n_nationkey"))).head().getLong(0) ==
      nation.select(sum(col("n_nationkey"))).head().getLong(0))
  }

  test("json round-trip preserves rows") {
    val dir = Files.createTempDirectory("graft_json").toString
    nation.write.mode("overwrite").json(dir)
    val back = spark.read.json(dir)
    assert(back.count() == 25)
    assert(back.columns.sorted.sameElements(Array("n_name", "n_nationkey", "n_regionkey")))
  }

  test("text source reads raw lines") {
    val dir = Files.createTempDirectory("graft_text").toString
    nation.select(concat_ws("|", col("n_nationkey"), col("n_name"))).write.mode("overwrite").text(dir)
    val lines = spark.read.text(dir)
    assert(lines.count() == 25)
    // delimited parse of a text scan (the CDR-file shape)
    val parsed = lines.select(split(col("value"), "\\|").as("f"))
      .select(element_at(col("f"), 1).cast("int").as("k"), element_at(col("f"), 2).as("n"))
    assert(parsed.where(col("k") === 0).select("n").as[String].head() ==
      nation.where(col("n_nationkey") === 0).select("n_name").as[String].head())
  }

  test("xml round-trip (the CDR interchange format of the reference's world)") {
    val dir = Files.createTempDirectory("graft_xml").toString
    nation.write.mode("overwrite")
      .option("rootTag", "nations").option("rowTag", "nation")
      .xml(dir)
    val back = spark.read.option("rowTag", "nation").xml(dir)
    assert(back.count() == 25)
    assert(back.select(sum(col("n_nationkey"))).head().getLong(0) ==
      nation.select(sum(col("n_nationkey"))).head().getLong(0))
    assert(back.where(col("n_nationkey") === 0).select("n_name").as[String].head() ==
      nation.where(col("n_nationkey") === 0).select("n_name").as[String].head())
  }

  test("orc round-trip with predicate pushdown into the scan") {
    val dir = Files.createTempDirectory("graft_orc").toString
    graft.core.Tables.load(spark, sfDir, "orders").write.mode("overwrite").orc(dir)
    val back = spark.read.orc(dir).filter(col("o_orderkey") === 7)
      .select(col("o_orderkey"), col("o_orderstatus"))
    val plan = back.queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters: [") && plan.contains("EqualTo(o_orderkey,7"),
      s"ORC scan must receive the pushed filter:\n$plan")
    assert(plan.contains("ReadSchema: struct<o_orderkey:bigint,o_orderstatus:string>"),
      s"ORC scan must prune to the two projected columns:\n$plan")
    assert(back.count() ==
      graft.core.Tables.load(spark, sfDir, "orders").filter(col("o_orderkey") === 7).count())
  }

  test("partitioned write prunes partitions on read") {
    val dir = Files.createTempDirectory("graft_part").toString
    graft.core.Tables.load(spark, sfDir, "orders")
      .withColumn("status", col("o_orderstatus"))
      .write.mode("overwrite").partitionBy("status").parquet(dir)
    val one = spark.read.parquet(dir).filter(col("status") === "F")
    val plan = one.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters: [isnotnull(status"), plan)
    assert(one.count() ==
      graft.core.Tables.load(spark, sfDir, "orders").filter(col("o_orderstatus") === "F").count())
  }

  test("append vs overwrite modes") {
    val dir = Files.createTempDirectory("graft_modes").toString
    spark.range(5).write.mode("overwrite").parquet(dir)
    spark.range(5).write.mode("append").parquet(dir)
    assert(spark.read.parquet(dir).count() == 10)
    spark.range(3).write.mode("overwrite").parquet(dir)
    assert(spark.read.parquet(dir).count() == 3)
  }

  test("schema evolution: old files without the new column still read (mergeSchema)") {
    val dir = Files.createTempDirectory("graft_evolve").toString
    // generation 1: two columns; generation 2 adds a quality score
    Seq((1L, "a"), (2L, "b")).toDF("id", "v").write.mode("append").parquet(dir)
    Seq((3L, "c", 0.9)).toDF("id", "v", "score").write.mode("append").parquet(dir)
    val back = spark.read.option("mergeSchema", "true").parquet(dir)
    assert(back.columns.sorted.toSeq == Seq("id", "score", "v"))
    assert(back.count() == 3)
    // old rows surface the evolved column as null, not as a read failure
    assert(back.filter(col("score").isNull).count() == 2)
    assert(back.filter(col("id") === 3L).head().getDouble(2) == 0.9)
  }

  test("csv corrupt records dead-letter instead of failing the read") {
    val dir = Files.createTempDirectory("graft_badcsv")
    Files.write(dir.resolve("part.csv"),
      "id,amount\n1,10.5\nnot_a_number_row_with,too,many,fields\n2,20.25\n3,oops\n"
        .getBytes("UTF-8"))
    val schema = "id BIGINT, amount DOUBLE, _corrupt_record STRING"
    val read = spark.read.schema(schema)
      .option("header", "true").option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", "_corrupt_record")
      .csv(dir.toString).cache()
    // the reference's validation-filter/dead-letter split (SURVEY §2A#3)
    // at the file-source level: clean rows flow, bad rows are quarantined
    // with their raw payload for replay
    val clean = read.filter(col("_corrupt_record").isNull)
    val dead = read.filter(col("_corrupt_record").isNotNull)
    assert(clean.count() == 2 && dead.count() == 2)
    assert(clean.select(sum(col("amount"))).head().getDouble(0) == 30.75)
    val raw = dead.select("_corrupt_record").as[String].collect()
    assert(raw.exists(_.contains("too,many,fields")) && raw.exists(_.contains("oops")))
    read.unpersist()
  }

  test("salted join spreads a hot key and matches the plain join") {
    val hot = spark.range(10000).withColumn("k", when(col("id") % 10 === 0, 1L).otherwise(col("id")))
    val dim = spark.range(20000).select(col("id").as("k"), (col("id") * 2).as("v"))
    val plain = hot.join(dim, Seq("k")).agg(sum("v"), count(lit(1))).head()
    val salted = Skew.saltedJoin(hot.toDF(), dim.toDF(), "k", col("id"), factor = 8)
      .agg(sum("v"), count(lit(1))).head()
    assert(plain == salted)
    // salt actually spreads the hot key across distinct reducers
    val salts = hot.filter(col("k") === 1)
      .select(Skew.salt(col("id"), 8)).distinct().count()
    assert(salts == 8)
  }

  test("salted join rejects join types that would duplicate small-side rows") {
    val hot = spark.range(10).toDF()
    val dim = spark.range(10).select(col("id").as("k"), col("id").as("v"))
    for (jt <- Seq("right", "right_outer", "full", "full_outer")) {
      val e = intercept[IllegalArgumentException](
        Skew.saltedJoin(hot.withColumn("k", col("id")), dim, "k", col("id"), 4, jt))
      assert(e.getMessage.contains("replicate unmatched"))
    }
    // left_outer remains allowed and correct for unmatched BIG-side rows
    val big = spark.range(5).select(col("id"), (col("id") + 100).as("k"))
    val res = Skew.saltedJoin(big, dim, "k", col("id"), 4, "left_outer")
    assert(res.count() == 5 && res.filter(col("v").isNull).count() == 5)
  }
}
