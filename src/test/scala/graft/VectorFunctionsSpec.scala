package graft

import graft.functions.VectorFunctions.{vec_dot, vec_norm2}
import org.apache.spark.sql.functions._

class VectorFunctionsSpec extends SparkSpec {

  import spark.implicits._

  test("vec_dot matches the interpreted higher-order-function formulation") {
    val emb = graft.core.Tables.load(spark, sfDir, "embeddings").limit(50)
      .select(col("vec_id"), col("embedding"))
    val both = emb.withColumn("fast", vec_norm2(col("embedding")))
      .withColumn("hof", expr(
        "aggregate(embedding, CAST(0 AS DOUBLE), (acc, x) -> acc + CAST(x AS DOUBLE) * CAST(x AS DOUBLE))"))
    // bit-identical, not approximately equal — same fold order
    assert(both.filter(col("fast") =!= col("hof")).count() == 0)
  }

  test("null inputs propagate, mismatched lengths use the common prefix") {
    val df = Seq(
      (Some(Array(1.0f, 2.0f)), Some(Array(3.0f, 4.0f))),
      (None, Some(Array(1.0f))),
      (Some(Array(2.0f, 5.0f, 9.0f)), Some(Array(10.0f))))
      .toDF("a", "b")
    val got = df.select(vec_dot(col("a"), col("b"))).as[Option[Double]].collect()
    assert(got(0).contains(11.0))
    assert(got(1).isEmpty)
    assert(got(2).contains(20.0))
  }

  test("vec_dot registers as a SQL function via extensions path") {
    graft.functions.VectorFunctions.register(spark)
    val r = spark.sql("SELECT vec_dot(array(CAST(1 AS FLOAT), CAST(2 AS FLOAT)), array(CAST(3 AS FLOAT), CAST(4 AS FLOAT))) AS d")
      .as[Double].head()
    assert(r == 11.0)
  }

  test("vec_dot_long registers as a SQL function (round 13 — the int8 " +
      "path gets the same SQL surface as the float path)") {
    graft.functions.VectorFunctions.register(spark)
    val r = spark.sql("SELECT vec_dot_long(array(1L, 2L), array(3L, 4L)) AS d")
      .as[Long].head()
    assert(r == 11L)
  }

  test("vec_dot runs inside whole-stage codegen") {
    val emb = graft.core.Tables.load(spark, sfDir, "embeddings")
    val df = emb.select(vec_norm2(col("embedding")).as("n")).filter(col("n") > 0)
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("*(1)"), s"vec_dot fell out of codegen:\n$plan")
  }

  test("vec_nearest_cell: codegen matches interpreted eval and the join formulation") {
    import graft.functions.VectorFunctions.vec_nearest_cell
    val emb = graft.core.Tables.load(spark, sfDir, "embeddings").limit(100)
      .select(col("vec_id"), col("embedding"),
        vec_norm2(col("embedding")).as("nrm"))
    val cents = emb.orderBy(col("vec_id")).limit(5).collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).map(_.toDouble).toArray)).toSeq
    val fast = emb.select(col("vec_id"),
      vec_nearest_cell(col("embedding"), col("nrm"), cents).as("m"))
      .select(col("vec_id"), col("m.cluster"), col("m.dist_sq"))
      .as[(Long, Long, Double)].collect().toMap2
    // reference: per-centroid dist via the vec_dot chain, argmin in Scala
    val ref = emb.select(col("vec_id"), col("embedding"), col("nrm"))
      .collect().map { r =>
        val e = r.getSeq[Float](1); val nrm = r.getDouble(2)
        val best = cents.map { case (id, c) =>
          var acc = 0.0
          (0 until math.min(e.length, c.length)).foreach(i => acc += e(i).toDouble * c(i))
          var cn = 0.0; c.foreach(x => cn += x * x)
          (id, (nrm + cn) - 2.0 * acc)
        }.minBy { case (id, d) => (d, id) }
        r.getLong(0) -> best
      }.toMap
    assert(fast == ref)
    // interpreted (non-codegen) path agrees bit for bit
    val prev = spark.conf.get("spark.sql.codegen.wholeStage")
    try {
      spark.conf.set("spark.sql.codegen.wholeStage", "false")
      spark.conf.set("spark.sql.codegen.factoryMode", "NO_CODEGEN")
      val interp = emb.select(col("vec_id"),
        vec_nearest_cell(col("embedding"), col("nrm"), cents).as("m"))
        .select(col("vec_id"), col("m.cluster"), col("m.dist_sq"))
        .as[(Long, Long, Double)].collect().toMap2
      assert(interp == ref)
    } finally {
      spark.conf.set("spark.sql.codegen.wholeStage", prev)
      spark.conf.set("spark.sql.codegen.factoryMode", "CODEGEN_ONLY")
    }
  }

  test("vec_pq_encode: codegen matches interpreted eval; ties keep the lowest code") {
    import graft.functions.VectorFunctions.vec_pq_encode
    // 4-dim vectors, 2 subspaces of 2 dims, 2 codewords each; the second
    // subspace's codewords are IDENTICAL so every vector ties -> code 10
    val bySub = Seq(
      (Array(10L, 20L), Array(Array(0.0, 0.0), Array(1.0, 1.0))),
      (Array(10L, 20L), Array(Array(0.5, 0.5), Array(0.5, 0.5))))
    val df = Seq(
      (1L, Array(0.1f, 0.1f, 9.0f, 9.0f)),
      (2L, Array(0.9f, 0.9f, 0.0f, 0.0f))).toDF("vec_id", "embedding")
    def run() = df.select(col("vec_id"),
        vec_pq_encode(col("embedding"), bySub).as("codes"))
      .as[(Long, Seq[Long])].collect().toMap
    val fast = run()
    assert(fast == Map(1L -> Seq(10L, 10L), 2L -> Seq(20L, 10L)))
    val prev = spark.conf.get("spark.sql.codegen.wholeStage")
    try {
      spark.conf.set("spark.sql.codegen.wholeStage", "false")
      spark.conf.set("spark.sql.codegen.factoryMode", "NO_CODEGEN")
      assert(run() == fast)
    } finally {
      spark.conf.set("spark.sql.codegen.wholeStage", prev)
      spark.conf.set("spark.sql.codegen.factoryMode", "CODEGEN_ONLY")
    }
  }

  private implicit class Map2[A, B, C](rows: Array[(A, B, C)]) {
    def toMap2: Map[A, (B, C)] = rows.map(r => r._1 -> (r._2, r._3)).toMap
  }
}
