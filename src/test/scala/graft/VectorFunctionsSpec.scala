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

  test("vec_dot runs inside whole-stage codegen") {
    val emb = graft.core.Tables.load(spark, sfDir, "embeddings")
    val df = emb.select(vec_norm2(col("embedding")).as("n")).filter(col("n") > 0)
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("*(1)"), s"vec_dot fell out of codegen:\n$plan")
  }
}
