package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.execution.ExplainMode

/** Optimization-round plan evidence: writes `plans/r15/<query>_<tag>.txt`
  * (`explain("formatted")` after AQE finalization) for the queries named in
  * `SPARK_GRAFT_PLANS_ONLY`, with `SPARK_GRAFT_PLANS_TAG=before|after`.
  */
object DumpPlansR15 {
  def main(args: Array[String]): Unit = {
    val spark = graft.core.GraftSession.getOrCreate("local[8]")
    spark.sparkContext.setLogLevel("WARN")
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val tag = sys.env.getOrElse("SPARK_GRAFT_PLANS_TAG", "before")
    val names = sys.env("SPARK_GRAFT_PLANS_ONLY")
      .split(",").map(_.trim).filter(_.nonEmpty)
    Files.createDirectories(Paths.get("plans/r15"))
    names.foreach { name =>
      val df = queries.Registry.byName(name).build(spark, dir)
      df.collect() // finalize AQE
      val txt = df.queryExecution.explainString(ExplainMode.fromString("formatted")).trim
      Files.writeString(Paths.get(s"plans/r15/${name}_$tag.txt"), txt + "\n")
      println(s"wrote plans/r15/${name}_$tag.txt")
    }
    spark.stop()
  }
}
