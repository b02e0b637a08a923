package graft

import org.apache.spark.sql.SparkSessionExtensions

/** Session-extension entry point: register the engine's custom Catalyst
  * artifacts at session build —
  * `SparkSession.builder().withExtensions(new GraftExtensions)` or
  * `spark.sql.extensions=graft.GraftExtensions`.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(e: SparkSessionExtensions): Unit = {
    e.injectPlannerStrategy(_ => graft.plans.AsOfJoinStrategy)
    e.injectOptimizerRule(_ => graft.plans.PushLeftFilterThroughAsOfJoin)
    e.injectOptimizerRule(_ => graft.plans.RewriteAbsRangeJoin)
    e.injectFunction(
      (org.apache.spark.sql.catalyst.FunctionIdentifier("vec_dot"),
        new org.apache.spark.sql.catalyst.expressions.ExpressionInfo(
          classOf[graft.functions.VecDot].getName, "vec_dot"),
        (exprs: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
          graft.functions.VecDot(exprs(0), exprs(1))))
    e.injectFunction(
      (org.apache.spark.sql.catalyst.FunctionIdentifier("vec_dot_long"),
        new org.apache.spark.sql.catalyst.expressions.ExpressionInfo(
          classOf[graft.functions.VecDotLong].getName, "vec_dot_long"),
        (exprs: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
          graft.functions.VecDotLong(exprs(0), exprs(1))))
  }
}
