package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graft.bridge
import org.apache.spark.sql.types.{DataType, DoubleType, LongType}

/** Dot product of two float-vector columns, accumulated left-to-right in
  * doubles — a codegen'd Catalyst expression (SURVEY §4 custom item #2).
  *
  * The built-in route (`aggregate(zip_with(...))`) allocates an
  * intermediate array and interprets the lambdas per row; this compiles to
  * a tight fused loop inside whole-stage codegen. The fold order is
  * identical to the HOF version and to the oracle's explicit term chain,
  * so results stay bit-for-bit comparable.
  */
case class VecDot(left: Expression, right: Expression) extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override val nullIntolerant: Boolean = true
  override def prettyName: String = "vec_dot"

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var acc = 0.0
    var i = 0
    while (i < n) {
      acc += x.getFloat(i).toDouble * y.getFloat(i).toDouble
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val acc = ctx.freshName("acc")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $acc = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $acc += (double) $a.getFloat($i) * (double) $b.getFloat($i);
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** Integer twin of [[VecDot]] for quantized vectors (array<bigint>):
  * exact long accumulation, fused loop inside whole-stage codegen. The
  * interpreted `aggregate(zip_with(...))` HOF route would break the WSCG
  * span around the ANN candidate scoring loop.
  */
case class VecDotLong(left: Expression, right: Expression) extends BinaryExpression {

  override def dataType: DataType = LongType
  override val nullIntolerant: Boolean = true
  override def prettyName: String = "vec_dot_long"

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var acc = 0L
    var i = 0
    while (i < n) {
      acc += x.getLong(i) * y.getLong(i)
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val acc = ctx.freshName("acc")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |long $acc = 0L;
         |for (int $i = 0; $i < $n; $i++) {
         |  $acc += $a.getLong($i) * $b.getLong($i);
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object VectorFunctions {

  /** Dot product of two array<float> columns as a double. */
  def vec_dot(a: Column, b: Column): Column =
    bridge.column(VecDot(bridge.expression(a), bridge.expression(b)))

  /** Exact dot product of two array<bigint> columns as a long. */
  def vec_dot_long(a: Column, b: Column): Column =
    bridge.column(VecDotLong(bridge.expression(a), bridge.expression(b)))

  /** Squared L2 norm of an array<float> column. */
  def vec_norm2(a: Column): Column = vec_dot(a, a)

  /** Register SQL names (idempotent per session). */
  def register(spark: SparkSession): Unit = {
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "vec_dot", exprs => VecDot(exprs(0), exprs(1)), "scala_udf")
  }
}
