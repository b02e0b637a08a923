package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graft.bridge
import org.apache.spark.sql.types.{DataType, LongType}

/** Hilbert-curve index of a 2-D cell — the stronger locality sibling of
  * [[graft.etl.Layout.zorder2]]: consecutive Hilbert indices are ALWAYS
  * Manhattan-adjacent cells (the Z curve jumps across the grid at every
  * power-of-two boundary), so range-clustered files cover genuinely
  * compact rectangles and min/max pruning stays tight for filters on
  * either dimension. The cost of that guarantee is state per bit level
  * (the quadrant rotation), which doesn't fold into the independent
  * shift-OR terms Morton allows — hence an expression with a loop
  * kernel rather than a closed form.
  *
  * Algorithm: the classic iterative xy2d (quadrant walk with rotation;
  * see Hamilton, "Compact Hilbert Indices", and the standard formulation
  * on the space-filling-curve literature): per level `s` from the top
  * bit down, the quadrant `(3·rx) XOR ry` contributes `s²` cells, then
  * the coordinate frame rotates/reflects so the next level walks its
  * sub-quadrant in the right orientation. Inputs are taken mod 2^bits
  * (like zorder2); the kernel is a static helper the generated code
  * calls, keeping call sites inside whole-stage codegen.
  */
case class HilbertIndex2(left: Expression, right: Expression, bits: Int)
    extends BinaryExpression {
  require(bits >= 1 && bits <= 31, s"hilbert2 bits must be in [1,31], got $bits")

  override def dataType: DataType = LongType
  override val nullIntolerant: Boolean = true
  override def prettyName: String = "hilbert2"

  override protected def nullSafeEval(a: Any, b: Any): Any =
    HilbertIndex2.compute(a.asInstanceOf[Long], b.asInstanceOf[Long], bits)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.functions.HilbertIndex2.compute($a, $b, $bits);")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object HilbertIndex2 {

  /** Static kernel shared by interpreted eval and generated code. */
  def compute(x0: Long, y0: Long, bits: Int): Long = {
    val n = 1L << bits
    var x = x0 & (n - 1)
    var y = y0 & (n - 1)
    var d = 0L
    var s = n >> 1
    while (s > 0) {
      val rx = if ((x & s) > 0) 1L else 0L
      val ry = if ((y & s) > 0) 1L else 0L
      d += s * s * ((3L * rx) ^ ry)
      // rotate the frame for the next level (reflect in the rx=1, ry=0
      // quadrant, then transpose)
      if (ry == 0) {
        if (rx == 1) {
          x = n - 1 - x
          y = n - 1 - y
        }
        val t = x; x = y; y = t
      }
      s >>= 1
    }
    d
  }
}

object LayoutFunctions {

  /** Hilbert index of the low `bits` bits of two integer columns. */
  def hilbert2(x: Column, y: Column, bits: Int = 16): Column =
    bridge.column(HilbertIndex2(
      bridge.expression(x.cast("long")), bridge.expression(y.cast("long")), bits))
}
