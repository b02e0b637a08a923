package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graft.bridge
import org.apache.spark.sql.types.{DataType, DoubleType}
import org.apache.spark.unsafe.types.UTF8String

/** Jaro-Winkler similarity as a codegen'd Catalyst expression — the fuzzy
  * string kernel Spark lacks natively (it ships only `levenshtein`), and
  * the standard record-linkage comparator for short entity names where
  * edit distance over-penalizes transpositions ("marhta"/"martha" is one
  * swapped pair, not two edits).
  *
  * Semantics are the textbook definition, locked empirically BITWISE
  * against DuckDB's `jaro_winkler_similarity` over an 8,000-pair fuzz
  * sweep so the oracle can use the built-in directly:
  *   - match window `max(|a|,|b|)/2 - 1` (floored at 0), greedy
  *     first-available matching, transpositions counted over matched
  *     sequences and halved;
  *   - `jaro = (m/|a| + m/|b| + (m-t)/m) / 3` accumulated left-to-right
  *     in doubles (order matters for bitwise equality);
  *   - Winkler prefix bonus `j + 0.1·l·(1-j)` with common-prefix length
  *     `l ≤ 4`, applied only when `jaro > 0.7` (the boost threshold);
  *   - either side empty → 0.0 (including both empty — DuckDB's choice),
  *     equal non-empty → 1.0.
  *
  * Comparison is over UTF-8 BYTES, matching DuckDB's byte-string
  * semantics; for the ASCII entity names this kernel targets the two
  * coincide. O(|a|·window) time, two small boolean scratch arrays — the
  * loop lives in a static helper the generated code calls, keeping the
  * operator inside whole-stage codegen without inlining a 40-line kernel
  * per call site.
  */
case class JaroWinkler(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override val nullIntolerant: Boolean = true
  override def prettyName: String = "jaro_winkler"

  override protected def nullSafeEval(a: Any, b: Any): Any =
    JaroWinkler.compute(a.asInstanceOf[UTF8String], b.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.functions.JaroWinkler.compute($a, $b);")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object JaroWinkler {

  /** Static kernel shared by interpreted eval and generated code. */
  def compute(ua: UTF8String, ub: UTF8String): Double = {
    val s1 = ua.getBytes
    val s2 = ub.getBytes
    val l1 = s1.length
    val l2 = s2.length
    if (l1 == 0 || l2 == 0) return 0.0
    if (java.util.Arrays.equals(s1, s2)) return 1.0
    var md = math.max(l1, l2) / 2 - 1
    if (md < 0) md = 0
    val m1 = new Array[Boolean](l1)
    val m2 = new Array[Boolean](l2)
    var m = 0
    var i = 0
    while (i < l1) {
      var j = math.max(0, i - md)
      val hi = math.min(l2, i + md + 1)
      var matched = false
      while (j < hi && !matched) {
        if (!m2(j) && s1(i) == s2(j)) {
          m1(i) = true; m2(j) = true; m += 1; matched = true
        }
        j += 1
      }
      i += 1
    }
    if (m == 0) return 0.0
    var t = 0
    var k = 0
    i = 0
    while (i < l1) {
      if (m1(i)) {
        while (!m2(k)) k += 1
        if (s1(i) != s2(k)) t += 1
        k += 1
      }
      i += 1
    }
    t /= 2
    // Left-to-right double accumulation — the exact order DuckDB uses,
    // so 6dp-rounded results hash-match the oracle.
    var j = (m.toDouble / l1 + m.toDouble / l2 + (m - t).toDouble / m) / 3.0
    if (j > 0.7) {
      val lim = math.min(4, math.min(l1, l2))
      var l = 0
      while (l < lim && s1(l) == s2(l)) l += 1
      j = j + 0.1 * l * (1.0 - j)
    }
    j
  }
}

object StringFunctions {

  /** Jaro-Winkler similarity in [0,1] of two string columns. */
  def jaro_winkler(a: Column, b: Column): Column =
    bridge.column(JaroWinkler(bridge.expression(a), bridge.expression(b)))
}
