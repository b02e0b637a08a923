package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.Inner
import org.apache.spark.sql.catalyst.plans.logical.{Generate, Join, LogicalPlan, Project}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{ByteType, DataType, IntegerType, LongType, ShortType}

/** Optimizer rule: bucketize band range joins.
  *
  * An inner join whose only cross-side predicate is a band condition
  * `abs(l - r) <= C` (or `< C`) has no equi keys, so Spark plans a
  * nested-loop/cartesian — O(|L|·|R|) comparisons, the classic
  * accidental blow-up in temporal correlation queries. But the band
  * condition IS hash-partitionable after bucketizing: assign the probe
  * side to a C-wide cell (`value div C`), replicate each build row into
  * its own and both adjacent cells, and join on cell equality with the
  * original band predicate kept as a residual filter. Every qualifying
  * pair lands in exactly one (probe-cell, replica) combination, so the
  * rewrite is semantics-preserving, and the plan becomes a hash join
  * whose cost is O(pairs-within-band) — the manual
  * [[graft.queries.EventQ.concurrentCounts]] shape, applied
  * automatically to any query that writes the naive form.
  *
  * Truncating division is safe for negative values: every truncated-div
  * cell spans at least C integers, so two values within C of each other
  * sit in the same or adjacent cells.
  *
  * Scope guards (anything else is left untouched):
  *  - inner joins only (replication changes row multiplicity under
  *    outer semantics — outer variants need dedicated null handling);
  *  - integral band operands (timestamps enter as long casts);
  *  - no existing cross-side equi conjunct (then Spark already hash
  *    joins, and after one rewrite the synthesized cell-equality stops
  *    a second application — the rule terminates naturally).
  */
object RewriteAbsRangeJoin extends Rule[LogicalPlan] with PredicateHelper {

  /** Literal-magnitude guard: every band constant must sit well inside
    * the Long range before the rule does ANY arithmetic with it. Without
    * it, `c - 1` on a strict-inequality literal of Long.MinValue wraps,
    * the `c1 + c2 >= 0` satisfiability check can itself overflow
    * (c1 = c2 = Long.MinValue sums to 0 and would admit the rewrite),
    * and the synthesized cell arithmetic could throw under ANSI for a
    * query whose original condition contained no arithmetic at all.
    * Bands wider than 2^60 are not real queries — skipping the rewrite
    * (the join stays a nested loop, exactly as written) is the only
    * safe disposition. */
  private val SafeC = Long.MaxValue >> 3
  private def safe(c: Long): Boolean = c > -SafeC && c < SafeC

  /** (probe-side expr, build-side expr, effective band width C). */
  private def bandOf(conjuncts: Seq[Expression], left: LogicalPlan,
      right: LogicalPlan): Option[(Expression, Expression, Long)] = {
    def width(lit: Any): Long = lit.asInstanceOf[Number].longValue
    def sides(x: Expression, y: Expression): Option[(Expression, Expression)] =
      if (x.references.subsetOf(left.outputSet) &&
          y.references.subsetOf(right.outputSet)) Some((x, y))
      else if (y.references.subsetOf(left.outputSet) &&
          x.references.subsetOf(right.outputSet)) Some((y, x))
      else None
    def integral(t: DataType): Boolean =
      t == LongType || t == IntegerType || t == ShortType || t == ByteType
    conjuncts.collectFirst {
      case LessThanOrEqual(Abs(Subtract(x, y, _), _), Literal(c, t))
          if integral(t) && integral(x.dataType) && width(c) >= 1 &&
            safe(width(c)) && sides(x, y).isDefined =>
        val (a, b) = sides(x, y).get
        (a, b, width(c))
      case LessThan(Abs(Subtract(x, y, _), _), Literal(c, t))
          if integral(t) && integral(x.dataType) && width(c) >= 2 &&
            safe(width(c)) && sides(x, y).isDefined =>
        val (a, b) = sides(x, y).get
        (a, b, width(c) - 1) // abs < C  ⟺  abs <= C-1 over integers
    }
  }

  /** Normalize one inequality conjunct to `x − y <= c` over integral
    * operands. Covers the spellings users actually write — explicit
    * differences, `x <= y + c` / `x − c <= y` offsets, and the bare
    * `x <= y` / `x < y` (c = 0 / −1) that anchors the one-sided
    * "r follows l within..." windows. */
  private def normIneq(e: Expression): Option[(Expression, Expression, Long)] = {
    def integral(t: DataType): Boolean =
      t == LongType || t == IntegerType || t == ShortType || t == ByteType
    def num(v: Any): Long = v.asInstanceOf[Number].longValue
    def ok(x: Expression, y: Expression): Boolean =
      integral(x.dataType) && integral(y.dataType)
    e match {
      case LessThanOrEqual(Subtract(a, b, _), Literal(c, t))
          if integral(t) && ok(a, b) && safe(num(c)) => Some((a, b, num(c)))
      case LessThan(Subtract(a, b, _), Literal(c, t))
          if integral(t) && ok(a, b) && safe(num(c)) => Some((a, b, num(c) - 1))
      case LessThanOrEqual(a, Add(b, Literal(c, t), _))
          if integral(t) && ok(a, b) && safe(num(c)) => Some((a, b, num(c)))
      case LessThan(a, Add(b, Literal(c, t), _))
          if integral(t) && ok(a, b) && safe(num(c)) => Some((a, b, num(c) - 1))
      case LessThanOrEqual(Subtract(a, Literal(c, t), _), b)
          if integral(t) && ok(a, b) && safe(num(c)) => Some((a, b, num(c)))
      case GreaterThanOrEqual(a, Subtract(b, Literal(c, t), _))
          if integral(t) && ok(a, b) && safe(num(c)) => Some((b, a, num(c)))
      case GreaterThanOrEqual(Add(a, Literal(c, t), _), b)
          if integral(t) && ok(a, b) && safe(num(c)) => Some((b, a, num(c)))
      case LessThanOrEqual(a: AttributeReference, b: AttributeReference)
          if ok(a, b) => Some((a, b, 0L))
      case LessThan(a: AttributeReference, b: AttributeReference)
          if ok(a, b) => Some((a, b, -1L))
      case GreaterThanOrEqual(a: AttributeReference, b: AttributeReference)
          if ok(a, b) => Some((b, a, 0L))
      case GreaterThan(a: AttributeReference, b: AttributeReference)
          if ok(a, b) => Some((b, a, -1L))
      case _ => None
    }
  }

  /** Asymmetric band: TWO inequality conjuncts that bound the same
    * cross-side difference from both directions — `x − y <= c1` and
    * `y − x <= c2`, i.e. `x − y ∈ [−c2, c1]`. This is how band joins
    * are usually WRITTEN (`r.ts <= l.ts + 3600 AND l.ts <= r.ts` — the
    * "r follows l within an hour" funnel window); almost nobody writes
    * the `abs()` form [[bandOf]] matches. The original conjuncts stay
    * as residuals, so the rewrite is semantics-preserving for exactly
    * the [[bandOf]] reasons; only the CELL assignment varies:
    *
    *  - Cell width tracks the band's SPAN s = c1 + c2, not
    *    max(|c1|, |c2|): a shifted band like `x − y ∈ [86300, 86400]`
    *    (two offset inequalities, span 100) must NOT get day-wide cells
    *    that retain the quadratic residual work the rewrite exists to
    *    eliminate. x is re-centered by mid = ⌊(c1 − c2)/2⌋ so
    *    `(x − mid) − y ∈ [−⌊s/2⌋, ⌈s/2⌉]`, and cells of width
    *    max(⌈s/2⌉, 2) contain every qualifying pair within ±1 cell.
    *  - The re-centering subtraction is only synthesized when mid ≠ 0
    *    AND |mid| ≤ 2^31 AND the probe operand's type is strictly
    *    narrower than Long (int/short/byte): only then is the cast
    *    value bounded by ±2^31, so `x − mid` provably cannot overflow.
    *    Bounding |mid| alone is NOT enough — a LongType x within |mid|
    *    of Long.MinValue/MaxValue would still overflow (ANSI throws on
    *    a query that had no arithmetic; non-ANSI wraps the cell id and
    *    silently drops a qualifying pair), so LongType operands fall
    *    back to un-shifted max(|c1|, |c2|) cells, same as bare
    *    `x <= y` spellings (mid = 0) which introduce no arithmetic.
    *
    * Unsatisfiable bands (c1 + c2 < 0 — exact: normIneq's [[safe]]
    * guard bounds |ci| < 2^60, so the sum cannot wrap) are left alone
    * (the join is empty either way; no point replicating). */
  private def asymBandOf(conjuncts: Seq[Expression], left: LogicalPlan,
      right: LogicalPlan): Option[(Expression, Expression, Long)] = {
    val normd = conjuncts.zipWithIndex
      .flatMap { case (e, i) => normIneq(e).map(n => (n, i)) }
    val pairs = for {
      ((x1, y1, c1), i1) <- normd
      ((x2, y2, c2), i2) <- normd
      if i1 != i2 && x1.semanticEquals(y2) && y1.semanticEquals(x2) &&
        c1 + c2 >= 0
    } yield {
      val span = c1 + c2
      val mid = Math.floorDiv(c1 - c2, 2)
      // Overflow-provable shift precondition: the probe's NATIVE range
      // must be sub-Long so |cast(x, Long)| ≤ 2^31 and the subtraction
      // stays within Long for any data value. LongType (and anything
      // physically 64-bit, e.g. timestamps arriving as long casts)
      // cannot make that promise, so they take the un-shifted path.
      val narrowProbe = x1.dataType match {
        case IntegerType | ShortType | ByteType => true
        case _ => false
      }
      val (xEff, w) =
        if (mid != 0 && math.abs(mid) <= Int.MaxValue.toLong && narrowProbe)
          (Subtract(Cast(x1, LongType), Literal(mid, LongType)),
            math.max((span + 1) / 2, 2L))
        else
          (x1, math.max(math.max(math.abs(c1), math.abs(c2)), 2L))
      if (x1.references.subsetOf(left.outputSet) &&
          y1.references.subsetOf(right.outputSet)) Some((xEff, y1, w))
      else if (y1.references.subsetOf(left.outputSet) &&
          x1.references.subsetOf(right.outputSet)) Some((y1, xEff, w))
      else None
    }
    pairs.flatten.headOption
  }

  private def hasCrossEqui(conjuncts: Seq[Expression], left: LogicalPlan,
      right: LogicalPlan): Boolean =
    conjuncts.exists {
      case Equality(x, y) => // EqualTo and EqualNullSafe both hash-join already
        (x.references.subsetOf(left.outputSet) && y.references.subsetOf(right.outputSet)) ||
          (y.references.subsetOf(left.outputSet) && x.references.subsetOf(right.outputSet))
      case _ => false
    }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transform {
    case j @ Join(left, right, Inner, Some(cond), hint)
        if j.resolved && cond.deterministic => {
      val conjuncts = splitConjunctivePredicates(cond)
      if (hasCrossEqui(conjuncts, left, right)) j
      else bandOf(conjuncts, left, right)
        .orElse(asymBandOf(conjuncts, left, right)) match {
        case None => j
        case Some((probe, build, w)) =>
          // Width floor of 2: at w = 1 the cell id IS the value, and the
          // synthesized cellBase ± 1 replication would wrap (non-ANSI) or
          // throw (ANSI) on a Long.MinValue/MaxValue data value — for a
          // query that may have contained no arithmetic at all. With
          // w >= 2, |cellBase| <= 2^62 and the ±1 can never overflow;
          // containment holds for any cell width >= the band bound.
          val width = Literal(math.max(w, 2L), LongType)
          val cellL = Alias(
            IntegralDivide(Cast(probe, LongType), width), "__cell_probe")()
          val probeSide = Project(left.output :+ cellL, left)
          val cellBase = IntegralDivide(Cast(build, LongType), width)
          val cells = CreateArray(Seq(
            Subtract(cellBase, Literal(1L, LongType)), cellBase,
            Add(cellBase, Literal(1L, LongType))))
          val cellR = AttributeReference("__cell_build", LongType)()
          val buildSide = Generate(Explode(cells), unrequiredChildIndex = Nil,
            outer = false, qualifier = None, generatorOutput = Seq(cellR),
            child = right)
          Project(j.output,
            Join(probeSide, buildSide, Inner,
              Some(And(EqualTo(cellL.toAttribute, cellR), cond)), hint))
      }
    }
  }
}

/** Runtime attachment for sessions not built with
  * [[graft.GraftExtensions]] (mirrors [[AsOf.ensureStrategy]]). */
object RangeJoin {
  def ensureRule(spark: SparkSession): Unit = {
    val opts = spark.experimental.extraOptimizations
    if (!opts.contains(RewriteAbsRangeJoin))
      spark.experimental.extraOptimizations = opts :+ RewriteAbsRangeJoin
  }
}
