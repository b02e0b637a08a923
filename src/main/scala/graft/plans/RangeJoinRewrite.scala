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
            sides(x, y).isDefined =>
        val (a, b) = sides(x, y).get
        (a, b, width(c))
      case LessThan(Abs(Subtract(x, y, _), _), Literal(c, t))
          if integral(t) && integral(x.dataType) && width(c) >= 2 &&
            sides(x, y).isDefined =>
        val (a, b) = sides(x, y).get
        (a, b, width(c) - 1) // abs < C  ⟺  abs <= C-1 over integers
    }
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
      else bandOf(conjuncts, left, right) match {
        case None => j
        case Some((probe, build, w)) =>
          val width = Literal(w, LongType)
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
