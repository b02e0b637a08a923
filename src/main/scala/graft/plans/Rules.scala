package graft.plans

import org.apache.spark.sql.catalyst.expressions.{And, PredicateHelper}
import org.apache.spark.sql.catalyst.plans.logical.{Filter, LogicalPlan}
import org.apache.spark.sql.catalyst.rules.Rule

/** Optimizer rule (SURVEY §4 custom item #3 family): a custom logical node
  * is opaque to Catalyst, so filters written above an [[AsOfJoin]] would
  * stop there and never reach the parquet scan. Left-side conjuncts
  * commute with the left-outer as-of join, so push them below the node —
  * Catalyst's own pushdown then carries them the rest of the way into the
  * scan (PushedFilters), which is what keeps a 100 TB probe-side scan
  * selective.
  */
object PushLeftFilterThroughAsOfJoin extends Rule[LogicalPlan] with PredicateHelper {

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transform {
    case f @ Filter(cond, aj: AsOfJoin) =>
      val (pushable, rest) = splitConjunctivePredicates(cond)
        .partition(p => p.deterministic && p.references.subsetOf(aj.left.outputSet))
      if (pushable.isEmpty) f
      else {
        val pushed = aj.copy(left = Filter(pushable.reduce(And), aj.left))
        rest.reduceOption(And).map(Filter(_, pushed)).getOrElse(pushed)
      }
  }
}
