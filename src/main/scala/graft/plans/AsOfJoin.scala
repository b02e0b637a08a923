package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Attribute, BindReferences, Expression, GenericInternalRow, JoinedRow, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution}
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan, SparkStrategy}

import scala.collection.mutable

/** As-of join as a first-class operator (SURVEY §4 custom item #1): for
  * each left row, attach the single right row with the greatest
  * `rightTime <= leftTime` among rows sharing the equi-keys — the tariff
  * version lookup of a rating pipeline (`rate valid_from <= call start`,
  * SURVEY §2B joins row), with left-outer semantics.
  *
  * The composed alternative (join on key + time inequality, then
  * row_number() == 1) materializes every (row × candidate-version) pair
  * before discarding all but one; this operator hash-partitions both sides
  * once on the keys and resolves each left row with a binary search over
  * the per-key version list — no intermediate blow-up, no window shuffle.
  * The right side is expected to be the versioned dimension (bounded per
  * key), which is the as-of use case.
  */
case class AsOfJoin(
    left: LogicalPlan,
    right: LogicalPlan,
    leftKeys: Seq[Expression],
    rightKeys: Seq[Expression],
    leftTime: Expression,
    rightTime: Expression) extends BinaryNode {

  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))

  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): LogicalPlan =
    copy(left = newLeft, right = newRight)
}

case class AsOfJoinExec(
    left: SparkPlan,
    right: SparkPlan,
    leftKeys: Seq[Expression],
    rightKeys: Seq[Expression],
    leftTime: Expression,
    rightTime: Expression) extends BinaryExecNode {

  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))

  /** Both sides cluster on the equi-keys: one shuffle each, co-partitioned
    * by EnsureRequirements — at scale this is the same cost as any
    * shuffled equi-join, with AQE free to pick partition counts. */
  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(leftKeys) :: ClusteredDistribution(rightKeys) :: Nil

  override protected def doExecute(): RDD[InternalRow] = {
    val lOutput = left.output
    val rOutput = right.output
    val lKeys = leftKeys
    val rKeys = rightKeys
    val lTime = leftTime
    val rTime = rightTime
    val rWidth = rOutput.length

    left.execute().zipPartitions(right.execute()) { (lIter, rIter) =>
      val rKeyProj = UnsafeProjection.create(rKeys, rOutput)
      val lKeyProj = UnsafeProjection.create(lKeys, lOutput)
      val rTimeBound = BindReferences.bindReference(rTime, rOutput)
      val lTimeBound = BindReferences.bindReference(lTime, lOutput)

      // versions per key, sorted ascending by time
      val byKey = mutable.HashMap.empty[UnsafeRow, mutable.ArrayBuffer[(Long, InternalRow)]]
      rIter.foreach { row =>
        val t = rTimeBound.eval(row)
        if (t != null) {
          val key = rKeyProj(row).copy()
          byKey.getOrElseUpdate(key, mutable.ArrayBuffer.empty)
            .append((t.asInstanceOf[Long], row.copy()))
        }
      }
      byKey.values.foreach(buf => buf.sortInPlaceBy(_._1))

      val nullRight = new GenericInternalRow(rWidth)
      val joined = new JoinedRow

      lIter.map { lRow =>
        val t = lTimeBound.eval(lRow)
        val matched: InternalRow =
          if (t == null) nullRight
          else byKey.get(lKeyProj(lRow)) match {
            case None => nullRight
            case Some(versions) =>
              // rightmost version with time <= t
              var lo = 0
              var hi = versions.length - 1
              var ans = -1
              val lt = t.asInstanceOf[Long]
              while (lo <= hi) {
                val mid = (lo + hi) >>> 1
                if (versions(mid)._1 <= lt) { ans = mid; lo = mid + 1 }
                else hi = mid - 1
              }
              if (ans < 0) nullRight else versions(ans)._2
          }
        joined(lRow, matched)
      }
    }
  }

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): SparkPlan =
    copy(left = newLeft, right = newRight)
}

object AsOfJoinStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case AsOfJoin(l, r, lk, rk, lt, rt) =>
      AsOfJoinExec(planLater(l), planLater(r), lk, rk, lt, rt) :: Nil
    case _ => Nil
  }
}
