package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Attribute, BindReferences, Expression, GenericInternalRow, JoinedRow, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.catalyst.plans.physical.{BroadcastDistribution, ClusteredDistribution, Distribution, IdentityBroadcastMode, UnspecifiedDistribution}
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan, SparkStrategy}
import org.apache.spark.sql.internal.SQLConf

import scala.collection.mutable

/** As-of join as a first-class operator (SURVEY §4 custom item #1): for
  * each left row, attach the single right row with the greatest
  * `rightTime <= leftTime` among rows sharing the equi-keys — the tariff
  * version lookup of a rating pipeline (`rate valid_from <= call start`,
  * SURVEY §2B joins row), with left-outer semantics.
  *
  * The composed alternative (join on key + time inequality, then
  * row_number() == 1) materializes every (row × candidate-version) pair
  * before discarding all but one; this operator resolves each left row
  * with a binary search over the per-key version list — no intermediate
  * blow-up, no window shuffle. Physical strategy mirrors Spark's own join
  * selection: a small right side (≤ autoBroadcastJoinThreshold by stats)
  * broadcasts, leaving the fact side entirely unshuffled; otherwise both
  * sides cluster on the keys (one shuffle each).
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

/** Probe-side logic shared by the shuffled and broadcast variants. */
trait AsOfJoinLike extends BinaryExecNode {
  def leftKeys: Seq[Expression]
  def rightKeys: Seq[Expression]
  def leftTime: Expression
  def rightTime: Expression

  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))

  /** Versions per key, sorted ascending by time. */
  protected def buildIndex(rows: Iterator[InternalRow])
      : mutable.HashMap[UnsafeRow, mutable.ArrayBuffer[(Long, InternalRow)]] = {
    val rKeyProj = UnsafeProjection.create(rightKeys, right.output)
    val rTimeBound = BindReferences.bindReference(rightTime, right.output)
    val byKey = mutable.HashMap.empty[UnsafeRow, mutable.ArrayBuffer[(Long, InternalRow)]]
    rows.foreach { row =>
      val t = rTimeBound.eval(row)
      if (t != null) {
        val key = rKeyProj(row).copy()
        byKey.getOrElseUpdate(key, mutable.ArrayBuffer.empty)
          .append((t.asInstanceOf[Long], row.copy()))
      }
    }
    byKey.values.foreach(_.sortInPlaceBy(_._1))
    byKey
  }

  protected def probe(
      lIter: Iterator[InternalRow],
      byKey: mutable.HashMap[UnsafeRow, mutable.ArrayBuffer[(Long, InternalRow)]])
      : Iterator[InternalRow] = {
    val lKeyProj = UnsafeProjection.create(leftKeys, left.output)
    val lTimeBound = BindReferences.bindReference(leftTime, left.output)
    val nullRight = new GenericInternalRow(right.output.length)
    val joined = new JoinedRow
    // Parents such as ShuffleExchange's UnsafeRowSerializer or SortExec
    // require UnsafeRow input; emit through a final unsafe projection like
    // Spark's own join execs (genResultProjection) instead of leaking
    // JoinedRow/GenericInternalRow upward.
    val resultProj = UnsafeProjection.create(output, output)
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
      resultProj(joined(lRow, matched))
    }
  }
}

/** Shuffled variant: both sides cluster on the equi-keys — one shuffle
  * each, co-partitioned by EnsureRequirements; AQE sizes the partitions. */
case class AsOfJoinExec(
    left: SparkPlan,
    right: SparkPlan,
    leftKeys: Seq[Expression],
    rightKeys: Seq[Expression],
    leftTime: Expression,
    rightTime: Expression) extends AsOfJoinLike {

  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(leftKeys) :: ClusteredDistribution(rightKeys) :: Nil

  override protected def doExecute(): RDD[InternalRow] =
    left.execute().zipPartitions(right.execute()) { (lIter, rIter) =>
      probe(lIter, buildIndex(rIter))
    }

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): SparkPlan =
    copy(left = newLeft, right = newRight)
}

/** Broadcast variant: the versioned dimension ships to every task and the
  * fact side is NOT shuffled at all — the right plan for tariff-sized
  * dimensions at 100 TB fact scale. */
case class BroadcastAsOfJoinExec(
    left: SparkPlan,
    right: SparkPlan,
    leftKeys: Seq[Expression],
    rightKeys: Seq[Expression],
    leftTime: Expression,
    rightTime: Expression) extends AsOfJoinLike {

  override def requiredChildDistribution: Seq[Distribution] =
    UnspecifiedDistribution :: BroadcastDistribution(IdentityBroadcastMode) :: Nil

  override protected def doExecute(): RDD[InternalRow] = {
    val broadcastRows = right.executeBroadcast[Array[InternalRow]]()
    left.execute().mapPartitions { lIter =>
      probe(lIter, buildIndex(broadcastRows.value.iterator))
    }
  }

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): SparkPlan =
    copy(left = newLeft, right = newRight)
}

object AsOfJoinStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case AsOfJoin(l, r, lk, rk, lt, rt) =>
      val threshold = SQLConf.get.autoBroadcastJoinThreshold
      if (threshold >= 0 && r.stats.sizeInBytes <= threshold)
        BroadcastAsOfJoinExec(planLater(l), planLater(r), lk, rk, lt, rt) :: Nil
      else
        AsOfJoinExec(planLater(l), planLater(r), lk, rk, lt, rt) :: Nil
    case _ => Nil
  }
}
