package graft.streaming

import org.apache.spark.sql.Encoders
import org.apache.spark.sql.streaming.{ExpiredTimerInfo, OutputMode, StatefulProcessor, TimeMode, TimerValues, TTLConfig, ValueState}

/** Online marginal (cumulative-tier) rating as arbitrary streaming
  * state — the live twin of
  * [[graft.queries.EventQ.marginalTieredCharges]] (its batch form is
  * the oracle-checked q233): per account, a single running-usage
  * accumulator in the state store; each arriving usage record is
  * charged the marginal cost of moving the accumulator from `cum−u` to
  * `cum` under the closed-form tier total T(u), so the record that
  * crosses a tier boundary bills partly at each rate and everything
  * after the account enters a cheaper tier bills there — exactly what
  * an online charging system (OCS) quotes per CDR, with exact
  * telescoping (Σ charges ≡ T(cycle total), no drift a reconciliation
  * would chase).
  *
  * Semantics mirror the batch operator: records process in `event_id`
  * order WITHIN a batch (the row iterator's order is not guaranteed, so
  * the handler sorts its per-key batch slice — bounded by the
  * micro-batch, never by history); zero/negative usage leaves the
  * accumulator unchanged and bills 0, never dropped. State is ONE long
  * per account — the cheapest stateful shape there is; a billing-cycle
  * reset is `clear()` driven by the caller's cycle boundary.
  */
final case class UsageRec(account_id: Long, event_id: Long, units: Long)
final case class RatedRec(account_id: Long, event_id: Long, units: Long,
    cum_units: Long, charge_centi: Long)

final class MarginalRater(tiers: Seq[(Long, Long, Long)])
    extends StatefulProcessor[Long, UsageRec, RatedRec] {
  require(tiers.nonEmpty && tiers.head._1 == 0L &&
    tiers.last._2 == Long.MaxValue &&
    tiers.sliding(2).forall {
      case Seq((_, e1, _), (s2, _, _)) => e1 == s2
      case _ => true
    }, s"tiers must be contiguous from 0 to unbounded, got $tiers")

  @transient private var cum: ValueState[Long] = _

  /** Closed-form tier total: T(u) = Σ rate·clamp(u − from, 0, width). */
  private def tTotal(u: Long): Long = tiers.map { case (f, to, r) =>
    val over = math.max(u - f, 0L)
    r * (if (to == Long.MaxValue) over else math.min(over, to - f))
  }.sum

  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
    cum = getHandle.getValueState[Long]("cum", Encoders.scalaLong,
      TTLConfig.NONE)

  override def handleInputRows(key: Long, rows: Iterator[UsageRec],
      timers: TimerValues): Iterator[RatedRec] = {
    var c = if (cum.exists()) cum.get() else 0L
    val out = rows.toSeq.sortBy(_.event_id).map { r =>
      val ue = math.max(r.units, 0L)
      val next = c + ue
      val charge = tTotal(next) - tTotal(c)
      c = next
      RatedRec(key, r.event_id, r.units, c, charge)
    }
    cum.update(c)
    out.iterator
  }

  override def handleExpiredTimer(key: Long, timers: TimerValues,
      expired: ExpiredTimerInfo): Iterator[RatedRec] = Iterator.empty
}
