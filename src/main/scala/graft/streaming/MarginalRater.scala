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

/** [[MarginalRater]] with a FREE-UNIT BUNDLE — the live twin of
  * [[graft.queries.EventQ.bundleTieredCharges]] (its batch form is the
  * oracle-checked q320): the account's first `allowance` units are
  * included and only the overflow rates, via the shifted closed form
  * B(u) = T(max(u − allowance, 0)); each emitted record carries
  * `free_units` (its consumption from the bundle — the live "N minutes
  * left" counter an OCS quotes mid-call). Telescoping holds exactly as
  * in the base rater, so Σ streamed charges ≡ B(cycle total) ≡ the
  * batch q320 on the same records (spec-pinned). State is the same ONE
  * long per account; a cycle reset is the caller's `clear()`, the
  * MarginalRater contract. */
final case class BundleRatedRec(account_id: Long, event_id: Long,
    units: Long, cum_units: Long, free_units: Long, charge_centi: Long)

final class BundleRater(allowance: Long, tiers: Seq[(Long, Long, Long)])
    extends StatefulProcessor[Long, UsageRec, BundleRatedRec] {
  require(allowance >= 0L, s"allowance must be >= 0, got $allowance")
  require(tiers.nonEmpty && tiers.head._1 == 0L &&
    tiers.last._2 == Long.MaxValue &&
    tiers.sliding(2).forall {
      case Seq((_, e1, _), (s2, _, _)) => e1 == s2
      case _ => true
    }, s"tiers must be contiguous from 0 to unbounded, got $tiers")

  @transient private var cum: ValueState[Long] = _

  private def tTotal(u: Long): Long = tiers.map { case (f, to, r) =>
    val over = math.max(u - f, 0L)
    r * (if (to == Long.MaxValue) over else math.min(over, to - f))
  }.sum
  private def bTotal(u: Long): Long = tTotal(math.max(u - allowance, 0L))

  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
    cum = getHandle.getValueState[Long]("cum", Encoders.scalaLong,
      TTLConfig.NONE)

  override def handleInputRows(key: Long, rows: Iterator[UsageRec],
      timers: TimerValues): Iterator[BundleRatedRec] = {
    var c = if (cum.exists()) cum.get() else 0L
    val out = rows.toSeq.sortBy(_.event_id).map { r =>
      val ue = math.max(r.units, 0L)
      val free = math.min(ue, math.max(allowance - c, 0L))
      val next = c + ue
      val charge = bTotal(next) - bTotal(c)
      c = next
      BundleRatedRec(key, r.event_id, r.units, c, free, charge)
    }
    cum.update(c)
    out.iterator
  }

  override def handleExpiredTimer(key: Long, timers: TimerValues,
      expired: ExpiredTimerInfo): Iterator[BundleRatedRec] = Iterator.empty
}

/** [[MarginalRater]] with BILLING-CYCLE boundaries — the round-8 form
  * left cycle reset to the caller; this one owns it in event time:
  * cycles are `[k·cycleSec, (k+1)·cycleSec)` and each account's
  * accumulator lives per cycle.
  *
  * A cycle closes two ways, whichever happens first:
  *  - ROLLOVER ON ARRIVAL (the straddle path): a record whose event
  *    time lands in a LATER cycle first emits the open cycle's total
  *    row, resets the accumulator, then rates into its own cycle; the
  *    record therefore bills at the fresh cycle's tier-1 rates, never
  *    against last cycle's accumulation;
  *  - EVENT-TIME TIMER: when the watermark passes the open cycle's end
  *    (`TimeMode.EventTime` — the input must carry a watermarked `ts`),
  *    the registered timer emits the total row and clears state, so an
  *    account that simply STOPS sending still gets its invoice row.
  *
  * The cycle-total row has `event_id = -1`, `cycle_total = true`,
  * `units = cum_units` = the cycle's usage, and `charge_centi =
  * T(cycle usage)` — by telescoping it EQUALS the sum of the cycle's
  * per-record marginal charges, so Σ per-cycle streamed charges ≡ the
  * q233 batch form applied per (account, cycle) partition (spec-pinned).
  *
  * Late records (event time in an already-CLOSED cycle) bill into the
  * currently-open cycle — the industry late-CDR rule: usage that missed
  * its invoice appears on the next one, at the next cycle's marginal
  * position. If no cycle is open they open their own (old) cycle, whose
  * timer expiry is already behind the watermark, so it closes at the
  * next batch — a one-record correction invoice. Stale timers (from
  * cycles closed by rollover-on-arrival) find `state.cycle` ≠ their
  * cycle and emit nothing.
  *
  * State stays ONE small record per account: (open cycle, accumulator).
  */
final case class CycleUsageRec(account_id: Long, event_id: Long,
    ts: java.sql.Timestamp, units: Long)
final case class CycleRatedRec(account_id: Long, event_id: Long,
    cycle: Long, units: Long, cum_units: Long, charge_centi: Long,
    cycle_total: Boolean)
final case class CycleCum(cycle: Long, cum: Long)

final class CycleMarginalRater(tiers: Seq[(Long, Long, Long)],
    cycleSec: Long)
    extends StatefulProcessor[Long, CycleUsageRec, CycleRatedRec] {
  require(cycleSec >= 1L, s"cycleSec must be >= 1, got $cycleSec")
  require(tiers.nonEmpty && tiers.head._1 == 0L &&
    tiers.last._2 == Long.MaxValue &&
    tiers.sliding(2).forall {
      case Seq((_, e1, _), (s2, _, _)) => e1 == s2
      case _ => true
    }, s"tiers must be contiguous from 0 to unbounded, got $tiers")

  @transient private var st: ValueState[CycleCum] = _

  private def tTotal(u: Long): Long = tiers.map { case (f, to, r) =>
    val over = math.max(u - f, 0L)
    r * (if (to == Long.MaxValue) over else math.min(over, to - f))
  }.sum

  private def totalRow(key: Long, c: CycleCum): CycleRatedRec =
    CycleRatedRec(key, -1L, c.cycle, c.cum, c.cum, tTotal(c.cum),
      cycle_total = true)

  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
    st = getHandle.getValueState[CycleCum]("cyclecum",
      Encoders.product[CycleCum], TTLConfig.NONE)

  override def handleInputRows(key: Long, rows: Iterator[CycleUsageRec],
      timers: TimerValues): Iterator[CycleRatedRec] = {
    var cur = if (st.exists()) st.get() else null
    val out = Seq.newBuilder[CycleRatedRec]
    rows.toSeq.sortBy(r => (r.ts.getTime, r.event_id)).foreach { r =>
      val k = math.floorDiv(math.floorDiv(r.ts.getTime, 1000L), cycleSec)
      if (cur == null) {
        cur = CycleCum(k, 0L)
        getHandle.registerTimer((k + 1) * cycleSec * 1000L)
      } else if (k > cur.cycle) {
        out += totalRow(key, cur) // straddle: close the open cycle first
        cur = CycleCum(k, 0L)
        getHandle.registerTimer((k + 1) * cycleSec * 1000L)
      } // k <= cur.cycle (incl. late records): bill into the open cycle
      val ue = math.max(r.units, 0L)
      val next = cur.cum + ue
      out += CycleRatedRec(key, r.event_id, cur.cycle, r.units, next,
        tTotal(next) - tTotal(cur.cum), cycle_total = false)
      cur = CycleCum(cur.cycle, next)
    }
    if (cur != null) st.update(cur)
    out.result().iterator
  }

  override def handleExpiredTimer(key: Long, timers: TimerValues,
      expired: ExpiredTimerInfo): Iterator[CycleRatedRec] = {
    val closing = math.floorDiv(
      math.floorDiv(expired.getExpiryTimeInMs, 1000L), cycleSec) - 1L
    val cur = if (st.exists()) st.get() else null
    if (cur == null || cur.cycle != closing) Iterator.empty // stale timer
    else {
      st.clear()
      Iterator.single(totalRow(key, cur))
    }
  }
}
