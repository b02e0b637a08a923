package graft.streaming

import org.apache.spark.sql.Encoders
import org.apache.spark.sql.streaming.{ExpiredTimerInfo, OutputMode, StatefulProcessor, TimeMode, TimerValues, TTLConfig, ValueState}

/** Live trunk-concurrency gauge — the streaming twin of
  * [[graft.queries.RoutingQ.trunkPeaks]] (its batch form is the
  * oracle-checked q257): per trunk, each arriving CDR's [start, end)
  * interval merges into a running sweep line; every micro-batch emits
  * the updated gauge — calls seen, concurrency NOW (at the trunk's
  * event-time high-water mark), the peak so far and the earliest second
  * it was reached — the circuit-occupancy number a NOC watches live
  * instead of waiting for the day-end batch. Batch parity on feeds
  * within the horizon is spec-pinned.
  *
  * Semantics match the batch operator exactly: net ±1 deltas per
  * second, concurrency during [s, next) includes calls starting at s
  * and excludes those ending at s (end-at-t frees the circuit to a
  * start-at-t). Zero/negative-length calls count as attempts only.
  *
  * Bounded state: delta seconds older than `horizonSec` below the
  * trunk's high-water mark COLLAPSE into a baseline count after being
  * swept (they can no longer change concurrency at or after the
  * boundary), additionally hard-capped at `maxDeltas` oldest-first — so
  * state per trunk is O(horizon activity), never O(history). A call
  * arriving entirely BELOW the boundary (out-of-order beyond the
  * horizon) can no longer raise a peak inside the already-collapsed
  * past — the documented trade-off of bounded state; the batch twin is
  * the reconciliation path (the [[VelocityMonitor]] contract).
  */
final case class TCall(trunk: String, start_sec: Long, end_sec: Long)
final case class TGauge(trunk: String, n_calls: Long, current: Long,
    peak_concurrent: Long, peak_at_sec: Option[Long])
final case class TState(baseline: Long, secs: Array[Long],
    ds: Array[Long], nCalls: Long, peak: Long, peakAt: Long,
    hasPeak: Boolean, hw: Long)

final class TrunkGauge(horizonSec: Long = 86400L, maxDeltas: Int = 8192)
    extends StatefulProcessor[String, TCall, TGauge] {
  require(horizonSec >= 1L, s"horizonSec must be >= 1, got $horizonSec")
  require(maxDeltas >= 2, s"maxDeltas must be >= 2, got $maxDeltas")

  @transient private var st: ValueState[TState] = _

  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
    st = getHandle.getValueState[TState]("tgauge",
      Encoders.product[TState], TTLConfig.NONE)

  override def handleInputRows(key: String, rows: Iterator[TCall],
      timers: TimerValues): Iterator[TGauge] = {
    val prev = if (st.exists()) st.get()
      else TState(0L, Array.empty, Array.empty, 0L, 0L, -1L, false, Long.MinValue)
    val calls = rows.toSeq
    val timed = calls.filter(c => c.end_sec > c.start_sec)
    // merge arrivals into the (sec -> net delta) map
    var m = prev.secs.zip(prev.ds).toMap
    timed.foreach { c =>
      m = m.updated(c.start_sec, m.getOrElse(c.start_sec, 0L) + 1L)
      m = m.updated(c.end_sec, m.getOrElse(c.end_sec, 0L) - 1L)
    }
    // the gauge's "now": the latest observed call START (peaks only
    // ever occur at net-positive cells, i.e. at start seconds, so
    // sweeping up to hw sees every peak the complete feed will have;
    // pending ends beyond hw only lower later concurrency)
    val hw = (prev.hw +: timed.map(_.start_sec)).max
    // fresh sweep of the retained window from its baseline; re-sweeping
    // unchanged deltas reproduces the same running values (idempotent)
    val sorted = m.toArray.sortBy(_._1)
    var conc = prev.baseline
    var wPeak = Long.MinValue
    var wPeakAt = -1L
    sorted.foreach { case (sec, d) =>
      if (sec <= hw && d != 0L) {
        conc += d
        if (conc > wPeak) { wPeak = conc; wPeakAt = sec }
      }
    }
    // combine with the collapsed past's peak: higher wins, ties keep
    // the earlier second (the batch twin's MIN-sec-at-max rule)
    val (peak, peakAt, hasPeak) =
      if (wPeakAt < 0L) (prev.peak, prev.peakAt, prev.hasPeak)
      else if (!prev.hasPeak || wPeak > prev.peak) (wPeak, wPeakAt, true)
      else if (wPeak == prev.peak && wPeakAt < prev.peakAt)
        (wPeak, wPeakAt, true)
      else (prev.peak, prev.peakAt, true)
    val current = conc
    // collapse swept deltas older than the horizon into the baseline
    // (guard the empty-gauge sentinel against Long underflow)
    val boundary =
      if (hw == Long.MinValue) Long.MinValue else hw - horizonSec
    var baseline = prev.baseline
    var kept = sorted.filter { case (sec, d) =>
      val old = sec < boundary
      if (old) baseline += d
      !old && d != 0L
    }
    if (kept.length > maxDeltas) {
      // the cap may only collapse already-SWEPT deltas (sec ≤ hw):
      // collapsing them into the baseline is exact for every future
      // sweep. A pending end (sec > hw) is an OPEN call — collapsing it
      // would end the call early and silently UNDER-count concurrency,
      // the one direction a capacity gauge must never err; open-call
      // deltas are physically bounded by the trunk's circuit count, so
      // they stay even when the swept window overflows the cap.
      val (past, future) = kept.partition(_._1 <= hw)
      val drop = math.max(0, kept.length - math.max(maxDeltas, future.length))
      past.take(drop).foreach { case (_, d) => baseline += d }
      kept = past.drop(drop) ++ future
    }
    val nCalls = prev.nCalls + calls.length
    st.update(TState(baseline, kept.map(_._1), kept.map(_._2), nCalls,
      peak, peakAt, hasPeak, hw))
    Iterator.single(TGauge(key, nCalls, current, math.max(peak, 0L),
      if (hasPeak) Some(peakAt) else None))
  }

  override def handleExpiredTimer(key: String, timers: TimerValues,
      expired: ExpiredTimerInfo): Iterator[TGauge] = Iterator.empty
}
