package graft.streaming

import org.apache.spark.sql.Encoders
import org.apache.spark.sql.streaming.{ExpiredTimerInfo, OutputMode, StatefulProcessor, TimeMode, TimerValues, TTLConfig, ValueState}

/** Live CUSUM drift monitoring — the streaming twin of
  * [[graft.queries.AnalyticsQ.cusumShift]] (its batch form is the
  * oracle-checked q300): per key, the first `refDays` observations
  * build the reference mean μ (exact integer milli, truncating
  * division — the batch card's arithmetic verbatim), then every
  * arriving observation advances both one-sided statistics
  * `C⁺ = max(0, C⁺ + y − μ − k)` / `C⁻ = max(0, C⁻ + μ − y − k)` and
  * emits them with the alarm verdict — the page a capacity/fraud desk
  * gets DURING the shift, not at day-end batch. Batch parity on
  * in-order feeds is spec-pinned (per-key peaks, alarm day, and
  * monitored count all equal the q300 card).
  *
  * Semantics: observations process in x order within a batch; the
  * reference phase emits nothing (the batch twin's monitored set
  * starts after `refDays` rows). State per key is O(1) — six longs —
  * so key cardinality, not history length, bounds the store. A
  * cross-batch LATE observation (x ≤ the key's high-water mark) would
  * silently corrupt the running sums if folded; it is emitted with
  * `late = true` and LEAVES STATE UNTOUCHED (never-drop on the output
  * side, never-corrupt on the state side) — the batch twin over the
  * corrected feed is the reconciliation path, the q265 discipline.
  */
final case class CObs(key: Long, x: Long, y: Long)
final case class CMon(key: Long, x: Long, c_hi: Long, c_lo: Long,
    alarm: Boolean, late: Boolean)
final case class CState(nRef: Long, sumRef: Long, muMilli: Long,
    cHi: Long, cLo: Long, lastX: Long)

final class CusumMonitor(refDays: Int, kMilli: Long = 500L,
    hMilli: Long = 12000L)
    extends StatefulProcessor[Long, CObs, CMon] {
  require(refDays >= 1, s"refDays must be >= 1, got $refDays")
  require(kMilli >= 0L, s"kMilli must be >= 0, got $kMilli")
  require(hMilli > 0L, s"hMilli must be > 0, got $hMilli")

  @transient private var st: ValueState[CState] = _

  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
    st = getHandle.getValueState[CState]("cusum",
      Encoders.product[CState], TTLConfig.NONE)

  /** Truncating division on possibly-negative sums — Scala `/` on Long
    * truncates toward zero, exactly Spark's `DIV` (and the batch twin). */
  override def handleInputRows(key: Long, rows: Iterator[CObs],
      timers: TimerValues): Iterator[CMon] = {
    var s = if (st.exists()) st.get()
      else CState(0L, 0L, 0L, 0L, 0L, Long.MinValue)
    val out = Seq.newBuilder[CMon]
    rows.toSeq.sortBy(_.x).foreach { r =>
      if (r.x <= s.lastX) {
        // late arrival: surfaced, never folded (state stays coherent)
        out += CMon(key, r.x, s.cHi, s.cLo, alarm = false, late = true)
      } else if (s.nRef < refDays) {
        val n = s.nRef + 1
        val sum = s.sumRef + r.y
        val mu = if (n == refDays) (1000L * sum) / refDays else s.muMilli
        s = CState(n, sum, mu, s.cHi, s.cLo, r.x)
      } else {
        val dh = 1000L * r.y - s.muMilli - kMilli
        val dl = s.muMilli - 1000L * r.y - kMilli
        val hi = math.max(0L, s.cHi + dh)
        val lo = math.max(0L, s.cLo + dl)
        s = CState(s.nRef, s.sumRef, s.muMilli, hi, lo, r.x)
        out += CMon(key, r.x, hi, lo,
          alarm = hi > hMilli || lo > hMilli, late = false)
      }
    }
    st.update(s)
    out.result().iterator
  }

  override def handleExpiredTimer(key: Long, timers: TimerValues,
      expired: ExpiredTimerInfo): Iterator[CMon] = Iterator.empty
}
