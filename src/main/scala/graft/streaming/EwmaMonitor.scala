package graft.streaming

import org.apache.spark.sql.Encoders
import org.apache.spark.sql.streaming.{ExpiredTimerInfo, OutputMode, StatefulProcessor, TimeMode, TimerValues, TTLConfig, ValueState}

/** Live EWMA control chart — the streaming twin of
  * [[graft.queries.AnalyticsQ.ewmaChart]] (its batch form is the
  * oracle-checked q333), completing the live monitoring plane's trio
  * beside [[CusumMonitor]] (accumulated one-sided shifts) and
  * [[VelocityMonitor]] (hard-window bursts): per key, the one-step-ahead
  * EWMA prediction advances with the batch card's EXACT flooring milli
  * recurrence (e ← e + α·(1000·y − e) DIV 1000 — Scala `/` on Long
  * truncates toward zero, Spark `DIV` verbatim), and every observation
  * after the seed emits prediction, residual, and the relative-band
  * alarm |resid|·10⁶ > limitPpm·pred (BigInt compare — the batch card's
  * DECIMAL discipline, immune to Long overflow at any volume). The page
  * a traffic desk gets DURING the deviation, not at day-end batch;
  * batch parity on in-order feeds is spec-pinned row by row.
  *
  * Semantics mirror q333: observations process in x order within a
  * batch; the FIRST observation seeds the level and emits a NULL
  * prediction (never dropped — "nothing to predict from" is a row, not
  * an absence). State per key is O(1) — two longs and a flag — so key
  * cardinality, not history length, bounds the store. A cross-batch
  * LATE observation (x ≤ the key's high-water mark) would corrupt the
  * level if folded; it is emitted with `late = true` and LEAVES STATE
  * UNTOUCHED (never-drop on the output side, never-corrupt on the
  * state side) — the batch twin over the corrected feed is the
  * reconciliation path, the q265/[[CusumMonitor]] discipline. */
final case class EObs(key: Long, x: Long, y: Long)
final case class EMon(key: Long, x: Long, y: Long,
    pred_milli: Option[Long], resid_milli: Option[Long],
    alarm: Boolean, late: Boolean)
final case class EwState(eMilli: Long, seeded: Boolean, lastX: Long)

final class EwmaMonitor(alphaMilli: Long = 200L,
    limitPpm: Long = 400000L)
    extends StatefulProcessor[Long, EObs, EMon] {
  require(alphaMilli >= 0L && alphaMilli <= 1000L,
    s"alphaMilli must be in [0, 1000], got $alphaMilli")
  require(limitPpm > 0L, s"limitPpm must be > 0, got $limitPpm")

  @transient private var st: ValueState[EwState] = _

  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
    st = getHandle.getValueState[EwState]("ewma",
      Encoders.product[EwState], TTLConfig.NONE)

  override def handleInputRows(key: Long, rows: Iterator[EObs],
      timers: TimerValues): Iterator[EMon] = {
    var s = if (st.exists()) st.get()
      else EwState(0L, seeded = false, Long.MinValue)
    val out = Seq.newBuilder[EMon]
    rows.toSeq.sortBy(_.x).foreach { r =>
      if (r.x <= s.lastX) {
        // late arrival: surfaced, never folded (the level stays coherent)
        out += EMon(key, r.x, r.y, None, None, alarm = false, late = true)
      } else if (!s.seeded) {
        s = EwState(1000L * r.y, seeded = true, r.x)
        out += EMon(key, r.x, r.y, None, None, alarm = false,
          late = false)
      } else {
        val pred = s.eMilli
        val resid = 1000L * r.y - pred
        val alarm = pred > 0L &&
          BigInt(resid).abs * 1000000L > BigInt(limitPpm) * pred
        s = EwState(pred + (alphaMilli * resid) / 1000L, seeded = true,
          r.x)
        out += EMon(key, r.x, r.y, Some(pred), Some(resid), alarm,
          late = false)
      }
    }
    st.update(s)
    out.result().iterator
  }

  override def handleExpiredTimer(key: Long, timers: TimerValues,
      expired: ExpiredTimerInfo): Iterator[EMon] = Iterator.empty
}
