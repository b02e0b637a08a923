package graft.streaming

import org.apache.spark.sql.Encoders
import org.apache.spark.sql.streaming.{ExpiredTimerInfo, OutputMode, StatefulProcessor, TimeMode, TimerValues, TTLConfig, ValueState}

/** Live route-quality (ASR) monitor — the streaming twin of the
  * oracle-checked q258 ASR/ACD card: interconnect NOCs do not wait for
  * the day-grain batch to notice a dying route; they watch the
  * answer-seizure ratio over the LAST N attempts per route and page
  * when it collapses (dead route, far-end congestion, or
  * false-answer-supervision fraud showing as a burst of zero-length
  * "answers").
  *
  * Per route, state is three machine words: a ring BITMASK of the last
  * `windowN ≤ 64` attempts' answered flags, the ring position, and
  * cumulative attempt/answered counters — O(1) per route regardless of
  * history (the MarginalRater state discipline). Attempts process in
  * `call_id` order within a batch (the per-key slice sorts — bounded by
  * the micro-batch, never history).
  *
  * Every batch each touched route emits ONE gauge row: cumulative
  * attempts/answered, the windowed ASR in exact ppm (over
  * min(windowN, attempts) — the warm-up window is the prefix), and the
  * alarm flag = window full AND window ASR < `minAsrPpm`. Alarm as a
  * LEVEL, not an edge: a flapping route re-alarms every batch it stays
  * bad, which is what a paging rule consumes. Batch parity (gauge ≡
  * the same fold over the fully-ordered feed) is spec-pinned.
  */
final case class RCall(route: String, call_id: Long, dur_centi: Long)
final case class RGauge(route: String, attempts: Long, answered: Long,
    window_asr_ppm: Long, alarm: Boolean)
final case class RState(mask: Long, pos: Int, attempts: Long,
    answered: Long)

final class RouteQualityMonitor(windowN: Int = 50,
    minAsrPpm: Long = 300000L)
    extends StatefulProcessor[String, RCall, RGauge] {
  require(windowN >= 1 && windowN <= 64,
    s"windowN must be in [1, 64] (bitmask ring), got $windowN")
  require(minAsrPpm >= 0L && minAsrPpm <= 1000000L,
    s"minAsrPpm must be in [0, 1e6], got $minAsrPpm")

  @transient private var st: ValueState[RState] = _

  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
    st = getHandle.getValueState[RState]("rq",
      Encoders.product[RState], TTLConfig.NONE)

  override def handleInputRows(key: String, rows: Iterator[RCall],
      timers: TimerValues): Iterator[RGauge] = {
    var s = if (st.exists()) st.get() else RState(0L, 0, 0L, 0L)
    rows.toSeq.sortBy(_.call_id).foreach { c =>
      val bit = 1L << s.pos
      val answered = c.dur_centi > 0L
      val mask = if (answered) s.mask | bit else s.mask & ~bit
      s = RState(mask, (s.pos + 1) % windowN, s.attempts + 1,
        s.answered + (if (answered) 1L else 0L))
    }
    st.update(s)
    val inWindow = math.min(s.attempts, windowN.toLong)
    val winAnswered =
      java.lang.Long.bitCount(s.mask & windowMask(inWindow.toInt)).toLong
    val asr =
      if (inWindow == 0L) 1000000L else 1000000L * winAnswered / inWindow
    Iterator.single(RGauge(key, s.attempts, s.answered, asr,
      inWindow >= windowN && asr < minAsrPpm))
  }

  /** Valid ring bits: all windowN bits once warm, the first k during
    * warm-up (positions fill 0,1,2,… before wrapping). */
  private def windowMask(k: Int): Long =
    if (k >= 64) -1L else (1L << k) - 1L

  override def handleExpiredTimer(key: String, timers: TimerValues,
      expired: ExpiredTimerInfo): Iterator[RGauge] = Iterator.empty
}
