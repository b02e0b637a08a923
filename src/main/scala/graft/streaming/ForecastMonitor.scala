package graft.streaming

import org.apache.spark.sql.Encoders
import org.apache.spark.sql.streaming.{ExpiredTimerInfo, OutputMode, StatefulProcessor, TimeMode, TimerValues, TTLConfig, ValueState}

/** Live forecast prediction-interval — the streaming twin of
  * [[graft.queries.AnalyticsQ.forecastIntervalCard]] (its batch form is
  * the oracle-checked q340), completing the forecast family's live
  * symmetry the way [[EwmaMonitor]] completed the control-chart trio:
  * per key, the SES level advances with the batch card's EXACT fold
  * (lv ← lv + α·(y − lv) DIV 1000, walk-forward residual r = y − lv
  * taken BEFORE the update — the model never grades itself on data it
  * has absorbed), and every post-seed observation emits the level, the
  * residual band at loPct/hiPct (exact ceil(q·m) order statistics, the
  * q170 convention), and tomorrow's interval next = level + band. The
  * capacity page DURING the day, not at day-end batch.
  *
  * State per key is O(ringSize), NEVER history-sized: the residuals
  * live in a FIXED-SIZE ring (the [[RouteQualityMonitor]] last-N
  * discipline), so the streamed band is the batch q340 band over the
  * ring's window — batch parity while the series fits the ring is
  * spec-pinned row by row, and past it the band tracks the last
  * `ringSize` residuals (a rolling empirical PI — what a live pager
  * wants anyway; the batch twin over the full series stays the
  * reconciliation path). A cross-batch LATE observation (x ≤ the key's
  * high-water mark) is emitted with `late = true` and leaves the level
  * AND the ring untouched — [[EwmaMonitor]]'s never-drop/never-corrupt
  * discipline verbatim. */
final case class FObs(key: Long, x: Long, y: Long)
final case class FMon(key: Long, x: Long, y: Long, level: Option[Long],
    lo_resid: Option[Long], hi_resid: Option[Long],
    next_lo: Option[Long], next_hi: Option[Long], n_resid: Long,
    late: Boolean)
final case class FcState(level: Long, seeded: Boolean, lastX: Long,
    ring: Array[Long], pos: Int, cnt: Int)

final class ForecastMonitor(alphaMilli: Long = 300L, loPct: Int = 10,
    hiPct: Int = 90, ringSize: Int = 64)
    extends StatefulProcessor[Long, FObs, FMon] {
  require(alphaMilli >= 0L && alphaMilli <= 1000L,
    s"alphaMilli must be in [0, 1000], got $alphaMilli")
  require(loPct >= 1 && hiPct <= 99 && loPct < hiPct,
    s"percentile band must satisfy 1 <= lo < hi <= 99: $loPct/$hiPct")
  require(ringSize >= 1, s"ringSize must be >= 1, got $ringSize")

  @transient private var st: ValueState[FcState] = _

  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
    st = getHandle.getValueState[FcState]("forecast",
      Encoders.product[FcState], TTLConfig.NONE)

  /** Exact order statistic at rank ceil(q·m/100), floored at 1 — the
    * batch card's element_at((q*m+99) DIV 100) verbatim. */
  private def bandAt(sorted: Array[Long], pct: Int): Long =
    sorted(math.max(1L, (pct.toLong * sorted.length + 99L) / 100L)
      .toInt - 1)

  override def handleInputRows(key: Long, rows: Iterator[FObs],
      timers: TimerValues): Iterator[FMon] = {
    var s = if (st.exists()) st.get()
      else FcState(0L, seeded = false, Long.MinValue,
        new Array[Long](ringSize), 0, 0)
    val out = Seq.newBuilder[FMon]
    rows.toSeq.sortBy(_.x).foreach { r =>
      if (r.x <= s.lastX) {
        // late arrival: surfaced, never folded (level + ring coherent)
        out += FMon(key, r.x, r.y, None, None, None, None, None,
          s.cnt.toLong, late = true)
      } else if (!s.seeded) {
        s = FcState(r.y, seeded = true, r.x, s.ring, s.pos, s.cnt)
        out += FMon(key, r.x, r.y, Some(r.y), None, None, None, None,
          0L, late = false)
      } else {
        val resid = r.y - s.level // BEFORE the level update (q321)
        s.ring(s.pos) = resid
        val cnt = math.min(s.cnt + 1, ringSize)
        val lvl = s.level + (alphaMilli * resid) / 1000L
        s = FcState(lvl, seeded = true, r.x, s.ring,
          (s.pos + 1) % ringSize, cnt)
        val sorted = java.util.Arrays.copyOf(s.ring, cnt)
        java.util.Arrays.sort(sorted)
        val lo = bandAt(sorted, loPct)
        val hi = bandAt(sorted, hiPct)
        out += FMon(key, r.x, r.y, Some(lvl), Some(lo), Some(hi),
          Some(lvl + lo), Some(lvl + hi), cnt.toLong, late = false)
      }
    }
    st.update(s)
    out.result().iterator
  }

  override def handleExpiredTimer(key: Long, timers: TimerValues,
      expired: ExpiredTimerInfo): Iterator[FMon] = Iterator.empty
}
