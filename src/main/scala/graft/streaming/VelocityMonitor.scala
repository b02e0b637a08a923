package graft.streaming

import org.apache.spark.sql.Encoders
import org.apache.spark.sql.streaming.{ExpiredTimerInfo, OutputMode, StatefulProcessor, TimeMode, TimerValues, TTLConfig, ValueState}

/** Live velocity (fraud) monitoring — the streaming twin of
  * [[graft.queries.AnalyticsQ.velocityFlags]] (its batch form is the
  * oracle-checked q246): per account, the event times inside the
  * trailing `windowSec` window ride in the state store; each arriving
  * event is flagged when the window (itself included) holds ≥
  * `threshold` events, with the exact in-window count — the alarm an
  * online charging system raises DURING the burst, not at day-end
  * batch. Batch parity on in-order feeds is spec-pinned.
  *
  * Semantics: events process in (sec, event_id) order within a batch
  * (the [[MarginalRater]] bounded-sort rule); the in-window count
  * matches the batch RANGE frame — same-second peers count, the window
  * is `(sec − windowSec, sec]`. Times older than the newest seen event
  * minus the window are pruned on every arrival, so state per account
  * is the window CONTENT, additionally hard-capped at `maxTimes`: a
  * burst past the cap drops the OLDEST times, which can only
  * UNDER-count a window already ≥ cap ≥ threshold — alarms saturate,
  * they never go silent. Cross-batch out-of-order arrivals (event time
  * below the account's high-water mark minus the window) count against
  * the pruned window — the documented trade-off of bounded state; the
  * batch twin is the reconciliation path.
  */
final case class VEvent(user_id: Long, event_id: Long, sec: Long)
final case class VAlarm(user_id: Long, event_id: Long, sec: Long,
    n_window: Long)
final case class VTimes(times: Array[Long])

final class VelocityMonitor(windowSec: Long, threshold: Long,
    maxTimes: Int = 1024)
    extends StatefulProcessor[Long, VEvent, VAlarm] {
  require(windowSec >= 1L, s"windowSec must be >= 1, got $windowSec")
  require(threshold >= 1L, s"threshold must be >= 1, got $threshold")
  require(maxTimes >= threshold,
    s"maxTimes ($maxTimes) must be >= threshold ($threshold)")

  @transient private var st: ValueState[VTimes] = _

  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
    st = getHandle.getValueState[VTimes]("vtimes",
      Encoders.product[VTimes], TTLConfig.NONE)

  override def handleInputRows(key: Long, rows: Iterator[VEvent],
      timers: TimerValues): Iterator[VAlarm] = {
    var times = if (st.exists()) st.get().times else Array.empty[Long]
    val out = Seq.newBuilder[VAlarm]
    // same-SECOND events are RANGE-frame peers: they count each other,
    // so process second-runs as units (peers split across batches count
    // only what has arrived — the documented streaming bound)
    val sorted = rows.toSeq.sortBy(r => (r.sec, r.event_id)).toIndexedSeq
    var i = 0
    while (i < sorted.length) {
      val sec = sorted(i).sec
      var j = i
      while (j < sorted.length && sorted(j).sec == sec) j += 1
      val peers = j - i
      val floor = sec - windowSec + 1
      val n = times.count(t => t >= floor && t <= sec) + peers.toLong
      if (n >= threshold)
        (i until j).foreach(k =>
          out += VAlarm(key, sorted(k).event_id, sec, n))
      // prune to the high-water window, then cap (drop oldest)
      val hw = math.max(sec, if (times.isEmpty) sec else times.max)
      times = (times ++ Array.fill(peers)(sec))
        .filter(_ >= hw - windowSec + 1).sorted
      if (times.length > maxTimes) times = times.takeRight(maxTimes)
      i = j
    }
    if (times.nonEmpty) st.update(VTimes(times)) else st.clear()
    out.result().iterator
  }

  override def handleExpiredTimer(key: Long, timers: TimerValues,
      expired: ExpiredTimerInfo): Iterator[VAlarm] = Iterator.empty
}
