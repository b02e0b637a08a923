package graft.streaming

import org.apache.spark.sql.Encoders
import org.apache.spark.sql.streaming.{ExpiredTimerInfo, OutputMode, StatefulProcessor, TimeMode, TimerValues, TTLConfig, ValueState}

/** Live crawl-politeness monitor — the streaming twin of
  * [[graft.queries.CrawlQ.politenessCard]] (its batch form is the
  * oracle-checked q358), joining the live monitoring plane beside
  * [[EwmaMonitor]] / [[CusumMonitor]] / [[VelocityMonitor]]: per host,
  * the count of fetches in the trailing `windowSec` window advances
  * with every arrival, and each fetch emits its burst plus the
  * over-cap verdict — the throttle signal a crawler needs DURING the
  * burst, not at day-end audit.
  *
  * Semantics mirror q358's RANGE frame exactly where a stream can:
  * within a batch, arrivals are processed in second order and
  * SAME-SECOND arrivals fold as one peer group — every member emits
  * the group-final burst, which is precisely the value-based (peer-
  * inclusive) RANGE frame of the batch card, so an in-order feed has
  * row-exact burst parity. Across a batch boundary a same-second
  * straggler still FOLDS (sec == high-water is a peer, not a
  * correction) and emits the burst as of ITS arrival — the already-
  * emitted earlier peers are not re-issued (append-mode discipline;
  * the batch twin over the settled feed is the reconciliation path),
  * so the per-host MAX burst still agrees with the batch card while
  * individual pre-straggler rows may read lower. A strictly EARLIER
  * arrival (sec < high-water) would need mid-ring insertion and
  * re-emission of settled rows: it is surfaced with `late = true`,
  * NULL burst, and leaves state untouched — the q265/[[EwmaMonitor]]
  * never-fold discipline.
  *
  * State per key is the in-window fetch seconds only (evicted on every
  * advance), bounded by `maxRing` with a LOUD error naming the
  * contract — a host whose per-window fetch count breaches it needs
  * the (host, day)-split plan documented on the batch card, not a
  * silent executor OOM (the GrainGuard discipline). */
final case class PFetch(host: String, sec: Long)
final case class PMon(host: String, sec: Long, burst: Option[Long],
    over: Boolean, late: Boolean)
final case class PolState(ring: List[Long], lastSec: Long)

final class PolitenessMonitor(cap: Int, windowSec: Int = 60,
    maxRing: Int = 100000)
    extends StatefulProcessor[String, PFetch, PMon] {
  require(cap >= 1 && windowSec >= 1 && maxRing >= 1,
    s"cap, windowSec, maxRing must be >= 1, got $cap/$windowSec/$maxRing")

  @transient private var st: ValueState[PolState] = _

  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
    st = getHandle.getValueState[PolState]("ring",
      Encoders.product[PolState], TTLConfig.NONE)

  override def handleInputRows(key: String, rows: Iterator[PFetch],
      timers: TimerValues): Iterator[PMon] = {
    var s = if (st.exists()) st.get() else PolState(Nil, Long.MinValue)
    val out = Seq.newBuilder[PMon]
    rows.toSeq.groupBy(_.sec).toSeq.sortBy(_._1).foreach {
      case (sec, grp) =>
        if (sec < s.lastSec) {
          // strictly-late arrivals: surfaced, never folded (mid-ring
          // insertion would silently rewrite already-emitted bursts)
          grp.foreach { _ =>
            out += PMon(key, sec, None, over = false, late = true)
          }
        } else {
          val kept = s.ring.filter(_ >= sec - (windowSec - 1)) ++
            grp.map(_.sec)
          require(kept.size <= maxRing,
            s"politeness ring for host '$key' at sec=$sec holds " +
              s"${kept.size} fetches > maxRing=$maxRing: the " +
              s"windowSec x fetch-rate product breaches the " +
              s"bounded-state contract — split the host's timeline " +
              s"(the q358 (host, day)-overlap plan) or raise maxRing")
          val burst = kept.size.toLong
          grp.foreach { r =>
            out += PMon(key, r.sec, Some(burst), over = burst > cap,
              late = false)
          }
          s = PolState(kept, sec)
        }
    }
    st.update(s)
    out.result().iterator
  }

  override def handleExpiredTimer(key: String, timers: TimerValues,
      expired: ExpiredTimerInfo): Iterator[PMon] = Iterator.empty
}
