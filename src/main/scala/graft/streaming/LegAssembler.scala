package graft.streaming

import org.apache.spark.sql.Encoders
import org.apache.spark.sql.streaming.{ExpiredTimerInfo, OutputMode, StatefulProcessor, TimeMode, TimerValues, TTLConfig, ValueState}

/** Multi-leg (partial) CDR assembly as arbitrary streaming state
  * (SURVEY §2B streaming row, `transformWithState`): legs of one call
  * arrive out of order — possibly duplicated — across micro-batches; the
  * assembled call is emitted once every declared leg is present, then
  * state is freed.
  *
  * This is the streaming twin of RatingPipeline.assembleLegs and the
  * replacement for the reference's plugin-held in-memory session state
  * (which a crash lost — here the state store checkpoints it).
  *
  * Hard-part semantics (SURVEY §7):
  *  - duplicate legs (same seq redelivered) are ignored;
  *  - out-of-order legs are fine — completion checks the seq set;
  *  - when built with a timeout, a processing-time timer emits the
  *    incomplete call (complete = false) and frees its state, so open
  *    calls cannot leak state forever.
  *
  * State is a single compact [[LegProgress]] record per key — a seen-seq
  * bitmask plus running aggregates — NOT the leg list: per-arrival work is
  * O(batch legs), not O(all legs so far), and a hot key's state stays a few
  * dozen bytes regardless of leg count. The bitmask bounds `seq`/`total`
  * to 64, far above real CDR leg counts; out-of-range legs are dropped
  * (never thrown on — that would poison-pill the micro-batch).
  *
  * After completion (timeout mode) the record is kept as a `done`
  * tombstone until the already-registered timer fires, so duplicate legs
  * redelivered post-completion are dropped instead of re-opening state and
  * later flushing a spurious incomplete call; the timer then clears the
  * tombstone silently — no timer leak, no unbounded state.
  */
final case class Leg(call_id: String, seq: Int, total: Int, duration_sec: Double)
final case class AssembledCall(
    call_id: String, n_legs: Int, total_duration: Double, complete: Boolean)

/** Compact per-call state: bit i-1 of `seenMask` = leg seq i arrived. */
final case class LegProgress(
    seenMask: Long, declared: Int, n: Int, sumDur: Double, done: Boolean)

final class LegAssembler(timeoutMs: Long = -1L)
    extends StatefulProcessor[String, Leg, AssembledCall] {

  @transient private var progress: ValueState[LegProgress] = _

  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
    progress = getHandle.getValueState[LegProgress](
      "progress", Encoders.product[LegProgress], TTLConfig.NONE)

  override def handleInputRows(key: String, rows: Iterator[Leg],
      timers: TimerValues): Iterator[AssembledCall] = {
    val isNew = !progress.exists()
    val cur = if (isNew) LegProgress(0L, 0, 0, 0.0, done = false) else progress.get()
    if (cur.done) return Iterator.empty // post-completion redelivery window

    var mask = cur.seenMask
    var declared = cur.declared
    var n = cur.n
    var sum = cur.sumDur
    rows.foreach { l =>
      // Legs with seq outside [1,64] are DROPPED, not thrown on: an
      // exception here is a poison pill (the failed micro-batch replays
      // forever on restart); malformed CDRs belong upstream in the
      // dead-letter path. A declared total beyond 64 is kept: completion
      // can never fire for it, but the call stays in state and the
      // timeout flushes it complete=false — it must not silently vanish.
      if (l.seq >= 1 && l.seq <= 64 && l.total >= 1) {
        val bit = 1L << (l.seq - 1)
        if ((mask & bit) == 0L) { // duplicate seqs dropped
          mask |= bit
          n += 1
          sum += l.duration_sec
        }
        if (l.total > declared) declared = l.total
      }
    }
    if (isNew && n > 0 && timeoutMs >= 0)
      getHandle.registerTimer(timers.getCurrentProcessingTimeInMs() + timeoutMs)

    if (isNew && n == 0) return Iterator.empty // only dropped garbage — no state

    val want = if (declared == 64) -1L else (1L << declared) - 1L
    if (declared >= 1 && declared <= 64 && mask == want) {
      if (timeoutMs >= 0)
        progress.update(LegProgress(mask, declared, n, sum, done = true))
      else
        progress.clear()
      Iterator.single(AssembledCall(key, n, sum, complete = true))
    } else {
      progress.update(LegProgress(mask, declared, n, sum, done = false))
      Iterator.empty
    }
  }

  /** Timeout: flush whatever arrived, flagged incomplete (the late-leg
    * reconciliation path owns it from here); a `done` tombstone is just
    * cleared — the call was already emitted complete. */
  override def handleExpiredTimer(key: String, timers: TimerValues,
      expired: ExpiredTimerInfo): Iterator[AssembledCall] = {
    val cur = if (progress.exists()) progress.get() else null
    progress.clear()
    if (cur == null || cur.done || cur.n == 0) Iterator.empty
    else Iterator.single(AssembledCall(key, cur.n, cur.sumDur, complete = false))
  }
}
