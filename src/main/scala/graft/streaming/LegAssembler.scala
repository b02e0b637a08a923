package graft.streaming

import org.apache.spark.sql.Encoders
import org.apache.spark.sql.streaming.{ExpiredTimerInfo, ListState, OutputMode, StatefulProcessor, TimeMode, TimerValues, TTLConfig}

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
  */
final case class Leg(call_id: String, seq: Int, total: Int, duration_sec: Double)
final case class AssembledCall(
    call_id: String, n_legs: Int, total_duration: Double, complete: Boolean)

final class LegAssembler(timeoutMs: Long = -1L)
    extends StatefulProcessor[String, Leg, AssembledCall] {

  @transient private var legs: ListState[Leg] = _

  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
    legs = getHandle.getListState[Leg]("legs", Encoders.product[Leg], TTLConfig.NONE)

  override def handleInputRows(key: String, rows: Iterator[Leg],
      timers: TimerValues): Iterator[AssembledCall] = {
    val existing = legs.get().toSeq
    val seen = scala.collection.mutable.Set(existing.map(_.seq): _*)
    val fresh = rows.filter(l => seen.add(l.seq)).toSeq // duplicate seqs dropped
    if (existing.isEmpty && fresh.nonEmpty && timeoutMs >= 0)
      getHandle.registerTimer(timers.getCurrentProcessingTimeInMs() + timeoutMs)
    val all = existing ++ fresh
    val declared = all.map(_.total).max
    if (all.map(_.seq).toSet == (1 to declared).toSet) {
      legs.clear()
      Iterator.single(AssembledCall(key, all.size, all.map(_.duration_sec).sum, complete = true))
    } else {
      fresh.foreach(legs.appendValue)
      Iterator.empty
    }
  }

  /** Timeout: flush whatever arrived, flagged incomplete (the late-leg
    * reconciliation path owns it from here). */
  override def handleExpiredTimer(key: String, timers: TimerValues,
      expired: ExpiredTimerInfo): Iterator[AssembledCall] = {
    val all = legs.get().toSeq
    legs.clear()
    if (all.isEmpty) Iterator.empty
    else Iterator.single(
      AssembledCall(key, all.size, all.map(_.duration_sec).sum, complete = false))
  }
}
