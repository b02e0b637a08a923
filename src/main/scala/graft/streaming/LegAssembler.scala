package graft.streaming

import org.apache.spark.sql.Encoders
import org.apache.spark.sql.streaming.{ListState, OutputMode, StatefulProcessor, TimeMode, TimerValues, TTLConfig}

/** Multi-leg (partial) CDR assembly as arbitrary streaming state
  * (SURVEY §2B streaming row, `transformWithState`): legs of one call
  * arrive out of order across micro-batches; the assembled call is
  * emitted once every declared leg is present, then state is freed.
  *
  * This is the streaming twin of RatingPipeline.assembleLegs and the
  * replacement for the reference's plugin-held in-memory session state
  * (which a crash lost — here the state store checkpoints it).
  */
final case class Leg(call_id: String, seq: Int, total: Int, duration_sec: Double)
final case class AssembledCall(call_id: String, n_legs: Int, total_duration: Double)

final class LegAssembler extends StatefulProcessor[String, Leg, AssembledCall] {

  @transient private var legs: ListState[Leg] = _

  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
    legs = getHandle.getListState[Leg]("legs", Encoders.product[Leg], TTLConfig.NONE)

  override def handleInputRows(key: String, rows: Iterator[Leg],
      timers: TimerValues): Iterator[AssembledCall] = {
    rows.foreach(legs.appendValue)
    val all = legs.get().toSeq
    val declared = all.map(_.total).max
    if (all.map(_.seq).toSet == (1 to declared).toSet) {
      legs.clear()
      Iterator.single(AssembledCall(key, all.size, all.map(_.duration_sec).sum))
    } else Iterator.empty
  }
}
