package graft.streaming

import org.apache.spark.sql.Encoders
import org.apache.spark.sql.streaming.{OutputMode, StatefulProcessor, TimeMode, TimerValues, TTLConfig, ValueState}

/** Streaming twin of `AnalyticsQ.funnelReach`: per-user ordered-funnel
  * progress as arbitrary streaming state. Each user advances through the
  * declared stage list; a stage-k event counts when its timestamp is
  * at-or-after the stage-(k-1) reach time (the same `>=` rule as the
  * batch operator), and every advance emits one [[StageReached]] row —
  * the live dashboard feed the batch query computes after the fact.
  *
  * State is two numbers per user (stage index + reach micros), so a
  * billion-user funnel is a few GB of state store — never a buffered
  * event list. Per batch the user's rows are sorted by time and scanned
  * once per remaining stage (equal-timestamp events may satisfy
  * consecutive stages in either arrival order, so a single pass is not
  * enough; passes are bounded by the stage count, each O(batch rows)).
  *
  * Ordering contract: within a micro-batch, arrival order is irrelevant
  * (the sort restores time order); ACROSS batches a stage event that
  * arrives after a later-stage event was already processed in a previous
  * batch is ignored — processing-order semantics, the standard streaming
  * funnel trade-off. For exact out-of-order parity run the batch
  * operator over the closed window.
  *
  * State lifetime: with the default `idleTtlMs = -1` state lives forever —
  * fine for a bounded key space, but on a continuous stream every user
  * ever seen is retained. Pass a positive `idleTtlMs` to expire a user's
  * progress that many ms after its LAST update (sliding TTL via the state
  * store's native `TTLConfig`): an idle user costs nothing, and a
  * post-TTL event sees empty state and restarts the funnel from stage 1 —
  * the sessionized semantics a production funnel wants. TTL requires
  * `TimeMode.ProcessingTime()` on the transformWithState call.
  */
final case class FunnelEvent(user_id: Long, event_type: String, ts_us: Long)

/** `stage` is 1-BASED — stage 1 = first funnel stage — matching the
  * `stage` column of the batch operator (`AnalyticsQ.funnelReach`), whose
  * streaming twin this is; the parity test pins the two together. (The
  * internal [[FunnelProgress.stage]] is the 0-based index of the stage
  * still AWAITED — after the final advance it equals `stages.length`.) */
final case class StageReached(
    user_id: Long, stage: Int, event_type: String, ts_us: Long)

/** `stage` = next stage index awaited (0-based); `reachUs` = timestamp
  * of the last advance (Long.MinValue before any). */
final case class FunnelProgress(stage: Int, reachUs: Long)

final class FunnelTracker(stages: Seq[String], idleTtlMs: Long = -1L)
    extends StatefulProcessor[Long, FunnelEvent, StageReached] {
  require(stages.nonEmpty, "funnel needs at least one stage")
  require(stages.distinct.size == stages.size, s"duplicate stages: $stages")

  /** stage -> 0-based index: the per-event hot path must not scan the
    * stage list (indexOf is O(|stages|) string compares per row). */
  private val stageIdx: Map[String, Int] = stages.zipWithIndex.toMap

  @transient private var progress: ValueState[FunnelProgress] = _

  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
    progress = getHandle.getValueState[FunnelProgress](
      "funnel", Encoders.product[FunnelProgress],
      if (idleTtlMs >= 0) TTLConfig(java.time.Duration.ofMillis(idleTtlMs))
      else TTLConfig.NONE)

  override def handleInputRows(key: Long, rows: Iterator[FunnelEvent],
      timers: TimerValues): Iterator[StageReached] = {
    var cur =
      if (progress.exists()) progress.get()
      else FunnelProgress(0, Long.MinValue)
    if (cur.stage >= stages.length) return Iterator.empty // funnel done

    // Only events for stages still ahead can matter; sort restores time
    // order within the batch (ties keep arrival order — the tiebreak only
    // matters across DIFFERENT stages, which the multi-pass handles).
    val relevant = rows.filter(e => stageIdx.getOrElse(e.event_type, -1) >= cur.stage)
      .toArray.sortBy(_.ts_us)
    val out = Seq.newBuilder[StageReached]
    var advanced = true
    while (advanced && cur.stage < stages.length) {
      advanced = false
      val want = stages(cur.stage)
      var i = 0
      while (!advanced && i < relevant.length) {
        val e = relevant(i)
        if (e.event_type == want && e.ts_us >= cur.reachUs) {
          cur = FunnelProgress(cur.stage + 1, e.ts_us)
          out += StageReached(key, cur.stage, want, e.ts_us)
          advanced = true
        }
        i += 1
      }
    }
    progress.update(cur)
    out.result().iterator
  }
}
