package graft.streaming

import org.apache.spark.sql.Encoders
import org.apache.spark.sql.streaming.{ExpiredTimerInfo, OutputMode, StatefulProcessor, TimeMode, TimerValues, TTLConfig}
import org.apache.spark.sql.streaming.ValueState

/** One tier band of a tariff plan, carried ON the usage record by the
  * live chain's tariff-attach stage. */
final case class TierRow(f: Long, t: Long, r: Long)

/** Usage record enriched with its OWN as-of tariff plan (the tiers the
  * plan timeline held at the record's event time) and the dim version
  * that resolved it — the rating-side `guide_ver` audit column. */
final case class TariffUsageRec(account_id: Long, event_id: Long,
    units: Long, tariff_ver: Long, tiers: Seq[TierRow])

final case class TariffRatedRec(account_id: Long, event_id: Long,
    units: Long, cum_units: Long, charge_centi: Long, tariff_ver: Long)

/** Online marginal rating under a LIVE tariff timeline — the
  * [[MarginalRater]] with the tier plan moved from a constructor
  * CONSTANT onto each record: the attach stage resolves the versioned
  * tariff dim per micro-batch and stamps every usage record with the
  * plan as-of its own event time, so a tariff amendment published
  * mid-cycle rates the NEXT batch at the new version with no stage
  * restart — the rating-side twin of the live-dim prerating stage,
  * where the reference's ceiling is reload-on-control-restart
  * (`MFramework.cpp:1802-1812`).
  *
  * Semantics (pinned record-for-record against the oracle-checked batch
  * q288 [[graft.queries.EventQ.marginalTieredChargesVersioned]]): the
  * per-account accumulator runs UNINTERRUPTED across plan changes, and
  * each record is charged T_plan(cum) − T_plan(cum − u) under ITS OWN
  * as-of plan — an amendment applies at the account's current tier
  * position from the next covered record on, which is what a rating
  * amendment means operationally. Late records (event time before
  * already-rated traffic) bill at the current accumulator position
  * under THEIR era's plan — the MarginalRater late-CDR rule composed
  * with the q279 versioned-guiding discipline. Records process in
  * `event_id` order within a batch; zero/negative usage advances
  * nothing and bills 0, never dropped.
  *
  * The attach stage only emits records a plan COVERS (timeline-gap
  * records stay in the enriched store under `covered=false` for a
  * correction run), so an empty tier plan here is a wiring bug and
  * fails loudly. Plan contiguity is validated once per dim VERSION in
  * the [[VersionedDim]] store
  * ([[graft.queries.EventQ.validateTariffTimeline]]) — never per batch,
  * never per record.
  */
final class VersionedTierRater
    extends StatefulProcessor[Long, TariffUsageRec, TariffRatedRec] {

  @transient private var cum: ValueState[Long] = _

  private def tTotal(u: Long, tiers: Seq[TierRow]): Long = tiers.map { x =>
    val over = math.max(u - x.f, 0L)
    x.r * (if (x.t == Long.MaxValue) over else math.min(over, x.t - x.f))
  }.sum

  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
    cum = getHandle.getValueState[Long]("cum", Encoders.scalaLong,
      TTLConfig.NONE)

  override def handleInputRows(key: Long, rows: Iterator[TariffUsageRec],
      timers: TimerValues): Iterator[TariffRatedRec] = {
    var c = if (cum.exists()) cum.get() else 0L
    val out = rows.toSeq.sortBy(_.event_id).map { r =>
      require(r.tiers != null && r.tiers.nonEmpty,
        s"VersionedTierRater: record ${r.event_id} arrived with no " +
          "tier plan — the attach stage must only emit covered records")
      val ue = math.max(r.units, 0L)
      val next = c + ue
      val charge = tTotal(next, r.tiers) - tTotal(c, r.tiers)
      c = next
      TariffRatedRec(key, r.event_id, r.units, c, charge, r.tariff_ver)
    }
    cum.update(c)
    out.iterator
  }

  override def handleExpiredTimer(key: Long, timers: TimerValues,
      expired: ExpiredTimerInfo): Iterator[TariffRatedRec] = Iterator.empty
}
