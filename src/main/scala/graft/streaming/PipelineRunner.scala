package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.streaming.{StreamingQuery, StreamingQueryListener, Trigger}

import scala.collection.concurrent.TrieMap

/** One pipeline stage: a named streaming query = the reference's "session"
  * (a thread + input queue + plugin Run loop, `MFramework.cpp:714-915`).
  * The transform runs between a source DataFrame and a sink starter so
  * stages stay declarative and composable.
  */
final case class StageSpec(
    name: String,
    source: SparkSession => DataFrame,
    transform: DataFrame => DataFrame,
    sink: DataFrame => org.apache.spark.sql.streaming.DataStreamWriter[org.apache.spark.sql.Row])

/** Start/stop/restart named streaming stages — the control-plane surface
  * of the reference (`m_HandleControlStart/Stop`, `MFramework.cpp:
  * 1774-1925`) on top of Spark's StreamingQueryManager. Checkpointing,
  * exactly-once file handoff and recovery all come from Structured
  * Streaming (replacing the Dir1/Dir2 marker protocol,
  * `MFramework.cpp:821-903`).
  */
final class PipelineRunner(spark: SparkSession) {

  private def naturalKey(s: String): String = graft.core.NaturalOrder.key(s)

  private val specs = TrieMap[String, StageSpec]()
  private val active = TrieMap[String, StreamingQuery]()
  private val refreshHooks = TrieMap[String, () => Unit]()
  @volatile private var unknownStageResolver: String => Option[StageSpec] = _ => None

  def register(spec: StageSpec): Unit = specs.put(spec.name, spec)

  /** Install a stage's refresh hook — what a `refreshsession` control
    * packet (or [[refresh]]) invokes WITHOUT bouncing the query.
    * Stages resolving dims through a [[VersionedDim]] register
    * `dim.refresh` here, so an operator can force a reload+revalidate
    * at an unchanged version (post-incident recovery) while per-batch
    * re-resolution handles the normal version-advance path on its own. */
  def onRefresh(name: String, hook: () => Unit): Unit =
    refreshHooks.put(name, hook)

  /** Invoke a stage's refresh hook (no-op for stages without one —
    * their sources have no refreshable state). */
  def refresh(name: String): Unit = refreshHooks.get(name).foreach(_.apply())

  /** Install the unknown-stage fallback [[start]] consults — the
    * reference's `m_HandleControlStart` reloads session details from the
    * config DB when the control id is unknown (`MFramework.cpp:
    * 1802-1812`); [[Topology.wireControlStart]] plugs a config relation
    * in here so a control packet can start a stage the runner has never
    * seen. A resolved stage is registered before it starts. */
  def onUnknownStage(resolve: String => Option[StageSpec]): Unit =
    unknownStageResolver = resolve

  def registered: Seq[String] = specs.keys.toSeq.sorted

  def isRunning(name: String): Boolean = active.get(name).exists(_.isActive)

  /** `startsession` (`MFramework.cpp:1689,1774-1868`). Idempotent: an
    * already-active stage is left alone. */
  def start(name: String): StreamingQuery = {
    val spec = specs.getOrElse(name, {
      val loaded = unknownStageResolver(name).getOrElse(throw new IllegalArgumentException(
        s"unknown stage '$name' (have: ${registered.mkString(", ")})"))
      specs.put(name, loaded)
      loaded
    })
    active.get(name).filter(_.isActive).getOrElse {
      val q = spec.sink(spec.transform(spec.source(spark))).queryName(name).start()
      active.put(name, q)
      q
    }
  }

  /** `stopsession` (`MFramework.cpp:1748,1874-1925`). */
  def stop(name: String): Unit =
    active.remove(name).foreach(q => if (q.isActive) q.stop())

  /** `restartsession` = stop + start (`MFramework.cpp:1750-1754`). */
  def restart(name: String): StreamingQuery = { stop(name); start(name) }

  /** The reference's session-id-0 broadcast (`MFramework.cpp:1695-1726`). */
  def startAll(): Unit = registered.foreach(start)
  def stopAll(): Unit = active.keys.foreach(stop)

  /** Process one control packet (`s=<id or name>\na=<action>`), the
    * control-thread dispatch of `MFramework.cpp:1669-1754`. Target "0"
    * broadcasts to all registered stages. */
  def control(wire: String): Unit = {
    val m = graft.etl.PacketCodec.parseLocal(wire)
    val target = m.getOrElse(graft.etl.PacketCodec.SessionKey, return)
    val action = m.getOrElse(graft.etl.PacketCodec.ActionKey, return)
    val names = if (target == "0") registered else Seq(target)
    action match {
      case "startsession"   => names.foreach(start)
      case "stopsession"    => names.foreach(stop)
      case "restartsession" => names.foreach(restart)
      case "refreshsession" => names.foreach(refresh)
      case _                => // unknown actions ignored, as in the reference
    }
  }

  def awaitAnyTermination(): Unit = spark.streams.awaitAnyTermination()

  /** Attach a listening control-plane ingress: a streaming file source
    * watching `dir`, where each dropped file is ONE wire control packet
    * (`s=<stage>\na=<action>`) dispatched through [[control]] — the
    * analogue of the reference's control thread blocking on its AMQP
    * control queue (`MFramework.cpp:1581-1768`), so an external operator
    * can start/stop/restart stages while the app runs just by writing a
    * file.
    *
    * The checkpoint makes control consumption resumable (a packet is not
    * re-dispatched after its batch commits). The per-batch collect is
    * driver-side by design: control packets are human-scale commands, not
    * data. The ingress itself is not a registered stage, so a broadcast
    * `s=0` stop does not stop the listener.
    */
  def controlIngress(dir: String, checkpointDir: String,
      trigger: Trigger = Triggers.microBatch("500 milliseconds")): StreamingQuery = {
    import org.apache.spark.sql.functions.{input_file_name, length, substring}
    val packets = spark.readStream
      .option("wholetext", "true")
      .text(dir)
      // control packets are human-scale commands; a data file dropped in
      // the control dir by mistake must not be hauled to the driver
      .filter(length(org.apache.spark.sql.functions.col("value")) <= 65536)
      .select(substring(org.apache.spark.sql.functions.col("value"), 1, 65536).as("value"),
        input_file_name().as("src_file"))
    packets.writeStream
      .queryName(s"control_ingress_$dir")
      .option("checkpointLocation", checkpointDir)
      .trigger(trigger)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        // dispatch in drop order, not partition order — a stop;start
        // sequence landing in one trigger must not reverse. Natural sort
        // (digit runs compared numerically) so cmd_9 precedes cmd_10 even
        // without zero padding.
        batch.collect().sortBy(r => naturalKey(r.getString(1))).foreach { row =>
          // a malformed packet (unknown stage, bad wire format) must not
          // kill the listening channel: the batch would never commit and
          // the checkpoint would replay the poison file forever
          try control(row.getString(0))
          catch {
            case e: Exception =>
              System.err.println(s"[control-ingress] dropped bad packet ${row.getString(1)}: ${e.getMessage}")
          }
        }
      }
      .start()
  }
}

/** Supervisor: auto-restart terminated-with-error stages — the reference's
  * monitor thread (`m_StartMonitoring`, `MFramework.cpp:1931-1970`, 1 s
  * poll + restart of dead sessions) as an event listener with a bounded
  * retry budget.
  */
final class SupervisorListener(runner: PipelineRunner, maxRestarts: Int = 3)
    extends StreamingQueryListener {

  private val restarts = TrieMap[String, Int]()
  private val namesById = TrieMap[java.util.UUID, String]()

  def restartCount(name: String): Int = restarts.getOrElse(name, 0)

  override def onQueryStarted(e: StreamingQueryListener.QueryStartedEvent): Unit =
    if (e.name != null) namesById.put(e.id, e.name)
  override def onQueryProgress(e: StreamingQueryListener.QueryProgressEvent): Unit = ()

  override def onQueryTerminated(e: StreamingQueryListener.QueryTerminatedEvent): Unit = {
    val name = namesById.getOrElse(e.id, null)
    if (name != null && e.exception.isDefined) {
      val n = restarts.updateWith(name) { c => Some(c.getOrElse(0) + 1) }.getOrElse(0)
      if (n <= maxRestarts && runner.registered.contains(name)) runner.restart(name)
    }
  }
}

object Triggers {
  /** The reference's polling micro-batch cadence (2/10 ms sleeps,
    * `MFramework.cpp:1473,1574`) maps to ProcessingTime triggers; its
    * cron-launched batch runs (`gsmrating.sh`) map to AvailableNow. */
  def microBatch(interval: String = "1 second"): Trigger = Trigger.ProcessingTime(interval)
  def drainAvailable: Trigger = Trigger.AvailableNow()
}
