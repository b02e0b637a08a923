package graft.streaming

import java.io.{File, FileOutputStream, OutputStreamWriter, PrintWriter}
import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths, StandardCopyOption}
import java.util.Locale

import org.apache.spark.sql.streaming.StreamingQueryListener

import graft.etl.PacketCodec

/** Per-batch runtime metrics feed — the reference monitor thread's
  * health view (`MFramework.cpp:1593-1655` polls each session and
  * publishes status through the logger plane, `LoggerWriter.cpp`)
  * re-expressed as a [[StreamingQueryListener]]: every QueryProgress
  * event appends ONE JSON line to a local metrics log —
  *
  *   {"stage", "run_id", "batch_id", "ts", "input_rows",
  *    "rows_per_sec", "batch_ms", "state_rows"}
  *
  * — the ops feed a dashboard tails (`spark.read.json(path)` makes it a
  * DataFrame; each field is a scalar so the schema infers stably).
  * Terminations append a `{"stage", "run_id", "event":"terminated",
  * "error"}` line — Spark's terminated event carries no query name, so
  * the listener keeps its own run_id→stage map (fed by the started and
  * progress events) and stamps the stage from it; a run that somehow
  * terminates before its started event reached this listener falls
  * back to `""`, never a dropped line. So the restart history
  * ([[SupervisorListener]]'s actions) is visible in the same stream,
  * already joined to its stage.
  *
  * JSON hygiene: numeric fields are formatted under `Locale.ROOT`
  * (the f-interpolator would use the JVM default locale — a
  * comma-decimal locale like de_DE would emit `12,3` and break the
  * `spark.read.json` contract), and string escaping covers EVERY
  * control char below 0x20 (as `\u00XX`), not just the common three.
  *
  * Packet-plane publication (the reference's LOGGER_DATA leg,
  * `LoggerWriter.cpp:88,208-213`): pass `queueDir` and every health
  * line ALSO lands as one wire packet `s=1\nc=<stage>\nl=<level>\n
  * m=<json line>` (level `I` = started/progress, `E` = terminated with
  * error, `N` = clean termination — [[graft.etl.AuditLog.Levels]]),
  * written tmp-then-rename so a consumer never reads a torn packet.
  * Downstream consumes it like any other queue on the plane:
  * `spark.read.option("wholetext", true).text(queueDir)` →
  * [[PacketCodec.parse]] → level-filter ([[graft.etl.AuditLog]]) →
  * `m=` payload back through `from_json`. The packets carry the
  * message INLINE (no `f=` pointer) exactly like the reference's log
  * packets — health lines are human-scale, never fact data.
  *
  * Discipline: the listener-bus thread must NEVER run Spark jobs (a
  * blocking job inside a listener deadlocks shutdown), so this is pure
  * driver-side file I/O — synchronized line appends, flushed per line
  * (a tail-reader sees whole lines; JSONL survives crashes at line
  * granularity). Register with
  * `spark.streams.addListener(new MetricsLog(path))` beside the
  * supervisor. */
final class MetricsLog(path: String, queueDir: Option[String] = None)
    extends StreamingQueryListener {

  private val out = {
    val f = new File(path)
    Option(f.getParentFile).foreach(_.mkdirs())
    new PrintWriter(new OutputStreamWriter(
      new FileOutputStream(f, true), StandardCharsets.UTF_8))
  }

  queueDir.foreach(d => new File(d).mkdirs())

  /** run_id → query name, fed by started/progress events so the
    * terminated line (whose Spark event has no name) carries its stage. */
  private val stageOf = new java.util.concurrent.ConcurrentHashMap[String, String]()

  /** Seeded PAST the existing packets: a restarted listener starts a
    * fresh instance with a zero counter, and rename-over-existing is a
    * silent replace on POSIX — without the seed, a restart would
    * overwrite the oldest health packets still sitting in the queue. */
  private var pktSeq: Long = queueDir.map { d =>
    Option(new File(d).list()).getOrElse(Array.empty[String])
      .filter(n => n.startsWith("m") && n.endsWith(".pkt"))
      .flatMap(n => scala.util.Try(
        n.stripPrefix("m").stripSuffix(".pkt").toLong).toOption)
      .foldLeft(-1L)(math.max) + 1L
  }.getOrElse(0L)

  private def esc(s: String): String = {
    val b = new StringBuilder(s.length + 8)
    s.foreach {
      case '\\' => b.append("\\\\")
      case '"' => b.append("\\\"")
      case '\n' => b.append("\\n")
      case '\r' => b.append("\\r")
      case '\t' => b.append("\\t")
      case c if c < 0x20 =>
        b.append(String.format(Locale.ROOT, "\\u%04x", Int.box(c.toInt)))
      case c => b.append(c)
    }
    b.result()
  }

  /** Append the JSON line; when the packet leg is on, also commit it as
    * one `s/c/l/m` packet (tmp-then-rename — never a torn read). */
  private def emit(line: String, stage: String, level: String): Unit =
    synchronized {
      out.println(line)
      out.flush()
      queueDir.foreach { d =>
        // Locale.ROOT like the JSON payload: a locale with non-ASCII
        // digits would break lexicographic queue order AND the restart
        // seed's toLong parse (seed falls back to 0 → rename-overwrite).
        val name = String.format(Locale.ROOT, "m%020d.pkt", Long.box(pktSeq))
        pktSeq += 1
        val body = PacketCodec.serializeLocal(Map(
          PacketCodec.SessionKey -> "1",
          PacketCodec.ComponentKey -> stage,
          PacketCodec.LevelKey -> level,
          PacketCodec.MessageKey -> line))
        val tmp = Paths.get(d, s".tmp-$name")
        Files.write(tmp, body.getBytes(StandardCharsets.UTF_8))
        Files.move(tmp, Paths.get(d, name),
          StandardCopyOption.ATOMIC_MOVE)
      }
    }

  override def onQueryStarted(
      e: StreamingQueryListener.QueryStartedEvent): Unit = {
    val stage = Option(e.name).getOrElse("")
    stageOf.put(e.runId.toString, stage)
    emit(s"""{"stage":"${esc(stage)}",""" +
      s""""run_id":"${e.runId}","event":"started","ts":"${esc(e.timestamp)}"}""",
      esc(stage), "I")
  }

  override def onQueryProgress(
      e: StreamingQueryListener.QueryProgressEvent): Unit = {
    val p = e.progress
    val stage = Option(p.name).getOrElse("")
    stageOf.put(p.runId.toString, stage)
    val stateRows = p.stateOperators.map(_.numRowsTotal).sum
    val batchMs = Option(p.durationMs.get("triggerExecution"))
      .map(_.longValue).getOrElse(0L)
    val rps =
      if (p.processedRowsPerSecond.isNaN ||
          p.processedRowsPerSecond.isInfinite) 0.0
      else p.processedRowsPerSecond
    emit(s"""{"stage":"${esc(stage)}",""" +
      s""""run_id":"${p.runId}","batch_id":${p.batchId},""" +
      s""""ts":"${esc(p.timestamp)}","input_rows":${p.numInputRows},""" +
      s""""rows_per_sec":${String.format(Locale.ROOT, "%.1f", Double.box(rps))},""" +
      s""""batch_ms":$batchMs,"state_rows":$stateRows}""",
      esc(stage), "I")
  }

  override def onQueryTerminated(
      e: StreamingQueryListener.QueryTerminatedEvent): Unit = {
    val stage = Option(stageOf.get(e.runId.toString)).getOrElse("")
    val err = e.exception.getOrElse("")
    emit(s"""{"stage":"${esc(stage)}","run_id":"${e.runId}",""" +
      s""""event":"terminated","error":"${esc(err)}"}""",
      esc(stage), if (err.nonEmpty) "E" else "N")
  }

  /** Close the underlying writer (tests / orderly shutdown; the log is
    * flushed per line, so skipping this loses nothing). */
  def close(): Unit = synchronized(out.close())
}
