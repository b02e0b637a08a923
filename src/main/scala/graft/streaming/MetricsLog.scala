package graft.streaming

import java.io.{File, FileOutputStream, OutputStreamWriter, PrintWriter}
import java.nio.charset.StandardCharsets

import org.apache.spark.sql.streaming.StreamingQueryListener

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
  * Terminations append a `{"stage", "event":"terminated", "error"}`
  * line, so the restart history ([[SupervisorListener]]'s actions) is
  * visible in the same stream.
  *
  * Discipline: the listener-bus thread must NEVER run Spark jobs (a
  * blocking job inside a listener deadlocks shutdown), so this is pure
  * driver-side file I/O — synchronized line appends, flushed per line
  * (a tail-reader sees whole lines; JSONL survives crashes at line
  * granularity). Register with
  * `spark.streams.addListener(new MetricsLog(path))` beside the
  * supervisor. */
final class MetricsLog(path: String) extends StreamingQueryListener {

  private val out = {
    val f = new File(path)
    Option(f.getParentFile).foreach(_.mkdirs())
    new PrintWriter(new OutputStreamWriter(
      new FileOutputStream(f, true), StandardCharsets.UTF_8))
  }

  private def esc(s: String): String =
    s.replace("\\", "\\\\").replace("\"", "\\\"")
      .replace("\n", "\\n").replace("\r", "\\r").replace("\t", "\\t")

  private def emit(line: String): Unit = synchronized {
    out.println(line)
    out.flush()
  }

  override def onQueryStarted(
      e: StreamingQueryListener.QueryStartedEvent): Unit =
    emit(s"""{"stage":"${esc(Option(e.name).getOrElse(""))}",""" +
      s""""run_id":"${e.runId}","event":"started","ts":"${esc(e.timestamp)}"}""")

  override def onQueryProgress(
      e: StreamingQueryListener.QueryProgressEvent): Unit = {
    val p = e.progress
    val stateRows = p.stateOperators.map(_.numRowsTotal).sum
    val batchMs = Option(p.durationMs.get("triggerExecution"))
      .map(_.longValue).getOrElse(0L)
    val rps =
      if (p.processedRowsPerSecond.isNaN ||
          p.processedRowsPerSecond.isInfinite) 0.0
      else p.processedRowsPerSecond
    emit(s"""{"stage":"${esc(Option(p.name).getOrElse(""))}",""" +
      s""""run_id":"${p.runId}","batch_id":${p.batchId},""" +
      s""""ts":"${esc(p.timestamp)}","input_rows":${p.numInputRows},""" +
      f""""rows_per_sec":$rps%.1f,"batch_ms":$batchMs,""" +
      s""""state_rows":$stateRows}""")
  }

  override def onQueryTerminated(
      e: StreamingQueryListener.QueryTerminatedEvent): Unit =
    emit(s"""{"run_id":"${e.runId}","event":"terminated",""" +
      s""""error":"${esc(e.exception.getOrElse(""))}"}""")

  /** Close the underlying writer (tests / orderly shutdown; the log is
    * flushed per line, so skipping this loses nothing). */
  def close(): Unit = synchronized(out.close())
}
