package graft.core

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Loud grain-contract guard for the bounded-collect operator class —
  * the "q234 bounded-collect" discipline turned from a docstring into a
  * `require`: [[graft.queries.AnalyticsQ.ewmaChart]],
  * `forecastIntervalCard`, the SES/Holt forecast folds and the
  * [[graft.functions.Aggregators.KendallPairs]] series aggregator all
  * build per-GROUP arrays sized by the SERIES (day-grain timelines —
  * thousands of elements), never by the corpus. A caller who passes
  * event-grain rows by mistake would otherwise discover it as an
  * executor OOM deep in a stage; the repo's house rule is a loud named
  * error on every data-dependent hazard, applied here to grain.
  *
  * The cap is deliberately generous (10⁵ — a 270-year daily timeline)
  * and configurable per JVM with `-Dgraft.grain.maxSeriesLen=N`; it is
  * read once at plan time on the driver and baked into the expression,
  * so executors need no configuration.
  */
object GrainGuard {

  /** Maximum per-group series length for the bounded-collect class. */
  val maxSeriesLen: Int =
    sys.props.get("graft.grain.maxSeriesLen").map(_.toInt).getOrElse(100000)

  /** The contract text shared by both the SQL-side and aggregator-side
    * guards, so the operator name and the fix land in every error. */
  def contract(op: String, cap: Int = maxSeriesLen): String =
    s"$op: per-group series exceeds graft.grain.maxSeriesLen=" +
      s"$cap elements - this operator folds a per-group array " +
      "bounded by the SERIES grain (e.g. one row per day), never by the " +
      "corpus; aggregate the input to (group, ord) series grain first"

  /** Wrap a collected per-group series column: pass it through when it
    * honors the grain contract, raise a loud named error otherwise.
    * (`cap` is injectable so the spec can prove the loud failure
    * without building a 10⁵-element fixture.) */
  def checked(series: Column, op: String,
      cap: Int = maxSeriesLen): Column =
    when(size(series) > cap,
      raise_error(concat(lit(contract(op, cap) + " (got "),
        size(series).cast("string"), lit(" elements)"))))
      .otherwise(series)
}
