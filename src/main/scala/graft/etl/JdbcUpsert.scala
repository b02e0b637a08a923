package graft.etl

import java.sql.DriverManager
import java.util.Properties

import org.apache.spark.sql.DataFrame

/** Exactly-once JDBC upsert sink for `foreachBatch` — the engine's analogue
  * of the reference's transactional Oracle writes (its marker-file protocol
  * existed to avoid re-applying replayed work after a crash,
  * `MFramework.cpp:821-903`; Structured Streaming replays the last
  * uncommitted micro-batch on recovery, so a naive JDBC append would
  * double-apply it).
  *
  * Per batch:
  *  1. the batch DataFrame overwrites a staging table (distributed write —
  *     overwrite makes the step idempotent under retry);
  *  2. one driver-side transaction: skip if `batchId` is already in the
  *     ledger, else delete target rows whose keys appear in staging,
  *     insert staging into the target, record the batchId — commit.
  * A replayed batch either finds its ledger row (no-op) or re-runs the
  * transaction from a consistent staging snapshot; the target never sees a
  * partial or doubled batch.
  */
/** @param maxStringLen staged string columns become VARCHAR(maxStringLen)
  *   (Derby's CLOB default is not comparable), so size it to the domain's
  *   widest key.
  * @param truncateOverflow what to do with a string value longer than
  *   `maxStringLen`. `true` (default): silently right-truncate — the write
  *   always succeeds, at the cost of merged keys if a KEY column overflows
  *   (size `maxStringLen` so keys never do). `false`: fail the batch with
  *   an error naming the offending column(s). Either way the failure mode
  *   is explicit — without this, one over-length row fails the staging
  *   write on every replay of the micro-batch: a permanent poison pill
  *   that halts the stream (the exact failure LegAssembler avoids).
  */
final class JdbcUpsert(url: String, props: Properties, target: String,
    staging: String, ledger: String, keyCols: Seq[String],
    maxStringLen: Int = 512, truncateOverflow: Boolean = true)
    extends Serializable {

  require(keyCols.nonEmpty, "at least one key column required")
  require(maxStringLen > 0, "maxStringLen must be positive")

  /** The (batch, batchId) function to pass to `writeStream.foreachBatch`. */
  def sink: (DataFrame, Long) => Unit = (batch0, batchId) => {
    import org.apache.spark.sql.functions.{col, length, max, substring}
    val stringFields = batch0.schema.fields
      .filter(_.dataType == org.apache.spark.sql.types.StringType)
    val batch =
      if (stringFields.isEmpty) batch0
      else if (truncateOverflow)
        stringFields.foldLeft(batch0)((df, f) =>
          df.withColumn(f.name, substring(col(f.name), 1, maxStringLen)))
      else {
        // one aggregate over the batch names every offending column up
        // front — a clear, actionable error instead of a dialect-specific
        // write failure that replays forever
        val widths = batch0.agg(
          max(length(col(stringFields.head.name))),
          stringFields.tail.map(f => max(length(col(f.name)))): _*).head()
        val over = stringFields.zipWithIndex.collect {
          case (f, i) if !widths.isNullAt(i) && widths.getInt(i) > maxStringLen =>
            s"${f.name} (max ${widths.getInt(i)})"
        }
        require(over.isEmpty,
          s"batch $batchId has string values over VARCHAR($maxStringLen) in: " +
            over.mkString(", ") + " — widen maxStringLen or enable truncateOverflow")
        batch0
      }
    // string columns as VARCHAR, not the dialect's default CLOB — Derby
    // CLOBs aren't comparable, and the key-match below compares them
    val stringCols = stringFields.map(f => s"${f.name} VARCHAR($maxStringLen)")
    val writer = batch.write.mode("overwrite")
    (if (stringCols.nonEmpty)
       writer.option("createTableColumnTypes", stringCols.mkString(", "))
     else writer).jdbc(url, staging, props)
    val conn = DriverManager.getConnection(url, props)
    try {
      conn.setAutoCommit(false)
      ensureTables(conn)
      val seen = {
        val ps = conn.prepareStatement(
          s"SELECT 1 FROM $ledger WHERE sink_name = ? AND batch_id = ?")
        ps.setString(1, target); ps.setLong(2, batchId)
        val rs = ps.executeQuery()
        try rs.next() finally { rs.close(); ps.close() }
      }
      if (!seen) {
        // no alias on the DELETE target (Derby doesn't allow one); column
        // identifiers are double-quoted because Spark's JDBC writer
        // creates them quoted (case-sensitive lowercase)
        val keyMatch = keyCols.map(k => s"""$target."$k" = s."$k"""").mkString(" AND ")
        val st = conn.createStatement()
        st.executeUpdate(
          s"DELETE FROM $target WHERE EXISTS (SELECT 1 FROM $staging s WHERE $keyMatch)")
        // explicit column list: the target schema is frozen at first-ever
        // batch while staging is recreated per batch — a positional
        // SELECT * would silently mis-map reordered columns on redeploy
        val colList = batch.schema.fieldNames.map(c => s""""$c"""").mkString(", ")
        st.executeUpdate(
          s"INSERT INTO $target ($colList) SELECT $colList FROM $staging")
        st.close()
        val ps = conn.prepareStatement(
          s"INSERT INTO $ledger (sink_name, batch_id) VALUES (?, ?)")
        ps.setString(1, target); ps.setLong(2, batchId)
        ps.executeUpdate(); ps.close()
      }
      conn.commit()
    } catch {
      case e: Throwable => conn.rollback(); throw e
    } finally conn.close()
  }

  /** Create target (cloned from staging's JDBC schema) and ledger if absent
    * — inside the caller's transaction, so creation races roll back clean. */
  private def ensureTables(conn: java.sql.Connection): Unit = {
    // resolve schema-qualified / quoted names before the metadata lookup:
    // `app.t` → (schema APP, table T); `"MixedCase"` keeps its exact case;
    // unquoted parts fold to upper (Derby's identifier rule)
    def exists(name: String): Boolean = {
      def part(s: String): String =
        if (s.length >= 2 && s.startsWith("\"") && s.endsWith("\""))
          s.substring(1, s.length - 1)
        else s.toUpperCase
      val (schema, table) = name.split("\\.", 2) match {
        case Array(sch, t) => (part(sch), part(t))
        case _             => (null, part(name))
      }
      val rs = conn.getMetaData.getTables(null, schema, table, null)
      try rs.next() finally rs.close()
    }
    if (!exists(target)) {
      val st = conn.createStatement()
      st.executeUpdate(
        s"CREATE TABLE $target AS SELECT * FROM $staging WITH NO DATA")
      st.close()
    }
    if (!exists(ledger)) {
      val st = conn.createStatement()
      st.executeUpdate(
        s"CREATE TABLE $ledger (sink_name VARCHAR(128) NOT NULL, " +
          "batch_id BIGINT NOT NULL, PRIMARY KEY (sink_name, batch_id))")
      st.close()
    }
  }
}
