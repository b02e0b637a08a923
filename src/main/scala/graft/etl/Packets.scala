package graft.etl

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** The reference's control-plane wire format: newline-separated `k=v`
  * lines with single-char keys (parse `MFramework.cpp:1230-1243`,
  * serialize `MFramework.cpp:1552-1560`, logger variant
  * `LoggerWriter.cpp:208-213`).
  *
  * Column-level codec uses only built-in codegen'd expressions
  * (str_to_map / transform / concat_ws) — no UDFs in the hot path.
  */
object PacketCodec {

  /** Keys observed in the reference (SURVEY §1.1). */
  val SessionKey = "s"
  val FileKey = "f"
  val TargetKey = "t"
  val ActionKey = "a"
  val ComponentKey = "c"
  val LevelKey = "l"
  val MessageKey = "m"

  /** Wire string column → map<string,string> column. */
  def parse(wire: Column): Column = str_to_map(wire, lit("\n"), lit("="))

  /** map<string,string> column → wire string column. Entries keep map
    * order; use [[serializeSorted]] when a canonical form is needed. */
  def serialize(m: Column): Column =
    concat_ws("\n", transform(map_entries(m), e =>
      concat(e.getField("key"), lit("="), e.getField("value"))))

  /** Canonical (key-sorted) wire form — deterministic across engines. */
  def serializeSorted(m: Column): Column =
    concat_ws("\n", transform(array_sort(map_entries(m)), e =>
      concat(e.getField("key"), lit("="), e.getField("value"))))

  /** Driver-side codec for property tests and small control payloads —
    * mirrors the reference's split-on-\n / key at index 0 / '=' at index 1
    * rule: lines without '=' at position 1 are ignored. */
  def parseLocal(wire: String): Map[String, String] =
    wire.split("\n", -1).toSeq
      .filter(l => l.length >= 2 && l.charAt(1) == '=')
      .map(l => l.substring(0, 1) -> l.substring(2))
      .toMap

  /** Serialization fails LOUDLY on entries the line-oriented wire cannot
    * round-trip (the parse rule is split-on-\n with '=' at index 1):
    * multi-char keys would parse as garbage lines, and a newline inside
    * a value would silently truncate it and inject a phantom line — a
    * caller passing a custom session string must find out at serialize
    * time, not when a downstream queue misroutes. */
  def serializeLocal(m: Map[String, String]): String = {
    m.foreach { case (k, v) =>
      require(k.length == 1 && k != "\n" && k != "\r",
        s"PacketCodec: key must be one wire-safe char, got '$k'")
      require(!v.contains("\n") && !v.contains("\r"),
        s"PacketCodec: value for key '$k' contains a line break — the " +
          "line-oriented wire cannot carry it (escape or strip it first)")
    }
    m.toSeq.sortBy(_._1).map { case (k, v) => s"$k=$v" }.mkString("\n")
  }
}

/** Packet-stream operators: validation split and key routing — the
  * reference's reader-thread logic (`MFramework.cpp:1245-1314`) as
  * declarative transforms.
  */
object PacketOps {

  /** Split a parsed packet stream into (valid, deadLetter) on the required
    * session key (`MFramework.cpp:1245-1250` drops and logs). */
  def validate(df: DataFrame, pkt: Column): (DataFrame, DataFrame) = {
    val withSession = df.withColumn("_session", element_at(pkt, PacketCodec.SessionKey))
    (withSession.filter(col("_session").isNotNull).drop("_session"),
      withSession.filter(col("_session").isNull).drop("_session"))
  }

  /** Routing column for demux-by-target (`MFramework.cpp:1372-1377`);
    * write with `.partitionBy(routeCol)` for lazy per-destination outputs
    * (the reference's lazily-created per-type writers, `:1385-1446`). */
  def routeKey(pkt: Column): Column =
    coalesce(element_at(pkt, PacketCodec.TargetKey), lit("_unrouted"))
}
