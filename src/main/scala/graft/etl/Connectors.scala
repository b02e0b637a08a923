package graft.etl

import org.apache.spark.sql.{DataFrame, SparkSession}

import scala.collection.concurrent.TrieMap

/** Source-connector registry — the Spark-native analogue of the
  * reference's protocol-pluggable file transfer (`ProtocolFactory.cpp:
  * 78-118`: a name → connection-factory map with idempotent registration;
  * registrations at `MFramework.cpp:152-155` for FTP/SFTP/FTPS/LOCAL).
  *
  * Spark reads any Hadoop-FS URI directly, so a "connector" here is just a
  * scheme-keyed strategy that resolves to a configured DataFrameReader.
  * Remote protocols without a Hadoop FS (the reference's FTP family) are
  * modeled as landing-zone reads: an external sync drops files on a
  * shared path, which is exactly the reference's own bulk-data plane
  * (files on disk, SURVEY §1.1).
  */
trait Connector {
  def scheme: String
  def read(spark: SparkSession, path: String, format: String,
      options: Map[String, String] = Map.empty): DataFrame
}

final class LocalConnector(val scheme: String = "file") extends Connector {
  def read(spark: SparkSession, path: String, format: String,
      options: Map[String, String]): DataFrame =
    spark.read.format(format).options(options).load(path)
}

/** Landing-zone connector: remote-protocol URIs resolve to a local mirror
  * directory (sync happens out-of-band, as in the reference deployment). */
final class LandingZoneConnector(val scheme: String, mirrorRoot: String) extends Connector {
  def read(spark: SparkSession, path: String, format: String,
      options: Map[String, String]): DataFrame = {
    val rel = path.stripPrefix(s"$scheme://")
    spark.read.format(format).options(options).load(s"$mirrorRoot/$rel")
  }
}

object ConnectorRegistry {
  private val connectors = TrieMap[String, Connector]()
  register(new LocalConnector())

  /** Idempotent, like `SOContainer::m_IsObjectLoaded` guarding re-loads
    * (`SOContainer.cpp:67-80`). */
  def register(c: Connector): Unit = connectors.putIfAbsent(c.scheme, c)

  def get(scheme: String): Option[Connector] = connectors.get(scheme)

  def registered: Seq[String] = connectors.keys.toSeq.sorted

  /** Resolve a full URI through the registered connector for its scheme;
    * scheme-less paths go through the local connector. */
  def read(spark: SparkSession, uri: String, format: String,
      options: Map[String, String] = Map.empty): DataFrame = {
    val scheme = uri.split("://", 2) match {
      case Array(s, _) => s
      case _           => "file"
    }
    val c = connectors.getOrElse(scheme,
      throw new IllegalArgumentException(
        s"no connector for scheme '$scheme' (registered: ${registered.mkString(", ")})"))
    c.read(spark, uri, format, options)
  }
}
