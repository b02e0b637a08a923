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

/** Pluggable remote-file transport — the reference's SOConnection family
  * behind `ProtocolFactory` (`ProtocolFactory.cpp:78-118`). A production
  * deployment plugs an SSH/SFTP client implementation; tests plug a
  * local-FS fake. The connector layer above is transport-agnostic.
  */
trait FileTransport {
  /** Names (relative) of the files under `remotePath` on `host`. */
  def list(host: String, remotePath: String): Seq[String]
  /** Byte size of one remote file — used to skip re-staging. */
  def size(host: String, remoteFile: String): Long
  /** Remote modification time (epoch millis). Transports that can't report
    * one return <= 0, and staging falls back to size-only comparison — a
    * same-size in-place edit is then invisible until a forced restage. */
  def mtime(host: String, remoteFile: String): Long = 0L
  /** Fetch one remote file to `localDest` (overwrite). */
  def fetch(host: String, remoteFile: String, localDest: java.nio.file.Path): Unit
}

/** `sftp://host/path` connector: performs the sync the reference's FTP
  * family did (`MFramework.cpp:152-155` registrations) — stages remote
  * files into a per-host landing zone through the [[FileTransport]], then
  * reads the staged copies with Spark. Staging is incremental: a file
  * already staged at the same byte size AND remote mtime is not
  * re-fetched, so repeated reads only pull new/changed files (the
  * reference's marker-file delta protocol, `MFramework.cpp:821-903`,
  * collapsed to a size+mtime comparison).
  */
class SftpConnector(transport: FileTransport, stagingRoot: String,
    val scheme: String = "sftp") extends Connector {

  def read(spark: SparkSession, path: String, format: String,
      options: Map[String, String]): DataFrame = {
    val stageDir = stage(path)
    spark.read.format(format).options(options).load(stageDir.toString)
  }

  /** Sync the remote dir into the landing zone; returns the staged dir.
    *
    * Remote-supplied names are UNTRUSTED: both the URI path and each
    * listed file name are normalized and required to stay inside the
    * staging root / stage dir, so a hostile or misbehaving remote can't
    * traverse (`../../...`) into arbitrary local paths. Files that
    * disappeared remotely are removed from the stage dir, so retracted
    * data stops flowing on the next read.
    */
  def stage(uri: String): java.nio.file.Path = {
    import java.nio.file.{Files, Path, Paths}
    val rest = uri.stripPrefix(s"$scheme://")
    val (host, remotePath) = rest.split("/", 2) match {
      case Array(h, p) => (h, p)
      case Array(h)    => (h, "")
    }
    // the host names a directory component — forbid anything that could
    // redirect it (separators, dots-only) before it touches a path
    require(host.nonEmpty && host.matches("[A-Za-z0-9._-]+") && !host.forall(_ == '.'),
      s"invalid host in '$uri'")
    val hostRoot = Paths.get(stagingRoot, host).toAbsolutePath.normalize
    def confined(p: Path, base: Path, what: String): Path = {
      val n = p.toAbsolutePath.normalize
      require(n.startsWith(base) && n != base, s"$what escapes the staging area: $p")
      n
    }
    // confinement is per-HOST: a URI like sftp://evil/../trusted/x must not
    // reach (or reconcile-delete inside) another host's landing zone
    val stageDir =
      if (remotePath.isEmpty) hostRoot
      else confined(hostRoot.resolve(remotePath), hostRoot, s"'$uri'")
    Files.createDirectories(stageDir)
    val remoteNames = transport.list(host, remotePath)
    val staged = remoteNames.map { name =>
      val dest = confined(stageDir.resolve(name), stageDir, s"remote name '$name'")
      Files.createDirectories(dest.getParent) // names may be nested (y/m/f.csv)
      val remoteFile = if (remotePath.isEmpty) name else s"$remotePath/$name"
      // staged copies carry the REMOTE mtime (stamped below), so equality
      // detects same-size in-place edits; mtime <= 0 → size-only fallback
      val remoteMtime = transport.mtime(host, remoteFile)
      val upToDate = Files.exists(dest) &&
        Files.size(dest) == transport.size(host, remoteFile) &&
        (remoteMtime <= 0L ||
          Files.getLastModifiedTime(dest).toMillis == remoteMtime)
      if (!upToDate) {
        transport.fetch(host, remoteFile, dest)
        if (remoteMtime > 0L)
          Files.setLastModifiedTime(dest,
            java.nio.file.attribute.FileTime.fromMillis(remoteMtime))
      }
      dest
    }.toSet
    // reconcile deletions at any depth: staged files the remote no longer
    // lists stop flowing on the next read
    val walk = Files.walk(stageDir)
    try walk.iterator().forEachRemaining { p =>
      if (Files.isRegularFile(p) && !staged.contains(p.toAbsolutePath.normalize))
        Files.delete(p)
    } finally walk.close()
    stageDir
  }
}

/** Live `ftp://` connector: the reference registers four protocols —
  * FTP/SFTP/FTPS/LOCAL (`ProtocolFactory.cpp:78-118`, registrations
  * `MFramework.cpp:152-155`) — and graft's stage-then-read pipeline is
  * protocol-agnostic behind [[FileTransport]], so the FTP family is the
  * SAME incremental staging (size+mtime delta, per-host confinement,
  * deletion reconcile) with an FTP client plugged into the transport
  * seam. Tests plug a local-FS fake; production plugs a real client. */
class FtpConnector(transport: FileTransport, stagingRoot: String)
  extends SftpConnector(transport, stagingRoot, "ftp")

/** Live `ftps://` connector — [[FtpConnector]] over a TLS transport; the
  * scheme split mirrors the reference's separate FTPS registration. */
class FtpsConnector(transport: FileTransport, stagingRoot: String)
  extends SftpConnector(transport, stagingRoot, "ftps")

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
