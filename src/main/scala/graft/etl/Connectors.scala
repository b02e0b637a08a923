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

  // ---- upload leg — the reference's protocol registry is explicitly
  // connect/download/UPLOAD (`ProtocolFactory.cpp:3-4`); a mediation
  // pipeline's last hop is delivering rated files downstream. The three
  // primitives default to "download-only transport" failures so existing
  // read-side transports keep working unchanged. -----------------------

  /** Upload one local file to `remoteFile` (overwrite). Implementations
    * SHOULD preserve the source's mtime on the remote (SFTP setstat /
    * FTP MFMT) — that is what makes redelivery skippable; a transport
    * that can't returns mtime <= 0 and idempotence falls back to
    * size-only. */
  def push(host: String, localSrc: java.nio.file.Path, remoteFile: String): Unit =
    throw new UnsupportedOperationException(
      s"transport for $host is download-only: push not implemented")
  /** Remote rename — MUST be atomic and overwrite an existing target
    * (the delivery commit: downstream pollers never see a partial
    * file). */
  def rename(host: String, from: String, to: String): Unit =
    throw new UnsupportedOperationException(
      s"transport for $host is download-only: rename not implemented")
  /** Remove one remote file (partial-upload cleanup); missing files are
    * not an error. */
  def delete(host: String, remoteFile: String): Unit =
    throw new UnsupportedOperationException(
      s"transport for $host is download-only: delete not implemented")
}

/** Connectors that can also DELIVER files to the remote. */
trait UploadConnector {
  /** Deliver the regular files under `localDir` to `uri`; returns the
    * remote-relative names delivered (skips already-delivered). */
  def upload(localDir: java.nio.file.Path, uri: String): Seq[String]
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
    val scheme: String = "sftp") extends Connector with UploadConnector {

  def read(spark: SparkSession, path: String, format: String,
      options: Map[String, String]): DataFrame = {
    val stageDir = stage(path)
    spark.read.format(format).options(options).load(stageDir.toString)
  }

  /** `scheme://host/path` → (host, path), host validated as a safe
    * directory component (shared by the staging and delivery legs). */
  private def parseUri(uri: String): (String, String) = {
    val rest = uri.stripPrefix(s"$scheme://")
    val (host, remotePath) = rest.split("/", 2) match {
      case Array(h, p) => (h, p)
      case Array(h)    => (h, "")
    }
    require(host.nonEmpty && host.matches("[A-Za-z0-9._-]+") && !host.forall(_ == '.'),
      s"invalid host in '$uri'")
    (host, remotePath)
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
    val (host, remotePath) = parseUri(uri)
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

  /** The UPLOAD leg — rated-file delivery to a downstream host
    * (`ProtocolFactory.cpp:3-4` is explicitly connect/download/upload;
    * the reference's last hop hands rated files to billing). Delivers
    * every regular file under `localDir` (recursively, relative names
    * preserved; Spark bookkeeping — `_SUCCESS`, `_spark_metadata`,
    * dot-files, `.crc` — is skipped) to `uri`:
    *
    *  - each file uploads to `<name>.part` and is atomically RENAMED to
    *    its final name — a downstream poller never sees a partial file
    *    (the reference's marker protocol, `MFramework.cpp:821-903`);
    *  - delivery is IDEMPOTENT: a file already on the remote at the same
    *    byte size and mtime is skipped, so a retried run re-sends only
    *    what failed — the remote's own state is the delivery ledger,
    *    exactly the [[JdbcUpsert]] discipline with the remote FS as the
    *    ledger table (transports that can't report mtime fall back to
    *    size-only, the [[stage]] rule in reverse);
    *  - a push/rename failure CLEANS UP its `.part` file (best-effort)
    *    and rethrows, so aborted deliveries leave no debris that a
    *    size-glob poller could mistake for data.
    *
    * Relative names are confined exactly like the download leg: a name
    * escaping `localDir` (symlink tricks) or containing `..` segments is
    * rejected before any byte moves. Returns the names delivered THIS
    * call (skipped-as-already-delivered names are not repeated).
    */
  def upload(localDir: java.nio.file.Path, uri: String): Seq[String] = {
    import java.nio.file.Files
    val (host, remotePath) = parseUri(uri)
    // the delivery target is remote, but a traversal URI must still die
    // here: pushing to 'outbox/../../etc' would let a hostile config
    // write outside the delivery area on any transport that resolves
    // dot-segments (the stage() confinement rule, pointed outward)
    require(!remotePath.split("/").exists(s => s == ".." || s == "."),
      s"delivery path in '$uri' contains dot-segments")
    require(Files.isDirectory(localDir), s"not a directory: $localDir")
    val baseAbs = localDir.toAbsolutePath.normalize
    def skip(name: String): Boolean =
      name.startsWith(".") || name.startsWith("_") || name.endsWith(".crc")
    val files = {
      import scala.jdk.CollectionConverters._
      val walk = Files.walk(localDir)
      try walk.iterator().asScala
        .filter(Files.isRegularFile(_))
        .filterNot(p => p.iterator().asScala.exists(seg => skip(seg.toString)))
        .toVector
      finally walk.close()
    }
    // one remote listing up front — the idempotence ledger read
    val remoteNames = transport.list(host, remotePath).toSet
    files.flatMap { f =>
      val abs = f.toAbsolutePath.normalize
      require(abs.startsWith(baseAbs) && abs != baseAbs,
        s"local file escapes the delivery dir: $f")
      val rel = baseAbs.relativize(abs).toString
      require(!rel.split("/").contains(".."), s"unsafe relative name '$rel'")
      val remoteFile = if (remotePath.isEmpty) rel else s"$remotePath/$rel"
      val size = Files.size(f)
      val mtime = Files.getLastModifiedTime(f).toMillis
      val already = remoteNames.contains(rel) && {
        val rm = transport.mtime(host, remoteFile)
        transport.size(host, remoteFile) == size && (rm <= 0L || rm == mtime)
      }
      if (already) None
      else {
        val part = remoteFile + ".part"
        try {
          transport.push(host, f, part)
          transport.rename(host, part, remoteFile)
        } catch {
          case e: Exception =>
            try transport.delete(host, part)
            catch { case _: Exception => () } // cleanup is best-effort
            throw e
        }
        Some(rel)
      }
    }
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

  /** Deliver local files through the registered connector for the URI's
    * scheme — the upload direction of [[read]]. Fails loudly when the
    * scheme's connector is download-only. */
  def upload(localDir: java.nio.file.Path, uri: String): Seq[String] = {
    val scheme = uri.split("://", 2) match {
      case Array(s, _) => s
      case _           => "file"
    }
    connectors.getOrElse(scheme,
      throw new IllegalArgumentException(
        s"no connector for scheme '$scheme' (registered: ${registered.mkString(", ")})")) match {
      case u: UploadConnector => u.upload(localDir, uri)
      case c => throw new UnsupportedOperationException(
        s"connector for scheme '${c.scheme}' is download-only (no upload leg)")
    }
  }
}
