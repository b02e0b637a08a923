package graft

import java.nio.file.Files

import scala.jdk.CollectionConverters._

import graft.etl.{ConnectorRegistry, FileTransport, FtpConnector, FtpsConnector, LandingZoneConnector, SftpConnector}

/** Connector registry — the ProtocolFactory analogue
  * (`ProtocolFactory.cpp:78-118`). */
class ConnectorsSpec extends SparkSpec {

  test("local connector reads scheme-less and file:// paths") {
    val df = ConnectorRegistry.read(spark, s"$sfDir/region.parquet", "parquet")
    assert(df.count() == 5)
  }

  test("landing-zone connector maps remote URIs to the mirror root") {
    val mirror = Files.createTempDirectory("graft_ftps_mirror").toString
    spark.range(3).toDF("id").write.parquet(s"$mirror/inbox/batch1")
    ConnectorRegistry.register(new LandingZoneConnector("ftps", mirror))
    val df = ConnectorRegistry.read(spark, "ftps://inbox/batch1", "parquet")
    assert(df.count() == 3)
    assert(ConnectorRegistry.registered.contains("ftps"))
  }

  test("unknown scheme fails with the registered list, like m_GetProtocol") {
    val e = intercept[IllegalArgumentException](
      ConnectorRegistry.read(spark, "ftp://nowhere/x", "parquet"))
    assert(e.getMessage.contains("no connector for scheme 'ftp'"))
  }

  test("registration is idempotent (SOContainer.cpp:67-80 semantics)") {
    val before = ConnectorRegistry.registered.size
    ConnectorRegistry.register(new LandingZoneConnector("ftps", "/other"))
    assert(ConnectorRegistry.registered.size == before)
  }

  /** Local-FS fake transport: a directory tree stands in for the remote
    * host; fetch() counts calls so staging incrementality is observable. */
  private class LocalFsTransport(remoteRoot: String) extends FileTransport {
    var fetches = 0
    private def p(host: String, rest: String) =
      java.nio.file.Paths.get(remoteRoot, host, rest)
    def list(host: String, remotePath: String): Seq[String] = {
      val dir = p(host, remotePath)
      if (!Files.isDirectory(dir)) Seq.empty
      else {
        // recursive with RELATIVE names — the FileTransport contract
        // ("names may be nested (y/m/f.csv)")
        val s = Files.walk(dir)
        try s.iterator().asScala
          .filter(Files.isRegularFile(_))
          .map(f => dir.relativize(f).toString).toSeq
        finally s.close()
      }
    }
    def size(host: String, remoteFile: String): Long = Files.size(p(host, remoteFile))
    override def mtime(host: String, remoteFile: String): Long =
      Files.getLastModifiedTime(p(host, remoteFile)).toMillis
    def fetch(host: String, remoteFile: String, localDest: java.nio.file.Path): Unit = {
      fetches += 1
      Files.copy(p(host, remoteFile), localDest,
        java.nio.file.StandardCopyOption.REPLACE_EXISTING)
    }
    // upload leg (push preserves the source mtime, the transport contract)
    var pushes = 0
    override def push(host: String, localSrc: java.nio.file.Path,
        remoteFile: String): Unit = {
      pushes += 1
      val dest = p(host, remoteFile)
      Files.createDirectories(dest.getParent)
      Files.copy(localSrc, dest,
        java.nio.file.StandardCopyOption.REPLACE_EXISTING,
        java.nio.file.StandardCopyOption.COPY_ATTRIBUTES)
    }
    override def rename(host: String, from: String, to: String): Unit =
      Files.move(p(host, from), p(host, to),
        java.nio.file.StandardCopyOption.REPLACE_EXISTING,
        java.nio.file.StandardCopyOption.ATOMIC_MOVE)
    override def delete(host: String, remoteFile: String): Unit =
      Files.deleteIfExists(p(host, remoteFile))
  }

  test("sftp connector stages remote files through the transport and reads them") {
    val remote = Files.createTempDirectory("graft_sftp_remote").toString
    val staging = Files.createTempDirectory("graft_sftp_staging").toString
    // "remote host" content: two csv files on mediator1:/outbox/cdrs
    val outbox = java.nio.file.Paths.get(remote, "mediator1", "outbox", "cdrs")
    Files.createDirectories(outbox)
    Files.writeString(outbox.resolve("a.csv"), "id,v\n1,10\n2,20\n")
    Files.writeString(outbox.resolve("b.csv"), "id,v\n3,30\n")
    val transport = new LocalFsTransport(remote)
    ConnectorRegistry.register(new SftpConnector(transport, staging))
    assert(ConnectorRegistry.registered.contains("sftp"))

    val df = ConnectorRegistry.read(spark, "sftp://mediator1/outbox/cdrs", "csv",
      Map("header" -> "true", "inferSchema" -> "true"))
    assert(df.count() == 3)
    assert(transport.fetches == 2)

    // incremental re-sync: unchanged files are not re-fetched...
    ConnectorRegistry.read(spark, "sftp://mediator1/outbox/cdrs", "csv",
      Map("header" -> "true"))
    assert(transport.fetches == 2, "unchanged files must not re-stage")

    // ...new remote files are
    Files.writeString(outbox.resolve("c.csv"), "id,v\n4,40\n5,50\n")
    val df2 = ConnectorRegistry.read(spark, "sftp://mediator1/outbox/cdrs", "csv",
      Map("header" -> "true", "inferSchema" -> "true"))
    assert(transport.fetches == 3)
    assert(df2.count() == 5)

    // ...and remotely-deleted files stop flowing on the next read
    Files.delete(outbox.resolve("b.csv"))
    val df3 = ConnectorRegistry.read(spark, "sftp://mediator1/outbox/cdrs", "csv",
      Map("header" -> "true", "inferSchema" -> "true"))
    assert(df3.count() == 4, "retracted remote file must leave the stage")
  }

  test("sftp connector re-stages a same-size in-place edit (mtime changed)") {
    val remote = Files.createTempDirectory("graft_sftp_mtime_remote").toString
    val staging = Files.createTempDirectory("graft_sftp_mtime_staging").toString
    val inbox = java.nio.file.Paths.get(remote, "h1", "inbox")
    Files.createDirectories(inbox)
    val f = inbox.resolve("a.csv")
    Files.writeString(f, "id,v\n1,10\n2,20\n")
    val transport = new LocalFsTransport(remote)
    val c = new SftpConnector(transport, staging, scheme = "sftpm")

    val r1 = c.read(spark, "sftpm://h1/inbox", "csv",
      Map("header" -> "true", "inferSchema" -> "true"))
    assert(r1.agg(org.apache.spark.sql.functions.sum("v")).head.getLong(0) == 30)
    assert(transport.fetches == 1)
    c.read(spark, "sftpm://h1/inbox", "csv", Map("header" -> "true"))
    assert(transport.fetches == 1, "unchanged file must not re-stage")

    // overwrite with SAME byte length but different content + newer mtime
    Files.writeString(f, "id,v\n1,11\n2,22\n")
    Files.setLastModifiedTime(f, java.nio.file.attribute.FileTime.fromMillis(
      Files.getLastModifiedTime(f).toMillis + 5000))
    val r2 = c.read(spark, "sftpm://h1/inbox", "csv",
      Map("header" -> "true", "inferSchema" -> "true"))
    assert(transport.fetches == 2, "same-size edit must re-stage via mtime")
    assert(r2.agg(org.apache.spark.sql.functions.sum("v")).head.getLong(0) == 33)
  }

  test("ftp/ftps live connectors share the staging pipeline and its guards") {
    val remote = Files.createTempDirectory("graft_ftp_remote").toString
    val outbox = java.nio.file.Paths.get(remote, "medhost", "pub", "data")
    Files.createDirectories(outbox)
    Files.writeString(outbox.resolve("x.csv"), "id,v\n1,1\n2,2\n")
    for (mk <- Seq(
        (t: FileTransport, s: String) => new FtpConnector(t, s),
        (t: FileTransport, s: String) => new FtpsConnector(t, s))) {
      val staging = Files.createTempDirectory("graft_ftp_staging").toString
      val transport = new LocalFsTransport(remote)
      val c = mk(transport, staging)
      val uri = s"${c.scheme}://medhost/pub/data"
      // stage + read
      val df = c.read(spark, uri, "csv",
        Map("header" -> "true", "inferSchema" -> "true"))
      assert(df.count() == 2 && transport.fetches == 1)
      // incremental: unchanged files are not re-fetched
      c.read(spark, uri, "csv", Map("header" -> "true"))
      assert(transport.fetches == 1, s"${c.scheme}: unchanged file re-staged")
      // per-host confinement holds for the whole FTP family
      intercept[IllegalArgumentException](
        c.stage(s"${c.scheme}://medhost/../../etc"))
    }
    // registry wiring for the live ftp scheme (ftps is claimed above by the
    // landing-zone mirror registration — idempotent registry, first wins)
    ConnectorRegistry.register(
      new FtpConnector(new LocalFsTransport(remote),
        Files.createTempDirectory("graft_ftp_reg_staging").toString))
    assert(ConnectorRegistry.registered.contains("ftp"))
    assert(ConnectorRegistry.read(spark, "ftp://medhost/pub/data", "csv",
      Map("header" -> "true")).count() == 2)
  }

  test("upload delivers atomically, skips Spark bookkeeping, and retries idempotently") {
    val remote = Files.createTempDirectory("graft_up_remote").toString
    val local = Files.createTempDirectory("graft_up_local")
    // a rated-output-shaped local dir: data files (one nested), plus the
    // Spark bookkeeping the delivery must skip
    Files.writeString(local.resolve("rated_a.csv"), "id,v\n1,10\n")
    Files.createDirectories(local.resolve("day=2026-01-01"))
    Files.writeString(local.resolve("day=2026-01-01/rated_b.csv"), "id,v\n2,20\n")
    Files.writeString(local.resolve("_SUCCESS"), "")
    Files.writeString(local.resolve(".rated_a.csv.crc"), "x")
    val transport = new LocalFsTransport(remote)
    val c = new SftpConnector(transport, Files.createTempDirectory("graft_up_stage").toString,
      scheme = "sftpu")

    val delivered = c.upload(local, "sftpu://billing1/incoming")
    assert(delivered.toSet == Set("rated_a.csv", "day=2026-01-01/rated_b.csv"),
      delivered.toString)
    assert(transport.pushes == 2)
    val in = java.nio.file.Paths.get(remote, "billing1", "incoming")
    assert(Files.readString(in.resolve("rated_a.csv")).contains("1,10"))
    assert(Files.readString(in.resolve("day=2026-01-01/rated_b.csv")).contains("2,20"))
    // no .part debris, no bookkeeping files delivered
    val leftovers = Files.walk(in).iterator().asScala
      .filter(Files.isRegularFile(_)).map(_.getFileName.toString).toSet
    assert(leftovers == Set("rated_a.csv", "rated_b.csv"), leftovers.toString)

    // redelivery is a no-op: the remote's own state is the ledger
    assert(c.upload(local, "sftpu://billing1/incoming").isEmpty)
    assert(transport.pushes == 2, "unchanged files must not re-push")

    // a changed file (same size, newer mtime) re-delivers — the reverse
    // of the staging re-fetch rule
    Files.writeString(local.resolve("rated_a.csv"), "id,v\n1,99\n")
    Files.setLastModifiedTime(local.resolve("rated_a.csv"),
      java.nio.file.attribute.FileTime.fromMillis(
        Files.getLastModifiedTime(local.resolve("rated_a.csv")).toMillis + 5000))
    val redelivered = c.upload(local, "sftpu://billing1/incoming")
    assert(redelivered == Seq("rated_a.csv"), redelivered.toString)
    assert(Files.readString(in.resolve("rated_a.csv")).contains("1,99"))

    // traversal URIs die before any byte moves
    intercept[IllegalArgumentException](
      c.upload(local, "sftpu://billing1/../../etc"))

    // registry dispatch: sftpu routes to the upload leg; the local
    // connector is download-only and says so
    ConnectorRegistry.register(c)
    assert(ConnectorRegistry.upload(local, "sftpu://billing1/incoming").isEmpty)
    intercept[UnsupportedOperationException](
      ConnectorRegistry.upload(local, s"$sfDir"))
  }

  test("upload cleans up its partial file on failure; the retry completes delivery") {
    val remote = Files.createTempDirectory("graft_upfail_remote").toString
    val local = Files.createTempDirectory("graft_upfail_local")
    Files.writeString(local.resolve("a.csv"), "id\n1\n")
    Files.writeString(local.resolve("b.csv"), "id\n2\n")
    // rename fails ONCE for b.csv — the crash window between push and
    // commit; the .part file must be cleaned and the retry must finish
    val transport = new LocalFsTransport(remote) {
      var failed = false
      override def rename(host: String, from: String, to: String): Unit = {
        if (to.endsWith("b.csv") && !failed) {
          failed = true
          throw new java.io.IOException("connection reset")
        }
        super.rename(host, from, to)
      }
    }
    val c = new SftpConnector(transport, Files.createTempDirectory("graft_upfail_stage").toString,
      scheme = "sftpf")
    val e = intercept[java.io.IOException](c.upload(local, "sftpf://bill/in"))
    assert(e.getMessage.contains("connection reset"))
    val in = java.nio.file.Paths.get(remote, "bill", "in")
    val afterFail = Files.list(in).iterator().asScala
      .map(_.getFileName.toString).toSet
    assert(!afterFail.exists(_.endsWith(".part")),
      s"partial upload left debris: $afterFail")
    // retry: only what failed re-pushes (anything delivered before the
    // failure is skipped by the ledger; walk order is unspecified, so
    // assert set-wise)
    val before = transport.pushes
    val retried = c.upload(local, "sftpf://bill/in")
    assert(retried.contains("b.csv"), retried.toString)
    assert(transport.pushes == before + retried.size)
    assert(Files.readString(in.resolve("b.csv")).contains("2"))
    assert(Files.readString(in.resolve("a.csv")).contains("1"))
    // and a second retry is a clean no-op
    assert(c.upload(local, "sftpf://bill/in").isEmpty)
  }

  test("sftp connector rejects traversal from remote names and URIs") {
    val staging = Files.createTempDirectory("graft_sftp_evil").toString
    val evilTransport = new FileTransport {
      def list(host: String, remotePath: String): Seq[String] = Seq("../../evil.csv")
      def size(host: String, remoteFile: String): Long = 1L
      def fetch(host: String, remoteFile: String, localDest: java.nio.file.Path): Unit =
        fail(s"fetch must never be called for a traversal name: $remoteFile")
    }
    val c = new SftpConnector(evilTransport, staging, scheme = "sftpx")
    val e = intercept[IllegalArgumentException](c.stage("sftpx://host/inbox"))
    assert(e.getMessage.contains("escapes the staging area"))
    val e2 = intercept[IllegalArgumentException](c.stage("sftpx://host/../../etc"))
    assert(e2.getMessage.contains("escapes the staging area"))
  }
}
