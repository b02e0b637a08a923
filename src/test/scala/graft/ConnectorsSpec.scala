package graft

import java.nio.file.Files

import graft.etl.{ConnectorRegistry, LandingZoneConnector}

/** Connector registry — the ProtocolFactory analogue
  * (`ProtocolFactory.cpp:78-118`). */
class ConnectorsSpec extends SparkSpec {

  test("local connector reads scheme-less and file:// paths") {
    val df = ConnectorRegistry.read(spark, s"$sfDir/region.parquet", "parquet")
    assert(df.count() == 5)
  }

  test("landing-zone connector maps remote URIs to the mirror root") {
    val mirror = Files.createTempDirectory("graft_sftp_mirror").toString
    spark.range(3).toDF("id").write.parquet(s"$mirror/inbox/batch1")
    ConnectorRegistry.register(new LandingZoneConnector("sftp", mirror))
    val df = ConnectorRegistry.read(spark, "sftp://inbox/batch1", "parquet")
    assert(df.count() == 3)
    assert(ConnectorRegistry.registered.contains("sftp"))
  }

  test("unknown scheme fails with the registered list, like m_GetProtocol") {
    val e = intercept[IllegalArgumentException](
      ConnectorRegistry.read(spark, "ftp://nowhere/x", "parquet"))
    assert(e.getMessage.contains("no connector for scheme 'ftp'"))
  }

  test("registration is idempotent (SOContainer.cpp:67-80 semantics)") {
    val before = ConnectorRegistry.registered.size
    ConnectorRegistry.register(new LandingZoneConnector("sftp", "/other"))
    assert(ConnectorRegistry.registered.size == before)
  }
}
