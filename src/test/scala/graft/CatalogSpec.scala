package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.catalog.{CacheConfig, Catalog, GraftConfig}
import graft.metrics.Metrics

class CatalogSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("resolve maps alias to path; unknown alias is the 404") {
    val c = Catalog(Seq("trades" -> "/data/t", "ref" -> "/data/r"))
    assert(c.resolve("trades") == "/data/t")
    assert(c.resolveOpt("missing").isEmpty)
    intercept[NoSuchElementException](c.resolve("missing"))
  }

  test("listBuckets emits the single virtual bucket") {
    val r = Catalog.forSf(TestSpark.sfTiny).listBuckets(spark).collect()
    assert(r.length == 1 && r(0).getString(0) == "datalake")
  }

  test("listTables renders aliases as ordered common prefixes") {
    val r = Catalog.forSf(TestSpark.sfTiny).listTables(spark).collect()
      .map(_.getString(0))
    assert(r.length == Tables.names.length)
    assert(r.forall(_.endsWith("/")))
    assert(r.sameElements(r.sorted))
  }

  private val fixtureJson =
    """{
      |  "tableMapping": {
      |    "trades": "s3://bucket-1/tables/trades",
      |    "reference": "s3://bucket-1/tables/reference"
      |  },
      |  "readOnly": true,
      |  "proxyPartial": false,
      |  "getMode": "presignedUrl",
      |  "allowedPartitions": {
      |    "trades": [ {"MIC": "XLON"}, {"MIC": "XMIL"} ]
      |  },
      |  "port": 18080,
      |  "database": { "uri": "sqlite:test.db" },
      |  "databaseEnabled": false,
      |  "fileListCache": { "maxEntries": 7, "ttlMs": 500 }
      |}""".stripMargin

  test("config loads from JSON with reference field names and defaults") {
    val cfg = GraftConfig.fromJson(fixtureJson, env = Map.empty)
    assert(cfg.tableMapping("trades") == "s3://bucket-1/tables/trades")
    assert(cfg.readOnly && !cfg.proxyPartial && !cfg.databaseEnabled)
    assert(cfg.getMode == "presignedUrl" && cfg.authMode == "iam")
    assert(cfg.port == 18080 && cfg.metricsPort.contains(9090))
    assert(cfg.database.uri == "sqlite:test.db")
    assert(cfg.staticFilters("trades") ==
      Seq(Map("MIC" -> "XLON"), Map("MIC" -> "XMIL")))
    assert(cfg.staticFilters("reference").isEmpty)
    assert(cfg.fileListCache == CacheConfig(7, 500))
    assert(cfg.snapshotCache == CacheConfig(20, 120000L)) // default kept
    // absent fields take the reference's serde defaults
    val bare = GraftConfig.fromJson("""{"tableMapping":{}}""", Map.empty)
    assert(bare.readOnly && bare.getMode == "presignedUrl" &&
      bare.port == 18080)
  }

  test("config catalog preserves the unknown-alias 404") {
    val cat = GraftConfig.fromJson(fixtureJson, env = Map.empty).catalog
    assert(cat.resolve("trades") == "s3://bucket-1/tables/trades")
    intercept[NoSuchElementException](cat.resolve("nope"))
    assert(cat.listTables(spark).count() == 2)
  }

  test("PROXY_* environment overlays the file config") {
    val env = Map(
      "PROXY_READ_ONLY" -> "false", // underscores insignificant
      "PROXY_PORT" -> "28080",
      "PROXY_GETMODE" -> "proxy",
      "PROXY_DATABASE_URI" -> "sqlite:other.db",
      "PROXY_METRICS_PORT" -> "9999",
      "UNRELATED" -> "ignored")
    val cfg = GraftConfig.fromJson(fixtureJson, env)
    assert(!cfg.readOnly)
    assert(cfg.port == 28080 && cfg.metricsPort.contains(9999))
    assert(cfg.getMode == "proxy")
    assert(cfg.database.uri == "sqlite:other.db")
    // file-side values not mentioned in env survive
    assert(cfg.tableMapping.size == 2 && !cfg.proxyPartial)
    // env-only load (no file), like the reference's optional config file
    assert(!GraftConfig.fromEnv(Map("PROXY_READONLY" -> "false")).readOnly)
    assert(GraftConfig.fromEnv(Map.empty) == GraftConfig())
  }

  test("config loads from a file on disk and rejects bad enum values") {
    val p = java.nio.file.Files.createTempFile("graftcfg", ".json")
    java.nio.file.Files.write(p, fixtureJson.getBytes("UTF-8"))
    val cfg = GraftConfig.load(p.toString, env = Map.empty)
    assert(cfg.tableMapping.size == 2)
    intercept[IllegalArgumentException] {
      GraftConfig.fromJson("""{"getMode":"teleport"}""", Map.empty)
    }
    intercept[IllegalArgumentException] {
      GraftConfig.fromEnv(Map("PROXY_AUTH_MODE" -> "none"))
    }
  }

  test("cache knobs from config rebuild AclCaches") {
    val cfg = GraftConfig.fromJson(fixtureJson, env = Map.empty)
    // applyCaches covers all three knobs: fileList/auth here, the
    // snapshot-cache knob's behavior is asserted in MiniDeltaSpec
    cfg.applyCaches()
    try {
      var calls = 0
      def resolveOnce: Boolean = { calls += 1; true }
      assert(graft.acl.AclCaches.authFor("k1")(resolveOnce))
      assert(graft.acl.AclCaches.authFor("k1")(resolveOnce))
      assert(calls == 1) // memoized under the rebuilt cache
      // ttl from config (500 ms) actually expires entries
      graft.acl.AclCaches.fileList.getOrElseUpdate("u:t")(Seq("f"))
      assert(graft.acl.AclCaches.fileList.get("u:t").nonEmpty)
      Thread.sleep(600)
      assert(graft.acl.AclCaches.fileList.get("u:t").isEmpty)
    } finally {
      graft.acl.AclCaches.configure(CacheConfig(100, 120000L),
        CacheConfig(100, 120000L))
      graft.acl.AclCaches.clearAll()
      graft.io.MiniDelta.configureSnapshotCache(CacheConfig(20, 120000L))
    }
  }

  test("approx distinct tracks exact within rsd on real data (scale path)") {
    val ev = Tables.events(spark, TestSpark.sfTiny)
    val exact = ev.select(org.apache.spark.sql.functions
      .countDistinct(org.apache.spark.sql.functions.col("user_id")))
      .collect()(0).getLong(0)
    val approx = ev.select(org.apache.spark.sql.functions
      .approx_count_distinct(org.apache.spark.sql.functions.col("user_id")))
      .collect()(0).getLong(0)
    assert(math.abs(approx - exact).toDouble / exact < 0.1)
    // grid average helper is exactly sum/count on 2-decimal-grid data
    val g = Metrics.counters(ev).count()
    assert(g > 0)
  }
}
