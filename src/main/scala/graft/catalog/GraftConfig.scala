package graft.catalog

import java.nio.charset.StandardCharsets.UTF_8
import java.nio.file.{Files, Paths}

import org.json4s._
import org.json4s.jackson.JsonMethods

import graft.acl.PartitionAcl

/** Engine configuration: JSON file + environment overlay.
  *
  * Mirrors the reference's config surface (/root/reference/src/config.rs:4-26
  * — camelCase JSON fields, the same defaults) and its `PROXY_*` environment
  * overlay (/root/reference/src/main.rs:55-61: a `config` file source merged
  * with `Environment::with_prefix("PROXY")`). Pure driver-side metadata — no
  * Catalyst involvement; parsing uses the json4s that ships with Spark.
  *
  * Scale note: the config is KBs and lives on the driver. Everything data-
  * sized that it points at (tables, allowed partitions) is resolved lazily
  * through [[Catalog]] / the ACL machinery, never loaded here.
  */
final case class DatabaseConfig(uri: String = "sqlite:delta_proxy.db")

/** One TTL-cache knob pair (reference moka caches, src/main.rs:82-93). */
final case class CacheConfig(maxEntries: Int, ttlMs: Long)

final case class GraftConfig(
    tableMapping: Map[String, String] = Map.empty,
    readOnly: Boolean = true,
    proxyPartial: Boolean = false,
    authMode: String = "iam", // iam | forward
    getMode: String = "presignedUrl", // proxy | presignedUrl
    allowedPartitions: Map[String, PartitionAcl.Filters] = Map.empty,
    port: Int = 18080,
    metricsPort: Option[Int] = Some(9090),
    database: DatabaseConfig = DatabaseConfig(),
    databaseEnabled: Boolean = false,
    snapshotCache: CacheConfig = CacheConfig(20, 120000L),
    fileListCache: CacheConfig = CacheConfig(100, 120000L),
    authCache: CacheConfig = CacheConfig(100, 120000L)) {
  require(Set("iam", "forward")(authMode),
    s"authMode must be iam|forward, got '$authMode'")
  require(Set("proxy", "presignedUrl")(getMode),
    s"getMode must be proxy|presignedUrl, got '$getMode'")

  /** The catalog this config defines; unknown-alias lookups through it
    * keep the reference's hard-404 behavior (Catalog.resolve). */
  def catalog: Catalog = Catalog(tableMapping.toSeq.sortBy(_._1))

  /** Static allowed partitions for (any user, alias) — the config half of
    * the J4 static ∪ DB permission merge. */
  def staticFilters(alias: String): PartitionAcl.Filters =
    allowedPartitions.getOrElse(alias, Seq.empty)

  /** Apply every cache knob to the engine's runtime caches (ACL
    * file-list/auth caches AND the Delta snapshot cache) — existing
    * entries are discarded, like a reference restart with a new
    * config file. */
  def applyCaches(): Unit = {
    graft.acl.AclCaches.configure(fileListCache, authCache)
    graft.io.MiniDelta.configureSnapshotCache(snapshotCache)
    graft.listing.ObjectListing.configureFilesCache(fileListCache)
  }
}

object GraftConfig {

  /** Load from a JSON file, then overlay `PROXY_*` environment keys. */
  def load(path: String, env: Map[String, String] = sys.env): GraftConfig =
    fromJson(new String(Files.readAllBytes(Paths.get(path)), UTF_8), env)

  /** Parse config JSON (camelCase fields, all optional except none), then
    * overlay the environment. */
  def fromJson(text: String,
               env: Map[String, String] = sys.env): GraftConfig =
    overlay(fromJValue(JsonMethods.parse(text)), env)

  /** No config file — defaults + environment, like the reference when
    * `config.json` is absent (its file source is `required(false)`). */
  def fromEnv(env: Map[String, String] = sys.env): GraftConfig =
    overlay(GraftConfig(), env)

  private def fromJValue(j: JValue): GraftConfig = {
    def str(f: String, dflt: String) =
      j \ f match { case JString(s) => s; case _ => dflt }
    def bool(f: String, dflt: Boolean) =
      j \ f match { case JBool(b) => b; case _ => dflt }
    def int(f: String, dflt: Int) =
      j \ f match { case JInt(i) => i.toInt; case _ => dflt }
    def cache(f: String, dflt: CacheConfig) = j \ f match {
      case o: JObject => CacheConfig(
        o \ "maxEntries" match { case JInt(i) => i.toInt
                                 case _ => dflt.maxEntries },
        o \ "ttlMs" match { case JInt(i) => i.toLong; case _ => dflt.ttlMs })
      case _ => dflt
    }
    val d = GraftConfig()
    GraftConfig(
      tableMapping = j \ "tableMapping" match {
        case JObject(fields) =>
          fields.collect { case (k, JString(v)) => k -> v }.toMap
        case _ => Map.empty
      },
      readOnly = bool("readOnly", d.readOnly),
      proxyPartial = bool("proxyPartial", d.proxyPartial),
      authMode = str("authMode", d.authMode),
      getMode = str("getMode", d.getMode),
      allowedPartitions = j \ "allowedPartitions" match {
        case JObject(fields) => fields.collect {
          case (alias, JArray(maps)) => alias -> maps.collect {
            case JObject(fs) =>
              fs.collect { case (mk, JString(mv)) => mk -> mv }.toMap
          }
        }.toMap
        case _ => Map.empty
      },
      port = int("port", d.port),
      metricsPort = j \ "metricsPort" match {
        case JInt(i) => Some(i.toInt)
        case JNull => None
        case _ => d.metricsPort
      },
      database = DatabaseConfig(
        j \ "database" \ "uri" match { case JString(s) => s
                                       case _ => d.database.uri }),
      databaseEnabled = bool("databaseEnabled", d.databaseEnabled),
      snapshotCache = cache("snapshotCache", d.snapshotCache),
      fileListCache = cache("fileListCache", d.fileListCache),
      authCache = cache("authCache", d.authCache))
  }

  /** `PROXY_*` overlay: `PROXY_READ_ONLY=false` (or `PROXY_READONLY`,
    * underscores are insignificant, matching the config-crate's
    * case-insensitive key mapping) overrides the file value. Scalar
    * fields only — maps stay file-side, as in the reference. */
  private def overlay(cfg: GraftConfig,
                      env: Map[String, String]): GraftConfig = {
    val keys: Map[String, String] = env.collect {
      case (k, v) if k.toUpperCase.startsWith("PROXY_") =>
        k.drop("PROXY_".length).replace("_", "").toLowerCase -> v
    }
    def get(field: String) = keys.get(field.toLowerCase)
    def asBool(s: String) = s.trim.toLowerCase == "true"
    cfg.copy(
      readOnly = get("readOnly").map(asBool).getOrElse(cfg.readOnly),
      proxyPartial =
        get("proxyPartial").map(asBool).getOrElse(cfg.proxyPartial),
      authMode = get("authMode").getOrElse(cfg.authMode),
      getMode = get("getMode").getOrElse(cfg.getMode),
      port = get("port").map(_.trim.toInt).getOrElse(cfg.port),
      metricsPort =
        get("metricsPort").map(_.trim.toInt).map(Some(_))
          .getOrElse(cfg.metricsPort),
      database = get("databaseUri").map(DatabaseConfig(_))
        .getOrElse(cfg.database),
      databaseEnabled =
        get("databaseEnabled").map(asBool).getOrElse(cfg.databaseEnabled))
  }
}
