package graft.acl

import org.apache.spark.sql.DataFrame

import graft.util.TtlCache

/** The reference's three authorization-path caches, engine-side
  * (/root/reference/src/main.rs:82-93, src/database.rs:28-32):
  *
  *  - resolved allowed-file lists, keyed `user:alias`, 100 entries /
  *    120 s TTL (src/main.rs:90-93, key built at src/main.rs:377)
  *  - auth results, keyed by access key, 100 entries / 120 s TTL
  *    (src/main.rs:86-89)
  *  - DB permission rows, keyed `user:table`, LRU 100, no TTL
  *    (src/database.rs:28-32)
  *
  * All are driver-side metadata memos: a file LIST is small even when
  * the files hold 100 TB, and permission rows are catalog-scale. The
  * 120 s TTL carries the reference's documented staleness window —
  * permission or log changes take up to 2 minutes to be observed; use
  * `invalidate`/`clear` for immediate revocation.
  */
object AclCaches {

  /** F13: the composite cache key (`format!("{}:{}", user, table)`). */
  def cacheKey(user: String, table: String): String = s"$user:$table"

  @volatile private var _fileList =
    new TtlCache[String, Seq[String]](100, 120000L)
  @volatile private var _auth = new TtlCache[String, Boolean](100, 120000L)
  @volatile private var _dbPerms =
    new TtlCache[String, PartitionAcl.Filters](100, 0L)

  def fileList: TtlCache[String, Seq[String]] = _fileList
  def auth: TtlCache[String, Boolean] = _auth
  def dbPerms: TtlCache[String, PartitionAcl.Filters] = _dbPerms

  /** Rebuild the caches from config knobs ([[graft.catalog.GraftConfig]]
    * fileListCache/authCache) — existing entries are discarded, exactly
    * like a reference restart with a new config file. */
  def configure(fileListCfg: graft.catalog.CacheConfig,
                authCfg: graft.catalog.CacheConfig): Unit = {
    _fileList =
      new TtlCache(fileListCfg.maxEntries, fileListCfg.ttlMs)
    _auth = new TtlCache(authCfg.maxEntries, authCfg.ttlMs)
    // a config reload invalidates permission memos too — grants resolved
    // under the previous config must not outlive it
    _dbPerms = new TtlCache(100, 0L)
  }

  /** Resolved allowed-file set for (user, alias), memoized. `resolve`
    * runs P5 pruning (snapshot metadata only) on a miss. */
  def allowedFilesFor(user: String, alias: String)
                     (resolve: => DataFrame): Seq[String] =
    fileList.getOrElseUpdate(cacheKey(user, alias)) {
      resolve.select("path").collect().map(_.getString(0)).toSeq
    }

  /** Auth-result memo (reference src/main.rs:541-549: the proxy checks
    * the cache and inserts `true` on a miss — verification itself is a
    * placeholder there, a fact its README admits; `check` is the hook a
    * real validator plugs into). */
  def authFor(accessKey: String)(check: => Boolean): Boolean =
    auth.getOrElseUpdate(accessKey)(check)

  /** Per-(user, table) permission filters, LRU-memoized like the
    * reference's `cached` macro over the SQLite lookup (J3). */
  def permsFor(user: String, table: String)
              (lookup: => PartitionAcl.Filters): PartitionAcl.Filters =
    dbPerms.getOrElseUpdate(cacheKey(user, table))(lookup)

  def clearAll(): Unit = { fileList.clear(); auth.clear(); dbPerms.clear() }
}
