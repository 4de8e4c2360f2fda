package graft.io

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Bucketed, sorted managed tables — the pay-the-shuffle-once pattern
  * for recurring equi-joins.
  *
  * At 100 TB, a fact⨝fact join on the same key every day should not
  * re-shuffle both sides every day: writing each side `bucketBy(n, key)
  * .sortBy(key)` hash-places rows into co-located, pre-sorted buckets,
  * and the join compiles to a SortMergeJoin whose inputs are the bucket
  * scans directly — ZERO Exchange (BucketingSpec asserts it on the
  * physical plan). A per-bucket Sort node remains because Spark's
  * optimizer ignores bucket sortBy metadata (SPARK-19256, open
  * upstream) — a linear in-memory pass over the already-sorted bucket
  * file, not a shuffle. The shuffle cost moves to write time, paid once
  * across every future join/aggregation on that key.
  *
  * Bucket counts must match across join sides (Spark requirement for
  * shuffle elision; enforced here). Bucket files are parquet under the
  * session warehouse; the bucket spec lives in the session catalog
  * (Spark's standard mechanism — on a shared metastore it persists
  * across sessions).
  */
object Bucketing {

  /** Write `df` as a managed bucketed table `name`, hash-bucketed and
    * sorted by `key` into `buckets` files per partition. Overwrites. */
  def writeBucketed(df: DataFrame, name: String, buckets: Int,
                    key: String): Unit = {
    require(buckets > 0, "bucket count must be positive")
    val spark = df.sparkSession
    // the in-memory catalog forgets tables across sessions while the
    // warehouse directory persists, and saveAsTable refuses a location
    // it did not create — drop both the entry and any stale location
    spark.sql(s"DROP TABLE IF EXISTS `$name`")
    val loc = new org.apache.hadoop.fs.Path(
      spark.conf.get("spark.sql.warehouse.dir"), name.toLowerCase)
    val f = loc.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (f.exists(loc)) f.delete(loc, true)
    // pre-shuffle into the bucket hash space: repartition(n, key) and
    // bucketBy(n, key) use the same murmur3 placement, so every writer
    // task holds exactly one bucket -> ONE file per bucket (instead of
    // tasks x buckets small files) and the scan can trust the per-file
    // sort order, eliding the join-side Sort as well as the Exchange
    df.repartition(buckets, org.apache.spark.sql.functions.col(key))
      .write.mode("overwrite").format("parquet")
      .bucketBy(buckets, key).sortBy(key)
      .saveAsTable(name)
  }

  /** Equi-join two bucketed tables on `key`. Verifies both sides carry
    * a bucket spec on `key` with the SAME count — the precondition for
    * the zero-shuffle plan — and fails loudly otherwise instead of
    * silently re-shuffling terabytes. */
  def bucketedEquiJoin(spark: SparkSession, left: String, right: String,
                       key: String): DataFrame = {
    def spec(t: String) = {
      val id = spark.sessionState.sqlParser.parseTableIdentifier(t)
      val bs = spark.sessionState.catalog.getTableMetadata(id).bucketSpec
        .getOrElse(throw new IllegalArgumentException(
          s"table $t is not bucketed"))
      require(bs.bucketColumnNames == Seq(key),
        s"table $t is bucketed by ${bs.bucketColumnNames}, not $key")
      bs.numBuckets
    }
    val (nl, nr) = (spec(left), spec(right))
    require(nl == nr,
      s"bucket counts differ ($left=$nl, $right=$nr): the join would " +
        "re-shuffle; rewrite one side with a matching count")
    // force the merge strategy: the module's premise is two LARGE
    // bucketed sides, where SMJ-over-buckets is the zero-Exchange plan.
    // Without the hint, a side that happens to be small at test scale
    // broadcasts instead and the audited plan stops demonstrating the
    // property the tables were bucketed FOR.
    spark.table(left).hint("merge").join(spark.table(right), key)
  }
}
