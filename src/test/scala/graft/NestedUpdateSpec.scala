package graft

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite

import graft.io.MiniDelta
import graft.plans.GraftSqlTables

/** Nested-field SET assignments (`UPDATE ... SET addr.city = 'x'`,
  * and the same through general-MERGE matched/by-source clauses):
  * folded into ONE struct rebuild per top-level column via
  * `Column.withField` — untouched sibling fields pass through, paths
  * resolve case-insensitively against the DECLARED schema, and a path
  * into a non-struct or a non-existent field refuses (withField would
  * silently ADD it). Delta's nested-update semantics. */
class NestedUpdateSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("UPDATE SET nested paths rebuild the struct; siblings survive") {
    val dir = Files.createTempDirectory("nestupd").toString
    GraftSqlTables.clear()
    spark.sql(s"""
      CREATE TABLE graft.nu_t (k BIGINT,
        addr STRUCT<city: STRING, zip: BIGINT, geo: STRUCT<lat: DOUBLE>>)
      LOCATION '$dir/t'""")
    try {
      spark.sql("""
        INSERT INTO graft.nu_t VALUES
        (1, named_struct('city', 'aa', 'zip', 10L,
           'geo', named_struct('lat', 1.5D))),
        (2, named_struct('city', 'bb', 'zip', 20L,
           'geo', named_struct('lat', 2.5D)))""")
      // two nested SETs on the same struct fold into one rebuild;
      // case-insensitive path segments; two-level depth
      spark.sql("""
        UPDATE graft.nu_t
        SET addr.CITY = 'xx', addr.geo.lat = addr.geo.lat + 10.0
        WHERE k = 1""")
      MiniDelta.invalidateSnapshot(s"$dir/t")
      val got = spark.sql("""
        SELECT k, addr.city, addr.zip, addr.geo.lat FROM graft.nu_t""")
        .as[(Long, String, Long, Double)].collect().toSet
      assert(got == Set((1L, "xx", 10L, 11.5), (2L, "bb", 20L, 2.5)), got)
      // qualified nested target binds too
      spark.sql("UPDATE graft.nu_t t SET t.addr.zip = 99 WHERE t.k = 2")
      MiniDelta.invalidateSnapshot(s"$dir/t")
      assert(spark.sql("SELECT addr.zip FROM graft.nu_t WHERE k = 2")
        .as[Long].head() == 99L)
      // refusals: unknown nested field (withField would silently add
      // it), path into a non-struct, whole-column + nested mix,
      // duplicate path
      val e1 = intercept[Exception](spark.sql(
        "UPDATE graft.nu_t SET addr.nope = 'x'"))
      assert(e1.getMessage.contains("nope"), e1.getMessage)
      val e2 = intercept[Exception](spark.sql(
        "UPDATE graft.nu_t SET k.x = 1"))
      assert(e2.getMessage.contains("no fields"), e2.getMessage)
      val e3 = intercept[Exception](spark.sql("""
        UPDATE graft.nu_t
        SET addr = named_struct('city', 'c', 'zip', 1L,
          'geo', named_struct('lat', 0.0D)), addr.city = 'd'"""))
      assert(e3.getMessage.contains("more than once"), e3.getMessage)
      val e4 = intercept[Exception](spark.sql(
        "UPDATE graft.nu_t SET addr.city = 'a', addr.city = 'b'"))
      assert(e4.getMessage.contains("twice"), e4.getMessage)
    } finally GraftSqlTables.clear()
  }

  test("general MERGE matched/by-source clauses update nested fields") {
    val dir = Files.createTempDirectory("nestmrg").toString
    GraftSqlTables.clear()
    spark.sql(s"""
      CREATE TABLE graft.nm_t (k BIGINT,
        addr STRUCT<city: STRING, zip: BIGINT>)
      LOCATION '$dir/t'""")
    try {
      spark.sql("""
        INSERT INTO graft.nm_t VALUES
        (1, named_struct('city', 'aa', 'zip', 10L)),
        (2, named_struct('city', 'bb', 'zip', 20L))""")
      Seq((1L, "XX")).toDF("k", "city").createOrReplaceTempView("nm_src")
      spark.sql("""
        MERGE INTO graft.nm_t t USING nm_src s ON t.k = s.k
        WHEN MATCHED THEN UPDATE SET t.addr.city = s.city
        WHEN NOT MATCHED BY SOURCE THEN UPDATE SET addr.zip = addr.zip + 1
      """)
      MiniDelta.invalidateSnapshot(s"$dir/t")
      val got = spark.sql("SELECT k, addr.city, addr.zip FROM graft.nm_t")
        .as[(Long, String, Long)].collect().toSet
      assert(got == Set((1L, "XX", 10L), (2L, "bb", 21L)), got)
    } finally GraftSqlTables.clear()
  }

  test("vacuum fans deletes out past the threshold") {
    // not nested-update, but the same round's scale fix: >threshold
    // dead files delete through the executor fan-out, and the result
    // is identical to the driver-side loop
    val t = Files.createTempDirectory("vacfan").toString + "/t"
    val prev = MiniDelta.vacuumParallelThreshold
    MiniDelta.vacuumParallelThreshold = 8
    try {
      MiniDelta.append(spark, spark.range(200)
        .select(org.apache.spark.sql.functions.col("id"))
        .repartition(20), t, Seq.empty)
      MiniDelta.invalidateSnapshot(t)
      // rewrite everything: OPTIMIZE leaves 20 dead files behind
      MiniDelta.compact(spark, t, Seq.empty)
      MiniDelta.invalidateSnapshot(t)
      val before = MiniDelta.distributedDeletes.get()
      val deleted = MiniDelta.vacuum(spark, t, retainMs = 0L)
      assert(deleted.size >= 20, deleted.size)
      assert(MiniDelta.distributedDeletes.get() - before >= 20L,
        "expected the distributed delete path")
      // the table still reads complete after the fan-out vacuum
      assert(MiniDelta.readFiltered(spark, t, Seq.empty).count() == 200L)
    } finally MiniDelta.vacuumParallelThreshold = prev
  }

  test("vacuum fans the candidate LISTING out past the dir threshold") {
    // round 15: candidate discovery was the one remaining serial
    // O(table) stage — past the first-level-directory threshold the
    // per-partition recursive walks run as one cluster job, and the
    // result (both the survivors and the deleted debris) is identical
    // to the driver walk
    val t = Files.createTempDirectory("vaclist").toString + "/t"
    val prevList = MiniDelta.vacuumListParallelThreshold
    MiniDelta.vacuumListParallelThreshold = 8
    try {
      import org.apache.spark.sql.functions.{col, pmod}
      MiniDelta.append(spark, spark.range(200)
        .select(col("id"), pmod(col("id"), org.apache.spark.sql.functions
          .lit(20)).as("p")), t, Seq("p")) // 20 partition dirs > 8
      MiniDelta.invalidateSnapshot(t)
      // orphan debris in one partition dir: only the listing can find it
      val orphan = new java.io.File(s"$t/p=3/zzz_orphan.parquet")
      java.nio.file.Files.write(orphan.toPath, Array[Byte](1, 2, 3))
      val before = MiniDelta.distributedListings.get()
      val deleted = MiniDelta.vacuum(spark, t, retainMs = 0L)
      assert(MiniDelta.distributedListings.get() - before >= 1L,
        "expected the distributed listing path")
      assert(deleted.contains("p=3/zzz_orphan.parquet"), deleted)
      assert(!orphan.exists())
      assert(MiniDelta.readFiltered(spark, t, Seq.empty).count() == 200L)
    } finally MiniDelta.vacuumListParallelThreshold = prevList
  }
}
