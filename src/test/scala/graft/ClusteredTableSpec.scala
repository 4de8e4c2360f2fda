package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.io.MiniDelta

/** Clustered tables (Delta writer feature `clustering`, the liquid-
  * clustering declaration): CREATE/ALTER record the layout in the
  * `delta.clustering` domainMetadata (physical names on mapped tables),
  * the feature + its domainMetadata prerequisite join the protocol,
  * and a BARE OPTIMIZE honors the declared columns — multi-column
  * layouts z-order, single-column layouts range-cluster — so per-file
  * min/max stats discriminate on the clustering keys. The layout is
  * advisory for writes (appends need not cluster; OPTIMIZE restores
  * the layout), exactly Delta's contract.
  */
class ClusteredTableSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def freshTable(): String =
    Files.createTempDirectory("cluster").toString + "/t"

  test("CREATE CLUSTER BY: feature + domain at v0; OPTIMIZE honors it") {
    import org.apache.spark.sql.types._
    val t = freshTable()
    MiniDelta.createTable(spark, t, StructType(Seq(
      StructField("a", LongType), StructField("b", LongType),
      StructField("v", StringType))),
      clusterBy = Seq("a", "b"))
    val v0 = java.nio.file.Files.readString(java.nio.file.Paths.get(
      s"$t/_delta_log/${"0" * 20}.json"))
    assert(v0.contains("\"clustering\"") &&
      v0.contains("\"domainMetadata\"") &&
      v0.contains("delta.clustering") &&
      v0.contains("clusteringColumns"), v0)
    assert(MiniDelta.clusteringColumns(spark, t) == Seq("a", "b"))
    // DESCRIBE DETAIL reports the layout (real Delta's column)
    val dRow = MiniDelta.detail(spark, t).head()
    assert(dRow.getSeq[String](
      dRow.fieldIndex("clusteringColumns")) == Seq("a", "b"))
    // unclustered appends are legal (advisory layout)
    val rows = (0L until 400L).map(i => (i % 20, i / 20, s"v$i"))
    MiniDelta.append(spark, rows.toDF("a", "b", "v"), t, Seq.empty)
    MiniDelta.invalidateSnapshot(t)
    // bare OPTIMIZE: no explicit zOrderBy, the declared layout applies;
    // maxRecordsPerFile splits so multiple files carry tight stats
    MiniDelta.compact(spark, t, Seq.empty, maxRecordsPerFile = 100L)
    MiniDelta.invalidateSnapshot(t)
    val snap = MiniDelta.snapshotFiles(spark, t)
    assert(snap.count() >= 4)
    // the rewrite's stats discriminate on BOTH clustering columns: a
    // point range on `a` must skip at least one file
    val hit = MiniDelta.filesForRange(snap, "a", 0.0, 0.0).count()
    assert(hit >= 1 && hit < snap.count(), s"$hit of ${snap.count()}")
    // rows survive exactly
    assert(MiniDelta.readFiltered(spark, t, Seq.empty).count() == 400)
  }

  test("ALTER CLUSTER BY declares, re-states, and NONE clears") {
    import org.apache.spark.sql.types._
    val t = freshTable()
    MiniDelta.append(spark,
      Seq((1L, "x"), (2L, "y")).toDF("id", "v"), t, Seq.empty)
    MiniDelta.invalidateSnapshot(t)
    assert(MiniDelta.clusteringColumns(spark, t).isEmpty)
    MiniDelta.setClusterBy(spark, t, Seq("id"))
    MiniDelta.invalidateSnapshot(t)
    assert(MiniDelta.clusteringColumns(spark, t) == Seq("id"))
    // the enabling commit carries the feature
    val v = MiniDelta.latestVersion(spark, t)
    val txt = java.nio.file.Files.readString(java.nio.file.Paths.get(
      f"$t/_delta_log/$v%020d.json"))
    assert(txt.contains("\"clustering\""), txt)
    // NONE = empty layout (the domain re-states, never retracts)
    MiniDelta.setClusterBy(spark, t, Nil)
    MiniDelta.invalidateSnapshot(t)
    assert(MiniDelta.clusteringColumns(spark, t).isEmpty)
    // unknown column / partitioned-table refusals
    intercept[IllegalArgumentException](
      MiniDelta.setClusterBy(spark, t, Seq("nope")))
    val p = freshTable()
    MiniDelta.append(spark, Seq((1L, "x")).toDF("id", "p"), p, Seq("p"))
    intercept[IllegalArgumentException](
      MiniDelta.setClusterBy(spark, p, Seq("id")))
    import org.apache.spark.sql.types._
    intercept[IllegalArgumentException](
      MiniDelta.createTable(spark, freshTable(), StructType(Seq(
        StructField("id", LongType), StructField("p", StringType))),
        partitionBy = Seq("p"), clusterBy = Seq("id")))
  }

  test("mapped clustered table: domain stores physical, resolves logical") {
    import org.apache.spark.sql.types._
    val t = freshTable()
    MiniDelta.createTable(spark, t, StructType(Seq(
      StructField("id", LongType), StructField("v", StringType))),
      properties = Map("delta.columnMapping.mode" -> "name"),
      clusterBy = Seq("id"))
    MiniDelta.renameColumn(spark, t, "id", "key")
    MiniDelta.invalidateSnapshot(t)
    // the domain pinned the PHYSICAL name, so the layout survives the
    // rename and resolves under the NEW logical name
    assert(MiniDelta.clusteringColumns(spark, t) == Seq("key"))
  }

  test("DROP COLUMN refuses clustering columns; CLUSTER BY NONE frees") {
    import org.apache.spark.sql.types._
    val t = freshTable()
    MiniDelta.createTable(spark, t, StructType(Seq(
      StructField("id", LongType), StructField("v", StringType))),
      properties = Map("delta.columnMapping.mode" -> "name"),
      clusterBy = Seq("id"))
    // dropping a clustering column would leave the never-retracting
    // domain pointing at a dead physical name — every later bare
    // OPTIMIZE would target a non-existent column
    val e = intercept[IllegalArgumentException](
      MiniDelta.dropColumn(spark, t, "id"))
    assert(e.getMessage.contains("clustering"), e.getMessage)
    // re-stating the layout without the column frees it
    MiniDelta.setClusterBy(spark, t, Seq.empty)
    MiniDelta.invalidateSnapshot(t)
    MiniDelta.dropColumn(spark, t, "id")
    MiniDelta.invalidateSnapshot(t)
    assert(MiniDelta.latestSchema(spark, t).get.fieldNames.toSeq ==
      Seq("v"))
  }

  test("clustering layout survives checkpoints and rides into clones") {
    import org.apache.spark.sql.types._
    val t = freshTable()
    MiniDelta.createTable(spark, t, StructType(Seq(
      StructField("id", LongType), StructField("v", StringType))),
      clusterBy = Seq("id"))
    MiniDelta.append(spark, Seq((1L, "a")).toDF("id", "v"), t, Seq.empty)
    MiniDelta.invalidateSnapshot(t)
    val v = MiniDelta.latestVersion(spark, t)
    MiniDelta.writeCheckpoint(spark, t, v)
    // delete the pre-checkpoint JSON (what log cleanup does): the
    // domain must resolve from the checkpoint row
    (0L to v).foreach { i =>
      java.nio.file.Files.deleteIfExists(java.nio.file.Paths.get(
        f"$t/_delta_log/$i%020d.json")); ()
    }
    MiniDelta.invalidateSnapshot(t)
    assert(MiniDelta.clusteringColumns(spark, t) == Seq("id"))
    // shallow clone inherits the layout
    val fork = freshTable()
    MiniDelta.cloneShallow(spark, t, fork)
    MiniDelta.invalidateSnapshot(fork)
    assert(MiniDelta.clusteringColumns(spark, fork) == Seq("id"))
  }

  test("SQL: CREATE ... CLUSTER BY and ALTER TABLE CLUSTER BY") {
    import graft.plans.GraftSqlTables
    val dir = Files.createTempDirectory("clsql").toString
    GraftSqlTables.unregister("spec_cluster")
    spark.sql(s"""
      CREATE TABLE graft.spec_cluster (a BIGINT, b BIGINT, v STRING)
      CLUSTER BY (a, b) LOCATION '$dir/t'""")
    try {
      assert(MiniDelta.clusteringColumns(spark, s"$dir/t") ==
        Seq("a", "b"))
      spark.sql("ALTER TABLE graft.spec_cluster CLUSTER BY (b)")
      MiniDelta.invalidateSnapshot(s"$dir/t")
      assert(MiniDelta.clusteringColumns(spark, s"$dir/t") == Seq("b"))
      spark.sql("ALTER TABLE graft.spec_cluster CLUSTER BY NONE")
      MiniDelta.invalidateSnapshot(s"$dir/t")
      assert(MiniDelta.clusteringColumns(spark, s"$dir/t").isEmpty)
    } finally GraftSqlTables.clear()
  }
}
