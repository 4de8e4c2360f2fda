package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.io.MiniDelta

/** Write-side column mapping (id mode) + the atomic commit-slot claim.
  *
  * id-mode WRITES are the reference's own documented interop
  * limitation (/root/reference/README.md:249-270 describes the client
  * hazard column mapping exists for): every written parquet file must
  * carry footer field_ids matching the schema's
  * `delta.columnMapping.id` metadata, because a compliant id-mode
  * reader resolves columns EXCLUSIVELY by those ids — names are only a
  * fallback. These specs create id tables, drive the full write
  * lifecycle (append, rename, post-rename append, DELETE, UPDATE),
  * and assert the footer ids on the actual files via the parquet
  * footer API — not just a read-back through this engine's own path.
  */
class ColumnMappingWriteSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def freshTable(): String =
    Files.createTempDirectory("cmwrite").toString + "/t"

  /** (name -> field id) pairs from a parquet file's footer. */
  private def footerIds(file: String): Map[String, Option[Int]] = {
    val in = org.apache.parquet.hadoop.util.HadoopInputFile.fromPath(
      new org.apache.hadoop.fs.Path(file),
      spark.sparkContext.hadoopConfiguration)
    val r = org.apache.parquet.hadoop.ParquetFileReader.open(in)
    try {
      val schema = r.getFooter.getFileMetaData.getSchema
      import scala.jdk.CollectionConverters._
      schema.getFields.asScala.map(f =>
        f.getName -> Option(f.getId).map(_.intValue())).toMap
    } finally r.close()
  }

  private def dataFiles(table: String): Seq[String] =
    Option(new java.io.File(table).listFiles()).toSeq.flatten
      .filter(f => f.getName.endsWith(".parquet"))
      .map(_.getAbsolutePath)

  test("id-mode CREATE + append lands footer field_ids and reads back") {
    val t = freshTable()
    import org.apache.spark.sql.types._
    MiniDelta.createTable(spark, t,
      StructType(Seq(
        StructField("id", LongType),
        StructField("name", StringType),
        StructField("qty", LongType))),
      properties = Map("delta.columnMapping.mode" -> "id"))
    val cfg = MiniDelta.tableConfig(spark, t)
    assert(cfg("delta.columnMapping.mode") == "id")
    assert(cfg("delta.columnMapping.maxColumnId") == "3")
    MiniDelta.append(spark,
      Seq((1L, "a", 10L), (2L, "b", 20L), (3L, "c", 30L))
        .toDF("id", "name", "qty"), t, Seq.empty)
    // the files must carry footer field_ids matching the mapping —
    // the id-mode resolution contract a compliant reader matches on
    val ids = dataFiles(t).map(footerIds)
    assert(ids.nonEmpty)
    ids.foreach { m =>
      assert(m.get("id").flatten.contains(1), m)
      assert(m.get("name").flatten.contains(2), m)
      assert(m.get("qty").flatten.contains(3), m)
    }
    MiniDelta.invalidateSnapshot(t)
    assert(MiniDelta.readFiltered(spark, t, Seq.empty)
      .orderBy("id").as[(Long, String, Long)].collect().toSeq ==
      Seq((1L, "a", 10L), (2L, "b", 20L), (3L, "c", 30L)))
  }

  test("id-mode lifecycle: rename diverges names, ids stay load-bearing") {
    val t = freshTable()
    import org.apache.spark.sql.types._
    MiniDelta.createTable(spark, t,
      StructType(Seq(
        StructField("id", LongType),
        StructField("name", StringType))),
      properties = Map("delta.columnMapping.mode" -> "id"))
    MiniDelta.append(spark, Seq((1L, "a"), (2L, "b")).toDF("id", "name"),
      t, Seq.empty)
    // RENAME COLUMN is legal under id mode (delta-spark allows both
    // modes): logical 'name' becomes 'label', physical stays 'name'
    MiniDelta.renameColumn(spark, t, "name", "label")
    MiniDelta.invalidateSnapshot(t)
    // post-rename append: the frame speaks the NEW logical name, the
    // file lands the OLD physical name + the same footer id
    MiniDelta.append(spark, Seq((3L, "c")).toDF("id", "label"),
      t, Seq.empty)
    val ids = dataFiles(t).map(footerIds)
    ids.foreach { m =>
      assert(m.get("name").flatten.contains(2),
        s"physical column 'name' must keep footer id 2: $m")
    }
    MiniDelta.invalidateSnapshot(t)
    // DML under id mode: copy-on-write rewrite relabels + re-ids
    MiniDelta.delete(spark, t, col("id") === 2L, Seq.empty)
    MiniDelta.update(spark, t, col("id") === 3L,
      Map("label" -> lit("C")), Seq.empty)
    MiniDelta.invalidateSnapshot(t)
    assert(MiniDelta.readFiltered(spark, t, Seq.empty)
      .orderBy("id").as[(Long, String)].collect().toSeq ==
      Seq((1L, "a"), (3L, "C")))
    // time travel BEFORE the rename reads the old logical name
    val v1 = MiniDelta.readFiltered(spark, t, Seq.empty,
      versionAsOf = Some(1L))
    assert(v1.columns.toSeq == Seq("id", "name"))
  }

  test("name-mode writes land footer ids too (real writers do the same)") {
    val t = freshTable()
    import org.apache.spark.sql.types._
    MiniDelta.createTable(spark, t,
      StructType(Seq(
        StructField("id", LongType),
        StructField("v", StringType))),
      properties = Map("delta.columnMapping.mode" -> "name"))
    MiniDelta.append(spark, Seq((1L, "x")).toDF("id", "v"), t, Seq.empty)
    val m = footerIds(dataFiles(t).head)
    assert(m.get("id").flatten.contains(1), m)
    assert(m.get("v").flatten.contains(2), m)
  }

  test("mode 'none' is Delta's explicit default: CREATE and SET accept it") {
    val t = freshTable()
    import org.apache.spark.sql.types._
    MiniDelta.createTable(spark, t,
      StructType(Seq(StructField("id", LongType))),
      properties = Map("delta.columnMapping.mode" -> "none"))
    assert(MiniDelta.tableConfig(spark, t)
      .get("delta.columnMapping.mode").contains("none"))
    MiniDelta.append(spark, Seq(Tuple1(1L)).toDF("id"), t, Seq.empty)
    // SET TBLPROPERTIES mode=none on an unmapped table is a no-op
    // (real writers accept the documented default value the same way)
    MiniDelta.setTableProperties(spark, t,
      Map("delta.columnMapping.mode" -> "none"))
    MiniDelta.invalidateSnapshot(t)
    assert(MiniDelta.readFiltered(spark, t, Seq.empty).count() == 1)
    // but a mapped table cannot be un-mapped through it
    val n = freshTable()
    MiniDelta.createTable(spark, n,
      StructType(Seq(StructField("id", LongType))),
      properties = Map("delta.columnMapping.mode" -> "name"))
    val ex = intercept[IllegalArgumentException](
      MiniDelta.setTableProperties(spark, n,
        Map("delta.columnMapping.mode" -> "none")))
    assert(ex.getMessage.contains("established"), ex.getMessage)
  }

  test("name-mode upgrade on a PARTITIONED table: dirs are already physical") {
    // upgrade semantics pin physicalName = the current name, so the
    // partition directories already on disk ARE the physical names —
    // nothing renames, post-upgrade appends land in the same layout,
    // and a later rename of a NON-partition column only moves the
    // logical label (this combination refused before late r13)
    val t = freshTable()
    MiniDelta.append(spark,
      Seq((1L, "a", "x"), (2L, "b", "y")).toDF("id", "v", "p"),
      t, Seq("p"))
    MiniDelta.invalidateSnapshot(t)
    MiniDelta.setTableProperties(spark, t,
      Map("delta.columnMapping.mode" -> "name"))
    MiniDelta.invalidateSnapshot(t)
    MiniDelta.append(spark, Seq((3L, "c", "x")).toDF("id", "v", "p"),
      t, Seq("p"))
    MiniDelta.invalidateSnapshot(t)
    MiniDelta.renameColumn(spark, t, "v", "label")
    MiniDelta.invalidateSnapshot(t)
    assert(MiniDelta.readFiltered(spark, t, Seq.empty).orderBy("id")
      .select("id", "label", "p").as[(Long, String, String)]
      .collect().toSeq ==
      Seq((1L, "a", "x"), (2L, "b", "y"), (3L, "c", "x")))
    // partition pruning probes the on-disk (physical) key — both the
    // pre-upgrade and post-upgrade files of p=x survive
    assert(MiniDelta.filesForFilters(
      MiniDelta.snapshotFiles(spark, t), Seq(Map("p" -> "x")))
      .count() == 2)
    // post-upgrade DML crosses the partition layout intact
    MiniDelta.delete(spark, t, col("id") === 2L, Seq("p"))
    MiniDelta.invalidateSnapshot(t)
    assert(MiniDelta.readFiltered(spark, t, Seq.empty)
      .select("id").as[Long].collect().toSet == Set(1L, 3L))
  }

  test("mapped evolution through append: fresh ids, physical files, pinned") {
    import org.apache.spark.sql.types._
    val t = freshTable()
    MiniDelta.createTable(spark, t, StructType(Seq(
      StructField("id", LongType), StructField("v", StringType))),
      properties = Map("delta.columnMapping.mode" -> "id"))
    MiniDelta.append(spark, Seq((1L, "a")).toDF("id", "v"), t, Seq.empty)
    MiniDelta.invalidateSnapshot(t)
    // evolving append (pre-r13 this refused): the new column gets a
    // FRESH physical name + the ratcheted id 3, the files land under
    // the extended physical schema with footer field_ids, and the SAME
    // commit's metaData declares the evolved schema
    MiniDelta.append(spark,
      Seq((2L, "b", 7L)).toDF("id", "v", "extra"), t, Seq.empty)
    MiniDelta.invalidateSnapshot(t)
    val schema = MiniDelta.latestSchema(spark, t).get
    val extra = schema("extra")
    assert(extra.metadata.getLong("delta.columnMapping.id") == 3L)
    val phys = extra.metadata.getString(
      "delta.columnMapping.physicalName")
    assert(phys.startsWith("col_3_"), phys) // fresh, never the logical
    assert(MiniDelta.tableConfig(spark, t)(
      "delta.columnMapping.maxColumnId") == "3")
    // the evolving commit's files speak physical names + the new id
    val evolved = dataFiles(t).map(footerIds)
      .filter(_.contains(phys))
    assert(evolved.nonEmpty)
    evolved.foreach(m => assert(m(phys).contains(3), m))
    // old files null-fill, new files carry the value — one logical read
    val got = MiniDelta.readFiltered(spark, t, Seq.empty)
      .select("id", "v", "extra").collect()
      .map(r => (r.getLong(0), r.getString(1),
        if (r.isNullAt(2)) -1L else r.getLong(2))).toSet
    assert(got == Set((1L, "a", -1L), (2L, "b", 7L)), got)
    // a rename of the evolved column stays metadata-only (the physical
    // name is already divorced from the logical one)
    MiniDelta.renameColumn(spark, t, "extra", "bonus")
    MiniDelta.invalidateSnapshot(t)
    assert(MiniDelta.readFiltered(spark, t, Seq.empty)
      .where(col("bonus") === 7L).count() == 1)
    // the commit is PINNED: a commit landing between the mark read and
    // the write conflicts instead of double-assigning id 4
    val prevHook = MiniDelta.beforeDmlCommitHook
    MiniDelta.beforeDmlCommitHook = () => {
      MiniDelta.beforeDmlCommitHook = prevHook
      MiniDelta.setTableProperties(spark, t, Map("k" -> "v"))
      ()
    }
    try intercept[MiniDelta.ConcurrentCommitException](
      MiniDelta.append(spark,
        Seq((3L, "c", 1L, 2L)).toDF("id", "v", "bonus", "later"),
        t, Seq.empty))
    finally MiniDelta.beforeDmlCommitHook = prevHook
  }

  test("mapped evolution append on a partitioned name-mode table") {
    import org.apache.spark.sql.types._
    val t = freshTable()
    MiniDelta.createTable(spark, t, StructType(Seq(
      StructField("id", LongType), StructField("p", StringType))),
      partitionBy = Seq("p"),
      properties = Map("delta.columnMapping.mode" -> "name"))
    MiniDelta.append(spark, Seq((1L, "x")).toDF("id", "p"), t, Seq("p"))
    MiniDelta.invalidateSnapshot(t)
    MiniDelta.append(spark,
      Seq((2L, "y", 0.5)).toDF("id", "p", "score"), t, Seq("p"))
    MiniDelta.invalidateSnapshot(t)
    // partition layout intact (physical partition key), evolved column
    // reads across both eras
    val got = MiniDelta.readFiltered(spark, t, Seq.empty)
      .select("id", "p", "score").collect()
      .map(r => (r.getLong(0), r.getString(1),
        if (r.isNullAt(2)) -1.0 else r.getDouble(2))).toSet
    assert(got == Set((1L, "x", -1.0), (2L, "y", 0.5)), got)
    assert(MiniDelta.filesForFilters(
      MiniDelta.snapshotFiles(spark, t), Seq(Map("p" -> "y")))
      .count() == 1)
  }

  test("upgrade to id mode refuses with the create-only rule") {
    val t = freshTable()
    MiniDelta.append(spark, Seq((1L, "a")).toDF("id", "v"), t, Seq.empty)
    val ex = intercept[IllegalArgumentException](
      MiniDelta.setTableProperties(spark, t,
        Map("delta.columnMapping.mode" -> "id")))
    assert(ex.getMessage.contains("CREATE"), ex.getMessage)
  }

  test("REPLACE TABLE can declare a mapping mode (fresh ids, ratcheted)") {
    val t = freshTable()
    import org.apache.spark.sql.types._
    // start life as a NAME-mapped 2-column table (maxColumnId = 2)
    MiniDelta.createTable(spark, t,
      StructType(Seq(
        StructField("a", LongType), StructField("b", StringType))),
      properties = Map("delta.columnMapping.mode" -> "name"))
    MiniDelta.append(spark, Seq((1L, "x")).toDF("a", "b"), t, Seq.empty)
    // REPLACE with id mode: one commit swaps the contract, tombstones
    // the old rows, and assigns fresh mapping metadata whose ids
    // ratchet PAST the old maxColumnId (never reused)
    MiniDelta.replaceTable(spark, t,
      StructType(Seq(
        StructField("id", LongType), StructField("v", StringType))),
      properties = Map("delta.columnMapping.mode" -> "id"))
    MiniDelta.invalidateSnapshot(t)
    val cfg = MiniDelta.tableConfig(spark, t)
    assert(cfg("delta.columnMapping.mode") == "id")
    assert(cfg("delta.columnMapping.maxColumnId") == "4")
    val before = dataFiles(t).toSet
    MiniDelta.append(spark, Seq((9L, "z")).toDF("id", "v"), t, Seq.empty)
    val m = footerIds((dataFiles(t).toSet -- before).head)
    assert(m.get("id").flatten.contains(3), m)
    assert(m.get("v").flatten.contains(4), m)
    MiniDelta.invalidateSnapshot(t)
    assert(MiniDelta.readFiltered(spark, t, Seq.empty)
      .as[(Long, String)].collect().toSeq == Seq((9L, "z")))
  }

  test("DV DML works under id-mode mapping (masks are schema-blind)") {
    val t = freshTable()
    import org.apache.spark.sql.types._
    MiniDelta.createTable(spark, t,
      StructType(Seq(
        StructField("id", LongType), StructField("v", StringType))),
      properties = Map("delta.columnMapping.mode" -> "id",
        "delta.enableDeletionVectors" -> "true"))
    MiniDelta.append(spark,
      Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("id", "v").coalesce(1),
      t, Seq.empty)
    // DV DELETE masks by (file, row index) — no column resolution in
    // the mask itself, but the predicate scan resolves THROUGH the
    // id-mode relabel; the re-added file keeps its footer ids
    MiniDelta.delete(spark, t, col("id") === 2L, Seq.empty)
    MiniDelta.invalidateSnapshot(t)
    assert(MiniDelta.readFiltered(spark, t, Seq.empty)
      .orderBy("id").as[(Long, String)].collect().toSeq ==
      Seq((1L, "a"), (3L, "c")))
    // DV UPDATE appends the new image — footer ids must ride it
    MiniDelta.update(spark, t, col("id") === 3L,
      Map("v" -> lit("C")), Seq.empty)
    MiniDelta.invalidateSnapshot(t)
    assert(MiniDelta.readFiltered(spark, t, Seq.empty)
      .orderBy("id").as[(Long, String)].collect().toSeq ==
      Seq((1L, "a"), (3L, "C")))
    dataFiles(t).map(footerIds).foreach { m =>
      assert(m.get("id").flatten.contains(1) &&
        m.get("v").flatten.contains(2), m)
    }
    // OPTIMIZE materializes the masks; the compacted file is id-true
    MiniDelta.compact(spark, t, Seq.empty)
    MiniDelta.invalidateSnapshot(t)
    assert(MiniDelta.readFiltered(spark, t, Seq.empty).count() == 2)
  }

  test("a lost commit race never clobbers the winner (link claim)") {
    val t = freshTable()
    MiniDelta.append(spark, Seq((1L, "a")).toDF("id", "v"), t, Seq.empty)
    val sentinel =
      """{"commitInfo":{"operation":"WINNER","version":1,"timestamp":1}}"""
    def stealNextSlot(): java.nio.file.Path = {
      val next = MiniDelta.latestVersion(spark, t) + 1
      val p = Paths.get(f"$t%s/_delta_log/$next%020d.json")
      Files.write(p, sentinel.getBytes("UTF-8"))
      p
    }
    // steal the slot AFTER the DML pinned its read version (the hook
    // fires right before the commit lands). The winner's bytes must
    // survive the lost race — Hadoop's local rename is POSIX
    // rename(2), which silently REPLACES, so a screen+rename claim
    // could clobber here. A commitInfo-only winner is logically
    // disjoint, so the r15 conflict resolution REBASES the delete past
    // it instead of giving up — the non-clobber property is unchanged.
    var stolen: java.nio.file.Path = null
    val prevHook = MiniDelta.beforeDmlCommitHook
    MiniDelta.beforeDmlCommitHook = () => {
      MiniDelta.beforeDmlCommitHook = prevHook // fire once
      stolen = stealNextSlot()
    }
    try {
      val v = MiniDelta.delete(spark, t, col("id") === 1L, Seq.empty)
      assert(v == MiniDelta.latestVersion(spark, t),
        "the rebased delete must land AFTER the winner")
    } finally MiniDelta.beforeDmlCommitHook = prevHook
    assert(new String(Files.readAllBytes(stolen), "UTF-8") == sentinel,
      "losing writer clobbered the winning commit")
    // streamed path (TRUNCATE, which keeps the strict pinned rule)
    // loses the same way: conflict surfaces AND the winner survives
    MiniDelta.append(spark, Seq((2L, "b")).toDF("id", "v"), t, Seq.empty)
    MiniDelta.invalidateSnapshot(t)
    val prevHook2 = MiniDelta.beforeDmlCommitHook
    MiniDelta.beforeDmlCommitHook = () => {
      MiniDelta.beforeDmlCommitHook = prevHook2 // fire once
      stolen = stealNextSlot()
    }
    try intercept[MiniDelta.ConcurrentCommitException](
      MiniDelta.truncate(spark, t))
    finally MiniDelta.beforeDmlCommitHook = prevHook2
    assert(new String(Files.readAllBytes(stolen), "UTF-8") == sentinel,
      "streamed loser clobbered the winning commit")
    // no render debris: neither temp files nor their checksum sidecars
    val debris = Option(new java.io.File(s"$t/_delta_log").listFiles())
      .toSeq.flatten.map(_.getName).filter(_.contains(".json.tmp"))
    assert(debris.isEmpty, s"temp-render debris left behind: $debris")
  }
}
