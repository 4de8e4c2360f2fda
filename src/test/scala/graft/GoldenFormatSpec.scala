package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.io.{MiniDelta, RoaringDv}

/** Golden-file pins on the WRITE-side wire formats: the exact bytes the
  * engine lands for commit JSON (v0 protocol+metaData+adds with stats,
  * property/protocol upgrades, DV remove+re-add descriptors), the
  * `_last_checkpoint` pointer, the packed roaring deletion-vector
  * binary, and the raw roaring serialization. Text artifacts compare
  * byte-for-byte after substituting the DECLARED nondeterminism
  * (UUIDs, file sizes, wall-clock fields) with placeholders; binary
  * artifacts compare as exact hex. Any format drift — field order, a
  * dropped field, escaping, bitmap container layout — fails here
  * before a foreign reader would ever see it.
  *
  * This is the offline substitute for a foreign-engine round trip
  * (no delta jars/wheels ship in this environment): the goldens were
  * captured from output the foreign-SHAPED read specs (s27/s28/s30,
  * RoaringDvSpec's from-spec decode) validate, so they pin the
  * validated format, and the classic/v2 checkpoint PARQUET artifacts —
  * not byte-pinnable across writer versions — stay covered by those
  * read-back specs. Regenerate deliberately with REGEN_GOLDEN=1 after
  * an intentional format change.
  */
class GoldenFormatSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private val goldenDir = "src/test/resources/golden"
  private val regen = sys.env.get("REGEN_GOLDEN").contains("1")

  private def normalize(txt: String): String = txt
    .replaceAll(
      "[0-9a-fA-F]{8}-[0-9a-fA-F]{4}-[0-9a-fA-F]{4}-[0-9a-fA-F]{4}-" +
        "[0-9a-fA-F]{12}", "<uuid>")
    .replaceAll("\"pathOrInlineDv\":\"[^\"]+\"",
      "\"pathOrInlineDv\":\"<z85>\"")
    .replaceAll("\"(size|sizeInBytes|offset|modificationTime|timestamp|" +
      "inCommitTimestamp|deletionTimestamp|lastUpdated|createdTime)\"" +
      ":-?[0-9]+", "\"$1\":<n>")

  private def check(name: String, actual: String): Unit = {
    val p = Paths.get(goldenDir, name)
    if (regen) {
      Files.createDirectories(p.getParent)
      Files.write(p, actual.getBytes("UTF-8"))
      info(s"regenerated golden $name")
    } else {
      assert(Files.exists(p), s"missing golden $name — run with " +
        "REGEN_GOLDEN=1 once to capture it")
      val expected = new String(Files.readAllBytes(p), "UTF-8")
      assert(actual == expected,
        s"wire-format drift in $name\n--- actual ---\n$actual")
    }
  }

  private def readText(path: String): String =
    new String(Files.readAllBytes(Paths.get(path)), "UTF-8")

  private def hex(bytes: Array[Byte]): String =
    bytes.map(b => f"${b & 0xff}%02x").mkString

  test("log artifacts match the golden wire format") {
    val prevClock = MiniDelta.commitClock
    MiniDelta.commitClock = () => 1700000000000L
    val t = Files.createTempDirectory("golden").toString + "/t"
    try {
      MiniDelta.append(spark,
        Seq((1L, "2023", "a"), (2L, "2023", "b"), (3L, "2024", "c"))
          .toDF("id", "year", "payload").coalesce(1),
        t, Seq("year"), statsCols = Seq("id"))
      MiniDelta.setTableProperties(spark, t,
        Map("delta.enableDeletionVectors" -> "true"))
      MiniDelta.delete(spark, t, col("id") === 2L, Seq("year"))
      MiniDelta.writeCheckpoint(spark, t, 2L)

      check("v0_commit.json",
        normalize(readText(f"$t/_delta_log/${0L}%020d.json")))
      check("properties_commit.json",
        normalize(readText(f"$t/_delta_log/${1L}%020d.json")))
      check("dv_delete_commit.json",
        normalize(readText(f"$t/_delta_log/${2L}%020d.json")))
      check("last_checkpoint.json",
        normalize(readText(s"$t/_delta_log/_last_checkpoint")))

      // the packed DV binary: fixed masked row set -> exact bytes
      val bins = Files.list(Paths.get(t)).toArray.map(_.toString)
        .filter(p => p.contains("deletion_vector_") && p.endsWith(".bin"))
      assert(bins.length == 1, bins.toSeq)
      check("dv_packed.bin.hex", hex(Files.readAllBytes(Paths.get(bins.head))))

      // REORG wire shape: the masked file's dataChange=false
      // remove/add pair — the physical rewrite a CDF or streaming
      // reader must never see as a logical change
      MiniDelta.reorgPurge(spark, t, Seq("year"))
      val reorgTxt = readText(f"$t/_delta_log/${3L}%020d.json")
      assert(reorgTxt.contains("\"remove\"") &&
        reorgTxt.contains("\"add\"") &&
        !reorgTxt.contains("\"dataChange\":true"), reorgTxt)
      check("reorg_commit.json", normalize(reorgTxt))

      // SHOW CREATE TABLE render: the re-runnable DDL contract, pinned
      // up to the (tempdir) location
      val ddl = graft.plans.GraftShowCreateTableCommand("golden_t", t)
        .run(spark).head.getString(0)
      check("show_create.sql", ddl.replace(t, "<location>"))
    } finally {
      MiniDelta.commitClock = prevClock
    }
  }

  test("defaulted footer-stats add action matches the golden format") {
    // the r14 stats DEFAULT rides every SQL-built write; pin one
    // defaulted add action's `stats` JSON (numRecords, min/maxValues
    // key ordering, micro-precision timestamp rendering, all-null
    // rendering) so a formatting drift cannot silently break foreign
    // readers' data skipping
    val prevClock = MiniDelta.commitClock
    MiniDelta.commitClock = () => 1700000000000L
    val t = Files.createTempDirectory("goldenstats").toString + "/t"
    try {
      MiniDelta.append(spark, Seq(
        (1L, "beta", java.sql.Timestamp.valueOf("2024-01-02 03:04:05.123456"),
          null.asInstanceOf[String], 2.5d),
        (9L, "alpha", java.sql.Timestamp.valueOf("2023-12-31 23:59:59.999999"),
          null.asInstanceOf[String], -0.25d))
        .toDF("id", "s", "ts", "allnull", "d").coalesce(1),
        t, Seq.empty) // no statsCols: exactly the defaulted-write shape
      check("footer_stats_add.json",
        normalize(readText(f"$t/_delta_log/${0L}%020d.json")))
    } finally {
      MiniDelta.commitClock = prevClock
    }
  }

  test("rowTracking log artifacts match the golden wire format") {
    // pins the LAST writer feature's wire shape: the enablement v0
    // (protocol carrying rowTracking + domainMetadata, metaData with
    // the property), an append whose single add carries
    // baseRowId/defaultRowCommitVersion alongside the advancing
    // delta.rowTracking domainMetadata mark, and a DV swap whose
    // re-add PRESERVES the ids. coalesce(1) + fixed rows + fixed clock
    // make every non-normalized byte deterministic.
    val prevClock = MiniDelta.commitClock
    MiniDelta.commitClock = () => 1700000000000L
    val t = Files.createTempDirectory("golden_rt").toString + "/t"
    try {
      import org.apache.spark.sql.types._
      MiniDelta.createTable(spark, t, StructType(Seq(
        StructField("id", LongType), StructField("year", StringType))),
        Seq("year"),
        properties = Map("delta.enableRowTracking" -> "true",
          "delta.enableDeletionVectors" -> "true"))
      MiniDelta.append(spark,
        Seq((1L, "2023"), (2L, "2023"), (3L, "2023")).toDF("id", "year")
          .coalesce(1),
        t, Seq("year"), statsCols = Seq("id"))
      MiniDelta.delete(spark, t, col("id") === 2L, Seq("year"))

      val v0 = readText(f"$t/_delta_log/${0L}%020d.json")
      val v1 = readText(f"$t/_delta_log/${1L}%020d.json")
      val v2 = readText(f"$t/_delta_log/${2L}%020d.json")
      // sanity BEFORE the byte pin, so a drift failure names the field
      assert(v0.contains("\"rowTracking\"") &&
        v0.contains("\"domainMetadata\""), v0)
      assert(v1.contains("\"baseRowId\":0") &&
        v1.contains("\"defaultRowCommitVersion\":1") &&
        v1.contains("\"rowIdHighWaterMark\\\":2"), v1)
      assert(v2.contains("\"baseRowId\":0") &&
        v2.contains("\"deletionVector\""), v2)
      check("rt_v0_commit.json", normalize(v0))
      check("rt_append_commit.json", normalize(v1))
      check("rt_dv_swap_commit.json", normalize(v2))
    } finally {
      MiniDelta.commitClock = prevClock
    }
  }

  test("id-mode log artifacts match the golden wire format") {
    // pins the round-13 writer capability: a CREATE declaring
    // delta.columnMapping.mode=id (v0 carries the columnMapping
    // feature protocol + a metaData whose schemaString fields all hold
    // physicalName/id metadata and whose configuration ratchets
    // maxColumnId) and an append whose add stats key by PHYSICAL name.
    // The footer field_ids themselves are asserted via the parquet
    // footer API — the parquet bytes are not byte-pinnable across
    // writer versions, the log is.
    val prevClock = MiniDelta.commitClock
    MiniDelta.commitClock = () => 1700000000000L
    val t = Files.createTempDirectory("golden_cmid").toString + "/t"
    try {
      import org.apache.spark.sql.types._
      MiniDelta.createTable(spark, t, StructType(Seq(
        StructField("id", LongType), StructField("label", StringType))),
        properties = Map("delta.columnMapping.mode" -> "id"))
      MiniDelta.append(spark,
        Seq((1L, "a"), (2L, "b")).toDF("id", "label").coalesce(1),
        t, Seq.empty, statsCols = Seq("id"))
      val v0 = readText(f"$t/_delta_log/${0L}%020d.json")
      val v1 = readText(f"$t/_delta_log/${1L}%020d.json")
      // sanity BEFORE the byte pin, so a drift failure names the field
      assert(v0.contains("\"delta.columnMapping.mode\":\"id\"") &&
        v0.contains("columnMapping") &&
        v0.contains("delta.columnMapping.physicalName"), v0)
      assert(v1.contains("\"add\""), v1)
      check("colmap_id_v0.json", normalize(v0))
      check("colmap_id_append.json", normalize(v1))
      // the written file carries footer field_ids matching the mapping
      val pq = new java.io.File(t).listFiles()
        .filter(_.getName.endsWith(".parquet")).head
      val in = org.apache.parquet.hadoop.util.HadoopInputFile.fromPath(
        new org.apache.hadoop.fs.Path(pq.getAbsolutePath),
        spark.sparkContext.hadoopConfiguration)
      val r = org.apache.parquet.hadoop.ParquetFileReader.open(in)
      val ids =
        try {
          import scala.jdk.CollectionConverters._
          r.getFooter.getFileMetaData.getSchema.getFields.asScala
            .map(f => f.getName -> Option(f.getId).map(_.intValue()))
            .toMap
        } finally r.close()
      assert(ids == Map("id" -> Some(1), "label" -> Some(2)), ids)
    } finally {
      MiniDelta.commitClock = prevClock
    }
  }

  test("RTAS commit artifacts match the golden wire format") {
    // pins the CREATE OR REPLACE ... AS SELECT wire shape on the SAME
    // log: a REPLACE TABLE commit (metaData contract swap + dataChange
    // tombstones for every pre-replace file, streamed) followed by the
    // fill's append commit — table identity and history survive, both
    // eras replayable. A reader between the two commits sees the
    // post-swap empty table (the REPLACE-then-fill contract the RTAS
    // command documents).
    val prevClock = MiniDelta.commitClock
    MiniDelta.commitClock = () => 1700000000000L
    val root = Files.createTempDirectory("golden_rtas").toString
    try {
      spark.sql(s"CREATE TABLE graft.golden_rtas (id BIGINT, v STRING) " +
        s"LOCATION '$root/t'")
      spark.sql("INSERT INTO graft.golden_rtas VALUES (1, 'x')")
      spark.sql("CREATE OR REPLACE TABLE graft.golden_rtas AS " +
        "SELECT CAST(7 AS BIGINT) AS k, 'a' AS tag")
      val v2 = readText(f"$root/t/_delta_log/${2L}%020d.json")
      val v3 = readText(f"$root/t/_delta_log/${3L}%020d.json")
      // sanity BEFORE the byte pin: the swap tombstones the old file
      // and declares the NEW schema; the fill appends under it
      assert(v2.contains("REPLACE TABLE") && v2.contains("\"remove\"") &&
        v2.contains("\\\"k\\\"") && v2.contains("\"dataChange\":true"), v2)
      assert(v3.contains("\"add\""), v3)
      check("rtas_replace_commit.json", normalize(v2))
      check("rtas_fill_commit.json", normalize(v3))
      assert(spark.sql("SELECT k, tag FROM graft.golden_rtas").collect()
        .map(r => (r.getLong(0), r.getString(1))).toSeq == Seq((7L, "a")))
    } finally {
      MiniDelta.commitClock = prevClock
      graft.plans.GraftSqlTables.unregister("golden_rtas")
    }
  }

  test("cdc commit artifacts match the golden wire format") {
    // pins the CDF WRITE wire shape: the enablement commit's protocol
    // (changeDataFeed writer feature) and a DELETE commit that carries
    // cdc actions (path under _change_data/, partitionValues,
    // dataChange=false) ahead of its remove/add pair — the layout a
    // real CDF reader serves the feed from.
    val prevClock = MiniDelta.commitClock
    MiniDelta.commitClock = () => 1700000000000L
    val t = Files.createTempDirectory("golden_cdc").toString + "/t"
    try {
      MiniDelta.append(spark,
        Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("id", "v").coalesce(1),
        t, Seq.empty, statsCols = Seq("id"))
      MiniDelta.setTableProperties(spark, t,
        Map("delta.enableChangeDataFeed" -> "true"))
      MiniDelta.delete(spark, t, col("id") === 2L, Seq.empty)
      val v1 = readText(f"$t/_delta_log/${1L}%020d.json")
      val v2 = readText(f"$t/_delta_log/${2L}%020d.json")
      assert(v1.contains("\"changeDataFeed\""), v1)
      assert(v2.contains("\"cdc\":") && v2.contains("_change_data/") &&
        v2.contains("\"dataChange\":false") &&
        v2.contains("\"remove\""), v2)
      check("cdf_enable_commit.json", normalize(v1))
      check("cdc_delete_commit.json", normalize(v2))
    } finally {
      MiniDelta.commitClock = prevClock
    }
  }

  test("mapped-cdc commit artifacts match the golden wire format") {
    // pins the late-r13 mapped+CDF wire shape: v0 declares BOTH the
    // changeDataFeed writer feature and the columnMapping metadata
    // (physicalName/id per field, mode + maxColumnId in the
    // configuration), and a post-RENAME UPDATE commit carries cdc
    // actions whose path and partitionValues use the PHYSICAL
    // partition key while the same commit's metaData-bearing history
    // speaks the renamed logical name — the stable-name contract a
    // mapped CDF reader resolves by.
    val prevClock = MiniDelta.commitClock
    MiniDelta.commitClock = () => 1700000000000L
    val t = Files.createTempDirectory("golden_mcdc").toString + "/t"
    try {
      import org.apache.spark.sql.types._
      MiniDelta.createTable(spark, t, StructType(Seq(
        StructField("id", LongType), StructField("v", StringType),
        StructField("p", StringType))),
        partitionBy = Seq("p"),
        properties = Map("delta.columnMapping.mode" -> "name",
          "delta.enableChangeDataFeed" -> "true"))
      MiniDelta.append(spark,
        Seq((1L, "a", "x"), (2L, "b", "x")).toDF("id", "v", "p")
          .coalesce(1), t, Seq("p"))
      MiniDelta.invalidateSnapshot(t)
      MiniDelta.renameColumn(spark, t, "v", "label")
      MiniDelta.invalidateSnapshot(t)
      MiniDelta.update(spark, t, col("id") === 2L,
        Map("label" -> lit("B")), Seq("p"))
      val v0 = readText(f"$t/_delta_log/${0L}%020d.json")
      val v3 = readText(f"$t/_delta_log/${3L}%020d.json")
      assert(v0.contains("\"changeDataFeed\"") &&
        v0.contains("delta.columnMapping.physicalName"), v0)
      assert(v3.contains("\"cdc\":") &&
        v3.contains("_change_data/p=x/") &&
        v3.contains("\"partitionValues\":{\"p\":\"x\"}"), v3)
      check("mapped_cdf_v0.json", normalize(v0))
      check("mapped_cdc_update.json", normalize(v3))
    } finally {
      MiniDelta.commitClock = prevClock
    }
  }

  test("column-default v0 matches the golden wire format") {
    // pins the late-r13 allowColumnDefaults shape: v0's protocol
    // carries the writer feature and the schemaString carries Spark's
    // CURRENT_DEFAULT metadata key — the exact keys delta-spark
    // commits, so a real reader resolves the obligation
    val prevClock = MiniDelta.commitClock
    MiniDelta.commitClock = () => 1700000000000L
    val t = Files.createTempDirectory("golden_def").toString + "/t"
    try {
      import org.apache.spark.sql.types._
      MiniDelta.createTable(spark, t, StructType(Seq(
        StructField("id", LongType),
        StructField("status", StringType, nullable = true,
          new MetadataBuilder()
            .putString("CURRENT_DEFAULT", "'new'")
            .putString("EXISTS_DEFAULT", "'new'").build()))))
      val v0 = readText(f"$t/_delta_log/${0L}%020d.json")
      assert(v0.contains("\"allowColumnDefaults\"") &&
        v0.contains("CURRENT_DEFAULT"), v0)
      check("defaults_v0.json", normalize(v0))
    } finally {
      MiniDelta.commitClock = prevClock
    }
  }

  test("late-r13 feature wire shapes match their goldens") {
    // pins everything the late-r13 wave made newly writable:
    // (1) a clustered v0 — clustering+domainMetadata writer features +
    //     the delta.clustering domain carrying the layout;
    // (2) a typeWidening commit — metaData with the widened type and
    //     its delta.typeChanges record, protocol gaining the
    //     reader+writer feature in the same commit;
    // (3) a variant v0 — variantType in BOTH feature lists and the
    //     spec's `variant` type name inside schemaString.
    val prevClock = MiniDelta.commitClock
    MiniDelta.commitClock = () => 1700000000000L
    val base = Files.createTempDirectory("golden_late13").toString
    try {
      import org.apache.spark.sql.types._
      val tc = s"$base/clustered"
      MiniDelta.createTable(spark, tc, StructType(Seq(
        StructField("a", LongType), StructField("b", StringType))),
        clusterBy = Seq("a"))
      check("clustered_v0.json",
        normalize(readText(f"$tc/_delta_log/${0L}%020d.json")))
      val tw = s"$base/widen"
      MiniDelta.createTable(spark, tw, StructType(Seq(
        StructField("id", LongType), StructField("n", IntegerType))))
      MiniDelta.widenColumnType(spark, tw, "n", LongType)
      check("widen_commit.json",
        normalize(readText(f"$tw/_delta_log/${1L}%020d.json")))
      val tv = s"$base/variant"
      MiniDelta.createTable(spark, tv, StructType(Seq(
        StructField("id", LongType), StructField("v", VariantType))))
      check("variant_v0.json",
        normalize(readText(f"$tv/_delta_log/${0L}%020d.json")))
    } finally {
      MiniDelta.commitClock = prevClock
    }
  }

  test("DROP FEATURE artifacts match the golden wire format") {
    // pins the protocol-DOWNGRADE commit (the r14 verb): a DV table
    // whose feature is dropped with TRUNCATE HISTORY must land the
    // pre-downgrade property unset, the purge, and ONE protocol action
    // minus the feature with minReaderVersion normalized — and leave a
    // log directory holding ONLY the downgrade commit, its checkpoint,
    // and the pointer (the truncation contract a reader relies on).
    val prevClock = MiniDelta.commitClock
    MiniDelta.commitClock = () => 1700000000000L
    val t = Files.createTempDirectory("golden_df").toString + "/t"
    try {
      import org.apache.spark.sql.types._
      MiniDelta.createTable(spark, t, StructType(Seq(
        StructField("id", LongType), StructField("v", StringType))),
        properties = Map("delta.enableDeletionVectors" -> "true"))
      MiniDelta.append(spark,
        Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("id", "v").coalesce(1),
        t, Seq.empty, statsCols = Seq("id"))
      MiniDelta.delete(spark, t, col("id") === 2L, Seq.empty) // DV mask
      MiniDelta.invalidateSnapshot(t)
      val v = MiniDelta.dropFeature(spark, t, "deletionVectors",
        truncateHistory = true)
      check("drop_feature_commit.json",
        normalize(readText(f"$t/_delta_log/$v%020d.json")))
      check("drop_feature_last_checkpoint.json",
        normalize(readText(s"$t/_delta_log/_last_checkpoint")))
      // surviving log shape: the downgrade version's artifacts only
      val names = Files.list(Paths.get(s"$t/_delta_log")).toArray
        .map(_.toString.split('/').last)
        .filter(_.headOption.exists(_.isDigit)).sorted
      assert(names.forall(_.startsWith(f"$v%020d")), names.toSeq)
    } finally {
      MiniDelta.commitClock = prevClock
    }
  }

  test("roaring serialization matches the golden bytes") {
    // spans array-container territory plus a second 64K key bucket —
    // pins magic, key count, container headers, and value layout
    check("roaring_encode.hex",
      hex(RoaringDv.encode(Seq(1L, 5L, 7L, 65536L, 1000000L))))
  }

  test("evolving identity-merge commit matches the golden wire format") {
    // the r16 single-metaData contract on the wire: ONE metaData
    // action carrying the APPENDED column, the advanced
    // delta.identity.highWaterMark, and the identity field's metadata
    // verbatim, beside the rewrite's remove/add pair — the shape a
    // foreign reader replays to adopt the evolution and the mark in
    // one step
    val prevClock = MiniDelta.commitClock
    MiniDelta.commitClock = () => 1700000000000L
    val t = Files.createTempDirectory("goldenevo").toString + "/t"
    try {
      import org.apache.spark.sql.types._
      MiniDelta.createTable(spark, t, StructType(Seq(
        StructField("id", LongType, nullable = true,
          new MetadataBuilder().putLong("delta.identity.start", 1L)
            .putLong("delta.identity.step", 1L).build()),
        StructField("k", LongType),
        StructField("v", StringType))))
      MiniDelta.append(spark,
        Seq((10L, "a"), (20L, "b")).toDF("k", "v").coalesce(1), t,
        Seq.empty, statsCols = Seq("k"))
      val ver = MiniDelta.merge(spark, t,
        Seq((20L, "B", 5L), (30L, "c", 6L)).toDF("k", "v", "w")
          .coalesce(1),
        Seq("k"), Seq.empty, statsCols = Seq("k"))
      val txt = readText(f"$t/_delta_log/$ver%020d.json")
      assert(txt.linesIterator.count(_.contains("\"metaData\"")) == 1)
      check("identity_evolving_merge_commit.json", normalize(txt))
    } finally MiniDelta.commitClock = prevClock
  }
}
