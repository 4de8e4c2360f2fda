package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scale-curve harness: measure how the expensive analytical gates
  * scale from the driver's sf0.1 fixtures to a synthetic ~sf1
  * (10× documents/embeddings) — the cheapest way to catch a
  * super-linear operator before a 100× cluster run does.
  *
  * The driver ships no sf1 fixtures, so `gen` derives one from sf0.1 by
  * deterministic replication-with-decorrelation:
  *  - `documents`: 10 copies, doc_id offset by a fixed stride; copies
  *    i>0 rotate the vowels of every word (translate), which destroys
  *    shingle/minhash/simhash overlap across copies. That keeps the
  *    corpus's DUPLICATE-CLUSTER structure scale-invariant (10× more
  *    clusters of the same size) — the same shape a real 10× crawl
  *    would have — instead of manufacturing artificial 10-cliques that
  *    would quadratically inflate every near-dup gate.
  *  - `embeddings`: 10 copies, vec_id offset; copies i>0 sign-flip a
  *    copy-dependent third of the coordinates — norms (and int8
  *    quantization grids) are preserved, cosine neighborhoods across
  *    copies are decorrelated.
  *  - the remaining tables copy through unchanged (the scale set reads
  *    only documents/embeddings; the others exist so Tables.load binds).
  *
  * `run` times the scale set at any fixture dir with Bench's estimator
  * (best-of-N wall time, warm caches) and prints one JSON line per dir;
  * the sf0.1 vs sf1 ratio lands in BASELINE.md as the scaling factor.
  * Anything scaling clearly worse than ~linear-with-log factors gets a
  * named plan fix (VERDICT r8 #7).
  *
  * Usage:
  *   runMain graft.ScaleBench gen /root/testdata/sf0.1 /tmp/graft_sf1 10
  *   runMain graft.ScaleBench run /tmp/graft_sf1 [runs] [q1,q2,...]
  */
object ScaleBench {

  /** The gates worth a curve: every one the r8 VERDICT named plus the
    * rest of the sim_* family that claims a sub-quadratic scale path.
    * sim_topk_cosine (documented brute-force small-scale baseline) is
    * deliberately NOT here — it is quadratic by contract. */
  val scaleSet: Seq[String] = Seq(
    "d2_minhash_lsh", "d4_ngram_jaccard", "d7_neardup_clusters",
    "d9_decontaminate", "d10_semdedup", "d11_bloom_decontaminate",
    "t10_edit_distance", "t13_dup_spans", "pipe9_scrub_select_pack",
    "sim_funnel_topk", "sim_quantized_topk", "sim_ivf_topk")

  private val stride = 10L * 1000 * 1000

  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.warehouse.dir", "/tmp/graft_warehouse")
      .config("spark.sql.catalog.graft", "graft.plans.GraftCatalog")
      // write timestamps as INT64 MICROS (the real-Delta parquet shape;
      // Spark's legacy INT96 default carries NO footer statistics)
      .config("spark.sql.parquet.outputTimestampType", "TIMESTAMP_MICROS")
      .withExtensions(new graft.plans.GraftExtensions)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    args.toSeq match {
      case Seq("gen", src, out) => gen(spark, src, out, 10)
      case Seq("gen", src, out, f) => gen(spark, src, out, f.toInt)
      case Seq("run", dir) => run(spark, dir, 3, scaleSet)
      case Seq("run", dir, runs) => run(spark, dir, runs.toInt, scaleSet)
      case Seq("run", dir, runs, qs) =>
        run(spark, dir, runs.toInt, qs.split(",").map(_.trim).toSeq)
      case Seq("writecurve") => writeCurve(spark, Seq(100, 1000, 3000))
      case Seq("writecurve", ns) =>
        writeCurve(spark, ns.split(",").map(_.trim.toInt).toSeq)
      case other => sys.error(
        s"usage: gen <srcSfDir> <outDir> [factor] | run <sfDir> [runs] " +
          s"[q1,q2,...]; got $other")
    }
    spark.stop()
  }

  /** Per-copy letter substitution: vowels rotated by i%5 composed with
    * ten frequent consonants rotated by i/5 — 50 DISTINCT transforms.
    * Distinctness matters: an earlier vowel-only rotation had 5 images,
    * so copies i and i+5 were exact duplicates of each other — the
    * synthetic corpus grew dup-cliques with the factor and every
    * near-dup gate read quadratic when the operator was linear. Length
    * is preserved (translate is 1:1), so per-doc cost stays comparable
    * to the source corpus. */
  private def rot(s: String, k: Int): String = {
    val j = k % s.length
    s.substring(j) + s.substring(0, j)
  }
  private val vowels = "aeiou"
  private val consonants = "tnsrhldcmf"

  def gen(spark: SparkSession, src: String, out: String,
          factor: Int): Unit = {
    val fs = new org.apache.hadoop.fs.Path(out)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.mkdirs(new org.apache.hadoop.fs.Path(out))

    val docs = spark.read.parquet(s"$src/documents.parquet")
    val docCopies = (0 until factor).map { i =>
      require(factor <= 50, "only 50 distinct text transforms available")
      val text =
        if (i == 0) col("text")
        else translate(translate(col("text"), vowels, rot(vowels, i % 5)),
          consonants, rot(consonants, i / 5))
      docs.select((col("doc_id") + lit(i * stride)).as("doc_id"),
        text.as("text"), col("lang"), col("source"), col("n_chars"))
    }
    docCopies.reduce(_.unionAll(_))
      .repartition(32)
      .write.mode("overwrite").parquet(s"$out/documents.parquet")

    val embs = spark.read.parquet(s"$src/embeddings.parquet")
    // per-copy coordinate ROTATION: rot_i(v) preserves the norm (and
    // the int8 quantization grid) while decorrelating cosine
    // neighborhoods, and rotations by distinct i<dim are distinct —
    // a sign-flip mask with a short period would make copies i and
    // i+period exact duplicates and inflate every near-dup cell
    val embCopies = (0 until factor).map { i =>
      val vec =
        if (i == 0) col("embedding")
        else concat(slice(col("embedding"), i + 1, 64 - i),
          slice(col("embedding"), 1, i))
      embs.select((col("vec_id") + lit(i * stride)).as("vec_id"),
        vec.cast("array<float>").as("embedding"), col("label"))
    }
    embCopies.reduce(_.unionAll(_))
      .repartition(32)
      .write.mode("overwrite").parquet(s"$out/embeddings.parquet")

    // pass the small tables through so Tables.load resolves every name
    Tables.names.filterNot(n => n == "documents" || n == "embeddings")
      .foreach { n =>
        org.apache.hadoop.fs.FileUtil.copy(fs,
          new org.apache.hadoop.fs.Path(s"$src/$n.parquet"), fs,
          new org.apache.hadoop.fs.Path(s"$out/$n.parquet"),
          false, spark.sparkContext.hadoopConfiguration)
      }
    println(s"SCALEGEN done: $out factor=$factor docs=" +
      spark.read.parquet(s"$out/documents.parquet").count() +
      " embs=" + spark.read.parquet(s"$out/embeddings.parquet").count())
  }

  /** Write-path file-count curve (VERDICT r9 #7 / r10 #3): how commit
    * cost moves as the TABLE grows from ~100 to ~3000 files while the
    * DELTA stays fixed. The claim under test is "commit cost =
    * O(delta) + O(log-tail replay)", i.e. small appends and
    * partition-scoped DML/OPTIMIZE must NOT inherit the table's file
    * count, while checkpoint writes and the rowTracking enablement
    * backfill are O(live files) BY CONTRACT (manifest fold / explicit
    * whole-table re-add) and should read linear, never worse.
    *
    * Layout: ~10 files per partition with the PARTITION COUNT growing
    * with n, so the blast radius of the scoped ops (one partition) is
    * a CONSTANT ~10 files at every n — any growth in their timings is
    * pure table-size overhead, exactly the class the r10 unconditional
    * checkpoint hwm probe introduced (O(tail) full driver reads per
    * checkpoint on every table) and this curve exists to catch.
    *
    * Sequence per n (each op once — they mutate the table; three n
    * points make the curve): big build append → timed 1-file append →
    * DV-enable → timed partition-scoped DV DELETE → timed OPTIMIZE
    * WHERE that partition → timed checkpoint → timed post-checkpoint
    * 1-file append → timed rowTracking backfill → timed 1-file append
    * on the now-rowTracking table (prices the per-commit hwm probe +
    * id stamping at steady state). */
  def writeCurve(spark: SparkSession, sizes: Seq[Int]): Unit = {
    import graft.io.MiniDelta
    val rowsPerFile = 20
    def timed(f: => Any): Double = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }
    def fmt(v: Double) = f"$v%.3f"
    sizes.foreach { n =>
      val dir = s"/tmp/graft_scale_files_$n"
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(dir))
      val table = s"$dir/t"
      MiniDelta.invalidateSnapshot(table)
      val base = spark.range(n.toLong * rowsPerFile)
        .select(col("id").as("v"),
          (col("id") / rowsPerFile).cast("long").as("fid"))
        .withColumn("p", (col("fid") / 10).cast("long"))
        .repartition(n, col("fid")).drop("fid")
      val tBuild = timed(MiniDelta.append(spark, base, table, Seq("p"),
        statsCols = Seq("v")))
      val delta = spark.range(rowsPerFile.toLong)
        .select(col("id").as("v"), lit(0L).as("p")).repartition(1)
      val tAppend = timed(MiniDelta.append(spark, delta, table, Seq("p"),
        statsCols = Seq("v")))
      MiniDelta.setTableProperties(spark, table,
        Map("delta.enableDeletionVectors" -> "true"))
      val tDelete = timed(MiniDelta.delete(spark, table,
        col("p") === 0L && pmod(col("v"), lit(2)) === 0, Seq("p")))
      // REORG PURGE right after the scoped DV DELETE: its blast radius
      // is the ~10 masked files of partition 0 at EVERY n, so the
      // timing must stay flat as the table grows 100× — REORG cost
      // tracks DV-file count, never table size
      val tReorg = timed(MiniDelta.reorgPurge(spark, table, Seq("p")))
      val tOpt = timed(MiniDelta.compact(spark, table, Seq("p"),
        where = Seq(Map("p" -> "0"))))
      val v = MiniDelta.latestVersion(spark, table)
      val tCp = timed(MiniDelta.writeCheckpoint(spark, table, v))
      val tAppendPostCp = timed(MiniDelta.append(spark, delta, table,
        Seq("p"), statsCols = Seq("v")))
      val tBackfill = timed(MiniDelta.setTableProperties(spark, table,
        Map("delta.enableRowTracking" -> "true")))
      val tAppendRt = timed(MiniDelta.append(spark, delta, table,
        Seq("p"), statsCols = Seq("v")))
      // a checkpoint on the now-rowTracking table ALSO carries the
      // high-water mark (the probe the round-11 protocol gate scopes to
      // exactly these tables) — O(tail-since-checkpoint) on top of the
      // O(live files) manifest fold
      val tCpRt = timed(MiniDelta.writeCheckpoint(spark, table,
        MiniDelta.latestVersion(spark, table)))
      // SHALLOW CLONE at the table's largest: O(live files) streamed
      // commit (rowTracking ids preserved verbatim) — the per-file
      // cost (clone/n) must stay flat across the 100× span
      val tClone = timed(MiniDelta.cloneShallow(spark, table,
        s"$dir/fork"))
      // CDF DML at the table's largest (LAST in the op sequence, so
      // every earlier column stays comparable to the r11/r12 curves):
      // enabling the feed is a metadata commit, and a partition-scoped
      // DV DELETE on the CDF table must cost O(changed rows) — the cdc
      // files hold partition 0's masked rows, never the table
      val tCdfEnable = timed(MiniDelta.setTableProperties(spark, table,
        Map("delta.enableChangeDataFeed" -> "true")))
      val tDeleteCdf = timed(MiniDelta.delete(spark, table,
        col("p") === 0L && pmod(col("v"), lit(2)) === 1, Seq("p")))
      // keyed MERGE at the table's largest, with DV + rowTracking + CDF
      // all enabled (mergeWithDv + real cdc writes + the late-r13
      // schemaOverride plumbing in one op): the source's key range
      // pins the blast radius to partition 0's files at every n, so
      // stats pruning must keep the cost flat across the 100× span
      val mergeSrc = spark.range(10L)
        .select(col("id").as("v"), lit(0L).as("p")).repartition(1)
      val tMerge = timed(MiniDelta.merge(spark, table, mergeSrc,
        Seq("v"), Seq("p"), statsCols = Seq("v")))
      // GENERAL MERGE (r14 mergeClauses) at the table's largest: a
      // mixed source (matched keys 10..24 + unmatched negatives) drives
      // a conditional matched DELETE, a matched UPDATE, and a NOT
      // MATCHED INSERT in one commit — the clause machinery must add
      // nothing to the blast radius (the source's key range pins
      // discovery to the same first files of partition 0 at every n)
      val mcSrc = spark.range(15L)
        .select(when(col("id") < 5, col("id") - 100L)
          .otherwise(col("id") + 10L).as("v"), lit(0L).as("p"))
        .repartition(1)
      val tMergeClauses = timed(MiniDelta.mergeClauses(spark, table,
        mcSrc, Seq("v"),
        matched = Seq(
          MiniDelta.MergeMatchedClause(
            Some(pmod(col("`__src_v`"), lit(5)) === 0), None),
          MiniDelta.MergeMatchedClause(None,
            Some(Map("v" -> col("`__src_v`"))))),
        notMatched = Seq(MiniDelta.MergeInsertClause(None,
          Map("v" -> col("v"), "p" -> col("p")))),
        bySource = Nil, partitionBy = Seq("p"), statsCols = Seq("v")))
      // EVOLVING general MERGE (r16 WITH SCHEMA EVOLUTION) at the
      // table's largest: the same key-pinned blast radius PLUS one
      // appended column — the evolution must price as one metaData
      // line on top of the rewrite, never a table-scale cost, so the
      // point reads flat beside merge_clauses across the 100× span
      val evSrc = spark.range(5L)
        .select((col("id") + 30L).as("v"), lit(0L).as("p"),
          (col("id") * 7L).as("w")).repartition(1)
      val tMergeEvolve = timed(MiniDelta.mergeClauses(spark, table,
        evSrc, Seq("v"),
        matched = Seq(MiniDelta.MergeMatchedClause(None,
          Some(Map("w" -> col("`__src_w`"))))),
        notMatched = Seq(MiniDelta.MergeInsertClause(None,
          Map("v" -> col("v"), "p" -> col("p"), "w" -> col("w")))),
        bySource = Nil, partitionBy = Seq("p"), statsCols = Seq("v"),
        evolveSchema = true))
      // vacuum candidate LISTING at the table's largest (r15): the
      // dead files of every op above are on disk, and discovery is a
      // first-level driver listing + per-directory recursive walks
      // fanned out over the cluster past the threshold — the last
      // serial O(table) maintenance stage, removed. DRY RUN so the
      // curve's table is undisturbed; the distributed flag pins that
      // the n=10000 point (1000 partition dirs) actually took the
      // fan-out.
      val lBefore = MiniDelta.distributedListings.get()
      val tVacList = timed(MiniDelta.vacuum(spark, table, retainMs = 0L,
        dryRun = true))
      val vacListDistributed =
        MiniDelta.distributedListings.get() - lBefore
      // VACUUM LITE candidate discovery (r15): the same dry run with
      // candidates derived from the log's tombstones — ZERO directory
      // listing, so the point should read flat-to-log-size where
      // vacuum_list grows with partition-directory count. Same table,
      // same dead files, same report (modulo debris, of which the
      // curve plants none).
      val tVacLite = timed(MiniDelta.vacuum(spark, table, retainMs = 0L,
        dryRun = true, lite = true))
      // NESTED evolution on a COLUMN-MAPPED table at the table's
      // largest (r17, LAST on this table so every earlier column stays
      // comparable to the r15/r16 curves): upgrade the curve table to
      // name-mapping (a metadata commit re-stating the schema —
      // O(columns), never O(files)), append a NEW struct column, then
      // grow a nested field inside it. Both evolving appends write ONE
      // small file + ONE metaData action carrying the deep
      // physicalName/id assignment — all three points must read flat
      // across the 100× span.
      val tMapUpgrade = timed(MiniDelta.setTableProperties(spark, table,
        Map("delta.columnMapping.mode" -> "name")))
      val evs1 = spark.range(3L)
        .select((col("id") + 2000000L).as("v"), lit(0L).as("p"),
          struct(col("id").as("a")).as("meta")).repartition(1)
      val tStructEvolveMapped = timed(MiniDelta.append(spark, evs1,
        table, Seq("p"), statsCols = Seq("v")))
      val evs2 = spark.range(3L)
        .select((col("id") + 3000000L).as("v"), lit(0L).as("p"),
          struct(col("id").as("a"), lit("x").as("b")).as("meta"))
        .repartition(1)
      val tNestedEvolveMapped = timed(MiniDelta.append(spark, evs2,
        table, Seq("p"), statsCols = Seq("v")))
      // EVOLVING merge that WIDENS a nested field of the (now mapped)
      // curve table (r18 — the last evolution-matrix seam): meta.c
      // joins as INT via a small evolving append, then a WITH SCHEMA
      // EVOLUTION merge whose source carries meta.c as LONG — the
      // widening is one metaData action (+ the typeWidening protocol
      // upgrade) on top of a key-pinned insert, so the point must read
      // flat across the 100× span like its evolution siblings.
      val evs3 = spark.range(3L)
        .select((col("id") + 4000000L).as("v"), lit(0L).as("p"),
          struct(col("id").as("a"), lit("x").as("b"),
            lit(1).cast("int").as("c")).as("meta")).repartition(1)
      MiniDelta.append(spark, evs3, table, Seq("p"),
        statsCols = Seq("v"))
      val mwSrc = spark.range(3L)
        .select((col("id") + 5000000L).as("v"), lit(0L).as("p"),
          struct(col("id").as("a"), lit("y").as("b"),
            (col("id") + 3000000000L).as("c")).as("meta"))
        .repartition(1)
      val tMergeWidenMapped = timed(MiniDelta.mergeClauses(spark, table,
        mwSrc, Seq("v"),
        matched = Seq(MiniDelta.MergeMatchedClause(None,
          Some(Map("meta" -> col("`__src_meta`"))))),
        notMatched = Seq(MiniDelta.MergeInsertClause(None,
          Map("v" -> col("v"), "p" -> col("p"), "meta" -> col("meta")))),
        bySource = Nil, partitionBy = Seq("p"), statsCols = Seq("v"),
        evolveSchema = true))
      // REPLACE COLUMNS (r19): one metadata commit re-declaring the
      // top-level list — a drop (the scratch column added just before,
      // untimed) plus an add (fresh physical name) plus the full
      // survivor metadata carry. Cost is O(schema) by construction;
      // the curve point must read flat across the 100× file span.
      MiniDelta.addColumns(spark, table, Seq(
        org.apache.spark.sql.types.StructField("rc_tmp",
          org.apache.spark.sql.types.StringType)))
      MiniDelta.invalidateSnapshot(table)
      val rcBase = MiniDelta.latestSchema(spark, table).get.fields
        .filterNot(_.name == "rc_tmp").toSeq
      val tReplaceColumns = timed(MiniDelta.replaceColumns(spark, table,
        rcBase :+ org.apache.spark.sql.types.StructField("rc_tag",
          org.apache.spark.sql.types.StringType)))
      MiniDelta.invalidateSnapshot(table)
      // generated-partitioned twin (r14 GeneratedPruning): n files over
      // n/10 day partitions of day = CAST(ts AS DATE), and a DELETE
      // bounded on ts ONLY — no stats on ts, so discovery scopes
      // exclusively through the derived day bound. The manifest
      // counter must read ONE day's files (~10) at every n; the delete
      // cost is blast-radius, never table.
      val tg = s"$dir/g"
      MiniDelta.invalidateSnapshot(tg)
      val day0 = 1700092800L // 2023-11-16 00:00:00 UTC (midnight)
      MiniDelta.createTable(spark, tg,
        org.apache.spark.sql.types.StructType(Seq(
          org.apache.spark.sql.types.StructField("v",
            org.apache.spark.sql.types.LongType),
          org.apache.spark.sql.types.StructField("ts",
            org.apache.spark.sql.types.TimestampType),
          org.apache.spark.sql.types.StructField("day",
            org.apache.spark.sql.types.DateType, nullable = true,
            new org.apache.spark.sql.types.MetadataBuilder().putString(
              "delta.generationExpression", "CAST(ts AS DATE)")
              .build()))),
        partitionBy = Seq("day"),
        // stats OFF so the curve isolates the DERIVATION: with the
        // r14-defaulted min/max stats on ts, the plain range check
        // would prune too and the point would prove nothing
        properties = Map("delta.dataSkippingNumIndexedCols" -> "0"))
      val gbase = spark.range(n.toLong * rowsPerFile)
        .select(col("id").as("v"),
          (col("id") / rowsPerFile).cast("long").as("fid"))
        .withColumn("ts", timestamp_seconds(lit(day0) +
          (col("fid") / 10).cast("long") * 86400L +
          pmod(col("v"), lit(1200))))
        .repartition(n, col("fid")).drop("fid")
      val tGenBuild = timed(MiniDelta.append(spark, gbase, tg,
        Seq("day")))
      val mBefore = MiniDelta.dmlManifestRows.get()
      val tGenDelete = timed(MiniDelta.delete(spark, tg,
        col("ts") <= timestamp_seconds(lit(day0 + 43200L)), Seq("day")))
      val genManifest = MiniDelta.dmlManifestRows.get() - mBefore
      println("SCALEWRITE {" +
        s""""n_files":$n,"build":${fmt(tBuild)},""" +
        s""""append":${fmt(tAppend)},"delete_dv":${fmt(tDelete)},""" +
        s""""reorg_purge":${fmt(tReorg)},""" +
        s""""optimize_where":${fmt(tOpt)},"checkpoint":${fmt(tCp)},""" +
        s""""append_post_cp":${fmt(tAppendPostCp)},""" +
        s""""rt_backfill":${fmt(tBackfill)},""" +
        s""""append_rt":${fmt(tAppendRt)},""" +
        s""""checkpoint_rt":${fmt(tCpRt)},""" +
        s""""clone":${fmt(tClone)},""" +
        s""""cdf_enable":${fmt(tCdfEnable)},""" +
        s""""delete_cdf":${fmt(tDeleteCdf)},""" +
        s""""merge_scoped":${fmt(tMerge)},""" +
        s""""merge_clauses":${fmt(tMergeClauses)},""" +
        s""""merge_clauses_evolving":${fmt(tMergeEvolve)},""" +
        s""""map_upgrade":${fmt(tMapUpgrade)},""" +
        s""""struct_evolve_mapped":${fmt(tStructEvolveMapped)},""" +
        s""""nested_evolve_mapped":${fmt(tNestedEvolveMapped)},""" +
        s""""merge_widen_mapped":${fmt(tMergeWidenMapped)},""" +
        s""""replace_columns":${fmt(tReplaceColumns)},""" +
        s""""vacuum_list":${fmt(tVacList)},""" +
        s""""vacuum_list_distributed":$vacListDistributed,""" +
        s""""vacuum_lite":${fmt(tVacLite)},""" +
        s""""genprune_build":${fmt(tGenBuild)},""" +
        s""""genprune_delete":${fmt(tGenDelete)},""" +
        s""""genprune_manifest":$genManifest}""")
    }
  }

  def run(spark: SparkSession, sfDir: String, runs: Int,
          queries: Seq[String]): Unit = {
    // same warm-cache posture as Bench
    graft.catalog.GraftConfig(
      snapshotCache = graft.catalog.CacheConfig(20, 3600000L),
      fileListCache = graft.catalog.CacheConfig(100, 3600000L),
      authCache = graft.catalog.CacheConfig(100, 3600000L)).applyCaches()
    try { SparkEntry.entry(spark).count() } catch { case _: Throwable => () }
    val results = queries.flatMap { name =>
      SparkEntry.queries.get(name).map { fn =>
        val best = (1 to runs).map { _ =>
          val t0 = System.nanoTime()
          try { fn(spark, sfDir).count() }
          catch { case e: Throwable =>
            System.err.println(s"[scalebench] $name failed: $e"); -1L }
          (System.nanoTime() - t0) / 1e9
        }.min
        name -> best
      }
    }
    def fmt(v: Double) = f"$v%.3f"
    println("SCALEBENCH " + results
      .map { case (k, v) => s"\"$k\":${fmt(v)}" }
      .mkString("{", ",", s"""},"sf":"$sfDir","runs":$runs"""))
  }
}
