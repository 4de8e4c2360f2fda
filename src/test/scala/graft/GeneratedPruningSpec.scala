package graft

import java.nio.file.Files
import java.sql.Timestamp

import org.apache.spark.sql.catalyst.expressions.Literal
import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

import graft.io.MiniDelta
import graft.plans.{GeneratedPruning, GraftSqlTables}

/** Generated-column partition pruning ([[GeneratedPruning]] +
  * [[graft.plans.GeneratedPartitionPruneRule]]): a bound on the BASE
  * column of a `day = CAST(ts AS DATE)`-style generated PARTITION
  * column must prune (a) DML blast-radius discovery and (b) the read
  * scan — Delta's OptimizeGeneratedColumn contract. The reference has
  * no generated columns at all; the semantics here follow the Delta
  * protocol's generationExpression + partitioning composition. */
class GeneratedPruningSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def freshTable(): String =
    Files.createTempDirectory("genprune").toString + "/t"

  private def genMeta(e: String) = new MetadataBuilder()
    .putString("delta.generationExpression", e).build()

  private def ts(s: String) = Timestamp.valueOf(s)

  /** id, ts, v rows spanning three days × two files each. */
  private def threeDayTable(): String = {
    val t = freshTable()
    MiniDelta.createTable(spark, t, StructType(Seq(
      StructField("id", LongType),
      StructField("ts", TimestampType),
      StructField("v", LongType),
      StructField("day", DateType, nullable = true,
        genMeta("CAST(ts AS DATE)")))), partitionBy = Seq("day"),
      // stats OFF: these specs must prove the DERIVATION prunes, not
      // the (r14-defaulted) min/max stats on ts
      properties = Map("delta.dataSkippingNumIndexedCols" -> "0"))
    def day(d: Int, base: Long) = Seq(
      (base, ts(f"2024-03-0$d%d 01:00:00"), base * 10),
      (base + 1, ts(f"2024-03-0$d%d 23:00:00"), base * 10 + 10))
    for (batch <- 0 to 1) // two appends → ≥2 files per day directory
      MiniDelta.append(spark,
        (day(1, 100 + batch * 10) ++ day(2, 200 + batch * 10) ++
          day(3, 300 + batch * 10)).toDF("id", "ts", "v"), t, Seq("day"))
    MiniDelta.invalidateSnapshot(t)
    t
  }

  /** Collect FileSourceScanExec leaves, descending through AQE wrappers
    * (plain collect stops at AdaptiveSparkPlanExec / query stages). */
  private def scansOf(p: org.apache.spark.sql.execution.SparkPlan)
      : Seq[FileSourceScanExec] = {
    import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
    val self = p match { case f: FileSourceScanExec => Seq(f); case _ => Nil }
    val nested = p match {
      case a: AdaptiveSparkPlanExec => Seq(a.executedPlan)
      case q: QueryStageExec => Seq(q.plan)
      case _ => Nil
    }
    self ++ (p.children ++ nested).flatMap(scansOf)
  }

  private def filesOfDay(t: String, d: String): Long =
    MiniDelta.filesForFilters(MiniDelta.snapshotFiles(spark, t),
      Seq(Map("day" -> d))).count()

  test("recognizer: shapes, monotonicity, bounds") {
    val schema = StructType(Seq(
      StructField("ts", TimestampType),
      StructField("s", StringType),
      StructField("day", DateType, nullable = true, genMeta("CAST(ts AS DATE)")),
      StructField("yr", IntegerType, nullable = true, genMeta("year(ts)")),
      StructField("mo", IntegerType, nullable = true, genMeta("month(ts)")),
      StructField("ym", StringType, nullable = true, genMeta("date_format(ts, 'yyyy-MM')")),
      StructField("pre", StringType, nullable = true, genMeta("substring(s, 1, 4)")),
      StructField("opaque", StringType, nullable = true, genMeta("concat(s, 'x')")),
      StructField("badfmt", DateType, nullable = true, genMeta("trunc(ts, 'NOPE')"))))
    val parts = Seq("day", "yr", "mo", "ym", "pre", "opaque", "badfmt")
    val ds = GeneratedPruning.derivationsOf(schema, parts)
    val byGen = ds.map(d => d.genCol -> d).toMap
    assert(byGen.keySet == Set("day", "yr", "mo", "ym", "pre"),
      "unrecognized and probe-failing shapes must derive nothing")
    assert(byGen("day").monotonic && byGen("yr").monotonic &&
      byGen("ym").monotonic && byGen("pre").monotonic)
    assert(!byGen("mo").monotonic, "month alone is equality-only")
    val v = Literal(ts("2024-03-02 13:45:00"))
    assert(byGen("day").bound(v).map(_.toString).contains("2024-03-02"))
    assert(byGen("yr").bound(v).contains(Literal(2024)))
    assert(byGen("mo").bound(v).contains(Literal(3)))
    assert(byGen("ym").bound(v).map(_.toString).contains("2024-03"))
    assert(byGen("pre").bound(Literal("hello world"))
      .map(_.toString).contains("hell"))
    // a string bound coerces through the base type first
    assert(byGen("day").bound(Literal("2024-03-02 13:45:00"))
      .map(_.toString).contains("2024-03-02"))
  }

  test("DML discovery: a ts range collects only the implied days") {
    val t = threeDayTable()
    val d1 = filesOfDay(t, "2024-03-01")
    val d2 = filesOfDay(t, "2024-03-02")
    val total = MiniDelta.snapshotFiles(spark, t).count()
    assert(d1 + d2 < total)
    // ts <= a day-2 instant ⇒ day <= 2024-03-02: only two days'
    // manifests collect. (A strict `< 03-03 00:00:00` would derive the
    // conservative day <= 03-03 — the boundary instant itself maps to
    // day 3 — and keep day 3's files; Delta derives the same bound.)
    val before = MiniDelta.dmlManifestRows.get()
    MiniDelta.delete(spark, t,
      col("ts") <= lit(ts("2024-03-02 23:00:00")), Seq("day"))
    assert(MiniDelta.dmlManifestRows.get() - before == d1 + d2,
      s"collected ${MiniDelta.dmlManifestRows.get() - before} manifest " +
        s"rows, expected the ${d1 + d2} files of the implied partitions")
    MiniDelta.invalidateSnapshot(t)
    assert(MiniDelta.readFiltered(spark, t, Seq.empty)
      .select("id").as[Long].collect().toSet ==
      Set(300L, 301L, 310L, 311L))
  }

  test("DML discovery: equality bound and IN list") {
    val t = threeDayTable()
    val d2 = filesOfDay(t, "2024-03-02")
    val before = MiniDelta.dmlManifestRows.get()
    MiniDelta.update(spark, t, col("ts") === lit(ts("2024-03-02 01:00:00")),
      Map("v" -> lit(-1L)), Seq("day"))
    assert(MiniDelta.dmlManifestRows.get() - before == d2)
    MiniDelta.invalidateSnapshot(t)
    assert(MiniDelta.readFiltered(spark, t, Seq.empty)
      .where(col("v") === -1L).count() == 2) // both batches' 01:00 row
    // IN over two days skips the third
    val d1 = filesOfDay(t, "2024-03-01")
    val before2 = MiniDelta.dmlManifestRows.get()
    MiniDelta.delete(spark, t, col("ts").isin(
      ts("2024-03-01 01:00:00"), ts("2024-03-02 23:00:00")), Seq("day"))
    assert(MiniDelta.dmlManifestRows.get() - before2 == d1 + d2)
  }

  test("DML discovery: an OR with an opaque side stays sound") {
    val t = threeDayTable()
    // (ts-range OR v-equality): stats are disabled on this table, so
    // the v side is opaque and discovery must keep every file — and
    // the result must be exact
    MiniDelta.delete(spark, t,
      col("ts") < lit(ts("2024-03-02 00:00:00")) || col("v") === 3010L,
      Seq("day"))
    MiniDelta.invalidateSnapshot(t)
    val ids = MiniDelta.readFiltered(spark, t, Seq.empty)
      .select("id").as[Long].collect().toSet
    assert(!ids.contains(301L), "v=3010 row (day 3) must be deleted")
    assert(ids == Set(200L, 201L, 210L, 211L, 300L, 310L, 311L))
  }

  test("DML discovery: constant-EXPRESSION bounds fold to literals") {
    val t = threeDayTable()
    val d1 = filesOfDay(t, "2024-03-01")
    val d2 = filesOfDay(t, "2024-03-02")
    // the bound is a FUNCTION of constants, not a literal — without
    // constant folding the whole comparison is opaque and every file
    // collects (generated or not; stats are off on this table)
    val bound = timestamp_seconds(lit(
      ts("2024-03-02 23:00:00").getTime / 1000L))
    val before = MiniDelta.dmlManifestRows.get()
    MiniDelta.delete(spark, t, col("ts") <= bound, Seq("day"))
    assert(MiniDelta.dmlManifestRows.get() - before == d1 + d2,
      s"collected ${MiniDelta.dmlManifestRows.get() - before}, " +
        s"expected $d1 + $d2")
    MiniDelta.invalidateSnapshot(t)
    assert(MiniDelta.readFiltered(spark, t, Seq.empty)
      .select("id").as[Long].collect().toSet ==
      Set(300L, 301L, 310L, 311L))
    // a nondeterministic bound stays opaque: correctness over pruning
    MiniDelta.delete(spark, t,
      col("v") <= rand() - lit(2.0), Seq("day")) // never true
    MiniDelta.invalidateSnapshot(t)
    assert(MiniDelta.readFiltered(spark, t, Seq.empty).count() == 4)
  }

  test("MERGE keyed discovery derives the partition range") {
    val t = threeDayTable()
    val d2 = filesOfDay(t, "2024-03-02")
    val total = MiniDelta.snapshotFiles(spark, t).count()
    assert(d2 < total)
    // the source's ts [min, max] implies day ∈ [03-02, 03-02]; stats
    // are disabled on this table, so only the derivation can scope
    // the manifest
    val src = Seq(ts("2024-03-02 01:00:00"), ts("2024-03-02 23:00:00"))
      .toDF("ts")
    val before = MiniDelta.dmlManifestRows.get()
    MiniDelta.mergeDelete(spark, t, src, Seq("ts"), Seq("day"))
    assert(MiniDelta.dmlManifestRows.get() - before == d2,
      s"collected ${MiniDelta.dmlManifestRows.get() - before} manifest " +
        s"rows, expected day 2's $d2 (of $total)")
    MiniDelta.invalidateSnapshot(t)
    assert(MiniDelta.readFiltered(spark, t, Seq.empty)
      .select("id").as[Long].collect().toSet ==
      Set(100L, 101L, 110L, 111L, 300L, 301L, 310L, 311L))
  }

  test("read-side rule: WHERE on ts prunes the scan to the implied days") {
    val t = threeDayTable()
    val total = MiniDelta.snapshotFiles(spark, t).count()
    val d3 = filesOfDay(t, "2024-03-03")
    val df = MiniDelta.readFiltered(spark, t, Seq.empty)
      .where(col("ts") >= lit(ts("2024-03-03 00:00:00")))
    // execute THIS df (not a derived one): the scan metrics below read
    // from this queryExecution's own run
    assert(df.collect().map(_.getLong(0)).toSet ==
      Set(300L, 301L, 310L, 311L))
    val scans = scansOf(df.queryExecution.executedPlan)
    assert(scans.nonEmpty)
    assert(scans.exists(_.partitionFilters.nonEmpty),
      "the derived day-bound must reach the scan as a partition filter")
    val scanned = scans.map(_.metrics("numFiles").value).sum
    assert(scanned == d3,
      s"scanned $scanned files, expected only day 3's $d3 (of $total)")
  }

  test("read-side rule: SQL front door, idempotent re-analysis") {
    val t = threeDayTable()
    GraftSqlTables.unregister("genprune_sql")
    GraftSqlTables.register("genprune_sql", t)
    val df = spark.sql("""
      SELECT sum(v) AS sv FROM graft.genprune_sql
      WHERE ts BETWEEN TIMESTAMP '2024-03-02 00:00:00'
                   AND TIMESTAMP '2024-03-02 23:59:59'""")
    assert(df.collect()(0).getLong(0) == 2000L + 2010L + 2100L + 2110L)
    val scans = scansOf(df.queryExecution.executedPlan)
    assert(scans.exists(_.partitionFilters.nonEmpty))
    assert(scans.map(_.metrics("numFiles").value).sum ==
      filesOfDay(t, "2024-03-02"))
    // re-applying the rule to an already-derived plan adds nothing
    val once = graft.plans.GeneratedPartitionPruneRule(
      df.queryExecution.analyzed)
    val twice = graft.plans.GeneratedPartitionPruneRule(once)
    assert(once == twice, "the rule must be idempotent")
  }

  test("null bounds: IS NULL / IS NOT NULL derive partition null-ness") {
    val t = freshTable()
    MiniDelta.createTable(spark, t, StructType(Seq(
      StructField("id", LongType),
      StructField("ts", TimestampType, nullable = true),
      StructField("day", DateType, nullable = true,
        genMeta("CAST(ts AS DATE)")))), partitionBy = Seq("day"),
      properties = Map("delta.dataSkippingNumIndexedCols" -> "0"))
    MiniDelta.append(spark, Seq(
      (1L, ts("2024-03-01 01:00:00")), (2L, null.asInstanceOf[Timestamp]),
      (3L, ts("2024-03-02 01:00:00")))
      .toDF("id", "ts"), t, Seq("day"))
    MiniDelta.invalidateSnapshot(t)
    val nullFiles = MiniDelta.filesForFilters(
      MiniDelta.snapshotFiles(spark, t), Seq.empty)
      .where(element_at(col("partitionValues"), "day") ===
        "__HIVE_DEFAULT_PARTITION__").count()
    val before = MiniDelta.dmlManifestRows.get()
    MiniDelta.delete(spark, t, col("ts").isNull, Seq("day"))
    assert(MiniDelta.dmlManifestRows.get() - before == nullFiles,
      "IS NULL must collect only the null-partition files")
    MiniDelta.invalidateSnapshot(t)
    assert(MiniDelta.readFiltered(spark, t, Seq.empty)
      .select("id").as[Long].collect().toSet == Set(1L, 3L))
  }

  test("self-join: the derived bound binds to the FILTERED side only") {
    // name-only pairing (the round-14 finding) let a predicate on b.ts
    // derive a day-bound on a.day — collectFirst picked the left
    // side's attribute — silently dropping every pair whose a-row lies
    // outside b's range. The inequality join makes the misbinding
    // observable: pairs (a, b) with b in day 3 must keep a-rows from
    // ALL days.
    val t = threeDayTable()
    val total = MiniDelta.snapshotFiles(spark, t).count()
    val d3 = filesOfDay(t, "2024-03-03")
    val a = MiniDelta.readFiltered(spark, t, Seq.empty)
    val b = MiniDelta.readFiltered(spark, t, Seq.empty)
    val j = a.as("a").join(b.as("b"), col("a.id") =!= col("b.id"))
      .where(col("b.ts") >= lit(ts("2024-03-03 00:00:00")))
      .select(col("a.id").as("aid"), col("b.id").as("bid"))
    val rows = j.collect()
    // 4 b-rows in day 3 × (12 a-rows minus the equal id) = 44 pairs
    assert(rows.length == 44,
      s"got ${rows.length} pairs — a bound mis-anchored to a.day " +
        "would drop every pair with an early a-row")
    assert(rows.map(_.getLong(0)).toSet.size == 12,
      "a-side rows from every day must survive")
    // and the bound DID anchor to b's scan: one side pruned to day 3,
    // the other read the full table
    val scanned = scansOf(j.queryExecution.executedPlan)
      .map(_.metrics("numFiles").value).sum
    assert(scanned == total + d3,
      s"scanned $scanned files, expected full a-side $total + " +
        s"pruned b-side $d3")
  }

  test("recomputed alias named like the base column derives nothing") {
    // SELECT day, ts + INTERVAL 10 DAYS AS ts ... WHERE ts >= X: the
    // filter's `ts` is the ALIAS (fresh exprId), so no day-bound is
    // implied — name-only pairing derived day >= g(X) and pruned every
    // partition (the shifted bound lies past all real days)
    val t = threeDayTable()
    val df = MiniDelta.readFiltered(spark, t, Seq.empty)
      .select(col("id"), col("day"),
        (col("ts") + expr("INTERVAL 10 DAYS")).as("ts"))
      .where(col("ts") >= lit(ts("2024-03-12 00:00:00")))
    assert(df.select("id").as[Long].collect().toSet ==
      Set(200L, 201L, 210L, 211L, 300L, 301L, 310L, 311L),
      "day-2 and day-3 rows qualify under the SHIFTED ts — a " +
        "mis-derived bound on the real day column drops them all")
  }

  test("equality-only shapes never derive range bounds") {
    val t = freshTable()
    MiniDelta.createTable(spark, t, StructType(Seq(
      StructField("id", LongType),
      StructField("ts", TimestampType),
      StructField("mo", IntegerType, nullable = true,
        genMeta("month(ts)")))), partitionBy = Seq("mo"),
      properties = Map("delta.dataSkippingNumIndexedCols" -> "0"))
    MiniDelta.append(spark, Seq(
      (1L, ts("2024-01-15 00:00:00")), (2L, ts("2024-02-15 00:00:00")),
      (3L, ts("2024-03-15 00:00:00")), (4L, ts("2023-12-15 00:00:00")))
      .toDF("id", "ts"), t, Seq("mo"))
    MiniDelta.invalidateSnapshot(t)
    // ts >= 2024-02 must NOT prune on month (12 > 2 but 2023-12 < bound):
    // the non-monotonic shape derives nothing, so every row is judged by
    // the exact predicate — correctness over pruning
    MiniDelta.delete(spark, t,
      col("ts") >= lit(ts("2024-02-01 00:00:00")), Seq("mo"))
    MiniDelta.invalidateSnapshot(t)
    assert(MiniDelta.readFiltered(spark, t, Seq.empty)
      .select("id").as[Long].collect().toSet == Set(1L, 4L),
      "the December 2023 row (mo=12) must survive")
    // equality DOES derive: ts = x ⇒ mo = month(x)
    val d1 = MiniDelta.filesForFilters(MiniDelta.snapshotFiles(spark, t),
      Seq(Map("mo" -> "1"))).count()
    val before = MiniDelta.dmlManifestRows.get()
    MiniDelta.delete(spark, t,
      col("ts") === lit(ts("2024-01-15 00:00:00")), Seq("mo"))
    assert(MiniDelta.dmlManifestRows.get() - before == d1)
  }
}
