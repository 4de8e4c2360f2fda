package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.io.MiniDelta
import graft.plans.GraftSqlTables

/** Delta 3.3's `VACUUM ... LITE`: candidates derived from the log's
  * remove tombstones with ZERO directory listing — the O(retained
  * removes) discovery that replaces the O(table files) walk on
  * 10⁷-object tables. Pins the three contract edges: untracked debris
  * is invisible to LITE (a FULL vacuum's job), already-deleted
  * tombstones are screened by the delete's own return, and a shallow
  * clone's external (absolute-path) tombstones never reach outside
  * the clone's root. */
class VacuumLiteSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def freshTable(): String =
    Files.createTempDirectory("vaclite").toString + "/t"

  private def sample(year: String, n: Int) =
    (1 to n).map(i => (i.toLong, year, s"v$i")).toDF("id", "year", "payload")

  test("LITE deletes exactly the tombstoned files; debris waits for FULL") {
    val t = freshTable()
    MiniDelta.append(spark, sample("2023", 3), t, Seq("year"))
    MiniDelta.append(spark, sample("2024", 2), t, Seq("year"))
    MiniDelta.compact(spark, t, Seq("year"))
    // untracked debris: no remove action ever names it, so LITE (log
    // candidates only) must skip it and FULL (listing + mtime
    // fallback) must collect it
    val debris = new java.io.File(s"$t/year=2023/debris.parquet")
    java.nio.file.Files.write(debris.toPath, Array[Byte](1, 2, 3))
    val before = MiniDelta.readFiltered(spark, t, Seq.empty)
      .orderBy("id", "year").collect().map(_.toSeq).toSeq
    // dry run first: reports the tombstoned candidates without deleting
    val dry = MiniDelta.vacuum(spark, t, dryRun = true, lite = true)
    assert(dry.nonEmpty && !dry.exists(_.contains("debris")))
    val deleted = MiniDelta.vacuum(spark, t, lite = true)
    assert(deleted.sorted == dry.sorted)
    assert(debris.exists, "LITE must never touch untracked debris")
    val after = MiniDelta.readFiltered(spark, t, Seq.empty)
      .orderBy("id", "year").collect().map(_.toSeq).toSeq
    assert(after == before)
    // idempotent: the tombstones persist in the log, but the existence
    // screen (delete's own boolean) keeps the second run empty
    assert(MiniDelta.vacuum(spark, t, lite = true).isEmpty)
    assert(MiniDelta.vacuum(spark, t, dryRun = true, lite = true).isEmpty)
    // FULL afterwards collects the debris via the mtime fallback
    val full = MiniDelta.vacuum(spark, t)
    assert(full.exists(_.contains("debris")) && !debris.exists)
  }

  test("LITE honors the retention horizon on tombstone timestamps") {
    val t = freshTable()
    MiniDelta.append(spark, sample("2023", 3), t, Seq("year"))
    MiniDelta.compact(spark, t, Seq("year"))
    // fresh tombstones sit inside a 1h horizon
    assert(MiniDelta.vacuum(spark, t, retainMs = 3600 * 1000L,
      lite = true).isEmpty)
    // pushing 'now' past the horizon ages them out
    val future = System.currentTimeMillis() + 2 * 3600 * 1000L
    assert(MiniDelta.vacuum(spark, t, retainMs = 3600 * 1000L,
      lite = true, nowMs = () => future).nonEmpty)
  }

  test("LITE on a shallow clone never reaches the source's files") {
    val src = freshTable()
    MiniDelta.append(spark, sample("2023", 3), src, Seq.empty)
    val fork = freshTable()
    MiniDelta.cloneShallow(spark, src, fork)
    // COW DML on the clone tombstones the SOURCE's absolute path
    MiniDelta.delete(spark, fork, col("id") === 1L, Seq.empty)
    MiniDelta.invalidateSnapshot(fork)
    val deleted = MiniDelta.vacuum(spark, fork, lite = true)
    assert(deleted.isEmpty,
      s"LITE followed an external tombstone: $deleted")
    // the source is untouched and fully readable
    MiniDelta.invalidateSnapshot(src)
    assert(MiniDelta.readFiltered(spark, src, Seq.empty).count() == 3)
  }

  test("property: LITE-then-FULL deletes exactly what FULL alone would") {
    // over randomized op sequences (appends, DML, OPTIMIZE, DV mode),
    // running LITE first must never change the total collected set or
    // the surviving data — LITE is a prefix of FULL's work, not a
    // different answer
    for (seed <- 1 to 4) {
      val rnd = new scala.util.Random(seed)
      val base = Files.createTempDirectory(s"vlprop$seed").toString
      val t = s"$base/t"
      MiniDelta.append(spark, sample("2023", 4), t, Seq("year"))
      if (rnd.nextBoolean())
        MiniDelta.setTableProperties(spark, t,
          Map("delta.enableDeletionVectors" -> "true"))
      for (_ <- 1 to (2 + rnd.nextInt(3))) rnd.nextInt(4) match {
        case 0 => MiniDelta.append(spark,
          sample((2020 + rnd.nextInt(6)).toString, 1 + rnd.nextInt(3)),
          t, Seq("year"))
        case 1 => MiniDelta.delete(spark, t,
          col("id") === (1L + rnd.nextInt(4)), Seq("year"))
        case 2 => MiniDelta.compact(spark, t, Seq("year"))
        case 3 => MiniDelta.update(spark, t,
          col("id") === (1L + rnd.nextInt(4)),
          Map("payload" -> lit(s"u$seed")), Seq("year"))
      }
      MiniDelta.invalidateSnapshot(t)
      val expect = MiniDelta.readFiltered(spark, t, Seq.empty)
        .orderBy("id", "year").collect().map(_.toSeq).toSeq
      // twin copy: B runs FULL alone, A runs LITE then FULL
      val t2 = s"$base/u"
      org.apache.commons.io.FileUtils.copyDirectory(
        new java.io.File(t), new java.io.File(t2))
      MiniDelta.invalidateSnapshot(t2)
      val a = MiniDelta.vacuum(spark, t, lite = true) ++
        MiniDelta.vacuum(spark, t)
      val b = MiniDelta.vacuum(spark, t2)
      assert(a.sorted == b.sorted, s"seed $seed: $a vs $b")
      MiniDelta.invalidateSnapshot(t)
      val after = MiniDelta.readFiltered(spark, t, Seq.empty)
        .orderBy("id", "year").collect().map(_.toSeq).toSeq
      assert(after == expect, s"seed $seed lost rows")
    }
  }

  test("VACUUM ... LITE SQL verb: dry run reports, real run deletes") {
    val t = freshTable()
    MiniDelta.append(spark, sample("2023", 3), t, Seq("year"))
    MiniDelta.compact(spark, t, Seq("year"))
    GraftSqlTables.register("spec_vlite", t, readOnly = false)
    try {
      spark.conf.set(
        "spark.graft.vacuum.retentionDurationCheck.enabled", "false")
      val dry = spark.sql(
        "VACUUM graft.spec_vlite LITE RETAIN 0 HOURS DRY RUN")
        .collect().map(_.getString(0)).toSeq
      assert(dry.nonEmpty)
      val n = spark.sql("VACUUM graft.spec_vlite LITE RETAIN 0 HOURS")
        .head().getLong(0)
      assert(n == dry.size)
      assert(spark.sql("VACUUM graft.spec_vlite LITE RETAIN 0 HOURS")
        .head().getLong(0) == 0L)
      // FULL stays the spelled-out default
      assert(spark.sql("VACUUM graft.spec_vlite FULL RETAIN 0 HOURS")
        .head().getLong(0) == 0L)
    } finally {
      spark.conf.unset(
        "spark.graft.vacuum.retentionDurationCheck.enabled")
      GraftSqlTables.clear()
    }
  }
}
