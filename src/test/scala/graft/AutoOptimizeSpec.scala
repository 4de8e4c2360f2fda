package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

import graft.io.MiniDelta

/** Delta's auto-optimize pair: `delta.autoOptimize.optimizeWrite`
  * (pre-write shuffle by the Hive partition columns — kills the
  * T-tasks × P-partitions small-file explosion at the source) and
  * `delta.autoOptimize.autoCompact` (post-commit bin-pack of
  * partitions that accumulated small files, scoped to those partitions
  * and to the small files only). */
class AutoOptimizeSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def freshTable(): String =
    Files.createTempDirectory("autoopt").toString + "/t"

  private def schema = StructType(Seq(
    StructField("id", LongType), StructField("p", LongType)))

  private def frame(n: Int, tasks: Int) =
    spark.range(n.toLong).repartition(tasks)
      .select(col("id"), pmod(col("id"), lit(2)).as("p"))

  test("optimizeWrite co-locates each partition value into few files") {
    // control: 8 input tasks × 2 partition values = up to 16 files
    val plain = freshTable()
    MiniDelta.createTable(spark, plain, schema, partitionBy = Seq("p"))
    MiniDelta.append(spark, frame(400, 8), plain, Seq("p"))
    MiniDelta.invalidateSnapshot(plain)
    val plainFiles = MiniDelta.snapshotFiles(spark, plain).count()
    assert(plainFiles > 2, s"control wrote only $plainFiles files")
    // optimized: the pre-write shuffle lands one file per value
    val opt = freshTable()
    MiniDelta.createTable(spark, opt, schema, partitionBy = Seq("p"),
      properties = Map("delta.autoOptimize.optimizeWrite" -> "true"))
    MiniDelta.append(spark, frame(400, 8), opt, Seq("p"))
    MiniDelta.invalidateSnapshot(opt)
    val optFiles = MiniDelta.snapshotFiles(spark, opt).count()
    assert(optFiles <= 2, s"optimizeWrite still fanned out: $optFiles")
    // same rows either way
    assert(MiniDelta.readFiltered(spark, opt, Seq.empty).count() == 400)
  }

  test("autoCompact bin-packs a partition past minNumFiles; big files survive") {
    val t = freshTable()
    MiniDelta.createTable(spark, t, StructType(Seq(
      StructField("id", LongType), StructField("s", StringType),
      StructField("p", LongType))), partitionBy = Seq("p"),
      properties = Map("delta.autoOptimize.autoCompact" -> "true"))
    spark.conf.set("spark.graft.autoCompact.minNumFiles", "4")
    // a file comfortably past this stays out of the rewrite's scope
    spark.conf.set("spark.graft.autoCompact.maxFileSize", "3000")
    try {
      // one LARGE file in partition 0 (long strings push it past 3000B)
      MiniDelta.append(spark, spark.range(500)
        .select(col("id"), concat(lit("x" * 64),
          col("id").cast("string")).as("s"), lit(0L).as("p"))
        .repartition(1), t, Seq("p"))
      MiniDelta.invalidateSnapshot(t)
      val big = MiniDelta.snapshotFiles(spark, t)
        .select("path", "size").collect()
      assert(big.length == 1 && big.head.getLong(1) > 3000,
        s"setup: expected one big file, got ${big.toSeq}")
      val bigPath = big.head.getString(0)
      // small appends accumulate; below the threshold nothing triggers
      for (i <- 1 to 3)
        MiniDelta.append(spark, Seq((i.toLong, "s", 0L))
          .toDF("id", "s", "p"), t, Seq("p"))
      MiniDelta.invalidateSnapshot(t)
      assert(MiniDelta.snapshotFiles(spark, t).count() == 4)
      // the 4th small file crosses minNumFiles: the SAME append call
      // triggers the compaction — no explicit OPTIMIZE anywhere
      MiniDelta.append(spark, Seq((4L, "s", 0L)).toDF("id", "s", "p"),
        t, Seq("p"))
      MiniDelta.invalidateSnapshot(t)
      val after = MiniDelta.snapshotFiles(spark, t)
        .select("path").collect().map(_.getString(0))
      assert(after.contains(bigPath),
        "autoCompact rewrote a file past maxFileSize")
      assert(after.length == 2,
        s"expected big file + one packed file, got ${after.toSeq}")
      // an OPTIMIZE commit landed on the log
      assert(MiniDelta.history(spark, t).collect()
        .exists(_.getString(1) == "OPTIMIZE"))
      // rows intact
      assert(MiniDelta.readFiltered(spark, t, Seq.empty).count() == 504)
    } finally {
      spark.conf.unset("spark.graft.autoCompact.minNumFiles")
      spark.conf.unset("spark.graft.autoCompact.maxFileSize")
    }
  }

  test("autoCompact handles unpartitioned tables (whole-table scope)") {
    val t = freshTable()
    MiniDelta.createTable(spark, t, StructType(Seq(
      StructField("id", LongType))),
      properties = Map("delta.autoOptimize.autoCompact" -> "true"))
    spark.conf.set("spark.graft.autoCompact.minNumFiles", "3")
    try {
      for (i <- 1 to 3)
        MiniDelta.append(spark, Seq(i.toLong).toDF("id"), t, Seq.empty)
      MiniDelta.invalidateSnapshot(t)
      assert(MiniDelta.snapshotFiles(spark, t).count() == 1)
      assert(MiniDelta.readFiltered(spark, t, Seq.empty).count() == 3)
    } finally spark.conf.unset("spark.graft.autoCompact.minNumFiles")
  }
}
