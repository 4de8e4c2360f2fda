package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.plans.GovernedTables

/** The Catalyst enforcement rule: scans of a governed path are rewritten
  * to Filter(orOfAnds, scan) at resolution time, and the filter prunes
  * partitions (file-level enforcement for free). */
class AclRuleSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark // built withExtensions(GraftExtensions)
  import spark.implicits._

  private def writeGoverned(): String = {
    val dir = Files.createTempDirectory("governed").toString + "/trades"
    (1 to 20).map(i => (i.toLong, if (i % 4 == 0) "XPAR"
      else if (i % 2 == 0) "XLON" else "XMIL", i * 1.0))
      .toDF("id", "mic", "price")
      .write.partitionBy("mic").parquet(dir)
    dir
  }

  test("governed scan only returns allowed partitions; others pruned") {
    val dir = writeGoverned()
    try {
      GovernedTables.govern(dir,
        Seq(Map("mic" -> "XLON"), Map("mic" -> "XMIL")))
      val df = spark.read.parquet(dir)
      val mics = df.select("mic").distinct().collect()
        .map(_.getString(0)).toSet
      assert(mics == Set("XLON", "XMIL")) // XPAR denied (config.json:10-19)
      // enforcement reaches the file level: XPAR files are never scanned
      // (input_file_name() reflects the files actually read at runtime,
      // unlike .inputFiles which reports the unpruned logical relation)
      val scanned = df.select(input_file_name()).distinct().collect()
        .map(_.getString(0))
      assert(scanned.nonEmpty && !scanned.exists(_.contains("mic=XPAR")))
    } finally GovernedTables.clear()
  }

  test("ungoverned tables are untouched") {
    val dir = writeGoverned()
    val mics = spark.read.parquet(dir).select("mic").distinct().collect()
      .map(_.getString(0)).toSet
    assert(mics == Set("XLON", "XMIL", "XPAR"))
  }

  test("user filters compose with the ACL (AND semantics)") {
    val dir = writeGoverned()
    try {
      GovernedTables.govern(dir, Seq(Map("mic" -> "XLON")))
      val n = spark.read.parquet(dir).where(col("price") > 10).count()
      val plain = spark.read.parquet(dir).count()
      assert(n < plain)
    } finally GovernedTables.clear()
  }

  test("fail closed: filters on columns the table lacks deny everything") {
    val dir = writeGoverned()
    try {
      // key typo / schema drift: no such column -> zero rows, NOT allow-all
      GovernedTables.govern(dir, Seq(Map("mic_typo" -> "XLON")))
      assert(spark.read.parquet(dir).count() == 0)
      // mixed: the expressible map still grants its slice
      GovernedTables.govern(dir,
        Seq(Map("mic_typo" -> "XLON"), Map("mic" -> "XMIL")))
      val mics = spark.read.parquet(dir).select("mic").distinct()
        .collect().map(_.getString(0)).toSet
      assert(mics == Set("XMIL"))
    } finally GovernedTables.clear()
  }

  test("empty filter list / empty maps mean allow-all (P7), not deny") {
    val dir = writeGoverned()
    try {
      GovernedTables.govern(dir, Seq(Map.empty[String, String]))
      assert(spark.read.parquet(dir).count() == 20)
    } finally GovernedTables.clear()
  }

  test("path matching is segment-bounded and longest-key deterministic") {
    val base = Files.createTempDirectory("bound").toString
    val t = base + "/trades"
    val tb = base + "/trades_backup"
    Seq((1L, "XLON"), (2L, "XPAR")).toDF("id", "mic")
      .write.partitionBy("mic").parquet(t)
    Seq((3L, "XLON"), (4L, "XPAR")).toDF("id", "mic")
      .write.partitionBy("mic").parquet(tb)
    try {
      GovernedTables.govern(t, Seq(Map("mic" -> "XLON")))
      // 'trades' key must NOT bleed onto trades_backup
      assert(spark.read.parquet(t).count() == 1)
      assert(spark.read.parquet(tb).count() == 2)
      // overlapping registrations: the longest (most specific) key wins
      GovernedTables.govern(base, Seq(Map("mic" -> "XPAR")))
      assert(spark.read.parquet(t).select("mic").distinct()
        .collect().map(_.getString(0)).toSet == Set("XLON"))
      assert(spark.read.parquet(tb).select("mic").distinct()
        .collect().map(_.getString(0)).toSet == Set("XPAR"))
    } finally GovernedTables.clear()
  }
}
