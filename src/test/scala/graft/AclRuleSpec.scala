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
}
