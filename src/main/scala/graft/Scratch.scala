package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.functions.StringFns
/** Throwaway perf exploration main (deleted before round end). */
object Scratch {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val d = "/root/testdata/sf0.1"
    val li = Tables.load(spark, d, "lineitem")
    def time(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(s"$name: ${(System.nanoTime() - t0) / 1e9}%.2f s, n=$n")
    }
    val qs = concat(lit("list-type=2&prefix="), col("l_returnflag"),
      lit("/f&max-keys="), col("l_linenumber").cast("string"))
    // v1: current
    time("v1 str_to_map x2 + try_cast") {
      li.select(qs.as("qs"))
        .withColumn("prefix_param", StringFns.queryParam(col("qs"), "prefix"))
        .withColumn("max_keys", StringFns.tryInt(StringFns.queryParam(col("qs"), "max-keys")).cast("long"))
        .distinct().orderBy("qs").count()
    }
    // v2: regexp based
    time("v2 regexp") {
      li.select(qs.as("qs"))
        .withColumn("prefix_param", regexp_extract(col("qs"), "prefix=([^&]*)", 1))
        .withColumn("max_keys", regexp_extract(col("qs"), "max-keys=([^&]*)", 1).cast("long"))
        .distinct().orderBy("qs").count()
    }
    // v3: str_to_map once
    time("v3 map once") {
      li.select(qs.as("qs"), StringFns.queryMap(qs).as("m"))
        .select(col("qs"), element_at(col("m"), "prefix").as("prefix_param"),
          element_at(col("m"), "max-keys").cast("long").as("max_keys"))
        .distinct().orderBy("qs").count()
    }
    // v4: distinct first on qs
    time("v4 distinct first") {
      li.select(qs.as("qs")).distinct()
        .withColumn("prefix_param", StringFns.queryParam(col("qs"), "prefix"))
        .withColumn("max_keys", StringFns.tryInt(StringFns.queryParam(col("qs"), "max-keys")).cast("long"))
        .orderBy("qs").count()
    }
    // what does v1 plan look like
    li.select(qs.as("qs"))
      .withColumn("max_keys", StringFns.tryInt(StringFns.queryParam(col("qs"), "max-keys")))
      .explain("formatted")
    spark.stop()
  }
}
