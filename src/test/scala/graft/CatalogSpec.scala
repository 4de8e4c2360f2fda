package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.catalog.Catalog
import graft.metrics.Metrics

class CatalogSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("resolve maps alias to path; unknown alias is the 404") {
    val c = Catalog(Seq("trades" -> "/data/t", "ref" -> "/data/r"))
    assert(c.resolve("trades") == "/data/t")
    assert(c.resolveOpt("missing").isEmpty)
    intercept[NoSuchElementException](c.resolve("missing"))
  }

  test("listBuckets emits the single virtual bucket") {
    val r = Catalog.forSf(TestSpark.sfTiny).listBuckets(spark).collect()
    assert(r.length == 1 && r(0).getString(0) == "datalake")
  }

  test("listTables renders aliases as ordered common prefixes") {
    val r = Catalog.forSf(TestSpark.sfTiny).listTables(spark).collect()
      .map(_.getString(0))
    assert(r.length == Tables.names.length)
    assert(r.forall(_.endsWith("/")))
    assert(r.sameElements(r.sorted))
  }

  test("approx distinct tracks exact within rsd on real data (scale path)") {
    val ev = Tables.events(spark, TestSpark.sfTiny)
    val exact = ev.select(org.apache.spark.sql.functions
      .countDistinct(org.apache.spark.sql.functions.col("user_id")))
      .collect()(0).getLong(0)
    val approx = ev.select(org.apache.spark.sql.functions
      .approx_count_distinct(org.apache.spark.sql.functions.col("user_id")))
      .collect()(0).getLong(0)
    assert(math.abs(approx - exact).toDouble / exact < 0.1)
    // grid average helper is exactly sum/count on 2-decimal-grid data
    val g = Metrics.counters(ev).count()
    assert(g > 0)
  }
}
