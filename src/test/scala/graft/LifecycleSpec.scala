package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.acl.PartitionAcl
import graft.catalog.Catalog
import graft.functions.StringFns
import graft.io.MiniDelta

/** End-to-end replay of the reference's flagship GET lifecycle
  * (SURVEY §3.1) in engine terms: catalog bind -> route -> permission
  * plan (static ∪ DB) -> log-driven file resolution -> authorize ->
  * pruned read -> rendered listing. */
class LifecycleSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("flagship GET path: bind, authorize, prune, read, render") {
    // a governed "trades" table written through the engine's own sink
    val root = Files.createTempDirectory("lifecycle").toString
    val table = s"$root/trades"
    val rows = (1 to 30).map { i =>
      (i.toLong, if (i % 3 == 0) "XPAR" else if (i % 2 == 0) "XLON"
        else "XMIL", i * 10.0)
    }.toDF("trade_id", "mic", "price")
    MiniDelta.append(spark, rows, table, Seq("mic"))

    // 1. catalog bind (P1/J1): alias -> physical path; unknown alias 404s
    val catalog = Catalog(Seq("trades" -> table))
    assert(catalog.resolve("trades") == table)
    intercept[NoSuchElementException](catalog.resolve("nope"))

    // 2. route (P8): data-file request, not a listing / log read
    val request = "trades/mic=XLON/part-x.parquet"
    val alias = spark.range(1)
      .select(StringFns.pathAlias(lit(request))).first().getString(0)
    assert(alias == "trades")

    // 3. permission plan (J3/J4): static config ∪ DB row for the user
    val perms = Seq((1, "alice", "trades", """[{"mic":"XMIL"}]"""))
      .toDF("id", "user_id", "table_name", "partition_filters")
    val merged = PartitionAcl.merge(
      Seq(Map("mic" -> "XLON")),
      PartitionAcl.filtersFor(PartitionAcl.parsePermissions(perms),
        "alice", "trades"))
    assert(merged == Seq(Map("mic" -> "XLON"), Map("mic" -> "XMIL")))

    // 4. physical plan (P5): log metadata -> exact allowed file set
    val snap = MiniDelta.snapshotFiles(spark, catalog.resolve(alias))
    val allowed = MiniDelta.filesForFilters(snap, merged)
    val allowedMics = allowed
      .select(element_at(col("partitionValues"), "mic")).distinct()
      .collect().map(_.getString(0)).toSet
    assert(allowedMics == Set("XLON", "XMIL")) // XPAR resolved away

    // 5. authorize (J2/P6): an XPAR file is denied, an XLON file passes
    val xparFile = snap
      .where(element_at(col("partitionValues"), "mic") === "XPAR")
      .select("path").limit(1)
    assert(PartitionAcl.denied(xparFile, allowed.select("path"), "path")
      .count() == 1)
    val xlonFile = allowed.select("path").limit(1)
    assert(PartitionAcl.authorize(xlonFile, allowed.select("path"), "path")
      .count() == 1)

    // 6. execute (S6): read through the pruned set; only allowed rows
    val data = MiniDelta.readFiltered(spark, table, merged)
    assert(data.select("mic").distinct().collect().map(_.getString(0))
      .toSet == Set("XLON", "XMIL"))
    assert(data.count() == rows.where(col("mic") =!= "XPAR").count())

    // 7. render (F12/W1): listing page of the allowed files as XML
    val xml = allowed.select(col("path").as("key"))
      .orderBy("key").limit(5)
      .select(concat(lit("<Contents><Key>"),
        StringFns.xmlEscape(col("key")), lit("</Key></Contents>")).as("x"))
      .collect().map(_.getString(0))
    assert(xml.nonEmpty && xml.forall(_.startsWith("<Contents><Key>")))
  }
}
