package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.acl.PartitionAcl
import graft.io.MiniDelta
import graft.llm.{Dedup, Similarity, TextAnalysis}
import graft.plans.GovernedTables

class EdgeCaseSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("_delta_log stays readable under ACL governance (metadata never filtered)") {
    // reference subtlety (src/main.rs:532-538): partition ACLs gate DATA
    // files only; the transaction log is always readable. The enforcement
    // rule drops filter maps that reference columns a relation lacks, so
    // a governed table's log (schema: add/remove/commitInfo) passes
    // through unfiltered.
    val root = Files.createTempDirectory("logacl").toString
    val table = s"$root/trades"
    MiniDelta.append(spark,
      Seq((1L, "XLON"), (2L, "XPAR")).toDF("id", "mic"), table, Seq("mic"))
    try {
      GovernedTables.govern(table, Seq(Map("mic" -> "XLON")))
      // data read: filtered
      assert(spark.read.parquet(table).select("mic").distinct()
        .collect().map(_.getString(0)).toSet == Set("XLON"))
      // log read: complete, including the denied partition's add action
      val logMics = MiniDelta.logDF(spark, table)
        .where(col("add").isNotNull)
        .select(element_at(col("add.partitionValues"), "mic"))
        .collect().map(_.getString(0)).toSet
      assert(logMics == Set("XLON", "XPAR"))
    } finally GovernedTables.clear()
  }

  test("llm operators tolerate degenerate inputs") {
    val weird = Seq(
      (1L, ""),                      // empty text
      (2L, "a"),                     // shorter than any shingle
      (3L, "   "),                   // whitespace only
      (4L, "héllo wörld ünïcode"),   // non-ascii
      (5L, "x" * 2000))              // long run, single token
      .toDF("doc_id", "text")
      .withColumn("lang", lit("en")).withColumn("source", lit("s"))
      .withColumn("n_chars", length(col("text")).cast("long"))
    assert(Dedup.exact(weird).count() == 5)
    assert(Dedup.simhash(weird).count() == 3) // only docs with tokens
    Dedup.minhashLsh(weird).collect()         // no throw
    Dedup.ngramJaccard(weird).collect()       // no throw
    val q = TextAnalysis.qualityScore(weird).collect()
    assert(q.length == 5)
    val fp = weird.select(TextAnalysis.fingerprint(col("text"))).collect()
    assert(fp.length == 5)
    val rh = weird.select(TextAnalysis.rollingHash(col("text")))
      .collect().map(_.getLong(0))
    assert(rh.forall(h => h >= 0 && h < 1000000007L))
    // repetition stats: empty/whitespace docs keep a row of zeros with
    // 0.0 ratios (never -0.0 / NaN / null); single-token doc has no bigram
    val rs = TextAnalysis.repetitionStats(weird).collect()
      .map(r => r.getLong(0) -> r).toMap
    assert(rs.size == 5)
    Seq(1L, 3L).foreach { id =>
      assert(rs(id).getLong(1) == 0L)
      (5 to 7).foreach(i => assert(
        java.lang.Double.compare(rs(id).getDouble(i), 0.0) == 0)) // not -0.0
    }
    assert(rs(5L).getLong(1) == 1L && rs(5L).getLong(4) == 0L)
    // decontamination with degenerate docs: nothing shares a 4-gram
    assert(Dedup.decontaminate(weird, col("doc_id") === 1L, 4).count() == 0)
    // tf-idf: token-less docs emit no keyword rows, others get <= k
    val tk = TextAnalysis.tfIdf(weird, 2).collect()
    assert(!tk.map(_.getLong(0)).contains(1L))
    assert(tk.groupBy(_.getLong(0)).values.forall(_.length <= 2))
  }

  test("quantize: zero vector maps to the zero grid point, no overflow") {
    val q = Seq((0L, Array(0.0f, 0.0f, 0.0f)),
        (1L, Array(Float.MaxValue, -Float.MaxValue, 1.0f)))
      .toDF("vec_id", "embedding")
      .select(col("vec_id"), Similarity.quantize(col("embedding")).as("q"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Double](1)).toMap
    assert(q(0L) == Seq(0.0, 0.0, 0.0))       // 0/1e-30 guard, floor(0.5)=0
    assert(q(1L).head == 127.0 && q(1L)(1) == -127.0) // extremes clamp to grid
    assert(q(1L)(2) == 0.0)                   // 1/3.4e38 rounds to zero
  }

  test("similarity handles zero and empty vectors without NaN explosions") {
    val e = Seq(
      (0L, Array(1.0f, 0.0f), 0),
      (1L, Array(0.0f, 0.0f), 0), // zero vector -> cos = NaN/div-by-zero
      (2L, Array(0.5f, 0.5f), 0)).toDF("vec_id", "embedding", "label")
    val pairs = Similarity.cellNearDup(e, 0.5).collect()
    // pairs involving the zero vector are filtered out (NaN >= t is false)
    assert(pairs.forall(r => r.getLong(0) != 1L && r.getLong(1) != 1L))
  }

  test("ACL on a column the table lacks denies nothing via the algebra") {
    // predicate() compares as strings; a missing column would throw at
    // analysis — allowedFiles against a filter naming only existing
    // columns is the supported surface. Document the rule-level behavior:
    // the enforcement rule DROPS maps naming missing columns (allow),
    // mirroring "metadata is never filtered".
    val df = spark.range(10).toDF("id")
    intercept[org.apache.spark.sql.AnalysisException] {
      PartitionAcl(df, Seq(Map("nope" -> "x"))).collect()
    }
  }

  test("listing ops on an empty file set are empty, not errors") {
    val files = graft.listing.ObjectListing.filesDF(spark, TestSpark.sfTiny)
      .where(lit(false))
    assert(graft.listing.ObjectListing.list(files, "x/", None, 10).count() == 0)
    assert(graft.listing.ObjectListing.commonPrefixes(files, "x/").count() == 0)
    assert(graft.listing.ObjectListing.page(files, 10, 1).count() == 0)
  }

  test("schema/config memos track versions and the invalidate contract") {
    import org.apache.spark.sql.types._
    // r15 memoizes tableConfig/latestSchema per (table, effective
    // version): every mutation lands a NEW version, so the memo must
    // never serve yesterday's resolution — and a table REPLACED at the
    // same path resolves fresh after invalidateSnapshot (the
    // documented contract of every permanent memo)
    val t = Files.createTempDirectory("memo").toString + "/t"
    MiniDelta.createTable(spark, t, StructType(Seq(
      StructField("a", LongType))), properties = Map("k" -> "1"))
    assert(MiniDelta.tableConfig(spark, t).get("k").contains("1"))
    MiniDelta.setTableProperties(spark, t, Map("k" -> "2"))
    assert(MiniDelta.tableConfig(spark, t).get("k").contains("2"))
    // pinned resolution still answers from the OLD version
    assert(MiniDelta.tableConfig(spark, t, 0L).get("k").contains("1"))
    MiniDelta.addColumns(spark, t, Seq(StructField("b", StringType)))
    assert(MiniDelta.latestSchema(spark, t).get.fieldNames.toSeq ==
      Seq("a", "b"))
    assert(MiniDelta.latestSchema(spark, t, 0L).get.fieldNames.toSeq ==
      Seq("a"))
    // replace at the same path + invalidate: fresh table resolves fresh
    org.apache.commons.io.FileUtils.deleteDirectory(
      new java.io.File(new java.io.File(t).getParent))
    new java.io.File(t).mkdirs()
    MiniDelta.invalidateSnapshot(t)
    MiniDelta.createTable(spark, t, StructType(Seq(
      StructField("z", StringType))), properties = Map("k" -> "9"))
    assert(MiniDelta.tableConfig(spark, t).get("k").contains("9"))
    assert(MiniDelta.latestSchema(spark, t).get.fieldNames.toSeq ==
      Seq("z"))
  }

  test("legacy metaData without a configuration keeps the older config") {
    import org.apache.spark.sql.types._
    // the null-vs-stated rule, re-pinned against the r15 DRIVER-side
    // tail parse: a metaData line that carries a schemaString but NO
    // configuration field must not disarm the properties an earlier
    // metaData declared (a legacy writer's shape); an explicit {} DOES
    // override
    val t = Files.createTempDirectory("legacymd").toString + "/t"
    MiniDelta.createTable(spark, t, StructType(Seq(
      StructField("a", LongType))),
      properties = Map("delta.appendOnly" -> "false", "marker" -> "yes"))
    val schemaJson = MiniDelta.latestSchema(spark, t).get.json
      .replace("\"", "\\\"")
    // hand-written v1: a schema-bearing metaData with no configuration
    // key at all (legacy shape)
    val v1 = new java.io.File(f"$t%s/_delta_log/${1L}%020d.json")
    java.nio.file.Files.writeString(v1.toPath,
      s"""{"metaData":{"id":"legacy","schemaString":"$schemaJson",""" +
        """"partitionColumns":[],"format":{"provider":"parquet",""" +
        """"options":{}}}}""" + "\n")
    MiniDelta.invalidateSnapshot(t)
    assert(MiniDelta.tableConfig(spark, t).get("marker").contains("yes"),
      "a configuration-less metaData must keep the older config")
    // schema resolution still takes the NEWEST metaData
    assert(MiniDelta.latestSchema(spark, t).isDefined)
  }
}
