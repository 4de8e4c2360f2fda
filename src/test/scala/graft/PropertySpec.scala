package graft

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalatest.funsuite.AnyFunSuite

import graft.acl.PartitionAcl
import graft.functions.StringFns
import graft.listing.ObjectListing
import graft.util.Salting

/** ScalaCheck-generated properties per SURVEY §5: string-op invariants
  * (F1-F6) and filter-algebra laws (P2-P4), plus salting equivalence.
  * Properties are evaluated through Spark on generated literal batches
  * (one pass per property, not per case, to keep runtime sane). */
class PropertySpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private val asciiText: Gen[String] =
    Gen.listOf(Gen.oneOf(Gen.alphaNumChar, Gen.oneOf('&', '<', '>', '"',
      '\'', '/', ' ', '='))).map(_.mkString).map(_.take(40))

  test("xmlEscape leaves no raw specials and is length-monotone") {
    val samples = Gen.listOfN(200, asciiText).sample.get
    val out = samples.toDF("s")
      .select(col("s"), StringFns.xmlEscape(col("s")).as("e"))
      .collect()
    out.foreach { r =>
      val (s, e) = (r.getString(0), r.getString(1))
      // after escaping, every & starts an entity; no raw < > " '
      assert(!e.exists(c => c == '<' || c == '>' || c == '"' || c == '\''))
      assert("&(?!amp;|lt;|gt;|quot;|apos;)".r.findFirstIn(e).isEmpty, s"$s -> $e")
      assert(e.length >= s.length)
    }
  }

  test("native xmlEscape == chained-replace reference algorithm") {
    val samples = Gen.listOfN(300, asciiText).sample.get ++
      Seq("", "&amp;", "&&&", "<<>>\"'", "héllo<ünïcode>&")
    val out = samples.toDF("s")
      .select(StringFns.xmlEscape(col("s")).as("a"),
        StringFns.xmlEscapeChained(col("s")).as("b"))
      .collect()
    out.foreach(r => assert(r.getString(0) == r.getString(1)))
  }

  test("range parse round-trips generated ranges") {
    val gen = for {
      a <- Gen.chooseNum(0L, 1000000L)
      len <- Gen.chooseNum(1L, 100000L)
    } yield (a, a + len - 1)
    val samples = Gen.listOfN(200, gen).sample.get
    val out = samples.toDF("a", "b")
      .select(col("a"), col("b"),
        StringFns.rangeStart(concat(lit("bytes="), col("a").cast("string"),
          lit("-"), col("b").cast("string"))).as("s"),
        StringFns.rangeEnd(concat(lit("bytes="), col("a").cast("string"),
          lit("-"), col("b").cast("string"))).as("e"))
      .collect()
    out.foreach { r =>
      assert(r.getLong(2) == r.getLong(0) && r.getLong(3) == r.getLong(1))
    }
  }

  test("P2-P4 filter algebra: pruned ⊆ all; OR-union ⊇ each branch; dedup") {
    val files = ObjectListing.filesDF(spark, TestSpark.sfTiny)
    val f1: PartitionAcl.Filters = Seq(Map("l_returnflag" -> "R"))
    val f2: PartitionAcl.Filters =
      Seq(Map("l_returnflag" -> "N", "l_linestatus" -> "O"))
    val both = PartitionAcl.allowedFiles(files, f1 ++ f2)
    val a1 = PartitionAcl.allowedFiles(files, f1)
    val a2 = PartitionAcl.allowedFiles(files, f2)
    // pruned ⊆ all
    assert(both.join(files, Seq("key"), "left_anti").count() == 0)
    // union-of-filters ⊇ each filter
    assert(a1.join(both, Seq("key"), "left_anti").count() == 0)
    assert(a2.join(both, Seq("key"), "left_anti").count() == 0)
    // |union| <= |a1| + |a2| (dedup across overlapping filters)
    assert(both.count() <= a1.count() + a2.count())
    // AND strengthens: adding a conjunct never grows the set
    val tighter = PartitionAcl.allowedFiles(files,
      Seq(Map("l_returnflag" -> "R", "l_linestatus" -> "F")))
    assert(tighter.count() <= a1.count())
    assert(tighter.join(a1, Seq("key"), "left_anti").count() == 0)
  }

  test("salted aggregation equals direct aggregation") {
    val ev = Tables.events(spark, TestSpark.sfTiny)
    val direct = ev.groupBy("event_type").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val salted = Salting.saltedCount(ev, "event_type")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(salted == direct)
    val directSum = ev.groupBy("event_type")
      .agg((sum(round(col("value") * 100)) / 100.0).as("t"))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    val saltedSum = Salting.saltedGridSum(ev, "event_type", col("value"))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(saltedSum == directSum)
  }

  test("listing pagination partitions the ordered key space") {
    val files = ObjectListing.filesDF(spark, TestSpark.sfTiny)
    val n = files.count()
    val pageSize = 1000
    val pages = (1 to ((n / pageSize) + 1).toInt)
      .map(p => ObjectListing.page(files, pageSize, p).count())
    assert(pages.sum == n)
  }
}
