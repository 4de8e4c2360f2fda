package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import org.apache.spark.sql.graft.SortedIntersectCount
import graft.llm.{Dedup, Multimodal, Similarity, TextAnalysis}

class LlmSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def docsDF(rows: (Long, String)*) =
    rows.toDF("doc_id", "text")
      .withColumn("lang", lit("en")).withColumn("source", lit("s"))
      .withColumn("n_chars", length(col("text")).cast("long"))

  test("exact dedup groups identical texts under min doc_id") {
    val d = docsDF(1L -> "aaa", 2L -> "bbb", 3L -> "aaa", 4L -> "aaa")
    val r = Dedup.exact(d).collect()
    assert(r.length == 2)
    val byKeeper = r.map(x => x.getLong(1) -> x.getLong(2)).toMap
    assert(byKeeper(1L) == 3L && byKeeper(2L) == 1L)
  }

  test("minhash-lsh finds identical and near-identical docs") {
    val base = "the quick brown fox jumps over the lazy dog again and again"
    val d = docsDF(1L -> base, 2L -> base, 3L -> (base + " tail"),
      4L -> "completely different content with nothing shared at all ok")
    val pairs = Dedup.minhashLsh(d).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.contains((1L, 2L)))
    assert(!pairs.exists(p => p._1 == 4L || p._2 == 4L))
  }

  test("simhash: identical docs equal, disjoint docs differ") {
    val d = docsDF(1L -> "alpha beta gamma delta", 2L -> "alpha beta gamma delta",
      3L -> "epsilon zeta eta theta iota kappa")
    val h = Dedup.simhash(d).collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(h(1L) == h(2L))
    assert(h(1L) != h(3L))
    assert(h.values.forall(v => v >= 0 && v < (1L << 32)))
  }

  test("ngram jaccard: identical docs J=1, half-overlap passes 0.5 cut") {
    val d = docsDF(1L -> "abcdefgh", 2L -> "abcdefgh", 3L -> "zzzzzzzz")
    val r = Dedup.ngramJaccard(d).collect()
    val m = r.map(x => (x.getLong(0), x.getLong(1)) -> x.getDouble(4)).toMap
    assert(m((1L, 2L)) == 1.0)
    assert(!m.contains((1L, 3L)))
  }

  test("SortedIntersectCount matches size(array_intersect) — interpreted and codegen") {
    val df = Seq(
      (Seq("a", "b", "c", "d"), Seq("b", "d", "e")),
      (Seq("a"), Seq[String]()),
      (Seq[String](), Seq[String]()),
      (Seq("x", "y"), Seq("x", "y"))).toDF("a", "b")
    val got = df.select(SortedIntersectCount(col("a"), col("b"))).collect()
      .map(_.getLong(0)).toSeq
    assert(got == Seq(2L, 0L, 0L, 2L))
    val ref = df.select(size(array_intersect(col("a"), col("b"))).cast("long"))
      .collect().map(_.getLong(0)).toSeq
    assert(got == ref)
  }

  test("cosine of a vector with itself is 1; topk ranks by similarity") {
    val e = Seq(
      (0L, Array(1.0f, 0.0f, 0.0f), 0),
      (1L, Array(1.0f, 0.0f, 0.0f), 0),
      (2L, Array(0.9f, 0.1f, 0.0f), 0),
      (3L, Array(0.0f, 0.0f, 1.0f), 0)).toDF("vec_id", "embedding", "label")
    val top = Similarity.bruteForceTopK(e, col("vec_id") === 0, 3).collect()
    assert(top.map(_.getLong(1)).toSeq == Seq(1L, 2L, 3L))
    assert(top.head.getDouble(2) == 1.0)
  }

  test("cell near-dup only pairs within the same label") {
    val e = Seq(
      (0L, Array(1.0f, 0.0f), 0), (1L, Array(1.0f, 0.01f), 0),
      (2L, Array(1.0f, 0.0f), 1)).toDF("vec_id", "embedding", "label")
    val pairs = Similarity.cellNearDup(e, 0.9).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs == Set((0L, 1L)))
  }

  test("lsh near-dup finds the identical pair it buckets together") {
    val e = Seq(
      (0L, Array.fill(8)(0.5f), 0), (1L, Array.fill(8)(0.5f), 0),
      (2L, Array.tabulate(8)(i => if (i % 2 == 0) 1.0f else -1.0f), 1))
      .toDF("vec_id", "embedding", "label")
    val pairs = Similarity.lshNearDup(e, dim = 8, planes = 6, threshold = 0.99)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.contains((0L, 1L)))
  }

  test("rolling hash matches a JVM reference implementation") {
    val texts = Seq("hello world", "", "a", "the quick brown fox")
    def ref(s: String): Long =
      s.foldLeft(0L)((h, c) => (h * 31 + c.toLong) % 1000000007L)
    val d = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
    val got = docsDF(d: _*)
      .select(col("doc_id"), TextAnalysis.rollingHash(col("text")))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    texts.zipWithIndex.foreach { case (t, i) =>
      assert(got(i.toLong) == ref(t), s"text '$t'")
    }
  }

  test("fingerprint is invariant to case, punctuation, extra spaces") {
    val d = docsDF(1L -> "Hello,  World!", 2L -> "hello world",
      3L -> "different")
    val fp = d.select(col("doc_id"), TextAnalysis.fingerprint(col("text")))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(fp(1L) == fp(2L))
    assert(fp(1L) != fp(3L))
  }

  test("language id prefers the language whose stopwords dominate") {
    val d = docsDF(1L -> "the cat is in the house and it is warm",
      2L -> "der hund ist ein tier und das ist gut")
    val got = TextAnalysis.languageId(d).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got(1L) == "en")
    assert(got(2L) == "de")
  }

  test("multimodal: partition-iterator decode == expression meta (cross-check)") {
    val docs = Tables.load(spark, TestSpark.sfTiny, "documents").limit(50)
    val viaIter = Multimodal.decode(spark, docs).collect()
      .map(m => m.doc_id -> ((m.n_bytes, m.sha, m.width, m.height, m.n_frames)))
      .toMap
    val viaExpr = Multimodal.metaExpr(docs).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getString(2),
        r.getInt(3), r.getInt(4), r.getInt(5))))
      .toMap
    assert(viaIter == viaExpr)
  }
}
