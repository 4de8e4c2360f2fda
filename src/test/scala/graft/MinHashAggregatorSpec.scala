package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.llm.{Dedup, MinHashAggregator}

class MinHashAggregatorSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private val agg = new MinHashAggregator(32)

  test("typed minhash signatures: identical docs identical, estimate ~ Jaccard") {
    val docs = Seq(
      (1L, "the quick brown fox jumps over the lazy dog again"),
      (2L, "the quick brown fox jumps over the lazy dog again"),
      (3L, "a completely different sentence with other words entirely"))
      .toDF("doc_id", "text")
    val sigs = Dedup.shingles(docs, 5)
      .as[(Long, String)]
      .groupByKey(_._1)
      .mapValues(_._2)
      .agg(agg.toColumn.name("sig"))
      .collect().toMap
    assert(sigs(1L).toSeq == sigs(2L).toSeq)
    assert(MinHashAggregator.estimate(sigs(1L), sigs(2L)) == 1.0)
    assert(MinHashAggregator.estimate(sigs(1L), sigs(3L)) < 0.3)
  }

  test("merge is element-wise min (partial aggregation safe)") {
    val b1 = agg.reduce(agg.zero, "abcde")
    val b2 = agg.reduce(agg.zero, "vwxyz")
    val merged = agg.merge(b1.clone(), b2.clone())
    (0 until 32).foreach { j =>
      assert(merged(j) == math.min(b1(j), b2(j)))
    }
  }
}
