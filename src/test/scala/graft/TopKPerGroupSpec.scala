package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.llm.TextAnalysis
import graft.operators.TopKPerGroup

/** Grouped top-k (WindowGroupLimit plan) and the unigram-LM quality
  * score. */
class TopKPerGroupSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("top-k per group matches the brute-force sort, and is plan-bounded") {
    val df = Seq(
      ("a", 1L, 10.0), ("a", 2L, 30.0), ("a", 3L, 30.0), ("a", 4L, 20.0),
      ("b", 5L, 5.0), ("c", 6L, 1.0), ("c", 7L, 2.0), ("c", 8L, 3.0))
      .toDF("g", "id", "v")
    val got = TopKPerGroup(df, Seq(col("g")),
      Seq(col("v").desc, col("id").asc), 2)
    assert(got.select("g", "id", "rk").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet ==
      Set(("a", 2L, 1L), ("a", 3L, 2L), // 30.0 tie broken by id
        ("b", 5L, 1L), ("c", 8L, 1L), ("c", 7L, 2L)))
    // the rank filter must compile to the bounded per-group limit —
    // WindowGroupLimitExec on both sides of the shuffle — not a full
    // window sort of every group
    val plan = got.queryExecution.executedPlan.toString
    assert(plan.contains("WindowGroupLimit"), plan)
    // rank-column collision is an error, not a silent replace
    intercept[IllegalArgumentException] {
      TopKPerGroup(df.withColumnRenamed("v", "rk"), Seq(col("g")),
        Seq(col("id")), 1)
    }
  }

  test("unigram log-prob: common-word docs score low, rare-word docs high") {
    val docs = Seq(
      (1L, "the the the"), // only common tokens
      (2L, "the qzx"), // one rare token
      (3L, "qzx wvy")) // all rare
      .toDF("doc_id", "text")
    val got = TextAnalysis.unigramLogProb(docs).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2))).toMap
    // corpus: the×4, qzx×2, wvy×1; total 7
    def lp(tfs: Seq[Int]) = {
      val s = tfs.map(tf => math.log(7.0) - math.log(tf.toDouble)).sum
      math.rint(s / tfs.size * 10000) / 10000
    }
    assert(got(1L)._1 == 3L && got(1L)._2 == lp(Seq(4, 4, 4)))
    assert(got(2L)._1 == 2L && got(2L)._2 == lp(Seq(4, 2)))
    assert(got(3L)._1 == 2L && got(3L)._2 == lp(Seq(2, 1)))
    // monotone: rarer vocabulary ⇒ higher surprisal
    assert(got(1L)._2 < got(2L)._2 && got(2L)._2 < got(3L)._2)
  }
}
