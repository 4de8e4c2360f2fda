package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The SQL half of the API surface: every native expression is callable
  * from `spark.sql` as `graft_*` (registered by GraftExtensions). */
class SqlFunctionsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("scalar text functions resolve in SQL and match the DataFrame forms") {
    Seq((1L, "a<b&\"c' d  E"), (2L, "the quick brown fox"))
      .toDF("id", "t").createOrReplaceTempView("sqlfn_t")
    val got = spark.sql(
      """SELECT id, graft_xml_escape(t) AS esc, graft_simhash64(t) AS sh,
        |  graft_token_count(t) AS ntok, graft_normalize_text(t) AS norm,
        |  graft_char_class_count(t, 'alpha') AS na,
        |  graft_ngram_codes(t, 3) AS ng3,
        |  graft_minhash_sig(t, 8, 3) AS sig
        |FROM sqlfn_t""".stripMargin)
    val ref = spark.table("sqlfn_t").select(col("id"),
      org.apache.spark.sql.graft.XmlEscape(col("t")).as("esc"),
      org.apache.spark.sql.graft.SimHash64(col("t")).as("sh"),
      org.apache.spark.sql.graft.TokenCount(col("t")).as("ntok"),
      org.apache.spark.sql.graft.NormalizeText(col("t")).as("norm"),
      org.apache.spark.sql.graft.CharClassCount.alpha(col("t")).as("na"),
      org.apache.spark.sql.graft.NgramCodes(col("t"), 3).as("ng3"),
      org.apache.spark.sql.graft.MinHashSig(col("t"), 8, 3).as("sig"))
    assert(got.collect().map(_.toSeq).toSeq ==
      ref.collect().map(_.toSeq).toSeq)
  }

  test("array/vector functions resolve in SQL") {
    val r = spark.sql(
      """SELECT graft_vector_dot(array(CAST(1.0 AS FLOAT), CAST(2.0 AS FLOAT)),
        |                        array(CAST(3.0 AS FLOAT), CAST(4.0 AS FLOAT))) AS dot,
        |  graft_sorted_intersect_count(array(1L, 2L, 5L), array(2L, 5L, 9L)) AS ic,
        |  graft_interleave_bits(2, 3, 1) AS z
        |""".stripMargin).collect()(0)
    assert(r.getDouble(0) == 11.0)
    assert(r.getLong(1) == 2L)
    // bits=2: x=3 (11), y=1 (01) -> interleave x0 y0 x1 y1 = 1,1,1,0 -> 0b0111
    assert(r.getLong(2) ==
      spark.range(1).select(org.apache.spark.sql.graft.InterleaveBits(
        2, lit(3), lit(1))).collect()(0).getLong(0))
  }

  test("non-literal static parameters are rejected loudly") {
    Seq((1L, "x")).toDF("id", "t").createOrReplaceTempView("sqlfn_bad")
    val e = intercept[Exception] {
      spark.sql("SELECT graft_ngram_codes(t, id) FROM sqlfn_bad").collect()
    }
    assert(e.getMessage.contains("integer literal"))
  }
}
