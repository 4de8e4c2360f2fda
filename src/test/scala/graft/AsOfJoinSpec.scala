package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{AsOfJoin, RangeJoin}

class AsOfJoinSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def ts(s: String) = java.sql.Timestamp.valueOf(s)

  test("as-of picks the latest right row at or before each left row") {
    val trades = Seq(
      (1L, ts("2024-01-01 10:00:05"), 100L, 10.0),
      (1L, ts("2024-01-01 10:00:10"), 101L, 11.0),
      (2L, ts("2024-01-01 10:00:03"), 102L, 12.0)) // before any quote
      .toDF("user_id", "ts", "event_id", "value")
    val quotes = Seq(
      (1L, ts("2024-01-01 10:00:01"), 1L, 99.0),
      (1L, ts("2024-01-01 10:00:05"), 2L, 98.5), // EQUAL ts: inclusive
      (1L, ts("2024-01-01 10:00:07"), 3L, 98.0),
      (2L, ts("2024-01-01 10:00:09"), 4L, 97.0))
      .toDF("user_id", "ts", "event_id", "q")
    val got = AsOfJoin.lastPrior(trades, quotes, Seq("user_id"),
        "ts", "event_id", Seq("q"))
      .select("event_id", "asof_q").collect()
      .map(r => r.getLong(0) -> Option(r.get(1)).map(_.asInstanceOf[Double]))
      .toMap
    assert(got(100L).contains(98.5)) // equal-ts quote counts (<= semantics)
    assert(got(101L).contains(98.0))
    assert(got(102L).isEmpty)        // no prior quote -> null
  }

  test("as-of equals the brute-force greatest-prior subquery on fixtures") {
    val e = Tables.events(spark, TestSpark.sfTiny)
    val l = e.where(col("event_type") === "purchase")
      .select("user_id", "ts", "event_id", "value")
    val r = e.where(col("event_type") === "view")
      .select(col("user_id"), col("ts"), col("event_id"),
        col("value").as("rv"))
    val got = AsOfJoin.lastPrior(l, r, Seq("user_id"), "ts", "event_id",
        Seq("rv"))
      .select("event_id", "asof_rv").collect()
      .map(x => x.getLong(0) -> Option(x.get(1))).toMap
    // brute force: max (ts, event_id) among prior right rows, then join
    val pairs = l.as("l").join(r.as("r"),
        col("l.user_id") === col("r.user_id") &&
        col("r.ts") <= col("l.ts"), "left")
    val best = pairs
      .groupBy(col("l.event_id").as("eid"))
      .agg(max(struct(col("r.ts"), col("r.event_id"), col("r.rv")))
        .as("b"))
      .select(col("eid"), col("b.rv").as("rv"))
      .collect().map(x => x.getLong(0) -> Option(x.get(1))).toMap
    assert(got.keySet == best.keySet)
    got.foreach { case (k, v) => assert(v == best(k), s"event $k") }
  }

  test("banded range join finds exactly the pairs within the window") {
    val a = Seq((1L, 100L, 10L), (1L, 250L, 11L), (2L, 100L, 12L))
      .toDF("k", "t", "id_a")
    val b = Seq((1L, 120L, 20L), (1L, 205L, 21L), (1L, 900L, 22L),
      (2L, 50L, 23L))
      .toDF("k", "t", "id_b")
    val got = RangeJoin.banded(a, b, Seq("k"), "t", "t", 60L)
      .select("id_a", "id_b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    // |ta - tb| <= 60: (100,120) d=20; (250,205) d=45; (100,50) d=50
    assert(got == Set((10L, 20L), (11L, 21L), (12L, 23L)))
    // parity with the naive theta join
    val naiveSet = a.as("a").join(b.as("b"),
        col("a.k") === col("b.k") &&
        abs(col("a.t") - col("b.t")) <= 60)
      .select(col("a.id_a"), col("b.id_b")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == naiveSet)
  }
}
