package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.metrics.Metrics
import graft.streaming.MetricsStream

case class Ev(event_id: Long, ts: java.sql.Timestamp, user_id: Long,
              event_type: String, value: Double)

class MetricsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private def ts(s: String) = java.sql.Timestamp.valueOf(s)

  private def sampleEvents = {
    import spark.implicits._
    Seq(
      Ev(1, ts("2024-01-01 10:00:05"), 7, "view", 1.50),
      Ev(2, ts("2024-01-01 10:00:30"), 7, "view", 2.50),
      Ev(3, ts("2024-01-01 10:00:59"), 8, "click", 3.00),
      Ev(4, ts("2024-01-01 10:01:10"), 9, "view", 10.00)).toDS
  }

  test("batch per-minute metrics: counts, exact distinct, exact averages") {
    val out = Metrics.perMinute(sampleEvents.toDF).collect()
    assert(out.length == 2)
    val w1 = out(0)
    assert(w1.getAs[java.sql.Timestamp]("window_start") ==
      ts("2024-01-01 10:00:00"))
    assert(w1.getAs[Long]("queries_served") == 3)
    assert(w1.getAs[Long]("unique_users") == 2)
    assert(w1.getAs[Double]("avg_latency") == (150.0 + 250.0 + 300.0) / 100.0 / 3)
    val w2 = out(1)
    assert(w2.getAs[Long]("queries_served") == 1)
    assert(w2.getAs[Double]("avg_latency") == 10.00)
  }

  test("sessionization splits on gaps and numbers sessions in order") {
    import java.sql.Timestamp
    import spark.implicits._
    def t(s: String) = Timestamp.valueOf(s)
    val ev = Seq(
      (1L, t("2024-01-01 10:00:00"), 1L),
      (1L, t("2024-01-01 10:10:00"), 2L),  // same session (gap 10m)
      (1L, t("2024-01-01 11:00:00"), 3L),  // new session (gap 50m)
      (2L, t("2024-01-01 09:00:00"), 4L))
      .toDF("user_id", "ts", "event_id")
    val sess = Metrics.sessionize(ev, gapSeconds = 1800)
      .select("event_id", "session_id").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(sess(1L) == 1L && sess(2L) == 1L && sess(3L) == 2L)
    assert(sess(4L) == 1L)
    val stats = Metrics.sessionStats(ev, 1800).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3))))
      .toMap
    assert(stats(1L) == ((2L, 3L, 2L)))
    assert(stats(2L) == ((1L, 1L, 1L)))
  }

  test("approx scale path tracks exact within sketch tolerance") {
    // real fixture data: enough cardinality to exercise the sketches
    val ev = Tables.events(spark, TestSpark.sfTiny)
    val exactU = Metrics.distinctUsersPerMinute(ev)
      .collect().map(r => r.getTimestamp(0) -> r.getLong(1)).toMap
    val approxU = Metrics.distinctUsersPerMinute(ev, approx = true)
      .collect().map(r => r.getTimestamp(0) -> r.getLong(1)).toMap
    assert(approxU.keySet == exactU.keySet) // same windows
    // HLL++ default rsd is 5%; allow 3 sigma plus slack for tiny windows
    exactU.foreach { case (w, n) =>
      assert(math.abs(approxU(w) - n) <= math.max(3, 0.15 * n),
        s"window $w: approx ${approxU(w)} vs exact $n")
    }
    // perMinute: only the unique_users column may differ, within the
    // same tolerance; counts and averages stay bit-exact
    val ex = Metrics.perMinute(ev).collect()
    val ap = Metrics.perMinute(ev, approx = true).collect()
    ex.zip(ap).foreach { case (e, a) =>
      assert(e.getTimestamp(0) == a.getTimestamp(0))
      assert(e.getLong(1) == a.getLong(1))
      assert(math.abs(a.getLong(2) - e.getLong(2)) <=
        math.max(3, 0.15 * e.getLong(2)))
      assert(e.getDouble(3) == a.getDouble(3))
      assert(e.getDouble(4) == a.getDouble(4))
    }
    // quantiles: the sketch's guarantee is on RANK, not value — assert
    // each approx quantile lies between exact quantiles a few rank
    // percent on either side (value-relative checks break on heavy
    // tails where neighboring order statistics differ by 25%+)
    val brackets = ev.groupBy("event_type")
      .agg(expr("percentile(value, array(0.45, 0.55, 0.85, 0.95, 0.97, 1.0))")
        .as("b"))
      .collect()
      .map(r => r.getString(0) -> r.getSeq[Double](1)).toMap
    val apQ = Metrics.latencyQuantiles(ev, approx = true).collect()
      .map(r => r.getString(0) -> Seq(r.getDouble(1), r.getDouble(2),
        r.getDouble(3))).toMap
    assert(apQ.keySet == brackets.keySet)
    apQ.foreach { case (k, Seq(p50, p90, p99)) =>
      val b = brackets(k)
      assert(p50 >= b(0) && p50 <= b(1), s"$k p50=$p50 not in ${b(0)}..${b(1)}")
      assert(p90 >= b(2) && p90 <= b(3), s"$k p90=$p90 not in ${b(2)}..${b(3)}")
      assert(p99 >= b(4) && p99 <= b(5), s"$k p99=$p99 not in ${b(4)}..${b(5)}")
    }
  }

  test("counters by request class") {
    val c = Metrics.counters(sampleEvents.toDF).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(c == Map("click" -> 1L, "view" -> 3L))
  }

  test("streaming per-minute aggregation over MemoryStream matches batch") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Ev]
    // streaming forbids exact distinct aggs -> approx (Spark restriction,
    // and the 100 TB design choice anyway); compare against the same
    // aggregation applied in batch mode.
    val agg = MetricsStream.perMinute(mem.toDF)
    val q = agg.writeStream.outputMode("complete")
      .format("memory").queryName("metrics_out").start()
    try {
      mem.addData(sampleEvents.collect().toIndexedSeq: _*)
      q.processAllAvailable()
      val got = spark.table("metrics_out").orderBy("window_start").collect()
      val want = MetricsStream.perMinute(sampleEvents.toDF)
        .orderBy("window_start").collect()
      assert(got.map(_.toSeq).toSeq == want.map(_.toSeq).toSeq)
    } finally q.stop()
  }

  test("streaming session windows merge within gap, close on watermark") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Ev]
    val q = MetricsStream.sessions(mem.toDF, gap = "30 seconds",
        watermark = "10 seconds")
      .writeStream.outputMode("append")
      .format("memory").queryName("sessions_out").start()
    try {
      // user 7: two events 10s apart (one session), then a 2-min gap
      // (new session); user 8: one event
      mem.addData(
        Ev(1, ts("2024-01-01 10:00:00"), 7, "view", 2.0),
        Ev(2, ts("2024-01-01 10:00:10"), 7, "view", 4.0),
        Ev(3, ts("2024-01-01 10:00:05"), 8, "view", 6.0))
      q.processAllAvailable()
      // advance event time far past the watermark so sessions close
      mem.addData(Ev(4, ts("2024-01-01 10:05:00"), 7, "view", 8.0))
      q.processAllAvailable()
      mem.addData(Ev(5, ts("2024-01-01 10:30:00"), 9, "view", 1.0))
      q.processAllAvailable()
      val rows = spark.table("sessions_out").collect()
        .map(r => (r.getLong(0), r.getLong(3), r.getDouble(4))).toSet
      // closed: user 7's merged 2-event session, user 7's 10:05
      // singleton, user 8's singleton; user 9's session is still open
      // (nothing past its watermark) and must NOT appear
      assert(rows == Set((7L, 2L, 3.0), (7L, 1L, 8.0), (8L, 1L, 6.0)))
    } finally q.stop()
  }

  test("stateful per-user counts accumulate across micro-batches") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Ev]
    val q = MetricsStream.runningUserCounts(mem.toDF)
      .writeStream.outputMode("update")
      .format("memory").queryName("user_counts").start()
    try {
      mem.addData(Ev(1, ts("2024-01-01 10:00:05"), 7, "view", 1.0),
        Ev(2, ts("2024-01-01 10:00:06"), 7, "view", 1.0),
        Ev(3, ts("2024-01-01 10:00:07"), 8, "view", 1.0))
      q.processAllAvailable()
      mem.addData(Ev(4, ts("2024-01-01 10:00:08"), 7, "view", 1.0))
      q.processAllAvailable()
      // last emitted value per user reflects lifetime totals
      val last = spark.table("user_counts").groupBy("user_id")
        .agg(max("n").as("n")).collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(last == Map(7L -> 3L, 8L -> 1L))
    } finally q.stop()
  }

  test("streaming watermark drops state for closed windows (append mode)") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Ev]
    val agg = MetricsStream.perMinute(mem.toDF, watermark = "1 minute")
    val q = agg.writeStream.outputMode("append")
      .format("memory").queryName("metrics_append").start()
    try {
      mem.addData(Ev(1, ts("2024-01-01 10:00:05"), 1, "view", 1.0))
      q.processAllAvailable()
      // advance event time far enough to close the 10:00 window
      mem.addData(Ev(2, ts("2024-01-01 10:05:00"), 2, "view", 2.0))
      q.processAllAvailable()
      val emitted = spark.table("metrics_append").collect()
      assert(emitted.map(_.getAs[java.sql.Timestamp]("window_start")).toSet
        .contains(ts("2024-01-01 10:00:00")))
    } finally q.stop()
  }

  test("watermark-bounded dedup suppresses repeats inside the horizon") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Ev]
    val q = MetricsStream.dedupBounded(mem.toDF, Seq("user_id"),
        watermark = "1 minute")
      .writeStream.outputMode("append")
      .format("memory").queryName("dedup_bounded").start()
    try {
      mem.addData(
        Ev(1, ts("2024-01-01 10:00:00"), 7, "view", 1.0),
        Ev(2, ts("2024-01-01 10:00:20"), 7, "view", 2.0), // dup, in horizon
        Ev(3, ts("2024-01-01 10:00:30"), 8, "view", 3.0))
      q.processAllAvailable()
      assert(spark.table("dedup_bounded").select("event_id")
        .as[Long].collect().toSet == Set(1L, 3L))
      // same key again within the horizon and in the same batch: still out
      mem.addData(Ev(4, ts("2024-01-01 10:00:40"), 7, "view", 4.0))
      q.processAllAvailable()
      assert(spark.table("dedup_bounded").select("event_id")
        .as[Long].collect().toSet == Set(1L, 3L))
      // advance event time far past the watermark: user 7's entry ages
      // out of state, so a MUCH later "duplicate" re-emits — the
      // documented bounded-state trade
      mem.addData(Ev(5, ts("2024-01-01 10:30:00"), 9, "view", 5.0))
      q.processAllAvailable()
      mem.addData(Ev(6, ts("2024-01-01 10:30:10"), 7, "view", 6.0))
      q.processAllAvailable()
      assert(spark.table("dedup_bounded").select("event_id")
        .as[Long].collect().toSet == Set(1L, 3L, 5L, 6L))
    } finally q.stop()
  }

  test("stream-stream interval join matches within the window only") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val impressions = MemoryStream[Ev]
    val clicks = MemoryStream[Ev]
    val q = MetricsStream.intervalJoin(impressions.toDF, clicks.toDF,
        key = "user_id", within = "30 seconds", watermark = "10 seconds")
      .writeStream.outputMode("append")
      .format("memory").queryName("ivjoin").start()
    try {
      impressions.addData(
        Ev(1, ts("2024-01-01 10:00:00"), 7, "imp", 1.0),
        Ev(2, ts("2024-01-01 10:00:00"), 8, "imp", 2.0))
      clicks.addData(
        Ev(3, ts("2024-01-01 10:00:20"), 7, "click", 30.0), // in window
        Ev(4, ts("2024-01-01 10:02:00"), 8, "click", 40.0)) // too late
      q.processAllAvailable()
      // advance both watermarks so results finalize
      impressions.addData(Ev(5, ts("2024-01-01 10:10:00"), 99, "imp", 0.0))
      clicks.addData(Ev(6, ts("2024-01-01 10:10:00"), 98, "click", 0.0))
      q.processAllAvailable()
      val rows = spark.table("ivjoin")
        .select("user_id", "lvalue", "rvalue").collect()
        .map(r => (r.getLong(0), r.getDouble(1), r.getDouble(2))).toSet
      assert(rows == Set((7L, 1.0, 30.0)))
    } finally q.stop()
  }
}
