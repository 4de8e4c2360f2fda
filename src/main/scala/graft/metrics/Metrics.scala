package graft.metrics

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Per-minute metrics aggregation (SURVEY §2.4 A1-A5, §2.7 T1-T4).
  *
  * Reference semantics (/root/reference/src/metrics.rs:90-137): a 60 s
  * tumbling window over request events producing request counters, exact
  * distinct-user count, average backend latency and average message size;
  * window state is reset on emit (= tumbling-window close).
  *
  * Batch form here (oracle-checkable); the Structured Streaming form with
  * identical aggregations lives in [[graft.streaming.MetricsStream]].
  *
  * Exactness: averages are computed as sum(round(x*100))/100/count —
  * the fixture doubles sit on a 2-decimal grid, so every partial sum is an
  * exact integer and the result is bit-identical regardless of partial
  * aggregation order (Spark map-side combine) or engine (DuckDB oracle).
  *
  * Scale: groupBy(window) is a hash aggregate with map-side partial
  * aggregation; distinct-user per window shuffles (user_id, window) — at
  * 100 TB switch the exact countDistinct for approx_count_distinct (HLL)
  * to keep it one pass, as the reference's HashSet would not fit either.
  */
object Metrics {

  /** Exact grid-average (see class doc): bit-stable across engines. */
  def gridAvg(c: Column): Column =
    sum(round(c * 100)) / 100.0 / count(lit(1))

  private def minuteWindow: Column = window(col("ts"), "1 minute")

  /** A1: lifetime request counters by class. */
  def counters(events: DataFrame): DataFrame =
    events.groupBy("event_type").agg(count(lit(1)).as("n"))
      .orderBy("event_type")

  /** Distinct-user aggregation, exact or sketched. Exact countDistinct
    * shuffles (user_id, window) expanded rows — what the oracle needs and
    * what the reference's per-window HashSet computes. At 100 TB neither
    * fits: `approx = true` switches to approx_count_distinct (HLL++,
    * default 5% rsd), a one-pass mergeable sketch — the executable scale
    * path, not a comment. */
  private def uniqueUsers(approx: Boolean): Column =
    if (approx) approx_count_distinct(col("user_id")).as("unique_users")
    else countDistinct(col("user_id")).as("unique_users")

  /** A2: distinct users per 1-minute tumbling window. */
  def distinctUsersPerMinute(events: DataFrame,
                             approx: Boolean = false): DataFrame =
    events.groupBy(minuteWindow)
      .agg(uniqueUsers(approx))
      .select(col("window.start").as("window_start"), col("unique_users"))
      .orderBy("window_start")

  /** A3: average "latency" (value) per minute, exact grid average. */
  def avgLatencyPerMinute(events: DataFrame): DataFrame =
    events.groupBy(minuteWindow)
      .agg(gridAvg(col("value")).as("avg_latency"))
      .select(col("window.start").as("window_start"), col("avg_latency"))
      .orderBy("window_start")

  /** Gap-based sessionization: a new session starts when a user's gap
    * from their previous event exceeds `gapSeconds`. Two stacked
    * per-user windows (lag to flag session starts, running sum to
    * number sessions) — ONE shuffle on user_id, linear per user, the
    * standard scalable form (never a self-join on time ranges).
    * Timestamps compare as epoch micros: pure integer arithmetic,
    * engine-exact. */
  def sessionize(events: DataFrame, gapSeconds: Long): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("user_id")
      .orderBy(col("tus").asc, col("event_id").asc)
    val flagged = events
      .select(col("user_id"), col("event_id"),
        unix_micros(col("ts")).as("tus"))
      .withColumn("prev", lag(col("tus"), 1).over(w))
      .withColumn("new_session",
        (col("prev").isNull ||
          col("tus") - col("prev") > gapSeconds * 1000000L).cast("long"))
    flagged.withColumn("session_id",
      sum(col("new_session")).over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
  }

  /** Per-user session stats over [[sessionize]]: session count, events,
    * and the longest session's event count. All integers — exact. */
  def sessionStats(events: DataFrame, gapSeconds: Long): DataFrame =
    sessionize(events, gapSeconds)
      .groupBy("user_id", "session_id")
      .agg(count(lit(1)).as("n_events"))
      .groupBy("user_id")
      .agg(count(lit(1)).as("n_sessions"),
        sum(col("n_events")).as("n_events"),
        max(col("n_events")).as("max_session_events"))
      .orderBy("user_id")

  /** A1-A5 combined: the reference's full per-minute emit
    * (queries_served, unique_users, avg latency, avg size). Message size
    * stands in as an exact integer derived from the event id. */
  def perMinute(events: DataFrame, approx: Boolean = false): DataFrame =
    events
      .withColumn("size_bytes", col("event_id") % 4096 + 128)
      .groupBy(minuteWindow)
      .agg(
        count(lit(1)).as("queries_served"),
        uniqueUsers(approx),
        gridAvg(col("value")).as("avg_latency"),
        (sum(col("size_bytes")) / count(lit(1))).as("avg_size_bytes"))
      .select(col("window.start").as("window_start"),
        col("queries_served"), col("unique_users"),
        col("avg_latency"), col("avg_size_bytes"))
      .orderBy("window_start")

  /** A9: latency quantiles per event class. Exact percentile (linear
    * interpolation, oracle-matched) needs the group's values gathered
    * for a sort; `approx = true` swaps in approx_percentile — Spark's
    * one-pass mergeable quantile sketch with a bounded accuracy
    * parameter — which is the only shape that survives a 100 TB group.
    * Rounded to 4 decimals so the exact form is engine-stable. */
  def latencyQuantiles(events: DataFrame,
                       approx: Boolean = false): DataFrame = {
    val fn = if (approx) "approx_percentile" else "percentile"
    events.groupBy("event_type")
      .agg(
        round(expr(s"$fn(value, 0.5)"), 4).as("p50"),
        round(expr(s"$fn(value, 0.9)"), 4).as("p90"),
        round(expr(s"$fn(value, 0.99)"), 4).as("p99"))
      .orderBy("event_type")
  }
}
