package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.metrics.Metrics

/** Structured Streaming form of the per-minute metrics engine.
  *
  * Reference semantics (/root/reference/src/metrics.rs:90-137): 60 s
  * tumbling windows over request events; counters, exact distinct users,
  * average latency, average message size; state cleared on emit.
  *
  * Divergence, documented per SURVEY §2 T3: the reference aggregates on
  * PROCESSING time (in-process events cannot be late), so it needs no
  * watermark. The event-time port uses a configurable watermark; with
  * `update` output mode each tick emits the current value of touched
  * windows (the moral equivalent of the reference's per-tick gauge
  * publish), and state for windows older than the watermark is dropped
  * (the reference's `clear()`).
  *
  * Scale: streaming groupBy(window) keeps state per (window) only —
  * constant size; distinct users uses approx_count_distinct at scale
  * (the exact HashSet would not fit at 100 TB/day either); the exact
  * variant is kept for oracle parity in batch.
  */
object MetricsStream {

  /** Windowed aggregation over a (possibly streaming) events DF with
    * schema (ts timestamp, user_id, event_type, value, event_id). */
  def perMinute(events: DataFrame, watermark: String = "2 minutes",
                exactDistinct: Boolean = false): DataFrame = {
    val distinctAgg =
      if (exactDistinct) countDistinct(col("user_id"))
      else approx_count_distinct(col("user_id"))
    events
      .withWatermark("ts", watermark)
      .withColumn("size_bytes", col("event_id") % 4096 + 128)
      .groupBy(window(col("ts"), "1 minute"))
      .agg(
        count(lit(1)).as("queries_served"),
        distinctAgg.as("unique_users"),
        Metrics.gridAvg(col("value")).as("avg_latency"),
        (sum(col("size_bytes")) / count(lit(1))).as("avg_size_bytes"))
      .select(col("window.start").as("window_start"),
        col("queries_served"), col("unique_users"),
        col("avg_latency"), col("avg_size_bytes"))
  }

  /** Lifetime counters by request class (A1), streaming-compatible. */
  def counters(events: DataFrame): DataFrame =
    events.groupBy(col("event_type")).agg(count(lit(1)).as("n"))

  /** Event-time session windows: Spark's native `session_window` merges
    * a user's events whose gaps stay under `gap` into one growing
    * window; the watermark closes sessions and bounds state (only open
    * sessions are held, sharded by user across executors — the
    * streaming form of the batch sessionization in
    * [[graft.metrics.Metrics.sessionize]]). Emits one row per CLOSED
    * session in append mode. */
  def sessions(events: DataFrame, gap: String = "30 seconds",
               watermark: String = "10 seconds"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(col("user_id"), session_window(col("ts"), gap))
      .agg(count(lit(1)).as("n_events"),
        Metrics.gridAvg(col("value")).as("avg_value"))
      .select(col("user_id"),
        col("session_window.start").as("session_start"),
        col("session_window.end").as("session_end"),
        col("n_events"), col("avg_value"))

  /** Watermark-bounded streaming dedup: suppress rows whose `keys`
    * repeat within the watermark horizon, holding state ONLY for keys
    * younger than the watermark (`dropDuplicatesWithinWatermark`) —
    * the scale form of the unbounded `dropDuplicates` corpus dedup,
    * whose seen-set grows with unique content forever. The trade is
    * explicit: a duplicate arriving after its original aged out of the
    * watermark re-emits, which is the standard at-scale contract
    * (dedup exactly within the lateness bound, best-effort beyond). */
  def dedupBounded(events: DataFrame, keys: Seq[String],
                   watermark: String = "1 minute"): DataFrame =
    events.withWatermark("ts", watermark)
      .dropDuplicatesWithinWatermark(keys)

  /** Stream-stream interval join: match each `right` event to `left`
    * events of the same `key` whose timestamp falls in
    * [right.ts - `within`, right.ts] — the impression→click /
    * request→response correlation shape. Both sides carry watermarks,
    * so the join buffers ONLY rows inside the interval + lateness
    * horizon (bounded state, Spark evicts older buffered rows); an
    * unbounded stream-stream join would hold both streams forever.
    * Inputs must expose (`key`, ts, value); output is one row per
    * matched pair. */
  def intervalJoin(left: DataFrame, right: DataFrame, key: String,
                   within: String = "30 seconds",
                   watermark: String = "10 seconds"): DataFrame = {
    val l = left.withWatermark("ts", watermark)
      .select(col(key).as("lkey"), col("ts").as("lts"),
        col("value").as("lvalue"))
    val r = right.withWatermark("ts", watermark)
      .select(col(key).as("rkey"), col("ts").as("rts"),
        col("value").as("rvalue"))
    l.join(r, col("lkey") === col("rkey") &&
      col("lts") <= col("rts") &&
      col("lts") >= col("rts") - expr(s"interval $within"))
      .select(col("lkey").as(key), col("lts"), col("rts"),
        col("lvalue"), col("rvalue"))
  }

  /** T2 manual-state analogue: per-user lifetime request counts via
    * flatMapGroupsWithState — the explicit form of the reference's
    * mutable per-key state (src/metrics.rs:74-77), emitting the updated
    * count on every batch a user appears in. State is one long per user
    * (bounded); at 100 TB-of-events scale the state store shards by the
    * group key across executors. */
  def runningUserCounts(events: DataFrame): DataFrame = {
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
    val spark = events.sparkSession
    import spark.implicits._
    events.select(col("user_id").cast("long")).as[Long]
      .groupByKey(identity)
      .flatMapGroupsWithState[Long, (Long, Long)](
        OutputMode.Update, GroupStateTimeout.NoTimeout) {
        (user: Long, rows: Iterator[Long], state: GroupState[Long]) =>
          val total = state.getOption.getOrElse(0L) + rows.size
          state.update(total)
          Iterator((user, total))
      }
      .toDF("user_id", "n")
  }
}
