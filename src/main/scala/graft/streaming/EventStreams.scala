package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Streaming aggregations over the events table — the engine's stand-in for
  * the reference's materialized views (continuous SELECT-driven derived
  * tables, reference `sharding_recreation.py:81-92`), which the reference
  * itself never auto-populates (`sharding_recreation.py:115-118,258-266`).
  *
  * Each transform takes a DataFrame that can be static (batch backfill /
  * DuckDB-oracle path) or streaming (`readStream`) — the plan is identical,
  * which is exactly Spark's MV replacement story: one definition, batch
  * backfill + incremental streaming refresh.
  *
  * Watermarks bound state (10-minute lateness on hourly windows; session
  * gap of 30 minutes), so state size at 100 TB/day scales with active keys
  * per window, not history.
  */
object EventStreams {

  /** Tumbling hourly counts per event type. */
  def hourlyCounts(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "10 minutes")
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n"), sum("value").as("total_value"))

  /** Sliding one-hour windows advancing every 30 minutes. */
  def slidingCounts(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "10 minutes")
      .groupBy(window(col("ts"), "1 hour", "30 minutes"), col("event_type"))
      .agg(count(lit(1)).as("n"), sum("value").as("total_value"))

  /** Gap-based sessionization (30-minute inactivity closes a session). */
  def sessionAgg(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "10 minutes")
      .groupBy(session_window(col("ts"), "30 minutes"), col("user_id"))
      .agg(count(lit(1)).as("n_events"), sum("value").as("session_value"))
}
