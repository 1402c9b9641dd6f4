package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Streaming extension (beyond reference parity — the reference is batch-
  * only with periodic shard shipping, doc/docs/index.md:43-48; its
  * incremental story is shard-then-merge). Structured Streaming gives the
  * same trail semantics over an unbounded source:
  *
  *  - `session_window` aggregation = the tutorial's 30-min sessionization
  *    (examples/tutorial_wikipedia_sessions.c) with event-time semantics
  *  - watermarks bound state for late events — at scale, state store size
  *    is O(active sessions), not O(history)
  */
object StreamSessions {

  /** Per-(uuid, session) rollup over a streaming trail source.
    * `events` must be a streaming DataFrame with uuid + a timestamp column.
    */
  def sessionCounts(events: DataFrame, gap: String = "30 minutes",
      watermark: String = "1 hour", uuidCol: String = "uuid",
      tsCol: String = "ts"): DataFrame =
    events
      .withWatermark(tsCol, watermark)
      .groupBy(col(uuidCol), session_window(col(tsCol), gap))
      .agg(count(lit(1)).as("n_events"))
      .select(col(uuidCol),
        col("session_window.start").as("session_start"),
        col("session_window.end").as("session_end"),
        col("n_events"))

  /** Windowed event-type rates (the generic streaming rollup). */
  def eventRates(events: DataFrame, window: String = "5 minutes",
      watermark: String = "1 hour", typeCol: String = "event_type",
      tsCol: String = "ts"): DataFrame =
    events
      .withWatermark(tsCol, watermark)
      .groupBy(org.apache.spark.sql.functions.window(col(tsCol), window), col(typeCol))
      .agg(count(lit(1)).as("n"))
      .select(col("window.start").as("window_start"), col(typeCol), col("n"))
}
