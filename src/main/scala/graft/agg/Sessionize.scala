package graft.agg

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.core.TrailSchema

/** Sessionization — the reference's canonical application-level aggregate
  * (reference: examples/tutorial_wikipedia_sessions.c:60-87 — a new session
  * starts when the gap to the previous event exceeds a threshold; the
  * tutorial counts sessions and events per trail).
  *
  * Spark-native: one window (lag → gap flag → running sum = session id) —
  * a single shuffle on uuid, all expressions codegen'd. At 100 TB this is
  * the right shape: the shuffle partitions by trail, each trail sorts
  * locally; no driver state, no skew beyond the largest single trail.
  */
object Sessionize {

  /** Assign a session id (0-based, per trail) to every event.
    * Gap semantics match the tutorial: a new session starts when
    * time - prev_time > gapSeconds (strictly greater, tutorial uses
    * `> SESSION_LIMIT` with 30-min limit). */
  def withSessionIds(events: DataFrame, gapSeconds: Long,
      uuidCol: String = TrailSchema.UuidCol,
      timeCol: String = TrailSchema.TimeCol,
      tiebreak: Seq[String] = Seq(TrailSchema.SeqCol)): DataFrame = {
    require(gapSeconds > 0, s"gapSeconds must be positive, got $gapSeconds")
    // Tiebreak makes window order total when timestamps collide (common
    // after second-truncation) — required for deterministic output.
    val orderCols = (timeCol +: tiebreak.filter(events.columns.contains)).map(col)
    val w = Window.partitionBy(uuidCol).orderBy(orderCols: _*)
    val isNew = when(
      col(timeCol) - lag(col(timeCol), 1).over(w) > gapSeconds, 1L
    ).otherwise(0L)
    events
      .withColumn("_new_session", isNew)
      .withColumn("session_id",
        sum(col("_new_session")).over(w.rowsBetween(Window.unboundedPreceding, 0)))
      .drop("_new_session")
  }

  /** Per-trail rollup: number of sessions and events — the tutorial's
    * output (tutorial_wikipedia_sessions.c:79-87 prints
    * "trails had N sessions / M events"). */
  def sessionCounts(events: DataFrame, gapSeconds: Long,
      uuidCol: String = TrailSchema.UuidCol,
      timeCol: String = TrailSchema.TimeCol): DataFrame =
    withSessionIds(events, gapSeconds, uuidCol, timeCol)
      .groupBy(uuidCol)
      .agg(
        (max("session_id") + 1).as("num_sessions"),
        count(lit(1)).as("num_events"))

  /** Per-session stats: start/end/duration/event count. */
  def sessionStats(events: DataFrame, gapSeconds: Long,
      uuidCol: String = TrailSchema.UuidCol,
      timeCol: String = TrailSchema.TimeCol): DataFrame =
    withSessionIds(events, gapSeconds, uuidCol, timeCol)
      .groupBy(col(uuidCol), col("session_id"))
      .agg(
        min(timeCol).as("session_start"),
        max(timeCol).as("session_end"),
        (max(timeCol) - min(timeCol)).as("duration"),
        count(lit(1)).as("n_events"))
}
