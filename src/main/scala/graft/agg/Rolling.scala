package graft.agg

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Time-horizon trail aggregates — the "how active was this trail in the
  * last hour/day" family reference users hand-roll by walking a cursor and
  * keeping a deque of recent events (doc/docs/tutorial.md cursor-loop
  * pattern, generalized from the sessionization example).
  *
  * Both operators are ONE uuid-shuffle passes: a range-frame window for the
  * per-event trailing stats, a window + same-key aggregation for the decay
  * score (the aggregation rides the window's partitioning — no second
  * exchange; PlanGuardSpec pins that).
  */
object Rolling {

  /** Per-event trailing stats over the CLOSED horizon
    * `[time − horizon, time]` (an event at exactly time − horizon is
    * included — SQL RANGE-frame semantics, deliberately unlike the
    * half-open reference filters): how many events the trail produced in
    * the trailing window and their value sum. RANGE frame, not ROWS, so
    * same-timestamp peers are all included — deterministic under any
    * partition-internal order, and identical to SQL
    * `RANGE BETWEEN horizon PRECEDING AND CURRENT ROW`.
    *
    * `valueCol` should already be an exact (integer) representation — sums
    * of longs are order-independent, so the result is engine-replayable;
    * a double column would make the window sum order-sensitive.
    */
  def trailingStats(df: DataFrame, horizon: Long, valueCol: String,
      uuidCol: String = "uuid", timeCol: String = "time",
      seqCol: String = "seq"): DataFrame = {
    require(horizon > 0, s"horizon must be positive, got $horizon")
    val w = Window.partitionBy(uuidCol).orderBy(col(timeCol))
      .rangeBetween(-horizon, 0)
    df.select(col(uuidCol), col(timeCol), col(seqCol),
      count(lit(1)).over(w).as("n_win"),
      sum(col(valueCol)).over(w).as("sum_win"))
  }

  /** Per-trail exponential time-decay activity score:
    * `Σ_events exp((time − max_time_in_trail) / tau)` — the recency-weighted
    * engagement metric (a trail's most recent event contributes 1, an event
    * `tau` seconds older contributes 1/e). Normalizing against the trail's
    * OWN max keeps every term in (0, 1]: no overflow for any timestamp
    * epoch, unlike the exp(t/tau)/exp(t_ref/tau) factorization.
    *
    * Each term is rounded to integer micro-units before summing, so the
    * aggregate is an exact long — order-independent and replayable by any
    * engine with an IEEE-double `exp` (same contract as the LM scorers'
    * micro-nat sums).
    *
    * One uuid shuffle: the max-time window and the final aggregation share
    * the partitioning.
    */
  def decayScore(df: DataFrame, tau: Long,
      uuidCol: String = "uuid", timeCol: String = "time"): DataFrame = {
    require(tau > 0, s"tau must be positive, got $tau")
    val w = Window.partitionBy(uuidCol)
    df.withColumn("_mx", max(col(timeCol)).over(w))
      .groupBy(col(uuidCol))
      .agg(
        count(lit(1)).as("n_events"),
        max(col(timeCol)).as("last_time"),
        sum(round(exp((col(timeCol) - col("_mx")).cast("double") / tau.toDouble)
          * 1e6).cast("long")).as("score_micro"))
  }
}
