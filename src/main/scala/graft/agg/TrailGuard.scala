package graft.agg

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.core.GraftError

/** Loud whale-trail refusal for operators that materialize a whole trail
  * (or a per-trail event subset) as one in-memory array row.
  *
  * `collect_list` does not spill per-group: at 100 TB a bot uuid holding
  * 10^7-10^8 events becomes a single array row that OOMs its executor or
  * turns into a terminal straggler. The reference engine never hits this
  * (it streams each trail through a cursor, src/tdb_decode.c, and holds
  * one event at a time); the Spark-native trail-sequence folds
  * ([[Funnel.windowFunnel]], the t_paths n-gram collect) genuinely need
  * the per-trail array, so they get the whale-cell refusal discipline of
  * ops/Dedup.scala instead: a cheap bounding pre-pass that refuses
  * BEFORE any array materializes.
  *
  * The pre-pass is a count-only aggregation, column-pruned to the key —
  * partial (map-side) counting shuffles one long per (uuid, input
  * partition), so its cost is a fraction of the main collect's and it
  * never materializes anything per-trail. Refusing before the collect is
  * the point: an in-plan `when(size(...) > cap, raise_error)` would only
  * fire AFTER the offending array is already resident (the OOM precedes
  * the error), the same reason TdbWriter bounds its lexicon with a
  * TakeOrdered cap+1 rather than a post-collect check.
  */
object TrailGuard {

  /** Default per-trail event bound. A collected event struct (long time,
    * long seq, short string type) costs ~50-100 B on-heap, so 2^20 events
    * ≈ 50-100 MB for the single worst row — survivable on a 4-8 GiB
    * executor, while anything past it is straggler/OOM territory. */
  val DefaultMaxTrailEvents: Long = 1L << 20

  /** Refuse loudly (GraftError.TrailTooLong, CLI exit 14) when any group
    * of `df` by `key` holds more than `maxEvents` rows. Runs eagerly at
    * operator-construction time — one count-only Spark job whose plan
    * reads just the key column — and names the offending uuid plus the
    * remediations (pre-filter to relevant event types; raise or disable
    * the bound) in the error. Returns `df` unchanged when bounded. */
  def requireBoundedTrails(df: DataFrame, key: Column, maxEvents: Long,
      op: String): DataFrame = {
    require(maxEvents > 0, s"$op: maxTrailEvents must be positive, got $maxEvents")
    val offender = df.groupBy(key.as("_k"))
      .agg(count(lit(1)).as("_n"))
      .filter(col("_n") > maxEvents)
      .limit(1).collect()
    offender.headOption.foreach { r =>
      throw GraftError.TrailTooLong(
        s"$op: trail ${r.get(0)} holds ${r.getLong(1)} events, over the " +
          s"maxTrailEvents bound of $maxEvents — collecting it as one " +
          "in-memory array row would OOM an executor. Use the bounded-" +
          "state streamed twin (Paths.topNgramsStreamed / " +
          "Funnel.windowFunnelStreamed — no per-trail array at any " +
          "length), pre-filter the input to the event types the operator " +
          "actually consumes, or pass a larger (or None) maxTrailEvents " +
          "if the executors are genuinely sized for this trail.")
    }
    df
  }
}
