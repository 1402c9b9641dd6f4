package graft.agg

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Cohort activity matrix — the signup-week × weeks-since grid every
  * event-analytics team builds over trail data (the reference leaves it to
  * application loops over cursors, like the sessionization tutorial
  * doc/docs/tutorial.md): assign each trail to the bucket of its FIRST
  * event, then count active trails per (cohort, age) where age = activity
  * bucket − cohort bucket.
  *
  * Scale shape: ONE shuffle on uuid builds each trail's distinct bucket
  * set (bounded by the calendar — a whale trail with 10^8 events still
  * contributes ≤ #buckets rows), cohort = array_min inside that row, and
  * the final (cohort, age) aggregate is matrix-sized. No window, no join:
  * each uuid contributes each (cohort, age) cell at most once by
  * construction, so `count(*)` IS the distinct-trail count. */
object Cohorts {

  def matrix(df: DataFrame, bucketSeconds: Long = 604800L,
      uuidCol: String = "uuid", timeCol: String = "time"): DataFrame = {
    require(bucketSeconds > 0, s"bucketSeconds must be positive, got $bucketSeconds")
    // Integer DIV, not `/`: double division loses low bits on large
    // epochs. DIV truncates while the oracle's `//` floors — equal ONLY
    // because trail time is u64 by contract (TrailSchema: "u64 in the
    // reference"); enforce that rather than silently mis-bucketing a
    // pre-epoch timestamp into a double-width bucket 0.
    val perTrail = df
      .filter(col(timeCol) >= 0 || raiseNegative(timeCol))
      .select(col(uuidCol), expr(s"$timeCol DIV $bucketSeconds").as("_w"))
      .groupBy(col(uuidCol)).agg(collect_set(col("_w")).as("_ws"))
      .select(col(uuidCol), array_min(col("_ws")).as("cohort"),
        explode(col("_ws")).as("_w"))
    perTrail
      .groupBy(col("cohort"), (col("_w") - col("cohort")).as("age"))
      .agg(count(lit(1)).as("n_active"))
  }

  private def raiseNegative(timeCol: String) =
    // coalesce the rendered value: a NULL time also lands here (null >= 0
    // is null, so the guard's Or falls through) and a null concat operand
    // would raise with a BLANK message claiming "negative" for a NULL
    raise_error(concat(lit(
      "graft cohorts: negative or NULL time (trail time is u64 by " +
      "contract; truncating DIV would mis-bucket pre-epoch rows): "),
      coalesce(col(timeCol).cast("string"), lit("NULL")))).cast("boolean")

  /** Audience overlap between event types: for every unordered type pair
    * (a < b), how many trails contain BOTH — the co-occurrence matrix
    * behind "users who did X also did Y" segment analysis.
    *
    * Scale shape: one shuffle builds the distinct (uuid, type) set; a
    * whale trail with 10^8 events contributes ≤ |types| rows, so the
    * per-uuid self-join that forms pairs is bounded at |types|² per trail
    * and the final aggregate is |types|²-sized. As with [[matrix]],
    * `count(*)` IS the distinct-trail count — each trail emits each pair
    * at most once by construction. */
  def typeOverlap(df: DataFrame, uuidCol: String = "uuid",
      typeCol: String = "event_type"): DataFrame = {
    // NULL type coalesces to "" (the TrailSchema contract every sibling
    // operator applies) and the self-join key is null-safe, so
    // null-typed events and null-uuid trails count instead of silently
    // vanishing from the matrix
    val dt = df.select(col(uuidCol).as("_u"),
      coalesce(col(typeCol), lit("")).as("_t")).distinct()
    dt.as("a").join(dt.as("b"),
        col("a._u") <=> col("b._u") && col("a._t") < col("b._t"))
      .groupBy(col("a._t").as("type_a"), col("b._t").as("type_b"))
      .agg(count(lit(1)).as("n_trails"))
  }

  /** Inter-event gap histogram (round 8): the distribution of time deltas
    * between CONSECUTIVE events within a trail, in named engagement bands
    * — the "how bursty are my users" diagnostic behind every session-gap
    * choice (the 30-minute sessionization default is exactly a cut on
    * this histogram). Bands are explicit integer boundaries (same minute /
    * same hour / same day / longer), so the bucketing is engine-exact —
    * no log/float bucket edges to disagree on.
    *
    * Scale shape: ONE uuid window pass for the lag (trail-bounded
    * partitions — the t_rolling convention), then a 4-row aggregate. */
  def interEventGaps(df: DataFrame, uuidCol: String = "uuid",
      timeCol: String = "time", seqCol: String = "seq"): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(uuidCol).orderBy(col(timeCol), col(seqCol))
    df.select(col(uuidCol), col(timeCol),
        lag(col(timeCol), 1).over(w).as("_prev"))
      .filter(col("_prev").isNotNull)
      .select((col(timeCol) - col("_prev")).as("_gap"))
      .groupBy(
        when(col("_gap") < 60, "lt_1m")
          .when(col("_gap") < 3600, "1m_1h")
          .when(col("_gap") < 86400, "1h_1d")
          .otherwise("ge_1d").as("gap_band"))
      .agg(count(lit(1)).as("n_gaps"))
  }

  /** Day-of-week × hour activity matrix (round 8): the weekly heatmap of
    * event volume — a per-EVENT grid, so no trail key is involved. Pure
    * integer epoch arithmetic — dow = (days since epoch + 4) mod 7 with
    * 0 = Sunday (1970-01-01 was a Thursday), hour = seconds-into-day DIV
    * 3600 — so the grid is engine-exact with no timezone or calendar
    * library in either engine (trail time is epoch-second u64 by
    * contract, application-defined epoch per the reference). One
    * map-side-combined groupBy into a ≤168-cell grid. */
  def activityMatrix(df: DataFrame, timeCol: String = "time"): DataFrame = {
    df.filter(col(timeCol) >= 0 || raiseNegative(timeCol))
      .groupBy(
        expr(s"($timeCol DIV 86400 + 4) % 7").as("dow"),
        expr(s"($timeCol % 86400) DIV 3600").as("hour"))
      .agg(count(lit(1)).as("n_events"))
  }

  /** Conversion-latency histogram: per trail, the time from the FIRST
    * `fromType` event to the first `toType` event at-or-after it, bucketed
    * (default: hours) — "how long from signup to purchase", the companion
    * the funnel operators' yes/no answer lacks.
    *
    * Trails with no `fromType`, or no `toType` at-or-after it, are absent
    * (they never converted — the funnel ops count those). Scale shape: two
    * type-filtered min-aggregates on uuid (map-side combined — a whale
    * trail folds to one row per side) joined on uuid, then a
    * histogram-sized final aggregate. No window, no event×event join. */
  def conversionLatency(df: DataFrame, fromType: String, toType: String,
      bucketSeconds: Long = 3600L, uuidCol: String = "uuid",
      typeCol: String = "event_type", timeCol: String = "time"): DataFrame = {
    require(bucketSeconds > 0, s"bucketSeconds must be positive, got $bucketSeconds")
    val f = df.filter(col(typeCol) === fromType)
      .groupBy(col(uuidCol)).agg(min(col(timeCol)).as("_tf"))
    df.filter(col(typeCol) === toType)
      .join(f, uuidCol)
      .filter(col(timeCol) >= col("_tf"))
      .groupBy(col(uuidCol)).agg(min(col(timeCol) - col("_tf")).as("_lat"))
      .groupBy(expr(s"_lat DIV $bucketSeconds").as("bucket"))
      .agg(count(lit(1)).as("n_trails"))
  }
}
