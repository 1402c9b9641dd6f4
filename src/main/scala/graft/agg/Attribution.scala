package graft.agg

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Conversion attribution and event-transition analysis over trails — the
  * other two cursor-walk analyses reference users hand-roll beside funnels
  * and sessionization (walk a trail, remember the last marketing touch,
  * credit it when a conversion arrives; or count consecutive event-type
  * transitions — reference doc/docs/tutorial.md cursor-loop pattern).
  *
  * Both are ONE uuid-shuffle window/groupBy passes over the trail order
  * `(time, seq)` — no self-joins, no per-trail collect to the driver.
  */
object Attribution {

  /** Last-touch attribution: for every conversion event, the most recent
    * touch event STRICTLY earlier in the trail order `(time, seq)` and no
    * older than `lookback` seconds (half-open: touch.time >
    * conv.time − lookback, mirroring the reference's half-open time-range
    * filters). Conversions with no touch in the window attribute to
    * `"direct"` with a NULL touch time.
    *
    * The touch's `(time, type)` travel as ONE struct through the window, so
    * both output columns always come from the same touch event (the as-of
    * join lesson: carrying columns independently can mix rows).
    *
    * Scale shape: one window pass partitioned by uuid — the shuffle carries
    * events once; no join between a conversions table and a touches table
    * (which would shuffle the corpus twice and need the same window anyway
    * for the strictly-before semantics).
    *
    * Output: one row per conversion —
    * (uuid, time, seq, channel, touch_time).
    */
  def lastTouch(df: DataFrame, touchTypes: Seq[String],
      conversionType: String, lookback: Long,
      uuidCol: String = "uuid", timeCol: String = "time",
      typeCol: String = "event_type", seqCol: String = "seq"): DataFrame = {
    require(touchTypes.nonEmpty, "lastTouch needs at least one touch type")
    require(lookback > 0, s"lookback must be positive, got $lookback")
    // the windowFunnel exclude/steps disjointness discipline: a
    // conversion type that is ALSO a touch type would credit repeat
    // conversions to the previous conversion — plausible-looking but
    // meaningless attribution from a configuration slip
    require(!touchTypes.contains(conversionType),
      s"conversionType '$conversionType' must not also be a touch type")
    val w = Window.partitionBy(uuidCol)
      .orderBy(col(timeCol), col(seqCol))
      .rowsBetween(Window.unboundedPreceding, -1)
    val et = coalesce(col(typeCol), lit(""))
    // Only touch and conversion rows can affect the result (every other
    // row contributes a null to the ignoreNulls carry and never survives
    // the conversion filter) — pre-filtering them out of the window
    // shrinks the uuid shuffle and the per-trail window state to the
    // relevant subset, which is what makes a whale trail of mostly
    // irrelevant events cheap.
    val relevant = df.filter(et.isin((touchTypes :+ conversionType).map(lit): _*))
    val touch = last(
      when(et.isin(touchTypes.map(lit): _*),
        struct(col(timeCol).cast("long").as("t"), et.as("c"))),
      ignoreNulls = true).over(w)
    relevant.withColumn("_touch", touch)
      .filter(et === conversionType)
      .select(col(uuidCol), col(timeCol), col(seqCol),
        when(col("_touch").isNotNull &&
            col("_touch.t") > col(timeCol).cast("long") - lookback,
          col("_touch.c")).otherwise("direct").as("channel"),
        when(col("_touch").isNotNull &&
            col("_touch.t") > col(timeCol).cast("long") - lookback,
          col("_touch.t")).as("touch_time"))
  }

  /** Position-based (U-shaped) multi-touch attribution: every conversion
    * splits credit across ALL its in-window touches — first and last touch
    * get `endWeight` each, middles share the remainder evenly; 1 touch
    * takes full credit, 2 touches split 50/50, none credits `"direct"`.
    * Credits are rounded to 6 places (one double division of exact
    * operands) so the split is engine-replayable.
    *
    * Same one-pass shape as [[lastTouch]], but the window carries the
    * whole strictly-before prefix (collect_list over the same frame) and
    * the in-window touch subset is cut by a codegen'd higher-order filter
    * — no UDF, no conversions×touches join. The CARRIED prefix is the
    * trail's prior touches (the relevant-rows pre-filter keeps everything
    * else out of the window); the lookback cut bounds only the
    * per-conversion OUTPUT list, so for touch-dominated whale trails
    * prefer [[lastTouch]]'s O(1) carry.
    *
    * Output: one row per (conversion, credited touch) —
    * (uuid, time, seq, pos, channel, touch_time, credit); `pos` is the
    * 1-based touch position in trail order, 0 for the direct row.
    */
  def multiTouch(df: DataFrame, touchTypes: Seq[String],
      conversionType: String, lookback: Long, endWeight: Double = 0.4,
      uuidCol: String = "uuid", timeCol: String = "time",
      typeCol: String = "event_type", seqCol: String = "seq"): DataFrame = {
    require(touchTypes.nonEmpty, "multiTouch needs at least one touch type")
    require(lookback > 0, s"lookback must be positive, got $lookback")
    require(endWeight > 0 && endWeight < 0.5, s"endWeight $endWeight out of (0, 0.5)")
    require(!touchTypes.contains(conversionType),
      s"conversionType '$conversionType' must not also be a touch type")
    val w = Window.partitionBy(uuidCol)
      .orderBy(col(timeCol), col(seqCol))
      .rowsBetween(Window.unboundedPreceding, -1)
    val et = coalesce(col(typeCol), lit(""))
    // Same relevant-rows pre-filter as lastTouch: collect_list skips the
    // nulls non-touch rows produce, so dropping them first is
    // output-identical and keeps the carried prefix (and the shuffle)
    // touch-only.
    val relevant = df.filter(et.isin((touchTypes :+ conversionType).map(lit): _*))
    val prefix = collect_list(
      when(et.isin(touchTypes.map(lit): _*),
        struct(col(timeCol).cast("long").as("t"), et.as("c")))).over(w)
    val withTouches = relevant.withColumn("_pre", prefix)
      .filter(et === conversionType)
      .withColumn("_touches", filter(col("_pre"),
        x => x.getField("t") > col(timeCol).cast("long") - lookback))
    val n = size(col("_touches"))
    val credited = withTouches.withColumn("_arr",
      when(n === 0, array(struct(
        lit(null).cast("long").as("t"), lit("direct").as("c"))))
        .otherwise(col("_touches")))
    credited.select(col(uuidCol), col(timeCol), col(seqCol), n.as("_n"),
        posexplode(col("_arr")).as(Seq("_p", "_x")))
      .select(col(uuidCol), col(timeCol), col(seqCol),
        when(col("_n") === 0, 0L).otherwise(col("_p") + 1).cast("long").as("pos"),
        col("_x.c").as("channel"), col("_x.t").as("touch_time"),
        when(col("_n") <= 1, 1.0)
          .when(col("_n") === 2, 0.5)
          .when(col("_p") === 0 || col("_p") === col("_n") - 1, endWeight)
          .otherwise(round(lit(1.0 - 2 * endWeight) / (col("_n") - 2), 6))
          .as("credit"))
  }

  /** First-order Markov transition matrix over event types: count every
    * consecutive `(from, to)` pair in trail order and derive the row-
    * normalized transition probability. The probability is ONE double
    * division of two exact integers, rounded to 6 places — replayable by
    * any engine dividing the same operands.
    *
    * Scale shape: one window `lead` pass on the uuid shuffle, then a
    * (|types|²)-sized aggregation — map-side combine reduces each partition
    * to at most |types|² rows before the second (tiny) shuffle.
    *
    * Output: (from_type, to_type, cnt, p) — p = cnt / Σ cnt over from_type.
    */
  def transitions(df: DataFrame,
      uuidCol: String = "uuid", timeCol: String = "time",
      typeCol: String = "event_type", seqCol: String = "seq"): DataFrame = {
    val w = Window.partitionBy(uuidCol).orderBy(col(timeCol), col(seqCol))
    val et = coalesce(col(typeCol), lit(""))
    val pairs = df
      .select(et.as("from_type"), lead(et, 1).over(w).as("to_type"))
      .filter(col("to_type").isNotNull)
    val counts = pairs.groupBy("from_type", "to_type").agg(count(lit(1)).as("cnt"))
    val fromW = Window.partitionBy("from_type")
    counts.withColumn("p",
      round(col("cnt").cast("double") / sum(col("cnt")).over(fromW), 6))
  }
}
