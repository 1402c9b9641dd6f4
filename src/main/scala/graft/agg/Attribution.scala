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
    val w = Window.partitionBy(uuidCol)
      .orderBy(col(timeCol), col(seqCol))
      .rowsBetween(Window.unboundedPreceding, -1)
    val et = coalesce(col(typeCol), lit(""))
    val touch = last(
      when(et.isin(touchTypes.map(lit): _*),
        struct(col(timeCol).cast("long").as("t"), et.as("c"))),
      ignoreNulls = true).over(w)
    df.withColumn("_touch", touch)
      .filter(et === conversionType)
      .select(col(uuidCol), col(timeCol), col(seqCol),
        when(col("_touch").isNotNull &&
            col("_touch.t") > col(timeCol).cast("long") - lookback,
          col("_touch.c")).otherwise("direct").as("channel"),
        when(col("_touch").isNotNull &&
            col("_touch.t") > col(timeCol).cast("long") - lookback,
          col("_touch.t")).as("touch_time"))
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
