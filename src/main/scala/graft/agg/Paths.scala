package graft.agg

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Path mining: top event-type n-gram sequences across trails — the
  * cursor-walk sequence analysis reference users loop cursors for
  * (doc/docs/technical_overview.md trail model), as ONE uuid shuffle:
  * ordered per-trail sequence via sorted struct collect, n-gram explode,
  * count.
  *
  * This op genuinely needs the WHOLE trail in one array (the n-grams
  * span arbitrary event types), so it carries the loud [[TrailGuard]]
  * whale refusal instead of a pre-filter — a bot uuid holding 10^7+
  * events refuses with advice BEFORE the collect materializes it
  * (pass `maxTrailEvents = None` to waive on executors sized for it).
  */
object Paths {

  def topNgrams(df: DataFrame, n: Int = 3, limit: Int = 25,
      uuidCol: String = "uuid", timeCol: String = "time",
      typeCol: String = "event_type", seqCol: String = "seq",
      maxTrailEvents: Option[Long] = Some(TrailGuard.DefaultMaxTrailEvents)
  ): DataFrame = {
    require(n >= 1, s"n-gram size must be >= 1, got $n")
    val guarded = maxTrailEvents.fold(df)(m =>
      TrailGuard.requireBoundedTrails(df, col(uuidCol), m, "Paths.topNgrams"))
    val evs = transform(
      array_sort(collect_list(struct(col(timeCol), col(seqCol),
        coalesce(col(typeCol), lit("")).as("et")))),
      x => x.getField("et"))
    guarded.groupBy(col(uuidCol)).agg(evs.as("evs"))
      .filter(size(col("evs")) >= n)
      .select(explode(transform(sequence(lit(1), size(col("evs")) - (n - 1)),
        i => concat_ws(">", slice(col("evs"), i, lit(n))))).as("path"))
      .groupBy("path").agg(count(lit(1)).as("cnt"))
      .orderBy(col("cnt").desc, col("path")).limit(limit)
  }

  /** [[topNgrams]] as a STREAMING ring-buffer walk — identical results
    * (AggSpec proves ≡; the t_paths_streamed gate row replays the same
    * DuckDB oracle as t_paths) with NO whole-trail array and NO guard
    * needed at any trail length: an n-gram only ever needs the last n
    * events, so the per-partition state is one n-slot ring per OPEN
    * trail. Events hash-partition by uuid and sort within partitions
    * (one shuffle, same class as the groupBy); grams stream out through
    * a lazy flatMap — nothing buffers per trail OR per partition. The
    * whale-proof shape for path mining, same pattern as
    * [[Funnel.windowFunnelStreamed]].
    *
    * Precondition (streamed twins only): `time` and `seq` must be
    * NON-NULL — they deserialize into primitive Longs, so a null
    * (tolerated by the batch twin via SQL null ordering) throws at
    * runtime. Coalesce or filter nulls upstream if trails can carry
    * them. Null uuids are fine: they sort first and mine as one trail,
    * like the batch groupBy's null group. */
  def topNgramsStreamed(df: DataFrame, n: Int = 3, limit: Int = 25,
      uuidCol: String = "uuid", timeCol: String = "time",
      typeCol: String = "event_type", seqCol: String = "seq"): DataFrame = {
    require(n >= 1, s"n-gram size must be >= 1, got $n")
    val spark = df.sparkSession
    import spark.implicits._
    val sorted = df.select(
        col(uuidCol).cast("string").as("_u"),
        col(timeCol).cast("long").as("_t"),
        coalesce(col(typeCol), lit("")).as("_e"),
        col(seqCol).cast("long").as("_q"))
      .repartition(col("_u"))
      .sortWithinPartitions("_u", "_t", "_q", "_e")
      .as[(String, Long, String, Long)]
    sorted.mapPartitions { it =>
      var cur: String = null
      val ring = new Array[String](n)
      // Long, not Int: the whale trail this streamed twin exists for can
      // exceed 2^31 events, and an Int wrap would silently drop every
      // n-gram after it
      var filled = 0L
      // flatMap keeps this lazy: state advances only as the consumer
      // pulls — single-threaded per partition, so closure state is safe
      it.flatMap { case (u, _, e, _) =>
        if (u != cur) { cur = u; filled = 0 }
        var i = 0
        while (i < n - 1) { ring(i) = ring(i + 1); i += 1 }
        ring(n - 1) = e
        filled += 1
        if (filled >= n) Iterator.single(ring.mkString(">"))
        else Iterator.empty
      }
    }.toDF("path")
      .groupBy("path").agg(count(lit(1)).as("cnt"))
      .orderBy(col("cnt").desc, col("path")).limit(limit)
  }
}
