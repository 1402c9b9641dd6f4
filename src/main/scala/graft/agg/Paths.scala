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
}
