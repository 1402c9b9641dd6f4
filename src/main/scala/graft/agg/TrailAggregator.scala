package graft.agg

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Typed per-trail aggregation — the Spark-native replacement for the
  * reference's "iterate a cursor and fold application state" pattern
  * (SURVEY §2.10; reference: util/traildb_bench.c:56-88 and the tutorial's
  * session loop). Users write an [[Aggregator]] over [[TrailEvent]]s and get
  * distributed partial aggregation (map-side combine) for free — unlike a
  * groupByKey+flatMapGroups cursor walk, no full per-trail shuffle of raw
  * events is required when the fold is associative.
  */
final case class TrailEvent(uuid: String, time: Long, fields: Map[String, String])

/** Example instance: per-trail summary (first/last time, event count) —
  * the metadata the reference exposes per trail plus the common first-touch
  * pattern. Merge is associative/commutative → safe as a partial agg. */
final case class TrailSummary(first: Long, last: Long, n: Long)

object TrailSummaryAggregator extends Aggregator[TrailEvent, TrailSummary, TrailSummary] {
  override def zero: TrailSummary = TrailSummary(Long.MaxValue, Long.MinValue, 0L)
  override def reduce(b: TrailSummary, e: TrailEvent): TrailSummary =
    TrailSummary(math.min(b.first, e.time), math.max(b.last, e.time), b.n + 1)
  override def merge(a: TrailSummary, b: TrailSummary): TrailSummary =
    TrailSummary(math.min(a.first, b.first), math.max(a.last, b.last), a.n + b.n)
  override def finish(r: TrailSummary): TrailSummary = r
  override def bufferEncoder: Encoder[TrailSummary] = Encoders.product[TrailSummary]
  override def outputEncoder: Encoder[TrailSummary] = Encoders.product[TrailSummary]
}
