package graft.agg

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

import scala.collection.mutable.ArrayBuffer

/** Single-pass session counting WITHOUT a per-trail window sort
  * (SURVEY §4.2 — the custom-aggregate candidate for 100 TB).
  *
  * The window-lag formulation ([[Sessionize]]) shuffles every raw event to
  * its trail's partition and sorts it there. This aggregator instead keeps,
  * per trail, the set of session intervals [start,end] merged under the
  * gap rule — a commutative, associative buffer — so Spark's partial
  * aggregation applies: each map task pre-collapses its events into a few
  * intervals and the shuffle carries ~sessions×16 bytes per trail per
  * partition instead of every event. Exact (not approximate): merging
  * interval sets under "gap ≤ limit ⇒ same session" is order-independent.
  */
final case class SessionIntervals(gapSeconds: Long)
    extends Aggregator[Long, ArrayBuffer[(Long, Long)], Long] {

  override def zero: ArrayBuffer[(Long, Long)] = ArrayBuffer.empty

  /** Insert a timestamp as a degenerate interval, merging neighbors. */
  override def reduce(buf: ArrayBuffer[(Long, Long)], t: Long): ArrayBuffer[(Long, Long)] =
    insert(buf, (t, t))

  override def merge(a: ArrayBuffer[(Long, Long)],
      b: ArrayBuffer[(Long, Long)]): ArrayBuffer[(Long, Long)] = {
    var out = a
    b.foreach(iv => out = insert(out, iv))
    out
  }

  override def finish(buf: ArrayBuffer[(Long, Long)]): Long = buf.length.toLong

  /** Insert interval `iv`, merging every interval within gapSeconds of it.
    * Buffer is kept sorted by start; binary search + local merge. */
  private def insert(buf: ArrayBuffer[(Long, Long)],
      iv: (Long, Long)): ArrayBuffer[(Long, Long)] = {
    var (s, e) = iv
    // find insertion window: all intervals with start <= e + gap and
    // end >= s - gap merge into one. The buffer holds DISJOINT intervals
    // sorted by start, so ends are increasing too — lower-bound binary
    // search for the first end >= s - gap (the hi walk past it only
    // visits intervals that are then merged away, so it is amortized
    // O(1) and insert is O(log sessions) as documented).
    var lo = {
      var l = 0
      var h = buf.length
      while (l < h) {
        val m = (l + h) >>> 1
        if (buf(m)._2 < s - gapSeconds) l = m + 1 else h = m
      }
      l
    }
    var hi = lo
    while (hi < buf.length && buf(hi)._1 <= e + gapSeconds) {
      s = math.min(s, buf(hi)._1)
      e = math.max(e, buf(hi)._2)
      hi += 1
    }
    buf.remove(lo, hi - lo)
    buf.insert(lo, (s, e))
    buf
  }

  override def bufferEncoder: Encoder[ArrayBuffer[(Long, Long)]] =
    Encoders.kryo[ArrayBuffer[(Long, Long)]]
  override def outputEncoder: Encoder[Long] = Encoders.scalaLong
}
