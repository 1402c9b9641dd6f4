package graft.ops

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

import scala.collection.mutable

/** Bounded-memory sketches for corpus-scale statistics.
  *
  * At 100 TB, "top tokens" via a full `groupBy(token)` shuffles the entire
  * vocabulary (billions of keys for web text); a Misra-Gries summary instead
  * carries at most k counters per partial aggregate, merges associatively,
  * and still GUARANTEES that every token with true frequency > n/(k+1)
  * survives (the classic frequent-items bound; the merge rule is the
  * mergeable-summaries construction — combine counts, then subtract the
  * (k+1)-th largest count from all and drop non-positives — which preserves
  * the same error bound, Agarwal et al., PODS'12). Estimated counts
  * undercount by at most n/(k+1).
  *
  * The reference has no aggregation engine at all (SURVEY §2.4) — this is a
  * parity-plus operator in the same family as the salted aggregates
  * (core/Skew.scala): shuffle-bounded versions of aggregates that are
  * whale-key-hostile at scale.
  */
object Sketch {

  /** Misra-Gries frequent-items summary over a string column, as a typed
    * [[Aggregator]] so Spark's partial aggregation applies: each map task
    * folds its rows into a ≤k-entry map and the shuffle carries k counters
    * per partition, never the vocabulary.
    */
  final case class MisraGries(k: Int)
      extends Aggregator[String, mutable.HashMap[String, Long], Map[String, Long]] {
    require(k > 0, s"k must be positive, got $k")

    override def zero: mutable.HashMap[String, Long] = mutable.HashMap.empty

    override def reduce(b: mutable.HashMap[String, Long],
        t: String): mutable.HashMap[String, Long] = {
      b.get(t) match {
        case Some(c) => b.update(t, c + 1L)
        case None if b.size < k => b.update(t, 1L)
        case None =>
          // decrement-all-by-one, dropping zeros (textbook MG step)
          val dead = b.iterator.filter(_._2 == 1L).map(_._1).toList
          b.mapValuesInPlace((_, c) => c - 1L)
          dead.foreach(b.remove)
      }
      b
    }

    override def merge(a: mutable.HashMap[String, Long],
        b: mutable.HashMap[String, Long]): mutable.HashMap[String, Long] = {
      val (into, from) = if (a.size >= b.size) (a, b) else (b, a)
      from.foreach { case (t, c) => into.update(t, into.getOrElse(t, 0L) + c) }
      if (into.size > k) {
        // subtract the (k+1)-th largest count, keep strictly-positive rest
        val counts = into.values.toArray
        java.util.Arrays.sort(counts)
        val d = counts(counts.length - (k + 1))
        val dead = into.iterator.filter(_._2 <= d).map(_._1).toList
        into.mapValuesInPlace((_, c) => c - d)
        dead.foreach(into.remove)
      }
      into
    }

    override def finish(b: mutable.HashMap[String, Long]): Map[String, Long] =
      b.toMap

    override def bufferEncoder: Encoder[mutable.HashMap[String, Long]] =
      Encoders.kryo[mutable.HashMap[String, Long]]
    override def outputEncoder: Encoder[Map[String, Long]] =
      ExpressionEncoder[Map[String, Long]]()
  }
}
