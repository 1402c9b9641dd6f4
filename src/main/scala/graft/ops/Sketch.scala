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

  /** EXACT bounded-memory global top-k by `(score DESC, id ASC)` — the
    * mergeable complement of the window-function top-k: each map task keeps
    * at most k rows, the shuffle carries k rows per partition to ONE
    * reducer, and the merge is associative and order-independent, so the
    * result is identical to a full `ORDER BY score DESC, id LIMIT k` — a
    * global sort whose exchange carries the whole table. (Take-ordered-
    * and-project does this for literal sort-limit plans; the Aggregator
    * form composes inside groupBy/streaming where that operator cannot.)
    *
    * The buffer over-admits to 4k before compacting so reduce stays
    * amortized O(1) per row; ties beyond position k are cut by the id
    * tie-break, keeping the output deterministic for duplicated scores.
    *
    * Signed zeros: scores are normalized to +0.0 on entry, because the
    * window form this aggregate replays sorts with Spark's comparison
    * where -0.0 == 0.0 and the tie falls to the id tie-break, while
    * Scala's Ordering.Double.TotalOrdering ranks -0.0 < 0.0 — at a k
    * boundary with mixed-sign zero scores the two would keep different
    * candidates. (NaN scores remain a documented precondition, as for
    * the ANN callers.)
    */
  final case class TopK(k: Int)
      extends Aggregator[(Double, Long), mutable.ArrayBuffer[(Double, Long)],
        Seq[(Double, Long)]] {
    require(k > 0, s"k must be positive, got $k")

    private val ord: Ordering[(Double, Long)] =
      Ordering.by[(Double, Long), (Double, Long)](x => (-x._1, x._2))

    private def norm(s: Double): Double = if (s == 0.0) 0.0 else s

    private def compact(b: mutable.ArrayBuffer[(Double, Long)]):
        mutable.ArrayBuffer[(Double, Long)] = {
      if (b.length > k) {
        val top = b.sorted(ord).take(k)
        b.clear(); b ++= top
      }
      b
    }

    override def zero: mutable.ArrayBuffer[(Double, Long)] = mutable.ArrayBuffer.empty

    override def reduce(b: mutable.ArrayBuffer[(Double, Long)],
        t: (Double, Long)): mutable.ArrayBuffer[(Double, Long)] = {
      b += ((norm(t._1), t._2))
      if (b.length >= 4 * k) compact(b) else b
    }

    override def merge(a: mutable.ArrayBuffer[(Double, Long)],
        b: mutable.ArrayBuffer[(Double, Long)]): mutable.ArrayBuffer[(Double, Long)] =
      compact(a ++= b)

    override def finish(b: mutable.ArrayBuffer[(Double, Long)]): Seq[(Double, Long)] =
      b.sorted(ord).take(k).toSeq

    override def bufferEncoder: Encoder[mutable.ArrayBuffer[(Double, Long)]] =
      Encoders.kryo[mutable.ArrayBuffer[(Double, Long)]]
    override def outputEncoder: Encoder[Seq[(Double, Long)]] =
      ExpressionEncoder[Seq[(Double, Long)]]()
  }

  /** EXACT bounded-memory k-SMALLEST by `(key ASC, id ASC)` over STRING
    * keys — [[TopK]]'s lexicographic-ascending sibling, for rankings whose
    * sort key is a content hash rather than a numeric score (the
    * exactly-N-per-stratum eval carve ranks by md5(text)). Same shape:
    * ≤k pairs per partial, associative merge, result provably equal to
    * `ORDER BY key, id LIMIT k`. ASCII keys compare identically under
    * UTF8String's byte-wise order and String.compareTo, so the aggregate
    * replays the window form bit-for-bit on hex-hash keys. */
  final case class MinKLex(k: Int)
      extends Aggregator[(String, Long), mutable.ArrayBuffer[(String, Long)],
        Seq[(String, Long)]] {
    require(k > 0, s"k must be positive, got $k")

    private val ord: Ordering[(String, Long)] =
      Ordering.Tuple2(Ordering.String, Ordering.Long)

    private def compact(b: mutable.ArrayBuffer[(String, Long)]):
        mutable.ArrayBuffer[(String, Long)] = {
      if (b.length > k) {
        val top = b.sorted(ord).take(k)
        b.clear(); b ++= top
      }
      b
    }

    override def zero: mutable.ArrayBuffer[(String, Long)] = mutable.ArrayBuffer.empty

    override def reduce(b: mutable.ArrayBuffer[(String, Long)],
        t: (String, Long)): mutable.ArrayBuffer[(String, Long)] = {
      b += t
      if (b.length >= 4 * k) compact(b) else b
    }

    override def merge(a: mutable.ArrayBuffer[(String, Long)],
        b: mutable.ArrayBuffer[(String, Long)]): mutable.ArrayBuffer[(String, Long)] =
      compact(a ++= b)

    override def finish(b: mutable.ArrayBuffer[(String, Long)]): Seq[(String, Long)] =
      b.sorted(ord).take(k).toSeq

    override def bufferEncoder: Encoder[mutable.ArrayBuffer[(String, Long)]] =
      Encoders.kryo[mutable.ArrayBuffer[(String, Long)]]
    override def outputEncoder: Encoder[Seq[(String, Long)]] =
      ExpressionEncoder[Seq[(String, Long)]]()
  }

  /** Count-Min sketch over a string column (Cormode & Muthukrishnan 2005):
    * a depth×width counter grid; every row increments one cell per hash
    * row, estimates are the min over the depth cells, and two sketches
    * merge by cell-wise addition — so Spark's partial aggregation carries
    * depth·width longs per partition, never the key space, and the same
    * sketch runs unchanged as a streaming complete-mode aggregate.
    * Estimates NEVER undercount (one-sided error: est ≥ true count, with
    * overshoot ≤ 2n/width at probability 1 − (1/2)^depth — the classic
    * bound); when no two live keys collide in every hash row the estimate
    * is EXACT, which small key spaces (event types, languages, sources)
    * hit deterministically.
    *
    * Hashing: row i hashes with Catalyst's own xxhash64 fold —
    * `XXH64.hashLong(i, 42)` seeding the token bytes — so a pure-Column
    * consumer can recompute cell indices as
    * `pmod(xxhash64(lit(i), token), width)` and probe the flattened grid
    * with `element_at`: sketch build AND estimate both stay codegen'd,
    * no UDF on the query path.
    */
  final case class CountMin(depth: Int, width: Int)
      extends Aggregator[String, Array[Long], Array[Long]] {
    require(depth > 0 && width > 0, s"bad grid ${depth}x$width")

    override def zero: Array[Long] = new Array[Long](depth * width)

    override def reduce(b: Array[Long], t: String): Array[Long] = {
      // NULL tokens are skipped, mirroring the column-side probe: the
      // documented dual `pmod(xxhash64(lit(i), token), width)` yields NULL
      // for a NULL token (no cell), and fromString(null) would NPE here.
      if (t == null) return b
      val s = org.apache.spark.unsafe.types.UTF8String.fromString(t)
      var i = 0
      while (i < depth) {
        val h = org.apache.spark.sql.catalyst.expressions.XXH64.hashUnsafeBytes(
          s.getBaseObject, s.getBaseOffset, s.numBytes(),
          org.apache.spark.sql.catalyst.expressions.XXH64.hashLong(i.toLong, 42L))
        b(i * width + java.lang.Math.floorMod(h, width.toLong).toInt) += 1L
        i += 1
      }
      b
    }

    override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
      var i = 0
      while (i < a.length) { a(i) += b(i); i += 1 }
      a
    }

    override def finish(b: Array[Long]): Array[Long] = b

    override def bufferEncoder: Encoder[Array[Long]] =
      ExpressionEncoder[Array[Long]]()
    override def outputEncoder: Encoder[Array[Long]] =
      ExpressionEncoder[Array[Long]]()
  }

  /** Column-side Count-Min probe: the min over depth cells of the flattened
    * grid for `token` — the exact dual of [[CountMin.reduce]]'s indexing,
    * as a pure codegen'd expression (element_at over pmod(xxhash64)).
    */
  def countMinEstimate(grid: org.apache.spark.sql.Column,
      token: org.apache.spark.sql.Column, depth: Int, width: Int):
      org.apache.spark.sql.Column = {
    import org.apache.spark.sql.functions._
    (0 until depth).map { i =>
      element_at(grid,
        (lit(i.toLong * width) +
          pmod(xxhash64(lit(i.toLong), token), lit(width.toLong))).cast("int") + 1)
    }.reduce(least(_, _))
  }

  /** [[TopK]]/[[MinKLex]] carry row ids as LONG; callers cast their id
    * column on the way in. A string/decimal id would cast to NULL and the
    * join-back would silently drop every row (the window forms these
    * aggregates replaced accepted any id type) — so the precondition is
    * enforced at plan-build time instead of living only in a docstring. */
  def requireIntegralId(schema: org.apache.spark.sql.types.StructType,
      idCol: String, op: String): Unit = {
    import org.apache.spark.sql.types._
    val dt = schema(idCol).dataType
    require(Seq[DataType](ByteType, ShortType, IntegerType, LongType).contains(dt),
      s"$op: id column '$idCol' must be an integral type (the bounded " +
      s"ranking aggregate carries ids as long); got $dt — a non-integral " +
      "id casts to null and silently breaks the id join-back")
  }
}
