package graft.streaming

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming exact dedup — the ingest-time keep-first pattern a
  * production training-data pipeline runs in front of everything else
  * (the batch analogs live in [[graft.ops.Dedup]]: exactDedup,
  * incrementalDedup, bloomDedup).
  *
  * The reference's incremental story is batch shards merged periodically
  * (doc/docs/index.md:43-48); this is the parity-plus streaming form:
  * state carries one kept id per content key across micro-batches, so a
  * document whose key was EVER seen is dropped no matter how many batches
  * later it arrives. The SET OF KEPT KEYS is identical for any
  * micro-batch split of the same input; the kept id for a key is the
  * minimum id of the FIRST batch containing that key (within-batch ties
  * break deterministically by minimum id, cross-batch the earlier batch
  * wins, which IS arrival order — so a split that separates two ids of
  * one key keeps the earlier-arriving one, not the global minimum).
  *
  * Complement to [[StreamSessions.streamingDedup]]
  * (dropDuplicatesWithinWatermark): that form bounds state by EVICTING
  * keys once the watermark passes, so a duplicate arriving later than the
  * watermark is re-admitted — right when dup proximity is bounded (log
  * ingest). This form never evicts, so the keep-first answer is EXACT over
  * the whole stream and each kept row carries the winning id — right when
  * the dedup key space fits state (content fingerprints of a corpus).
  *
  * Scale: state is O(distinct keys) — one (key, id) string pair each, hash-
  * partitioned by key across executors; at 100 TB run it on the RocksDB
  * state store (spark.sql.streaming.stateStore.providerClass) so state
  * spills past memory. For an UNBOUNDED keyspace where even that is too
  * much, trade exactness for the bounded-memory probabilistic form
  * ([[graft.ops.Dedup]] bloomDedup: duplicates always drop, a bounded
  * fraction of new docs is falsely dropped) — the same discipline as the
  * writer's lexicon cap: exact until a documented bound, loud about the
  * trade past it.
  */
object StreamDedup {

  /** One kept document per content key. */
  final case class Kept(key: String, id: String)

  /** Keep the first document per key across the whole stream.
    * `docs` is a streaming Dataset of (key, id) — key is the content
    * fingerprint (e.g. md5 of normalized text), id the document id.
    * Emits exactly one Kept row per distinct key, in the batch where the
    * key first appears (Append mode: a kept row is final, never retracted).
    */
  def keepFirst(docs: Dataset[(String, String)]): Dataset[Kept] = {
    implicit val strEnc: org.apache.spark.sql.Encoder[String] =
      org.apache.spark.sql.Encoders.STRING
    implicit val keptEnc: org.apache.spark.sql.Encoder[Kept] =
      org.apache.spark.sql.Encoders.product[Kept]
    docs.groupByKey(_._1)
      .flatMapGroupsWithState[String, Kept](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        (key: String, rows: Iterator[(String, String)], state: GroupState[String]) =>
          if (state.exists) Iterator.empty // key already kept — drop all
          else {
            // within one micro-batch the source row order is not a
            // contract — minimum id is, so ties are deterministic
            var first: String = null
            rows.foreach { r =>
              if (first == null || r._2 < first) first = r._2
            }
            if (first == null) Iterator.empty
            else {
              state.update(first)
              Iterator.single(Kept(key, first))
            }
          }
      }
  }
}
