package graft.agg

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Gap-constrained sequential funnel over trails — the windowFunnel
  * analysis reference users hand-roll with a cursor walk carrying
  * per-step state (the sessionization-tutorial pattern,
  * reference doc/docs/tutorial.md:188-256, generalized to an ordered
  * step chain).
  *
  * Semantics (deterministic, engine-replayable): greedy-earliest from
  * the earliest step-1 event. t_0 = min time of steps(0); t_i = min time
  * of steps(i) STRICTLY after t_(i-1). The funnel level is the longest
  * prefix completed within `window` of t_0:
  * level = max i such that t_0..t_(i-1) all exist and t_(i-1) − t_0 ≤
  * window (0 when the trail never performs step 1). This is the fixed
  * greedy chain — not the NP-ish "best chain start" maximization — which
  * is exactly what makes it replayable as nested earliest-after-t
  * aggregations in any SQL engine.
  *
  * Scale shape: ONE shuffle (groupBy uuid), per-trail sorted event array,
  * and the step chain evaluated by a codegen'd higher-order `aggregate`
  * fold over that array — no per-step self-join cascade (k-1 joins of
  * corpus-sized sides), no UDF. State is k nullable longs per trail.
  *
  * Whale-trail safety: only events whose type is in `steps ++ exclude`
  * are collected — the fold provably ignores every other type (stepFn
  * falls through to the accumulator), so the conditional collect is
  * semantics-preserving (FunnelEquivalenceSpec proves it). It is done as
  * `collect_list(when(relevant, struct))` rather than a row pre-filter so
  * every uuid keeps its output row (a trail with zero relevant events
  * still reports level 0); collect_list skips the nulls, so a bot trail
  * of 10^8 irrelevant heartbeats contributes an EMPTY array instead of a
  * single 10^8-element in-memory row. The residual exposure — a trail
  * that is a whale IN STEP-TYPE EVENTS — is opt-in guarded: pass
  * `maxTrailEvents = Some(n)` to run the loud [[TrailGuard]] refusal
  * first. It defaults OFF here (unlike [[Paths.topNgrams]], whose array
  * is unbounded by construction) because the guard is a second scan of
  * the filtered input — a real cost at 100 TB — while the funnel's
  * arrays are already bounded by per-trail RELEVANT-event counts.
  */
object Funnel {

  /** `exclude`: event types that ABORT an in-progress chain (ClickHouse
    * windowFunnel's exclusion mode — "purchase without an error in
    * between"). Exclusion events cut the trail into SEGMENTS; a chain
    * never spans one. The reported level is the MAX greedy-chain level
    * over all segments (progress completed before an error is kept),
    * `first_time` is the t0 of the EARLIEST segment attaining that level
    * (strict-improvement update ⇒ deterministic tie-break). Replayable in
    * SQL: segment id = count of exclusion events strictly before in
    * `(time, seq)` order, then the plain greedy chain per (uuid, segment)
    * and an argmax. Ties of exact `(time, seq)` between an exclusion and
    * a step event are broken by the event-type string (the sort's third
    * key) — give events unique seqs (this library's trails do) to avoid
    * caring. */
  def windowFunnel(df: DataFrame, steps: Seq[String], window: Long,
      uuidCol: String = "uuid", timeCol: String = "time",
      typeCol: String = "event_type", seqCol: String = "seq",
      exclude: Seq[String] = Nil,
      maxTrailEvents: Option[Long] = None): DataFrame = {
    require(steps.nonEmpty, "windowFunnel needs at least one step")
    require(window >= 0, s"window must be non-negative, got $window")
    require(exclude.intersect(steps).isEmpty,
      s"exclusion types overlap steps: ${exclude.intersect(steps)}")
    val k = steps.length

    // Conditional collect (see the scaladoc): only relevant event types
    // enter the per-trail array; the null branch of the `when` is skipped
    // by collect_list, and the partial (map-side) aggregation already
    // drops irrelevant events BEFORE the shuffle.
    val relevant = coalesce(col(typeCol), lit(""))
      .isin((steps ++ exclude).distinct: _*)
    val evs = array_sort(collect_list(when(relevant, struct(
      col(timeCol).cast("long").as("time"), col(seqCol).as("seq"),
      coalesce(col(typeCol), lit("")).as("et")))))
    maxTrailEvents.foreach(m => TrailGuard.requireBoundedTrails(
      df.filter(relevant), col(uuidCol), m, "windowFunnel"))
    // state: the k slot times of the CURRENT segment's chain, plus the
    // best (level, t0) over closed segments — bl/bt cost nothing when
    // exclude is empty (they stay 0/null and the final max is a no-op)
    val zero = struct((0 until k).map(i =>
      lit(null).cast("long").as(s"t$i")) :+
      lit(0L).as("bl") :+ lit(null).cast("long").as("bt"): _*)

    // window-capped level of a slot vector (0 iff t0 is null; level i
    // requires t_(i-1) within `window` of t0)
    def levelOf(times: Seq[Column]): Column = {
      val deeper = (1 until k).foldRight(lit(k)) { (i, els) =>
        when(times(i).isNull || times(i) - times(0) > window, lit(i))
          .otherwise(els)
      }
      when(times(0).isNull, lit(0)).otherwise(deeper).cast("long")
    }

    // One fold step: the event fills the FIRST unfilled slot whose step
    // name matches and whose order constraint (strictly after the
    // previous slot) holds. Events arrive time-sorted, so each slot gets
    // the earliest admissible event. An exclusion event closes the
    // segment: fold its level into the best (STRICT improvement, so the
    // earliest best segment is kept) and clear the slots.
    def stepFn(acc: Column, e: Column): Column = {
      val times = (0 until k).map(i => acc.getField(s"t$i"))
      val keep = Seq(acc.getField("bl").as("bl"), acc.getField("bt").as("bt"))
      val branches = (0 until k).map { i =>
        val order = if (i == 0) lit(true)
          else times(i - 1).isNotNull && e.getField("time") > times(i - 1)
        val cond = times(i).isNull && (e.getField("et") === steps(i)) && order
        val filled = struct(((0 until k).map(j =>
          (if (j == i) e.getField("time") else times(j)).as(s"t$j")) ++
          keep): _*)
        (cond, filled)
      }
      val stepped = branches.foldRight(acc) {
        case ((c, f), els) => when(c, f).otherwise(els)
      }
      if (exclude.isEmpty) stepped
      else {
        val cur = levelOf(times)
        val improved = cur > acc.getField("bl")
        val closed = struct((0 until k).map(i =>
          lit(null).cast("long").as(s"t$i")) :+
          when(improved, cur).otherwise(acc.getField("bl")).as("bl") :+
          when(improved, times(0)).otherwise(acc.getField("bt")).as("bt"): _*)
        when(e.getField("et").isin(exclude: _*), closed).otherwise(stepped)
      }
    }

    val grouped = df.groupBy(col(uuidCol)).agg(evs.as("_evs"))
      .withColumn("_st", aggregate(col("_evs"), zero, stepFn))
    val times = (0 until k).map(i => col("_st").getField(s"t$i"))
    val cur = levelOf(times)
    val bl = col("_st").getField("bl")
    val level = when(cur > bl, cur).otherwise(bl)
    val first = when(cur > bl, times(0)).otherwise(col("_st").getField("bt"))
    grouped.select(col(uuidCol), level.cast("long").as("funnel_level"),
      first.as("first_time"))
  }

  /** [[windowFunnel]] as a per-partition STREAMING fold — identical
    * results (AggSpec proves ≡ on random trails; the t_funnel_streamed
    * gate row replays the same independent DuckDB oracle as
    * t_funnel_excl), but NO per-trail array ever materializes: events
    * are hash-partitioned by uuid and sorted within partitions (ONE
    * shuffle, the same exchange class as the groupBy) and a
    * mapPartitions walk carries O(k) slot state per open trail. Memory
    * is INDEPENDENT of trail length — the shape for the 10^7-10^8-event
    * whale where even the relevant-event array would OOM, closing the
    * residual exposure [[windowFunnel]]'s scaladoc documents. NOTHING
    * buffers — neither input events nor output rows: a trail's result
    * row is emitted lazily through the wrapping iterator the moment its
    * uuid changes (one pending row of state), the same nothing-buffers
    * shape as [[Paths.topNgramsStreamed]]'s lazy flatMap.
    *
    * Precondition (streamed twins only): `time` and `seq` must be
    * NON-NULL — they deserialize into primitive Longs here, so a null
    * (tolerated by the batch twin via SQL null ordering, and producible
    * by casting a non-numeric seq column) throws at runtime instead of
    * matching the batch result. Coalesce or filter nulls upstream if
    * your trails can carry them. A null `uuid` group IS handled: it
    * sorts first within its partition and emits one row with a null
    * uuid, exactly like the batch groupBy.
    *
    * Trade-off, measured: the fold runs outside whole-stage codegen on
    * deserialized rows, so at ordinary trail sizes the codegen'd array
    * fold above is faster — use this variant when trails can be
    * pathological. (mapPartitions is this library's documented last
    * resort; it is used here because no built-in aggregate folds
    * SORTED groups with bounded state.) */
  def windowFunnelStreamed(df: DataFrame, steps: Seq[String], window: Long,
      uuidCol: String = "uuid", timeCol: String = "time",
      typeCol: String = "event_type", seqCol: String = "seq",
      exclude: Seq[String] = Nil): DataFrame = {
    require(steps.nonEmpty, "windowFunnel needs at least one step")
    require(window >= 0, s"window must be non-negative, got $window")
    require(exclude.intersect(steps).isEmpty,
      s"exclusion types overlap steps: ${exclude.intersect(steps)}")
    val spark = df.sparkSession
    import spark.implicits._
    val k = steps.length
    val stepArr = steps.toArray
    val excl = exclude.toSet
    // same ordering keys as the array fold's sorted struct (time, seq,
    // type) so same-instant ties resolve identically
    val sorted = df.select(
        col(uuidCol).cast("string").as("_u"),
        col(timeCol).cast("long").as("_t"),
        coalesce(col(typeCol), lit("")).as("_e"),
        col(seqCol).cast("long").as("_q"))
      .repartition(col("_u"))
      .sortWithinPartitions("_u", "_t", "_q", "_e")
      .as[(String, Long, String, Long)]
    sorted.mapPartitions { it =>
      // Lazy trail-close emission: wrap the input iterator and yield a
      // finished trail's row the moment its uuid changes — at most ONE
      // pending row of state, so neither input events nor output rows
      // ever accumulate per partition (a 10^7-trail partition holds one
      // tuple, not 10^7).
      new Iterator[(String, Long, Option[Long])] {
        private val slots = new Array[java.lang.Long](k)
        private var cur: String = null
        private var started = false // distinguishes "no trail yet" from a null-uuid trail
        private var bl = 0L
        private var bt: java.lang.Long = null
        private var pending: (String, Long, Option[Long]) = null
        private var drained = false

        private def level: Long =
          if (slots(0) == null) 0L
          else {
            var l = 1
            while (l < k && slots(l) != null && slots(l) - slots(0) <= window)
              l += 1
            l.toLong
          }
        private def result(): (String, Long, Option[Long]) = {
          val curL = level
          if (curL > bl) (cur, curL, Option(slots(0)).map(_.longValue))
          else (cur, bl, Option(bt).map(_.longValue))
        }
        private def reset(): Unit = {
          java.util.Arrays.fill(slots.asInstanceOf[Array[AnyRef]], null)
          bl = 0L; bt = null
        }
        private def consume(t: Long, e: String): Unit =
          if (excl.contains(e)) {
            // segment close: strict improvement keeps the EARLIEST best
            val l = level
            if (l > bl) { bl = l; bt = slots(0) }
            java.util.Arrays.fill(slots.asInstanceOf[Array[AnyRef]], null)
          } else {
            // fill the FIRST unfilled matching slot whose order holds —
            // the exact branch chain of the array fold (repeated step
            // names fill their lowest open slot first)
            var i = 0
            var done = false
            while (i < k && !done) {
              if (slots(i) == null && stepArr(i) == e &&
                  (i == 0 || (slots(i - 1) != null && t > slots(i - 1)))) {
                slots(i) = t
                done = true
              }
              i += 1
            }
          }

        private def advance(): Unit = {
          while (pending == null && it.hasNext) {
            val (u, t, e, _) = it.next()
            if (!started) { started = true; cur = u }
            else if (u != cur) { pending = result(); reset(); cur = u }
            consume(t, e)
          }
          if (pending == null && started && !drained) {
            pending = result(); drained = true
          }
        }
        override def hasNext: Boolean = {
          if (pending == null && !drained) advance()
          pending != null
        }
        override def next(): (String, Long, Option[Long]) = {
          if (!hasNext) throw new NoSuchElementException("funnel iterator")
          val r = pending; pending = null; r
        }
      }
    }.toDF(uuidCol, "funnel_level", "first_time")
  }
}
