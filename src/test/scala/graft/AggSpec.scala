package graft

import org.apache.spark.sql.functions._
import graft.agg.{SessionIntervals, Sessionize}
import graft.core.TrailDB

/** The three sessionization implementations must agree: window-lag
  * (Sessionize), single-pass interval Aggregator (SessionIntervals), and a
  * trailCursor walk (the reference's application-loop style,
  * tutorial_wikipedia_sessions.c:60-87). */
class AggSpec extends SparkSpec {
  import spark.implicits._

  private lazy val trails = TrailDB.fromEvents(
    graft.core.EventSource.events(spark, "/root/testdata/sf0.001"),
    uuidCol = "user_id", timeCol = "ts",
    fieldCols = Seq("event_type"), seqCol = Some("event_id"))

  private val Gap = 1800L

  private lazy val windowed: Map[String, Long] =
    Sessionize.sessionCounts(trails.df, Gap).collect()
      .map(r => r.getString(0) -> r.getAs[Long]("num_sessions")).toMap

  test("interval Aggregator (single-pass, partial-agg-friendly) matches window-lag") {
    val agg = SessionIntervals(Gap)
    val got = trails.df.select(col("uuid"), col("time")).as[(String, Long)]
      .groupByKey(_._1).mapValues(_._2)
      .agg(agg.toColumn.name("num_sessions"))
      .collect().toMap
    assert(got === windowed)
  }

  test("trailCursor walk (reference application-loop style) matches window-lag") {
    val gap = Gap // local copy: the closure must not capture the spec (non-serializable)
    val got = trails.trailCursor[(String, Long)] { (uuid, events) =>
      var sessions = 0L
      var prev = Long.MinValue
      events.foreach { e =>
        if (prev == Long.MinValue || e.time - prev > gap) sessions += 1
        prev = e.time
      }
      Iterator.single((uuid, sessions))
    }.collect().toMap
    assert(got === windowed)
  }

  test("window-lag and interval aggregator agree on randomized trails (incl. duplicate times)") {
    val rnd = new scala.util.Random(42)
    val rows = for {
      u <- 0 until 20
      _ <- 0 until (1 + rnd.nextInt(30))
    } yield (f"$u%032x", rnd.nextInt(2000).toLong) // dense range → many duplicates
    val df = rows.zipWithIndex.map { case ((u, t), i) => (u, t, i.toLong) }
      .toDF("uuid", "time", "seq")
    val gap = 100L
    val viaWindow = Sessionize.sessionCounts(df, gap).collect()
      .map(r => r.getString(0) -> r.getAs[Long]("num_sessions")).toMap
    val viaIntervals = df.select(col("uuid"), col("time")).as[(String, Long)]
      .groupByKey(_._1).mapValues(_._2)
      .agg(SessionIntervals(gap).toColumn.name("n"))
      .collect().toMap
    assert(viaIntervals === viaWindow)
  }

  test("interval merge is order-independent (associativity smoke)") {
    val agg = SessionIntervals(10L)
    val times = Seq(100L, 5L, 50L, 11L, 112L, 49L, 30L)
    def fold(ts: Seq[Long]) = ts.foldLeft(agg.zero)((b, t) => agg.reduce(b, t))
    val whole = fold(times)
    val (l, r) = times.splitAt(3)
    val merged = agg.merge(fold(l), fold(r))
    assert(agg.finish(whole) === agg.finish(merged))
    // sorted: 5,11 | 30 | 49,50 | 100 | 112  (gaps 19,19,50,12 all > 10)
    assert(agg.finish(whole) === 5L)
  }

  test("windowFunnel: greedy-earliest chain, strict order, window cap, repeated steps") {
    def run(rows: Seq[(String, Long, String)], window: Long): Map[String, (Long, Any)] =
      graft.agg.Funnel.windowFunnel(
          rows.zipWithIndex.map { case ((u, t, e), i) => (u, t, e, i.toLong) }
            .toDF("uuid", "time", "event_type", "seq"),
          Seq("view", "click", "purchase"), window)
        .collect()
        .map(r => r.getAs[String]("uuid") ->
          (r.getAs[Long]("funnel_level"), r.get(r.fieldIndex("first_time"))))
        .toMap

    val res = run(Seq(
      // u0: full chain inside window
      ("u0", 10L, "view"), ("u0", 20L, "click"), ("u0", 30L, "purchase"),
      // u1: purchase BEFORE click → only level 2
      ("u1", 10L, "view"), ("u1", 15L, "purchase"), ("u1", 20L, "click"),
      // u2: click at same second as view → strict 'after' fails, level 1
      ("u2", 10L, "view"), ("u2", 10L, "click"),
      // u3: never views → level 0
      ("u3", 10L, "click"), ("u3", 20L, "purchase"),
      // u4: greedy t0 = FIRST view (5); click at 100 outside window=50
      //     even though view@90 would have matched — fixed-chain semantics
      ("u4", 5L, "view"), ("u4", 90L, "view"), ("u4", 100L, "click")),
      window = 50L)
    assert(res("u0") === ((3L, 10L)))
    assert(res("u1") === ((2L, 10L)))
    assert(res("u2") === ((1L, 10L)))
    assert(res("u3")._1 === 0L)
    assert(res("u3")._2 === null)
    assert(res("u4") === ((1L, 5L)))

    // window cap on the LAST step only: chain completes but too late
    val late = run(Seq(
      ("u5", 0L, "view"), ("u5", 10L, "click"), ("u5", 200L, "purchase")),
      window = 50L)
    assert(late("u5") === ((2L, 0L)))
  }

  test("windowFunnel exclusion: best segment wins, chains never span an error") {
    def run(rows: Seq[(String, Long, String)]): Map[String, (Long, Any)] =
      graft.agg.Funnel.windowFunnel(
          rows.zipWithIndex.map { case ((u, t, e), i) => (u, t, e, i.toLong) }
            .toDF("uuid", "time", "event_type", "seq"),
          Seq("view", "click", "purchase"), window = 1000L,
          exclude = Seq("error"))
        .collect()
        .map(r => r.getAs[String]("uuid") ->
          (r.getAs[Long]("funnel_level"), r.get(r.fieldIndex("first_time"))))
        .toMap

    val res = run(Seq(
      // u0: error mid-chain — the view→click progress BEFORE it is kept
      // (level 2); the lone purchase after can't beat it
      ("u0", 10L, "view"), ("u0", 20L, "click"), ("u0", 30L, "error"),
      ("u0", 40L, "purchase"),
      // u1: error BEFORE the chain is harmless → full level 3
      ("u1", 5L, "error"), ("u1", 10L, "view"), ("u1", 20L, "click"),
      ("u1", 30L, "purchase"),
      // u2: level-1 segment, then a completing segment → 3, t0 of the win
      ("u2", 10L, "view"), ("u2", 20L, "error"), ("u2", 30L, "view"),
      ("u2", 40L, "click"), ("u2", 50L, "purchase"),
      // u3: same-time tie — error then view at t=20 in seq order: the
      // view (later seq) lands in the post-error segment → level 1
      ("u3", 20L, "error"), ("u3", 20L, "view"),
      // u4: no errors at all → plain funnel
      ("u4", 10L, "view"), ("u4", 20L, "click"),
      // u5: COMPLETED chain then a late error — conversion is kept
      ("u5", 10L, "view"), ("u5", 20L, "click"), ("u5", 30L, "purchase"),
      ("u5", 40L, "error"),
      // u6: two equal-level segments → the EARLIEST one's t0 is reported
      ("u6", 10L, "view"), ("u6", 20L, "click"), ("u6", 30L, "error"),
      ("u6", 40L, "view"), ("u6", 50L, "click")))
    assert(res("u0") === ((2L, 10L)))
    assert(res("u1") === ((3L, 10L)))
    assert(res("u2") === ((3L, 30L)))
    assert(res("u3") === ((1L, 20L)))
    assert(res("u4") === ((2L, 10L)))
    assert(res("u5") === ((3L, 10L)))
    assert(res("u6") === ((2L, 10L)))
  }

  test("windowFunnel exclusion equals an independent reference fold on random trails") {
    val steps = Seq("view", "click", "purchase")
    val types = steps ++ Seq("error", "signup")
    val window = 40L
    val rng = new scala.util.Random(11)
    val rows = for {
      u <- 0 until 150
      i <- 0 until (1 + rng.nextInt(12))
    } yield (s"u$u", rng.nextInt(100).toLong, types(rng.nextInt(types.length)))
    val seqd = rows.zipWithIndex.map { case ((u, t, e), i) => (u, t, e, i.toLong) }

    // independent imperative reference: walk (time, seq)-sorted events,
    // greedy slots per segment, best (level, t0) with strict improvement
    def ref(evts: Seq[(Long, Long, String)]): (Long, Option[Long]) = {
      val slots = Array.fill[Option[Long]](steps.length)(None)
      def level: Long = slots(0) match {
        case None => 0L
        case Some(t0) =>
          var l = 1L
          while (l < steps.length && slots(l.toInt).exists(_ - t0 <= window)) l += 1
          l
      }
      var best = 0L
      var bestT0: Option[Long] = None
      evts.sortBy(e => (e._1, e._2)).foreach { case (t, _, et) =>
        if (et == "error") {
          if (level > best) { best = level; bestT0 = slots(0) }
          slots.indices.foreach(slots(_) = None)
        } else {
          val i = steps.indexOf(et)
          if (i >= 0 && slots(i).isEmpty &&
              (i == 0 || slots(i - 1).exists(t > _))) slots(i) = Some(t)
        }
      }
      if (level > best) (level, slots(0)) else (best, bestT0)
    }
    val expected = seqd.groupBy(_._1).map { case (u, es) =>
      u -> ref(es.map(e => (e._2, e._4, e._3)))
    }

    val got = graft.agg.Funnel.windowFunnel(
        seqd.toDF("uuid", "time", "event_type", "seq"),
        steps, window, exclude = Seq("error"))
      .collect()
      .map(r => r.getAs[String]("uuid") -> ((r.getAs[Long]("funnel_level"),
        Option(r.get(r.fieldIndex("first_time"))).map(_.asInstanceOf[Long]))))
      .toMap
    assert(got === expected)
  }

  test("windowFunnel whale safety: conditional collect ≡ pre-filtered input, level-0 rows kept") {
    val steps = Seq("view", "click", "purchase")
    val rng = new scala.util.Random(12)
    val types = steps ++ Seq("error", "heartbeat", "ping", "scroll")
    val rows = (for {
      u <- 0 until 80
      i <- 0 until (1 + rng.nextInt(15))
    } yield (s"u$u", rng.nextInt(100).toLong,
        types(rng.nextInt(types.length)))) ++
      // u_noise: ONLY irrelevant events — must still report level 0
      (0 until 50).map(i => ("u_noise", i.toLong, "heartbeat"))
    val df = rows.zipWithIndex
      .map { case ((u, t, e), i) => (u, t, e, i.toLong) }
      .toDF("uuid", "time", "event_type", "seq")

    def canon(d: org.apache.spark.sql.DataFrame) =
      d.collect().map(_.toString).sorted.toSeq
    val full = graft.agg.Funnel.windowFunnel(df, steps, window = 50L,
      exclude = Seq("error"))
    // the equivalence the conditional collect relies on: feeding ONLY the
    // relevant event types produces identical (level, first_time) for
    // every uuid that has any relevant event
    val relevantOnly = graft.agg.Funnel.windowFunnel(
      df.filter(col("event_type").isin(steps :+ "error": _*)),
      steps, window = 50L, exclude = Seq("error"))
    val fullMap = full.collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.get(2))).toMap
    val relMap = relevantOnly.collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.get(2))).toMap
    relMap.foreach { case (u, v) => assert(fullMap(u) === v, u) }
    // uuids with zero relevant events keep their level-0 row
    assert(fullMap.contains("u_noise"))
    assert(fullMap("u_noise") === ((0L, null)))
    assert(fullMap.keySet === rows.map(_._1).toSet)

    // maxTrailEvents counts RELEVANT events only: u_noise's 50 heartbeats
    // never trip a bound of 10, while a trail with >10 step events does
    val smallDf = ((0 until 50).map(i => ("w", i.toLong, "heartbeat")) ++
      Seq(("w", 100L, "view"))).zipWithIndex
      .map { case ((u, t, e), i) => (u, t, e, i.toLong) }
      .toDF("uuid", "time", "event_type", "seq")
    assert(canon(graft.agg.Funnel.windowFunnel(smallDf, steps, 50L,
      maxTrailEvents = Some(10L))).nonEmpty)
    val whaleDf = (0 until 20).map(i => ("w", i.toLong, "view"))
      .zipWithIndex.map { case ((u, t, e), i) => (u, t, e, i.toLong) }
      .toDF("uuid", "time", "event_type", "seq")
    val err = intercept[graft.core.GraftError.TrailTooLong] {
      graft.agg.Funnel.windowFunnel(whaleDf, steps, 50L,
        maxTrailEvents = Some(10L))
    }
    assert(err.getMessage.contains("maxTrailEvents"))
    assert(err.getMessage.contains("w"))
    // opt-out still works
    assert(canon(graft.agg.Funnel.windowFunnel(whaleDf, steps, 50L,
      maxTrailEvents = None)).nonEmpty)
  }

  test("windowFunnelStreamed ≡ windowFunnel on random trails (plain, exclusion, repeated steps)") {
    def canon(d: org.apache.spark.sql.DataFrame): Seq[(String, Long, Any)] =
      d.collect().map(r => (r.getString(0), r.getLong(1), r.get(2)))
        .sortBy(_._1).toSeq
    val rng = new scala.util.Random(13)
    val types = Seq("view", "click", "purchase", "error", "signup", "ping")
    val rows = (for {
      u <- 0 until 120
      i <- 0 until (1 + rng.nextInt(14))
    } yield (s"u$u", rng.nextInt(80).toLong,
        types(rng.nextInt(types.length)))) :+ (("lonely", 5L, "ping"))
    val df = rows.zipWithIndex
      .map { case ((u, t, e), i) => (u, t, e, i.toLong) }
      .toDF("uuid", "time", "event_type", "seq")

    for ((steps, excl) <- Seq(
        (Seq("view", "click", "purchase"), Nil),
        (Seq("view", "click", "purchase"), Seq("error")),
        (Seq("view", "view", "click"), Seq("error")))) { // repeated step
      val arr = canon(graft.agg.Funnel.windowFunnel(
        df, steps, window = 30L, exclude = excl))
      val str = canon(graft.agg.Funnel.windowFunnelStreamed(
        df, steps, window = 30L, exclude = excl))
      assert(str === arr, s"steps=$steps exclude=$excl")
      // every uuid present, incl. the level-0-only one
      assert(str.map(_._1).toSet === rows.map(_._1).toSet)
    }
  }

  test("streamed twins tie grid: duplicate (time,seq) at one instant — array ≡ streamed") {
    // Random trails rarely generate EXACT (time, seq) ties; this grid
    // forces them. Both forms break such ties by the event-type string
    // (the sort's third key) — step-vs-exclusion and step-vs-step at one
    // instant must resolve identically, or the gate rows drift apart.
    def canon(d: org.apache.spark.sql.DataFrame): Seq[(String, Long, Any)] =
      d.collect().map(r => (r.getString(0), r.getLong(1), r.get(2)))
        .sortBy(t => Option(t._1).getOrElse("")).toSeq
    val types = Seq("view", "click", "purchase", "error")
    // every ordered pair of types planted at the SAME (time, seq), with
    // a lead-in and follow-up event so chains can extend across the tie
    val grid = for {
      (a, ai) <- types.zipWithIndex
      (b, bi) <- types.zipWithIndex
    } yield {
      val u = s"tie_${ai}_$bi"
      Seq((u, 5L, "view", 0L),
        (u, 10L, a, 1L), (u, 10L, b, 1L), // the tie: identical (time, seq)
        (u, 15L, "purchase", 2L), (u, 15L, "click", 2L)) // second tie later
    }
    // plus: identical duplicate events, and a null-uuid trail (the batch
    // groupBy emits a null-uuid row; the streamed twin must too)
    val extra = Seq(
      ("dup", 10L, "view", 1L), ("dup", 10L, "view", 1L),
      ("dup", 10L, "click", 1L),
      (null.asInstanceOf[String], 3L, "view", 0L),
      (null.asInstanceOf[String], 4L, "click", 1L))
    val df = (grid.flatten ++ extra).toDF("uuid", "time", "event_type", "seq")
    for ((steps, excl) <- Seq(
        (Seq("view", "click", "purchase"), Nil),
        (Seq("view", "click", "purchase"), Seq("error")),
        (Seq("view", "view", "click"), Seq("error")))) {
      val arr = canon(graft.agg.Funnel.windowFunnel(
        df, steps, window = 30L, exclude = excl))
      val str = canon(graft.agg.Funnel.windowFunnelStreamed(
        df, steps, window = 30L, exclude = excl))
      assert(str === arr, s"steps=$steps exclude=$excl")
      assert(str.exists(_._1 == null), "null-uuid trail row missing")
    }
    for (n <- Seq(2, 3)) {
      val arr = graft.agg.Paths.topNgrams(df, n = n, limit = 1000,
        maxTrailEvents = None).collect().map(_.toString).sorted.toSeq
      val str = graft.agg.Paths.topNgramsStreamed(df, n = n, limit = 1000)
        .collect().map(_.toString).sorted.toSeq
      assert(str === arr, s"paths n=$n")
    }
  }

  test("topNgramsStreamed ≡ topNgrams on random trails (n=2,3,4), no guard needed") {
    val rng = new scala.util.Random(14)
    val types = Seq("a", "b", "c", "d", "e")
    val rows = (for {
      u <- 0 until 100
      i <- 0 until (1 + rng.nextInt(12))
    } yield (s"u$u", rng.nextInt(50).toLong, types(rng.nextInt(5)))) ++
      Seq(("short", 1L, "a"), ("short", 2L, "b")) // below n=3 → no grams
    val df = rows.zipWithIndex
      .map { case ((u, t, e), i) => (u, t, e, i.toLong) }
      .toDF("uuid", "time", "event_type", "seq")
    for (n <- Seq(2, 3, 4)) {
      val arr = graft.agg.Paths.topNgrams(df, n = n, limit = 1000,
        maxTrailEvents = None).collect().map(_.toString).toSeq
      val str = graft.agg.Paths.topNgramsStreamed(df, n = n, limit = 1000)
        .collect().map(_.toString).toSeq
      assert(str === arr, s"n=$n")
      assert(str.nonEmpty)
    }
    // and the streamed form has no trail-length bound to trip: a trail
    // past the array form's guard streams through fine
    val whale = (0 until 30).map(i => ("w", i.toLong, types(i % 5)))
      .zipWithIndex.map { case ((u, t, e), i) => (u, t, e, i.toLong) }
      .toDF("uuid", "time", "event_type", "seq")
    intercept[graft.core.GraftError.TrailTooLong] {
      graft.agg.Paths.topNgrams(whale, maxTrailEvents = Some(10L))
    }
    assert(graft.agg.Paths.topNgramsStreamed(whale).count() > 0)
  }

  test("TrailGuard refuses BEFORE collecting: count-only pre-pass, named uuid, exit code 14") {
    val df = ((0 until 200).map(i => ("whale", i.toLong)) ++
      (0 until 5).map(i => ("ok", i.toLong)))
      .toDF("uuid", "time")
    val e = intercept[graft.core.GraftError.TrailTooLong] {
      graft.agg.TrailGuard.requireBoundedTrails(df, col("uuid"), 100L, "specOp")
    }
    assert(e.getMessage.contains("whale"))
    assert(e.getMessage.contains("specOp"))
    assert(graft.core.GraftError.classify(e) ===
      (("GRAFT_ERR_TRAIL_TOO_LONG", 14)))
    // bounded input passes through unchanged
    val ok = graft.agg.TrailGuard.requireBoundedTrails(df, col("uuid"),
      1000L, "specOp")
    assert(ok.count() === 205L)
  }

  test("cohort matrix: first-bucket cohort, age counts, whale trail counts once per bucket") {
    val wk = 604800L
    val rows =
      // u0: first week 0, active weeks {0, 1, 3}; 1000 events in week 0
      (0 until 1000).map(i => ("u0", i.toLong)) ++
      Seq(("u0", wk + 5), ("u0", 3 * wk + 5)) ++
      // u1: first week 1 only
      Seq(("u1", wk + 9))
    val got = graft.agg.Cohorts.matrix(rows.toDF("uuid", "time"))
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(got === Map(
      (0L, 0L) -> 1L, (0L, 1L) -> 1L, (0L, 3L) -> 1L,
      (1L, 0L) -> 1L))
    // pre-epoch time: truncating DIV would silently mis-bucket it — loud
    val neg = Seq(("u0", -5L)).toDF("uuid", "time")
    val e = intercept[Exception](graft.agg.Cohorts.matrix(neg).collect())
    assert(e.getMessage.contains("negative or NULL time"))
  }

  test("conversionLatency: first-from to first-at-or-after-to, bucketed") {
    val rows = Seq(
      // u0: signup@100, purchases@50 (before — ignored) and @4000 → lat 3900, bucket 1
      ("u0", "signup", 100L), ("u0", "purchase", 50L), ("u0", "purchase", 4000L),
      // u1: signup@0, purchase@0 → lat 0, bucket 0 (at-or-after includes ties)
      ("u1", "signup", 0L), ("u1", "purchase", 0L),
      // u2: purchase only — no from event, absent
      ("u2", "purchase", 10L),
      // u3: signup only — never converted, absent
      ("u3", "signup", 10L))
      .toDF("uuid", "event_type", "time")
    val got = graft.agg.Cohorts.conversionLatency(rows, "signup", "purchase")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got === Map(0L -> 1L, 1L -> 1L))
  }

  test("typeOverlap counts distinct trails per unordered type pair") {
    val rows = Seq(
      ("u0", "view"), ("u0", "view"), ("u0", "buy"),  // dup view: 1 trail
      ("u1", "view"), ("u1", "buy"), ("u1", "ship"),
      ("u2", "view"))                                 // single type: no pair
      .toDF("uuid", "event_type")
    val got = graft.agg.Cohorts.typeOverlap(rows)
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(got === Map(
      ("buy", "view") -> 2L, ("buy", "ship") -> 1L, ("ship", "view") -> 1L))
  }
}
