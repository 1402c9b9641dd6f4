package graft

import org.apache.spark.sql.functions._
import graft.agg.Rolling
import graft.ops.RangeJoin

import scala.util.Random

/** Specs for the round-4 batch-3 operators: the binned interval join, the
  * trailing time-horizon window, and the exponential decay score. */
class RollingRangeSpec extends SparkSpec {
  import spark.implicits._

  // ---- binned range join ----

  test("binnedRangeJoin equals the naive inequality join on random data") {
    val rng = new Random(42)
    val points = (0 until 300).map(i =>
      (i.toLong, rng.nextLong(10000) - 5000)).toSeq
    // lengths 0..400 (zero-length = empty window), some spanning many bins
    val intervals = (0 until 40).map(j => {
      val s = rng.nextLong(10000) - 5000
      (j.toLong, s, s + rng.nextLong(401))
    }).toSeq
    val expected = (for {
      (pid, ts) <- points
      (iid, s, e) <- intervals
      if ts >= s && ts < e
    } yield (pid, iid)).sorted
    // binWidth 100 < many interval lengths: exercises multi-bin explode
    val got = RangeJoin.binnedRangeJoin(
        points.toDF("pid", "ts"), intervals.toDF("iid", "w_start", "w_end"),
        "ts", "w_start", "w_end", binWidth = 100L)
      .select("pid", "iid").as[(Long, Long)].collect().toSeq.sorted
    assert(got === expected)
    assert(expected.nonEmpty, "degenerate test: no matches generated")
  }

  test("binnedRangeJoin boundary semantics: start inclusive, end exclusive") {
    val pts = Seq((1L, 100L), (2L, 199L), (3L, 200L), (4L, 99L))
      .toDF("pid", "ts")
    val iv = Seq((10L, 100L, 200L), (11L, 300L, 300L)) // second is empty
      .toDF("iid", "w_start", "w_end")
    val got = RangeJoin.binnedRangeJoin(pts, iv, "ts", "w_start", "w_end", 1000L)
      .select("pid", "iid").as[(Long, Long)].collect().toSet
    assert(got === Set((1L, 10L), (2L, 10L)))
  }

  test("binnedRangeJoin handles negative timestamps (floor, not truncate)") {
    // -150 is in bin -2 for width 100 (floor(-150/100) = -2); truncating
    // division would put it in bin -1 and miss the [-200, -100) window.
    val pts = Seq((1L, -150L)).toDF("pid", "ts")
    val iv = Seq((10L, -200L, -100L)).toDF("iid", "w_start", "w_end")
    val got = RangeJoin.binnedRangeJoin(pts, iv, "ts", "w_start", "w_end", 100L)
      .select("pid", "iid").as[(Long, Long)].collect().toSet
    assert(got === Set((1L, 10L)))
  }

  test("binnedRangeJoin: an interval exceeding maxFanout fails loudly, not with an opaque explode") {
    // end near Long.MaxValue would otherwise attempt a multi-billion-
    // element sequence(...) and die deep inside codegen.
    val pts = Seq((1L, 100L)).toDF("pid", "ts")
    val iv = Seq((10L, 0L, Long.MaxValue - 1)).toDF("iid", "w_start", "w_end")
    val e = intercept[Exception] {
      RangeJoin.binnedRangeJoin(pts, iv, "ts", "w_start", "w_end", 1000L)
        .collect()
    }
    def messages(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x => Option(x.getMessage).toSeq ++ messages(x.getCause))
    assert(messages(e).exists(_.contains("binnedRangeJoin: interval")),
      s"wanted the loud fanout error, got: ${messages(e)}")
    // sane intervals on the same call path still join fine
    val ok = RangeJoin.binnedRangeJoin(pts,
        Seq((10L, 0L, 2000L)).toDF("iid", "w_start", "w_end"),
        "ts", "w_start", "w_end", 1000L)
      .select("pid", "iid").as[(Long, Long)].collect().toSet
    assert(ok === Set((1L, 10L)))
  }

  test("binnedRangeJoin plans an equi-join, never a nested loop") {
    val pts = (0 until 100).map(i => (i.toLong, i.toLong * 7)).toDF("pid", "ts")
    val iv = (0 until 20).map(j => (j.toLong, j * 50L, j * 50L + 80L))
      .toDF("iid", "w_start", "w_end")
    val plan = RangeJoin.binnedRangeJoin(pts, iv, "ts", "w_start", "w_end", 64L)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"), plan)
    assert(!plan.contains("BroadcastNestedLoopJoin"), plan)
  }

  // ---- trailing window stats ----

  test("trailingStats counts the horizon half-closed and includes peers") {
    val df = Seq(
      ("a", 0L, 1L, 10L), ("a", 3600L, 2L, 20L),   // 3600-0 <= 3600: in
      ("a", 3601L, 3L, 30L),                        // 0 falls out
      ("a", 3601L, 4L, 40L),                        // same-time peer: mutual
      ("b", 50L, 5L, 5L)
    ).toDF("uuid", "time", "seq", "v")
    val got = Rolling.trailingStats(df, horizon = 3600L, valueCol = "v")
      .orderBy("uuid", "time", "seq")
      .as[(String, Long, Long, Long, Long)].collect().toSeq
    assert(got === Seq(
      ("a", 0L, 1L, 1L, 10L),
      ("a", 3600L, 2L, 2L, 30L),
      ("a", 3601L, 3L, 3L, 90L),  // 3600 peer window: 20+30+40, not 10
      ("a", 3601L, 4L, 3L, 90L),  // peer sees the same frame
      ("b", 50L, 5L, 1L, 5L)))
  }

  // ---- decay score ----

  test("decayScore is exact micro-rounded exp sums against the trail max") {
    val df = Seq(
      ("a", 0L), ("a", 86400L),        // exp(-1), exp(0)
      ("b", 7L)                        // single event: exp(0) = 1
    ).toDF("uuid", "time")
    val got = Rolling.decayScore(df, tau = 86400L)
      .orderBy("uuid")
      .as[(String, Long, Long, Long)].collect().toSeq
    val expA = math.round(math.exp(-1.0) * 1e6) + 1000000L
    assert(got === Seq(("a", 2L, 86400L, expA), ("b", 1L, 7L, 1000000L)))
  }

  // ---- retention compaction ----

  test("compact keeps the newest keepLast events per trail above the cutoff") {
    val rows = Seq(
      ("a", 10L, "x", null.asInstanceOf[String], 1L),
      ("a", 20L, "y", null.asInstanceOf[String], 2L),
      ("a", 30L, "z", null.asInstanceOf[String], 3L),
      ("a", 30L, "w", null.asInstanceOf[String], 4L), // same-time: seq breaks
      ("b", 5L, "p", null.asInstanceOf[String], 5L)   // below cutoff: dropped
    ).toDF("uuid", "time", "event_type", "props", "seq")
    val db = graft.core.TrailDB.fromTrailFrame(rows)
    val got = db.compact(keepLast = 2, minTime = Some(10L))
      .select("uuid", "time", "seq").orderBy("uuid", "time", "seq")
      .as[(String, Long, Long)].collect().toSeq
    // trail a keeps its two newest: both time-30 events (seq 3 and 4)
    assert(got === Seq(("a", 30L, 3L), ("a", 30L, 4L)))
  }

  // ---- per-group quality cap ----

  test("capPerGroup keeps the best maxPerGroup rows per group, id tie-break") {
    val df = Seq(
      (1L, "a", 100L), (2L, "a", 300L), (3L, "a", 200L), (4L, "a", 300L),
      (5L, "b", 10L)
    ).toDF("doc_id", "source", "n_chars")
    val got = graft.ops.TextAnalysis.capPerGroup(df, maxPerGroup = 2)
      .orderBy("source", "cap_rank")
      .as[(Long, String, Long, Long)].collect().toSeq
    // ties on 300 break toward the lower doc_id; group b keeps its one row
    assert(got === Seq(
      (2L, "a", 300L, 1L), (4L, "a", 300L, 2L), (5L, "b", 10L, 1L)))
  }

  // ---- duplicated-span scrub ----

  test("scrubDupSpans removes repeats but keeps the corpus-first occurrence") {
    val df = Seq(
      (1L, "a b c d e f"),          // first occurrence of "a b c d e": kept whole
      (2L, "x a b c d e y"),        // span at p=1 is a dup -> tokens 1..5 drop
      (3L, "p q r s t p q r s t"),  // within-doc repeat at p=5 -> tail drops
      (4L, "u v")                   // shorter than k: untouched
    ).toDF("doc_id", "text")
    val got = graft.ops.Dedup.scrubDupSpans(df, k = 5).orderBy("doc_id")
      .as[(Long, Long, Long, String)].collect().toSeq
    assert(got === Seq(
      (1L, 6L, 6L, "a b c d e f"),
      (2L, 7L, 2L, "x y"),
      (3L, 10L, 5L, "p q r s t"),
      (4L, 2L, 2L, "u v")))
  }

  test("scrubDupSpans keeps a fully-duplicated doc as an empty row") {
    val df = Seq((1L, "a b c d e"), (2L, "a b c d e")).toDF("doc_id", "text")
    val got = graft.ops.Dedup.scrubDupSpans(df, k = 5).orderBy("doc_id")
      .as[(Long, Long, Long, String)].collect().toSeq
    assert(got === Seq((1L, 5L, 5L, "a b c d e"), (2L, 5L, 0L, "")))
  }

  test("scrubDupSpans hashed span keys reproduce the string-key twin (r7)") {
    // the 8-byte span key is a pure identity swap: same first-occurrence
    // choice, same coverage, same rebuilt text as the string-keyed form
    // the DuckDB oracle replays
    val rng = new scala.util.Random(7)
    val words = Array("a", "b", "c", "d", "e", "f", "g")
    val boiler = "the quick brown fox jumps over the lazy dog again"
    val df = (1L to 60L).map { i =>
      val body = (0 until 12 + rng.nextInt(20)).map(_ => words(rng.nextInt(7)))
      val text = if (i % 3 == 0) s"$boiler ${body.mkString(" ")}"
                 else if (i % 3 == 1) s"${body.mkString(" ")} $boiler"
                 else body.mkString(" ")
      (i, text)
    }.toDF("doc_id", "text")
    val hashed = graft.ops.Dedup.scrubDupSpans(df, k = 5).orderBy("doc_id")
      .as[(Long, Long, Long, String)].collect().toSeq
    val strung = graft.ops.Dedup.scrubDupSpansStringKey(df, k = 5)
      .orderBy("doc_id").as[(Long, Long, Long, String)].collect().toSeq
    assert(hashed === strung)
  }

  test("scrubDupSpans whale-span salting: salted join-back ≡ unsalted, output unchanged (r13)") {
    // boilerplate span in most docs = the whale key; force the heavy
    // threshold low enough to trigger on this corpus and assert the
    // salted plan's output is IDENTICAL to the unsalted one (light keys
    // stay salt-0; whale keys spread across skewSalt sub-keys)
    val rng = new scala.util.Random(11)
    val words = Array("a", "b", "c", "d", "e", "f", "g")
    val boiler = "w1 w2 w3 w4 w5 w6 w7 w8 w9"
    val df = (1L to 80L).map { i =>
      val body = (0 until 10 + rng.nextInt(15)).map(_ => words(rng.nextInt(7)))
      (i, if (i % 2 == 0) s"${body.mkString(" ")} $boiler" else body.mkString(" "))
    }.toDF("doc_id", "text")
    val unsalted = graft.ops.Dedup.scrubDupSpans(df, k = 5, skewSalt = 1)
      .orderBy("doc_id").as[(Long, Long, Long, String)].collect().toSeq
    val salted = graft.ops.Dedup.scrubDupSpans(df, k = 5,
        skewSalt = 8, skewThreshold = 10L, maxHeavyKeys = 16)
      .orderBy("doc_id").as[(Long, Long, Long, String)].collect().toSeq
    assert(salted === unsalted)
    // the string-keyed twin salts identically (string heavy keys in the
    // InSet instead of hashes)
    val saltedStr = graft.ops.Dedup.scrubDupSpansStringKey(df, k = 5,
        skewSalt = 8, skewThreshold = 10L, maxHeavyKeys = 16)
      .orderBy("doc_id").as[(Long, Long, Long, String)].collect().toSeq
    assert(saltedStr === unsalted)
    // default thresholds never trigger at this scale: heavy list empty,
    // plan untouched (no _s column in the join)
    val plan = graft.ops.Dedup.scrubDupSpans(df, k = 5)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("_s"), "default scrub grew a salt column")
  }

  test("decayScore weights recent trails above stale ones of equal size") {
    val dense = (0 until 20).map(i => ("fresh", 1000000L - i * 60L))
    val stale = (0 until 20).map(i => ("stale", 1000000L - i * 864000L))
    val got = Rolling.decayScore((dense ++ stale).toDF("uuid", "time"),
        tau = 86400L)
      .collect().map(r => r.getString(0) -> r.getLong(3)).toMap
    assert(got("fresh") > got("stale"), got.toString)
  }
}
