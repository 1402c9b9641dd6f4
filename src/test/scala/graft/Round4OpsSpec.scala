package graft

import org.apache.spark.sql.functions._
import graft.agg.Attribution
import graft.core.TrailOps
import graft.ops.{Retrieval, Sketch}

import scala.util.Random

/** Specs for the round-4 batch: bigram LM scoring, last-touch attribution,
  * transition matrices, bounded-staleness as-of, exact top-k aggregator,
  * and the Count-Min sketch. */
class Round4OpsSpec extends SparkSpec {
  import spark.implicits._

  // ---- bigram LM ----

  test("bigramLogProb matches a hand-computed add-one bigram model") {
    val df = Seq((1L, "a b a b"), (2L, "b a"), (3L, "solo")).toDF("doc_id", "text")
    // bigrams: d1 = [a b, b a, a b], d2 = [b a]; freq: "a b"->2, "b a"->2;
    // ctx: a->2, b->2; V=2; p = (2+1)/(2+2) = 0.75 for every transition.
    val lp = math.round(math.log(0.75) * 1e6)
    val got = Retrieval.bigramLogProb(df).orderBy("doc_id")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(got.toSeq === Seq((1L, 3L, 3 * lp), (2L, 1L, lp)))
    // d3 has one token -> no transitions -> absent
  }

  test("bigramLogProb ranks a shuffled doc below a repeated-pattern doc") {
    // Same unigram bag, different order: the bigram model must separate them.
    val patterned = Array.fill(30)("x y").mkString(" ")
    val rng = new Random(7)
    val shuffled = rng.shuffle(patterned.split(" ").toList).mkString(" ")
    val df = Seq((1L, patterned), (2L, shuffled)).toDF("doc_id", "text")
    val got = Retrieval.bigramLogProb(df).collect()
      .map(r => r.getLong(0) -> (r.getLong(2).toDouble / r.getLong(1))).toMap
    assert(got(1L) > got(2L), s"patterned should outscore shuffled: $got")
  }

  // ---- last-touch attribution ----

  test("lastTouch credits the latest in-window touch, else direct") {
    val df = Seq(
      // trail a: view@10, click@100, purchase@200 -> click@100
      ("a", 10L, 1L, "view"), ("a", 100L, 2L, "click"),
      ("a", 200L, 3L, "purchase"),
      // purchase@400100: click@100 is older than lookback 100000 -> direct
      ("a", 400100L, 4L, "purchase"),
      // trail b: same-time click (earlier seq) counts — strictly-before in
      // (time, seq) order; purchase first in seq sees nothing -> direct
      ("b", 50L, 1L, "purchase"), ("b", 60L, 2L, "click"),
      ("b", 60L, 3L, "purchase")
    ).toDF("uuid", "time", "seq", "event_type")
    val got = Attribution.lastTouch(df, Seq("view", "click"), "purchase",
        lookback = 100000L)
      .orderBy("uuid", "time", "seq")
      .collect().map(r => (r.getString(0), r.getLong(1),
        r.getString(3), Option(r.get(4)).map(_.asInstanceOf[Long])))
    assert(got.toSeq === Seq(
      ("a", 200L, "click", Some(100L)),
      ("a", 400100L, "direct", None),
      ("b", 50L, "direct", None),
      ("b", 60L, "click", Some(60L))))
  }

  test("lastTouch window bound is half-open (touch exactly lookback old is out)") {
    val df = Seq(
      ("a", 0L, 1L, "click"), ("a", 100L, 2L, "purchase"),
      ("b", 1L, 1L, "click"), ("b", 100L, 2L, "purchase")
    ).toDF("uuid", "time", "seq", "event_type")
    val got = Attribution.lastTouch(df, Seq("click"), "purchase", lookback = 100L)
      .orderBy("uuid").collect().map(r => (r.getString(0), r.getString(3)))
    // a: touch at conv-100 — NOT in (conv-100, conv]; b: conv-99 — in.
    assert(got.toSeq === Seq(("a", "direct"), ("b", "click")))
  }

  test("multiTouch splits credit U-shaped across in-window touches") {
    val df = Seq(
      // trail a: 4 in-window touches -> 0.4 / 0.1 / 0.1 / 0.4
      ("a", 10L, 1L, "view"), ("a", 20L, 2L, "click"),
      ("a", 30L, 3L, "view"), ("a", 40L, 4L, "click"),
      ("a", 50L, 5L, "purchase"),
      // trail b: 1 touch -> full credit
      ("b", 10L, 1L, "click"), ("b", 20L, 2L, "purchase"),
      // trail c: no touches -> direct
      ("c", 10L, 1L, "purchase"),
      // trail d: 2 touches -> 0.5 / 0.5, one touch aged out by lookback
      ("d", 1L, 1L, "view"), ("d", 900L, 2L, "view"), ("d", 950L, 3L, "click"),
      ("d", 1000L, 4L, "purchase")
    ).toDF("uuid", "time", "seq", "event_type")
    val got = graft.agg.Attribution.multiTouch(df, Seq("view", "click"),
        "purchase", lookback = 500L)
      .orderBy("uuid", "time", "seq", "pos")
      .collect().map(r => (r.getString(0), r.getLong(3), r.getString(4),
        r.getDouble(6)))
    assert(got.toSeq === Seq(
      ("a", 1L, "view", 0.4), ("a", 2L, "click", 0.1),
      ("a", 3L, "view", 0.1), ("a", 4L, "click", 0.4),
      ("b", 1L, "click", 1.0),
      ("c", 0L, "direct", 1.0),
      ("d", 1L, "view", 0.5), ("d", 2L, "click", 0.5)))
  }

  test("multiTouch credits sum to 1 per conversion on random trails") {
    val rng = new Random(19)
    val types = Seq("view", "click", "purchase", "error")
    val df = (1 to 2000).map { i =>
      (s"u${rng.nextInt(40)}", rng.nextInt(5000).toLong, i.toLong,
        types(rng.nextInt(types.size)))
    }.toDF("uuid", "time", "seq", "event_type")
    val sums = graft.agg.Attribution.multiTouch(df, Seq("view", "click"),
        "purchase", lookback = 700L)
      .groupBy("uuid", "time", "seq").agg(sum("credit").as("s"))
      .collect().map(_.getDouble(3))
    assert(sums.nonEmpty)
    sums.foreach(s => assert(math.abs(s - 1.0) < 1e-4, s"credit sum $s"))
  }

  // ---- transitions ----

  test("transitions counts consecutive pairs and row-normalizes") {
    val df = Seq(
      ("a", 1L, 1L, "A"), ("a", 2L, 2L, "B"), ("a", 3L, 3L, "A"),
      ("b", 1L, 1L, "B"), ("b", 2L, 2L, "A"), ("b", 3L, 3L, "A")
    ).toDF("uuid", "time", "seq", "event_type")
    val got = Attribution.transitions(df).orderBy("from_type", "to_type")
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2),
        r.getDouble(3)))
    // pairs: a: A>B, B>A; b: B>A, A>A. from A: {A:1, B:1}; from B: {A:2}.
    assert(got.toSeq === Seq(
      ("A", "A", 1L, 0.5), ("A", "B", 1L, 0.5), ("B", "A", 2L, 1.0)))
  }

  // ---- as-of tolerance ----

  test("asOfJoin with tolerance equals the untolerated join with too-old matches nulled") {
    val rng = new Random(42)
    val left = (1 to 300).map { i =>
      (f"${rng.nextInt(8)}%032x", rng.nextInt(1000).toLong, i.toLong)
    }.toDF("uuid", "time", "seq")
    val right = (1 to 150).map { _ =>
      val t = rng.nextInt(1000).toLong
      (f"${rng.nextInt(8)}%032x", t, t, s"p${rng.nextInt(5)}")
    }.toDF("uuid", "time", "rt", "rv")
    val tol = 80L
    val got = TrailOps.asOfJoin(left, right, Seq("rt", "rv"),
        tolerance = Some(tol))
      .orderBy("uuid", "time", "seq").collect()
    val base = TrailOps.asOfJoin(left, right, Seq("rt", "rv"))
      .orderBy("uuid", "time", "seq").collect()
    assert(got.length === base.length)
    got.zip(base).foreach { case (g, b) =>
      val inWindow = !b.isNullAt(3) && b.getLong(3) >= b.getLong(1) - tol
      if (inWindow) assert(g.toSeq === b.toSeq)
      else { assert(g.isNullAt(3) && g.isNullAt(4)); assert(g.toSeq.take(3) === b.toSeq.take(3)) }
    }
    // sanity: the tolerance actually bit somewhere on this data
    assert(got.exists(_.isNullAt(3)) && got.exists(!_.isNullAt(3)))
  }

  // ---- exact top-k aggregator ----

  test("TopK equals ORDER BY score DESC, id LIMIT k, including duplicate scores") {
    val rng = new Random(3)
    val rows = (1L to 5000L).map(i => (rng.nextInt(400).toDouble, i))
    val ds = rows.toDF("score", "id").repartition(7)
      .select(col("score"), col("id")).as[(Double, Long)]
    val got = ds.select(Sketch.TopK(25).toColumn.name("tk")).head()
    val expect = rows.sortBy { case (s, i) => (-s, i) }.take(25)
    assert(got.toSeq === expect)
  }

  test("TopK with k larger than the data returns everything sorted") {
    val ds = Seq((1.0, 2L), (5.0, 1L), (1.0, 1L)).toDS()
    val got = ds.select(Sketch.TopK(10).toColumn.name("tk")).head()
    assert(got.toSeq === Seq((5.0, 1L), (1.0, 1L), (1.0, 2L)))
  }

  test("TopK equates signed zeros like the window sort it replays (ADVICE r6)") {
    // Spark's sort treats -0.0 == 0.0 and ties fall to the id tie-break;
    // at a k boundary the aggregate must keep the same candidate set, and
    // the kept scores must not leak a -0.0 the window form would not.
    val ds = Seq((-0.0, 5L), (0.0, 1L), (-0.0, 2L), (1.0, 9L)).toDS()
    val got = ds.select(Sketch.TopK(3).toColumn.name("tk")).head()
    assert(got.toSeq === Seq((1.0, 9L), (0.0, 1L), (0.0, 2L)))
    assert(got.forall { case (s, _) =>
      java.lang.Double.doubleToRawLongBits(s) !=
        java.lang.Double.doubleToRawLongBits(-0.0) })
  }

  test("bounded-ranking ops refuse a non-integral id column loudly (ADVICE r6)") {
    val df = Seq(("a", "x", "t1", 3L), ("b", "y", "t2", 1L))
      .toDF("doc_id", "lang", "text", "n")
    // the STREAMING quota decisions buffer (key, id-as-long) pairs in
    // aggregator state, so they keep the integral-id requirement
    val e1 = intercept[IllegalArgumentException] {
      graft.ops.TextAnalysis.stratumQuota(df, 1, "lang", "doc_id", "text") }
    assert(e1.getMessage.contains("integral"))
    val e2 = intercept[IllegalArgumentException] {
      graft.ops.TextAnalysis.capQuota(df, 1, "lang", col("n"), "doc_id") }
    assert(e2.getMessage.contains("integral"))
    // the BATCH ops are windows since round 7 (WindowGroupLimit-bounded)
    // and accept any id type — the round-6 long-cast restriction is gone
    assert(graft.ops.TextAnalysis.takePerStratum(df, 1, "lang", "doc_id",
      "text").count() === 2)
    assert(graft.ops.TextAnalysis.capPerGroup(df, 1, "lang", col("n"),
      "doc_id").count() === 2)
    val ok = df.withColumn("doc_id", expr("cast(n as long)"))
    assert(graft.ops.TextAnalysis.takePerStratum(ok, 1, "lang", "doc_id",
      "text").count() === 2)
  }

  test("MinKLex equals ORDER BY key, id LIMIT k, including duplicate keys") {
    val rng = new Random(11)
    val rows = (1L to 5000L).map(i => (f"${rng.nextInt(300)}%04x", i))
    val ds = rows.toDF("key", "id").repartition(7)
      .select(col("key"), col("id")).as[(String, Long)]
    val got = ds.select(Sketch.MinKLex(25).toColumn.name("mk")).head()
    val expect = rows.sorted.take(25)
    assert(got.toSeq === expect)
    // grouped through udaf — the takePerStratum shape: per group, the
    // aggregate must replay the per-group window sort-limit
    val grouped = rows.zipWithIndex.map { case ((k, i), ix) => (ix % 3, k, i) }
    val mk = org.apache.spark.sql.functions.udaf(Sketch.MinKLex(4))
    val byGroup = grouped.toDF("g", "key", "id").repartition(5)
      .groupBy(col("g")).agg(mk(col("key"), col("id")).as("mk"))
      .collect().map(r =>
        r.getInt(0) -> r.getSeq[org.apache.spark.sql.Row](1)).toMap
    grouped.groupBy(_._1).foreach { case (g, rs) =>
      val expectG = rs.map(r => (r._2, r._3)).sorted.take(4)
      val gotG = byGroup(g).map(r => (r.getString(0), r.getLong(1)))
      assert(gotG === expectG, s"group $g diverged")
    }
  }

  // ---- Count-Min sketch ----

  test("CountMin never undercounts on zipf data and merges across partitions") {
    val rng = new Random(11)
    val tokens = (1 to 20000).map { _ =>
      s"tok${math.min(99, math.floor(math.pow(rng.nextDouble(), -0.7)).toLong)}"
    }
    val d = 4; val w = 64 // deliberately narrow: collisions guaranteed
    val grid = tokens.toDF("t").repartition(9).as[String]
      .select(Sketch.CountMin(d, w).toColumn.name("grid")).toDF("grid")
    val exact = tokens.groupBy(identity).map { case (k, v) => k -> v.size.toLong }
    val est = tokens.distinct.toDF("t")
      .crossJoin(broadcast(grid))
      .select(col("t"), Sketch.countMinEstimate(col("grid"), col("t"), d, w))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    exact.foreach { case (k, c) =>
      assert(est(k) >= c, s"undercount for $k: est ${est(k)} < exact $c")
    }
  }

  test("CountMin skips null tokens like its column-side xxhash64 twin") {
    val cm = Sketch.CountMin(2, 8)
    val b = cm.reduce(cm.zero, null) // must not NPE, must not count
    assert(b.forall(_ == 0L))
    assert(cm.reduce(b, "x").sum === 2L) // one increment per depth row
  }

  test("CountMin is exact for the event-type key set (collision-free separation)") {
    // Data-independent given the key strings: with a 4x1024 grid each of
    // these keys must own a private cell in at least one hash row, making
    // the min-estimate exact for ANY count distribution — the property
    // t_cms's plain GROUP BY oracle relies on.
    val keys = Seq("view", "click", "purchase", "signup", "error", "")
    val rng = new Random(5)
    val tokens = (1 to 5000).map(_ => keys(rng.nextInt(keys.size)))
    val d = 4; val w = 1024
    val grid = tokens.toDF("t").repartition(5).as[String]
      .select(Sketch.CountMin(d, w).toColumn.name("grid")).toDF("grid")
    val exact = tokens.groupBy(identity).map { case (k, v) => k -> v.size.toLong }
    val est = keys.toDF("t").crossJoin(broadcast(grid))
      .select(col("t"), Sketch.countMinEstimate(col("grid"), col("t"), d, w))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(est === exact)
  }

  test("CountMin column probe indexes exactly like the aggregator hash") {
    // One token, one increment: the probed cell must read back 1 in every
    // hash row (est = 1), proving the Column-side xxhash64 fold and the
    // Scala-side XXH64 chain agree index-for-index.
    val d = 3; val w = 17
    val grid = Seq("lonely").toDF("t").as[String]
      .select(Sketch.CountMin(d, w).toColumn.name("grid")).toDF("grid")
    val est = grid.select(
      Sketch.countMinEstimate(col("grid"), lit("lonely"), d, w)).head().getLong(0)
    assert(est === 1L)
    val miss = grid.select(
      Sketch.countMinEstimate(col("grid"), lit("other"), d, w)).head().getLong(0)
    assert(miss === 0L || miss === 1L) // may collide in all rows of a 17-wide grid
  }
}
