package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.core.{TrailDB, TrailDBCons, TrailIndex}
import graft.filter.{Clause, EventFilter, Match, TimeRange}

/** The inverted (field,value,page) skipping index — semantics mirror
  * tdbcli/tdb_index.c: positive terms OR pages within a clause, clauses AND
  * by intersection, negated/time-range terms disable pruning for their
  * clause, and the pruned scan always re-applies the full filter. */
class IndexSpec extends SparkSpec {
  import spark.implicits._

  private def uuidOf(i: Int): String = f"$i%032x"

  private lazy val (db, index) = {
    val dir = Files.createTempDirectory("graft-idx")
    // uuids spread over distinct 2-hex-prefix pages; etype correlates with
    // the uuid so some values live on few pages.
    val rows = for {
      t <- 0 until 64
      ev <- 0 until 4
    } yield (f"$t%02x" + "0" * 30, (100 + ev).toLong,
      s"e${t % 8}", if (ev == 0) "" else s"v${ev % 2}")
    val df = rows.toDF("uuid", "time", "etype", "val")
    val d = new TrailDBCons(spark, Seq("etype", "val"))
      .add(df).finalizeTo(dir.resolve("db").toString)
    TrailIndex.build(d, dir.resolve("idx").toString)
    (d, TrailIndex.open(spark, dir.resolve("idx").toString))
  }

  private def assertSameRows(f: EventFilter): Unit = {
    val full = db.events(f).orderBy("uuid", "time", "seq").collect().toSeq
    val pruned = TrailIndex.prunedEvents(db, index, f)
      .orderBy("uuid", "time", "seq").collect().toSeq
    assert(pruned === full, s"pruned scan diverged for ${f.render}")
  }

  test("pruned scan matches full scan across filter shapes") {
    assertSameRows(EventFilter(Seq(Clause(Seq(Match("etype", "e3"))))))
    assertSameRows(EventFilter(Seq(
      Clause(Seq(Match("etype", "e1"), Match("etype", "e2"))),
      Clause(Seq(Match("val", "v1"))))))
    assertSameRows(EventFilter(Seq(Clause(Seq(Match("val", "")))))) // NULL value
    assertSameRows(EventFilter(Seq(
      Clause(Seq(Match("etype", "e0", negated = true))))))          // negation
    assertSameRows(EventFilter(Seq(
      Clause(Seq(TimeRange(101, 103))), Clause(Seq(Match("etype", "e5"))))))
  }

  test("candidate pages: positive clauses prune, negation/time-range do not") {
    // e3 lives only on trails t ≡ 3 (mod 8) → a strict subset of pages
    val some = TrailIndex.candidatePages(index,
      EventFilter(Seq(Clause(Seq(Match("etype", "e3"))))))
    assert(some.isDefined && some.get.nonEmpty)
    val all = index.select("page").distinct().count()
    assert(some.get.size < all)

    // intersection across clauses can only shrink the page set
    val both = TrailIndex.candidatePages(index,
      EventFilter(Seq(Clause(Seq(Match("etype", "e3"))),
        Clause(Seq(Match("val", "v1")))))).get
    assert(both.subsetOf(some.get))

    // a clause with a negated term contributes nothing; if it is the ONLY
    // clause the index is useless (reference: all-pages)
    assert(TrailIndex.candidatePages(index,
      EventFilter(Seq(Clause(Seq(Match("etype", "e3", negated = true)))))).isEmpty)
    assert(TrailIndex.candidatePages(index,
      EventFilter(Seq(Clause(Seq(TimeRange(0, 10)))))).isEmpty)

    // unknown value → Some(empty): the index PROVES no match
    assert(TrailIndex.candidatePages(index,
      EventFilter(Seq(Clause(Seq(Match("etype", "nope")))))) === Some(Set.empty[String]))
  }

  test("page predicate reaches the Parquet scan as pushed StartsWith filters") {
    val f = EventFilter(Seq(Clause(Seq(Match("etype", "e3")))))
    val plan = TrailIndex.prunedEvents(db, index, f)
      .queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters") && plan.contains("StringStartsWith"),
      s"expected pushed StartsWith page filters in:\n$plan")
  }

  test("property: pruned scan equals full scan on random CNF filters") {
    import org.scalacheck.Gen
    val genTerm: Gen[graft.filter.Term] = Gen.frequency(
      8 -> (for {
        f <- Gen.oneOf("etype", "val", "zz")
        v <- Gen.oneOf("", "e1", "e3", "e7", "v0", "v1", "nope")
        n <- Gen.oneOf(true, false)
      } yield Match(f, v, n): graft.filter.Term),
      2 -> (for {
        s <- Gen.choose(99L, 104L)
        len <- Gen.choose(1L, 3L)
      } yield TimeRange(s, s + len): graft.filter.Term))
    val genFilter: Gen[EventFilter] = for {
      nClauses <- Gen.choose(0, 3)
      clauses <- Gen.listOfN(nClauses,
        Gen.choose(0, 3).flatMap(n => Gen.listOfN(n, genTerm).map(Clause(_))))
    } yield EventFilter(clauses)
    Gen.listOfN(12, genFilter).sample.get.foreach(assertSameRows)
  }

  test("a proven-empty candidate set returns zero rows, exactly like the filter") {
    val f = EventFilter(Seq(Clause(Seq(Match("etype", "nope")))))
    assert(TrailIndex.prunedEvents(db, index, f).count() === 0)
    assert(db.events(f).count() === 0)
  }

  test("the '' page admits only NULL/empty uuids — pruning survives a NULL-uuid hit (r15 ADVICE)") {
    // Before round 16 the '' page emitted startsWith(''), true for EVERY
    // non-null uuid: one NULL-uuid event carrying a matched value silently
    // degraded the pruned scan to a full scan. The page column is
    // substring(coalesce(uuid,''),1,n), so only NULL/empty uuids ever map
    // to '' — its exact predicate is isNull || === ''.
    val edb = TrailDB.fromTrailFrame(Seq(
      (null.asInstanceOf[String], 1L, "e0", 0L),
      ("", 2L, "e1", 1L),
      ("aa" + "0" * 30, 3L, "e2", 2L),
      ("ff" + "0" * 30, 4L, "e3", 3L)
    ).toDF("uuid", "time", "etype", "seq"))
    def uuids(pages: Set[String]): Set[Option[String]] =
      TrailIndex.prunedDb(edb, Some(pages)).df
        .select("uuid").collect().map(r => Option(r.getString(0))).toSet
    assert(uuids(Set("")) === Set(None, Some("")))
    // '' plus a real page: the unrelated ff-prefix trail stays pruned out
    assert(uuids(Set("", "aa")) ===
      Set(None, Some(""), Some("aa" + "0" * 30)))
  }

  test("1M-trail stress: point lookups prune to one page, wide items stay exact (test_tdbcli.py:161-184)") {
    // The reference stresses its index at 100k trails (multiple trails
    // per page, num_trails > 2^16) and 1M trails (>4 pages per item,
    // forcing its overflow mapping); graft's page lists are plain index
    // rows with no inline/overflow split, so the analogs here are: a
    // point value pruning to its single page out of 256, and a value
    // living on EVERY page (third=const — the >4-pages case) still
    // returning exact results. Generated distributively — 1M trails of
    // 1 event, uuid = md5(id) so trails spread over all 256 2-hex pages.
    val dir = Files.createTempDirectory("graft-idx-1m")
    val n = 1000000L
    val df = spark.range(n).select(
      md5(col("id").cast("string")).as("uuid"),
      (col("id") + 100L).as("time"),
      col("id").cast("string").as("first"),
      (col("id") % 10).cast("string").as("second"),
      lit("const").as("third"))
    val d = new TrailDBCons(spark, Seq("first", "second", "third"))
      .add(df).finalizeTo(dir.resolve("db").toString)
    TrailIndex.build(d, dir.resolve("idx").toString)
    val idx = TrailIndex.open(spark, dir.resolve("idx").toString)
    val totalPages = idx.select("page").distinct().count()
    assert(totalPages === 256L, s"md5 spread should fill all 256 pages")

    // the reference's probe ranges: the first and last ids (its
    // TestLargeFilter single-item loop)
    def f1(field: String, v: String) =
      EventFilter(Seq(Clause(Seq(Match(field, v)))))
    ((0 until 10) ++ (999990 until 1000000)).foreach { i =>
      val f = f1("first", i.toString)
      val pages = TrailIndex.candidatePages(idx, f).get
      assert(pages.size === 1, s"first=$i should live on exactly one page")
      val rows = TrailIndex.prunedEvents(d, idx, f).collect()
      assert(rows.length === 1 && rows(0).getAs[Long]("time") === i + 100L,
        s"first=$i pruned lookup wrong")
    }
    info(f"point-lookup selectivity: 1/$totalPages pages = " +
      f"${100.0 / totalPages}%.2f%% of trails evaluated (~3900/1M)")

    // a value on EVERY page (the >4-pages-per-item analog): pruning is a
    // no-op but must stay exact — counts and a content checksum agree
    // with the unpruned scan
    def scanStats(dfr: org.apache.spark.sql.DataFrame) =
      dfr.agg(count(lit(1)), sum(col("time"))).collect()(0)
    val constAll = TrailIndex.candidatePages(idx, f1("third", "const")).get
    assert(constAll.size === totalPages)
    assert(scanStats(TrailIndex.prunedEvents(d, idx, f1("third", "const")))
      === scanStats(d.events(f1("third", "const"))))

    // a 10%-selectivity value (second=5): exact through the pruned path
    assert(scanStats(TrailIndex.prunedEvents(d, idx, f1("second", "5")))
      === scanStats(d.events(f1("second", "5"))))

    // clause intersection: second=0 & first=500 prunes to first=500's
    // single page (the reference's final TestLargeFilter case)
    val both = EventFilter(Seq(
      Clause(Seq(Match("second", "0"))), Clause(Seq(Match("first", "500")))))
    assert(TrailIndex.candidatePages(idx, both).get.size === 1)
    val hit = TrailIndex.prunedEvents(d, idx, both).collect()
    assert(hit.length === 1 && hit(0).getAs[Long]("time") === 600L)

    // unknown value: the 1M-entry index still PROVES emptiness
    assert(TrailIndex.candidatePages(idx, f1("first", "-1"))
      === Some(Set.empty[String]))
    // negation disables pruning (None = all pages), never wrong rows
    assert(TrailIndex.candidatePages(idx,
      EventFilter(Seq(Clause(Seq(Match("third", "const", negated = true))))))
      .isEmpty)
  }

  test("stale index: a db rewrite after build is refused loudly at open") {
    // tdbcli/tdb_index.c:439-451,701-702 — the index is bound to the db it
    // was built from; a rewritten db could be missing pages for new values,
    // which would silently DROP rows from pruned scans.
    val dir = Files.createTempDirectory("graft-idx-stale")
    val dbPath = dir.resolve("db").toString
    val idxPath = dir.resolve("idx").toString
    def mkDb(n: Int) = new TrailDBCons(spark, Seq("etype"))
      .add((0 until n).map(i => (uuidOf(i), 100L + i, s"e$i"))
        .toDF("uuid", "time", "etype"))
      .finalizeTo(dbPath)

    TrailIndex.build(mkDb(4), idxPath)
    TrailIndex.open(spark, idxPath).count() // fresh: opens fine

    Thread.sleep(5) // mtime tick — a rewrite inside 1ms must not slip by
    mkDb(6)         // rewrite the db in place: index is now stale
    val e = intercept[IllegalStateException] {
      TrailIndex.open(spark, idxPath)
    }
    assert(e.getMessage.contains("STALE INDEX"), e.getMessage)

    // rebuilding against the new db restores service
    TrailIndex.build(TrailDB.open(spark, dbPath), idxPath)
    assert(TrailIndex.open(spark, idxPath).count() > 0)
  }

  test("an index over a legacy .tdb package gets the same staleness binding (round 12)") {
    val dir = Files.createTempDirectory("graft-idx-pkg")
    val pkg = s"$dir/p.tdb"
    def mkPkg(n: Int): Unit = graft.sources.TdbWriter.writePackage(
      (0 until n).map(i => (uuidOf(i % 8), 100L + i, s"e${i % 3}"))
        .toDF("uuid", "time", "etype")
        .withColumn("seq", monotonically_increasing_id()),
      Seq("etype"), pkg)
    mkPkg(40)
    val db = TrailDB.open(spark, pkg)
    assert(db.sourcePath === Some(pkg), "legacy open must keep its path")
    val idxPath = s"$dir/p.tdb.index"
    TrailIndex.build(db, idxPath)
    // bound, validates, prunes exactly
    val idx = TrailIndex.open(spark, idxPath, Some(pkg))
    val f = EventFilter(Seq(Clause(Seq(Match("etype", "e1")))))
    assert(TrailIndex.prunedEvents(db, idx, f)
      .collect().toSeq.sortBy(_.toString) ===
      db.events(f).collect().toSeq.sortBy(_.toString))
    // a rewritten package refuses at open — same guarantee as parquet dbs
    Thread.sleep(5)
    mkPkg(44)
    val e = intercept[IllegalStateException] {
      TrailIndex.open(spark, idxPath, Some(pkg))
    }
    assert(e.getMessage.contains("STALE INDEX"), e.getMessage)
    // rebuild restores service
    TrailIndex.build(TrailDB.open(spark, pkg), idxPath)
    assert(TrailIndex.open(spark, idxPath, Some(pkg)).count() > 0)
  }

  test("a corrupt binding sidecar refuses loudly instead of opening unverified") {
    val dir = Files.createTempDirectory("graft-idx-corrupt")
    val d = new TrailDBCons(spark, Seq("etype"))
      .add(Seq((uuidOf(1), 100L, "e1")).toDF("uuid", "time", "etype"))
      .finalizeTo(dir.resolve("db").toString)
    val idxPath = dir.resolve("idx").toString
    TrailIndex.build(d, idxPath)
    // corrupt through the Hadoop fs (keeps the .crc in sync — raw-file
    // corruption instead surfaces as a ChecksumException, which the same
    // catch turns into the loud refusal)
    val sp = new org.apache.hadoop.fs.Path(idxPath, "_graft_index.json")
    val fs = sp.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val out = fs.create(sp, true)
    try out.write("{not json".getBytes("UTF-8")) finally out.close()
    val e = intercept[IllegalStateException] { TrailIndex.open(spark, idxPath) }
    assert(e.getMessage.contains("unreadable"), e.getMessage)
  }

  test("a PARTIAL binding refuses loudly — never downgrades to warn-only (r5 ADVICE)") {
    // db_path present but the fingerprint fields missing/mistyped: the
    // sidecar CLAIMS a binding that cannot be verified — that must refuse
    // like the unreadable-sidecar case, not fall through to the unbound
    // warn path.
    val dir = Files.createTempDirectory("graft-idx-partial")
    val d = new TrailDBCons(spark, Seq("etype"))
      .add(Seq((uuidOf(1), 100L, "e1")).toDF("uuid", "time", "etype"))
      .finalizeTo(dir.resolve("db").toString)
    val idxPath = dir.resolve("idx").toString
    TrailIndex.build(d, idxPath)
    val sp = new org.apache.hadoop.fs.Path(idxPath, "_graft_index.json")
    val fs = sp.getFileSystem(spark.sparkContext.hadoopConfiguration)
    Seq(
      s"""{"prefix_len":2,"db_path":"${dir.resolve("db")}"}""",
      s"""{"prefix_len":2,"db_path":"${dir.resolve("db")}","db_info_sha256":42,"db_info_mtime":1}"""
    ).foreach { partial =>
      val out = fs.create(sp, true)
      try out.write(partial.getBytes("UTF-8")) finally out.close()
      val e = intercept[IllegalStateException] { TrailIndex.open(spark, idxPath) }
      assert(e.getMessage.contains("malformed db binding"), e.getMessage)
    }
    // the exact unbound shape still opens (warn-only) — ephemeral source dbs
    val out = fs.create(sp, true)
    try out.write("""{"prefix_len":2}""".getBytes("UTF-8")) finally out.close()
    assert(TrailIndex.open(spark, idxPath).count() > 0)
  }

  test("a db+index pair relocated together validates via the dbPath override") {
    val dir = Files.createTempDirectory("graft-idx-move")
    val dbPath = dir.resolve("db").toString
    val idxPath = dir.resolve("idx").toString
    val d = new TrailDBCons(spark, Seq("etype"))
      .add(Seq((uuidOf(1), 100L, "e1")).toDF("uuid", "time", "etype"))
      .finalizeTo(dbPath)
    TrailIndex.build(d, idxPath)

    // move the db: rename preserves the info sidecar's mtime, so the
    // fingerprint survives relocation
    val moved = dir.resolve("db-moved")
    Files.move(dir.resolve("db"), moved)
    // recorded path is gone → refuse without the override
    val e = intercept[IllegalStateException] { TrailIndex.open(spark, idxPath) }
    assert(e.getMessage.contains("STALE INDEX"), e.getMessage)
    // explicit new location → same fingerprint → opens
    assert(TrailIndex.open(spark, idxPath, Some(moved.toString)).count() > 0)
    // but the override NEVER relaxes the fingerprint itself: rewrite the
    // moved db and the same override is refused
    Thread.sleep(5)
    new TrailDBCons(spark, Seq("etype"))
      .add(Seq((uuidOf(2), 200L, "e2")).toDF("uuid", "time", "etype"))
      .finalizeTo(moved.toString)
    val e2 = intercept[IllegalStateException] {
      TrailIndex.open(spark, idxPath, Some(moved.toString))
    }
    assert(e2.getMessage.contains("STALE INDEX"), e2.getMessage)
  }
}
