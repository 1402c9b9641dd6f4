package graft

import org.apache.spark.sql.functions._
import graft.core.{TrailDB, TrailSchema}
import graft.filter._

/** Filter semantics against the reference micro-fixture
  * (tests/c-tests/event_filter_simple.c:18-37 and
  * time_range_filter_simple.c — see FIXTURES.md §2a):
  * one trail, fields a,b,c, 4 events at t=1..4:
  *   (foo,bar,""), (foo,sun,""), (foo,run,""), ("",sun,nam).
  */
class FilterSpec extends SparkSpec {
  import spark.implicits._

  private val Z = "0" * 32

  private lazy val db: TrailDB = TrailDB.fromTrailFrame(
    Seq(
      (Z, 1L, "foo", "bar", "", 0L),
      (Z, 2L, "foo", "sun", "", 1L),
      (Z, 3L, "foo", "run", "", 2L),
      (Z, 4L, "", "sun", "nam", 3L)
    ).toDF("uuid", "time", "a", "b", "c", "seq"))

  private def n(f: EventFilter): Long = db.events(f).count()

  test("equality term: a=foo matches 3 (event_filter_simple.c:51-60)") {
    assert(n(EventFilter(Seq(Clause(Seq(Match("a", "foo")))))) === 3)
  }

  test("empty-value term: c= matches the 3 events with NULL c (event_filter_simple.c:67-69)") {
    assert(n(EventFilter(Seq(Clause(Seq(Match("c", "")))))) === 3)
  }

  test("negation: a!=foo matches 1") {
    assert(n(EventFilter(Seq(Clause(Seq(Match("a", "foo", negated = true)))))) === 1)
  }

  test("disjunction within clause: b=bar b=run matches 2") {
    assert(n(EventFilter(Seq(Clause(Seq(Match("b", "bar"), Match("b", "run")))))) === 2)
  }

  test("conjunction of clauses: a=foo & b=sun matches 1") {
    assert(n(EventFilter(Seq(
      Clause(Seq(Match("a", "foo"))), Clause(Seq(Match("b", "sun")))))) === 1)
  }

  test("empty filter (one empty clause) matches nothing (src/tdb.c:803-816)") {
    assert(n(EventFilter.matchNone) === 0)
  }

  test("zero clauses matches everything") {
    assert(n(EventFilter.matchAll) === 4)
  }

  test("unknown field: positive matches nothing, negated matches all (src/tdb_decode.c:47-51)") {
    assert(n(EventFilter(Seq(Clause(Seq(Match("nope", "x")))))) === 0)
    assert(n(EventFilter(Seq(Clause(Seq(Match("nope", "x", negated = true)))))) === 4)
  }

  test("unknown value behaves as match-nothing positive / match-all negative") {
    assert(n(EventFilter(Seq(Clause(Seq(Match("a", "zzz")))))) === 0)
    assert(n(EventFilter(Seq(Clause(Seq(Match("a", "zzz", negated = true)))))) === 4)
  }

  test("time range is half-open: [2,3) matches 1 (time_range_filter_simple.c:48-90)") {
    assert(n(EventFilter(Seq(Clause(Seq(TimeRange(2, 3)))))) === 1)
    assert(n(EventFilter(Seq(Clause(Seq(TimeRange(2, 4)))))) === 2)
    val bad = intercept[graft.core.GraftError](TimeRange(3, 3))
    assert(bad.errName === "TDB_ERR_INVALID_RANGE" && bad.exitCode === 11)
  }

  test("duplicate terms in a clause are harmless (event_filter_simple.c dup terms)") {
    assert(n(EventFilter(Seq(Clause(Seq(Match("a", "foo"), Match("a", "foo")))))) === 3)
  }

  test("parser: grammar 'a=foo b=run & c!=' (tdbcli/filter.c:18-140)") {
    val f = EventFilter.parse("a=foo b=run & c!=")
    assert(f.clauses.size === 2)
    assert(f.clauses.head.terms === Seq(Match("a", "foo"), Match("b", "run")))
    assert(f.clauses(1).terms === Seq(Match("c", "", negated = true)))
    // (a=foo OR b=run) AND c not-null ⇒ only event 4 has c set... a=foo no.
    // events with c!="" : event 4 only; (a=foo|b=run) excludes event 4 ⇒ 0.
    assert(n(f) === 0)
    assert(n(EventFilter.parse("a= b=sun")) === 2) // a empty (ev4) OR b=sun (ev2,4) = 2
    assert(n(EventFilter.parse("")) === 0)         // empty text = match-none
    // a stray '&&' / leading / trailing '&' would make a term-less clause
    // that silently matches NOTHING — the parser refuses it loudly
    for (bad <- Seq("a=foo && b=run", "& a=foo", "a=foo &", "a=foo & & b=run")) {
      val e = intercept[IllegalArgumentException](EventFilter.parse(bad))
      assert(e.getMessage.contains("empty clause"), s"'$bad': ${e.getMessage}")
    }
  }

  test("parser: =@file value indirection reads the whole file verbatim (tdbcli/filter.c:45-59)") {
    val dir = java.nio.file.Files.createTempDirectory("graft-filter-at")
    val vf = dir.resolve("value.txt")
    java.nio.file.Files.writeString(vf, "foo") // no trailing newline
    assert(EventFilter.parse(s"a=@$vf") ===
      EventFilter(Seq(Clause(Seq(Match("a", "foo"))))))
    assert(n(EventFilter.parse(s"a=@$vf")) === 3)
    // negated indirection: a!=@file
    assert(n(EventFilter.parse(s"a!=@$vf")) === 1)
    // the reference mmaps st_size bytes — a trailing newline IS part of the
    // value, and an empty file is the NULL/"" value
    val nlf = dir.resolve("nl.txt")
    java.nio.file.Files.writeString(nlf, "foo\n")
    assert(EventFilter.parse(s"a=@$nlf") ===
      EventFilter(Seq(Clause(Seq(Match("a", "foo\n"))))))
    val empty = dir.resolve("empty.txt")
    java.nio.file.Files.writeString(empty, "")
    assert(n(EventFilter.parse(s"a=@$empty")) === 1) // a="" matches ev4 only
    // missing file fails loudly at parse time
    intercept[java.io.IOException] {
      EventFilter.parse(s"a=@$dir/definitely-missing")
    }
  }

  test("db-level filter is a view; a cursor filter REPLACES it (src/tdb_decode.c:141-181)") {
    val view = db.withFilter(EventFilter(Seq(Clause(Seq(Match("a", "foo"))))))
    assert(view.df.count() === 3)
    // ONE filter is active at a time in the reference: an explicit
    // cursor filter overrides the db-level filter, never ANDs with it —
    // b=sun matches events 2 AND 4 (event 4 fails a=foo, but the db
    // filter is inactive while a cursor filter is set)
    assert(view.events(EventFilter(Seq(Clause(Seq(Match("b", "sun")))))).count() === 2)
    // no cursor filter → the db view applies
    assert(view.events().count() === 3)
  }

  test("uuid keys: hex renderings normalize at ingest AND lookup; non-hex keys keep their case") {
    import graft.core.TrailDB
    val hexA = "123e4567e89b12d3a456426614174000"
    val ev = Seq(
      (hexA.toUpperCase.grouped(8).mkString("-"), 1L, "x"), // canonical-ish rendering
      (hexA, 2L, "y"),            // bare lowercase — SAME uuid
      ("UserA", 3L, "a"),         // non-hex: case is CONTENT
      ("usera", 4L, "b")).toDF("u", "t", "f1")
    val tdb = TrailDB.fromEvents(ev, "u", "t", Seq("f1"))
    // both hex renderings keyed ONE trail; case-distinct app keys stay two
    assert(tdb.numTrails === 3)
    // lookups normalize the ARGUMENT the same way (reference uuid_raw
    // accepts both renderings, src/tdb_uuid.c)
    assert(tdb.trail("123E4567-E89B-12D3-A456-426614174000").count() === 2)
    assert(tdb.whitelist(Seq(hexA.toUpperCase)).df.count() === 2)
    assert(tdb.blacklist(Seq("123E4567-E89B-12D3-A456-426614174000"))
      .df.count() === 2)
    assert(tdb.trail("UserA").count() === 1)
  }

  test("parser: first '=' splits the term — a positive value containing \"!=\" stays positive (filter.c:70-75)") {
    // the reference splits at the FIRST '=' and negates only when the
    // char BEFORE it is '!': "b=x!=y" is field b equals "x!=y" (matches
    // nothing here), NOT a negated term on nonexistent field "b=x"
    // (which would silently match EVERYTHING)
    val f = EventFilter.parse("b=x!=y")
    assert(f.clauses === Seq(Clause(Seq(Match("b", "x!=y")))))
    assert(n(f) === 0)
    assert(EventFilter.parse("a!=foo").clauses ===
      Seq(Clause(Seq(Match("a", "foo", negated = true)))))
  }

  test("per-trail filter overrides replace the db filter for those trails") {
    val other = "1" * 32
    val two = TrailDB.fromTrailFrame(
      db.df.union(Seq((other, 9L, "foo", "x", "", 9L))
        .toDF("uuid", "time", "a", "b", "c", "seq")))
      .withFilter(EventFilter.matchNone)
    // db filter matches nothing; override trail Z to match-all ⇒ only Z's 4.
    val got = two.eventsWithTrailFilters(Map(Z -> EventFilter.matchAll))
    assert(got.count() === 4)
    assert(got.select("uuid").distinct().collect().map(_.getString(0)).toSet === Set(Z))
  }

  test("large-override-map JOIN path returns identical rows to the disjunction path (SURVEY §7.4.3)") {
    // 40 trails, 3 events each; db filter keeps a=foo; overrides send some
    // trails to a different filter, some to match-none, some to match-all
    val rows = for { t <- 0 until 40; e <- 0 until 3 } yield
      (f"$t%032x", (e + 1).toLong,
        if (e == 0) "foo" else "bar", s"b$e", "", (t * 3 + e).toLong)
    val big = TrailDB.fromTrailFrame(
      rows.toDF("uuid", "time", "a", "b", "c", "seq"))
      .withFilter(EventFilter(Seq(Clause(Seq(Match("a", "foo"))))))
    val overrides: Map[String, EventFilter] = (0 until 25).map { t =>
      f"$t%032x" -> (t % 3 match {
        case 0 => EventFilter.matchAll
        case 1 => EventFilter.matchNone
        case 2 => EventFilter(Seq(Clause(Seq(Match("b", "b2")))))
      })
    }.toMap
    def key(r: org.apache.spark.sql.Row) = (r.getString(0), r.getLong(1), r.getLong(5))
    val viaDisjunction = big.eventsWithTrailFilters(overrides).collect().map(key).toSet
    val viaJoin = big.eventsWithTrailFilters(overrides, joinThreshold = 0)
      .collect().map(key).toSet
    assert(viaJoin === viaDisjunction)
    assert(viaDisjunction.nonEmpty)
    // sanity of the mix: match-all trails contribute all 3 events,
    // match-none trails contribute 0, b=b2 trails exactly 1
    val byTrail = viaDisjunction.groupBy(_._1).view.mapValues(_.size).toMap
    assert(byTrail(f"${0}%032x") === 3)   // match-all
    assert(!byTrail.contains(f"${1}%032x")) // match-none
    assert(byTrail(f"${2}%032x") === 1)   // b=b2
    assert(byTrail(f"${30}%032x") === 1)  // no override: db filter a=foo
    // width stress: 2000 overrides on the DISJUNCTION path (threshold
    // above the map size) — the balanced reduce keeps expression depth
    // log2(n); the left-deep chain this replaced overflowed at ~1000
    val wide = (0 until 2000).map(t =>
      f"$t%032x" -> EventFilter.matchAll).toMap
    assert(big.eventsWithTrailFilters(wide, joinThreshold = 5000)
      .count() === 40 * 3)  // every trail overridden to match-all
  }

  test("large filters: a 1000-term OR clause and 1000 empty clauses (event_filter_large.c)") {
    val big = TrailDB.fromTrailFrame(
      (0 until 1000).map(i =>
        (f"$i%032x", 1L, i.toString, if (i % 2 == 1) "t" else "", i.toLong))
        .toDF("uuid", "time", "number", "is_odd", "seq"))
    // odd/even split via the sparse field (the C test's first checks)
    assert(big.events(EventFilter(Seq(Clause(Seq(Match("is_odd", "t")))))).count() === 500)
    assert(big.events(EventFilter(Seq(Clause(Seq(Match("is_odd", "t", negated = true)))))).count() === 500)
    // one clause OR-ing all 1000 values matches everything; half matches half
    def union(n: Int) = EventFilter(Seq(Clause(
      (0 until n).map(i => Match("number", i.toString): Term))))
    assert(big.events(union(1000)).count() === 1000)
    assert(big.events(union(500)).count() === 500)
    // a long conjunction of empty clauses is valid and matches nothing
    assert(big.events(EventFilter(Seq.fill(1000)(Clause(Nil)))).count() === 0)
  }

  test("huge uuid lists route whitelist/blacklist to the join path, same rows") {
    val many = TrailDB.fromTrailFrame(
      (0 until 50).map(t => (f"$t%032x", 1L, "x", "", "", t.toLong))
        .toDF("uuid", "time", "a", "b", "c", "seq"))
    // a list one past the threshold: 25 real trails + padding uuids that
    // match nothing — the join path must return exactly the isin rows
    val real = (0 until 25).map(t => f"$t%032x")
    val pad = (0 until TrailDB.LargeListThreshold - 24).map(i => f"${1000000 + i}%032x")
    val bigList = real ++ pad
    assert(bigList.size === TrailDB.LargeListThreshold + 1)
    assert(many.whitelist(bigList).df.count() ===
      many.whitelist(real).df.count())
    assert(many.blacklist(bigList).df.count() ===
      many.blacklist(real).df.count())
    assert(many.whitelist(bigList).df.count() === 25)
    assert(many.blacklist(bigList).df.count() === 25)
  }

  test("only-diff-items refuses on a filtered view (TDB_ERR_ONLY_DIFF_FILTER, tdb_decode.c:110-120)") {
    val e = intercept[graft.core.GraftError](
      db.withFilter("a=foo").onlyDiffItems)
    assert(e.errName === "TDB_ERR_ONLY_DIFF_FILTER")
    assert(e.exitCode === 9)
    // the unfiltered view still diffs fine
    assert(db.onlyDiffItems.count() === 4)
  }
}
