package graft

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import graft.filter._

/** Property-based check of the CNF filter compiler against a direct Scala
  * interpreter of the reference semantics (src/tdb_decode.c:15-61):
  * clauses AND'd, terms OR'd, NULL ≡ "", unknown field positive=false /
  * negated=true, half-open time ranges. The reference has no property
  * tests — this is a deliberate hardening (SURVEY §5).
  *
  * All sampled filters are evaluated as boolean columns in ONE Spark job.
  */
class FilterPropertySpec extends SparkSpec {
  import spark.implicits._

  // known schema: fields a, b; "zz" is an unknown field
  private val fieldPool = Seq("a", "b", "zz")
  private val valuePool = Seq("", "x", "y", "z")

  private val genTerm: Gen[Term] = Gen.frequency(
    8 -> (for {
      f <- Gen.oneOf(fieldPool)
      v <- Gen.oneOf(valuePool)
      n <- Gen.oneOf(true, false)
    } yield Match(f, v, n): Term),
    2 -> (for {
      s <- Gen.choose(0L, 8L)
      len <- Gen.choose(1L, 4L)
    } yield TimeRange(s, s + len): Term))

  private val genFilter: Gen[EventFilter] = for {
    nClauses <- Gen.choose(0, 3)
    clauses <- Gen.listOfN(nClauses,
      Gen.choose(0, 3).flatMap(n => Gen.listOfN(n, genTerm).map(ts => Clause(ts))))
  } yield EventFilter(clauses)

  /** Direct interpreter of the reference semantics. */
  private def oracle(f: EventFilter, time: Long, ev: Map[String, String]): Boolean =
    f.clauses.forall(_.terms.exists {
      case TimeRange(s, e) => time >= s && time < e
      case Match(fld, v, neg) if !Set("a", "b").contains(fld) => neg
      case Match(fld, v, neg) =>
        val fv = ev.getOrElse(fld, "")
        if (neg) fv != v else fv == v
    })

  // fixed event table: all (time, a, b) combos over the pools, incl. nulls
  private lazy val events: Seq[(Long, String, String)] = for {
    t <- 0L to 9L
    a <- valuePool :+ null
    b <- Seq("x", null)
  } yield (t, a, b)

  test("compiled Column matches the reference interpreter on random CNF filters") {
    val filters = Gen.listOfN(120, genFilter).sample.get
    val df = events.toDF("time", "a", "b")
    val cols = filters.zipWithIndex.map { case (f, i) =>
      f.toColumn(Set("a", "b")).as(s"f$i")
    }
    val got = df.select(cols: _*).collect()
    events.zip(got).foreach { case ((t, a, b), row) =>
      val ev = Seq(Option(a).map("a" -> _), Option(b).map("b" -> _)).flatten.toMap
      filters.zipWithIndex.foreach { case (f, i) =>
        val expected = oracle(f, t, ev)
        val actual = !row.isNullAt(i) && row.getBoolean(i)
        assert(actual === expected,
          s"filter ${f.render} [$f] on (t=$t a=$a b=$b): got $actual want $expected")
      }
    }
  }

  test("parser round-trips rendered filters (grammar-expressible subset)") {
    val samples = Iterator.continually(genFilter.sample).flatten.take(500)
    var checked = 0
    samples.foreach { f =>
      val grammarSafe = f.clauses.nonEmpty &&
        f.clauses.forall(c => c.terms.nonEmpty && c.terms.forall {
          case Match(_, v, _) => !v.contains(" ") && !v.contains("&")
          case _: TimeRange   => false
        })
      if (grammarSafe) {
        assert(EventFilter.parse(f.render) === f, s"round-trip failed for '${f.render}'")
        checked += 1
      }
    }
    assert(checked > 20, s"only $checked grammar-safe samples — generator too narrow")
  }
}
