package graft.filter

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** CNF event-filter algebra mirroring the reference's `tdb_event_filter`
  * (reference: src/tdb_internal.h:38-51 — flat array of OR-clauses AND'd
  * together; terms are dictionary items or time ranges).
  *
  * Reference semantics we encode exactly:
  *  - A term is `field=value`, `field!=value`, or `start <= time < end`
  *    (half-open; reference: src/tdb_decode.c:32-38).
  *  - Terms within a clause are OR'd; clauses are AND'd
  *    (reference: src/tdb_decode.c:15-61 `event_satisfies_filter`).
  *  - A freshly created filter has ONE EMPTY clause and matches nothing
  *    (reference: src/tdb.c:803-816); a filter with ZERO clauses matches
  *    everything (vacuous AND).
  *  - The NULL value is the empty string: `field=` matches events where the
  *    field is unset (reference: src/tdb.c:488-511 — length-0 value is val 0).
  *  - A positive term on an unknown field/value matches nothing; a NEGATED
  *    term on an unknown field/value matches everything
  *    (reference: src/tdb_decode.c:39-51, tdbcli/filter.c:85-90).
  *
  * Compiled to a Catalyst [[Column]] so predicate pushdown, constant folding
  * and whole-stage codegen all apply — the reference's page-index pruning
  * (tdbcli/tdb_index.c) is subsumed by Parquet row-group/dictionary pushdown.
  */
sealed trait Term
final case class Match(field: String, value: String, negated: Boolean = false) extends Term
/** Half-open [start, end) on the `time` column (reference: src/tdb.c:861-879). */
final case class TimeRange(start: Long, end: Long) extends Term {
  // the reference refuses end <= start AT BUILD (src/tdb.c:861-879,
  // TDB_ERR_INVALID_RANGE) — same typed refusal here, so the CLI exits
  // with the range code, not the generic filter-parse one
  if (end <= start)
    throw graft.core.GraftError.InvalidRange(
      s"time range end must be > start (got [$start, $end))")
}

final case class Clause(terms: Seq[Term])

final case class EventFilter(clauses: Seq[Clause]) {
  import EventFilter._

  /** Compile to a Column against a schema with columns `fields` (which
    * excludes uuid/time; `time` is always present as LongType).
    */
  def toColumn(fields: Set[String]): Column =
    if (clauses.isEmpty) lit(true)
    else balancedReduce(clauses.map(clauseColumn(_, fields)))(_ && _)

  /** CNF text form using the reference CLI grammar (tdbcli/filter.c:18-34):
    * space = OR within a clause, `&` = AND between clauses. */
  def render: String =
    clauses.map(_.terms.map {
      case Match(f, v, false) => s"$f=$v"
      case Match(f, v, true)  => s"$f!=$v"
      case TimeRange(s, e)    => s"time>=$s time<$e" // informational only
    }.mkString(" ")).mkString(" & ")
}

object EventFilter {
  /** Matches every event (zero clauses — vacuous AND). */
  val matchAll: EventFilter = EventFilter(Nil)
  /** Matches nothing (one empty clause — vacuous OR; reference: src/tdb.c:803-816). */
  val matchNone: EventFilter = EventFilter(Seq(Clause(Nil)))

  private def termColumn(t: Term, fields: Set[String]): Column = t match {
    case TimeRange(s, e) =>
      col("time") >= lit(s) && col("time") < lit(e)
    case Match(f, v, negated) if !fields.contains(f) =>
      // Unknown field: positive term matches nothing, negated matches all
      // (reference: src/tdb_decode.c:47-51 — item 0 compare).
      lit(negated)
    // NULL ≡ "" (reference val 0) expressed with null-aware predicates
    // rather than coalesce(f,'') — IsNull/EqualTo push down to the Parquet
    // scan (row-group stats + dictionary pruning); a coalesce wrapper
    // would disable pushdown entirely.
    case Match(f, "", false) => col(f).isNull || col(f) === lit("")
    case Match(f, "", true)  => col(f).isNotNull && col(f) =!= lit("")
    case Match(f, v, false)  => col(f) === lit(v)
    case Match(f, v, true)   => col(f).isNull || col(f) =!= lit(v)
  }

  /** Pairwise (balanced) reduce — a left-deep `reduce` builds a chain as
    * deep as the term count, and Spark's Column→Expression conversion
    * recurses per node: a 1000-value clause (a big `--uuids` list, the
    * event_filter_large.c shape) overflows the stack. Balancing bounds
    * depth at log2(n). Shared with the index page-predicate builders,
    * which face the same width (up to 65k page prefixes). */
  private[graft] def balancedReduce(cols: Seq[Column])(op: (Column, Column) => Column): Column = {
    var cur = cols
    while (cur.length > 1)
      cur = cur.grouped(2)
        .map(g => if (g.length == 2) op(g.head, g(1)) else g.head).toSeq
    cur.head
  }

  private def clauseColumn(c: Clause, fields: Set[String]): Column =
    if (c.terms.isEmpty) lit(false)
    else {
      // Same-field positive equality terms collapse to ONE `isin` — a
      // Catalyst In, which reaches the parquet scan as a pushed In filter
      // (a 1000-way OR chain pushes nothing) and keeps expression depth
      // constant no matter how wide the disjunction. NULL semantics are
      // unchanged: a positive equality never matches NULL, and In on a
      // NULL column is null → filtered, exactly like the OR chain.
      val (posEq, rest) = c.terms.partition {
        case Match(f, v, false) => fields.contains(f) && v.nonEmpty
        case _ => false
      }
      val collapsed = posEq.collect { case m: Match => m }
        .groupBy(_.field).toSeq.sortBy(_._1).map {
          case (f, ms) if ms.length >= 2 =>
            col(f).isin(ms.map(_.value).distinct: _*)
          case (f, ms) => col(f) === lit(ms.head.value)
        }
      balancedReduce(collapsed ++ rest.map(termColumn(_, fields)))(_ || _)
    }

  /** Parse the reference CLI filter grammar (tdbcli/filter.c:18-140):
    * whitespace separates OR'd terms, `&` separates AND'd clauses;
    * `f=v` equality, `f!=v` negation, `f=` tests for the NULL/"" value,
    * and `f=@path` / `f!=@path` reads the value from a file — the ENTIRE
    * file content verbatim, trailing newline included (the reference mmaps
    * st_size bytes, filter.c:45-59; an empty file is the NULL/"" value).
    * There is no escape for a literal leading '@', matching the reference.
    */
  def parse(text: String): EventFilter = {
    val trimmed = text.trim
    if (trimmed.isEmpty) return matchNone
    // limit -1: keep trailing empty strings, so a trailing '&' is caught
    // by the empty-clause check below instead of silently vanishing.
    val clauses = trimmed.split("&", -1).map { clauseText =>
      val toks = clauseText.trim.split("\\s+").filter(_.nonEmpty)
      // A stray '&&' / leading / trailing '&' yields a term-less clause,
      // which compiles to FALSE and silently makes the WHOLE filter match
      // nothing — the worst failure mode for a filter typo. Loud instead.
      require(toks.nonEmpty,
        s"filter '$text': empty clause (stray '&' or '&&'?) — clauses are " +
        "separated by a single '&'")
      val terms = toks.map { tok =>
        // the reference splits at the FIRST '=' and treats the term as
        // negated iff the char before it is '!' (filter.c:70-75) — a
        // first-"!=" search instead would misparse a POSITIVE term whose
        // value contains "!=" (e.g. q=a!=b) into a negated term on a
        // nonexistent field, which matches EVERYTHING
        val (f, v, neg) = {
          val i = tok.indexOf('=')
          require(i > 0, s"bad filter term '$tok' (expected field=value)")
          if (tok.charAt(i - 1) == '!') {
            require(i > 1, s"bad filter term '$tok'")
            (tok.substring(0, i - 1), tok.substring(i + 1), true)
          } else (tok.substring(0, i), tok.substring(i + 1), false)
        }
        Match(f, resolveValue(v), neg): Term
      }
      Clause(terms.toIndexedSeq)
    }
    EventFilter(clauses.toIndexedSeq)
  }

  /** `@path` value indirection (tdbcli/filter.c:45-59): the file's full
    * content, read once at parse time on the driver (the reference reads it
    * on the CLI host at parse time too — never inside query execution). */
  private def resolveValue(v: String): String =
    if (!v.startsWith("@")) v
    else {
      val path = v.substring(1)
      require(path.nonEmpty, "filter: '=@' with an empty file path")
      new String(
        java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(path)),
        java.nio.charset.StandardCharsets.UTF_8)
    }
}
