package graft.core

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

import graft.filter.{Clause, EventFilter, Match, TimeRange}

/** Explicit inverted skipping index — the Spark-native analog of `tdb index`
  * (reference: tdbcli/tdb_index.c).
  *
  * The reference splits the trail space into ≤65,534 contiguous pages over
  * the uuid-sorted trail order and stores `item → [page_id,...]`
  * (tdbcli/tdb_index.c:25-131). Because our finalized layout is uuid-sorted
  * too (TrailDBCons), the honest page analog is a uuid HEX PREFIX: an index
  * entry is `(field, value, page)` where page = first `prefixLen` hex chars
  * of the uuid. Query-time pruning then emits `uuid LIKE 'page%'`
  * disjunctions, which Spark pushes to the Parquet scan as
  * StringStartsWith — row-group min/max stats skip every page-range that
  * cannot contain a candidate trail, exactly the reference's "Evaluating
  * X/N trails" effect (tdbcli/op_dump.c:239-247).
  *
  * Query semantics mirror tdbcli/tdb_index.c:575-606 exactly:
  * each clause's POSITIVE terms OR their page lists; a clause containing a
  * negated or time-range term is useless for pruning (all pages); clauses
  * AND by page-set intersection; the result may contain false positives, so
  * the full CNF filter is always still applied after the pruned scan.
  *
  * Scale: the index table is tiny relative to the data —
  * O(Σ_field lexicon_size × pages_touched) rows of three short strings —
  * and is built with one distinct (a single shuffle on (field, value,
  * page)). Query-time page lookup collects only the matched index rows
  * (bounded by terms × 16^prefixLen).
  */
object TrailIndex {

  /** Default prefix length 2 → 256 pages, plenty for row-group granularity;
    * the reference defaults to ~64k pages for up to 2^47 trails. */
  val DefaultPrefixLen = 2

  /** Build the inverted index over every user field of `db` and write it as
    * Parquet at `path` (reference: `tdb index` builds <db>.index;
    * tdbcli/tdb_index.c:721-779). */
  def build(db: TrailDB, path: String, prefixLen: Int = DefaultPrefixLen): Unit =
    entries(db, prefixLen)
      .write.mode(SaveMode.Overwrite).parquet(path)

  /** The index entries (field, value, page) as a DataFrame — NULL stored as
    * "" (the reference's val-0 item is indexable like any other). */
  def entries(db: TrailDB, prefixLen: Int = DefaultPrefixLen): DataFrame = {
    val fs = db.fields
    require(fs.nonEmpty, "index over a db with no user fields")
    db.df.select(
        substring(col(TrailSchema.UuidCol), 1, prefixLen).as("page"),
        explode(array(fs.map(f =>
          struct(lit(f).as("field"),
            coalesce(col(f), lit("")).as("value"))): _*)).as("fv"))
      .select(col("fv.field"), col("fv.value"), col("page"))
      .distinct()
  }

  def open(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(path)

  /** Candidate pages for `filter`, or None when the index cannot prune
    * (reference returns "all pages" in that case; tdb_index.c:575-606):
    *  - clause with any negated / time-range / unknown-handling term → that
    *    clause contributes nothing to pruning;
    *  - if NO clause is fully positive, the index is useless → None;
    *  - otherwise intersect the per-clause page unions (CNF AND).
    * A Some(empty set) means the index PROVES no trail can match. */
  def candidatePages(index: DataFrame, filter: EventFilter): Option[Set[String]] = {
    val indexable: Seq[Seq[Match]] = filter.clauses.flatMap { c =>
      val pos = c.terms.collect { case m @ Match(_, _, false) => m }
      if (pos.size == c.terms.size && pos.nonEmpty) Some(pos) else None
    }
    if (indexable.isEmpty) return None

    // One scan of the (small) index for all terms of all prunable clauses.
    val wanted = indexable.flatten.map(m => (m.field, m.value)).distinct
    val pred = wanted.map { case (f, v) =>
      col("field") === lit(f) && col("value") === lit(v)
    }.reduce(_ || _)
    val hits: Map[(String, String), Set[String]] =
      index.filter(pred).select("field", "value", "page").collect()
        .groupBy(r => (r.getString(0), r.getString(1)))
        .map { case (k, rs) => k -> rs.map(_.getString(2)).toSet }

    val perClause = indexable.map(_.map(m =>
      hits.getOrElse((m.field, m.value), Set.empty[String])).reduce(_ union _))
    Some(perClause.reduce(_ intersect _))
  }

  /** A db handle restricted to the candidate pages for `filter` — the
    * pushdown-friendly startsWith disjunction prunes row groups before IO;
    * the FULL filter must still be applied on top (false positives are
    * re-checked, same guarantee as the reference's cursor filter;
    * tdbcli/op_dump.c:239-247). */
  def prunedDb(db: TrailDB, index: DataFrame, filter: EventFilter): TrailDB =
    candidatePages(index, filter) match {
      case None => db
      case Some(pages) =>
        val pagePred =
          if (pages.isEmpty) lit(false)
          else pages.toSeq.sorted.map(p =>
            col(TrailSchema.UuidCol).startsWith(p)).reduce(_ || _)
        db.restrict(pagePred)
    }

  /** Index-pruned scan: identical rows to `db.events(filter)`. */
  def prunedEvents(db: TrailDB, index: DataFrame, filter: EventFilter): DataFrame =
    prunedDb(db, index, filter).events(filter)
}
