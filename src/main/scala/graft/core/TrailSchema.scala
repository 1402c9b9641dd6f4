package graft.core

import org.apache.spark.sql.types._

/** Canonical trail-table contract (reference data model:
  * doc/docs/technical_overview.md:5-24 — "UUID would be the primary key,
  * event would be a row, and fields would be the columns").
  *
  * A trail table is a DataFrame with:
  *   - `uuid: String`  — 32-char lowercase hex (reference: src/tdb_uuid.c:52-75)
  *   - `time: Long`    — application-defined epoch, u64 in the reference
  *                       (src/traildb.h:47); LongType here
  *   - N categorical `String` fields; NULL is the empty string
  *                       (reference: src/tdb.c:488-511 — length-0 val is 0)
  *   - `seq: Long`     — input sequence number used as a deterministic sort
  *                       tiebreaker for duplicate (uuid, time); the reference
  *                       qsort is non-stable (src/tdb_encode.c:102-106 TODO)
  */
object TrailSchema {
  val UuidCol = "uuid"
  val TimeCol = "time"
  val SeqCol  = "seq"
  /** Hive partition column for time-sharded layouts (finalizePartitioned). */
  val BucketCol = "_bucket"
  val ReservedCols: Set[String] = Set(UuidCol, TimeCol, SeqCol, BucketCol)

  /** Reference limit TDB_MAX_FIELDNAME_LENGTH (src/tdb_limits.h:9) — an
    * EXCLUSIVE bound: is_fieldname_invalid rejects a name that reaches it
    * (src/tdb_cons.c:192), so valid lengths are 1..511. */
  val MaxFieldNameLength = 512

  /** Reference limit TDB_MAX_NUM_FIELDS = 2^14 - 2 (src/tdb_limits.h:24) —
    * the cap on USER fields at cons-open (src/tdb_cons.c:264-265). */
  val MaxNumFields: Int = (1 << 14) - 2

  /** Mirrors `is_fieldname_invalid` (reference: src/tdb_cons.c:181-196):
    * nonempty, length < 512, and every char in TDB_FIELDNAME_CHARS =
    * `[A-Za-z0-9_%-]` (src/tdb_limits.h:48-51 — field names become
    * filenames in the reference, hence the urlencode-safe set; here they
    * become Parquet column names, where the same set avoids Spark's
    * dotted/backtick quoting hazards). Field 0 is always the implicit
    * `time` (src/tdb.c:193), so "time" is rejected as a user field name;
    * graft also reserves uuid/seq/_bucket, its real schema columns —
    * `_bucket` starts with `_` and "uuid" is reference-legal, so both are
    * graft-specific reservations (documented divergence).
    */
  def isValidFieldName(name: String): Boolean =
    name.nonEmpty &&
      name.length < MaxFieldNameLength &&
      !ReservedCols.contains(name) &&
      name.forall(c =>
        (c >= 'a' && c <= 'z') || (c >= 'A' && c <= 'Z') ||
        (c >= '0' && c <= '9') || c == '_' || c == '-' || c == '%')

  /** Validate a user field list exactly like cons-open (reference:
    * src/tdb_cons.c:258-281): count cap, then per-name charset, then
    * duplicates — each failure its own typed error / exit code. */
  def validateFields(fields: Seq[String]): Either[GraftError, Seq[String]] = {
    if (fields.size > MaxNumFields)
      Left(GraftError.TooManyFields(
        s"${fields.size} fields exceeds TDB_MAX_NUM_FIELDS=$MaxNumFields"))
    else fields.find(!isValidFieldName(_)) match {
      case Some(bad) => Left(GraftError.InvalidFieldname(s"invalid field name '$bad'"))
      case None =>
        val dups = fields.groupBy(identity).collect { case (n, vs) if vs.size > 1 => n }
        if (dups.nonEmpty)
          Left(GraftError.DuplicateFields(s"duplicate field name(s): ${dups.mkString(",")}"))
        else Right(fields)
    }
  }

  def schemaFor(fields: Seq[String]): StructType =
    StructType(
      StructField(UuidCol, StringType, nullable = false) ::
      StructField(TimeCol, LongType, nullable = false) ::
      fields.toList.map(f => StructField(f, StringType, nullable = true)) :::
      StructField(SeqCol, LongType, nullable = false) :: Nil)

  /** User fields of a trail DataFrame = every column that isn't reserved. */
  def userFields(schema: StructType): Seq[String] =
    schema.fieldNames.toIndexedSeq.filterNot(ReservedCols.contains)
}
