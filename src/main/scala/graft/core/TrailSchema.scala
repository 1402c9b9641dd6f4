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

  /** Reference limit TDB_MAX_FIELDNAME_LENGTH (src/tdb_limits.h:44-51). */
  val MaxFieldNameLength = 512

  /** Mirrors `is_fieldname_invalid` (reference: src/tdb_cons.c:181-196):
    * nonempty, bounded length, chars in the printable set excluding
    * whitespace and the chars the CLI grammar reserves. Field 0 is always
    * the implicit `time` (src/tdb.c:193), so "time" is rejected as a user
    * field name.
    */
  def isValidFieldName(name: String): Boolean =
    name.nonEmpty &&
      name.length <= MaxFieldNameLength &&
      !ReservedCols.contains(name) && // time/uuid reserved by the reference; seq by our tiebreak column
      name.forall(c => c > 32 && c < 127 && c != '=' && c != '&' && c != '!')

  /** Validate a user field list: charset + duplicate rejection
    * (reference: src/tdb_cons.c:198-223 rejects duplicate names). */
  def validateFields(fields: Seq[String]): Either[String, Seq[String]] = {
    fields.find(!isValidFieldName(_)) match {
      case Some(bad) => Left(s"invalid field name '$bad'")
      case None =>
        val dups = fields.groupBy(identity).collect { case (n, vs) if vs.size > 1 => n }
        if (dups.nonEmpty) Left(s"duplicate field name(s): ${dups.mkString(",")}")
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
