package graft.core

/** Typed failure surface for the CLI boundary — the analog of the
  * reference's `tdb_error` enum + `tdb_error_str` (src/tdb.c:591-675):
  * every failure class carries a stable NAME (reusing the reference's
  * string where one exists) and a DISTINCT process exit code, so scripts
  * can branch on the failure kind exactly as they would on the reference's
  * error codes. Messages stay loud and specific; the hierarchy only adds
  * the machine-readable classification on top.
  *
  * Exit codes: 1 = unclassified, 2 = bad arguments, 3 = open failure,
  * 4 = filter parse error, 5 = stale/unverifiable index, 6 = invalid
  * field name, 7 = duplicate fields, 8 = too many fields,
  * 9 = only-diff-items combined with a filter, 10 = append field
  * mismatch, 11 = invalid time range, 12 = timestamp too large for the
  * package format, 13 = lexicon too large for the package export,
  * 14 = a trail exceeding an operator's maxTrailEvents bound.
  */
sealed abstract class GraftError(val errName: String, val exitCode: Int,
    message: String, cause: Throwable)
    extends RuntimeException(s"$errName: $message", cause)

object GraftError {

  /** Bad command-line arguments — unknown op, missing required flag, a
    * value-taking flag with no value (the reference DIEs from its usage
    * checks, tdbcli/main.c:226-266). */
  final case class BadArgs(msg: String)
      extends GraftError("TDB_ERR_ARGS", 2, msg, null)

  /** A db / index / input path that cannot be opened —
    * TDB_ERR_IO_OPEN (src/tdb.c:616-617). */
  final case class OpenError(msg: String, causeEx: Throwable = null)
      extends GraftError("TDB_ERR_IO_OPEN", 3, msg, causeEx)

  /** Malformed filter expression — the reference's parse_filter DIE paths
    * (tdbcli/filter.c:18-140). */
  final case class FilterParseError(msg: String, causeEx: Throwable = null)
      extends GraftError("TDB_ERR_FILTER_PARSE", 4, msg, causeEx)

  /** A field name failing the constructor's rules — charset
    * `[A-Za-z0-9_%-]`, length 1..511, "time" (and graft's other reserved
    * schema columns) excluded (reference: src/tdb_cons.c:181-196
    * is_fieldname_invalid, tdb_error.h:47). */
  final case class InvalidFieldname(msg: String)
      extends GraftError("TDB_ERR_INVALID_FIELDNAME", 6, msg, null)

  /** The same field name listed twice at cons-open
    * (reference: src/tdb_cons.c:206-223, tdb_error.h:46). */
  final case class DuplicateFields(msg: String)
      extends GraftError("TDB_ERR_DUPLICATE_FIELDS", 7, msg, null)

  /** More user fields than the format supports — TDB_MAX_NUM_FIELDS =
    * 2^14 - 2 (reference: src/tdb_limits.h:24, src/tdb_cons.c:264-265,
    * tdb_error.h:45). */
  final case class TooManyFields(msg: String)
      extends GraftError("TDB_ERR_TOO_MANY_FIELDS", 8, msg, null)

  /** Only-diff-items combined with an event filter — the reference
    * refuses the pair wherever they meet (src/tdb_decode.c:110-120
    * cursor_set_event_filter, :140-181 get_trail under a db/trail
    * filter): filtering diff-encoded events answers a DIFFERENT question
    * than diffing filtered events, so the incoherent combination fails
    * loudly instead of silently picking one. */
  final case class OnlyDiffFilter(msg: String)
      extends GraftError("TDB_ERR_ONLY_DIFF_FILTER", 9, msg, null)

  /** `append` with a different field list — the reference deliberately
    * refuses the permissive fill-with-NULLs join at cons_append
    * (src/tdb_cons.c:629-638, tdb_error.h:49); schema-union is merge's
    * job, not append's. */
  final case class AppendFieldsMismatch(msg: String)
      extends GraftError("TDB_ERR_APPEND_FIELDS_MISMATCH", 10, msg, null)

  /** A time-range term whose end <= start — refused at build like
    * tdb_event_filter_add_time_range (src/tdb.c:861-879,
    * tdb_error.h:58 TDB_ERR_INVALID_RANGE). */
  final case class InvalidRange(msg: String)
      extends GraftError("TDB_ERR_INVALID_RANGE", 11, msg, null)

  /** The single-file `.tdb` export meets the format's timestamp limits —
    * min timestamp or max delta at/over 2^47 (reference:
    * src/tdb_limits.h:33, src/tdb_encode.c:113-122,150-152). The parquet
    * layout itself has no such limit; only the interchange format does. */
  final case class TimestampTooLarge(msg: String)
      extends GraftError("TDB_ERR_TIMESTAMP_TOO_LARGE", 12, msg, null)

  /** The single-file export's per-field lexicon exceeds the documented
    * driver cap (the reference's analog is TDB_ERR_LEXICON_TOO_LARGE,
    * tdb_error.h:50, raised when a lexicon outgrows the format). */
  final case class LexiconTooLarge(msg: String)
      extends GraftError("TDB_ERR_LEXICON_TOO_LARGE", 13, msg, null)

  /** A single trail exceeds an operator's `maxTrailEvents` bound — raised
    * by [[graft.agg.TrailGuard]] BEFORE any per-trail array materializes,
    * so a whale trail (a bot uuid holding 10^7-10^8 events) refuses
    * loudly instead of OOM-ing an executor inside a `collect_list`. No
    * reference analog (the C engine streams trails through a cursor and
    * never materializes one); the graft-side whale-cell refusal
    * discipline of ops/Dedup.scala applied to trail-sequence folds. */
  final case class TrailTooLong(msg: String)
      extends GraftError("GRAFT_ERR_TRAIL_TOO_LONG", 14, msg, null)

  /** Classify ANY failure escaping a CLI op into (errName, exitCode).
    * Typed GraftErrors carry their own; [[StaleIndexException]] (which
    * must stay an IllegalStateException for API compatibility) maps to its
    * reserved code; everything else is the generic failure. */
  def classify(e: Throwable): (String, Int) = e match {
    case ge: GraftError => (ge.errName, ge.exitCode)
    case _: StaleIndexException => ("TDB_ERR_STALE_INDEX", 5)
    case _ => ("TDB_ERR_UNKNOWN", 1)
  }
}

/** An index whose db binding fails (or cannot complete) its staleness
  * check. Extends IllegalStateException so existing library callers that
  * catch the refusal by that type keep working; the CLI maps it to exit
  * code 5 via [[GraftError.classify]]. */
final class StaleIndexException(msg: String, cause: Throwable = null)
    extends IllegalStateException(msg, cause)
