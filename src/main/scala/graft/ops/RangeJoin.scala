package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Interval (range) join without a nested-loop plan.
  *
  * A pure inequality join — points whose timestamp falls inside an
  * interval, with NO equality key — is the one join shape Catalyst cannot
  * hash or sort-merge: it plans BroadcastNestedLoopJoin when one side fits
  * the broadcast threshold and CartesianProduct when neither does, both
  * O(|points| × |intervals|) compares. The reference's analyses hit this
  * shape whenever trail events are sliced against campaign / experiment /
  * outage windows (the time-range filter of `tdbcli/filter.c` generalized
  * from one literal window to a TABLE of windows).
  *
  * Binning turns it into an equi-join: pick a bin width ≥ the maximum
  * interval length, map every point to the single bin containing its
  * timestamp, explode every interval onto each bin it overlaps (≤ 2 bins
  * when width ≥ max length, generally ceil(len/width)+1), hash/sort-merge
  * join on the bin id, and re-check the exact range predicate. Work is
  * O(|points| + |intervals| × fanout + |matches|) — it survives a 100×
  * scale-up where the nested loop does not, and a hot bin is an ordinary
  * skewed-key problem that AQE handles.
  *
  * Bin arithmetic is pure long math (`x - pmod(x, w)` is exactly divisible
  * by `w`, so truncating DIV equals floor division for any sign) — no
  * double rounding, valid over the full i64 timestamp domain the reference
  * allows (`src/tdb_limits.h`).
  */
object RangeJoin {

  /** Rows of `points` joined to the rows of `intervals` whose half-open
    * window `[startCol, endCol)` contains `points(tsCol)`. Inner join; a
    * point in k windows appears k times, empty windows (end ≤ start) match
    * nothing. Column names of the two inputs must be disjoint.
    *
    * `binWidth` should be ≥ the typical interval length (fanout per
    * interval is ceil(length/binWidth)+1); correct for ANY positive value,
    * but a width orders of magnitude below the longest interval makes that
    * interval's bin explode arbitrarily wide — size the width from the
    * interval-length distribution, not the point density.
    *
    * `maxFanout` guards exactly that mis-sizing: any interval that would
    * explode onto more bins fails the job LOUDLY (the module's usual
    * precondition style), naming the offending interval length and the
    * binWidth to pick instead — the alternative is an opaque
    * out-of-memory/overflow deep inside `explode(sequence(...))`, or a
    * silently week-long stage at 100 TB. The default (65,536 bins per
    * interval) is far beyond any sane sizing (a well-sized width has
    * fanout ≤ 2) while still catching an `end` near Long.MaxValue, which
    * would otherwise attempt a multi-billion-element sequence.
    */
  def binnedRangeJoin(points: DataFrame, intervals: DataFrame,
      tsCol: String, startCol: String, endCol: String,
      binWidth: Long, maxFanout: Long = 65536L): DataFrame = {
    require(binWidth > 0, s"binWidth must be positive, got $binWidth")
    require(maxFanout > 0, s"maxFanout must be positive, got $maxFanout")
    val overlap = points.columns.toSet.intersect(intervals.columns.toSet)
    require(overlap.isEmpty,
      s"point/interval column names must be disjoint, both have: $overlap")
    // loud failure instead of silently overwriting+dropping caller data
    val reserved = Set("_fd", "_last", "_bin") ++
      Seq(tsCol, startCol, "_last").map(c => s"_bin_$c")
    val clash = (points.columns ++ intervals.columns).toSet.intersect(reserved)
    require(clash.isEmpty,
      s"input columns collide with binnedRangeJoin internals: $clash")
    // `_fd` is an exact multiple of binWidth (x - pmod is), so the
    // truncating DIV is floor division for negative timestamps too.
    def binned(df: DataFrame, c: String): DataFrame = df
      .withColumn("_fd", col(c) - pmod(col(c), lit(binWidth)))
      .withColumn(s"_bin_$c", expr(s"_fd DIV ${binWidth}L"))
      .drop("_fd")
    val p = binned(points, tsCol)
    // The fanout guard rides INSIDE the sequence bounds (a standalone
    // assert column would be pruned as dead code): assert_true yields NULL
    // when the interval is sane, so coalesce(...) adds 0 to the first bin;
    // an oversized interval raises with its own bounds in the message
    // before the explode can attempt a billion-element array.
    val fanOk = col("_bin__last") - col(s"_bin_$startCol") < lit(maxFanout)
    val fanErr = concat(
      lit("binnedRangeJoin: interval ["), col(startCol).cast("string"),
      lit(", "), col(endCol).cast("string"), lit(") of length "),
      (col(endCol) - col(startCol)).cast("string"),
      lit(s" explodes onto more than $maxFanout bins at binWidth=$binWidth" +
        " — raise binWidth to >= ceil(length/maxFanout), or raise maxFanout"))
    val i = binned(binned(
        intervals.filter(col(endCol) > col(startCol))
          .withColumn("_last", col(endCol) - 1),
        startCol), "_last")
      .withColumn("_bin",
        explode(sequence(
          col(s"_bin_$startCol") +
            coalesce(assert_true(fanOk, fanErr).cast("bigint"), lit(0L)),
          col("_bin__last"))))
      .drop("_last", s"_bin_$startCol", "_bin__last")
    p.join(i,
        col(s"_bin_$tsCol") === col("_bin") &&
        col(tsCol) >= col(startCol) && col(tsCol) < col(endCol))
      .drop(s"_bin_$tsCol", "_bin")
  }
}
