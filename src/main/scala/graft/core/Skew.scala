package graft.core

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation for heavy-hitter keys (whale trails): two-stage salted
  * aggregation. Stage 1 groups by (key, salt) so a hot key's rows spread
  * over `saltBuckets` reducers; stage 2 combines the partials per key.
  * Works for any algebraic aggregate (sum/count/min/max — anything with a
  * combine step). AQE's skew-join handling covers joins; this covers the
  * groupBy side, which AQE does not rebalance.
  */
object Skew {

  /** Deterministic salt in [0, buckets) derived from the full row hash so
    * a hot key's rows distribute uniformly. */
  def salt(buckets: Int, cols: Column*): Column =
    pmod(xxhash64(cols: _*), lit(buckets.toLong))

  /** Salted count per key: groupBy(key, salt) → partial counts →
    * groupBy(key) → sum. Identical result to a direct groupBy(key).count
    * but no single reducer ever sees more than ~1/buckets of a hot key. */
  def saltedCount(df: DataFrame, keyCol: String, buckets: Int = 16,
      distinctOn: Option[String] = None): DataFrame = {
    val saltCol = salt(buckets, distinctOn.map(col).getOrElse(monotonically_increasing_id()))
    df.withColumn("_salt", saltCol)
      .groupBy(col(keyCol), col("_salt"))
      .agg(count(lit(1)).as("_partial"))
      .groupBy(col(keyCol))
      .agg(sum("_partial").as("n"))
  }

  /** Salted sum of a numeric column per key (same two-stage shape). */
  def saltedSum(df: DataFrame, keyCol: String, valueCol: String,
      buckets: Int = 16): DataFrame =
    df.withColumn("_salt", salt(buckets, col(valueCol)))
      .groupBy(col(keyCol), col("_salt"))
      .agg(sum(col(valueCol)).as("_partial"))
      .groupBy(col(keyCol))
      .agg(sum("_partial").as("sum"))
}
