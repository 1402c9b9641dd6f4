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

  /** Columns of `df` that Spark's hash functions accept — xxhash64 rejects
    * MapType anywhere in a column's type (map ordering is undefined), so
    * map-bearing columns are excluded from the salt rather than failing
    * the whole aggregation at analysis time. */
  private def hashableCols(df: DataFrame): Seq[Column] = {
    import org.apache.spark.sql.types._
    def hashable(dt: DataType): Boolean = dt match {
      case _: MapType => false
      case s: StructType => s.fields.forall(f => hashable(f.dataType))
      case a: ArrayType => hashable(a.elementType)
      case _ => true
    }
    df.schema.fields.filter(f => hashable(f.dataType)).map(f => col(f.name)).toSeq
  }

  /** Salted count per key: groupBy(key, salt) → partial counts →
    * groupBy(key) → sum. Identical result to a direct groupBy(key).count
    * but no single reducer ever sees more than ~1/buckets of a hot key.
    *
    * The salt is a DETERMINISTIC hash of the full row content, never
    * monotonically_increasing_id/rand: under a partial map-stage retry on a
    * real cluster, a nondeterministic salt re-buckets recomputed rows and
    * double-counts or drops them. The trade-off: rows that are bytewise
    * identical share a bucket, so a hot key made of exact-duplicate rows
    * does not spread — for that shape, pre-reduce the duplicates first
    * (`groupBy(all columns).count`, itself skew-free) or use
    * [[saltedCountDistinct]] when the metric is distincts. */
  def saltedCount(df: DataFrame, keyCol: String, buckets: Int = 16): DataFrame =
    df.withColumn("_salt", salt(buckets, hashableCols(df): _*))
      .groupBy(col(keyCol), col("_salt"))
      .agg(count(lit(1)).as("_partial"))
      .groupBy(col(keyCol))
      .agg(sum("_partial").as("n"))

  /** Exact two-stage COUNT(DISTINCT valueCol) per key. Here the salt MUST
    * be derived from the value: every copy of a given (key, value) lands in
    * the same bucket, so the per-bucket count_distinct partials partition
    * the distinct set and their sum is the exact global distinct count —
    * while a hot key's distinct values still spread over `buckets`
    * reducers. */
  def saltedCountDistinct(df: DataFrame, keyCol: String, valueCol: String,
      buckets: Int = 16): DataFrame =
    df.withColumn("_salt", salt(buckets, col(valueCol)))
      .groupBy(col(keyCol), col("_salt"))
      .agg(count_distinct(col(valueCol)).as("_partial"))
      .groupBy(col(keyCol))
      .agg(sum("_partial").as("n_distinct"))

  /** Salted sum of a numeric column per key (same two-stage shape and
    * deterministic full-row salt as [[saltedCount]] — see the stage-retry
    * rationale and exact-duplicate-rows caveat there). Hashing ALL columns
    * rather than just the value column means a hot key whose rows differ in
    * any column still spreads even when the summed value is constant. */
  def saltedSum(df: DataFrame, keyCol: String, valueCol: String,
      buckets: Int = 16): DataFrame =
    df.withColumn("_salt", salt(buckets, hashableCols(df): _*))
      .groupBy(col(keyCol), col("_salt"))
      .agg(sum(col(valueCol)).as("_partial"))
      .groupBy(col(keyCol))
      .agg(sum("_partial").as("sum"))
}
