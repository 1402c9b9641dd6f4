package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Round-19 probe #5: isolate the d_profile multi-distinct cost. */
object ProfileR19e {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.files.maxPartitionBytes", "16m")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1000000L).selectExpr("sum(id)").collect()
    spark.range(1000L).repartition(8).count()

    def noop(df: DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()
    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[p19e] $label%-52s ${(System.nanoTime() - t0) / 1e9}%8.3f s")
      r
    }

    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    docs.count()
    val names = Seq("doc_id", "lang", "source", "text")
    def dv(c: String) = docs.schema(c).dataType match {
      case org.apache.spark.sql.types.StringType =>
        when(col(c).isNotNull, xxhash64(col(c)))
      case _ => col(c)
    }
    val h = docs.select(names.map(c => dv(c).as(c)): _*)

    time("a: 4x countDistinct")(
      noop(h.agg(countDistinct(col("doc_id")),
        countDistinct(col("lang")), countDistinct(col("source")),
        countDistinct(col("text")))))
    time("a2: 4x countDistinct repeat")(
      noop(h.agg(countDistinct(col("doc_id")),
        countDistinct(col("lang")), countDistinct(col("source")),
        countDistinct(col("text")))))
    time("b: 1x countDistinct")(
      noop(h.agg(countDistinct(col("text")))))
    time("c: 4x approx_count_distinct")(
      noop(h.agg(approx_count_distinct(col("doc_id"), 0.02),
        approx_count_distinct(col("lang"), 0.02),
        approx_count_distinct(col("source"), 0.02),
        approx_count_distinct(col("text"), 0.02))))
    time("d: count only")(noop(h.agg(count(lit(1)))))
    time("e: 2x countDistinct")(
      noop(h.agg(countDistinct(col("lang")), countDistinct(col("text")))))
    time("f: 4x cd + 4x approx (H1 shape) repeat1")(
      noop(h.agg(count(lit(1)),
        countDistinct(col("doc_id")), approx_count_distinct(col("doc_id"), 0.02),
        countDistinct(col("lang")), approx_count_distinct(col("lang"), 0.02),
        countDistinct(col("source")), approx_count_distinct(col("source"), 0.02),
        countDistinct(col("text")), approx_count_distinct(col("text"), 0.02))))
    time("f2: same repeat2")(
      noop(h.agg(count(lit(1)),
        countDistinct(col("doc_id")), approx_count_distinct(col("doc_id"), 0.02),
        countDistinct(col("lang")), approx_count_distinct(col("lang"), 0.02),
        countDistinct(col("source")), approx_count_distinct(col("source"), 0.02),
        countDistinct(col("text")), approx_count_distinct(col("text"), 0.02))))
    // union-of-per-column-aggs alternative: 4 independent 1-distinct aggs
    time("g: union of 4 per-column aggs")(
      noop(names.map(c => h.agg(lit(c).as("c"), count(col(c)).as("nn"),
          countDistinct(col(c)).as("nd"),
          approx_count_distinct(col(c), 0.02).as("hll")))
        .reduce(_ unionByName _)))
    spark.stop()
  }
}
