package graft

import org.apache.spark.sql.SparkSession

/** Benchmark main: runs every SparkEntry query against
  * SPARK_GRAFT_SF_DIR and prints ONE JSON line with per-query seconds.
  *
  * Each query executes its FULL physical plan via queryExecution.toRdd —
  * a plain df.count() would let Catalyst prune projections/sorts and
  * under-measure the real work. A session warmup runs first so query #1
  * doesn't carry JVM/codegen init cost.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.files.maxPartitionBytes", "16m")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // JVM/codegen/shuffle/parquet warmup outside the timed region — the
    // alphabetically-first query otherwise absorbs several seconds of
    // scan-path JIT that belongs to no query.
    spark.range(1000000L).selectExpr("sum(id)").collect()
    spark.range(1000L).repartition(8).count()
    try {
      val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      docs.select(org.apache.spark.sql.functions.sum(
        org.apache.spark.sql.functions.length(
          org.apache.spark.sql.functions.col("text")))).collect()
    } catch { case _: Throwable => () }

    val selected = if (args.nonEmpty) args.toSet else SparkEntry.queries.keySet
    val results = SparkEntry.queries.toSeq.sortBy(_._1)
      .filter(q => selected.contains(q._1)).map { case (name, fn) =>
      val t0 = System.nanoTime()
      try fn(spark, sfDir).queryExecution.toRdd.count()
      catch { case e: Throwable =>
        System.err.println(s"[bench] $name failed: ${e.getMessage}")
      }
      name -> (System.nanoTime() - t0) / 1e9
    }
    // Millisecond precision keeps the one-line contract readable at 80+
    // queries, and "total_sec" is echoed as the FINAL key so the headline
    // number survives an end-anchored tail capture even if the line is
    // truncated from the front.
    def f3(v: Double): String = "%.3f".formatLocal(java.util.Locale.ROOT, v)
    val qs = results.map { case (k, v) => "\"" + k + "\":" + f3(v) }
      .mkString("{", ",", "}")
    val total = results.map(_._2).sum
    println(s"""{"metric":"total","value":${f3(total)},"unit":"sec","queries":$qs,"sf":"$sfDir","total_sec":${f3(total)}}""")
    spark.stop()
  }
}
