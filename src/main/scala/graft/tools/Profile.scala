package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev scratch: stage-level timing for the dedup-clusters path. */
object Profile {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(1000000L).selectExpr("sum(id)").collect()

    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[profile] $label%-28s ${(System.nanoTime() - t0) / 1e9}%8.3f s")
      r
    }

    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    time("docs.count")(docs.count())
    time("shingleHashes only")(docs.select(col("doc_id"),
      graft.ops.TextAnalysis.shingleHashes(col("text"), 5).as("sh"))
      .queryExecution.toRdd.count())
    time("winnow(shingleHashes)")(docs.select(col("doc_id"),
      graft.functions.GraftFunctions.winnow(
        graft.ops.TextAnalysis.shingleHashes(col("text"), 5), 4).as("fp"))
      .queryExecution.toRdd.count())
    time("fingerprintStats native")(graft.ops.TextAnalysis.fingerprintStats(docs)
      .queryExecution.toRdd.count())
    time("fingerprintStats windowed")(
      graft.ops.TextAnalysis.fingerprintsWindowed(docs)
        .groupBy("id").agg(count(lit(1))).queryExecution.toRdd.count())
    val pairs = graft.ops.Dedup.ngramJaccardPairs(docs, k = 3, threshold = 0.2)
    time("pairs.count")(pairs.count())
    val pairs2 = graft.ops.Dedup.ngramJaccardPairs(docs, k = 3, threshold = 0.2)
    val comps = time("connectedComponents")(
      graft.ops.Dedup.connectedComponents(pairs2))
    time("comps.count")(comps.count())
    val pairs3 = graft.ops.Dedup.ngramJaccardPairs(docs, k = 3, threshold = 0.2)
    val clusters = time("dedupClusters construct")(
      graft.ops.Dedup.dedupClusters(docs, pairs3))
    time("clusters execute")(clusters.queryExecution.toRdd.count())
    spark.stop()
  }
}
