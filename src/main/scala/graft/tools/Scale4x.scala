package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scaling experiment: replicate documents/embeddings 4× (ids shifted, so
  * every doc gains 3 exact copies — worst case for dedup) and compare each
  * heavy operator's wall-clock at 1× vs 4×. Prints a markdown table row
  * per operator. Usage: runMain graft.tools.Scale4x [sfDir] */
object Scale4x {
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

    val docs1 = spark.read.parquet(s"$sfDir/documents.parquet")
    val emb1 = spark.read.parquet(s"$sfDir/embeddings.parquet")
    val nDocs = docs1.count(); val nEmb = emb1.count()
    def rep4(df: DataFrame, idCol: String, n: Long): DataFrame =
      (0 until 4).map(i => df.withColumn(idCol, col(idCol) + lit(i * n)))
        .reduce(_.unionByName(_))
    val base = "/tmp/graft-scale4x"
    rep4(docs1, "doc_id", nDocs).write.mode("overwrite").parquet(s"$base/documents")
    rep4(emb1, "vec_id", nEmb).write.mode("overwrite").parquet(s"$base/embeddings")
    val docs4 = spark.read.parquet(s"$base/documents")
    val emb4 = spark.read.parquet(s"$base/embeddings")

    def time(f: => Long): Double = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }
    def run(label: String)(f: (DataFrame, DataFrame) => DataFrame): Unit = {
      val t1 = time(f(docs1, emb1).queryExecution.toRdd.count())
      val t4 = time(f(docs4, emb4).queryExecution.toRdd.count())
      println(f"| $label | $t1%.1fs | $t4%.1fs | ${t4 / t1}%.1f× |")
    }

    println("| operator | sf0.1 | 4× | scaling |")
    println("|---|---|---|---|")
    run("exact dedup")((d, _) => graft.ops.Dedup.exactGroups(d))
    run("winnowing fingerprints")((d, _) => graft.ops.TextAnalysis.fingerprintStats(d))
    run("MinHash+LSH dedup")((d, _) =>
      graft.ops.Dedup.minhashDedupPairs(d, threshold = 0.2, numHashes = 64, bands = 32))
    run("n-gram Jaccard")((d, _) =>
      graft.ops.Dedup.ngramJaccardPairs(d, k = 3, threshold = 0.2))
    run("dedup clusters (CC)")((d, _) => graft.ops.Dedup.dedupClusters(d,
      graft.ops.Dedup.ngramJaccardPairs(d, k = 3, threshold = 0.2)))
    run("embedding near-dup LSH")((_, e) =>
      graft.ops.Dedup.embeddingNearDupLsh(e, 0.35, nPlanes = 6))
    run("TF-IDF top terms")((d, _) => graft.ops.TextAnalysis.tfidfTopTerms(d))
    run("repetition signals")((d, _) => graft.ops.TextAnalysis.withRepetitionSignals(d))
    spark.stop()
  }
}
