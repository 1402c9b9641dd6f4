package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Round-19 probe #3: decompose the heavy ANN-contract and text rows. */
object ProfileR19c {
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
      println(f"[p19c] $label%-46s ${(System.nanoTime() - t0) / 1e9}%8.3f s")
      r
    }

    val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
    println(s"[p19c] n_embeddings=${emb.count()}")
    val q = emb.filter(col("vec_id") < 10)

    // e_knn_pq decomposition
    time("pq: bruteForceKnn noop")(
      noop(Similarity.bruteForceKnn(emb, q, k = 3)))
    time("pq: pqKnn noop")(
      noop(Similarity.pqKnn(emb, q, k = 3, m = 16, codebookK = 32,
        shortlist = 50)))
    time("pq: pqKnn noop (2nd: cached sample)")(
      noop(Similarity.pqKnn(emb, q, k = 3, m = 16, codebookK = 32,
        shortlist = 50)))
    time("pq: full e_knn_pq-shaped invariant")(
      noop(graft.SparkEntry.queries("e_knn_pq")(spark, sfDir)))

    // e_knn_ivfpq_index: the memoized index is built by the first call
    time("ivfpq_index: full query (build+search)")(
      noop(graft.SparkEntry.queries("e_knn_ivfpq_index")(spark, sfDir)))
    time("ivfpq_index: full query (memoized idx)")(
      noop(graft.SparkEntry.queries("e_knn_ivfpq_index")(spark, sfDir)))

    // e_mmr_ann decomposition
    val cands = time("mmr_ann: pqKnn candidates ckpt")(
      Similarity.pqKnn(emb, q.limit(1), k = 40, m = 16, codebookK = 32,
        shortlist = 60).localCheckpoint())
    time("mmr_ann: mmrSelectOver")(
      noop(Similarity.mmrSelectOver(emb, cands, k = 10, lambda = 0.7)))
    time("mmr_ann: full query")(
      noop(graft.SparkEntry.queries("e_mmr_ann")(spark, sfDir)))

    // e_bitext_ann decomposition
    val a = emb.filter(col("label") === 0)
    val b = emb.filter(col("label") === 1)
    time("bitext: exact mine noop")(
      noop(Mining.bitextMine(a, b, k = 4)))
    time("bitext: blocked mine noop")(
      noop(Mining.bitextMineBlocked(a, b, k = 4, nCells = 8, nprobe = 3)))
    time("bitext: full query")(
      noop(graft.SparkEntry.queries("e_bitext_ann")(spark, sfDir)))

    // text rows
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    time("profile: full query")(
      noop(graft.SparkEntry.queries("d_profile")(spark, sfDir)))
    time("profile: no-exact variant")(
      noop(TextAnalysis.profile(docs,
        cols = Seq("doc_id", "lang", "source", "text"), exact = false)))
    time("contain_prefix: full query")(
      noop(graft.SparkEntry.queries("d_containment_prefix")(spark, sfDir)))
    time("pipeline: exactDedup noop")(noop(Dedup.exactDedup(docs)))
    val s2 = TextAnalysis.withQualitySignals(Dedup.exactDedup(docs))
      .filter(col("n_tokens") >= 20 && col("n_tokens") <= 600 &&
        col("stopword_ratio") < 0.3 && col("punct_ratio") < 0.1)
      .select("doc_id", "text")
    time("pipeline: quality-gated survivors noop")(noop(s2))
    val pairs = time("pipeline: ngramJaccardPairs noop+build")(
      { val p = Dedup.ngramJaccardPairs(s2, k = 3, threshold = 0.2); noop(p); p })
    time("pipeline: dedupClusters")(
      noop(Dedup.dedupClusters(s2, pairs)))
    time("pipeline: full query")(
      noop(graft.SparkEntry.queries("d_pipeline")(spark, sfDir)))
    time("stream_dedup: full query")(
      noop(graft.SparkEntry.queries("d_stream_dedup")(spark, sfDir)))

    spark.stop()
  }
}
