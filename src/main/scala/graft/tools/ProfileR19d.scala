package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Round-19 probe #4: hypothesis tests — d_profile Expand payload,
  * pqKnn repeat convergence, codegen on/off. */
object ProfileR19d {
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
      println(f"[p19d] $label%-46s ${(System.nanoTime() - t0) / 1e9}%8.3f s")
      r
    }

    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    docs.count()
    val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
    emb.count()
    val q = emb.filter(col("vec_id") < 10)

    // H1: d_profile — does the Expand carry the full text? Two-agg split:
    // min/max/count in one distinct-free agg, distincts over hashes only.
    val names = Seq("doc_id", "lang", "source", "text")
    def dv(c: String) = docs.schema(c).dataType match {
      case org.apache.spark.sql.types.StringType =>
        when(col(c).isNotNull, xxhash64(col(c)))
      case _ => col(c)
    }
    val aggsA = names.flatMap { c =>
      Seq(count(col(c)).as(s"_nn_$c"),
        min(col(c).cast("string")).as(s"_min_$c"),
        max(col(c).cast("string")).as(s"_max_$c"))
    }
    val aggsB = names.flatMap { c =>
      Seq(approx_count_distinct(dv(c), 0.02).as(s"_hll_$c"),
        countDistinct(dv(c)).as(s"_nd_$c"))
    }
    time("profile H1: distinct-free agg")(
      noop(docs.agg(count(lit(1)).as("_n"), aggsA: _*)))
    time("profile H1: hashed distincts agg")(
      noop(docs.select(names.map(c => dv(c).as(c)): _*)
        .agg(count(lit(1)).as("_n"), aggsB: _*)))
    time("profile H1: current combined agg")(
      noop(TextAnalysis.profile(docs, cols = names)))

    // H2: pqKnn repeat convergence (same params — same codegen source)
    (1 to 4).foreach { i =>
      time(s"pqKnn repeat $i")(
        noop(Similarity.pqKnn(emb, q, k = 3, m = 16, codebookK = 32,
          shortlist = 50)))
    }
    // H3: codegen off
    spark.conf.set("spark.sql.codegen.wholeStage", "false")
    time("pqKnn wholeStage=false")(
      noop(Similarity.pqKnn(emb, q, k = 3, m = 16, codebookK = 32,
        shortlist = 50)))
    spark.conf.set("spark.sql.codegen.wholeStage", "true")
    // H4: brute repeats
    (1 to 3).foreach { i =>
      time(s"bruteForceKnn repeat $i")(
        noop(Similarity.bruteForceKnn(emb, q, k = 3)))
    }
    spark.stop()
  }
}
