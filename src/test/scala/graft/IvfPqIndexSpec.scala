package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import graft.ops.Similarity

/** The persistent IVF-PQ index (offline build → cell-partitioned parquet,
  * online search with static partition pruning) must return EXACTLY what
  * the in-one-pass operator returns: both train from the same cached
  * sample, so centroids, codes, ADC scores and the rerank are identical
  * by construction — any divergence is a build/search bug. */
class IvfPqIndexSpec extends SparkSpec {

  private lazy val emb = spark.read
    .parquet("/root/testdata/sf0.001/embeddings.parquet")

  test("build+search equals the one-pass ivfPqKnn row-for-row") {
    val dir = Files.createTempDirectory("graft-ivfpq").toString
    Similarity.buildIvfPqIndex(emb, dir, nCells = 8, m = 16, codebookK = 32)
    val q = emb.filter(col("vec_id") < 10)
    val fromIndex = Similarity
      .searchIvfPqIndex(dir, emb, q, k = 3, nprobe = 3, shortlist = 50)
      .collect().map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("rank"),
        r.getAs[Long]("corpus_id"))).toSet
    val onePass = Similarity
      .ivfPqKnn(emb, q, k = 3, nCells = 8, nprobe = 3, m = 16,
        codebookK = 32, shortlist = 50)
      .collect().map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("rank"),
        r.getAs[Long]("corpus_id"))).toSet
    assert(fromIndex === onePass)
    assert(fromIndex.nonEmpty)
  }

  test("append encodes with the frozen model: build(half)+append(half) == encode-all-with-that-model") {
    import spark.implicits._
    val half1 = emb.filter(col("vec_id") % 2 === 0)
    val half2 = emb.filter(col("vec_id") % 2 === 1)
    val dir = Files.createTempDirectory("graft-ivfpq3").toString
    Similarity.buildIvfPqIndex(half1, dir, nCells = 8, m = 16, codebookK = 32)
    Similarity.appendToIvfPqIndex(half2, dir)
    // every vector of BOTH halves is in the index, in a valid cell
    val codes = spark.read.parquet(s"$dir/codes")
    assert(codes.count() === emb.count())
    assert(codes.select("corpus_id").distinct().count() === emb.count())
    assert(codes.filter(col("cell") < 0 || col("cell") >= 8).count() === 0)
    // search returns hits from the APPENDED half too, and the exact
    // rerank keeps the output contract (cosine-descending ranks)
    val q = emb.filter(col("vec_id") < 4)
    val res = Similarity.searchIvfPqIndex(dir, emb, q, k = 3, nprobe = 4,
      shortlist = 50)
    val ids = res.select("corpus_id").as[Long].collect()
    assert(ids.exists(_ % 2 === 1), "no appended-half vector ever surfaced")
    val ranked = res.select("query_id", "rank", "cosine")
      .collect().groupBy(_.getLong(0))
    ranked.values.foreach { rows =>
      val byRank = rows.sortBy(_.getInt(1)).map(_.getDouble(2))
      assert(byRank.zip(byRank.drop(1)).forall { case (a, b) => a >= b })
    }
  }

  test("ivfPqIndexStats tracks build + append exactly; occupancy invariants hold") {
    val dir = Files.createTempDirectory("graft-ivfpq-stats").toString
    val half1 = emb.filter(col("vec_id") % 2 === 0)
    val half2 = emb.filter(col("vec_id") % 2 =!= 0)
    Similarity.buildIvfPqIndex(half1, dir, nCells = 8, m = 16, codebookK = 32)
    def stats() = Similarity.ivfPqIndexStats(spark, dir).head()
    val s1 = stats()
    assert(s1.getAs[Int]("n_cells") === 8 && s1.getAs[Int]("m") === 16)
    assert(s1.getAs[Long]("n_vectors") === half1.count())
    Similarity.appendToIvfPqIndex(half2, dir)
    val s2 = stats()
    assert(s2.getAs[Long]("n_vectors") === emb.count(),
      "append must grow the code count to the full corpus")
    assert(s2.getAs[Long]("n_cells_used") <= 8L &&
      s2.getAs[Long]("min_cell") >= 1L &&
      s2.getAs[Long]("max_cell") <= s2.getAs[Long]("n_vectors"))
  }

  test("drift health: identical append sits at ratio 1, shifted append fires the retrain advisory") {
    val dir = Files.createTempDirectory("graft-ivfpq-drift").toString
    val n = emb.count()
    Similarity.buildIvfPqIndex(emb, dir, nCells = 8, m = 16, codebookK = 32)
    // epoch 1: the SAME vectors (offset ids) — same frozen model, same
    // assignments, same per-row cdist; the mean can differ only by float
    // summation order
    Similarity.appendToIvfPqIndex(
      emb.withColumn("vec_id", col("vec_id") + n), dir)
    // epoch 2: every vector shifted +3 per dim — far from every build
    // centroid, the drifted-ingest regime the advisory exists for
    Similarity.appendToIvfPqIndex(
      emb.withColumn("vec_id", col("vec_id") + 2 * n)
        .withColumn("embedding", transform(col("embedding"), x => x + lit(3.0f))),
      dir)
    val drift = Similarity.ivfPqIndexDrift(spark, dir).collect()
      .map(r => r.getAs[Int]("epoch") ->
        (r.getAs[Long]("n_vectors"), r.getAs[Double]("drift_ratio"),
          r.getAs[Boolean]("retrain_advised"))).toMap
    assert(drift.keySet === Set(0, 1, 2))
    assert(drift(0)._1 === n && drift(0)._2 === 1.0 && !drift(0)._3)
    assert(drift(1)._1 === n && math.abs(drift(1)._2 - 1.0) < 1e-6
      && !drift(1)._3, s"identical append drifted: ${drift(1)}")
    assert(drift(2)._1 === n && drift(2)._2 > 1.5 && drift(2)._3,
      s"shifted append did not fire: ${drift(2)}")
    // per-cell view joins each epoch against ITS cell's build baseline
    val perCell = Similarity.ivfPqIndexDrift(spark, dir, perCell = true)
    assert(perCell.filter(col("epoch") === 0)
      .filter(col("drift_ratio") =!= 1.0).count() === 0)
    // stats surfaces the worst ratio + the advisory and keeps its counts
    val stats = Similarity.ivfPqIndexStats(spark, dir).head()
    assert(stats.getAs[Long]("n_vectors") === 3 * n)
    assert(stats.getAs[Long]("n_epochs") === 3L)
    assert(stats.getAs[Double]("max_drift_ratio") > 1.5)
    assert(stats.getAs[Boolean]("retrain_advised"))
    // the search fixture never appends → neutral drift columns
    val cleanDir = Files.createTempDirectory("graft-ivfpq-clean").toString
    Similarity.buildIvfPqIndex(emb, cleanDir, nCells = 8, m = 16, codebookK = 32)
    val clean = Similarity.ivfPqIndexStats(spark, cleanDir).head()
    assert(clean.getAs[Long]("n_epochs") === 1L &&
      clean.getAs[Double]("max_drift_ratio") === 1.0 &&
      !clean.getAs[Boolean]("retrain_advised"))
  }

  test("drift health: zero-distance baseline + zero-distance append is NOT drift (no NaN advisory)") {
    // every vector ON its centroid (nCells = distinct vectors — tiny or
    // heavily-deduplicated corpora): build epoch mean_cdist is exactly
    // 0.0. An identical append is also 0.0 — 0/0 must read as ratio 1.0,
    // not NaN (which Spark's ordering treats as greater than any
    // warnRatio and would fire the advisory on a healthy index).
    val dir = Files.createTempDirectory("graft-ivfpq-zero").toString
    import spark.implicits._
    val pts = (0 until 8).map(i =>
        (i.toLong, Array.tabulate(64)(d => if (d == i) 1.0f else 0.0f)))
      .toDF("vec_id", "embedding")
    Similarity.buildIvfPqIndex(pts, dir, nCells = 8, m = 16, codebookK = 4)
    Similarity.appendToIvfPqIndex(
      pts.withColumn("vec_id", col("vec_id") + 8), dir)
    val drift = Similarity.ivfPqIndexDrift(spark, dir).collect()
      .map(r => r.getAs[Int]("epoch") ->
        (r.getAs[Double]("drift_ratio"), r.getAs[Boolean]("retrain_advised")))
      .toMap
    assert(drift(0) === ((1.0, false)))
    assert(drift(1) === ((1.0, false)),
      s"zero-baseline epoch read ${drift(1)} — spurious advisory on a healthy index")
    val stats = Similarity.ivfPqIndexStats(spark, dir).head()
    assert(stats.getAs[Double]("max_drift_ratio") === 1.0 &&
      !stats.getAs[Boolean]("retrain_advised"))
  }

  test("rebuildIvfPqIndex answers the advisory: retrain on the current corpus resets drift to a fresh epoch-0 baseline") {
    val dir = Files.createTempDirectory("graft-ivfpq-rebuild").toString
    val n = emb.count()
    Similarity.buildIvfPqIndex(emb, dir, nCells = 8, m = 16, codebookK = 32)
    val shifted = emb.withColumn("vec_id", col("vec_id") + n)
      .withColumn("embedding", transform(col("embedding"), x => x + lit(3.0f)))
    Similarity.appendToIvfPqIndex(shifted, dir)
    assert(Similarity.ivfPqIndexStats(spark, dir).head()
      .getAs[Boolean]("retrain_advised"), "shifted append must advise retrain")
    // the one-call answer: retrain + re-encode on the CURRENT corpus
    Similarity.rebuildIvfPqIndex(emb.unionByName(shifted), dir)
    val drift = Similarity.ivfPqIndexDrift(spark, dir).collect()
    assert(drift.length === 1 && drift.head.getAs[Int]("epoch") === 0 &&
      drift.head.getAs[Double]("drift_ratio") === 1.0 &&
      !drift.head.getAs[Boolean]("retrain_advised"),
      s"rebuild did not reset drift: ${drift.toSeq}")
    val stats = Similarity.ivfPqIndexStats(spark, dir).head()
    assert(stats.getAs[Long]("n_vectors") === 2 * n &&
      stats.getAs[Long]("n_epochs") === 1L &&
      stats.getAs[Double]("max_drift_ratio") === 1.0 &&
      !stats.getAs[Boolean]("retrain_advised"))
    // geometry carried over from the old meta, and the swap left no
    // staging dirs behind
    assert(stats.getAs[Int]("n_cells") === 8 && stats.getAs[Int]("m") === 16 &&
      stats.getAs[Int]("k") === 32)
    val parent = new java.io.File(dir).getParentFile
    assert(!parent.listFiles().exists(f =>
      f.getName.contains(".rebuild-") || f.getName.contains(".old-")))
    // the rebuilt index searches: the shifted half is findable
    val q = shifted.limit(3)
    val res = Similarity.searchIvfPqIndex(dir, emb.unionByName(shifted), q,
      k = 3, nprobe = 8, shortlist = 50)
    assert(res.count() === 9)
  }

  test("rebuild carries the OPQ rotation flag: a rotated index retrains rotated") {
    val dir = Files.createTempDirectory("graft-ivfpq-rebuild-opq").toString
    Similarity.buildIvfPqIndex(emb, dir, nCells = 8, m = 16, codebookK = 32,
      opq = true)
    assert(Similarity.loadIvfPqIndexMeta(spark, dir).rot.isDefined)
    Similarity.rebuildIvfPqIndex(emb, dir)
    // the rebuilt meta holds a (fresh) rotation, still orthogonal
    val rot = Similarity.loadIvfPqIndexMeta(spark, dir).rot
      .getOrElse(fail("rebuild dropped the OPQ rotation"))
    val r = rot.rows.map(_.toArray).toArray
    for (i <- 0 until 64; j <- i until 64) {
      val dot = (0 until 64).map(t => r(i)(t) * r(j)(t)).sum
      assert(math.abs(dot - (if (i == j) 1.0 else 0.0)) < 1e-8)
    }
    // and the rebuilt rotated index searches
    val q = emb.filter(col("vec_id") < 3)
    assert(Similarity.searchIvfPqIndex(dir, emb, q, k = 3, nprobe = 8,
      shortlist = 50).count() === 9)
  }

  test("appending to a pre-drift index refuses loudly instead of writing a mixed-schema codes dir") {
    val dir = Files.createTempDirectory("graft-ivfpq-predrift").toString
    Similarity.buildIvfPqIndex(emb, dir, nCells = 8, m = 16, codebookK = 32)
    // simulate an index written before drift tracking: same codes, no
    // (cdist, epoch) columns
    val legacy = spark.read.parquet(s"$dir/codes")
      .drop("cdist", "epoch").localCheckpoint()
    legacy.write.mode("overwrite").partitionBy("cell").parquet(s"$dir/codes")
    val err = intercept[IllegalArgumentException] {
      Similarity.appendToIvfPqIndex(
        emb.withColumn("vec_id", col("vec_id") + 10000), dir)
    }
    assert(err.getMessage.contains("predates drift tracking"))
    // nothing was appended: the codes dir still reads with one schema
    val codes = spark.read.parquet(s"$dir/codes")
    assert(codes.count() === emb.count() && !codes.columns.contains("epoch"))
  }

  test("perCell drift: a cell the build never populated fires the advisory instead of dropping out") {
    import spark.implicits._
    // drift reads only <path>/codes — synthesize the exact degenerate
    // layout: build rows in cell 0 only, an append batch landing in
    // cell 1 (data where the frozen quantizer saw NOTHING at train time)
    val dir = Files.createTempDirectory("graft-ivfpq-nullbase").toString
    Seq(
      (1L, 0.2, 0, 0), (2L, 0.3, 0, 0),   // build epoch, cell 0
      (3L, 0.25, 0, 1),                   // identical-ish append, cell 0
      (4L, 9.0, 1, 1), (5L, 9.5, 1, 1))   // append rows in an unseen cell
      .toDF("corpus_id", "cdist", "cell", "epoch")
      .write.partitionBy("cell").parquet(s"$dir/codes")
    val perCell = Similarity.ivfPqIndexDrift(spark, dir, perCell = true)
      .collect().map(r => (r.getAs[Int]("cell"), r.getAs[Int]("epoch")) ->
        (Option(r.get(r.fieldIndex("drift_ratio"))),
          r.getAs[Boolean]("retrain_advised"))).toMap
    // the unseen cell has no baseline → NULL ratio but the advisory FIRES
    assert(perCell((1, 1))._1.isEmpty && perCell((1, 1))._2,
      s"null-baseline cell must advise retrain: $perCell")
    // populated cell at epoch 0: exact 1.0, no advisory
    assert(perCell((0, 0))._1.contains(1.0) && !perCell((0, 0))._2)
  }

  test("opq=true freezes an orthogonal rotation in meta; query and append share it (r9 VERDICT item 2)") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft-ivfpq-opq").toString
    val half1 = emb.filter(col("vec_id") % 2 === 0)
    val half2 = emb.filter(col("vec_id") % 2 === 1)
    Similarity.buildIvfPqIndex(half1, dir, nCells = 8, m = 16, codebookK = 32,
      opq = true)
    // 1. the rotation round-trips: dim x dim and ORTHOGONAL (R Rt = I),
    // so cosine neighbors are provably preserved by construction
    val idx = Similarity.loadIvfPqIndexMeta(spark, dir)
    val rot = idx.rot.getOrElse(fail("opq index meta carries no rotation"))
    val r = rot.rows.map(_.toArray).toArray
    assert(r.length === 64 && r.forall(_.length === 64))
    for (i <- 0 until 64; j <- i until 64) {
      val dot = (0 until 64).map(t => r(i)(t) * r(j)(t)).sum
      val want = if (i == j) 1.0 else 0.0
      assert(math.abs(dot - want) < 1e-8, s"R Rt[$i][$j] = $dot")
    }
    // 2. append encodes with the FROZEN rotation: all vectors land in
    // valid cells and the appended half is searchable
    Similarity.appendToIvfPqIndex(half2, dir)
    val codes = spark.read.parquet(s"$dir/codes")
    assert(codes.count() === emb.count())
    assert(codes.filter(col("cell") < 0 || col("cell") >= 8).count() === 0)
    val q = emb.filter(col("vec_id") < 6)
    val res = Similarity.searchIvfPqIndex(dir, emb, q, k = 3, nprobe = 4,
      shortlist = 50).localCheckpoint()
    assert(res.select("corpus_id").as[Long].collect().exists(_ % 2 === 1),
      "no appended-half vector surfaced from the rotated index")
    // 3. the exact rerank runs on RAW vectors: reported cosines equal the
    // brute-force cosine for the same (query, corpus) pairs
    val brute = Similarity.bruteForceKnn(emb, q, k = 50)
      .select(col("query_id"), col("corpus_id"), col("cosine").as("bc"))
    val joined = res.join(brute, Seq("query_id", "corpus_id")).collect()
    assert(joined.nonEmpty)
    joined.foreach { row =>
      assert(math.abs(row.getAs[Double]("cosine") - row.getAs[Double]("bc")) < 1e-9)
    }
    // 4. an index built WITHOUT opq stores no rotation (back-compat: the
    // empty rot column reads as None, like a pre-rotation index)
    val dir2 = Files.createTempDirectory("graft-ivfpq-noopq").toString
    Similarity.buildIvfPqIndex(half1, dir2, nCells = 8, m = 16, codebookK = 32)
    assert(Similarity.loadIvfPqIndexMeta(spark, dir2).rot.isEmpty)
  }

  test("the codes scan partition-prunes to the probed cells") {
    val dir = Files.createTempDirectory("graft-ivfpq2").toString
    Similarity.buildIvfPqIndex(emb, dir, nCells = 8, m = 16, codebookK = 32)
    // the index directory is physically cell-partitioned
    val cellDirs = new java.io.File(s"$dir/codes").listFiles()
      .filter(_.getName.startsWith("cell=")).map(_.getName).sorted
    assert(cellDirs.length > 1, s"expected >1 cell partitions, got ${cellDirs.toSeq}")
    // ONE query, nprobe=2 → the scan's PartitionFilters must carry the
    // cell isin, i.e. candidate generation reads 2 of the 8 inverted
    // lists, not the corpus
    val q1 = emb.filter(col("vec_id") === 0)
    val plan = Similarity
      .searchIvfPqIndex(dir, emb, q1, k = 3, nprobe = 2, shortlist = 20)
      .queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters: [cell IN") ||
      plan.contains("PartitionFilters: [cell#"), // isin renders as IN (…)
      s"no partition pruning in plan:\n${plan.take(2000)}")
  }
}
