package graft

/** Plan-shape regression guard: turns the PLANS.md audit claims into
  * enforced invariants, so a refactor that silently degrades a plan (a
  * join falling back to a cartesian product, a pushable predicate no
  * longer reaching the scan) fails the suite instead of only the next
  * manual audit.
  */
class PlanGuardSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  // Every join-shaped query family: dedup inverted-index joins, LSH bucket
  // joins, ANN invariant plans, composed pipelines, TPC-H joins, window
  // joins. (Index/finalize/export queries are exercised elsewhere; they
  // write to disk as a side effect and add nothing join-shaped.)
  private val joinShaped = Seq(
    "d_ngram_pairs", "d_minhash_lsh", "d_simhash", "d_dedup_clusters",
    "d_pipeline", "d_training_pipeline", "d_keep_best", "d_bm25", "d_tfidf",
    "d_lm_filter", "d_incremental_dedup", "d_decontaminate", "d_line_dedup",
    "d_dup_spans", "d_sentence_dedup", "t_heavy_hitters", "d_corpus_stats",
    "e_knn_brute", "e_knn_lsh", "e_knn_ivf", "e_knn_pq", "e_knn_ivfpq",
    "e_knn_ivfpq_index", "e_knn_q8", "e_neardup",
    "e_neardup_lsh", "e_dedup_clusters", "e_semantic_dedup", "m_image_dedup",
    "m_jpeg_dedup", "m_png_dedup",
    "m_audio_dedup", "m_video_dedup", "m_routed_dedup", "m_routed_audio",
    "m_routed_video", "m_routed_media", "m_incr_dedup", "m_incr_audio",
    "m_incr_video", "m_incr_media", "m_dedup_pipeline", "t_asof", "t_asof_tol",
    "t_asof_tol_native", "t_retention", "d_bigram_lp", "t_cms",
    "q3_revenue", "q4_semi", "q5_nation_volume", "q7_volume",
    "q_anti_customers", "q_range_join")

  test("no join-shaped query plan contains an unbroadcast cartesian product") {
    joinShaped.foreach { name =>
      val plan = SparkEntry.queries(name)(spark, dir)
        .queryExecution.executedPlan.toString
      // crossJoin(broadcast(oneRowAgg)) compiles to BroadcastNestedLoopJoin,
      // which is fine (the broadcast side is 1 row by construction);
      // CartesianProduct means a corpus-sized side was not broadcast.
      assert(!plan.contains("CartesianProduct"),
        s"$name degraded to a cartesian product")
    }
  }

  test("range predicates reach the parquet scan as pushed filters") {
    Seq("q1_pricing", "q6_forecast", "d_sample").foreach { name =>
      val plan = SparkEntry.queries(name)(spark, dir)
        .queryExecution.executedPlan.toString
      assert("PushedFilters: \\[[^\\]]".r.findFirstIn(plan).isDefined,
        s"$name scan lost its pushed filters")
    }
  }

  test("a multi-value clause pushes ONE In filter on a finalized layout (round-11 isin collapse)") {
    import spark.implicits._
    val tmp = java.nio.file.Files.createTempDirectory("graft-guard-in")
    val db = new graft.core.TrailDBCons(spark, Seq("etype"))
      .add((0 until 200).map(i =>
          (f"${i % 20}%032x", 100L + i, s"e${i % 8}"))
        .toDF("uuid", "time", "etype"))
      .finalizeTo(s"$tmp/db")
    val filter = graft.filter.EventFilter.parse("etype=e1 etype=e3 etype=e5")
    val plan = db.events(filter).queryExecution.executedPlan.toString
    assert(plan.contains("In(etype"),
      s"expected a pushed In(etype, ...) filter in:\n$plan")
    assert(db.events(filter).count() ===
      (0 until 200).count(i => Set(1, 3, 5)(i % 8)))
  }

  test("bounded-memory aggregates keep their bounded shuffle shape") {
    // q_topk_agg's whole point is that the exchange carries k rows per
    // partition — a refactor that reintroduces a global sort would show up
    // as a Sort above an Exchange of the full table, or extra exchanges.
    val topk = SparkEntry.queries("q_topk_agg")(spark, dir)
      .queryExecution.executedPlan.toString
    assert("Exchange".r.findAllIn(topk).size <= 2,
      s"q_topk_agg grew extra exchanges:\n$topk")
    // t_attribution is ONE uuid window pass + the output sort — a
    // conversions×touches self-join would add exchanges.
    val attr = SparkEntry.queries("t_attribution")(spark, dir)
      .queryExecution.executedPlan.toString
    assert("Exchange".r.findAllIn(attr).size <= 2,
      s"t_attribution grew extra exchanges:\n$attr")
  }

  test("ANN shortlists are mergeable top-k aggregates, never per-query window sorts") {
    // The round-5 verdict's one scale-killer shape: row_number() OVER
    // (PARTITION BY query_id) funnels the entire scored corpus stream for
    // one query into ONE task. All four ANN paths now shortlist with the
    // mergeable Sketch.TopK aggregate (≤k rows per partition through the
    // exchange) — a Window/row_number reappearing in these plans is the
    // regression this guard exists to catch. (The SparkEntry e_knn_*
    // queries wrap annInvariant, which adds its own small lag-window over
    // the q×k RESULT rows — fine — so guard the operator plans directly.)
    val emb = spark.read.parquet(s"$dir/embeddings.parquet")
    val q = emb.filter(org.apache.spark.sql.functions.col("vec_id") < 5)
    import graft.ops.Similarity
    val plans = Seq(
      "brute" -> Similarity.bruteForceKnn(emb, q, k = 3),
      "lsh" -> Similarity.lshKnn(emb, q, k = 3, nPlanes = 6),
      "ivf" -> Similarity.ivfKnn(emb, q, k = 3, nCells = 8, nprobe = 2),
      "pq" -> Similarity.pqKnn(emb, q, k = 3, m = 16, codebookK = 32,
        shortlist = 50),
      "ivfpq" -> Similarity.ivfPqKnn(emb, q, k = 3, nCells = 8, nprobe = 3,
        m = 16, codebookK = 32, shortlist = 50),
      "ivfpq_index" -> {
        val idxDir = java.nio.file.Files
          .createTempDirectory("graft-guard-ivfpq").toString
        Similarity.buildIvfPqIndex(emb, idxDir, nCells = 8, m = 16,
          codebookK = 32)
        Similarity.searchIvfPqIndex(idxDir, emb, q, k = 3, nprobe = 3,
          shortlist = 50)
      })
    plans.foreach { case (name, df) =>
      val plan = df.queryExecution.executedPlan.toString
      assert(!plan.contains("Window"),
        s"$name knn regrew a per-query window sort:\n$plan")
      assert(!plan.contains("row_number"),
        s"$name knn regrew row_number:\n$plan")
      // partial + final ObjectHashAggregate pairs = the mergeable shape
      assert(plan.contains("ObjectHashAggregate"),
        s"$name knn lost the mergeable top-k aggregate:\n$plan")
    }
  }

  test("batched BM25 shortlists with the mergeable TopK, never a per-query window") {
    // bm25Batch inherits the ANN shortlist discipline: a row_number OVER
    // (PARTITION BY query_id) would funnel each query's full scored doc
    // list into one task — the same scale-killer the e_knn_* guard pins.
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    import spark.implicits._
    val queries = Seq((1L, "hash"), (1L, "join"), (2L, "vector"))
      .toDF("query_id", "term")
    val plan = graft.ops.Retrieval.bm25Batch(docs, queries, topK = 5)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Window"),
      s"bm25Batch regrew a per-query window sort:\n$plan")
    assert(!plan.contains("row_number"),
      s"bm25Batch regrew row_number:\n$plan")
  }

  test("per-group quota ops carry the map-side WindowGroupLimit bound") {
    // capPerGroup / takePerStratum rank within FEW but potentially HUGE
    // groups (one domain/language can be half a web corpus). Round 7
    // measurement (keyskew ladder): Spark 4's InferWindowGroupLimit makes
    // the declarative `row_number ≤ k` window whale-safe — a PARTIAL
    // group-limit runs before the exchange, so ≤k rows per group per
    // mapper cross the shuffle (max observed single-task shuffle read:
    // 1,760 rows where the whale group holds 640k) — and the window form
    // is one scan where round 6's aggregate+join was two. This guard
    // pins the optimization: a plan change that loses the Partial
    // WindowGroupLimit (e.g. a cast between rank and filter) reopens the
    // whale funnel silently.
    Seq("d_domain_cap", "d_eval_split").foreach { name =>
      val plan = SparkEntry.queries(name)(spark, dir)
        .queryExecution.executedPlan.toString
      // the Partial must be on the WindowGroupLimit node itself — a bare
      // plan.contains("Partial") would be satisfied by any partial hash
      // aggregate while the group limit silently ran Final-only
      assert("WindowGroupLimit.*Partial".r.findFirstIn(plan).isDefined,
        s"$name lost the MAP-SIDE (Partial) WindowGroupLimit:\n$plan")
    }
  }

  test("the whole tree is UDF-free: bloom probe runs as a native expression") {
    // d_bloom_dedup's batch probe was the tree's ONLY Scala UDF — now a
    // codegen'd BloomMightContain over the broadcast bitset. A ScalaUDF in
    // this plan means an interpreted per-row boundary came back on the
    // repeated-ingest hot path.
    val plan = SparkEntry.queries("d_bloom_dedup")(spark, dir)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("ScalaUDF"), s"d_bloom_dedup regrew a UDF:\n$plan")
    assert(plan.contains("bloom_might_contain"),
      s"d_bloom_dedup lost the native bloom probe:\n$plan")
  }

  test("perceptual image dedup blocks on bands: equi-join candidates, native dhash, no all-pairs") {
    // The Hamming-LSH candidate step must plan as an EQUI-join on
    // (band, bits) — a CartesianProduct or nested-loop here means the
    // image corpus went quadratic. The dHash must stay the codegen'd
    // native expression (a ScalaUDF is an interpreted per-row boundary
    // on every thumbnail).
    val plan = SparkEntry.queries("m_image_dedup")(spark, dir)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"),
      s"m_image_dedup degraded to all-pairs:\n$plan")
    assert(!plan.contains("BroadcastNestedLoopJoin"),
      s"m_image_dedup candidate join lost its equi-keys:\n$plan")
    assert(!plan.contains("ScalaUDF"), s"m_image_dedup regrew a UDF:\n$plan")
    assert(plan.contains("dhash64"),
      s"m_image_dedup lost the native dhash expression:\n$plan")
    // Round 19: the candidate matcher is the in-bucket MapGroups body —
    // ONE shuffle of the banded signature rows replaces the former
    // census + broadcast anti-join + band self-join, and the
    // degenerate-bucket cap is enforced INSIDE the group iterator
    // (buffer ≤ cap rows, drop over-cap buckets — OpsSpec pins pair-set
    // equality with brute force and guard subset behavior). The pin:
    // the matcher must stay the grouped in-task body, never regress to
    // a joined/cartesian candidate step.
    assert(plan.contains("MapGroups"),
      s"m_image_dedup lost the in-bucket grouped matcher:\n$plan")
    // audio/video twins: same equi-join discipline (the joinShaped sweep
    // covers the cartesian check). The video hash runs IN-TASK inside
    // videoFrameHashSets (the same native ImageHash64.compute as the
    // image path; in-task ≡ plan-level distinct is pinned in OpsSpec),
    // so the plan discipline to pin is the stop-frame whale guard: a
    // BROADCAST anti-join, never a shuffle of the frame table.
    val vplan = SparkEntry.queries("m_video_dedup")(spark, dir)
      .queryExecution.executedPlan.toString
    assert(!vplan.contains("BroadcastNestedLoopJoin") &&
      !vplan.contains("ScalaUDF"), s"m_video_dedup plan degraded:\n$vplan")
    assert(vplan.contains("LeftAnti") &&
      !vplan.replaceAll("(?s)BroadcastHashJoin[^\\n]*LeftAnti", "")
        .contains("LeftAnti"),
      s"m_video_dedup stop-frame removal stopped broadcasting:\n$vplan")
  }

  test("filtered ANN inherits every shortlist discipline; CDC chunking plans no shuffle") {
    // filteredKnn/filteredIvfKnn: the predicate is an equi-join KEY (a
    // degradation to CartesianProduct or a post-shortlist filter shows as
    // Window/row_number or a cartesian); the shortlist must stay the
    // mergeable TopK aggregate.
    val emb = spark.read.parquet(s"$dir/embeddings.parquet")
    val q = emb.filter(org.apache.spark.sql.functions.col("vec_id") < 5)
    import graft.ops.Similarity
    Seq(
      "filtered" -> Similarity.filteredKnn(emb, q, k = 3),
      "filtered_ivf" -> Similarity.filteredIvfKnn(emb, q, k = 3,
        nCells = 8, nprobe = 4)).foreach { case (name, df) =>
      val plan = df.queryExecution.executedPlan.toString
      assert(!plan.contains("Window"),
        s"$name knn regrew a per-query window sort:\n$plan")
      assert(!plan.contains("row_number"),
        s"$name knn regrew row_number:\n$plan")
      assert(!plan.contains("CartesianProduct"),
        s"$name knn lost its predicate equi-join key:\n$plan")
      assert(plan.contains("ObjectHashAggregate"),
        s"$name knn lost the mergeable top-k aggregate:\n$plan")
    }
    // hardNegatives inherits the same shortlist discipline (its predicate
    // is an inequality, so the join is BroadcastNestedLoop on the small
    // query side — fine; a Window would not be).
    val hn = Similarity.hardNegatives(emb, q, k = 3)
      .queryExecution.executedPlan.toString
    assert(!hn.contains("Window") && !hn.contains("row_number"),
      s"hardNegatives regrew a per-query window sort:\n$hn")
    assert(hn.contains("ObjectHashAggregate"),
      s"hardNegatives lost the mergeable top-k aggregate:\n$hn")
    // cdcChunks is scan + per-row fold + explode: any Exchange means the
    // per-document boundary fold leaked into a shuffle.
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    val cdc = graft.ops.TextAnalysis.cdcChunks(docs)
      .queryExecution.executedPlan.toString
    assert(!cdc.contains("Exchange"),
      s"cdcChunks grew a shuffle — the boundary fold must stay per-row:\n$cdc")
    // the prefix-filter containment join must never fall back to an
    // unkeyed product: every join is on shingle / id keys.
    val cp = graft.ops.Dedup.containmentPairsPrefix(docs, k = 3,
        threshold = 0.6)
      .queryExecution.executedPlan.toString
    assert(!cp.contains("CartesianProduct"),
      s"containmentPairsPrefix degraded to a cartesian product:\n$cp")
  }

  test("range join never degrades to a nested loop; horizon ops stay one-pass") {
    // The whole point of q_range_join's binning is turning the inequality
    // join into an equi-join — a refactor that loses the bin key falls
    // back to BroadcastNestedLoopJoin and dies at scale.
    val rj = SparkEntry.queries("q_range_join")(spark, dir)
      .queryExecution.executedPlan.toString
    assert(!rj.contains("BroadcastNestedLoopJoin"),
      s"q_range_join degraded to a nested loop:\n$rj")
    // t_rolling = one uuid window pass + output sort; t_decay = window +
    // same-key agg sharing one exchange + output sort.
    Seq("t_rolling", "t_decay").foreach { name =>
      val plan = SparkEntry.queries(name)(spark, dir)
        .queryExecution.executedPlan.toString
      assert("Exchange".r.findAllIn(plan).size <= 2,
        s"$name grew extra exchanges:\n$plan")
    }
  }

  test("K=64 multi-cursor merge plans ONE union + ONE sort — no per-shard driver work (src/tdb_multi_cursor.c)") {
    // The daily-shard deployment merges K dbs (the reference's k-way heap
    // merge, one cursor per shard). The Spark-native shape must stay a
    // single Union of K scans feeding ONE global sort exchange — a
    // refactor that loops shards on the driver (K sorts, K collects, or a
    // K-deep join cascade) dies at K×corpus scale.
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val shards = (0 until 64).map { s =>
      graft.core.TrailDB.fromTrailFrame(
        (0 until 20).map(i =>
          (f"${i % 5}%032x", (1000 + s * 20 + i).toLong, s"e$s", i.toLong))
          .toDF("uuid", "time", "etype", "seq"))
    }
    val merged = graft.core.TrailOps.multiCursor(shards)
    val plan = merged.queryExecution.executedPlan.toString
    // exactly one global ordering: a single range-partitioned exchange
    assert("rangepartitioning".r.findAllIn(plan.toLowerCase).size === 1,
      s"multiCursor K=64 must sort ONCE:\n${plan.take(2000)}")
    // no joins at all — merge is a union, not a join cascade
    assert(!plan.toLowerCase.contains("join"),
      s"multiCursor grew a join:\n${plan.take(2000)}")
    // one Union node over all 64 inputs (Spark flattens nested unions)
    assert("Union".r.findAllIn(plan).size === 1,
      s"multiCursor K=64 must flatten to one Union:\n${plan.take(2000)}")
    // and the merge is CORRECT: global (uuid, time, seq) order, all rows
    val rows = merged.collect()
    assert(rows.length === 64 * 20)
    val key = rows.map(r => (r.getString(0), r.getLong(1), r.getLong(3))).toSeq
    assert(key === key.sortBy(t => (t._1, t._2, t._3)), "merge order broken")
  }
}
