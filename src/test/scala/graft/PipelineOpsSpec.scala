package graft

import org.apache.spark.sql.functions._
import graft.ops.{Bpe, Dedup, Retrieval, Similarity, TextAnalysis}

/** Specs for the round-3 pipeline operators: retrieval/LM scoring, chunking,
  * stratified sampling, incremental dedup, decontamination, and int8
  * embedding quantization. */
class PipelineOpsSpec extends SparkSpec {
  import spark.implicits._

  // ---- Mixture planning ----

  test("mixPlan: have-vs-need arithmetic per source; refuses unnormalized weights") {
    val df = Seq(
      ("a", "one two three"), ("a", "four five"), // a: 2 docs, 5 tokens
      ("b", "x y"),                               // b: 1 doc, 2 tokens
      ("c", "ignored entirely")                   // unweighted: dropped
    ).toDF("source", "text")
    val got = graft.ops.TextAnalysis
      .mixPlan(df, Map("a" -> 0.5, "b" -> 0.25, "missing" -> 0.25),
        budget = 100L)
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3),
          if (r.isNullAt(4)) None else Some(r.getDouble(4))))).toMap
    assert(got === Map(
      "a" -> ((2L, 5L, 50L, Some(10.0))),
      "b" -> ((1L, 2L, 25L, Some(12.5))),
      // a budgeted source the corpus lacks is SURFACED, not dropped
      "missing" -> ((0L, 0L, 25L, None))))
    val e = intercept[IllegalArgumentException](
      graft.ops.TextAnalysis.mixPlan(df, Map("a" -> 0.9, "b" -> 0.3), 100L))
    assert(e.getMessage.contains("sum to 1"))
    // negative weights can sum to 1 and would price a negative need
    val e2 = intercept[IllegalArgumentException](
      graft.ops.TextAnalysis.mixPlan(df, Map("a" -> 1.5, "b" -> -0.5), 100L))
    assert(e2.getMessage.contains("non-negative"))
  }

  // ---- BM25 ----

  test("bm25 scores match a hand-computed reference") {
    val df = Seq(
      (1L, "hash join hash join hash"), // tf(hash)=3, tf(join)=2, dl=5
      (2L, "vector scan scan scan scan"), // tf(vector)=1, dl=5
      (3L, "scan scan scan scan scan") // no hits
    ).toDF("doc_id", "text")
    val got = Retrieval.bm25(df, Seq("hash", "join", "vector"), topK = 10)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))

    def idf(n: Long, dfreq: Long): Double =
      math.log((n - dfreq + 0.5) / (dfreq + 0.5) + 1.0)
    def tfn(tf: Long, dl: Long, avgdl: Double): Double =
      tf * (1.2 + 1.0) / (tf + 1.2 * (1.0 - 0.75 + 0.75 * dl / avgdl))
    val avgdl = 15.0 / 3
    val s1 = math.round(idf(3, 1) * tfn(3, 5, avgdl) * 1e6) +
      math.round(idf(3, 1) * tfn(2, 5, avgdl) * 1e6)
    val s2 = math.round(idf(3, 1) * tfn(1, 5, avgdl) * 1e6)
    assert(got.toSeq === Seq((1L, 2L, s1), (2L, 1L, s2)))
  }

  test("bm25Batch: each query's shortlist equals the single-query bm25") {
    val docs = TestSpark.spark.read
      .parquet("/root/testdata/sf0.001/documents.parquet")
    val bags = Map(1L -> Seq("hash", "join"), 2L -> Seq("vector", "dup"),
      3L -> Seq("hash", "vector", "dup"))
    val queries = bags.toSeq.flatMap { case (q, ts) => ts.map(t => (q, t)) }
      .toDF("query_id", "term")
    val batch = Retrieval.bm25Batch(docs, queries, topK = 10)
      .collect()
      .groupBy(_.getLong(0))
      .map { case (q, rs) => q -> rs.sortBy(_.getInt(1))
        .map(r => (r.getLong(2), r.getLong(3), r.getLong(4))).toSeq }
    bags.foreach { case (q, terms) =>
      val single = Retrieval.bm25(docs, terms, topK = 10).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
      assert(batch(q) === single, s"query $q diverged from single-query bm25")
    }
  }

  test("bm25 rare terms outscore common ones at equal tf") {
    // "rare" in 1 of 20 docs, "common" in all 20; one probe doc hits both once.
    val docs = (1L to 19L).map(i => (i, "common filler words here")) :+
      (20L, "rare common x y")
    val got = Retrieval.bm25(docs.toDF("doc_id", "text"), Seq("rare"), topK = 5)
      .collect()
    assert(got.map(_.getLong(0)).toSeq === Seq(20L))
    val common = Retrieval.bm25(docs.toDF("doc_id", "text"), Seq("common"), topK = 25)
      .collect()
    assert(common.length === 20) // every doc matches the common term
    // the rare-term score for doc 20 must exceed its common-term score
    val rareScore = got.head.getLong(2)
    val commonScore = common.find(_.getLong(0) == 20L).get.getLong(2)
    assert(rareScore > commonScore)
  }

  // ---- unigram LM ----

  test("unigramLogProb matches hand-computed add-one-smoothed scores") {
    val df = Seq((1L, "a a b"), (2L, "b c")).toDF("doc_id", "text")
    // counts: a=2, b=2, c=1; T=5, V=3
    def lp(c: Long): Long = math.round(math.log((c + 1).toDouble / 8) * 1e6)
    val got = Retrieval.unigramLogProb(df).orderBy("doc_id")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(got.toSeq === Seq(
      (1L, 3L, 2 * lp(2) + lp(2)), // a a b
      (2L, 2L, lp(2) + lp(1)))) // b c
  }

  test("unigramLogProb ranks natural text above gibberish") {
    val natural = "the cat sat on the mat and the dog sat too"
    val docs = Seq((1L, natural), (2L, natural), (3L, natural),
      (4L, "zqx vwk jjr pqm zzf")).toDF("doc_id", "text")
    val got = Retrieval.unigramLogProb(docs)
      .withColumn("mean_lp", col("lp_micro_sum") / col("n_tokens"))
      .orderBy("doc_id").collect()
    val means = got.map(r => r.getLong(0) -> r.getAs[Double]("mean_lp")).toMap
    assert(means(1L) > means(4L)) // less negative = more probable
  }

  // ---- chunking ----

  test("chunks cover every token with the declared size/stride and exact md5") {
    val text = (1 to 10).map(i => s"t$i").mkString(" ")
    val df = Seq((7L, text)).toDF("doc_id", "text")
    val got = TextAnalysis.chunks(df, size = 4, stride = 3)
      .orderBy("chunk_id").collect()
    // starts 0,3,6,9 → lengths 4,4,4,1
    assert(got.map(_.getAs[Long]("n_tokens")).toSeq === Seq(4L, 4L, 4L, 1L))
    val toks = text.split(" ")
    val expectMd5 = Seq(0, 3, 6, 9).map { s =>
      val chunk = toks.slice(s, s + 4).mkString(" ")
      java.security.MessageDigest.getInstance("MD5")
        .digest(chunk.getBytes("UTF-8")).map("%02x".format(_)).mkString
    }
    assert(got.map(_.getAs[String]("chunk_md5")).toSeq === expectMd5)
  }

  test("short docs yield exactly one chunk; stride must not exceed size") {
    val df = Seq((1L, "only three tokens")).toDF("doc_id", "text")
    val got = TextAnalysis.chunks(df, size = 32, stride = 24).collect()
    assert(got.length === 1 && got.head.getAs[Long]("n_tokens") === 3)
    intercept[IllegalArgumentException] {
      TextAnalysis.chunks(df, size = 4, stride = 5)
    }
  }

  // ---- stratified sampling ----

  test("stratified sampling: fraction 1 keeps all, 0 drops all, per stratum") {
    val df = (1L to 100L).map(i =>
      (i, s"text body number $i", if (i % 2 == 0) "en" else "zh"))
      .toDF("doc_id", "text", "lang")
    val kept = TextAnalysis.stratifiedHashSample(df,
      Map("en" -> 1.0, "zh" -> 0.0)).collect()
    assert(kept.length === 50 && kept.forall(_.getAs[String]("lang") == "en"))
  }

  test("stratified sampling agrees with hashSample within a stratum") {
    val df = (1L to 200L).map(i => (i, s"doc number $i", "en"))
      .toDF("doc_id", "text", "lang")
    val strat = TextAnalysis.stratifiedHashSample(df, Map("en" -> 0.25))
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val plain = df.filter(TextAnalysis.hashSample(col("text"), 0.25))
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(strat === plain)
  }

  // ---- sentence-level dedup with reconstruction ----

  test("dropRepeatedSentences removes cross-doc boilerplate, keeps order") {
    val df = Seq(
      (1L, "unique one. shared boilerplate. unique two!"),
      (2L, "shared boilerplate. other content?"),
      (3L, "totally original text.")).toDF("doc_id", "text")
    val got = TextAnalysis.dropRepeatedSentences(df, minDocs = 2)
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2)))
    assert(got.toSeq === Seq(
      (1L, 2L, "unique one. unique two"),
      (2L, 1L, "other content"),
      (3L, 1L, "totally original text")))
  }

  test("dropRepeatedSentences: doc of pure boilerplate drops out; repeats within one doc survive") {
    val df = Seq(
      (1L, "dup. dup. mine."),
      (2L, "spam only."),
      (3L, "spam only.")).toDF("doc_id", "text")
    val got = TextAnalysis.dropRepeatedSentences(df, minDocs = 2)
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2)))
    // "dup" occurs twice but only in doc 1 (n_docs=1) → kept both times;
    // docs 2 and 3 are 100% boilerplate → removed entirely.
    assert(got.toSeq === Seq((1L, 3L, "dup. dup. mine")))
  }

  // ---- incremental dedup ----

  test("incrementalDedup keeps only content new to the corpus, min-id within batch") {
    val corpus = Seq((1L, "aaa"), (2L, "bbb")).toDF("doc_id", "text")
    val batch = Seq(
      (10L, "aaa"), // dup of corpus → dropped
      (11L, "ccc"), (13L, "ccc"), // batch-internal dup → keep 11
      (12L, "ddd")).toDF("doc_id", "text")
    val got = Dedup.incrementalDedup(corpus, batch)
      .select("doc_id").orderBy("doc_id").collect().map(_.getLong(0))
    assert(got.toSeq === Seq(11L, 12L))
  }

  test("incrementalDedup matches NULL-text content against the corpus (null-safe anti-join)") {
    // null text is dedupable CONTENT in this library (the exactDedup
    // convention) — a plain-equality anti-join would re-ingest a
    // null-text duplicate on every batch forever
    val corpus = Seq((1L, null.asInstanceOf[String]), (2L, "bbb"))
      .toDF("doc_id", "text")
    val batch = Seq((10L, null.asInstanceOf[String]), (11L, "ccc"))
      .toDF("doc_id", "text")
    val got = Dedup.incrementalDedup(corpus, batch)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(got === Set(11L)) // the null-text batch row matched the corpus
  }

  test("incrementalDedup against an empty corpus equals exactDedup") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .limit(100)
    val emptyCorpus = docs.filter(lit(false))
    val inc = Dedup.incrementalDedup(emptyCorpus, docs)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val exact = Dedup.exactDedup(docs)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(inc === exact)
  }

  // ---- canonical selection ----

  test("keepBest keeps the highest-scoring member per cluster, tie on min id") {
    val docs = Seq(
      (1L, 10L), (2L, 30L), (3L, 30L), // cluster A: 2 and 3 tie on score → keep 2
      (4L, 5L) // singleton
    ).toDF("doc_id", "score")
    val clusters = Seq((1L, 1L), (2L, 1L), (3L, 1L), (4L, 4L))
      .toDF("doc_id", "cluster_id")
    val got = Dedup.keepBest(docs, clusters, col("score"))
      .select("cluster_id", "doc_id").orderBy("cluster_id")
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(got.toSeq === Seq((1L, 2L), (4L, 4L)))
  }

  test("keepBest: NULL scores lose to any scored member (DESC NULLS LAST replay)") {
    // The aggregate form must keep the window's NULLS LAST: a bare
    // min(struct(-score, id)) would sort the null FIRST and silently
    // crown the null-scored doc (round-6 review finding).
    val docs = Seq[(Long, java.lang.Double)](
      (1L, null), (2L, 0.9), // cluster A: null loses to 0.9
      (5L, null), (6L, null) // cluster B: all-null → min id wins
    ).toDF("doc_id", "score")
    val clusters = Seq((1L, 1L), (2L, 1L), (5L, 5L), (6L, 5L))
      .toDF("doc_id", "cluster_id")
    val got = Dedup.keepBest(docs, clusters, col("score"))
      .select("cluster_id", "doc_id").orderBy("cluster_id")
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(got.toSeq === Seq((1L, 2L), (5L, 5L)))
  }

  test("exactDedup: null-text rows keep a survivor; physical duplicates collapse") {
    // round-6 review findings: (a) a null text hashes to a null key — the
    // null-safe join must keep its min-id survivor like the window's
    // null partition did; (b) the same (id, text) row ingested twice must
    // still dedup to ONE output row.
    val docs = Seq[(Long, String)](
      (1L, "a"), (2L, "a"),      // content dup: keep 1
      (7L, null), (8L, null),    // null text: keep 7
      (9L, "b"), (9L, "b")       // physical duplicate row: keep ONE
    ).toDF("doc_id", "text")
    val got = Dedup.exactDedup(docs).select("doc_id")
      .collect().map(_.getLong(0)).sorted.toSeq
    assert(got === Seq(1L, 7L, 9L))
    val inc = Dedup.incrementalDedup(docs.filter(lit(false)), docs)
      .select("doc_id").collect().map(_.getLong(0)).sorted.toSeq
    assert(inc === Seq(1L, 7L, 9L))
  }

  test("takePerStratum: null text ranks first (NULLS FIRST replay), no NPE") {
    val docs = Seq[(Long, String, String)](
      (1L, "aaa", "en"), (2L, null, "en"), (3L, "bbb", "en"), (4L, "ccc", "en"))
      .toDF("doc_id", "text", "lang")
    val got = TextAnalysis.takePerStratum(docs, n = 2)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(got.contains(2L), s"null-text row must rank first, got $got")
    assert(got.size === 2)
  }

  test("keepBest with a constant score degrades to dedupClusters' min-id keep") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .limit(200)
    val pairs = Dedup.ngramJaccardPairs(docs, k = 3, threshold = 0.2)
    val clusters = Dedup.dedupClusters(docs, pairs)
    val best = Dedup.keepBest(docs, clusters, lit(0))
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val minId = clusters.filter(col("doc_id") === col("cluster_id"))
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(best === minId)
  }

  // ---- decontamination ----

  test("decontaminate counts distinct overlapping k-grams per train doc") {
    val eval = Seq((1L, "the quick brown fox jumps")).toDF("doc_id", "text")
    val train = Seq(
      (10L, "the quick brown fox jumps high"), // shares 3-grams
      (11L, "completely different text entirely"), // no overlap
      (12L, "the quick brown cat") // shares exactly 1 ("the quick brown")
    ).toDF("doc_id", "text")
    val got = Dedup.decontaminate(train, eval, k = 3)
      .orderBy("doc_id").collect().map(r => (r.getLong(0), r.getLong(1)))
    // eval 3-grams: {the quick brown, quick brown fox, brown fox jumps}
    assert(got.toSeq === Seq((10L, 3L), (12L, 1L)))
  }

  test("decontaminate of a doc against itself flags every shingle") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .limit(20)
    val got = Dedup.decontaminate(docs, docs, k = 3)
    val sizes = docs.select(col("doc_id"),
      size(TextAnalysis.shingleHashes(col("text"), 3)).cast("long").as("n"))
    val joined = got.join(sizes, "doc_id")
      .filter(col("n_overlap") < col("n")).count()
    assert(joined === 0) // every doc overlaps itself on all shingles
    assert(got.count() === 20)
  }

  // ---- int8 quantization ----

  test("quantizeInt8: scale, saturation, and exact error on a known vector") {
    val df = Seq((1L, Array(1.27f, -0.635f, 0.0f)),
      (2L, Array(0.0f, 0.0f, 0.0f))).toDF("vec_id", "embedding")
    val got = Similarity.quantizeInt8(df).collect()
    assert(got.length === 1) // zero vector dropped (no defined scale)
    val r = got.head
    assert(r.getLong(0) === 1L)
    assert(math.abs(r.getAs[Double]("scale6") - 0.01) < 1e-9)
    // q = [127, -64 or -63 (0.635/0.01=63.5 → half-up → 64), 0]: one saturated
    assert(r.getAs[Long]("n_sat") === 1L)
    // reconstruction error ≤ (scale/2)² per element
    val maxErr = 3 * math.pow(0.01 / 2, 2) * 1e12
    assert(r.getAs[Long]("err_pico") >= 0L && r.getAs[Long]("err_pico") <= maxErr.toLong)
  }

  test("dequantized vectors stay within half-step of the original") {
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
      .limit(50)
    val joined = Similarity.dequantized(emb).withColumnRenamed("embedding", "dq")
      .join(emb, "vec_id")
      .select(col("vec_id"),
        array_max(zip_with(col("embedding"), col("dq"),
          (x, y) => abs(x.cast("double") - y.cast("double")))).as("max_abs_err"),
        (array_max(transform(col("embedding"), e => abs(e.cast("double")))) /
          127.0).as("halfstep_bound"))
    // |x - x̂| ≤ scale/2 + float-cast epsilon; bound with scale (2× half-step)
    assert(joined.filter(col("max_abs_err") > col("halfstep_bound")).count() === 0)
  }

  test("quantized brute-force knn recalls most of the exact top-k") {
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val q = emb.filter(col("vec_id") < 10)
    val exact = Similarity.bruteForceKnn(emb, q, k = 3)
      .select("query_id", "corpus_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val quant = Similarity.bruteForceKnn(Similarity.dequantized(emb), q, k = 3)
      .select("query_id", "corpus_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val hits = (exact intersect quant).size
    assert(hits >= 24, s"quantized recall too low: $hits/30") // floor in e_knn_q8
  }

  // ---- shard assignment ----

  test("shardAssign covers [0, n), is deterministic, and partitions the corpus") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val n = docs.count()
    val sharded = docs.withColumn("shard", TextAnalysis.shardAssign(col("text"), 16))
    val byShard = sharded.groupBy("shard").count().collect()
      .map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(byShard.keySet.forall(s => s >= 0 && s < 16))
    assert(byShard.values.sum === n) // every doc in exactly one shard
    // deterministic: same assignment on re-evaluation and under repartition
    val again = docs.repartition(7)
      .withColumn("shard", TextAnalysis.shardAssign(col("text"), 16))
      .groupBy("shard").count().collect()
      .map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(again === byShard)
  }

  test("shardAssign spreads docs across shards roughly uniformly") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val counts = docs.withColumn("shard", TextAnalysis.shardAssign(col("text"), 8))
      .groupBy("shard").count().collect().map(_.getLong(1))
    assert(counts.length === 8) // 500 docs: every shard hit
    assert(counts.max < counts.min * 3, s"skewed shards: ${counts.toSeq}")
  }

  // ---- repeated-span stats ----

  test("dupSpanStats flags shared k-token spans and leaves unique docs at zero") {
    val shared = "one two three four five six seven eight"
    val docs = Seq(
      (1L, s"$shared alpha beta gamma"),
      (2L, s"prefix words here then $shared"),
      (3L, "totally different content with no overlap at all now")
    ).toDF("doc_id", "text")
    val got = Dedup.dupSpanStats(docs, k = 8)
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    // doc 1: 4 windows of its 11 tokens, one (the shared span) duplicated
    assert(got.map(t => (t._1, t._3)) === Seq((1L, 1L), (2L, 1L), (3L, 0L)))
    assert(got.forall(t => t._2 > 0))
  }

  test("dupSpanStats counts whole-text windows for docs shorter than k") {
    val docs = Seq(
      (1L, "tiny doc"), (2L, "tiny doc"), (3L, "other tiny")
    ).toDF("doc_id", "text")
    val got = Dedup.dupSpanStats(docs, k = 8)
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(got === Seq((1L, 1L, 1L), (2L, 1L, 1L), (3L, 1L, 0L)))
  }

  // ---- sequence packing ----

  test("packChunks replays as a deterministic window and preserves chunks") {
    val docs = (1L to 40L)
      .map(i => (i, Seq.fill(5 + (i % 17).toInt)("w" + i).mkString(" ")))
      .toDF("doc_id", "text")
    val ch = TextAnalysis.chunks(docs, size = 8, stride = 6)
    val packed = TextAnalysis.packChunks(ch, budget = 20, nShards = 4)
    assert(packed.count() === ch.count()) // every chunk lands in exactly one pack
    // local replay: pack_id must equal floor(exclusive cumsum / budget) in
    // (doc_id, chunk_id) order within each shard
    val rows = packed.select("shard", "doc_id", "chunk_id", "n_tokens", "pack_id")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    rows.groupBy(_._1).foreach { case (shard, g) =>
      var cum = 0L
      g.sortBy(r => (r._2, r._3)).foreach { r =>
        assert(r._5 === cum / 20, s"pack_id mismatch in shard $shard at $r")
        cum += r._4
      }
    }
    // identical assignment regardless of input partitioning
    val repacked = TextAnalysis.packChunks(ch.repartition(7), budget = 20, nShards = 4)
    assert(repacked.select("doc_id", "chunk_id", "pack_id")
      .except(packed.select("doc_id", "chunk_id", "pack_id")).count() === 0)
  }

  // ---- perplexity gate ----

  test("perplexityGate drops the low-scoring tail, strictly above the quantile") {
    // 18 normal docs + 2 gibberish docs full of rare tokens (low unigram LM
    // score); dropFrac 0.1 must remove exactly the gibberish tail
    val docs = ((1L to 18L).map(i => (i, "the quick brown fox jumps over the lazy dog")) ++
      Seq((19L, "zzq xxv qqj wwk vvz jjx kkw"), (20L, "qzz vxx jqq kww zvv xjj wkk")))
      .toDF("doc_id", "text")
    val kept = Retrieval.perplexityGate(docs, dropFrac = 0.1)
      .select("doc_id").collect().map(_.getLong(0)).sorted
    assert(kept.toSeq === (1L to 18L))
    // exact and approx paths agree here (tiny n, rank error < 1 row)
    val keptApprox = Retrieval.perplexityGate(docs, dropFrac = 0.1, exact = false)
      .select("doc_id").collect().map(_.getLong(0)).sorted
    assert(keptApprox.toSeq === kept.toSeq)
  }

  // ---- label centroids ----

  test("labelCentroids: exact micro-unit means, invariant to partitioning") {
    val vecs = Seq(
      (1L, 0, Array(1.0f, -2.0f)), (2L, 0, Array(3.0f, 4.0f)),
      (3L, 1, Array(0.5f, 0.25f))).toDF("vec_id", "label", "embedding")
    val got = Similarity.labelCentroids(vecs)
      .orderBy("label", "dim")
      .collect().map(r => (r.getInt(0), r.getInt(1), r.getLong(2), r.getLong(3), r.getDouble(4)))
    assert(got.toSeq === Seq(
      (0, 0, 2L, 4000000L, 2.0), (0, 1, 2L, 2000000L, 1.0),
      (1, 0, 1L, 500000L, 0.5), (1, 1, 1L, 250000L, 0.25)))
    val repart = Similarity.labelCentroids(vecs.repartition(5))
      .orderBy("label", "dim")
      .collect().map(r => (r.getInt(0), r.getInt(1), r.getLong(2), r.getLong(3), r.getDouble(4)))
    assert(repart.toSeq === got.toSeq)
  }

  // ---- BPE trainer ----

  test("bpe: hand-computed merge sequence on the classic low/lower/lowest corpus") {
    val docs = Seq((1L, "low low lower"), (2L, "lowest low")).toDF("doc_id", "text")
    val merges = Bpe.train(docs, merges = 10, minCount = 2)
    // pairs: (l,o)=5 ties (o,w)=5 -> pair-asc tie-break; then (lo,w)=5;
    // then (low,e)=2; everything after is count 1 < minCount -> stop
    assert(merges.map(m => (m.round, m.sym_l, m.sym_r, m.count)) === Seq(
      (1, "l", "o", 5L), (2, "lo", "w", 5L), (3, "low", "e", 2L)))
    // encode-side twin: learned rules segment held-out words
    val seg = Bpe.segment(Seq((1L, "lowest lot")).toDF("doc_id", "text"), merges)
      .select("subwords").head.getSeq[String](0)
    assert(seg === Seq("lowe", "s", "t", "lo", "t"))
    // deterministic under partitioning
    assert(Bpe.train(docs.repartition(5), merges = 10, minCount = 2) === merges)
  }

  test("native BpeEncode expression equals the UDF segmenter on an adversarial corpus") {
    import spark.implicits._
    // overlapping-merge chains, repeated chars, multi-space runs,
    // unicode, empty and NULL text — the two independent formulations
    // (native char-loop vs the Seq-fold UDF) must agree on all of them
    val docs = Seq(
      (1L, "aaa aab the then think"),
      (2L, "   leading and   multi  spaces "),
      (3L, "héllo wörld 日本語"),
      (4L, ""),
      (5L, null.asInstanceOf[String]),
      (6L, "ababab aba")).toDF("doc_id", "text")
    val merges = Seq(("a", "a"), ("t", "h"), ("th", "e"), ("a", "b"),
      ("ab", "ab")).zipWithIndex
      .map { case ((a, b), i) => Bpe.BpeMerge(i + 1, a, b, 0L) }
    val native = Bpe.segment(docs, merges).select("doc_id", "subwords")
      .collect().map(r => r.getLong(0) -> r.getSeq[String](1)).toMap
    val viaUdf = Bpe.segmentUdf(docs, merges).select("doc_id", "subwords")
      .collect().map(r => r.getLong(0) -> r.getSeq[String](1)).toMap
    assert(native === viaUdf)
    assert(native(1L) === Seq("aa", "a", "aa", "b", "the", "the", "n",
      "th", "i", "n", "k"))
    assert(native(6L) === Seq("abab", "ab", "ab", "a"))
    assert(native(4L) === Seq.empty && native(5L) === Seq.empty)
  }

  test("bpe merge application is left-to-right non-overlapping") {
    assert(Bpe.applyMerge(Seq("a", "a", "a"), "a", "a") === Seq("aa", "a"))
    assert(Bpe.applyMerge(Seq("a", "a", "a", "a"), "a", "a") === Seq("aa", "aa"))
    assert(Bpe.applyMerge(Seq("x"), "a", "a") === Seq("x"))
  }

  test("bpe merge property: content preserved, non-overlap, idempotence on absence") {
    import org.scalacheck.Gen
    val genCase = for {
      syms <- Gen.listOfN(12, Gen.oneOf("a", "b", "c"))
      l <- Gen.oneOf("a", "b", "c")
      r <- Gen.oneOf("a", "b", "c")
    } yield (syms, l, r)
    Iterator.continually(genCase.sample).flatten.take(300).foreach {
      case (syms, l, r) =>
        val out = Bpe.applyMerge(syms, l, r)
        // character stream unchanged — merges only regroup
        assert(out.mkString === syms.mkString, s"content changed for $syms ($l,$r)")
        // no adjacent (l,r) survives where the left symbol is still atomic l
        out.iterator.zip(out.iterator.drop(1)).foreach { case (x, y) =>
          assert(!(x == l && y == r), s"unmerged adjacent pair in $out from $syms")
        }
        // one pass eliminates every (l,r) adjacency (merged symbols are
        // multi-char, so they can never reform a single-char pair) — a
        // second application is the identity
        assert(Bpe.applyMerge(out, l, r) === out)
    }
  }

  test("misra-gries property: bound holds under ANY merge topology") {
    import org.scalacheck.Gen
    import scala.util.Random
    // exercise the summary ALGEBRA directly (reduce on random segments,
    // merge in random tree order) — exactly what Spark's partial
    // aggregation does with arbitrary partitioning and combine order
    val mg = ops.Sketch.MisraGries(8)
    val genStream = for {
      len <- Gen.choose(50, 400)
      zipfBase <- Gen.choose(20, 120)
      toks <- Gen.listOfN(len, Gen.choose(1, zipfBase).map(j => s"t${zipfBase / j}"))
    } yield toks
    val rnd = new Random(42)
    Iterator.continually(genStream.sample).flatten.take(60).foreach { stream =>
      val n = stream.size.toLong
      val exact = stream.groupBy(identity).map { case (t, xs) => t -> xs.size.toLong }
      // split into random segments, reduce each, merge in random order
      val nSeg = 1 + rnd.nextInt(6)
      val segs = stream.grouped(math.max(1, stream.size / nSeg)).toList
      var buffers = segs.map(_.foldLeft(mg.zero)(mg.reduce))
      while (buffers.size > 1) {
        val i = rnd.nextInt(buffers.size - 1)
        buffers = buffers.patch(i, List(mg.merge(buffers(i), buffers(i + 1))), 2)
      }
      val sketch = mg.finish(buffers.head)
      assert(sketch.size <= 8)
      exact.filter(_._2 * 9 > n).foreach { case (t, _) =>
        assert(sketch.contains(t), s"lost heavy hitter $t (n=$n)")
      }
      sketch.foreach { case (t, est) =>
        val c = exact(t)
        assert(est <= c && est >= c - n / 9, s"estimate $est out of bound for $t")
      }
    }
  }

  // ---- exact-count eval split ----

  test("takePerStratum carves exactly n per stratum, deterministically") {
    val docs = (1L to 30L).map(i => (i, s"doc body number $i", if (i % 3 == 0) "de" else "en"))
      .toDF("doc_id", "text", "lang")
    val got = TextAnalysis.takePerStratum(docs, n = 4)
    val byLang = got.groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(byLang === Map("en" -> 4L, "de" -> 4L))
    // identical selection regardless of partitioning
    val again = TextAnalysis.takePerStratum(docs.repartition(7), n = 4)
    assert(got.select("doc_id").except(again.select("doc_id")).count() === 0)
    // a stratum smaller than n yields all its rows
    val tiny = TextAnalysis.takePerStratum(docs.filter(col("doc_id") <= 2), n = 4)
    assert(tiny.count() === 2)
  }

  // ---- shard export ----

  test("exportTrainingShards writes JSONL partitions whose manifest matches the plan") {
    val docs = (1L to 60L).map(i => (i, s"shard me number $i word" * (1 + (i % 3)).toInt))
      .map { case (i, t) => (i, t) }.toDF("doc_id", "text")
    val out = java.nio.file.Files.createTempDirectory("graft-exp").resolve("s").toString
    val manifest = TextAnalysis.exportTrainingShards(docs, out, nShards = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(manifest.map(_._2).sum === 60L) // every doc landed in some shard
    assert(manifest.map(_._1).toSet.subsetOf((0L until 4L).toSet))
    // shard dirs exist on disk with the Hive layout + sidecar
    val root = new java.io.File(out)
    assert(manifest.forall(m => new java.io.File(root, s"shard=${m._1}").isDirectory))
    val sidecar = new java.io.File(root, "_manifest.json")
    assert(sidecar.isFile)
    val lines = scala.io.Source.fromFile(sidecar).getLines().toSeq
    assert(lines.size === manifest.length && lines.head.startsWith("{\"shard\":"))
    // manifest computed from read-back equals a direct computation on the input
    val direct = docs
      .withColumn("shard", TextAnalysis.shardAssign(col("text"), 4))
      .groupBy("shard")
      .agg(count(lit(1)).as("n"),
        sum(TextAnalysis.tokenCount(col("text")).cast("long")).as("t"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sortBy(_._1)
    assert(manifest.map(m => (m._1, m._2, m._3)).sortBy(_._1).toSeq === direct.toSeq)
  }

  test("exportTrainingShards handles NULL-text docs (shards like empty text, manifest still writes)") {
    // md5(NULL) is NULL: before r15 a null-text doc partitioned to the
    // Hive default partition and the manifest collect NPE'd AFTER the
    // full corpus write, leaving shards with no sidecar
    val docs = Seq((1L, "real text here"), (2L, null.asInstanceOf[String]))
      .toDF("doc_id", "text")
    val out = java.nio.file.Files.createTempDirectory("graft-expn")
      .resolve("s").toString
    val manifest = TextAnalysis.exportTrainingShards(docs, out, nShards = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(manifest.map(_._2).sum === 2L) // both docs landed in real shards
    assert(new java.io.File(new java.io.File(out), "_manifest.json").isFile)
  }

  // ---- Misra-Gries heavy hitters ----

  test("misra-gries holds the heavy-hitter guarantee and error bound on a zipf stream") {
    // token j appears ceil(2000/j) times: 200 distinct tokens, 2 true heavy
    // hitters at k=16 — evictions and lossy merges must actually happen
    val stream = (1 to 200).flatMap(j => Seq.fill(math.ceil(2000.0 / j).toInt)(s"tok$j"))
    val n = stream.size.toLong
    val k = 16
    val exact = stream.groupBy(identity).map { case (t, xs) => t -> xs.size.toLong }
    assert(exact.count(_._2 * (k + 1) > n) >= 2)
    for (parts <- Seq(1, 8)) {
      val ds = spark.createDataset(stream).repartition(parts)
      val sketch = ds.select(ops.Sketch.MisraGries(k).toColumn).head()
      assert(sketch.size <= k)
      exact.filter(_._2 * (k + 1) > n).foreach { case (t, _) =>
        assert(sketch.contains(t), s"missing heavy hitter $t at parts=$parts")
      }
      sketch.foreach { case (t, est) =>
        val c = exact(t)
        assert(est <= c && est >= c - n / (k + 1),
          s"estimate $est outside [${c - n / (k + 1)}, $c] for $t at parts=$parts")
      }
    }
  }

  test("bloomDedup: duplicates always drop (one-sided error), new docs mostly survive") {
    import spark.implicits._
    val corpus = (0 until 500).map(i => (i.toLong, s"corpus doc $i"))
      .toDF("doc_id", "text")
    // batch: 100 exact duplicates of corpus docs + 200 new docs
    val dups = (0 until 100).map(i => (1000L + i, s"corpus doc $i"))
    val fresh = (0 until 200).map(i => (2000L + i, s"brand new doc $i"))
    val batch = (dups ++ fresh).toDF("doc_id", "text")
    val kept = ops.Dedup.bloomDedup(corpus, batch, fpp = 0.01)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    // no duplicate may survive — Bloom filters have no false negatives
    assert(kept.forall(_ >= 2000L), s"duplicate survived: ${kept.filter(_ < 2000L)}")
    // ≥95% of genuinely-new docs survive at fpp=1%
    assert(kept.size >= 190, s"only ${kept.size}/200 new docs survived")
  }

  test("temperatureMixture: weights normalize, alpha=1 is the natural mix, alpha<1 flattens") {
    import spark.implicits._
    val df = (Seq.fill(900)("big") ++ Seq.fill(100)("small"))
      .zipWithIndex.map { case (s, i) => (i.toLong, s) }.toDF("doc_id", "source")
    def mix(alpha: Double): Map[String, (Long, Double)] =
      ops.TextAnalysis.temperatureMixture(df, "source", alpha).collect()
        .map(r => r.getAs[String]("source") ->
          (r.getAs[Long]("n_docs"), r.getAs[Double]("weight"))).toMap
    val natural = mix(1.0)
    assert(math.abs(natural("big")._2 - 0.9) < 1e-6)
    assert(math.abs(natural("small")._2 - 0.1) < 1e-6)
    val flat = mix(0.5)
    assert(flat("small")._2 > 0.1 && flat("small")._2 < 0.5)
    assert(math.abs(flat.values.map(_._2).sum - 1.0) < 1e-5)
  }

  test("quantileFilter keeps the top (1-q) with GK rank bounds, tie-robust, nulls drop") {
    import spark.implicits._
    // 1000 distinct scores + a heavy tie block + nulls
    val rows = ((1 to 1000).map(i => (i.toLong, Some(i.toDouble))) ++
      (1001 to 1200).map(i => (i.toLong, Some(100.0))) ++ // 200-way tie at 100
      (1201 to 1210).map(i => (i.toLong, Option.empty[Double])))
    val df = rows.toDF("id", "score")
    val kept = graft.ops.TextAnalysis.quantileFilter(df, col("score"), q = 0.25)
    val n = kept.count()
    // 1200 non-null scores; exact p25 threshold is near rank 300; ties at
    // 100 may add their block. GK at accuracy 10000 is rank-exact here.
    assert(n >= (1200 * 0.70).toLong && n <= (1200 * 0.80 + 200).toLong, s"kept $n")
    // nulls never survive (they clear no threshold)
    assert(kept.filter(col("score").isNull).count() === 0)
    // the contract row verifies its own bounds — and counts NON-NULL
    // scores as its base (nulls are outside the GK summary's ranks), so
    // it holds on the null-bearing frame directly
    val c = graft.ops.TextAnalysis
      .quantileGateContract(df, col("score"), 0.25)
      .head()
    assert(c.getAs[Long]("rank_lo_ok") === 1L && c.getAs[Long]("rank_hi_ok") === 1L)
    assert(c.getAs[Long]("n_total") === 1200L)
    // adversarial: ALL scores identical — the threshold IS the value,
    // everything survives, and the non-strict bound absorbs the tie mass
    val same = (1 to 50).map(i => (i.toLong, 7.0)).toDF("id", "score")
    assert(graft.ops.TextAnalysis.quantileFilter(same, col("score"), 0.5)
      .count() === 50L)
    val cs = graft.ops.TextAnalysis
      .quantileGateContract(same, col("score"), 0.5).head()
    assert(cs.getAs[Long]("rank_lo_ok") === 1L && cs.getAs[Long]("rank_hi_ok") === 1L)
  }
}
