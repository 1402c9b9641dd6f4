package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Retrieval and language-model-proxy scoring over a
  * `documents(doc_id, text, ...)` corpus — the query-side complement of the
  * dedup/quality operators: BM25 keyword retrieval (the standard lexical
  * baseline next to the ANN path in [[Similarity]]) and smoothed unigram
  * log-probability scoring (the cheap perplexity proxy used to quality-rank
  * training corpora, as in CCNet-style pipelines).
  *
  * Both operators sum per-term double contributions across rows. A plain
  * `sum(double)` is order-dependent (shuffle order differs run to run and
  * engine to engine), so every contribution is first rounded to an exact
  * integer in micro units (`round(x * 1e6)` → BIGINT) and the cross-row sum
  * runs in exact integer arithmetic — bit-reproducible on any cluster size
  * and verifiable by an external SQL engine.
  */
object Retrieval {

  /** BM25 (Robertson-Spärck Jones) score of each document against a bag of
    * query terms; top-k by score. idf = ln((N - df + 0.5)/(df + 0.5) + 1)
    * (the +1 keeps it positive), tf-normalization with the usual k1/b.
    *
    * Shuffle shape at scale: tokens are filtered to the query terms INSIDE
    * the scan projection, so the exploded stream that reaches the (doc,
    * term) aggregation carries only matching tokens — a handful per
    * document, not the corpus token stream. Document length comes from the
    * same projection (no second scan); df-per-term and corpus stats (N,
    * avgdl in exact integer form) are term-count-sized and 1-row aggregates,
    * both broadcast. No corpus-sized side is ever shuffled more than once.
    *
    * Output: (doc_id, n_hit_terms, score_micro) — score in micro-units
    * (1e-6), exact-integer-summed per doc.
    */
  def bm25(df: DataFrame, queryTerms: Seq[String], topK: Int = 20,
      k1: Double = 1.2, b: Double = 0.75,
      idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    require(queryTerms.nonEmpty, "bm25 needs at least one query term")
    val toks = TextAnalysis.tokens(col(textCol))
    val hits = df.select(col(idCol), size(toks).cast("long").as("dl"),
      explode(filter(toks, t => t.isin(queryTerms.map(lit): _*))).as("term"))
    // tf is consumed twice (df-per-term + the score join). Without the
    // checkpoint Catalyst duplicates the corpus scan+explode subplan to
    // recompute this (matched docs × terms)-sized table — at 100 TB that is
    // a second full-corpus pass to rebuild a table that is ≪ 1% of it.
    val tf = hits.groupBy(col(idCol), col("term"))
      .agg(first(col("dl")).as("dl"), count(lit(1)).as("tf"))
      .localCheckpoint()
    val dfreq = tf.groupBy("term").agg(count(lit(1)).as("df"))
    // N and total token count as exact integers; avgdl derived as ONE double
    // division so both engines divide identical operands.
    val stats = df.agg(count(lit(1)).as("n"),
      sum(size(TextAnalysis.tokens(col(textCol)))).as("sum_dl"))
    val idf = log((col("n") - col("df") + lit(0.5)) / (col("df") + lit(0.5)) + lit(1.0))
    val tfn = col("tf") * (lit(k1) + 1.0) /
      (col("tf") + lit(k1) * (lit(1.0) - lit(b) +
        lit(b) * col("dl") / (col("sum_dl").cast("double") / col("n"))))
    tf.join(broadcast(dfreq), "term")
      .crossJoin(broadcast(stats))
      .withColumn("_c_micro", round(idf * tfn * lit(1e6), 0).cast("long"))
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_hit_terms"), sum(col("_c_micro")).as("score_micro"))
      .orderBy(col("score_micro").desc, col(idCol))
      .limit(topK)
  }

  /** BATCHED BM25 — score MANY query bags in one corpus pass (the
    * retrieval-eval / hybrid-shortlist-fleet shape; running [[bm25]] per
    * query would rescan the corpus per query). `queries` is a
    * `(query_id, term)` table; term bags are treated as SETS (duplicate
    * terms in one bag count once, matching the single-query form's
    * `isin`).
    *
    * Shape at scale: corpus tokens are filtered by a broadcast semi-join
    * against the UNION of all query terms inside the scan projection, the
    * (doc, term) tf/df/idf algebra runs once (shared across queries —
    * identical values to [[bm25]]'s), per-term doc scores fan out to the
    * queries using that term via a broadcast join on the (small) query
    * table, and the per-query shortlist is the mergeable
    * [[Sketch.TopK]] aggregate — ≤topK rows per (partition, query)
    * through the exchange, never a per-query window sort (the ANN
    * shortlist discipline). Micro-integer scores are ≤ ~1e8, exact in
    * the aggregator's double.
    *
    * Output: (query_id, rank, `idCol`, n_hit_terms, score_micro),
    * rank 1..topK by (score desc, id asc) — per query, exactly the rows
    * the single-query [[bm25]] would return. */
  def bm25Batch(df: DataFrame, queries: DataFrame, topK: Int = 20,
      k1: Double = 1.2, b: Double = 0.75,
      idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    val qterms = queries.select(col("query_id"), col("term")).distinct()
    val termSet = qterms.select("term").distinct()
    val toks = TextAnalysis.tokens(col(textCol))
    val hits = df.select(col(idCol), size(toks).cast("long").as("dl"),
        explode(toks).as("term"))
      .join(broadcast(termSet), "term")
    val tf = hits.groupBy(col(idCol), col("term"))
      .agg(first(col("dl")).as("dl"), count(lit(1)).as("tf"))
      .localCheckpoint() // consumed by df-per-term AND the score join
    val dfreq = tf.groupBy("term").agg(count(lit(1)).as("df"))
    val stats = df.agg(count(lit(1)).as("n"),
      sum(size(TextAnalysis.tokens(col(textCol)))).as("sum_dl"))
    val idf = log((col("n") - col("df") + lit(0.5)) / (col("df") + lit(0.5)) + lit(1.0))
    val tfn = col("tf") * (lit(k1) + 1.0) /
      (col("tf") + lit(k1) * (lit(1.0) - lit(b) +
        lit(b) * col("dl") / (col("sum_dl").cast("double") / col("n"))))
    val perQueryDoc = tf.join(broadcast(dfreq), "term")
      .crossJoin(broadcast(stats))
      .withColumn("_c_micro", round(idf * tfn * lit(1e6), 0).cast("long"))
      .join(broadcast(qterms), "term") // fan doc-term scores to their queries
      .groupBy(col("query_id"), col(idCol))
      .agg(count(lit(1)).as("n_hit_terms"), sum(col("_c_micro")).as("score_micro"))
      // consumed twice (shortlist + the n_hit_terms join-back): without
      // the checkpoint the 1-row stats aggregate — a full corpus scan —
      // would run once per consumer
      .localCheckpoint()
    val top = Similarity.topKPerQuery(
      perQueryDoc.select(col("query_id"),
        col(idCol).cast("long").as("corpus_id"), col("score_micro")),
      "score_micro", topK, "score_micro")
    top.join(perQueryDoc.select(col("query_id"),
        col(idCol).cast("long").as("corpus_id"), col("n_hit_terms")),
        Seq("query_id", "corpus_id"))
      .select(col("query_id"), col("rank"), col("corpus_id").as(idCol),
        col("n_hit_terms"), col("score_micro").cast("long").as("score_micro"))
  }

  /** Add-one-smoothed corpus unigram log-probability per document — the
    * classic cheap perplexity proxy for corpus quality ranking:
    * p(t) = (c(t) + 1) / (T + V) with T = total tokens, V = vocab size;
    * output the exact-integer sum of per-token ln p(t) in micro-nats.
    *
    * Two passes over the token stream, both on the same `token` shuffle
    * key: one groupBy for c(t), then the token→frequency join reuses that
    * partitioning (no extra Exchange); (T, V) is a 1-row broadcast. The
    * per-doc re-aggregation shuffles on doc id. At 100 TB the frequency
    * table is vocab-sized (≪ corpus) — Zipf-skewed join keys are the one
    * hazard, handled by AQE skew-join on the token join.
    *
    * Output: (doc_id, n_tokens, lp_micro_sum) with lp_micro_sum =
    * Σ round(ln(p(t))·1e6) — more negative = more surprising under the
    * corpus model. Callers derive mean log-prob as lp_micro_sum / n_tokens.
    */
  def unigramLogProb(df: DataFrame, idCol: String = "doc_id",
      textCol: String = "text"): DataFrame = {
    val toks = df.select(col(idCol),
      explode(TextAnalysis.tokens(col(textCol))).as("token"))
    // freq is consumed twice (totals + the scoring join): checkpoint the
    // vocab-sized table so the corpus token stream is aggregated once, not
    // re-derived from a duplicated scan+explode subplan.
    val freq = toks.groupBy("token").agg(count(lit(1)).as("c")).localCheckpoint()
    val totals = freq.agg(sum(col("c")).as("t"), count(lit(1)).as("v"))
    toks.join(freq, "token")
      .crossJoin(broadcast(totals))
      .withColumn("_lp_micro",
        round(log((col("c") + lit(1L)).cast("double") / (col("t") + col("v"))) *
          lit(1e6), 0).cast("long"))
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_tokens"), sum(col("_lp_micro")).as("lp_micro_sum"))
  }

  /** Add-one-smoothed corpus BIGRAM log-probability per document — one
    * Markov order up from [[unigramLogProb]], the KenLM-shaped conditional
    * model p(b|a) = (c(a,b) + 1) / (c(a·) + V) with c(a·) = count of `a` as
    * a bigram left-context and V = distinct-bigram vocabulary (standard
    * add-one over the transition table). Repeated words, word order, and
    * local coherence move this score where a unigram model is blind.
    *
    * Same exact-integer contract as the unigram scorer: each transition
    * contributes round(ln p · 1e6) micro-nats and docs sum in BIGINT, so the
    * result is order-independent and engine-replayable. Docs with < 2 tokens
    * have no transitions and are absent from the output (as docs with no
    * tokens are absent from the unigram scorer's).
    *
    * Shuffle shape at scale: the bigram stream is built INSIDE the scan
    * projection (tokens zipped with their own tail via a higher-order
    * transform — no self-join, no explode-then-window), aggregated once on
    * the bigram key. Context totals AND the per-bigram log-prob are then
    * computed entirely on the vocabulary-sized frequency table, so the
    * corpus gram stream crosses exactly two exchanges (the bigram groupBy
    * join key and the per-doc re-aggregation) — it is never re-shuffled on
    * the context key. V is a 1-row broadcast. Zipf skew on the bigram join
    * key is AQE's skew-join case, as with the unigram scorer.
    *
    * Output: (doc_id, n_bigrams, lp2_micro_sum).
    */
  def bigramLogProb(df: DataFrame, idCol: String = "doc_id",
      textCol: String = "text"): DataFrame = {
    // Tokenize ONCE behind a multi-use alias: `_t` is referenced by
    // size/slice/element_at, and a non-cheap alias with several consumers
    // is a CollapseProject barrier. Embedding tokens() directly would
    // inline an independent regex split into the transform lambda's
    // element_at — re-splitting the document PER TOKEN (quadratic per doc;
    // measured ≈5.3s → ≈1.5s steady-state at sf0.1 for this query).
    val withT = df.select(col(idCol),
      TextAnalysis.tokens(col(textCol)).as("_t"))
    val t = col("_t")
    val bigramArr = when(size(t) >= 2,
      transform(slice(t, lit(1), size(t) - 1),
        (w, i) => concat_ws(" ", w, element_at(t, i + 2))))
      .otherwise(array().cast("array<string>"))
    val grams = withT.select(col(idCol), explode(bigramArr).as("bigram"))
    // freq is consumed three ways (context totals, V, scoring join):
    // checkpoint the vocabulary-sized table so the corpus bigram stream is
    // aggregated exactly once.
    val freq = grams.groupBy("bigram").agg(count(lit(1)).as("c")).localCheckpoint()
    val ctx = freq
      .groupBy(split(col("bigram"), " ", 2).getItem(0).as("w1"))
      .agg(sum(col("c")).as("ca"))
    val vocab = freq.agg(count(lit(1)).as("v"))
    // per-bigram score computed on the VOCAB-sized table (freq ⋈ ctx is
    // vocab ⋈ unigram-vocab — no broadcast hint, AQE picks; on web text
    // both exceed broadcast limits), so the corpus gram stream only ever
    // joins on its own groupBy key.
    val scored = freq
      .join(ctx, split(col("bigram"), " ", 2).getItem(0) === col("w1"))
      .crossJoin(broadcast(vocab))
      .select(col("bigram"),
        round(log((col("c") + lit(1L)).cast("double") / (col("ca") + col("v"))) *
          lit(1e6), 0).cast("long").as("_lp_micro"))
    grams.join(scored, "bigram")
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_bigrams"), sum(col("_lp_micro")).as("lp2_micro_sum"))
  }

  /** Top-k bigram collocations by PMI (Church & Hanks, CL 1990) with a
    * count floor — the corpus-analysis "which word pairs stick together"
    * measure: pmi = ln((c_xy/Nb) / ((c_x/N)·(c_y/N))), rounded to integral
    * micro-nats so the RANKING is engine-replayable (the same micro-integer
    * discipline as the LM scores — a raw libm double in the sort key would
    * make the top-k cut depend on last-ulp cross-engine agreement);
    * `minCount` floors out hapax pairs (PMI is maximal for a pair seen
    * once). Ties break on bigram text.
    *
    * Scale shape: two map-side-combined groupBys (unigram and bigram
    * streams — both outputs vocab-bounded), the bigram table joins the
    * unigram table twice on its own group key (vocab ⋈ vocab, AQE picks
    * the strategy), totals ride as broadcast one-row aggregates, and the
    * top-k is TakeOrderedAndProject — nothing but the two scans grows
    * with the corpus. */
  def pmiCollocations(df: DataFrame, k: Int = 20, minCount: Int = 5,
      textCol: String = "text"): DataFrame = {
    require(k > 0, s"k must be positive, got $k")
    require(minCount >= 1, s"minCount must be >= 1, got $minCount")
    val withT = df.select(TextAnalysis.tokens(col(textCol)).as("_t"))
    val t = col("_t")
    // unigram counts: consumed twice (x-side and y-side joins) plus the
    // total — checkpoint the vocab-sized table, not the corpus stream.
    val uni = withT.select(explode(t).as("tok"))
      .groupBy("tok").agg(count(lit(1)).as("cu")).localCheckpoint()
    val nTok = uni.agg(sum("cu").as("n"))
    val bigramArr = when(size(t) >= 2,
      transform(slice(t, lit(1), size(t) - 1),
        (w, i) => concat_ws(" ", w, element_at(t, i + 2))))
      .otherwise(array().cast("array<string>"))
    val bi = withT.select(explode(bigramArr).as("bigram"))
      .groupBy("bigram").agg(count(lit(1)).as("cb")).localCheckpoint()
    val nBi = bi.agg(sum("cb").as("nb"))
    bi.filter(col("cb") >= minCount)
      .withColumn("_w1", split(col("bigram"), " ", 2).getItem(0))
      .withColumn("_w2", split(col("bigram"), " ", 2).getItem(1))
      .join(uni.select(col("tok").as("_w1"), col("cu").as("_cx")), "_w1")
      .join(uni.select(col("tok").as("_w2"), col("cu").as("_cy")), "_w2")
      .crossJoin(broadcast(nTok)).crossJoin(broadcast(nBi))
      .select(col("bigram"), col("cb").as("c"),
        round(log((col("cb").cast("double") * col("n") * col("n")) /
            (col("nb").cast("double") * col("_cx") * col("_cy"))) * lit(1e6), 0)
          .cast("long").as("pmi_micro"))
      .orderBy(col("pmi_micro").desc, col("bigram")).limit(k)
      .orderBy(col("pmi_micro").desc, col("bigram"))
  }

  /** CCNet-style perplexity gate: score every doc with the unigram LM,
    * round to an integral per-token micro-nat score, and keep docs STRICTLY
    * above the `dropFrac` quantile of that score — i.e. drop the
    * worst-scoring tail. Integral scores make the cut engine-replayable:
    * the interpolated threshold either equals an attained integer exactly
    * (interpolation fraction 0) or falls strictly between two attained
    * integers, so membership is stable across engines even if the
    * threshold's last bits differ.
    *
    * `exact = true` computes the quantile with the exact `percentile`
    * aggregate — its buffer gathers the score column of the whole corpus
    * onto one reducer, which is fine for the 16-byte (id, score)
    * projection into the billions of docs but not beyond; `exact = false`
    * is the 100 TB path (`percentile_approx`, bounded rank error, same
    * plan shape otherwise).
    */
  def perplexityGate(df: DataFrame, dropFrac: Double = 0.1,
      exact: Boolean = true, idCol: String = "doc_id",
      textCol: String = "text"): DataFrame = {
    require(dropFrac >= 0.0 && dropFrac < 1.0, s"dropFrac $dropFrac out of range")
    // scored is consumed twice (threshold aggregate + the gate filter):
    // checkpoint the narrow (id, counts, score) table so the whole
    // unigram-LM subplan is not duplicated under both consumers.
    val scored = unigramLogProb(df, idCol, textCol)
      .withColumn("lp_tok_micro",
        round(col("lp_micro_sum").cast("double") / col("n_tokens"), 0).cast("long"))
      .localCheckpoint()
    val thr = scored.agg(
      (if (exact) percentile(col("lp_tok_micro"), lit(dropFrac))
       else percentile_approx(col("lp_tok_micro"), lit(dropFrac), lit(10000)))
        .as("_thr"))
    scored.crossJoin(broadcast(thr))
      .filter(col("lp_tok_micro") > col("_thr"))
      .select(col(idCol), col("lp_tok_micro"))
  }

  /** Attach 1-based ranks to a shortlist frame, ordered by `scoreCol`
    * descending with the id as tiebreak. The single-partition window is
    * deliberate and SAFE ONLY because the input is already a bounded
    * shortlist (a `topK`-limited ranking, e.g. [[bm25]]'s output) — never
    * hand a corpus-sized frame to this. */
  def asRanking(df: DataFrame, scoreCol: String,
      idCol: String = "doc_id"): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    df.withColumn("rank", row_number()
        .over(Window.orderBy(col(scoreCol).desc, col(idCol))).cast("long"))
      .select(col(idCol), col("rank"))
  }

  /** Reciprocal-rank fusion (Cormack, Clarke & Büttcher, SIGIR 2009):
    * fuse N ranked shortlists into one by
    * `score(d) = Σ_systems 1 / (c + rank_s(d))` — the standard way to
    * combine lexical (BM25) and vector (ANN) retrieval without score
    * calibration, since only ranks enter the sum.
    *
    * Each input is `(idCol, rank)` with ranks 1-based. Contributions are
    * exact nano-unit integers (`round(1e9 / (c + rank))` — order-
    * independent integer sums), so fused scores are bit-reproducible and
    * engine-verifiable. All inputs are shortlists (≤ their own topK), so
    * the union is bounded at `Σ topK` rows regardless of corpus size; the
    * fusion aggregate is the only (tiny) shuffle.
    */
  def rrfFuse(rankings: Seq[DataFrame], c: Int = 60, topK: Int = 20,
      idCol: String = "doc_id"): DataFrame = {
    require(rankings.nonEmpty, "rrfFuse needs at least one ranking")
    require(c >= 0, s"rank constant must be non-negative, got $c")
    val all = rankings
      .map(_.select(col(idCol), col("rank").cast("long").as("rank")))
      .reduce(_ unionAll _)
    all
      .withColumn("_c_nano",
        round(lit(1e9) / (lit(c) + col("rank")), 0).cast("long"))
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_systems"), sum(col("_c_nano")).as("rrf_nano"))
      .orderBy(col("rrf_nano").desc, col(idCol))
      .limit(topK)
  }
}
