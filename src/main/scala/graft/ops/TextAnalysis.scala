package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Text-analysis operators for large-scale training-data pipelines over a
  * `documents(doc_id, text, ...)` table. All pure column expressions
  * (whole-stage codegen, no UDFs), so they stream through a scan with no
  * shuffle — the right shape for a 100 TB corpus sweep.
  */
object TextAnalysis {

  /** Whitespace tokens of a text column. */
  def tokens(text: Column): Column = split(text, " +")

  /** Whitespace token count. */
  def tokenCount(text: Column): Column = size(tokens(text))

  /** BPE-ish subword token estimate: word-piece segments of ≤4 chars plus
    * punctuation/digit runs — a cheap, deterministic proxy for a real BPE
    * vocabulary (len/4 rounded up per word). */
  def bpeTokenEstimate(text: Column): Column =
    aggregate(
      transform(tokens(text), w => ceil(length(w) / lit(4.0)).cast("long")),
      lit(0L), (acc, x) => acc + x)

  /** Small multilingual stopword table used by quality scoring and langId.
    * Deliberately tiny and embedded — a real pipeline would broadcast a
    * proper dictionary; the operator shape is identical. */
  val StopwordsEn = Seq("the", "a", "an", "and", "or", "of", "to", "in", "is", "it")
  val StopwordsDe = Seq("der", "die", "das", "und", "oder", "von", "zu", "ist", "ein", "nicht")
  val StopwordsEs = Seq("el", "la", "los", "las", "y", "o", "de", "en", "es", "un")
  val StopwordsFr = Seq("le", "la", "les", "et", "ou", "de", "en", "est", "un", "une")

  private def countIn(text: Column, words: Seq[String]): Column =
    size(filter(tokens(text), w => w.isin(words.map(lit): _*)))

  /** Quality signals: char/token counts, punctuation count, stopword count
    * and ratios — the standard cheap filters applied before expensive
    * pipeline stages. Integer counts are exact; ratios are single IEEE
    * divisions (bit-reproducible across engines given equal operands). */
  def withQualitySignals(df: DataFrame, textCol: String = "text"): DataFrame = {
    val t = col(textCol)
    df.withColumn("n_chars_m", length(t).cast("long"))
      .withColumn("n_tokens", tokenCount(t).cast("long"))
      .withColumn("n_punct", (length(t) - length(regexp_replace(t, "[.,;:!?]", ""))).cast("long"))
      .withColumn("n_stopwords", countIn(t, StopwordsEn).cast("long"))
      .withColumn("mean_token_len",
        (length(regexp_replace(t, " ", "")).cast("double") / tokenCount(t)))
      .withColumn("stopword_ratio", col("n_stopwords").cast("double") / col("n_tokens"))
      .withColumn("punct_ratio", col("n_punct").cast("double") / col("n_chars_m"))
  }

  /** N-gram-free language-ID heuristic: per-language stopword hits, argmax
    * with a fixed priority order for ties. (A real system would use char
    * n-gram profiles; the operator shape — pure scan, no shuffle — is the
    * point at scale.) */
  def withLangId(df: DataFrame, textCol: String = "text"): DataFrame = {
    val t = col(textCol)
    val scored = df
      .withColumn("c_en", countIn(t, StopwordsEn))
      .withColumn("c_de", countIn(t, StopwordsDe))
      .withColumn("c_es", countIn(t, StopwordsEs))
      .withColumn("c_fr", countIn(t, StopwordsFr))
    scored.withColumn("lang_pred",
      when(col("c_en") >= col("c_de") && col("c_en") >= col("c_es") && col("c_en") >= col("c_fr"), "en")
        .when(col("c_de") >= col("c_es") && col("c_de") >= col("c_fr"), "de")
        .when(col("c_es") >= col("c_fr"), "es")
        .otherwise("fr"))
  }

  /** Word k-shingles (k consecutive tokens joined by a space). */
  def shingles(text: Column, k: Int): Column = {
    val toks = tokens(text)
    array_distinct(
      when(size(toks) < k, array(concat_ws(" ", toks)))
        .otherwise(transform(
          sequence(lit(0), size(toks) - lit(k)),
          i => concat_ws(" ", slice(toks, i + 1, lit(k))))))
  }

  /** Distinct 64-bit hashes of word k-shingles via the native one-pass
    * [[graft.functions.ShingleHashes]] expression — chained XXH64 per
    * window, no per-shingle slice-array materialization (this is the
    * per-row hot loop under MinHash, winnowing, and near-dup
    * verification). */
  def shingleHashes(text: Column, k: Int): Column =
    graft.functions.GraftFunctions.shingleHashes(tokens(text), k)

  /** The builtin composition [[shingleHashes]] replaced (kept for the
    * equivalence spec — must stay bit-identical). */
  def shingleHashesComposed(text: Column, k: Int): Column = {
    val toks = tokens(text)
    array_distinct(
      when(size(toks) < k, array(xxhash64(toks)))
        .otherwise(transform(
          sequence(lit(0), size(toks) - lit(k)),
          i => xxhash64(slice(toks, i + 1, lit(k))))))
  }

  /** Document fingerprint via winnowing (Schleimer et al., SIGMOD'03 style):
    * hash every k-shingle, keep the minimum hash in each sliding window of
    * `window` shingles. Array-expression form — fine for short texts and
    * unit tests, but O(shingles²) after projection collapse (each window
    * position re-materializes the hash array): use [[fingerprintStats]] /
    * [[fingerprints]] for corpus-scale work. */
  def fingerprint(text: Column, k: Int = 5, window: Int = 4): Column = {
    val hashes = shingleHashes(text, k)
    val n = size(hashes)
    val mins = transform(
      sequence(lit(0), greatest(n - lit(window), lit(0))),
      i => array_min(slice(hashes, i + 1, lit(window))))
    array_distinct(mins)
  }

  /** Corpus-scale winnowing via the native one-pass
    * [[graft.functions.Winnow]] expression — the whole fingerprint SET is
    * computed inside the scan projection (zero shuffle; the window-
    * function formulation below needed two corpus-wide window sorts).
    * Output: (id, fp) rows — one row per fingerprint hash. */
  def fingerprints(df: DataFrame, idCol: String = "doc_id",
      textCol: String = "text", k: Int = 5, window: Int = 4): DataFrame =
    df.select(col(idCol).as("id"),
        explode(graft.functions.GraftFunctions.winnow(
          shingleHashes(col(textCol), k), window)).as("fp"))

  /** The window-function formulation [[fingerprints]] replaced (kept for
    * the equivalence spec): posexplode shingle hashes once, sliding-window
    * min via a window frame, distinct per doc. */
  def fingerprintsWindowed(df: DataFrame, idCol: String = "doc_id",
      textCol: String = "text", k: Int = 5, window: Int = 4): DataFrame = {
    val byDoc = Window.partitionBy("id")
    val sliding = Window.partitionBy("id").orderBy("pos")
      .rowsBetween(Window.currentRow, window - 1)
    // NB: the shingle count must come from a window over the exploded rows.
    // A sibling size(shingleHashes(...)) next to the posexplode looks
    // cheaper but is re-evaluated per OUTPUT row of the generator —
    // quadratic again (measured 147s vs 8s at sf0.1).
    df.select(col(idCol).as("id"),
        posexplode(shingleHashes(col(textCol), k)).as(Seq("pos", "h")))
      .withColumn("n", count(lit(1)).over(byDoc))
      .withColumn("m", min(col("h")).over(sliding))
      .filter(col("pos") <= greatest(col("n") - window, lit(0)))
      .select(col("id"), col("m").as("fp")).distinct()
  }

  /** TF-IDF top terms per document: tf = in-doc term count, df = number of
    * docs containing the term, idf = ln(N/df), score = tf·idf (rounded to 6
    * decimals for cross-engine determinism of the transcendental).
    *
    * Shuffle shape at scale: one shuffle for (doc, token) tf (map-side
    * combined), one on token for df, and the tf→df join re-uses the token
    * partitioning; N is a 1-row broadcast. The per-doc top-k window
    * partitions by doc — no global sort. */
  def tfidfTopTerms(df: DataFrame, topK: Int = 5, idCol: String = "doc_id",
      textCol: String = "text"): DataFrame = {
    val tf = df.select(col(idCol), explode(tokens(col(textCol))).as("token"))
      .groupBy(col(idCol), col("token")).agg(count(lit(1)).as("tf"))
    val dfreq = tf.groupBy("token").agg(count(lit(1)).as("df"))
    val nDocs = df.select(countDistinct(col(idCol)).as("n"))
    val w = Window.partitionBy(idCol).orderBy(col("tfidf").desc, col("token"))
    tf.join(dfreq, "token")
      .crossJoin(broadcast(nDocs))
      .withColumn("tfidf",
        round(col("tf") * log(col("n").cast("double") / col("df")), 6))
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= topK)
      .select(col(idCol), col("rank"), col("token"), col("tf"), col("df"), col("tfidf"))
  }

  /** Repetition signals (Gopher-style quality rules, Rae et al. 2021 §A1.1):
    * fraction of tokens that are repeats, most-frequent-token share, and
    * most-frequent-bigram share, via the native one-pass
    * [[graft.functions.RepetitionStats]] expression — a pure scan
    * projection, ZERO shuffle (the aggregate formulation below needed
    * three). Integer counts + single IEEE divisions — deterministic
    * across engines. */
  def withRepetitionSignals(df: DataFrame, idCol: String = "doc_id",
      textCol: String = "text"): DataFrame = {
    val rs = graft.functions.GraftFunctions.repetitionStats(tokens(col(textCol)))
    df.select(col(idCol), rs.as("_rs"))
      .select(col(idCol),
        col("_rs")(0).as("n_tokens"),
        col("_rs")(1).as("n_distinct"),
        (lit(1.0) - col("_rs")(1).cast("double") / col("_rs")(0)).as("dup_token_frac"),
        (col("_rs")(2).cast("double") / col("_rs")(0)).as("top_token_frac"),
        (col("_rs")(3).cast("double") / col("_rs")(4)).as("top_bigram_frac"))
  }

  /** The explode+aggregate formulation [[withRepetitionSignals]] replaced
    * (kept for the equivalence spec — must stay bit-identical). */
  def withRepetitionSignalsAgg(df: DataFrame, idCol: String = "doc_id",
      textCol: String = "text"): DataFrame = {
    val toks = df.select(col(idCol), explode(tokens(col(textCol))).as("token"))
    val tokenCnt = toks.groupBy(col(idCol), col("token")).agg(count(lit(1)).as("c"))
      .groupBy(col(idCol)).agg(
        sum("c").as("n_tokens"),
        count(lit(1)).as("n_distinct"),
        max("c").as("top_token_c"))
    val bi = df.select(col(idCol), explode(shinglesAll(col(textCol), 2)).as("bigram"))
      .groupBy(col(idCol), col("bigram")).agg(count(lit(1)).as("c"))
      .groupBy(col(idCol)).agg(max("c").as("top_bigram_c"), sum("c").as("n_bigrams"))
    tokenCnt.join(bi, Seq(idCol), "left")
      .select(col(idCol),
        col("n_tokens"), col("n_distinct"),
        (lit(1.0) - col("n_distinct").cast("double") / col("n_tokens")).as("dup_token_frac"),
        (col("top_token_c").cast("double") / col("n_tokens")).as("top_token_frac"),
        (coalesce(col("top_bigram_c"), lit(0L)).cast("double") /
          coalesce(col("n_bigrams"), lit(1L))).as("top_bigram_frac"))
  }

  /** Word k-shingles WITH repeats (unlike [[shingles]], which distincts) —
    * repetition measurement needs every occurrence. */
  def shinglesAll(text: Column, k: Int): Column = {
    val toks = tokens(text)
    when(size(toks) < k, array(concat_ws(" ", toks)))
      .otherwise(transform(
        sequence(lit(0), size(toks) - lit(k)),
        i => concat_ws(" ", slice(toks, i + 1, lit(k)))))
  }

  /** PII scrubbing: redact email addresses, long digit runs (phone/account
    * numbers), and IPv4 literals with typed placeholders. Patterns kept to
    * the regex subset whose semantics agree between Java regex (Spark) and
    * RE2 (DuckDB/others) — character classes, bounded repetition, no
    * backrefs/lookaround — so results are engine-portable. Pure projection:
    * streams through the scan, no shuffle. */
  def scrubPii(text: Column): Column = {
    val email = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
    val ip = "\\b(?:[0-9]{1,3}\\.){3}[0-9]{1,3}\\b"
    val digits = "\\b[0-9][0-9 ()+-]{6,}[0-9]\\b"
    regexp_replace(
      regexp_replace(
        regexp_replace(text, email, "<EMAIL>"),
        ip, "<IP>"),
      digits, "<NUMBER>")
  }

  /** Deterministic hash-sampling: keep a doc iff the first byte of
    * md5(text) < 256·fraction. Engine-portable (md5 is standardized, unlike
    * per-engine hash functions), reproducible across runs and cluster
    * sizes, and correlates with nothing — the standard way to cut a
    * training corpus to a target size or carve train/held-out splits.
    * Pure filter: pushes no shuffle, composes with any scan. */
  def hashSample(text: Column, fraction: Double): Column = {
    require(fraction >= 0.0 && fraction <= 1.0, s"fraction $fraction not in [0,1]")
    conv(substring(md5(text.cast("binary")), 1, 2), 16, 10).cast("int") <
      lit((fraction * 256).toInt)
  }

  /** Deterministic training-shard assignment: uniform bucket from the
    * first 48 bits of md5(text) (24 bits left a measurable deterministic
    * imbalance for non-power-of-two nShards near the 2^20 cap — 2^24 mod
    * nShards buckets get one extra hash value each, a 6% doc-count skew
    * at nShards = 10^6; at 48 bits the bias is ≤ 2^-28).
    * Engine-portable, reproducible across
    * runs and cluster sizes, and independent of input order/partitioning
    * (unlike `spark_partition_id` or `monotonically_increasing_id`, which
    * change under repartition or stage retry). Pairs with
    * `write.partitionBy("shard")` to lay out the fixed-cardinality shard
    * files a training job consumes; the per-shard manifest (counts, token
    * sums, content checksum) is the restart/audit contract. Pure
    * projection: no shuffle until the manifest aggregate. */
  def shardAssign(text: Column, nShards: Int): Column = {
    require(nShards > 0 && nShards <= (1 << 20), s"nShards $nShards out of range")
    conv(substring(md5(text.cast("binary")), 1, 12), 16, 10).cast("long") % nShards
  }

  /** Token-window chunking with overlap — the standard pre-tokenization
    * split for embedding/pretraining pipelines: chunk i covers tokens
    * [i·stride, i·stride + size), starts at every stride-th token until the
    * text is exhausted (the tail chunk may be short; every doc yields ≥ 1
    * chunk). Emits (id, chunk_id, n_tokens, chunk_md5) — the md5 stands in
    * for the chunk text so the output stays narrow while still proving the
    * exact chunk content.
    *
    * Plan shape: the token array is materialized ONCE per row in a
    * projection below the Generate (posexplode is a collapse barrier —
    * slicing per chunk row costs O(size), not O(doc²); referencing
    * `split(text)` inside a transform() lambda instead would re-evaluate
    * the split per element after projection collapse). Pure scan + explode:
    * no shuffle at any scale.
    */
  def chunks(df: DataFrame, size: Int = 32, stride: Int = 24,
      idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    require(size > 0 && stride > 0 && stride <= size,
      s"need 0 < stride <= size, got size=$size stride=$stride")
    import org.apache.spark.sql.functions.{size => asize}
    df.select(col(idCol), tokens(col(textCol)).as("_t"))
      .select(col(idCol), col("_t"),
        posexplode(sequence(lit(0),
          floor((asize(col("_t")) - 1) / lit(stride)).cast("int")))
          .as(Seq("chunk_id", "_i")))
      .select(col(idCol), col("chunk_id").cast("long").as("chunk_id"),
        asize(slice(col("_t"), col("_i") * stride + 1, lit(size))).cast("long")
          .as("n_tokens"),
        md5(concat_ws(" ", slice(col("_t"), col("_i") * stride + 1, lit(size)))
          .cast("binary")).as("chunk_md5"))
  }

  /** Concat-and-split sequence packing over chunked documents — the GPT-style
    * packing step that turns variable-length chunks into fixed-token-budget
    * training groups: within each md5-derived shard, chunks are laid out in
    * deterministic (doc_id, chunk_id) order and pack_id = floor(exclusive
    * running token sum / budget), i.e. documents are concatenated and split
    * at budget boundaries (a straddling chunk belongs to the pack where it
    * starts). Fully deterministic and order-replayable by any engine — no
    * dependence on partitioning, task order, or a driver-side packer.
    *
    * Plan shape: one hash shuffle on `shard` (fixed small cardinality) and a
    * per-shard sort for the running sum — at 100 TB the window never sees
    * more than corpus/nShards rows per partition, and nShards is chosen to
    * make that fit (it is the training job's shard count, not a tuning
    * knob). Expects [[chunks]] output (idCol, chunk_id, n_tokens).
    */
  def packChunks(chunked: DataFrame, budget: Int, nShards: Int = 8,
      idCol: String = "doc_id"): DataFrame = {
    require(budget > 0, s"budget must be positive, got $budget")
    val sharded = chunked.withColumn("shard",
      shardAssign(col(idCol).cast("string"), nShards))
    val prior = Window.partitionBy("shard").orderBy(col(idCol), col("chunk_id"))
      .rowsBetween(Window.unboundedPreceding, -1)
    sharded.withColumn("pack_id",
      floor(coalesce(sum(col("n_tokens")).over(prior), lit(0L)) / lit(budget))
        .cast("long"))
  }

  /** Temperature-weighted source mixture (the training-mix design step:
    * multilingual/multi-domain resampling a la mT5/XLM-R): per group
    * share p_g = n_g / N, resampling weight w_g = p_g^alpha / Σ p_g^alpha.
    * alpha < 1 flattens the mix toward rare groups, alpha = 1 keeps
    * natural proportions. Output per group: n_docs, weight (round 6),
    * expected_docs = w_g·N (round 3) — the sampling budget a downstream
    * [[stratifiedHashSample]] call would be fed with.
    *
    * Scale shape: one map-side-combined groupBy; the global normalization
    * window runs over |groups| rows (languages/domains — tiny), never
    * over the corpus.
    */
  def temperatureMixture(df: DataFrame, groupCol: String = "source",
      alpha: Double = 0.5): DataFrame = {
    require(alpha > 0.0 && alpha <= 1.0, s"alpha must be in (0,1], got $alpha")
    val all = Window.partitionBy()
    df.groupBy(col(groupCol)).agg(count(lit(1)).as("n_docs"))
      .withColumn("_total", sum("n_docs").over(all))
      .withColumn("_pa",
        pow(col("n_docs").cast("double") / col("_total").cast("double"), alpha))
      .withColumn("weight", round(col("_pa") / sum("_pa").over(all), 6))
      .withColumn("expected_docs",
        round(col("_pa") / sum("_pa").over(all) * col("_total"), 3))
      .drop("_total", "_pa")
  }

  /** Per-stratum deterministic hash sampling: like [[hashSample]] but with
    * a different keep-fraction per stratum value (e.g. downsample
    * over-represented languages, keep all of a rare one) — the standard
    * corpus-rebalancing primitive. Unknown stratum values fall back to
    * `default`. Fractions quantize to /256 (md5 first byte), like
    * [[hashSample]]. Pure filter: no shuffle, engine-portable, reproducible
    * on any cluster size.
    */
  /** Per-row WEIGHTED deterministic sampling — [[stratifiedHashSample]]
    * generalized from per-stratum constants to a continuous per-row keep
    * probability (clamped to [0,1]): quality-proportional downsampling,
    * temperature-weighted source mixing applied row-wise, any "keep this
    * row with probability w(row)" rule. Keep iff the first two md5(text)
    * bytes (a uniform 16-bit value) fall under floor(w·65536) — /65536
    * quantization (vs the stratified sampler's /256: a continuous weight
    * deserves the finer grid). Same properties: pure filter (no shuffle),
    * engine-portable md5 rule, reproducible on any cluster size, and the
    * SAME hash stream as the other samplers — so samples are NESTED, not
    * independent: a w=0.25 sample is exactly a subset of the w=0.5 sample
    * (shrinking a corpus cut keeps no new rows), and re-sampling an
    * already-sampled frame keeps min(w1, w2), not the product. For an
    * independent second draw, sample on a different column (e.g. a salted
    * copy). */
  def weightedHashSample(df: DataFrame, weight: Column,
      textCol: String = "text"): DataFrame =
    df.filter(
      conv(substring(md5(col(textCol).cast("binary")), 1, 4), 16, 10)
        .cast("long") <
      // coalesce FIRST: least/greatest SKIP nulls (in both engines), so a
      // null weight would otherwise clamp to 1.0 and silently KEEP the
      // row — an unknown weight drops instead (the conservative read).
      floor(greatest(lit(0.0), least(lit(1.0), coalesce(weight, lit(0.0))))
        * 65536).cast("long"))

  def stratifiedHashSample(df: DataFrame, fractions: Map[String, Double],
      default: Double = 0.0, strataCol: String = "lang",
      textCol: String = "text"): DataFrame = {
    require((fractions.values ++ Seq(default)).forall(f => f >= 0.0 && f <= 1.0),
      "fractions must be in [0,1]")
    val threshold = fractions.foldLeft(lit((default * 256).toInt)) {
      case (acc, (k, f)) => when(col(strataCol) === k, lit((f * 256).toInt)).otherwise(acc)
    }
    df.filter(
      conv(substring(md5(col(textCol).cast("binary")), 1, 2), 16, 10).cast("int")
        < threshold)
  }

  /** Deterministic exactly-N-per-stratum split — "carve exactly n eval docs
    * per language": rank within each stratum by (md5(text), id) — a total,
    * content-derived order, reproducible on any cluster/partitioning — and
    * keep the first n.  Complements [[stratifiedHashSample]] (fractional,
    * approximate counts) when the contract is an exact count.
    *
    * Scale shape (round 7, REVERSING round 6 on measurement): the
    * declarative `row_number ≤ n` window — which round 6 replaced with a
    * MinKLex aggregate + semi-join on the "whale stratum sorts in one
    * task" argument — is already whale-safe on Spark 4: Catalyst plans a
    * map-side `WindowGroupLimit (Partial)` BEFORE the exchange, so ≤n
    * rows per stratum per mapper cross the shuffle and the reducer sorts
    * ≤n×mappers rows, never the stratum's row stream (keyskew ladder: max
    * single-task shuffle read 960 rows on a corpus whose whale stratum
    * holds 640k). One scan, no join-back — strictly less work than the
    * aggregate form, which lives on as [[stratumQuota]] for streaming
    * (a window cannot run on a stream). NULL text ranks FIRST (md5 null,
    * ASC NULLS FIRST); any id type works (the round-6 long-cast
    * restriction is gone). */
  def takePerStratum(df: DataFrame, n: Int, strataCol: String = "lang",
      idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    require(n > 0, s"n must be positive, got $n")
    import org.apache.spark.sql.expressions.Window
    df.withColumn("_r", row_number().over(Window.partitionBy(col(strataCol))
        .orderBy(md5(col(textCol).cast("binary")), col(idCol))))
      .filter(col("_r") <= n).drop("_r")
  }

  /** The per-stratum quota DECISION — (stratum, keep_id) — as a single
    * mergeable grouped aggregate: the plan behind the streaming twin
    * [[graft.streaming.StreamSessions.streamingStratumQuota]]. Applies
    * the identical selection rule as the batch [[takePerStratum]] window
    * ((md5(text) ASC NULLS FIRST, id ASC) LIMIT n per stratum — MinKLex
    * replays it exactly: ASCII hex compares identically in UTF8String
    * and String, and "" replicates the null-text NULLS FIRST rank);
    * StreamingSpec proves the two agree across micro-batch boundaries.
    * Requires an integral id (the aggregator buffers (md5, id-as-long)
    * pairs). */
  def stratumQuota(df: DataFrame, n: Int, strataCol: String = "lang",
      idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    require(n > 0, s"n must be positive, got $n")
    graft.ops.Sketch.requireIntegralId(df.schema, idCol, "stratumQuota")
    val mk = udaf(graft.ops.Sketch.MinKLex(n))
    // coalesce(md5, ""): a NULL text hashes to a null sort key, which the
    // window form ranked FIRST (ASC NULLS FIRST) — "" replicates that
    // exactly ("" < any hex digest; a real md5 is never empty) instead of
    // NPE-ing String.compareTo inside the aggregator.
    df.groupBy(col(strataCol))
      .agg(mk(coalesce(md5(col(textCol).cast("binary")), lit("")),
        col(idCol).cast("long")).as("mk"))
      .select(col(strataCol), explode(col("mk")).as("e"))
      .select(col(strataCol), col("e._2").as("keep_id"))
  }

  /** Per-group quality cap — the C4/RefinedWeb per-domain quota: keep at
    * most `maxPerGroup` rows per group, BEST first by `scoreCol` (id
    * tie-break ⇒ deterministic, engine-replayable), with the kept rank in
    * `cap_rank`. The quality-ranked sibling of [[takePerStratum]] (which
    * ranks by content hash = uniform sampling): a whale domain contributes
    * its `maxPerGroup` best documents, not a random slice.
    *
    * Scale shape (round 7, REVERSING round 6 on measurement): the
    * `row_number ≤ k` window is whale-safe on Spark 4 — Catalyst's
    * map-side `WindowGroupLimit (Partial)` keeps ≤k rows per group per
    * mapper BEFORE the exchange (keyskew ladder: max single-task shuffle
    * read 1,760 rows where the whale domain holds 640k), so the window is
    * one scan with a tiny shuffle, strictly less work than round 6's
    * TopK-aggregate + id join (two scans). The aggregate form lives on as
    * [[capQuota]] for streaming. Scores: DESC NULLS LAST, id ASC
    * tie-break; any id type works. */
  def capPerGroup(df: DataFrame, maxPerGroup: Int,
      groupCol: String = "source", scoreCol: Column = col("n_chars"),
      idCol: String = "doc_id"): DataFrame = {
    require(maxPerGroup > 0, s"maxPerGroup must be positive, got $maxPerGroup")
    import org.apache.spark.sql.expressions.Window
    // filter on the raw rank (InferWindowGroupLimit pattern-matches the
    // rank attribute; a cast in between would defeat it), cast after
    df.withColumn("_r", row_number().over(
        Window.partitionBy(col(groupCol))
          .orderBy(scoreCol.cast("double").desc_nulls_last, col(idCol))))
      .filter(col("_r") <= maxPerGroup)
      .withColumn("cap_rank", col("_r").cast("long")).drop("_r")
  }

  /** The per-group cap DECISION — (group, keep_id, cap_rank) — as a single
    * mergeable grouped aggregate: the plan behind the streaming twin
    * [[graft.streaming.StreamSessions.streamingCapQuota]]. Applies the
    * identical selection rule as the batch [[capPerGroup]] window
    * ((score DESC, id ASC) top-maxPerGroup per group; scores must be
    * non-null and order-preserving under double cast); StreamingSpec
    * proves the two agree across micro-batch boundaries. Requires an
    * integral id (the aggregator buffers (score, id-as-long) pairs). */
  def capQuota(df: DataFrame, maxPerGroup: Int,
      groupCol: String = "source", scoreCol: Column = col("n_chars"),
      idCol: String = "doc_id"): DataFrame = {
    require(maxPerGroup > 0, s"maxPerGroup must be positive, got $maxPerGroup")
    graft.ops.Sketch.requireIntegralId(df.schema, idCol, "capQuota")
    val tk = udaf(graft.ops.Sketch.TopK(maxPerGroup))
    df.groupBy(col(groupCol))
      .agg(tk(scoreCol.cast("double"), col(idCol).cast("long")).as("tk"))
      .select(col(groupCol), posexplode(col("tk")))
      .select(col(groupCol), col("col").getField("_2").as("keep_id"),
        (col("pos") + 1).cast("long").as("cap_rank"))
  }

  /** Export the corpus as md5-bucketed training shards ON DISK (Hive-style
    * `shard=K` JSONL partitions — the layout a training job's data loader
    * consumes) and return the per-shard manifest computed from a READ-BACK
    * of the written files, so the manifest audits what actually landed on
    * disk (doc/token counts + order-independent content checksum) rather
    * than what the plan intended. The write is one pass (shard is a pure
    * projection, partitionBy splits files, no shuffle); the manifest is a
    * second pass over the written shards. A `_manifest.json` sidecar (one
    * JSON line per shard, the [[graft.core.TrailInfo]] pattern) makes the
    * export restartable/auditable without Spark. */
  def exportTrainingShards(docs: DataFrame, path: String,
      nShards: Int = 16): DataFrame = {
    val spark = docs.sparkSession
    // a NULL-text doc shards like empty text — md5(NULL) is NULL, and a
    // NULL shard would land in the Hive default partition and NPE the
    // manifest collect AFTER the full corpus write; the manifest sums
    // coalesce for the same row shape (sum over all-null is NULL)
    docs.withColumn("shard",
        shardAssign(coalesce(col("text"), lit("")), nShards))
      .write.partitionBy("shard").mode("overwrite").json(path)
    val manifest = spark.read.json(path)
      .groupBy(col("shard").cast("long").as("shard"))
      .agg(count(lit(1)).as("n_docs"),
        coalesce(sum(tokenCount(col("text")).cast("long")), lit(0L))
          .as("n_tokens"),
        coalesce(sum(conv(substring(md5(col("text").cast("binary")), 1, 8),
          16, 10).cast("long")), lit(0L)).as("checksum"))
      .orderBy("shard")
    val lines = manifest.collect().map(r =>
      s"""{"shard":${r.getLong(0)},"n_docs":${r.getLong(1)},""" +
      s""""n_tokens":${r.getLong(2)},"checksum":${r.getLong(3)}}""")
    java.nio.file.Files.write(
      java.nio.file.Paths.get(path, "_manifest.json"),
      lines.mkString("", "\n", "\n").getBytes("UTF-8"))
    manifest
  }

  /** CCNet-style sentence-level dedup WITH text reconstruction: drop every
    * sentence that occurs in `minDocs`-or-more distinct documents
    * (boilerplate headers, cookie banners, license blurbs), then rebuild
    * each document from its surviving sentences in original order. The
    * rewrite twin of the reporting-only sentence-frequency table
    * (`d_sentence_dedup`).
    *
    * Shuffle shape at scale: explode sentences with position → one shuffle
    * on the sentence for the doc-frequency count → the sentence→frequency
    * join reuses that partitioning → one shuffle on doc id to reassemble.
    * Same shape as TF-IDF; nothing quadratic, no broadcast of a
    * corpus-sized side. Docs whose every sentence is boilerplate drop out.
    *
    * Output: (id, n_kept, clean) — surviving-sentence count and the
    * reconstructed text, ". "-joined.
    */
  def dropRepeatedSentences(df: DataFrame, minDocs: Int = 2,
      idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    require(minDocs >= 1, s"minDocs must be >= 1, got $minDocs")
    val sents = df
      .select(col(idCol), posexplode(split(col(textCol), "[.!?]+")).as(Seq("pos", "_raw")))
      .select(col(idCol), col("pos"), trim(col("_raw")).as("s"))
      .filter(length(col("s")) > 0)
    val freq = sents.groupBy("s").agg(countDistinct(col(idCol)).as("nd"))
    sents.join(freq, "s")
      .filter(col("nd") < minDocs)
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_kept"),
        concat_ws(". ",
          transform(array_sort(collect_list(struct(col("pos"), col("s")))),
            x => x.getField("s"))).as("clean"))
  }

  /** Quantile-threshold gate — the percentile-based quality filter of
    * C4/Gopher-style pipelines ("drop the bottom q of the corpus by this
    * score"): keep rows whose score clears the corpus' approximate
    * q-quantile.
    *
    * Scale shape: the threshold comes from ONE mergeable sketch pass —
    * `percentile_approx` is Spark's Greenwald-Khanna summary, rank error
    * ≤ n/accuracy, partial-aggregated map-side like any agg — broadcast
    * back as a one-row cross join into the filter scan. An EXACT
    * percentile would be a full corpus sort; at 100 TB the sketch is the
    * only sane path, and its rank-ε contract is what
    * [[quantileGateContract]] re-checks from the data. Two pushed-down
    * scans of the input (sketch + filter), no shuffle beyond the one-row
    * aggregate.
    *
    * Keeps score >= threshold (ties INCLUDED — so slightly more than
    * (1−q)·n rows survive when the threshold value is heavy); null
    * scores drop (they clear no threshold). */
  def quantileFilter(df: DataFrame, scoreCol: Column, q: Double,
      accuracy: Int = 10000): DataFrame = {
    require(q > 0.0 && q < 1.0, s"q must be in (0, 1), got $q")
    require(accuracy >= 100, s"accuracy must be >= 100, got $accuracy")
    val thr = df.agg(
      percentile_approx(scoreCol, lit(q), lit(accuracy)).as("_thr"))
    df.crossJoin(broadcast(thr))
      .filter(scoreCol >= col("_thr"))
      .drop("_thr")
  }

  /** The invariant contract behind [[quantileFilter]], as a one-row frame
    * (the ANN-invariant pattern — the sketch's threshold VALUE is
    * summary-specific, its rank guarantee is not): n_total, n_kept, and
    * two GK-bound checks recomputed from the data — rank_lo_ok:
    * #(score < t) ≤ (q + ε)·n and rank_hi_ok: #(score ≤ t) ≥ (q − ε)·n,
    * with ε = 1/accuracy + slack for the one-element discretization.
    * Tie-robust by construction (strict vs non-strict counts bracket the
    * tie mass at the threshold). */
  def quantileGateContract(df: DataFrame, scoreCol: Column, q: Double,
      accuracy: Int = 10000, slack: Double = 0.01): DataFrame = {
    val thr = df.agg(
      percentile_approx(scoreCol, lit(q), lit(accuracy)).as("_thr"))
    val eps = 1.0 / accuracy + slack
    df.crossJoin(broadcast(thr))
      .agg(
        // count(scoreCol), not count(*): the GK summary ranks NON-NULL
        // scores only, so the rank bounds must use the same base — on a
        // null-bearing corpus count(*) would silently loosen (or on a
        // mostly-null one, break) both checks (r8 self-review)
        count(scoreCol).as("n_total"),
        sum(when(scoreCol >= col("_thr"), 1L).otherwise(0L)).as("n_kept"),
        sum(when(scoreCol < col("_thr"), 1L).otherwise(0L)).as("_below"),
        sum(when(scoreCol <= col("_thr"), 1L).otherwise(0L)).as("_at_or_below"))
      .select(col("n_total"), col("n_kept"),
        (col("_below") <= (lit(q) + lit(eps)) * col("n_total"))
          .cast("long").as("rank_lo_ok"),
        (col("_at_or_below") >= (lit(q) - lit(eps)) * col("n_total"))
          .cast("long").as("rank_hi_ok"))
  }

  /** Per-doc fingerprint summary (count / min / max of the winnowed set) —
    * straight off the native winnow array: no explode, no groupBy, no
    * shuffle at all. (The array is referenced by several consumers, which
    * keeps CollapseProject from inlining the expensive winnow into each.) */
  def fingerprintStats(df: DataFrame, idCol: String = "doc_id",
      textCol: String = "text", k: Int = 5, window: Int = 4): DataFrame =
    df.select(col(idCol),
        graft.functions.GraftFunctions.winnow(
          shingleHashes(col(textCol), k), window).as("_fp"))
      .select(col(idCol),
        size(col("_fp")).cast("long").as("n_fp"),
        array_min(col("_fp")).as("fp_min"),
        array_max(col("_fp")).as("fp_max"))

  /** Token-budget mixture plan: the pre-flight arithmetic of a training
    * data recipe — given target mixture `weights` per source and a total
    * token `budget`, report per source what the corpus HAS (docs, exact
    * token count) against what the recipe NEEDS (`need_tokens` =
    * floor(budget·w)) and the repeat factor that implies (`epochs` =
    * need/have; > 1 means the source upsamples, i.e. repeats into the
    * mix). One aggregation pass over the corpus, output is
    * |sources|-sized; sources absent from `weights` are dropped (weight
    * 0 keeps the row, with need 0). The join runs OUTWARD from the
    * declared recipe: a weighted source with NO corpus rows still gets
    * its row (n_docs 0, n_tokens 0, epochs NULL) — a budgeted source the
    * corpus lacks entirely is the first thing a pre-flight must surface,
    * not silently omit.
    *
    * `weights` must already be normalized (Σw = 1) — the caller's mixture
    * declaration IS the contract; silently re-normalizing here would hide
    * a mis-specified recipe. Enforced on the driver before any job runs.
    */
  def mixPlan(df: DataFrame, weights: Map[String, Double], budget: Long,
      sourceCol: String = "source", textCol: String = "text"): DataFrame = {
    validateMix(weights, budget)
    val spark = df.sparkSession
    import spark.implicits._
    val recipe = weights.toSeq.sortBy(_._1).toDF(sourceCol, "_w")
    // Both join sides are |sources|-sized (the recipe literal and the
    // post-aggregate stats) — the corpus is touched only by the groupBy.
    recipe.join(mixStats(df, sourceCol, textCol), Seq(sourceCol), "left")
      .select(col(sourceCol),
        coalesce(col("_nd"), lit(0L)).as("n_docs"),
        coalesce(col("_nt"), lit(0L)).as("n_tokens"),
        floor(lit(budget) * col("_w")).cast("long").as("need_tokens"))
      .withColumn("epochs", when(col("n_tokens") > 0,
        col("need_tokens").cast("double") / col("n_tokens")))
  }

  /** [[mixPlan]] restricted to sources PRESENT in `df` — the
    * streaming-legal shape (a join after a streaming aggregation is not
    * allowed, so the recipe outer-join that surfaces empty sources is
    * batch-only): one grouped aggregate plus per-row arithmetic, usable
    * as a complete/update-mode streaming aggregation. Identical rows to
    * [[mixPlan]] for every source with data. */
  def mixPlanSeen(df: DataFrame, weights: Map[String, Double], budget: Long,
      sourceCol: String = "source", textCol: String = "text"): DataFrame = {
    validateMix(weights, budget)
    mixStats(df, sourceCol, textCol)
      .withColumn("_w", element_at(typedLit(weights), col(sourceCol)))
      .filter(col("_w").isNotNull)
      .select(col(sourceCol), col("_nd").as("n_docs"),
        col("_nt").as("n_tokens"),
        floor(lit(budget) * col("_w")).cast("long").as("need_tokens"))
      .withColumn("epochs", when(col("n_tokens") > 0,
        col("need_tokens").cast("double") / col("n_tokens")))
  }

  private def mixStats(df: DataFrame, sourceCol: String,
      textCol: String): DataFrame =
    df.groupBy(col(sourceCol))
      .agg(count(lit(1)).as("_nd"),
        sum(tokenCount(col(textCol)).cast("long")).as("_nt"))

  /** One-scan per-column data profile — the ingest audit every new corpus
    * drop gets before entering the pipeline: row count, null count, distinct
    * count, lexicographic min/max of the string rendering, plus an HLL
    * agreement flag. ONE pass over the data: all statistics are computed in
    * a single aggregate (map-side partials, a one-row reduce) and then
    * unpivoted driver-free with explode over a literal struct array.
    *
    * Exact `count(distinct)` over d columns makes Catalyst plan an Expand
    * (d× map-side rows, still one scan). That is the right trade for an
    * audit at test scale and the oracle needs it; at 100 TB pass
    * `exact = false` and the profile runs expand-free with the mergeable
    * HyperLogLog estimate (rsd 2%) as `n_distinct` instead.
    */
  def profile(df: DataFrame, cols: Seq[String] = Nil, rsd: Double = 0.02,
      hllTol: Double = 0.05, exact: Boolean = true): DataFrame = {
    val names = if (cols.nonEmpty) cols else df.columns.toSeq
    require(names.nonEmpty, "profile needs at least one column")
    val aggs = names.flatMap { c =>
      // distinct COUNTS run over the 64-bit hash of string columns, not
      // the raw value, so the distinct machinery (Expand copy + shuffle
      // + hash table) carries 8-byte keys instead of multi-KB text. At
      // sf0.1 this is ~10% (the scan and raw-value min/max dominate
      // there); the saving scales with value width × distinct count. The
      // count is identical up to xxhash64 collisions (~n²/2⁶⁵ — the same
      // accepted odds as the dedup family's hashed shingles); min/max
      // stay on the real values, which cost only per-partition compares.
      // xxhash64 is never null (a NULL input hashes to the seed), which
      // would silently count NULL as one more distinct value — keep the
      // null through the hash so count(distinct) skips it like the raw
      // column's would.
      Seq(count(col(c)).as(s"_nn_$c"),
        min(col(c).cast("string")).as(s"_min_$c"),
        max(col(c).cast("string")).as(s"_max_$c"))
    }
    // Round 19 (optimization): distinct counts run in their OWN aggregate
    // over a pre-hashed projection. A single agg mixing 4 countDistinct
    // with raw-value min/max plans an Expand that copies EVERY input row
    // once per distinct group — with the raw text column riding along,
    // that is a ~9× inflation of multi-KB values through the aggregate
    // (guide §2.3: keep payloads out of the wide path). Two narrow
    // aggregates (raw values only in the distinct-free one; 8-byte
    // hashes only in the Expand) produce the identical rows — measured
    // 4.8 s → 2.4 s at sf0.1, and the split is the right shape at any
    // scale. The split scans the input TWICE, so the audit's mutual
    // consistency (n_distinct ≤ n_rows etc.) assumes a deterministic,
    // stable input between the two jobs — true of every declared
    // consumer (parquet snapshots); profile a non-deterministic frame
    // through a checkpoint first.
    val dvs = names.map { c =>
      df.schema(c).dataType match {
        case org.apache.spark.sql.types.StringType =>
          when(col(c).isNotNull, xxhash64(col(c))).as(c)
        case _ => col(c).as(c)
      }
    }
    val hashed = df.select(dvs: _*)
    val dAggs = names.flatMap { c =>
      approx_count_distinct(col(c), rsd).as(s"_hll_$c") +:
        (if (exact) Seq(countDistinct(col(c)).as(s"_nd_$c")) else Nil)
    }
    // A STREAMING input cannot join two streaming aggregates (Complete
    // mode forbids it), so the streaming twin keeps the r18 single
    // aggregate — the Expand inflation the batch split avoids is
    // per-micro-batch there, bounded by the trigger, and the merged
    // audit is identical (StreamingSpec pins stream ≡ batch).
    val one =
      if (df.isStreaming) {
        val merged = names.flatMap { c =>
          val dv = df.schema(c).dataType match {
            case org.apache.spark.sql.types.StringType =>
              when(col(c).isNotNull, xxhash64(col(c)))
            case _ => col(c)
          }
          Seq(count(col(c)).as(s"_nn_$c"),
            approx_count_distinct(dv, rsd).as(s"_hll_$c"),
            min(col(c).cast("string")).as(s"_min_$c"),
            max(col(c).cast("string")).as(s"_max_$c")) ++
            (if (exact) Seq(countDistinct(dv).as(s"_nd_$c")) else Nil)
        }
        df.agg(count(lit(1)).as("_n"), merged: _*)
      } else df.agg(count(lit(1)).as("_n"), aggs: _*)
        .crossJoin(broadcast(hashed.agg(dAggs.head, dAggs.tail: _*)))
    val rows = names.map { c =>
      struct(lit(c).as("col_name"),
        col("_n").as("n_rows"),
        (col("_n") - col(s"_nn_$c")).as("n_nulls"),
        (if (exact) col(s"_nd_$c") else col(s"_hll_$c")).as("n_distinct"),
        col(s"_min_$c").as("min_val"),
        col(s"_max_$c").as("max_val"),
        (if (exact)
          abs(col(s"_hll_$c") - col(s"_nd_$c")) <= col(s"_nd_$c") * hllTol
         else lit(true)).as("hll_ok"))
    }
    one.select(explode(array(rows: _*)).as("p")).select("p.*")
  }

  /** Unigram-distribution drift between two corpus snapshots — the
    * yesterday-vs-today monitoring check that catches a scraper gone wrong
    * or a source-mix shift before a training run does. Emits the k most
    * drifted tokens.
    *
    * The drift score is the CROSS-MULTIPLIED frequency gap
    * `|count_a·total_b − count_b·total_a|` — proportional to
    * `|p_a − p_b|` (scaled by total_a·total_b) but computed entirely in
    * integers, so the ranking is exact and engine-replayable (a
    * floating-point |p_a−p_b| would hash-diverge on summation order).
    * Fits i64 while total_a·total_b < 2^63 (≈3e9 tokens per side); past
    * that, flip the final projection to double ratios — the plan shape is
    * unchanged.
    *
    * Shape at scale: one union scan with a side tag, one vocab-sized
    * shuffle (map-side combined counts), a broadcast one-row totals join,
    * and a TakeOrderedAndProject top-k (per-partition heads, no global
    * sort). Nothing corpus-sized crosses the wire after the token count.
    */
  def tokenDrift(a: DataFrame, b: DataFrame, k: Int = 20,
      textCol: String = "text"): DataFrame =
    // counts is consumed twice by the finisher (totals + the drift
    // projection); checkpoint the vocab-sized table so the corpus
    // union-scan runs once, not twice (the d_bm25 / d_unigram_lp
    // convention for model-then-score passes).
    driftFromCounts(
      sideTokenCounts(a, b, textCol).localCheckpoint(eager = false), k)

  /** Live (token, count_a, count_b) table for [[tokenDrift]] — one tagged
    * union scan into one vocab-sized grouped aggregate. A SINGLE
    * aggregation with two conditional sums, so it is also legal as a
    * streaming complete-mode aggregate (the streaming twin maintains this
    * state; see `StreamSessions.streamingTokenCounts`). */
  def sideTokenCounts(a: DataFrame, b: DataFrame,
      textCol: String = "text"): DataFrame =
    a.select(explode(tokens(col(textCol))).as("token"), lit(0).as("_side"))
      .unionAll(b.select(explode(tokens(col(textCol))).as("token"),
        lit(1).as("_side")))
      .groupBy(col("token")).agg(
        coalesce(sum(when(col("_side") === 0, 1L)), lit(0L)).as("count_a"),
        coalesce(sum(when(col("_side") === 1, 1L)), lit(0L)).as("count_b"))

  /** Drift ranking finisher over a [[sideTokenCounts]]-shaped table —
    * pure batch arithmetic on the vocab-sized counts (1-row totals
    * broadcast + top-k), shared by batch [[tokenDrift]] and the streaming
    * twin's sink-side scoring. */
  def driftFromCounts(counts: DataFrame, k: Int = 20): DataFrame = {
    require(k > 0, s"tokenDrift needs k > 0, got $k")
    val totals = broadcast(counts.agg(
      sum(col("count_a")).as("_ta"), sum(col("count_b")).as("_tb")))
    counts.crossJoin(totals)
      .select(col("token"), col("count_a"), col("count_b"),
        abs(col("count_a") * col("_tb") - col("count_b") * col("_ta"))
          .as("drift"))
      .orderBy(col("drift").desc, col("token")).limit(k)
  }

  /** Per-row DISPOSITION audit over a chain of progressively-filtered
    * survivor frames — the "where did my data go?" answer a 100 TB
    * pipeline run owes its operator: every input row is labeled with the
    * FIRST stage that dropped it (the stage label of the first survivor
    * set it is absent from), or `kept` if it survived the whole chain.
    *
    * `stages` is the ordered (label, survivors) list, each survivors
    * frame carrying `idCol`. Stages are expected to be nested (each a
    * subset of the previous — the natural shape of a filter chain); a
    * non-nested chain still labels by first absence, which may then skip
    * stages a row re-entered. Shape at scale: one left semi-ish join per
    * stage on the id projection (narrow keys), no stage's data columns
    * move; the stage frames a real pipeline already computed — this adds
    * bookkeeping joins, not recomputation.
    */
  def disposition(all: DataFrame, stages: Seq[(String, DataFrame)],
      idCol: String = "doc_id"): DataFrame = {
    require(stages.nonEmpty, "disposition needs at least one stage")
    require(stages.map(_._1).distinct.length == stages.length,
      s"duplicate stage labels: ${stages.map(_._1).mkString(", ")}")
    val base = all.select(col(idCol))
    val joined = stages.zipWithIndex.foldLeft(base) {
      case (acc, ((_, surv), i)) =>
        acc.join(surv.select(col(idCol)).distinct()
          .withColumn(s"_s$i", lit(1)), Seq(idCol), "left")
    }
    val label = stages.zipWithIndex.foldRight(lit("kept")) {
      case (((name, _), i), rest) => when(col(s"_s$i").isNull, name).otherwise(rest)
    }
    joined.select(col(idCol), label.as("disposition"))
  }

  /** Canonical text normalization (round 8) — the first step of every
    * ingest pipeline, pinned to an engine-portable form: lowercase,
    * collapse whitespace runs to one space, trim. An EXPLICIT character
    * class, not `\s` (the scrubPii regex discipline): Java's \s includes
    * vertical tab U+000B, RE2's does not, so `\s` would silently diverge
    * from the oracle on \x0B — the class below is identical in both
    * engines and the oracle replays it byte-for-byte. Pure projection:
    * streaming-legal, zero shuffle. */
  def normalizeText(text: Column): Column =
    trim(regexp_replace(lower(text), "[ \\t\\n\\u000B\\f\\r]+", " "))

  /** Vocabulary-coverage / OOV-rate statistics (round 8): the tokenizer-fit
    * health check a training pipeline runs before committing to a vocab —
    * what fraction of each document's tokens fall outside the top-`vocabSize`
    * corpus tokens? Vocab = the `vocabSize` most frequent tokens (ties break
    * token-ascending, so the cut is deterministic and engine-replayable);
    * per doc: total tokens, OOV tokens (with multiplicity), OOV fraction.
    *
    * Plan shape: one map-side-combined token-count groupBy, then a
    * TakeOrderedAndProject top-N for the vocab (distributed partial top-N
    * per partition, never a global sort of the token table), then one
    * broadcast left join of the exploded corpus against the ≤vocabSize-row
    * vocab and a per-doc re-aggregation. Two bounded shuffles; the corpus
    * is scanned twice (vocab fit + scoring) — for a fit-once model over
    * many frames or a stream, use [[fitVocab]]/[[oovAgainst]]. */
  def vocabCoverage(df: DataFrame, vocabSize: Int = 1000,
      idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    require(vocabSize > 0, s"vocabSize must be positive, got $vocabSize")
    val toks = df.select(col(idCol), explode(tokens(col(textCol))).as("tok"))
    val vocab = toks.groupBy("tok").agg(count(lit(1)).as("_n"))
      .orderBy(col("_n").desc, col("tok")).limit(vocabSize)
      .select(col("tok"), lit(1).as("_inv"))
    toks.join(broadcast(vocab), Seq("tok"), "left")
      .groupBy(idCol).agg(
        count(lit(1)).as("n_tokens"),
        sum(when(col("_inv").isNull, 1L).otherwise(0L)).as("n_oov"))
      .withColumn("oov_frac",
        col("n_oov").cast("double") / col("n_tokens").cast("double"))
  }

  /** Fit half of the [[vocabCoverage]] fit/apply split: the frozen top-N
    * vocab as a driver-side model (the same split [[graft.ops.Similarity
    * .fitWhitener]] gives the whitener) — fit once on the reference corpus,
    * then score any frame, including a STREAM, with [[oovAgainst]]. The
    * collect is bounded by `vocabSize` (a tokenizer vocab, 10^4-10^5), not
    * the corpus. */
  def fitVocab(df: DataFrame, vocabSize: Int = 1000,
      textCol: String = "text"): Seq[String] = {
    require(vocabSize > 0, s"vocabSize must be positive, got $vocabSize")
    df.select(explode(tokens(col(textCol))).as("tok"))
      .groupBy("tok").agg(count(lit(1)).as("_n"))
      .orderBy(col("_n").desc, col("tok")).limit(vocabSize)
      .select("tok").collect().map(_.getString(0)).toSeq
  }

  /** Apply half: OOV stats against a FROZEN vocab, as a pure per-row
    * projection — no join, no shuffle, streaming-legal unchanged (the
    * vocab rides as an array literal; each token is one array_contains
    * probe). Same output columns as [[vocabCoverage]], which is provably
    * fitVocab + oovAgainst over the same input (Round8OpsSpec). O(tokens ×
    * vocab) per row — fine to ~10^4 vocab entries; past that, prefer the
    * joining [[vocabCoverage]] on batch, or pre-tokenized bloom probes. */
  def oovAgainst(df: DataFrame, vocab: Seq[String],
      idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    val v = typedLit(vocab)
    val t = tokens(col(textCol))
    df.select(col(idCol),
        size(t).cast("long").as("n_tokens"),
        size(filter(t, tok => !array_contains(v, tok))).cast("long").as("n_oov"))
      .withColumn("oov_frac",
        col("n_oov").cast("double") / col("n_tokens").cast("double"))
  }

  /** Content-defined chunking (round 8) — rolling-window hash boundaries in
    * the style of storage-dedup CDC (Muthitacharoen et al., SOSP'01 LBFS;
    * gear/FastCDC refine the same idea): cut after token position `e` when
    * the xxhash64 of the `w`-token window ending at `e` has its `maskBits`
    * low bits zero, subject to min/max chunk bounds (a candidate inside
    * `minSize` tokens of the last cut is skipped; `maxSize` forces a cut).
    * Unlike [[chunks]]' fixed stride, boundaries are CONTENT-anchored: an
    * insertion early in a document shifts every fixed-stride chunk after it,
    * but CDC boundaries resynchronize within one expected chunk length —
    * which is what makes chunk-level dedup across near-identical documents
    * work. Expected chunk size ≈ 2^maskBits + w tokens.
    *
    * Emits (id, chunk_id, n_tokens, chunk_md5) — [[chunks]]' narrow output
    * contract. The boundary fold is per-document LOCAL (a left-to-right
    * aggregate over the token index array inside the projection): pure
    * scan + explode, no shuffle at any scale, and chunk counts are bounded
    * by construction (n/minSize per doc). */
  def cdcChunks(df: DataFrame, w: Int = 4, maskBits: Int = 4,
      minSize: Int = 8, maxSize: Int = 64,
      idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    require(w > 0, s"window must be positive, got $w")
    require(maskBits >= 0 && maskBits < 63, s"maskBits out of range: $maskBits")
    require(minSize > 0 && minSize <= maxSize,
      s"need 0 < minSize <= maxSize, got minSize=$minSize maxSize=$maxSize")
    // Boundaries via the native codegen'd CdcBoundaries expression — one
    // tight loop per row, same chained window hash as the shingle family
    // (a CDC cut and a span key agree on window identity). The builtin
    // fold it replaced ([[cdcBoundariesFold]], kept for the bit-identity
    // spec) is interpreted per HOF step and measured 4-20× slower
    // depending on how projection collapse inlines the candidate array.
    df.select(col(idCol), tokens(col(textCol)).as("_t"))
      .withColumn("_b", graft.functions.GraftFunctions.cdcBoundaries(
        col("_t"), w, maskBits, minSize, maxSize))
      .select(col(idCol), col("_t"), col("_b"),
        posexplode(col("_b")).as(Seq("_j", "_e")))
      .withColumn("_s",
        when(col("_j") === 0, lit(0)).otherwise(element_at(col("_b"), col("_j"))))
      .select(col(idCol), col("_j").cast("long").as("chunk_id"),
        (col("_e") - col("_s")).cast("long").as("n_tokens"),
        md5(concat_ws(" ", slice(col("_t"), col("_s") + 1, col("_e") - col("_s")))
          .cast("binary")).as("chunk_md5"))
  }

  /** The CDC payoff composition: per-document shared-chunk statistics —
    * how much of each doc's content is duplicated elsewhere in the corpus
    * at CHUNK granularity (the storage-dedup / near-identical-doc-family
    * measurement content-defined boundaries exist for; fixed-stride chunks
    * under-count it because one early edit de-syncs every later chunk).
    * Output per doc over DISTINCT chunk contents (a doc internally
    * repeating its own chunk is not "shared"): n_chunks, n_shared (chunk
    * contents held by ≥2 distinct docs), shared_frac.
    *
    * Scale shape: distinct (doc, chunk_md5) pairs, then a map-side-
    * combined groupBy on chunk_md5 for the distinct-doc frequency — a
    * boilerplate chunk shared by 10^8 docs is a mergeable count, never a
    * window partition (the whale-key discipline) — joined back on
    * chunk_md5 (1-row build side per key; AQE splits the whale probe
    * partition), one per-doc re-aggregation. */
  def cdcSharedChunkStats(df: DataFrame, w: Int = 4, maskBits: Int = 4,
      minSize: Int = 8, maxSize: Int = 64,
      idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    val pairs = cdcChunks(df, w, maskBits, minSize, maxSize, idCol, textCol)
      .select(col(idCol), col("chunk_md5")).distinct()
    val freq = pairs.groupBy("chunk_md5").agg(count(lit(1)).as("_docs"))
    pairs.join(freq, "chunk_md5")
      .groupBy(idCol).agg(
        count(lit(1)).as("n_chunks"),
        sum(when(col("_docs") > 1, 1L).otherwise(0L)).as("n_shared"))
      .withColumn("shared_frac",
        col("n_shared").cast("double") / col("n_chunks").cast("double"))
  }

  /** The builtin-composed boundary fold [[cdcChunks]] replaced — kept for
    * the bit-identity spec (Round8OpsSpec: same cut positions as the
    * native expression on dense token arrays). Candidate hashes use
    * `xxhash64(slice(...))` — Catalyst's array hash chains XXH64 across
    * the window's elements with seed 42, exactly the native
    * `VectorOps.windowHash`. The fold consumes the candidate ARRAY
    * directly, carrying the position in the accumulator — an
    * element_at(_c, e) per step would let projection collapse inline the
    * whole transform() and re-evaluate all n window hashes at every step:
    * O(n²) interpreted evaluations per document (measured 31.5 s for 500
    * sf0.001 docs vs ~1.5 s for this shape, vs ~sub-second native). */
  private[graft] def cdcBoundariesFold(t: Column, w: Int, maskBits: Int,
      minSize: Int, maxSize: Int): Column = {
    import org.apache.spark.sql.functions.{size => asize}
    val modulus = 1L << maskBits
    val n = asize(t)
    // n = 0 guard: sequence(1, 0) steps DOWN ([1, 0]) in Spark, which
    // would feed the fold two phantom positions — an empty array must
    // yield no boundaries, matching the native expression. A NULL array
    // must stay NULL (the native expression is null-safe), so only the
    // EXPLICIT n = 0 case maps to empty; NULL n falls through to NULL.
    val cands = when(n >= 1,
      transform(sequence(lit(1), n), e =>
        e >= w && pmod(xxhash64(slice(t, e - w + 1, lit(w))),
          lit(modulus)) === 0))
      .when(n === 0, array().cast("array<boolean>"))
    aggregate(
      cands,
      struct(lit(0).as("pos"), lit(0).as("last"),
        array().cast("array<int>").as("bnds")),
      (acc, c) => {
        val e = acc.getField("pos") + 1
        val len = e - acc.getField("last")
        val cut = (len >= minSize && c) || len >= maxSize
        struct(e.cast("int").as("pos"),
          when(cut, e.cast("int")).otherwise(acc.getField("last")).as("last"),
          when(cut, concat(acc.getField("bnds"), array(e.cast("int"))))
            .otherwise(acc.getField("bnds")).as("bnds"))
      },
      acc => when(acc.getField("last") === acc.getField("pos"),
          acc.getField("bnds"))
        .otherwise(concat(acc.getField("bnds"),
          array(acc.getField("pos").cast("int")))))
  }

  private def validateMix(weights: Map[String, Double], budget: Long): Unit = {
    require(weights.nonEmpty, "mixPlan needs at least one weighted source")
    require(budget >= 0, s"budget must be non-negative, got $budget")
    require(weights.valuesIterator.forall(_ >= 0.0),
      s"mixPlan weights must be non-negative, got " +
      weights.filter(_._2 < 0.0).mkString(", "))
    val wSum = weights.valuesIterator.sum
    require(math.abs(wSum - 1.0) < 1e-9,
      s"mixPlan weights must sum to 1 (got $wSum) — declare the mixture " +
      "normalized; pick binary fractions (0.5, 0.25, ...) for " +
      "engine-replayable arithmetic")
  }
}
