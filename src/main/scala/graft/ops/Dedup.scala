package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deduplication operators for training-data pipelines, each designed
  * around the join/shuffle shape that survives 100 TB:
  *
  *  - exact: hash-groupBy — one shuffle on the content hash.
  *  - n-gram Jaccard: inverted-index self-join (docs only meet if they share
  *    a shingle) — never a cross join.
  *  - MinHash+LSH: signature → band buckets → bucket join — candidate pairs
  *    scale with collisions, not n².
  *  - SimHash: 64-bit signature + banding on signature bytes.
  *  - embedding cosine: blocked pairwise with norm pre-aggregation.
  */
object Dedup {

  /** Exact dedup: group by content hash; survivor = lowest id.
    * Output: one row per distinct content with copy count. */
  def exactGroups(df: DataFrame, textCol: String = "text",
      idCol: String = "doc_id"): DataFrame =
    df.groupBy(md5(col(textCol).cast("binary")).as("content_hash"))
      .agg(min(col(idCol)).as("keep_id"), count(lit(1)).as("n_copies"))

  /** Exact dedup: keep one row per distinct content (the min-id survivor).
    * Round 6: min-aggregate + semi-join, not a per-hash window — a
    * 10^8-copy document is a whale hash key, and the `row_number` window
    * this replaces funneled every copy into ONE task; `min(id)` partial-
    * aggregates (bounded shuffle: one (hash, id) pair per partition per
    * hash), and the semi-join keeps exactly the same survivor rows.
    * NULL-text rows hash to a null key: the null-safe (`<=>`) join keeps
    * their min-id survivor like the window did (null was just another
    * partition key there), and the trailing (hash, id) dropDuplicates
    * collapses physically-duplicated survivor rows (same id AND text
    * ingested twice) exactly as the window's rank-1 filter did. */
  def exactDedup(df: DataFrame, textCol: String = "text",
      idCol: String = "doc_id"): DataFrame = {
    val withH = df.withColumn("_h", md5(col(textCol).cast("binary")))
    val keep = withH.groupBy(col("_h")).agg(min(col(idCol)).as("_kid"))
      .withColumnRenamed("_h", "_kh")
    withH.join(keep,
        col("_h") <=> col("_kh") && col(idCol) === col("_kid"), "left_semi")
      .dropDuplicates("_h", idCol).drop("_h")
  }

  /** Exact n-gram Jaccard near-dup pairs via inverted index:
    * shingle → docs sharing it → per-pair shared-shingle counts →
    * J = shared / (|A| + |B| - shared). No cross join: only doc pairs that
    * share at least one shingle are ever materialized.
    */
  def ngramJaccardPairs(df: DataFrame, k: Int = 3, threshold: Double = 0.5,
      textCol: String = "text", idCol: String = "doc_id"): DataFrame = {
    // the same domain containmentPairsPrefix enforces — threshold 0 would
    // return every co-occurring pair (the quadratic blowup these ops
    // exist to bound)
    require(threshold > 0 && threshold <= 1,
      s"threshold must be in (0, 1], got $threshold")
    sharedShingleCounts(df, k, textCol, idCol)
      .withColumn("jaccard",
        col("shared").cast("double") / (col("sz_a") + col("sz_b") - col("shared")))
      .filter(col("jaccard") >= threshold)
      .select("id_a", "id_b", "shared", "sz_a", "sz_b", "jaccard")
  }

  /** Asymmetric CONTAINMENT near-dup pairs (round 8): C = shared /
    * min(|S_a|, |S_b|) over distinct k-shingle sets — the
    * doc-inside-a-doc detector. Symmetric Jaccard misses a short document
    * embedded verbatim in a much longer one (the union is dominated by the
    * long doc, so J ≈ |short|/|long| → 0 while containment = 1); quote
    * farms, boilerplate-wrapped reposts, and concatenated dumps are
    * exactly this shape. Same inverted-index blocking as
    * [[ngramJaccardPairs]] — only co-occurring shingles join, never
    * all-pairs. */
  def containmentPairs(df: DataFrame, k: Int = 3, threshold: Double = 0.8,
      textCol: String = "text", idCol: String = "doc_id"): DataFrame = {
    // containmentPairsPrefix's validated domain — the "provably
    // identical" claim must hold over the SAME inputs
    require(threshold > 0 && threshold <= 1,
      s"threshold must be in (0, 1], got $threshold")
    sharedShingleCounts(df, k, textCol, idCol)
      .withColumn("containment",
        col("shared").cast("double") / least(col("sz_a"), col("sz_b")))
      .filter(col("containment") >= threshold)
      .select("id_a", "id_b", "shared", "sz_a", "sz_b", "containment")
  }

  /** EXACT containment pairs via the prefix filter (the set-similarity-join
    * bound of Chaudhuri et al., ICDE'06 / Xiao et al., WWW'08) — the
    * 100 TB path for [[containmentPairs]], same output, PROVABLY identical
    * (spec-enforced equality, no recall floor):
    *
    * Index only each doc's p = ⌊(1−t)·sz⌋+1 RAREST shingles (global order
    * = (corpus doc-frequency, hash) — any fixed order preserves the bound;
    * rare-first makes prefixes avoid boilerplate shingles). If
    * C(A,B) = |A∩B|/|A| ≥ t with A the smaller side, B misses at most
    * (1−t)·|A| of A's shingles, so it must HIT one of A's p prefix
    * shingles — probing every doc's full shingle stream against the
    * prefix index yields a guaranteed candidate superset, then exact
    * verification over the full shingle-hash arrays touches candidates
    * only. The inverted-index self-join this replaces fans out
    * quadratically on EVERY co-occurring shingle; here the fan-out is
    * full-stream × prefix, and prefixes prefer the corpus' rarest keys. */
  def containmentPairsPrefix(df: DataFrame, k: Int = 3, threshold: Double = 0.8,
      textCol: String = "text", idCol: String = "doc_id"): DataFrame = {
    require(threshold > 0.0 && threshold <= 1.0,
      s"threshold $threshold not in (0,1]")
    val sets = df.select(col(idCol).as("id"),
      TextAnalysis.shingleHashes(col(textCol), k).as("shs")).localCheckpoint()
    val ex = sets.select(col("id"), explode(col("shs")).as("shingle"))
    val dfreq = ex.groupBy("shingle").agg(count(lit(1)).as("_df"))
    // rare-first per-doc order: collect (df, shingle) per doc (bounded by
    // doc length — the per-doc-local convention), sort, slice the prefix.
    val ordered = ex.join(dfreq, "shingle")
      .groupBy("id").agg(
        sort_array(collect_list(struct(col("_df"), col("shingle")))).as("_ord"),
        count(lit(1)).as("_sz"))
    // Integer-exact prefix size: a pair at containment ≥ t with smaller
    // side A (|A| = sz) shares ≥ ⌈t·sz⌉ shingles, so B misses ≤ sz−⌈t·sz⌉
    // of them and the prefix needs sz−⌈t·sz⌉+1 entries. Computing
    // ⌊(1−t)·sz⌋+1 in doubles under-sizes it by one when (1−t)·sz is a
    // mathematical integer (t=0.9, sz=10 → 0.9999999999999998, floor 0);
    // the ε guard inside ceil makes t·sz-integer cases land exactly.
    val prefix = ordered.select(col("id").as("pid"),
        explode(slice(col("_ord"), lit(1),
          (col("_sz") - ceil(lit(threshold) * col("_sz") - lit(1e-9)) + 1)
            .cast("int"))).as("_pe"))
      .select(col("pid"), col("_pe").getField("shingle").as("shingle"))
    val cands = ex.select(col("id").as("qid"), col("shingle"))
      .join(prefix, "shingle")
      .filter(col("qid") =!= col("pid"))
      .select(least(col("qid"), col("pid")).as("id_a"),
        greatest(col("qid"), col("pid")).as("id_b"))
      .distinct()
    cands
      .join(sets.select(col("id").as("id_a"), col("shs").as("_sha")), "id_a")
      .join(sets.select(col("id").as("id_b"), col("shs").as("_shb")), "id_b")
      .withColumn("shared",
        size(array_intersect(col("_sha"), col("_shb"))).cast("long"))
      .withColumn("sz_a", size(col("_sha")).cast("long"))
      .withColumn("sz_b", size(col("_shb")).cast("long"))
      .withColumn("containment",
        col("shared").cast("double") / least(col("sz_a"), col("sz_b")))
      .filter(col("containment") >= threshold)
      .select("id_a", "id_b", "shared", "sz_a", "sz_b", "containment")
  }

  /** Shared-shingle pair counts — the blocked self-join behind
    * [[ngramJaccardPairs]] and [[containmentPairs]]: (id_a < id_b, shared
    * distinct-shingle count, both set sizes).
    *
    * 64-bit hashed shingles, not strings: the exploded inverted index and
    * its self-join carry 8-byte keys instead of ~25-char strings (2-3× on
    * shuffle volume and join compares). Counts are identical to the
    * string form unless xxhash64 collides within the corpus shingle set
    * (birthday bound ~n²/2⁶⁵ — ~1e-8 at 10⁶ distinct shingles). */
  private def sharedShingleCounts(df: DataFrame, k: Int,
      textCol: String, idCol: String): DataFrame = {
    val sh = df.select(col(idCol).as("id"),
        explode(TextAnalysis.shingleHashes(col(textCol), k)).as("shingle"))
    val sizes = sh.groupBy("id").agg(count(lit(1)).as("sz"))
    // A shingle held by exactly one doc can't produce a pair — dropping
    // doc-frequency-1 shingles shrinks the quadratic join's input without
    // changing any pair count. Window-count over the shingle partitioning
    // (not a groupBy+semi-join) so the downstream self-join inherits the
    // same hash partitioning and plans no additional Exchange.
    val wSh = Window.partitionBy("shingle")
    val shF = sh.withColumn("_df", count(lit(1)).over(wSh))
      .filter(col("_df") > 1).drop("_df")
    // Merge-join hint, twice deliberate: (a) the shingle table scales WITH
    // the corpus — AQE would happily broadcast it at test scale and that
    // plan shape dies at 100 TB; (b) both sides are the same subplan
    // already hash-partitioned+sorted by shingle from the window above, so
    // SMJ plans a ReusedExchange — the explode+window chain is computed
    // once, not once per side (broadcast re-evaluates it for the build).
    val pairs = shF.as("a").hint("merge").join(shF.as("b").hint("merge"),
        col("a.shingle") === col("b.shingle") && col("a.id") < col("b.id"))
      .groupBy(col("a.id").as("id_a"), col("b.id").as("id_b"))
      .agg(count(lit(1)).as("shared"))
    pairs
      .join(sizes.withColumnRenamed("id", "id_a").withColumnRenamed("sz", "sz_a"), "id_a")
      .join(sizes.withColumnRenamed("id", "id_b").withColumnRenamed("sz", "sz_b"), "id_b")
  }

  /** Modulus and (a_i, b_i) permutation parameters: ONE definition,
    * [[graft.functions.MinHashParams]] — this aggregate formulation must
    * stay bit-identical to the native [[graft.functions.MinHashSig]]
    * expression (spec-enforced), and a constant typo fixed in one copy of
    * the splitmix derivation but not the other would silently break that
    * equivalence. */
  private val P = graft.functions.MinHashParams.P

  /** MinHash signature, computed by the native [[graft.functions.MinHashSig]]
    * expression: one pass over each doc's shingle-hash array INSIDE the scan
    * projection — zero shuffle (the old explode + numHashes-min-aggregate
    * formulation shuffled every exploded shingle row; kept as
    * [[minhashSignatureAgg]] for the equivalence spec).
    * Output: (id, minhash: array<long>).
    */
  def minhashSignature(df: DataFrame, numHashes: Int = 128, k: Int = 3,
      textCol: String = "text", idCol: String = "doc_id"): DataFrame =
    df.select(col(idCol).as("id"),
      graft.functions.GraftFunctions.minhashSig(
        TextAnalysis.shingleHashes(col(textCol), k), numHashes).as("minhash"))

  /** The aggregate formulation [[minhashSignature]] replaced: k-shingles
    * hashed once with xxhash64 (exploded so projection collapse cannot
    * inline the hash into every permutation), then numHashes affine
    * permutations as min aggregates with map-side partial combine. Must
    * stay bit-identical to the native expression (spec-enforced). */
  def minhashSignatureAgg(df: DataFrame, numHashes: Int = 128, k: Int = 3,
      textCol: String = "text", idCol: String = "doc_id"): DataFrame = {
    val sh = df.select(col(idCol).as("id"),
        explode(TextAnalysis.shingleHashes(col(textCol), k)).as("_sh"))
      .withColumn("_h", pmod(col("_sh"), lit(P)))
    val aggs = (0 until numHashes).map { i =>
      val a = graft.functions.MinHashParams.a(i)
      val b = graft.functions.MinHashParams.b(i)
      min(pmod(lit(a) * col("_h") + lit(b), lit(P))).as(s"_m$i")
    }
    sh.groupBy("id").agg(aggs.head, aggs.tail: _*)
      .select(col("id"),
        array((0 until numHashes).map(i => col(s"_m$i")): _*).as("minhash"))
  }

  /** LSH banding over MinHash signatures: split the signature into `bands`
    * bands of numHashes/bands rows, hash each band, and emit
    * (band_id, band_hash) bucket keys. Candidate pairs = docs sharing a
    * bucket — the standard S-curve trade-off (Leskovec et al., MMDS ch.3).
    */
  /** (id, band, bucket) LSH keys for a signature table — the shared
    * bucketing step of the self-join candidates and the cross-collection
    * [[fuzzyDecontaminate]]. Explode the band index FIRST, then hash the
    * signature slice per exploded row: the Generate node is a
    * projection-collapse barrier, so the (expensive) native signature
    * evaluates once per DOC in its child — a transform-lambda formulation
    * would let CollapseProject inline it into the lambda body and
    * recompute it once per BAND (the round-1 660s-class trap). */
  private def lshBuckets(sig: DataFrame, bands: Int, rows: Int): DataFrame =
    sig
      .select(col("id"), col("minhash"),
        explode(sequence(lit(0), lit(bands - 1))).as("band"))
      .select(col("id"), col("band"), bandBucket(col("minhash"), col("band"), rows))

  /** The band-bucket key expression shared by every LSH consumer (self-join
    * candidates, cross-collection decontamination, and the streaming twin —
    * one definition so the bucket hashes can never drift apart). */
  private[graft] def bandBucket(minhash: Column, band: Column, rows: Int): Column =
    xxhash64(concat_ws(",",
      transform(slice(minhash, band * rows + 1, lit(rows)),
        _.cast("string"))),
      band.cast("string")).as("bucket")

  def minhashLshCandidates(df: DataFrame, numHashes: Int = 128, bands: Int = 32,
      k: Int = 3, textCol: String = "text", idCol: String = "doc_id"): DataFrame = {
    // same contract fuzzyDecontaminate and the streaming twin enforce:
    // bands > numHashes makes every band slice empty (ONE global bucket —
    // the quadratic cross join LSH exists to avoid), and a non-dividing
    // bands silently ignores the trailing hashes (a different S-curve
    // than requested)
    require(bands >= 1 && numHashes % bands == 0,
      s"numHashes ($numHashes) must be a positive multiple of bands ($bands)")
    val rows = numHashes / bands
    // Materialize the signature table once (docs × numHashes longs — tiny
    // relative to the corpus): the bucket self-join consumes it on both
    // sides, and with the zero-shuffle native signature there is no
    // shuffle stage for AQE to reuse, so without this the signature pass
    // would run once per join side.
    val sig = minhashSignature(df, numHashes, k, textCol, idCol).localCheckpoint()
    val buckets = lshBuckets(sig, bands, rows)
    buckets.as("a").join(buckets.as("b"),
        col("a.band") === col("b.band") && col("a.bucket") === col("b.bucket") &&
          col("a.id") < col("b.id"))
      .select(col("a.id").as("id_a"), col("b.id").as("id_b")).distinct()
  }

  /** MinHash-LSH near-dup pairs, verified: LSH candidates filtered by exact
    * n-gram Jaccard ≥ threshold. Verification touches ONLY candidate pairs
    * (shingle sets joined to the candidate list — never the full inverted
    * index, which would defeat the purpose of LSH at scale). */
  def minhashDedupPairs(df: DataFrame, threshold: Double = 0.8,
      numHashes: Int = 128, bands: Int = 32, k: Int = 3,
      textCol: String = "text", idCol: String = "doc_id"): DataFrame = {
    val cands = minhashLshCandidates(df, numHashes, bands, k, textCol, idCol)
    // Verify over hashed shingle sets (64-bit, collision-negligible) —
    // string shingles would re-materialize every concat for the whole
    // corpus on both sides of the join.
    val sets = df.select(col(idCol).as("sid"),
      TextAnalysis.shingleHashes(col(textCol), k).as("shs"))
    jaccardAtLeast(cands
        .join(sets.select(col("sid").as("id_a"), col("shs").as("sh_a")), "id_a")
        .join(sets.select(col("sid").as("id_b"), col("shs").as("sh_b")), "id_b"),
        col("sh_a"), col("sh_b"), threshold)
      .select("id_a", "id_b", "jaccard")
  }

  /** The exact hashed-shingle Jaccard verify shared by
    * [[minhashDedupPairs]] and [[fuzzyDecontaminate]] — ONE definition of
    * the recall contract's predicate (the [[bandBucket]] discipline: the
    * self-join and cross-corpus variants must never drift apart). Appends
    * `shared` and `jaccard` from two shingle-set columns, keeps rows at
    * or above `threshold`. */
  private def jaccardAtLeast(df: DataFrame, shA: Column, shB: Column,
      threshold: Double): DataFrame =
    df.withColumn("shared", size(array_intersect(shA, shB)).cast("long"))
      .withColumn("jaccard", col("shared").cast("double") /
        (size(shA) + size(shB) - col("shared")))
      .filter(col("jaccard") >= threshold)

  /** Connected components over a near-dup pair list — the step that turns
    * pairwise matches into dedup CLUSTERS (keep one doc per component).
    *
    * Min-label propagation with pointer jumping: every node starts labeled
    * with its own id; each round every node takes the min label among
    * itself and its neighbors, then follows one extra hop through the label
    * table (comp := comp(comp)) — the pointer-jump halves the effective
    * diameter each round, so even a pure path graph of diameter D converges
    * in O(log D) rounds (vs O(D) for plain propagation; same idea as the
    * alternating-star CC of Kiveris et al., SOCC'14). Each round is three
    * shuffles (neighbor-min aggregation, label join, jump join); lineage is
    * cut per round with localCheckpoint so the plan doesn't grow
    * unboundedly. Convergence = zero labels changed in a round, detected by
    * a count over the checkpointed round output — works for ANY orderable
    * id type (a label-sum check would cast string ids to null / lose
    * precision near 2^63). Non-convergence within maxIter throws rather
    * than silently returning a partial labeling.
    *
    * Adaptive execution: a verified near-dup pair list is orders of
    * magnitude smaller than the corpus (that is the point of LSH), so when
    * the symmetric edge list fits the driver — BOTH ≤ `driverEdgeLimit`
    * rows AND ≤ `driverEdgeBytesLimit` estimated bytes (string ids can make
    * 5M rows gigabytes; the byte probe is one agg over the checkpointed
    * edges) — a single-pass union-find replaces the distributed rounds.
    * Beyond the limit, distributed propagation runs; both paths produce the
    * identical min-id-per-component labeling (property-tested on random
    * and path graphs in OpsSpec).
    *
    * Input: pairs with (aCol, bCol). Output: (id, cluster_id) for every id
    * appearing in any pair; cluster_id = min id of the component. */
  def connectedComponents(pairs: DataFrame, aCol: String = "id_a",
      bCol: String = "id_b", maxIter: Int = 50,
      driverEdgeLimit: Long = 5000000L,
      driverEdgeBytesLimit: Long = 256L << 20): DataFrame = {
    // Symmetrize with ONE pass via explode — a union of (a→b) and (b→a)
    // branches would evaluate the (expensive) pair subplan once per branch.
    // Eager checkpoint: the edge list is consumed by at least two actions
    // (size probe + either collect or per-round joins); materialize once.
    val edges = pairs.select(explode(array(
        struct(col(aCol).as("src"), col(bCol).as("dst")),
        struct(col(bCol).as("src"), col(aCol).as("dst")))).as("e"))
      .select(col("e.src"), col("e.dst")).distinct().localCheckpoint()
    // Driver-bytes estimate: collected GenericRow + boxed values. For
    // string ids add the actual UTF-8 payload; fixed ~48B/row overhead
    // covers the numeric-id case.
    val perRowBytes = edges.schema.head.dataType match {
      case org.apache.spark.sql.types.StringType =>
        lit(80L) + octet_length(col("src")) + octet_length(col("dst"))
      case _ => lit(48L)
    }
    val probe = edges.agg(count(lit(1)).as("n"),
      coalesce(sum(perRowBytes.cast("long")), lit(0L)).as("bytes")).head()
    if (probe.getLong(0) <= driverEdgeLimit && probe.getLong(1) <= driverEdgeBytesLimit)
      return unionFindComponents(pairs.sparkSession, edges)
    var labels = edges.select(col("src").as("id")).distinct()
      .withColumn("comp", col("id")).localCheckpoint()
    var round = 0
    var converged = false
    while (round < maxIter && !converged) {
      val nbrMin = edges
        .join(labels.select(col("id").as("dst"), col("comp")), Seq("dst"))
        .groupBy(col("src").as("id")).agg(min("comp").as("nbr"))
      val stepped = labels.join(nbrMin, Seq("id"), "left")
        .select(col("id"), col("comp").as("_prev"),
          least(col("comp"), coalesce(col("nbr"), col("comp"))).as("_c1"))
      // Pointer jump: a label is itself a node id, so follow it one hop
      // through the label table. Labels only ever decrease (least with the
      // previous value), so the jump preserves the min-id fixpoint.
      val next = stepped
        .join(labels.select(col("id").as("_c1"), col("comp").as("_cj")),
          Seq("_c1"), "left")
        .select(col("id"), col("_prev"),
          least(col("_c1"), coalesce(col("_cj"), col("_c1"))).as("comp"))
        .localCheckpoint()
      val changed = next.filter(col("comp") =!= col("_prev")).count()
      labels = next.select("id", "comp")
      round += 1
      converged = changed == 0L
    }
    if (!converged) throw new IllegalStateException(
      s"connectedComponents: no convergence after $maxIter pointer-jump " +
        "rounds — component diameter exceeds 2^maxIter, which indicates a " +
        "degenerate input graph")
    labels.select(col("id"), col("comp").as("cluster_id"))
  }

  /** Driver-side path-compressed union-find over a collected symmetric edge
    * list; returns the same (id, cluster_id = min id of component) labeling
    * as the distributed rounds. Ids must be Comparable (long/int/string). */
  private def unionFindComponents(spark: org.apache.spark.sql.SparkSession,
      edges: DataFrame): DataFrame = {
    import scala.collection.mutable
    val parent = mutable.HashMap.empty[Any, Any]
    def find(x: Any): Any = {
      var r = x
      while (parent.getOrElse(r, r) != r) r = parent.getOrElse(r, r)
      var c = x // path compression
      while (parent.getOrElse(c, c) != c) { val n = parent(c); parent(c) = r; c = n }
      r
    }
    val collected = edges.collect()
    collected.foreach { row =>
      val (ra, rb) = (find(row.get(0)), find(row.get(1)))
      if (ra != rb) parent(rb) = ra
    }
    // string ids must compare exactly like the distributed rounds' min()
    // — Spark orders strings by UTF-8 bytes (code-point order), while
    // java.lang.String.compareTo is UTF-16 code-unit order; the two
    // disagree on supplementary-plane characters, and the path taken
    // here is chosen by edge-list SIZE, so the crowned cluster_id (and
    // the keep-one-per-cluster survivor) must not depend on corpus scale
    def lt(x: Any, y: Any): Boolean = (x, y) match {
      case (a: String, b: String) =>
        org.apache.spark.unsafe.types.UTF8String.fromString(a)
          .compareTo(org.apache.spark.unsafe.types.UTF8String.fromString(b)) < 0
      case _ => x.asInstanceOf[Comparable[Any]].compareTo(y) < 0
    }
    val minOf = mutable.HashMap.empty[Any, Any]
    val nodes = collected.iterator.flatMap(r => Iterator(r.get(0), r.get(1))).toSet
    nodes.foreach { n =>
      val r = find(n)
      if (!minOf.contains(r) || lt(n, minOf(r))) minOf(r) = n
    }
    val idType = edges.schema.fields.head.dataType
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("id", idType),
      org.apache.spark.sql.types.StructField("cluster_id", idType)))
    val out = nodes.toSeq.map(n =>
      org.apache.spark.sql.Row(n, minOf(find(n))))
    spark.createDataFrame(spark.sparkContext.parallelize(out, 1), schema)
  }

  /** Full-corpus dedup clustering: every doc gets a cluster_id (docs in no
    * pair are their own singleton cluster). Downstream keep-one-per-cluster
    * is `filter(col(idCol) === col("cluster_id"))`. */
  def dedupClusters(df: DataFrame, pairs: DataFrame,
      idCol: String = "doc_id"): DataFrame = {
    val comps = connectedComponents(pairs)
    df.select(col(idCol)).distinct()
      .join(comps.withColumnRenamed("id", idCol), Seq(idCol), "left")
      .select(col(idCol),
        coalesce(col("cluster_id"), col(idCol)).as("cluster_id"))
  }

  /** Leakage-safe train/eval split (round 8): the split side is decided by
    * DEDUP CLUSTER, not by document, so every near-duplicate of a doc
    * lands on the SAME side — a doc-level hash split lets two copies of
    * one document straddle the cut, and the eval set then "holds out"
    * text the model trained on (the leakage mode decontamination papers
    * measure; splitting by cluster removes it by construction rather than
    * by after-the-fact scrubbing). `clusters` is any (idCol, cluster_id)
    * labeling (e.g. [[dedupClusters]]); docs absent from it are their own
    * singleton cluster. Side = the same md5 hash rule as the library's
    * other samplers, applied to the CLUSTER id — deterministic,
    * engine-replayable, order/partitioning-independent.
    *
    * Scale shape: one id join (labels are a narrow (id, cluster) frame) +
    * a pure projection; no window, no per-cluster shuffle. */
  def clusterSafeSplit(df: DataFrame, clusters: DataFrame, evalFrac: Double,
      idCol: String = "doc_id", clusterCol: String = "cluster_id"): DataFrame = {
    require(evalFrac >= 0.0 && evalFrac <= 1.0,
      s"evalFrac $evalFrac not in [0,1]")
    df.join(clusters.select(col(idCol), col(clusterCol)), Seq(idCol), "left")
      .withColumn(clusterCol, coalesce(col(clusterCol), col(idCol)))
      .withColumn("split",
        when(TextAnalysis.hashSample(col(clusterCol).cast("string"), evalFrac),
          lit("eval")).otherwise(lit("train")))
  }

  /** Canonical selection: keep ONE row per dedup cluster — the
    * highest-scoring member (quality, length, recency...), tie-broken by
    * lowest id. The keep-policy real pipelines use instead of
    * [[dedupClusters]]' min-id convention. `clusters` is the
    * (id, cluster_id) labeling from [[dedupClusters]].
    *
    * Scale shape (round 6): one join of the corpus to its labels on id,
    * then the per-cluster argmax as a min-aggregate over
    * `struct(−score, id)` + an id filter — partial aggregation bounds the
    * shuffle at one pair per partition per cluster. Clusters are
    * near-singleton post-dedup, but an all-duplicate corpus produces ONE
    * whale cluster (the 16× alldup ladder's exact shape) and the
    * per-cluster `row_number` window this replaces funneled it into one
    * task. Scores must be non-NaN (negation is order-exact otherwise;
    * −0.0/0.0 compare equal both ways). NULL scores sort LAST exactly
    * like the window's `DESC NULLS LAST` — the leading is-null flag in
    * the min struct replays it (struct ordering alone would put the null
    * FIRST and silently crown a null-scored survivor). */
  def keepBest(df: DataFrame, clusters: DataFrame, scoreCol: Column,
      idCol: String = "doc_id"): DataFrame = {
    val labeled = df.join(clusters, Seq(idCol))
    val best = labeled.groupBy(col("cluster_id"))
      .agg(min(struct(scoreCol.isNull.cast("int").as("_nl"),
        (-scoreCol).as("_ns"), col(idCol).as("_id"))).as("_best"))
    labeled.join(best, Seq("cluster_id"))
      .filter(col(idCol) === col("_best._id"))
      .select(labeled.columns.map(col): _*)
  }

  /** Cross-document repeated-span stats — the signal behind exact
    * substring dedup (Lee et al. 2022, "Deduplicating Training Data Makes
    * Language Models Better"): per document, how many of its DISTINCT
    * k-token windows also occur in at least one other document, plus the
    * duplicated fraction. Docs shorter than k tokens contribute their
    * whole text as one window (same convention as decontaminate/MinHash
    * shingling). Spans are compared by 64-bit chained-XXH64 hash
    * (collision ~1e-8; the DuckDB oracle compares raw string spans and
    * still hash-matches).
    *
    * Scale shape: explode to (doc, span-hash) pairs, one shuffle on the
    * hash for the span doc-frequency, one shuffle back on the doc id for
    * the per-doc rollup — the inverted-index shape of
    * [[ngramJaccardPairs]], never a pairwise join. */
  def dupSpanStats(df: DataFrame, k: Int = 8, idCol: String = "doc_id",
      textCol: String = "text"): DataFrame = {
    val spans = df.select(col(idCol),
      explode(TextAnalysis.shingleHashes(col(textCol), k)).as("h"))
    // spans are distinct per doc, so count-per-hash = doc frequency
    val docFreq = spans.groupBy("h").agg(count(lit(1)).as("span_df"))
    spans.join(docFreq, "h")
      .groupBy(idCol)
      .agg(count(lit(1)).as("n_spans"),
        sum(when(col("span_df") > 1, 1L).otherwise(0L)).as("n_dup_spans"))
      .withColumn("dup_frac6",
        round(col("n_dup_spans").cast("double") / col("n_spans"), 6))
  }

  /** Exact duplicated-span SCRUB — the remove-the-substring variant of
    * dedup (Lee et al., ACL'22: deduplicating repeated k-token spans inside
    * otherwise-unique documents beats dropping whole near-dup docs): every
    * k-token window that occurs anywhere else in the corpus — or earlier in
    * the same document — is removed EXCEPT its first occurrence in the
    * total order (doc_id, position), and each document's text is rebuilt
    * from its surviving tokens in order.
    *
    * Span identity is the 64-bit chained-XXH64 shingle hash (the
    * [[dupSpanStats]] key, via the positional
    * [[graft.functions.ShingleHashesAll]] expression): 8 bytes per span
    * through the shuffle instead of k tokens of text — at 100 TB the
    * string span keys (k×token text per key) dominate the span-pass
    * shuffle bytes; the reference packs items into u64 for exactly this
    * reason (src/tdb_types.h:24-39). Collision odds ~1e-8 per corpus; a
    * collision merges two distinct spans' first-occurrence choice, which
    * the string-keyed twin [[scrubDupSpansStringKey]] (spec-proven
    * output-identical, and what the DuckDB oracle replays) would surface.
    *
    * Scale shape: explode to positional spans, ONE shuffle on the span key
    * for the global first-occurrence min-aggregate, explode only the DUP
    * spans to covered token positions (k× the duplicated volume, not the
    * corpus), anti-join the positional tokens, and one doc-id rollup to
    * rebuild — the token stream crosses the wire twice (span pass +
    * rebuild), never a pairwise join.
    *
    * Output: (doc_id, n_tokens, n_kept, text_clean) for EVERY input doc —
    * a fully-duplicated doc survives with n_kept = 0 and empty text.
    */
  /** Whale-SPAN hardening (round 13): the first-occurrence join-back
    * routes every occurrence of a span through the task owning its hash
    * partition — a boilerplate span repeated 10^8 times is 10^8 rows in
    * ONE probe task. Spark's AQE skew-join splitting does NOT save this
    * shape: `OptimizeSkewedJoin` matches a join whose children are bare
    * shuffle stages (± sort), and the build side here sits BEHIND the
    * first-occurrence HashAggregate, so the rule never fires (and the
    * default 256 MB `skewedPartitionThresholdInBytes` would not trigger
    * at bench scale anyway). The fix is differentiated salting, paid
    * ONLY by whale keys: the same aggregate that picks the first
    * occurrence also counts occurrences; keys past `skewThreshold` (top
    * `maxHeavyKeys` of them — a bounded driver list, compiled into an
    * InSet) get their probe rows spread over `skewSalt` sub-keys while
    * the one-row build side is replicated `skewSalt`× for just those
    * keys. Light keys join exactly as before (salt 0, no extra build
    * rows), so the non-skewed plan and its bytes are unchanged; the
    * whale's single 10^8-row task becomes `skewSalt` tasks of 10^8/S.
    * Measured in the Scale4x --keyskew ladder (README whale-KEY table). */
  def scrubDupSpans(df: DataFrame, k: Int = 5, idCol: String = "doc_id",
      textCol: String = "text", skewSalt: Int = 16,
      skewThreshold: Long = 1L << 20, maxHeavyKeys: Int = 1024): DataFrame =
    scrubDupSpansKeyed(df, k, idCol, textCol, hashedKeys = true,
      skewSalt, skewThreshold, maxHeavyKeys)

  /** String-span-key twin of [[scrubDupSpans]] — k tokens of text as the
    * span identity, exactly replayable by the DuckDB oracle (and immune
    * to hash collisions). Kept for the equivalence spec; use the hashed
    * form at scale. */
  private[graft] def scrubDupSpansStringKey(df: DataFrame, k: Int = 5,
      idCol: String = "doc_id", textCol: String = "text",
      skewSalt: Int = 16, skewThreshold: Long = 1L << 20,
      maxHeavyKeys: Int = 1024): DataFrame =
    scrubDupSpansKeyed(df, k, idCol, textCol, hashedKeys = false,
      skewSalt, skewThreshold, maxHeavyKeys)

  private def scrubDupSpansKeyed(df: DataFrame, k: Int, idCol: String,
      textCol: String, hashedKeys: Boolean, skewSalt: Int = 16,
      skewThreshold: Long = 1L << 20, maxHeavyKeys: Int = 1024): DataFrame = {
    require(skewSalt >= 1, s"skewSalt must be >= 1, got $skewSalt")
    require(k > 0, s"span width must be positive, got $k")
    val base = df.select(col(idCol), TextAnalysis.tokens(col(textCol)).as("_toks"))
      .withColumn("_n", size(col("_toks")).cast("long"))
    // localCheckpoint: the exploded span table is consumed TWICE below
    // (the first-occurrence aggregate and the join's probe side) — cut
    // the lineage so the tokenize+explode chain runs once, not once per
    // consumer (the minhashDedupPairs signature-table pattern).
    val spanKeys =
      if (hashedKeys)
        graft.functions.GraftFunctions.shingleHashesAll(col("_toks"), k)
      else
        transform(sequence(lit(0), (col("_n") - k).cast("int")),
          i => array_join(slice(col("_toks"), i + 1, lit(k)), " "))
    val spans = base.filter(col("_n") >= k)
      .select(col(idCol), posexplode(spanKeys).as(Seq("p", "g")))
      .localCheckpoint()
    // Non-first occurrences via min-aggregate + join (round 6): the
    // corpus-first occurrence of a span is min (doc_id, position) — a
    // boilerplate span repeated 10^8 times is a whale key, and the
    // per-span `row_number` window this replaces funneled every
    // occurrence into one task. min(struct) partial-aggregates; (id, p)
    // is unique per occurrence so the filter drops exactly the one first
    // occurrence per span, identical to rank > 1.
    val first = spans.groupBy(col("g"))
      .agg(min(struct(col(idCol), col("p"))).as("_f"))
    // whale keys (see the scrubDupSpans scaladoc): bounded driver list of
    // the heaviest span keys past the threshold — empty on non-skewed
    // corpora, leaving the plain equi-join untouched. The detection pass
    // is a plain count HashAggregate over the checkpointed spans (NOT the
    // min-struct sort-aggregate the first-occurrence choice needs) —
    // map-side partials make it the cheapest shuffle in the operator.
    // short-circuit: no key can reach the threshold if the WHOLE table
    // is under it — a count over the checkpointed spans is near-free and
    // spares small corpora the detection aggregate entirely
    val heavy: Array[Any] =
      if (skewSalt <= 1 || spans.count() < skewThreshold) Array.empty
      else spans.groupBy(col("g")).agg(count(lit(1)).as("_c"))
        .filter(col("_c") >= skewThreshold)
        .orderBy(col("_c").desc, col("g")).limit(maxHeavyKeys)
        .select(col("g")).collect().map(_.get(0))
    val joined =
      if (heavy.isEmpty) spans.join(first, Seq("g"))
      else {
        val build = first
          .withColumn("_s", explode(
            when(col("g").isin(heavy: _*), sequence(lit(0), lit(skewSalt - 1)))
              .otherwise(array(lit(0)))))
        val probe = spans.withColumn("_s",
          when(col("g").isin(heavy: _*),
            pmod(xxhash64(col(idCol), col("p")), lit(skewSalt.toLong)).cast("int"))
            .otherwise(lit(0)))
        probe.join(build, Seq("g", "_s")).drop("_s")
      }
    val dup = joined
      .filter(col(idCol) =!= col(s"_f.$idCol") || col("p") =!= col("_f.p"))
      .drop("_f")
    val covered = dup
      .select(col(idCol), explode(sequence(col("p"), col("p") + (k - 1))).as("t"))
      .distinct()
    val pos = base.select(col(idCol), posexplode(col("_toks")).as(Seq("t", "tok")))
    val keptAgg = pos.join(covered, Seq(idCol, "t"), "left_anti")
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_kept"),
        array_join(transform(
          array_sort(collect_list(struct(col("t"), col("tok")))),
          s => s.getField("tok")), " ").as("text_clean"))
    // n_tokens coalesces with its siblings: a NULL-text doc tokenizes to
    // a NULL array (size → NULL), and emitting n_tokens = NULL next to
    // the deliberately-coalesced n_kept = 0 / text_clean = "" would NULL
    // any downstream scrub-fraction arithmetic for exactly that row
    base.select(col(idCol), coalesce(col("_n"), lit(0L)).as("n_tokens"))
      .join(keptAgg, Seq(idCol), "left")
      .select(col(idCol), col("n_tokens"),
        coalesce(col("n_kept"), lit(0L)).as("n_kept"),
        coalesce(col("text_clean"), lit("")).as("text_clean"))
  }

  /** SimHash near-dup: 64-bit signatures via [[graft.functions.SimHash64]]
    * (native Catalyst expression), then exact Hamming-distance pairs among
    * docs sharing at least one of 4 16-bit signature bands (Manku et al.,
    * WWW'07 block-permutation scheme: any pair within Hamming distance 3
    * must agree on ≥1 of 4 bands). */
  def simhashPairs(df: DataFrame, maxHamming: Int = 3,
      textCol: String = "text", idCol: String = "doc_id"): DataFrame = {
    val sig = df.select(col(idCol).as("id"),
      graft.functions.GraftFunctions.simhash64(TextAnalysis.tokens(col(textCol))).as("sig"))
    // band value b of 4: bits [16b, 16b+16)
    val withBands = sig.select(col("id"), col("sig"),
      explode(array((0 until 4).map(b =>
        struct(lit(b).as("band"),
          shiftright(col("sig"), b * 16).bitwiseAND(lit(0xffffL)).as("bits"))): _*)).as("bb"))
      .select(col("id"), col("sig"), col("bb.band"), col("bb.bits"))
    withBands.as("a").join(withBands.as("b"),
        col("a.band") === col("b.band") && col("a.bits") === col("b.bits") &&
          col("a.id") < col("b.id"))
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"),
        col("a.sig").as("sig_a"), col("b.sig").as("sig_b")).distinct()
      .withColumn("hamming", bit_count(col("sig_a").bitwiseXOR(col("sig_b"))))
      .filter(col("hamming") <= maxHamming)
      .select("id_a", "id_b", "hamming")
  }

  /** LSH-blocked embedding near-dup: pairs meet only when one side's
    * hyperplane bucket matches the other side's probe set (own bucket +
    * single-bit flips). The quadratic-within-block cost of
    * [[embeddingNearDup]] becomes ~n·2^-planes·(planes+1) — the 100 TB
    * path (a 4× corpus scales ~4×, not 16×). Recall: pairs within
    * Hamming-1 of bucket codes; near-identical vectors share a bucket. */
  def embeddingNearDupLsh(df: DataFrame, threshold: Double, nPlanes: Int = 8,
      dim: Int = 64, vecCol: String = "embedding",
      idCol: String = "vec_id"): DataFrame = {
    val base = df.select(col(idCol).as("id"), col(vecCol).as("v"),
      Similarity.norm(col(vecCol)).as("nrm"),
      Similarity.lshBucket(col(vecCol), nPlanes, dim).as("bucket"))
    val probed = base.select(col("id").as("id_b"), col("v").as("v_b"),
        col("nrm").as("nrm_b"),
        explode(array_distinct(array(
          col("bucket") +:
          (0 until nPlanes).map(p => col("bucket").bitwiseXOR(lit(1L << p))): _*)))
          .as("bucket"))
    base.join(probed, Seq("bucket"))
      .filter(col("id") < col("id_b"))
      .withColumn("cosine",
        Similarity.dot(col("v"), col("v_b")) / (col("nrm") * col("nrm_b")))
      .filter(col("cosine") >= threshold)
      .select(col("id").as("id_a"), col("id_b"), col("cosine")).distinct()
  }

  /** Incremental dedup: keep the rows of a NEW batch whose content is not
    * already in the existing corpus, and not duplicated within the batch
    * itself (min-id survivor, matching [[exactDedup]]). The daily-ingest
    * shape of every training-data pipeline: the corpus is re-scanned but
    * never re-deduped.
    *
    * Scale shape: one anti-join on the 16-byte content hash. A left-anti
    * join can only broadcast its RIGHT (corpus) side, so at real scale this
    * plans as a shuffle anti-join — the corpus is shuffled ONCE on the
    * narrow hash projection (16 bytes/row, not the documents), and Spark's
    * runtime bloom-filter injection (`spark.sql.optimizer.runtime
    * .bloomFilter.enabled`, on by default) builds a filter from the small
    * batch side and pushes it into the corpus scan, so most corpus rows die
    * before the exchange. The within-batch dedup shuffles only the batch.
    */
  /** Bloom-filter incremental dedup — the repeated-ingest shape for a
    * corpus too large to join against every batch: one pass over the
    * corpus folds content hashes into a driver-merged Bloom sketch
    * (`df.stat.bloomFilter` — per-partition sketches, driver OR-merge),
    * which is then broadcast so each batch row is a local O(numHashes)
    * probe. No corpus-side shuffle, no join. At 100 TB PASS
    * `expectedItems` (from the finalize sidecar or a running counter):
    * sizing the sketch without it costs an extra corpus count() pass —
    * with it, the corpus is read exactly once per sketch refresh
    * instead of once per batch.
    *
    * One-sided error, the direction you want for dedup: a true duplicate
    * ALWAYS probes positive (never re-ingested); a new document is
    * dropped only with probability ≤ fpp. The probe is a native codegen'd
    * expression ([[graft.functions.BloomMightContain]]) over the broadcast
    * bitset — a local bit test inside the scan's whole-stage span, not a
    * lookup join and not an interpreted UDF boundary.
    */
  /** Optimal Bloom size in BYTES for n items at fpp: bits = −n·ln(fpp)/ln²2
    * (the standard formula Spark's BloomFilter.optimalNumOfBits uses). This
    * sketch is DRIVER-merged and broadcast whole — at 10^10 documents and
    * fpp 0.01 it is ~12 GB, which no driver should discover mid-job; size
    * it here and guard loudly. */
  def bloomBytes(n: Long, fpp: Double): Long =
    math.ceil(-n.toDouble * math.log(fpp) / (math.log(2) * math.log(2)) / 8.0)
      .toLong

  def bloomDedup(corpus: DataFrame, batch: DataFrame,
      textCol: String = "text", fpp: Double = 0.01,
      expectedItems: Option[Long] = None,
      maxBloomBytes: Long = 1L << 30): DataFrame = {
    val spark = batch.sparkSession
    val hashed = corpus.select(xxhash64(col(textCol)).as("_h"))
    val n = expectedItems.getOrElse(math.max(hashed.count(), 1000L))
    // Driver-bitset memory guard: the sketch is held on the driver (merge)
    // AND broadcast to every executor — a corpus big enough to need more
    // than the cap must say so explicitly (or shard into per-shard
    // sketches / raise fpp) instead of OOMing the driver mid-merge.
    val bytes = bloomBytes(n, fpp)
    require(bytes <= maxBloomBytes,
      s"bloomDedup: a $n-item sketch at fpp=$fpp needs ~$bytes bytes of " +
        s"driver+broadcast memory (cap $maxBloomBytes). Raise maxBloomBytes " +
        "knowingly, raise fpp, or shard the corpus into per-shard sketches.")
    val bf = hashed.stat.bloomFilter("_h", n, fpp)
    val bc = spark.sparkContext.broadcast(bf)
    batch.withColumn("_h", xxhash64(col(textCol)))
      .filter(!graft.functions.GraftFunctions.bloomMightContain(bc, col("_h")))
      .drop("_h")
  }

  /** [[bloomDedup]] against a FINALIZED corpus: `expectedItems` defaults
    * from the db's `_graft_info.json` sidecar (num_events — an upper bound
    * on distinct texts, which only oversizes, never undersizes), so sizing
    * the sketch costs a sidecar read instead of an extra corpus count()
    * pass — the corpus is then read exactly once per sketch refresh. */
  def bloomDedup(corpus: graft.core.TrailDB, batch: DataFrame,
      textCol: String, fpp: Double, maxBloomBytes: Long): DataFrame =
    bloomDedup(corpus.df, batch, textCol, fpp, Some(corpus.numEvents),
      maxBloomBytes)

  def incrementalDedup(corpus: DataFrame, batch: DataFrame,
      textCol: String = "text", idCol: String = "doc_id"): DataFrame = {
    val h = md5(col(textCol).cast("binary"))
    // null-safe anti-join: NULL text is dedupable CONTENT in this library
    // (the exactDedup convention), so a null-text batch row must match a
    // null-text corpus row — plain equality would re-ingest it forever
    val fresh = batch.withColumn("_h", h)
      .join(corpus.select(h.as("_ch")), col("_h") <=> col("_ch"),
        "left_anti")
    // min-aggregate + semi-join (round 6): same whale-hash rationale and
    // null/duplicate handling as [[exactDedup]] — a duplicate-heavy batch
    // must not funnel one hash's copies into one window task.
    val keep = fresh.groupBy(col("_h")).agg(min(col(idCol)).as("_kid"))
      .withColumnRenamed("_h", "_kh")
    fresh.join(keep,
        col("_h") <=> col("_kh") && col(idCol) === col("_kid"), "left_semi")
      .dropDuplicates("_h", idCol).drop("_h")
  }

  /** Benchmark decontamination: count, per training doc, how many of its
    * distinct word k-grams also occur in an evaluation set — docs with
    * overlap are flagged/removed before training so eval numbers stay
    * honest (the n-gram-overlap rule of GPT-3 appendix C / PaLM-style
    * decontamination).
    *
    * Scale shape: the eval side is tiny by construction (a benchmark, not a
    * corpus), so its distinct shingle set is broadcast; the train side's
    * exploded shingles stream from the scan into a broadcast semi-join +
    * per-doc count — the corpus is scanned once and shuffled once (on doc
    * id, post-filter, overlapping docs only). Shingles are 64-bit hashes
    * ([[TextAnalysis.shingleHashes]]): 8-byte join keys, collision odds
    * ~n²/2⁶⁵.
    *
    * Output: (doc_id, n_overlap) for training docs with ≥1 overlapping
    * k-gram.
    */
  def decontaminate(train: DataFrame, eval: DataFrame, k: Int = 3,
      textCol: String = "text", idCol: String = "doc_id"): DataFrame = {
    val evalShingles = eval
      .select(explode(TextAnalysis.shingleHashes(col(textCol), k)).as("sh"))
      .distinct()
    train.select(col(idCol), explode(
        TextAnalysis.shingleHashes(col(textCol), k)).as("sh"))
      .join(broadcast(evalShingles), "sh")
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_overlap"))
  }

  /** FUZZY decontamination — near-duplicate eval overlap, the companion of
    * the exact-k-gram [[decontaminate]]: a training doc that paraphrases or
    * lightly edits an eval doc shares no long exact k-gram run but still
    * leaks the answer, so real pipelines pair the exact pass with a
    * near-dup pass (GPT-3's "fuzzy dedup" appendix; Lee et al. ACL'22 §6).
    *
    * Shape at scale: MinHash-LSH banding on BOTH collections (zero-shuffle
    * native signatures, one bucket equi-join between the two bucket tables
    * — never train×eval), then candidates verified by exact k-gram Jaccard
    * over hashed shingle sets. Verified pairs are a SUBSET of the exact
    * threshold pair list by construction (the verification applies the
    * exact predicate); banding may miss pairs — the S-curve trade — which
    * the d_fuzzy_decontam contract measures as recall vs the DuckDB-
    * recomputed exact list.
    *
    * Output: (train `idCol`, eval_id, jaccard), one row per verified
    * contaminated pair (threshold on k-gram Jaccard). Drop policy is the
    * caller's (typically: drop every train doc appearing at all). */
  def fuzzyDecontaminate(train: DataFrame, eval: DataFrame,
      threshold: Double = 0.5, numHashes: Int = 128, bands: Int = 32,
      k: Int = 3, textCol: String = "text", idCol: String = "doc_id"): DataFrame = {
    require(numHashes % bands == 0,
      s"numHashes ($numHashes) must divide into bands ($bands)")
    val rows = numHashes / bands
    val sigT = minhashSignature(train, numHashes, k, textCol, idCol)
    val sigE = minhashSignature(eval, numHashes, k, textCol, idCol)
    val cands = lshBuckets(sigT, bands, rows).as("t")
      .join(lshBuckets(sigE, bands, rows).as("e"),
        col("t.band") === col("e.band") && col("t.bucket") === col("e.bucket"))
      .select(col("t.id").as("_tid"), col("e.id").as("_eid")).distinct()
    val setsT = train.select(col(idCol).as("_tid"),
      TextAnalysis.shingleHashes(col(textCol), k).as("sh_t"))
    val setsE = eval.select(col(idCol).as("_eid"),
      TextAnalysis.shingleHashes(col(textCol), k).as("sh_e"))
    jaccardAtLeast(cands.join(setsT, "_tid").join(setsE, "_eid"),
        col("sh_t"), col("sh_e"), threshold)
      .select(col("_tid").as(idCol), col("_eid").as("eval_id"), col("jaccard"))
  }

  /** Embedding cosine near-dup pairs above a similarity threshold, blocked
    * by a coarse key (default: none → label column recommended) to avoid the
    * full cross join; this exact form is the oracle baseline — at corpus
    * scale use [[embeddingNearDupLsh]]. */
  def embeddingNearDup(df: DataFrame, threshold: Double,
      blockCol: Option[String] = None,
      vecCol: String = "embedding", idCol: String = "vec_id"): DataFrame = {
    // cast floats to double BEFORE multiplying — float*float rounds to
    // float first and diverges from a double-precision oracle. Norms are
    // precomputed per row (computing them per pair triples the join flops).
    val withBlock = df.select(
      col(idCol).as("id"), col(vecCol).as("v"),
      blockCol.map(col).getOrElse(lit(0)).as("blk"),
      Similarity.norm(col(vecCol)).as("nrm"))
    withBlock.as("a").join(withBlock.as("b"),
        col("a.blk") === col("b.blk") && col("a.id") < col("b.id"))
      .withColumn("cosine",
        Similarity.dot(col("a.v"), col("b.v")) / (col("a.nrm") * col("b.nrm")))
      .filter(col("cosine") >= threshold)
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"), col("cosine"))
  }

  /** SemDeDup (Abbas et al., arXiv:2303.09540): semantic dedup by
    * LEARNED-cluster blocking — K-Means cells replace the label/LSH blocks
    * of [[embeddingNearDup]]/[[embeddingNearDupLsh]], which is the
    * published recipe for pretraining-corpus semantic dedup: cluster the
    * embedding space, compare pairs only WITHIN a cell, drop every member
    * of a within-cell near-dup group except one representative.
    *
    * Output: one row per input vector — `(vec_id, cell, cluster_id, kept)`
    * where `cell` is the LEAF cell path (a string: "3" for an unsplit
    * coarse cell, "3/1/0" after recursive splits), cluster_id is the min
    * id of the vector's within-cell near-dup component (own id for
    * singletons) and kept marks the representative.
    *
    * Scale shape: the coarse quantizer trains in-process on the
    * content-hash-capped sample (same bound as PQ/IVF — never corpus-
    * sized); cell assignment is the codegen'd nearest-centroid expression
    * inside the scan projection; the only corpus joins are the cell
    * equi-join (pairs within a cell — SemDeDup's accepted quadratic,
    * bounded by cell size) and the component-label join. Cross-cell
    * near-dups are missed BY DESIGN (that is the approximation the paper
    * accepts); within a LEAF cell the kept set provably contains no pair
    * ≥ threshold (components are transitive-closed), which the
    * e_semantic_dedup contract re-checks from raw vectors.
    *
    * Whale cells RECOVER instead of refusing (round 7; refusal was the
    * round-6 behavior — a naturally dense near-dup cluster is the
    * EXPECTED shape in a dedup corpus, and a hard stop at 100 TB makes
    * the run a babysitting job). Two mechanisms, mirroring
    * [[connectedComponents]]' driver→distributed escalation:
    *
    *  1. EXACT-VECTOR COLLAPSE: byte-identical vectors (the truly
    *     unsplittable whale — 10^8 copies of one embedding defeat any
    *     quantizer) group to their min-id representative in ONE linear
    *     shuffle; only distinct vectors enter the quadratic pair stage,
    *     and copies attach to their representative's component through a
    *     linear rep→copy edge (cosine(identical) = 1 ≥ any valid
    *     threshold). Zero-norm vectors bypass the machinery entirely —
    *     their cosine is NaN, so each is a singleton by contract, and
    *     they route straight to the output as such (a whale of identical
    *     zero vectors — failed-embedding rows — is unsplittable by any
    *     quantizer, so inside the machinery it could only die slowly).
    *  2. RECURSIVE CELL SPLIT: any cell holding more than `maxCellRows`
    *     DISTINCT vectors re-runs the sample-trained quantizer inside the
    *     cell (fresh capped sample of that cell, ~2·n/cap centroids),
    *     appending the sub-assignment to the cell path; up to
    *     `maxSplitDepth` rounds. A cell still over the cap after the last
    *     round — or more than `maxSplitCellsPerLevel` oversized cells at
    *     once — fails LOUDLY with sizing advice BEFORE any quadratic work
    *     (the sizes pass runs eagerly at build time, never mid-join).
    */
  def semanticDedup(emb: DataFrame, nCells: Int, threshold: Double,
      vecCol: String = "embedding", idCol: String = "vec_id",
      maxCellRows: Long = 65536L, maxSplitDepth: Int = 3,
      maxSplitCellsPerLevel: Int = 64): DataFrame = {
    require(nCells >= 1, s"nCells must be >= 1, got $nCells")
    require(threshold > 0.0 && threshold <= 1.0,
      s"threshold must be in (0, 1], got $threshold")
    require(maxCellRows > 0, s"maxCellRows must be positive, got $maxCellRows")
    require(maxSplitDepth >= 0, s"maxSplitDepth must be >= 0, got $maxSplitDepth")
    val cents = Similarity.lloyd(
      Similarity.sampleVectors(emb, vecCol), nCells, iters = 10, seed = 42L)
    val flat = cents.flatMap(_.toSeq).toSeq
    val assigned = emb.select(col(idCol).as("id"), col(vecCol).as("v"),
      Similarity.norm(col(vecCol)).as("nrm"),
      element_at(graft.functions.GraftFunctions.pqCodes(
        col(vecCol), 1, nCells, flat), 1).cast("string").as("cell"))
    // Zero-norm vectors can never pair (their cosine is NaN, which
    // clears no threshold) — every one is a singleton by the operator's
    // contract. Route them STRAIGHT to the output (review r7): inside the
    // machinery they only inflate cell sizes and the quadratic join, and
    // a whale of byte-identical zero vectors (failed-embedding rows are
    // exactly this shape) is unsplittable by any quantizer — the split
    // rounds would burn maxSplitDepth and then refuse with advice that
    // cannot work.
    // coalesce + NaN-map: a NULL embedding has NULL norm and a NaN
    // component yields a NaN norm — BOTH fail a <= 0 AND a > 0 filter
    // (NaN comparisons are false), so without the normalization such
    // rows would vanish from the output entirely (r7 review; NaN case
    // r15). NULL/NaN-embedding rows are singletons for the same reason
    // zero-norm ones are: no cosine can match them.
    val nrmSafe = when(col("nrm").isNull || isnan(col("nrm")), lit(0.0))
      .otherwise(col("nrm"))
    val zeroSingletons = assigned
      .filter(nrmSafe <= 0)
      .select(col("id").as(idCol), col("cell"),
        col("id").as("cluster_id"), lit(true).as("kept"))
    val all = assigned.filter(nrmSafe > 0)
    // Exact-vector collapse: min-id representative per identical vector
    // group (the whale-safe min-agg + join shape, like exactDedup). The
    // insurance is priced to the duplicates it finds (r7 bench
    // adjudication: the first cut checkpointed the whole tagged corpus —
    // vectors included — and cost 1.5× on a NO-dup corpus): only groups
    // with ≥2 members survive the aggregate, so `copies` — the one
    // materialized artifact — is EMPTY on a duplicate-free corpus and
    // every corpus-side join below is an AQE-broadcast probe inside the
    // scan; a dup-heavy corpus grows `copies` and AQE shifts those joins
    // to shuffles exactly when the data demands it.
    // ONE narrow pre-pass (8-byte hash keys, one driver collect of ≤
    // nCells rows) answers BOTH round-0 questions: does any vector repeat
    // (the collapse gate — full-vector 256-byte grouping and every copy
    // join below skip when it doesn't, which is the common corpus), and
    // which cells are oversized (when nothing repeats, distinct-per-cell
    // IS total-per-cell, so the level-0 size check comes free from the
    // same job — each added driver action costs a fixed job round at
    // small scale, r7 bench adjudication). A hash collision only falsely
    // OPENS the gate (the precise v-keyed pass decides identity), never
    // merges distinct vectors.
    val pre = all
      .groupBy(col("cell"), xxhash64(col("v")).as("_h"))
      .agg(count(lit(1)).as("_n"))
      .groupBy("cell")
      .agg(sum(col("_n")).as("_tot"), max(col("_n")).as("_mx"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    val hasDupHashes = pre.exists(_._3 > 1)
    // narrow (copy id → rep id) map; localCheckpoint: consumed three
    // times (reps anti-join, identity edges, final labeling)
    val copies: Option[DataFrame] = if (!hasDupHashes) None else Some {
      val dupGroups = all
        .groupBy("v").agg(min(col("id")).as("_rep"), count(lit(1)).as("_nv"))
        .filter(col("_nv") > 1).select("v", "_rep")
      all.join(dupGroups, Seq("v"))
        .filter(col("id") =!= col("_rep"))
        .select(col("id"), col("_rep")).localCheckpoint()
    }
    var reps = copies.fold(all.select("id", "v", "nrm", "cell"))(c =>
      all.join(c.select("id"), Seq("id"), "left_anti")
        .select("id", "v", "nrm", "cell"))
    // Recursive split of oversized cells. The per-level size check is a
    // driver-side aggregate collect (bounded: one row per live cell), so
    // oversized cells are discovered — and either split or refused —
    // BEFORE the quadratic pair join is even planned.
    def oversizedCells(r: DataFrame): Array[(String, Long)] =
      r.groupBy("cell").agg(count(lit(1)).as("_n"))
        .filter(col("_n") > maxCellRows)
        .collect().map(x => (x.getString(0), x.getLong(1)))
    var over =
      if (hasDupHashes) oversizedCells(reps)
      else pre.filter(_._2 > maxCellRows).map(x => (x._1, x._2))
    var depth = 0
    while (over.nonEmpty && depth < maxSplitDepth) {
      require(over.length <= maxSplitCellsPerLevel,
        s"semanticDedup: ${over.length} cells exceed $maxCellRows distinct " +
          s"vectors at split depth $depth (cap $maxSplitCellsPerLevel " +
          "cells per level) — the embedding space is too skewed for this " +
          "nCells; raise nCells so the coarse pass spreads the corpus.")
      val splits = over.map { case (cellId, n) =>
        val cellDf = reps.filter(col("cell") === cellId)
        val subK = math.max(2, math.min(64,
          math.ceil(2.0 * n / maxCellRows).toInt))
        val subCents = Similarity.lloyd(
          Similarity.sampleVectors(cellDf, "v"), subK, iters = 10,
          seed = 42L + depth)
        (cellId, subK, subCents.flatMap(_.toSeq).toSeq)
      }
      val reassigned = splits.foldLeft(col("cell")) {
        case (acc, (cellId, subK, flatSub)) =>
          when(col("cell") === cellId,
            concat(col("cell"), lit("/"),
              element_at(graft.functions.GraftFunctions.pqCodes(
                col("v"), 1, subK, flatSub), 1).cast("string")))
            .otherwise(acc)
      }
      // localCheckpoint: each level re-scans reps for sizes + samples, and
      // the when-chain would otherwise re-derive the whole split lineage
      reps = reps.withColumn("cell", reassigned).localCheckpoint()
      depth += 1
      over = oversizedCells(reps)
    }
    require(over.isEmpty, {
      val (cellId, n) = over.maxBy(_._2)
      s"semanticDedup: cell $cellId still holds $n DISTINCT vectors " +
        s"(cap $maxCellRows) after $maxSplitDepth recursive splits — the " +
        "within-cell pair join is quadratic in cell size. Raise nCells / " +
        "maxSplitDepth so cells stay bounded as the corpus grows (the " +
        "paper's recipe), or raise maxCellRows knowingly."
    })
    // Quadratic stage over DISTINCT vectors only, per LEAF cell.
    val pairs = reps.as("a").join(reps.as("b"),
        col("a.cell") === col("b.cell") && col("a.id") < col("b.id"))
      .withColumn("cosine",
        Similarity.dot(col("a.v"), col("b.v")) / (col("a.nrm") * col("b.nrm")))
      .filter(col("cosine") >= threshold)
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"))
    // Copies attach linearly: rep → copy (cosine 1 by identity).
    val edges = copies.fold(pairs)(c => pairs.unionByName(
      c.select(col("_rep").as("id_a"), col("id").as("id_b"))))
    val comps = connectedComponents(edges)
    val leaf = reps.select(col("id").as("_rep"), col("cell").as("_leafcell"))
    copies.fold(
        all.select(col("id").as(idCol), col("id").as("_rep")))(c =>
      all.select(col("id"))
        .join(c, Seq("id"), "left")
        .select(col("id").as(idCol),
          coalesce(col("_rep"), col("id")).as("_rep")))
      .join(leaf, Seq("_rep"))
      .join(comps.withColumnRenamed("id", idCol), Seq(idCol), "left")
      .select(col(idCol), col("_leafcell").as("cell"),
        coalesce(col("cluster_id"), col(idCol)).as("cluster_id"))
      .withColumn("kept", col(idCol) === col("cluster_id"))
      .unionByName(zeroSingletons)
  }
}
