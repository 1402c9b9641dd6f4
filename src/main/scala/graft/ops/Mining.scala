package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Margin-based parallel-pair mining between two embedding collections —
  * the standard recipe for aligning two corpora (bitext mining, cross-modal
  * pairing, teacher/student matching) published as the ratio-margin
  * criterion in Artetxe & Schwenk, "Margin-based Parallel Corpus Mining
  * with Multilingual Sentence Embeddings" (arXiv:1811.01136): a raw cosine
  * threshold misfires on hubness (some vectors are close to EVERYTHING),
  * so each pair's cosine is normalized by the average cosine of both
  * endpoints to their own k nearest neighbors:
  *
  *   margin(x, y) = cos(x, y) / ((avgK(x→B) + avgK(y→A)) / 2)
  *
  * Distributed shape: the two k-NN frames are the library's mergeable
  * shortlist aggregates (≤k rows per query through every exchange — see
  * [[Similarity.bruteForceKnn]]), the penalty tables are one bounded
  * groupBy over those (|A| and |B| rows, ≤k addends each), and the margin
  * join touches only candidate pairs (|A|·k rows), never all pairs. The
  * final keep-best-per-source is a max(struct) aggregate, not a window —
  * safe when one source vector is a whale with millions of candidates
  * upstream (it still has ≤k here by construction).
  *
  * Determinism: penalty sums are exact nano-unit integers (round(cos·1e9)
  * per neighbor, summed as longs — order-independent), and the margin is a
  * single fixed-shape double expression over those integers, so a DuckDB
  * oracle replays it bit-identically.
  */
object Mining {

  /** Ratio-margin scoring over precomputed neighbor lists.
    *
    * `knnAB` ranks B-side candidates per A-side query, `knnBA` the
    * reverse; both in the library's shortlist shape
    * `(query_id, rank, corpus_id, cosine)`. Returns the best candidate per
    * A-side source with its margin: `(src_id, dst_id, cosine, margin)`,
    * one row per src with margin ≥ `minMargin` (1.0 = "closer than the
    * average of its neighborhood").
    *
    * Both neighbor frames arrive partitioned by `query_id` (they are
    * groupBy outputs), so the penalty joins on the A side reuse that
    * partitioning; only the B-side penalty join shuffles the |A|·k
    * candidate rows once on dst id.
    */
  def marginPairs(knnAB: DataFrame, knnBA: DataFrame,
      minMargin: Double = 1.0): DataFrame = {
    // knnAB is consumed twice (penalty aggregate + the candidate list);
    // without a checkpoint Catalyst duplicates the whole upstream k-NN
    // subplan — for the brute-force baseline that is a second full
    // corpus×queries scoring pass. The checkpointed table is ≤|A|·k rows.
    val ab = knnAB.localCheckpoint()
    val nano = round(col("cosine") * lit(1e9), 0).cast("long")
    val penA = ab.groupBy(col("query_id").as("src_id"))
      .agg(sum(nano).as("pen_x"), count(lit(1)).as("cnt_x"))
    val penB = knnBA.groupBy(col("query_id").as("dst_id"))
      .agg(sum(nano).as("pen_y"), count(lit(1)).as("cnt_y"))
    val margin = col("cosine") /
      ((col("pen_x") / (col("cnt_x") * lit(1e9)) +
        col("pen_y") / (col("cnt_y") * lit(1e9))) / lit(2.0))
    val scored = ab
      .select(col("query_id").as("src_id"), col("corpus_id").as("dst_id"),
        col("cosine"))
      .join(penA, "src_id")
      .join(penB, "dst_id")
      .withColumn("margin", margin)
    // Best dst per src: margin desc, dst id asc on ties. max(struct) is a
    // mergeable aggregate; the negated id field makes the tiebreak an
    // ascending one under max.
    scored.groupBy("src_id")
      .agg(max(struct(col("margin"), (-col("dst_id")).as("_negd"),
        col("dst_id"), col("cosine"))).as("best"))
      .select(col("src_id"), col("best.dst_id").as("dst_id"),
        col("best.cosine").as("cosine"), col("best.margin").as("margin"))
      .filter(col("margin") >= lit(minMargin))
  }

  /** Exact bitext mining: brute-force k-NN in both directions (each side
    * is broadcast as the query set of the other — the oracle-able baseline;
    * at corpus×corpus scale use [[bitextMineBlocked]]). */
  def bitextMine(a: DataFrame, b: DataFrame, k: Int,
      minMargin: Double = 1.0, vecCol: String = "embedding",
      idCol: String = "vec_id"): DataFrame = {
    // excludeSelf = false: A and B are independent collections — an id
    // collision across them is a coincidence, not an identity, and the
    // self-kNN filter would silently drop that pair (and diverge from
    // the oracle, which has no id-inequality predicate).
    val knnAB = Similarity.bruteForceKnn(b, a, k, vecCol, idCol,
      excludeSelf = false)
    val knnBA = Similarity.bruteForceKnn(a, b, k, vecCol, idCol,
      excludeSelf = false)
    marginPairs(knnAB, knnBA, minMargin)
  }

  /** Cell-blocked k-NN where BOTH sides are corpus-sized — the mining
    * shape brute force can't take (it broadcasts the query side). Corpus
    * rows take their nearest coarse cell, query rows probe their `nprobe`
    * nearest (both assignments are codegen'd projections over driver-
    * trained centroid literals — see [[Similarity.ivfKnn]]); candidates
    * meet in a plain shuffle EQUI-join on cell (no broadcast of either
    * side), and the shortlist is the mergeable TopK aggregate. Neighbors
    * outside the probed cells are missed BY DESIGN — the IVF
    * approximation; the e_bitext_ann contract measures the pair overlap
    * against the exact miner.
    *
    * The within-cell candidate volume is quadratic in cell occupancy
    * (Σ_cell |corpus∩cell|·|probes∩cell| rows), so an eager sizes pass —
    * two nCells-row aggregates, run BEFORE any quadratic work — refuses
    * loudly with sizing advice when any cell exceeds `maxPairsPerCell`.
    * [[Dedup.semanticDedup]]'s recursive cell split is the recovery
    * precedent if refusal ever becomes operationally limiting here. */
  private def cellKnn(corpus: DataFrame, queries: DataFrame, k: Int,
      nCells: Int, nprobe: Int, maxPairsPerCell: Long,
      vecCol: String, idCol: String): DataFrame = {
    // Shared IVF blocking step ([[Similarity.coarseBlock]]). Coarse cells
    // only need a sketch of the density, not the PQ-grade sample: cap the
    // driver-side training set at 8k vectors (Lloyd is
    // O(sample·nCells·dim·iters) IN-PROCESS — with the 65k default it
    // dominates the whole blocked run once nCells grows with the corpus).
    val (cells, qCells) = Similarity.coarseBlock(corpus, queries, nCells,
      nprobe, vecCol, idCol, maxSample = 8192)
    val occ = cells.groupBy("cell").agg(count(lit(1)).as("_nc"))
      .join(qCells.groupBy("cell").agg(count(lit(1)).as("_nq")), Seq("cell"))
      .select(max(col("_nc") * col("_nq")).as("_mx"))
      .collect()
    val worst = if (occ.isEmpty || occ.head.isNullAt(0)) 0L
                else occ.head.getLong(0)
    require(worst <= maxPairsPerCell,
      s"graft bitext: a coarse cell pairs $worst candidates " +
      s"(cap $maxPairsPerCell). Raise nCells (currently $nCells) so cells " +
      "shrink, lower nprobe, or raise maxPairsPerCell if the executors " +
      "can absorb the quadratic join.")
    // No corpus_id =!= query_id filter: that is the SELF-kNN convention;
    // these are two independent collections (see bitextMine).
    val scored = cells.join(qCells, Seq("cell"))
      .withColumn("cosine",
        Similarity.dot(col("cv"), col("qv")) / (col("cn") * col("qn")))
    Similarity.topKPerQuery(scored, "cosine", k, "cosine")
  }

  /** [[bitextMine]]'s 100 TB shape: blocked k-NN in both directions via
    * [[cellKnn]], then the same exact-integer margin algebra. Penalties
    * come from the blocked neighbor lists (the approximation Artetxe &
    * Schwenk themselves run at scale). */
  def bitextMineBlocked(a: DataFrame, b: DataFrame, k: Int,
      nCells: Int = 16, nprobe: Int = 3, minMargin: Double = 1.0,
      maxPairsPerCell: Long = 1L << 26, vecCol: String = "embedding",
      idCol: String = "vec_id"): DataFrame = {
    // the two directions are independent but each is EAGER on the
    // driver (coarse KMeans training + the occupancy-gate collect) —
    // overlap them so the wall pays max, not sum (guide §2.6; same
    // frames, identical results)
    val dirs = Par.inParallel[DataFrame](Seq(
      () => cellKnn(b, a, k, nCells, nprobe, maxPairsPerCell, vecCol, idCol),
      () => cellKnn(a, b, k, nCells, nprobe, maxPairsPerCell, vecCol, idCol)))
    marginPairs(dirs(0), dirs(1), minMargin)
  }
}
