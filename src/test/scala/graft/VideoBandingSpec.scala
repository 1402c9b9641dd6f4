package graft

import org.apache.spark.sql.functions._
import graft.functions.GraftFunctions
import graft.ops.Multimodal

/** Round 16: banded (hamming-tolerant) video frame matching and the LIS
  * temporal-consistency score — property-tested against an independent
  * brute-force reference, plus the perturbation-cohort bit guarantees
  * the oracle replay rests on. */
class VideoBandingSpec extends SparkSpec {
  import spark.implicits._

  // independent O(k²) LIS reference: longest chain strictly increasing
  // in BOTH coordinates, DP over pairs sorted by (a, b)
  private def lisRef(pairs: Seq[(Int, Int)]): Int = {
    if (pairs.isEmpty) return 0
    val ps = pairs.sortBy(p => (p._1, p._2)).toArray
    val dp = Array.fill(ps.length)(1)
    var best = 1
    for (i <- ps.indices; j <- 0 until i)
      if (ps(j)._1 < ps(i)._1 && ps(j)._2 < ps(i)._2 && dp(j) + 1 > dp(i)) {
        dp(i) = dp(j) + 1
        if (dp(i) > best) best = dp(i)
      }
    best
  }

  test("lisLen: strict 2-D chains, ties, duplicates, reversals, empty") {
    def lis(ps: Seq[(Int, Int)]): Long =
      Seq(Tuple1(ps)).toDF("p")
        .select(GraftFunctions.lisLen(col("p"))).head().getLong(0)
    assert(lis(Seq((0, 0), (1, 1), (2, 2))) === 3L)
    assert(lis(Seq((2, 2), (0, 0), (1, 1))) === 3L) // order-free input
    assert(lis(Seq((0, 2), (1, 1), (2, 0))) === 1L) // full reversal
    assert(lis(Seq((0, 5), (0, 9), (1, 7))) === 2L) // equal-a tie: one link
    assert(lis(Seq((0, 5), (1, 5))) === 1L)         // equal-b: strict
    assert(lis(Seq((0, 5), (0, 5))) === 1L)         // duplicate pair
    assert(lis(Seq.empty[(Int, Int)]) === 0L)
    // cross-check against the independent DP on a fixed awkward case
    val awkward = Seq((0, 3), (1, 1), (2, 4), (3, 2), (4, 5), (1, 0))
    assert(lis(awkward) === lisRef(awkward).toLong)
  }

  test("perturbation cohorts: per-frame dHash distances are inside their guaranteed bands") {
    val docs = spark.read
      .parquet("/root/testdata/sf0.001/documents.parquet").limit(12) // 3 groups
    val base = Multimodal.dedupVideoMediaFromDocuments(docs)
      .filter(col("media_id") % 4 === 0)
    val cohorts = Multimodal.perturbedVideoCohortsFromDocuments(docs)
    val hashes = Multimodal.decodeVideoThumbs(base.unionByName(
        cohorts.filter(col("media_id") < 5000000L)))
      .select(col("media_id"), col("frame_idx"),
        GraftFunctions.dhash64(col("thumb")).as("h"))
      .collect().map(r => (r.getLong(0), r.getInt(1)) -> r.getLong(2)).toMap
    def ham(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
    for (g <- 0L until 3L) {
      val nf = 3 + (g % 3).toInt
      for (k <- 0 until nf) {
        val b0 = hashes((4 * g, k))
        val w = hashes((3000000L + g, k))
        val b = hashes((4000000L + g, k))
        val hw = ham(b0, w)
        val hb = ham(b0, b)
        val hwb = ham(w, b)
        assert(hw >= 1 && hw <= 2, s"within drift $hw for gid $g frame $k")
        assert(hb >= 5 && hb <= 10, s"beyond drift $hb for gid $g frame $k")
        assert(hwb >= 4, s"within-beyond gap $hwb for gid $g frame $k")
      }
    }
  }

  test("banded videoNearDupPairs equals the brute-force frame matcher (n_matched AND lis)") {
    val docs = spark.read
      .parquet("/root/testdata/sf0.001/documents.parquet").limit(12) // 3 groups
    val media = Multimodal.dedupVideoMediaFromDocuments(docs)
      .unionByName(Multimodal.perturbedVideoCohortsFromDocuments(docs))
    val sets = Multimodal.videoFrameHashSets(media).collect()
      .map(r => r.getLong(0) -> (r.getAs[Seq[Long]]("frame_hashes"),
        r.getAs[Seq[Int]]("frame_pos"))).toMap
    def brute(radius: Int, minMatched: Int): Set[(Long, Long, Long, Long)] = {
      val ids = sets.keys.toSeq.sorted
      (for {
        i <- ids.indices.iterator; j <- ((i + 1) until ids.size).iterator
        a = ids(i); b = ids(j)
        matched = for {
          x <- sets(a)._1.indices
          y <- sets(b)._1.indices
          if java.lang.Long.bitCount(sets(a)._1(x) ^ sets(b)._1(y)) <= radius
        } yield (sets(a)._2(x), sets(b)._2(y))
        if matched.nonEmpty
        n = math.min(matched.map(_._1).distinct.size,
          matched.map(_._2).distinct.size)
        if n >= minMatched
      } yield (a, b, n.toLong, lisRef(matched).toLong)).toSet
    }
    val got = Multimodal.videoNearDupPairs(media, minMatchedFrames = 2)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSet
    assert(got === brute(3, 2) && got.nonEmpty)
    // planted shape: the reversed member ties the exact copy's n_matched
    // but scores lis 1; the beyond-radius member pairs with nothing
    for (g <- 0L until 3L) {
      val nf = 3L + g % 3
      assert(got.contains((4 * g, 5000000L + g, nf, 1L)))
      assert(got.contains((4 * g, 3000000L + g, nf, nf)))
    }
    assert(!got.exists(p => p._1 / 1000000L == 4 || p._2 / 1000000L == 4))
    // radius 0 reproduces the pre-banding exact-equality semantics: the
    // perturbed member (every frame hash moved ≥1 bit) vanishes
    val exact = Multimodal.videoNearDupPairs(media, minMatchedFrames = 2,
        maxFrameHamming = 0)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSet
    assert(exact === brute(0, 2))
    assert(!exact.exists(p => p._2 / 1000000L == 3))
  }

  test("incrementalVideoNearDup's within-batch leg adopts the index's frozen radius") {
    // one similarity definition per result frame (the image ahash
    // discipline): an index frozen at radius 0 must see NO batch-side
    // pairs matched at the old hard default of 3 — the bit-perturbed
    // cohort (1-2 drifted bits vs the base's exact copies) pairs on
    // neither side, while the exact m1/m2 members still pair everywhere
    val docs = spark.read
      .parquet("/root/testdata/sf0.001/documents.parquet").limit(12)
    val media = Multimodal.dedupVideoMediaFromDocuments(docs)
    val index = Multimodal.videoFrameIndex(
      media.filter(col("media_id") % 4 === 0), maxFrameHamming = 0)
    val batch = media.filter(col("media_id") % 4 === 1 ||
        col("media_id") % 4 === 2)
      .unionByName(Multimodal.perturbedVideoCohortsFromDocuments(docs,
        Seq("within")))
    val got = Multimodal.incrementalVideoNearDup(batch, index)
      .select("id_a", "id_b", "side").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2))).toSet
    assert(!got.exists(p => p._1 >= 3000000L || p._2 >= 3000000L),
      s"perturbed member paired at radius 0: $got")
    for (g <- 0L until 3L) {
      assert(got.contains((4 * g + 1, 4 * g + 2, "batch")))
      assert(got.contains((4 * g, 4 * g + 1, "corpus")))
    }
  }

  test("minLisFrac keeps a shuffled-frame collage OUT of the connected-components input") {
    val docs = spark.read
      .parquet("/root/testdata/sf0.001/documents.parquet").limit(16)
    // base/copy groups plus the reversed-frame collage cohort: the
    // collage matches its base on every frame (n_matched = nf) but in
    // reverse temporal order (lis = 1)
    val media = Multimodal.dedupVideoMediaFromDocuments(docs)
      .unionByName(Multimodal.perturbedVideoCohortsFromDocuments(docs,
        Seq("reversed")))
    val all = Multimodal.videoNearDupPairs(media, minMatchedFrames = 2)
      .select("id_a", "id_b", "n_matched", "lis").collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> (r.getLong(2), r.getLong(3)))
      .toMap
    // pass-through: the collage PAIRS at full n_matched (set
    // similarity is deliberately order-blind) with lis collapsed to 1
    val collagePairs = all.filter(_._1._2 >= 5000000L)
    assert(collagePairs.nonEmpty)
    // vs its base/copy the collage shares all nf ≥ 3 frames; vs the
    // last-frame-replaced member nf−1 ≥ 2 — always reversed, so lis 1
    collagePairs.foreach { case (_, (nm, lis)) =>
      assert(nm >= 2L && lis === 1L)
    }
    // the knob: at minLisFrac 0.8 every collage pair is excluded and
    // every true near-dup pair survives, so clustering the filtered
    // pairs never merges a collage into its source's component
    val temporal = Multimodal.videoNearDupPairs(media,
        minMatchedFrames = 2, minLisFrac = 0.8)
      .select("id_a", "id_b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(temporal === all.keySet.filterNot(_._2 >= 5000000L))
    val comps = graft.ops.Dedup.connectedComponents(
        Multimodal.videoNearDupPairs(media, minMatchedFrames = 2,
          minLisFrac = 0.8).select("id_a", "id_b"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(!comps.keySet.exists(_ >= 5000000L),
      "a collage leaked into the cluster input")
  }

  test("videoAgainstIndex derives its band grid from the index and fails loud without it") {
    val docs = spark.read
      .parquet("/root/testdata/sf0.001/documents.parquet").limit(12)
    val media = Multimodal.dedupVideoMediaFromDocuments(docs)
    val index = Multimodal.videoFrameIndex(
      media.filter(col("media_id") % 4 === 0))
    // the perturbed cohort matches the frozen base through banding only
    val probe = Multimodal.perturbedVideoCohortsFromDocuments(docs,
      Seq("within"))
    val got = Multimodal.videoAgainstIndex(probe, index)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSet
    val expected = (0L until 3L).map { g =>
      val nf = 3L + g % 3
      (3000000L + g, 4 * g, nf, nf)
    }.toSet
    assert(got === expected)
    // an index frame without the frozen-radius metadata is refused —
    // never silently probed with a mismatched band grid
    val bare = Seq((0, 0L, 1L, 2L, 0)).toDF("band", "bits", "fh", "id", "pos")
    val e = intercept[IllegalArgumentException] {
      Multimodal.videoAgainstIndex(probe, bare)
    }
    assert(e.getMessage.contains("banding radius"))
  }
}
