package graft

import org.apache.spark.sql.functions._
import graft.ops.{Mining, Retrieval, Similarity}

/** Margin-based pair mining (Artetxe & Schwenk ratio margin) and
  * reciprocal-rank fusion, each checked against an independent in-test
  * replay of the published formula on the same vectors. */
class MiningSpec extends SparkSpec {
  import spark.implicits._

  // Deterministic pseudo-random float vectors (no RNG state shared with
  // the implementation; plain LCG).
  private def vecs(n: Int, dim: Int, seed: Long): Array[Array[Float]] = {
    var x = seed
    def next(): Float = {
      x = x * 6364136223846793005L + 1442695040888963407L
      ((x >>> 40).toInt % 1000) / 500.0f - 1.0f
    }
    Array.fill(n)(Array.fill(dim)(next())).map { v =>
      if (v.forall(_ == 0f)) { v(0) = 1f; v } else v
    }
  }

  private def ddot(a: Array[Float], b: Array[Float]): Double = {
    var s = 0.0; var i = 0
    while (i < a.length) { s += a(i).toDouble * b(i).toDouble; i += 1 }
    s
  }

  private def nano(c: Double): Long =
    BigDecimal(c * 1e9).setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong

  test("bitextMine replays the ratio-margin formula bit-for-bit") {
    val k = 3
    val va = vecs(12, 8, seed = 7)
    val vb = vecs(10, 8, seed = 99)
    val a = va.zipWithIndex.map { case (v, i) => (i.toLong, v) }
      .toSeq.toDF("vec_id", "embedding")
    val b = vb.zipWithIndex.map { case (v, i) => ((100 + i).toLong, v) }
      .toSeq.toDF("vec_id", "embedding")

    // Independent replay: exact double cosines, k-NN by (-cos, id),
    // nano-integer penalty sums, one fixed-shape margin expression.
    def cos(x: Array[Float], y: Array[Float]): Double =
      ddot(x, y) / (math.sqrt(ddot(x, x)) * math.sqrt(ddot(y, y)))
    def knn(qs: Seq[(Long, Array[Float])], cs: Seq[(Long, Array[Float])])
        : Map[Long, Seq[(Long, Double)]] =
      qs.map { case (qid, qv) =>
        qid -> cs.map { case (cid, cv) => (cid, cos(cv, qv)) }
          .sortBy { case (cid, c) => (-c, cid) }.take(k)
      }.toMap
    val aSeq = va.zipWithIndex.map { case (v, i) => (i.toLong, v) }.toSeq
    val bSeq = vb.zipWithIndex.map { case (v, i) => ((100 + i).toLong, v) }.toSeq
    val kab = knn(aSeq, bSeq)
    val kba = knn(bSeq, aSeq)
    val penA = kab.map { case (x, ns) => x -> ns.map(n => nano(n._2)).sum }
    val penB = kba.map { case (y, ns) => y -> ns.map(n => nano(n._2)).sum }
    val expected = kab.flatMap { case (x, ns) =>
      val best = ns.map { case (y, c) =>
        val m = c / ((penA(x).toDouble / (k * 1e9) +
          penB(y).toDouble / (k * 1e9)) / 2.0)
        (y, c, m)
      }.minBy { case (y, _, m) => (-m, y) }
      if (best._3 >= 1.0) Some(x -> best) else None
    }

    val got = Mining.bitextMine(a, b, k).collect()
      .map(r => r.getAs[Long]("src_id") ->
        ((r.getAs[Long]("dst_id"), r.getAs[Double]("cosine"),
          r.getAs[Double]("margin")))).toMap
    assert(got === expected)
    assert(got.nonEmpty)
  }

  test("margin demotes a hub: distinctive mutual pair outranks a universal neighbor") {
    // B contains a hub h that every A vector is fairly close to, plus one
    // partner p that matches a0 distinctly. Raw cosine would often pick h;
    // the margin criterion must pick p for a0 (cos(a0,p) is far above
    // a0's neighborhood average, while h's own high penalty demotes it).
    val a0 = Array(1f, 0f, 0f, 0f)
    val a1 = Array(0f, 1f, 0f, 0f)
    val a2 = Array(0f, 0f, 1f, 0f)
    val hub = Array(0.58f, 0.58f, 0.58f, 0.1f) // close to everything
    val p = Array(0.95f, 0.05f, 0f, 0.1f)      // distinctly a0's partner
    val far = Array(0f, 0f, 0.1f, 1f)
    val a = Seq((0L, a0), (1L, a1), (2L, a2)).toDF("vec_id", "embedding")
    val b = Seq((100L, hub), (101L, p), (102L, far)).toDF("vec_id", "embedding")
    val got = Mining.bitextMine(a, b, k = 2, minMargin = 0.0).collect()
      .map(r => r.getAs[Long]("src_id") -> r.getAs[Long]("dst_id")).toMap
    assert(got(0L) === 101L, s"a0 must pair with the distinctive partner, got $got")
  }

  test("id collision across collections is a coincidence, not an identity: pair (i, i) is minable") {
    // A and B each number their own rows from 0 — the normal case for two
    // independent corpora. a0's true partner is b0 with the SAME id 0;
    // a self-kNN id filter would silently make it unreachable.
    val a = Seq((0L, Array(1f, 0f, 0f)), (1L, Array(0f, 1f, 0f)))
      .toDF("vec_id", "embedding")
    val b = Seq((0L, Array(0.99f, 0.1f, 0f)), (1L, Array(0.1f, 0.99f, 0f)),
      (2L, Array(0f, 0f, 1f))).toDF("vec_id", "embedding")
    val exact = Mining.bitextMine(a, b, k = 2, minMargin = 0.0).collect()
      .map(r => r.getAs[Long]("src_id") -> r.getAs[Long]("dst_id")).toMap
    assert(exact(0L) === 0L && exact(1L) === 1L)
    val blocked = Mining.bitextMineBlocked(a, b, k = 2, nCells = 1,
        nprobe = 1, minMargin = 0.0).collect()
      .map(r => r.getAs[Long]("src_id") -> r.getAs[Long]("dst_id")).toMap
    assert(blocked === exact)
  }

  test("blocked miner with one cell equals the exact miner; guard refuses whale cells") {
    val va = vecs(12, 8, seed = 7)
    val vb = vecs(10, 8, seed = 99)
    val a = va.zipWithIndex.map { case (v, i) => (i.toLong, v) }
      .toSeq.toDF("vec_id", "embedding")
    val b = vb.zipWithIndex.map { case (v, i) => ((100 + i).toLong, v) }
      .toSeq.toDF("vec_id", "embedding")
    // nCells=1 → every pair is in the single cell: blocked ≡ exact.
    val exact = Mining.bitextMine(a, b, k = 3, minMargin = 0.0)
      .collect().map(_.toSeq).toSet
    val blocked = Mining.bitextMineBlocked(a, b, k = 3, nCells = 1,
      nprobe = 1, minMargin = 0.0).collect().map(_.toSeq).toSet
    assert(blocked === exact)
    val e = intercept[IllegalArgumentException](
      Mining.bitextMineBlocked(a, b, k = 3, nCells = 1, nprobe = 1,
        maxPairsPerCell = 10L))
    assert(e.getMessage.contains("Raise nCells"))
  }

  test("rrfFuse: exact nano-unit reciprocal-rank sums, overlap counted per system") {
    val lex = Seq((10L, 1L), (20L, 2L), (30L, 3L)).toDF("doc_id", "rank")
    val vec = Seq((20L, 1L), (40L, 2L)).toDF("doc_id", "rank")
    val got = Retrieval.rrfFuse(Seq(lex, vec), c = 60, topK = 10)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    def contrib(rank: Long): Long =
      BigDecimal(1e9 / (60 + rank)).setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong
    val expected = Seq(
      (20L, 2L, contrib(2) + contrib(1)),
      (10L, 1L, contrib(1)),
      (40L, 1L, contrib(2)),
      (30L, 1L, contrib(3)))
      .sortBy { case (id, _, s) => (-s, id) }
    assert(got.toSeq === expected)
  }

  test("rrfFuse refuses empty input and negative constant") {
    intercept[IllegalArgumentException](Retrieval.rrfFuse(Seq.empty))
    val r = Seq((1L, 1L)).toDF("doc_id", "rank")
    intercept[IllegalArgumentException](Retrieval.rrfFuse(Seq(r), c = -1))
  }

  test("asRanking ranks a shortlist by score desc with id tiebreak") {
    val df = Seq((5L, 100L), (6L, 300L), (7L, 100L)).toDF("doc_id", "s")
    val got = Retrieval.asRanking(df, "s").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(got === Map(6L -> 1L, 5L -> 2L, 7L -> 3L))
  }
}
