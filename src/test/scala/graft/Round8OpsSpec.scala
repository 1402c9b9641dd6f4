package graft

import org.apache.spark.sql.functions._
import graft.ops.{Dedup, Similarity, TextAnalysis}

/** Round-8 operators: filtered ANN (metadata predicate below the
  * shortlist), vocabulary coverage / OOV stats, content-defined chunking,
  * and asymmetric containment dedup. */
class Round8OpsSpec extends SparkSpec {
  import spark.implicits._

  /** Deterministic pseudo-random unit-ish vector per (id, dim). */
  private def vec(id: Int, dim: Int): Array[Float] =
    Array.tabulate(dim) { d =>
      val z = (id * 131L + d * 31L + 7L) * 0x9e3779b97f4a7c15L
      ((z >>> 20) % 1000L).toFloat / 1000f - 0.5f
    }

  private def embFrame(n: Int, dim: Int = 8) =
    (0 until n).map(i => (i.toLong, vec(i, dim), i % 3))
      .toDF("vec_id", "embedding", "label")

  // ---- Filtered ANN ----

  test("filteredKnn: equals per-label bruteForceKnn, never crosses the predicate") {
    val emb = embFrame(60)
    val q = emb.filter(col("vec_id") < 6)
    val got = Similarity.filteredKnn(emb, q, k = 4)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getDouble(3)))
      .sortBy(x => (x._1, x._2))
    // reference: run unfiltered brute kNN inside each label slice
    val want = (0 until 3).flatMap { lab =>
      val slice = emb.filter(col("label") === lab)
      Similarity.bruteForceKnn(slice, slice.filter(col("vec_id") < 6), k = 4)
        .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getDouble(3)))
    }.sortBy(x => (x._1, x._2))
    assert(got === want)
    // and every neighbor really satisfies the predicate
    val labels = emb.select("vec_id", "label").as[(Long, Int)].collect().toMap
    got.foreach { case (qid, _, cid, _) =>
      assert(labels(qid) === labels(cid), s"pair ($qid,$cid) crosses labels")
    }
  }

  test("filteredKnn: post-filtering an unfiltered shortlist is NOT equivalent (the failure mode this op exists to avoid)") {
    val emb = embFrame(60)
    val q = emb.filter(col("vec_id") < 6)
    val post = Similarity.bruteForceKnn(emb, q, k = 4)
      .join(emb.select(col("vec_id").as("corpus_id"), col("label").as("_cl")), "corpus_id")
      .join(emb.select(col("vec_id").as("query_id"), col("label").as("_ql")), "query_id")
      .filter(col("_cl") === col("_ql"))
    // the post-filter form starves: fewer than k survivors for some query
    val counts = post.groupBy("query_id").count().as[(Long, Long)].collect().toMap
    assert(counts.values.exists(_ < 4),
      "expected at least one starved query under post-filtering")
    // while the filtered op returns exactly k everywhere (corpus slices are big enough)
    val full = Similarity.filteredKnn(emb, q, k = 4)
      .groupBy("query_id").count().as[(Long, Long)].collect().toMap
    assert(full.values.forall(_ === 4))
  }

  test("filteredIvfKnn: exhaustive probes reproduce filteredKnn exactly; partial probes stay inside the predicate") {
    val emb = embFrame(90)
    val q = emb.filter(col("vec_id") < 6)
    val exact = Similarity.filteredKnn(emb, q, k = 3)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).sorted
    val ivfAll = Similarity.filteredIvfKnn(emb, q, k = 3, nCells = 4, nprobe = 4)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).sorted
    assert(ivfAll === exact) // nprobe = nCells ⇒ no pruning ⇒ identical
    val labels = emb.select("vec_id", "label").as[(Long, Int)].collect().toMap
    val pruned = Similarity.filteredIvfKnn(emb, q, k = 3, nCells = 4, nprobe = 2)
      .collect().map(r => (r.getLong(0), r.getLong(2)))
    pruned.foreach { case (qid, cid) =>
      assert(labels(qid) === labels(cid), s"pruned pair ($qid,$cid) crosses labels")
    }
  }

  test("hardNegatives: top-k cross-label by cosine, exact; null labels count as different") {
    val emb = embFrame(60)
    val got = Similarity.hardNegatives(emb, emb.filter(col("vec_id") < 5), k = 4)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getDouble(3)))
      .sortBy(x => (x._1, x._2))
    // driver recompute: per query, rank all different-label rows by cosine
    val rows = emb.collect().map(r => (r.getLong(0),
      r.getSeq[Float](1).toArray, r.getInt(2)))
    def cos(a: Array[Float], b: Array[Float]): Double = {
      val d = a.zip(b).map { case (x, y) => x.toDouble * y.toDouble }.sum
      d / (math.sqrt(a.map(x => x.toDouble * x).sum) *
        math.sqrt(b.map(x => x.toDouble * x).sum))
    }
    val want = rows.filter(_._1 < 5).flatMap { case (qid, qv, ql) =>
      rows.filter(_._3 != ql)
        .map { case (cid, cv, _) => (qid, cid, cos(cv, qv)) }
        .sortBy { case (_, cid, c) => (-c, cid) }.take(4).zipWithIndex
        .map { case ((q2, cid, c), i) => (q2, i + 1, cid, c) }
    }.sortBy(x => (x._1, x._2))
    assert(got.map(x => (x._1, x._2, x._3)) === want.map(x => (x._1, x._2, x._3)))
    got.zip(want).foreach { case (g, w) => assert(math.abs(g._4 - w._4) < 1e-12) }
    // a NULL corpus label is a valid negative for a labeled query
    val withNull = emb.withColumn("label",
      when(col("vec_id") === 59L, lit(null)).otherwise(col("label")))
    val nullRes = Similarity.hardNegatives(withNull,
        withNull.filter(col("vec_id") < 1), k = 60)
      .filter(col("corpus_id") === 59L).count()
    assert(nullRes === 1L, "null-label corpus row must count as different")
  }

  // ---- Vocabulary coverage ----

  test("vocabCoverage: deterministic top-N vocab with tie-break, exact per-doc OOV counts") {
    val df = Seq(
      (1L, "a a a b b c"),   // freq: a=3(+2 below)=5? no — corpus-wide counts
      (2L, "a a b z q"),
      (3L, "c c b")
    ).toDF("doc_id", "text")
    // corpus counts: a=5, b=4, c=3, z=1, q=1 → vocab(3) = {a, b, c}
    val got = TextAnalysis.vocabCoverage(df, vocabSize = 3)
      .orderBy("doc_id")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    assert(got === Array(
      (1L, 6L, 0L, 0.0),
      (2L, 5L, 2L, 0.4),
      (3L, 3L, 0L, 0.0)))
    // vocab boundary tie: size 4 must pick q over z? counts equal (1,1) →
    // tie-break token-ASC picks 'q' before 'z'
    val got4 = TextAnalysis.vocabCoverage(df, vocabSize = 4)
      .filter(col("doc_id") === 2L)
      .collect().map(r => (r.getLong(2))).head
    assert(got4 === 1L) // 'z' still OOV, 'q' now in-vocab
  }

  test("pmiCollocations: glued pairs rank above independent pairs; exact micro-nat values; minCount floors") {
    // "aa bb" always adjacent (perfect collocation); "cc"/"dd" appear often
    // but never adjacent to each other; "ee ff" appears once (hapax —
    // floored out even though its PMI would be maximal).
    val docs = (
      (0 until 10).map(i => (i.toLong, "aa bb cc xx dd yy")) :+
      (10L, "ee ff cc dd") // one cc-dd adjacency, and the hapax pair
    ).toDF("doc_id", "text")
    val got = graft.ops.Retrieval.pmiCollocations(docs, k = 50, minCount = 2)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    val byName = got.map(x => x._1 -> x).toMap
    assert(!byName.contains("ee ff"), "hapax pair must be floored out")
    assert(byName.contains("aa bb") && byName("aa bb")._2 === 10L)
    // exact replay of the formula for "aa bb":
    // N = 6*10+4 = 64 tokens, Nb = 5*10+3 = 53 bigrams, c_xy=10, c_aa=c_bb=10
    val expect = math.round(math.log(
      (10.0 * 64 * 64) / (53.0 * 10 * 10)) * 1e6)
    assert(byName("aa bb")._3 === expect)
    // the perfect collocation outranks every cross pair of frequent tokens
    val ranks = got.map(_._1).zipWithIndex.toMap
    assert(ranks("aa bb") < ranks.getOrElse("cc xx", Int.MaxValue))
  }

  test("fitVocab + oovAgainst ≡ vocabCoverage (the fit/apply split is exact)") {
    val df = Seq(
      (1L, "a a a b b c"), (2L, "a a b z q"), (3L, "c c b")
    ).toDF("doc_id", "text")
    val vocab = TextAnalysis.fitVocab(df, vocabSize = 3)
    assert(vocab === Seq("a", "b", "c"))
    val applied = TextAnalysis.oovAgainst(df, vocab).orderBy("doc_id")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    val joined = TextAnalysis.vocabCoverage(df, vocabSize = 3).orderBy("doc_id")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    assert(applied === joined)
  }

  // ---- Content-defined chunking ----

  private def tokenDoc(id: Long, toks: Seq[String]) = (id, toks.mkString(" "))

  test("cdcChunks: chunks tile the document, respect min/max bounds, deterministic") {
    val words = Array.tabulate(400)(i =>
      "w" + ((i * 2654435761L) % 97L)) // content-varied token stream
    val df = Seq(tokenDoc(1L, words.toSeq)).toDF("doc_id", "text")
    val ch = TextAnalysis.cdcChunks(df, w = 4, maskBits = 3, minSize = 6,
        maxSize = 24)
      .orderBy("chunk_id")
      .collect().map(r => (r.getLong(1), r.getLong(2), r.getString(3)))
    val sizes = ch.map(_._2)
    assert(sizes.sum === 400L, "chunks must tile the token stream")
    assert(sizes.forall(_ <= 24L), "maxSize bound violated")
    assert(sizes.dropRight(1).forall(_ >= 6L), "minSize bound violated (non-tail)")
    assert(ch.map(_._1) === ch.indices.map(_.toLong).toArray, "dense chunk ids")
    // deterministic: a second run bit-agrees
    val again = TextAnalysis.cdcChunks(df, w = 4, maskBits = 3, minSize = 6,
        maxSize = 24).orderBy("chunk_id")
      .collect().map(r => (r.getLong(1), r.getLong(2), r.getString(3)))
    assert(again === ch)
  }

  test("cdcChunks: boundaries resynchronize after a prefix edit (the CDC property fixed-stride chunking lacks)") {
    val words = Array.tabulate(400)(i => "w" + i) // all-distinct tokens
    val a = Seq(tokenDoc(1L, words.toSeq)).toDF("doc_id", "text")
    val b = Seq(tokenDoc(1L, "INS1 INS2 INS3" .split(" ").toSeq ++ words))
      .toDF("doc_id", "text")
    def md5s(df: org.apache.spark.sql.DataFrame) =
      TextAnalysis.cdcChunks(df, w = 4, maskBits = 3, minSize = 6, maxSize = 24)
        .select("chunk_md5").as[String].collect().toSet
    val shared = md5s(a) intersect md5s(b)
    assert(shared.size >= 5,
      s"expected suffix chunks to resynchronize, got ${shared.size} shared")
    // fixed-stride chunking shares NOTHING after a 3-token prefix shift
    def strideMd5s(df: org.apache.spark.sql.DataFrame) =
      TextAnalysis.chunks(df, size = 16, stride = 16)
        .select("chunk_md5").as[String].collect().toSet
    assert((strideMd5s(a) intersect strideMd5s(b)).isEmpty)
  }

  test("native CdcBoundaries ≡ the builtin fold composition (bit-identical cuts)") {
    val docs = Seq(
      (1L, Array.tabulate(400)(i => "w" + ((i * 2654435761L) % 97L)).mkString(" ")),
      (2L, "only three tokens"),
      (3L, "a"),
      (4L, (0 until 50).map(i => "x" + i).mkString(" "))
    ).toDF("doc_id", "text")
    for ((w, mb, mn, mx) <- Seq((4, 3, 6, 24), (2, 2, 3, 12), (5, 4, 8, 64))) {
      val base = docs.select(col("doc_id"),
        graft.ops.TextAnalysis.tokens(col("text")).as("_t"))
      val native = base.select(col("doc_id"),
          graft.functions.GraftFunctions.cdcBoundaries(col("_t"), w, mb, mn, mx)
            .as("b"))
        .orderBy("doc_id").collect().map(r => (r.getLong(0), r.getSeq[Int](1)))
      val fold = base.select(col("doc_id"),
          graft.ops.TextAnalysis.cdcBoundariesFold(col("_t"), w, mb, mn, mx)
            .as("b"))
        .orderBy("doc_id").collect().map(r => (r.getLong(0), r.getSeq[Int](1)))
      assert(native === fold, s"divergence at (w=$w, maskBits=$mb, $mn..$mx)")
    }
    // a genuinely EMPTY token array (unreachable via tokens(), which maps
    // "" to [""]) must yield no boundaries in BOTH forms — Spark's
    // sequence(1, 0) steps DOWN, so the fold needs (and has) an n >= 1
    // guard against two phantom positions
    val empty = Seq(Tuple1(Seq.empty[String])).toDF("_t")
    val nEmpty = empty.select(
        graft.functions.GraftFunctions.cdcBoundaries(col("_t"), 4, 3, 4, 24)
          .as("b")).head().getSeq[Int](0)
    val fEmpty = empty.select(
        graft.ops.TextAnalysis.cdcBoundariesFold(col("_t"), 4, 3, 4, 24)
          .as("b")).head().getSeq[Int](0)
    assert(nEmpty.isEmpty && fEmpty.isEmpty)
  }

  test("cdcChunks: short docs yield one chunk; parameter validation is loud") {
    val df = Seq((1L, "only three tokens")).toDF("doc_id", "text")
    val ch = TextAnalysis.cdcChunks(df, w = 4, maskBits = 4, minSize = 8,
        maxSize = 64)
      .collect().map(r => (r.getLong(1), r.getLong(2)))
    assert(ch === Array((0L, 3L)))
    val e = intercept[IllegalArgumentException](
      TextAnalysis.cdcChunks(df, minSize = 10, maxSize = 5))
    assert(e.getMessage.contains("minSize"))
  }

  test("cdcSharedChunkStats: exact dups share all chunks, prefix-edited docs share some, internal repeats are not 'shared'") {
    val base = (0 until 120).map(i => "u" + i)
    val docs = Seq(
      (1L, base.mkString(" ")),                              // original
      (2L, base.mkString(" ")),                              // exact dup of 1
      (3L, (Seq("EDIT1", "EDIT2") ++ base.drop(1)).mkString(" ")), // prefix edit
      (4L, (0 until 120).map(i => "v" + i).mkString(" ")),   // unique content
      (5L, {                                                 // internal repeat, unique corpus-wide
        val piece = (0 until 40).map(i => "r" + i)
        (piece ++ piece ++ piece).mkString(" ")
      })
    ).toDF("doc_id", "text")
    val got = TextAnalysis.cdcSharedChunkStats(docs,
        w = 4, maskBits = 3, minSize = 4, maxSize = 24)
      .orderBy("doc_id")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
      .map(x => x._1 -> x).toMap
    assert(got(1L)._4 === 1.0, "exact dup must share every chunk")
    assert(got(2L)._4 === 1.0)
    assert(got(3L)._4 > 0.0 && got(3L)._4 < 1.0,
      s"prefix-edited doc should share a proper subset, got ${got(3L)._4}")
    assert(got(4L)._3 === 0L, "unique content shares nothing")
    assert(got(5L)._3 === 0L,
      "a doc repeating its OWN chunk is not shared (distinct-pair semantics)")
  }

  test("interEventGaps + activityMatrix: hand-computed bands and grid cells") {
    val df = Seq(
      // trail u1: gaps 30 (lt_1m), 3570 (1m_1h), 86400 (ge_1d)
      ("u1", 1000L, "a", "", 1L), ("u1", 1030L, "a", "", 2L),
      ("u1", 4600L, "a", "", 3L), ("u1", 91000L, "a", "", 4L),
      // trail u2: single event — contributes no gap
      ("u2", 50L, "b", "", 1L)
    ).toDF("uuid", "time", "event_type", "props", "seq")
    val gaps = graft.agg.Cohorts.interEventGaps(df).orderBy("gap_band")
      .as[(String, Long)].collect()
    assert(gaps === Array(("1m_1h", 1L), ("ge_1d", 1L), ("lt_1m", 1L)))
    // epoch day 0 = Thursday → dow 4: times 50/1000/1030 land in hour 0,
    // 4600 in hour 1; 91000 = day 1 (Friday, dow 5) second 4600 → hour 1
    val grid = graft.agg.Cohorts.activityMatrix(df).orderBy("dow", "hour")
      .as[(Long, Long, Long)].collect()
    assert(grid === Array((4L, 0L, 3L), (4L, 1L, 1L), (5L, 1L, 1L)))
  }

  // ---- Containment dedup ----

  test("clusterSafeSplit: no dedup cluster straddles train/eval; singletons split independently") {
    import org.apache.spark.sql.DataFrame
    val docs = (0 until 40).map { i =>
      // pairs (0,1), (2,3), ... share text → same cluster
      (i.toLong, s"grp${i / 2} " + (0 until 10).map(j => s"t${i / 2}_$j").mkString(" "))
    }.toDF("doc_id", "text")
    val clusters = Dedup.dedupClusters(docs,
      Dedup.ngramJaccardPairs(docs, k = 3, threshold = 0.5))
    val split = Dedup.clusterSafeSplit(docs, clusters, evalFrac = 0.5)
    val perCluster = split.groupBy("cluster_id")
      .agg(countDistinct("split").as("sides")).as[(Long, Long)].collect()
    assert(perCluster.forall(_._2 === 1L), "a cluster straddled the split")
    // both sides are populated at evalFrac = 0.5 over 20 clusters
    val sides = split.select("split").distinct().as[String].collect().toSet
    assert(sides === Set("train", "eval"))
    // docs absent from the cluster frame fall back to singleton clusters
    val extra = Seq((1000L, "completely new text here")).toDF("doc_id", "text")
    val s2 = Dedup.clusterSafeSplit(extra, clusters.limit(0), evalFrac = 0.5)
      .select("cluster_id").as[Long].collect()
    assert(s2 === Array(1000L))
  }

  test("containmentPairs: finds a doc embedded in a doc that Jaccard misses") {
    val short = (0 until 6).map(i => s"tok$i").mkString(" ")
    val long = ((0 until 6) ++ (100 until 160)).map(i => s"tok$i").mkString(" ")
    val other = (200 until 230).map(i => s"tok$i").mkString(" ")
    val df = Seq((1L, short), (2L, long), (3L, other)).toDF("doc_id", "text")
    val cont = Dedup.containmentPairs(df, k = 3, threshold = 0.9)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(5)))
    assert(cont === Array((1L, 2L, 1.0))) // short's shingles all inside long
    // symmetric Jaccard at the same cut finds nothing: 4/(4+64-4) ≈ 0.06
    val jac = Dedup.ngramJaccardPairs(df, k = 3, threshold = 0.5).count()
    assert(jac === 0L)
  }

  test("containmentPairsPrefix ≡ containmentPairs (the prefix filter loses nothing, at any threshold)") {
    // mixed corpus: exact dup, short-in-long embedding, overlapping and
    // disjoint docs — plus unequal-size containment the prefix bound must
    // not miss (B hits only a t-fraction of A, scattered anywhere in B).
    val docs = ((0 until 15).map { i =>
      val toks = (0 until 24).map(j => "t" + ((i * 5 + j * 2) % 41))
      (i.toLong, toks.mkString(" "))
    } ++ Seq(
      (100L, (0 until 8).map(i => s"emb$i").mkString(" ")),
      (101L, ((0 until 8).map(i => s"emb$i") ++
        (0 until 60).map(i => s"pad$i")).mkString(" ")),
      (102L, ((0 until 6).map(i => s"emb$i") ++
        (200 until 230).map(i => s"oth$i")).mkString(" "))
    )).toDF("doc_id", "text")
    for (t <- Seq(0.3, 0.6, 0.9)) {
      val exact = Dedup.containmentPairs(docs, k = 3, threshold = t)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
          r.getLong(3), r.getLong(4), r.getDouble(5))).sorted
      val prefix = Dedup.containmentPairsPrefix(docs, k = 3, threshold = t)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
          r.getLong(3), r.getLong(4), r.getDouble(5))).sorted
      assert(prefix === exact, s"divergence at threshold $t")
      assert(t > 0.85 || exact.nonEmpty, s"test corpus yields no pairs at $t")
    }
  }

  test("containmentPairsPrefix ≡ containmentPairs on random corpora at random thresholds") {
    // The ADVICE bug class was a threshold-dependent prefix under-sizing
    // invisible to fixed-threshold tests — so sweep SEEDED random corpora
    // (shared shingle pools force overlap, variable doc lengths hit many
    // (1−t)·sz residues) against random thresholds including exact
    // tenths (the integer-boundary-prone values).
    val rnd = new scala.util.Random(97)
    for (round <- 0 until 3) {
      val pool = (0 until 60).map(i => s"w$i")
      val bases = (0 until 15).map { d =>
        val n = 8 + rnd.nextInt(30)
        (0 until n).map(_ => pool(rnd.nextInt(pool.length)))
      }
      // half the corpus is random; half is EDITS of earlier docs
      // (prefix/suffix trims, insertions) — real containment pairs at
      // many different (1−t)·sz residues
      val docs = (bases.zipWithIndex.map { case (t, i) =>
        (i.toLong, t.mkString(" "))
      } ++ bases.take(10).zipWithIndex.map { case (t, i) =>
        val drop = rnd.nextInt(math.max(1, t.length / 3))
        val extra = (0 until rnd.nextInt(8)).map(_ => s"x${i}_${rnd.nextInt(99)}")
        ((100 + i).toLong, (t.drop(drop) ++ extra).mkString(" "))
      }).toDF("doc_id", "text")
      val t = Seq(0.3, 0.4, 0.5, 0.6, 0.7, 0.8, 0.9,
        0.25 + rnd.nextDouble() * 0.7)(rnd.nextInt(8))
      val exact = Dedup.containmentPairs(docs, k = 3, threshold = t)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sorted
      val prefix = Dedup.containmentPairsPrefix(docs, k = 3, threshold = t)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sorted
      assert(prefix === exact,
        s"round $round t=$t: prefix ${prefix.length} vs exact ${exact.length}")
      assert(exact.nonEmpty || t > 0.75,
        s"round $round t=$t: corpus produced no pairs — test has no teeth")
    }
  }

  test("containmentPairsPrefix: exact integer (1-t)·sz boundary, rarest shingle missed") {
    // Engineered for the FP under-sizing bug: t=0.9, A has exactly 10
    // distinct shingles, B holds exactly 9 of them (containment 9/10 = t,
    // (1-t)·sz = 1 a mathematical integer), and the ONE shingle B misses
    // (x1 x2 x3) is corpus-rarest (df=1 — every shared shingle has df=2,
    // B's pads are B-only). A one-element prefix is exactly that missed
    // shingle, so the buggy ⌊(1-t)·sz⌋+1 = 1 sizing silently drops the
    // pair; the integer-exact sizing keeps sz-⌈t·sz⌉+1 = 2 entries.
    val aToks = (1 to 12).map(i => s"x$i")           // 10 distinct shingles
    val bToks = (2 to 12).map(i => s"x$i") ++        // 9 of A's shingles
      (1 to 62).map(i => s"p$i")                     // B-only padding
    val docs = Seq((1L, aToks.mkString(" ")), (2L, bToks.mkString(" ")))
      .toDF("doc_id", "text")
    val t = 0.9
    val exact = Dedup.containmentPairs(docs, k = 3, threshold = t)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(5)))
    assert(exact === Array((1L, 2L, 0.9)), "corpus not at the boundary")
    val prefix = Dedup.containmentPairsPrefix(docs, k = 3, threshold = t)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(5)))
    assert(prefix === exact,
      "prefix filter dropped the boundary pair — prefix under-sized")
  }

  test("normalizeText: lowercase, collapse whitespace, trim — pure and idempotent") {
    val df = Seq(
      (1L, "  Hello   WORLD \t x "),
      (2L, "already normal"),
      (3L, "")
    ).toDF("doc_id", "text")
    val got = df.select(col("doc_id"),
        TextAnalysis.normalizeText(col("text")).as("n"))
      .orderBy("doc_id").as[(Long, String)].collect()
    assert(got === Array((1L, "hello world x"), (2L, "already normal"), (3L, "")))
    val twice = df.select(TextAnalysis.normalizeText(
        TextAnalysis.normalizeText(col("text"))).as("n"))
      .orderBy("n").as[String].collect()
    assert(twice.sorted === got.map(_._2).sorted)
  }

  test("containmentPairs: counts match a driver-side exact recomputation") {
    val docs = (0 until 12).map { i =>
      val toks = (0 until 20).map(j => "t" + ((i * 7 + j * 3) % 31))
      (i.toLong, toks.mkString(" "))
    }
    val df = docs.toDF("doc_id", "text")
    def shingleSet(text: String, k: Int): Set[String] =
      text.split(" +").sliding(k).map(_.mkString(" ")).toSet
    val sets = docs.map { case (id, t) => id -> shingleSet(t, 3) }.toMap
    val want = (for {
      a <- sets.keys; b <- sets.keys if a < b
      shared = (sets(a) intersect sets(b)).size
      c = shared.toDouble / math.min(sets(a).size, sets(b).size)
      if c >= 0.3
    } yield (a, b, shared.toLong, c)).toSeq.sorted
    val got = Dedup.containmentPairs(df, k = 3, threshold = 0.3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(5)))
      .toSeq.sorted
    assert(got === want)
  }
}
