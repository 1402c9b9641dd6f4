package graft

import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop}
import org.scalacheck.rng.Seed

/** Property-based hardening of content-defined chunking: the native
  * CdcBoundaries expression against a DIRECT Scala interpreter of the cut
  * rule (and, transitively, against the builtin fold via Round8OpsSpec's
  * bit-identity test), plus the structural invariants every parameterization
  * must satisfy: cuts strictly ascend, end exactly at n, every chunk ≤
  * maxSize, every non-tail chunk that ends at a CANDIDATE cut ≥ minSize,
  * and a maxSize-forced cut appears wherever no candidate fit.
  *
  * All sampled docs are evaluated in ONE Spark job per parameter set.
  */
class CdcPropertySpec extends SparkSpec {
  import spark.implicits._

  // token pool small enough to make hash-candidate collisions common
  private val genDoc: Gen[List[String]] = for {
    n <- Gen.choose(0, 120)
    toks <- Gen.listOfN(n, Gen.oneOf((0 until 13).map(i => s"tk$i")))
  } yield toks

  /** Direct interpreter: chained-XXH64 window hash (the shingle-family
    * identity, replayed via the production static — the INTERPRETER under
    * test is the cut rule, not the hash) + the sequential cut fold. */
  private def oracle(toks: Array[String], w: Int, maskBits: Int,
      minSize: Int, maxSize: Int): Seq[Int] = {
    val n = toks.length
    if (n == 0) return Seq.empty
    val arr = new org.apache.spark.sql.catalyst.util.GenericArrayData(
      toks.map(org.apache.spark.unsafe.types.UTF8String.fromString))
    val mask = (1L << maskBits) - 1L
    // window hashes via the public shingle identity, computed ONCE per doc:
    // hash of tokens[e-w, e) = element (e-w) of shingleHashesAll(w)
    val all = graft.functions.VectorOps.shingleHashesAll(arr, w).toLongArray()
    val out = scala.collection.mutable.ArrayBuffer.empty[Int]
    var last = 0
    for (e <- 1 to n) {
      val len = e - last
      val cand = e >= w && (all(e - w) & mask) == 0L
      if ((cand && len >= minSize) || len >= maxSize) { out += e; last = e }
    }
    if (last != n) out += n
    out.toSeq
  }

  test("native CdcBoundaries matches the direct interpreter on 60 random docs × 3 parameter sets") {
    val docs = (0 until 60).map { i =>
      val doc = genDoc(Gen.Parameters.default, Seed(i.toLong)).get
      (i.toLong, doc.mkString(" "))
    }
    for ((w, mb, mn, mx) <- Seq((4, 3, 6, 24), (2, 2, 3, 12), (3, 4, 4, 40))) {
      val df = docs.toDF("doc_id", "text")
      val got = df.select(col("doc_id"),
          graft.functions.GraftFunctions.cdcBoundaries(
            graft.ops.TextAnalysis.tokens(col("text")), w, mb, mn, mx).as("b"))
        .collect().map(r => r.getLong(0) -> r.getSeq[Int](1)).toMap
      docs.foreach { case (id, text) =>
        // split(" +") of "" yields [""], matching the column tokenizer
        val toks = text.split(" +")
        val want = oracle(toks, w, mb, mn, mx)
        assert(got(id) === want, s"doc $id diverged at (w=$w,mb=$mb,$mn..$mx)")
        // structural invariants
        val b = got(id)
        assert(b.lastOption.forall(_ == toks.length))
        assert(b == b.sorted && b.distinct == b, "cuts must strictly ascend")
        val sizes = b.zip(0 +: b.dropRight(1)).map { case (e, s) => e - s }
        assert(sizes.forall(_ <= mx), "maxSize bound violated")
      }
    }
  }
}
