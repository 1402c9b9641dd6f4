package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

import scala.collection.mutable.ArrayBuffer

/** BPE vocabulary training (Sennrich et al., ACL'16) as Spark jobs — the
  * tokenizer-training pass of a pre-training pipeline, shaped for scale:
  *
  *  - The CORPUS is touched exactly once: one scan + one shuffle builds the
  *    word-frequency table (the classic trainer's in-memory dict).
  *  - Every merge round then runs on that vocab-sized table only: adjacent
  *    symbol-pair counts weighted by word frequency (flatMap + hash
  *    aggregate with map-side combine), a 1-row driver argmax with a total
  *    (count desc, pair asc) tie-break, and a typed per-word merge map.
  *    Per-round localCheckpoints stop the plan lineage from growing with
  *    the number of merges.
  *
  * Pair occurrences are counted at every adjacent position (overlaps
  * included, e.g. "aaa" contributes (a,a) twice); a merge applies
  * left-to-right non-overlapping within each word ("aaa" + merge (a,a) →
  * ["aa","a"]) — the classic trainer's rules. Deterministic end to end:
  * integer counts, total-ordered argmax, content-derived everything.
  *
  * The distributed core (pair counting over the word table) is
  * DuckDB-oracled via `d_bpe_pairs` (round-1 counts are engine-replayable);
  * the multi-round loop is spec-proven against a hand-computed reference —
  * later rounds depend on earlier argmaxes, which plain SQL cannot replay.
  */
object Bpe {

  final case class BpeMerge(round: Int, sym_l: String, sym_r: String, count: Long)

  /** Word-frequency table with words split into initial (character)
    * symbols: the one corpus pass. */
  def wordSymbols(docs: DataFrame, textCol: String = "text"): Dataset[(Seq[String], Long)] = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(explode(TextAnalysis.tokens(col(textCol))).as("w"))
      .groupBy("w").agg(count(lit(1)).as("f"))
      .as[(String, Long)]
      .map { case (w, f) => (w.map(_.toString): Seq[String], f) }
  }

  /** Frequency-weighted adjacent symbol-pair counts over the word table. */
  def pairCounts(words: Dataset[(Seq[String], Long)]): DataFrame = {
    val spark = words.sparkSession
    import spark.implicits._
    words.flatMap { case (syms, f) =>
      if (syms.length < 2) Iterator.empty
      else syms.iterator.zip(syms.iterator.drop(1)).map(p => (p._1, p._2, f))
    }.toDF("sym_l", "sym_r", "f")
      .groupBy("sym_l", "sym_r").agg(sum("f").as("cnt"))
  }

  /** Left-to-right non-overlapping application of one merge to a word. */
  private[graft] def applyMerge(syms: Seq[String], a: String, b: String): Seq[String] = {
    val out = ArrayBuffer.empty[String]
    var i = 0
    while (i < syms.length) {
      if (i + 1 < syms.length && syms(i) == a && syms(i + 1) == b) {
        out += a + b; i += 2
      } else { out += syms(i); i += 1 }
    }
    out.toSeq
  }

  /** Train `merges` BPE merge rules; stops early when no pair occurs at
    * least `minCount` times. Returns the merge table in training order. */
  def train(docs: DataFrame, merges: Int, minCount: Long = 2,
      textCol: String = "text"): Seq[BpeMerge] = {
    require(merges > 0, s"merges must be positive, got $merges")
    val spark = docs.sparkSession
    import spark.implicits._
    var words = wordSymbols(docs, textCol).localCheckpoint()
    val out = ArrayBuffer.empty[BpeMerge]
    var r = 1
    var done = false
    while (r <= merges && !done) {
      val top = pairCounts(words)
        .orderBy(col("cnt").desc, col("sym_l"), col("sym_r"))
        .head(1)
      top.headOption match {
        case Some(row) if row.getLong(2) >= minCount =>
          val (a, b, c) = (row.getString(0), row.getString(1), row.getLong(2))
          out += BpeMerge(r, a, b, c)
          words = words.map { case (syms, f) => (applyMerge(syms, a, b), f) }
            .localCheckpoint()
        case _ => done = true
      }
      r += 1
    }
    out.toSeq
  }

  /** Segment a text column with a trained merge list: applies the rules
    * in training order per word, then emits the subword sequence. The
    * encode-side twin of [[train]], a pure projection over the corpus —
    * and the pass that touches EVERY corpus byte at 100 TB, so it is the
    * native codegen'd [[graft.functions.BpeEncode]] expression (round 8;
    * the Scala-UDF form it replaces paid boxed conversion per document
    * and lives on as [[segmentUdf]] for the equivalence spec). NULL text
    * yields an empty subword array (the UDF contract). */
  def segment(docs: DataFrame, merges: Seq[BpeMerge], textCol: String = "text",
      outCol: String = "subwords"): DataFrame = {
    val flat = merges.sortBy(_.round).flatMap(m => Seq(m.sym_l, m.sym_r))
    docs.withColumn(outCol, coalesce(
      graft.functions.GraftFunctions.bpeEncode(
        TextAnalysis.tokens(col(textCol)), flat),
      typedLit(Seq.empty[String])))
  }

  /** The Scala-UDF twin of [[segment]] — kept as the independent
    * formulation the equivalence spec pins the native expression to. */
  private[graft] def segmentUdf(docs: DataFrame, merges: Seq[BpeMerge],
      textCol: String = "text", outCol: String = "subwords"): DataFrame = {
    val rules = merges.sortBy(_.round).map(m => (m.sym_l, m.sym_r))
    val seg = udf { (text: String) =>
      if (text == null) Seq.empty[String]
      else text.split(" +").filter(_.nonEmpty).toSeq.flatMap { w =>
        rules.foldLeft(w.map(_.toString): Seq[String]) {
          case (syms, (a, b)) => applyMerge(syms, a, b)
        }
      }
    }
    docs.withColumn(outCol, seg(col(textCol)))
  }
}
