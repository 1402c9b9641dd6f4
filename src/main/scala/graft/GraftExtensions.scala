package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

import graft.functions.{DotF64, MinHashSig, RepetitionStats, ShingleHashes, SimHash64, Winnow, ZOrder2}

/** SparkSessionExtensions entry point: registers graft's native
  * expressions for SQL use. Enable with
  * `.config("spark.sql.extensions", "graft.GraftExtensions")` or
  * `.withExtensions(new GraftExtensions)` — then e.g.
  * `SELECT simhash64(split(text, ' ')) FROM docs` or
  * `SELECT dot_f64(a.embedding, b.embedding)` work in plain SQL.
  * Int-literal parameters (num hashes, window, k) are passed as SQL
  * integer literals: `minhash_sig(shingle_hashes(split(text,' '), 3), 64)`.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  private def intLit(e: Expression, what: String): Int = e match {
    case org.apache.spark.sql.catalyst.expressions.Literal(v: Int, _) => v
    case other => throw new IllegalArgumentException(
      s"$what must be an integer literal, got $other")
  }

  override def apply(ext: SparkSessionExtensions): Unit = {
    // Whole-operator contribution: the co-partitioned streaming-merge
    // AS-OF join (graft.plans.AsOfJoinNode → AsOfJoinExec).
    ext.injectPlannerStrategy(_ => graft.plans.AsOfJoinStrategy)
    // Metadata-only aggregates over finalized dbs answer from the
    // _graft_info.json sidecar instead of scanning (reference: info file,
    // src/tdb.c:677-700).
    ext.injectOptimizerRule(graft.plans.MetadataOnlyAggRule(_))
    ext.injectFunction((
      FunctionIdentifier("simhash64"),
      new ExpressionInfo(classOf[SimHash64].getName, "simhash64"),
      (children: Seq[Expression]) => SimHash64(children.head)))
    ext.injectFunction((
      FunctionIdentifier("dot_f64"),
      new ExpressionInfo(classOf[DotF64].getName, "dot_f64"),
      (children: Seq[Expression]) => DotF64(children(0), children(1))))
    ext.injectFunction((
      FunctionIdentifier("minhash_sig"),
      new ExpressionInfo(classOf[MinHashSig].getName, "minhash_sig"),
      (children: Seq[Expression]) =>
        MinHashSig(children(0), intLit(children(1), "numHashes"))))
    ext.injectFunction((
      FunctionIdentifier("shingle_hashes"),
      new ExpressionInfo(classOf[ShingleHashes].getName, "shingle_hashes"),
      (children: Seq[Expression]) =>
        ShingleHashes(children(0), intLit(children(1), "k"))))
    ext.injectFunction((
      FunctionIdentifier("winnow"),
      new ExpressionInfo(classOf[Winnow].getName, "winnow"),
      (children: Seq[Expression]) =>
        Winnow(children(0), intLit(children(1), "window"))))
    ext.injectFunction((
      FunctionIdentifier("repetition_stats"),
      new ExpressionInfo(classOf[RepetitionStats].getName, "repetition_stats"),
      (children: Seq[Expression]) => RepetitionStats(children.head)))
    ext.injectFunction((
      FunctionIdentifier("z_order2"),
      new ExpressionInfo(classOf[ZOrder2].getName, "z_order2"),
      (children: Seq[Expression]) => ZOrder2(children(0), children(1))))
  }
}
