package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

import graft.functions.{CdcBoundaries, DotF64, MinHashSig, RepetitionStats, ShingleHashes, SignLsh, SimHash64, Winnow, ZOrder2}

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

  override def apply(ext: SparkSessionExtensions): Unit = {
    // Whole-operator contribution: the co-partitioned streaming-merge
    // AS-OF join (graft.plans.AsOfJoinNode → AsOfJoinExec).
    ext.injectPlannerStrategy(_ => graft.plans.AsOfJoinStrategy)
    // Metadata-only aggregates over finalized dbs answer from the
    // _graft_info.json sidecar instead of scanning (reference: info file,
    // src/tdb.c:677-700).
    ext.injectOptimizerRule(graft.plans.MetadataOnlyAggRule(_))
    GraftExtensions.functions.foreach(ext.injectFunction)
  }
}

object GraftExtensions {

  private def intLit(e: Expression, what: String): Int = e match {
    case org.apache.spark.sql.catalyst.expressions.Literal(v: Int, _) => v
    case other => throw new IllegalArgumentException(
      s"$what must be an integer literal, got $other")
  }

  /** Wrong arity must surface as the same AnalysisException Spark's
    * built-in registry raises (WRONG_NUM_ARGS, sqlState 42605) — an
    * unchecked `children(1)` would leak IndexOutOfBoundsException through
    * the analyzer instead. */
  private def arity(name: String, n: Int, children: Seq[Expression]): Unit =
    if (children.length != n)
      throw new org.apache.spark.sql.AnalysisException(
        "WRONG_NUM_ARGS.WITHOUT_SUGGESTION",
        Map("functionName" -> s"`$name`", "expectedNum" -> n.toString,
          "actualNum" -> children.length.toString,
          // not auto-substituted on this constructor path
          "docroot" -> "https://spark.apache.org/docs/latest"))

  private def fn(name: String, n: Int, clazz: Class[_])(
      build: Seq[Expression] => Expression) = (
    FunctionIdentifier(name),
    new ExpressionInfo(clazz.getName, name),
    (children: Seq[Expression]) => { arity(name, n, children); build(children) })

  /** Every SQL-registered graft expression with its arity-checked builder —
    * the single source both for [[GraftExtensions.apply]] and for tests
    * that register through `functionRegistry.createOrReplaceTempFunction`. */
  val functions: Seq[(FunctionIdentifier, ExpressionInfo,
      Seq[Expression] => Expression)] = Seq(
    fn("simhash64", 1, classOf[SimHash64])(es => SimHash64(es.head)),
    fn("dot_f64", 2, classOf[DotF64])(es => DotF64(es(0), es(1))),
    fn("minhash_sig", 2, classOf[MinHashSig])(es =>
      MinHashSig(es(0), intLit(es(1), "numHashes"))),
    fn("shingle_hashes", 2, classOf[ShingleHashes])(es =>
      ShingleHashes(es(0), intLit(es(1), "k"))),
    fn("winnow", 2, classOf[Winnow])(es =>
      Winnow(es(0), intLit(es(1), "window"))),
    fn("repetition_stats", 1, classOf[RepetitionStats])(es =>
      RepetitionStats(es.head)),
    fn("z_order2", 2, classOf[ZOrder2])(es => ZOrder2(es(0), es(1))),
    fn("sign_lsh", 3, classOf[SignLsh])(es =>
      SignLsh(es(0), intLit(es(1), "nPlanes"), intLit(es(2), "dim"))),
    fn("cdc_boundaries", 5, classOf[CdcBoundaries])(es =>
      CdcBoundaries(es(0), intLit(es(1), "w"), intLit(es(2), "maskBits"),
        intLit(es(3), "minSize"), intLit(es(4), "maxSize"))),
    // Item codec (built-in compositions, not custom expressions — they
    // register so SQL users migrating item-valued u64 columns off the
    // reference can decode in place: SELECT tdb_item_val(item) ...).
    fn("tdb_make_item", 2, graft.sources.TdbItems.getClass)(es =>
      graft.sources.TdbItems.makeItemExpr(es(0), es(1))),
    fn("tdb_item_field", 1, graft.sources.TdbItems.getClass)(es =>
      graft.sources.TdbItems.itemFieldExpr(es.head)),
    fn("tdb_item_val", 1, graft.sources.TdbItems.getClass)(es =>
      graft.sources.TdbItems.itemValExpr(es.head)))

  /** Builder lookup for tests / manual registration. */
  def builderFor(name: String): Seq[Expression] => Expression =
    functions.collectFirst { case (id, _, b) if id.funcName == name => b }
      .getOrElse(throw new NoSuchElementException(s"no graft function $name"))
}
