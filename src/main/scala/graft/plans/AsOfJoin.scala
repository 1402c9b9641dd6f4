package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{
  Ascending, Attribute, AttributeReference, AttributeSet, JoinedRow,
  SortOrder, UnsafeProjection}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.catalyst.plans.physical.{
  ClusteredDistribution, Distribution, Partitioning}
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan, SparkStrategy}
import org.apache.spark.sql.execution.metric.{SQLMetric, SQLMetrics}
import org.apache.spark.sql.functions.{col, max}
import org.apache.spark.sql.types.{LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Whole-operator Catalyst integration of the per-trail AS-OF join — the
  * enrichment pattern reference users hand-roll with a multi-cursor walk
  * that carries last-seen state (reference:
  * doc/docs/technical_overview.md:219-229, multi-cursor merge at
  * src/tdb_multi_cursor.c:84-300).
  *
  * `TrailOps.asOfJoin` expresses the same semantics as one union+window
  * pass; this node is the brief's preference-(c) path: a custom
  * `LogicalPlan` + `SparkStrategy` + `SparkPlan` registered through
  * `SparkSessionExtensions`. The physical operator declares
  * `ClusteredDistribution(uuid)` on BOTH children, so EnsureRequirements
  * co-partitions the two sides (left keeps its partitioning for downstream
  * reuse) and sorts each by `(uuid, time)`; execution is then a
  * single-pass, O(n+m), zero-allocation-per-row streaming merge inside
  * each partition — no union of null-padded rows, no whole-row window
  * buffering, and the right side is shuffled at its OWN (typically much
  * smaller) width rather than padded to the union schema.
  *
  * Scale shape at 100 TB: exactly two shuffle exchanges (one per side,
  * each of only the columns it contributes), no driver involvement, and
  * per-partition memory is O(1) beyond the shuffle sorter — the merge
  * holds one carried right row. The window form shuffles the union
  * (left+right padded to a common schema) and pays the window machinery;
  * this operator is the plan you'd hand-write for a cluster.
  *
  * Semantics (identical to `TrailOps.asOfJoin`, oracle: DuckDB
  * `ASOF LEFT JOIN`): each left event picks up the value columns of the
  * LATEST right row with `right.time <= left.time` in the same trail; all
  * `asof_*` outputs come from that SAME matched row; left rows with no
  * prior right row get NULLs. The caller pre-reduces the right side to
  * one row per (uuid, time), which makes the match deterministic.
  */
case class AsOfJoinNode(
    left: LogicalPlan,
    right: LogicalPlan,
    uuidColName: String,
    timeColName: String,
    valueColNames: Seq[String],
    asofOutput: Seq[Attribute],
    tolerance: Option[Long] = None) extends BinaryNode {

  /** Key columns are stored BY NAME and late-bound against the current
    * children: when the analyzer's DeduplicateRelations re-identifies one
    * subtree of a self-join-shaped plan (both sides reading the same
    * source), it rewrites references only inside node types it knows —
    * raw Attribute fields on a custom node would silently go stale and
    * surface as ATTRIBUTE_NOT_FOUND at execution. Name resolution keeps
    * the node correct under any child re-identification. */
  private def attrOf(plan: LogicalPlan, name: String): Attribute =
    plan.output.find(_.name == name).getOrElse(
      throw new IllegalStateException(
        s"asof join: column $name missing from ${plan.output.map(_.name)}"))
  def leftUuid: Attribute = attrOf(left, uuidColName)
  def leftTime: Attribute = attrOf(left, timeColName)
  def rightUuid: Attribute = attrOf(right, uuidColName)
  def rightTime: Attribute = attrOf(right, timeColName)
  def rightValues: Seq[Attribute] = valueColNames.map(attrOf(right, _))

  override def output: Seq[Attribute] = left.output ++ asofOutput

  override def producedAttributes: AttributeSet = AttributeSet(asofOutput)

  /** Every left column flows through to the output, so column pruning must
    * not strip the left child; the right child prunes to (uuid, time,
    * values) — which is the entire point of joining at the right's own
    * width instead of a union schema. */
  override def references: AttributeSet =
    AttributeSet(left.output ++ Seq(rightUuid, rightTime) ++ rightValues)

  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): AsOfJoinNode =
    copy(left = newLeft, right = newRight)
}

/** Planner strategy: `AsOfJoinNode` → `AsOfJoinExec`. Registered by
  * `GraftExtensions` (injectPlannerStrategy) and lazily through
  * `spark.experimental.extraStrategies` by the `AsOfJoin.join` builder,
  * so the operator works without any session configuration. */
object AsOfJoinStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case n: AsOfJoinNode =>
      AsOfJoinExec(planLater(n.left), planLater(n.right),
        n.leftUuid, n.leftTime, n.rightUuid, n.rightTime,
        n.rightValues, n.asofOutput, n.tolerance) :: Nil
    case _ => Nil
  }
}

case class AsOfJoinExec(
    left: SparkPlan,
    right: SparkPlan,
    leftUuid: Attribute,
    leftTime: Attribute,
    rightUuid: Attribute,
    rightTime: Attribute,
    rightValues: Seq[Attribute],
    asofOutput: Seq[Attribute],
    /** Bounded staleness: a carried match additionally requires
      * right.time >= left.time − tolerance (closed bound, same contract as
      * the window form TrailDBCons.asOfJoin) — too-old matches emit NULLs
      * exactly like no-match. Adds one long + one flag of state to the
      * merge loop; the too-old row is MASKED per left row rather than
      * discarded, so it still anchors the "latest right row" position while
      * newer right rows replace it as the cursor advances. */
    tolerance: Option[Long] = None) extends BinaryExecNode {

  override def output: Seq[Attribute] = left.output ++ asofOutput

  override def producedAttributes: AttributeSet = AttributeSet(asofOutput)

  /** Both sides clustered on uuid → EnsureRequirements gives the two
    * children compatible hash partitioning (inserting at most one
    * exchange each) and zipPartitions sees aligned trail sets. */
  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(Seq(leftUuid)) ::
    ClusteredDistribution(Seq(rightUuid)) :: Nil

  override def requiredChildOrdering: Seq[Seq[SortOrder]] = Seq(
    Seq(SortOrder(leftUuid, Ascending), SortOrder(leftTime, Ascending)),
    Seq(SortOrder(rightUuid, Ascending), SortOrder(rightTime, Ascending)))

  /** Left rows pass through in order, so downstream ops can reuse both
    * the partitioning and the (uuid, time) sort without re-exchanging. */
  override def outputPartitioning: Partitioning = left.outputPartitioning
  override def outputOrdering: Seq[SortOrder] =
    Seq(SortOrder(leftUuid, Ascending), SortOrder(leftTime, Ascending))

  override lazy val metrics: Map[String, SQLMetric] = Map(
    "numOutputRows" -> SQLMetrics.createMetric(sparkContext, "number of output rows"))

  override protected def doExecute(): RDD[InternalRow] = {
    val numOutputRows = longMetric("numOutputRows")
    val luIdx = left.output.indexWhere(_.exprId == leftUuid.exprId)
    val ltIdx = left.output.indexWhere(_.exprId == leftTime.exprId)
    val ruIdx = right.output.indexWhere(_.exprId == rightUuid.exprId)
    val rtIdx = right.output.indexWhere(_.exprId == rightTime.exprId)
    require(luIdx >= 0 && ltIdx >= 0 && ruIdx >= 0 && rtIdx >= 0,
      "asof join keys must be direct child outputs")
    val leftOutput = left.output
    val rightOutput = right.output
    val rightVals = rightValues
    val outAttrs = output

    left.execute().zipPartitions(right.execute()) { (lIter, rIter) =>
      // Projections are codegen'd per partition (not serializable).
      val valueProj = UnsafeProjection.create(rightVals, rightOutput)
      val resultProj = UnsafeProjection.create(outAttrs, outAttrs)
      val nullVals = InternalRow.fromSeq(Seq.fill(rightVals.length)(null))
      val joined = new JoinedRow
      val rBuf = rIter.buffered

      val tol = tolerance.getOrElse(Long.MaxValue)
      val hasTol = tolerance.isDefined

      new Iterator[InternalRow] {
        private var started = false
        private var curUuid: UTF8String = null
        private var carried: InternalRow = null
        private var carriedTime: Long = Long.MinValue
        private var carriedTimeNull: Boolean = true

        // Null-safe, matching both the sort order (NULLS FIRST) and the
        // window formulation's grouping (null uuids form one trail).
        private def cmpUuid(a: UTF8String, b: UTF8String): Int =
          if (a == null && b == null) 0
          else if (a == null) -1
          else if (b == null) 1
          else a.compareTo(b)

        override def hasNext: Boolean = lIter.hasNext

        // NULL time reads as Long.MinValue — the sort order is NULLS
        // FIRST, so this reproduces the window formulation exactly: a
        // null-time right row sorts first and is visible to every left
        // row of its trail; a null-time left row sees only null-time
        // right rows. (getLong on a null slot would read 0 and both
        // mis-match and over-advance the cursor.)
        @inline def timeAt(row: InternalRow, idx: Int): Long =
          if (row.isNullAt(idx)) Long.MinValue else row.getLong(idx)

        override def next(): InternalRow = {
          val lRow = lIter.next()
          val lu = if (lRow.isNullAt(luIdx)) null else lRow.getUTF8String(luIdx)
          val lt = timeAt(lRow, ltIdx)
          if (!started || cmpUuid(lu, curUuid) != 0) {
            // New trail: forget the previous trail's carried state and
            // copy the key (the row buffer is reused by the iterator).
            started = true
            curUuid = if (lu == null) null else lu.clone()
            carried = null
            carriedTime = Long.MinValue
            carriedTimeNull = true
          }
          // Advance the right cursor through (a) trails entirely before
          // this one — discarded, no left rows want them — and (b) rows
          // of THIS trail at-or-before lt, each becoming the carried
          // match (<= semantics: a same-timestamp right row is visible).
          var advancing = true
          while (advancing && rBuf.hasNext) {
            val rRow = rBuf.head
            val ru = if (rRow.isNullAt(ruIdx)) null else rRow.getUTF8String(ruIdx)
            val cmp = cmpUuid(ru, lu)
            if (cmp < 0) { rBuf.next() }
            else if (cmp == 0 && timeAt(rRow, rtIdx) <= lt) {
              carriedTimeNull = rRow.isNullAt(rtIdx)
              carriedTime = timeAt(rRow, rtIdx)
              carried = valueProj(rBuf.next()).copy()
            } else advancing = false
          }
          numOutputRows += 1
          // Tolerance masks a too-old carried match per LEFT row (NULL
          // times never satisfy a bound, mirroring the window form's
          // three-valued `_rt >= time - t`); the row itself stays carried
          // so later right rows replace it as the cursor advances.
          val visible = carried != null && (!hasTol ||
            (!carriedTimeNull && !lRow.isNullAt(ltIdx) && carriedTime >= lt - tol))
          resultProj(joined(lRow, if (visible) carried else nullVals))
        }
      }
    }
  }

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): AsOfJoinExec =
    copy(left = newLeft, right = newRight)
}

object AsOfJoin {

  /** DataFrame-level builder: plans `left ASOF LEFT JOIN right` through
    * `AsOfJoinNode`. Same contract as `TrailOps.asOfJoin` (which remains
    * the pure-DataFrame formulation and its cross-check): `uuidCol` must
    * be StringType and `timeCol` LongType on both sides, and the output
    * is every left column plus `asof_<v>` for each value column.
    *
    * The right side is first reduced to one row per (uuid, time) — max of
    * each value column, exactly as the window form does — so the "latest
    * right row" is well-defined regardless of input order.
    */
  def join(left: DataFrame, right: DataFrame, valueCols: Seq[String],
      uuidCol: String = graft.core.TrailSchema.UuidCol,
      timeCol: String = graft.core.TrailSchema.TimeCol,
      tolerance: Option[Long] = None): DataFrame = {
    require(valueCols.nonEmpty, "asof join needs at least one value column")
    tolerance.foreach(t => require(t > 0, s"tolerance must be positive, got $t"))
    for (df <- Seq(left, right)) {
      require(df.schema(uuidCol).dataType == StringType,
        s"asof join: $uuidCol must be StringType")
      require(df.schema(timeCol).dataType == LongType,
        s"asof join: $timeCol must be LongType")
    }
    val spark = left.sparkSession
    registerWith(spark)

    // Repartition by uuid FIRST: hashpartitioning(uuid) satisfies both the
    // (uuid, time) aggregation's ClusteredDistribution and the join's, so
    // the pre-reduce and the join share ONE right-side exchange instead of
    // shuffling on (uuid, time) and then again on uuid.
    val reduced = right.repartition(col(uuidCol))
      .groupBy(col(uuidCol), col(timeCol))
      .agg(max(valueCols.head).as(valueCols.head),
        valueCols.tail.map(c => max(c).as(c)): _*)

    val lPlan = left.queryExecution.analyzed
    val rPlan = reduced.queryExecution.analyzed
    val asofOut = valueCols.map { c =>
      AttributeReference(s"asof_$c", reduced.schema(c).dataType,
        nullable = true)()
    }
    val node = AsOfJoinNode(lPlan, rPlan, uuidCol, timeCol, valueCols, asofOut,
      tolerance)
    org.apache.spark.sql.graft.GraftPlanning.ofRows(spark, node)
  }

  /** Idempotently add the strategy to a session that was not built with
    * `GraftExtensions` — `experimental.extraStrategies` is the public
    * escape hatch for exactly this. */
  def registerWith(spark: SparkSession): Unit = {
    val cur = spark.experimental.extraStrategies
    if (!cur.contains(AsOfJoinStrategy))
      spark.experimental.extraStrategies = cur :+ AsOfJoinStrategy
  }
}
