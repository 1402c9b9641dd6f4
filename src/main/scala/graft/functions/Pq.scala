package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Product-quantization encoder (Jégou, Douze, Schmid: "Product
  * Quantization for Nearest Neighbor Search", TPAMI 2011) as a native
  * Catalyst expression: split a dense float vector into `m` contiguous
  * subvectors and emit, per subspace, the index of the nearest of `k`
  * trained centroids (L2). The output `array<int>` of length m IS the
  * PQ code — `m·log2(k)` bits of it replace `4·dim` bytes of raw floats
  * in the candidate-generation stream.
  *
  * This is the corpus-side encode pass (one evaluation per corpus row —
  * the hot loop at 100 TB), so it is a single imperative m×k×subDim
  * scan with zero allocation beyond the code array, codegen'd via a
  * static call so the surrounding whole-stage span stays intact. A
  * composed-builtins version (m×k zip_with+aggregate folds per row)
  * evaluates interpreted lambdas per element — an order of magnitude
  * more per-row overhead exactly where it hurts.
  *
  * `flatCodebooks` is the trained m×k×subDim centroid tensor flattened
  * row-major (a Seq so the expression keeps value equality; converted
  * once per task, not per row). PRECONDITION: dense input arrays of
  * length exactly m×subDim (every embedding column in this library).
  */
case class PqCodes(child: Expression, m: Int, k: Int,
    flatCodebooks: Seq[Float]) extends UnaryExpression {

  require(m > 0 && k > 0 && flatCodebooks.nonEmpty &&
    flatCodebooks.length % (m * k) == 0,
    s"codebook tensor of ${flatCodebooks.length} floats does not factor " +
      s"into m=$m subspaces x k=$k centroids")

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def prettyName: String = "pq_codes"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"pq_codes requires array<float> input, got ${other.catalogString}")
  }

  @transient private lazy val cb: Array[Float] = flatCodebooks.toArray

  override protected def nullSafeEval(input: Any): Any =
    PqCodes.compute(input.asInstanceOf[ArrayData], m, k, cb)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cbRef = ctx.addReferenceObj("pqCodebooks", cb, "float[]")
    defineCodeGen(ctx, ev,
      c => s"graft.functions.PqCodes.compute($c, $m, $k, $cbRef)")
  }

  override protected def withNewChildInternal(newChild: Expression): PqCodes =
    copy(child = newChild)
}

object PqCodes {
  /** One pass over the vector: for each of the m subspaces, the argmin-L2
    * centroid index. Called from generated code. */
  def compute(v: ArrayData, m: Int, k: Int, cb: Array[Float]): ArrayData = {
    val subDim = cb.length / (m * k)
    if (v.numElements() != m * subDim)
      throw new IllegalArgumentException(
        s"pq_codes: vector of ${v.numElements()} elements does not match " +
          s"the m=$m x subDim=$subDim codebook layout")
    val codes = new Array[Int](m)
    var s = 0
    while (s < m) {
      val off = s * subDim
      var best = 0
      var bestD = Double.MaxValue
      var j = 0
      while (j < k) {
        val base = (s * k + j) * subDim
        var d = 0.0
        var t = 0
        while (t < subDim && d < bestD) {
          // null elements contribute 0, same convention as DotF64 (dense
          // input is the documented precondition for every embedding op)
          val x = if (v.isNullAt(off + t)) 0.0 else v.getFloat(off + t).toDouble
          val diff = x - cb(base + t)
          d += diff * diff
          t += 1
        }
        if (d < bestD) { bestD = d; best = j }
        j += 1
      }
      codes(s) = best
      s += 1
    }
    new GenericArrayData(codes)
  }
}

/** Residual PQ encoder — the IVFADC corpus-side encode (Jégou et al.,
  * TPAMI'11 §IV-A: ONE product quantizer, shared by all cells, over the
  * residual x − c(cell)): `left` is the raw vector, `right` the coarse
  * cell id, and the emitted code is [[PqCodes]] of the residual. The
  * subtraction is fused into the argmin distance loop (no residual array
  * is materialized), so the hot encode scan stays a single zero-allocation
  * pass per row inside whole-stage codegen.
  *
  * `flatCentroids` is the coarse nCells×dim centroid tensor flattened
  * row-major; `flatCodebooks` the m×k×subDim residual codebook tensor.
  * PRECONDITION: dense input of length m×subDim = dim, cell ∈ [0, nCells)
  * (guaranteed — the cell id comes from the coarse [[PqCodes]] pass). */
case class PqResidualCodes(left: Expression, right: Expression, m: Int, k: Int,
    flatCodebooks: Seq[Float], flatCentroids: Seq[Float])
    extends BinaryExpression {

  require(m > 0 && k > 0 && flatCodebooks.nonEmpty &&
    flatCodebooks.length % (m * k) == 0,
    s"codebook tensor of ${flatCodebooks.length} floats does not factor " +
      s"into m=$m subspaces x k=$k centroids")
  require(flatCentroids.nonEmpty &&
    flatCentroids.length % (flatCodebooks.length / (m * k) * m) == 0,
    s"coarse tensor of ${flatCentroids.length} floats is not a multiple " +
      s"of dim=${flatCodebooks.length / (m * k) * m}")

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def prettyName: String = "pq_residual_codes"

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(FloatType, _), IntegerType) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"pq_residual_codes requires (array<float>, int), got " +
          s"(${l.catalogString}, ${r.catalogString})")
    }

  @transient private lazy val cb: Array[Float] = flatCodebooks.toArray
  @transient private lazy val cc: Array[Float] = flatCentroids.toArray

  override protected def nullSafeEval(vec: Any, cell: Any): Any =
    PqResidualCodes.compute(vec.asInstanceOf[ArrayData],
      cell.asInstanceOf[Int], m, k, cb, cc)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cbRef = ctx.addReferenceObj("pqResidualCodebooks", cb, "float[]")
    val ccRef = ctx.addReferenceObj("pqCoarseCentroids", cc, "float[]")
    defineCodeGen(ctx, ev, (v, c) =>
      s"graft.functions.PqResidualCodes.compute($v, $c, $m, $k, $cbRef, $ccRef)")
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): PqResidualCodes =
    copy(left = newLeft, right = newRight)
}

object PqResidualCodes {
  /** [[PqCodes.compute]] with the coarse centroid subtracted inline:
    * distance term is ((x_t − c_cell,t) − cb_t)². Called from generated
    * code. */
  def compute(v: ArrayData, cell: Int, m: Int, k: Int,
      cb: Array[Float], cc: Array[Float]): ArrayData = {
    val subDim = cb.length / (m * k)
    val dim = m * subDim
    if (v.numElements() != dim)
      throw new IllegalArgumentException(
        s"pq_residual_codes: vector of ${v.numElements()} elements does " +
          s"not match the m=$m x subDim=$subDim codebook layout")
    if (cell < 0 || (cell + 1) * dim > cc.length)
      throw new IllegalArgumentException(
        s"pq_residual_codes: cell $cell outside the ${cc.length / dim}-cell " +
          "coarse tensor")
    val cOff = cell * dim
    val codes = new Array[Int](m)
    var s = 0
    while (s < m) {
      val off = s * subDim
      var best = 0
      var bestD = Double.MaxValue
      var j = 0
      while (j < k) {
        val base = (s * k + j) * subDim
        var d = 0.0
        var t = 0
        while (t < subDim && d < bestD) {
          val x = if (v.isNullAt(off + t)) 0.0 else v.getFloat(off + t).toDouble
          val diff = (x - cc(cOff + off + t)) - cb(base + t)
          d += diff * diff
          t += 1
        }
        if (d < bestD) { bestD = d; best = j }
        j += 1
      }
      codes(s) = best
      s += 1
    }
    new GenericArrayData(codes)
  }
}

/** Per-query ADC lookup table for PQ search — tbl[s][j] = ⟨query_sub_s,
  * centroid_{s,j}⟩ — as ONE native expression (round 19 optimization).
  * The composed-builtins version it replaces was an m×k tree of
  * `aggregate(zip_with(slice(...), lit(centroid), x·c))` sub-expressions —
  * 512 interpreted higher-order-function nodes at m=16, k=32, whose
  * analyzer/optimizer walks alone cost seconds per query PLAN (the
  * measured pqKnn floor), and whose lambdas ran interpreted per element.
  * One imperative m×k×subDim loop computes the same doubles: each entry
  * is the left-to-right fold Σ_t x_t.toDouble · c_t.toDouble starting at
  * 0.0 — bit-identical to the builtin fold (OpsSpec pins it
  * double-for-double against the retained [[graft.ops.Similarity.adcTableFold]]).
  *
  * `flatCodebooks` is the m×k×subDim centroid tensor flattened row-major.
  * PRECONDITION: dense input of length exactly m×subDim (every embedding
  * column in this library; the corpus side's [[PqCodes]] already fails
  * loud on a mismatch). */
case class AdcTable(child: Expression, m: Int, k: Int,
    flatCodebooks: Seq[Float]) extends UnaryExpression {

  require(m > 0 && k > 0 && flatCodebooks.nonEmpty &&
    flatCodebooks.length % (m * k) == 0,
    s"codebook tensor of ${flatCodebooks.length} floats does not factor " +
      s"into m=$m subspaces x k=$k centroids")

  override def dataType: DataType =
    ArrayType(ArrayType(DoubleType, containsNull = false), containsNull = false)
  override def prettyName: String = "adc_table"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"adc_table requires array<float> input, got ${other.catalogString}")
  }

  @transient private lazy val cb: Array[Float] = flatCodebooks.toArray

  override protected def nullSafeEval(input: Any): Any =
    AdcTable.compute(input.asInstanceOf[ArrayData], m, k, cb)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cbRef = ctx.addReferenceObj("adcCodebooks", cb, "float[]")
    defineCodeGen(ctx, ev,
      c => s"graft.functions.AdcTable.compute($c, $m, $k, $cbRef)")
  }

  override protected def withNewChildInternal(newChild: Expression): AdcTable =
    copy(child = newChild)
}

object AdcTable {
  /** m×k partial dot products, each summed left-to-right over the
    * subspace (bit-identical to the builtin aggregate∘zip_with fold).
    * Called from generated code. */
  def compute(v: ArrayData, m: Int, k: Int, cb: Array[Float]): ArrayData = {
    val subDim = cb.length / (m * k)
    if (v.numElements() != m * subDim)
      throw new IllegalArgumentException(
        s"adc_table: vector of ${v.numElements()} elements does not match " +
          s"the m=$m x subDim=$subDim codebook layout")
    val rows = new Array[ArrayData](m)
    var s = 0
    while (s < m) {
      val off = s * subDim
      val row = new Array[Double](k)
      var j = 0
      while (j < k) {
        val base = (s * k + j) * subDim
        var acc = 0.0
        var t = 0
        while (t < subDim) {
          // a null element is a malformed embedding: refuse LOUD (the
          // PqCodes convention) rather than silently scoring it — the
          // retained fold nulled the whole entry (candidate dropped),
          // and substituting 0.0 here would silently RANK it instead
          // (r19 review finding)
          if (v.isNullAt(off + t))
            throw new IllegalArgumentException(
              s"adc_table: null element at index ${off + t} — embedding " +
                "vectors must be dense (documented precondition)")
          acc += v.getFloat(off + t).toDouble * cb(base + t).toDouble
          t += 1
        }
        row(j) = acc
        j += 1
      }
      rows(s) = new GenericArrayData(row)
      s += 1
    }
    new GenericArrayData(rows.asInstanceOf[Array[Any]])
  }
}

/** Asymmetric-distance (ADC) sum for PQ search: Σ_s tbl[s][codes[s]] — the
  * per-candidate inner loop of the memory-bound ANN path, where `codes` is
  * a corpus row's PQ code ([[PqCodes]]) and `tbl` is the query's
  * precomputed per-subspace lookup table of partial dot products. One
  * native m-lookup loop per (candidate, query) pair, codegen'd via a
  * static call; bit-identical (same left-to-right addition order) to the
  * builtin `aggregate(sequence, element_at∘element_at)` composition it
  * replaces, which walked an interpreted lambda per subspace on every
  * candidate — the hottest per-row site of the whole PQ scan.
  *
  * PRECONDITION: dense arrays, codes ∈ [0, k) and |tbl| ≥ |codes| — both
  * guaranteed by construction ([[PqCodes]] emits only valid indices, the
  * ADC table is built from the same codebooks). */
case class AdcSum(left: Expression, right: Expression) extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def prettyName: String = "adc_sum"

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(IntegerType, _), ArrayType(ArrayType(DoubleType, _), _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"adc_sum requires (array<int>, array<array<double>>), got " +
          s"(${l.catalogString}, ${r.catalogString})")
    }

  override protected def nullSafeEval(codes: Any, tbl: Any): Any =
    java.lang.Double.valueOf(AdcSum.compute(
      codes.asInstanceOf[ArrayData], tbl.asInstanceOf[ArrayData]))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      (c, t) => s"graft.functions.AdcSum.compute($c, $t)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): AdcSum =
    copy(left = newLeft, right = newRight)
}

object AdcSum {
  /** m table lookups, summed left-to-right. Called from generated code. */
  def compute(codes: ArrayData, tbl: ArrayData): Double = {
    val m = codes.numElements()
    require(tbl.numElements() >= m,
      s"adc_sum: ${tbl.numElements()} subspace tables for $m codes")
    var sum = 0.0
    var s = 0
    while (s < m) {
      sum += tbl.getArray(s).getDouble(codes.getInt(s))
      s += 1
    }
    sum
  }
}
