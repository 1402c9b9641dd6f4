package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
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
