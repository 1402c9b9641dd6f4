package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Sequential-fold dot product of two float-array columns in double, as a
  * native Catalyst expression. Semantically identical to the
  * zip_with+aggregate builtin composition it replaces (same left-to-right
  * double fold — bit-reproducible, matches a DuckDB DOUBLE[] fold), but one
  * tight primitive loop per pair instead of materializing an intermediate
  * product array and walking it with generic per-element evaluation. This
  * sits in the innermost loop of every pairwise-similarity join (near-dup,
  * knn), where the per-pair allocation dominates.
  *
  * doGenCode is a static call into [[VectorOps.dotF64]], so the surrounding
  * whole-stage codegen span stays intact. Null ELEMENTS are treated as 0
  * (embedding arrays are dense; the builtin fold would instead poison the
  * whole sum to null — no verified dataset contains them).
  */
case class DotF64(left: Expression, right: Expression) extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def prettyName: String = "dot_f64"

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(FloatType, _), ArrayType(FloatType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"dot_f64 requires (array<float>, array<float>), got " +
          s"(${l.catalogString}, ${r.catalogString})")
    }

  override protected def nullSafeEval(a: Any, b: Any): Any =
    java.lang.Double.valueOf(VectorOps.dotF64(
      a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData]))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.functions.VectorOps.dotF64($a, $b)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DotF64 =
    copy(left = newLeft, right = newRight)
}

object VectorOps {
  /** One-pass double fold; called from generated code. */
  def dotF64(a: ArrayData, b: ArrayData): Double = {
    val n = math.min(a.numElements(), b.numElements())
    var acc = 0.0
    var i = 0
    while (i < n) {
      if (!a.isNullAt(i) && !b.isNullAt(i))
        acc += a.getFloat(i).toDouble * b.getFloat(i).toDouble
      i += 1
    }
    acc
  }
}
