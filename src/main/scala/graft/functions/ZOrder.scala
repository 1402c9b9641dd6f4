package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.types._

/** Morton (Z-order) interleave of the low 32 bits of two longs — the
  * space-filling-curve sort key behind multi-dimensional data clustering
  * (Morton 1966; the technique Delta/Iceberg expose as OPTIMIZE ZORDER).
  * Sorting a table by `z_order2(dim_a, dim_b)` gives row groups that are
  * rectangles in (a, b) space, so min/max stats prune scans for
  * predicates on EITHER or BOTH dimensions — where a single-column sort
  * prunes only its own column.
  *
  * Inputs must already be non-negative ordinals that preserve the
  * dimension's order (a rank, a bucket index, a truncated timestamp —
  * NOT a hash, which would destroy the locality pruning relies on);
  * values above 2³¹−1 are masked to their low 31 bits (31, not 32: a
  * 32-bit second dimension would shift into the sign bit and invert
  * the upper half of the dimension under signed ORDER BY).
  */
case class ZOrder2(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = LongType
  override def prettyName: String = "z_order2"

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (LongType, LongType) => TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"z_order2 requires (bigint, bigint), got " +
          s"(${l.catalogString}, ${r.catalogString})")
    }

  override protected def nullSafeEval(a: Any, b: Any): Any =
    java.lang.Long.valueOf(ZOrder2.interleave(
      a.asInstanceOf[Long], b.asInstanceOf[Long]))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      (a, b) => s"graft.functions.ZOrder2.interleave($a, $b)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): ZOrder2 =
    copy(left = newLeft, right = newRight)
}

object ZOrder2 {
  /** Spread the low 31 bits of x to the even bit positions of a long
    * (standard Morton bit-twiddle; 31 so the odd-shifted copy cannot
    * reach the sign bit). */
  def spread(x: Long): Long = {
    var v = x & 0x7fffffffL
    v = (v | (v << 16)) & 0x0000ffff0000ffffL
    v = (v | (v << 8)) & 0x00ff00ff00ff00ffL
    v = (v | (v << 4)) & 0x0f0f0f0f0f0f0f0fL
    v = (v | (v << 2)) & 0x3333333333333333L
    v = (v | (v << 1)) & 0x5555555555555555L
    v
  }

  /** a's bits at even positions, b's at odd; always non-negative —
    * called from generated code. */
  def interleave(a: Long, b: Long): Long =
    spread(a) | (spread(b) << 1)
}
