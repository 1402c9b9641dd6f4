package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Longest strictly-increasing 2-D chain over an array of (a, b) integer
  * pairs, as a native Catalyst expression — the temporal-consistency
  * score for perceptual video pair evidence.
  *
  * A matched-frame pair list for two videos holds one (pos_a, pos_b)
  * struct per matched frame pair; this returns the length of the longest
  * subsequence that is strictly increasing in BOTH coordinates — the
  * number of shared frames that appear in the SAME temporal order in
  * both videos. A true near-duplicate clip scores ≈ its matched-frame
  * count; a shuffled-frame collage of the same frames scores ≈ 1, so the
  * two are distinguishable even though their shared-frame counts tie
  * (the reference's index keeps evidence honest the same way: a
  * candidate is never reported without re-checking the full filter,
  * tdbcli/tdb_index.c:575-606).
  *
  * Input order is irrelevant (the eval sorts by a ascending, b
  * descending, then runs the patience O(k log k) longest
  * strictly-increasing-subsequence scan on b — the b-descending
  * tie-break makes chains strict in `a` too, so one probe frame matching
  * several index frames contributes at most one chain link). Null
  * elements are skipped; an empty array scores 0. doGenCode is a static
  * call so the surrounding whole-stage span stays intact.
  */
case class LisLen(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType
  override def prettyName: String = "lis_len"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StructType(fields), _)
        if fields.length == 2 &&
          fields.forall(f => f.dataType == IntegerType) =>
      TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<struct<int,int>> input (matched " +
      s"position pairs), got ${other.catalogString}")
  }

  override protected def nullSafeEval(input: Any): Any =
    java.lang.Long.valueOf(LisLen.compute(input.asInstanceOf[ArrayData]))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.LisLen.compute($c)")

  override protected def withNewChildInternal(newChild: Expression): LisLen =
    copy(child = newChild)
}

object LisLen {

  /** Longest strictly-increasing chain length; called from generated
    * code. O(k log k) patience scan after an O(k log k) sort. */
  def compute(arr: ArrayData): Long = {
    val n = arr.numElements()
    if (n == 0) return 0L
    // pack (a, b) into one long for an allocation-light primitive sort:
    // bias both to unsigned (sign-safe for any int), a in the high 32
    // bits ascending, b complemented to descend within equal a
    val packed = new Array[Long](n)
    var k = 0
    var i = 0
    while (i < n) {
      if (!arr.isNullAt(i)) {
        val s = arr.getStruct(i, 2)
        if (!s.isNullAt(0) && !s.isNullAt(1)) {
          val ua = s.getInt(0).toLong + 0x80000000L
          val ub = s.getInt(1).toLong + 0x80000000L
          // flip the top bit so the signed long sort follows unsigned order
          packed(k) = ((ua << 32) | (0xffffffffL - ub)) ^ java.lang.Long.MIN_VALUE
          k += 1
        }
      }
      i += 1
    }
    if (k == 0) return 0L
    java.util.Arrays.sort(packed, 0, k)
    // patience: tails(j) = smallest chain-end b for a strict chain of
    // length j+1; replace the first tail >= b (strictness), append if none
    val tails = new Array[Int](k)
    var len = 0
    i = 0
    while (i < k) {
      val b =
        (0xffffffffL - ((packed(i) ^ java.lang.Long.MIN_VALUE) & 0xffffffffL) -
          0x80000000L).toInt
      var loIdx = 0
      var hiIdx = len
      while (loIdx < hiIdx) {
        val mid = (loIdx + hiIdx) >>> 1
        if (tails(mid) < b) loIdx = mid + 1 else hiIdx = mid
      }
      tails(loIdx) = b
      if (loIdx == len) len += 1
      i += 1
    }
    len.toLong
  }
}
