package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String
import org.apache.spark.unsafe.hash.Murmur3_x86_32

/** SimHash (Charikar, STOC'02) of a token array as a native Catalyst
  * expression: per token, a 64-bit hash votes +1/-1 on each of 64 bit
  * positions; the signature's bit b is 1 iff the sum is positive.
  *
  * A composed-builtins version would need a 64-wide zip_with fold per token
  * (quadratic blowup in expression size); a single imperative expression
  * evaluates in one pass per row with zero allocation beyond the counter
  * array. Implements doGenCode (a static call into [[SimHash64.compute]])
  * so the surrounding whole-stage codegen span stays intact — a
  * CodegenFallback here would knock the entire stage out of codegen.
  * Deterministic across engines/JVMs (splitmix-finalized murmur).
  */
case class SimHash64(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType
  override def prettyName: String = "simhash64"

  // Analysis-time type error instead of a ClassCastException from generated
  // code when the SQL-registered simhash64 is applied to e.g. a plain string
  // column. (ExpectsInputTypes is unavailable outside org.apache.spark.sql —
  // AbstractDataType is private[sql] in Spark 4 — so check directly.)
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"simhash64 requires array<string> input, got ${other.catalogString}")
  }

  override protected def nullSafeEval(input: Any): Any =
    java.lang.Long.valueOf(SimHash64.compute(input.asInstanceOf[ArrayData]))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.SimHash64.compute($c)")

  override protected def withNewChildInternal(newChild: Expression): SimHash64 =
    copy(child = newChild)
}

object SimHash64 {
  private def hash64(s: UTF8String): Long = {
    // murmur32 on the bytes, widened and finalized splitmix64-style so all
    // 64 signature bits are driven.
    val h32 = Murmur3_x86_32.hashUnsafeBytes(
      s.getBaseObject, s.getBaseOffset, s.numBytes(), 42)
    var z = h32.toLong + 0x9e3779b97f4a7c15L
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z ^ (z >>> 31)
  }

  /** One-pass SimHash over a string array; called from generated code. */
  def compute(arr: ArrayData): Long = {
    val counts = new Array[Int](64)
    var i = 0
    while (i < arr.numElements()) {
      if (!arr.isNullAt(i)) {
        val h = hash64(arr.getUTF8String(i))
        var b = 0
        while (b < 64) {
          if (((h >>> b) & 1L) == 1L) counts(b) += 1 else counts(b) -= 1
          b += 1
        }
      }
      i += 1
    }
    var sig = 0L
    var b = 0
    while (b < 64) {
      if (counts(b) > 0) sig |= (1L << b)
      b += 1
    }
    sig
  }
}

/** Column-level entry points for graft's custom expressions. */
object GraftFunctions {
  import org.apache.spark.sql.graftbridge.ColumnBridge

  def simhash64(tokens: Column): Column =
    ColumnBridge.column(SimHash64(ColumnBridge.expression(tokens)))

  def dhash64(thumb: Column): Column =
    ColumnBridge.column(ImageHash64(ColumnBridge.expression(thumb), dhash = true))

  def ahash64(thumb: Column): Column =
    ColumnBridge.column(ImageHash64(ColumnBridge.expression(thumb), dhash = false))

  def lisLen(pairs: Column): Column =
    ColumnBridge.column(LisLen(ColumnBridge.expression(pairs)))

  def dotF64(a: Column, b: Column): Column =
    ColumnBridge.column(DotF64(ColumnBridge.expression(a), ColumnBridge.expression(b)))

  def minhashSig(hashes: Column, numHashes: Int): Column =
    ColumnBridge.column(MinHashSig(ColumnBridge.expression(hashes), numHashes))

  def repetitionStats(tokens: Column): Column =
    ColumnBridge.column(RepetitionStats(ColumnBridge.expression(tokens)))

  def winnow(hashes: Column, window: Int): Column =
    ColumnBridge.column(Winnow(ColumnBridge.expression(hashes), window))

  def shingleHashes(tokens: Column, k: Int): Column =
    ColumnBridge.column(ShingleHashes(ColumnBridge.expression(tokens), k))

  def shingleHashesAll(tokens: Column, k: Int): Column =
    ColumnBridge.column(ShingleHashesAll(ColumnBridge.expression(tokens), k))

  def cdcBoundaries(tokens: Column, w: Int, maskBits: Int,
      minSize: Int, maxSize: Int): Column =
    ColumnBridge.column(CdcBoundaries(ColumnBridge.expression(tokens), w,
      maskBits, minSize, maxSize))

  def bpeEncode(tokens: Column, flatMerges: Seq[String]): Column =
    ColumnBridge.column(BpeEncode(ColumnBridge.expression(tokens), flatMerges))

  def pqCodes(vec: Column, m: Int, k: Int, flatCodebooks: Seq[Float]): Column =
    ColumnBridge.column(PqCodes(ColumnBridge.expression(vec), m, k, flatCodebooks))

  def pqResidualCodes(vec: Column, cell: Column, m: Int, k: Int,
      flatCodebooks: Seq[Float], flatCentroids: Seq[Float]): Column =
    ColumnBridge.column(PqResidualCodes(ColumnBridge.expression(vec),
      ColumnBridge.expression(cell), m, k, flatCodebooks, flatCentroids))

  def adcTable(vec: Column, m: Int, k: Int, flatCodebooks: Seq[Float]): Column =
    ColumnBridge.column(AdcTable(ColumnBridge.expression(vec), m, k, flatCodebooks))

  def adcSum(codes: Column, tbl: Column): Column =
    ColumnBridge.column(AdcSum(ColumnBridge.expression(codes), ColumnBridge.expression(tbl)))

  def int8QuantStats(vec: Column): Column =
    ColumnBridge.column(Int8QuantStats(ColumnBridge.expression(vec)))

  def dequantizeInt8(vec: Column): Column =
    ColumnBridge.column(DequantizeInt8(ColumnBridge.expression(vec)))

  def signLsh(vec: Column, nPlanes: Int, dim: Int): Column =
    ColumnBridge.column(SignLsh(ColumnBridge.expression(vec), nPlanes, dim))

  def zOrder2(a: Column, b: Column): Column =
    ColumnBridge.column(ZOrder2(ColumnBridge.expression(a), ColumnBridge.expression(b)))

  def bloomMightContain(
      bloom: org.apache.spark.broadcast.Broadcast[org.apache.spark.util.sketch.BloomFilter],
      hash: Column): Column =
    ColumnBridge.column(BloomMightContain(ColumnBridge.expression(hash), bloom))
}
