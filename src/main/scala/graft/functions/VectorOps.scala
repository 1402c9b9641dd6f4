package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Sequential-fold dot product of two float-array columns in double, as a
  * native Catalyst expression. On DENSE, EQUAL-LENGTH arrays it is
  * bit-identical to the zip_with+aggregate builtin composition it replaces
  * (same left-to-right double fold — matches a DuckDB DOUBLE[] fold), but
  * one tight primitive loop per pair instead of materializing an
  * intermediate product array and walking it with generic per-element
  * evaluation. This sits in the innermost loop of every pairwise-similarity
  * join (near-dup, knn), where the per-pair allocation dominates.
  *
  * Divergence from the builtin fold on NON-dense inputs (not a supported
  * shape — see the precondition on [[graft.ops.Similarity.dot]]): ragged
  * arrays truncate to min length and null elements contribute 0, where the
  * builtin would return NULL for the whole sum.
  *
  * doGenCode is a static call into [[VectorOps.dotF64]], so the surrounding
  * whole-stage codegen span stays intact.
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

  /** Spark's Round-on-double codegen semantics, replicated exactly:
    * NaN/Infinity pass through; else BigDecimal.valueOf → setScale
    * HALF_UP → doubleValue (the decimal-string form, NOT the exact-binary
    * `new BigDecimal(double)` — they differ on ties). */
  private def sparkRound(x: Double, scale: Int): Double =
    if (java.lang.Double.isNaN(x) || java.lang.Double.isInfinite(x)) x
    else java.math.BigDecimal.valueOf(x)
      .setScale(scale, java.math.RoundingMode.HALF_UP).doubleValue()

  /** One-pass int8 quantization stats; called from generated code.
    * Returns null when max|x| = 0 (no defined scale). */
  def int8QuantStats(vec: ArrayData): org.apache.spark.sql.catalyst.InternalRow = {
    val n = vec.numElements()
    var maxAbs = 0.0
    var i = 0
    while (i < n) {
      if (!vec.isNullAt(i)) {
        val a = math.abs(vec.getFloat(i).toDouble)
        if (a > maxAbs) maxAbs = a
      }
      i += 1
    }
    val scale = maxAbs / 127.0
    if (!(scale > 0.0)) return null
    var nSat = 0L
    var err = 0L
    i = 0
    while (i < n) {
      if (!vec.isNullAt(i)) {
        val x = vec.getFloat(i).toDouble
        val q = sparkRound(x / scale, 0)
        if (math.abs(q) == 127.0) nSat += 1
        val d = x - q * scale
        err += sparkRound(d * d * 1e12, 0).toLong
      }
      i += 1
    }
    new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
      Array[Any](sparkRound(scale, 6), nSat, err))
  }

  /** One-pass int8 dequantization; called from generated code. */
  def dequantizeInt8(vec: ArrayData): ArrayData = {
    val n = vec.numElements()
    var maxAbs = 0.0
    var i = 0
    while (i < n) {
      if (!vec.isNullAt(i)) {
        val a = math.abs(vec.getFloat(i).toDouble)
        if (a > maxAbs) maxAbs = a
      }
      i += 1
    }
    val scale = maxAbs / 127.0
    if (!(scale > 0.0)) return null
    val out = new Array[Float](n)
    i = 0
    while (i < n) {
      val x = if (vec.isNullAt(i)) 0.0 else vec.getFloat(i).toDouble
      out(i) = (sparkRound(x / scale, 0) * scale).toFloat
      i += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }

  /** One-pass sign-LSH bucket; called from generated code. Left-to-right
    * double fold per plane — same addition order as the builtin aggregate
    * fold, so the dots (and their signs) are bit-identical on dense
    * length-`dim` inputs. Length mismatch → bucket 0, matching the
    * null-padded builtin fold. */
  def signLsh(vec: ArrayData, nPlanes: Int, dim: Int): Long = {
    if (vec.numElements() != dim) return 0L
    val w = SignLsh.weights(nPlanes, dim)
    var bucket = 0L
    var p = 0
    while (p < nPlanes) {
      var s = 0.0
      var i = 0
      val base = p * dim
      while (i < dim) {
        if (!vec.isNullAt(i)) s += vec.getFloat(i).toDouble * w(base + i)
        i += 1
      }
      if (s > 0.0) bucket |= (1L << p)
      p += 1
    }
    bucket
  }

  /** One-pass MinHash signature; called from generated code. Parameter
    * tables are cached per numHashes (tiny; computed once per JVM). */
  def minhashSig(hashes: ArrayData, numHashes: Int): ArrayData = {
    val (as, bs) = paramCache.computeIfAbsent(numHashes, mkParams)
    val p = MinHashParams.P
    val mins = new Array[Long](numHashes)
    java.util.Arrays.fill(mins, Long.MaxValue)
    val n = hashes.numElements()
    var i = 0
    while (i < n) {
      if (!hashes.isNullAt(i)) {
        val h = java.lang.Math.floorMod(hashes.getLong(i), p)
        var j = 0
        while (j < numHashes) {
          val v = java.lang.Math.floorMod(as(j) * h + bs(j), p)
          if (v < mins(j)) mins(j) = v
          j += 1
        }
      }
      i += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(mins)
  }

  /** One-pass shingle hashing; called from generated code. Chains XXH64
    * across each window's tokens with seed 42, exactly matching Catalyst's
    * xxhash64 over an array<string> slice; null elements are skipped (the
    * builtin leaves the accumulated seed unchanged for null elements). */
  private def windowHash(tokens: ArrayData, start: Int, len: Int): Long = {
    import org.apache.spark.sql.catalyst.expressions.XXH64
    var h = 42L
    var j = start
    val end = start + len
    while (j < end) {
      if (!tokens.isNullAt(j)) {
        val s = tokens.getUTF8String(j)
        h = XXH64.hashUnsafeBytes(s.getBaseObject, s.getBaseOffset, s.numBytes(), h)
      }
      j += 1
    }
    h
  }

  /** Content-defined chunk boundaries (one native pass; called from
    * generated code): cut after 1-indexed position e when the chained-XXH64
    * hash of the w-token window ending at e (same [[windowHash]] chain as
    * the shingle family — bit-identical to `xxhash64(slice(toks, e-w+1, w))`)
    * has its maskBits low bits zero AND the chunk so far is >= minSize;
    * a chunk reaching maxSize cuts unconditionally; the array end is
    * always a boundary. Returns the ascending cut positions (last = n).
    * The sequential cut-depends-on-previous-cut fold that makes this a
    * per-row loop rather than a window/shuffle. */
  def cdcBoundaries(tokens: ArrayData, w: Int, maskBits: Int,
      minSize: Int, maxSize: Int): ArrayData = {
    val n = tokens.numElements()
    if (n == 0)
      return new org.apache.spark.sql.catalyst.util.GenericArrayData(
        new Array[Int](0))
    val mask = (1L << maskBits) - 1L
    val out = new java.util.ArrayList[Integer](n / minSize + 1)
    var last = 0
    var e = 1
    while (e <= n) {
      val len = e - last
      // hash only when a candidate cut could take effect (len >= minSize):
      // the standard LBFS/FastCDC skip — ~minSize/avgChunk of all window
      // hashes never need computing (this loop is the per-doc hot path).
      val cand = len >= minSize && e >= w &&
        (windowHash(tokens, e - w, w) & mask) == 0L
      if (cand || len >= maxSize) { out.add(e); last = e }
      e += 1
    }
    if (last != n) out.add(n)
    val arr = new Array[Int](out.size())
    var j = 0
    while (j < arr.length) { arr(j) = out.get(j).intValue(); j += 1 }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(arr)
  }

  def shingleHashes(tokens: ArrayData, k: Int): ArrayData = {
    val n = tokens.numElements()
    def windowHash(start: Int, len: Int): Long = VectorOps.windowHash(tokens, start, len)
    val seen = new java.util.LinkedHashSet[java.lang.Long]()
    if (n < k) seen.add(windowHash(0, n))
    else {
      var pos = 0
      while (pos <= n - k) { seen.add(windowHash(pos, k)); pos += 1 }
    }
    val out = new Array[Long](seen.size())
    val it = seen.iterator()
    var j = 0
    while (it.hasNext) { out(j) = it.next().longValue(); j += 1 }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }

  /** ALL k-token window hashes in POSITIONAL order (no dedup) — the span
    * key projection under scrubDupSpans: out(p) hashes tokens[p, p+k).
    * Same chained XXH64 as [[shingleHashes]], so span stats and the scrub
    * agree on span identity bit-for-bit; n < k collapses to one
    * whole-text window (shingle convention). Called from generated code. */
  def shingleHashesAll(tokens: ArrayData, k: Int): ArrayData = {
    val n = tokens.numElements()
    val out =
      if (n < k) Array(windowHash(tokens, 0, n))
      else {
        val a = new Array[Long](n - k + 1)
        var pos = 0
        while (pos <= n - k) { a(pos) = windowHash(tokens, pos, k); pos += 1 }
        a
      }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }

  /** Tokenizer apply for [[BpeEncode]]: per non-null non-empty token,
    * character symbols folded through the merge rules in order, each
    * applied left-to-right non-overlapping — [[graft.ops.Bpe.applyMerge]]
    * semantics exactly (spec-pinned). Called from generated code. */
  def bpeEncode(tokens: ArrayData, rules: Array[String]): ArrayData = {
    val out = scala.collection.mutable.ArrayBuffer.empty[Any]
    val n = tokens.numElements()
    var i = 0
    while (i < n) {
      if (!tokens.isNullAt(i)) {
        val w = tokens.getUTF8String(i).toString
        if (w.nonEmpty) {
          val syms = new Array[String](w.length)
          var c = 0
          while (c < w.length) { syms(c) = String.valueOf(w.charAt(c)); c += 1 }
          var len = w.length
          var r = 0
          while (r < rules.length) {
            val a = rules(r); val b = rules(r + 1)
            var wr = 0; var rd = 0
            while (rd < len) {
              if (rd + 1 < len && syms(rd) == a && syms(rd + 1) == b) {
                syms(wr) = a + b; rd += 2
              } else { syms(wr) = syms(rd); rd += 1 }
              wr += 1
            }
            len = wr
            r += 2
          }
          var s = 0
          while (s < len) {
            out += org.apache.spark.unsafe.types.UTF8String.fromString(syms(s))
            s += 1
          }
        }
      }
      i += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out.toArray)
  }

  /** One-pass winnowing; called from generated code. Distinct mins in
    * first-occurrence order. */
  def winnow(hashes: ArrayData, window: Int): ArrayData = {
    val n = hashes.numElements()
    val seen = new java.util.LinkedHashSet[java.lang.Long]()
    if (n > 0) {
      val last = math.max(n - window, 0)
      var pos = 0
      while (pos <= last) {
        var m = Long.MaxValue
        val end = math.min(pos + window, n)
        var i = pos
        while (i < end) {
          if (!hashes.isNullAt(i)) { val v = hashes.getLong(i); if (v < m) m = v }
          i += 1
        }
        seen.add(m)
        pos += 1
      }
    }
    val out = new Array[Long](seen.size())
    val it = seen.iterator()
    var j = 0
    while (it.hasNext) { out(j) = it.next().longValue(); j += 1 }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }

  /** One-pass repetition stats; called from generated code. */
  def repetitionStats(tokens: ArrayData): ArrayData = {
    import org.apache.spark.unsafe.types.UTF8String
    val n = tokens.numElements()
    val plus: java.util.function.BiFunction[Integer, Integer, Integer] =
      (a: Integer, b: Integer) => Integer.valueOf(a + b)
    val tokCounts = new java.util.HashMap[UTF8String, Integer]()
    var i = 0
    while (i < n) {
      val t = if (tokens.isNullAt(i)) UTF8String.EMPTY_UTF8 else tokens.getUTF8String(i)
      tokCounts.merge(t, Integer.valueOf(1), plus)
      i += 1
    }
    var topTok = 0
    val tIt = tokCounts.values().iterator()
    while (tIt.hasNext) { val c = tIt.next().intValue(); if (c > topTok) topTok = c }

    val sep = UTF8String.fromString(" ")
    val biCounts = new java.util.HashMap[UTF8String, Integer]()
    var nBigrams = 0L
    if (n < 2) {
      // shinglesAll(k=2) semantics: whole text as the single shingle
      val whole = if (n == 1 && !tokens.isNullAt(0)) tokens.getUTF8String(0)
        else UTF8String.EMPTY_UTF8
      biCounts.merge(whole, Integer.valueOf(1), plus)
      nBigrams = 1L
    } else {
      i = 0
      while (i < n - 1) {
        val a = if (tokens.isNullAt(i)) UTF8String.EMPTY_UTF8 else tokens.getUTF8String(i)
        val b = if (tokens.isNullAt(i + 1)) UTF8String.EMPTY_UTF8 else tokens.getUTF8String(i + 1)
        biCounts.merge(UTF8String.concat(a, sep, b), Integer.valueOf(1), plus)
        nBigrams += 1; i += 1
      }
    }
    var topBi = 0
    val bIt = biCounts.values().iterator()
    while (bIt.hasNext) { val c = bIt.next().intValue(); if (c > topBi) topBi = c }

    new org.apache.spark.sql.catalyst.util.GenericArrayData(Array[Long](
      n.toLong, tokCounts.size().toLong, topTok.toLong, topBi.toLong, nBigrams))
  }

  private val paramCache =
    new java.util.concurrent.ConcurrentHashMap[Int, (Array[Long], Array[Long])]()
  private val mkParams =
    new java.util.function.Function[Int, (Array[Long], Array[Long])] {
      def apply(n: Int): (Array[Long], Array[Long]) =
        (Array.tabulate(n)(MinHashParams.a), Array.tabulate(n)(MinHashParams.b))
    }
}

/** Distinct xxhash64 hashes of the k-token shingles of a token array, in
  * ONE native pass: hash each length-k window by chaining XXH64 over its
  * tokens (exactly how Catalyst's xxhash64 folds an array slice — seed 42,
  * then h = xxh64(tokenBytes, h) per element), no slice-array
  * materialization per shingle. Arrays shorter than k collapse to one
  * whole-array hash; distinct preserves first occurrence, matching
  * array_distinct. Bit-identical to the builtin
  * `array_distinct(transform(sequence, i -> xxhash64(slice(toks,i+1,k))))`
  * composition (spec-enforced) — shingle hashing is the per-row hot loop
  * under MinHash, winnowing, and n-gram verification. */
case class ShingleHashes(child: Expression, k: Int)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {
  require(k >= 1, s"k must be >= 1, got $k")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "shingle_hashes"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"shingle_hashes requires array<string> input, got ${other.catalogString}")
  }

  override protected def nullSafeEval(input: Any): Any =
    VectorOps.shingleHashes(input.asInstanceOf[ArrayData], k)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.VectorOps.shingleHashes($c, $k)")

  override protected def withNewChildInternal(newChild: Expression): ShingleHashes =
    copy(child = newChild)
}

/** Content-defined chunk boundaries as a native expression — the CDC
  * boundary fold of [[graft.ops.TextAnalysis.cdcChunks]] in one tight loop
  * per row (the interpreted higher-order aggregate it replaces was the
  * per-doc hot path; same chained window hash as [[ShingleHashes]], so a
  * CDC cut and a span key agree on window identity). Bit-identical to the
  * builtin fold composition (spec-enforced). */
case class CdcBoundaries(child: Expression, w: Int, maskBits: Int,
    minSize: Int, maxSize: Int)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {
  require(w >= 1, s"w must be >= 1, got $w")
  require(maskBits >= 0 && maskBits < 63, s"maskBits out of range: $maskBits")
  require(minSize >= 1 && minSize <= maxSize,
    s"need 1 <= minSize <= maxSize, got $minSize/$maxSize")

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def prettyName: String = "cdc_boundaries"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"cdc_boundaries requires array<string> input, got ${other.catalogString}")
  }

  override protected def nullSafeEval(input: Any): Any =
    VectorOps.cdcBoundaries(input.asInstanceOf[ArrayData], w, maskBits,
      minSize, maxSize)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.VectorOps.cdcBoundaries($c, $w, $maskBits, $minSize, $maxSize)")

  override protected def withNewChildInternal(newChild: Expression): CdcBoundaries =
    copy(child = newChild)
}

/** Positional (non-distinct) sibling of [[ShingleHashes]]: element p is the
  * chained-XXH64 hash of the k-token window starting at p, so
  * `posexplode` yields (position, span-key) pairs — the 8-byte span
  * identity under exact substring scrub. Same hash chain as
  * [[ShingleHashes]] (bit-identical keys across the two). */
case class ShingleHashesAll(child: Expression, k: Int)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {
  require(k >= 1, s"k must be >= 1, got $k")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "shingle_hashes_all"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"shingle_hashes_all requires array<string> input, got ${other.catalogString}")
  }

  override protected def nullSafeEval(input: Any): Any =
    VectorOps.shingleHashesAll(input.asInstanceOf[ArrayData], k)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.VectorOps.shingleHashesAll($c, $k)")

  override protected def withNewChildInternal(newChild: Expression): ShingleHashesAll =
    copy(child = newChild)
}

/** Winnowing fingerprint set (Schleimer et al., SIGMOD'03) of a shingle-
  * hash array in ONE native pass per row: the distinct sliding-window-min
  * hashes, matching the posexplode+window formulation exactly (full
  * windows only; arrays shorter than the window collapse to one global
  * min). Replaces two corpus-wide window sorts + distinct with a pure
  * scan projection — zero shuffle. */
case class Winnow(child: Expression, window: Int)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {
  require(window >= 1, s"window must be >= 1, got $window")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "winnow"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"winnow requires array<bigint> input, got ${other.catalogString}")
  }

  override protected def nullSafeEval(input: Any): Any =
    VectorOps.winnow(input.asInstanceOf[ArrayData], window)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.VectorOps.winnow($c, $window)")

  override protected def withNewChildInternal(newChild: Expression): Winnow =
    copy(child = newChild)
}

/** Repetition statistics of a token array in ONE native pass per row:
  * returns [n_tokens, n_distinct, top_token_count, top_bigram_count,
  * n_bigrams] as array<bigint>. The composed formulation needs two
  * explode→groupBy→groupBy pyramids (token grain + bigram grain) plus a
  * join — three shuffles of corpus-token-count rows; this computes the
  * same integers inside the scan projection with two per-row hash maps.
  * Bigrams follow shinglesAll(k=2) semantics: fewer than 2 tokens → one
  * whole-text bigram. Bit-identical to the aggregate formulation
  * (spec-enforced).
  */
/** BPE tokenizer APPLY as a native expression — the encode-side hot loop
  * of [[graft.ops.Bpe]]: per word, split to character symbols and apply
  * each merge rule in training order, left-to-right non-overlapping (the
  * classic encoder). Input is the token array (whitespace words), output
  * the flat subword array. At 100 TB the tokenizer-apply pass touches
  * every byte of the corpus — the Scala-UDF form this replaces paid
  * boxed Row↔Scala conversion per DOCUMENT and an interpreted closure
  * per word (bench: 2.7 s → native at sf0.1); this compiles to a static
  * call inside the scan's codegen span like the other text expressions.
  * Null/empty tokens are skipped (the UDF filtered them); `merges` is
  * the rule list flattened [a1,b1,a2,b2,…] so the expression keeps value
  * equality. */
case class BpeEncode(child: Expression, merges: Seq[String])
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {
  require(merges.length % 2 == 0, "merges must be (left,right) pairs flattened")

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "bpe_encode"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"bpe_encode requires array<string> input, got ${other.catalogString}")
  }

  @transient private lazy val rules: Array[String] = merges.toArray

  override protected def nullSafeEval(input: Any): Any =
    VectorOps.bpeEncode(input.asInstanceOf[ArrayData], rules)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val rulesRef = ctx.addReferenceObj("bpeMerges", rules, "java.lang.String[]")
    defineCodeGen(ctx, ev,
      c => s"graft.functions.VectorOps.bpeEncode($c, $rulesRef)")
  }

  override protected def withNewChildInternal(newChild: Expression): BpeEncode =
    copy(child = newChild)
}

case class RepetitionStats(child: Expression)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "repetition_stats"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"repetition_stats requires array<string> input, got ${other.catalogString}")
  }

  override protected def nullSafeEval(input: Any): Any =
    VectorOps.repetitionStats(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.VectorOps.repetitionStats($c)")

  override protected def withNewChildInternal(newChild: Expression): RepetitionStats =
    copy(child = newChild)
}

/** MinHash signature of a 64-bit shingle-hash array as ONE native pass per
  * row: `numHashes` affine permutations (aᵢ·h + bᵢ mod P, P = 2³¹−1) folded
  * to their minima in a single loop over the array.
  *
  * The composed formulation (explode → groupBy(id) with numHashes min
  * aggregates) shuffles every exploded shingle row and drives a 64-buffer
  * hash aggregate; this expression computes the identical signature inside
  * the scan projection — ZERO shuffle, no aggregation machinery — which at
  * corpus scale turns the signature stage from the dominant shuffle into a
  * free map. Permutation parameters derive from the hash index by the same
  * splitmix64 mixing as the aggregate form (bit-identical output, covered
  * by spec).
  */
case class MinHashSig(child: Expression, numHashes: Int)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "minhash_sig"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) if numHashes <= 0 =>
      // fail at ANALYSIS like the other parameterized expressions —
      // a non-positive width would NegativeArraySize per row mid-job
      // (or silently emit empty signatures that band-collide every doc)
      TypeCheckResult.TypeCheckFailure(
        s"minhash_sig needs numHashes > 0, got $numHashes")
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"minhash_sig requires array<bigint> input, got ${other.catalogString}")
  }

  override protected def nullSafeEval(input: Any): Any =
    VectorOps.minhashSig(input.asInstanceOf[ArrayData], numHashes)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.VectorOps.minhashSig($c, $numHashes)")

  override protected def withNewChildInternal(newChild: Expression): MinHashSig =
    copy(child = newChild)
}

/** Probe a broadcast Bloom filter with a 64-bit hash, inside whole-stage
  * codegen. The filter rides the expression as a Broadcast HANDLE — tasks
  * serialize a few bytes and executors fetch the bitset once via torrent,
  * exactly like the join-side broadcast it replaces; the bit test itself is
  * a static call, so the batch-probe scan of [[graft.ops.Dedup.bloomDedup]]
  * (the repeated-100 TB-ingest path) stays one unbroken codegen span where
  * the previous Scala UDF forced a per-row interpreted boundary. */
case class BloomMightContain(
    child: Expression,
    bloom: org.apache.spark.broadcast.Broadcast[org.apache.spark.util.sketch.BloomFilter])
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {

  override def dataType: DataType = BooleanType
  override def prettyName: String = "bloom_might_contain"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case LongType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"bloom_might_contain requires bigint input, got ${other.catalogString}")
  }

  @transient private lazy val filter = bloom.value

  override protected def nullSafeEval(input: Any): Any =
    java.lang.Boolean.valueOf(filter.mightContainLong(input.asInstanceOf[Long]))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val bcRef = ctx.addReferenceObj("bloomBc", bloom,
      "org.apache.spark.broadcast.Broadcast")
    // Resolve broadcast.value() once per task, not once per row.
    val local = ctx.addMutableState("org.apache.spark.util.sketch.BloomFilter",
      "graftBloom",
      v => s"$v = (org.apache.spark.util.sketch.BloomFilter) $bcRef.value();")
    defineCodeGen(ctx, ev, c => s"$local.mightContainLong($c)")
  }

  override protected def withNewChildInternal(newChild: Expression): BloomMightContain =
    copy(child = newChild)
}

/** Per-vector symmetric int8 quantization STATISTICS in ONE native pass:
  * `struct(scale6, n_sat, err_pico)` — the round-6-digit scale, the count
  * of saturated |q|=127 codes, and the order-independent exact integer sum
  * of per-element squared reconstruction errors in 1e-12 units. NULL for
  * a vector with max|x| = 0 (no defined scale — the composed form filters
  * those rows; callers filter isNotNull).
  *
  * The builtin composition this replaces
  * ([[graft.ops.Similarity.quantizeInt8Fold]]) walks each row's array
  * FIVE times through interpreted higher-order lambdas (cast, abs-max,
  * round-divide, saturation filter, error zip-fold — none of Spark's
  * higher-order functions participate in codegen); this computes the same
  * numbers in one primitive loop inside the scan's codegen span — the
  * corpus-wide persist path of an embedding store at 100 TB. Rounding
  * replicates Spark's Round codegen for doubles EXACTLY
  * (`java.math.BigDecimal.valueOf(x).setScale(s, HALF_UP)` with NaN/Inf
  * passthrough), so outputs are bit-identical (spec-enforced).
  *
  * Honest measurement note: unlike the DotF64/SignLsh swaps, the warm
  * per-row win here is modest (~5% at 32k×64f) — the HALF_UP BigDecimal
  * rounding that the bit-exact contract requires dominates BOTH forms.
  * What the native form buys structurally is one pass instead of five,
  * no per-pass array materialization, and an unbroken whole-stage-codegen
  * span for whatever pipeline stage surrounds the quantization.
  * PRECONDITION: dense finite vectors (like every embedding op here);
  * null elements are skipped where the builtin would null the row's sum.
  */
case class Int8QuantStats(child: Expression)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {

  override def dataType: DataType = StructType(Seq(
    StructField("scale6", DoubleType, nullable = false),
    StructField("n_sat", LongType, nullable = false),
    StructField("err_pico", LongType, nullable = false)))
  override def nullable: Boolean = true
  override def prettyName: String = "int8_quant_stats"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"int8_quant_stats requires array<float> input, got ${other.catalogString}")
  }

  override protected def nullSafeEval(input: Any): Any =
    VectorOps.int8QuantStats(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => s"""
      ${ev.value} = graft.functions.VectorOps.int8QuantStats($c);
      ${ev.isNull} = (${ev.value} == null);
    """)

  override protected def withNewChildInternal(newChild: Expression): Int8QuantStats =
    copy(child = newChild)
}

/** The int8-reconstructed vector x̂_i = round(x_i/scale)·scale as
  * array<float>, in ONE native pass (same rounding replication and NULL
  * contract as [[Int8QuantStats]]) — the read path of the quantized store
  * that [[graft.ops.Similarity.dequantized]] feeds to quantized search. */
case class DequantizeInt8(child: Expression)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {

  override def dataType: DataType = ArrayType(FloatType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "dequantize_int8"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"dequantize_int8 requires array<float> input, got ${other.catalogString}")
  }

  override protected def nullSafeEval(input: Any): Any =
    VectorOps.dequantizeInt8(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => s"""
      ${ev.value} = graft.functions.VectorOps.dequantizeInt8($c);
      ${ev.isNull} = (${ev.value} == null);
    """)

  override protected def withNewChildInternal(newChild: Expression): DequantizeInt8 =
    copy(child = newChild)
}

/** Random-hyperplane LSH bucket id (Charikar, STOC'02) of a float-vector
  * column in ONE native pass per row: bit p of the bucket is the sign of
  * the dot product with deterministic pseudo-random hyperplane p.
  *
  * The composed-builtins form this replaces
  * ([[graft.ops.Similarity.lshBucketFold]]) evaluates, PER CORPUS ROW,
  * nPlanes × (sequence + transform + zip_with + aggregate) interpreted
  * higher-order lambdas with an xxhash64 per element — the dominant cost
  * of LSH corpus prep. Here the plane weights are derived ONCE per
  * (nPlanes, dim) per JVM (the same `xxhash64(d + p·65536)/Long.MaxValue`
  * derivation, bit-for-bit: Catalyst hashes an int input via
  * `XXH64.hashInt(v, seed=42)`) and cached; each row is then one
  * nPlanes×dim primitive multiply-add loop inside the scan's codegen span.
  * Bit-identical to the builtin composition on DENSE length-`dim` vectors
  * (spec-enforced); like the builtin, a vector whose length ≠ dim buckets
  * to 0 (there the null-padded fold nulls every plane's dot).
  * Divergence on null ELEMENTS (not a supported shape): the builtin nulls
  * the plane dot (bit 0), this treats them as 0 (bit = sign of the rest).
  */
case class SignLsh(child: Expression, nPlanes: Int, dim: Int)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {
  require(nPlanes >= 1 && nPlanes <= 63, s"need 1 <= nPlanes <= 63, got $nPlanes")
  require(dim >= 1, s"need dim >= 1, got $dim")

  override def dataType: DataType = LongType
  override def prettyName: String = "sign_lsh"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"sign_lsh requires array<float> input, got ${other.catalogString}")
  }

  override protected def nullSafeEval(input: Any): Any =
    java.lang.Long.valueOf(VectorOps.signLsh(
      input.asInstanceOf[ArrayData], nPlanes, dim))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.VectorOps.signLsh($c, $nPlanes, $dim)")

  override protected def withNewChildInternal(newChild: Expression): SignLsh =
    copy(child = newChild)
}

object SignLsh {
  /** Plane-weight tables, computed once per (nPlanes, dim) per JVM —
    * weight(p, d) = xxhash64_int(d + p·65536, seed 42) / Long.MaxValue,
    * exactly the builtin composition's planeComponent. */
  private val cache =
    new java.util.concurrent.ConcurrentHashMap[(Int, Int), Array[Double]]()
  def weights(nPlanes: Int, dim: Int): Array[Double] =
    cache.computeIfAbsent((nPlanes, dim), { case (np, d) =>
      val w = new Array[Double](np * d)
      var p = 0
      while (p < np) {
        var i = 0
        while (i < d) {
          w(p * d + i) =
            org.apache.spark.sql.catalyst.expressions.XXH64
              .hashInt(i + p * 65536, 42L).toDouble / Long.MaxValue.toDouble
          i += 1
        }
        p += 1
      }
      w
    })
}

object MinHashParams {
  /** Mersenne prime 2³¹−1: a·h + b stays ≤ ~2⁶² — no long overflow. */
  val P = 2147483647L

  private def mix(i: Long): Long = {
    var z = i + 0x9e3779b97f4a7c15L
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z ^ (z >>> 31)
  }

  /** Deterministic (aᵢ, bᵢ) for permutation i — identical derivation to the
    * aggregate formulation in [[graft.ops.Dedup.minhashSignature]]. */
  def a(i: Int): Long = java.lang.Math.floorMod(mix(2L * i), P - 1) + 1
  def b(i: Int): Long = java.lang.Math.floorMod(mix(2L * i + 1), P)
}
