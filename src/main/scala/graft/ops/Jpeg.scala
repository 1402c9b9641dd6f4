package graft.ops

/** Minimal baseline JPEG codec, implemented from the PUBLIC ITU-T T.81
  * specification (sequential DCT, Huffman entropy coding) with zero
  * external dependencies — the heavyweight-codec tier the container
  * decoders ([[Multimodal.Ppm]]/[[Multimodal.Qoi]]) stubbed out until
  * round 16. Real crawl corpora are JPEG-dominated, so this is what
  * makes image dedup/quality run on actual crawl data.
  *
  * Decoder scope (refuses anything else LOUDLY, never silently):
  *  - SOF0/SOF1 (baseline + extended sequential) AND SOF2 progressive
  *    (round 16: spectral selection + successive approximation per
  *    Annex G — multi-scan coefficient accumulation, EOBRUN end-of-band
  *    runs, DC/AC refinement passes), Huffman, 8-bit precision;
  *    lossless, differential, and arithmetic-coded modes are rejected
  *    with a named error.
  *  - 1 or 3 components, any sampling factors 1-4 (covers 4:4:4,
  *    4:2:2, 4:2:0, 4:4:0); nearest-neighbor chroma upsampling.
  *  - Baseline: one interleaved scan (Ns = Nf), or the trivial
  *    single-component scan; progressive: any spec-legal scan script
  *    (interleaved DC, single-component AC bands). Restart markers
  *    (DRI/RSTn); FF00 byte stuffing; fill bytes; APPn/COM skipped by
  *    length; 8- and 16-bit DQT.
  *  - Huffman tables built per T.81 Annex C, decoded with the
  *    MINCODE/MAXCODE/VALPTR procedure of F.2.2.3; DC prediction and
  *    AC run/size coding per F.2.2.1-2.
  *  - IDCT: double-precision separable reference definition (A.3.3).
  *    A DC-only block therefore reconstructs its constant value
  *    EXACTLY (D/8 is an exact integer for our fixtures' quant
  *    tables), which is what makes the m_jpeg DuckDB oracle analytic.
  *  - YCbCr→RGB: libjpeg-convention integer fixed point
  *    (R = Y + (91881·Cr' + 32768) >> 16, etc., 2^16 scale) so a SQL
  *    oracle can replay the conversion in exact integer arithmetic.
  *
  * Encoder scope (fixtures + interop tests): SOF0, grayscale or
  * 3-component with arbitrary (sampH, sampV) chroma geometry, caller
  * -supplied quantization tables, the standard Annex K Huffman
  * tables, optional restart intervals. [[encode]] additionally does
  * the JFIF RGB→YCbCr forward transform and box-average chroma
  * subsampling; [[encodeYcc]] takes planes directly so fixture
  * generators control the exact coded samples.
  *
  * Malformed input throws IllegalArgumentException — callers choose
  * skip-vs-fail (the [[Multimodal.decodeAnyImages]] DROPMALFORMED
  * contract, same as CSV).
  */
object Jpeg {

  private def fail(msg: String): Nothing =
    throw new IllegalArgumentException(s"jpeg: $msg")

  /** Zig-zag scan order: natural (row-major) index of the k-th
    * coefficient in transmission order (T.81 Figure A.6). */
  private[ops] val Zigzag: Array[Int] = Array(
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63)

  /** A(x)(u) = C(u)/2 · cos((2x+1)uπ/16) — the separable (I)DCT basis
    * half-matrix; f = Aᵀ·F·A and F = A·f·Aᵀ (T.81 A.3.3). */
  private val A: Array[Array[Double]] = Array.tabulate(8, 8) { (x, u) =>
    val c = if (u == 0) 1.0 / math.sqrt(2.0) else 1.0
    0.5 * c * math.cos((2 * x + 1) * u * math.Pi / 16.0)
  }

  // ---- standard Huffman tables (T.81 Annex K.3) ----
  // (BITS counts for code lengths 1..16, then HUFFVAL in code order)

  private[ops] val StdDcLumaBits = Array(0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0)
  private[ops] val StdDcLumaVals = (0 to 11).toArray
  private[ops] val StdDcChromaBits = Array(0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0)
  private[ops] val StdDcChromaVals = (0 to 11).toArray

  private[ops] val StdAcLumaBits = Array(0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 125)
  private[ops] val StdAcLumaVals: Array[Int] = Array(
    0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12, 0x21, 0x31, 0x41,
    0x06, 0x13, 0x51, 0x61, 0x07, 0x22, 0x71, 0x14, 0x32, 0x81, 0x91,
    0xa1, 0x08, 0x23, 0x42, 0xb1, 0xc1, 0x15, 0x52, 0xd1, 0xf0, 0x24,
    0x33, 0x62, 0x72, 0x82, 0x09, 0x0a, 0x16, 0x17, 0x18, 0x19, 0x1a,
    0x25, 0x26, 0x27, 0x28, 0x29, 0x2a, 0x34, 0x35, 0x36, 0x37, 0x38,
    0x39, 0x3a, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4a, 0x53,
    0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5a, 0x63, 0x64, 0x65, 0x66,
    0x67, 0x68, 0x69, 0x6a, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
    0x7a, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8a, 0x92, 0x93,
    0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9a, 0xa2, 0xa3, 0xa4, 0xa5,
    0xa6, 0xa7, 0xa8, 0xa9, 0xaa, 0xb2, 0xb3, 0xb4, 0xb5, 0xb6, 0xb7,
    0xb8, 0xb9, 0xba, 0xc2, 0xc3, 0xc4, 0xc5, 0xc6, 0xc7, 0xc8, 0xc9,
    0xca, 0xd2, 0xd3, 0xd4, 0xd5, 0xd6, 0xd7, 0xd8, 0xd9, 0xda, 0xe1,
    0xe2, 0xe3, 0xe4, 0xe5, 0xe6, 0xe7, 0xe8, 0xe9, 0xea, 0xf1, 0xf2,
    0xf3, 0xf4, 0xf5, 0xf6, 0xf7, 0xf8, 0xf9, 0xfa)
  private[ops] val StdAcChromaBits = Array(0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 119)
  private[ops] val StdAcChromaVals: Array[Int] = Array(
    0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21, 0x31, 0x06, 0x12,
    0x41, 0x51, 0x07, 0x61, 0x71, 0x13, 0x22, 0x32, 0x81, 0x08, 0x14,
    0x42, 0x91, 0xa1, 0xb1, 0xc1, 0x09, 0x23, 0x33, 0x52, 0xf0, 0x15,
    0x62, 0x72, 0xd1, 0x0a, 0x16, 0x24, 0x34, 0xe1, 0x25, 0xf1, 0x17,
    0x18, 0x19, 0x1a, 0x26, 0x27, 0x28, 0x29, 0x2a, 0x35, 0x36, 0x37,
    0x38, 0x39, 0x3a, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4a,
    0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5a, 0x63, 0x64, 0x65,
    0x66, 0x67, 0x68, 0x69, 0x6a, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78,
    0x79, 0x7a, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8a,
    0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9a, 0xa2, 0xa3,
    0xa4, 0xa5, 0xa6, 0xa7, 0xa8, 0xa9, 0xaa, 0xb2, 0xb3, 0xb4, 0xb5,
    0xb6, 0xb7, 0xb8, 0xb9, 0xba, 0xc2, 0xc3, 0xc4, 0xc5, 0xc6, 0xc7,
    0xc8, 0xc9, 0xca, 0xd2, 0xd3, 0xd4, 0xd5, 0xd6, 0xd7, 0xd8, 0xd9,
    0xda, 0xe2, 0xe3, 0xe4, 0xe5, 0xe6, 0xe7, 0xe8, 0xe9, 0xea, 0xf2,
    0xf3, 0xf4, 0xf5, 0xf6, 0xf7, 0xf8, 0xf9, 0xfa)

  /** Standard quantization tables (T.81 Annex K.1, natural order). */
  val StdQuantLuma: Array[Int] = Array(
    16, 11, 10, 16, 24, 40, 51, 61,
    12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56,
    14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77,
    24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101,
    72, 92, 95, 98, 112, 100, 103, 99)
  val StdQuantChroma: Array[Int] = Array(
    17, 18, 24, 47, 99, 99, 99, 99,
    18, 21, 26, 66, 99, 99, 99, 99,
    24, 26, 56, 99, 99, 99, 99, 99,
    47, 66, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99)

  /** Huffman table per T.81 Annex C: decode side builds the
    * MINCODE/MAXCODE/VALPTR arrays of F.2.2.3, encode side the
    * per-symbol (code, size) pair via the same canonical assignment. */
  private final class Huff(counts: Array[Int], val vals: Array[Int]) {
    require(counts.length == 16 && counts.sum == vals.length,
      "huffman table BITS/HUFFVAL mismatch")
    val mincode = new Array[Int](17)
    val maxcode = new Array[Int](17)
    val valptr = new Array[Int](17)
    locally {
      var code = 0
      var k = 0
      var l = 1
      while (l <= 16) {
        valptr(l) = k
        mincode(l) = code
        code += counts(l - 1)
        k += counts(l - 1)
        maxcode(l) = if (counts(l - 1) > 0) code - 1 else -1
        code <<= 1
        l += 1
      }
    }
    /** (code, size) indexed by symbol — encode side. */
    lazy val enc: (Array[Int], Array[Int]) = {
      val codes = new Array[Int](256)
      val sizes = new Array[Int](256)
      var code = 0
      var k = 0
      var l = 1
      while (l <= 16) {
        var i = 0
        while (i < counts(l - 1)) {
          codes(vals(k)) = code
          sizes(vals(k)) = l
          code += 1; k += 1; i += 1
        }
        code <<= 1
        l += 1
      }
      (codes, sizes)
    }
  }

  /** Entropy-segment bit reader with FF00 unstuffing (F.1.2.3); a bare
    * marker inside coded data throws (truncated/garbled stream). */
  private final class BitReader(bytes: Array[Byte], var pos: Int) {
    private var buf = 0
    private var cnt = 0
    def nextBit(): Int = {
      if (cnt == 0) {
        if (pos >= bytes.length) fail("truncated entropy-coded data")
        var v = bytes(pos) & 0xff
        pos += 1
        if (v == 0xff) {
          if (pos >= bytes.length) fail("truncated entropy-coded data")
          val nxt = bytes(pos) & 0xff
          if (nxt == 0) pos += 1 // stuffed FF00 → data byte FF
          else { pos -= 1; fail(f"marker FF$nxt%02x inside entropy-coded data") }
        }
        buf = v; cnt = 8
      }
      cnt -= 1
      (buf >> cnt) & 1
    }
    def receive(n: Int): Int = {
      var v = 0
      var i = 0
      while (i < n) { v = (v << 1) | nextBit(); i += 1 }
      v
    }
    /** Discard bits to the next byte boundary (before a restart marker). */
    def align(): Unit = cnt = 0
    def huffDecode(hf: Huff): Int = {
      if (hf == null) fail("scan references an undefined huffman table")
      var code = nextBit()
      var l = 1
      while (code > hf.maxcode(l)) {
        code = (code << 1) | nextBit()
        l += 1
        if (l > 16) fail("invalid huffman code (no 16-bit match)")
      }
      hf.vals(hf.valptr(l) + code - hf.mincode(l))
    }
  }

  /** EXTEND of F.2.2.1: map an s-bit magnitude to its signed value. */
  @inline private def extend(v: Int, s: Int): Int =
    if (s == 0) 0 else if (v < (1 << (s - 1))) v - (1 << s) + 1 else v

  /** Align and consume the expected RSTn marker (n cycling 0..7,
    * E.2.4); any number of 0xFF fill bytes may precede it (B.1.1.2).
    * Shared by the baseline and progressive scan loops. */
  private def expectRestart(bytes: Array[Byte], br: BitReader,
      rstIdx: Int): Unit = {
    br.align()
    while (br.pos + 2 < bytes.length && (bytes(br.pos) & 0xff) == 0xff &&
        (bytes(br.pos + 1) & 0xff) == 0xff) br.pos += 1
    if (br.pos + 2 > bytes.length) fail("truncated at restart marker")
    val b0 = bytes(br.pos) & 0xff
    val b1 = bytes(br.pos + 1) & 0xff
    if (b0 != 0xff || b1 != 0xd0 + (rstIdx & 7))
      fail(f"expected RST${rstIdx & 7} at ${br.pos}, got $b0%02x$b1%02x")
    br.pos += 2
  }

  private final case class Component(id: Int, hs: Int, vs: Int, tq: Int)

  /** Decode a baseline JPEG stream → (width, height, interleaved RGB
    * raster). Grayscale replicates Y into all three channels (the
    * [[Multimodal.decodeImagesWith]] contract). Throws on anything
    * outside the supported baseline subset. */
  def decode(bytes: Array[Byte]): (Int, Int, Array[Byte]) = {
    if (bytes.length < 4 || (bytes(0) & 0xff) != 0xff || (bytes(1) & 0xff) != 0xd8)
      fail("not a jpeg stream (no SOI)")
    var pos = 2
    def u8(): Int = {
      if (pos >= bytes.length) fail("truncated segment")
      val v = bytes(pos) & 0xff; pos += 1; v
    }
    def u16(): Int = { val hi = u8(); (hi << 8) | u8() }

    val quant = Array.ofDim[Int](4, 64) // zigzag order
    val quantSeen = new Array[Boolean](4)
    val dcTabs = new Array[Huff](4)
    val acTabs = new Array[Huff](4)
    var ri = 0
    var w = 0
    var h = 0
    var comps: Array[Component] = null
    var progressive = false
    var prog: ProgState = null
    var raster: Array[Byte] = null

    while (raster == null) {
      if (pos + 2 > bytes.length) fail("truncated before SOS")
      if ((bytes(pos) & 0xff) != 0xff)
        fail(f"expected marker, got ${bytes(pos) & 0xff}%02x at $pos")
      pos += 1
      var m = u8()
      while (m == 0xff) m = u8() // fill bytes (B.1.1.2)
      if (m == 0xd9) {
        // EOI: in a progressive stream this is where reconstruction
        // happens — every scan so far refined the coefficient buffers
        if (prog != null) raster = prog.reconstruct()
        else fail("EOI before any SOS (no image data)")
      }
      else if (m == 0x01 || (m >= 0xd0 && m <= 0xd7)) () // TEM/RSTn: standalone
      else if (m == 0xc0 || m == 0xc1 || m == 0xc2) {
        // a second SOF after scans have started would silently desync
        // the declared dimensions from the buffered geometry
        if (comps != null) fail("multiple SOF markers")
        progressive = m == 0xc2
        val len = u16(); val end = pos - 2 + len
        val prec = u8()
        if (prec != 8) fail(s"unsupported sample precision $prec (8-bit only)")
        h = u16(); w = u16()
        if (w <= 0 || h <= 0) fail(s"bad dimensions $w x $h")
        if (w.toLong * h * 3 >= Int.MaxValue) fail(s"image too large $w x $h")
        val nf = u8()
        if (nf != 1 && nf != 3) fail(s"unsupported component count $nf (1 or 3)")
        comps = Array.fill(nf) {
          val id = u8(); val hv = u8(); val tq = u8()
          val c = Component(id, hv >> 4, hv & 15, tq)
          if (c.hs < 1 || c.hs > 4 || c.vs < 1 || c.vs > 4)
            fail(s"bad sampling factors ${c.hs}x${c.vs}")
          if (tq > 3) fail(s"bad quant table id $tq")
          c
        }
        if (pos != end) fail("SOF length mismatch")
      }
      else if (m >= 0xc3 && m <= 0xcf && m != 0xc4 && m != 0xc8 && m != 0xcc)
        fail(f"unsupported SOF marker FF$m%02x (lossless/arithmetic/" +
          "differential modes — baseline + progressive Huffman only)")
      else if (m == 0xc4) { // DHT
        val len = u16(); val end = pos - 2 + len
        while (pos < end) {
          val tcth = u8(); val tc = tcth >> 4; val th = tcth & 15
          if (tc > 1 || th > 3) fail(s"bad DHT class/id $tc/$th")
          val counts = Array.fill(16)(u8())
          val n = counts.sum
          if (n > 256 || pos + n > end) fail("DHT overruns its segment")
          val vals = Array.fill(n)(u8())
          val hf = new Huff(counts, vals)
          if (tc == 0) dcTabs(th) = hf else acTabs(th) = hf
        }
        if (pos != end) fail("DHT length mismatch")
      }
      else if (m == 0xdb) { // DQT
        val len = u16(); val end = pos - 2 + len
        while (pos < end) {
          val pqtq = u8(); val pq = pqtq >> 4; val tq = pqtq & 15
          if (pq > 1 || tq > 3) fail(s"bad DQT precision/id $pq/$tq")
          var k = 0
          while (k < 64) {
            quant(tq)(k) = if (pq == 0) u8() else u16()
            if (quant(tq)(k) <= 0) fail("zero quantizer")
            k += 1
          }
          quantSeen(tq) = true
        }
        if (pos != end) fail("DQT length mismatch")
      }
      else if (m == 0xdd) { // DRI
        val len = u16()
        if (len != 4) fail(s"bad DRI length $len")
        ri = u16()
      }
      else if (m == 0xda) { // SOS
        if (comps == null) fail("SOS before SOF")
        val len = u16(); val end = pos - 2 + len
        val ns = u8()
        if (ns < 1 || ns > comps.length) fail(s"bad scan component count $ns")
        val scanSel = Array.fill(ns) {
          val cs = u8(); val tt = u8()
          val ci = comps.indexWhere(_.id == cs)
          if (ci < 0) fail(s"scan selects unknown component $cs")
          val td = tt >> 4; val ta = tt & 15
          if (td > 3 || ta > 3) fail(s"bad scan table selectors $td/$ta")
          (ci, td, ta)
        }
        // T.81 B.2.3 requires distinct Cs_j — a duplicate selector would
        // leave some plane never written and decode silently wrong
        if (scanSel.map(_._1).distinct.length != ns)
          fail("duplicate component selector in scan header")
        val ss = u8(); val se = u8(); val ahal = u8()
        if (pos != end) fail("SOS length mismatch")
        // tables need only precede FIRST USE (B.2.4.1): check the
        // components THIS scan selects — a progressive script may define
        // a chroma DQT between the luma and chroma scans
        scanSel.foreach { case (ci, _, _) =>
          if (!quantSeen(comps(ci).tq))
            fail(s"component ${comps(ci).id} references undefined " +
              s"quant table ${comps(ci).tq}")
        }
        if (!progressive) {
          if (ns != comps.length)
            fail(s"unsupported scan: $ns of ${comps.length} components " +
              "(baseline: single interleaved scan only)")
          if (ss != 0 || se != 63 || ahal != 0)
            fail(s"non-baseline scan parameters Ss=$ss Se=$se AhAl=$ahal")
          raster = decodeScan(bytes, pos, w, h, comps, scanSel,
            quant, dcTabs, acTabs, ri)
        } else {
          val ah = ahal >> 4; val al = ahal & 15
          if (ss > 63 || se > 63 || ss > se || ah > 13 || al > 13)
            fail(s"bad progressive scan parameters Ss=$ss Se=$se Ah=$ah Al=$al")
          if (ss == 0 && se != 0)
            fail("progressive DC scan must have Se=0 (spectral selection)")
          if (ss > 0 && ns != 1)
            fail("progressive AC scans must be single-component (G.1.1.1.1)")
          if (prog == null) prog = new ProgState(comps, w, h, quant)
          pos = prog.decodeScanInto(bytes, pos, scanSel, ss, se, ah, al,
            dcTabs, acTabs, ri)
        }
      }
      else { // APPn / COM / DNL / anything with a length: skip
        val len = u16()
        if (len < 2 || pos - 2 + len > bytes.length) fail(f"bad segment FF$m%02x length $len")
        pos = pos - 2 + len
      }
    }
    (w, h, raster)
  }

  /** The entropy-coded scan: MCU loop, per-block Huffman decode +
    * dequant + IDCT into per-component planes, restart handling, then
    * upsample + color-convert + crop. */
  private def decodeScan(bytes: Array[Byte], start: Int, w: Int, h: Int,
      comps: Array[Component], scanSel: Array[(Int, Int, Int)],
      quant: Array[Array[Int]], dcTabs: Array[Huff], acTabs: Array[Huff],
      ri: Int): Array[Byte] = {
    // A single-component scan is NON-INTERLEAVED (T.81 A.2): the MCU is
    // ONE data unit and blocks are coded in raster order over the
    // component's own block grid — the frame's sampling factors do NOT
    // group blocks into hs×vs sub-grids (a grayscale stream declaring
    // 2x2 luma sampling, e.g. a grayscale transcode that kept the
    // source's factors, codes ceil(w/8)·ceil(h/8) blocks in row order).
    // Model that by clamping the effective factors to 1x1; for Nf=1 the
    // component's full resolution is w×h regardless of declared factors.
    val oneComp = comps.length == 1
    val eff = if (oneComp) comps.map(_.copy(hs = 1, vs = 1)) else comps
    val hmax = eff.map(_.hs).max
    val vmax = eff.map(_.vs).max
    val mcusX = (w + 8 * hmax - 1) / (8 * hmax)
    val mcusY = (h + 8 * vmax - 1) / (8 * vmax)
    // bound the PADDED planes, not just w*h*3: degenerate-aspect SOF
    // dims (w=700M, h=1, 4x4 sampling) pass the raster guard but wrap
    // Int in plane width/allocation — and the resulting
    // OutOfMemoryError is an Error, which escapes the DROPMALFORMED
    // `case e: Exception` and would kill the executor on one crafted
    // blob. Sizes go through Long BEFORE any Int materialization.
    eff.foreach { c =>
      val pw = mcusX.toLong * 8 * c.hs
      val ph = mcusY.toLong * 8 * c.vs
      if (pw * ph >= Int.MaxValue)
        fail(s"component plane ${pw}x$ph too large")
    }
    val planeW = eff.map(c => mcusX * 8 * c.hs)
    val planeH = eff.map(c => mcusY * 8 * c.vs)
    val planes = comps.indices.map(i =>
      new Array[Byte](planeW(i) * planeH(i))).toArray

    val br = new BitReader(bytes, start)
    val preds = new Array[Int](comps.length)
    val blk = new Array[Int](64)
    val tmp = new Array[Double](64)
    var rstIdx = 0
    var mcu = 0
    val totalMcus = mcusX * mcusY
    while (mcu < totalMcus) {
      if (ri > 0 && mcu > 0 && mcu % ri == 0) {
        expectRestart(bytes, br, rstIdx)
        rstIdx += 1
        java.util.Arrays.fill(preds, 0)
      }
      val mx = mcu % mcusX
      val my = mcu / mcusX
      var s = 0
      while (s < scanSel.length) {
        val (ci, td, ta) = scanSel(s)
        val c = eff(ci)
        val q = quant(c.tq)
        var by = 0
        while (by < c.vs) {
          var bx = 0
          while (bx < c.hs) {
            preds(ci) = decodeBlock(br, dcTabs(td), acTabs(ta), q, preds(ci), blk)
            idctInto(blk, tmp, planes(ci), planeW(ci),
              (mx * c.hs + bx) * 8, (my * c.vs + by) * 8)
            bx += 1
          }
          by += 1
        }
        s += 1
      }
      mcu += 1
    }
    // after the last MCU: padding bits, then STRICTLY fill bytes (FFs),
    // an optional DNL segment, and EOI — nothing else. Leftover
    // non-marker bytes here mean the MCU loop consumed fewer entropy
    // bytes than the stream carries (a desync), and skipping them
    // silently would defeat the loudness this check exists for.
    br.align()
    var p = br.pos
    var sawEoi = false
    while (!sawEoi) {
      if (p + 1 >= bytes.length) fail("missing EOI after entropy-coded data")
      if ((bytes(p) & 0xff) != 0xff)
        fail(f"leftover entropy byte ${bytes(p) & 0xff}%02x after final MCU " +
          "(coded-data desync)")
      val nxt = bytes(p + 1) & 0xff
      if (nxt == 0xd9) sawEoi = true
      else if (nxt == 0xff) p += 1 // fill byte
      else if (nxt == 0xdc) { // DNL: number-of-lines segment may follow a scan
        if (p + 5 >= bytes.length) fail("truncated DNL segment")
        val len = ((bytes(p + 2) & 0xff) << 8) | (bytes(p + 3) & 0xff)
        if (len != 4) fail(s"bad DNL length $len")
        p += 2 + len
      }
      else fail(f"unexpected byte sequence FF$nxt%02x after final MCU")
    }

    // upsample (nearest) + color convert + crop
    val out = new Array[Byte](w * h * 3)
    planesToRgb(w, h, eff, planes, planeW, hmax, vmax, out)
    out
  }

  /** Shared plane finisher: nearest-neighbor upsample + fixed-point
    * color convert + crop, for both the baseline streaming path and
    * the progressive coefficient-buffer path. */
  private def planesToRgb(w: Int, h: Int, eff: Array[Component],
      planes: Array[Array[Byte]], planeW: Array[Int],
      hmax: Int, vmax: Int, out: Array[Byte]): Unit = {
    if (eff.length == 1) {
      val pl = planes(0); val pw = planeW(0)
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) {
          val v = pl(y * pw + x)
          val o = (y * w + x) * 3
          out(o) = v; out(o + 1) = v; out(o + 2) = v
          x += 1
        }
        y += 1
      }
    } else {
      val py = planes(0); val pwy = planeW(0)
      val pcb = planes(1); val pwcb = planeW(1)
      val pcr = planes(2); val pwcr = planeW(2)
      val cy = eff(0); val ccb = eff(1); val ccr = eff(2)
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) {
          val yy = py((y * cy.vs / vmax) * pwy + (x * cy.hs / hmax)) & 0xff
          val cb = (pcb((y * ccb.vs / vmax) * pwcb + (x * ccb.hs / hmax)) & 0xff) - 128
          val cr = (pcr((y * ccr.vs / vmax) * pwcr + (x * ccr.hs / hmax)) & 0xff) - 128
          // libjpeg-convention fixed point (2^16 scale), replayable in
          // integer SQL: FIX(1.40200)=91881 FIX(1.77200)=116130
          // FIX(0.34414)=22554 FIX(0.71414)=46802
          val r = yy + ((91881 * cr + 32768) >> 16)
          val g = yy - ((22554 * cb + 46802 * cr + 32768) >> 16)
          val b = yy + ((116130 * cb + 32768) >> 16)
          val o = (y * w + x) * 3
          out(o) = clamp255(r).toByte
          out(o + 1) = clamp255(g).toByte
          out(o + 2) = clamp255(b).toByte
          x += 1
        }
        y += 1
      }
    }
  }

  @inline private def clamp255(v: Int): Int =
    if (v < 0) 0 else if (v > 255) 255 else v

  /** One block: DC (F.2.2.1) + AC (F.2.2.2) decode, dequantized into
    * `blk` in natural order. Returns the new DC prediction. */
  private def decodeBlock(br: BitReader, dc: Huff, ac: Huff,
      q: Array[Int], pred: Int, blk: Array[Int]): Int = {
    java.util.Arrays.fill(blk, 0)
    val t = br.huffDecode(dc)
    // baseline 8-bit caps DC SSSS at 11 (T.81 F.1.2.1.2)
    if (t > 11) fail(s"bad DC category $t")
    val diff = extend(br.receive(t), t)
    val newPred = pred + diff
    blk(0) = newPred * q(0)
    var k = 1
    var done = false
    while (k < 64 && !done) {
      val rs = br.huffDecode(ac)
      val r = rs >>> 4
      val s = rs & 15
      if (s == 0) {
        if (r == 15) {
          k += 16 // ZRL: 16 zeros, a coefficient must still follow
          if (k > 63) fail("ZRL overruns the block")
        }
        else done = true // EOB
      } else {
        k += r
        if (k > 63) fail("AC coefficient index overruns the block")
        blk(Zigzag(k)) = extend(br.receive(s), s) * q(k)
        k += 1
      }
    }
    newPred
  }

  /** Structural stream metadata from a marker-level parse — NO entropy
    * decode, so it costs header-bytes instead of pixels. `orientation`
    * is the EXIF tag 0x0112 value (1-8) from an APP1 Exif segment, or 0
    * when absent/unparseable — EXIF is ANCILLARY metadata, so a corrupt
    * APP1 yields the absent sentinel rather than failing a stream whose
    * coded image is intact (the loud-refusal contract covers the coded
    * stream, not third-party metadata blobs). */
  final case class Meta(width: Int, height: Int, nComponents: Int,
      progressive: Boolean, sampH: Int, sampV: Int, restartInterval: Int,
      qualityEst: Int, orientation: Int)

  /** Bounds-checked EXIF orientation parse over an APP1 segment's
    * payload [p0, end): the `Exif\0\0` identifier, TIFF header (either
    * byte order), IFD0 walk for tag 0x0112 (type SHORT, count 1).
    * Returns 1-8, or 0 when absent/unparseable — EXIF is ANCILLARY
    * metadata, so corrupt third-party blobs read as absent, never as a
    * failure of the coded stream. */
  private def app1Orientation(bytes: Array[Byte], p0: Int, end: Int): Int = {
    var orientation = 0
    def ok(o: Int, n: Int) = o >= p0 && o + n <= end
    if (ok(p0, 6) && bytes(p0) == 'E' && bytes(p0 + 1) == 'x' &&
        bytes(p0 + 2) == 'i' && bytes(p0 + 3) == 'f' &&
        bytes(p0 + 4) == 0 && bytes(p0 + 5) == 0) {
      val t = p0 + 6 // TIFF header
      def b16(o: Int, be: Boolean): Int =
        if (be) ((bytes(o) & 0xff) << 8) | (bytes(o + 1) & 0xff)
        else ((bytes(o + 1) & 0xff) << 8) | (bytes(o) & 0xff)
      def b32(o: Int, be: Boolean): Long =
        if (be) (b16(o, be).toLong << 16) | b16(o + 2, be)
        else (b16(o + 2, be).toLong << 16) | b16(o, be)
      if (ok(t, 8)) {
        val be = bytes(t) == 'M' && bytes(t + 1) == 'M'
        val le = bytes(t) == 'I' && bytes(t + 1) == 'I'
        if ((be || le) && b16(t + 2, be) == 42) {
          val ifd = b32(t + 4, be)
          if (ifd >= 8 && ifd < Int.MaxValue && ok(t + ifd.toInt, 2)) {
            val io = t + ifd.toInt
            val n = b16(io, be)
            var i = 0
            while (i < n && ok(io + 2 + 12 * i, 12)) {
              val e0 = io + 2 + 12 * i
              if (b16(e0, be) == 0x0112 && b16(e0 + 2, be) == 3 &&
                  b32(e0 + 4, be) == 1) {
                // SHORT values sit left-justified in the 4-byte field
                val v = b16(e0 + 8, be)
                if (v >= 1 && v <= 8) orientation = v
              }
              i += 1
            }
          }
        }
      }
    }
    orientation
  }

  /** Best-effort EXIF orientation WITHOUT a full metadata walk: scan
    * markers from SOI to the first SOS or EOI only (EXIF rides APP1,
    * which precedes the scan data), parse nothing but APP1. NEVER
    * throws — anything unparseable (including a non-JPEG blob) reads
    * 0 — because callers pair this with an already-successful decode
    * and EXIF is ancillary: a garbled header must degrade to
    * "unoriented", not retroactively fail a decoded image. */
  def exifOrientation(bytes: Array[Byte]): Int = {
    if (bytes.length < 4 || (bytes(0) & 0xff) != 0xff ||
        (bytes(1) & 0xff) != 0xd8) return 0
    var pos = 2
    var orientation = 0
    var done = false
    while (!done) {
      if (pos + 4 > bytes.length) return orientation
      if ((bytes(pos) & 0xff) != 0xff) return orientation
      pos += 1
      var m = bytes(pos) & 0xff; pos += 1
      while (m == 0xff && pos < bytes.length) { m = bytes(pos) & 0xff; pos += 1 }
      if (m == 0xd9 || m == 0xda) done = true // EOI / SOS: APP1 precedes both
      else if (m == 0x01 || (m >= 0xd0 && m <= 0xd7)) () // standalone
      else {
        if (pos + 2 > bytes.length) return orientation
        val len = ((bytes(pos) & 0xff) << 8) | (bytes(pos + 1) & 0xff)
        if (len < 2 || pos + len > bytes.length) return orientation
        if (m == 0xe1) {
          val v = app1Orientation(bytes, pos + 2, pos + len)
          if (v > 0) orientation = v
        }
        pos += len
      }
    }
    orientation
  }

  /** Parse markers only: dimensions, component count, luma sampling
    * factors, progressive flag, restart interval, and a libjpeg-style
    * quality estimate from the luma DQT (scale% = 100·Σq/Σbase inverted
    * through the quality→scale map: quality = 5000/scale below 50,
    * (200−scale)/2 above). Entropy segments are SKIPPED by scanning for
    * the next marker through FF00 stuffing; EOI is REQUIRED, so a
    * truncated stream throws instead of returning partial metadata —
    * which keeps "which blobs have metadata" deterministic for the
    * oracle and for pipeline bookkeeping. The SOF/DQT/DRI structural
    * guards mirror [[decode]]'s exactly; what meta deliberately does
    * NOT validate is entropy data and Huffman table CONTENTS (that is
    * the decode-cost it exists to avoid), so a blob with intact
    * markers but garbled coded data can carry metadata yet fail full
    * decode — the one-directional containment a header-only pass can
    * promise. */
  def meta(bytes: Array[Byte]): Meta = {
    if (bytes.length < 4 || (bytes(0) & 0xff) != 0xff || (bytes(1) & 0xff) != 0xd8)
      fail("not a jpeg stream (no SOI)")
    var pos = 2
    def u8(): Int = {
      if (pos >= bytes.length) fail("truncated segment")
      val v = bytes(pos) & 0xff; pos += 1; v
    }
    def u16(): Int = { val hi = u8(); (hi << 8) | u8() }
    var w = 0; var h = 0; var nf = 0
    var progressive = false
    var sampH = 0; var sampV = 0
    var ri = 0
    // per-slot DQT sums + the FIRST SOF component's table selector: a
    // spec-legal stream may put its luma table in any slot 0-3
    // (decode() only requires the tables the scans reference), so the
    // quality estimate keys off the slot the luma component actually
    // uses, not a hardcoded slot 0 (r16 ADVICE — requiring slot 0
    // dropped decodable streams from jpegMetadata, breaking the
    // "metadata presence contains decodability" containment)
    val qSums = Array(-1, -1, -1, -1)
    var lumaTq = -1
    var orientation = 0
    var sawSof = false
    var sawEoi = false
    while (!sawEoi) {
      if (pos + 2 > bytes.length) fail("truncated before EOI")
      if ((bytes(pos) & 0xff) != 0xff)
        fail(f"expected marker, got ${bytes(pos) & 0xff}%02x at $pos")
      pos += 1
      var m = u8()
      while (m == 0xff) m = u8()
      if (m == 0xd9) sawEoi = true
      else if (m == 0x01 || (m >= 0xd0 && m <= 0xd7)) ()
      else if (m == 0xc0 || m == 0xc1 || m == 0xc2) {
        if (sawSof) fail("multiple SOF markers")
        sawSof = true
        progressive = m == 0xc2
        val len = u16(); val end = pos - 2 + len
        val prec = u8()
        if (prec != 8) fail(s"unsupported sample precision $prec")
        h = u16(); w = u16()
        if (w <= 0 || h <= 0) fail(s"bad dimensions $w x $h")
        if (w.toLong * h * 3 >= Int.MaxValue) fail(s"image too large $w x $h")
        // mirror decode()'s SOF guards EXACTLY: "which blobs have
        // metadata" must match "which blobs decode" (the jpegMetadata
        // contract) — meta must never accept a frame decode refuses
        nf = u8()
        if (nf != 1 && nf != 3) fail(s"unsupported component count $nf (1 or 3)")
        var i = 0
        while (i < nf) {
          u8(); val hv = u8(); val tq = u8()
          val hs = hv >> 4; val vs = hv & 15
          if (hs < 1 || hs > 4 || vs < 1 || vs > 4)
            fail(s"bad sampling factors ${hs}x$vs")
          if (tq > 3) fail(s"bad quant table id $tq")
          if (i == 0) { sampH = hs; sampV = vs; lumaTq = tq }
          i += 1
        }
        if (pos != end) fail("SOF length mismatch")
      }
      else if (m >= 0xc3 && m <= 0xcf && m != 0xc4 && m != 0xc8 && m != 0xcc)
        fail(f"unsupported SOF marker FF$m%02x")
      else if (m == 0xdb) {
        val len = u16(); val end = pos - 2 + len
        while (pos < end) {
          val pqtq = u8(); val pq = pqtq >> 4; val tq = pqtq & 15
          if (pq > 1 || tq > 3) fail(s"bad DQT precision/id $pq/$tq")
          var sum = 0
          var k = 0
          while (k < 64) {
            val q = if (pq == 0) u8() else u16()
            if (q <= 0) fail("zero quantizer")
            sum += q
            k += 1
          }
          qSums(tq) = sum
        }
        if (pos != end) fail("DQT length mismatch")
      }
      else if (m == 0xdd) { val len = u16(); if (len != 4) fail("bad DRI"); ri = u16() }
      else if (m == 0xe1) { // APP1: best-effort EXIF orientation (tag 0x0112)
        val len = u16()
        if (len < 2 || pos - 2 + len > bytes.length) fail(s"bad APP1 length $len")
        val p0 = pos
        val end = pos - 2 + len
        pos = end
        val v = app1Orientation(bytes, p0, end)
        if (v > 0) orientation = v
      }
      else if (m == 0xda) {
        if (!sawSof) fail("SOS before SOF")
        val len = u16()
        if (len < 2 || pos - 2 + len > bytes.length) fail("bad SOS length")
        pos = pos - 2 + len
        // skip the entropy segment: scan for the next marker through
        // FF00 stuffing and RSTn
        var inEntropy = true
        while (inEntropy) {
          if (pos + 1 >= bytes.length) fail("truncated entropy-coded data")
          if ((bytes(pos) & 0xff) == 0xff) {
            val nxt = bytes(pos + 1) & 0xff
            if (nxt == 0x00 || (nxt >= 0xd0 && nxt <= 0xd7)) pos += 2
            else if (nxt == 0xff) pos += 1
            else inEntropy = false // a real marker: main loop handles it
          } else pos += 1
        }
      }
      else {
        val len = u16()
        if (len < 2 || pos - 2 + len > bytes.length) fail(f"bad segment FF$m%02x length $len")
        pos = pos - 2 + len
      }
    }
    if (!sawSof) fail("no SOF before EOI")
    // the luma table is whichever slot the first SOF component selects
    // (slot 0 as a fallback for streams whose first component's table
    // never appeared — though decode() would refuse those at SOS)
    val qLumaSum = if (lumaTq >= 0 && qSums(lumaTq) >= 0) qSums(lumaTq)
      else qSums(0)
    if (qLumaSum < 0) fail("no luma quantization table")
    // invert the libjpeg quality→scale map on the summed table:
    // scale% = round(100·Σq/Σbase); quality = 5000/scale (scale>100)
    // or (200−scale)/2 (scale≤100), clamped to 1..100
    val baseSum = StdQuantLuma.sum
    val scale = math.max(1, math.round(qLumaSum * 100.0 / baseSum).toInt)
    val quality =
      if (scale > 100) math.max(1, math.round(5000.0 / scale).toInt)
      else math.min(100, (200 - scale) / 2)
    Meta(w, h, nf, progressive, sampH, sampV, ri, quality, orientation)
  }

  /** Progressive (SOF2, Huffman) decode state — T.81 Annex G: scans
    * accumulate DCT coefficients into per-component buffers (spectral
    * selection splits the zigzag band across scans, successive
    * approximation splits each coefficient's bits), and EOI triggers
    * one dequant + IDCT pass over the finished buffers. The refinement
    * procedures follow G.1.2 (the same algorithm libjpeg's
    * decode_mcu_DC/AC_refine implement from the spec): DC refinement
    * appends one bit at position Al; AC first-scans carry EOBRUN
    * end-of-band runs; AC refinement advances over zero-history
    * coefficients while appending correction bits to nonzero-history
    * ones. Quantization tables are latched at the first scan. */
  private final class ProgState(comps: Array[Component], w: Int, h: Int,
      quant: Array[Array[Int]]) {
    private val eff: Array[Component] =
      if (comps.length == 1) comps.map(_.copy(hs = 1, vs = 1)) else comps
    private val hmax = eff.map(_.hs).max
    private val vmax = eff.map(_.vs).max
    private val mcusX = (w + 8 * hmax - 1) / (8 * hmax)
    private val mcusY = (h + 8 * vmax - 1) / (8 * vmax)
    private val gridW = eff.map(c => mcusX * c.hs)
    private val gridH = eff.map(c => mcusY * c.vs)
    // non-interleaved scans cover the component's REAL block grid
    // (ceil(compW/8), T.81 A.2.2), indexed within the padded layout
    private val realBw = eff.map(c => (((w * c.hs + hmax - 1) / hmax) + 7) / 8)
    private val realBh = eff.map(c => (((h * c.vs + vmax - 1) / vmax) + 7) / 8)
    // bound the coefficient buffers in BYTES (4 per Int), summed across
    // components — tighter than the baseline plane guard because these
    // allocate eagerly at the first SOS, and an OutOfMemoryError from a
    // crafted header would escape the DROPMALFORMED Exception catch
    if (eff.indices.map(i => gridW(i).toLong * gridH(i) * 64 * 4).sum
        >= Int.MaxValue)
      fail(s"progressive coefficient buffers too large for ${w}x$h with " +
        "these sampling factors")
    private val coef: Array[Array[Int]] = eff.indices.map(i =>
      new Array[Int](gridW(i) * gridH(i) * 64)).toArray
    // quant tables latch PER COMPONENT at that component's first scan
    // (tables need only precede first use, B.2.4.1)
    private val q: Array[Array[Int]] = new Array[Array[Int]](comps.length)
    private val quantRef = quant

    /** Decode one scan's entropy data into the coefficient buffers;
      * returns the position just past it (the caller's marker loop
      * resumes there). */
    def decodeScanInto(bytes: Array[Byte], start: Int,
        scanSel: Array[(Int, Int, Int)], ss: Int, se: Int, ah: Int,
        al: Int, dcTabs: Array[Huff], acTabs: Array[Huff], ri: Int): Int = {
      scanSel.foreach { case (ci, _, _) =>
        if (q(ci) == null) q(ci) = quantRef(comps(ci).tq).clone()
      }
      val br = new BitReader(bytes, start)
      val preds = new Array[Int](comps.length)
      var eobrun = 0
      var rstIdx = 0
      var unit = 0 // restart counting: MCUs (interleaved) or blocks

      def restartCheck(): Unit =
        if (ri > 0 && unit > 0 && unit % ri == 0) {
          expectRestart(bytes, br, rstIdx)
          rstIdx += 1
          java.util.Arrays.fill(preds, 0)
          eobrun = 0
        }

      def dcFirst(ci: Int, dc: Huff, base: Int): Unit = {
        val t = br.huffDecode(dc)
        if (t > 11) fail(s"bad DC category $t")
        preds(ci) += extend(br.receive(t), t)
        coef(ci)(base) = preds(ci) << al
      }
      def dcRefine(ci: Int, base: Int): Unit =
        if (br.nextBit() == 1) coef(ci)(base) |= (1 << al)

      def acFirst(ci: Int, ac: Huff, base: Int): Unit = {
        if (eobrun > 0) { eobrun -= 1; return }
        val c = coef(ci)
        var k = ss
        var done = false
        while (k <= se && !done) {
          val rs = br.huffDecode(ac)
          val r = rs >>> 4
          val s = rs & 15
          if (s == 0) {
            if (r != 15) {
              eobrun = (1 << r) - 1 + (if (r > 0) br.receive(r) else 0)
              done = true
            } else {
              k += 16
              if (k > se + 1) fail("ZRL overruns the band")
            }
          } else {
            k += r
            if (k > se) fail("AC coefficient index overruns the band")
            c(base + Zigzag(k)) = extend(br.receive(s), s) << al
            k += 1
          }
        }
      }

      def acRefine(ci: Int, ac: Huff, base: Int): Unit = {
        val c = coef(ci)
        val p1 = 1 << al
        val m1 = -1 << al
        def correct(idx: Int): Unit =
          if (br.nextBit() == 1 && (c(idx) & p1) == 0)
            c(idx) += (if (c(idx) >= 0) p1 else m1)
        var k = ss
        if (eobrun == 0) {
          var done = false
          while (k <= se && !done) {
            val rs = br.huffDecode(ac)
            var r = rs >>> 4
            val s = rs & 15
            var newval = 0
            if (s != 0) {
              if (s != 1) fail(s"bad refinement magnitude $s")
              newval = if (br.nextBit() == 1) p1 else m1
            } else if (r != 15) {
              eobrun = (1 << r) + (if (r > 0) br.receive(r) else 0)
              done = true // the EOB tail below handles the rest of THIS band
            }
            if (!done) {
              // advance over r zero-history coefficients, appending
              // correction bits to every nonzero-history one passed
              var placed = false
              while (k <= se && !placed) {
                val idx = base + Zigzag(k)
                if (c(idx) != 0) { correct(idx); k += 1 }
                else if (r == 0) {
                  if (newval != 0) c(idx) = newval
                  placed = true
                  k += 1
                } else { r -= 1; k += 1 }
              }
            }
          }
        }
        if (eobrun > 0) {
          while (k <= se) {
            val idx = base + Zigzag(k)
            if (c(idx) != 0) correct(idx)
            k += 1
          }
          eobrun -= 1
        }
      }

      if (scanSel.length > 1) {
        // interleaved scan: progressive allows this for DC only
        if (ss != 0) fail("interleaved progressive scan must be DC")
        var mcu = 0
        val total = mcusX * mcusY
        while (mcu < total) {
          restartCheck()
          val mx = mcu % mcusX
          val my = mcu / mcusX
          var s = 0
          while (s < scanSel.length) {
            val (ci, td, _) = scanSel(s)
            val c = eff(ci)
            var by = 0
            while (by < c.vs) {
              var bx = 0
              while (bx < c.hs) {
                val base = ((my * c.vs + by) * gridW(ci) + (mx * c.hs + bx)) * 64
                if (ah == 0) dcFirst(ci, dcTabs(td), base)
                else dcRefine(ci, base)
                bx += 1
              }
              by += 1
            }
            s += 1
          }
          mcu += 1
          unit += 1
        }
      } else {
        val (ci, td, ta) = scanSel(0)
        var by = 0
        while (by < realBh(ci)) {
          var bx = 0
          while (bx < realBw(ci)) {
            restartCheck()
            val base = (by * gridW(ci) + bx) * 64
            if (ss == 0) {
              if (ah == 0) dcFirst(ci, dcTabs(td), base)
              else dcRefine(ci, base)
            } else {
              if (ah == 0) acFirst(ci, acTabs(ta), base)
              else acRefine(ci, acTabs(ta), base)
            }
            bx += 1
            unit += 1
          }
          by += 1
        }
      }
      br.align()
      br.pos
    }

    /** Dequantize + IDCT every buffered block, then the shared
      * upsample/convert/crop finisher. */
    def reconstruct(): Array[Byte] = {
      val planeW = gridW.map(_ * 8)
      val planeH = gridH.map(_ * 8)
      val planes = eff.indices.map(i =>
        new Array[Byte](planeW(i) * planeH(i))).toArray
      val blk = new Array[Int](64)
      val tmp = new Array[Double](64)
      var ci = 0
      while (ci < eff.length) {
        val cf = coef(ci)
        val qc = q(ci)
        if (qc == null)
          fail(s"component ${comps(ci).id} never appeared in any scan")
        var by = 0
        while (by < gridH(ci)) {
          var bx = 0
          while (bx < gridW(ci)) {
            val base = (by * gridW(ci) + bx) * 64
            var k = 0
            while (k < 64) {
              val nz = Zigzag(k)
              blk(nz) = cf(base + nz) * qc(k)
              k += 1
            }
            idctInto(blk, tmp, planes(ci), planeW(ci), bx * 8, by * 8)
            bx += 1
          }
          by += 1
        }
        ci += 1
      }
      val out = new Array[Byte](w * h * 3)
      planesToRgb(w, h, eff, planes, planeW, hmax, vmax, out)
      out
    }
  }

  /** Reference separable IDCT (T.81 A.3.3) + level shift, written into
    * the component plane at (ox, oy). Double precision: a DC-only
    * block reconstructs exactly (its value is an exact small integer
    * scaled by (1/(2√2))², perturbed at most ~1e-13 — Math.round is
    * unaffected). */
  private def idctInto(blk: Array[Int], tmp: Array[Double],
      plane: Array[Byte], pw: Int, ox: Int, oy: Int): Unit = {
    // rows: tmp(v,x) = Σ_u A(x)(u) · F(v,u)
    var v = 0
    while (v < 8) {
      var x = 0
      while (x < 8) {
        var acc = 0.0
        var u = 0
        while (u < 8) { acc += A(x)(u) * blk(v * 8 + u); u += 1 }
        tmp(v * 8 + x) = acc
        x += 1
      }
      v += 1
    }
    // cols: f(y,x) = Σ_v A(y)(v) · tmp(v,x)
    var y = 0
    while (y < 8) {
      var x = 0
      while (x < 8) {
        var acc = 0.0
        var vv = 0
        while (vv < 8) { acc += A(y)(vv) * tmp(vv * 8 + x); vv += 1 }
        plane((oy + y) * pw + (ox + x)) =
          clamp255(Math.round(acc).toInt + 128).toByte
        x += 1
      }
      y += 1
    }
  }

  // ---- encoder ----

  private final class BitWriter(out: java.io.ByteArrayOutputStream) {
    private var buf = 0
    private var cnt = 0
    def put(code: Int, size: Int): Unit = {
      var i = size - 1
      while (i >= 0) {
        buf = (buf << 1) | ((code >>> i) & 1)
        cnt += 1
        if (cnt == 8) {
          out.write(buf)
          if (buf == 0xff) out.write(0) // byte stuffing
          buf = 0; cnt = 0
        }
        i -= 1
      }
    }
    /** Pad to a byte boundary with 1-bits (F.1.2.3). */
    def flush(): Unit = if (cnt > 0) put((1 << (8 - cnt)) - 1, 8 - cnt)
  }

  @inline private def category(v: Int): Int =
    32 - Integer.numberOfLeadingZeros(math.abs(v))

  /** Shared encoder preamble: SOI, JFIF APP0, DQT (zigzag on the wire),
    * SOF (marker selects baseline FFC0 / progressive FFC2), and the DC
    * Huffman tables (+AC tables when `withAcTables` — the progressive
    * encoder ships its own EOBn table with its scans instead). */
  private def writeFrameHeader(out: java.io.ByteArrayOutputStream,
      sofMarker: Int, w: Int, h: Int, gray: Boolean,
      sampH: Int, sampV: Int, qLuma: Array[Int], qChroma: Array[Int],
      withAcTables: Boolean, exifOrientation: Int = 0): Unit = {
    def u8(v: Int): Unit = out.write(v & 0xff)
    def u16(v: Int): Unit = { u8(v >> 8); u8(v) }
    def marker(m: Int): Unit = { u8(0xff); u8(m) }
    def dht(tc: Int, th: Int, bits: Array[Int], vals: Array[Int]): Unit = {
      marker(0xc4); u16(2 + 1 + 16 + vals.length)
      u8((tc << 4) | th); bits.foreach(u8); vals.foreach(u8)
    }
    marker(0xd8) // SOI
    marker(0xe0); u16(16) // APP0 / JFIF 1.1
    "JFIF".foreach(c => u8(c)); u8(0)
    u8(1); u8(1); u8(0); u16(1); u16(1); u8(0); u8(0)
    if (exifOrientation > 0) {
      require(exifOrientation <= 8, s"bad EXIF orientation $exifOrientation")
      // minimal APP1 Exif: big-endian TIFF, IFD0 with ONE entry (tag
      // 0x0112 Orientation, SHORT, left-justified in the value field)
      marker(0xe1); u16(2 + 32)
      "Exif".foreach(c => u8(c)); u8(0); u8(0)
      u8('M'); u8('M'); u16(42); u16(0); u16(8) // TIFF header, IFD0 @ 8
      u16(1) // entry count
      u16(0x0112); u16(3); u16(0); u16(1) // tag, type SHORT, count 1
      u16(exifOrientation); u16(0)
      u16(0); u16(0) // next-IFD offset
    }
    marker(0xdb); u16(2 + (if (gray) 65 else 130))
    u8(0x00); Zigzag.foreach(z => u8(qLuma(z)))
    if (!gray) { u8(0x01); Zigzag.foreach(z => u8(qChroma(z))) }
    val nf = if (gray) 1 else 3
    marker(sofMarker); u16(8 + 3 * nf); u8(8); u16(h); u16(w); u8(nf)
    if (gray) { u8(1); u8(0x11); u8(0) }
    else {
      u8(1); u8((sampH << 4) | sampV); u8(0)
      u8(2); u8(0x11); u8(1)
      u8(3); u8(0x11); u8(1)
    }
    dht(0, 0, StdDcLumaBits, StdDcLumaVals)
    if (withAcTables) dht(1, 0, StdAcLumaBits, StdAcLumaVals)
    if (!gray) {
      dht(0, 1, StdDcChromaBits, StdDcChromaVals)
      if (withAcTables) dht(1, 1, StdAcChromaBits, StdAcChromaVals)
    }
  }

  /** Pad a plane to the coded grid by edge replication. */
  private def padPlane(src: Array[Byte], sw: Int, sh: Int,
      pw: Int, ph: Int): Array[Byte] = {
    val p = new Array[Byte](pw * ph)
    var y = 0
    while (y < ph) {
      val sy = math.min(y, sh - 1)
      var x = 0
      while (x < pw) {
        p(y * pw + x) = src(sy * sw + math.min(x, sw - 1))
        x += 1
      }
      y += 1
    }
    p
  }

  /** Forward DCT + quantization of one 8×8 block into zigzag order:
    * F(v,u) = Σ_y Σ_x A(y)(v)·A(x)(u)·(s(y,x)−128), then
    * round(F/q). `block` is scratch; `coefZ` receives the result. */
  private def fdctQuantize(plane: Array[Byte], pw: Int, ox: Int, oy: Int,
      qz: Array[Int], block: Array[Double], coefZ: Array[Int]): Unit = {
    var v = 0
    while (v < 8) { // rows→freq pass: block(v,x) = Σ_y A(y)(v)·s(y,x)
      var x = 0
      while (x < 8) {
        var acc = 0.0
        var y = 0
        while (y < 8) {
          acc += A(y)(v) * ((plane((oy + y) * pw + (ox + x)) & 0xff) - 128)
          y += 1
        }
        block(v * 8 + x) = acc
        x += 1
      }
      v += 1
    }
    var k = 0
    while (k < 64) { // cols→freq + quantize, straight into zigzag order
      val zz = Zigzag(k)
      val fv = zz / 8; val fu = zz % 8
      var acc = 0.0
      var x = 0
      while (x < 8) { acc += A(x)(fu) * block(fv * 8 + x); x += 1 }
      coefZ(k) = Math.round(acc / qz(k)).toInt
      k += 1
    }
  }

  /** Encode YCbCr planes directly (fixture generators control the exact
    * coded samples this way): `yPlane` is w×h; `cbPlane`/`crPlane` are
    * ceil(w/sampH)×ceil(h/sampV), or null for grayscale. Quant tables
    * in natural order. */
  def encodeYcc(w: Int, h: Int, yPlane: Array[Byte],
      cbPlane: Array[Byte], crPlane: Array[Byte],
      sampH: Int = 2, sampV: Int = 2,
      qLuma: Array[Int] = StdQuantLuma, qChroma: Array[Int] = StdQuantChroma,
      restartInterval: Int = 0, exifOrientation: Int = 0): Array[Byte] = {
    require(w > 0 && h > 0, s"bad dimensions $w x $h")
    require(yPlane.length == w * h, "luma plane size mismatch")
    val gray = cbPlane == null
    require(gray == (crPlane == null), "cb/cr must both be present or absent")
    val cw = (w + sampH - 1) / sampH
    val ch = (h + sampV - 1) / sampV
    if (!gray) {
      require(sampH >= 1 && sampH <= 4 && sampV >= 1 && sampV <= 4, "bad sampling")
      require(cbPlane.length == cw * ch && crPlane.length == cw * ch,
        "chroma plane size mismatch")
    }
    require(qLuma.length == 64 && qLuma.forall(q => q >= 1 && q <= 255),
      "luma quant table must be 64 entries in 1..255")
    require(gray || (qChroma.length == 64 && qChroma.forall(q => q >= 1 && q <= 255)),
      "chroma quant table must be 64 entries in 1..255")
    // DRI carries 16 bits — a larger value would silently truncate on
    // the wire while the MCU loop used the full Int, emitting a stream
    // whose RST spacing contradicts its own DRI
    require(restartInterval >= 0 && restartInterval <= 0xffff,
      s"restart interval $restartInterval out of the 16-bit DRI range")

    val out = new java.io.ByteArrayOutputStream(w * h / 2 + 1024)
    def u8(v: Int): Unit = out.write(v & 0xff)
    def u16(v: Int): Unit = { u8(v >> 8); u8(v) }
    def marker(m: Int): Unit = { u8(0xff); u8(m) }

    val nf = if (gray) 1 else 3
    writeFrameHeader(out, 0xc0, w, h, gray, sampH, sampV, qLuma, qChroma,
      withAcTables = true, exifOrientation = exifOrientation)
    if (restartInterval > 0) { marker(0xdd); u16(4); u16(restartInterval) }
    // SOS
    marker(0xda); u16(6 + 2 * nf); u8(nf)
    if (gray) { u8(1); u8(0x00) }
    else { u8(1); u8(0x00); u8(2); u8(0x11); u8(3); u8(0x11) }
    u8(0); u8(63); u8(0)

    // entropy-coded data
    val dcL = new Huff(StdDcLumaBits, StdDcLumaVals)
    val acL = new Huff(StdAcLumaBits, StdAcLumaVals)
    val dcC = new Huff(StdDcChromaBits, StdDcChromaVals)
    val acC = new Huff(StdAcChromaBits, StdAcChromaVals)
    val qzL = Array.tabulate(64)(k => qLuma(Zigzag(k)))
    val qzC = if (gray) null else Array.tabulate(64)(k => qChroma(Zigzag(k)))

    val hm = if (gray) 1 else sampH
    val vm = if (gray) 1 else sampV
    val mcusX = (w + 8 * hm - 1) / (8 * hm)
    val mcusY = (h + 8 * vm - 1) / (8 * vm)
    val lpw = mcusX * 8 * hm; val lph = mcusY * 8 * vm
    val lp = padPlane(yPlane, w, h, lpw, lph)
    val cpw = mcusX * 8; val cph = mcusY * 8
    val cbp = if (gray) null else padPlane(cbPlane, cw, ch, cpw, cph)
    val crp = if (gray) null else padPlane(crPlane, cw, ch, cpw, cph)

    val bw = new BitWriter(out)
    val block = new Array[Double](64)
    val coefZ = new Array[Int](64)
    val preds = new Array[Int](3)
    var rstIdx = 0

    def encodeBlock(plane: Array[Byte], pw: Int, ox: Int, oy: Int,
        qz: Array[Int], dc: Huff, ac: Huff, ci: Int): Unit = {
      fdctQuantize(plane, pw, ox, oy, qz, block, coefZ)
      // DC
      val diff = coefZ(0) - preds(ci)
      preds(ci) = coefZ(0)
      val s = category(diff)
      if (s > 11) fail(s"DC difference $diff out of baseline range")
      val (dcCodes, dcSizes) = dc.enc
      bw.put(dcCodes(s), dcSizes(s))
      if (s > 0) bw.put(if (diff < 0) diff + (1 << s) - 1 else diff, s)
      // AC
      val (acCodes, acSizes) = ac.enc
      var run = 0
      var k = 1
      while (k < 64) {
        val c = coefZ(k)
        if (c == 0) run += 1
        else {
          while (run > 15) { bw.put(acCodes(0xf0), acSizes(0xf0)); run -= 16 }
          val ss = category(c)
          if (ss > 10) fail(s"AC coefficient $c out of baseline range")
          val rs = (run << 4) | ss
          bw.put(acCodes(rs), acSizes(rs))
          bw.put(if (c < 0) c + (1 << ss) - 1 else c, ss)
          run = 0
        }
        k += 1
      }
      if (run > 0) bw.put(acCodes(0x00), acSizes(0x00)) // EOB
    }

    var mcu = 0
    val total = mcusX * mcusY
    while (mcu < total) {
      if (restartInterval > 0 && mcu > 0 && mcu % restartInterval == 0) {
        bw.flush()
        marker(0xd0 + (rstIdx & 7))
        rstIdx += 1
        java.util.Arrays.fill(preds, 0)
      }
      val mx = mcu % mcusX
      val my = mcu / mcusX
      var by = 0
      while (by < vm) {
        var bx = 0
        while (bx < hm) {
          encodeBlock(lp, lpw, (mx * hm + bx) * 8, (my * vm + by) * 8,
            qzL, dcL, acL, 0)
          bx += 1
        }
        by += 1
      }
      if (!gray) {
        encodeBlock(cbp, cpw, mx * 8, my * 8, qzC, dcC, acC, 1)
        encodeBlock(crp, cpw, mx * 8, my * 8, qzC, dcC, acC, 2)
      }
      mcu += 1
    }
    bw.flush()
    marker(0xd9) // EOI
    out.toByteArray
  }

  /** Encode an interleaved RGB raster: JFIF forward color transform
    * (ITU-R BT.601 as specified in the JFIF spec), box-average chroma
    * subsampling, then [[encodeYcc]]. */
  def encode(w: Int, h: Int, rgb: Array[Byte], sampH: Int = 2, sampV: Int = 2,
      qLuma: Array[Int] = StdQuantLuma, qChroma: Array[Int] = StdQuantChroma,
      restartInterval: Int = 0): Array[Byte] = {
    require(rgb.length == w * h * 3, s"raster ${rgb.length} != ${w * h * 3}")
    val yP = new Array[Byte](w * h)
    val cwF = w; val chF = h
    val cbF = new Array[Double](cwF * chF)
    val crF = new Array[Double](cwF * chF)
    var i = 0
    var p = 0
    while (i < w * h) {
      val r = rgb(p) & 0xff; val g = rgb(p + 1) & 0xff; val b = rgb(p + 2) & 0xff
      yP(i) = clamp255(Math.round(0.299 * r + 0.587 * g + 0.114 * b).toInt).toByte
      cbF(i) = 128.0 - 0.168736 * r - 0.331264 * g + 0.5 * b
      crF(i) = 128.0 + 0.5 * r - 0.418688 * g - 0.081312 * b
      i += 1; p += 3
    }
    val cw = (w + sampH - 1) / sampH
    val ch = (h + sampV - 1) / sampV
    val cbP = new Array[Byte](cw * ch)
    val crP = new Array[Byte](cw * ch)
    var cy = 0
    while (cy < ch) {
      var cx = 0
      while (cx < cw) {
        var sumB = 0.0; var sumR = 0.0; var n = 0
        var dy = 0
        while (dy < sampV) {
          val y = cy * sampV + dy
          if (y < h) {
            var dx = 0
            while (dx < sampH) {
              val x = cx * sampH + dx
              if (x < w) { sumB += cbF(y * w + x); sumR += crF(y * w + x); n += 1 }
              dx += 1
            }
          }
          dy += 1
        }
        cbP(cy * cw + cx) = clamp255(Math.round(sumB / n).toInt).toByte
        crP(cy * cw + cx) = clamp255(Math.round(sumR / n).toInt).toByte
        cx += 1
      }
      cy += 1
    }
    encodeYcc(w, h, yP, cbP, crP, sampH, sampV, qLuma, qChroma, restartInterval)
  }

  /** Grayscale convenience: single-component stream. */
  def encodeGray(w: Int, h: Int, yPlane: Array[Byte],
      qLuma: Array[Int] = StdQuantLuma, restartInterval: Int = 0,
      exifOrientation: Int = 0): Array[Byte] =
    encodeYcc(w, h, yPlane, null, null, 1, 1, qLuma, null, restartInterval,
      exifOrientation)

  /** EOBn symbols (0x00..0xE0) at a flat code length — progressive AC
    * scans need end-of-band run codes the Annex K baseline tables don't
    * define, so the progressive encoder ships its own tiny table. */
  private val EobBits: Array[Int] =
    Array(0, 0, 0, 15, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0)
  private val EobVals: Array[Int] = Array.tabulate(15)(r => r << 4)

  /** PROGRESSIVE (SOF2) encoder for DC-ONLY content — fixture-grade:
    * every 8×8 block must quantize to a lone DC coefficient (the
    * constant-block oracle fixtures guarantee this; anything else fails
    * loudly). The scan script deliberately exercises every progressive
    * decode procedure: scan 1 codes DC first-pass at Al=1 (successive
    * approximation, optionally with restart markers), scan 2 delivers
    * the DC low bit as a refinement pass (Ah=1), then one AC scan per
    * component codes the empty 1..63 band as maximal EOBRUN runs
    * through a custom EOBn Huffman table. Decoded output is
    * bit-identical to the sequential [[encodeYcc]] of the same planes. */
  def encodeYccProgressive(w: Int, h: Int, yPlane: Array[Byte],
      cbPlane: Array[Byte], crPlane: Array[Byte],
      sampH: Int = 2, sampV: Int = 2,
      qLuma: Array[Int] = StdQuantLuma, qChroma: Array[Int] = StdQuantChroma,
      restartInterval: Int = 0, exifOrientation: Int = 0): Array[Byte] = {
    require(w > 0 && h > 0, s"bad dimensions $w x $h")
    require(yPlane.length == w * h, "luma plane size mismatch")
    val gray = cbPlane == null
    require(gray == (crPlane == null), "cb/cr must both be present or absent")
    val cw = (w + sampH - 1) / sampH
    val ch = (h + sampV - 1) / sampV
    if (!gray) {
      require(sampH >= 1 && sampH <= 4 && sampV >= 1 && sampV <= 4, "bad sampling")
      require(cbPlane.length == cw * ch && crPlane.length == cw * ch,
        "chroma plane size mismatch")
    }
    require(qLuma.length == 64 && qLuma.forall(q => q >= 1 && q <= 255),
      "luma quant table must be 64 entries in 1..255")
    require(gray || (qChroma.length == 64 && qChroma.forall(q => q >= 1 && q <= 255)),
      "chroma quant table must be 64 entries in 1..255")
    require(restartInterval >= 0 && restartInterval <= 0xffff,
      s"restart interval $restartInterval out of the 16-bit DRI range")

    val out = new java.io.ByteArrayOutputStream(w * h / 8 + 1024)
    def u8(v: Int): Unit = out.write(v & 0xff)
    def u16(v: Int): Unit = { u8(v >> 8); u8(v) }
    def marker(m: Int): Unit = { u8(0xff); u8(m) }
    def dht(tc: Int, th: Int, bits: Array[Int], vals: Array[Int]): Unit = {
      marker(0xc4); u16(2 + 1 + 16 + vals.length)
      u8((tc << 4) | th); bits.foreach(u8); vals.foreach(u8)
    }

    val nf = if (gray) 1 else 3
    writeFrameHeader(out, 0xc2, w, h, gray, sampH, sampV, qLuma, qChroma,
      withAcTables = false, exifOrientation = exifOrientation)

    // geometry + per-block quantized DC arrays over the PADDED grids
    val hm = if (gray) 1 else sampH
    val vm = if (gray) 1 else sampV
    val mcusX = (w + 8 * hm - 1) / (8 * hm)
    val mcusY = (h + 8 * vm - 1) / (8 * vm)
    val qzL = Array.tabulate(64)(k => qLuma(Zigzag(k)))
    val qzC = if (gray) null else Array.tabulate(64)(k => qChroma(Zigzag(k)))
    val gridW = Array.tabulate(nf)(ci => if (ci == 0) mcusX * hm else mcusX)
    val gridH = Array.tabulate(nf)(ci => if (ci == 0) mcusY * vm else mcusY)
    val planes = Array.tabulate(nf) { ci =>
      if (ci == 0) padPlane(yPlane, w, h, gridW(0) * 8, gridH(0) * 8)
      else padPlane(if (ci == 1) cbPlane else crPlane, cw, ch,
        gridW(ci) * 8, gridH(ci) * 8)
    }
    val block = new Array[Double](64)
    val coefZ = new Array[Int](64)
    val dcq = Array.tabulate(nf) { ci =>
      val gw = gridW(ci); val gh = gridH(ci)
      val arr = new Array[Int](gw * gh)
      val qz = if (ci == 0) qzL else qzC
      var by = 0
      while (by < gh) {
        var bx = 0
        while (bx < gw) {
          fdctQuantize(planes(ci), gw * 8, bx * 8, by * 8, qz, block, coefZ)
          var k = 1
          while (k < 64) {
            if (coefZ(k) != 0) fail("encodeYccProgressive is fixture-grade: " +
              s"block ($bx,$by) of component $ci has a nonzero AC coefficient")
            k += 1
          }
          arr(by * gw + bx) = coefZ(0)
          bx += 1
        }
        by += 1
      }
      arr
    }

    val dcHuffs = Array.tabulate(nf)(ci =>
      if (ci == 0) new Huff(StdDcLumaBits, StdDcLumaVals)
      else new Huff(StdDcChromaBits, StdDcChromaVals))
    val vss = Array.tabulate(nf)(ci => if (ci == 0) vm else 1)
    val hss = Array.tabulate(nf)(ci => if (ci == 0) hm else 1)

    def sosHeader(sel: Seq[(Int, Int, Int)], ss: Int, se: Int,
        ah: Int, al: Int): Unit = {
      marker(0xda); u16(6 + 2 * sel.length); u8(sel.length)
      sel.foreach { case (id, td, ta) => u8(id); u8((td << 4) | ta) }
      u8(ss); u8(se); u8((ah << 4) | al)
    }
    /** Iterate blocks in the scan's coded order (interleaved MCU order
      * for nf>1, raster for nf=1 — both match the decoder exactly),
      * with per-`restart`-MCU callbacks. */
    def blockOrder(ri: Int)(restart: () => Unit)(
        visit: (Int, Int) => Unit): Unit = {
      var mcu = 0
      val total = mcusX * mcusY
      while (mcu < total) {
        if (ri > 0 && mcu > 0 && mcu % ri == 0) restart()
        val mx = mcu % mcusX
        val my = mcu / mcusX
        var ci = 0
        while (ci < nf) {
          var by = 0
          while (by < vss(ci)) {
            var bx = 0
            while (bx < hss(ci)) {
              visit(ci, (my * vss(ci) + by) * gridW(ci) + (mx * hss(ci) + bx))
              bx += 1
            }
            by += 1
          }
          ci += 1
        }
        mcu += 1
      }
    }

    // SCAN 1: DC first pass, Al = 1, optional restarts
    if (restartInterval > 0) { marker(0xdd); u16(4); u16(restartInterval) }
    sosHeader((0 until nf).map(ci => (ci + 1, if (ci == 0) 0 else 1, 0)),
      0, 0, 0, 1)
    var bw = new BitWriter(out)
    val preds = new Array[Int](nf)
    var rstIdx = 0
    blockOrder(restartInterval) { () =>
      bw.flush(); marker(0xd0 + (rstIdx & 7)); rstIdx += 1
      java.util.Arrays.fill(preds, 0)
    } { (ci, bi) =>
      val v = dcq(ci)(bi) >> 1
      val diff = v - preds(ci)
      preds(ci) = v
      val s = category(diff)
      if (s > 11) fail(s"DC difference $diff out of range")
      val (codes, sizes) = dcHuffs(ci).enc
      bw.put(codes(s), sizes(s))
      if (s > 0) bw.put(if (diff < 0) diff + (1 << s) - 1 else diff, s)
    }
    bw.flush()

    // SCAN 2: DC refinement, Ah = 1, Al = 0 — one raw bit per block
    if (restartInterval > 0) { marker(0xdd); u16(4); u16(0) }
    sosHeader((0 until nf).map(ci => (ci + 1, 0, 0)), 0, 0, 1, 0)
    bw = new BitWriter(out)
    blockOrder(0)(() => ()) { (ci, bi) => bw.put(dcq(ci)(bi) & 1, 1) }
    bw.flush()

    // AC scans: one per component, the empty 1..63 band as EOBRUN runs
    dht(1, 0, EobBits, EobVals)
    val eobHuff = new Huff(EobBits, EobVals)
    val (eobCodes, eobSizes) = eobHuff.enc
    var ci = 0
    while (ci < nf) {
      // non-interleaved scans cover the component's REAL block grid
      val compW = if (ci == 0) w else cw
      val compH = if (ci == 0) h else ch
      val nBlocks = ((compW + 7) / 8) * ((compH + 7) / 8)
      sosHeader(Seq((ci + 1, 0, 0)), 1, 63, 0, 0)
      bw = new BitWriter(out)
      var left = nBlocks
      while (left > 0) {
        var r = 0
        while (r < 14 && (1 << (r + 1)) <= left) r += 1
        val run = math.min(left, (1 << (r + 1)) - 1) // ∈ [2^r, 2^(r+1))
        bw.put(eobCodes(r << 4), eobSizes(r << 4))
        if (r > 0) bw.put(run - (1 << r), r)
        left -= run
      }
      bw.flush()
      ci += 1
    }
    marker(0xd9) // EOI
    out.toByteArray
  }
}
