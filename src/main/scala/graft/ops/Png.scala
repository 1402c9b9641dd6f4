package graft.ops

/** From-spec PNG codec (the public W3C/ISO 15948 PNG specification,
  * round 17) — the other top-2 crawl image format next to JPEG. Before
  * this, `\x89PNG` blobs routed through the unknown/undecodable path:
  * byte-identical copies still deduped exactly, but a re-encode (same
  * raster, different filter choices or chunking) never paired.
  *
  * Scope (full fixed profile since the round-17 second pass):
  *  - decode: all five colour types (grayscale 0, truecolour 2,
  *    indexed 3, grayscale+alpha 4, truecolour+alpha 6) at every
  *    legal bit depth — 1/2/4/8/16; 16-bit reduces to the high byte,
  *    sub-8 grayscale rescales by 255/(2^d−1), palette indexes never
  *    scale — all five scanline filters (None/Sub/Up/Average/Paeth,
  *    spec §9), Adam7 interlace (seven per-pass-filtered sub-images,
  *    spec §8.2), multi-IDAT streams; CRC-verified chunk walk; IEND
  *    required and final (trailing bytes fail — the [[Jpeg]] desync
  *    discipline). Alpha is parsed and DROPPED (output contract is an
  *    RGB raster). What refuses is what the spec itself makes
  *    unreadable: unknown CRITICAL chunks (Apple's proprietary CgBI
  *    shape), CRC rot, truncation, desynced deflate streams.
  *  - meta: a decodeless chunk walk ([[Jpeg.meta]]'s pattern) — IHDR
  *    geometry, palette size, alpha presence, interlace flag, IDAT
  *    byte census, unknown-critical flag at header cost, CRC-checked
  *    but never inflated: the crawl cost-routing pass; decodable ⊆
  *    has-metadata holds because meta's structural guards are a
  *    subset of decode's.
  *  - encode: fixture-grade depth-8 writers for every colour type
  *    with CALLER-CHOSEN per-row filter types and optional Adam7, so
  *    planted gate streams exercise every defilter path and the pass
  *    machinery on the wire.
  *
  * DEFLATE comes from `java.util.zip` (`Inflater`/`Deflater` — public
  * JDK API, zero new dependencies); everything else (signature, chunk
  * framing, CRC-32 over type+data, IHDR semantics, filter algebra,
  * palette/alpha handling) is implemented from the spec text.
  *
  * Reference analog: the ingest path accepts every value byte-string
  * (src/tdb_cons.c:356-411) — media ingest must not silently degrade a
  * top-2 format to exact-blob-only matching.
  */
object Png {
  private def fail(msg: String): Nothing =
    throw new IllegalArgumentException(s"png: $msg")

  /** The 8-byte file signature (spec §5.2). */
  val Signature: Array[Byte] =
    Array(0x89, 0x50, 0x4e, 0x47, 0x0d, 0x0a, 0x1a, 0x0a).map(_.toByte)

  def isPng(bytes: Array[Byte]): Boolean =
    bytes.length >= 8 && (0 until 8).forall(i => bytes(i) == Signature(i))

  private def channelsOf(colorType: Int): Int = colorType match {
    case 0 => 1 // grayscale
    case 2 => 3 // truecolour
    case 3 => 1 // palette index
    case 4 => 2 // grayscale + alpha
    case 6 => 4 // truecolour + alpha
    case t => fail(s"invalid colour type $t")
  }

  /** One parsed chunk: type string, [start, end) of its data. */
  private final case class Chunk(typ: String, start: Int, end: Int)

  /** CRC-verified chunk walk shared by [[decode]] and [[meta]]:
    * signature, IHDR first, IEND last with nothing after it, each
    * chunk's CRC-32 over type+data checked (a truncated download
    * fails here deterministically — PNG's own integrity check is the
    * loud-refusal mechanism, no entropy decode needed). */
  private def walkChunks(bytes: Array[Byte]): Vector[Chunk] = {
    if (!isPng(bytes)) fail("not a png stream (bad signature)")
    val crc = new java.util.zip.CRC32()
    var pos = 8
    val out = Vector.newBuilder[Chunk]
    var sawEnd = false
    var first = true
    while (!sawEnd) {
      if (pos + 8 > bytes.length) fail("truncated chunk header")
      val len = ((bytes(pos) & 0xff) << 24) | ((bytes(pos + 1) & 0xff) << 16) |
        ((bytes(pos + 2) & 0xff) << 8) | (bytes(pos + 3) & 0xff)
      if (len < 0) fail("chunk length overflows")
      val typ = new String(bytes, pos + 4, 4, "US-ASCII")
      if (!typ.forall(c => (c >= 'a' && c <= 'z') || (c >= 'A' && c <= 'Z')))
        fail(s"invalid chunk type at $pos")
      val dataStart = pos + 8
      // Long arithmetic: dataStart + len can wrap Int for a crafted
      // ~2 GiB length, turning the truncation guard into an
      // ArrayIndexOutOfBounds inside the CRC update
      if (dataStart.toLong + len + 4 > bytes.length)
        fail(s"truncated $typ chunk")
      val dataEnd = dataStart + len
      crc.reset()
      crc.update(bytes, pos + 4, 4 + len)
      val want = ((bytes(dataEnd) & 0xff).toLong << 24) |
        ((bytes(dataEnd + 1) & 0xff) << 16) |
        ((bytes(dataEnd + 2) & 0xff) << 8) | (bytes(dataEnd + 3) & 0xff)
      if (crc.getValue != want) fail(s"$typ chunk CRC mismatch")
      if (first && typ != "IHDR") fail("first chunk is not IHDR")
      first = false
      out += Chunk(typ, dataStart, dataEnd)
      pos = dataEnd + 4
      if (typ == "IEND") {
        if (len != 0) fail("IEND carries data")
        if (pos != bytes.length) fail("trailing bytes after IEND")
        sawEnd = true
      }
    }
    out.result()
  }

  private final case class Ihdr(w: Int, h: Int, bitDepth: Int,
      colorType: Int, interlace: Int)

  private def parseIhdr(bytes: Array[Byte], c: Chunk): Ihdr = {
    if (c.end - c.start != 13) fail("IHDR length is not 13")
    def u32(o: Int): Long = ((bytes(o) & 0xffL) << 24) |
      ((bytes(o + 1) & 0xff) << 16) | ((bytes(o + 2) & 0xff) << 8) |
      (bytes(o + 3) & 0xff)
    val w = u32(c.start); val h = u32(c.start + 4)
    if (w <= 0 || h <= 0) fail(s"bad dimensions $w x $h")
    // bound each axis BEFORE multiplying: u32 × u32 × 3 overflows Long
    // for crafted headers (w = h = 0xFFFFFFFF would wrap PAST the
    // guard and publish negative dims as successful metadata)
    if (w > Int.MaxValue.toLong || h > Int.MaxValue.toLong ||
        w * h >= Int.MaxValue / 3) fail(s"image too large $w x $h")
    val bitDepth = bytes(c.start + 8) & 0xff
    val colorType = bytes(c.start + 9) & 0xff
    channelsOf(colorType) // validates the type
    val valid = colorType match {
      case 0 => Set(1, 2, 4, 8, 16)
      case 3 => Set(1, 2, 4, 8)
      case _ => Set(8, 16)
    }
    if (!valid.contains(bitDepth))
      fail(s"invalid bit depth $bitDepth for colour type $colorType")
    if ((bytes(c.start + 10) & 0xff) != 0) fail("unknown compression method")
    if ((bytes(c.start + 11) & 0xff) != 0) fail("unknown filter method")
    val interlace = bytes(c.start + 12) & 0xff
    if (interlace > 1) fail(s"unknown interlace method $interlace")
    Ihdr(w.toInt, h.toInt, bitDepth, colorType, interlace)
  }

  /** The Adam7 pass grid (spec §8.2): (x0, y0, dx, dy) per pass. */
  private val Adam7 = Array(
    (0, 0, 8, 8), (4, 0, 8, 8), (0, 4, 4, 8), (2, 0, 4, 4),
    (0, 2, 2, 4), (1, 0, 2, 2), (0, 1, 1, 2))

  /** Decode → (width, height, RGB raster) — the [[Multimodal.Ppm]] /
    * [[Qoi]] / [[Jpeg]] output contract. Round 17 second pass covers
    * the FULL fixed profile: every legal bit depth (1/2/4/8/16 —
    * 16-bit reduces to its high byte, the spec's sanctioned 8-bit
    * scaling; sub-8 grayscale rescales by 255/(2^d−1), palette
    * indexes never scale) and Adam7 interlace (seven sub-images, each
    * with its own scanline filters). What still refuses is what the
    * spec itself makes unreadable: unknown CRITICAL chunks (e.g.
    * Apple's proprietary CgBI variant), CRC rot, truncation. Callers
    * choose skip-vs-fail, like CSV DROPMALFORMED. */
  def decode(bytes: Array[Byte]): (Int, Int, Array[Byte]) = {
    val chunks = walkChunks(bytes)
    val ihdr = parseIhdr(bytes, chunks.head)
    val ch = channelsOf(ihdr.colorType)
    val depth = ihdr.bitDepth
    // critical chunks we do not understand must refuse, not skip
    // (spec §5.4: ancillary = bit 5 of the first type byte set)
    chunks.find(c => c.typ(0).isUpper &&
        !Set("IHDR", "PLTE", "IDAT", "IEND").contains(c.typ))
      .foreach(c => fail(s"unknown critical chunk ${c.typ}"))
    // palette
    val plte = chunks.filter(_.typ == "PLTE")
    if (plte.length > 1) fail("multiple PLTE chunks")
    val palette: Array[Byte] = plte.headOption.map { c =>
      val n = c.end - c.start
      if (n % 3 != 0 || n == 0 || n > 256 * 3) fail(s"bad PLTE length $n")
      java.util.Arrays.copyOfRange(bytes, c.start, c.end)
    }.orNull
    if (ihdr.colorType == 3 && palette == null)
      fail("palette image without PLTE")
    // IDAT: consecutive (spec §5.6), concatenated zlib stream
    val idatIdx = chunks.zipWithIndex.filter(_._1.typ == "IDAT").map(_._2)
    if (idatIdx.isEmpty) fail("no IDAT")
    if (idatIdx.last - idatIdx.head != idatIdx.length - 1)
      fail("IDAT chunks are not consecutive")
    if (palette != null && idatIdx.head < chunks.indexWhere(_.typ == "PLTE"))
      fail("PLTE after first IDAT")
    val idatLen = idatIdx.map(i => chunks(i).end - chunks(i).start).sum
    val idat = new Array[Byte](idatLen)
    var o = 0
    idatIdx.foreach { i =>
      val c = chunks(i)
      System.arraycopy(bytes, c.start, idat, o, c.end - c.start)
      o += c.end - c.start
    }
    projectRaster(idat, ihdr.w, ihdr.h, depth, ihdr.colorType, palette,
      ihdr.interlace, null, null)
  }

  /** Extract + validate the optional `tRNS` chunk (spec §11.3.1.1):
    * per-palette-entry alpha for colour type 3 (≤ palette entries),
    * one 2-byte sample key for type 0, three 2-byte keys for type 2;
    * prohibited outright for the alpha-carrying types 4/6. Returns
    * null when absent. */
  private def trnsOf(bytes: Array[Byte], chunks: Seq[Chunk],
      colorType: Int, palette: Array[Byte]): Array[Byte] = {
    val cs = chunks.filter(_.typ == "tRNS")
    if (cs.isEmpty) return null
    if (cs.length > 1) fail("multiple tRNS chunks")
    val c = cs.head
    val len = c.end - c.start
    colorType match {
      case 0 => if (len != 2) fail(s"tRNS length $len for gray (want 2)")
      case 2 => if (len != 6) fail(s"tRNS length $len for RGB (want 6)")
      case 3 =>
        if (len == 0 || palette == null || len > palette.length / 3)
          fail(s"tRNS length $len exceeds the ${
            if (palette == null) 0 else palette.length / 3}-entry palette")
      case t => fail(s"tRNS with alpha colour type $t")
    }
    java.util.Arrays.copyOfRange(bytes, c.start, c.end)
  }

  /** The inflate + defilter + colour-project core shared by [[decode]]
    * and the APNG frame path ([[frames]]): one complete zlib stream →
    * an RGB raster of (w, h). When `alphaOut` (length w·h) is non-null
    * it receives per-pixel alpha: the native channel for types 4/6,
    * else tRNS transparency when `trns` is non-null (palette alpha for
    * type 3 — the dominant real-world APNG transparency form — and
    * exact full-depth sample-key matching for types 0/2), else 255.
    * [[decode]] still passes trns = null: a STILL image's RGB output
    * never composites tRNS chroma-keying (the documented caveat);
    * only the APNG blend step reads it. */
  private def projectRaster(idat: Array[Byte], w: Int, h: Int,
      depth: Int, colorType: Int, palette: Array[Byte], interlace: Int,
      alphaOut: Array[Byte], trns: Array[Byte]): (Int, Int, Array[Byte]) = {
    val ch = channelsOf(colorType)
    // pass geometry: sequential = one full-frame pass; Adam7 = seven
    // sub-images, empty passes contribute NO bytes (spec §8.2)
    val passes: Array[(Int, Int, Int, Int)] =
      if (interlace == 0) Array((0, 0, 1, 1)) else Adam7
    def passDims(p: (Int, Int, Int, Int)): (Int, Int) = {
      val (x0, y0, dx, dy) = p
      (if (w > x0) (w - x0 + dx - 1) / dx else 0,
        if (h > y0) (h - y0 + dy - 1) / dy else 0)
    }
    // row/total sizes in LONG: the IHDR guard bounds w·h·3 below 2³¹,
    // but a 16-bit RGBA filtered stream is up to 8/3× the output
    // raster and wp·ch·depth alone can overflow Int at legal dims
    def rowBytesOf(wp: Int): Long = (wp.toLong * ch * depth + 7) / 8
    // inflate to EXACTLY the summed filtered-pass size — anything
    // shorter is a truncated raster, anything longer a desynced stream
    val expectedL = passes.map { p =>
      val (wp, hp) = passDims(p)
      if (wp == 0 || hp == 0) 0L else hp * (1 + rowBytesOf(wp))
    }.sum
    if (expectedL >= Int.MaxValue)
      fail(s"filtered stream too large (${expectedL} bytes)")
    val expected = expectedL.toInt
    val raw = new Array[Byte](expected)
    val inf = new java.util.zip.Inflater()
    try {
      inf.setInput(idat)
      var off = 0
      var stalled = false
      while (off < expected && !inf.finished() && !stalled) {
        val n =
          try inf.inflate(raw, off, expected - off)
          catch { case e: java.util.zip.DataFormatException =>
            fail(s"corrupt deflate stream: ${e.getMessage}") }
        if (n == 0 && (inf.needsInput() || inf.needsDictionary())) stalled = true
        off += n
      }
      if (off != expected)
        fail(s"inflated $off of $expected filtered bytes (truncated IDAT)")
      val probe = new Array[Byte](1)
      if (!inf.finished() && inf.inflate(probe, 0, 1) > 0)
        fail("deflate stream longer than the declared raster")
    } finally inf.end()
    // per pass: defilter (spec §9 — five per-row filter types over the
    // previous reconstructed row OF THE SAME PASS; bpp = filter unit,
    // one byte minimum for sub-8 depths), then scatter the pass's
    // pixels onto the output grid at (x0 + i·dx, y0 + j·dy)
    val bpp = math.max(1, ch * depth / 8)
    if (alphaOut != null) java.util.Arrays.fill(alphaOut, 255.toByte)
    val out = new Array[Byte](w * h * 3)
    var passBase = 0
    passes.foreach { pass =>
      val (x0, y0, dx, dy) = pass
      val (wp, hp) = passDims(pass)
      if (wp > 0 && hp > 0) {
        val rb = rowBytesOf(wp).toInt // bounded by the expected check
        var j = 0
        while (j < hp) {
          val base = passBase + j * (1 + rb) + 1
          val prevBase = base - (1 + rb)
          val ft = raw(base - 1) & 0xff
          var x = 0
          while (x < rb) {
            val a = if (x >= bpp) raw(base + x - bpp) & 0xff else 0
            val b = if (j > 0) raw(prevBase + x) & 0xff else 0
            val c = if (j > 0 && x >= bpp) raw(prevBase + x - bpp) & 0xff else 0
            val add = ft match {
              case 0 => 0
              case 1 => a
              case 2 => b
              case 3 => (a + b) >> 1
              case 4 => // Paeth predictor (spec §9.4)
                val p = a + b - c
                val pa = math.abs(p - a); val pb = math.abs(p - b)
                val pc = math.abs(p - c)
                if (pa <= pb && pa <= pc) a else if (pb <= pc) b else c
              case t => fail(s"unknown filter type $t on pass row $j")
            }
            raw(base + x) = ((raw(base + x) & 0xff) + add).toByte
            x += 1
          }
          // scatter this pass row
          var i = 0
          while (i < wp) {
            // channel sample c of pass pixel i at any depth; 16-bit
            // keeps the high byte, the spec's 8-bit reduction
            def sample(c: Int): Int = depth match {
              case 8 => raw(base + i * ch + c) & 0xff
              case 16 => raw(base + (i * ch + c) * 2) & 0xff
              case d => // 1/2/4: single-channel types only (IHDR-enforced)
                val bitPos = i * d
                ((raw(base + (bitPos >> 3)) & 0xff)
                  >> (8 - d - (bitPos & 7))) & ((1 << d) - 1)
            }
            // FULL-precision sample for tRNS key matching: the spec
            // compares at source depth (§11.3.1.1), so 16-bit keys use
            // both bytes, not the 8-bit display reduction above
            def sampleFull(c: Int): Int =
              if (depth == 16) ((raw(base + (i * ch + c) * 2) & 0xff) << 8) |
                (raw(base + (i * ch + c) * 2 + 1) & 0xff)
              else sample(c)
            def trnsKey(k: Int): Int =
              ((trns(2 * k) & 0xff) << 8) | (trns(2 * k + 1) & 0xff)
            val p = (y0 + j * dy) * w + (x0 + i * dx)
            colorType match {
              case 0 =>
                val s = sample(0)
                // sub-8 grayscale rescales to full range (spec §6.1)
                val v = (if (depth >= 8) s
                  else s * 255 / ((1 << depth) - 1)).toByte
                out(3 * p) = v; out(3 * p + 1) = v; out(3 * p + 2) = v
                if (alphaOut != null && trns != null &&
                    sampleFull(0) == trnsKey(0)) alphaOut(p) = 0
              case 2 | 6 =>
                out(3 * p) = sample(0).toByte
                out(3 * p + 1) = sample(1).toByte
                out(3 * p + 2) = sample(2).toByte
                if (colorType == 6 && alphaOut != null)
                  alphaOut(p) = sample(3).toByte
                if (colorType == 2 && alphaOut != null && trns != null &&
                    sampleFull(0) == trnsKey(0) &&
                    sampleFull(1) == trnsKey(1) &&
                    sampleFull(2) == trnsKey(2)) alphaOut(p) = 0
              case 3 =>
                val idx = sample(0) // palette indexes never scale
                if (idx * 3 + 2 >= palette.length)
                  fail(s"palette index $idx out of range")
                out(3 * p) = palette(3 * idx)
                out(3 * p + 1) = palette(3 * idx + 1)
                out(3 * p + 2) = palette(3 * idx + 2)
                // entries past the tRNS payload are opaque (spec)
                if (alphaOut != null && trns != null && idx < trns.length)
                  alphaOut(p) = trns(idx)
              case 4 =>
                val v = sample(0).toByte
                out(3 * p) = v; out(3 * p + 1) = v; out(3 * p + 2) = v
                if (alphaOut != null) alphaOut(p) = sample(1).toByte
            }
            i += 1
          }
          j += 1
        }
        passBase += hp * (1 + rb)
      }
    }
    (w, h, out)
  }

  /** APNG frame decode (round 18, from the public APNG spec — now
    * §"APNG" of the PNG 3rd edition): `acTL` animation control,
    * per-frame `fcTL` (rect, delay, dispose/blend ops), frame rasters
    * in the `IDAT` stream (when the first `fcTL` precedes it) and in
    * `fdAT` chunks (one complete zlib stream per frame, shared
    * strictly-consecutive sequence counter across fcTL+fdAT),
    * composited onto an RGBA canvas per the dispose (none/background/
    * previous) and blend (source/over) semantics — the [[Gif.frames]]
    * contract, so animated PNGs ride the SAME video-bridge matcher.
    * A plain PNG returns its single frame with delay 0. Returns
    * (canvasW, canvasH, frames = (delay_cs, RGB raster)). */
  def frames(bytes: Array[Byte]): (Int, Int, Seq[(Int, Array[Byte])]) = {
    val chunks = walkChunks(bytes)
    val ihdr = parseIhdr(bytes, chunks.head)
    val actl = chunks.filter(_.typ == "acTL")
    if (actl.isEmpty) {
      val (w, h, rgb) = decode(bytes)
      return (w, h, Seq((0, rgb)))
    }
    if (actl.length > 1) fail("multiple acTL chunks")
    chunks.find(c => c.typ(0).isUpper &&
        !Set("IHDR", "PLTE", "IDAT", "IEND").contains(c.typ))
      .foreach(c => fail(s"unknown critical chunk ${c.typ}"))
    def u32(o: Int): Long = ((bytes(o) & 0xffL) << 24) |
      ((bytes(o + 1) & 0xff) << 16) | ((bytes(o + 2) & 0xff) << 8) |
      (bytes(o + 3) & 0xff)
    def u16(o: Int): Int = ((bytes(o) & 0xff) << 8) | (bytes(o + 1) & 0xff)
    val declaredFrames = u32(actl.head.start)
    if (chunks.indexWhere(_.typ == "acTL") >
        chunks.indexWhere(_.typ == "IDAT"))
      fail("acTL after the first IDAT")
    val palette: Array[Byte] = chunks.find(_.typ == "PLTE").map { c =>
      val n = c.end - c.start
      if (n % 3 != 0 || n == 0 || n > 256 * 3) fail(s"bad PLTE length $n")
      java.util.Arrays.copyOfRange(bytes, c.start, c.end)
    }.orNull
    if (ihdr.colorType == 3 && palette == null)
      fail("palette image without PLTE")
    // tRNS feeds the blend step (round 19, advisor): palette+tRNS is
    // the dominant real-world APNG transparency form — without it,
    // blend_op=OVER frames composite transparent pixels as opaque
    val trns = trnsOf(bytes, chunks, ihdr.colorType, palette)
    // frame assembly: each fcTL opens a frame; its data is the IDAT
    // set (first fcTL before IDAT) or the fdAT set that follows it.
    // fcTL + fdAT share ONE strictly-consecutive sequence counter.
    final case class Fctl(w: Int, h: Int, x: Int, y: Int, delayCs: Int,
        dispose: Int, blend: Int)
    var nextSeq = 0L
    def seqCheck(o: Int): Unit = {
      if (u32(o) != nextSeq)
        fail(s"APNG sequence ${u32(o)} != expected $nextSeq")
      nextSeq += 1
    }
    val frameList = scala.collection.mutable.ArrayBuffer
      .empty[(Fctl, Array[Byte])]
    var cur: Fctl = null
    var curData = new java.io.ByteArrayOutputStream()
    var idatIsFrame = false
    def flush(): Unit = if (cur != null) {
      if (curData.size == 0) fail("APNG frame without data")
      frameList += ((cur, curData.toByteArray))
      curData = new java.io.ByteArrayOutputStream()
    }
    chunks.foreach { c =>
      c.typ match {
        case "fcTL" =>
          if (c.end - c.start != 26) fail("fcTL length is not 26")
          seqCheck(c.start)
          flush()
          val fw = u32(c.start + 4); val fh = u32(c.start + 8)
          val fx = u32(c.start + 12); val fy = u32(c.start + 16)
          if (fw <= 0 || fh <= 0 || fx + fw > ihdr.w || fy + fh > ihdr.h)
            fail(s"frame rect ($fx,$fy ${fw}x$fh) outside the canvas")
          val num = u16(c.start + 20)
          val den0 = u16(c.start + 22)
          val den = if (den0 == 0) 100 else den0 // spec: 0 ⇒ 100
          val dispose = bytes(c.start + 24) & 0xff
          val blend = bytes(c.start + 25) & 0xff
          if (dispose > 2) fail(s"unknown dispose_op $dispose")
          if (blend > 1) fail(s"unknown blend_op $blend")
          cur = Fctl(fw.toInt, fh.toInt, fx.toInt, fy.toInt,
            num * 100 / den, dispose, blend)
          if (frameList.isEmpty && !idatIsFrame) {
            // is this the pre-IDAT fcTL? (the IDAT participates)
            val idatPos = chunks.indexWhere(_.typ == "IDAT")
            if (chunks.indexOf(c) < idatPos) {
              if (cur.w != ihdr.w || cur.h != ihdr.h || cur.x != 0 ||
                  cur.y != 0)
                fail("the IDAT frame must cover the whole canvas")
              idatIsFrame = true
            }
          }
        case "IDAT" if idatIsFrame && frameList.isEmpty =>
          curData.write(bytes, c.start, c.end - c.start)
        case "fdAT" =>
          if (cur == null) fail("fdAT before any fcTL")
          if (c.end - c.start < 4) fail("fdAT too short")
          seqCheck(c.start)
          curData.write(bytes, c.start + 4, c.end - c.start - 4)
        case _ => ()
      }
    }
    flush()
    if (frameList.isEmpty) fail("acTL with no fcTL frames")
    if (declaredFrames != frameList.length)
      fail(s"acTL declares $declaredFrames frames, found ${frameList.length}")
    // composite per the APNG model: an RGBA canvas starting fully
    // transparent black; output drops alpha (the RGB decode contract)
    val n = ihdr.w * ihdr.h
    val canvas = new Array[Byte](n * 3)
    val canvasA = new Array[Byte](n)
    val out = Seq.newBuilder[(Int, Array[Byte])]
    frameList.zipWithIndex.foreach { case ((f, z), k) =>
      val fa = new Array[Byte](f.w * f.h)
      // frames share EVERY IHDR parameter — including the interlace
      // method (an Adam7 default image is spec-legal as frame 0)
      val (_, _, rgb) = projectRaster(z, f.w, f.h, ihdr.bitDepth,
        ihdr.colorType, palette, ihdr.interlace, fa, trns)
      // dispose PREVIOUS on the first frame degrades to BACKGROUND
      val dispose = if (k == 0 && f.dispose == 2) 1 else f.dispose
      val saved =
        if (dispose == 2)
          (java.util.Arrays.copyOf(canvas, canvas.length),
            java.util.Arrays.copyOf(canvasA, canvasA.length))
        else null
      var j = 0
      while (j < f.h) {
        var i = 0
        while (i < f.w) {
          val src = j * f.w + i
          val dst = (f.y + j) * ihdr.w + (f.x + i)
          val sa = fa(src) & 0xff
          if (f.blend == 0 || sa == 255) {
            canvas(3 * dst) = rgb(3 * src)
            canvas(3 * dst + 1) = rgb(3 * src + 1)
            canvas(3 * dst + 2) = rgb(3 * src + 2)
            canvasA(dst) = fa(src)
          } else if (sa > 0) {
            // OVER with the DESTINATION alpha (spec formula): over a
            // transparent pixel (dst.a = 0 — the dispose-background /
            // initial-canvas case delta-frame encoders rely on) the
            // source lands EXACTLY, not scaled by its own alpha
            val da = canvasA(dst) & 0xff
            val u = sa
            val v = da * (255 - sa) / 255
            val outA = u + v
            var ci = 0
            while (ci < 3) {
              val s = rgb(3 * src + ci) & 0xff
              val d = canvas(3 * dst + ci) & 0xff
              canvas(3 * dst + ci) = ((s * u + d * v) / outA).toByte
              ci += 1
            }
            canvasA(dst) = outA.toByte
          }
          i += 1
        }
        j += 1
      }
      out += ((f.delayCs, java.util.Arrays.copyOf(canvas, canvas.length)))
      dispose match {
        case 1 => // clear the frame region to transparent black
          var jj = 0
          while (jj < f.h) {
            var ii = 0
            while (ii < f.w) {
              val dst = (f.y + jj) * ihdr.w + (f.x + ii)
              canvas(3 * dst) = 0; canvas(3 * dst + 1) = 0
              canvas(3 * dst + 2) = 0; canvasA(dst) = 0
              ii += 1
            }
            jj += 1
          }
        case 2 =>
          System.arraycopy(saved._1, 0, canvas, 0, canvas.length)
          System.arraycopy(saved._2, 0, canvasA, 0, canvasA.length)
        case _ => ()
      }
    }
    (ihdr.w, ihdr.h, out.result())
  }

  /** Structural stream metadata from the CRC-checked chunk walk — NO
    * inflate, so it costs header+CRC instead of pixels ([[Jpeg.meta]]'s
    * crawl pre-gate pattern). Unlike decode, meta REPORTS interlace and
    * 16-bit depth instead of refusing — that is the cost-routing signal
    * a pre-decode gate exists to read — so has-metadata ⊇ decodable
    * holds structurally. `idat_bytes` is the compressed payload census
    * (a 1×1 tracking pixel and a 20 MP photo separate here without a
    * single inflate call). */
  /** `animated`/`nFrames`/`totalDelayCs` are the APNG census (round
    * 18 — the [[Gif.Meta]] convention): acTL presence, fcTL count, and
    * the summed per-frame delays, all from the chunk walk at header
    * cost. A plain PNG reports (false, 1, 0). */
  final case class Meta(width: Int, height: Int, bitDepth: Int,
      colorType: Int, interlaced: Boolean, nChunks: Int, idatBytes: Long,
      paletteSize: Int, hasAlpha: Boolean, unknownCritical: Boolean,
      animated: Boolean = false, nFrames: Int = 1, totalDelayCs: Int = 0)

  def meta(bytes: Array[Byte]): Meta = {
    val chunks = walkChunks(bytes)
    val ihdr = parseIhdr(bytes, chunks.head)
    val paletteSize = chunks.find(_.typ == "PLTE")
      .map(c => (c.end - c.start) / 3).getOrElse(0)
    val idats = chunks.filter(_.typ == "IDAT")
    if (idats.isEmpty) fail("no IDAT")
    val idatBytes = idats.map(c => (c.end - c.start).toLong).sum
    // APNG census: acTL flags animation, fcTL chunks carry the delays
    val animated = chunks.exists(_.typ == "acTL")
    val fctls = chunks.filter(_.typ == "fcTL")
    var totalDelayCs = 0
    fctls.foreach { c =>
      if (c.end - c.start != 26) fail("fcTL length is not 26")
      val num = ((bytes(c.start + 20) & 0xff) << 8) | (bytes(c.start + 21) & 0xff)
      val den0 = ((bytes(c.start + 22) & 0xff) << 8) | (bytes(c.start + 23) & 0xff)
      totalDelayCs += num * 100 / (if (den0 == 0) 100 else den0)
    }
    Meta(ihdr.w, ihdr.h, ihdr.bitDepth, ihdr.colorType,
      ihdr.interlace == 1, chunks.length, idatBytes, paletteSize,
      hasAlpha = ihdr.colorType == 4 || ihdr.colorType == 6 ||
        chunks.exists(_.typ == "tRNS"),
      // a critical chunk decode would refuse (Apple CgBI territory) —
      // the dropped_unsupported routing signal, known without inflate
      unknownCritical = chunks.exists(c => c.typ(0).isUpper &&
        !Set("IHDR", "PLTE", "IDAT", "IEND").contains(c.typ)),
      animated = animated,
      nFrames = if (animated) fctls.length else 1,
      totalDelayCs = totalDelayCs)
  }

  // ---- fixture-grade encoders ----

  private def writeChunk(out: java.io.ByteArrayOutputStream, typ: String,
      data: Array[Byte]): Unit = {
    def be32(v: Long): Unit = {
      out.write(((v >>> 24) & 0xff).toInt); out.write(((v >>> 16) & 0xff).toInt)
      out.write(((v >>> 8) & 0xff).toInt); out.write((v & 0xff).toInt)
    }
    be32(data.length.toLong)
    val t = typ.getBytes("US-ASCII")
    out.write(t, 0, 4)
    out.write(data, 0, data.length)
    val crc = new java.util.zip.CRC32()
    crc.update(t); crc.update(data)
    be32(crc.getValue)
  }

  /** Forward-filter `samples` (channels-interleaved rows, depth 8)
    * with the caller's per-row filter choice, deflate, and frame the
    * chunks. `filterOf(y)` ∈ 0..4 (y = the row's GLOBAL index) — gate
    * fixtures cycle it so every defilter path is exercised on the
    * wire. `idatChunkSize` splits the zlib stream across IDAT chunks
    * (multi-IDAT is the common wild shape). `interlaced` writes the
    * seven Adam7 sub-images, each forward-filtered within its own
    * pass. */
  private def encodeRaw(w: Int, h: Int, colorType: Int,
      samples: Array[Byte], palette: Array[Byte], filterOf: Int => Int,
      idatChunkSize: Int, interlaced: Boolean = false): Array[Byte] = {
    val ch = channelsOf(colorType)
    require(samples.length == w * h * ch,
      s"samples ${samples.length} != ${w * h * ch}")
    val passes: Array[(Int, Int, Int, Int)] =
      if (!interlaced) Array((0, 0, 1, 1)) else Adam7
    val rawOut = new java.io.ByteArrayOutputStream(
      h * (1 + w * ch) + passes.length * 8)
    passes.foreach { case (x0, y0, dx, dy) =>
      val wp = if (w > x0) (w - x0 + dx - 1) / dx else 0
      val hp = if (h > y0) (h - y0 + dy - 1) / dy else 0
      if (wp > 0 && hp > 0) {
        val rb = wp * ch
        // gather the pass's sample rows, then forward-filter within
        // the pass (the decoder's per-pass inverse)
        val ps = new Array[Byte](hp * rb)
        var j = 0
        while (j < hp) {
          var i = 0
          while (i < wp) {
            val src = ((y0 + j * dy) * w + (x0 + i * dx)) * ch
            var c = 0
            while (c < ch) {
              ps(j * rb + i * ch + c) = samples(src + c); c += 1
            }
            i += 1
          }
          j += 1
        }
        j = 0
        while (j < hp) {
          val ft = filterOf(y0 + j * dy)
          require(ft >= 0 && ft <= 4, s"bad filter type $ft")
          rawOut.write(ft)
          var x = 0
          while (x < rb) {
            val cur = ps(j * rb + x) & 0xff
            val a = if (x >= ch) ps(j * rb + x - ch) & 0xff else 0
            val b = if (j > 0) ps((j - 1) * rb + x) & 0xff else 0
            val c = if (j > 0 && x >= ch) ps((j - 1) * rb + x - ch) & 0xff else 0
            val pred = ft match {
              case 0 => 0
              case 1 => a
              case 2 => b
              case 3 => (a + b) >> 1
              case 4 =>
                val p = a + b - c
                val pa = math.abs(p - a); val pb = math.abs(p - b)
                val pc = math.abs(p - c)
                if (pa <= pb && pa <= pc) a else if (pb <= pc) b else c
            }
            rawOut.write((cur - pred) & 0xff)
            x += 1
          }
          j += 1
        }
      }
    }
    val raw = rawOut.toByteArray
    val def_ = new java.util.zip.Deflater()
    val zBuf = new java.io.ByteArrayOutputStream(raw.length / 2 + 64)
    try {
      def_.setInput(raw); def_.finish()
      val tmp = new Array[Byte](4096)
      while (!def_.finished()) {
        val n = def_.deflate(tmp)
        zBuf.write(tmp, 0, n)
      }
    } finally def_.end()
    val z = zBuf.toByteArray
    val out = new java.io.ByteArrayOutputStream(z.length + 128)
    out.write(Signature, 0, 8)
    val ihdr = new Array[Byte](13)
    ihdr(0) = ((w >>> 24) & 0xff).toByte; ihdr(1) = ((w >>> 16) & 0xff).toByte
    ihdr(2) = ((w >>> 8) & 0xff).toByte; ihdr(3) = (w & 0xff).toByte
    ihdr(4) = ((h >>> 24) & 0xff).toByte; ihdr(5) = ((h >>> 16) & 0xff).toByte
    ihdr(6) = ((h >>> 8) & 0xff).toByte; ihdr(7) = (h & 0xff).toByte
    ihdr(8) = 8; ihdr(9) = colorType.toByte; ihdr(10) = 0; ihdr(11) = 0
    ihdr(12) = if (interlaced) 1 else 0
    writeChunk(out, "IHDR", ihdr)
    if (palette != null) writeChunk(out, "PLTE", palette)
    var off = 0
    while (off < z.length) {
      val n = math.min(idatChunkSize, z.length - off)
      writeChunk(out, "IDAT", java.util.Arrays.copyOfRange(z, off, off + n))
      off += n
    }
    if (z.isEmpty) writeChunk(out, "IDAT", Array.emptyByteArray)
    writeChunk(out, "IEND", Array.emptyByteArray)
    out.toByteArray
  }

  /** Forward-filter one full-canvas pass and deflate it — the frame
    * payload builder shared by [[encodeApng]]. */
  private def filterDeflate(w: Int, h: Int, ch: Int,
      samples: Array[Byte], filterOf: Int => Int): Array[Byte] = {
    val rb = w * ch
    val raw = new java.io.ByteArrayOutputStream(h * (1 + rb))
    var j = 0
    while (j < h) {
      val ft = filterOf(j)
      require(ft >= 0 && ft <= 4, s"bad filter type $ft")
      raw.write(ft)
      var x = 0
      while (x < rb) {
        val cur = samples(j * rb + x) & 0xff
        val a = if (x >= ch) samples(j * rb + x - ch) & 0xff else 0
        val b = if (j > 0) samples((j - 1) * rb + x) & 0xff else 0
        val c = if (j > 0 && x >= ch) samples((j - 1) * rb + x - ch) & 0xff else 0
        val pred = ft match {
          case 0 => 0
          case 1 => a
          case 2 => b
          case 3 => (a + b) >> 1
          case 4 =>
            val p = a + b - c
            val pa = math.abs(p - a); val pb = math.abs(p - b)
            val pc = math.abs(p - c)
            if (pa <= pb && pa <= pc) a else if (pb <= pc) b else c
        }
        raw.write((cur - pred) & 0xff)
        x += 1
      }
      j += 1
    }
    val def_ = new java.util.zip.Deflater()
    val zBuf = new java.io.ByteArrayOutputStream(raw.size / 2 + 64)
    try {
      def_.setInput(raw.toByteArray); def_.finish()
      val tmp = new Array[Byte](4096)
      while (!def_.finished()) zBuf.write(tmp, 0, def_.deflate(tmp))
    } finally def_.end()
    zBuf.toByteArray
  }

  /** Fixture-grade APNG writer (truecolour, depth 8): every frame a
    * full-canvas RGB raster with its delay in centiseconds; frame 0
    * rides the IDAT (its fcTL precedes it), later frames ride fdAT
    * chunks — dispose none, blend source, real shared sequence
    * numbering, real CRCs. `filterOf(y)` picks per-row filters, so a
    * RE-ENCODE cohort differs byte-for-byte while decoding
    * identically. */
  def encodeApng(w: Int, h: Int, frames: Seq[(Int, Array[Byte])],
      filterOf: Int => Int = _ => 0, fdatChunkSize: Int = 8192): Array[Byte] = {
    require(frames.nonEmpty, "need at least one frame")
    frames.foreach { case (_, rgb) =>
      require(rgb.length == w * h * 3, "frame raster size mismatch") }
    val out = new java.io.ByteArrayOutputStream()
    out.write(Signature, 0, 8)
    val ihdr = new Array[Byte](13)
    ihdr(0) = ((w >>> 24) & 0xff).toByte; ihdr(1) = ((w >>> 16) & 0xff).toByte
    ihdr(2) = ((w >>> 8) & 0xff).toByte; ihdr(3) = (w & 0xff).toByte
    ihdr(4) = ((h >>> 24) & 0xff).toByte; ihdr(5) = ((h >>> 16) & 0xff).toByte
    ihdr(6) = ((h >>> 8) & 0xff).toByte; ihdr(7) = (h & 0xff).toByte
    ihdr(8) = 8; ihdr(9) = 2; ihdr(10) = 0; ihdr(11) = 0; ihdr(12) = 0
    writeChunk(out, "IHDR", ihdr)
    def be32(v: Long): Array[Byte] = Array(
      ((v >>> 24) & 0xff).toByte, ((v >>> 16) & 0xff).toByte,
      ((v >>> 8) & 0xff).toByte, (v & 0xff).toByte)
    writeChunk(out, "acTL", be32(frames.length.toLong) ++ be32(0L))
    var seq = 0L
    def fctl(delayCs: Int): Array[Byte] = {
      val b = be32(seq) ++ be32(w.toLong) ++ be32(h.toLong) ++
        be32(0L) ++ be32(0L) ++
        Array[Byte](((delayCs >> 8) & 0xff).toByte, (delayCs & 0xff).toByte,
          0, 100.toByte, // delay_den = 100 (centiseconds)
          0, 0) // dispose none, blend source
      seq += 1
      b
    }
    frames.zipWithIndex.foreach { case ((delayCs, rgb), k) =>
      writeChunk(out, "fcTL", fctl(delayCs))
      val z = filterDeflate(w, h, 3, rgb, filterOf)
      if (k == 0) {
        writeChunk(out, "IDAT", z)
      } else {
        var off = 0
        while (off < z.length) {
          val nn = math.min(fdatChunkSize, z.length - off)
          writeChunk(out, "fdAT",
            be32(seq) ++ java.util.Arrays.copyOfRange(z, off, off + nn))
          seq += 1
          off += nn
        }
      }
    }
    writeChunk(out, "IEND", Array.emptyByteArray)
    out.toByteArray
  }

  /** One advanced APNG fixture frame: an RGBA sub-rect with explicit
    * dispose/blend ops. */
  final case class ApngFrame(rgba: Array[Byte], x: Int = 0, y: Int = 0,
      w: Int = -1, h: Int = -1, delayCs: Int = 0, dispose: Int = 0,
      blend: Int = 0)

  /** Fixture-grade RGBA APNG writer (colour type 6): sub-rect frames
    * with dispose none/background/previous and blend source/over —
    * the full compositing surface [[frames]] implements. Frame 0 must
    * cover the canvas (it rides the IDAT). */
  def encodeApngRgba(w: Int, h: Int, fs: Seq[ApngFrame]): Array[Byte] = {
    require(fs.nonEmpty, "need at least one frame")
    val f0 = fs.head
    require((f0.w < 0 || f0.w == w) && (f0.h < 0 || f0.h == h) &&
      f0.x == 0 && f0.y == 0, "frame 0 must cover the canvas")
    val out = new java.io.ByteArrayOutputStream()
    out.write(Signature, 0, 8)
    val ihdr = new Array[Byte](13)
    ihdr(0) = ((w >>> 24) & 0xff).toByte; ihdr(1) = ((w >>> 16) & 0xff).toByte
    ihdr(2) = ((w >>> 8) & 0xff).toByte; ihdr(3) = (w & 0xff).toByte
    ihdr(4) = ((h >>> 24) & 0xff).toByte; ihdr(5) = ((h >>> 16) & 0xff).toByte
    ihdr(6) = ((h >>> 8) & 0xff).toByte; ihdr(7) = (h & 0xff).toByte
    ihdr(8) = 8; ihdr(9) = 6; ihdr(10) = 0; ihdr(11) = 0; ihdr(12) = 0
    writeChunk(out, "IHDR", ihdr)
    def be32(v: Long): Array[Byte] = Array(
      ((v >>> 24) & 0xff).toByte, ((v >>> 16) & 0xff).toByte,
      ((v >>> 8) & 0xff).toByte, (v & 0xff).toByte)
    writeChunk(out, "acTL", be32(fs.length.toLong) ++ be32(0L))
    var seq = 0L
    fs.zipWithIndex.foreach { case (f, k) =>
      val fw = if (f.w < 0) w else f.w
      val fh = if (f.h < 0) h else f.h
      require(f.rgba.length == fw * fh * 4, "frame raster size mismatch")
      val fctl = be32(seq) ++ be32(fw.toLong) ++ be32(fh.toLong) ++
        be32(f.x.toLong) ++ be32(f.y.toLong) ++
        Array[Byte](((f.delayCs >> 8) & 0xff).toByte,
          (f.delayCs & 0xff).toByte, 0, 100.toByte,
          f.dispose.toByte, f.blend.toByte)
      seq += 1
      writeChunk(out, "fcTL", fctl)
      val z = filterDeflate(fw, fh, 4, f.rgba, _ => 0)
      if (k == 0) writeChunk(out, "IDAT", z)
      else {
        writeChunk(out, "fdAT", be32(seq) ++ z)
        seq += 1
      }
    }
    writeChunk(out, "IEND", Array.emptyByteArray)
    out.toByteArray
  }

  /** One indexed APNG fixture frame: a palette-index sub-rect with
    * explicit dispose/blend ops (the [[ApngFrame]] shape for colour
    * type 3). */
  final case class ApngIdxFrame(idx: Array[Byte], x: Int = 0, y: Int = 0,
      w: Int = -1, h: Int = -1, delayCs: Int = 0, dispose: Int = 0,
      blend: Int = 0)

  /** Fixture-grade INDEXED APNG writer (colour type 3, depth 8) with
    * an optional `tRNS` per-entry alpha chunk — the dominant
    * real-world APNG transparency form (round 19): PLTE then tRNS
    * before the first IDAT, sub-rect frames with the full
    * dispose/blend surface. Entries past the tRNS payload are opaque
    * per spec. */
  def encodeApngPalette(w: Int, h: Int, palette: Array[Byte],
      trns: Array[Byte], fs: Seq[ApngIdxFrame]): Array[Byte] = {
    require(fs.nonEmpty, "need at least one frame")
    require(palette.length % 3 == 0 && palette.length > 0 &&
      palette.length <= 768, s"bad palette length ${palette.length}")
    val f0 = fs.head
    require((f0.w < 0 || f0.w == w) && (f0.h < 0 || f0.h == h) &&
      f0.x == 0 && f0.y == 0, "frame 0 must cover the canvas")
    val out = new java.io.ByteArrayOutputStream()
    out.write(Signature, 0, 8)
    val ihdr = new Array[Byte](13)
    ihdr(0) = ((w >>> 24) & 0xff).toByte; ihdr(1) = ((w >>> 16) & 0xff).toByte
    ihdr(2) = ((w >>> 8) & 0xff).toByte; ihdr(3) = (w & 0xff).toByte
    ihdr(4) = ((h >>> 24) & 0xff).toByte; ihdr(5) = ((h >>> 16) & 0xff).toByte
    ihdr(6) = ((h >>> 8) & 0xff).toByte; ihdr(7) = (h & 0xff).toByte
    ihdr(8) = 8; ihdr(9) = 3; ihdr(10) = 0; ihdr(11) = 0; ihdr(12) = 0
    writeChunk(out, "IHDR", ihdr)
    def be32(v: Long): Array[Byte] = Array(
      ((v >>> 24) & 0xff).toByte, ((v >>> 16) & 0xff).toByte,
      ((v >>> 8) & 0xff).toByte, (v & 0xff).toByte)
    writeChunk(out, "acTL", be32(fs.length.toLong) ++ be32(0L))
    writeChunk(out, "PLTE", palette)
    if (trns != null) writeChunk(out, "tRNS", trns)
    var seq = 0L
    fs.zipWithIndex.foreach { case (f, k) =>
      val fw = if (f.w < 0) w else f.w
      val fh = if (f.h < 0) h else f.h
      require(f.idx.length == fw * fh, "frame raster size mismatch")
      val fctl = be32(seq) ++ be32(fw.toLong) ++ be32(fh.toLong) ++
        be32(f.x.toLong) ++ be32(f.y.toLong) ++
        Array[Byte](((f.delayCs >> 8) & 0xff).toByte,
          (f.delayCs & 0xff).toByte, 0, 100.toByte,
          f.dispose.toByte, f.blend.toByte)
      seq += 1
      writeChunk(out, "fcTL", fctl)
      val z = filterDeflate(fw, fh, 1, f.idx, _ => 0)
      if (k == 0) writeChunk(out, "IDAT", z)
      else {
        writeChunk(out, "fdAT", be32(seq) ++ z)
        seq += 1
      }
    }
    writeChunk(out, "IEND", Array.emptyByteArray)
    out.toByteArray
  }

  /** Truecolour (type 2) from an RGB raster. */
  def encode(w: Int, h: Int, rgb: Array[Byte],
      filterOf: Int => Int = _ => 0, idatChunkSize: Int = 8192,
      interlaced: Boolean = false): Array[Byte] =
    encodeRaw(w, h, 2, rgb, null, filterOf, idatChunkSize, interlaced)

  /** Grayscale (type 0). */
  def encodeGray(w: Int, h: Int, gray: Array[Byte],
      filterOf: Int => Int = _ => 0, idatChunkSize: Int = 8192,
      interlaced: Boolean = false): Array[Byte] =
    encodeRaw(w, h, 0, gray, null, filterOf, idatChunkSize, interlaced)

  /** Indexed (type 3, depth 8): `palette` is 3·n RGB bytes, `idx` one
    * palette index per pixel. */
  def encodePalette(w: Int, h: Int, palette: Array[Byte], idx: Array[Byte],
      filterOf: Int => Int = _ => 0, idatChunkSize: Int = 8192,
      interlaced: Boolean = false): Array[Byte] = {
    require(palette.length % 3 == 0 && palette.length > 0 &&
      palette.length <= 768, s"bad palette length ${palette.length}")
    encodeRaw(w, h, 3, idx, palette, filterOf, idatChunkSize, interlaced)
  }

  /** Truecolour+alpha (type 6) from an RGBA raster. */
  def encodeRgba(w: Int, h: Int, rgba: Array[Byte],
      filterOf: Int => Int = _ => 0, idatChunkSize: Int = 8192,
      interlaced: Boolean = false): Array[Byte] =
    encodeRaw(w, h, 6, rgba, null, filterOf, idatChunkSize, interlaced)

  /** Grayscale+alpha (type 4) from a GA-interleaved plane. */
  def encodeGrayAlpha(w: Int, h: Int, ga: Array[Byte],
      filterOf: Int => Int = _ => 0, idatChunkSize: Int = 8192,
      interlaced: Boolean = false): Array[Byte] =
    encodeRaw(w, h, 4, ga, null, filterOf, idatChunkSize, interlaced)
}
