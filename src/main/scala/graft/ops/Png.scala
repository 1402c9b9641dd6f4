package graft.ops

/** From-spec PNG codec (the public W3C/ISO 15948 PNG specification,
  * round 17) — the other top-2 crawl image format next to JPEG. Before
  * this, `\x89PNG` blobs routed through the unknown/undecodable path:
  * byte-identical copies still deduped exactly, but a re-encode (same
  * raster, different filter choices or chunking) never paired.
  *
  * Scope, chosen like [[Jpeg]]'s (support what crawls actually carry,
  * refuse the rest LOUDLY):
  *  - decode: 8-bit grayscale (colour type 0), truecolour (2),
  *    indexed/palette (3), grayscale+alpha (4), truecolour+alpha (6);
  *    all five scanline filters (None/Sub/Up/Average/Paeth, spec §9);
  *    multi-IDAT streams; CRC-verified chunk walk; IEND required and
  *    final (trailing bytes fail — the [[Jpeg]] desync discipline).
  *    Alpha is parsed and DROPPED (output contract is an RGB raster);
  *    16-bit depth, sub-8-bit palettes, and Adam7 interlace refuse
  *    loudly — a truncated or corrupt stream throws, so DROPMALFORMED
  *    bookkeeping stays deterministic.
  *  - meta: a decodeless chunk walk ([[Jpeg.meta]]'s pattern) — IHDR
  *    geometry, palette size, alpha presence, interlace flag, IDAT
  *    byte census at header cost, CRC-checked but never inflated. meta
  *    deliberately accepts MORE than decode (interlace/16-bit report
  *    instead of failing): that is the crawl cost-routing pass —
  *    decodable ⊆ has-metadata still holds because meta's structural
  *    guards are a subset of decode's.
  *  - encode: fixture-grade writers for every supported colour type
  *    with CALLER-CHOSEN per-row filter types, so planted gate streams
  *    exercise all five defilter paths on the wire.
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
      val dataEnd = dataStart + len
      if (dataEnd + 4 > bytes.length) fail(s"truncated $typ chunk")
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
    if (w * h * 3 >= Int.MaxValue) fail(s"image too large $w x $h")
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

  /** Decode → (width, height, RGB raster) — the [[Multimodal.Ppm]] /
    * [[Qoi]] / [[Jpeg]] output contract. Throws on anything outside
    * the supported profile (callers choose skip-vs-fail, like CSV
    * DROPMALFORMED). */
  def decode(bytes: Array[Byte]): (Int, Int, Array[Byte]) = {
    val chunks = walkChunks(bytes)
    val ihdr = parseIhdr(bytes, chunks.head)
    if (ihdr.interlace != 0)
      fail("Adam7 interlace unsupported (sequential scanlines only)")
    if (ihdr.bitDepth != 8)
      fail(s"unsupported bit depth ${ihdr.bitDepth} (8-bit only)")
    val ch = channelsOf(ihdr.colorType)
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
    // inflate to EXACTLY h * (1 + rowBytes) — anything shorter is a
    // truncated raster, anything longer a desynced stream
    val rowBytes = ihdr.w * ch
    val expected = ihdr.h * (1 + rowBytes)
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
    // defilter (spec §9): five per-row filter types over the previous
    // reconstructed row; bpp = channels at depth 8
    val bpp = ch
    var y = 0
    while (y < ihdr.h) {
      val base = y * (1 + rowBytes) + 1
      val prevBase = base - (1 + rowBytes)
      val ft = raw(base - 1) & 0xff
      var x = 0
      while (x < rowBytes) {
        val a = if (x >= bpp) raw(base + x - bpp) & 0xff else 0
        val b = if (y > 0) raw(prevBase + x) & 0xff else 0
        val c = if (y > 0 && x >= bpp) raw(prevBase + x - bpp) & 0xff else 0
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
          case t => fail(s"unknown filter type $t on row $y")
        }
        raw(base + x) = ((raw(base + x) & 0xff) + add).toByte
        x += 1
      }
      y += 1
    }
    // project to the RGB output contract
    val out = new Array[Byte](ihdr.w * ihdr.h * 3)
    var p = 0
    val n = ihdr.w * ihdr.h
    while (p < n) {
      val row = p / ihdr.w
      val src = row * (1 + rowBytes) + 1 + (p % ihdr.w) * ch
      ihdr.colorType match {
        case 0 =>
          val v = raw(src)
          out(3 * p) = v; out(3 * p + 1) = v; out(3 * p + 2) = v
        case 2 | 6 =>
          out(3 * p) = raw(src); out(3 * p + 1) = raw(src + 1)
          out(3 * p + 2) = raw(src + 2)
        case 3 =>
          val idx = raw(src) & 0xff
          if (idx * 3 + 2 >= palette.length)
            fail(s"palette index $idx out of range")
          out(3 * p) = palette(3 * idx); out(3 * p + 1) = palette(3 * idx + 1)
          out(3 * p + 2) = palette(3 * idx + 2)
        case 4 =>
          val v = raw(src)
          out(3 * p) = v; out(3 * p + 1) = v; out(3 * p + 2) = v
      }
      p += 1
    }
    (ihdr.w, ihdr.h, out)
  }

  /** Structural stream metadata from the CRC-checked chunk walk — NO
    * inflate, so it costs header+CRC instead of pixels ([[Jpeg.meta]]'s
    * crawl pre-gate pattern). Unlike decode, meta REPORTS interlace and
    * 16-bit depth instead of refusing — that is the cost-routing signal
    * a pre-decode gate exists to read — so has-metadata ⊇ decodable
    * holds structurally. `idat_bytes` is the compressed payload census
    * (a 1×1 tracking pixel and a 20 MP photo separate here without a
    * single inflate call). */
  final case class Meta(width: Int, height: Int, bitDepth: Int,
      colorType: Int, interlaced: Boolean, nChunks: Int, idatBytes: Long,
      paletteSize: Int, hasAlpha: Boolean)

  def meta(bytes: Array[Byte]): Meta = {
    val chunks = walkChunks(bytes)
    val ihdr = parseIhdr(bytes, chunks.head)
    val paletteSize = chunks.find(_.typ == "PLTE")
      .map(c => (c.end - c.start) / 3).getOrElse(0)
    val idats = chunks.filter(_.typ == "IDAT")
    if (idats.isEmpty) fail("no IDAT")
    val idatBytes = idats.map(c => (c.end - c.start).toLong).sum
    Meta(ihdr.w, ihdr.h, ihdr.bitDepth, ihdr.colorType,
      ihdr.interlace == 1, chunks.length, idatBytes, paletteSize,
      hasAlpha = ihdr.colorType == 4 || ihdr.colorType == 6 ||
        chunks.exists(_.typ == "tRNS"))
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

  /** Forward-filter `samples` (channels-interleaved rows) with the
    * caller's per-row filter choice, deflate, and frame the chunks.
    * `filterOf(y)` ∈ 0..4 — gate fixtures cycle it so every defilter
    * path is exercised on the wire. `idatChunkSize` splits the zlib
    * stream across IDAT chunks (multi-IDAT is the common wild shape). */
  private def encodeRaw(w: Int, h: Int, colorType: Int,
      samples: Array[Byte], palette: Array[Byte], filterOf: Int => Int,
      idatChunkSize: Int): Array[Byte] = {
    val ch = channelsOf(colorType)
    require(samples.length == w * h * ch,
      s"samples ${samples.length} != ${w * h * ch}")
    val rowBytes = w * ch
    val raw = new Array[Byte](h * (1 + rowBytes))
    var y = 0
    while (y < h) {
      val ft = filterOf(y)
      require(ft >= 0 && ft <= 4, s"bad filter type $ft")
      val base = y * (1 + rowBytes)
      raw(base) = ft.toByte
      var x = 0
      while (x < rowBytes) {
        val cur = samples(y * rowBytes + x) & 0xff
        val a = if (x >= ch) samples(y * rowBytes + x - ch) & 0xff else 0
        val b = if (y > 0) samples((y - 1) * rowBytes + x) & 0xff else 0
        val c = if (y > 0 && x >= ch) samples((y - 1) * rowBytes + x - ch) & 0xff else 0
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
        raw(base + 1 + x) = (cur - pred).toByte
        x += 1
      }
      y += 1
    }
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
    ihdr(12) = 0
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

  /** Truecolour (type 2) from an RGB raster. */
  def encode(w: Int, h: Int, rgb: Array[Byte],
      filterOf: Int => Int = _ => 0, idatChunkSize: Int = 8192): Array[Byte] =
    encodeRaw(w, h, 2, rgb, null, filterOf, idatChunkSize)

  /** Grayscale (type 0). */
  def encodeGray(w: Int, h: Int, gray: Array[Byte],
      filterOf: Int => Int = _ => 0, idatChunkSize: Int = 8192): Array[Byte] =
    encodeRaw(w, h, 0, gray, null, filterOf, idatChunkSize)

  /** Indexed (type 3, depth 8): `palette` is 3·n RGB bytes, `idx` one
    * palette index per pixel. */
  def encodePalette(w: Int, h: Int, palette: Array[Byte], idx: Array[Byte],
      filterOf: Int => Int = _ => 0, idatChunkSize: Int = 8192): Array[Byte] = {
    require(palette.length % 3 == 0 && palette.length > 0 &&
      palette.length <= 768, s"bad palette length ${palette.length}")
    encodeRaw(w, h, 3, idx, palette, filterOf, idatChunkSize)
  }

  /** Truecolour+alpha (type 6) from an RGBA raster. */
  def encodeRgba(w: Int, h: Int, rgba: Array[Byte],
      filterOf: Int => Int = _ => 0, idatChunkSize: Int = 8192): Array[Byte] =
    encodeRaw(w, h, 6, rgba, null, filterOf, idatChunkSize)

  /** Grayscale+alpha (type 4) from a GA-interleaved plane. */
  def encodeGrayAlpha(w: Int, h: Int, ga: Array[Byte],
      filterOf: Int => Int = _ => 0, idatChunkSize: Int = 8192): Array[Byte] =
    encodeRaw(w, h, 4, ga, null, filterOf, idatChunkSize)
}
