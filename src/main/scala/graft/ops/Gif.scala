package graft.ops

/** From-spec GIF codec (the public GIF87a/GIF89a specification,
  * round 17) — the third big crawl image format after JPEG/PNG, and the
  * bridge between the image and video modalities: an animated GIF is a
  * frame sequence, so its composited frames can ride the SAME
  * frame-hash dedup stack as real video containers.
  *
  * Scope:
  *  - decode: full LZW (variable code width, dictionary growth to 4096,
  *    CLEAR/EOI codes, the KwKwK self-reference case, deferred clears),
  *    global and local colour tables, GIF interlace (the four-pass row
  *    order), 89a graphic-control extensions (transparency index,
  *    frame delays, disposal methods 0-3 including restore-to-previous),
  *    full-canvas frame COMPOSITING for animations. [[decode]] returns
  *    the composited FIRST frame in the
  *    [[Multimodal.Ppm]]/[[Jpeg]]/[[Png]] (w, h, RGB) contract;
  *    [[frames]] returns every composited frame with its delay.
  *    Truncation, bad LZW streams, and missing colour tables refuse
  *    LOUDLY (DROPMALFORMED bookkeeping stays deterministic).
  *  - meta: a DECODELESS block walk ([[Jpeg.meta]]'s pattern) — canvas
  *    geometry, version, frame census, animation flag, transparency,
  *    palette sizes — by SKIPPING the LZW sub-blocks (length-prefixed,
  *    so the census costs I/O only, never a decode).
  *  - encode: fixture-grade writer (single- or multi-frame, optional
  *    interlace, optional transparency) using the classic
  *    fixed-width-LZW form: a CLEAR code re-emitted before the
  *    dictionary would widen the code — spec-legal output every
  *    decoder accepts, trivially analytic for oracles.
  *
  * Everything is implemented from the public spec text; DEFLATE-style
  * external libs are not involved (LZW here is self-contained).
  */
object Gif {
  private def fail(msg: String): Nothing =
    throw new IllegalArgumentException(s"gif: $msg")

  def isGif(bytes: Array[Byte]): Boolean =
    bytes.length >= 6 && bytes(0) == 'G' && bytes(1) == 'I' &&
      bytes(2) == 'F' && bytes(3) == '8' &&
      (bytes(4) == '7' || bytes(4) == '9') && bytes(5) == 'a'

  private final class Reader(bytes: Array[Byte]) {
    var pos = 0
    def u8(): Int = {
      if (pos >= bytes.length) fail("truncated stream")
      val v = bytes(pos) & 0xff; pos += 1; v
    }
    def u16le(): Int = { val lo = u8(); lo | (u8() << 8) }
    def take(n: Int): Int = { // returns start offset
      if (pos + n > bytes.length) fail("truncated stream")
      val s = pos; pos += n; s
    }
    /** Skip a sub-block chain; returns total payload length. */
    def skipSubBlocks(): Int = {
      var total = 0
      var n = u8()
      while (n != 0) { take(n); total += n; n = u8() }
      total
    }
    /** Concatenate a sub-block chain. */
    def readSubBlocks(): Array[Byte] = {
      val out = new java.io.ByteArrayOutputStream()
      var n = u8()
      while (n != 0) {
        val s = take(n)
        out.write(bytes, s, n)
        n = u8()
      }
      out.toByteArray
    }
  }

  /** LZW decode (spec appendix): codes packed LSB-first, width grows
    * with the dictionary (max 12 bits / 4096 entries), CLEAR resets,
    * EOI terminates. `expected` pixels must be produced exactly. */
  private def lzwDecode(data: Array[Byte], minCodeSize: Int,
      expected: Int): Array[Byte] = {
    if (minCodeSize < 2 || minCodeSize > 8) fail(s"bad LZW code size $minCodeSize")
    val clear = 1 << minCodeSize
    val eoi = clear + 1
    val out = new Array[Byte](expected)
    var outPos = 0
    // dictionary as prefix links: suffix byte + prefix code
    val prefix = new Array[Int](4096)
    val suffix = new Array[Byte](4096)
    var next = eoi + 1
    var width = minCodeSize + 1
    var prev = -1
    var acc = 0L
    var nBits = 0
    var i = 0
    val buf = new Array[Byte](4096)
    def emit(code: Int): Byte = { // writes the code's string, returns first byte
      var c = code
      var n = 0
      while (c >= clear) { buf(n) = suffix(c); n += 1; c = prefix(c) }
      val first = c.toByte
      if (outPos + n + 1 > expected) fail("LZW produces more pixels than the frame declares")
      out(outPos) = first; outPos += 1
      var j = n - 1
      while (j >= 0) { out(outPos) = buf(j); outPos += 1; j -= 1 }
      first
    }
    var done = false
    while (!done) {
      while (nBits < width && i < data.length) {
        acc |= (data(i) & 0xffL) << nBits
        nBits += 8; i += 1
      }
      if (nBits < width) fail("truncated LZW stream")
      val code = (acc & ((1 << width) - 1)).toInt
      acc >>>= width; nBits -= width
      if (code == clear) {
        next = eoi + 1; width = minCodeSize + 1; prev = -1
      } else if (code == eoi) {
        done = true
      } else if (prev < 0) {
        if (code >= clear) fail("first LZW code after clear is not a literal")
        emit(code)
        prev = code
      } else {
        if (code > next || code >= 4096)
          fail(s"LZW code $code beyond dictionary")
        val first =
          if (code < next) emit(code)
          else { // KwKwK: code == next — the string is prev + first(prev)
            val f = emit(prev)
            if (outPos + 1 > expected)
              fail("LZW produces more pixels than the frame declares")
            out(outPos) = f; outPos += 1
            f
          }
        if (next < 4096) {
          prefix(next) = prev; suffix(next) = first; next += 1
        }
        if (next < 4096 && next == (1 << width) && width < 12) width += 1
        prev = code
      }
      if (outPos == expected && !done) {
        // spec-legal streams end with EOI; accept a missing one only at
        // the exact pixel count (common in the wild), but anything
        // BEYOND is a desync handled in emit
        while (nBits < width && i < data.length) {
          acc |= (data(i) & 0xffL) << nBits; nBits += 8; i += 1
        }
        if (nBits >= width) {
          val tail = (acc & ((1 << width) - 1)).toInt
          if (tail == eoi || tail == clear) done = true
          else fail("LZW continues past the declared pixel count")
        } else done = true
      }
    }
    if (outPos != expected)
      fail(s"LZW produced $outPos of $expected pixels")
    out
  }

  /** The GIF interlace row order (spec: passes at 8/8, 8/8+4, 4/2, 2/1). */
  private def deinterlace(idx: Array[Byte], w: Int, h: Int): Array[Byte] = {
    val out = new Array[Byte](idx.length)
    var src = 0
    for ((start, step) <- Seq((0, 8), (4, 8), (2, 4), (1, 2))) {
      var y = start
      while (y < h) {
        System.arraycopy(idx, src, out, y * w, w)
        src += w
        y += step
      }
    }
    out
  }

  private final case class Frame(delayCs: Int, raster: Array[Byte])

  /** Decode every frame, composited onto the logical canvas per the
    * 89a disposal semantics. Returns (canvasW, canvasH,
    * frames = (delay_cs, RGB raster)).
    *
    * `maxFrames` caps the DECODED prefix (round 18, advisor): once the
    * cap is emitted the remaining blocks are only structurally walked
    * (the [[meta]] skip — rects, colour tables, LZW code-size bounds,
    * trailer), never LZW-decoded or composited, so a first-frame
    * consumer ([[decode]] → the m_gif gate, [[Multimodal.decodeAnyImages]])
    * does not pay full animation decode per blob. Skipped frames'
    * LZW PAYLOADS are deliberately not validated — exactly the
    * meta/decode guard-parity boundary. */
  def frames(bytes: Array[Byte],
      maxFrames: Int = Int.MaxValue): (Int, Int, Seq[(Int, Array[Byte])]) = {
    if (!isGif(bytes)) fail("not a gif stream (bad signature)")
    val r = new Reader(bytes)
    r.take(6)
    val w = r.u16le(); val h = r.u16le()
    if (w <= 0 || h <= 0) fail(s"bad canvas $w x $h")
    if (w.toLong * h * 3 >= Int.MaxValue) fail(s"canvas too large $w x $h")
    val packed = r.u8()
    val bgIndex = r.u8()
    r.u8() // aspect
    val gct: Array[Byte] =
      if ((packed & 0x80) != 0) {
        val n = 2 << (packed & 7)
        val s = r.take(n * 3)
        java.util.Arrays.copyOfRange(bytes, s, s + n * 3)
      } else null
    // canvas as palette-resolved RGB; spec background behaviour in the
    // wild is "transparent/black" — use the background colour when a
    // GCT exists, black otherwise
    val canvas = new Array[Byte](w * h * 3)
    if (gct != null && bgIndex * 3 + 2 < gct.length) {
      var p = 0
      while (p < w * h) {
        canvas(3 * p) = gct(3 * bgIndex)
        canvas(3 * p + 1) = gct(3 * bgIndex + 1)
        canvas(3 * p + 2) = gct(3 * bgIndex + 2)
        p += 1
      }
    }
    val out = Seq.newBuilder[(Int, Array[Byte])]
    var transparentIdx = -1
    var delayCs = 0
    var disposal = 0
    var sawTrailer = false
    var nFrames = 0
    while (!sawTrailer) {
      r.u8() match {
        case 0x3b => sawTrailer = true
        case 0x21 => // extension
          val label = r.u8()
          if (label == 0xf9) { // graphic control
            val sub = r.readSubBlocks()
            if (sub.length < 4) fail("short graphic control extension")
            disposal = (sub(0) >> 2) & 7
            delayCs = (sub(1) & 0xff) | ((sub(2) & 0xff) << 8)
            transparentIdx = if ((sub(0) & 1) != 0) sub(3) & 0xff else -1
          } else r.skipSubBlocks() // comment/app/plain-text: structural skip
        case 0x2c => // image descriptor
          val left = r.u16le(); val top = r.u16le()
          val fw = r.u16le(); val fh = r.u16le()
          if (fw <= 0 || fh <= 0 || left + fw > w || top + fh > h)
            fail(s"frame rect ($left,$top ${fw}x$fh) outside canvas")
          val fp = r.u8()
          val lct: Array[Byte] =
            if ((fp & 0x80) != 0) {
              val n = 2 << (fp & 7)
              val s = r.take(n * 3)
              java.util.Arrays.copyOfRange(bytes, s, s + n * 3)
            } else null
          val interlaced = (fp & 0x40) != 0
          val table = if (lct != null) lct else gct
          if (table == null) fail("frame without any colour table")
          val minCode = r.u8()
          if (nFrames >= maxFrames) {
            // past the decode cap: structural skip (the meta walk's
            // guards), no LZW decode, no composite
            if (minCode < 2 || minCode > 8) fail(s"bad LZW code size $minCode")
            r.skipSubBlocks()
            nFrames += 1
            transparentIdx = -1; delayCs = 0; disposal = 0
          } else {
          val lzw = r.readSubBlocks()
          var idx = lzwDecode(lzw, minCode, fw * fh)
          if (interlaced) idx = deinterlace(idx, fw, fh)
          // disposal 3 restores the canvas AS IT WAS before this frame
          val saved =
            if (disposal == 3) java.util.Arrays.copyOf(canvas, canvas.length)
            else null
          var j = 0
          while (j < fh) {
            var i2 = 0
            while (i2 < fw) {
              val ci = idx(j * fw + i2) & 0xff
              if (ci != transparentIdx) {
                if (ci * 3 + 2 >= table.length)
                  fail(s"colour index $ci outside the table")
                val d = ((top + j) * w + (left + i2)) * 3
                canvas(d) = table(3 * ci)
                canvas(d + 1) = table(3 * ci + 1)
                canvas(d + 2) = table(3 * ci + 2)
              }
              i2 += 1
            }
            j += 1
          }
          out += ((delayCs, java.util.Arrays.copyOf(canvas, canvas.length)))
          nFrames += 1
          // apply disposal AFTER the frame is emitted
          disposal match {
            case 2 => // restore background over the frame rect
              var jj = 0
              while (jj < fh) {
                var ii = 0
                while (ii < fw) {
                  val d = ((top + jj) * w + (left + ii)) * 3
                  if (gct != null && bgIndex * 3 + 2 < gct.length) {
                    canvas(d) = gct(3 * bgIndex)
                    canvas(d + 1) = gct(3 * bgIndex + 1)
                    canvas(d + 2) = gct(3 * bgIndex + 2)
                  } else { canvas(d) = 0; canvas(d + 1) = 0; canvas(d + 2) = 0 }
                  ii += 1
                }
                jj += 1
              }
            case 3 => System.arraycopy(saved, 0, canvas, 0, canvas.length)
            case _ => () // 0/1: leave as drawn
          }
          transparentIdx = -1; delayCs = 0; disposal = 0
          }
        case b => fail(f"unknown block 0x$b%02x")
      }
    }
    if (nFrames == 0) fail("no image data before trailer")
    if (r.pos != bytes.length) fail("trailing bytes after the GIF trailer")
    (w, h, out.result())
  }

  /** Composited FIRST frame — the [[Multimodal.Ppm]]/[[Jpeg]]/[[Png]]
    * (w, h, RGB) decode contract for the image stack. First-frame-only:
    * the remaining animation frames are structurally skipped, not
    * LZW-decoded (see [[frames]]' `maxFrames`) — animation length is
    * not a hidden decode-cost multiplier for the single-image path. */
  def decode(bytes: Array[Byte]): (Int, Int, Array[Byte]) = {
    val (w, h, fs) = frames(bytes, maxFrames = 1)
    (w, h, fs.head._2)
  }

  /** Decodeless structural metadata: the block walk skips every LZW
    * sub-block by its length prefix — frame census, animation flag,
    * transparency, palette geometry at I/O cost, never a decode.
    * Truncation refuses (the walk must reach the trailer). */
  final case class Meta(width: Int, height: Int, version: String,
      nFrames: Int, animated: Boolean, hasTransparency: Boolean,
      gctSize: Int, interlaced: Boolean, totalDelayCs: Int)

  def meta(bytes: Array[Byte]): Meta = {
    if (!isGif(bytes)) fail("not a gif stream (bad signature)")
    val version = new String(bytes, 3, 3, "US-ASCII")
    val r = new Reader(bytes)
    r.take(6)
    val w = r.u16le(); val h = r.u16le()
    if (w <= 0 || h <= 0) fail(s"bad canvas $w x $h")
    val packed = r.u8()
    r.u8(); r.u8()
    val gctSize = if ((packed & 0x80) != 0) 2 << (packed & 7) else 0
    if (gctSize > 0) r.take(gctSize * 3)
    var nFrames = 0
    var hasTransparency = false
    var interlaced = false
    var totalDelay = 0
    var sawTrailer = false
    // the structural guards MIRROR the decoder's (the Jpeg.meta
    // parity discipline from round 16): a header-visible
    // malformation — frame rect outside the canvas, no colour table
    // anywhere, short graphic control, out-of-range LZW code size —
    // must fail the walk too, so "which blobs have metadata" matches
    // "which blobs decode" for everything the walk can see for free.
    // What meta deliberately does NOT validate is the LZW payload.
    while (!sawTrailer) {
      r.u8() match {
        case 0x3b => sawTrailer = true
        case 0x21 =>
          val label = r.u8()
          if (label == 0xf9) {
            val sub = r.readSubBlocks()
            if (sub.length < 4) fail("short graphic control extension")
            if ((sub(0) & 1) != 0) hasTransparency = true
            totalDelay += (sub(1) & 0xff) | ((sub(2) & 0xff) << 8)
          } else r.skipSubBlocks()
        case 0x2c =>
          val left = r.u16le(); val top = r.u16le()
          val fw = r.u16le(); val fh = r.u16le()
          if (fw <= 0 || fh <= 0 || left + fw > w || top + fh > h)
            fail(s"frame rect ($left,$top ${fw}x$fh) outside canvas")
          val fp = r.u8()
          if ((fp & 0x40) != 0) interlaced = true
          if ((fp & 0x80) != 0) r.take((2 << (fp & 7)) * 3)
          else if (gctSize == 0) fail("frame without any colour table")
          val minCode = r.u8()
          if (minCode < 2 || minCode > 8) fail(s"bad LZW code size $minCode")
          r.skipSubBlocks()
          nFrames += 1
        case b => fail(f"unknown block 0x$b%02x")
      }
    }
    if (nFrames == 0) fail("no image data before trailer")
    if (r.pos != bytes.length) fail("trailing bytes after the GIF trailer")
    Meta(w, h, version, nFrames, nFrames > 1, hasTransparency, gctSize,
      interlaced, totalDelay)
  }

  // ---- fixture-grade encoder ----

  /** LZW in the classic fixed-width form: re-emit CLEAR before the
    * dictionary would widen the code past minCodeSize+1 — spec-legal,
    * every decoder accepts it, and the pixel stream stays analytic. */
  private def lzwEncodeFixed(idx: Array[Byte], minCodeSize: Int): Array[Byte] = {
    val clear = 1 << minCodeSize
    val eoi = clear + 1
    val width = minCodeSize + 1
    val resetEvery = math.max(1, (1 << width) - clear - 2)
    val out = new java.io.ByteArrayOutputStream()
    var acc = 0L
    var nBits = 0
    def put(code: Int): Unit = {
      acc |= code.toLong << nBits
      nBits += width
      while (nBits >= 8) { out.write((acc & 0xff).toInt); acc >>>= 8; nBits -= 8 }
    }
    put(clear)
    var i = 0
    while (i < idx.length) {
      put(idx(i) & 0xff)
      i += 1
      if (i % resetEvery == 0 && i < idx.length) put(clear)
    }
    put(eoi)
    if (nBits > 0) out.write((acc & 0xff).toInt)
    out.toByteArray
  }

  private def writeSubBlocks(out: java.io.ByteArrayOutputStream,
      data: Array[Byte]): Unit = {
    var off = 0
    while (off < data.length) {
      val n = math.min(255, data.length - off)
      out.write(n)
      out.write(data, off, n)
      off += n
    }
    out.write(0)
  }

  /** One encoded frame: palette indexes over the full canvas (or a
    * sub-rect), optional per-frame delay/transparency/disposal. */
  final case class EncFrame(idx: Array[Byte], left: Int = 0, top: Int = 0,
      w: Int = -1, h: Int = -1, delayCs: Int = 0, transparentIdx: Int = -1,
      disposal: Int = 0, interlaced: Boolean = false)

  /** Fixture writer: GIF89a when any frame carries control data or
    * `frames.length > 1`, GIF87a otherwise. `palette` is 3·n RGB bytes
    * with n a power of two ≥ 4. */
  def encode(w: Int, h: Int, palette: Array[Byte],
      frames: Seq[EncFrame]): Array[Byte] = {
    require(frames.nonEmpty, "need at least one frame")
    val n = palette.length / 3
    require(palette.length % 3 == 0 && n >= 4 && (n & (n - 1)) == 0 &&
      n <= 256, s"palette size $n must be a power of two in [4,256]")
    val needs89 = frames.length > 1 ||
      frames.exists(f => f.delayCs > 0 || f.transparentIdx >= 0 || f.disposal > 0)
    val out = new java.io.ByteArrayOutputStream()
    out.write((if (needs89) "GIF89a" else "GIF87a").getBytes("US-ASCII"), 0, 6)
    def u16(v: Int): Unit = { out.write(v & 0xff); out.write((v >> 8) & 0xff) }
    u16(w); u16(h)
    val sizeBits = 31 - Integer.numberOfLeadingZeros(n) // log2
    out.write(0x80 | (sizeBits - 1)) // GCT present
    out.write(0) // background index
    out.write(0) // aspect
    out.write(palette, 0, palette.length)
    frames.foreach { f =>
      val fw = if (f.w < 0) w else f.w
      val fh = if (f.h < 0) h else f.h
      require(f.idx.length == fw * fh, s"frame needs $fw*$fh indexes")
      if (needs89) {
        out.write(0x21); out.write(0xf9); out.write(4)
        out.write(((f.disposal & 7) << 2) |
          (if (f.transparentIdx >= 0) 1 else 0))
        u16(f.delayCs)
        out.write(math.max(0, f.transparentIdx))
        out.write(0)
      }
      out.write(0x2c)
      u16(f.left); u16(f.top); u16(fw); u16(fh)
      out.write(if (f.interlaced) 0x40 else 0) // no LCT
      val minCode = math.max(2, sizeBits)
      out.write(minCode)
      val px =
        if (f.interlaced) { // store rows in interlace order
          val re = new Array[Byte](f.idx.length)
          var src = 0
          for ((start, step) <- Seq((0, 8), (4, 8), (2, 4), (1, 2))) {
            var y = start
            while (y < fh) {
              System.arraycopy(f.idx, y * fw, re, src, fw)
              src += fw; y += step
            }
          }
          re
        } else f.idx
      writeSubBlocks(out, lzwEncodeFixed(px, minCode))
    }
    out.write(0x3b)
    out.toByteArray
  }
}
