package graft.ops

/** WebP container walker + lossless decode entry (rounds 17-18).
  * The decodeless [[meta]] walk ([[Jpeg.meta]]'s pattern) carries the
  * crawl filter/group columns at header cost: RIFF framing, the
  * `VP8 ` lossy frame tag (0x9D012A start code + 14-bit dims), the
  * `VP8L` lossless signature (0x2F + packed 14-bit dims + alpha bit),
  * and the `VP8X` extended header (flag byte + 24-bit canvas dims,
  * ANMF frame census for animations). Chunk sizes must chain exactly
  * (with RIFF even-padding), so truncation refuses loudly.
  *
  * PIXEL decode (round 18): LOSSLESS streams decode for real through
  * the from-spec [[Vp8l]] codec — [[decode]] for stills (and an
  * animation's composited first frame), [[frames]] for full ANMF
  * animations riding the video-bridge matcher. LOSSY `VP8 ` payloads
  * keep refusing loudly (VP8 entropy coding is codec-library
  * territory, the MP3/H.264 boundary): their blobs keep exact dedup
  * through the undecodable route — the documented routing discipline
  * for every format without a pixel decoder. */
object Webp {
  private def fail(msg: String): Nothing =
    throw new IllegalArgumentException(s"webp: $msg")

  def isWebp(bytes: Array[Byte]): Boolean =
    bytes.length >= 12 && bytes(0) == 'R' && bytes(1) == 'I' &&
      bytes(2) == 'F' && bytes(3) == 'F' && bytes(8) == 'W' &&
      bytes(9) == 'E' && bytes(10) == 'B' && bytes(11) == 'P'

  /** `totalDurationMs` is the ANMF duration census (−1 for stills) —
    * the decodeless animation-length axis the unified pre-pass reads
    * (round 18: the [[Gif.meta]] totalDelayCs convention). */
  final case class Meta(width: Int, height: Int, format: String,
      hasAlpha: Boolean, animated: Boolean, nFrames: Int, nChunks: Int,
      totalDurationMs: Long = -1L)

  def meta(bytes: Array[Byte]): Meta = {
    if (!isWebp(bytes)) fail("not a webp stream (bad RIFF/WEBP header)")
    def u24le(o: Int): Int = (bytes(o) & 0xff) | ((bytes(o + 1) & 0xff) << 8) |
      ((bytes(o + 2) & 0xff) << 16)
    def u32le(o: Int): Long = (u24le(o) & 0xffffffL) | ((bytes(o + 3) & 0xffL) << 24)
    val riffLen = u32le(4)
    if (8 + riffLen != bytes.length)
      fail(s"RIFF length $riffLen does not match the stream")
    var pos = 12
    var format = ""
    var w = -1; var h = -1
    var alpha = false
    var animated = false
    var nFrames = 0
    var nChunks = 0
    var totalDurMs = 0L
    while (pos < bytes.length) {
      if (pos + 8 > bytes.length) fail("truncated chunk header")
      val typ = new String(bytes, pos, 4, "ISO-8859-1")
      val size = u32le(pos + 4)
      val dataStart = pos + 8
      if (dataStart + size > bytes.length) fail(s"truncated $typ chunk")
      nChunks += 1
      typ match {
        case "VP8 " =>
          if (size < 10) fail("VP8 chunk too short")
          // 3-byte frame tag, then the 0x9D012A start code, then dims
          if ((bytes(dataStart + 3) & 0xff) != 0x9d ||
              (bytes(dataStart + 4) & 0xff) != 0x01 ||
              (bytes(dataStart + 5) & 0xff) != 0x2a)
            fail("VP8 start code missing")
          val keyframe = (bytes(dataStart) & 1) == 0
          if (!keyframe) fail("first VP8 frame is not a keyframe")
          if (format.isEmpty) format = "lossy"
          val wv = ((bytes(dataStart + 6) & 0xff) |
            ((bytes(dataStart + 7) & 0xff) << 8)) & 0x3fff
          val hv = ((bytes(dataStart + 8) & 0xff) |
            ((bytes(dataStart + 9) & 0xff) << 8)) & 0x3fff
          if (w < 0) { w = wv; h = hv }
          nFrames += 1
        case "VP8L" =>
          if (size < 5) fail("VP8L chunk too short")
          if ((bytes(dataStart) & 0xff) != 0x2f) fail("VP8L signature missing")
          val b = u32le(dataStart + 1)
          if (format.isEmpty) format = "lossless"
          if (w < 0) {
            w = ((b & 0x3fff) + 1).toInt
            h = (((b >> 14) & 0x3fff) + 1).toInt
          }
          if (((b >> 28) & 1) == 1) alpha = true
          nFrames += 1
        case "VP8X" =>
          if (size < 10) fail("VP8X chunk too short")
          format = "extended"
          val flags = bytes(dataStart) & 0xff
          if ((flags & 0x10) != 0) alpha = true
          if ((flags & 0x02) != 0) animated = true
          w = u24le(dataStart + 4) + 1
          h = u24le(dataStart + 7) + 1
        case "ANMF" =>
          if (size < 16) fail("ANMF chunk too short")
          nFrames += 1
          totalDurMs += u24le(dataStart + 12)
        case "ALPH" => alpha = true
        case _ => () // ICCP/EXIF/XMP/unknown: structural skip
      }
      pos = dataStart + size.toInt + (size.toInt & 1) // RIFF even padding
    }
    if (format.isEmpty) fail("no VP8 /VP8L/VP8X chunk")
    if (w <= 0 || h <= 0) fail("no dimensions")
    if (animated && nFrames == 0) fail("animated VP8X without ANMF frames")
    Meta(w, h, format, alpha, animated, math.max(nFrames, 1), nChunks,
      if (animated) totalDurMs else -1L)
  }

  /** Pixel decode (round 18): LOSSLESS (VP8L) streams decode for real
    * through the from-spec [[Vp8l]] codec — simple `VP8L` files and
    * extended (`VP8X`) containers whose still image is a VP8L chunk.
    * Returns (w, h, RGB raster), alpha dropped (the [[Png.decode]]
    * convention). Animated containers decode their composited FIRST
    * frame (the [[Gif.decode]] convention — full animations ride
    * [[frames]] and the video bridge). Lossy `VP8 ` payloads keep
    * REFUSING loudly (the MP3/H.264 codec boundary) and keep exact
    * dedup through the undecodable route. */
  def decode(bytes: Array[Byte]): (Int, Int, Array[Byte]) = {
    if (!isWebp(bytes)) fail("not a webp stream (bad RIFF/WEBP header)")
    val md = meta(bytes) // the strict container walk (sizes must chain)
    if (md.animated) {
      // composited FIRST frame (the Gif.decode convention); later ANMF
      // payloads are never decoded
      val (w, h, fs) = frames(bytes, maxFrames = 1)
      if (fs.isEmpty) fail("animated webp decoded no frame")
      return (w, h, fs.head._2)
    }
    def u32le(o: Int): Long =
      (bytes(o) & 0xffL) | ((bytes(o + 1) & 0xffL) << 8) |
        ((bytes(o + 2) & 0xffL) << 16) | ((bytes(o + 3) & 0xffL) << 24)
    var pos = 12
    while (pos < bytes.length) {
      val typ = new String(bytes, pos, 4, "ISO-8859-1")
      val size = u32le(pos + 4).toInt
      if (typ == "VP8L") {
        val (w, h, _, argb) = Vp8l.decode(bytes, pos + 8, size)
        // a VP8X container declares canvas dims independently of its
        // still VP8L sub-chunk — a mismatched container must not hand
        // meta one geometry and decode another (round 19, advisor;
        // mirrors the ANMF rect == VP8L dims check on the animated
        // path). Simple VP8L files derive md from this same header, so
        // the check is a no-op there.
        if (w != md.width || h != md.height) fail(
          s"VP8L dims $w x $h disagree with container dims " +
            s"${md.width} x ${md.height}")
        val rgb = new Array[Byte](w * h * 3)
        var i = 0
        while (i < w * h) {
          val p = argb(i)
          rgb(3 * i) = ((p >> 16) & 0xff).toByte
          rgb(3 * i + 1) = ((p >> 8) & 0xff).toByte
          rgb(3 * i + 2) = (p & 0xff).toByte
          i += 1
        }
        return (w, h, rgb)
      }
      if (typ == "VP8 ") fail(
        "lossy VP8 pixel decode out of scope (codec territory) — " +
          "metadata via Webp.meta")
      pos = pos + 8 + size + (size & 1)
    }
    fail("no decodable image chunk")
  }

  /** REAL lossless fixture writer: ARGB pixels through the from-spec
    * [[Vp8l]] encoder, RIFF-wrapped. */
  def encodeVp8lPixels(w: Int, h: Int, argb: Array[Int],
      opts: Vp8l.EncOptions = Vp8l.EncOptions()): Array[Byte] =
    wrap(chunk("VP8L", Vp8l.encode(w, h, argb, opts)))

  /** ANIMATED WebP frame decode (round 18) — the [[Gif.frames]] /
    * [[Png.frames]] contract on the VP8X/ANMF container, so animated
    * WebPs ride the same video-bridge matcher: per-ANMF 16-byte frame
    * header (x/y in 2-pixel units, dims −1, 24-bit duration, the
    * blend/dispose flag byte), the frame raster from its embedded
    * `VP8L` sub-chunk through the from-spec [[Vp8l]] decoder,
    * composited onto a transparent canvas (no-blend = overwrite;
    * alpha-blend = OVER; dispose-to-background clears the frame rect).
    * Lossy `VP8 ` frames refuse loudly (the codec boundary). Returns
    * (canvasW, canvasH, frames = (duration_ms, RGB raster)) — NOTE
    * the per-frame time unit is the container's native MILLISECONDS,
    * while [[Gif.frames]]/[[Png.frames]] carry centiseconds (their
    * containers' native unit): the shared video-bridge contract is
    * the FRAME SEQUENCE (only rasters are hashed); any consumer
    * comparing delays across formats must normalize units first.
    * `maxFrames` caps the DECODED prefix (the [[Gif.frames]]
    * convention): past it, ANMF headers are still bounds-checked but
    * their VP8L payloads never decode. */
  def frames(bytes: Array[Byte],
      maxFrames: Int = Int.MaxValue): (Int, Int, Seq[(Int, Array[Byte])]) = {
    val md = meta(bytes) // strict container walk first
    if (!md.animated) {
      val (w, h, rgb) = decode(bytes)
      return (w, h, Seq((0, rgb)))
    }
    def u24le(o: Int): Int = (bytes(o) & 0xff) | ((bytes(o + 1) & 0xff) << 8) |
      ((bytes(o + 2) & 0xff) << 16)
    def u32le(o: Int): Long = (u24le(o) & 0xffffffL) |
      ((bytes(o + 3) & 0xffL) << 24)
    val cw = md.width; val chh = md.height
    if (cw.toLong * chh * 4 >= Int.MaxValue) fail(s"canvas too large $cw x $chh")
    val canvas = new Array[Byte](cw * chh * 3)
    val canvasA = new Array[Byte](cw * chh)
    val out = Seq.newBuilder[(Int, Array[Byte])]
    var nEmitted = 0
    var nSeen = 0
    var pos = 12
    while (pos < bytes.length) {
      val typ = new String(bytes, pos, 4, "ISO-8859-1")
      val size = u32le(pos + 4).toInt
      val d = pos + 8
      if (typ == "ANMF") {
        if (size < 16 + 8) fail("ANMF frame too short")
        val fx = u24le(d) * 2 // 2-pixel units per spec
        val fy = u24le(d + 3) * 2
        val fw = u24le(d + 6) + 1
        val fh = u24le(d + 9) + 1
        val dur = u24le(d + 12)
        val flags = bytes(d + 15) & 0xff
        val dispose = flags & 1
        val noBlend = (flags & 2) != 0
        if (fx + fw > cw || fy + fh > chh)
          fail(s"frame rect ($fx,$fy ${fw}x$fh) outside the canvas")
        if (nEmitted >= maxFrames) {
          // past the decode cap: the header stays validated above, the
          // VP8L payload never decodes (the Gif.frames discipline)
        } else {
        // the frame's image sub-chunk (skip an optional ALPH)
        var sp = d + 16
        var argb: Array[Int] = null
        while (sp < d + size && argb == null) {
          val st = new String(bytes, sp, 4, "ISO-8859-1")
          val ss = u32le(sp + 4).toInt
          st match {
            case "VP8L" =>
              val (vw, vh, _, px) = Vp8l.decode(bytes, sp + 8, ss)
              if (vw != fw || vh != fh)
                fail(s"VP8L frame ${vw}x$vh != ANMF rect ${fw}x$fh")
              argb = px
            case "VP8 " => fail(
              "lossy VP8 animation frames out of scope (codec territory)")
            case _ => () // ALPH/unknown: structural skip
          }
          sp = sp + 8 + ss + (ss & 1)
        }
        if (argb == null) fail("ANMF frame without an image sub-chunk")
        var j = 0
        while (j < fh) {
          var i = 0
          while (i < fw) {
            val p = argb(j * fw + i)
            val sa = p >>> 24
            val dst = (fy + j) * cw + (fx + i)
            if (noBlend || sa == 255) {
              canvas(3 * dst) = ((p >> 16) & 0xff).toByte
              canvas(3 * dst + 1) = ((p >> 8) & 0xff).toByte
              canvas(3 * dst + 2) = (p & 0xff).toByte
              canvasA(dst) = sa.toByte
            } else if (sa > 0) {
              // alpha-blend with the DESTINATION alpha (the Png.frames
              // OVER formula): over a transparent canvas pixel the
              // source lands exactly
              val da = canvasA(dst) & 0xff
              val u = sa
              val v = da * (255 - sa) / 255
              val outA = u + v
              var ci = 0
              while (ci < 3) {
                val s = (p >> (16 - 8 * ci)) & 0xff
                val dv = canvas(3 * dst + ci) & 0xff
                canvas(3 * dst + ci) = ((s * u + dv * v) / outA).toByte
                ci += 1
              }
              canvasA(dst) = outA.toByte
            }
            i += 1
          }
          j += 1
        }
        out += ((dur, java.util.Arrays.copyOf(canvas, canvas.length)))
        nEmitted += 1
        if (dispose == 1) {
          var jj = 0
          while (jj < fh) {
            var ii = 0
            while (ii < fw) {
              val dst = (fy + jj) * cw + (fx + ii)
              canvas(3 * dst) = 0; canvas(3 * dst + 1) = 0
              canvas(3 * dst + 2) = 0; canvasA(dst) = 0
              ii += 1
            }
            jj += 1
          }
        }
        }
        nSeen += 1
      }
      pos = d + size + (size & 1)
    }
    if (nSeen == 0) fail("animated webp with no ANMF frames")
    (cw, chh, out.result())
  }

  /** One advanced animated-WebP fixture frame: an ARGB sub-rect with
    * explicit blend/dispose flags (x/y must be EVEN — the container
    * stores them in 2-pixel units). */
  final case class AwebpFrame(argb: Array[Int], x: Int = 0, y: Int = 0,
      w: Int = -1, h: Int = -1, durMs: Int = 40,
      alphaBlend: Boolean = false, disposeBackground: Boolean = false)

  /** Fixture-grade ANIMATED lossless writer: full-canvas VP8L frames
    * (no-blend, no dispose) behind a real VP8X+ANIM header — real
    * entropy-coded pixels per frame through [[Vp8l.encode]]. */
  def encodeAnimatedVp8l(w: Int, h: Int,
      frames: Seq[(Int, Array[Int])],
      opts: Vp8l.EncOptions = Vp8l.EncOptions()): Array[Byte] =
    encodeAnimatedVp8lFrames(w, h,
      frames.map { case (durMs, argb) => AwebpFrame(argb, durMs = durMs) },
      opts)

  /** The sub-rect/blend/dispose form — the [[Png.encodeApngRgba]]
    * sibling, so the animated-WebP compositing paths are testable. */
  def encodeAnimatedVp8lFrames(w: Int, h: Int, frames: Seq[AwebpFrame],
      opts: Vp8l.EncOptions = Vp8l.EncOptions()): Array[Byte] = {
    require(frames.nonEmpty, "need at least one frame")
    val vp8x = new Array[Byte](10)
    vp8x(0) = 0x02 // animated
    put24rel(vp8x, 4, w - 1); put24rel(vp8x, 7, h - 1)
    val anim = new Array[Byte](6) // background 0, loop forever
    val parts = Seq.newBuilder[Array[Byte]]
    parts += chunk("VP8X", vp8x)
    parts += chunk("ANIM", anim)
    frames.foreach { f =>
      val fw = if (f.w < 0) w else f.w
      val fh = if (f.h < 0) h else f.h
      require(f.argb.length == fw * fh, "frame raster size mismatch")
      require(f.x % 2 == 0 && f.y % 2 == 0, "offsets are in 2-pixel units")
      val payload = Vp8l.encode(fw, fh, f.argb, opts)
      val hdr = new Array[Byte](16)
      put24rel(hdr, 0, f.x / 2); put24rel(hdr, 3, f.y / 2)
      put24rel(hdr, 6, fw - 1); put24rel(hdr, 9, fh - 1)
      put24rel(hdr, 12, f.durMs)
      hdr(15) = ((if (f.alphaBlend) 0 else 2) |
        (if (f.disposeBackground) 1 else 0)).toByte
      parts += chunk("ANMF", hdr ++ chunk("VP8L", payload))
    }
    wrap(parts.result().reduce(_ ++ _))
  }

  // ---- fixture-grade writer (headers only — the payload past the
  // dimension fields is deterministic junk the walker never reads) ----

  private def chunk(typ: String, payload: Array[Byte]): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream(payload.length + 8)
    out.write(typ.getBytes("ISO-8859-1"), 0, 4)
    var v = payload.length.toLong
    for (i <- 0 until 4) { out.write((v & 0xff).toInt); v >>= 8 }
    out.write(payload, 0, payload.length)
    if (payload.length % 2 == 1) out.write(0) // RIFF even padding
    out.toByteArray
  }

  /** A structurally-valid lossy (`VP8 `) stream. */
  def encodeLossy(w: Int, h: Int, payloadLen: Int = 16,
      seed: Long = 0L): Array[Byte] = {
    require(w > 0 && w < 16384 && h > 0 && h < 16384, s"14-bit dims: $w x $h")
    val p = new Array[Byte](10 + payloadLen)
    p(0) = 0 // keyframe tag bits
    p(3) = 0x9d.toByte; p(4) = 0x01; p(5) = 0x2a
    p(6) = (w & 0xff).toByte; p(7) = ((w >> 8) & 0x3f).toByte
    p(8) = (h & 0xff).toByte; p(9) = ((h >> 8) & 0x3f).toByte
    for (i <- 0 until payloadLen) p(10 + i) = ((seed * 31 + i) & 0xff).toByte
    wrap(chunk("VP8 ", p))
  }

  /** A structurally-valid lossless (`VP8L`) stream. */
  def encodeLossless(w: Int, h: Int, alphaHint: Boolean = false,
      payloadLen: Int = 12, seed: Long = 0L): Array[Byte] = {
    require(w > 0 && w <= 16384 && h > 0 && h <= 16384, s"14-bit dims: $w x $h")
    val p = new Array[Byte](5 + payloadLen)
    p(0) = 0x2f
    val b = (w - 1).toLong | ((h - 1).toLong << 14) |
      (if (alphaHint) 1L << 28 else 0L)
    for (i <- 0 until 4) p(1 + i) = ((b >> (8 * i)) & 0xff).toByte
    for (i <- 0 until payloadLen) p(5 + i) = ((seed * 37 + i) & 0xff).toByte
    wrap(chunk("VP8L", p))
  }

  /** A structurally-valid extended (`VP8X`) stream, optionally animated
    * with `nFrames` ANMF entries carrying REAL 16-byte frame headers
    * (each `frameDurMs` long — the meta duration census reads them)
    * over junk image payloads. */
  def encodeExtended(w: Int, h: Int, alpha: Boolean = false,
      nFrames: Int = 0, seed: Long = 0L, frameDurMs: Int = 40): Array[Byte] = {
    require(w > 0 && w <= (1 << 24) && h > 0 && h <= (1 << 24), s"$w x $h")
    val p = new Array[Byte](10)
    p(0) = (((if (alpha) 0x10 else 0) | (if (nFrames > 0) 0x02 else 0))).toByte
    def put24(o: Int, v: Int): Unit = {
      p(o) = (v & 0xff).toByte; p(o + 1) = ((v >> 8) & 0xff).toByte
      p(o + 2) = ((v >> 16) & 0xff).toByte
    }
    put24(4, w - 1); put24(7, h - 1)
    val parts = Seq.newBuilder[Array[Byte]]
    parts += chunk("VP8X", p)
    if (nFrames == 0) parts += chunk("VP8 ", {
      val q = new Array[Byte](12)
      q(3) = 0x9d.toByte; q(4) = 0x01; q(5) = 0x2a
      q(6) = (w & 0xff).toByte; q(7) = ((w >> 8) & 0x3f).toByte
      q(8) = (h & 0xff).toByte; q(9) = ((h >> 8) & 0x3f).toByte
      q
    })
    for (f <- 0 until nFrames) {
      val hdr = new Array[Byte](16)
      put24rel(hdr, 6, w - 1); put24rel(hdr, 9, h - 1)
      put24rel(hdr, 12, frameDurMs)
      hdr(15) = 0x02 // no blend, dispose none
      parts += chunk("ANMF", hdr ++
        Array.tabulate(8)(i => ((seed * 13 + f * 7 + i) & 0xff).toByte))
    }
    wrap(parts.result().reduce(_ ++ _))
  }

  private def put24rel(b: Array[Byte], o: Int, v: Int): Unit = {
    b(o) = (v & 0xff).toByte; b(o + 1) = ((v >> 8) & 0xff).toByte
    b(o + 2) = ((v >> 16) & 0xff).toByte
  }

  /** A VP8X-wrapped STILL lossless image (real VP8L pixels behind the
    * extended header — the alpha/ICC-profile container shape real
    * encoders emit for stills with features). */
  def encodeVp8xVp8l(w: Int, h: Int, argb: Array[Int],
      opts: Vp8l.EncOptions = Vp8l.EncOptions()): Array[Byte] = {
    val vp8x = new Array[Byte](10)
    put24rel(vp8x, 4, w - 1); put24rel(vp8x, 7, h - 1)
    wrap(chunk("VP8X", vp8x) ++ chunk("VP8L", Vp8l.encode(w, h, argb, opts)))
  }

  private def wrap(body: Array[Byte]): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream(body.length + 12)
    out.write("RIFF".getBytes("ISO-8859-1"), 0, 4)
    var v = (body.length + 4).toLong
    for (i <- 0 until 4) { out.write((v & 0xff).toInt); v >>= 8 }
    out.write("WEBP".getBytes("ISO-8859-1"), 0, 4)
    out.write(body, 0, body.length)
    out.toByteArray
  }
}
