package graft.ops

/** Decodeless OGG metadata walker (round 18) — the page-walk twin of
  * [[Flac]]: the remaining common crawl audio container. Codec decode
  * stays out of scope; the public Ogg framing (RFC 3533) carries the
  * crawl columns at header cost: per-page capture pattern `OggS`,
  * version 0, header-type flags (continuation/BOS/EOS), 64-bit
  * granule position, serial, sequence number, CRC, and the segment
  * table whose lacing values size the payload exactly.
  *
  * The walk is STRICT: pages must tile the stream exactly (a truncated
  * download refuses), every page CRC is VERIFIED (the PNG-chunk
  * discipline — bit rot refuses before any field is trusted), the
  * first page must carry BOS and the last EOS, sequence numbers must
  * be consecutive, and granule positions non-decreasing (−1 "no
  * packet finishes here" pages excepted). Multiplexed/chained
  * physical streams (a second serial) refuse loudly — the walker
  * covers the single-logical-stream layout that dominates crawls.
  *
  * Duration derives from the terminal granule position and the codec
  * identification header in the BOS page (public codec specs):
  * Vorbis (`\x01vorbis`: granule = PCM samples at the declared rate)
  * and Opus (`OpusHead`: granule at a fixed 48 kHz minus pre-skip).
  * Any other codec still WALKS (page framing is codec-independent)
  * and reports codec `unknown` with −1 duration/rate sentinels — the
  * routing-parity discipline: the pre-pass never drops what it can
  * structurally read, and the gate keeps what it cannot judge. */
object Ogg {
  private def fail(msg: String): Nothing =
    throw new IllegalArgumentException(s"ogg: $msg")

  def isOgg(bytes: Array[Byte]): Boolean =
    bytes.length >= 4 && bytes(0) == 'O' && bytes(1) == 'g' &&
      bytes(2) == 'g' && bytes(3) == 'S'

  // RFC 3533 CRC: poly 0x04c11db7, MSB-first, init 0, no final xor
  private val CrcTable: Array[Int] = Array.tabulate(256) { i =>
    var r = i << 24
    var k = 0
    while (k < 8) {
      r = if ((r & 0x80000000) != 0) (r << 1) ^ 0x04c11db7 else r << 1
      k += 1
    }
    r
  }

  private def crcPage(bytes: Array[Byte], from: Int, until: Int,
      crcOffset: Int): Int = {
    var c = 0
    var i = from
    while (i < until) {
      // the CRC field itself is taken as zero
      val b = if (i >= crcOffset && i < crcOffset + 4) 0 else bytes(i) & 0xff
      c = (c << 8) ^ CrcTable(((c >>> 24) ^ b) & 0xff)
      i += 1
    }
    c
  }

  final case class Meta(codec: String, sampleRate: Int, nChannels: Int,
      nPages: Int, lastGranule: Long, durationMs: Long)

  /** Walk every page header + segment table; payload bytes are read
    * only for the CRC and the BOS identification header. */
  def meta(bytes: Array[Byte]): Meta = {
    if (!isOgg(bytes)) fail("not an ogg stream (bad OggS capture)")
    def u8(o: Int): Int = bytes(o) & 0xff
    def u32le(o: Int): Long =
      (u8(o) | (u8(o + 1) << 8) | (u8(o + 2) << 16)).toLong |
        ((u8(o + 3) & 0xffL) << 24)
    def i64le(o: Int): Long = {
      var v = 0L
      var i = 7
      while (i >= 0) { v = (v << 8) | (u8(o + i) & 0xffL); i -= 1 }
      v
    }
    var pos = 0
    var nPages = 0
    var serial = 0L
    var lastGranule = -1L
    var sawEos = false
    var codec = "unknown"
    var rate = -1
    var ch = -1
    var preSkip = 0
    while (pos < bytes.length) {
      if (sawEos) fail(s"page after the EOS page at $pos")
      if (pos + 27 > bytes.length) fail(s"truncated page header at $pos")
      if (!(bytes(pos) == 'O' && bytes(pos + 1) == 'g' &&
          bytes(pos + 2) == 'g' && bytes(pos + 3) == 'S'))
        fail(s"lost page capture at $pos")
      if (u8(pos + 4) != 0) fail(s"unsupported ogg version ${u8(pos + 4)}")
      val hType = u8(pos + 5)
      val granule = i64le(pos + 6)
      val pSerial = u32le(pos + 14)
      val seq = u32le(pos + 18)
      val nSegs = u8(pos + 26)
      if (pos + 27 + nSegs > bytes.length) fail(s"truncated segment table at $pos")
      var payloadLen = 0
      var s = 0
      while (s < nSegs) { payloadLen += u8(pos + 27 + s); s += 1 }
      val payloadStart = pos + 27 + nSegs
      if (payloadStart + payloadLen > bytes.length)
        fail(s"truncated page payload at $pos")
      val declared = u32le(pos + 22).toInt
      val actual = crcPage(bytes, pos, payloadStart + payloadLen, pos + 22)
      if (declared != actual)
        fail(f"page CRC mismatch at $pos (declared 0x$declared%08x, computed 0x$actual%08x)")
      if (nPages == 0) {
        if ((hType & 2) == 0) fail("first page is not BOS")
        serial = pSerial
        if (seq != 0) fail(s"first page sequence $seq != 0")
        // codec identification header = the BOS page's payload
        if (payloadLen >= 30 && u8(payloadStart) == 1 &&
            new String(bytes, payloadStart + 1, 6, "ISO-8859-1") == "vorbis") {
          if (u32le(payloadStart + 7) != 0L) fail("bad vorbis version")
          codec = "vorbis"
          ch = u8(payloadStart + 11)
          rate = u32le(payloadStart + 12).toInt
          if (rate <= 0) fail("vorbis rate 0 is invalid")
          if (ch == 0) fail("vorbis channels 0 is invalid")
        } else if (payloadLen >= 19 &&
            new String(bytes, payloadStart, 8, "ISO-8859-1") == "OpusHead") {
          codec = "opus"
          ch = u8(payloadStart + 9)
          preSkip = u8(payloadStart + 10) | (u8(payloadStart + 11) << 8)
          // the declared input rate is informational; opus granules
          // tick at a fixed 48 kHz (RFC 7845 §4)
          rate = 48000
          if (ch == 0) fail("opus channels 0 is invalid")
        }
      } else {
        if (pSerial != serial)
          fail("multiplexed/chained stream (second serial) unsupported")
        if (seq != nPages.toLong) fail(s"page sequence $seq != $nPages")
        if (granule != -1L) {
          if (lastGranule != -1L && granule < lastGranule)
            fail(s"granule position regressed at $pos")
        }
      }
      if ((hType & 4) != 0) sawEos = true
      if (granule != -1L) lastGranule = granule
      nPages += 1
      pos = payloadStart + payloadLen
    }
    if (nPages == 0) fail("no pages")
    if (!sawEos) fail("stream does not end with an EOS page")
    val durationMs =
      if (codec == "vorbis" && lastGranule >= 0) lastGranule * 1000L / rate
      else if (codec == "opus" && lastGranule >= 0)
        math.max(0L, lastGranule - preSkip) * 1000L / 48000
      else -1L
    Meta(codec, rate, ch, nPages, lastGranule, durationMs)
  }

  // ---- fixture-grade writer ----

  private def page(hType: Int, granule: Long, serial: Long, seq: Long,
      payload: Array[Byte]): Array[Byte] = {
    require(payload.length <= 255 * 255, "fixture page payload too large")
    val nSegs = payload.length / 255 + 1
    val out = new Array[Byte](27 + nSegs + payload.length)
    out(0) = 'O'; out(1) = 'g'; out(2) = 'g'; out(3) = 'S'
    out(5) = hType.toByte
    var g = granule
    for (i <- 0 until 8) { out(6 + i) = (g & 0xff).toByte; g >>= 8 }
    var v = serial
    for (i <- 0 until 4) { out(14 + i) = (v & 0xff).toByte; v >>= 8 }
    var q = seq
    for (i <- 0 until 4) { out(18 + i) = (q & 0xff).toByte; q >>= 8 }
    out(26) = nSegs.toByte
    var rem = payload.length
    for (s <- 0 until nSegs) {
      out(27 + s) = math.min(255, rem).toByte
      rem -= math.min(255, rem)
    }
    System.arraycopy(payload, 0, out, 27 + nSegs, payload.length)
    val c = crcPage(out, 0, out.length, 22)
    for (i <- 0 until 4) out(22 + i) = ((c >>> (8 * i)) & 0xff).toByte
    out
  }

  /** A structurally-valid single-stream Ogg: a BOS page carrying the
    * codec id header (`vorbis`, `opus`, or an unknown-codec packet),
    * `nAudioPages` junk-payload pages with granules stepping up to
    * `totalSamples`, the last flagged EOS. The walker verifies every
    * CRC, so this writer computes them for real. */
  def encode(codec: String, sampleRate: Int, nChannels: Int,
      totalSamples: Long, nAudioPages: Int = 3, payloadLen: Int = 40,
      serial: Long = 0x777L, seed: Long = 0L): Array[Byte] = {
    require(nAudioPages >= 1, "need at least one audio page")
    val id: Array[Byte] = codec match {
      case "vorbis" =>
        val b = new Array[Byte](30)
        b(0) = 1
        "vorbis".getBytes("US-ASCII").copyToArray(b, 1)
        // version 0 at 7..10
        b(11) = nChannels.toByte
        var r = sampleRate
        for (i <- 0 until 4) { b(12 + i) = (r & 0xff).toByte; r >>= 8 }
        // bitrates 0, blocksizes 2^8/2^8, framing bit
        b(28) = 0x88.toByte; b(29) = 1
        b
      case "opus" =>
        val b = new Array[Byte](19)
        "OpusHead".getBytes("US-ASCII").copyToArray(b, 0)
        b(8) = 1 // version
        b(9) = nChannels.toByte
        b(10) = (312 & 0xff).toByte; b(11) = (312 >> 8).toByte // pre-skip
        var r = sampleRate
        for (i <- 0 until 4) { b(12 + i) = (r & 0xff).toByte; r >>= 8 }
        b
      case _ =>
        Array.tabulate(16)(i => ((seed * 31 + i) & 0xff).toByte)
    }
    val out = new java.io.ByteArrayOutputStream()
    out.write(page(2, 0L, serial, 0L, id)) // BOS
    for (p <- 1 to nAudioPages) {
      val hType = if (p == nAudioPages) 4 else 0 // EOS on the last
      val granule = totalSamples * p / nAudioPages
      val payload = Array.tabulate(payloadLen)(i =>
        ((seed * 37 + p * 11 + i) & 0xff).toByte)
      out.write(page(hType, granule, serial, p.toLong, payload))
    }
    out.toByteArray
  }
}
