package graft.ops

/** Decodeless FLAC metadata walker (round 18) — the [[Jpeg.meta]] /
  * [[Mp3.meta]] pattern on the dominant LOSSLESS crawl audio format.
  * PCM decode stays out of scope (the LPC/Rice residual coding is the
  * MP3/H.264 boundary), but the public container layout carries every
  * crawl filter/group column at header cost: the `fLaC` magic, the
  * metadata-block chain (1-byte header: last-flag + 7-bit type;
  * 24-bit big-endian length), and the mandatory first STREAMINFO
  * block's fixed 34-byte layout — block-size bounds, sample rate
  * (20 bits), channels (3 bits, stored −1), bits per sample (5 bits,
  * stored −1), total samples (36 bits) → duration.
  *
  * The walk is STRICT the [[Mp3.meta]] way: block lengths must chain
  * exactly, the first block MUST be STREAMINFO of exactly 34 bytes
  * (spec §"METADATA_BLOCK_STREAMINFO"), a duplicate STREAMINFO or the
  * invalid type 127 refuses, a declared sample rate of 0 refuses, and
  * the first two bytes after the last metadata block must carry the
  * 14-bit frame sync (0xFFF8/0xFFF9) — a stream truncated inside its
  * metadata, or one with no audio frames at all, fails loudly instead
  * of reporting a phantom duration. FRAME bytes past that sync are
  * never inspected (the decodeless boundary).
  *
  * Reference analog: the reference engine ingests every value as an
  * opaque byte string (src/tdb_cons.c:356-411) — this walker is the
  * Spark-side pre-pass that makes those opaque audio blobs
  * filterable/groupable without a codec. */
object Flac {
  private def fail(msg: String): Nothing =
    throw new IllegalArgumentException(s"flac: $msg")

  def isFlac(bytes: Array[Byte]): Boolean =
    bytes.length >= 4 && bytes(0) == 'f' && bytes(1) == 'L' &&
      bytes(2) == 'a' && bytes(3) == 'C'

  final case class Meta(sampleRate: Int, nChannels: Int,
      bitsPerSample: Int, totalSamples: Long, durationMs: Long,
      nBlocks: Int, minBlockSize: Int, maxBlockSize: Int,
      hasSeekTable: Boolean, hasVorbisComment: Boolean)

  /** Offset of the `fLaC` magic: 0 for a bare stream, past a
    * well-formed leading ID3v2 tag otherwise (the common real-world
    * tagged-FLAC shape [[graft.ops.Multimodal.sniffFormat]] re-sniffs,
    * round 19). Fails when neither applies. */
  private[graft] def streamStart(bytes: Array[Byte]): Int = {
    if (isFlac(bytes)) return 0
    val end = Mp3.id3v2TagEnd(bytes)
    if (end > 0 && end + 4 <= bytes.length && bytes(end) == 'f' &&
      bytes(end + 1) == 'L' && bytes(end + 2) == 'a' &&
      bytes(end + 3) == 'C') end
    else fail("not a flac stream (bad fLaC magic)")
  }

  /** Walk the metadata-block chain; never reads audio-frame bytes. */
  def meta(bytes: Array[Byte]): Meta = {
    def u8(o: Int): Int = bytes(o) & 0xff
    var pos = streamStart(bytes) + 4
    var last = false
    var first = true
    var sr = 0; var ch = 0; var bps = 0; var total = 0L
    var minBs = 0; var maxBs = 0
    var nBlocks = 0
    var seek = false; var vorbis = false
    while (!last) {
      if (pos + 4 > bytes.length) fail(s"truncated block header at $pos")
      val h = u8(pos)
      last = (h & 0x80) != 0
      val typ = h & 0x7f
      if (typ == 127) fail("invalid metadata block type 127")
      val len = (u8(pos + 1) << 16) | (u8(pos + 2) << 8) | u8(pos + 3)
      val d = pos + 4
      if (d + len > bytes.length) fail(s"truncated metadata block at $pos")
      if (first) {
        if (typ != 0) fail("first metadata block is not STREAMINFO")
        if (len != 34) fail(s"STREAMINFO length $len != 34")
        minBs = (u8(d) << 8) | u8(d + 1)
        maxBs = (u8(d + 2) << 8) | u8(d + 3)
        if (minBs < 16) fail(s"min block size $minBs below the spec floor 16")
        if (maxBs < minBs) fail("max block size below min block size")
        // bytes 10..17: sampleRate(20) channels-1(3) bps-1(5) total(36)
        sr = (u8(d + 10) << 12) | (u8(d + 11) << 4) | (u8(d + 12) >> 4)
        if (sr == 0) fail("sample rate 0 is invalid")
        ch = ((u8(d + 12) >> 1) & 7) + 1
        bps = (((u8(d + 12) & 1) << 4) | (u8(d + 13) >> 4)) + 1
        total = ((u8(d + 13) & 0x0f).toLong << 32) |
          ((u8(d + 14).toLong << 24) | (u8(d + 15) << 16) |
            (u8(d + 16) << 8) | u8(d + 17))
        first = false
      } else typ match {
        case 0 => fail("duplicate STREAMINFO block")
        case 3 => seek = true
        case 4 => vorbis = true
        case _ => () // padding/application/cuesheet/picture: length skip
      }
      nBlocks += 1
      pos = d + len
    }
    if (first) fail("no metadata blocks")
    // the audio stream must follow: the 14-bit frame sync plus the
    // mandatory-ZERO reserved bit — only 0xFFF8/0xFFF9 are valid
    // (0xFFFA/0xFFFB have the reserved bit set and must refuse)
    if (pos + 2 > bytes.length) fail("no audio frames after metadata")
    if (u8(pos) != 0xff || (u8(pos + 1) & 0xfe) != 0xf8)
      fail(f"no frame sync after metadata (got 0x${u8(pos)}%02x${u8(pos + 1)}%02x)")
    // total samples 0 = "unknown" per spec → duration 0 (sentinel-free:
    // the gate's duration axis treats it as an instant clip, which is
    // what an unknown-length stream should look like to a junk filter)
    Meta(sr, ch, bps, total, total * 1000L / sr, nBlocks, minBs, maxBs,
      seek, vorbis)
  }

  /** Fixture-grade writer: a real metadata chain per the public spec
    * (STREAMINFO + optional SEEKTABLE/VORBIS_COMMENT/PADDING), then a
    * valid first frame sync followed by deterministic junk the walker
    * never reads — a METADATA fixture, not audio. */
  def encode(sampleRate: Int, nChannels: Int, bitsPerSample: Int,
      totalSamples: Long, blockSize: Int = 4096,
      vorbisCommentLen: Int = -1, seekPoints: Int = 0,
      paddingLen: Int = -1, frameLen: Int = 64, seed: Long = 0L): Array[Byte] = {
    require(sampleRate > 0 && sampleRate < (1 << 20), s"20-bit rate: $sampleRate")
    require(nChannels >= 1 && nChannels <= 8, s"channels: $nChannels")
    require(bitsPerSample >= 4 && bitsPerSample <= 32, s"bps: $bitsPerSample")
    require(totalSamples >= 0 && totalSamples < (1L << 36), "36-bit total")
    require(blockSize >= 16 && blockSize <= 0xffff, s"block size: $blockSize")
    val out = new java.io.ByteArrayOutputStream()
    out.write("fLaC".getBytes("US-ASCII"), 0, 4)
    def block(typ: Int, last: Boolean, payload: Array[Byte]): Unit = {
      out.write((if (last) 0x80 else 0) | typ)
      out.write((payload.length >> 16) & 0xff)
      out.write((payload.length >> 8) & 0xff)
      out.write(payload.length & 0xff)
      out.write(payload, 0, payload.length)
    }
    val si = new Array[Byte](34)
    si(0) = ((blockSize >> 8) & 0xff).toByte; si(1) = (blockSize & 0xff).toByte
    si(2) = si(0); si(3) = si(1) // min == max (fixed-blocksize stream)
    // min/max frame size (24+24 bits): 0 = unknown, spec-legal
    si(10) = ((sampleRate >> 12) & 0xff).toByte
    si(11) = ((sampleRate >> 4) & 0xff).toByte
    si(12) = (((sampleRate & 0x0f) << 4) | (((nChannels - 1) & 7) << 1) |
      (((bitsPerSample - 1) >> 4) & 1)).toByte
    si(13) = ((((bitsPerSample - 1) & 0x0f) << 4) |
      ((totalSamples >> 32) & 0x0f).toInt).toByte
    si(14) = ((totalSamples >> 24) & 0xff).toByte
    si(15) = ((totalSamples >> 16) & 0xff).toByte
    si(16) = ((totalSamples >> 8) & 0xff).toByte
    si(17) = (totalSamples & 0xff).toByte
    for (i <- 18 until 34) si(i) = ((seed * 31 + i) & 0xff).toByte // MD5: junk
    val tail = Seq.newBuilder[(Int, Array[Byte])]
    if (seekPoints > 0) tail += ((3, Array.tabulate(18 * seekPoints)(i =>
      ((seed * 13 + i) & 0xff).toByte)))
    if (vorbisCommentLen >= 0) {
      // vendor-length + vendor string + 0 user comments (LE u32s)
      val vendor = Array.tabulate(vorbisCommentLen)(i =>
        ('a' + ((seed + i) % 26)).toByte)
      val b = new java.io.ByteArrayOutputStream()
      def u32le(v: Int): Unit =
        for (i <- 0 until 4) b.write((v >> (8 * i)) & 0xff)
      u32le(vendor.length); b.write(vendor, 0, vendor.length); u32le(0)
      tail += ((4, b.toByteArray))
    }
    if (paddingLen >= 0) tail += ((1, new Array[Byte](paddingLen)))
    val blocks = tail.result()
    if (blocks.isEmpty) block(0, last = true, si)
    else {
      block(0, last = false, si)
      blocks.zipWithIndex.foreach { case ((t, p), i) =>
        block(t, last = i == blocks.length - 1, p)
      }
    }
    // first frame sync + junk "audio" the walker never reads
    // (frameLen = 0 writes NO frames — the no-audio refusal fixture)
    require(frameLen == 0 || frameLen >= 2, s"frameLen: $frameLen")
    if (frameLen >= 2) {
      out.write(0xff); out.write(0xf8)
      for (i <- 0 until frameLen - 2)
        out.write(((seed * 37 + i) & 0xff).toInt)
    }
    out.toByteArray
  }
}
