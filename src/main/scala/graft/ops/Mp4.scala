package graft.ops

/** Decodeless MP4 / ISO base-media (ISO/IEC 14496-12) metadata walker —
  * the [[Jpeg.meta]] pattern applied to the dominant crawl video
  * container (round 17). H.264/H.265 DECODE stays out of scope (a
  * codec-library job — Multimodal scaladoc, r14); the crawl
  * filter/group pass needs the container's self-description, which the
  * public box structure carries at header cost: brand, movie
  * timescale/duration, track count, per-track handler and sample-entry
  * codec fourcc, media-data presence. No sample data is ever read.
  *
  * Strict like [[Jpeg.meta]]/[[Png.meta]]: every box length must chain
  * exactly to the file end (64-bit largesize and size-0 "to end of
  * file" both handled), `ftyp` must lead, exactly one `moov` with one
  * `mvhd` — a truncated download fails loudly instead of reporting a
  * partial movie, so "which blobs have metadata" stays deterministic.
  */
object Mp4 {
  private def fail(msg: String): Nothing =
    throw new IllegalArgumentException(s"mp4: $msg")

  final case class Meta(majorBrand: String, minorVersion: Long,
      timescale: Long, durationMs: Long, nTracks: Int,
      videoCodec: String, audioCodec: String, hasMdat: Boolean)

  private final case class Box(typ: String, start: Int, end: Int)

  def meta(bytes: Array[Byte]): Meta = {
    def u32(o: Int): Long = {
      if (o + 4 > bytes.length) fail("truncated u32")
      ((bytes(o) & 0xffL) << 24) | ((bytes(o + 1) & 0xff) << 16) |
        ((bytes(o + 2) & 0xff) << 8) | (bytes(o + 3) & 0xff)
    }
    def u64(o: Int): Long = (u32(o) << 32) | u32(o + 4)
    def fourcc(o: Int): String = {
      if (o + 4 > bytes.length) fail("truncated fourcc")
      new String(bytes, o, 4, "ISO-8859-1")
    }
    // [start, end): one level of boxes; sizes must chain EXACTLY to end
    def walk(start: Int, end: Int, context: String): Vector[Box] = {
      val out = Vector.newBuilder[Box]
      var pos = start
      while (pos < end) {
        if (pos + 8 > end) fail(s"truncated box header in $context")
        var size = u32(pos)
        val typ = fourcc(pos + 4)
        var hdr = 8
        if (size == 1) {
          if (pos + 16 > end) fail(s"truncated largesize in $context")
          size = u64(pos + 8); hdr = 16
        } else if (size == 0) size = (end - pos).toLong
        if (size < hdr || pos + size > end)
          fail(s"box '$typ' overruns $context (size $size)")
        out += Box(typ, pos + hdr, pos + size.toInt)
        pos += size.toInt
      }
      out.result()
    }
    if (bytes.length < 16) fail("not an ISO media file (too short)")
    val top = walk(0, bytes.length, "file")
    if (top.head.typ != "ftyp") fail("first box is not ftyp")
    val ftyp = top.head
    if (ftyp.end - ftyp.start < 8) fail("ftyp too short")
    val majorBrand = fourcc(ftyp.start)
    val minorVersion = u32(ftyp.start + 4)
    val moovs = top.filter(_.typ == "moov")
    if (moovs.length != 1) fail(s"${moovs.length} moov boxes (need exactly 1)")
    val moov = walk(moovs.head.start, moovs.head.end, "moov")
    val mvhds = moov.filter(_.typ == "mvhd")
    if (mvhds.length != 1) fail(s"${mvhds.length} mvhd boxes (need exactly 1)")
    val mv = mvhds.head
    // every field read is bounded by the BOX end, not just the file
    // end — a short mvhd whose siblings still chain to EOF must fail
    // loudly, never read the next box's bytes as timescale/duration
    if (mv.end - mv.start < 4) fail("mvhd too short")
    val mvVer = bytes(mv.start) & 0xff
    val (timescale, durationUnits) = mvVer match {
      case 0 =>
        if (mv.end - mv.start < 20) fail("mvhd v0 too short")
        (u32(mv.start + 12), u32(mv.start + 16))
      case 1 =>
        if (mv.end - mv.start < 32) fail("mvhd v1 too short")
        (u32(mv.start + 20), u64(mv.start + 24))
      case v => fail(s"unknown mvhd version $v")
    }
    if (timescale <= 0) fail("zero movie timescale")
    var videoCodec = ""
    var audioCodec = ""
    val traks = moov.filter(_.typ == "trak")
    traks.foreach { t =>
      val mdia = walk(t.start, t.end, "trak").find(_.typ == "mdia")
        .getOrElse(fail("trak without mdia"))
      val inMdia = walk(mdia.start, mdia.end, "mdia")
      val hdlr = inMdia.find(_.typ == "hdlr").getOrElse(fail("mdia without hdlr"))
      if (hdlr.end - hdlr.start < 12) fail("hdlr too short")
      val handler = fourcc(hdlr.start + 8)
      val codec = (for {
        minf <- inMdia.find(_.typ == "minf")
        stbl <- walk(minf.start, minf.end, "minf").find(_.typ == "stbl")
        stsd <- walk(stbl.start, stbl.end, "stbl").find(_.typ == "stsd")
      } yield {
        if (stsd.end - stsd.start < 16) fail("stsd too short")
        val n = u32(stsd.start + 4)
        if (n < 1) fail("stsd with no sample entries")
        fourcc(stsd.start + 12) // first entry: size(4) then format
      }).getOrElse(fail("track without a sample description"))
      if (handler == "vide" && videoCodec.isEmpty) videoCodec = codec
      if (handler == "soun" && audioCodec.isEmpty) audioCodec = codec
    }
    Meta(majorBrand, minorVersion, timescale,
      durationUnits * 1000L / timescale, traks.length,
      videoCodec, audioCodec, top.exists(_.typ == "mdat"))
  }

  // ---- fixture-grade writer ----

  private def be32(v: Long): Array[Byte] = Array(
    ((v >>> 24) & 0xff).toByte, ((v >>> 16) & 0xff).toByte,
    ((v >>> 8) & 0xff).toByte, (v & 0xff).toByte)

  private def box(typ: String, payload: Array[Byte]*): Array[Byte] = {
    val len = 8 + payload.map(_.length).sum
    val out = new java.io.ByteArrayOutputStream(len)
    out.write(be32(len.toLong), 0, 4)
    out.write(typ.getBytes("ISO-8859-1"), 0, 4)
    payload.foreach(p => out.write(p, 0, p.length))
    out.toByteArray
  }

  private def trak(handler: String, codec: String, trackTimescale: Long,
      trackDuration: Long): Array[Byte] = {
    val mdhd = box("mdhd", Array[Byte](0, 0, 0, 0), // version 0 + flags
      be32(0), be32(0), be32(trackTimescale), be32(trackDuration),
      Array[Byte](0x55, 0xc4.toByte, 0, 0)) // language 'und' + pre_defined
    val hdlr = box("hdlr", Array[Byte](0, 0, 0, 0), be32(0),
      handler.getBytes("ISO-8859-1"), be32(0), be32(0), be32(0),
      Array[Byte](0)) // empty name, NUL-terminated
    // minimal sample entry: size + format + 6 reserved + data_ref_index
    val entry = {
      val body = new Array[Byte](8)
      body(7) = 1 // data_reference_index
      val len = 16
      be32(len.toLong) ++ codec.getBytes("ISO-8859-1") ++ body
    }
    val stsd = box("stsd", Array[Byte](0, 0, 0, 0), be32(1), entry)
    box("trak", box("mdia", mdhd, hdlr, box("minf", box("stbl", stsd))))
  }

  /** Minimal-but-valid ISO BMFF fixture: ftyp + moov(mvhd + traks) +
    * optional mdat with deterministic junk. The walker reads exactly
    * what this writes; interlocking sizes make truncation fail. */
  def encode(majorBrand: String, minorVersion: Long, timescale: Long,
      durationUnits: Long, video: Option[String], audio: Option[String],
      mdatLen: Int = 0, seed: Long = 0L): Array[Byte] = {
    require(majorBrand.length == 4, "brand must be a fourcc")
    val ftyp = box("ftyp", majorBrand.getBytes("ISO-8859-1"),
      be32(minorVersion), "isom".getBytes("ISO-8859-1"),
      "mp41".getBytes("ISO-8859-1"))
    val mvhd = box("mvhd", Array[Byte](0, 0, 0, 0),
      be32(0), be32(0), be32(timescale), be32(durationUnits),
      be32(0x00010000L), // rate 1.0
      Array[Byte](0x01, 0x00.toByte), // volume 1.0
      new Array[Byte](10), // reserved
      // identity matrix
      be32(0x00010000L), be32(0), be32(0), be32(0), be32(0x00010000L),
      be32(0), be32(0), be32(0), be32(0x40000000L),
      new Array[Byte](24), // pre_defined
      be32(0xffffffffL)) // next_track_ID
    val traks =
      video.map(c => trak("vide", c, 30000L, durationUnits * 30)).toSeq ++
        audio.map(c => trak("soun", c, 48000L, durationUnits * 48)).toSeq
    val moov = box("moov", (mvhd +: traks): _*)
    val parts = Seq(ftyp, moov) ++ (if (mdatLen > 0)
      Seq(box("mdat", Array.tabulate(mdatLen)(i =>
        ((seed * 31 + i) & 0xff).toByte)))
    else Nil)
    val out = new java.io.ByteArrayOutputStream()
    parts.foreach(p => out.write(p, 0, p.length))
    out.toByteArray
  }
}
