package graft

import java.io.ByteArrayInputStream

import org.apache.spark.sql.functions._

import graft.ops.{Multimodal, Png}

/** The from-spec PNG codec (round 17): exact round-trips across every
  * colour type, every bit depth, all five scanline filters, and Adam7
  * interlace; interop against the JDK's independent codec
  * (javax.imageio) in BOTH directions — exact, PNG is lossless —
  * CRC/truncation/critical-chunk refusal, decodeless meta, and the
  * decodeAnyImages / classifyMedia `\x89PNG` dispatch. */
class PngSpec extends SparkSpec {
  import spark.implicits._

  private def randomRgb(w: Int, h: Int, seed: Long): Array[Byte] = {
    val rnd = new scala.util.Random(seed)
    Array.tabulate(w * h * 3)(_ => rnd.nextInt(256).toByte)
  }

  test("every colour type and every filter round-trips EXACTLY through our own encode/decode") {
    val w = 13; val h = 11 // odd dims, n not a multiple of anything
    val n = w * h
    for (f <- 0 to 4; chunk <- Seq(7, 8192)) {
      val filt = (_: Int) => f
      val gray = Array.tabulate(n)(p => ((p * 31 + f) % 256).toByte)
      val (gw, gh, gOut) = Png.decode(Png.encodeGray(w, h, gray, filt, chunk))
      assert(gw === w && gh === h)
      for (p <- 0 until n; c <- 0 until 3)
        assert(gOut(3 * p + c) === gray(p), s"gray f=$f chunk=$chunk p=$p")

      val rgb = randomRgb(w, h, f * 1000L + chunk)
      val (_, _, cOut) = Png.decode(Png.encode(w, h, rgb, filt, chunk))
      assert(cOut.toSeq === rgb.toSeq, s"rgb f=$f chunk=$chunk")

      val rgba = Array.tabulate(n * 4) { q =>
        if (q % 4 == 3) ((q * 7) % 256).toByte else rgb(q / 4 * 3 + q % 4)
      }
      val (_, _, aOut) = Png.decode(Png.encodeRgba(w, h, rgba, filt, chunk))
      assert(aOut.toSeq === rgb.toSeq, s"rgba f=$f chunk=$chunk (alpha dropped)")

      val ga = Array.tabulate(n * 2)(q =>
        if (q % 2 == 1) 200.toByte else gray(q / 2))
      val (_, _, gaOut) = Png.decode(Png.encodeGrayAlpha(w, h, ga, filt, chunk))
      for (p <- 0 until n; c <- 0 until 3)
        assert(gaOut(3 * p + c) === gray(p), s"gray+alpha f=$f chunk=$chunk p=$p")

      val pal = Array.tabulate(48)(i => ((i * 53 + 11) % 256).toByte)
      val idx = Array.tabulate(n)(p => ((p * 7) % 16).toByte)
      val (_, _, pOut) = Png.decode(Png.encodePalette(w, h, pal, idx, filt, chunk))
      for (p <- 0 until n; c <- 0 until 3)
        assert(pOut(3 * p + c) === pal(3 * ((p * 7) % 16) + c),
          s"palette f=$f chunk=$chunk p=$p")
    }
    // mixed per-row filters (the gate fixture shape)
    val rgb = randomRgb(w, h, 42L)
    val (_, _, out) = Png.decode(Png.encode(w, h, rgb, y => y % 5, 16))
    assert(out.toSeq === rgb.toSeq)
  }

  private def imageIoRgb(bytes: Array[Byte]): (Int, Int, Array[Byte]) = {
    val img = javax.imageio.ImageIO.read(new ByteArrayInputStream(bytes))
    assert(img != null, "ImageIO failed to decode")
    val w = img.getWidth; val h = img.getHeight
    val out = new Array[Byte](w * h * 3)
    for (y <- 0 until h; x <- 0 until w) {
      val p = img.getRGB(x, y)
      val o = (y * w + x) * 3
      out(o) = ((p >> 16) & 0xff).toByte
      out(o + 1) = ((p >> 8) & 0xff).toByte
      out(o + 2) = (p & 0xff).toByte
    }
    (w, h, out)
  }

  test("interop: the JDK's independent codec decodes OUR streams EXACTLY (all colour types, all filters)") {
    val w = 17; val h = 9
    val n = w * h
    val rgb = randomRgb(w, h, 7L)
    for (f <- 0 to 4) {
      val (dw, dh, theirs) = imageIoRgb(Png.encode(w, h, rgb, (_: Int) => f, 11))
      assert(dw === w && dh === h)
      assert(theirs.toSeq === rgb.toSeq, s"truecolour f=$f")
    }
    // RGBA: getRGB's colour channels must equal ours (alpha dropped on
    // our side, carried on theirs — non-premultiplied either way)
    val rgba = Array.tabulate(n * 4)(q =>
      if (q % 4 == 3) (128 + q % 100).toByte else rgb(q / 4 * 3 + q % 4))
    val (_, _, theirsA) = imageIoRgb(Png.encodeRgba(w, h, rgba, y => (y + 1) % 5))
    assert(theirsA.toSeq === rgb.toSeq, "rgba colour channels")
    // grayscale: compare RAW raster samples — getRGB on TYPE_BYTE_GRAY
    // applies a linear→sRGB gamma map that has nothing to do with the codec
    val gray = Array.tabulate(n)(p => ((p * 37 + 3) % 256).toByte)
    val gImg = javax.imageio.ImageIO.read(
      new ByteArrayInputStream(Png.encodeGray(w, h, gray, y => (y + 2) % 5)))
    assert(gImg != null && gImg.getWidth === w && gImg.getHeight === h)
    for (y <- 0 until h; x <- 0 until w)
      assert(gImg.getRaster.getSample(x, y, 0) === (gray(y * w + x) & 0xff),
        s"gray ($x,$y)")
    // palette
    val pal = Array.tabulate(24)(i => ((i * 97 + 5) % 256).toByte)
    val idx = Array.tabulate(n)(p => ((p * 3) % 8).toByte)
    val (_, _, theirsP) = imageIoRgb(Png.encodePalette(w, h, pal, idx, y => y % 5))
    for (p <- 0 until n; c <- 0 until 3)
      assert(theirsP(3 * p + c) === pal(3 * ((p * 3) % 8) + c), s"palette p=$p")
  }

  test("interop: WE decode the JDK writer's streams EXACTLY (its own filter heuristics)") {
    for ((typ, seed) <- Seq(
        (java.awt.image.BufferedImage.TYPE_INT_RGB, 1L),
        (java.awt.image.BufferedImage.TYPE_4BYTE_ABGR, 2L))) {
      val w = 29; val h = 23
      val rgb = randomRgb(w, h, seed)
      val img = new java.awt.image.BufferedImage(w, h, typ)
      for (y <- 0 until h; x <- 0 until w) {
        val o = (y * w + x) * 3
        img.setRGB(x, y, 0xff000000 | ((rgb(o) & 0xff) << 16) |
          ((rgb(o + 1) & 0xff) << 8) | (rgb(o + 2) & 0xff))
      }
      val bos = new java.io.ByteArrayOutputStream()
      assert(javax.imageio.ImageIO.write(img, "png", bos))
      val bytes = bos.toByteArray
      val (dw, dh, ours) = Png.decode(bytes)
      assert(dw === w && dh === h)
      assert(ours.toSeq === rgb.toSeq, s"type=$typ")
    }
  }

  test("truncation, CRC rot, trailing bytes, and unsupported profiles refuse loudly") {
    val good = Png.encode(8, 8, randomRgb(8, 8, 3L))
    intercept[IllegalArgumentException](
      Png.decode(java.util.Arrays.copyOfRange(good, 0, good.length / 2)))
    intercept[IllegalArgumentException](Png.decode("nope".getBytes))
    // flip one IDAT payload bit: the chunk CRC refuses (bit-rot detection)
    val rotted = good.clone()
    rotted(good.length / 2) = (rotted(good.length / 2) ^ 1).toByte
    intercept[IllegalArgumentException](Png.decode(rotted))
    // trailing garbage after IEND — the Jpeg desync discipline
    val trailing = java.util.Arrays.copyOf(good, good.length + 1)
    intercept[IllegalArgumentException](Png.decode(trailing))
    // a LYING interlace flag (sequential payload, Adam7 header) is a
    // size desync: the seven-pass layout expects different filtered
    // byte counts, so decode refuses instead of misreading — and meta
    // still REPORTS the flag at header cost
    val inter = good.clone()
    inter(8 + 8 + 12) = 1 // IHDR data byte 12 (interlace)
    val crc = new java.util.zip.CRC32()
    crc.update(inter, 8 + 4, 4 + 13)
    val cv = crc.getValue
    for (i <- 0 until 4)
      inter(8 + 8 + 13 + i) = ((cv >>> (24 - 8 * i)) & 0xff).toByte
    val eInter = intercept[IllegalArgumentException](Png.decode(inter))
    assert(eInter.getMessage.contains("inflated"))
    assert(Png.meta(inter).interlaced)
    // same for a lying 16-bit depth (the row layout doubles)
    val deep = good.clone()
    deep(8 + 8 + 8) = 16
    crc.reset(); crc.update(deep, 8 + 4, 4 + 13)
    val dv = crc.getValue
    for (i <- 0 until 4)
      deep(8 + 8 + 13 + i) = ((dv >>> (24 - 8 * i)) & 0xff).toByte
    val eDeep = intercept[IllegalArgumentException](Png.decode(deep))
    assert(eDeep.getMessage.contains("inflated"))
    assert(Png.meta(deep).bitDepth === 16)
    // an unknown CRITICAL chunk refuses (spec §5.4 — the Apple CgBI
    // shape); ancillary unknown chunks skip; meta reports the flag
    def splice(b: Array[Byte], typ: String): Array[Byte] = {
      val data = Array[Byte](1, 2, 3)
      val c = new java.io.ByteArrayOutputStream()
      c.write(Array[Byte](0, 0, 0, 3), 0, 4)
      c.write(typ.getBytes("US-ASCII"), 0, 4)
      c.write(data, 0, 3)
      val cc = new java.util.zip.CRC32()
      cc.update(typ.getBytes("US-ASCII")); cc.update(data)
      for (i <- 0 until 4) c.write(((cc.getValue >>> (24 - 8 * i)) & 0xff).toInt)
      val at = 8 + 8 + 13 + 4 // after IHDR
      java.util.Arrays.copyOfRange(b, 0, at) ++ c.toByteArray ++
        java.util.Arrays.copyOfRange(b, at, b.length)
    }
    val eCrit = intercept[IllegalArgumentException](
      Png.decode(splice(good, "CgBI")))
    assert(eCrit.getMessage.contains("critical"))
    assert(Png.meta(splice(good, "CgBI")).unknownCritical)
    val (aw, ah, _) = Png.decode(splice(good, "teXt")) // ancillary: skipped
    assert(aw === 8 && ah === 8)
    assert(!Png.meta(splice(good, "teXt")).unknownCritical)
    // a deflate stream longer than the declared raster desyncs loudly:
    // re-frame the good stream's zlib payload with an extra raster row
    val w9 = Png.encode(8, 9, randomRgb(8, 9, 4L))
    val ihdrPatched = w9.clone()
    ihdrPatched(8 + 8 + 7) = 8 // declared height 9 → 8
    crc.reset(); crc.update(ihdrPatched, 8 + 4, 4 + 13)
    val hv = crc.getValue
    for (i <- 0 until 4)
      ihdrPatched(8 + 8 + 13 + i) = ((hv >>> (24 - 8 * i)) & 0xff).toByte
    val eLong = intercept[IllegalArgumentException](Png.decode(ihdrPatched))
    assert(eLong.getMessage.contains("longer"))
  }

  test("meta: decodeless chunk walk (geometry, census, palette, alpha) with CRC integrity") {
    val rgb = randomRgb(12, 10, 5L)
    val m = Png.meta(Png.encode(12, 10, rgb, y => y % 5, 16))
    assert(m.width === 12 && m.height === 10)
    assert(m.bitDepth === 8 && m.colorType === 2 && !m.interlaced)
    assert(!m.hasAlpha && m.paletteSize === 0)
    assert(m.idatBytes > 0 && m.nChunks >= 3)
    val pal = Array.tabulate(9)(i => (i * 11).toByte)
    val mp = Png.meta(Png.encodePalette(6, 6, pal,
      Array.tabulate(36)(p => (p % 3).toByte)))
    assert(mp.colorType === 3 && mp.paletteSize === 3 && !mp.hasAlpha)
    val ma = Png.meta(Png.encodeRgba(6, 6, Array.tabulate(144)(_.toByte)))
    assert(ma.colorType === 6 && ma.hasAlpha)
    // truncated stream: no metadata (CRC walk refuses), so
    // "which blobs have metadata" stays deterministic
    val good = Png.encode(8, 8, randomRgb(8, 8, 6L))
    intercept[IllegalArgumentException](
      Png.meta(java.util.Arrays.copyOfRange(good, 0, good.length / 2)))
  }

  test("Adam7 interlaced streams round-trip exactly (every colour type, per-pass filters)") {
    // odd dims exercise the empty-pass and partial-pass geometry
    for ((w, h) <- Seq((13, 11), (8, 8), (3, 2), (1, 1), (16, 5))) {
      val n = w * h
      val rgb = randomRgb(w, h, w * 100L + h)
      val (dw, dh, out) = Png.decode(
        Png.encode(w, h, rgb, y => y % 5, 16, interlaced = true))
      assert(dw === w && dh === h)
      assert(out.toSeq === rgb.toSeq, s"rgb $w x $h")
      val gray = Array.tabulate(n)(p => ((p * 41 + 7) % 256).toByte)
      val (_, _, g) = Png.decode(
        Png.encodeGray(w, h, gray, y => (y + 1) % 5, 8192, interlaced = true))
      for (p <- 0 until n) assert(g(3 * p) === gray(p), s"gray $w x $h p=$p")
      val rgba = Array.tabulate(n * 4)(q =>
        if (q % 4 == 3) ((q * 3) % 256).toByte else rgb(q / 4 * 3 + q % 4))
      val (_, _, a) = Png.decode(
        Png.encodeRgba(w, h, rgba, y => (y + 2) % 5, 32, interlaced = true))
      assert(a.toSeq === rgb.toSeq, s"rgba $w x $h")
      val pal = Array.tabulate(24)(i => ((i * 37 + 3) % 256).toByte)
      val idx = Array.tabulate(n)(p => ((p * 5) % 8).toByte)
      val (_, _, pd) = Png.decode(
        Png.encodePalette(w, h, pal, idx, y => y % 5, 16, interlaced = true))
      for (p <- 0 until n; c <- 0 until 3)
        assert(pd(3 * p + c) === pal(3 * ((p * 5) % 8) + c),
          s"palette $w x $h p=$p")
    }
    // and the JDK's reader decodes OUR interlaced stream exactly
    val rgb = randomRgb(15, 9, 99L)
    val (_, _, theirs) = imageIoRgb(
      Png.encode(15, 9, rgb, y => y % 5, 16, interlaced = true))
    assert(theirs.toSeq === rgb.toSeq)
  }

  test("interop: the JDK writer's Adam7, 16-bit, and sub-8-bit streams decode with the spec reductions") {
    // Adam7 from the JDK writer (progressive mode)
    val w = 21; val h = 13
    val rgb = randomRgb(w, h, 11L)
    val img = new java.awt.image.BufferedImage(w, h,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until h; x <- 0 until w) {
      val o = (y * w + x) * 3
      img.setRGB(x, y, ((rgb(o) & 0xff) << 16) |
        ((rgb(o + 1) & 0xff) << 8) | (rgb(o + 2) & 0xff))
    }
    val writer = javax.imageio.ImageIO.getImageWritersByFormatName("png").next()
    val params = writer.getDefaultWriteParam
    params.setProgressiveMode(javax.imageio.ImageWriteParam.MODE_DEFAULT)
    val bos = new java.io.ByteArrayOutputStream()
    val ios = javax.imageio.ImageIO.createImageOutputStream(bos)
    writer.setOutput(ios)
    writer.write(null, new javax.imageio.IIOImage(img, null, null), params)
    ios.close(); writer.dispose()
    val adam = bos.toByteArray
    assert(Png.meta(adam).interlaced, "JDK writer ignored progressive mode")
    val (aw, ah, ours) = Png.decode(adam)
    assert(aw === w && ah === h && ours.toSeq === rgb.toSeq)
    // 16-bit grayscale: our high-byte reduction vs the raw raster
    val g16 = new java.awt.image.BufferedImage(w, h,
      java.awt.image.BufferedImage.TYPE_USHORT_GRAY)
    val rnd = new scala.util.Random(5)
    for (y <- 0 until h; x <- 0 until w)
      g16.getRaster.setSample(x, y, 0, rnd.nextInt(65536))
    val b16 = new java.io.ByteArrayOutputStream()
    assert(javax.imageio.ImageIO.write(g16, "png", b16))
    assert(Png.meta(b16.toByteArray).bitDepth === 16)
    val (_, _, ours16) = Png.decode(b16.toByteArray)
    for (y <- 0 until h; x <- 0 until w)
      assert((ours16((y * w + x) * 3) & 0xff) ===
        (g16.getRaster.getSample(x, y, 0) >> 8), s"16-bit ($x,$y)")
    // 1-bit: TYPE_BYTE_BINARY writes a depth-1 stream; sub-8 gray
    // rescales to {0, 255}
    val g1 = new java.awt.image.BufferedImage(w, h,
      java.awt.image.BufferedImage.TYPE_BYTE_BINARY)
    for (y <- 0 until h; x <- 0 until w)
      g1.getRaster.setSample(x, y, 0, (x * 7 + y * 3) % 2)
    val b1 = new java.io.ByteArrayOutputStream()
    assert(javax.imageio.ImageIO.write(g1, "png", b1))
    assert(Png.meta(b1.toByteArray).bitDepth === 1)
    val (_, _, ours1) = Png.decode(b1.toByteArray)
    for (y <- 0 until h; x <- 0 until w)
      assert((ours1((y * w + x) * 3) & 0xff) ===
        (if ((x * 7 + y * 3) % 2 == 1) 255 else 0), s"1-bit ($x,$y)")
    // 4-bit palette via an IndexColorModel
    val cmap = Array.tabulate(16)(i =>
      (i * 17 << 16) | ((255 - i * 17) << 8) | (i * 13))
    val icm = new java.awt.image.IndexColorModel(4, 16, cmap, 0, false, -1,
      java.awt.image.DataBuffer.TYPE_BYTE)
    val p4 = new java.awt.image.BufferedImage(w, h,
      java.awt.image.BufferedImage.TYPE_BYTE_BINARY, icm)
    for (y <- 0 until h; x <- 0 until w)
      p4.getRaster.setSample(x, y, 0, (x + y * 5) % 16)
    val bp4 = new java.io.ByteArrayOutputStream()
    assert(javax.imageio.ImageIO.write(p4, "png", bp4))
    val m4 = Png.meta(bp4.toByteArray)
    assert(m4.bitDepth === 4 && m4.colorType === 3)
    val (_, _, ours4) = Png.decode(bp4.toByteArray)
    for (y <- 0 until h; x <- 0 until w) {
      val e = cmap((x + y * 5) % 16)
      val o = (y * w + x) * 3
      assert((ours4(o) & 0xff) === ((e >> 16) & 0xff) &&
        (ours4(o + 1) & 0xff) === ((e >> 8) & 0xff) &&
        (ours4(o + 2) & 0xff) === (e & 0xff), s"4-bit palette ($x,$y)")
    }
  }

  test("decodeAnyImages dispatches \\x89PNG and DROPMALFORMED skips truncated pngs") {
    val png = Png.encode(2, 2, Array.fill(12)(70.toByte))
    val jp = graft.ops.Jpeg.encodeGray(8, 8, Array.fill(64)(100.toByte))
    val ppm = Multimodal.Ppm.encode(2, 2, Array.fill(12)(50.toByte))
    val bad = java.util.Arrays.copyOfRange(png, 0, png.length / 2)
    val media = Seq((1L, png), (2L, jp), (3L, ppm), (4L, bad))
      .toDF("media_id", "bytes")
    val dec = Multimodal.decodeAnyImages(media, thumbSide = 2)
      .select("media_id", "mean_r").collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(dec.keySet === Set(1L, 2L, 3L))
    assert(dec(1L) === 70.0 && dec(2L) === 100.0 && dec(3L) === 50.0)
    val cls = Multimodal.classifyMedia(media)
      .select("media_id", "modality").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    // the truncated blob keeps its magic: classification is the cheap
    // router, the decode path is what refuses it
    assert(cls(1L) === "image" && cls(4L) === "image")
  }

  test("pngDedupMediaFromDocuments: the re-encode pairs perceptually at hamming 0 (exact-blob dedup misses it)") {
    val docs = (0L until 16L).toDF("doc_id")
    val media = Multimodal.pngDedupMediaFromDocuments(docs)
    // m=2 really is a different byte stream of the same pixels
    val blobs = media.collect().map(r => r.getLong(0) -> r.getAs[Array[Byte]](1)).toMap
    assert(java.util.Arrays.equals(blobs(0L), blobs(1L)), "m1 is an exact copy")
    assert(!java.util.Arrays.equals(blobs(0L), blobs(2L)), "m2 re-encode differs on the wire")
    val dec = Multimodal.decodeAnyImages(media, thumbSide = 8)
    val pairs = Multimodal.imageNearDupPairs(dec, maxHamming = 3)
      .select("id_a", "id_b", "hamming", "n_diff_ch").collect()
      .map(r => ((r.getLong(0), r.getLong(1)), (r.getLong(2), r.getLong(3)))).toMap
    val expected = (for {
      gid <- 0L until 4L
      a <- 0L until 3L; b <- 0L until 3L if a < b
    } yield (gid * 4 + a, gid * 4 + b)).toSet
    assert(pairs.keySet === expected)
    pairs.values.foreach { case (ham, nd) => assert(ham === 0L && nd === 0L) }
  }
}
