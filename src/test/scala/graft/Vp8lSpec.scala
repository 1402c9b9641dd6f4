package graft

import graft.ops.{Multimodal, Vp8l, Webp}

/** The from-spec VP8L codec (round 18): canonical prefix codes (simple
  * and code-length-coded forms), LZ77 with the 2D distance map, the
  * color cache, meta prefix groups, all four transforms across every
  * predictor mode, palette bundling at every width, truncation/
  * structure refusal, and the container dispatch (lossless decodes,
  * lossy refuses, junk keeps exact dedup). */
class Vp8lSpec extends SparkSpec {

  private def mix(seed: Long): Long = {
    var z = seed + 0x9e3779b97f4a7c15L
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z ^ (z >>> 31)
  }

  private def raster(w: Int, h: Int, seed: Long, colors: Int = 0): Array[Int] =
    Array.tabulate(w * h) { i =>
      val r = mix(seed * 7919 + i)
      if (colors > 0) {
        // palette-sized rasters: indexes into a deterministic table
        val idx = ((r & 0x7fffffffL) % colors).toInt
        0xff000000 | (((idx * 37) & 0xff) << 16) | (((idx * 59 + 3) & 0xff) << 8) |
          ((idx * 83 + 7) & 0xff)
      } else (0xff000000 | (r & 0xffffff)).toInt
    }

  private def roundTrip(w: Int, h: Int, px: Array[Int],
      opts: Vp8l.EncOptions): Unit = {
    val enc = Vp8l.encode(w, h, px, opts)
    val (dw, dh, _, dec) = Vp8l.decode(enc, 0, enc.length)
    assert(dw === w && dh === h, s"dims under $opts")
    assert(dec === px, s"pixels under $opts")
  }

  test("distance map matches the spec's published ordering (spot-pinned)") {
    val m = Vp8l.DistanceMap
    assert(m.length === 120)
    // the first sixteen entries of the spec's table
    assert(m.take(16).toSeq === Seq((0, 1), (1, 0), (1, 1), (-1, 1),
      (0, 2), (2, 0), (1, 2), (-1, 2), (2, 1), (-2, 1), (2, 2), (-2, 2),
      (0, 3), (3, 0), (1, 3), (-1, 3)))
    // the d=25 tie run (descending y, positive x first)
    assert(m.slice(34, 40).toSeq ===
      Seq((0, 5), (3, 4), (-3, 4), (4, 3), (-4, 3), (5, 0)))
    // the (8,0) row and the final entry
    assert(m(96) === ((8, 0)))
    assert(m.slice(97, 103).toSeq ===
      Seq((4, 7), (-4, 7), (7, 4), (-7, 4), (8, 1), (8, 2)))
    assert(m(119) === ((8, 7)))
  }

  test("plain literal round-trip (one prefix-code group, full huffman headers)") {
    roundTrip(13, 7, raster(13, 7, 1), Vp8l.EncOptions(lz77 = false))
    roundTrip(1, 1, raster(1, 1, 2), Vp8l.EncOptions(lz77 = false))
    roundTrip(64, 1, raster(64, 1, 3), Vp8l.EncOptions(lz77 = false))
    roundTrip(1, 40, raster(1, 40, 4), Vp8l.EncOptions(lz77 = false))
  }

  test("LZ77 backrefs: runs, row-above copies through the distance map, overlapping dist-1 copies") {
    val w = 19; val h = 11
    // rows repeat (dist = xsize via plane code 1) and long flat runs
    // (dist = 1, overlapping copy)
    val px = Array.tabulate(w * h) { i =>
      val x = i % w
      if (x < 7) 0xff112233 else (0xff000000 | ((x * 31) & 0xff) << 8)
    }
    roundTrip(w, h, px, Vp8l.EncOptions())
    // a single-color image: one literal + one giant overlapping backref
    roundTrip(33, 21, Array.fill(33 * 21)(0xffeeddcc.toInt), Vp8l.EncOptions())
  }

  test("color cache round-trips and the cache symbol is actually exercised") {
    // few distinct colors scattered → heavy cache hits at every width
    for (cacheBits <- Seq(1, 4, 8, 11)) {
      val px = raster(17, 9, 5, colors = 7)
      roundTrip(17, 9, px,
        Vp8l.EncOptions(cacheBits = cacheBits, lz77 = false))
      roundTrip(17, 9, px, Vp8l.EncOptions(cacheBits = cacheBits))
    }
  }

  test("every predictor mode round-trips (edge rules included)") {
    for (mode <- 0 to 13) {
      // smooth-ish raster so residuals vary but stay in-gamut
      val px = Array.tabulate(21 * 13) { i =>
        val x = i % 21; val y = i / 21
        0xff000000 | (((x * 11 + y * 3) & 0xff) << 16) |
          (((x * 5 + y * 13) & 0xff) << 8) | ((x * 2 + y * 7) & 0xff)
      }
      roundTrip(21, 13, px,
        Vp8l.EncOptions(predictorMode = mode, predictorBits = 2))
      roundTrip(21, 13, px,
        Vp8l.EncOptions(predictorMode = mode, predictorBits = 4, lz77 = false))
    }
  }

  test("color transform (signed 3.5 fixed-point deltas) and subtract-green round-trip") {
    val px = raster(15, 10, 6)
    roundTrip(15, 10, px, Vp8l.EncOptions(subtractGreen = true))
    for (cte <- Seq((17, -23, 5), (-128, 127, -1), (0, 0, 0), (64, 64, 64)))
      roundTrip(15, 10, px, Vp8l.EncOptions(colorTx = Some(cte), colorBits = 3))
    // the full composition: subtract-green + color + predictor + cache
    roundTrip(15, 10, px, Vp8l.EncOptions(subtractGreen = true,
      colorTx = Some((17, -23, 5)), predictorMode = 7, cacheBits = 5))
  }

  test("palette at every bundling width (2/4/16 colors packed, 17+ plain)") {
    for (colors <- Seq(2, 3, 4, 9, 16, 17, 200)) {
      val px = raster(23, 9, colors.toLong, colors = colors)
      roundTrip(23, 9, px, Vp8l.EncOptions(palette = true, lz77 = false))
      roundTrip(23, 9, px, Vp8l.EncOptions(palette = true))
    }
    // width not divisible by pixels-per-byte exercises the tail packing
    roundTrip(13, 5, raster(13, 5, 77, colors = 3),
      Vp8l.EncOptions(palette = true, lz77 = false))
  }

  test("meta prefix codes: two groups split by block column round-trip") {
    val px = raster(37, 17, 8)
    roundTrip(37, 17, px, Vp8l.EncOptions(metaBits = 2))
    roundTrip(37, 17, px, Vp8l.EncOptions(metaBits = 3, cacheBits = 4))
    roundTrip(37, 17, px,
      Vp8l.EncOptions(metaBits = 2, subtractGreen = true, predictorMode = 2))
  }

  test("truncation, bad signature, bad version, and malformed codes refuse loudly") {
    val enc = Vp8l.encode(9, 7, raster(9, 7, 9), Vp8l.EncOptions())
    intercept[IllegalArgumentException](
      Vp8l.decode(enc, 0, enc.length / 2))
    val badSig = enc.clone(); badSig(0) = 0x30
    intercept[IllegalArgumentException](Vp8l.decode(badSig, 0, badSig.length))
    // version bits live in byte 4 (bits 29..31 of the LE header word)
    val badVer = enc.clone()
    badVer(4) = (badVer(4) | 0x20).toByte
    intercept[IllegalArgumentException](Vp8l.decode(badVer, 0, badVer.length))
  }

  test("container: Webp.decode round-trips, meta agrees, lossy/animated refuse, junk VP8L drops") {
    val px = raster(12, 8, 10)
    val bytes = Webp.encodeVp8lPixels(12, 8, px)
    val md = Webp.meta(bytes)
    assert(md.width === 12 && md.height === 8 && md.format === "lossless")
    val (w, h, rgb) = Webp.decode(bytes)
    assert(w === 12 && h === 8)
    for (i <- 0 until w * h) {
      assert((rgb(3 * i) & 0xff) === ((px(i) >> 16) & 0xff))
      assert((rgb(3 * i + 1) & 0xff) === ((px(i) >> 8) & 0xff))
      assert((rgb(3 * i + 2) & 0xff) === (px(i) & 0xff))
    }
    intercept[IllegalArgumentException](Webp.decode(Webp.encodeLossy(8, 8)))
    intercept[IllegalArgumentException](
      Webp.decode(Webp.encodeExtended(8, 8, nFrames = 2)))
    // the old junk-payload lossless fixture fails the REAL decode now
    intercept[IllegalArgumentException](Webp.decode(Webp.encodeLossless(8, 8)))
  }

  test("dispatch: real VP8L decodes through decodeAnyImages; junk webp keeps exact dedup only") {
    import spark.implicits._
    val px = raster(10, 10, 11)
    val real = Webp.encodeVp8lPixels(10, 10, px)
    val junk = Webp.encodeLossless(10, 10) // junk payload: drops at decode
    val media = Seq((1L, real), (2L, junk), (12L, junk))
      .toDF("media_id", "bytes")
    val dec = Multimodal.decodeAnyImages(media, thumbSide = 2)
      .select("media_id").as[Long].collect().toSet
    assert(dec === Set(1L))
    val pairs = Multimodal.routedImageDedup(media)
      .select("id_a", "id_b", "kind").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2))).toSet
    assert(pairs === Set((2L, 12L, "exact_blob")))
  }

  test("cost bomb: a tiny payload declaring a huge raster refuses BEFORE allocation") {
    // ~40-byte blob declaring 16383 x 8000 (~500 MB ARGB): the per-bit
    // pixel ceiling (a legal stream covers < 2048 px per payload bit)
    // must refuse from the header, before the w*h allocation
    val p = new Array[Byte](40)
    p(0) = 0x2f
    val b = 16382L | (7999L << 14) // (w-1) | (h-1)<<14, alpha 0, ver 0
    for (i <- 0 until 4) p(1 + i) = ((b >> (8 * i)) & 0xff).toByte
    val e = intercept[IllegalArgumentException](Vp8l.decode(p, 0, p.length))
    assert(e.getMessage.contains("per-bit pixel ceiling"))
    // a genuinely large-but-covered stream still passes the floor:
    // 64x64 constant image compresses to a handful of backrefs
    val big = Webp.encodeVp8lPixels(64, 64,
      Array.fill(64 * 64)(0xff336699))
    val (w, h, rgb) = Webp.decode(big)
    assert(w === 64 && h === 64 && (rgb(0) & 0xff) === 0x33)
  }

  test("VP8X canvas dims must agree with the VP8L still sub-chunk") {
    val px = raster(4, 4, 5)
    val ok = Webp.encodeVp8xVp8l(4, 4, px)
    assert(Webp.decode(ok)._1 === 4) // the matched container decodes
    // patch the VP8X canvas width to 8: RIFF(12) + chunk hdr(8) +
    // flags+reserved(4) puts width-1 at offset 24 (24-bit LE)
    val bad = ok.clone()
    bad(24) = 7
    val md = Webp.meta(bad)
    assert(md.width === 8 && md.height === 4, "meta reads the canvas dims")
    val e = intercept[IllegalArgumentException](Webp.decode(bad))
    assert(e.getMessage.contains("disagree with container dims"))
  }
}
