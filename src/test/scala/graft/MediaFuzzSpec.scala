package graft

import graft.ops.{Flac, Gif, Jpeg, Mp3, Mp4, Multimodal, Ogg, Png, Vp8l, Webp}

/** Adversarial robustness of every binary media parser (round 18):
  * deterministic single-bit flips and truncations over valid fixtures
  * must yield either a successful parse (the corruption landed in
  * unvalidated payload — fine) or a STRUCTURED refusal
  * (`IllegalArgumentException` from the walkers' `fail()`), NEVER a
  * raw crash (ArrayIndexOutOfBounds, NegativeArraySize, arithmetic
  * error, infinite loop). The DROPMALFORMED projections catch broad
  * `Exception`, so pipelines survive either way — but the loud-refusal
  * discipline is what makes "which blobs parse" deterministic for the
  * oracle, and a raw crash class is one crafted blob away from an
  * executor-killing error on a real crawl. */
class MediaFuzzSpec extends SparkSpec {

  /** Run `f` over systematic corruptions of `bytes`; returns the
    * failure descriptions of every corruption that escaped as
    * something OTHER than IllegalArgumentException. */
  private def fuzz(name: String, bytes: Array[Byte],
      f: Array[Byte] => Any): Seq[String] = {
    val bad = Seq.newBuilder[String]
    def probe(tag: String, b: Array[Byte]): Unit =
      try { f(b); () }
      catch {
        case _: IllegalArgumentException => ()
        case t: Throwable =>
          bad += s"$name/$tag: ${t.getClass.getSimpleName}: ${t.getMessage}"
      }
    // single-bit flips at up to 160 evenly-spaced positions, two bits
    val stride = math.max(1, bytes.length / 160)
    var pos = 0
    while (pos < bytes.length) {
      for (mask <- Seq(0x01, 0x80)) {
        val b = bytes.clone()
        b(pos) = (b(pos) ^ mask).toByte
        probe(s"flip@$pos/$mask", b)
      }
      pos += stride
    }
    // truncations at up to 40 evenly-spaced lengths (incl. 0 and 1)
    val tstride = math.max(1, bytes.length / 40)
    var len = 0
    while (len < bytes.length) {
      probe(s"trunc@$len", java.util.Arrays.copyOfRange(bytes, 0, len))
      len += tstride
    }
    // byte-zeroed header (the all-zero prefix shape)
    val z = bytes.clone()
    java.util.Arrays.fill(z, 0, math.min(16, z.length), 0.toByte)
    probe("zero-head", z)
    bad.result()
  }

  private def assertClean(failures: Seq[String]): Unit =
    assert(failures.isEmpty,
      s"${failures.length} raw crashes:\n${failures.take(10).mkString("\n")}")

  test("VP8L decode refuses corruption structurally (flips, truncations)") {
    val px = Array.tabulate(16 * 12) { i =>
      0xff000000 | ((i * 7 & 0xff) << 16) | ((i * 13 & 0xff) << 8) | (i & 0xff)
    }
    for (opts <- Seq(Vp8l.EncOptions(), Vp8l.EncOptions(cacheBits = 6),
        Vp8l.EncOptions(subtractGreen = true, predictorMode = 11,
          metaBits = 2))) {
      val enc = Vp8l.encode(16, 12, px, opts)
      assertClean(fuzz(s"vp8l/$opts", enc,
        b => Vp8l.decode(b, 0, b.length)))
    }
  }

  test("WebP container decode/frames/meta refuse corruption structurally") {
    val px = Array.tabulate(64)(p => 0xff000000 | (p * 0x040201))
    val still = Webp.encodeVp8lPixels(8, 8, px)
    val anim = Webp.encodeAnimatedVp8l(8, 8,
      Seq((40, px), (40, px.map(_ ^ 0x00ffff))))
    assertClean(fuzz("webp-still", still, Webp.decode))
    assertClean(fuzz("webp-anim", anim, Webp.frames(_)))
    assertClean(fuzz("webp-meta", anim, Webp.meta))
  }

  test("PNG decode/frames/meta refuse corruption structurally (APNG included)") {
    val rgb = Array.tabulate(8 * 8 * 3)(i => (i * 5).toByte)
    val still = Png.encode(8, 8, rgb, y => y % 5)
    val apng = Png.encodeApng(8, 8,
      Seq((2, rgb), (3, rgb.map(b => (b ^ 0x7f).toByte))))
    assertClean(fuzz("png-decode", still, Png.decode))
    assertClean(fuzz("apng-frames", apng, Png.frames(_)))
    assertClean(fuzz("png-meta", apng, Png.meta))
  }

  test("GIF decode/frames/meta refuse corruption structurally") {
    val pal = Array[Byte](0, 0, 0, 255.toByte, 255.toByte, 255.toByte,
      64, 64, 64, 192.toByte, 192.toByte, 192.toByte)
    val bytes = Gif.encode(8, 8, pal, Seq(
      Gif.EncFrame(Array.tabulate(64)(p => (p % 4).toByte), delayCs = 2),
      Gif.EncFrame(Array.tabulate(64)(p => ((p + 1) % 4).toByte),
        delayCs = 2, transparentIdx = 0)))
    assertClean(fuzz("gif-decode", bytes, Gif.decode))
    assertClean(fuzz("gif-frames", bytes, Gif.frames(_)))
    assertClean(fuzz("gif-meta", bytes, Gif.meta))
  }

  test("JPEG decode/meta refuse corruption structurally") {
    val bytes = Jpeg.encodeGray(16, 16,
      Array.tabulate(256)(p => (40 + p % 180).toByte))
    assertClean(fuzz("jpeg-decode", bytes, Jpeg.decode))
    assertClean(fuzz("jpeg-meta", bytes, Jpeg.meta))
  }

  test("MP3/MP4/FLAC/OGG/WAV/Y4M walkers refuse corruption structurally") {
    assertClean(fuzz("mp3",
      Mp3.encodeFrames(3, 1, _ => 9, 0, 4, id3v2PayloadLen = 12), Mp3.meta))
    assertClean(fuzz("mp4",
      Mp4.encode("isom", 1, 600, 3000, Some("avc1"), Some("mp4a"), 32),
      Mp4.meta))
    assertClean(fuzz("flac",
      Flac.encode(44100, 2, 16, 44100L, vorbisCommentLen = 8,
        seekPoints = 1), Flac.meta))
    // round 19: the PCM frame decoder over real frame bodies — the
    // rice/LPC/decorrelation surface under the same bit-flip storm
    def pcm(seed: Long, n: Int) = Array.tabulate(n)(i =>
      (Multimodal.splitmix64(seed + i / 8) % 8000L).toInt)
    val mono = Flac.encodePcm(16000, 1, 16, pcm(5, 700), blockSize = 256,
      partOrder = 2)
    assertClean(fuzz("flac-pcm", mono, b => Flac.decode(b)))
    val stereo = {
      val s = pcm(9, 600)
      val inter = new Array[Int](1200)
      for (i <- 0 until 600) { inter(2 * i) = s(i); inter(2 * i + 1) = -s(i) }
      Flac.encodePcm(44100, 2, 16, inter, blockSize = 192, stereo = "ms",
        subframeMode = "lpc")
    }
    assertClean(fuzz("flac-pcm-ms", stereo, b => Flac.decode(b)))
    assertClean(fuzz("ogg",
      Ogg.encode("vorbis", 44100, 2, 44100L, nAudioPages = 2), Ogg.meta))
    assertClean(fuzz("wav",
      Multimodal.Wav.encode(16000, Array.tabulate(200)(_.toShort)),
      Multimodal.Wav.meta))
    assertClean(fuzz("y4m",
      Multimodal.Y4m.encode(6, 4, 25,
        (0 until 3).map(_ => new Array[Byte](6 * 4 * 3 / 2))),
      Multimodal.Y4m.meta))
  }
}
