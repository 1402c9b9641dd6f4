package graft

import org.apache.spark.sql.functions.col

import graft.ops.Flac

/** FLAC PCM codec (round 19): encoder and decoder pin each other over
  * the full subframe/residual/decorrelation surface, plus structural
  * refusals the spec mandates. The [[Vp8lSpec]] convention in audio. */
class FlacSpec extends SparkSpec {

  private def mix(v: Long): Long = graft.ops.Multimodal.splitmix64(v)

  /** Deterministic smooth-ish PCM: a bounded random walk (the
    * dedupAudioMedia shape) — fixed predictors compress it, nothing
    * degenerates to constant. */
  private def walk(seed: Long, n: Int, amp: Int = 8000): Array[Int] =
    Array.tabulate(n)(i => (mix(seed * 131071L + i / 8) % amp).toInt)

  test("round-trip: every subframe mode x stereo mode is bit-exact") {
    val n = 1000
    val left = walk(3, n)
    val right = walk(7, n)
    val inter = new Array[Int](2 * n)
    for (i <- 0 until n) { inter(2 * i) = left(i); inter(2 * i + 1) = right(i) }
    for (mode <- Seq("auto", "verbatim", "fixed0", "fixed1", "fixed2",
        "fixed3", "fixed4", "lpc");
        stereo <- Seq("indep", "ls", "rs", "ms")) {
      val bytes = Flac.encodePcm(44100, 2, 16, inter, blockSize = 256,
        stereo = stereo, subframeMode = mode)
      val p = Flac.decode(bytes)
      assert(p.sampleRate === 44100 && p.nChannels === 2 &&
        p.bitsPerSample === 16)
      assert(p.samples === inter, s"mode=$mode stereo=$stereo")
    }
  }

  test("round-trip: mono, odd block tails, partitioned rice, escape mode") {
    val s = walk(11, 777) // 777 = 3 frames of 256 + a 9-sample tail
    val base = Flac.encodePcm(8000, 1, 16, s, blockSize = 256)
    assert(Flac.decode(base).samples === s)
    // partitioned residuals (order 3 → 8 partitions of 32)
    val part = Flac.encodePcm(8000, 1, 16, s, blockSize = 256,
      partOrder = 3)
    assert(Flac.decode(part).samples === s)
    assert(!java.util.Arrays.equals(base, part))
    // escape-to-raw residuals
    val esc = Flac.encodePcm(8000, 1, 16, s, blockSize = 256,
      partOrder = 2, escapeResiduals = true)
    assert(Flac.decode(esc).samples === s)
    // a stream shorter than one block
    val tiny = walk(13, 20)
    assert(Flac.decode(Flac.encodePcm(48000, 1, 16, tiny)).samples === tiny)
  }

  test("round-trip: constant blocks, wasted bits, 8/24-bit widths, 8 channels") {
    // constant: silence and a DC plateau
    val silent = new Array[Int](600)
    assert(Flac.decode(Flac.encodePcm(16000, 1, 16, silent,
      blockSize = 192)).samples === silent)
    val dc = Array.fill(300)(-12345)
    assert(Flac.decode(Flac.encodePcm(16000, 1, 16, dc)).samples === dc)
    // wasted bits: every sample a multiple of 8 (3 trailing zero bits)
    val shifted = walk(17, 500, amp = 2000).map(_ * 8)
    val ws = Flac.encodePcm(22050, 1, 16, shifted, blockSize = 128)
    assert(Flac.decode(ws).samples === shifted)
    // verbatim ALSO honors wasted bits
    assert(Flac.decode(Flac.encodePcm(22050, 1, 16, shifted,
      blockSize = 128, subframeMode = "verbatim")).samples === shifted)
    // 8-bit and 24-bit widths
    val s8 = walk(19, 400, amp = 100)
    assert(Flac.decode(Flac.encodePcm(11025, 1, 8, s8)).samples === s8)
    val s24 = walk(23, 400, amp = 4000000)
    assert(Flac.decode(Flac.encodePcm(96000, 1, 24, s24)).samples === s24)
    // 8 independent channels
    val s8ch = walk(29, 8 * 200, amp = 1000)
    val p = Flac.decode(Flac.encodePcm(32000, 8, 16, s8ch, blockSize = 64))
    assert(p.nChannels === 8 && p.samples === s8ch)
  }

  test("non-table block sizes and sample rates ride the explicit header fields") {
    val s = walk(31, 500)
    for (bs <- Seq(192, 576, 100, 256, 300, 4096);
        rate <- Seq(8000, 44100, 12345, 655349, 44000)) {
      val p = Flac.decode(Flac.encodePcm(rate, 1, 16, s, blockSize = bs))
      assert(p.sampleRate === rate, s"bs=$bs rate=$rate")
      assert(p.samples === s, s"bs=$bs rate=$rate")
    }
  }

  test("meta and decode agree on the stream; transcode is sample-exact") {
    val s = walk(37, 2000)
    val bytes = Flac.encodePcm(16000, 1, 16, s, blockSize = 1024)
    val md = Flac.meta(bytes)
    assert(md.sampleRate === 16000 && md.nChannels === 1 &&
      md.bitsPerSample === 16 && md.totalSamples === 2000L)
    val p = Flac.decode(bytes)
    assert(p.nFrames === md.totalSamples)
    // the lossless law: two DIFFERENT encodings of the same master
    // decode identically (the m_flac_dedup foundation)
    val other = Flac.encodePcm(16000, 1, 16, s, blockSize = 256,
      subframeMode = "lpc", partOrder = 2)
    assert(!java.util.Arrays.equals(bytes, other))
    assert(Flac.decode(other).samples === p.samples)
  }

  test("structural refusals: crc rot, sync loss, truncation, number chain, cap") {
    val s = walk(41, 600)
    val good = Flac.encodePcm(8000, 1, 16, s, blockSize = 256)
    def bad(mut: Array[Byte] => Unit): Array[Byte] = {
      val b = good.clone(); mut(b); b
    }
    // flip one bit in the last frame's payload → CRC-16 breaks
    intercept[IllegalArgumentException](Flac.decode(
      bad(b => b(b.length - 5) = (b(b.length - 5) ^ 0x10).toByte)))
    // flip a bit inside the FIRST frame header → CRC-8 breaks
    val audioStart = 4 + 4 + 34
    intercept[IllegalArgumentException](Flac.decode(
      bad(b => b(audioStart + 2) = (b(audioStart + 2) ^ 0x01).toByte)))
    // truncation mid-frame
    intercept[IllegalArgumentException](Flac.decode(
      java.util.Arrays.copyOfRange(good, 0, good.length - 3)))
    // trailing junk after the declared total
    intercept[IllegalArgumentException](Flac.decode(
      good ++ Array[Byte](0x00)))
    // a declared total the frames cannot fill (patch STREAMINFO total)
    intercept[IllegalArgumentException](Flac.decode(
      bad(b => b(8 + 17) = (b(8 + 17) ^ 0x01).toByte)))
    // decode cap: a declared 2^36-ish total refuses before allocation
    val bomb = Flac.encode(8000, 8, 16, (1L << 35) + 7)
    val e = intercept[IllegalArgumentException](Flac.decode(bomb))
    assert(e.getMessage.contains("decode cap"))
    // the metadata walk refuses exactly like meta (shared entry)
    intercept[IllegalArgumentException](
      Flac.decode("not flac at all".getBytes))
  }

  test("pipeline: decodeAudio dispatches FLAC to the same stats as WAV") {
    import spark.implicits._
    import graft.ops.Multimodal
    val docs = (0L until 16L).toDF("doc_id")
    val wavStats = Multimodal.decodeAudio(
        Multimodal.wavMediaFromDocuments(docs))
      .orderBy("media_id").collect().toSeq
    val flacStats = Multimodal.decodeAudio(
        Multimodal.flacPcmMediaFromDocuments(docs))
      .orderBy("media_id").collect().toSeq
    assert(flacStats === wavStats,
      "lossless: the FLAC re-encode must decode to identical stats")
  }

  test("pipeline: WAV<->FLAC transcodes and resamples pair at hamming 0; controls pair with nothing") {
    import spark.implicits._
    import graft.ops.Multimodal
    val docs = (0L until 16L).toDF("doc_id") // 4 groups of 4
    val media = Multimodal.dedupTranscodeAudioFromDocuments(docs)
    val pairs = Multimodal.audioNearDupPairs(media).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSet
    val want = (for {
      g <- 0L until 4L
      a <- 0L until 3L; b <- 0L until 3L if a < b
    } yield (g * 4 + a, g * 4 + b, 0L, 0L)).toSet
    assert(pairs === want,
      "each {WAV, FLAC, 32k-FLAC} triple pairs fully; controls never")
    // the resampled WAV cohorts: master pairs its 32 kHz upsample,
    // the independent same-rate control pairs nothing
    val rs = Multimodal.resampledAudioCohortsFromDocuments(docs)
    val rsPairs = Multimodal.audioNearDupPairs(rs).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSet
    val rsWant = (0L until 4L).map(g =>
      (7000000L + 3 * g, 7000000L + 3 * g + 1, 0L, 0L)).toSet
    assert(rsPairs === rsWant)
  }

  test("pipeline: the audio index freezes the rate convention; cross-convention probes fail loud") {
    import spark.implicits._
    import graft.ops.Multimodal
    val docs = (0L until 8L).toDF("doc_id")
    val media = Multimodal.dedupAudioMediaFromDocuments(docs)
    val idx = Multimodal.audioSignatureIndex(media).localCheckpoint()
    assert(Multimodal.indexAudioRate(idx) === Multimodal.AudioFp.IndexRate)
    // probing works against a matching-convention index
    assert(Multimodal.audioAgainstIndex(media.limit(2), idx).count() >= 0L)
    // an index claiming another internal rate refuses
    val alien = new org.apache.spark.sql.types.MetadataBuilder()
      .putLong(Multimodal.AudioRateKey, 44100L).build()
    val crossIdx = idx.withColumn("sig", col("sig").as("sig", alien))
    val e = intercept[IllegalArgumentException](
      Multimodal.audioAgainstIndex(media.limit(2), crossIdx).count())
    assert(e.getMessage.contains("rebuild"))
  }

  test("an ID3v2-tagged stream decodes from past the tag") {
    val s = walk(43, 300)
    val flac = Flac.encodePcm(22050, 1, 16, s)
    val tag = {
      val out = new java.io.ByteArrayOutputStream()
      out.write("ID3".getBytes("US-ASCII"), 0, 3)
      out.write(4); out.write(0); out.write(0)
      out.write(0); out.write(0); out.write(0); out.write(24)
      for (j <- 0 until 24) out.write(j)
      out.toByteArray
    }
    val p = Flac.decode(tag ++ flac)
    assert(p.sampleRate === 22050 && p.samples === s)
  }
}
