package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Round-19 probe #2: leg-level decomposition of the routed/incremental
  * media operators at sf0.1, plus single-thread codec CPU floors.
  * Lives in graft.ops to reach private[graft] helpers. */
object ProfileR19b {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.files.maxPartitionBytes", "16m")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1000000L).selectExpr("sum(id)").collect()
    spark.range(1000L).repartition(8).count()

    def noop(df: DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()
    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[p19b] $label%-46s ${(System.nanoTime() - t0) / 1e9}%8.3f s")
      r
    }

    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    docs.count()

    // ---- single-thread CPU floors (decode + fingerprint path) ----
    def firstBytes(df: DataFrame, n: Int): Array[Array[Byte]] =
      df.limit(n).collect().map(_.getAs[Array[Byte]]("bytes"))
    def fpOf(b: Array[Byte]): Unit = {
      val (rate, s) = Multimodal.decodePcm16(b)
      Multimodal.AudioFp.frameWords(
        Multimodal.AudioFp.resampleTo(s, rate, Multimodal.AudioFp.IndexRate))
    }
    {
      val wav = firstBytes(Multimodal.dedupAudioMediaFromDocuments(docs), 2000)
      var t0 = System.nanoTime()
      wav.foreach(b => try fpOf(b) catch { case _: Exception => () })
      println(f"[p19b] cpu: wav decode+goertzel fp (2000)          ${(System.nanoTime() - t0) / 1e9}%8.3f s")
      val flac = firstBytes(
        Multimodal.dedupTranscodeAudioFromDocuments(docs), 2000)
      t0 = System.nanoTime()
      flac.foreach(b => try fpOf(b) catch { case _: Exception => () })
      println(f"[p19b] cpu: wav/flac transcode decode+fp (2000)    ${(System.nanoTime() - t0) / 1e9}%8.3f s")
      t0 = System.nanoTime()
      var i = 0L
      while (i < 500) {
        val s = Array.tabulate(1536)(j =>
          (Multimodal.splitmix64(i + j / 8) % 8000L).toInt)
        Flac.encodePcm(32000, 1, 16, s)
        i += 1
      }
      println(f"[p19b] cpu: flac encode 1536-sample clips (500)    ${(System.nanoTime() - t0) / 1e9}%8.3f s")
      val jpg = firstBytes(Multimodal.jpegMediaFromDocuments(docs), 2000)
      t0 = System.nanoTime()
      jpg.foreach(b => try Jpeg.decode(b) catch { case _: Exception => () })
      println(f"[p19b] cpu: jpeg decode (2000)                     ${(System.nanoTime() - t0) / 1e9}%8.3f s")
      val webp = firstBytes(Multimodal.webpDedupMediaFromDocuments(docs), 2000)
      t0 = System.nanoTime()
      webp.foreach(b => try Webp.decode(b) catch { case _: Exception => () })
      println(f"[p19b] cpu: webp/vp8l decode (2000)                ${(System.nanoTime() - t0) / 1e9}%8.3f s")
      val png = firstBytes(Multimodal.pngDedupMediaFromDocuments(docs), 2000)
      t0 = System.nanoTime()
      png.foreach(b => try Png.decode(b) catch { case _: Exception => () })
      println(f"[p19b] cpu: png decode (2000)                      ${(System.nanoTime() - t0) / 1e9}%8.3f s")
      val y4m = firstBytes(Multimodal.dedupVideoMediaFromDocuments(docs), 2000)
      t0 = System.nanoTime()
      y4m.foreach(b => try Multimodal.Y4m.decode(b) catch { case _: Exception => () })
      println(f"[p19b] cpu: y4m decode (2000)                      ${(System.nanoTime() - t0) / 1e9}%8.3f s")
    }

    // ---- per-cohort decode tiers through Spark (noop sink) ----
    def off(df: DataFrame, o: Long) = df.select(
      (col("media_id") + lit(o)).as("media_id"), col("bytes"))
    val img0 = Multimodal.dedupImageMediaFromDocuments(docs)
      .select("media_id", "bytes")
    val png = off(Multimodal.pngDedupMediaFromDocuments(docs), 10000000L)
    val webp = off(Multimodal.webpDedupMediaFromDocuments(docs), 12000000L)
    val lossy = off(Multimodal.lossyWebpMediaFromDocuments(docs), 14000000L)
    val bad = docs.select((col("doc_id") + lit(8000000L)).as("media_id"),
      concat(lit("P6\ncorrupt-".getBytes),
        encode(floor(col("doc_id") / 4).cast("string"), "UTF-8")).as("bytes"))
    val imgAll = img0.unionByName(png).unionByName(webp).unionByName(lossy)
      .unionByName(bad).localCheckpoint()
    val aud = off(Multimodal.dedupAudioMediaFromDocuments(docs), 2000000L)
      .unionByName(off(Multimodal.dedupTranscodeAudioFromDocuments(docs),
        22000000L)).localCheckpoint()
    val vid = off(Multimodal.dedupVideoMediaFromDocuments(docs), 4000000L)
      .localCheckpoint()
    println(s"[p19b] cohort sizes img=${imgAll.count()} aud=${aud.count()} vid=${vid.count()}")

    time("leg: decodeAnyImages noop")(
      noop(Multimodal.decodeAnyImages(imgAll, thumbSide = 8)))
    time("leg: audioFingerprints noop")(
      noop(Multimodal.audioFingerprints(aud)))
    time("leg: videoFrameHashSets noop")(
      noop(Multimodal.videoFrameHashSets(vid)))
    time("leg: routedImageDedup within")(
      noop(Multimodal.routedImageDedup(imgAll)))
    time("leg: routedAudioDedup within")(
      noop(Multimodal.routedAudioDedup(aud)))
    time("leg: routedVideoDedup within")(
      noop(Multimodal.routedVideoDedup(vid)))
    val imgIdx = time("leg: imageSignatureIndex build")(
      Multimodal.imageSignatureIndex(
        Multimodal.decodeAnyImages(imgAll, thumbSide = 8)).localCheckpoint())
    val audIdx = time("leg: audioSignatureIndex build")(
      Multimodal.audioSignatureIndex(aud).localCheckpoint())
    val vidIdx = time("leg: videoFrameIndex build")(
      Multimodal.videoFrameIndex(vid).localCheckpoint())
    time("leg: imageNearDupAgainstIndex")(
      noop(Multimodal.imageNearDupAgainstIndex(imgAll, imgIdx)))
    time("leg: audioAgainstIndex")(
      noop(Multimodal.audioAgainstIndex(aud, audIdx)))
    time("leg: videoAgainstIndex")(
      noop(Multimodal.videoAgainstIndex(vid, vidIdx)))

    spark.stop()
  }
}
