package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.ops.{Dedup, Multimodal}

/** Round-19 optimization probe: decompose the top bench rows into
  * fixture-synthesis vs index-build vs operator time so the round
  * optimizes the real wall, not the composed total (guide §1: measure
  * first, isolate with the noop sink). */
object ProfileR19 {
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
      spark.sparkContext.setJobDescription(label)
      val t0 = System.nanoTime()
      val r = f
      println(f"[p19] $label%-44s ${(System.nanoTime() - t0) / 1e9}%8.3f s")
      spark.sparkContext.setJobDescription(null)
      r
    }

    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    time("docs warm")(docs.count())

    // ---- per-cohort fixture synthesis cost (the mixedMediaFixture legs)
    time("fix: dedupImageMedia (ppm/qoi)")(
      noop(Multimodal.dedupImageMediaFromDocuments(docs)))
    time("fix: dedupAudioMedia (wav)")(
      noop(Multimodal.dedupAudioMediaFromDocuments(docs)))
    time("fix: dedupVideoMedia (y4m)")(
      noop(Multimodal.dedupVideoMediaFromDocuments(docs)))
    time("fix: pngDedupMedia")(
      noop(Multimodal.pngDedupMediaFromDocuments(docs)))
    time("fix: webpDedupMedia (vp8l)")(
      noop(Multimodal.webpDedupMediaFromDocuments(docs)))
    time("fix: lossyWebpMedia")(
      noop(Multimodal.lossyWebpMediaFromDocuments(docs)))
    time("fix: dedupTranscodeAudio (flac)")(
      noop(Multimodal.dedupTranscodeAudioFromDocuments(docs)))
    time("fix: resampledAudioCohorts")(
      noop(Multimodal.resampledAudioCohortsFromDocuments(docs)))
    time("fix: junkMediaFixture")(
      noop(Multimodal.junkMediaFixture(docs)))

    // ---- m_incr_media decomposition
    def mixedMedia(): DataFrame = {
      val img = Multimodal.dedupImageMediaFromDocuments(docs)
        .select("media_id", "bytes")
      val aud = Multimodal.dedupAudioMediaFromDocuments(docs)
        .select((col("media_id") + lit(2000000L)).as("media_id"), col("bytes"))
      val vid = Multimodal.dedupVideoMediaFromDocuments(docs)
        .select((col("media_id") + lit(4000000L)).as("media_id"), col("bytes"))
      val unk = docs.select((col("doc_id") + lit(6000000L)).as("media_id"),
        lit("unknown-container".getBytes).as("bytes"))
      val bad = docs.select((col("doc_id") + lit(8000000L)).as("media_id"),
        concat(lit("P6\ncorrupt-".getBytes),
          encode(floor(col("doc_id") / 4).cast("string"), "UTF-8")).as("bytes"))
      val png = Multimodal.pngDedupMediaFromDocuments(docs)
        .select((col("media_id") + lit(10000000L)).as("media_id"), col("bytes"))
      val webp = Multimodal.webpDedupMediaFromDocuments(docs)
        .select((col("media_id") + lit(12000000L)).as("media_id"), col("bytes"))
      val lossy = Multimodal.lossyWebpMediaFromDocuments(docs)
        .select((col("media_id") + lit(14000000L)).as("media_id"), col("bytes"))
      val flacT = Multimodal.dedupTranscodeAudioFromDocuments(docs)
        .select((col("media_id") + lit(22000000L)).as("media_id"), col("bytes"))
      img.unionByName(aud).unionByName(vid).unionByName(unk)
        .unionByName(bad).unionByName(png).unionByName(webp)
        .unionByName(lossy).unionByName(flacT)
    }
    val media = time("incr: fixture localCheckpoint")(
      mixedMedia().localCheckpoint())
    val tagged = time("incr: classifyMedia checkpoint")(
      Multimodal.classifyMedia(media.filter(col("media_id") % 4 === 0 ||
        col("media_id") % 4 === 3)).localCheckpoint())
    def cohort(m: String) = tagged.filter(col("modality") === m)
      .select("media_id", "bytes")
    val imgIdx = time("incr: imageSignatureIndex")(
      Multimodal.imageSignatureIndex(
        Multimodal.decodeAnyImages(cohort("image"), thumbSide = 8))
        .localCheckpoint())
    val audIdx = time("incr: audioSignatureIndex")(
      Multimodal.audioSignatureIndex(cohort("audio")).localCheckpoint())
    val vidIdx = time("incr: videoFrameIndex")(
      Multimodal.videoFrameIndex(cohort("video")).localCheckpoint())
    val blobIdx = time("incr: blobMd5Index")(
      Multimodal.blobMd5Index(tagged).localCheckpoint())
    val batch = media.filter(col("media_id") % 4 === 1 ||
      col("media_id") % 4 === 2)
    time("incr: incrementalMediaDedup operator")(
      noop(Multimodal.incrementalMediaDedup(batch, imgIdx, audIdx, vidIdx,
        blobIdx).orderBy("id_a", "id_b", "side", "kind")))

    // ---- m_gated_media decomposition (fixture reused from above media)
    val gatedCorpus = media.unionByName(
      Multimodal.junkMediaFixture(docs))
    val gated = time("gate: mediaMetaGate checkpoint")(
      Multimodal.mediaMetaGate(gatedCorpus, minSide = 8,
        maxPixels = 1000000L, minDurationMs = 5L, maxDurationMs = 5000L)
        .localCheckpoint())
    time("gate: routed dedup over kept + stars")(
      noop(Multimodal.gatedMediaDedup(gatedCorpus, minSide = 8,
        maxPixels = 1000000L, minDurationMs = 5L, maxDurationMs = 5000L)
        .orderBy("id_a", "id_b", "kind")))

    // ---- m_routed_media operator over a pre-checkpointed fixture
    time("routed: routedMediaDedup operator")(
      noop(Multimodal.routedMediaDedup(media).orderBy("id_a", "id_b")))

    // ---- m_flac_dedup decomposition
    val flacMedia = time("flacdedup: fixture checkpoint")(
      Multimodal.dedupTranscodeAudioFromDocuments(docs).localCheckpoint())
    time("flacdedup: audioNearDupPairs operator")(
      noop(Multimodal.audioNearDupPairs(flacMedia, maxHamming = 3)))

    // ---- m_dedup_pipeline decomposition
    val qmedia = time("mpipe: quality fixture checkpoint")(
      Multimodal.qualityImageMediaFromDocuments(docs)
        .select("media_id", "bytes").localCheckpoint())
    val dec = time("mpipe: decodeAnyImages checkpoint")(
      Multimodal.decodeAnyImages(qmedia, thumbSide = 8).localCheckpoint())
    val pairs = Multimodal.imageNearDupPairs(dec, maxHamming = 2)
    time("mpipe: pairs noop")(noop(pairs))
    val asDocs = qmedia.withColumnRenamed("media_id", "doc_id")
    val clusters = time("mpipe: dedupClusters checkpoint")(
      Dedup.dedupClusters(asDocs,
        Multimodal.imageNearDupPairs(dec, maxHamming = 2)).localCheckpoint())
    time("mpipe: clusters count")(clusters.count())

    spark.stop()
  }
}
