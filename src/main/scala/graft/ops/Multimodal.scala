package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal-column plumbing: image/audio/video as opaque `binary` columns
  * with typed metadata, plus decode / feature-extract / resize /
  * frame-sample operators.
  *
  * Decode comes in two tiers:
  *  - UNCOMPRESSED formats are decoded FOR REAL in pure Scala —
  *    [[decodeImages]] parses binary PPM (P6) rasters end-to-end (header,
  *    raster, per-channel stats, nearest-neighbor thumbnail), no external
  *    codec needed.
  *  - COMPRESSED codecs (JPEG/MP3/H.264) are STUBBED with a deterministic
  *    fake in [[decodeAndFeaturize]] (this container has no codec
  *    libraries — in a PySpark deployment the stub body becomes a Pandas
  *    UDF over mapInPandas with the same row contract; in Scala, a JNI
  *    codec inside the same mapPartitions). The Spark-side plumbing
  *    (schema, batch shape, partitioning, operator signatures) is real and
  *    tested in both tiers.
  */
object Multimodal {

  /** Canonical media-table schema: opaque bytes + typed metadata. */
  val mediaSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("kind", StringType, nullable = false), // image | audio | video
    StructField("bytes", BinaryType, nullable = false),
    StructField("meta", StructType(Seq(
      StructField("width", IntegerType),
      StructField("height", IntegerType),
      StructField("sample_rate", IntegerType),
      StructField("duration_ms", LongType))))))

  /** Build a synthetic media table from the documents table: text bytes play
    * the role of encoded media; metadata is derived deterministically. This
    * exercises the exact schema/partition/batch path a real corpus would. */
  def mediaFromDocuments(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id").as("media_id"),
      element_at(array(lit("image"), lit("audio"), lit("video")),
        (pmod(col("doc_id"), lit(3)) + 1).cast("int")).as("kind"),
      encode(col("text"), "UTF-8").as("bytes"),
      struct(
        (pmod(col("doc_id"), lit(64)) * 16 + 16).cast("int").as("width"),
        (pmod(col("doc_id"), lit(48)) * 16 + 16).cast("int").as("height"),
        lit(16000).as("sample_rate"),
        (col("n_chars") * 10).cast("long").as("duration_ms")).as("meta"))

  final case class MediaRow(media_id: Long, kind: String, bytes: Array[Byte],
      width: Int, height: Int, duration_ms: Long)
  final case class DecodedRow(media_id: Long, kind: String, n_bytes: Long,
      checksum: Long, feature: Array[Float])

  /** STUB decode: a real implementation would inflate `bytes` with an image/
    * audio codec here. The deterministic fake derives a per-chunk checksum
    * and a fixed-width feature vector from the raw bytes, preserving the
    * real operator's contract: binary in → fixed-schema features out,
    * batch-at-a-time per partition, no driver involvement. */
  def decodeAndFeaturize(spark: SparkSession, media: DataFrame,
      featureDim: Int = 16): DataFrame = {
    import spark.implicits._
    val flat = media.select(col("media_id"), col("kind"), col("bytes"),
        col("meta.width"), col("meta.height"), col("meta.duration_ms"))
      .as[MediaRow]
    flat.mapPartitions { it =>
      // Batch shape: one partition = one codec session (a real codec would
      // be opened once here, amortized across the partition's rows).
      it.map { m =>
        val bytes = m.bytes
        var checksum = 1469598103934665603L // FNV-1a 64
        var i = 0
        while (i < bytes.length) {
          checksum = (checksum ^ (bytes(i) & 0xffL)) * 1099511628211L
          i += 1
        }
        val feature = new Array[Float](featureDim)
        i = 0
        while (i < bytes.length) {
          feature(i % featureDim) += (bytes(i) & 0xff) / 255.0f
          i += 1
        }
        DecodedRow(m.media_id, m.kind, bytes.length.toLong, checksum, feature)
      }
    }.toDF()
  }

  // ---- real decode tier: binary PPM (P6) ----

  /** Minimal binary-PPM (P6) codec — a real uncompressed image format,
    * decodable with zero external dependencies. */
  object Ppm {
    def encode(w: Int, h: Int, rgb: Array[Byte]): Array[Byte] = {
      require(rgb.length == w * h * 3, s"raster ${rgb.length} != ${w * h * 3}")
      val header = s"P6\n$w $h\n255\n".getBytes("US-ASCII")
      val out = new Array[Byte](header.length + rgb.length)
      System.arraycopy(header, 0, out, 0, header.length)
      System.arraycopy(rgb, 0, out, header.length, rgb.length)
      out
    }

    /** Parse a P6 image → (width, height, raster). Throws on malformed
      * input (callers choose skip-vs-fail, like CSV DROPMALFORMED). */
    def decode(bytes: Array[Byte]): (Int, Int, Array[Byte]) = {
      var i = 0
      def skipWs(): Unit = {
        while (i < bytes.length &&
          (bytes(i) == ' ' || bytes(i) == '\n' || bytes(i) == '\t' || bytes(i) == '\r')) i += 1
        if (i < bytes.length && bytes(i) == '#') { // comment line
          while (i < bytes.length && bytes(i) != '\n') i += 1
          skipWs()
        }
      }
      def int(): Int = {
        skipWs()
        var v = 0
        val start = i
        while (i < bytes.length && bytes(i) >= '0' && bytes(i) <= '9') {
          v = v * 10 + (bytes(i) - '0'); i += 1
        }
        require(i > start, s"expected integer at offset $start")
        v
      }
      require(bytes.length >= 2 && bytes(0) == 'P' && bytes(1) == '6', "not a P6 ppm")
      i = 2
      val w = int(); val h = int(); val maxVal = int()
      require(maxVal == 255, s"unsupported maxval $maxVal")
      i += 1 // single whitespace after maxval
      require(bytes.length - i >= w * h * 3, "truncated raster")
      (w, h, java.util.Arrays.copyOfRange(bytes, i, i + w * h * 3))
    }
  }

  /** Synthesize a REAL P6 image per document: deterministic gradient+hash
    * raster sized from doc_id. Exercises the actual encode→bytes→decode
    * path a real image corpus would take. */
  def ppmMediaFromDocuments(docs: DataFrame): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(col("doc_id")).as[Long].map { id =>
      val w = 4 + (id % 5).toInt
      val h = 3 + (id % 4).toInt
      val rgb = new Array[Byte](w * h * 3)
      var p = 0
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) {
          var z = id * 1000003L + y * 131L + x
          z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
          rgb(p) = ((x * 255) / math.max(w - 1, 1)).toByte
          rgb(p + 1) = ((y * 255) / math.max(h - 1, 1)).toByte
          rgb(p + 2) = (z & 0xff).toByte
          p += 3; x += 1
        }
        y += 1
      }
      (id, Ppm.encode(w, h, rgb))
    }.toDF("media_id", "bytes")
  }

  final case class ImageRow(media_id: Long, bytes: Array[Byte])
  final case class DecodedImage(media_id: Long, width: Int, height: Int,
      mean_r: Double, mean_g: Double, mean_b: Double, thumb: Array[Float])

  /** REAL image decode + feature extraction + resize, batch-at-a-time per
    * partition: parse the P6 raster, per-channel means (exact integer sums
    * → one IEEE division), and a `thumbSide`² nearest-neighbor RGB
    * thumbnail normalized to [0,1]. `skipMalformed` mirrors CSV
    * DROPMALFORMED: corrupt blobs are dropped instead of failing the job. */
  def decodeImages(media: DataFrame, thumbSide: Int = 2,
      skipMalformed: Boolean = true): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select(col("media_id"), col("bytes")).as[ImageRow].mapPartitions { it =>
      it.flatMap { m =>
        try {
          val (w, h, raster) = Ppm.decode(m.bytes)
          var (sr, sg, sb) = (0L, 0L, 0L)
          var p = 0
          while (p < raster.length) {
            sr += raster(p) & 0xff; sg += raster(p + 1) & 0xff; sb += raster(p + 2) & 0xff
            p += 3
          }
          val n = (w * h).toDouble
          val thumb = new Array[Float](thumbSide * thumbSide * 3)
          var ty = 0
          while (ty < thumbSide) {
            var tx = 0
            while (tx < thumbSide) {
              val sx = (tx * w) / thumbSide // nearest-neighbor source pixel
              val sy = (ty * h) / thumbSide
              val src = (sy * w + sx) * 3
              val dst = (ty * thumbSide + tx) * 3
              thumb(dst) = (raster(src) & 0xff) / 255.0f
              thumb(dst + 1) = (raster(src + 1) & 0xff) / 255.0f
              thumb(dst + 2) = (raster(src + 2) & 0xff) / 255.0f
              tx += 1
            }
            ty += 1
          }
          Iterator.single(DecodedImage(m.media_id, w, h, sr / n, sg / n, sb / n, thumb))
        } catch {
          case e: Exception if skipMalformed => Iterator.empty
          case e: Exception => throw new RuntimeException(
            s"malformed image for media_id ${m.media_id}", e)
        }
      }
    }.toDF()
  }

  /** Resize: pure metadata transform (the byte transform is the codec's job
    * and stays behind the stub boundary). */
  def resize(media: DataFrame, maxSide: Int): DataFrame = {
    val scale = least(
      lit(1.0),
      lit(maxSide) / greatest(col("meta.width"), col("meta.height")).cast("double"))
    media.withColumn("meta",
      struct(
        floor(col("meta.width") * scale).cast("int").as("width"),
        floor(col("meta.height") * scale).cast("int").as("height"),
        col("meta.sample_rate").as("sample_rate"),
        col("meta.duration_ms").as("duration_ms")))
  }

  /** Frame sampling for video rows: one output row per sampled frame at
    * `fps` frames/second — a generator (explode over a sequence), which
    * Spark distributes with no driver state; non-video rows pass through
    * with a single frame 0. */
  def sampleFrames(media: DataFrame, fps: Double = 1.0): DataFrame = {
    val nFrames = when(col("kind") === "video",
        greatest(floor(col("meta.duration_ms") / lit(1000.0) * fps).cast("long"), lit(1L)))
      .otherwise(lit(1L))
    media.withColumn("frame_idx",
        explode(sequence(lit(0L), nFrames - 1)))
      .withColumn("frame_ts_ms",
        (col("frame_idx") * lit(1000.0) / fps).cast("long"))
  }
}
