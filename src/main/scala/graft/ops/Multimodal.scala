package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal-column plumbing: image/audio/video as opaque `binary` columns
  * with typed metadata, plus decode / feature-extract / resize /
  * frame-sample operators.
  *
  * The Spark-side plumbing (schema, batch shape, partitioning, operator
  * signatures) is real and tested; the codec itself is STUBBED with a
  * deterministic fake (this container has no image/audio libraries — in a
  * PySpark deployment the stub body becomes a Pandas UDF over mapInPandas
  * with the same row contract; in Scala, a JNI codec inside the same
  * mapPartitions).
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
