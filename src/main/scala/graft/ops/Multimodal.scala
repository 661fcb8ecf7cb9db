package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/**
 * Multimodal (image/audio/video) column plumbing for training-data
 * pipelines. Media rides as opaque `binary` columns + typed metadata;
 * decode / feature-extract / resize / frame-sample are per-partition
 * batch kernels.
 *
 * !!! STUB NOTICE !!!
 * The actual codecs (JPEG/PNG/ffmpeg) are NOT available in this
 * container. `decodeStub` below is a clearly-marked DETERMINISTIC FAKE:
 * it derives pseudo-features from a hash of the bytes. The Spark-side
 * contract — schema, partitioning, batch shape, null/corrupt handling —
 * is real and tested; swapping in a real decoder only replaces the
 * innards of the fake.
 *
 * Scale notes: media bytes dominate row size, so ops repartition by
 * bucket(media_ref) before any wide transform to spread hot buckets, and
 * feature extraction emits ONLY features + metadata (never re-emits the
 * bytes) so downstream shuffles stay narrow.
 */
object Multimodal {

  val mediaSchema: StructType = StructType(Seq(
    StructField("media_ref", StringType, nullable = false),
    StructField("bytes", BinaryType),
    StructField("mime", StringType),
    StructField("width", IntegerType),
    StructField("height", IntegerType),
    StructField("duration_ms", LongType)))

  case class MediaFeature(media_ref: String, mime: String, ok: Boolean,
                          feature: Array[Float])

  /** Deterministic fake decoder: bytes -> 16-dim feature. A real decoder
    * replaces ONLY the body marked STUB. */
  def decodeStub(bytes: Array[Byte]): Array[Float] = {
    // STUB: pseudo-features from a rolling hash of the payload — stands in
    // for image decode + embedding; deterministic for testability.
    if (bytes == null) return null
    var h = 1125899906842597L
    val out = new Array[Float](16)
    var i = 0
    while (i < bytes.length) { h = 31 * h + bytes(i); i += 1 }
    var b = 0
    while (b < 16) {
      val v = (h ^ (h >>> (b + 1))) * 0x9E3779B97F4A7C15L
      out(b) = ((v >>> 11).toDouble / (1L << 53).toDouble).toFloat
      b += 1
    }
    out
  }

  /**
   * Batched feature extraction: repartition by media_ref bucket (spreads
   * skewed sources), then per-partition decode. The mapPartitions batch
   * shape mirrors what a vectorised (Arrow/pandas-style) UDF would see.
   */
  def extractFeatures(media: DataFrame, buckets: Int = 0): Dataset[MediaFeature] = {
    val spark = media.sparkSession
    import spark.implicits._
    val parted = if (buckets > 0)
      media.repartition(buckets, pmod(xxhash64(col("media_ref")), lit(buckets))) else media
    parted.select(col("media_ref"), col("bytes"), col("mime"))
      .as[(String, Array[Byte], String)]
      .mapPartitions { it =>
        it.map { case (ref, bytes, mime) =>
          val f = decodeStub(bytes)
          MediaFeature(ref, mime, f != null, f)
        }
      }
  }

  /** Frame sampling plan for video rows: every `everyMs` ms up to `maxFrames`
    * — emits (media_ref, frame_idx, ts_ms); the decode of each frame is the
    * same stubbed kernel. Pure expressions; no bytes move. */
  def sampleFrames(media: DataFrame, everyMs: Long = 1000L, maxFrames: Int = 32): DataFrame =
    media.filter(col("duration_ms").isNotNull && col("duration_ms") > 0)
      .select(col("media_ref"),
        posexplode(sequence(lit(0L),
          least(floor(col("duration_ms") / everyMs).cast("long"),
            lit(maxFrames.toLong - 1)))).as(Seq("frame_idx", "step")))
      .select(col("media_ref"), col("frame_idx"), (col("step") * everyMs).as("ts_ms"))

  /** Resize metadata op: target box (fit-within, preserve aspect); the pixel
    * work is the stubbed kernel, the plan/metadata math is real. */
  def resizePlan(media: DataFrame, maxW: Int, maxH: Int): DataFrame = {
    val scale = least(lit(maxW).cast("double") / col("width"),
      least(lit(maxH).cast("double") / col("height"), lit(1.0)))
    media.filter(col("width").isNotNull && col("height").isNotNull)
      .withColumn("target_w", floor(col("width") * scale).cast("int"))
      .withColumn("target_h", floor(col("height") * scale).cast("int"))
      .select(col("media_ref"), col("width"), col("height"),
        col("target_w"), col("target_h"))
  }

  /** Deterministic fake media table derived from any string column — used
    * by tests/bench to exercise the plumbing without real files. */
  def syntheticMedia(refs: DataFrame, refCol: String): DataFrame =
    refs.select(col(refCol).as("media_ref"))
      .withColumn("bytes",
        // STUB payload: the ref's bytes repeated — deterministic
        encode(concat_ws("|", col("media_ref"), col("media_ref")), "UTF-8"))
      .withColumn("mime", when(xxhash64(col("media_ref")) % 2 === 0, "image/png")
        .otherwise("video/mp4"))
      .withColumn("width", (pmod(xxhash64(col("media_ref"), lit(1)), lit(1920)) + 16).cast("int"))
      .withColumn("height", (pmod(xxhash64(col("media_ref"), lit(2)), lit(1080)) + 16).cast("int"))
      .withColumn("duration_ms", when(col("mime") === "video/mp4",
        pmod(xxhash64(col("media_ref"), lit(3)), lit(60000L))).otherwise(lit(null).cast("long")))
}
