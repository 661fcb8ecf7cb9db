package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import java.awt.image.BufferedImage
import java.io.{ByteArrayInputStream, ByteArrayOutputStream}
import javax.imageio.ImageIO

/**
 * Multimodal (image/audio/video) column plumbing for training-data
 * pipelines. Media rides as opaque `binary` columns + typed metadata;
 * decode / feature-extract / resize / frame-sample are per-partition
 * batch kernels.
 *
 * IMAGE decode is REAL: `javax.imageio.ImageIO` ships in every JDK and
 * decodes PNG/JPEG/GIF/BMP with zero extra dependencies — bytes ->
 * BufferedImage -> a GRIDxGRID luma resample -> a CELLSxCELLS block-sum
 * feature vector (see [[imageFeature]]). AUDIO decode is REAL too:
 * `javax.sound.sampled.AudioSystem` (also in every JDK) decodes
 * WAV/AIFF/AU PCM — bytes -> 16-bit PCM frames -> a 256-point
 * nearest-neighbour resample of channel 0 -> a 16-cell block-sum
 * amplitude feature (see [[audioFeature]]). Corrupt/undecodable bytes
 * come back ok=false, never an exception (a 100 TB crawl always
 * contains garbage rows).
 *
 * !!! STUB NOTICE (video only) !!!
 * Video codecs (ffmpeg) are NOT available in this container.
 * `decodeStub` below is a clearly-marked DETERMINISTIC FAKE for video
 * mimes: it derives pseudo-features from a hash of the bytes. The
 * Spark-side contract — schema, partitioning, batch shape, null/corrupt
 * handling — is identical to the real image/audio paths.
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

  /** Luma resample grid (GRID x GRID samples) and feature layout
    * (CELLS x CELLS block sums). Each cell sums (GRID/CELLS)^2 = 16 luma
    * bytes (<= 16*255 = 4080) and divides by 4096 — an exact float (12
    * significand bits), so the feature survives float->double casts
    * bit-identically and an external oracle can recompute it in exact
    * integer arithmetic. */
  private val Grid = 16
  private val Cells = 4
  private val CellDiv = 4096.0f

  /** Real image decode: ImageIO (PNG/JPEG/GIF/BMP). Returns null on
    * null/corrupt/undecodable bytes — mapped to ok=false downstream. */
  def decodeImage(bytes: Array[Byte]): Array[Float] = {
    if (bytes == null) return null
    try {
      val img = ImageIO.read(new ByteArrayInputStream(bytes))
      if (img == null) null else imageFeature(img)
    } catch { case _: Exception => null }
  }

  /** GRIDxGRID nearest-neighbour luma resample -> CELLSxCELLS block-sum
    * feature. Luma is the integer ITU weighting (299r + 587g + 114b)/1000
    * — for grayscale pixels (r=g=b=v) it is exactly v. Sums accumulate in
    * Int (exact, order-free); one division at the end. */
  def imageFeature(img: BufferedImage): Array[Float] = {
    val w = img.getWidth
    val h = img.getHeight
    if (w <= 0 || h <= 0) return null
    val block = Grid / Cells
    val sums = new Array[Int](Cells * Cells)
    var y = 0
    while (y < Grid) {
      val sy = (y.toLong * h / Grid).toInt
      var x = 0
      while (x < Grid) {
        val sx = (x.toLong * w / Grid).toInt
        val rgb = img.getRGB(sx, sy)
        val luma = (299 * ((rgb >> 16) & 0xFF) + 587 * ((rgb >> 8) & 0xFF) +
          114 * (rgb & 0xFF)) / 1000
        sums((y / block) * Cells + (x / block)) += luma
        x += 1
      }
      y += 1
    }
    val out = new Array[Float](sums.length)
    var i = 0
    while (i < out.length) { out(i) = sums(i) / CellDiv; i += 1 }
    out
  }

  /** Audio resample layout, mirroring the image math: POINTS sample
    * points read across the clip (nearest neighbour, channel 0), each of
    * the 16 cells sums 16 points mapped to 0..255 (the high PCM byte
    * + 128, <= 16*255 = 4080) and divides by 4096 — an exact float, so
    * features survive float->double casts bit-identically and an
    * external oracle can recompute them in integer arithmetic. */
  private val AudioPoints = 256
  private val AudioCells = 16

  /** Real audio decode: javax.sound.sampled (WAV/AIFF/AU). Any sample
    * size/endianness/channel count is converted to 16-bit signed PCM
    * first; feature reads channel 0. Returns null on null/corrupt/
    * unsupported bytes — mapped to ok=false downstream. */
  def decodeAudio(bytes: Array[Byte]): Array[Float] = {
    if (bytes == null) return null
    try {
      val in = javax.sound.sampled.AudioSystem.getAudioInputStream(
        new ByteArrayInputStream(bytes))
      val src = in.getFormat
      val target = new javax.sound.sampled.AudioFormat(
        javax.sound.sampled.AudioFormat.Encoding.PCM_SIGNED,
        src.getSampleRate, 16, src.getChannels,
        src.getChannels * 2, src.getSampleRate, false)
      val pcm =
        if (src.matches(target)) in
        else javax.sound.sampled.AudioSystem.getAudioInputStream(target, in)
      audioFeature(pcm.readAllBytes(), pcm.getFormat.getChannels)
    } catch { case _: Exception => null }
  }

  /** POINTS-point nearest-neighbour resample of channel 0 -> 16-cell
    * block-sum feature. `data` is 16-bit signed little-endian PCM. Each
    * point maps the frame's high byte to 0..255 (hi + 128); sums
    * accumulate in Int (exact, order-free); one division at the end. */
  def audioFeature(data: Array[Byte], channels: Int): Array[Float] = {
    if (data == null || channels <= 0) return null
    val frameBytes = 2 * channels
    val frames = data.length / frameBytes
    if (frames <= 0) return null
    val block = AudioPoints / AudioCells
    val sums = new Array[Int](AudioCells)
    var k = 0
    while (k < AudioPoints) {
      val f = (k.toLong * frames / AudioPoints).toInt
      // high byte of channel 0's little-endian 16-bit sample, biased to 0..255
      sums(k / block) += data(f * frameBytes + 1) + 128
      k += 1
    }
    val out = new Array[Float](AudioCells)
    var i = 0
    while (i < out.length) { out(i) = sums(i) / CellDiv; i += 1 }
    out
  }

  /** Deterministic fake decoder for mimes whose codecs are not in this
    * container (video): bytes -> 16-dim feature. A real decoder
    * replaces ONLY the body marked STUB. */
  def decodeStub(bytes: Array[Byte]): Array[Float] = {
    // STUB: pseudo-features from a rolling hash of the payload — stands in
    // for audio/video decode + embedding; deterministic for testability.
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

  /** Mime dispatch: images and audio decode for real, everything else
    * (video) hits the labeled stub. */
  def decode(bytes: Array[Byte], mime: String): Array[Float] =
    if (mime != null && mime.startsWith("image/")) decodeImage(bytes)
    else if (mime != null && mime.startsWith("audio/")) decodeAudio(bytes)
    else decodeStub(bytes)

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
          val f = decode(bytes, mime)
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
    * work is the decode kernel, the plan/metadata math is real. */
  def resizePlan(media: DataFrame, maxW: Int, maxH: Int): DataFrame = {
    val scale = least(lit(maxW).cast("double") / col("width"),
      least(lit(maxH).cast("double") / col("height"), lit(1.0)))
    media.filter(col("width").isNotNull && col("height").isNotNull)
      .withColumn("target_w", floor(col("width") * scale).cast("int"))
      .withColumn("target_h", floor(col("height") * scale).cast("int"))
      .select(col("media_ref"), col("width"), col("height"),
        col("target_w"), col("target_h"))
  }

  /** Additive char-code seed of a ref, mod 256 — deliberately trivial so
    * an external SQL oracle can recompute it per ref. */
  def refSeed(ref: String): Int = {
    var s = 0L
    var i = 0
    while (i < ref.length) { s += ref.charAt(i).toInt; i += 1 }
    (s % 256).toInt
  }

  /** A REAL deterministic 16x16 grayscale PNG for a ref: pixel(x, y) =
    * (seed + 31x + 17y) mod 256 in all three channels. ImageIO's PNG
    * writer emits no timestamps, so the bytes are a pure function of the
    * ref — and the expected post-decode feature is closed-form integer
    * math an external oracle recomputes without touching PNG at all
    * (which is exactly what makes the encode->decode->feature round trip
    * independently checkable). */
  def syntheticPng(ref: String): Array[Byte] = {
    val img = new BufferedImage(Grid, Grid, BufferedImage.TYPE_INT_RGB)
    val seed = refSeed(ref)
    var y = 0
    while (y < Grid) {
      var x = 0
      while (x < Grid) {
        val v = (seed + 31 * x + 17 * y) % 256
        img.setRGB(x, y, (v << 16) | (v << 8) | v)
        x += 1
      }
      y += 1
    }
    val bos = new ByteArrayOutputStream()
    ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  /** A REAL deterministic mono PCM16 WAV for a ref: 400 samples at 8 kHz,
    * sample(i) = (((seed + 7i) mod 256) - 128) << 8 — so the decoded
    * point value (high byte + 128) is exactly (seed + 7i) mod 256, the
    * same closed-form family as [[syntheticPng]]. The 44-byte canonical
    * RIFF header is written by hand: the bytes are a pure function of the
    * ref, and the expected post-decode feature is integer math an
    * external oracle recomputes without touching WAV at all. */
  val WavSamples = 400

  def syntheticWav(ref: String): Array[Byte] = {
    val sr = 8000
    val seed = refSeed(ref)
    val dataLen = WavSamples * 2
    val bb = java.nio.ByteBuffer.allocate(44 + dataLen)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.put("RIFF".getBytes("US-ASCII")).putInt(36 + dataLen)
      .put("WAVE".getBytes("US-ASCII")).put("fmt ".getBytes("US-ASCII"))
      .putInt(16).putShort(1).putShort(1).putInt(sr).putInt(sr * 2)
      .putShort(2).putShort(16)
      .put("data".getBytes("US-ASCII")).putInt(dataLen)
    var i = 0
    while (i < WavSamples) {
      bb.putShort(((((seed + 7 * i) % 256) - 128) << 8).toShort)
      i += 1
    }
    bb.array()
  }

  private val syntheticPngUdf = udf((ref: String) => syntheticPng(ref))
  private val syntheticWavUdf = udf((ref: String) => syntheticWav(ref))

  /** Deterministic fake media table derived from any string column — used
    * by tests/bench to exercise the plumbing without real files. Image
    * rows carry REAL PNG bytes ([[syntheticPng]]), audio rows REAL WAV
    * bytes ([[syntheticWav]]); video rows carry a stub payload for the
    * labeled stub decoder. The three-way split keys on the last char's
    * code mod 3 (0=image, 1=audio, 2=video) — SQL-expressible, so oracles
    * can recompute the mime column. */
  def syntheticMedia(refs: DataFrame, refCol: String): DataFrame = {
    val kind = pmod(ascii(substring(col("media_ref"), -1, 1)), lit(3))
    val isImage = kind === 0
    val isAudio = kind === 1
    refs.select(col(refCol).cast("string").as("media_ref"))
      .withColumn("mime", when(isImage, "image/png")
        .when(isAudio, "audio/wav").otherwise("video/mp4"))
      .withColumn("bytes", when(isImage, syntheticPngUdf(col("media_ref")))
        .when(isAudio, syntheticWavUdf(col("media_ref")))
        // STUB payload: the ref's bytes repeated — deterministic
        .otherwise(encode(concat_ws("|", col("media_ref"), col("media_ref")), "UTF-8")))
      .withColumn("width", when(isImage, lit(Grid))
        .when(isAudio, lit(null).cast("int"))
        .otherwise((pmod(xxhash64(col("media_ref"), lit(1)), lit(1920)) + 16).cast("int")))
      .withColumn("height", when(isImage, lit(Grid))
        .when(isAudio, lit(null).cast("int"))
        .otherwise((pmod(xxhash64(col("media_ref"), lit(2)), lit(1080)) + 16).cast("int")))
      .withColumn("duration_ms",
        when(col("mime") === "video/mp4",
          pmod(xxhash64(col("media_ref"), lit(3)), lit(60000L)))
        .when(isAudio, lit(WavSamples * 1000L / 8000L))
        .otherwise(lit(null).cast("long")))
  }
}
