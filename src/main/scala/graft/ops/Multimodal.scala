package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal-column plumbing for training-data pipelines: image/audio/
  * video payloads as opaque `binary` columns with a typed metadata struct,
  * plus the Spark-side shape of decode / feature-extract / resize /
  * frame-sample stages.
  *
  * All three modalities use REAL JDK codecs, exercised per-partition
  * (the Scala analog of a `mapInPandas` batch UDF):
  * images via `javax.imageio.ImageIO` (PNG/BMP — [[imagesFromIds]] /
  * [[decodeImages]]), audio via `javax.sound.sampled` (WAV/PCM —
  * [[audioFromIds]] / [[decodeAudio]]), and video via ImageIO's
  * multi-frame GIF sequence reader/writer ([[videoFromIds]] /
  * [[sampleFrames]] — decode container → frame-sample → per-frame
  * features). The generic byte-payload path keeps the deterministic
  * [[fakeDecodeKernel]] stand-in behind the same distributed plumbing
  * for payloads with no JDK codec (e.g. compressed video formats).
  */
object Multimodal {

  /** Canonical multimodal schema: payload + typed metadata. */
  val mediaSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("payload", BinaryType, nullable = true),
    StructField("meta", StructType(Seq(
      StructField("modality", StringType, nullable = false), // image|audio|video
      StructField("mime", StringType, nullable = false),
      StructField("width", IntegerType, nullable = true),
      StructField("height", IntegerType, nullable = true),
      StructField("duration_ms", LongType, nullable = true))), nullable = false)))

  /** Wrap a text/bytes source table into the media shape (payload =
    * UTF-8 bytes stand-in; real pipelines land bytes from object storage). */
  def packText(docs: DataFrame, modality: String = "image"): DataFrame =
    docs.select(
      col("doc_id").as("media_id"),
      col("text").cast("binary").as("payload"),
      struct(
        lit(modality).as("modality"),
        lit("application/octet-stream").as("mime"),
        (length(col("text")) % 1024 + 32).cast("int").as("width"),
        (length(col("text")) % 768 + 32).cast("int").as("height"),
        lit(null).cast("long").as("duration_ms")).as("meta"))

  /** Column-level payload statistics — pure expressions, codegen'd:
    * byte length, frame count at a byte stride ("frame sampling" shape),
    * and a content digest. */
  def payloadStats(media: DataFrame, frameStride: Int = 256): DataFrame =
    media.select(
      col("media_id"),
      col("meta.modality").as("modality"),
      length(col("payload")).as("n_bytes"),
      floor(length(col("payload")) / frameStride).cast("long").as("n_frames"),
      substring(md5(col("payload")), 1, 8).as("digest8"))

  /** Deterministic generic decode kernel — the stand-in for formats with
    * NO JDK codec (e.g. H.264, FLAC): real codecs for PNG/BMP (ImageIO),
    * WAV/PCM (javax.sound) and GIF video live in [[decodeImages]] /
    * [[decodeAudio]] / [[sampleFrames]]. This path emits a
    * stable 4-dim "embedding" derived from the payload's UTF-8 code
    * points — integer math (sum + polynomial left-fold mod prime) that an
    * oracle SQL engine reproduces exactly from the source text, so the
    * generic stage is hash-verifiable. */
  def fakeDecodeKernel(payload: Array[Byte]): Array[Float] = {
    // a codec-backed format would instead route through the real decoders

    if (payload == null || payload.isEmpty) Array(0f, 0f, 0f, 0f)
    else {
      val cps = new String(payload, java.nio.charset.StandardCharsets.UTF_8)
        .codePoints().toArray
      var a = 0L; var b = 0L
      var i = 0
      while (i < cps.length) {
        a += cps(i)
        b = (b * 31 + cps(i)) % 1000000007L
        i += 1
      }
      Array(
        (a % 1000).toFloat / 1000f,
        (b % 1000).toFloat / 1000f,
        cps.length.toFloat,
        cps(0).toFloat)
    }
  }

  /** Batch "decode" stage: per-partition iteration over payload batches —
    * the Scala analog of `mapInPandas` (batch in, batch out; constant
    * memory per partition; no driver collect). Output keeps the media_id
    * plus the decoded feature vector. */
  def decodeFeatures(media: DataFrame): DataFrame = {
    val outSchema = StructType(Seq(
      StructField("media_id", LongType, nullable = false),
      StructField("features", ArrayType(FloatType), nullable = false)))
    val enc = org.apache.spark.sql.Encoders.row(outSchema)
    val in = media.select("media_id", "payload")
    val out: Dataset[Row] = in.mapPartitions { rows =>
      rows.map { r =>
        Row(r.getLong(0), fakeDecodeKernel(r.getAs[Array[Byte]](1)).toSeq)
      }
    }(enc)
    out.toDF()
  }

  /** "Resize"/normalize stage on the decoded features (here: scale to unit
    * max — pure column math over the array). */
  def normalizeFeatures(features: DataFrame): DataFrame =
    features.withColumn("norm_features", expr(
      "transform(features, x -> CAST(x AS DOUBLE) / " +
        "greatest(CAST(aggregate(features, CAST(0.0 AS DOUBLE), " +
        "(acc, v) -> greatest(acc, abs(CAST(v AS DOUBLE)))) AS DOUBLE), 1e-9))"))

  // ----- real image codec path (javax.imageio — JDK-standard) -----

  /** Deterministic test-image pixel pattern: channel values are small
    * linear functions of (id, x, y) mod 256, so an oracle can recompute
    * the per-channel pixel sums arithmetically while the engine recovers
    * them by decoding the actual encoded bytes. Lossless formats only
    * (PNG/BMP) — the round-trip must be bit-exact for the sums to match. */
  @inline def patR(id: Long, x: Int, y: Int): Int = (((id + 2L * x + 3L * y) % 256) + 256).toInt % 256
  @inline def patG(id: Long, x: Int, y: Int): Int = (((3L * id + 5L * x + 7L * y) % 256) + 256).toInt % 256
  @inline def patB(id: Long, x: Int, y: Int): Int = (((7L * id + 11L * x + 13L * y) % 256) + 256).toInt % 256

  /** Width/height derived from the id (4..16 / 4..14) so every image has a
    * distinct small shape the oracle can rederive. */
  @inline def patW(id: Long): Int = (id % 13).toInt + 4
  @inline def patH(id: Long): Int = (id % 11).toInt + 4

  /** Encode the deterministic pattern image for `id` with a real codec
    * (`format` = "png" or "bmp"; both lossless in ImageIO). */
  def encodePatternImage(id: Long, format: String = "png"): Array[Byte] = {
    val w = patW(id); val h = patH(id)
    val img = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        img.setRGB(x, y, (patR(id, x, y) << 16) | (patG(id, x, y) << 8) | patB(id, x, y))
        x += 1
      }
      y += 1
    }
    val bos = new java.io.ByteArrayOutputStream()
    if (!javax.imageio.ImageIO.write(img, format, bos))
      throw new IllegalArgumentException(s"no ImageIO writer for format '$format'")
    bos.toByteArray
  }

  /** Executor-side image synthesis: each row becomes a media row whose
    * payload is REAL encoded image bytes (PNG by default). mapPartitions
    * so codec setup cost amortizes per partition, not per row. */
  def imagesFromIds(ids: DataFrame, format: String = "png"): DataFrame = {
    val outSchema = StructType(Seq(
      StructField("media_id", LongType, nullable = false),
      StructField("payload", BinaryType, nullable = false),
      StructField("meta", StructType(Seq(
        StructField("modality", StringType, nullable = false),
        StructField("mime", StringType, nullable = false),
        StructField("width", IntegerType, nullable = false),
        StructField("height", IntegerType, nullable = false),
        StructField("duration_ms", LongType, nullable = true))), nullable = false)))
    val enc = org.apache.spark.sql.Encoders.row(outSchema)
    val mime = s"image/$format"
    ids.select(col("media_id").cast("long")).mapPartitions { rows =>
      rows.map { r =>
        val id = r.getLong(0)
        Row(id, encodePatternImage(id, format),
          Row("image", mime, patW(id), patH(id), null))
      }
    }(enc).toDF()
  }

  // ----- real video path (multi-frame GIF via javax.imageio) -----

  /** Grayscale frame pattern: GIF is palette-indexed, so frames are
    * TYPE_BYTE_GRAY (256-gray palette — lossless through the codec) and
    * the oracle rederives per-frame pixel sums arithmetically. */
  @inline def patFrame(id: Long, f: Int, x: Int, y: Int): Int =
    (((7L * id + 13L * f + 3L * x + 5L * y) % 256L) + 256L).toInt % 256
  /** 2..6 frames per clip, id-derived. */
  @inline def patNFrames(id: Long): Int = (id % 5).toInt + 2

  /** Encode the pattern clip for `id` as a real multi-frame (animated)
    * GIF via ImageIO's sequence writer. */
  def encodePatternGif(id: Long): Array[Byte] = {
    val w = patW(id); val h = patH(id)
    val bos = new java.io.ByteArrayOutputStream()
    val writer = javax.imageio.ImageIO.getImageWritersByFormatName("gif").next()
    val ios = javax.imageio.ImageIO.createImageOutputStream(bos)
    try {
      writer.setOutput(ios)
      writer.prepareWriteSequence(null)
      // the JDK GIF writer defaults to INTERLACED output, and the frame
      // comes back row-scrambled through the reader — disable it; the
      // round-trip must be byte-exact for the oracle sums to match
      val param = writer.getDefaultWriteParam
      param.setProgressiveMode(javax.imageio.ImageWriteParam.MODE_DISABLED)
      // explicit 256-gray palette: GIF stores palette INDICES, so an
      // indexed image round-trips losslessly — a TYPE_BYTE_GRAY frame
      // would get re-quantized by the writer's own palette choice
      val grays = Array.tabulate[Byte](256)(_.toByte)
      val icm = new java.awt.image.IndexColorModel(8, 256, grays, grays, grays)
      var f = 0
      while (f < patNFrames(id)) {
        val img = new java.awt.image.BufferedImage(
          w, h, java.awt.image.BufferedImage.TYPE_BYTE_INDEXED, icm)
        val raster = img.getRaster
        var y = 0
        while (y < h) {
          var x = 0
          while (x < w) {
            raster.setSample(x, y, 0, patFrame(id, f, x, y))
            x += 1
          }
          y += 1
        }
        writer.writeToSequence(
          new javax.imageio.IIOImage(img, null, null), param)
        f += 1
      }
      writer.endWriteSequence()
    } finally {
      writer.dispose()
      ios.close()
    }
    bos.toByteArray
  }

  /** Executor-side video synthesis: one media row per id with REAL
    * animated-GIF bytes (video twin of [[imagesFromIds]]). */
  def videoFromIds(ids: DataFrame): DataFrame = {
    val outSchema = StructType(Seq(
      StructField("media_id", LongType, nullable = false),
      StructField("payload", BinaryType, nullable = false),
      StructField("meta", StructType(Seq(
        StructField("modality", StringType, nullable = false),
        StructField("mime", StringType, nullable = false),
        StructField("width", IntegerType, nullable = false),
        StructField("height", IntegerType, nullable = false),
        StructField("duration_ms", LongType, nullable = false))), nullable = false)))
    val enc = org.apache.spark.sql.Encoders.row(outSchema)
    ids.select(col("media_id").cast("long")).mapPartitions { rows =>
      rows.map { r =>
        val id = r.getLong(0)
        Row(id, encodePatternGif(id),
          Row("video", "image/gif", patW(id), patH(id),
            patNFrames(id).toLong * 100L))
      }
    }(enc).toDF()
  }

  /** Decode + FRAME-SAMPLE stage with a real codec: ImageIO's GIF reader
    * walks the frame sequence; every `stride`-th frame (0, stride,
    * 2·stride, …) contributes its gray-pixel sum — the standard
    * video-pipeline shape (decode container → sample frames → per-frame
    * features) with integer-exact output `(media_id, n_frames,
    * n_sampled, width, height, sum_sampled)`. */
  def sampleFrames(media: DataFrame, stride: Int = 2): DataFrame = {
    require(stride >= 1, "stride must be positive")
    val outSchema = StructType(Seq(
      StructField("media_id", LongType, nullable = false),
      StructField("n_frames", IntegerType, nullable = false),
      StructField("n_sampled", IntegerType, nullable = false),
      StructField("width", IntegerType, nullable = false),
      StructField("height", IntegerType, nullable = false),
      StructField("sum_sampled", LongType, nullable = false)))
    val enc = org.apache.spark.sql.Encoders.row(outSchema)
    media.select(col("media_id"), col("payload")).mapPartitions { rows =>
      rows.map { r =>
        val id = r.getLong(0)
        try {
          val iis = javax.imageio.ImageIO.createImageInputStream(
            new java.io.ByteArrayInputStream(r.getAs[Array[Byte]](1)))
          val reader = javax.imageio.ImageIO.getImageReaders(iis).next()
          try {
            reader.setInput(iis)
            val n = reader.getNumImages(true)
            var sampled = 0; var sum = 0L
            var w = -1; var h = -1
            var f = 0
            while (f < n) {
              if (f % stride == 0) {
                val img = reader.read(f)
                w = img.getWidth; h = img.getHeight
                var y = 0
                while (y < h) {
                  var x = 0
                  while (x < w) {
                    sum += img.getRGB(x, y) & 0xff // gray: b channel = value
                    x += 1
                  }
                  y += 1
                }
                sampled += 1
              }
              f += 1
            }
            Row(id, n, sampled, w, h, sum)
          } finally { reader.dispose(); iis.close() }
        } catch {
          case _: Exception => Row(id, -1, 0, -1, -1, 0L)
        }
      }
    }(enc).toDF()
  }

  // ----- real audio codec path (javax.sound.sampled — JDK-standard) -----

  /** Deterministic 16-bit PCM sample pattern — WAV is lossless, so the
    * decode below must recover these exact values from the encoded
    * container. */
  @inline def patSample(id: Long, i: Int): Int =
    ((31L * id + 7L * i) % 65536L).toInt - 32768
  /** 100..599 samples per clip, id-derived. */
  @inline def patNSamples(id: Long): Int = (id % 500).toInt + 100

  val AudioSampleRate = 8000f

  /** Encode the pattern clip for `id` as a real WAV file (RIFF container,
    * mono 16-bit little-endian PCM) via `AudioSystem.write`. */
  def encodePatternWav(id: Long): Array[Byte] = {
    val n = patNSamples(id)
    val pcm = new Array[Byte](n * 2)
    var i = 0
    while (i < n) {
      val s = patSample(id, i)
      pcm(2 * i) = (s & 0xff).toByte
      pcm(2 * i + 1) = ((s >> 8) & 0xff).toByte
      i += 1
    }
    val fmt = new javax.sound.sampled.AudioFormat(
      AudioSampleRate, 16, 1, true, false)
    val ais = new javax.sound.sampled.AudioInputStream(
      new java.io.ByteArrayInputStream(pcm), fmt, n.toLong)
    val bos = new java.io.ByteArrayOutputStream()
    javax.sound.sampled.AudioSystem.write(
      ais, javax.sound.sampled.AudioFileFormat.Type.WAVE, bos)
    bos.toByteArray
  }

  /** Executor-side audio synthesis: one media row per id with REAL WAV
    * bytes as the payload (audio twin of [[imagesFromIds]]). */
  def audioFromIds(ids: DataFrame): DataFrame = {
    val outSchema = StructType(Seq(
      StructField("media_id", LongType, nullable = false),
      StructField("payload", BinaryType, nullable = false),
      StructField("meta", StructType(Seq(
        StructField("modality", StringType, nullable = false),
        StructField("mime", StringType, nullable = false),
        StructField("width", IntegerType, nullable = true),
        StructField("height", IntegerType, nullable = true),
        StructField("duration_ms", LongType, nullable = false))), nullable = false)))
    val enc = org.apache.spark.sql.Encoders.row(outSchema)
    ids.select(col("media_id").cast("long")).mapPartitions { rows =>
      rows.map { r =>
        val id = r.getLong(0)
        val durMs = patNSamples(id).toLong * 1000L / AudioSampleRate.toLong
        Row(id, encodePatternWav(id), Row("audio", "audio/wav", null, null, durMs))
      }
    }(enc).toDF()
  }

  /** Decode stage with a REAL audio codec: `AudioSystem.getAudioInputStream`
    * parses the RIFF/WAV container, and the PCM frames are folded into
    * integer-exact stats `(n_samples, sample_rate, sum_pcm, min_pcm,
    * max_pcm)`. Undecodable payloads surface as n_samples = -1 rows. */
  def decodeAudio(media: DataFrame): DataFrame = {
    val outSchema = StructType(Seq(
      StructField("media_id", LongType, nullable = false),
      StructField("n_samples", LongType, nullable = false),
      StructField("sample_rate", IntegerType, nullable = false),
      StructField("sum_pcm", LongType, nullable = false),
      StructField("min_pcm", IntegerType, nullable = false),
      StructField("max_pcm", IntegerType, nullable = false)))
    val enc = org.apache.spark.sql.Encoders.row(outSchema)
    media.select(col("media_id"), col("payload")).mapPartitions { rows =>
      rows.map { r =>
        val id = r.getLong(0)
        try {
          val ais = javax.sound.sampled.AudioSystem.getAudioInputStream(
            new java.io.ByteArrayInputStream(r.getAs[Array[Byte]](1)))
          val fmt = ais.getFormat
          val bytes = ais.readAllBytes()
          val le = !fmt.isBigEndian
          var i = 0; var n = 0L; var sum = 0L
          var mn = Int.MaxValue; var mx = Int.MinValue
          while (i + 2 <= bytes.length) {
            val lo = bytes(i) & 0xff; val hi = bytes(i + 1) & 0xff
            val s = (if (le) (hi << 8) | lo else (lo << 8) | hi).toShort.toInt
            sum += s; if (s < mn) mn = s; if (s > mx) mx = s
            n += 1; i += 2
          }
          Row(id, n, fmt.getSampleRate.toInt, sum, mn, mx)
        } catch {
          case _: Exception => Row(id, -1L, -1, 0L, 0, 0)
        }
      }
    }(enc).toDF()
  }

  /** Nearest-neighbor image RESIZE — the canonical preprocess step of a
    * multimodal training pipeline (decode → resample to the model's
    * input grid → features), with the same executor-side batch-kernel
    * posture as [[decodeImages]]: real ImageIO decode per payload,
    * integer-exact NN sampling (`src = out·srcDim / outDim`, floor
    * division — no float interpolation, so the resampled channel sums
    * reproduce exactly from the source pattern), corrupt payloads
    * surface as -1 rows, not task failures. */
  def resizeImages(media: DataFrame, outW: Int, outH: Int): DataFrame = {
    require(outW > 0 && outH > 0, "output dimensions must be positive")
    val outSchema = StructType(Seq(
      StructField("media_id", LongType, nullable = false),
      StructField("width", IntegerType, nullable = false),
      StructField("height", IntegerType, nullable = false),
      StructField("sum_r", LongType, nullable = false),
      StructField("sum_g", LongType, nullable = false),
      StructField("sum_b", LongType, nullable = false)))
    val enc = org.apache.spark.sql.Encoders.row(outSchema)
    media.select(col("media_id"), col("payload")).mapPartitions { rows =>
      rows.map { r =>
        val id = r.getLong(0)
        val bytes = r.getAs[Array[Byte]](1)
        val img =
          if (bytes == null || bytes.isEmpty) null
          else
            try javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
            catch { case _: java.io.IOException => null }
        if (img == null) Row(id, -1, -1, 0L, 0L, 0L)
        else {
          val (w, h) = (img.getWidth, img.getHeight)
          var sr = 0L; var sg = 0L; var sb = 0L
          var y = 0
          while (y < outH) {
            val sy = y * h / outH
            var x = 0
            while (x < outW) {
              val rgb = img.getRGB(x * w / outW, sy)
              sr += (rgb >> 16) & 0xff; sg += (rgb >> 8) & 0xff; sb += rgb & 0xff
              x += 1
            }
            y += 1
          }
          Row(id, outW, outH, sr, sg, sb)
        }
      }
    }(enc).toDF()
  }

  def decodeImages(media: DataFrame): DataFrame = {
    val outSchema = StructType(Seq(
      StructField("media_id", LongType, nullable = false),
      StructField("width", IntegerType, nullable = false),
      StructField("height", IntegerType, nullable = false),
      StructField("sum_r", LongType, nullable = false),
      StructField("sum_g", LongType, nullable = false),
      StructField("sum_b", LongType, nullable = false)))
    val enc = org.apache.spark.sql.Encoders.row(outSchema)
    media.select(col("media_id"), col("payload")).mapPartitions { rows =>
      rows.map { r =>
        val id = r.getLong(0)
        val bytes = r.getAs[Array[Byte]](1)
        val img =
          if (bytes == null || bytes.isEmpty) null
          else
            try javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
            catch { case _: java.io.IOException => null }
        if (img == null) Row(id, -1, -1, 0L, 0L, 0L)
        else {
          var sr = 0L; var sg = 0L; var sb = 0L
          var y = 0
          while (y < img.getHeight) {
            var x = 0
            while (x < img.getWidth) {
              val rgb = img.getRGB(x, y)
              sr += (rgb >> 16) & 0xff; sg += (rgb >> 8) & 0xff; sb += rgb & 0xff
              x += 1
            }
            y += 1
          }
          Row(id, img.getWidth, img.getHeight, sr, sg, sb)
        }
      }
    }(enc).toDF()
  }
}
