package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal-column plumbing for training-data pipelines: image/audio/
  * video payloads as opaque `binary` columns with a typed metadata struct,
  * plus the Spark-side shape of decode / feature-extract / resize /
  * frame-sample stages.
  *
  * The actual media codecs are NOT available in this environment, so the
  * decode kernel is a clearly-marked deterministic stub
  * ([[fakeDecodeKernel]]) behind the real distributed plumbing: schema,
  * partitioning, per-partition batch iteration (the Scala analog of a
  * `mapInPandas` batch UDF), and column-level feature expressions. Swapping
  * the stub for a real codec changes one function, not the pipeline.
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

  /** Deterministic fake decode kernel: a real implementation would call an
    * image/audio codec here (`???` territory — libs absent in this
    * container). The fake emits a stable 4-dim "embedding" derived from
    * the payload's UTF-8 code points — integer math (sum + polynomial
    * left-fold mod prime) that an oracle SQL engine reproduces exactly
    * from the source text, so even the stub stage is hash-verifiable. */
  def fakeDecodeKernel(payload: Array[Byte]): Array[Float] = {
    // real codec goes here, e.g.: ImageIO.read(new ByteArrayInputStream(payload))
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
}
