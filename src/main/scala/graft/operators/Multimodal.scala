package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, Encoder, Encoders}
import org.apache.spark.sql.types._

/** Typed media metadata carried alongside the opaque payload. */
case class MediaMeta(format: String, width: Int, height: Int, channels: Int)

/** One media row: opaque binary payload + typed metadata. */
case class MediaRow(media_id: Long, content: Array[Byte], meta: MediaMeta)

/** Extracted features: fixed-width vector + payload size. */
case class MediaFeatures(media_id: Long, n_bytes: Long, features: Array[Float])

/** Multimodal-column plumbing: image/audio/video payloads are opaque
  * `binary` columns with a typed metadata struct, processed in
  * per-partition batches through the typed Dataset API (the Scala
  * analogue of `mapInPandas`: one iterator per partition, no per-row
  * serialization boundary, executors stream batches).
  *
  * STUB NOTE: real codecs (image/audio libs) are not available in this
  * container, so `fakeDecode` is a clearly-marked deterministic stand-in
  * (normalized byte histogram). Everything AROUND the decode — schema,
  * encoders, per-partition batch shape, partition-count invariance,
  * fixed feature width — is real and tested; swapping `fakeDecode` for
  * a JNI/codec call changes no plumbing.
  *
  * Scale: feature extraction is embarrassingly parallel (narrow map);
  * payload skew is handled upstream by `repartition` on a uniform key
  * so each task decodes a similar byte volume.
  */
object Multimodal {

  implicit val mediaRowEnc: Encoder[MediaRow] = Encoders.product[MediaRow]
  implicit val mediaFeaturesEnc: Encoder[MediaFeatures] = Encoders.product[MediaFeatures]

  val mediaSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("content", BinaryType),
    StructField("meta", StructType(Seq(
      StructField("format", StringType),
      StructField("width", IntegerType, nullable = false),
      StructField("height", IntegerType, nullable = false),
      StructField("channels", IntegerType, nullable = false))))))

  /** STUB decode — deterministic fake: bucketed byte histogram,
    * L1-normalized. Replace with a real codec for production use
    * (signature and batch shape stay identical).
    */
  private[graft] def fakeDecode(bytes: Array[Byte], dim: Int): Array[Float] = {
    val counts = new Array[Float](dim)
    var i = 0
    while (i < bytes.length) {
      counts((bytes(i) & 0xff) * dim / 256) += 1f
      i += 1
    }
    val total = math.max(1, bytes.length).toFloat
    counts.map(_ / total)
  }

  /** Per-partition batched feature extraction over the typed Dataset. */
  def extractFeatures(ds: Dataset[MediaRow], featureDim: Int = 16): Dataset[MediaFeatures] =
    ds.mapPartitions { rows =>
      rows.map { r =>
        MediaFeatures(r.media_id, r.content.length.toLong,
          fakeDecode(r.content, featureDim))
      }
    }

  /** STUB frame sampler — deterministic fake of video frame sampling:
    * n evenly-spaced fixed-size slices of the payload.
    */
  private[graft] def sampleFrames(bytes: Array[Byte], n: Int,
      frameSize: Int): Seq[Array[Byte]] =
    if (bytes.isEmpty || n <= 0) Seq.empty
    else (0 until n).map { i =>
      val start = math.min((bytes.length.toLong * i / n).toInt,
        math.max(0, bytes.length - 1))
      bytes.slice(start, math.min(start + frameSize, bytes.length))
    }

  /** Explode each payload into sampled frames (one row per frame). */
  def explodeFrames(ds: Dataset[MediaRow], n: Int, frameSize: Int)(
      implicit enc: Encoder[(Long, Int, Array[Byte])]): Dataset[(Long, Int, Array[Byte])] =
    ds.flatMap { r =>
      sampleFrames(r.content, n, frameSize).zipWithIndex.map {
        case (frame, idx) => (r.media_id, idx, frame)
      }
    }

  /** STUB resize — deterministic fake of an image resize: average-pool
    * the feature vector down to `outDim` buckets (bucket = floor
    * (j·outDim / inDim)), preserving total mass up to the pool means.
    * A real resampler (bilinear etc.) swaps in with the same
    * signature.
    */
  private[graft] def resizeVec(v: Array[Float], outDim: Int): Array[Float] = {
    val out = new Array[Float](outDim)
    val cnt = new Array[Int](outDim)
    var j = 0
    while (j < v.length) {
      val b = (j.toLong * outDim / v.length).toInt
      out(b) += v(j); cnt(b) += 1
      j += 1
    }
    var b = 0
    while (b < outDim) { if (cnt(b) > 0) out(b) /= cnt(b); b += 1 }
    out
  }

  /** Resize every feature vector (narrow per-partition map, no
    * shuffle).
    */
  def resizeFeatures(ds: Dataset[MediaFeatures], outDim: Int): Dataset[MediaFeatures] =
    ds.mapPartitions { rows =>
      rows.map(f => f.copy(features = resizeVec(f.features, outDim)))
    }

  /** View any (id, binary) DataFrame as a media Dataset with fake
    * metadata (for fixtures that carry text payloads).
    */
  def asMedia(df: DataFrame, format: String): Dataset[MediaRow] = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select($"media_id", $"content").map { row =>
      MediaRow(row.getLong(0), row.getAs[Array[Byte]](1),
        MediaMeta(format, 0, 0, 1))
    }
  }
}
