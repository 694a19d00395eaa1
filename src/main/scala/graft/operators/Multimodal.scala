package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: treat image/audio/video payloads as opaque
  * `binary` columns with typed metadata, and run decode / feature-extract as
  * a per-partition batch pass.
  *
  * The Spark-side shape is the real thing — binary columns survive parquet
  * round-trips, metadata rides in a struct, and decode happens inside
  * `mapPartitions` so a codec can be initialized once per partition (the
  * standard pattern for JNI/native decoders: open the library per task, not
  * per row). The codec itself is a STUB — this container has no image/audio
  * libraries — implemented as a deterministic fake that derives header
  * fields and a feature vector from the payload bytes, so tests are exact.
  *
  * Scale notes (100 TB): payloads never shuffle — decode is map-side and the
  * output drops the payload, so downstream stages move only features +
  * metadata. `spark.sql.files.maxPartitionBytes` bounds decode batch memory;
  * feature vectors are `Array[Float]` columns ready for
  * [[SimilaritySearch]].
  */
object Multimodal {

  /** Typed metadata carried alongside an opaque payload. */
  case class MediaMeta(format: String, n_bytes: Long)

  case class MediaRow(media_id: Long, payload: Array[Byte], meta: MediaMeta)

  /** Decode output: header fields + a fixed-dim feature vector. */
  case class DecodedMedia(
      media_id: Long,
      format: String,
      n_bytes: Long,
      width: Int,
      height: Int,
      feature: Array[Float])

  /** Wrap a (id, binary payload, format) frame into the canonical media
    * schema: `(media_id, payload binary, meta struct<format, n_bytes>)`.
    */
  def asMedia(df: DataFrame, idCol: String, payloadCol: String, formatCol: String): DataFrame =
    df.select(
      col(idCol).cast("long").as("media_id"),
      col(payloadCol).cast("binary").as("payload"),
      struct(
        col(formatCol).cast("string").as("format"),
        length(col(payloadCol).cast("binary")).cast("long").as("n_bytes")).as("meta"))

  /** STUB codec: deterministic fake "decode" of a payload. A real deployment
    * replaces `decodeOne` with the native library call; everything around it
    * (per-partition init, batch iteration, output schema) is the production
    * shape.
    */
  private object StubCodec {
    /** Mimics an expensive per-partition codec handle. */
    def open(): StubCodec.type = this

    def decodeOne(id: Long, payload: Array[Byte], format: String, dim: Int): DecodedMedia = {
      // header-style field extraction from the first bytes (deterministic fake)
      val b0 = if (payload.length > 0) payload(0) & 0xff else 0
      val b1 = if (payload.length > 1) payload(1) & 0xff else 0
      // fake feature: per-bucket byte sums, L1-normalized — pure function of bytes
      val sums = new Array[Long](dim)
      var i = 0
      while (i < payload.length) {
        sums(i % dim) += (payload(i) & 0xff).toLong
        i += 1
      }
      val total = math.max(1L, sums.sum)
      val feat = sums.map(s => s.toFloat / total)
      DecodedMedia(id, format, payload.length.toLong, 256 + b0, 256 + b1, feat)
    }
  }

  /** Decode a media frame to features, one codec handle per partition. */
  def decode(media: DataFrame, dim: Int = 8): Dataset[DecodedMedia] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select(col("media_id"), col("payload"), col("meta.format").as("format"))
      .as[(Long, Array[Byte], String)]
      .mapPartitions { rows =>
        val codec = StubCodec.open()
        rows.map { case (id, payload, fmt) => codec.decodeOne(id, payload, fmt, dim) }
      }
  }

  /** One sampled frame of a media payload. */
  case class Frame(media_id: Long, frame_idx: Int, frame: Array[Byte])

  /** Frame sampling: treat the payload as a sequence of fixed-size frames
    * and keep every `stride`-th one — the 1-row -> N-rows generator shape
    * of video frame extraction. Map-side (mapPartitions with a per-partition
    * codec handle, one output iterator per input row); only the sampled
    * frames flow downstream, the full payload is dropped at the source.
    * The framing itself is the codec stub: a real deployment replaces
    * fixed-width chunking with container demuxing, same shape.
    */
  def frameSample(media: DataFrame, frameBytes: Int, stride: Int): Dataset[Frame] = {
    require(frameBytes > 0 && stride > 0, "frameBytes and stride must be positive")
    val spark = media.sparkSession
    import spark.implicits._
    media.select(col("media_id"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions { rows =>
        val _ = StubCodec.open()
        rows.flatMap { case (id, payload) =>
          val nFrames = payload.length / frameBytes
          (0 until nFrames by stride).iterator.map { f =>
            Frame(id, f, java.util.Arrays.copyOfRange(payload, f * frameBytes, (f + 1) * frameBytes))
          }
        }
      }
  }

  /** Resize: re-decode a payload at a different target "resolution" (here:
    * feature dimension) — the transform shape of image resizing, where the
    * decode parameters change but the pipeline around it does not. Output
    * header fields are scaled; the feature is recomputed at the new dim.
    */
  def resize(media: DataFrame, newDim: Int): Dataset[DecodedMedia] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select(col("media_id"), col("payload"), col("meta.format").as("format"))
      .as[(Long, Array[Byte], String)]
      .mapPartitions { rows =>
        val codec = StubCodec.open()
        rows.map { case (id, payload, fmt) => codec.decodeOne(id, payload, fmt, newDim) }
      }
  }

  /** End-to-end demo pipeline over the `documents` table: text bytes stand
    * in for media payloads (this container has no binary media fixtures);
    * decode then drop payloads so only features flow downstream.
    */
  def documentsAsMediaFeatures(spark: SparkSession, sfDir: String, dim: Int = 8): Dataset[DecodedMedia] = {
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    decode(asMedia(docs, "doc_id", "text", "source"), dim)
  }
}
