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
  * per row). IMAGE decode is REAL ([[decodeImages]] — the JDK's ImageIO
  * parses PNG/JPEG/BMP/GIF with no external library), AUDIO is REAL
  * ([[decodeAudio]] — javax.sound.sampled parses WAV/AIFF/AU), VIDEO
  * *header* parsing is REAL ([[parseVideoHeaders]] — a pure-JVM MP4 box
  * walker reads width/height/duration/track-count from the container), and
  * VIDEO FRAME decode is REAL for Motion-JPEG AVI
  * ([[decodeVideoFrames]] — RIFF demux + per-frame ImageIO JPEG). Only
  * formats whose codecs don't ship in the JVM (h264, aac...) stay on the
  * sentinel/stub path — that boundary is the honest one.
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

  /** REAL image decode via the JDK's ImageIO — the PNG/JPEG/BMP/GIF
    * readers ship inside the JVM, so this path needs no external library
    * and actually parses the payload: width/height come from the decoded
    * raster, the feature vector is the mean luminance of `dim` vertical
    * image bands (a crude but genuine visual signature, deterministic for
    * lossless formats). A payload ImageIO cannot parse yields a sentinel
    * row (format "undecodable", -1 dimensions, zero feature) rather than
    * killing the task — at 100 TB a corrupt file is data, not an error.
    *
    * Same per-partition-handle shape as the stub codec: ImageIO's
    * temp-file cache is disabled once per partition (the "codec init"),
    * then rows stream through. Audio is real too ([[decodeAudio]]); only
    * video stays on the documented stub.
    */
  def decodeImages(media: DataFrame, dim: Int = 8): Dataset[DecodedMedia] = {
    require(dim > 0, "dim must be positive")
    val spark = media.sparkSession
    import spark.implicits._
    media.select(col("media_id"), col("payload"), col("meta.format").as("format"))
      .as[(Long, Array[Byte], String)]
      .mapPartitions { rows =>
        javax.imageio.ImageIO.setUseCache(false) // per-partition codec init
        rows.map { case (id, payload, fmt) => decodeOneImage(id, payload, fmt, dim) }
      }
  }

  private def decodeOneImage(id: Long, payload: Array[Byte], metaFormat: String,
      dim: Int): DecodedMedia = {
    val nBytes = if (payload == null) 0L else payload.length.toLong
    def sentinel = DecodedMedia(id, "undecodable", nBytes, -1, -1, new Array[Float](dim))
    if (payload == null) return sentinel
    // NonFatal only: OOM from a decompression-bomb header or a task-kill
    // interrupt must PROPAGATE, not become a quiet sentinel row. The whole
    // decode (read + pixel walk) is inside the try — getRGB can throw on
    // broken color models too.
    try {
      val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(payload))
      if (img == null) sentinel
      else {
        val feat = bandLuminance(img, dim)
        // sniffing knows the common formats; JDK ImageIO decodes more
        // (TIFF since JDK 9) — fall back to the caller's metadata label
        val label = detectFormat(payload) match {
          case "unknown" => metaFormat
          case sniffed => sniffed
        }
        DecodedMedia(id, label, nBytes, img.getWidth, img.getHeight, feat)
      }
    } catch { case scala.util.control.NonFatal(_) => sentinel }
  }

  /** Mean luminance per vertical band (bands partition the x range) —
    * the shared raster feature of [[decodeImages]] and
    * [[decodeVideoFrames]]. Row-buffered getRGB: the per-pixel overload
    * re-runs the color model conversion per call, 5-20x slower on the
    * decode hot path.
    */
  private def bandLuminance(img: java.awt.image.BufferedImage, dim: Int): Array[Float] = {
    val (w, h) = (img.getWidth, img.getHeight)
    val sums = new Array[Double](dim)
    val counts = new Array[Long](dim)
    val rowBuf = new Array[Int](w)
    var y = 0
    while (y < h) {
      img.getRGB(0, y, w, 1, rowBuf, 0, w)
      var x = 0
      while (x < w) {
        val rgb = rowBuf(x)
        val lum = (((rgb >> 16) & 0xff) + ((rgb >> 8) & 0xff) + (rgb & 0xff)) / (3.0 * 255.0)
        // long math: x * dim would wrap for pathologically wide rasters
        val band = math.min(dim - 1, (x.toLong * dim / w).toInt)
        sums(band) += lum
        counts(band) += 1
        x += 1
      }
      y += 1
    }
    Array.tabulate(dim)(k => if (counts(k) == 0) 0f else (sums(k) / counts(k)).toFloat)
  }

  /** Real audio decode output: container header fields + a per-band RMS
    * amplitude signature over the PCM samples.
    */
  case class DecodedAudio(
      media_id: Long,
      format: String,
      n_bytes: Long,
      sample_rate: Float,
      channels: Int,
      n_frames: Long,
      feature: Array[Float])

  /** REAL audio decode via the JDK's sampled-sound stack — WAV/AIFF/AU
    * parsers ship in the JVM (javax.sound.sampled), no external library:
    * sample rate / channel count / frame count come from the actual
    * container header, and the feature is the RMS amplitude of `dim`
    * consecutive time bands of the decoded PCM stream (mono-mixed).
    * Unparseable payloads yield a sentinel row, like [[decodeImages]].
    * Compressed codecs (mp3, aac) are NOT in the JVM and report as
    * undecodable — that boundary is the honest one.
    */
  def decodeAudio(media: DataFrame, dim: Int = 8): Dataset[DecodedAudio] = {
    require(dim > 0, "dim must be positive")
    val spark = media.sparkSession
    import spark.implicits._
    media.select(col("media_id"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions { rows =>
        rows.map { case (id, payload) => decodeOneAudio(id, payload, dim) }
      }
  }

  private def decodeOneAudio(id: Long, payload: Array[Byte], dim: Int): DecodedAudio = {
    import javax.sound.sampled.AudioSystem
    // sentinel must not touch payload.length on the null path — the error
    // handler crashing is the one failure mode this design forbids
    val nBytes = if (payload == null) 0L else payload.length.toLong
    def sentinel = DecodedAudio(id, "undecodable", nBytes, -1f, -1, -1L,
      new Array[Float](dim))
    if (payload == null) return sentinel
    try {
      val in = AudioSystem.getAudioInputStream(new java.io.ByteArrayInputStream(payload))
      try {
        val fmt = in.getFormat
        val bytesPerSample = fmt.getSampleSizeInBits / 8
        // decode only PCM_SIGNED 16-bit (what WAV fixtures carry); anything
        // else keeps real header fields with an empty signature
        val nFrames = in.getFrameLength
        val feature = new Array[Float](dim)
        if (fmt.getEncoding == javax.sound.sampled.AudioFormat.Encoding.PCM_SIGNED &&
          bytesPerSample == 2 && nFrames > 0) {
          val data = in.readAllBytes()
          val frameBytes = bytesPerSample * fmt.getChannels
          val total = data.length / frameBytes
          val sumSq = new Array[Double](dim)
          val counts = new Array[Long](dim)
          var f = 0
          while (f < total) {
            // mono mix: mean of channels
            var c = 0
            var acc = 0.0
            while (c < fmt.getChannels) {
              val off = f * frameBytes + c * 2
              val lo = data(off) & 0xff
              val hi = data(off + 1).toInt
              val sample = (if (fmt.isBigEndian) (lo << 8) | (hi & 0xff) else (hi << 8) | lo).toShort
              acc += sample / 32768.0
              c += 1
            }
            // long math: f * dim wraps Int past ~268M frames (a ~100-min
            // mono WAV) and the negative index would mis-sentinel the file
            val band = math.min(dim - 1, (f.toLong * dim / total).toInt)
            val v = acc / fmt.getChannels
            sumSq(band) += v * v
            counts(band) += 1
            f += 1
          }
          var k = 0
          while (k < dim) {
            feature(k) = if (counts(k) == 0) 0f else math.sqrt(sumSq(k) / counts(k)).toFloat
            k += 1
          }
        }
        DecodedAudio(id, detectAudioFormat(payload), payload.length.toLong,
          fmt.getSampleRate, fmt.getChannels, nFrames, feature)
      } finally in.close()
    } catch {
      case scala.util.control.NonFatal(_) => sentinel
    }
  }

  private def detectAudioFormat(p: Array[Byte]): String =
    if (p.length >= 12 && p(0) == 'R' && p(1) == 'I' && p(2) == 'F' && p(3) == 'F' &&
      p(8) == 'W' && p(9) == 'A' && p(10) == 'V' && p(11) == 'E') "wav"
    else if (p.length >= 4 && p(0) == 'F' && p(1) == 'O' && p(2) == 'R' && p(3) == 'M') "aiff"
    else if (p.length >= 4 && p(0) == '.' && p(1) == 's' && p(2) == 'n' && p(3) == 'd') "au"
    else "unknown"

  /** Magic-byte format sniffing for the formats the JDK decodes. */
  private def detectFormat(p: Array[Byte]): String =
    if (p.length >= 8 && (p(0) & 0xff) == 0x89 && p(1) == 'P' && p(2) == 'N' && p(3) == 'G') "png"
    else if (p.length >= 2 && (p(0) & 0xff) == 0xff && (p(1) & 0xff) == 0xd8) "jpeg"
    else if (p.length >= 3 && p(0) == 'G' && p(1) == 'I' && p(2) == 'F') "gif"
    else if (p.length >= 2 && p(0) == 'B' && p(1) == 'M') "bmp"
    else "unknown"

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

  // ---- video: real MP4 header parsing (no codec needed) ----------------

  /** Parsed MP4 container header fields. */
  case class VideoMeta(
      media_id: Long,
      format: String,
      n_bytes: Long,
      width: Int,
      height: Int,
      duration_ms: Long,
      n_tracks: Int)

  /** REAL video *header* parsing: a pure-JVM MP4/ISO-BMFF box walker —
    * boxes are `[32-bit size][4-char type][payload]` (size 1 -> 64-bit
    * largesize follows; size 0 -> to end), `moov` holds the movie header
    * (`mvhd`: timescale + duration) and one `trak` per track (`tkhd`:
    * 16.16-fixed width/height). None of that needs a codec, so the
    * metadata path is honest: width/height/duration/track-count come from
    * the actual container bytes. FRAME decode stays out of scope (no
    * demuxer/codec ships in the JVM — [[frameSample]] remains the
    * documented stub for that). Unparseable payloads sentinel like the
    * image/audio decoders: corrupt files are data, not errors.
    */
  def parseVideoHeaders(media: DataFrame): Dataset[VideoMeta] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select(col("media_id"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions(rows => rows.map { case (id, p) => parseOneVideo(id, p) })
  }

  /** unsigned big-endian reads (MP4 is big-endian throughout) */
  private def be32(p: Array[Byte], off: Long): Long = {
    val o = off.toInt
    ((p(o) & 0xffL) << 24) | ((p(o + 1) & 0xffL) << 16) |
      ((p(o + 2) & 0xffL) << 8) | (p(o + 3) & 0xffL)
  }
  private def be64(p: Array[Byte], off: Long): Long =
    (be32(p, off) << 32) | be32(p, off + 4)
  private def boxType(p: Array[Byte], off: Long): String =
    new String(p, off.toInt + 4, 4, java.nio.charset.StandardCharsets.US_ASCII)

  /** Child box ranges [payloadStart, payloadEnd) of `tpe` within
    * [start, end); malformed sizes terminate the walk (the caller then
    * sees whatever was parsed so far — truncation-tolerant, like real
    * demuxers' header scan).
    */
  private def childBoxes(p: Array[Byte], start: Long, end: Long, tpe: String): List[(Long, Long)] = {
    var pos = start
    val out = List.newBuilder[(Long, Long)]
    while (end - pos >= 8) {
      var size = be32(p, pos)
      var hdr = 8L
      if (size == 1L && end - pos >= 16) { size = be64(p, pos + 8); hdr = 16L }
      else if (size == 0L) size = end - pos
      if (size < hdr || pos + size > end) { pos = end } // malformed: stop
      else {
        if (boxType(p, pos) == tpe) out += ((pos + hdr, pos + size))
        pos += size
      }
    }
    out.result()
  }

  private def parseOneVideo(id: Long, p: Array[Byte]): VideoMeta = {
    val nBytes = if (p == null) 0L else p.length.toLong
    def sentinel = VideoMeta(id, "undecodable", nBytes, -1, -1, -1L, -1)
    if (p == null || p.length < 12 || boxType(p, 0) != "ftyp") return sentinel
    try {
      childBoxes(p, 0, p.length.toLong, "moov") match {
        case Nil => sentinel
        case (ms, me) :: _ =>
          // mvhd: version(1) flags(3), then v0: c/m times 4+4, timescale 4,
          // duration 4; v1: c/m times 8+8, timescale 4, duration 8
          val durationMs = childBoxes(p, ms, me, "mvhd") match {
            // >= 1: the version byte itself needs payload (a header-only
            // box's payload start may sit AT the buffer end)
            case (hs, he) :: _ if he - hs >= 1 =>
              // version gates the layout EXCLUSIVELY: a v1 box truncated
              // below its 32-byte minimum must sentinel, not fall through
              // to v0 offsets and read the middle of its 64-bit times as
              // timescale/duration (plausible-looking garbage)
              val v = p(hs.toInt) & 0xff
              val parsed =
                if (v == 1 && he - hs >= 32) Some((be32(p, hs + 20), be64(p, hs + 24)))
                else if (v == 0 && he - hs >= 24) Some((be32(p, hs + 12), be32(p, hs + 16)))
                else None
              parsed match {
                // the ms conversion must not overflow into a bogus
                // positive: v1 durations are attacker-controlled 64-bit
                case Some((timescale, duration))
                    if timescale > 0 && duration >= 0 && duration <= Long.MaxValue / 1000L =>
                  duration * 1000L / timescale
                case _ => -1L
              }
            case _ => -1L
          }
          val traks = childBoxes(p, ms, me, "trak")
          // tkhd width/height: 16.16 fixed point at payload offset 76 (v0)
          // / 88 (v1); audio tracks carry zero — take the first non-zero
          val dims = traks.iterator.flatMap { case (ts, te) =>
            childBoxes(p, ts, te, "tkhd").headOption.flatMap { case (hs, he) =>
              // same >= 1 guard as mvhd: a header-only tkhd has no
              // version byte to read (payload start may be buffer end)
              if (he - hs < 1) None
              else {
                val v = p(hs.toInt) & 0xff
                val off = if (v == 1) hs + 88 else hs + 76
                if (he - off >= 8) {
                  val (w, h) = ((be32(p, off) >> 16).toInt, (be32(p, off + 4) >> 16).toInt)
                  if (w > 0 && h > 0) Some((w, h)) else None
                } else None
              }
            }
          }.take(1).toList
          val (w, h) = dims.headOption.getOrElse((-1, -1))
          VideoMeta(id, "mp4", nBytes, w, h, durationMs, traks.length)
      }
    } catch { case scala.util.control.NonFatal(_) => sentinel }
  }

  // ---- video: REAL frame decode for Motion-JPEG AVI --------------------

  /** One fully-decoded video frame: container position + raster features. */
  case class DecodedFrame(
      media_id: Long,
      frame_idx: Int,
      format: String,
      width: Int,
      height: Int,
      feature: Array[Float])

  /** REAL video FRAME decode for the one family a bare JVM can fully
    * handle: Motion-JPEG in an AVI container. AVI is RIFF — walkable
    * little-endian chunks, the mirror of [[parseVideoHeaders]]' MP4 box
    * walk — and every MJPEG frame chunk (`##dc`/`##db` inside the `movi`
    * list) is a complete JPEG, which ImageIO ships a codec for. Every
    * `stride`-th frame decodes through the SAME banded-luminance raster
    * path as [[decodeImages]], so image and video features land in one
    * embedding space. The demuxer recurses into `rec ` groupings,
    * tolerates truncation mid-chunk, and honors RIFF's even-byte padding.
    *
    * Honest codec boundary, same rule as compressed audio: an AVI whose
    * frames aren't JPEGs (h264, cinepak...) yields per-frame sentinel
    * rows; a payload that isn't RIFF-AVI at all yields ONE sentinel row
    * (frame_idx -1) so corrupt files stay visible data, never errors.
    * [[frameSample]]'s fixed-width chunking remains the documented stub
    * for container/codec families outside the JVM.
    */
  def decodeVideoFrames(media: DataFrame, stride: Int = 1, dim: Int = 8): Dataset[DecodedFrame] = {
    require(stride > 0, "stride must be positive")
    require(dim > 0, "dim must be positive")
    val spark = media.sparkSession
    import spark.implicits._
    media.select(col("media_id"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions { rows =>
        javax.imageio.ImageIO.setUseCache(false) // per-partition codec init
        rows.flatMap { case (id, p) => decodeOneAvi(id, p, stride, dim) }
      }
  }

  private def le32(p: Array[Byte], off: Int): Long =
    (p(off) & 0xffL) | ((p(off + 1) & 0xffL) << 8) |
      ((p(off + 2) & 0xffL) << 16) | ((p(off + 3) & 0xffL) << 24)
  private def fourcc(p: Array[Byte], off: Int): String =
    new String(p, off, 4, java.nio.charset.StandardCharsets.US_ASCII)

  /** Collect the byte ranges of frame chunks (`##db`/`##dc`) under
    * [start, end), recursing into LIST `movi` / `rec ` groupings.
    * Malformed sizes stop the walk with whatever parsed so far.
    */
  private def aviFrameRanges(p: Array[Byte], start: Int, end: Int): List[(Int, Int)] = {
    val out = List.newBuilder[(Int, Int)]
    var pos = start
    while (end - pos >= 8) {
      val id = fourcc(p, pos)
      val size = le32(p, pos + 4)
      if (size < 0 || pos + 8 + size > end) { pos = end } // truncated: stop
      else {
        val dataStart = pos + 8
        val dataEnd = (dataStart + size).toInt
        if (id == "LIST" && size >= 4) {
          val listType = fourcc(p, dataStart)
          if (listType == "movi" || listType == "rec ")
            out ++= aviFrameRanges(p, dataStart + 4, dataEnd)
        } else if (id.length == 4 && id(0).isDigit && id(1).isDigit &&
          id(2) == 'd' && (id(3) == 'b' || id(3) == 'c') && size > 0) {
          out += ((dataStart, dataEnd))
        }
        pos = dataEnd + (size.toInt & 1) // RIFF pads chunks to even sizes
      }
    }
    out.result()
  }

  private def decodeOneAvi(id: Long, p: Array[Byte], stride: Int,
      dim: Int): Iterator[DecodedFrame] = {
    def sentinel(idx: Int) =
      DecodedFrame(id, idx, "undecodable", -1, -1, new Array[Float](dim))
    if (p == null || p.length < 12 || fourcc(p, 0) != "RIFF" || fourcc(p, 8) != "AVI ")
      return Iterator.single(sentinel(-1))
    val frames =
      try aviFrameRanges(p, 12, p.length)
      catch { case scala.util.control.NonFatal(_) => Nil }
    if (frames.isEmpty) return Iterator.single(sentinel(-1))
    frames.iterator.zipWithIndex
      .filter { case (_, idx) => idx % stride == 0 }
      .map { case ((fs, fe), idx) =>
        try {
          val img = javax.imageio.ImageIO.read(
            new java.io.ByteArrayInputStream(p, fs, fe - fs))
          if (img == null) sentinel(idx) // non-JPEG codec: honest boundary
          else DecodedFrame(id, idx, "mjpeg", img.getWidth, img.getHeight,
            bandLuminance(img, dim))
        } catch { case scala.util.control.NonFatal(_) => sentinel(idx) }
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

  // ==== perceptual image dedup ==========================================

  /** Perceptual fingerprints of one decoded image: dHash (gradient hash —
    * each bit compares a cell's mean luminance to its right neighbor on a
    * 9x8 grid) and aHash (mean hash — each bit compares an 8x8 cell to the
    * global mean). 64 bits each; both survive re-encoding (PNG <-> JPEG),
    * resampling, and mild brightness shifts, which byte-level
    * [[Dedup.exact]] cannot.
    */
  case class ImageHash(
      media_id: Long,
      format: String,
      n_bytes: Long,
      width: Int,
      height: Int,
      dhash: Long,
      ahash: Long)

  /** Decode + perceptual-hash every payload: the same per-partition
    * ImageIO pass as [[decodeImages]], emitting [[ImageHash]] rows.
    * Undecodable payloads keep the sentinel convention (width = -1,
    * hashes 0) — [[perceptualImagePairs]] filters them out.
    */
  def imageHashes(media: DataFrame): Dataset[ImageHash] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select(col("media_id"), col("payload"), col("meta.format").as("format"))
      .as[(Long, Array[Byte], String)]
      .mapPartitions { rows =>
        javax.imageio.ImageIO.setUseCache(false)
        rows.map { case (id, payload, fmt) => hashOneImage(id, payload, fmt) }
      }
  }

  private def hashOneImage(id: Long, payload: Array[Byte], metaFormat: String): ImageHash = {
    val nBytes = if (payload == null) 0L else payload.length.toLong
    def sentinel = ImageHash(id, "undecodable", nBytes, -1, -1, 0L, 0L)
    if (payload == null) return sentinel
    try {
      val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(payload))
      if (img == null) sentinel
      else {
        val label = detectFormat(payload) match {
          case "unknown" => metaFormat
          case sniffed => sniffed
        }
        // one 9x8 grid serves both hashes: dHash compares horizontal
        // neighbors across all 9 columns; aHash thresholds the left 8x8
        // block against its own mean. Cell means are QUANTIZED to integer
        // 0..255 luminance (integer division): float means differ by an
        // ulp even on identical pixels (repeated-addition rounding varies
        // with cell pixel count), turning flat regions into coin-flip
        // bits; integer levels make equal-luminance cells EXACTLY equal
        // and a uniform brightness shift an exact no-op on both hashes
        val g = gridLumLevels(img, 9, 8)
        val dh = dhashFromGrid(g)
        var ah = 0L
        var meanSum = 0L
        var r = 0
        while (r < 8) {
          var c = 0
          while (c < 8) { meanSum += g(r * 9 + c); c += 1 }
          r += 1
        }
        // aHash threshold: cell*64 > sum compares against the exact mean
        // without integer-division loss
        r = 0
        while (r < 8) {
          var c = 0
          while (c < 8) {
            if (g(r * 9 + c) * 64L > meanSum) ah |= 1L << (r * 8 + c)
            c += 1
          }
          r += 1
        }
        ImageHash(id, label, nBytes, img.getWidth, img.getHeight, dh, ah)
      }
    } catch { case scala.util.control.NonFatal(_) => sentinel }
  }

  /** The 64-bit dHash over a 9x8 integer luminance grid (bit r*8+c set
    * when cell (r, c+1) is brighter than (r, c)) — shared by the image
    * hash and the per-frame hash inside [[videoFingerprints]].
    */
  private def dhashFromGrid(g: Array[Long]): Long = {
    var dh = 0L
    var r = 0
    while (r < 8) {
      var c = 0
      while (c < 8) {
        if (g(r * 9 + c + 1) > g(r * 9 + c)) dh |= 1L << (r * 8 + c)
        c += 1
      }
      r += 1
    }
    dh
  }

  /** Mean luminance LEVEL (integer 0..255) per (gw x gh) grid cell —
    * [[bandLuminance]]'s 2-D sibling, same row-buffered getRGB walk, but
    * integer end-to-end: sum of (r+g+b) per cell, divided by 3*count.
    * Integer levels are what make the perceptual hashes stable: identical
    * cells compare equal regardless of pixel count, and adding a constant
    * to every pixel adds exactly that constant to every cell.
    */
  private def gridLumLevels(img: java.awt.image.BufferedImage, gw: Int, gh: Int): Array[Long] = {
    val (w, h) = (img.getWidth, img.getHeight)
    val sums = new Array[Long](gw * gh)
    val counts = new Array[Long](gw * gh)
    val rowBuf = new Array[Int](w)
    var y = 0
    while (y < h) {
      img.getRGB(0, y, w, 1, rowBuf, 0, w)
      val gy = math.min(gh - 1, (y.toLong * gh / h).toInt)
      var x = 0
      while (x < w) {
        val rgb = rowBuf(x)
        val gx = math.min(gw - 1, (x.toLong * gw / w).toInt)
        sums(gy * gw + gx) += ((rgb >> 16) & 0xff) + ((rgb >> 8) & 0xff) + (rgb & 0xff)
        counts(gy * gw + gx) += 1
        x += 1
      }
      y += 1
    }
    Array.tabulate(gw * gh)(i => if (counts(i) == 0) 0L else sums(i) / (3L * counts(i)))
  }

  /** Perceptual near-duplicate image pairs: dHash Hamming distance <=
    * `maxHamming`, found with the SAME pigeonhole band join as
    * [[Dedup.simhashPairs]] — the 64-bit dHash splits into four 16-bit
    * blocks, a pair within Hamming 3 must agree on at least one block, so
    * the join touches bucket collisions only and never all pairs. This
    * closes the "multimodal columns are decoded but never deduped" gap:
    * re-encoded (PNG<->JPEG), recompressed, or lightly edited copies of an
    * image hash within a few bits of each other while their payload bytes
    * (and so [[Dedup.exact]]) share nothing.
    *
    * Scale: payloads decode map-side and never shuffle; only (id, 16-bit
    * key) rows enter the exchange. A corpus-wide logo repeated millions of
    * times makes one bucket hot — [[Skew]]'s salting applies, same as
    * every dedup join here.
    */
  def perceptualImagePairs(media: DataFrame, maxHamming: Int = 3): DataFrame =
    pigeonholeHashPairs(
      imageHashes(media).toDF()
        .filter(col("width") > 0)
        .select(col("media_id").as("id"), col("dhash").as("hash")),
      maxHamming)

  /** The shared 64-bit pigeonhole band join behind [[perceptualImagePairs]]
    * and [[perceptualAudioPairs]]: four 16-bit blocks, a pair within
    * Hamming 3 must agree on at least one block, so the join touches
    * bucket collisions only and never all pairs. Input: (id, hash).
    */
  private def pigeonholeHashPairs(hashes: DataFrame, maxHamming: Int): DataFrame = {
    require(maxHamming >= 0 && maxHamming < 4,
      s"pigeonhole bands (4 blocks of 16 bits) are exact only for maxHamming <= 3: got $maxHamming")
    // persisted: the self-join reads this frame twice, and each read
    // would otherwise re-decode and re-hash every payload (same reason
    // Dedup.substringPairs persists its fingerprint frame)
    val blocks = hashBlocks(Caching.maybePersist(hashes,
      org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK))
    blocks.as("a").join(blocks.as("b"),
        col("a.blk") === col("b.blk") && col("a.key") === col("b.key") &&
          col("a.id") < col("b.id"))
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"),
        expr("bit_count(a.hash ^ b.hash)").as("hamming"))
      .distinct()
      .filter(col("hamming") <= maxHamming)
  }

  /** One row per (id, hash, 16-bit block): the pigeonhole join's posting
    * side — shared by the one-shot self-join and the incremental form. */
  private def hashBlocks(h: DataFrame): DataFrame = {
    val blockKeys = array((0 until 4).map { k =>
      struct(lit(k).as("blk"),
        expr(s"shiftright(hash, ${k * 16}) & 65535").as("key"))
    }: _*)
    h.select(col("id"), col("hash"), explode(blockKeys).as("bk"))
      .select(col("id"), col("hash"), col("bk.blk").as("blk"), col("bk.key").as("key"))
  }

  /** Near-dup pairs TOUCHING a new shard, against stored state ∪ the
    * shard — the incremental pair read: stored-vs-stored pairs were
    * already reported when THEIR shard arrived, so each trigger joins
    * only the shard's block postings against the merged side (shard
    * rows × bucket co-occupants, never stored × stored). Both inputs
    * are (id, hash) state frames — payload bytes were already paid at
    * state-append time. Pairs normalize to id_a < id_b and dedup, so a
    * shard-internal pair reports exactly once; the union of every
    * era's report equals the one-shot [[perceptualPairsFromState]] over
    * the final state (every pair touches the LATER of its two eras —
    * the substringPairsIncremental argument; MediaStateSpec pins it).
    */
  def perceptualPairsIncremental(stored: DataFrame, shard: DataFrame,
                                 maxHamming: Int = 3,
                                 storage: org.apache.spark.storage.StorageLevel =
                                   org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK): DataFrame = {
    require(maxHamming >= 0 && maxHamming < 4,
      s"pigeonhole bands (4 blocks of 16 bits) are exact only for maxHamming <= 3: got $maxHamming")
    // the shard side is read twice (its own postings + inside the union);
    // callers that already persisted the shard state pass NONE — the
    // streaming gate's per-trigger leak argument (substring gate ditto)
    val sh = Caching.maybePersist(shard.select(col("id"), col("hash")), storage)
    val all = stored.select(col("id"), col("hash")).unionByName(sh)
    hashBlocks(sh).as("a").join(hashBlocks(all).as("b"),
        col("a.blk") === col("b.blk") && col("a.key") === col("b.key") &&
          col("a.id") =!= col("b.id"))
      .select(least(col("a.id"), col("b.id")).as("id_a"),
        greatest(col("a.id"), col("b.id")).as("id_b"),
        expr("bit_count(a.hash ^ b.hash)").as("hamming"))
      .distinct()
      .filter(col("hamming") <= maxHamming)
  }

  /** Audio fingerprint row: container header fields + a 64-bit
    * band-energy signature ([[audioFingerprints]]). Sentinel convention:
    * undecodable / non-PCM16 / shorter than 72 frames report afp 0 with
    * n_frames saying why — [[perceptualAudioPairs]] filters on it.
    */
  case class AudioFingerprint(
      media_id: Long,
      format: String,
      n_bytes: Long,
      sample_rate: Float,
      channels: Int,
      n_frames: Long,
      afp: Long,
      fp_valid: Boolean)

  /** Chromaprint-style (quantized band-energy) audio fingerprint: the
    * decoded PCM stream truncates to a multiple of 72 frames, splits into
    * 72 EQUAL time cells laid out 8 rows x 9 columns (coarse x fine
    * time, the image dHash grid), and bit r*8+c of the signature says
    * whether cell (r, c+1) carries more energy than cell (r, c). Energy
    * per cell is the exact INTEGER sum of squared mono-mixed samples
    * (channel SUM, not mean: uniform scaling never flips a comparison)
    * over identical frame counts, so the signature is bit-stable under
    * lossless container re-encoding (WAV <-> AIFF <-> AU) and under any
    * uniform volume change that scales samples exactly — the audio twin
    * of the image hash's brightness-shift invariance.
    *
    * Same honest codec boundary as [[decodeAudio]]: only PCM_SIGNED
    * 16-bit fingerprints; mp3/aac are not in the JVM and sentinel out.
    */
  def audioFingerprints(media: DataFrame): Dataset[AudioFingerprint] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select(col("media_id"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions { rows =>
        rows.map { case (id, payload) => fingerprintOneAudio(id, payload) }
      }
  }

  private def fingerprintOneAudio(id: Long, payload: Array[Byte]): AudioFingerprint = {
    import javax.sound.sampled.AudioSystem
    val nBytes = if (payload == null) 0L else payload.length.toLong
    def sentinel = AudioFingerprint(id, "undecodable", nBytes, -1f, -1, -1L, 0L, false)
    if (payload == null) return sentinel
    try {
      val in = AudioSystem.getAudioInputStream(new java.io.ByteArrayInputStream(payload))
      try {
        val fmt = in.getFormat
        val nFrames = in.getFrameLength
        var afp = 0L
        var valid = false
        if (fmt.getEncoding == javax.sound.sampled.AudioFormat.Encoding.PCM_SIGNED &&
          fmt.getSampleSizeInBits == 16 && nFrames >= 72) {
          val data = in.readAllBytes()
          val frameBytes = 2 * fmt.getChannels
          val total = data.length / frameBytes
          val used = total - total % 72
          if (used >= 72) {
            valid = true
            val cellW = used / 72
            val energy = new Array[Long](72)
            var f = 0
            while (f < used) {
              var c = 0
              var s = 0L
              while (c < fmt.getChannels) {
                val off = f * frameBytes + c * 2
                val lo = data(off) & 0xff
                val hi = data(off + 1).toInt
                s += (if (fmt.isBigEndian) (lo << 8) | (hi & 0xff) else (hi << 8) | lo).toShort
                c += 1
              }
              energy(f / cellW) += s * s
              f += 1
            }
            var r = 0
            while (r < 8) {
              var c = 0
              while (c < 8) {
                if (energy(r * 9 + c + 1) > energy(r * 9 + c)) afp |= 1L << (r * 8 + c)
                c += 1
              }
              r += 1
            }
          }
        }
        AudioFingerprint(id, detectAudioFormat(payload), nBytes,
          fmt.getSampleRate, fmt.getChannels, nFrames, afp, valid)
      } finally in.close()
    } catch { case scala.util.control.NonFatal(_) => sentinel }
  }

  /** Perceptual near-duplicate audio pairs: fingerprint Hamming distance
    * <= `maxHamming` through the same pigeonhole band join as the image
    * path — closes the "images have perceptual dedup, audio only has
    * decode" gap. Re-encoded (WAV <-> AU <-> AIFF) and volume-scaled
    * copies fingerprint identically while their payload bytes share
    * nothing. Payloads decode map-side and never shuffle; only
    * (id, 16-bit key) rows enter the exchange.
    */
  def perceptualAudioPairs(media: DataFrame, maxHamming: Int = 3): DataFrame =
    pigeonholeHashPairs(
      audioFingerprints(media).toDF()
        .filter(col("fp_valid"))
        .select(col("media_id").as("id"), col("afp").as("hash")),
      maxHamming)

  /** Per-video perceptual fingerprint: the majority-vote dHash over the
    * sampled decoded frames. Sentinel convention: fp_valid=false when no
    * sampled frame decodes (non-AVI payload, non-JPEG codec) —
    * [[perceptualVideoPairs]] filters on it; n_frames counts demuxed
    * frame CHUNKS, n_decoded the sampled frames that actually decoded.
    */
  case class VideoFingerprint(
      media_id: Long,
      format: String,
      n_bytes: Long,
      n_frames: Int,
      n_decoded: Int,
      vfp: Long,
      fp_valid: Boolean)

  /** Perceptual fingerprint of each MJPEG-AVI payload: demux
    * ([[aviFrameRanges]] — the [[decodeVideoFrames]] walker), decode every
    * `stride`-th frame with ImageIO, dHash each on the shared 9x8 integer
    * grid, then MAJORITY-VOTE the 64 bits across frames (bit set when
    * more than half the decoded frames set it) — SimHash over the frame
    * sequence. Majority is what makes the signature robust where a single
    * frame's hash is not: re-muxing (chunk ids, `rec ` grouping, frame
    * count changes from dropped/duplicated frames) and per-frame
    * re-encoding leave it fixed as long as most frames still hash the
    * same, and frame-sampling stride changes survive whenever the
    * per-bit majorities do (MultimodalSpec pins both invariances on the
    * fixture).
    *
    * Scale: payloads demux and hash map-side, one 64-bit signature per
    * video crosses the exchange — identical shape to the image/audio
    * paths; a viral clip repeated corpus-wide is one hot bucket, salted
    * by [[Skew]] like every dedup join here.
    */
  def videoFingerprints(media: DataFrame, stride: Int = 1): Dataset[VideoFingerprint] = {
    require(stride > 0, "stride must be positive")
    val spark = media.sparkSession
    import spark.implicits._
    media.select(col("media_id"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions { rows =>
        javax.imageio.ImageIO.setUseCache(false) // per-partition codec init
        rows.map { case (id, p) => fingerprintOneVideo(id, p, stride) }
      }
  }

  private def fingerprintOneVideo(id: Long, p: Array[Byte], stride: Int): VideoFingerprint = {
    val nBytes = if (p == null) 0L else p.length.toLong
    def sentinel = VideoFingerprint(id, "undecodable", nBytes, -1, 0, 0L, false)
    if (p == null || p.length < 12 || fourcc(p, 0) != "RIFF" || fourcc(p, 8) != "AVI ")
      return sentinel
    val frames =
      try aviFrameRanges(p, 12, p.length)
      catch { case scala.util.control.NonFatal(_) => Nil }
    if (frames.isEmpty) return sentinel
    val bitCounts = new Array[Int](64)
    var decoded = 0
    frames.iterator.zipWithIndex
      .filter { case (_, idx) => idx % stride == 0 }
      .foreach { case ((fs, fe), _) =>
        try {
          val img = javax.imageio.ImageIO.read(
            new java.io.ByteArrayInputStream(p, fs, fe - fs))
          if (img != null) {
            decoded += 1
            val dh = dhashFromGrid(gridLumLevels(img, 9, 8))
            var b = 0
            while (b < 64) {
              if ((dh & (1L << b)) != 0L) bitCounts(b) += 1
              b += 1
            }
          }
        } catch { case scala.util.control.NonFatal(_) => () } // frame stays uncounted
      }
    if (decoded == 0)
      VideoFingerprint(id, "avi", nBytes, frames.size, 0, 0L, false)
    else {
      var vfp = 0L
      var b = 0
      while (b < 64) {
        if (2 * bitCounts(b) > decoded) vfp |= 1L << b // ties break to 0
        b += 1
      }
      VideoFingerprint(id, "mjpeg-avi", nBytes, frames.size, decoded, vfp, true)
    }
  }

  /** Perceptual near-duplicate video pairs: majority-dHash Hamming
    * distance <= `maxHamming` through the shared pigeonhole band join —
    * the last multimodal modality without a near-dup pass (images q96,
    * audio q138). Re-muxed (chunk ids, grouping, frame-count changes)
    * and per-frame re-encoded copies of a clip fingerprint within a few
    * bits while their payload bytes share nothing.
    */
  def perceptualVideoPairs(media: DataFrame, maxHamming: Int = 3,
                           stride: Int = 1): DataFrame =
    pigeonholeHashPairs(
      videoFingerprints(media, stride).toDF()
        .filter(col("fp_valid"))
        .select(col("media_id").as("id"), col("vfp").as("hash")),
      maxHamming)

  // ---- appendable fingerprint state (the url-dedup discipline for media) --

  /** Appendable media-fingerprint STATE: one (id, hash) row per payload
    * whose fingerprint is VALID — the fingerprint-once table every text
    * dedup family already has (urlState, substringState): shard ingest
    * appends its own partial, payload bytes decode exactly ONCE and are
    * never re-read when later shards arrive or the pair report re-runs.
    * Sentinel payloads own no state row — they can never pair, and a
    * valid re-crawl under a new id fingerprints fresh. The three
    * modalities share one state shape because the pair join is the same
    * pigeonhole band join over a 64-bit signature.
    */
  def imageHashState(media: DataFrame): DataFrame =
    imageHashes(media).toDF().filter(col("width") > 0)
      .select(col("media_id").as("id"), col("dhash").as("hash"))

  /** [[imageHashState]]'s audio twin (valid = fp_valid). */
  def audioFingerprintState(media: DataFrame): DataFrame =
    audioFingerprints(media).toDF().filter(col("fp_valid"))
      .select(col("media_id").as("id"), col("afp").as("hash"))

  /** [[imageHashState]]'s video twin. The stride is part of the state
    * contract: fingerprints from different strides may differ when a
    * per-bit majority is stride-sensitive, so a state table freezes ONE
    * stride — the frozen-artifact rule every incremental family follows.
    */
  def videoFingerprintState(media: DataFrame, stride: Int = 1): DataFrame =
    videoFingerprints(media, stride).toDF().filter(col("fp_valid"))
      .select(col("media_id").as("id"), col("vfp").as("hash"))

  /** Collapse persisted per-shard state partials at read:
    * `dropDuplicates()` makes a crashed append's retry idempotent — a
    * shard's rows are a deterministic pure function of the shard's
    * payloads, and identical rows can never come from two DIFFERENT
    * shards (disjoint media ids) — the normalizeUrlState argument.
    */
  def normalizeMediaState(raw: DataFrame): DataFrame = raw.dropDuplicates()

  /** Perceptual near-dup pairs off (possibly incrementally grown) state:
    * exactly [[perceptualImagePairs]]/audio/video's band join, but the
    * decode already happened at state-append time. Chained shards equal
    * the one-shot pair recompute bit-for-bit (fingerprints are per-row
    * pure functions of the payload, so state union == fingerprint of the
    * union — MediaStateSpec and q146 pin it).
    */
  def perceptualPairsFromState(state: DataFrame, maxHamming: Int = 3): DataFrame =
    pigeonholeHashPairs(state.select(col("id"), col("hash")), maxHamming)

  /** Deterministic 32x32 test card for the image-dedup contract query and
    * specs: the test corpus ships no binary media, so q96 derives payloads
    * from table keys. The card is a 9x8 BLOCK pattern (blocks aligned to
    * the hash grid): each cell's gray level comes from an integer mix of
    * (seed, cell), with an odd-column +25 offset so horizontally adjacent
    * cells ALWAYS differ by >= 25 levels — far above JPEG noise, so
    * re-encoding cannot flip a dHash bit, while the per-cell mix gives
    * every seed a distinct sign pattern. Pure integer math: bit-identical
    * on every JVM.
    */
  def renderTestCard(seed: Long, size: Int = 32): java.awt.image.BufferedImage = {
    val img = new java.awt.image.BufferedImage(
      size, size, java.awt.image.BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < size) {
      val gy = math.min(7, y.toLong * 8 / size).toInt
      var x = 0
      while (x < size) {
        val gx = math.min(8, x.toLong * 9 / size).toInt
        // avalanche-ish integer mix of (seed, cell)
        var m = seed * 1000003L + (gy * 9 + gx) * 0x9e3779b97f4a7c15L
        m ^= m >>> 29; m *= 0xbf58476d1ce4e5b9L; m ^= m >>> 32
        val base = ((m % 4 + 4) % 4).toInt       // 0..3
        val b = 40 + base * 50 + (gx % 2) * 25   // 40..215, parity-split
        img.setRGB(x, y, (b << 16) | (b << 8) | b)
        x += 1
      }
      y += 1
    }
    img
  }

  /** [[renderTestCard]] encoded to real container bytes. */
  def encodeTestCard(seed: Long, format: String, size: Int = 32): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(renderTestCard(seed, size), format, out)
    out.toByteArray
  }

  /** Deterministic PCM test tone for the audio-dedup contract query and
    * specs — [[renderTestCard]]'s audio twin, sharing its exact integer
    * mix: 72 cells of `framesPerCell` frames each; cell i carries a
    * square wave of amplitude `level(seed, i) * 100`, where level is the
    * test card's 40..215 gray ramp (odd-column +25 margin included). The
    * energy ORDER of adjacent cells therefore equals the card's level
    * order, so a tone's [[audioFingerprints]] signature is bit-identical
    * to the card's dHash — one generative model, one oracle replay, two
    * real decode paths.
    */
  def renderTestTone(seed: Long, framesPerCell: Int = 25): Array[Byte] = {
    require(framesPerCell >= 1, "framesPerCell must be positive")
    val pcm = new Array[Byte](72 * framesPerCell * 2)
    var i = 0
    while (i < 72) {
      var m = seed * 1000003L + i * 0x9e3779b97f4a7c15L
      m ^= m >>> 29; m *= 0xbf58476d1ce4e5b9L; m ^= m >>> 32
      val base = ((m % 4 + 4) % 4).toInt
      val amp = (40 + base * 50 + (i % 9 % 2) * 25) * 100
      var j = 0
      while (j < framesPerCell) {
        val s = (if (j % 2 == 0) amp else -amp).toShort
        val off = (i * framesPerCell + j) * 2
        pcm(off) = (s & 0xff).toByte
        pcm(off + 1) = (s >> 8).toByte
        j += 1
      }
      i += 1
    }
    pcm
  }

  /** [[renderTestTone]] encoded to real container bytes ("wave", "au",
    * "aiff" — the three writers the JDK ships; the AU/AIFF writers
    * byte-swap to big-endian themselves, which is exactly the re-encode
    * the dedup must see through).
    */
  def encodeTestTone(seed: Long, format: String, framesPerCell: Int = 25): Array[Byte] = {
    import javax.sound.sampled._
    val tpe = format match {
      case "wave" | "wav" => AudioFileFormat.Type.WAVE
      case "au" => AudioFileFormat.Type.AU
      case "aiff" => AudioFileFormat.Type.AIFF
      case other => throw new IllegalArgumentException(s"no JDK writer for '$other'")
    }
    val pcm = renderTestTone(seed, framesPerCell)
    val fmt = new AudioFormat(8000f, 16, 1, true, false)
    val in = new AudioInputStream(
      new java.io.ByteArrayInputStream(pcm), fmt, pcm.length / 2)
    val out = new java.io.ByteArrayOutputStream()
    AudioSystem.write(in, tpe, out)
    out.toByteArray
  }

  /** One WAV + one AU encoding of each key's test tone, in the canonical
    * media schema — media_id = 2*key for the WAV, 2*key+1 for the AU.
    * The audio-dedup fixture: every (2k, 2k+1) pair is a true re-encoded
    * near-duplicate; distinct keys are distinct signals.
    */
  def testToneMedia(keys: DataFrame, keyCol: String): DataFrame = {
    val spark = keys.sparkSession
    import spark.implicits._
    val rows = keys.select(col(keyCol).cast("long")).as[Long]
      .flatMap { k =>
        Seq(
          MediaRow(2 * k, encodeTestTone(k, "wave"), MediaMeta("wav", -1L)),
          MediaRow(2 * k + 1, encodeTestTone(k, "au"), MediaMeta("au", -1L)))
      }
    rows.toDF().select(col("media_id"), col("payload"),
      struct(col("meta.format").as("format"),
        length(col("payload")).cast("long").as("n_bytes")).as("meta"))
  }

  /** One PNG + one JPEG encoding of each key's test card, in the canonical
    * media schema — media_id = 2*key for the PNG, 2*key+1 for the JPEG.
    * The q96 fixture: every (2k, 2k+1) pair is a true re-encoded
    * near-duplicate; distinct keys are distinct images.
    */
  def testCardMedia(keys: DataFrame, keyCol: String): DataFrame = {
    val spark = keys.sparkSession
    import spark.implicits._
    val rows = keys.select(col(keyCol).cast("long")).as[Long]
      .flatMap { k =>
        Seq(
          MediaRow(2 * k, encodeTestCard(k, "png"), MediaMeta("png", -1L)),
          MediaRow(2 * k + 1, encodeTestCard(k, "jpg"), MediaMeta("jpeg", -1L)))
      }
    rows.toDF().select(col("media_id"), col("payload"),
      struct(col("meta.format").as("format"),
        length(col("payload")).cast("long").as("n_bytes")).as("meta"))
  }

  /** A RIFF chunk: [fourcc][LE size][data][pad-to-even]. */
  private def riffChunk(id: String, data: Array[Byte]): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    out.write(id.getBytes(java.nio.charset.StandardCharsets.US_ASCII))
    val n = data.length
    out.write(n & 0xff); out.write((n >> 8) & 0xff)
    out.write((n >> 16) & 0xff); out.write((n >> 24) & 0xff)
    out.write(data, 0, n)
    if ((n & 1) == 1) out.write(0) // RIFF pads chunks to even sizes
    out.toByteArray
  }

  /** Deterministic MJPEG-AVI test clip — [[renderTestCard]]'s video twin:
    * `nFrames` JPEG encodings of the SAME seed-`seed` card inside a real
    * RIFF AVI. Two mux variants exercise the demuxer surface a re-encode
    * crosses: variant 0 writes `00dc` chunks directly under `movi`;
    * variant 1 writes `00db` chunks nested in a `rec ` grouping (and
    * callers vary nFrames) — byte-level nothing alike, perceptually the
    * same clip. Every frame carries the card's dHash, so the clip's
    * majority fingerprint IS the card hash and the q96 oracle replay
    * value-checks this real demux+decode path too (the q138 pattern).
    */
  def encodeTestVideo(seed: Long, nFrames: Int, variant: Int): Array[Byte] = {
    require(nFrames >= 1, "nFrames must be positive")
    val jpeg = encodeTestCard(seed, "jpg")
    muxAvi(Seq.fill(nFrames)(jpeg), variant)
  }

  /** Mux arbitrary frame payloads into a real RIFF AVI — the shared body
    * of [[encodeTestVideo]], exposed package-private so VideoDedupSpec
    * can plant clips encodeTestVideo cannot express (a corrupt frame
    * mid-clip, two DIFFERENT cards for the majority-tie case, non-JPEG
    * frame chunks for the zero-decoded sentinel).
    */
  private[graft] def muxAvi(framePayloads: Seq[Array[Byte]], variant: Int): Array[Byte] = {
    val chunkId = if (variant == 0) "00dc" else "00db"
    val frames = new java.io.ByteArrayOutputStream()
    framePayloads.foreach(f => frames.write(riffChunk(chunkId, f)))
    val inner =
      if (variant == 0) frames.toByteArray
      else riffChunk("LIST",
        "rec ".getBytes(java.nio.charset.StandardCharsets.US_ASCII) ++ frames.toByteArray)
    val movi = "movi".getBytes(java.nio.charset.StandardCharsets.US_ASCII) ++ inner
    val body = "AVI ".getBytes(java.nio.charset.StandardCharsets.US_ASCII) ++
      riffChunk("LIST", movi)
    riffChunk("RIFF", body)
  }

  /** Two mux variants of each key's test clip, in the canonical media
    * schema — media_id = 2*key for the 3-frame movi-direct variant,
    * 2*key+1 for the 5-frame rec-grouped one. The video-dedup fixture:
    * every (2k, 2k+1) pair is a true re-muxed near-duplicate; distinct
    * keys are distinct clips.
    */
  def testVideoMedia(keys: DataFrame, keyCol: String): DataFrame = {
    val spark = keys.sparkSession
    import spark.implicits._
    val rows = keys.select(col(keyCol).cast("long")).as[Long]
      .flatMap { k =>
        Seq(
          MediaRow(2 * k, encodeTestVideo(k, nFrames = 3, variant = 0), MediaMeta("avi", -1L)),
          MediaRow(2 * k + 1, encodeTestVideo(k, nFrames = 5, variant = 1), MediaMeta("avi", -1L)))
      }
    rows.toDF().select(col("media_id"), col("payload"),
      struct(col("meta.format").as("format"),
        length(col("payload")).cast("long").as("n_bytes")).as("meta"))
  }
}
