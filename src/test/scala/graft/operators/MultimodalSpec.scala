package graft.operators

import graft.SparkTestBase

/** Binary-column plumbing: schema shape, parquet round-trip, deterministic
  * stub decode, payload dropped after decode.
  */
class MultimodalSpec extends SparkTestBase {
  import spark.implicits._

  private lazy val media = Multimodal.asMedia(
    Seq((1L, "hello world", "txt"), (2L, "abc", "txt")).toDF("id", "data", "fmt"),
    "id", "data", "fmt")

  test("canonical media schema: id, binary payload, typed meta struct") {
    media.schema.fieldNames.toSeq shouldBe Seq("media_id", "payload", "meta")
    media.schema("payload").dataType.typeName shouldBe "binary"
    val meta = media.select("meta.format", "meta.n_bytes").as[(String, Long)].collect().toMap
    meta("txt") should (be(11L) or be(3L))
  }

  test("decode is deterministic and drops the payload column") {
    val out = Multimodal.decode(media, dim = 4)
    out.schema.fieldNames should not contain "payload"
    val r = out.collect().sortBy(_.media_id)
    r(0).n_bytes shouldBe 11L
    r(0).width shouldBe 256 + 'h'.toInt // header stub reads first byte
    r(0).height shouldBe 256 + 'e'.toInt
    r(0).feature.length shouldBe 4
    // run twice -> identical features (pure function of bytes)
    val again = Multimodal.decode(media, dim = 4).collect().sortBy(_.media_id)
    r(0).feature.toSeq shouldBe again(0).feature.toSeq
    // L1 normalized
    r(0).feature.sum shouldBe 1.0f +- 0.001f
  }

  test("binary payload survives a parquet round-trip") {
    val path = s"/tmp/graft-test-media-${System.nanoTime()}"
    media.write.parquet(path)
    val back = spark.read.parquet(path)
    val decoded = Multimodal.decode(back, dim = 4).collect().sortBy(_.media_id)
    decoded(0).width shouldBe 256 + 'h'.toInt
  }

  test("frame sampling keeps every stride-th fixed-size frame") {
    // "hello world" = 11 bytes -> 5 frames of 2 bytes; stride 2 -> frames 0, 2, 4
    val frames = Multimodal.frameSample(media, frameBytes = 2, stride = 2)
      .collect().filter(_.media_id == 1L).sortBy(_.frame_idx)
    frames.map(_.frame_idx).toSeq shouldBe Seq(0, 2, 4)
    new String(frames(0).frame) shouldBe "he"
    new String(frames(1).frame) shouldBe "o "
    // 3-byte payload -> 1 frame
    Multimodal.frameSample(media, 2, 2).collect().count(_.media_id == 2L) shouldBe 1
  }

  test("resize re-decodes at a new feature dimension, same headers") {
    val d4 = Multimodal.decode(media, dim = 4).collect().sortBy(_.media_id)
    val d8 = Multimodal.resize(media, newDim = 8).collect().sortBy(_.media_id)
    d8(0).feature.length shouldBe 8
    d8(0).width shouldBe d4(0).width
    d8(0).feature.sum shouldBe 1.0f +- 0.001f
  }

  // ---- REAL image decode (JDK ImageIO) --------------------------------

  /** encode a width x height gradient/solid image as real PNG bytes */
  private def pngBytes(width: Int, height: Int)(rgb: (Int, Int) => Int): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(
      width, height, java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until height; x <- 0 until width) img.setRGB(x, y, rgb(x, y))
    val out = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", out)
    out.toByteArray
  }

  test("real PNG decode: actual dimensions, sniffed format, band luminance") {
    // left half black, right half white, 40x10 -> bands: [0, 0, 1, 1]
    val halfAndHalf = pngBytes(40, 10)((x, _) => if (x < 20) 0x000000 else 0xffffff)
    val solidGray = pngBytes(8, 8)((_, _) => 0x808080) // every band 128/255
    val imgs = Seq(
      (1L, halfAndHalf, "img"),
      (2L, solidGray, "img"),
      (3L, Array.fill[Byte](64)(42), "img")) // not an image at all
      .toDF("media_id", "payload", "format")
    val out = Multimodal.decodeImages(
        Multimodal.asMedia(imgs, "media_id", "payload", "format"), dim = 4)
      .collect().sortBy(_.media_id)

    out(0).width shouldBe 40
    out(0).height shouldBe 10
    out(0).format shouldBe "png"
    out(0).feature(0) shouldBe 0f +- 0.01f
    out(0).feature(1) shouldBe 0f +- 0.01f
    out(0).feature(2) shouldBe 1f +- 0.01f
    out(0).feature(3) shouldBe 1f +- 0.01f

    out(1).width shouldBe 8
    out(1).feature.foreach(_ shouldBe (0x80 / 255.0f) +- 0.01f)

    // corrupt payload: sentinel row, not a task failure
    out(2).format shouldBe "undecodable"
    out(2).width shouldBe -1
    out(2).feature.toSeq shouldBe Seq(0f, 0f, 0f, 0f)
  }

  test("real decode survives the parquet round-trip like the stub path") {
    val png = pngBytes(6, 3)((x, y) => if ((x + y) % 2 == 0) 0xffffff else 0x000000)
    val path = s"/tmp/graft-test-img-${System.nanoTime()}"
    Multimodal.asMedia(
        Seq((7L, png, "img")).toDF("media_id", "payload", "format"),
        "media_id", "payload", "format")
      .write.parquet(path)
    val back = Multimodal.decodeImages(spark.read.parquet(path), dim = 2).collect()
    back.head.width shouldBe 6
    back.head.height shouldBe 3
    back.head.format shouldBe "png"
    // checkerboard, 3x3 pixels per band: band 0 starts on white parity
    // (5 of 9 white), band 1 on black parity (4 of 9 white)
    back.head.feature(0) shouldBe (5f / 9f) +- 0.01f
    back.head.feature(1) shouldBe (4f / 9f) +- 0.01f
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(path))
  }

  // ---- REAL audio decode (JDK javax.sound.sampled) --------------------

  /** encode 16-bit mono little-endian PCM samples as real WAV bytes */
  private def wavBytes(samples: Array[Short], rate: Float): Array[Byte] = {
    import javax.sound.sampled._
    val fmt = new AudioFormat(rate, 16, 1, true, false)
    val pcm = new Array[Byte](samples.length * 2)
    samples.zipWithIndex.foreach { case (s, i) =>
      pcm(2 * i) = (s & 0xff).toByte
      pcm(2 * i + 1) = ((s >> 8) & 0xff).toByte
    }
    val ais = new AudioInputStream(
      new java.io.ByteArrayInputStream(pcm), fmt, samples.length.toLong)
    val out = new java.io.ByteArrayOutputStream()
    AudioSystem.write(ais, AudioFileFormat.Type.WAVE, out)
    out.toByteArray
  }

  test("real WAV decode: header fields and per-band RMS from actual PCM") {
    // 400 frames: first half silence, second half full-scale square wave
    val samples = Array.tabulate[Short](400)(i =>
      if (i < 200) 0
      else if (i % 2 == 0) 32767 else -32768)
    val wav = wavBytes(samples, rate = 8000f)
    val rows = Seq(
      (1L, wav, "audio"),
      (2L, Array.fill[Byte](32)(7), "audio")) // not audio
      .toDF("media_id", "payload", "format")
    val out = Multimodal.decodeAudio(
        Multimodal.asMedia(rows, "media_id", "payload", "format"), dim = 2)
      .collect().sortBy(_.media_id)

    out(0).format shouldBe "wav"
    out(0).sample_rate shouldBe 8000f
    out(0).channels shouldBe 1
    out(0).n_frames shouldBe 400L
    out(0).feature(0) shouldBe 0f +- 0.001f   // silent half
    out(0).feature(1) shouldBe 1f +- 0.001f   // full-scale square: RMS ~ 1

    out(1).format shouldBe "undecodable"
    out(1).sample_rate shouldBe -1f
    out(1).feature.toSeq shouldBe Seq(0f, 0f)
  }

  test("null payloads sentinel through both real decoders, never crash the task") {
    val rows = Seq((1L, Option.empty[Array[Byte]], "img"))
      .toDF("media_id", "payload", "format")
    val media = Multimodal.asMedia(rows, "media_id", "payload", "format")
    val img = Multimodal.decodeImages(media, dim = 2).collect().head
    img.format shouldBe "undecodable"
    img.n_bytes shouldBe 0L
    val aud = Multimodal.decodeAudio(media, dim = 2).collect().head
    aud.format shouldBe "undecodable"
    aud.n_frames shouldBe -1L
  }

  // ---- MP4 header fixtures: real ISO-BMFF boxes built byte-by-byte ----

  private def mp4Box(tpe: String, payload: Array[Byte]): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(8 + payload.length)
    bb.putInt(8 + payload.length)
    bb.put(tpe.getBytes("US-ASCII"))
    bb.put(payload)
    bb.array()
  }

  /** mvhd v0: ver+flags, creation, modification, timescale, duration, then
    * rate/volume/matrix/next-track padding to the spec's 100-byte payload
    */
  private def mvhd(timescale: Int, duration: Int): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(100)
    bb.putInt(0).putInt(0).putInt(0).putInt(timescale).putInt(duration)
    mp4Box("mvhd", bb.array())
  }

  /** tkhd v0: 16.16-fixed width/height at payload offsets 76/80 */
  private def tkhd(w: Int, h: Int): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(84)
    bb.position(76)
    bb.putInt(w << 16).putInt(h << 16)
    mp4Box("tkhd", bb.array())
  }

  private def trak(w: Int, h: Int): Array[Byte] = mp4Box("trak", tkhd(w, h))

  test("real MP4 header parse: width/height/duration/tracks from actual boxes") {
    val ftyp = mp4Box("ftyp", "isom".getBytes("US-ASCII") ++ new Array[Byte](4) ++ "mp41".getBytes("US-ASCII"))
    // video track (640x360) after an audio track (zero dims) — the parser
    // must skip to the first track with real dimensions
    val moov = mp4Box("moov", mvhd(timescale = 600, duration = 1500) ++ trak(0, 0) ++ trak(640, 360))
    val mdat = mp4Box("mdat", Array.fill[Byte](32)(7))
    val good = ftyp ++ moov ++ mdat
    val corrupt = Array.fill[Byte](64)(0x5a)
    val truncated = good.take(ftyp.length + 20) // moov size field points past EOF
    val media = Multimodal.asMedia(
      Seq((1L, good), (2L, corrupt), (3L, truncated))
        .toDF("media_id", "payload").withColumn("format", org.apache.spark.sql.functions.lit("mp4")),
      "media_id", "payload", "format")
    val out = Multimodal.parseVideoHeaders(media).collect().sortBy(_.media_id)
    out(0).format shouldBe "mp4"
    out(0).width shouldBe 640
    out(0).height shouldBe 360
    out(0).duration_ms shouldBe 2500L // 1500 / 600 ticks = 2.5s
    out(0).n_tracks shouldBe 2
    out(1).format shouldBe "undecodable"
    out(1).width shouldBe -1
    // truncated: ftyp present but the moov walk finds nothing parseable
    out(2).format shouldBe "undecodable"
  }

  test("MP4 64-bit largesize boxes and v1 headers parse too") {
    val ftyp = mp4Box("ftyp", "isom".getBytes("US-ASCII"))
    // mvhd v1: 8-byte times, 4-byte timescale at offset 20, 8-byte duration
    val mv = java.nio.ByteBuffer.allocate(112)
    mv.put(0, 1.toByte) // version 1
    mv.putInt(20, 1000).putLong(24, 7250L)
    val moovPayload = mp4Box("mvhd", mv.array()) ++ trak(1920, 1080)
    // moov with size=1 + 64-bit largesize header
    val bb = java.nio.ByteBuffer.allocate(16 + moovPayload.length)
    bb.putInt(1).put("moov".getBytes("US-ASCII")).putLong(16L + moovPayload.length).put(moovPayload)
    val payload = ftyp ++ bb.array()
    val media = Multimodal.asMedia(
      Seq((9L, payload)).toDF("media_id", "payload")
        .withColumn("format", org.apache.spark.sql.functions.lit("mp4")),
      "media_id", "payload", "format")
    val out = Multimodal.parseVideoHeaders(media).collect().head
    out.format shouldBe "mp4"
    out.duration_ms shouldBe 7250L
    out.width shouldBe 1920
    out.height shouldBe 1080
    out.n_tracks shouldBe 1
  }

  /** JPEG bytes of a solid-gray frame (the JDK writes real JPEGs). */
  private def jpegBytes(width: Int, height: Int, gray: Int): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(
      width, height, java.awt.image.BufferedImage.TYPE_INT_RGB)
    val rgb = (gray << 16) | (gray << 8) | gray
    for (y <- 0 until height; x <- 0 until width) img.setRGB(x, y, rgb)
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "jpg", bos)
    bos.toByteArray
  }

  /** A RIFF chunk: [fourcc][LE size][data][pad-to-even]. */
  private def riffChunk(id: String, data: Array[Byte]): Array[Byte] = {
    val pad = data.length & 1
    val b = java.nio.ByteBuffer.allocate(8 + data.length + pad)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    b.put(id.getBytes("US-ASCII")).putInt(data.length).put(data)
    b.array()
  }

  /** A minimal-but-real MJPEG AVI: RIFF('AVI ' LIST('movi' 00dc-frames)). */
  private def mjpegAvi(frames: Array[Byte]*): Array[Byte] = {
    val movi = "movi".getBytes("US-ASCII") ++
      frames.toArray.flatMap(f => riffChunk("00dc", f))
    val body = "AVI ".getBytes("US-ASCII") ++ riffChunk("LIST", movi)
    riffChunk("RIFF", body)
  }

  test("real MJPEG-AVI frame decode: per-frame dimensions and luminance from actual JPEGs") {
    // dark / mid / bright frames: luminance must come from the real pixels
    val avi = mjpegAvi(jpegBytes(16, 8, 16), jpegBytes(16, 8, 128), jpegBytes(16, 8, 240))
    val media = Multimodal.asMedia(
      Seq((1L, avi)).toDF("media_id", "payload")
        .withColumn("format", org.apache.spark.sql.functions.lit("avi")),
      "media_id", "payload", "format")
    val out = Multimodal.decodeVideoFrames(media).collect().sortBy(_.frame_idx)
    out should have length 3
    out.foreach { f =>
      f.format shouldBe "mjpeg"
      f.width shouldBe 16
      f.height shouldBe 8
    }
    // luminance ordering follows the painted gray levels (JPEG is lossy —
    // compare ordering, not exact values)
    val lums = out.map(_.feature.sum)
    lums(0) should be < lums(1)
    lums(1) should be < lums(2)

    // stride 2 keeps frames 0 and 2
    Multimodal.decodeVideoFrames(media, stride = 2)
      .collect().map(_.frame_idx).sorted shouldBe Array(0, 2)
  }

  test("MJPEG decode: non-AVI and non-JPEG payloads stay sentinel rows, never errors") {
    val junk = Multimodal.asMedia(
      Seq((1L, "not a riff file at all".getBytes("US-ASCII"))).toDF("media_id", "payload")
        .withColumn("format", org.apache.spark.sql.functions.lit("avi")),
      "media_id", "payload", "format")
    val j = Multimodal.decodeVideoFrames(junk).collect()
    j should have length 1
    j.head.frame_idx shouldBe -1
    j.head.format shouldBe "undecodable"

    // a structurally-valid AVI whose frame chunk is NOT a JPEG (h264-like):
    // per-frame sentinel, real frames around it still decode
    val mixed = mjpegAvi(jpegBytes(8, 8, 100), Array.fill[Byte](64)(0x42))
    val m = Multimodal.asMedia(
      Seq((2L, mixed)).toDF("media_id", "payload")
        .withColumn("format", org.apache.spark.sql.functions.lit("avi")),
      "media_id", "payload", "format")
    val out = Multimodal.decodeVideoFrames(m).collect().sortBy(_.frame_idx)
    out should have length 2
    out(0).format shouldBe "mjpeg"
    out(1).format shouldBe "undecodable"
    out(1).frame_idx shouldBe 1
  }

  test("audio fingerprint: container re-encode and volume scaling never change the signature") {
    // one synthetic signal, three containers + one half-volume WAV
    def mediaOf(rows: Seq[(Long, Array[Byte])]) =
      Multimodal.asMedia(rows.toDF("media_id", "payload")
        .withColumn("fmt", org.apache.spark.sql.functions.lit("audio")),
        "media_id", "payload", "fmt")
    val pcm = Multimodal.renderTestTone(42L)
    val half = pcm.grouped(2).flatMap { b =>
      val s = (((b(1) << 8) | (b(0) & 0xff)).toShort / 2).toShort
      Seq((s & 0xff).toByte, (s >> 8).toByte)
    }.toArray
    def wavOf(bytes: Array[Byte]): Array[Byte] = {
      import javax.sound.sampled._
      val out = new java.io.ByteArrayOutputStream()
      AudioSystem.write(new AudioInputStream(
        new java.io.ByteArrayInputStream(bytes),
        new AudioFormat(8000f, 16, 1, true, false), bytes.length / 2),
        AudioFileFormat.Type.WAVE, out)
      out.toByteArray
    }
    val fps = Multimodal.audioFingerprints(mediaOf(Seq(
        1L -> Multimodal.encodeTestTone(42L, "wave"),
        2L -> Multimodal.encodeTestTone(42L, "au"),
        3L -> Multimodal.encodeTestTone(42L, "aiff"),
        4L -> wavOf(half),
        5L -> Multimodal.encodeTestTone(7L, "wave"))))
      .collect().sortBy(_.media_id)
    fps.forall(_.fp_valid) shouldBe true
    fps.map(_.afp).distinct.length shouldBe 2          // seed 42 x4, seed 7
    fps.take(4).map(_.afp).distinct.length shouldBe 1  // re-encode + volume invariant
    fps(4).afp should not be fps(0).afp
  }

  test("perceptualAudioPairs: every re-encoded twin at hamming 0; short and non-audio payloads excluded") {
    val keys = Seq(10L, 11L, 12L).toDF("k")
    val fixture = Multimodal.testToneMedia(keys, "k")
    // inject junk: a 40-frame (sub-72) WAV and a non-audio payload
    val shortWav = {
      import javax.sound.sampled._
      val out = new java.io.ByteArrayOutputStream()
      AudioSystem.write(new AudioInputStream(
        new java.io.ByteArrayInputStream(new Array[Byte](80)),
        new AudioFormat(8000f, 16, 1, true, false), 40),
        AudioFileFormat.Type.WAVE, out)
      out.toByteArray
    }
    val junk = Multimodal.asMedia(
      Seq((1000L, shortWav, "wav"), (1001L, Array.fill[Byte](64)(3), "bin"))
        .toDF("media_id", "payload", "fmt"), "media_id", "payload", "fmt")
    val pairs = Multimodal.perceptualAudioPairs(fixture.unionByName(junk))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
    // each (2k, 2k+1) twin present at hamming 0
    Seq(10L, 11L, 12L).foreach { k =>
      pairs should contain ((2 * k, 2 * k + 1, 0))
    }
    // junk ids never appear
    pairs.flatMap(p => Seq(p._1, p._2)).toSet.intersect(Set(1000L, 1001L)) shouldBe Set.empty
  }
}
