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
}
