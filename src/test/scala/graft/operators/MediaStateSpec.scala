package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkTestBase

/** Appendable media-fingerprint state (the url-dedup discipline for the
  * media dedup family): shard-chained state equals the one-shot pair
  * recompute for every modality, sentinels own no state row, and a
  * crashed append's replayed partial collapses at read.
  */
class MediaStateSpec extends SparkTestBase {
  import spark.implicits._

  private def keys(r: Range) = r.map(_.toLong).toDF("doc_id")

  private def pairsOf(df: org.apache.spark.sql.DataFrame) =
    df.select("id_a", "id_b").as[(Long, Long)].collect().toSet

  test("image: chained shard states == one-shot pairs; planted re-encodes found") {
    val all = Multimodal.testCardMedia(keys(1 to 16), "doc_id")
    val st0 = Multimodal.imageHashState(
      Multimodal.testCardMedia(keys(1 to 9), "doc_id"))
    val st1 = Multimodal.imageHashState(
      Multimodal.testCardMedia(keys(10 to 16), "doc_id"))
    val chained = Multimodal.perceptualPairsFromState(
      Multimodal.normalizeMediaState(st0.unionByName(st1)))
    pairsOf(chained) shouldBe pairsOf(Multimodal.perceptualImagePairs(all))
    pairsOf(chained) shouldBe (1L to 16L).map(k => (2 * k, 2 * k + 1)).toSet
  }

  test("audio: chained shard states == one-shot pairs") {
    val all = Multimodal.testToneMedia(keys(1 to 12), "doc_id")
    val st = Multimodal.normalizeMediaState(
      Multimodal.audioFingerprintState(
          Multimodal.testToneMedia(keys(1 to 6), "doc_id"))
        .unionByName(Multimodal.audioFingerprintState(
          Multimodal.testToneMedia(keys(7 to 12), "doc_id"))))
    pairsOf(Multimodal.perceptualPairsFromState(st)) shouldBe
      pairsOf(Multimodal.perceptualAudioPairs(all))
  }

  test("video: chained shard states == one-shot pairs at the frozen stride") {
    val all = Multimodal.testVideoMedia(keys(1 to 10), "doc_id")
    val st = Multimodal.normalizeMediaState(
      Multimodal.videoFingerprintState(
          Multimodal.testVideoMedia(keys(1 to 5), "doc_id"), stride = 2)
        .unionByName(Multimodal.videoFingerprintState(
          Multimodal.testVideoMedia(keys(6 to 10), "doc_id"), stride = 2)))
    pairsOf(Multimodal.perceptualPairsFromState(st)) shouldBe
      pairsOf(Multimodal.perceptualVideoPairs(all, stride = 2))
  }

  test("sentinel payloads own no state row; a replayed partial collapses at read") {
    val garbage: Array[Byte] = Array.fill(64)(0x5a.toByte)
    val mixed = Multimodal.asMedia(
      Seq((2L, Multimodal.encodeTestCard(1L, "png"), "png"),
        (3L, Multimodal.encodeTestCard(1L, "jpg"), "jpeg"),
        (90L, garbage, "png"),
        (91L, null.asInstanceOf[Array[Byte]], "png"))
        .toDF("id", "payload", "fmt"), "id", "payload", "fmt")
    val st = Multimodal.imageHashState(mixed)
    st.select("id").as[Long].collect().toSet shouldBe Set(2L, 3L)
    // crash-retry: the same shard partial appended twice is one state
    val replayed = Multimodal.normalizeMediaState(st.unionByName(st))
    replayed.count() shouldBe 2L
    pairsOf(Multimodal.perceptualPairsFromState(replayed)) shouldBe Set((2L, 3L))
  }
}
