package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkTestBase

/** Perceptual video dedup (q145's operator): the majority-vote dHash over
  * demuxed MJPEG-AVI frames survives re-muxing (chunk ids, `rec `
  * grouping, frame-count changes) and frame-sampling stride changes that
  * byte-level dedup cannot see through; the sentinel convention and the
  * majority tie-to-0 rule hold exactly as scaladoc'd; the banded pair
  * join finds exactly the planted re-muxed duplicates and nothing else —
  * the ImageDedupSpec/MultimodalSpec discipline applied to the last
  * spec-less modality.
  */
class VideoDedupSpec extends SparkTestBase {
  import spark.implicits._

  private def fpsOf(rows: Seq[(Long, Array[Byte])], stride: Int = 1) =
    Multimodal.videoFingerprints(
      Multimodal.asMedia(
        rows.map { case (id, p) => (id, p, "avi") }.toDF("id", "payload", "fmt"),
        "id", "payload", "fmt"),
      stride)
      .collect().map(f => f.media_id -> f).toMap

  /** dHash of one encoded frame payload, through the image path — the
    * single-frame ground truth the majority vote is checked against. */
  private def frameHash(jpeg: Array[Byte]): Long =
    Multimodal.imageHashes(
      Multimodal.asMedia(Seq((1L, jpeg, "jpeg")).toDF("id", "payload", "fmt"),
        "id", "payload", "fmt"))
      .collect().head.dhash

  test("re-mux invariance: movi-direct vs rec-grouped with different frame counts " +
    "fingerprint identically while sharing no bytes") {
    (1L to 10L).foreach { seed =>
      val v0 = Multimodal.encodeTestVideo(seed, nFrames = 3, variant = 0)
      val v1 = Multimodal.encodeTestVideo(seed, nFrames = 5, variant = 1)
      v0 should not equal v1 // exact dedup sees nothing
      val h = fpsOf(Seq((1L, v0), (2L, v1)))
      withClue(s"seed $seed:") {
        h(1L).format shouldBe "mjpeg-avi"
        h(1L).fp_valid shouldBe true
        h(1L).n_frames shouldBe 3
        h(2L).n_frames shouldBe 5
        h(1L).n_decoded shouldBe 3
        h(2L).n_decoded shouldBe 5
        // identical frames -> the majority IS the frame hash: exact match,
        // not merely within the pair join's Hamming budget
        h(1L).vfp shouldBe h(2L).vfp
        h(1L).vfp shouldBe frameHash(Multimodal.encodeTestCard(seed, "jpg"))
      }
    }
  }

  test("stride invariance: sampling every 2nd/3rd frame leaves the majority " +
    "fingerprint fixed; n_decoded counts only the sampled frames") {
    val clip = Multimodal.encodeTestVideo(seed = 4L, nFrames = 6, variant = 0)
    val byStride = Seq(1, 2, 3).map(s => s -> fpsOf(Seq((1L, clip)), stride = s)(1L))
    byStride.foreach { case (s, f) =>
      withClue(s"stride $s:") {
        f.fp_valid shouldBe true
        f.n_frames shouldBe 6 // demuxed chunks, independent of sampling
        f.n_decoded shouldBe (6 + s - 1) / s
        f.vfp shouldBe byStride.head._2.vfp
      }
    }
    an[IllegalArgumentException] should be thrownBy
      Multimodal.videoFingerprints(
        Multimodal.asMedia(Seq((1L, clip, "avi")).toDF("id", "payload", "fmt"),
          "id", "payload", "fmt"), stride = 0)
  }

  test("majority tie breaks to 0: a two-frame clip of DISTINCT cards " +
    "fingerprints to the AND of the frame hashes") {
    val a = Multimodal.encodeTestCard(3L, "jpg")
    val b = Multimodal.encodeTestCard(11L, "jpg")
    val (ha, hb) = (frameHash(a), frameHash(b))
    ha should not equal hb // distinct seeds -> distinct sign patterns
    val f = fpsOf(Seq((1L, Multimodal.muxAvi(Seq(a, b), variant = 0))))(1L)
    f.n_decoded shouldBe 2
    // a bit set in exactly one of two frames has count 1; 2*1 > 2 is
    // false, so the tie drops the bit — only both-set bits survive
    f.vfp shouldBe (ha & hb)
  }

  test("corrupt frame mid-clip stays uncounted; the surviving majority still " +
    "equals the card hash") {
    val jpeg = Multimodal.encodeTestCard(9L, "jpg")
    val garbage: Array[Byte] = Array.fill(128)(0x5a.toByte)
    val f = fpsOf(Seq((1L, Multimodal.muxAvi(Seq(jpeg, garbage, jpeg), variant = 0))))(1L)
    f.format shouldBe "mjpeg-avi"
    f.n_frames shouldBe 3  // the corrupt chunk demuxes fine...
    f.n_decoded shouldBe 2 // ...but never decodes
    f.fp_valid shouldBe true
    f.vfp shouldBe frameHash(jpeg)
  }

  test("zero-decoded sentinel: an AVI whose frame chunks are all non-JPEG " +
    "keeps format 'avi', fp_valid=false") {
    val garbage: Array[Byte] = Array.fill(64)(0x33.toByte)
    val f = fpsOf(Seq((1L, Multimodal.muxAvi(Seq(garbage, garbage), variant = 1))))(1L)
    f.format shouldBe "avi" // the container parsed; the codec did not
    f.n_frames shouldBe 2
    f.n_decoded shouldBe 0
    f.fp_valid shouldBe false
    f.vfp shouldBe 0L
  }

  test("non-AVI sentinels: PNG payload, short garbage, null, and a frame-less " +
    "AVI all become undecodable and never reach the pair join") {
    val rows = Seq(
      (1L, Multimodal.encodeTestCard(1L, "png")),       // wrong container
      (2L, Array.fill[Byte](8)(0x7f)),                  // shorter than RIFF header
      (3L, null.asInstanceOf[Array[Byte]]),
      (4L, Multimodal.muxAvi(Nil, variant = 0)))        // valid RIFF, empty movi
    val hs = fpsOf(rows)
    rows.map(_._1).foreach { id =>
      withClue(s"id $id:") {
        hs(id).format shouldBe "undecodable"
        hs(id).n_frames shouldBe -1
        hs(id).fp_valid shouldBe false
      }
    }
  }

  test("pair join finds exactly the planted re-muxed pairs across 12 clips; " +
    "invalid fingerprints never pair") {
    val planted = Multimodal.testVideoMedia((1L to 12L).toDF("doc_id"), "doc_id")
    val noise = Multimodal.asMedia(
      Seq((1000L, Array.fill[Byte](64)(0x5a), "avi"),
        (1001L, null.asInstanceOf[Array[Byte]], "avi"))
        .toDF("id", "payload", "fmt"), "id", "payload", "fmt")
    val pairs = Multimodal.perceptualVideoPairs(planted.unionByName(noise))
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    pairs shouldBe (1L to 12L).map(k => (2 * k, 2 * k + 1)).toSet
  }
}
