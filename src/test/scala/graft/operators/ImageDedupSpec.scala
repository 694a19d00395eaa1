package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkTestBase

/** Perceptual image dedup: dHash survives re-encoding and brightness
  * shifts that kill byte-level dedup; the banded pair join finds exactly
  * the planted re-encoded duplicates and nothing else.
  */
class ImageDedupSpec extends SparkTestBase {
  import spark.implicits._

  private def hashesOf(rows: Seq[(Long, Array[Byte], String)]) =
    Multimodal.imageHashes(
      Multimodal.asMedia(rows.toDF("id", "payload", "fmt"), "id", "payload", "fmt"))
      .collect().map(h => h.media_id -> h).toMap

  test("dHash: JPEG re-encode of the same card stays within Hamming 3; bytes differ") {
    (1L to 20L).foreach { seed =>
      val png = Multimodal.encodeTestCard(seed, "png")
      val jpg = Multimodal.encodeTestCard(seed, "jpg")
      png should not equal jpg // exact dedup sees nothing
      val h = hashesOf(Seq((1L, png, "png"), (2L, jpg, "jpeg")))
      val d = java.lang.Long.bitCount(h(1L).dhash ^ h(2L).dhash)
      withClue(s"seed $seed (hamming $d):")(d should be <= 3)
    }
  }

  test("dHash: a uniform brightness shift leaves the hash untouched") {
    val img = Multimodal.renderTestCard(7L)
    val shifted = new java.awt.image.BufferedImage(32, 32,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until 32; x <- 0 until 32) {
      val b = math.min(255, (img.getRGB(x, y) & 0xff) + 30)
      shifted.setRGB(x, y, (b << 16) | (b << 8) | b)
    }
    def bytes(i: java.awt.image.BufferedImage) = {
      val o = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(i, "png", o)
      o.toByteArray
    }
    val h = hashesOf(Seq((1L, bytes(img), "png"), (2L, bytes(shifted), "png")))
    h(1L).dhash shouldBe h(2L).dhash // gradient signs are shift-invariant
    h(1L).ahash shouldBe h(2L).ahash // so is each cell's relation to the mean
  }

  test("pair join finds exactly the planted (png, jpeg) re-encodes across 20 cards") {
    val media = Multimodal.testCardMedia(
      (1L to 20L).toDF("doc_id"), "doc_id")
    val pairs = Multimodal.perceptualImagePairs(media)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    pairs shouldBe (1L to 20L).map(k => (2 * k, 2 * k + 1)).toSet
  }

  test("undecodable payloads become sentinels and never pair") {
    val garbage: Array[Byte] = Array.fill(64)(0x5a.toByte)
    val media = Multimodal.asMedia(
      Seq((1L, Multimodal.encodeTestCard(1L, "png"), "png"),
        (2L, garbage, "png"),
        (3L, null.asInstanceOf[Array[Byte]], "png"))
        .toDF("id", "payload", "fmt"), "id", "payload", "fmt")
    val hs = Multimodal.imageHashes(media).collect().map(h => h.media_id -> h).toMap
    hs(2L).format shouldBe "undecodable"
    hs(2L).width shouldBe -1
    hs(3L).format shouldBe "undecodable"
    Multimodal.perceptualImagePairs(media).count() shouldBe 0L
    an[IllegalArgumentException] should be thrownBy
      Multimodal.perceptualImagePairs(media, maxHamming = 4)
  }

  test("uniform card: both hashes collapse to zero (no gradients, nothing above the mean)") {
    val flat = new java.awt.image.BufferedImage(32, 32,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until 32; x <- 0 until 32) flat.setRGB(x, y, 0x808080)
    val o = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(flat, "png", o)
    val h = hashesOf(Seq((1L, o.toByteArray, "png")))
    h(1L).dhash shouldBe 0L
    h(1L).ahash shouldBe 0L
  }
}
