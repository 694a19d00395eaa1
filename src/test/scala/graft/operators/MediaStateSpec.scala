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

  test("incremental pairs: union of per-era reports == one-shot pairs; no double counting") {
    // 3 eras; pairs span eras ((2k, 2k+1) with k's halves landing apart
    // when the era cut falls between them is impossible here — media ids
    // 2k/2k+1 stay together per key, so plant CROSS-era near-dups by
    // splitting each key's PNG and JPEG into different eras
    val spark0 = spark
    import spark0.implicits._
    def half(r: Range, fmt: String) = {
      val rows = r.map { k =>
        (if (fmt == "png") 2L * k else 2L * k + 1,
          Multimodal.encodeTestCard(k.toLong, fmt), if (fmt == "png") "png" else "jpeg")
      }
      Multimodal.asMedia(rows.toDF("id", "payload", "fmt"), "id", "payload", "fmt")
    }
    val eras = Seq(
      half(1 to 8, "png"),                                   // era 0: PNGs of keys 1-8
      half(1 to 4, "jpg").unionByName(half(9 to 10, "png")), // era 1: cross-era mates + new keys
      half(5 to 10, "jpg"))                                  // era 2: the rest of the mates
    var state = Multimodal.imageHashState(eras.head).limit(0)
    val reported = scala.collection.mutable.Set.empty[(Long, Long)]
    eras.foreach { era =>
      val eraState = Multimodal.imageHashState(era)
      val pairs = Multimodal.perceptualPairsIncremental(state, eraState)
        .select("id_a", "id_b").as[(Long, Long)].collect()
      pairs.foreach { p => reported should not contain p; reported += p }
      state = Multimodal.normalizeMediaState(state.unionByName(eraState))
    }
    reported.toSet shouldBe pairsOf(Multimodal.perceptualPairsFromState(state))
    reported.toSet shouldBe (1L to 10L).map(k => (2 * k, 2 * k + 1)).toSet
  }

  test("hash-level fuzz: era-union == one-shot for random hashes and random era splits") {
    // codec-free: the pigeonhole + incremental math over raw (id, hash)
    // frames, including planted near-pairs (<= 3 flipped bits), planted
    // far-pairs (exactly 4 flips — the band bound's edge, must NOT pair),
    // and random-hash noise, split into random eras
    (1 to 3).foreach { trial =>
      val rnd = new scala.util.Random(4200 + trial)
      val base = (0 until 12).map(_ => rnd.nextLong())
      def flip(h: Long, k: Int): Long = {
        // flip k DISTINCT bits
        val bits = rnd.shuffle((0 until 64).toList).take(k)
        bits.foldLeft(h)((x, b) => x ^ (1L << b))
      }
      val rows: Seq[(Long, Long)] =
        base.zipWithIndex.flatMap { case (h, i) =>
          val id = 10L * i
          val near = (id + 1, flip(h, 1 + rnd.nextInt(3)))  // pairs
          val far = (id + 2, flip(h, 4))                    // never pairs w/ h...
          Seq((id, h), near, far)
        }
      // NOTE: far rows may still pair with SOMETHING (far vs near can be
      // within 3 by chance composition) — the property under test is only
      // chained == one-shot, so accidental pairs are fine
      val nEras = 2 + rnd.nextInt(3)
      val eras = rows.groupBy(_ => rnd.nextInt(nEras)).values.toSeq
      val sp = spark
      import sp.implicits._
      var state = Seq.empty[(Long, Long)].toDF("id", "hash")
      val reported = scala.collection.mutable.Set.empty[(Long, Long)]
      eras.foreach { era =>
        val eraDf = era.toDF("id", "hash")
        val pairs = Multimodal.perceptualPairsIncremental(state, eraDf)
          .select("id_a", "id_b").as[(Long, Long)].collect()
        pairs.foreach { p =>
          withClue(s"trial $trial duplicate report:")(reported should not contain p)
          reported += p
        }
        state = Multimodal.normalizeMediaState(state.unionByName(eraDf))
      }
      val oneShot = pairsOf(Multimodal.perceptualPairsFromState(state))
      withClue(s"trial $trial:")(reported.toSet shouldBe oneShot)
      // and the planted near pairs are all in there
      base.indices.foreach { i =>
        withClue(s"trial $trial planted $i:")(
          oneShot should contain ((10L * i, 10L * i + 1)))
      }
    }
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
