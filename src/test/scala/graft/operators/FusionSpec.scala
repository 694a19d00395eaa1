package graft.operators

import graft.SparkTestBase

/** Reciprocal-rank fusion: hand-computed integer contributions, the
  * consensus property (two mid-list appearances beat one top spot), the
  * per-signal m cut, and partition-order determinism.
  */
class FusionSpec extends SparkTestBase {
  import spark.implicits._

  // S1: 10 > 20 > 30; S2: 20 > 30 > 40
  private val s1 = Seq((10L, 100L), (20L, 90L), (30L, 80L)).toDF("doc_id", "score_fp")
  private val s2 = Seq((20L, 50L), (30L, 40L), (40L, 30L)).toDF("doc_id", "score_fp")

  // 1e9 div (60 + r)
  private val c1 = 1000000000L / 61
  private val c2 = 1000000000L / 62
  private val c3 = 1000000000L / 63

  test("hand-computed fuse: contributions, counts, best ranks, final order") {
    val out = Fusion.reciprocalRankFusion(Seq(s1, s2))
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getInt(3), r.getInt(4))).toMap
    out(10L) shouldBe ((c1, 1L, 1, 3))
    out(20L) shouldBe ((c2 + c1, 2L, 1, 1)) // consensus: on both lists -> fused winner
    out(30L) shouldBe ((c3 + c2, 2L, 2, 2))
    out(40L) shouldBe ((c3, 1L, 3, 4))
  }

  test("per-signal m cut: documents below the list depth contribute nothing") {
    val out = Fusion.reciprocalRankFusion(Seq(s1, s2), m = 2)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    out.keySet shouldBe Set(10L, 20L, 30L) // 40 fell off S2's top-2
    out(30L) shouldBe c2                   // only S2's rank-2 remains
  }

  test("duplicate ids within one signal contribute once, at their best rank") {
    // doc 10 appears twice in the dup signal's top-m — without the in-cut
    // dedup it would contribute twice to rrf_fp and push n_signals to 3
    // with only two signals (r14 advice)
    val dup = Seq((10L, 100L), (10L, 90L), (20L, 80L)).toDF("doc_id", "score_fp")
    val out = Fusion.reciprocalRankFusion(Seq(dup, s2))
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getInt(3))).toMap
    out(10L) shouldBe ((c1, 1L, 1))      // once, at its best (first) rank
    out(20L) shouldBe ((c2 + c1, 2L, 1)) // ranks re-number the deduped list
    all(out.values.map(_._2)) should be <= 2L
  }

  test("strictDistinct dedups BEFORE the cut: in-cut duplicates no longer shrink the list") {
    // doc 10 appears twice inside a top-2 cut: the default (in-cut dedup)
    // yields only ONE distinct doc from this signal at m=2, while
    // strictDistinct dedups first and fills the cut with 10 and 20 — the
    // conventional ranked-list-of-distinct-documents reading (r15 advice)
    val dup = Seq((10L, 100L), (10L, 90L), (20L, 80L)).toDF("doc_id", "score_fp")
    val loose = Fusion.reciprocalRankFusion(Seq(dup), m = 2)
      .collect().map(r => r.getLong(0) -> r.getInt(3)).toMap
    loose.keySet shouldBe Set(10L) // 10's duplicate crowded 20 out of the cut
    val strict = Fusion.reciprocalRankFusion(Seq(dup), m = 2, strictDistinct = true)
      .collect().map(r => r.getLong(0) -> r.getInt(3)).toMap
    strict shouldBe Map(10L -> 1, 20L -> 2)
    // duplicate-free signals are bit-identical under both placements
    def rows(strictDistinct: Boolean) =
      Fusion.reciprocalRankFusion(Seq(s1, s2), strictDistinct = strictDistinct)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
          r.getInt(3), r.getInt(4))).sortBy(_._1)
    rows(strictDistinct = true) shouldBe rows(strictDistinct = false)
  }

  test("deterministic under repartition (integer ranks and sums)") {
    val big1 = (0L until 500L).map(i => (i, (i * 37) % 499)).toDF("doc_id", "score_fp")
    val big2 = (0L until 500L).map(i => (i, (i * 91) % 499)).toDF("doc_id", "score_fp")
    val a = Fusion.reciprocalRankFusion(Seq(big1, big2), m = 50)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(4))).sortBy(_._1)
    val b = Fusion.reciprocalRankFusion(Seq(big1.repartition(17), big2.repartition(5)), m = 50)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(4))).sortBy(_._1)
    a shouldBe b
  }
}
