package graft.operators

import graft.SparkTestBase

/** Cosine top-k and sign-LSH candidate generation on hand-built vectors. */
class SimilaritySearchSpec extends SparkTestBase {
  import spark.implicits._

  // 16-dim vectors (2 sign bands of 8): 0 and 1 nearly parallel, 2 orthogonal,
  // 3 anti-parallel to 0.
  private def vec(f: Int => Float): Array[Float] = Array.tabulate(16)(f)
  private lazy val embs = Seq(
    (0L, vec(i => if (i == 0) 1f else 0.01f)),
    (1L, vec(i => if (i == 0) 0.9f else 0.012f)),
    (2L, vec(i => if (i == 1) 1f else -0.01f)),
    (3L, vec(i => if (i == 0) -1f else -0.01f))
  ).toDF("vec_id", "embedding")

  test("brute knn ranks the near-parallel vector first") {
    val out = SimilaritySearch.bruteKnn(embs, "vec_id = 0", 3)
      .orderBy("rank").select("neighbor_id").as[Long].collect().toSeq
    out.head shouldBe 1L
    out.last shouldBe 3L // anti-parallel ranks last of the 3
  }

  test("near-dup pairs above threshold are only the parallel pair") {
    val pairs = SimilaritySearch.nearDupPairs(embs, 0.9, bands = 2)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    pairs shouldBe Set((0L, 1L))
  }

  test("ivf knn: probed cells contain the near-parallel vector, rerank is exact") {
    // centroids = vectors 0 and 2 (orthogonal-ish cells); query = vector 1
    val out = SimilaritySearch.ivfKnn(embs, "vec_id = 1", 3,
        centroidPred = "vec_id IN (0, 2)", nProbe = 1)
      .select("neighbor_id", "cos_sim", "rank").as[(Long, Double, Int)].collect()
    // v1's nearest centroid is v0's cell; members of that cell: 0 (itself), 3
    val byRank = out.sortBy(_._3).map(_._1).toSeq
    byRank.head shouldBe 0L
    // exact rerank: cos(v1, v0) matches brute force
    val brute = SimilaritySearch.bruteKnn(embs, "vec_id = 1", 3)
      .select("neighbor_id", "cos_sim").as[(Long, Double)].collect().toMap
    out.foreach { case (id, cos, _) => brute(id) shouldBe cos }
  }

  test("bucketed near-dup agrees with exact all-pairs at a near-dup threshold") {
    val lsh = SimilaritySearch.nearDupPairs(embs, 0.9, bands = 2)
      .select("id_a", "id_b", "cos_sim").as[(Long, Long, Double)].collect().toSet
    val exact = SimilaritySearch.nearDupPairsExact(embs, 0.9)
      .select("id_a", "id_b", "cos_sim").as[(Long, Long, Double)].collect().toSet
    lsh shouldBe exact // near-parallel vectors share sign blocks -> full recall here
  }

  test("sign-LSH buckets the parallel pair together and excludes anti-parallel") {
    val out = SimilaritySearch.lshKnn(embs, "vec_id = 0", 3)
      .select("neighbor_id").as[Long].collect().toSet
    out should contain(1L) // same sign pattern -> same bucket
    out should not contain 3L // opposite signs in every band
  }

  test("lsh results agree with brute force on shared candidates") {
    val brute = SimilaritySearch.bruteKnn(embs, "vec_id = 0", 3)
      .select("neighbor_id", "cos_sim").as[(Long, Double)].collect().toMap
    val lsh = SimilaritySearch.lshKnn(embs, "vec_id = 0", 3)
      .select("neighbor_id", "cos_sim").as[(Long, Double)].collect().toMap
    lsh.foreach { case (id, cos) => brute(id) shouldBe cos }
  }
}
