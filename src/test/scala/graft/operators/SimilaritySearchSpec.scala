package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.SparkTestBase
import graft.functions.VecDotProduct.{vecDot, vecNorm}
import graft.functions.VectorFunctions.toDoubleVec

/** Cosine top-k and sign-LSH candidate generation on hand-built vectors;
  * trained-quantizer quality on the real embeddings corpus.
  */
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

  test("embeddingClusters: planted members land on their seed centroid; profile is exact") {
    // three orthogonal directions; members are positive scalings of their
    // seed (cosine exactly 1 with it, ~0 with the others)
    def axis(a: Int, scale: Float) = vec(i => if (i == a) scale else 0f)
    val rows = Seq(
      (100L, axis(0, 1f)), (101L, axis(1, 1f)), (102L, axis(2, 1f)), // seeds
      (1L, axis(0, 2f)), (2L, axis(0, 0.5f)),
      (3L, axis(1, 3f)),
      (4L, axis(2, 2f)), (5L, axis(2, 4f)), (6L, axis(2, 0.25f))
    ).toDF("vec_id", "embedding")
    val clusters = SimilaritySearch.embeddingClusters(rows,
      initPred = "vec_id >= 100", iters = 2)
    val byId = clusters.collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2))).toMap
    byId(1L)._1 shouldBe 100L
    byId(2L)._1 shouldBe 100L
    byId(3L)._1 shouldBe 101L
    Seq(4L, 5L, 6L).map(byId(_)._1).toSet shouldBe Set(102L)
    // exact-copy members sit at cosine 1.0 with their (same-direction) centroid
    byId(1L)._2 shouldBe 1.0
    // every vector gets exactly one row
    clusters.count() shouldBe rows.count()
    val prof = SimilaritySearch.clusterProfile(clusters)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    prof(100L)._1 shouldBe 3L // seed + 2 members
    prof(101L)._1 shouldBe 2L
    prof(102L)._1 shouldBe 4L
    prof(100L)._2 shouldBe 1000000L // all exact copies: mean ppm = 1e6
    // deterministic under repartition (the ordered-fold training + integer profile)
    val prof2 = SimilaritySearch.clusterProfile(
      SimilaritySearch.embeddingClusters(rows.repartition(7),
        initPred = "vec_id >= 100", iters = 2))
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    prof2 shouldBe prof
  }

  test("semDedup calibration: monotone counts, zero rows kept, agrees with semDedup at a point") {
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val grid = (3 to 9).map(_ * 100000L)
    val cal = SimilaritySearch.semDedupCalibration(emb, grid,
        initPred = "vec_id >= 100 AND vec_id < 116", iters = 2)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    cal.keySet shouldBe grid.toSet // every threshold emits a row, even at 0
    // raising the threshold never ADDS pairs or drops
    grid.sliding(2).foreach { case Seq(lo, hi) =>
      cal(lo)._1 should be >= cal(hi)._1
      cal(lo)._2 should be >= cal(hi)._2
    }
    // the table's n_dropped at 0.4 == what semDedup(threshold = 0.4) drops
    val dropped = SimilaritySearch.semDedup(emb, threshold = 0.4,
        initPred = "vec_id >= 100 AND vec_id < 116", iters = 2)
      .filter("NOT kept").count()
    cal(400000L)._2 shouldBe dropped
  }

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

  test("embedding near-dup pairs feed cluster assignment (cross-operator composition)") {
    // assignClusters is pair-source agnostic: the embedding near-dup pairs
    // cluster exactly like the text-based ones
    val pairs = SimilaritySearch.nearDupPairs(embs, 0.9, bands = 2)
      .select("id_a", "id_b")
    val out = Dedup.assignClusters(
      embs.select(org.apache.spark.sql.functions.col("vec_id").as("doc_id")), pairs)
      .orderBy("doc_id").collect()
    // vectors 0,1 are the near-parallel pair; 2 and 3 stay singletons
    out.map(_.getAs[Long]("cluster_id")).toSeq shouldBe Seq(0L, 0L, 2L, 3L)
    out.map(_.getAs[Int]("is_dup")).toSeq shouldBe Seq(0, 1, 0, 0)
  }

  // ---- trained quantizer on the real corpus ---------------------------

  private val RealDir = "/root/testdata/sf0.001"
  private val InitPred = "id >= 100 AND id < 116"

  /** mean cosine of every corpus vector to its assigned centroid — the
    * (spherical) k-means objective Lloyd iterations optimize.
    */
  private def quantizationQuality(e: DataFrame, cent: DataFrame): Double = {
    val w = Window.partitionBy(col("id")).orderBy(col("cscore").desc, col("cid").asc)
    e.crossJoin(broadcast(cent))
      .withColumn("cscore", vecDot(col("v"), col("cv")) / (col("nrm") * col("cnrm")))
      .withColumn("__r", row_number().over(w)).filter(col("__r") === 1)
      .agg(avg(col("cscore"))).head().getDouble(0)
  }

  test("k-means training improves the quantization objective monotonically") {
    val e = spark.read.parquet(s"$RealDir/embeddings.parquet")
      .select(col("vec_id").as("id"), col("embedding").as("v"))
      .withColumn("nrm", vecNorm(col("v")))
    val init = e.filter(InitPred)
    val untrained = init.select(
      col("id").as("cid"), toDoubleVec(col("v")).as("cv"), col("nrm").as("cnrm"))
    val q0 = quantizationQuality(e, untrained)
    val qs = (1 to 3).map(it => quantizationQuality(e, SimilaritySearch.trainedCentroids(e, init, it)))
    withClue(s"objective path untrained=$q0 trained=$qs:") {
      qs.head should be > q0                       // one round already beats raw slice
      qs.sliding(2).foreach { case Seq(a, b) => b should be >= a }  // Lloyd monotone
    }
  }

  test("trained IVF recall@k reported vs brute force; output well-formed") {
    val emb = spark.read.parquet(s"$RealDir/embeddings.parquet")
    def resultPairs(df: DataFrame): Set[(Long, Long)] =
      df.select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    val brute = resultPairs(SimilaritySearch.bruteKnn(emb, "vec_id < 10", 3))
    val slicePred = "vec_id >= 100 AND vec_id < 116"
    val trained = SimilaritySearch.ivfKnnTrained(emb, "vec_id < 10", 3, slicePred, iters = 2)
    val sliced = SimilaritySearch.ivfKnn(emb, "vec_id < 10", 3, slicePred)
    def recall(s: Set[(Long, Long)]) = (s & brute).size.toDouble / brute.size
    val (rTrained, rSlice) = (recall(resultPairs(trained)), recall(resultPairs(sliced)))
    // Report, don't over-assert: at a FIXED nProbe the untrained slice's
    // imbalanced cells scan more candidates per probe, so its recall can
    // edge out the trained quantizer's on this corpus — the trained win is
    // the objective above (tighter cells = fewer scanned candidates for
    // the same probes, the cost that matters at scale), not raw recall at
    // equal probe count.
    info(f"recall@3 vs brute: trained=$rTrained%.3f untrained-slice=$rSlice%.3f")
    rTrained should be > 0.0
    // well-formed: <= k rows per query, ranks contiguous from 1
    val byQuery = trained.select("query_id", "rank").as[(Long, Int)].collect()
      .groupBy(_._1).values
    byQuery.foreach { rows =>
      rows.length should be <= 3
      rows.map(_._2).sorted.toSeq shouldBe (1 to rows.length)
    }
  }

  test("planted clustered corpus: LSH and trained-IVF recall@10 vs brute force >= 0.9") {
    // 10 well-separated clusters x 30 members, 16 dims. Each cluster's
    // centroid has every |component| in [0.5, 1.0] (bounded away from
    // zero) and members add +-0.1 noise, so (a) within-cluster cosine is
    // ~0.99 and cross-cluster cosine is far below it — ground-truth
    // top-10 is provably within-cluster — and (b) no member's SIGN
    // pattern ever flips, pinning every member of a cluster into the
    // same LSH sign buckets. Seeded Random: the corpus is a fixed
    // constant, not a flaky sample.
    val rnd = new scala.util.Random(42)
    val centroids = Array.fill(10)(Array.fill(16)(
      ((0.5 + 0.5 * rnd.nextDouble()) * (if (rnd.nextBoolean()) 1 else -1)).toFloat))
    val rows = for (j <- 0 until 10; m <- 0 until 30) yield {
      val v = centroids(j).map(c => c + (rnd.nextDouble() * 0.2 - 0.1).toFloat)
      ((j * 100 + m).toLong, v)
    }
    val emb = rows.toDF("vec_id", "embedding")
    def pairs(df: DataFrame): Set[(Long, Long)] =
      df.select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    // queries: member 1 of every cluster (10 queries); truth from brute
    val truth = pairs(SimilaritySearch.bruteKnn(emb, "vec_id % 100 = 1", 10))
    truth.size shouldBe 100
    // ground truth really is within-cluster — the corpus does its job
    truth.foreach { case (q, n) => n / 100 shouldBe q / 100 }
    def recall(s: Set[(Long, Long)]): Double = (s & truth).size.toDouble / truth.size
    val rLsh = recall(pairs(SimilaritySearch.lshKnn(emb, "vec_id % 100 = 1", 10)))
    val rIvf = recall(pairs(SimilaritySearch.ivfKnnTrained(
      emb, "vec_id % 100 = 1", 10, initPred = "vec_id % 100 = 0", iters = 2)))
    info(f"planted recall@10: lsh=$rLsh%.3f trained-ivf=$rIvf%.3f")
    rLsh should be >= 0.9
    rIvf should be >= 0.9
  }

  test("PQ-ADC: planted clusters — every approximate neighbor is within-cluster; deterministic; well-formed") {
    // same planted geometry as the recall test: sign-stable clusters mean
    // each member's nearest codeword per subspace is its own cluster's
    // representative, so ADC distance separates clusters cleanly even
    // though within-cluster ranking collapses to code resolution (ties
    // break by id — the documented PQ tradeoff)
    val rnd = new scala.util.Random(7)
    val centroids = Array.fill(10)(Array.fill(16)(
      ((0.5 + 0.5 * rnd.nextDouble()) * (if (rnd.nextBoolean()) 1 else -1)).toFloat))
    val rows = for (j <- 0 until 10; m <- 0 until 30) yield {
      val v = centroids(j).map(c => c + (rnd.nextDouble() * 0.2 - 0.1).toFloat)
      ((j * 100 + m).toLong, v)
    }
    val emb = rows.toDF("vec_id", "embedding")
    val pq = SimilaritySearch.pqKnn(emb, "vec_id % 100 = 1", 10,
      codebookPred = "vec_id % 100 = 0", m = 4, dim = 16)
    val got = pq.select("query_id", "neighbor_id", "rank").as[(Long, Long, Int)].collect()
    got.length shouldBe 100 // 10 queries x k=10
    // cluster-level recall is exact: approximate neighbors never cross clusters
    got.foreach { case (q, n, _) => n / 100 shouldBe q / 100 }
    // well-formed: ranks contiguous from 1 per query
    got.groupBy(_._1).values.foreach { rs =>
      rs.map(_._3).sorted.toSeq shouldBe (1 to rs.length)
    }
    // deterministic: integer ADC sums + id tie-breaks replay exactly
    val again = SimilaritySearch.pqKnn(emb.repartition(13), "vec_id % 100 = 1", 10,
      codebookPred = "vec_id % 100 = 0", m = 4, dim = 16)
      .select("query_id", "neighbor_id", "rank").as[(Long, Long, Int)].collect()
    again.toSet shouldBe got.toSet
  }

  test("IVF-PQ: planted clusters — probes route to the home cell, neighbors stay in-cluster, replayable") {
    val rnd = new scala.util.Random(7)
    val centroids = Array.fill(10)(Array.fill(16)(
      ((0.5 + 0.5 * rnd.nextDouble()) * (if (rnd.nextBoolean()) 1 else -1)).toFloat))
    val rows = for (j <- 0 until 10; m <- 0 until 30) yield {
      val v = centroids(j).map(c => c + (rnd.nextDouble() * 0.2 - 0.1).toFloat)
      ((j * 100 + m).toLong, v)
    }
    val emb = rows.toDF("vec_id", "embedding")
    // coarse cells from the %100=0 members, residual codebook from %100=2
    def run(e: DataFrame) = SimilaritySearch.ivfPqKnn(e, "vec_id % 100 = 1", 10,
      centroidPred = "vec_id % 100 = 0", codebookPred = "vec_id % 100 = 2",
      nProbe = 1, m = 4, dim = 16)
    val got = run(emb).select("query_id", "neighbor_id", "rank")
      .as[(Long, Long, Int)].collect()
    got.length shouldBe 100 // 10 queries x k=10 (single probed cell has 29 others)
    // nProbe=1 on sign-stable clusters: the probed cell IS the home
    // cluster, so no neighbor ever crosses clusters and self is excluded
    got.foreach { case (q, n, _) => n / 100 shouldBe q / 100 }
    got.map(t => (t._1, t._2)).foreach { case (q, n) => n should not be q }
    got.groupBy(_._1).values.foreach { rs =>
      rs.map(_._3).sorted.toSeq shouldBe (1 to rs.length)
    }
    // deterministic: integer ADC sums + id tie-breaks replay under reshuffle
    run(emb.repartition(13)).select("query_id", "neighbor_id", "rank")
      .as[(Long, Long, Int)].collect().toSet shouldBe got.toSet
  }

  test("IVF-PQ: widening nProbe to all cells only adds candidates — the probed subset is stable") {
    val out1 = SimilaritySearch.ivfPqKnn(realEmb, "vec_id < 5", 3,
      centroidPred = "vec_id >= 100 AND vec_id < 108",
      codebookPred = "vec_id >= 108 AND vec_id < 124", nProbe = 1)
      .select("query_id", "neighbor_id", "adist_fp").as[(Long, Long, Long)].collect()
    val all = SimilaritySearch.ivfPqKnn(realEmb, "vec_id < 5", 50,
      centroidPred = "vec_id >= 100 AND vec_id < 108",
      codebookPred = "vec_id >= 108 AND vec_id < 124", nProbe = 8)
      .select("query_id", "neighbor_id", "adist_fp").as[(Long, Long, Long)].collect()
      .map(t => (t._1, t._2) -> t._3).toMap
    // every nProbe=1 hit keeps its EXACT integer ADC distance at full
    // probe width: per-cell tables mean a candidate's score depends only
    // on its own cell, never on which other cells were probed
    out1.foreach { case (q, n, d) =>
      withClue(s"query $q neighbor $n:") { all.get((q, n)).foreach(_ shouldBe d) }
    }
  }

  test("crossNearDup: a planted paraphrase (same-direction copy) of a benchmark vector is flagged") {
    // benchmark = vec_id < 100; corpus = the rest plus a scaled copy of
    // benchmark vector 7 — cosine 1.0 with its source, the semantic leak
    val bench = realEmb.filter(col("vec_id") < 100)
    val planted = bench.filter(col("vec_id") === 7)
      .select(lit(8888L).as("vec_id"),
        transform(col("embedding"), x => x * lit(0.7f)).as("embedding"),
        col("label"))
    val corpus = realEmb.filter(col("vec_id") >= 100).unionByName(planted)
    val flagged = SimilaritySearch.crossNearDup(corpus, bench, threshold = 0.9)
      .select("vec_id", "ref_id", "cos_sim").as[(Long, Long, Double)].collect()
    flagged.map(t => (t._1, t._2)) should contain((8888L, 7L))
    flagged.find(t => t._1 == 8888L && t._2 == 7L).get._3 shouldBe 1.0 +- 1e-6
    // at a near-dup threshold on this near-random corpus, the planted
    // pair is the ONLY flag — no false positives from the band join
    flagged.map(t => (t._1, t._2)).toSet shouldBe Set((8888L -> 7L))
  }

  test("per-subspace PQ training reduces total quantization error vs the raw-slice codebook") {
    val subs = SimilaritySearch.pqSubbed(realEmb, 4, 64, "vec_id", "embedding").persist()
    val raw = SimilaritySearch.pqCodebook(
      realEmb.filter(col("vec_id") >= 100 && col("vec_id") < 116), 4, 64, "vec_id", "embedding")
    val trained = SimilaritySearch.trainedSubCentroids(subs, raw, iters = 2)
    def totalErr(cb: DataFrame): Double = subs
      .join(org.apache.spark.sql.functions.broadcast(cb), Seq("sub"))
      .withColumn("d2", col("svv") + col("cvv")
        - lit(2.0) * graft.functions.VecDotProduct.vecDot(col("sv"), col("cv")))
      .groupBy(col("id"), col("sub"))
      .agg(org.apache.spark.sql.functions.min(col("d2")).as("best"))
      .agg(org.apache.spark.sql.functions.sum(col("best"))).head().getDouble(0)
    val (e0, e1) = (totalErr(raw), totalErr(trained))
    info(f"PQ quantization error: raw=$e0%.3f trained=$e1%.3f")
    e1 should be < e0 // Lloyd rounds can only improve the objective
    subs.unpersist()
  }

  test("PQ rerank: on the planted corpus the two-stage result EQUALS brute force") {
    // same geometry as the PQ cluster test: the ADC shortlist (32 > 29
    // cluster members) catches the whole cluster, and the exact rerank
    // then recovers the true cosine order — approximate retrieve, exact
    // rank, equal to brute force end to end
    val rnd = new scala.util.Random(7)
    val centroids = Array.fill(10)(Array.fill(16)(
      ((0.5 + 0.5 * rnd.nextDouble()) * (if (rnd.nextBoolean()) 1 else -1)).toFloat))
    val rows = for (j <- 0 until 10; m <- 0 until 30) yield {
      val v = centroids(j).map(c => c + (rnd.nextDouble() * 0.2 - 0.1).toFloat)
      ((j * 100 + m).toLong, v)
    }
    val emb = rows.toDF("vec_id", "embedding")
    def ranked(df: DataFrame): Set[(Long, Long, Int)] =
      df.select("query_id", "neighbor_id", "rank").as[(Long, Long, Int)].collect().toSet
    val brute = ranked(SimilaritySearch.bruteKnn(emb, "vec_id % 100 = 1", 10))
    val rr = ranked(SimilaritySearch.pqKnnReranked(emb, "vec_id % 100 = 1", 10,
      codebookPred = "vec_id % 100 = 0", shortlist = 32, m = 4, dim = 16))
    rr shouldBe brute
  }

  test("IVF-PQ rerank: on the planted corpus the two-stage composite EQUALS brute force") {
    // the full production shape: coarse route -> residual-PQ ADC
    // shortlist -> exact cosine rerank. Same geometry as the PQ rerank
    // test; the composite must also recover exact top-k (ScaleBench's
    // planted_recall@10_ivfpq row measures this at bench scale)
    val rnd = new scala.util.Random(7)
    val centroids = Array.fill(10)(Array.fill(16)(
      ((0.5 + 0.5 * rnd.nextDouble()) * (if (rnd.nextBoolean()) 1 else -1)).toFloat))
    val rows = for (j <- 0 until 10; m <- 0 until 30) yield {
      val v = centroids(j).map(c => c + (rnd.nextDouble() * 0.2 - 0.1).toFloat)
      ((j * 100 + m).toLong, v)
    }
    val emb = rows.toDF("vec_id", "embedding")
    def ranked(df: DataFrame): Set[(Long, Long, Int)] =
      df.select("query_id", "neighbor_id", "rank").as[(Long, Long, Int)].collect().toSet
    val brute = ranked(SimilaritySearch.bruteKnn(emb, "vec_id % 100 = 1", 10))
    val rr = ranked(SimilaritySearch.ivfPqKnnReranked(emb, "vec_id % 100 = 1", 10,
      centroidPred = "vec_id % 100 = 0", codebookPred = "vec_id % 100 = 0",
      shortlist = 32, nProbe = 2, m = 4, dim = 16))
    rr shouldBe brute
    // guard: shortlist below k rejects loudly
    intercept[IllegalArgumentException] {
      SimilaritySearch.ivfPqKnnReranked(emb, "vec_id % 100 = 1", 10,
        centroidPred = "vec_id % 100 = 0", codebookPred = "vec_id % 100 = 0",
        shortlist = 5, m = 4, dim = 16)
    }
  }

  test("PQ rerank on the real corpus: recall improves over raw ADC") {
    def pairs(df: DataFrame): Set[(Long, Long)] =
      df.select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    val brute = pairs(SimilaritySearch.bruteKnn(realEmb, "vec_id < 10", 3))
    def recall(s: Set[(Long, Long)]) = (s & brute).size.toDouble / brute.size
    val raw = recall(pairs(SimilaritySearch.pqKnn(realEmb, "vec_id < 10", 3,
      codebookPred = "vec_id >= 100 AND vec_id < 116")))
    val rr = recall(pairs(SimilaritySearch.pqKnnReranked(realEmb, "vec_id < 10", 3,
      codebookPred = "vec_id >= 100 AND vec_id < 116", shortlist = 50)))
    info(f"recall@3: raw ADC=$raw%.3f reranked(50)=$rr%.3f")
    // exact rerank can only improve whatever the shortlist caught
    rr should be >= raw
  }

  test("PQ-ADC on the real corpus: a planted same-direction copy is retrieved; recall reported") {
    def pairs(df: DataFrame): Set[(Long, Long)] =
      df.select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    // Report recall against cosine truth, don't assert a floor: this
    // corpus is near-random (within-label mean cosine ~0.002 — no cluster
    // structure), so a 16-codeword untrained codebook cannot recover the
    // weak cosine top-3; the planted-cluster spec above pins the recall
    // claim on geometry that HAS structure.
    val brute = pairs(SimilaritySearch.bruteKnn(realEmb, "vec_id < 10", 3))
    val pq = pairs(SimilaritySearch.pqKnn(realEmb, "vec_id < 10", 3,
      codebookPred = "vec_id >= 100 AND vec_id < 116"))
    info(f"PQ recall@3 vs brute on near-random corpus: ${(pq & brute).size.toDouble / brute.size}%.3f")
    // what PQ must always get right: a same-direction copy normalizes to
    // the identical unit vector, takes the identical codes, and ties the
    // query's own self-distance — nothing can rank closer
    val planted = realEmb.filter(col("vec_id") === 5)
      .select(lit(9999L).as("vec_id"),
        transform(col("embedding"), x => x * lit(0.9f)).as("embedding"),
        col("label"))
    val top = SimilaritySearch.pqKnn(realEmb.unionByName(planted), "vec_id = 5", 3,
      codebookPred = "vec_id >= 100 AND vec_id < 116")
      .filter(col("rank") === 1).select("neighbor_id").as[Long].head()
    top shouldBe 9999L
  }

  private lazy val realEmb = spark.read
    .parquet("/root/testdata/sf0.01/embeddings.parquet")

  test("incremental PQ: appended shard is searchable; codes grow by the shard; matches one-shot") {
    val idx0 = SimilaritySearch.buildPqIndex(
      realEmb.filter(col("vec_id") <= 300), "vec_id >= 100 AND vec_id < 116")
    // plant a same-direction copy of query 5 in the NEW shard: identical
    // unit vector -> identical codes -> the minimal ADC distance
    val planted = realEmb.filter(col("vec_id") === 5)
      .select(lit(9999L).as("vec_id"),
        transform(col("embedding"), x => x * lit(0.9f)).as("embedding"),
        col("label"))
    val shard = realEmb.filter(col("vec_id") > 300).unionByName(planted)
    val idx1 = SimilaritySearch.addToPqIndex(idx0, shard)
    val top = SimilaritySearch.queryPqIndex(idx1, realEmb.filter(col("vec_id") === 5), 3)
      .filter(col("rank") === 1).select("neighbor_id").as[Long].head()
    top shouldBe 9999L // searchable immediately; stored codes untouched
    // state is appendable: m code rows per added vector, nothing re-encoded
    idx1.codes.count() - idx0.codes.count() shouldBe shard.count() * 4
    // and build-then-add == encode-all-at-once (frozen codebook, row-local)
    val oneShot = SimilaritySearch.buildPqIndex(
      realEmb.unionByName(planted), "vec_id >= 100 AND vec_id < 116")
    idx1.codes.as[(Long, Int, Long)].collect().toSet shouldBe
      oneShot.codes.as[(Long, Int, Long)].collect().toSet
  }

  test("incremental IVF-PQ: appended shard searchable; codes grow by the shard; matches one-shot") {
    val idx0 = SimilaritySearch.buildIvfPqIndex(
      realEmb.filter(col("vec_id") <= 300),
      centroidPred = "vec_id >= 100 AND vec_id < 108",
      codebookPred = "vec_id >= 108 AND vec_id < 124")
    // same-direction copy of query 5 in the NEW shard: identical unit
    // vector -> identical cell + residual codes -> minimal ADC distance
    val planted = realEmb.filter(col("vec_id") === 5)
      .select(lit(9999L).as("vec_id"),
        transform(col("embedding"), x => x * lit(0.9f)).as("embedding"),
        col("label"))
    val shard = realEmb.filter(col("vec_id") > 300).unionByName(planted)
    val idx1 = SimilaritySearch.addToIvfPqIndex(idx0, shard)
    val top = SimilaritySearch.queryIvfPqIndex(idx1,
        realEmb.filter(col("vec_id") === 5), 3, nProbe = 2)
      .filter(col("rank") === 1).select("neighbor_id").as[Long].head()
    top shouldBe 9999L
    // appendable: m code rows per added vector, stored codes untouched
    idx1.codes.count() - idx0.codes.count() shouldBe shard.count() * 4
    // frozen quantizers: build-then-add == one-shot build over the union
    val oneShot = SimilaritySearch.buildIvfPqIndex(realEmb.unionByName(planted),
      centroidPred = "vec_id >= 100 AND vec_id < 108",
      codebookPred = "vec_id >= 108 AND vec_id < 124")
    idx1.codes.as[(Long, Long, Int, Long)].collect().toSet shouldBe
      oneShot.codes.as[(Long, Long, Int, Long)].collect().toSet
  }

  test("incremental IVF: an added near-copy becomes the top neighbor without retraining") {
    val idx0 = SimilaritySearch.buildIvfIndex(
      realEmb.filter(col("vec_id") <= 300), "vec_id >= 100 AND vec_id < 116")
    // plant a near-copy of query vector 5 in the NEW shard (id 9999):
    // same direction, scaled — cosine 1.0 with the query
    val planted = realEmb.filter(col("vec_id") === 5)
      .select(lit(9999L).as("vec_id"),
        transform(col("embedding"), x => x * lit(0.9f)).as("embedding"),
        col("label"))
    val idx1 = SimilaritySearch.addToIndex(idx0,
      realEmb.filter(col("vec_id") > 300).unionByName(planted))
    val top = SimilaritySearch.queryIndex(idx1, realEmb.filter(col("vec_id") === 5), 3)
      .filter(col("rank") === 1).select("neighbor_id").as[Long].head()
    top shouldBe 9999L // searchable immediately; centroids untouched
    // and the index state is appendable: assignments grew by exactly the shard
    idx1.assignments.count() - idx0.assignments.count() shouldBe
      realEmb.filter(col("vec_id") > 300).count() + 1
  }

  test("incremental IVF query is deterministic and matches one-shot frozen-centroid assignment") {
    def results(idx: SimilaritySearch.IvfIndex) =
      SimilaritySearch.queryIndex(idx, realEmb.filter(col("vec_id") < 10), 3)
        .as[(Long, Long, Double, Int)].collect().toSet
    val incremental = SimilaritySearch.addToIndex(
      SimilaritySearch.buildIvfIndex(realEmb.filter(col("vec_id") <= 300),
        "vec_id >= 100 AND vec_id < 116"),
      realEmb.filter(col("vec_id") > 300))
    // one-shot: same frozen centroids (trained on <= 300), everything
    // assigned at build time — must be indistinguishable
    val trainSlice = SimilaritySearch.buildIvfIndex(
      realEmb.filter(col("vec_id") <= 300), "vec_id >= 100 AND vec_id < 116")
    val oneShot = SimilaritySearch.addToIndex(
      SimilaritySearch.IvfIndex(trainSlice.centroids,
        trainSlice.assignments.limit(0)),
      realEmb)
    results(incremental) shouldBe results(oneShot)
  }

  test("semDedup: a planted near-duplicate pair loses exactly its closer-to-centroid side") {
    // two tight clusters; ids 0/1 are near-identical within cluster A
    val corpus = Seq(
      (0L, vec(i => if (i == 0) 1f else 0.01f)),
      (1L, vec(i => if (i == 0) 0.97f else 0.011f)),
      (2L, vec(i => if (i == 0) 0.8f else 0.2f)), // same cell, NOT a dup at 0.99
      (3L, vec(i => if (i == 1) 1f else -0.01f)),
      (4L, vec(i => if (i == 1) 0.9f else 0.1f)) // same cell as 3, cos ~0.90: NOT a dup
    ).toDF("vec_id", "embedding")
    val out = SimilaritySearch.semDedup(corpus, threshold = 0.999,
      initPred = "vec_id IN (0, 3)", iters = 2)
      .select("vec_id", "cent_sim", "kept")
      .as[(Long, Double, Boolean)].collect().map(r => r._1 -> ((r._2, r._3))).toMap
    out.keySet shouldBe Set(0L, 1L, 2L, 3L, 4L) // every vector gets a verdict
    // exactly one of the planted pair dropped; the survivor is the one
    // LESS similar to its centroid (SemDeDup keep-priority)
    Seq(out(0L)._2, out(1L)._2).count(_ == false) shouldBe 1
    val (kept, dropped) = if (out(0L)._2) (out(0L), out(1L)) else (out(1L), out(0L))
    kept._1 should be <= dropped._1
    // non-duplicates untouched, whichever cell they landed in
    out(2L)._2 shouldBe true
    out(3L)._2 shouldBe true
    out(4L)._2 shouldBe true
  }

  test("incremental semDedup: two shard increments equal one big increment; stored verdicts final") {
    val slice = (id: Long, hi: Long) => realEmb.filter(col("vec_id") > id && col("vec_id") <= hi)
    val (v0, st0) = SimilaritySearch.buildSemDedupState(
      realEmb.filter(col("vec_id") <= 200), threshold = 0.4,
      initPred = "vec_id >= 100 AND vec_id < 116", iters = 2)
    // path A: one increment with everything above 200
    val (vA, _) = SimilaritySearch.semDedupIncrement(st0,
      realEmb.filter(col("vec_id") > 200), 0.4)
    // path B: two increments, 200-350 then the rest
    val (vB1, st1) = SimilaritySearch.semDedupIncrement(st0, slice(200, 350), 0.4)
    val (vB2, _) = SimilaritySearch.semDedupIncrement(st1,
      realEmb.filter(col("vec_id") > 350), 0.4)
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.as[(Long, Long, Double, Boolean)].collect().toSet
    rows(vB1.unionByName(vB2)) shouldBe rows(vA)
    // stored verdicts are untouched by any increment (first-write-wins)
    val all = rows(v0) ++ rows(vA)
    all.map(_._1) shouldBe realEmb.select("vec_id").as[Long].collect().toSet
    // a shard vector with a stored same-cell near-dup is dropped; every
    // drop in the shard has SOME lower-id within-threshold witness
    val droppedShard = vA.filter(!col("kept"))
    droppedShard.count() should be > 0L
  }

  test("semDedup on the real corpus: verdict-per-vector, deterministic, drops mirror in-cell dup pairs") {
    def run() = SimilaritySearch.semDedup(realEmb, threshold = 0.4,
      initPred = "vec_id >= 100 AND vec_id < 116", iters = 2)
    val out = run().persist()
    out.count() shouldBe realEmb.count() // total function of the corpus
    val dropped = out.filter(!col("kept")).count()
    dropped should be > 0L // the 0.4 threshold does bite on this corpus
    // a dropped vector must actually have an in-cell duplicate: join the
    // verdicts back onto exact pairs restricted to same-cell members
    val cells = out.select(col("vec_id"), col("cid"))
    val inCellPairs = SimilaritySearch.nearDupPairsExact(realEmb, 0.4)
      .join(cells.withColumnRenamed("vec_id", "id_a").withColumnRenamed("cid", "ca"), "id_a")
      .join(cells.withColumnRenamed("vec_id", "id_b").withColumnRenamed("cid", "cb"), "id_b")
      .filter(col("ca") === col("cb"))
    val withDup = inCellPairs.select(col("id_a").as("vec_id"))
      .union(inCellPairs.select(col("id_b").as("vec_id"))).distinct()
    out.filter(!col("kept")).join(withDup, "vec_id").count() shouldBe dropped
    // replay is bit-stable (ordered folds end to end)
    run().as[(Long, Long, Double, Boolean)].collect().toSet shouldBe
      out.as[(Long, Long, Double, Boolean)].collect().toSet
    out.unpersist()
  }
}
