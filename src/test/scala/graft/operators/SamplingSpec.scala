package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkTestBase

/** Deterministic sampling/splitting invariants: stability, disjointness,
  * duplicate-coherence, and sane proportions on the real corpus.
  */
class SamplingSpec extends SparkTestBase {
  import spark.implicits._

  private lazy val docs = spark.read
    .parquet("/root/testdata/sf0.001/documents.parquet")

  test("split assignment is deterministic, exhaustive, and id-independent") {
    val a = Sampling.assignSplit(docs, "text")
      .select("doc_id", "split").as[(Long, String)].collect().toMap
    val b = Sampling.assignSplit(docs, "text")
      .select("doc_id", "split").as[(Long, String)].collect().toMap
    a shouldBe b                                  // rerun-stable
    a.values.toSet.subsetOf(Set("train", "val", "test")) shouldBe true
    // content-addressed: shuffling ids does not move any document
    val reId = Sampling.assignSplit(
        docs.withColumn("doc_id", col("doc_id") + 100000L), "text")
      .select((col("doc_id") - 100000L).as("doc_id"), col("split"))
      .as[(Long, String)].collect().toMap
    reId shouldBe a
  }

  test("proportions land near the requested cut on the real corpus") {
    val counts = Sampling.assignSplit(docs, "text")
      .groupBy("split").count().as[(String, Long)].collect().toMap
    val n = counts.values.sum.toDouble
    counts("train") / n shouldBe 0.8 +- 0.08      // hash noise at 500 docs
    (counts.getOrElse("val", 0L) + counts.getOrElse("test", 0L)) / n shouldBe 0.2 +- 0.08
  }

  test("byte-identical duplicates land in the same split; sample is a subset") {
    val dup = Seq((1L, "same text here"), (2L, "same text here"), (3L, "other"))
      .toDF("doc_id", "text")
    val splits = Sampling.assignSplit(dup, "text")
      .select("doc_id", "split").as[(Long, String)].collect().toMap
    splits(1L) shouldBe splits(2L)
    val sampled = Sampling.deterministicSample(docs, "text", 30)
      .select("doc_id").as[Long].collect().toSet
    val all = docs.select("doc_id").as[Long].collect().toSet
    sampled.subsetOf(all) shouldBe true
    sampled.size.toDouble / all.size shouldBe 0.3 +- 0.1
  }

  test("rebalance: under-quota categories pass through; hot ones shrink to ~quota") {
    val docs01 = spark.read.parquet("/root/testdata/sf0.01/documents.parquet")
    val before = docs01.groupBy("lang").count().as[(String, Long)].collect().toMap
    val after = Sampling.rebalanceToQuota(docs01, "lang", "text", quota = 100L)
      .groupBy("lang").count().as[(String, Long)].collect().toMap
    before.foreach { case (lang, n) =>
      if (n <= 100L) after(lang) shouldBe n              // untouched
      else {
        // hash thresholding: expected ~quota, tolerate hash noise
        after(lang).toDouble shouldBe 100.0 +- 35.0
        after(lang) should be < n
      }
    }
    // kept rows are a SUBSET (never rewritten, never duplicated)
    val keptIds = Sampling.rebalanceToQuota(docs01, "lang", "text", quota = 100L)
      .select("doc_id").as[Long].collect()
    keptIds.distinct.length shouldBe keptIds.length
    // and the cut is deterministic across reruns
    Sampling.rebalanceToQuota(docs01, "lang", "text", quota = 100L)
      .select("doc_id").as[Long].collect().toSet shouldBe keptIds.toSet
  }

  test("rebalance: a NULL category is capped like any other, never dropped") {
    val rows = (1L to 10L).map(i => (i, s"text number $i",
      if (i <= 6) null else "en")).toDF("doc_id", "text", "lang")
    // NULL lang has 6 rows, en has 4: quota 100 keeps ALL 10 (both under)
    Sampling.rebalanceToQuota(rows, "lang", "text", quota = 100L)
      .count() shouldBe 10L
    // quota 0 empties the NULL category too — it was counted, not dropped
    Sampling.rebalanceToQuota(rows, "lang", "text", quota = 0L).count() shouldBe 0L
  }

  test("rebalance: quota 0 empties every category; guards reject bad args") {
    val dup = Seq((1L, "a text", "en"), (2L, "b text", "fr"))
      .toDF("doc_id", "text", "lang")
    Sampling.rebalanceToQuota(dup, "lang", "text", quota = 0L).count() shouldBe 0L
    an[IllegalArgumentException] should be thrownBy
      Sampling.rebalanceToQuota(dup, "lang", "text", quota = -1L)
    an[IllegalArgumentException] should be thrownBy
      Sampling.rebalanceToQuota(dup, "lang", "text", quota = 1L, buckets = 0)
    an[IllegalArgumentException] should be thrownBy
      Sampling.rebalanceToQuota(dup, "lang", "text", quota = Long.MaxValue, buckets = 2)
  }

  test("guards reject nonsense percentages") {
    an[IllegalArgumentException] should be thrownBy
      Sampling.deterministicSample(docs, "text", 101)
    an[IllegalArgumentException] should be thrownBy
      Sampling.assignSplit(docs, "text", trainPct = 80, valPct = 30)
  }

  test("temperature mix: rates follow sqrt weighting; head flattened, tail kept") {
    val corpus = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val kept = Sampling.temperatureMix(corpus, "lang", "text", targetTotal = 300L)
    val rates = kept.select("lang", "category_n", "mix_rate_ppm").distinct()
      .as[(String, Long, Long)].collect().map { case (l, n, r) => (l, (n, r)) }.toMap
    val counts = corpus.groupBy("lang").count().as[(String, Long)].collect().toMap
    val sumW = counts.keys.toSeq.sorted.map(l => math.sqrt(counts(l).toDouble)).sum
    rates.foreach { case (l, (n, ppm)) =>
      n shouldBe counts(l)
      val expect = math.floor(
        math.min(1.0, 300.0 * math.sqrt(n.toDouble) / (sumW * n.toDouble)) * 1000000.0).toLong
      withClue(s"lang $l: ")(ppm shouldBe expect)
    }
    // sqrt temperature keeps a LARGER fraction of small categories than of
    // the head — the flattening property
    val keptCounts = kept.groupBy("lang").count().as[(String, Long)].collect().toMap
    val enFrac = keptCounts("en").toDouble / counts("en")
    val deFrac = keptCounts("de").toDouble / counts("de")
    deFrac should be > enFrac
  }

  test("temperature mix: deterministic across reruns; guard rejects bad target") {
    val corpus = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    def ids = Sampling.temperatureMix(corpus, "lang", "text", targetTotal = 300L)
      .select("doc_id").as[Long].collect().toSet
    ids shouldBe ids
    an[IllegalArgumentException] should be thrownBy
      Sampling.temperatureMix(corpus, "lang", "text", targetTotal = 0L)
  }

  test("epoch mix: integer weights replicate exactly; epochs number 1..n") {
    val docs = Seq((1L, "a", "t1"), (2L, "a", "t2"), (3L, "b", "t3"))
      .toDF("doc_id", "cat", "text")
    val out = Sampling.epochMix(docs, "cat", "text", Map("a" -> 3.0, "b" -> 1.0))
      .select("doc_id", "epoch", "n_copies")
      .as[(Long, Long, Long)].collect().toSet
    out shouldBe Set(
      (1L, 1L, 3L), (1L, 2L, 3L), (1L, 3L, 3L),
      (2L, 1L, 3L), (2L, 2L, 3L), (2L, 3L, 3L),
      (3L, 1L, 1L))
  }

  test("epoch mix: fractional weights land near w*n, sub-1 weights downsample, all content-addressed") {
    val corpus = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val out = Sampling.epochMix(corpus, "lang", "text",
      Map("en" -> 0.5, "de" -> 2.5), defaultWeight = 1.0)
    val inCounts = corpus.groupBy("lang").count().as[(String, Long)].collect().toMap
    val outCounts = out.groupBy("lang").count().as[(String, Long)].collect().toMap
    // expected = w * n with hash noise on the fractional copy
    outCounts("de").toDouble / inCounts("de") shouldBe 2.5 +- 0.5
    outCounts("en").toDouble / inCounts("en") shouldBe 0.5 +- 0.25
    outCounts("fr") shouldBe inCounts("fr") // default weight 1.0 exactly
    // the sub-1.0 category is a SUBSET (downsampling, never substitution)
    val enKept = out.filter($"lang" === "en").select("doc_id").as[Long].collect().toSet
    val enAll = corpus.filter($"lang" === "en").select("doc_id").as[Long].collect().toSet
    enKept.subsetOf(enAll) shouldBe true
    // rerun-stable
    Sampling.epochMix(corpus, "lang", "text", Map("en" -> 0.5, "de" -> 2.5))
      .count() shouldBe out.count()
    an[IllegalArgumentException] should be thrownBy
      Sampling.epochMix(corpus, "lang", "text", Map("en" -> -1.0))
  }

  test("contingency audit: marginals reconstruct, expected sums to N, independence ratio centers on 1") {
    val df = Seq(
      ("train", "en"), ("train", "en"), ("train", "de"),
      ("val", "en"), ("val", "de"), ("val", "de"))
      .toDF("split", "lang")
    val out = Sampling.contingencyAudit(df, "split", "lang")
      .select("split", "lang", "n_obs", "n_a", "n_b", "n_total", "expected", "obs_over_exp")
      .as[(String, String, Long, Long, Long, Long, Double, Double)].collect()
    out should have size 4
    val m = out.map(r => (r._1, r._2) -> r).toMap
    m(("train", "en"))._3 shouldBe 2L
    m(("train", "en"))._4 shouldBe 3L // n_train
    m(("train", "en"))._5 shouldBe 3L // n_en
    m(("train", "en"))._6 shouldBe 6L
    m(("train", "en"))._7 shouldBe 1.5 // 3*3/6
    m(("train", "en"))._8 shouldBe (2.0 / 1.5 +- 1e-6)
    // expected counts always sum back to N over the full table
    out.map(_._7).sum shouldBe 6.0 +- 1e-6
  }

  test("exact-N sample: exactly n per big category, whole small ones, window-identical") {
    val corpus = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val n = 30
    val out = Sampling.exactNSample(corpus.select("doc_id", "lang", "text"),
      "lang", "text", n)
    val counts = out.groupBy("lang").count().as[(String, Long)].collect().toMap
    val full = corpus.groupBy("lang").count().as[(String, Long)].collect().toMap
    full.foreach { case (lang, c) =>
      counts(lang) shouldBe math.min(c, n.toLong)
    }
    // salt-invariant: identical rows to the single-window formulation
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("lang"))
      .orderBy(graft.functions.TextFunctions.polyHash(col("text")).asc, col("doc_id").asc)
    val viaWindow = corpus.select(col("doc_id"), col("lang"), col("text"))
      .withColumn("rank", org.apache.spark.sql.functions.row_number().over(w))
      .filter(col("rank") <= n)
      .select("doc_id", "lang", "rank").as[(Long, String, Int)].collect().toSet
    out.select("doc_id", "lang", "rank")
      .as[(Long, String, Int)].collect().toSet shouldBe viaWindow
  }

  test("cluster-coherent split: near-dup pairs never straddle; singletons match assignSplit") {
    val corpus = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val pairs = Dedup.minhashLshPairs(corpus).select("id_a", "id_b")
    val clusters = Dedup.assignClusters(corpus, pairs)
    val split = Sampling.clusterCoherentSplit(corpus, clusters)
      .select("doc_id", "split").as[(Long, String)].collect().toMap
    split.size shouldBe corpus.count()
    // the q51 leakage shape is impossible by construction
    val straddling = pairs.as[(Long, Long)].collect()
      .count { case (a, b) => split(a) != split(b) }
    straddling shouldBe 0
    // a cluster member inherits its keeper's split, not its own text's
    val byCluster = clusters.select("doc_id", "cluster_id")
      .as[(Long, Long)].collect().toMap
    byCluster.foreach { case (id, keeper) => split(id) shouldBe split(keeper) }
    // singletons (their own keeper) degrade to exactly assignSplit
    val plain = Sampling.assignSplit(corpus, "text")
      .select("doc_id", "split").as[(Long, String)].collect().toMap
    byCluster.filter { case (id, k) => id == k &&
      byCluster.count(_._2 == k) == 1
    }.keys.foreach(id => split(id) shouldBe plain(id))
  }

  test("weighted sample: E-S priorities match a driver-side libm model; weight dominates") {
    import org.apache.spark.sql.functions.col
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select(col("doc_id"), col("text"), col("n_chars").cast("long").as("w"))
      .filter(col("w") > 0)
    val got = Sampling.weightedPriority(docs, "w")
      .select("doc_id", "priority").as[(Long, Double)].collect().toMap
    // driver reference: ln(u)/w with libm — the pinned series must agree
    // within its truncation everywhere
    val ref = docs.select("doc_id", "text", "w").collect().map { r =>
      val h = graft.functions.PolyHash61Impl.hash(
        r.getString(1).getBytes(java.nio.charset.StandardCharsets.UTF_8))
      val lnU = math.log((h + 1).toDouble) - 61.0 * math.log(2.0)
      r.getLong(0) -> lnU / r.getLong(2)
    }.toMap
    ref.foreach { case (id, want) =>
      withClue(s"doc $id:")(got(id) shouldBe want +- 1e-6)
    }
    // identical text, bigger weight -> strictly higher priority
    val twins = Seq((1L, "same text content here", 10L),
      (2L, "same text content here", 100L)).toDF("doc_id", "text", "w")
    val p = Sampling.weightedPriority(twins, "w")
      .select("doc_id", "priority").as[(Long, Double)].collect().toMap
    p(2L) should be > p(1L)
    // non-positive weights never sample; n caps the output
    val mixed = twins.union(Seq((3L, "zero weight row", 0L)).toDF("doc_id", "text", "w"))
    val sampled = Sampling.weightedSample(mixed, "w", n = 5)
      .select("doc_id").as[Long].collect().toSet
    sampled shouldBe Set(1L, 2L)
    Sampling.weightedSample(mixed, "w", n = 1).count() shouldBe 1L
    // grouped variant: exactly n per category, same priority order
    val perLang = Sampling.weightedSamplePerCategory(
        docs.join(spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
          .select(col("doc_id"), col("lang")), "doc_id"),
        "lang", "w", n = 3)
      .groupBy("lang").count().select("count").as[Long].collect()
    all(perLang) should be <= 3L
  }
  test("epochShuffle: two-phase rank == naive global window; epochs differ; positions dense") {
    import org.apache.spark.sql.expressions.Window
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val n = docs.count()
    def naive(epoch: Int): Map[Long, Long] = docs
      .select(col("doc_id"), graft.functions.PolyHash61
        .polyHash61(concat(lit(s"$epoch:"), col("doc_id").cast("string"))).as("h"))
      .withColumn("p", row_number().over(Window.orderBy(col("h"), col("doc_id"))) - 1)
      .select("doc_id", "p").as[(Long, Long)].collect().toMap
    // bucket-count invariance: any hashBuckets reproduces the global rank
    for (buckets <- Seq(1, 7, 4096)) {
      val twoPhase = Sampling.epochShuffle(docs, epoch = 3, hashBuckets = buckets)
        .as[(Long, Long)].collect().toMap
      twoPhase shouldBe naive(3)
    }
    val e3 = Sampling.epochShuffle(docs, 3).as[(Long, Long)].collect().toMap
    val e4 = Sampling.epochShuffle(docs, 4).as[(Long, Long)].collect().toMap
    e3.values.toSeq.sorted shouldBe (0L until n).toSeq // dense, no collision
    e4.values.toSeq.sorted shouldBe (0L until n).toSeq
    e3 should not be e4                                 // epochs really reshuffle
    Sampling.epochShuffle(docs, 3).as[(Long, Long)].collect().toMap shouldBe e3 // reproducible
  }

  test("mixturePlan: hand-computed integer plan; unknown source reported at weight 0") {
    val docs = Seq(
      (1L, "a b c d", "web"),   // 4 tokens
      (2L, "e f", "web"),       // 2
      (3L, "g h i j k l", "books"), // 6
      (4L, "m n", "other"))     // 2, not in the weight map
      .toDF("doc_id", "text", "source")
    val plan = Sampling.mixturePlan(docs,
        Map("web" -> 500000L, "books" -> 400000L), budgetTokens = 12L)
      .select("source", "n_docs", "n_tokens", "weight_ppm", "target_tokens", "epochs_ppm")
      .as[(String, Long, Long, Long, Long, Long)].collect()
      .map(r => r._1 -> r).toMap
    // web: 6 tokens, target 12*0.5=6, epochs 6/6 = 1.0e6 ppm
    plan("web") shouldBe ("web", 2L, 6L, 500000L, 6L, 1000000L)
    // books: 6 tokens, target 12*0.4 = 4 (floor), epochs 4e6/6 = 666666
    plan("books") shouldBe ("books", 1L, 6L, 400000L, 4L, 666666L)
    // other: excluded from the mix but visible in the audit
    plan("other") shouldBe ("other", 1L, 2L, 0L, 0L, 0L)
  }

  test("applyMixturePlan: whole epochs realize targets exactly, fractional gate recomputes, weight-0 vanishes") {
    val docs = Seq(
      // source a: 4 docs x 2 tokens = 8; weight 500000 of budget 48 ->
      // target 24 -> epochs_ppm 3000000 (exactly 3 epochs)
      (1L, "a", "aa bb"), (2L, "a", "cc dd"), (3L, "a", "ee ff"), (4L, "a", "gg hh"),
      // source b: 3 x 2 = 6; weight 250000 -> target 12 -> exactly 2 epochs
      (5L, "b", "ii jj"), (6L, "b", "kk ll"), (7L, "b", "mm nn"),
      // source c: 5 x 2 = 10; weight 250000 -> target 12 -> 1200000 ppm
      // (1 whole copy + a 200000-ppm fractional gate)
      (8L, "c", "oo pp"), (9L, "c", "qq rr"), (10L, "c", "ss tt"),
      (11L, "c", "uu vv"), (12L, "c", "ww xx"),
      // source d: no weight -> plan weight 0 -> no copies at all
      (13L, "d", "yy zz")
    ).toDF("doc_id", "source", "text")
    val plan = Sampling.mixturePlan(docs,
      Map("a" -> 500000L, "b" -> 250000L, "c" -> 250000L), budgetTokens = 48L)
    val out = Sampling.applyMixturePlan(docs, plan)
    val perSource = out.groupBy("source").agg(count(lit(1)).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    // whole-epoch sources realize the plan's target tokens EXACTLY
    perSource("a") shouldBe 12L // 4 docs x 3 copies x 2 tokens = 24 = target
    perSource("b") shouldBe 6L  // 3 docs x 2 copies x 2 tokens = 12 = target
    perSource.get("d") shouldBe None
    // the fractional source: one whole copy each + the content-hash gate
    // at 200000 ppm, recomputed independently of the operator
    val gated = docs.filter(col("source") === "c")
      .filter(Sampling.contentBucket(col("text"), 1000000) < 200000).count()
    perSource("c") shouldBe (5L + gated)
    // epochs number 1..n_copies per doc (the q76 contract)
    out.filter(col("doc_id") === 1L).select("epoch").as[Long].collect()
      .sorted shouldBe Seq(1L, 2L, 3L)
    // deterministic under repartition
    def rows(d: org.apache.spark.sql.DataFrame) =
      Sampling.applyMixturePlan(d, plan)
        .select("doc_id", "epoch").as[(Long, Long)].collect().sorted.toSeq
    rows(docs) shouldBe rows(docs.repartition(7))
    // an insane repetition factor raises per-row; a non-plan frame is a
    // plan-time error
    val ex = intercept[Exception] {
      Sampling.applyMixturePlan(docs,
        plan.withColumn("epochs_ppm", lit(2000000000L))).collect()
    }
    ex.getMessage should include("epochs_ppm")
    an[IllegalArgumentException] should be thrownBy
      Sampling.applyMixturePlan(docs, docs)
  }
}
