package graft.operators

import graft.SparkTestBase
import graft.functions.PinnedMath

/** NB log-odds: agrees with a transparent driver-side model built from
  * the same pinned-ln mirror (exact integer equality, not a tolerance),
  * separates planted classes, routes OOV through the prior+per-token
  * constant, and keeps token-less docs alive on the prior alone.
  */
class QualityClassifierSpec extends SparkTestBase {
  import spark.implicits._

  private val pos = Seq(
    (101L, "good clean prose with meaning"),
    (102L, "clean writing with good structure")
  ).toDF("doc_id", "text")
  private val neg = Seq(
    (201L, "spam spam buy now click"),
    (202L, "click here buy spam now now")
  ).toDF("doc_id", "text")

  /** Driver-side mirror of the operator's math, off [[PinnedMath.lnFp]]
    * (the same integer series both engines run) — bit-exact, no floats.
    */
  private def referenceLogOdds(posSeed: Seq[String], negSeed: Seq[String],
                               scored: Seq[(Long, String)]): Map[Long, (Long, Long)] = {
    def toks(s: String) = s.toLowerCase.split("[^a-z0-9]+").filter(_.nonEmpty).toSeq
    val tfp = posSeed.flatMap(toks).groupBy(identity).map { case (w, o) => w -> o.size.toLong }
    val tfn = negSeed.flatMap(toks).groupBy(identity).map { case (w, o) => w -> o.size.toLong }
    val vocab = tfp.keySet ++ tfn.keySet
    val perTok = PinnedMath.lnFp(tfn.values.sum + vocab.size) -
      PinnedMath.lnFp(tfp.values.sum + vocab.size)
    val prior = PinnedMath.lnFp(posSeed.size.toLong) -
      PinnedMath.lnFp(negSeed.size.toLong)
    scored.map { case (id, text) =>
      val ts = toks(text)
      val s = ts.map { w =>
        if (vocab.contains(w))
          PinnedMath.lnFp(tfp.getOrElse(w, 0L) + 1) -
            PinnedMath.lnFp(tfn.getOrElse(w, 0L) + 1)
        else 0L
      }.sum
      id -> (ts.size.toLong, prior + ts.size * perTok + s)
    }.toMap
  }

  test("bit-exact agreement with the driver-side pinned-ln model; classes separate") {
    val scored = Seq(
      (1L, "good clean meaning"),          // pure positive words
      (2L, "buy spam click now"),          // pure negative words
      (3L, "good spam"),                   // mixed
      (4L, "zyzzyva qwerty"),              // fully OOV: prior + constants only
      (5L, "")                             // token-less: prior alone
    )
    val out = QualityClassifier.nbLogOdds(
      scored.toDF("doc_id", "text"), pos, neg)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getInt(3))).toMap
    val ref = referenceLogOdds(
      Seq("good clean prose with meaning", "clean writing with good structure"),
      Seq("spam spam buy now click", "click here buy spam now now"),
      scored)
    ref.foreach { case (id, (n, lo)) =>
      withClue(s"doc $id:") {
        out(id)._1 shouldBe n
        out(id)._2 shouldBe lo
        out(id)._3 shouldBe (if (lo > 0) 1 else 0)
      }
    }
    out(1L)._3 shouldBe 1
    out(2L)._3 shouldBe 0
    out(5L)._1 shouldBe 0L // token-less doc survives, scored on the prior
  }

  test("hashed features see phrase signal the unigram bag cannot") {
    // seeds with IDENTICAL unigram counts that differ only in word order:
    // every unigram weight is lnfp(t+1) - lnfp(t+1) = 0 and the doc-count
    // prior is 0, so the word model scores any doc exactly 0 — the
    // bigram-bearing hashed model still separates
    val p = Seq((1L, "alpha beta alpha beta"), (2L, "alpha beta gamma"))
      .toDF("doc_id", "text")
    val n = Seq((3L, "beta alpha beta alpha"), (4L, "beta alpha gamma"))
      .toDF("doc_id", "text")
    val docs = Seq((10L, "alpha beta"), (11L, "beta alpha")).toDF("doc_id", "text")
    val word = QualityClassifier.nbLogOdds(docs, p, n)
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    word(10L) shouldBe word(11L) // unigram bag is blind here
    val hashed = QualityClassifier.nbLogOddsHashed(docs, p, n)
      .collect().map(r => r.getLong(0) -> (r.getLong(2), r.getInt(3))).toMap
    hashed(10L)._1 should be > hashed(11L)._1
    hashed(10L)._2 shouldBe 1
    hashed(11L)._2 shouldBe 0
  }

  test("native char-window kernel == composed HOF on adversarial strings") {
    import org.apache.spark.sql.functions.col
    val cases = Seq(
      (1L, "good clean prose"),             // plain ASCII
      (2L, "  Mixed   CASE\twith,punct!!"), // case fold + delimiter runs
      (3L, "héllo wörld café"), // multi-byte chars split tokens
      (4L, "ab"),                           // shorter than n -> empty
      (5L, ""),                             // token-less -> empty
      (6L, "!!! ??? ..."),                  // delimiters only -> empty
      (7L, "a1b2c3 999 x"),                 // digits are token bytes
      (8L, null.asInstanceOf[String])       // NULL text -> empty
    ).toDF("doc_id", "text")
    for (n <- Seq(2, 3, 5); buckets <- Seq(7, 4096)) {
      val both = cases.select(col("doc_id"),
        QualityClassifier.charNgramBucketsHof(col("text"), n, buckets).as("hof"),
        org.apache.spark.sql.functions.coalesce(
          graft.functions.CharNgramHashBuckets.charNgramHashBuckets(col("text"), n, buckets),
          org.apache.spark.sql.functions.expr("CAST(array() AS array<bigint>)")).as("nat"))
        .collect()
      for (r <- both) {
        val hof = Option(r.getSeq[Long](1)).getOrElse(Seq.empty)
        withClue(s"doc ${r.getLong(0)} n=$n buckets=$buckets: ") {
          r.getSeq[Long](2) shouldBe hof
        }
      }
    }
  }

  test("char-n-grams survive misspellings that OOV the whole-word model") {
    // "cleen" and "prse" share no whole word with any seed, so the word
    // model scores the doc exactly like a fully-OOV doc (prior + n *
    // per-token constant — zero signal); the char model still sees most
    // of the seed words' 3-char windows and classifies it positive
    val docs = Seq(
      (10L, "good cleen prose with meaning"), // misspelled positive
      (11L, "zz qq xx vv ww")                 // fully OOV control
    ).toDF("doc_id", "text")
    val word = QualityClassifier.nbLogOdds(docs, pos, neg)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    // same token count -> identical word-model score: no signal at all
    word(10L)._1 shouldBe 5L
    // misspelled words carry ZERO word evidence beyond the shared terms:
    // doc 10's only in-vocab words are good/prose/with/meaning
    val hashed = QualityClassifier.nbLogOddsCharNgram(docs, pos, neg)
      .collect().map(r => r.getLong(0) -> (r.getLong(2), r.getInt(3))).toMap
    hashed(10L)._2 shouldBe 1 // still recognized as the positive class
    hashed(10L)._1 should be > hashed(11L)._1
  }

  test("seed-corpus separation: hashed accuracy >= unigram accuracy on the real seeds") {
    import org.apache.spark.sql.functions.{col, lit}
    val d = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select("doc_id", "text", "source")
    val posSeed = d.filter(col("source").isin("src0", "src1", "src2"))
    val negSeed = d.filter(col("source").isin("src3", "src4", "src5"))
    val seeds = posSeed.withColumn("label", lit(1))
      .unionByName(negSeed.withColumn("label", lit(0)))
    def correct(scored: org.apache.spark.sql.DataFrame) = scored
      .join(seeds.select(col("doc_id"), col("label")), "doc_id")
      .filter(col("predict_pos") === col("label")).count()
    val total = seeds.count()
    val w = correct(QualityClassifier.nbLogOdds(seeds, posSeed, negSeed))
    val h = correct(QualityClassifier.nbLogOddsHashed(seeds, posSeed, negSeed))
    withClue(s"word $w/$total vs hashed $h/$total:")(h should be >= w)
  }

  test("partition-order invariance: integer sums make the score deterministic") {
    val scored = (1L to 40L).map(i =>
      (i, if (i % 2 == 0) "good clean meaning spam" else "buy click good now"))
    val df1 = scored.toDF("doc_id", "text").repartition(1)
    val df8 = scored.toDF("doc_id", "text").repartition(8)
    val a = QualityClassifier.nbLogOdds(df1, pos, neg)
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    val b = QualityClassifier.nbLogOdds(df8, pos, neg)
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    a shouldBe b
  }

  test("threshold sweep: counts reconcile, monotone in the threshold, ppm exact") {
    // seeds themselves as the labeled eval set (the q120 shape)
    val labeled = Seq(
      (101L, "good clean prose with meaning", 1),
      (102L, "clean writing with good structure", 1),
      (201L, "spam spam buy now click", 0),
      (202L, "click here buy spam now now", 0),
      (203L, "good spam click now buy", 0) // hard negative with a positive word
    ).toDF("doc_id", "text", "label")
    val thr = Seq(-2L, -1L, 0L, 1L, 2L).map(_ * 1000000000L)
    val rows = QualityClassifier.thresholdSweep(labeled, pos, neg, thr)
      .collect().map { r =>
        r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
          Option(r.get(5)).map(_.asInstanceOf[Long]),
          Option(r.get(6)).map(_.asInstanceOf[Long])))
      }.toMap
    rows.keySet shouldBe thr.toSet // one verdict row per candidate threshold
    rows.values.foreach { case (tp, fp, fn, tn, _, _) =>
      tp + fn shouldBe 2L // positives conserved at every threshold
      fp + tn shouldBe 3L
    }
    // raising the threshold can only shrink the predicted-positive set
    thr.sliding(2).foreach { case Seq(lo, hi) =>
      val (tpL, fpL, _, _, _, _) = rows(lo)
      val (tpH, fpH, _, _, _, _) = rows(hi)
      (tpH + fpH) should be <= (tpL + fpL)
      tpH should be <= tpL
    }
    // exact-ppm arithmetic: recompute one row by hand
    rows.foreach { case (_, (tp, fp, _, _, prec, rec)) =>
      prec shouldBe (if (tp + fp > 0) Some(tp * 1000000L / (tp + fp)) else None)
      rec shouldBe Some(tp * 1000000L / 2L)
    }
    // the sweep discriminates: the lowest threshold captures every
    // positive (recall 1), and this toy corpus separates so hard that
    // even -2 nats admits zero negatives — the operating point is
    // readable straight off the table
    val (tpLo, fpLo, _, _, _, _) = rows(thr.head)
    tpLo shouldBe 2L
    fpLo shouldBe 0L
    val (tpHi, fpHi, _, _, _, _) = rows(thr.last)
    (tpHi + fpHi) should be < 5L
  }

  test("stored model round trip: score-from-parquet model == train-and-score, bit for bit") {
    // the train-once/score-many split (and the b147/b149 bench twins'
    // isolation boundary): weights + constants written to parquet and
    // read back must score EXACTLY like the composed one-plan form —
    // both feature spaces
    val docs = Seq(
      (1L, "good clean meaning prose"),
      (2L, "buy spam click now"),
      (3L, "goood cleann prose"), // misspellings: char-grams still fire
      (4L, "")).toDF("doc_id", "text")
    val dir = java.nio.file.Files.createTempDirectory("graft_nbmodel").toString
    try {
      val (hw, hc) = QualityClassifier.nbHashedModel(pos, neg, buckets = 64)
      hw.write.parquet(s"$dir/hw"); hc.write.parquet(s"$dir/hc")
      val fromStored = QualityClassifier.nbScoreHashedFromModel(docs,
          spark.read.parquet(s"$dir/hw"), spark.read.parquet(s"$dir/hc"),
          buckets = 64)
        .orderBy("doc_id").collect().toSeq
      val composed = QualityClassifier.nbLogOddsHashed(docs, pos, neg, buckets = 64)
        .orderBy("doc_id").collect().toSeq
      fromStored shouldBe composed

      val (cw, cc) = QualityClassifier.nbCharNgramModel(pos, neg, n = 3, buckets = 64)
      cw.write.parquet(s"$dir/cw"); cc.write.parquet(s"$dir/cc")
      val cStored = QualityClassifier.nbScoreCharNgramFromModel(docs,
          spark.read.parquet(s"$dir/cw"), spark.read.parquet(s"$dir/cc"),
          n = 3, buckets = 64)
        .orderBy("doc_id").collect().toSeq
      val cComposed = QualityClassifier.nbLogOddsCharNgram(docs, pos, neg,
          n = 3, buckets = 64)
        .orderBy("doc_id").collect().toSeq
      cStored shouldBe cComposed

      // the sweep off stored scores == the composed sweep
      val labeled = Seq((1L, 1), (2L, 0), (3L, 1)).toDF("doc_id", "label")
      val thr = Seq(-1000000000L, 0L, 1000000000L)
      QualityClassifier.nbLogOddsHashed(labeled.join(docs, "doc_id"), pos, neg, buckets = 64)
        .write.parquet(s"$dir/scored")
      val sweepStored = QualityClassifier.thresholdSweepFromScores(
          spark.read.parquet(s"$dir/scored"), labeled, thr)
        .orderBy("thr_fp").collect().toSeq
      val sweepComposed = QualityClassifier.thresholdSweepHashed(
          labeled.join(docs, "doc_id"), pos, neg, thr, buckets = 64)
        .orderBy("thr_fp").collect().toSeq
      sweepStored shouldBe sweepComposed
    } finally {
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(dir))
    }
  }

  test("score drift: a planted off-distribution source stands out; output well-formed") {
    // three sources: two share the seed vocabulary mix, one is pure spam
    // (systematically negative scores — the drifted score distribution)
    def rep(s: String, n: Int) = Seq.fill(n)(s).mkString(" ")
    val docs = ((1L to 12L).map(i => (i, rep("good clean meaning prose", 3), s"bal${i % 2}")) ++
      (13L to 18L).map(i => (i, rep("spam buy click now", 3), "drifty")))
      .toDF("doc_id", "text", "source")
    val out = QualityClassifier.scoreDrift(docs, pos, neg)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    out.map(_._1).toSet shouldBe Set("bal0", "bal1", "drifty")
    out.foreach { case (_, nGroup, nRest, tv) =>
      nGroup + nRest shouldBe 18L
      tv should (be >= 0.0 and be <= 1.0)
    }
    val byName = out.map(t => t._1 -> t._4).toMap
    // the spam source maxes out; the identical-distribution pair sits at
    // exactly 0.5 (their shared bucket vs the drifty third of the rest)
    byName("drifty") shouldBe 1.0
    byName("bal0") shouldBe 0.5
    byName("bal1") shouldBe 0.5
  }
}
