package graft.operators

import org.apache.spark.sql.functions.col

import graft.SparkTestBase

/** Unigram surprisal: agrees with a transparent driver-side model to the
  * pinned series' precision, handles OOV via add-one smoothing, survives
  * token-less docs, and is partition-order invariant (the property the
  * integer fixed-point design buys).
  */
class LmScoreSpec extends SparkTestBase {
  import spark.implicits._

  private val docs = Seq(
    (1L, "the cat sat on the mat"),
    (2L, "the the the the"),           // all head tokens: lowest surprisal
    (3L, "zyzzyva qwerty plugh"),      // rare tokens: highest surprisal
    (4L, "..."),                       // no tokens
    (5L, "the cat")
  ).toDF("doc_id", "text")

  /** Driver-side reference: add-one unigram surprisal with libm log —
    * the pinned series must match within its documented 1.1e-8 truncation
    * (plus the 1e-9 fixed-point quantum).
    */
  private def referenceScores(corpus: Seq[(Long, String)]): Map[Long, Option[Double]] = {
    def toks(s: String) = s.toLowerCase.split("[^a-z0-9]+").filter(_.nonEmpty).toSeq
    val tf = corpus.flatMap(d => toks(d._2)).groupBy(identity).map { case (w, o) => w -> o.size }
    val d = tf.values.sum + tf.size
    corpus.map { case (id, text) =>
      val ts = toks(text)
      id -> (if (ts.isEmpty) None
             else Some(ts.map(w => math.log(d.toDouble) -
               math.log(tf.getOrElse(w, 0) + 1.0)).sum / ts.size))
    }.toMap
  }

  test("matches the driver-side libm model within series precision; extremes order correctly") {
    val out = LmScore.unigramSurprisal(docs)
      .select("doc_id", "n_tokens", "mean_surprisal")
      .collect().map(r => r.getLong(0) -> (r.getLong(1),
        if (r.isNullAt(2)) None else Some(r.getDouble(2)))).toMap
    val ref = referenceScores(Seq(
      (1L, "the cat sat on the mat"), (2L, "the the the the"),
      (3L, "zyzzyva qwerty plugh"), (4L, "..."), (5L, "the cat")))
    ref.foreach { case (id, expected) =>
      withClue(s"doc $id:") {
        (out(id)._2, expected) match {
          case (Some(got), Some(want)) => got shouldBe want +- 1e-6
          case (got, want) => got shouldBe want
        }
      }
    }
    out(4L) shouldBe ((0L, None)) // token-less doc survives with NULL score
    // head-token doc scores lowest, rare-token doc highest
    out(2L)._2.get should be < out(1L)._2.get
    out(3L)._2.get should be > out(1L)._2.get
  }

  test("OOV against a held-out reference: unseen words cost the full ln(N+V)") {
    val reference = Seq((10L, "alpha beta gamma alpha")).toDF("doc_id", "text")
    val scored = LmScore.unigramSurprisal(
        Seq((1L, "alpha alpha"), (2L, "unseen words only")).toDF("doc_id", "text"),
        reference = Some(reference))
      .select("doc_id", "mean_surprisal").as[(Long, Double)].collect().toMap
    // reference: N=4, V=3, D=7; alpha tf=2 -> -ln(3/7); unseen -> -ln(1/7)
    scored(1L) shouldBe math.log(7.0 / 3.0) +- 1e-6
    scored(2L) shouldBe math.log(7.0) +- 1e-6
  }

  test("bigram stupid backoff: seen ratios, backoff costs, and short docs match a driver model") {
    // model corpus: transitions "the cat"(x2), "cat sat", "the dog"
    val ref = Seq((10L, "the cat sat"), (11L, "the cat"), (12L, "the dog"))
      .toDF("doc_id", "text")
    // c(the *) = 3: "the cat" x2, "the dog"; c(cat *) = 1
    // unigram: the=3, cat=2, sat=1, dog=1 -> N=7, V=4, D=11
    val score = Seq(
      (1L, "the cat"),       // seen: ln(3/2)
      (2L, "the dog"),       // seen: ln(3/1)
      (3L, "cat dog"),       // unseen: backoff 0.4*(1+1)/11 -> ln(55/4)
      (4L, "dog zyzzyva"),   // unseen, OOV cur: 0.4*(0+1)/11 -> ln(55/2)
      (5L, "the"))           // one token: no transitions -> NULL
      .toDF("doc_id", "text")
    val out = LmScore.bigramSurprisal(score, reference = Some(ref))
      .collect().map(r => r.getLong(0) -> (r.getLong(1),
        if (r.isNullAt(3)) None else Some(r.getDouble(3)))).toMap
    out(1L)._2.get shouldBe math.log(3.0 / 2.0) +- 1e-6
    out(2L)._2.get shouldBe math.log(3.0) +- 1e-6
    out(3L)._2.get shouldBe math.log(13.75) +- 1e-6
    out(4L)._2.get shouldBe math.log(27.5) +- 1e-6
    out(5L) shouldBe ((0L, None))
    // fluent-vs-scrambled on the self-model: natural order scores lower
    val corpus = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select(col("doc_id"), col("text"))
    val self = LmScore.bigramSurprisal(corpus)
      .agg(org.apache.spark.sql.functions.avg("mean_surprisal"))
      .head().getDouble(0)
    val scrambled = LmScore.bigramSurprisal(
      corpus.withColumn("text",
        org.apache.spark.sql.functions.expr(
          "array_join(reverse(split(text, ' ')), ' ')")),
      reference = Some(corpus))
      .agg(org.apache.spark.sql.functions.avg("mean_surprisal"))
      .head().getDouble(0)
    scrambled should be > self
  }

  test("trigram stupid backoff: all three levels match a driver model") {
    // trigrams: "a b c" x2, "b c d", "b c x" -> ctx totals "a b"=2, "b c"=2
    // bigrams: "a b"=2, "b c"=3, "c d"=1, "c x"=1 -> prefix a=2, b=3, c=2
    // unigrams: a=2 b=3 c=3 d=1 x=1 -> N=10, V=5, D=15
    val ref = Seq((10L, "a b c d"), (11L, "a b c"), (12L, "b c x"))
      .toDF("doc_id", "text")
    val score = Seq(
      (1L, "a b c"),   // seen trigram: ln(2/2) = 0
      (2L, "a b c d"), // 0 + seen "b c d": ln(2/1) -> mean ln(2)/2
      (3L, "c a b"),   // trigram unseen, bigram "a b" seen: 0.4*2/2 -> ln 2.5
      (4L, "q c d"),   // bigram "c d" seen: 0.4*1/2 -> ln 5
      (5L, "b c a"),   // bigram "c a" unseen: 0.16*(2+1)/15 -> ln(375/12)
      (6L, "q q q"),   // OOV floor: 0.16*1/15 -> ln(375/4)
      (7L, "a b"))     // < 3 tokens: no trigram positions -> NULL
      .toDF("doc_id", "text")
    val out = LmScore.trigramSurprisal(score, reference = Some(ref))
      .collect().map(r => r.getLong(0) -> (r.getLong(1),
        if (r.isNullAt(3)) None else Some(r.getDouble(3)))).toMap
    out(1L)._2.get shouldBe 0.0 +- 1e-6
    out(2L)._2.get shouldBe math.log(2.0) / 2.0 +- 1e-6
    out(3L)._2.get shouldBe math.log(2.5) +- 1e-6
    out(4L)._2.get shouldBe math.log(5.0) +- 1e-6
    out(5L)._2.get shouldBe math.log(375.0 / 12.0) +- 1e-6
    out(6L)._2.get shouldBe math.log(375.0 / 4.0) +- 1e-6
    out(7L) shouldBe ((0L, None))
  }

  test("trigram state: chained increments == one-shot model bit-for-bit") {
    val corpus = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select(col("doc_id"), col("text"))
    val eras = Seq(
      corpus.filter(col("doc_id") % 3 === 0),
      corpus.filter(col("doc_id") % 3 === 1),
      corpus.filter(col("doc_id") % 3 === 2))
    val chained = eras.tail.foldLeft(LmScore.trigramState(eras.head)) {
      (st, shard) => LmScore.incrementTrigramState(st, shard)
    }
    val inc = LmScore.trigramSurprisalFromState(corpus, chained)
      .orderBy("doc_id").collect().toSeq
    val oneShot = LmScore.trigramSurprisal(corpus)
      .orderBy("doc_id").collect().toSeq
    inc shouldBe oneShot
    // the state itself merges exactly: summed counts == whole-corpus counts
    val whole = LmScore.trigramState(corpus)
      .orderBy("ord", "gram").collect().toSeq
    chained.orderBy("ord", "gram").collect().toSeq shouldBe whole
  }

  test("partition-order invariance: integer fixed-point sums cannot drift") {
    val big = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select(col("doc_id"), col("text"))
    val a = LmScore.unigramSurprisal(big)
      .select("doc_id", "surprisal_fp").as[(Long, Long)].collect().toSet
    val b = LmScore.unigramSurprisal(big.repartition(13))
      .select("doc_id", "surprisal_fp").as[(Long, Long)].collect().toSet
    a shouldBe b
  }

  test("sourceKlDrift: matched source ~0, alien-token source high, libm agreement") {
    // sources A and B have the SAME token distribution (each 3 'the',
    // 1 'cat'); source C is all alien tokens
    val docs = Seq(
      ("a", "the the the cat"), ("b", "the cat the the"),
      ("c", "zyzzyva qwerty zyzzyva plugh")
    ).toDF("source", "text")
    val out = LmScore.sourceKlDrift(docs)
      .select("source", "n_tokens", "kl_nats")
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2))).toMap
    // driver-side libm reference: KL_g = sum tf_gw/N_g * ln((tf_gw/N_g)/(tf_w/N))
    def klRef(g: Map[String, Long], all: Map[String, Long]): Double = {
      val (ng, n) = (g.values.sum.toDouble, all.values.sum.toDouble)
      g.map { case (w, tf) =>
        tf / ng * math.log((tf / ng) / (all(w) / n)) }.sum
    }
    val a = Map("the" -> 3L, "cat" -> 1L)
    val c = Map("zyzzyva" -> 2L, "qwerty" -> 1L, "plugh" -> 1L)
    val all = Map("the" -> 6L, "cat" -> 2L, "zyzzyva" -> 2L, "qwerty" -> 1L, "plugh" -> 1L)
    out("a")._1 shouldBe 4L
    out("a")._2 shouldBe klRef(a, all) +- 1e-6
    out("c")._2 shouldBe klRef(c, all) +- 1e-6
    // the matched sources drift little; the alien source drifts hard
    out("a")._2 should be < 0.5
    out("c")._2 should be > 1.0
    // KL >= 0 always (Gibbs)
    out.values.foreach(_._2 should be >= -1e-9)
  }

  test("incremental KL state: shard-split increment equals the one-shot audit bit-for-bit") {
    val corpus = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select(col("doc_id"), col("source"), col("text"))
    val oneShot = LmScore.sourceKlDrift(corpus)
      .select("source", "n_tokens", "kl_fp").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDecimal(2))).toSet
    val st0 = LmScore.klState(corpus.filter(col("doc_id") <= 100))
    val grown = LmScore.incrementKlState(st0, corpus.filter(col("doc_id") > 100))
    val incremental = LmScore.sourceKlFromState(grown)
      .select("source", "n_tokens", "kl_fp").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDecimal(2))).toSet
    incremental shouldBe oneShot // count addition is associative; ln runs post-merge
  }

  test("pmiCollocations: glued pair outranks chance pair; libm agreement; minCount prunes") {
    // "new york" always together (4x); "the" is everywhere, so "the new"
    // co-occurs only at chance; "rare gem" occurs twice (under minCount=3)
    // 'the' also appears away from 'new' (last doc), so the chance pair
    // 'the new' carries strictly less information than the glued pair
    val texts = Seq("the new york times", "in the new york subway",
      "the new york papers", "a new york minute", "rare gem here",
      "a rare gem", "so the end of the story ends the tale")
    val docs = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("doc_id", "text").select(col("text"))
    val out = LmScore.pmiCollocations(docs, k = 25, minCount = 3)
      .select("bigram", "cuv", "pmi_nats")
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2))).toMap
    out.keySet should contain("new york")
    out.keySet should not contain "rare gem" // cuv=2 < minCount
    // libm reference: pmi = ln(cuv * N_uni^2 / (N_bi * cu * cv))
    def toks(s: String) = s.toLowerCase.split("[^a-z0-9]+").filter(_.nonEmpty).toSeq
    val uni = texts.flatMap(toks).groupBy(identity).map { case (w, o) => w -> o.size }
    val bis = texts.flatMap(t => toks(t).sliding(2).filter(_.size == 2).map(_.mkString(" ")))
      .groupBy(identity).map { case (b, o) => b -> o.size }
    val (nU, nB) = (uni.values.sum.toDouble, bis.values.sum.toDouble)
    def pmiRef(b: String): Double = {
      val Array(u, v) = b.split(" ")
      math.log(bis(b) * nU * nU / (nB * uni(u) * uni(v)))
    }
    out("new york")._2 shouldBe pmiRef("new york") +- 1e-6
    // the glued pair carries more information than any the-* chance pair
    out.filterNot(_._1 == "new york").values.foreach { case (_, p) =>
      p should be < out("new york")._2
    }
  }

  test("unigram model state round-trips through parquet: persisted model scores identically") {
    val corpus = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select(col("doc_id"), col("text"))
    val model = LmScore.unigramModel(corpus)
    val dir = java.nio.file.Files.createTempDirectory("graft_lm_model").toString
    model.wordLn.write.mode("overwrite").parquet(s"$dir/word_ln")
    model.lnD.write.mode("overwrite").parquet(s"$dir/ln_d")
    val reloaded = LmScore.UnigramLm(
      spark.read.parquet(s"$dir/word_ln"), spark.read.parquet(s"$dir/ln_d"))
    val direct = LmScore.unigramSurprisal(corpus)
      .select("doc_id", "surprisal_fp").as[(Long, Long)].collect().toSet
    val viaState = LmScore.surprisalWithModel(corpus, reloaded)
      .select("doc_id", "surprisal_fp").as[(Long, Long)].collect().toSet
    viaState shouldBe direct // integer state: nothing to drift in a round trip
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(dir))
  }

  test("tokenEntropy: libm agreement, repetition scores zero, uniform doc hits ln(v), NULLs survive") {
    val docs = Seq(
      (1L, "the cat sat on the mat"),   // 6 tokens, 'the' twice
      (2L, "spam spam spam spam"),      // zero entropy: one type
      (3L, "all four words differ"),    // uniform: H = ln 4
      (4L, "...")                       // token-less
    ).toDF("doc_id", "text")
    val out = LmScore.tokenEntropy(docs)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2),
        if (r.isNullAt(5)) None else Some(r.getDouble(5)))).toMap
    out should have size 4
    out(4L) shouldBe ((0L, 0L, None))
    out(2L)._3.get shouldBe 0.0 +- 1e-9
    out(3L)._3.get shouldBe math.log(4.0) +- 1e-6
    // libm reference for the mixed doc: H = ln 6 - (2 ln 2)/6
    out(1L) shouldBe ((6L, 5L,
      out(1L)._3)) // shape
    out(1L)._3.get shouldBe (math.log(6.0) - 2 * math.log(2.0) / 6) +- 1e-6
    // ttr: distinct/total
    LmScore.tokenEntropy(docs).filter(col("doc_id") === 1L)
      .select("ttr").head().getDouble(0) shouldBe 5.0 / 6 +- 1e-6
  }

  test("perplexityBuckets: per-language type-1 tiers match a driver replay; ties share; NULLs survive") {
    val docs = Seq(
      (1L, "en", "the cat sat on the mat"),
      (2L, "en", "the the the the"),
      (3L, "en", "zyzzyva qwerty plugh"),
      (4L, "en", "the cat"),
      (5L, "en", "cat mat sat"),
      (6L, "en", "qwerty the zyzzyva"),
      (7L, "fr", "le chat"),
      (8L, "fr", "le le le"),
      (9L, "fr", "zut alors le chat noir"),
      (10L, "fr", "..."),                   // token-less: NULL bucket
      (11L, "en", "zyzzyva qwerty plugh")   // exact tie with doc 3
    ).toDF("doc_id", "lang", "text")
    val out = LmScore.perplexityBuckets(docs, reference = docs.select(col("text")),
        nBuckets = 3)
      .collect().map(r => r.getLong(0) -> (r.getString(1),
        if (r.isNullAt(4)) None else Some(r.getLong(4)),
        if (r.isNullAt(5)) None else Some(r.getInt(5)))).toMap
    out should have size 11
    out(10L)._3 shouldBe None              // survives with NULL bucket
    out(3L)._3 shouldBe out(11L)._3        // identical text -> identical tier
    // driver-side replay: T_k = sorted(rank_k - 1), bucket = 1 + #{k: m > T_k}
    out.values.toSeq.filter(_._2.isDefined).groupBy(_._1).foreach {
      case (lang, rows) =>
        val sorted = rows.map(_._2.get).sorted
        val n = sorted.size
        def thr(k: Int): Long = sorted((n / 3) * k + ((n % 3) * k + 2) / 3 - 1)
        rows.foreach { case (_, Some(m), got) =>
          withClue(s"$lang mean $m:") {
            got shouldBe Some(1 + Seq(1, 2).count(k => m > thr(k)))
          }
        }
    }
    // the all-head-token doc is in the head tier; the rarest-mean doc in
    // the tail; docs 3/11 tie EXACTLY at the T2 threshold and stay middle
    // (type-1: ties never straddle a cut)
    out(2L)._3 shouldBe Some(1)
    out(5L)._3 shouldBe Some(3)
    out(3L)._3 shouldBe Some(2)
  }

  test("tfidfTopTerms: discriminative terms outrank ubiquitous ones; ties lexicographic; k caps") {
    val docs = Seq(
      (1L, "alpha common common"),
      (2L, "beta common"),
      (3L, "common gamma delta epsilon zeta eta theta")
    ).toDF("doc_id", "text")
    val out = LmScore.tfidfTopTerms(docs, k = 3)
      .select("doc_id", "term", "score_fp", "rank")
      .collect().map(r => (r.getLong(0), r.getInt(3)) -> (r.getString(1), r.getLong(2)))
      .toMap
    // 'common' appears in every doc: idf = ln(3/3) = 0 -> score 0, never
    // outranks a discriminative term
    out((1L, 1))._1 shouldBe "alpha"
    out((2L, 1))._1 shouldBe "beta"
    out((1L, 2))._1 shouldBe "common"
    out((1L, 2))._2 shouldBe 0L
    // doc 3: six df=1 terms all tie at tf=1 -> lexicographic cut at k=3
    Seq(out((3L, 1))._1, out((3L, 2))._1, out((3L, 3))._1) shouldBe
      Seq("delta", "epsilon", "eta")
    // k caps the per-doc output
    LmScore.tfidfTopTerms(docs, k = 3).groupBy(col("doc_id")).count()
      .select("count").as[Long].collect().foreach(_ should be <= 3L)
  }
}
