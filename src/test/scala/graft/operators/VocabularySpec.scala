package graft.operators

import graft.SparkTestBase

/** Vocabulary statistics: hand-checked counts on a tiny corpus plus the
  * structural invariants (df <= tf, df <= |docs|) on the real one.
  */
class VocabularySpec extends SparkTestBase {
  import spark.implicits._

  test("tf counts occurrences, df counts documents, top-k is deterministic") {
    val docs = Seq(
      (1L, "alpha beta alpha"),
      (2L, "alpha gamma"),
      (3L, "delta")).toDF("doc_id", "text")
    val stats = Vocabulary.tokenStats(docs)
      .as[(String, Long, Long)].collect().map(r => r._1 -> (r._2, r._3)).toMap
    stats("alpha") shouldBe ((3L, 2L))    // 3 occurrences across 2 docs
    stats("beta") shouldBe ((1L, 1L))
    stats("gamma") shouldBe ((1L, 1L))
    stats("delta") shouldBe ((1L, 1L))
    // ties on tf=1 break by token: beta < delta < gamma
    Vocabulary.topTokens(docs, 3).as[(String, Long, Long)].collect()
      .map(_._1).toSeq shouldBe Seq("alpha", "beta", "delta")
  }

  test("tfidf matches hand computation; corpus-wide tokens score zero") {
    val docs = Seq(
      (1L, "alpha beta alpha"),
      (2L, "alpha gamma"),
      (3L, "delta alpha")).toDF("doc_id", "text")
    val out = Vocabulary.tfIdf(docs)
      .as[(Long, String, Long, Long, Double)].collect()
      .map(r => (r._1, r._2) -> r._5).toMap
    // alpha appears in every doc: idf = ln(3/3) = 0
    out((1L, "alpha")) shouldBe 0.0
    // beta: tf=1 in doc 1, df=1 -> 1 * ln(3)
    out((1L, "beta")) shouldBe (math.log(3.0) +- 1e-12)
    // doc 1's alpha tf=2 still zero (tf scales a zero idf)
    out((2L, "gamma")) shouldBe (math.log(3.0) +- 1e-12)
  }

  test("invariants hold on the real corpus: df <= tf and df <= n_docs") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val n = docs.count()
    val bad = Vocabulary.tokenStats(docs)
      .filter(org.apache.spark.sql.functions.col("df") >
        org.apache.spark.sql.functions.col("tf") ||
        org.apache.spark.sql.functions.col("df") > n)
      .count()
    bad shouldBe 0L
  }

  test("merged shard counts equal the single-pass corpus tf exactly") {
    import org.apache.spark.sql.functions.col
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val merged = Vocabulary.mergeShardCounts(Vocabulary.shardCounts(docs, "source"))
      .select("token", "tf").as[(String, Long)].collect().toMap
    val direct = Vocabulary.tokenStats(docs)
      .select("token", "tf").as[(String, Long)].collect().toMap
    merged shouldBe direct
    // n_shards is bounded by the shard population and never exceeds tf
    val nSources = docs.select("source").distinct().count()
    Vocabulary.mergeShardCounts(Vocabulary.shardCounts(docs, "source"))
      .filter(col("n_shards") > nSources || col("n_shards") > col("tf") ||
        col("n_shards") < 1)
      .count() shouldBe 0L
  }

  test("OOV rate: hand-computed on a planted vocab; bounds hold on the corpus") {
    import org.apache.spark.sql.functions.col
    val docs = Seq(
      (1L, "alpha beta alpha"),   // all in vocab
      (2L, "alpha zork"),         // half out
      (3L, "zork grue qux"))      // all out
      .toDF("doc_id", "text")
    val vocab = Seq("alpha", "beta").toDF("token")
    val out = Vocabulary.oovRate(docs, vocab).orderBy("doc_id")
      .select("n_tokens", "n_oov", "oov_rate")
      .as[(Long, Long, Double)].collect()
    out(0) shouldBe ((3L, 0L, 0.0))
    out(1) shouldBe ((2L, 1L, 0.5))
    out(2) shouldBe ((3L, 3L, 1.0))
    val corpus = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val rated = Vocabulary.oovRate(corpus, Vocabulary.topTokens(corpus, 100))
    rated.filter(col("oov_rate") < 0 || col("oov_rate") > 1 ||
      col("n_oov") > col("n_tokens")).count() shouldBe 0L
    // a 100-token vocab over this corpus' ~50-word vocabulary: everything known
    rated.filter(col("n_oov") > 0).count() shouldBe 0L
  }
}
