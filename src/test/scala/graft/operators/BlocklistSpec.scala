package graft.operators

import graft.SparkTestBase

/** Blocklist screen: token-exact category matching, multiword phrases,
  * overlap counting, and the deterministic worst-category pick.
  */
class BlocklistSpec extends SparkTestBase {
  import spark.implicits._

  private val list = Seq(
    "gambling" -> "casino", "gambling" -> "jackpot",
    "spam" -> "click here", "spam" -> "free money now")

  test("token-exact: words match whole tokens only; phrases respect boundaries") {
    val docs = Seq(
      (1L, "win big at the casino tonight"),        // 1 gambling hit
      (2L, "the casinos were classic"),             // substrings never match
      (3L, "just click here to click here again"),  // phrase counted per window
      (4L, "click over here for free money later"), // broken phrase: no hit
      (5L, "totally clean document")
    ).toDF("doc_id", "text")
    val hits = Blocklist.screen(docs, list)
      .collect().map(r => (r.getLong(0), r.getString(1)) -> r.getLong(2)).toMap
    hits shouldBe Map((1L, "gambling") -> 1L, (3L, "spam") -> 2L)
  }

  test("rollup: every doc survives; totals, category counts, worst pick, keep flag") {
    val docs = Seq(
      (1L, "casino jackpot casino"),                 // gambling 3
      (2L, "click here and casino"),                 // spam 1, gambling 1: tie -> lexicographic
      (3L, "free money now free money now"),         // overlapping windows: 2 hits
      (4L, "nothing listed here at all")
    ).toDF("doc_id", "text")
    val out = Blocklist.screenRollup(docs, list)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2),
        Option(r.getString(3)), r.getInt(4))).toMap
    out should have size 4
    out(1L) shouldBe ((3L, 1L, Some("gambling"), 0))
    out(2L) shouldBe ((2L, 2L, Some("gambling"), 0)) // 1-1 tie breaks to 'gambling'
    out(3L) shouldBe ((2L, 1L, Some("spam"), 0))
    out(4L) shouldBe ((0L, 0L, None, 1))             // clean: keep = 1
  }

  test("worst category is the max-hits one when unambiguous") {
    val docs = Seq((1L, "casino click here click here")).toDF("doc_id", "text")
    Blocklist.screenRollup(docs, list)
      .head().getString(3) shouldBe "spam" // 2 spam vs 1 gambling
  }

  test("phrases normalize through the house tokenizer; untokenizable entries reject loudly") {
    // doubled spaces and punctuation in a LIST entry still match the
    // single-space-joined document n-grams
    val messy = Seq("spam" -> "click  here", "spam" -> "free, money... now!")
    val docs = Seq((1L, "please click here for free money now")).toDF("doc_id", "text")
    val hits = Blocklist.screen(docs, messy).collect()
    hits.map(_.getAs[Long]("hits")).sum shouldBe 2L
    val err = intercept[IllegalArgumentException] {
      Blocklist.screen(docs, Seq("junk" -> "?!...")).collect()
    }
    err.getMessage should include ("tokenizes to nothing")
  }

  test("incremental screen state: shard appends read off merged state == one-shot rollup") {
    val corpus = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select(org.apache.spark.sql.functions.col("doc_id"),
        org.apache.spark.sql.functions.concat(
          org.apache.spark.sql.functions.col("text"),
          org.apache.spark.sql.functions.when(
            org.apache.spark.sql.functions.col("doc_id") % 7 === 0,
            org.apache.spark.sql.functions.lit(" casino jackpot click here"))
            .otherwise(org.apache.spark.sql.functions.lit(""))).as("text"))
    val (s1, s2) = (corpus.filter("doc_id <= 25"), corpus.filter("doc_id > 25"))
    val grown = Blocklist.incrementScreenState(Blocklist.screen(s1, list), s2, list)
    val incremental = Blocklist.screenRollupFromState(
        corpus.select("doc_id"), grown)
      .collect().map(_.toSeq).toSet
    incremental shouldBe Blocklist.screenRollup(corpus, list).collect().map(_.toSeq).toSet
  }
}
