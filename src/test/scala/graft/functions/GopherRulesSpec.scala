package graft.functions

import org.apache.spark.sql.functions.col

import graft.SparkTestBase

/** Gopher rule bundle: each rule's pass/fail pinned on a hand-built doc
  * that isolates it, plus the conjunction semantics of `gopher_keep`.
  * Thresholds are cross-multiplied integers, so the assertions are exact.
  */
class GopherRulesSpec extends SparkTestBase {
  import spark.implicits._

  private def rules(text: String): Map[String, Any] = {
    val row = Seq(Tuple1(text)).toDF("text")
      .select(TextFunctions.gopherRules(col("text")).map { case (n, c) => c.as(n) }: _*)
      .head()
    row.schema.fieldNames.zip(row.toSeq).toMap
  }

  // 60 clean words with stopwords and sane lengths: passes everything
  private val clean =
    (1 to 52).map(i => s"word$i").mkString(" ") +
      " the quick brown fox jumps over that lazy dog with ease"

  test("a clean document passes all seven rules") {
    val r = rules(clean)
    Seq("r1_word_count", "r2_mean_len", "r3_symbols", "r4_bullets",
      "r5_ellipsis", "r6_alpha", "r7_stopwords", "gopher_keep")
      .foreach { f => withClue(f)(r(f) shouldBe 1) }
    r("n_words") shouldBe 63L
  }

  test("each rule fails on the document built to break it — and only breaks gopher_keep") {
    // r1: too short
    rules("the cat sat with that hat")("r1_word_count") shouldBe 0
    // r2: mean word length out of [3, 10] (all 1-char words)
    val short = (1 to 60).map(_ => "a").mkString(" ") + " the of"
    rules(short)("r2_mean_len") shouldBe 0
    // r3: symbol-to-word ratio — 60 words need > 6 symbols to fail
    val symboly = clean + " " + (1 to 12).map(_ => "#").mkString(" ")
    rules(symboly)("r3_symbols") shouldBe 0
    // r4: every line a bullet
    val bullets = (1 to 10).map(i => s"- item $i the of").mkString("\n")
    rules(bullets)("r4_bullets") shouldBe 0
    // r5: > 30% of lines end with ellipsis
    val ell = "the first line...\nthe second line...\nplain third line"
    rules(ell)("r5_ellipsis") shouldBe 0
    // r6: < 80% of words contain a letter
    val numeric = "the of " + (1 to 60).map(i => s"$i").mkString(" ")
    rules(numeric)("r6_alpha") shouldBe 0
    // r7: fewer than 2 of the 8 small stopwords
    val noStop = (1 to 60).map(i => s"token$i").mkString(" ")
    rules(noStop)("r7_stopwords") shouldBe 0
    // conjunction: one failing rule zeroes the keep flag
    rules(noStop)("gopher_keep") shouldBe 0
  }

  test("a token-less document gets NULL mean_word_len, zero counts, and fails the keep gate") {
    val r = rules("   \n  \t ")
    r("n_words") shouldBe 0L
    assert(r("mean_word_len") == null) // guarded division: NULL, not NaN
    r("r1_word_count") shouldBe 0
    r("gopher_keep") shouldBe 0
  }

  test("native GopherScan == HOF witness on hand docs and random strings") {
    val hands = Seq(clean, "the cat sat with that hat",
      "the of intro line\n- one\n- two\nplain tail line...\n### #x ...",
      "   \n  \t ", "", "a", "...", ".....", "......", "#", " # .. ",
      "- bullet\n  * spaced bullet\nplain",
      "ends in dots...   \n...starts with dots",
      "tab\tsep\tword\r\nwindows line\r\n",
      "café naïve 你好 the of", // multi-byte code points
      "UPPER THE OF AND lower the of and")
    val gen = org.scalacheck.Gen.listOfN(300, org.scalacheck.Gen.frequency(
      6 -> org.scalacheck.Gen.alphaNumChar,
      2 -> org.scalacheck.Gen.oneOf(' ', ' ', '\n', '\t', '\r'),
      1 -> org.scalacheck.Gen.oneOf('.', '#', '-', '*', 'é', '你'),
      1 -> org.scalacheck.Gen.oneOf("the", "be", "to", "of", "and").flatMap(
        s => org.scalacheck.Gen.const(s.charAt(0))))).map(_.mkString)
    val randoms = (1 to 40).map(i => sample(gen, 5000L + i))
    val docs = (hands ++ randoms).zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("id", "text")
    val native = docs.select(col("id") +:
      TextFunctions.gopherRules(col("text")).map { case (n, c) => c.as(n) }: _*)
    val hof = docs.select(col("id") +:
      TextFunctions.gopherRulesHof(col("text")).map { case (n, c) => c.as(n) }: _*)
    native.orderBy("id").collect().toSeq shouldBe hof.orderBy("id").collect().toSeq
  }

  test("metrics count what the flags compare: bullets, ellipsis lines, symbols") {
    val doc = "the of intro line\n- one\n- two\nplain tail line...\n### #x ..."
    val r = rules(doc)
    r("n_lines") shouldBe 5L
    r("bullet_lines") shouldBe 2L
    r("ellipsis_lines") shouldBe 2L // "...": the tail line and the symbol line
    r("symbol_count") shouldBe 6L // four '#' + two '...' occurrences
  }
}
