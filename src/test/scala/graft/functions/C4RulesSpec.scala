package graft.functions

import org.apache.spark.sql.functions.col

import graft.SparkTestBase

/** C4 cleaning bundle: every line rule isolated on a hand-built page,
  * page-flag semantics, the cleaned re-join, and the empty edge cases.
  * All thresholds are integers, so the assertions are exact.
  */
class C4RulesSpec extends SparkTestBase {
  import spark.implicits._

  private def rules(text: String): Map[String, Any] = {
    val row = Seq(Tuple1(text)).toDF("text")
      .select(TextFunctions.c4Rules(col("text")).map { case (n, c) => c.as(n) }: _*)
      .head()
    row.schema.fieldNames.zip(row.toSeq).toMap
  }

  private val good1 = "This opening sentence carries exactly seven words."
  private val good2 = "Another proper sentence follows with enough words!"
  private val good3 = "Does a question mark count as terminal punctuation?"

  test("a three-good-line page passes everything; text_clean re-joins the lines") {
    val r = rules(s"$good1\n$good2\n$good3")
    r("n_lines") shouldBe 3L
    r("kept_lines") shouldBe 3L
    Seq("c1_min_lines", "c2_lorem", "c3_brace", "c4_keep")
      .foreach { f => withClue(f)(r(f) shouldBe 1) }
    r("text_clean") shouldBe s"$good1\n$good2\n$good3"
  }

  test("each line rule removes exactly its target line") {
    val page = Seq(
      good1, good2, good3,
      "no terminal punctuation on this line",      // rm_no_terminal
      "Too short.",                                // rm_short (2 words)
      "Please enable JavaScript to view this content.", // rm_javascript (case-folded)
      "Our site uses cookies to improve your experience." // rm_policy
    ).mkString("\n")
    val r = rules(page)
    r("n_lines") shouldBe 7L
    r("kept_lines") shouldBe 3L
    r("rm_no_terminal") shouldBe 1L
    r("rm_short") shouldBe 1L
    r("rm_javascript") shouldBe 1L
    r("rm_policy") shouldBe 1L
    r("c4_keep") shouldBe 1
    r("text_clean") shouldBe s"$good1\n$good2\n$good3"
  }

  test("terminal marks are exactly . ? ! and closing quote; trailing blanks ignored") {
    def kept(line: String) = rules(line)("kept_lines")
    kept("Five words ending with period all fine.  ") shouldBe 1L
    kept("He said the words \"this line is quoted.\"") shouldBe 1L
    kept("A line ending in a comma is removed,") shouldBe 0L
    kept("A line ending in a colon is removed:") shouldBe 0L
  }

  test("page flags: lorem ipsum and curly brace kill c4_keep but leave line counts intact") {
    val base = s"$good1\n$good2\n$good3"
    val lorem = rules(s"$base\nThe Lorem Ipsum placeholder filler appears right here.")
    lorem("c2_lorem") shouldBe 0
    lorem("c4_keep") shouldBe 0
    lorem("kept_lines") shouldBe 4L
    val brace = rules(s"$base\nif (x) { return; }")
    brace("c3_brace") shouldBe 0
    brace("c4_keep") shouldBe 0
    brace("kept_lines") shouldBe 3L
  }

  test("fewer than 3 kept lines fails c1; empty page yields zero counts and empty clean text") {
    val r2 = rules(s"$good1\n$good2")
    r2("c1_min_lines") shouldBe 0
    r2("c4_keep") shouldBe 0
    val empty = rules("")
    empty("n_lines") shouldBe 0L
    empty("kept_lines") shouldBe 0L
    empty("c1_min_lines") shouldBe 0
    empty("text_clean") shouldBe ""
  }

  test("a line can trip several rules at once — each count sees it independently") {
    val r = rules("javascript cookie policy here")
    r("rm_no_terminal") shouldBe 1L
    r("rm_short") shouldBe 1L
    r("rm_javascript") shouldBe 1L
    r("rm_policy") shouldBe 1L
    r("kept_lines") shouldBe 0L
  }
}
