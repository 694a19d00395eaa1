package graft.functions

import org.apache.spark.sql.functions._
import org.scalacheck.Gen

import graft.SparkTestBase
import graft.functions.TextFunctions._

/** The native one-pass TextStats kernel must reproduce the composed HOF
  * metrics and language-ID bit-for-bit — same tokenizer, same counts, same
  * downstream arithmetic.
  */
class TextStatsSpec extends SparkTestBase {
  import spark.implicits._

  private val tokenful = {
    val word = Gen.oneOf(
      Gen.listOfN(5, Gen.alphaNumChar).map(_.mkString),
      Gen.oneOf("the", "a", "of", "and", "der", "le", "el", "de"))
    val doc = Gen.listOfN(15, word).map(_.mkString(" "))
    (1 to 40).map(i => sample(doc, 42L + i)) ++ Seq(
      "one", "The THE the", "a,b;c--d", "héllo wörld the",
      "der die und das le la et", "1234 5678 the of")
  }

  // zero-token docs divide by zero under ANSI in BOTH formulations — the
  // ratio contract assumes tokens exist; only the lang test exercises them
  private val fixtures = tokenful ++ Seq("", "  ", "!!! --- ...")

  test("qualityMetrics: native counts == HOF counts on every metric") {
    val native = tokenful.toDF("s").select(
      col("s") +: qualityMetrics(col("s")).map { case (n, c) => c.as(n) }: _*)
    val hof = tokenful.toDF("s").select(
      col("s") +: qualityMetricsHof(col("s")).map { case (n, c) => c.as(n) }: _*)
    val mismatches = native.exceptAll(hof).collect()
    mismatches shouldBe empty
  }

  test("predictedLangText == token-based predictedLang") {
    val df = fixtures.toDF("s").select(
      col("s"),
      predictedLangText(col("s")).as("native"),
      predictedLang(tokens(col("s"))).as("hof"))
    df.filter(!(col("native") <=> col("hof"))).collect() shouldBe empty
  }

  test("null text propagates through the struct") {
    Seq(Option.empty[String]).toDF("s")
      .select(TextStats.textStats(col("s"))).head().isNullAt(0) shouldBe true
  }
}
