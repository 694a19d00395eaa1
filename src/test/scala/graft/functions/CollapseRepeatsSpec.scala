package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkTestBase
import graft.functions.TextFunctions.{collapseRepeats, tokens}

/** Consecutive-duplicate collapse: run semantics, order preservation,
  * edge shapes.
  */
class CollapseRepeatsSpec extends SparkTestBase {
  import spark.implicits._

  private def collapse(text: String): Seq[String] =
    Seq(text).toDF("text")
      .select(collapseRepeats(tokens(col("text"))).as("kept"))
      .as[Seq[String]].head()

  test("collapses runs to one, keeps order, non-adjacent repeats survive") {
    collapse("a a the the the b a") shouldBe Seq("a", "the", "b", "a")
    collapse("x y z") shouldBe Seq("x", "y", "z")
    collapse("x x x x x") shouldBe Seq("x")
  }

  test("empty and single-token inputs") {
    collapse("") shouldBe Seq.empty
    collapse("   ") shouldBe Seq.empty
    collapse("solo") shouldBe Seq("solo")
  }

  test("tokenization applies first: case and punctuation fold before the collapse") {
    // "A a" tokenizes to ("a", "a") -> one run
    collapse("A a") shouldBe Seq("a")
    collapse("b, b! c") shouldBe Seq("b", "c")
  }
}
