package graft.functions

import org.apache.spark.sql.functions._
import org.scalacheck.Gen

import graft.SparkTestBase
import graft.functions.TextFunctions.{shingleHashes, shingleHashesHof}

/** The native one-pass shingle hasher must produce the exact SET the
  * composed tokens->shingles->polyHash->distinct pipeline produces — same
  * values, rendered in ascending order (the native kernel sorts once per
  * doc so the verify join's merge-intersect precondition holds) — or dedup
  * oracle parity breaks.
  */
class ShingleHashesSpec extends SparkTestBase {
  import spark.implicits._

  private def assertParity(strings: Seq[String], n: Int = 3): Unit = {
    val df = strings.toDF("s").select(
      col("s"),
      shingleHashes(col("s"), n).as("native"),
      array_sort(shingleHashesHof(col("s"), n)).as("hof"))
    val bad = df.filter(!(col("native") <=> col("hof"))).collect()
    assert(bad.isEmpty, s"native != HOF on: ${bad.mkString(", ")}")
  }

  test("native == composed on random word soup") {
    val word = Gen.listOfN(4, Gen.alphaNumChar).map(_.mkString)
    val doc = Gen.listOfN(12, word).map(_.mkString(" "))
    assertParity((1 to 40).map(i => sample(doc, 42L + i)))
  }

  test("native == composed on case, punctuation, unicode, repeats, short docs") {
    assertParity(Seq(
      "", "one", "one two", "one two three",
      "One TWO Three FOUR", "a,b;c d--e f", "  spaced   out  tokens here ",
      "héllo wörld mixé case Ünicode tokens",
      "dup dup dup dup dup", "a b c a b c a b c",
      "tabs\tand\nnewlines between tokens", "123 456 789 0ab"))
  }

  test("native == composed for n=1 and n=5") {
    val docs = Seq("alpha beta gamma delta epsilon zeta", "x y", "lone")
    assertParity(docs, n = 1)
    assertParity(docs, n = 5)
  }

  test("null propagates; short doc yields empty array") {
    Seq(Option.empty[String]).toDF("s")
      .select(shingleHashes(col("s"), 3)).head().isNullAt(0) shouldBe true
    Seq("two words").toDF("s")
      .select(org.apache.spark.sql.functions.size(shingleHashes(col("s"), 3)))
      .head().getInt(0) shouldBe 0
  }

  test("wordShinglesAll keeps duplicates in order; its distinct sorts to the set form") {
    import graft.functions.TextFunctions.{tokens, wordShingles, wordShinglesAll}
    val df = Seq("a b a b a", "x y", "z").toDF("s")
      .select(
        wordShinglesAll(tokens(col("s")), 2).as("all"),
        wordShingles(tokens(col("s")), 2).as("set"))
    val rows = df.collect()
    rows(0).getSeq[String](0) shouldBe Seq("a b", "b a", "a b", "b a")
    rows(0).getSeq[String](1) shouldBe Seq("a b", "b a")
    rows(1).getSeq[String](0) shouldBe Seq("x y")
    rows(2).getSeq[String](0) shouldBe Seq()
    // distinct-of-all == the set form, element for element
    df.filter(!(array_sort(array_distinct(col("all"))) <=> array_sort(col("set"))))
      .count() shouldBe 0L
  }
}
