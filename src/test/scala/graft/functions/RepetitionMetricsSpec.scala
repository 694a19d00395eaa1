package graft.functions

import org.apache.spark.sql.functions.col

import graft.SparkTestBase
import graft.functions.TextFunctions.repetitionMetrics

/** Within-doc repetition metrics: hand-computed values on crafted docs. */
class RepetitionMetricsSpec extends SparkTestBase {
  import spark.implicits._

  private def metrics(text: String): (Long, Double, Double, Double) =
    Seq(text).toDF("text")
      .select(repetitionMetrics(col("text")).map { case (n, c) => c.as(n) }: _*)
      .as[(Long, Double, Double, Double)].head()

  test("duplicate lines: ratio over non-blank trimmed lines, char-weighted twin") {
    // 4 non-blank lines, "hello" x3: 2 repeats of 5 chars; total 20 chars
    val (n, dupRatio, dupChars, _) = metrics("hello\nworld\n  hello  \n\nhello")
    n shouldBe 4L
    dupRatio shouldBe 0.5 // 4 lines, 2 distinct
    dupChars shouldBe 0.5 // 10 repeat chars / 20
  }

  test("top bigram coverage: most frequent word 2-gram, smallest on ties") {
    // grams: "a b" x3, "b a" x2 -> best ("a b", 3); 3*3 chars / 11 chars
    val (_, _, _, top) = metrics("a b a b a b")
    top shouldBe 0.818182 // round(9/11, 6) pinned
  }

  test("degenerate docs: empty, blank-only, and sub-bigram texts all yield zeros") {
    metrics("") shouldBe ((0L, 0.0, 0.0, 0.0))
    metrics("   \n\n  ") shouldBe ((0L, 0.0, 0.0, 0.0))
    val (n1, d1, c1, t1) = metrics("single")
    (n1, d1, c1, t1) shouldBe ((1L, 0.0, 0.0, 0.0))
  }

  test("a generator loop is caught: high repetition on looped boilerplate") {
    val looped = Array.fill(40)("click here to subscribe now").mkString("\n")
    val (n, dupRatio, dupChars, top) = metrics(looped)
    n shouldBe 40L
    dupRatio should be > 0.97
    dupChars should be > 0.97
    top should be > 0.2 // one dominant bigram covers a big char share
  }

  test("native RepStats == HOF witness on the corpus and the edge shapes") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select(col("doc_id"), col("text"))
      .union(Seq((-1L, "hello\nworld\n  hello  \n\nhello"), (-2L, ""),
        (-3L, "a b a b a b"), (-4L, "x y x y z z z z"), (-5L, "single"),
        (-6L, "  \n \n"), (-7L, "A A a a the the THE")).toDF("doc_id", "text"))
    val native = docs.select(col("doc_id") +:
        TextFunctions.repetitionMetrics(col("text")).map { case (n, c) => c.as(n) }: _*)
      .as[(Long, Long, Double, Double, Double)].collect().toSet
    val hof = docs.select(col("doc_id") +:
        TextFunctions.repetitionMetricsHof(col("text")).map { case (n, c) => c.as(n) }: _*)
      .as[(Long, Long, Double, Double, Double)].collect().toSet
    native shouldBe hof
  }
}
