package graft.operators

import graft.SparkTestBase

/** Contamination check: verbatim n-gram overlap against a benchmark set. */
class ContaminationSpec extends SparkTestBase {
  import spark.implicits._

  private val benchmark = Seq(
    (900L, "the quick brown fox jumps over the lazy dog"),
    (901L, "pack my box with five dozen liquor jugs")
  ).toDF("doc_id", "text")

  test("a doc quoting the benchmark is flagged; disjoint text is clean") {
    val train = Seq(
      // contains the benchmark 3-gram "quick brown fox" (and more)
      (1L, "we saw the quick brown fox jumps again"),
      // shares words but no 3-token window
      (2L, "brown dog and lazy fox sleep quietly"),
      // fully disjoint vocabulary
      (3L, "completely unrelated sentence about spark plans")
    ).toDF("doc_id", "text")
    val out = Contamination.check(train, benchmark).orderBy("doc_id")
      .select("doc_id", "n_shared", "contaminated")
      .as[(Long, Long, Int)].collect().toSeq
    out.map(_._1) shouldBe Seq(1L, 2L, 3L)
    out(0)._2 should be > 0L
    out(0)._3 shouldBe 1
    out(1) shouldBe ((2L, 0L, 0))
    out(2) shouldBe ((3L, 0L, 0))
  }

  test("an exact copy of a benchmark doc shares every shingle (ratio 1.0)") {
    val train = Seq((5L, "pack my box with five dozen liquor jugs"))
      .toDF("doc_id", "text")
    val row = Contamination.check(train, benchmark).head()
    row.getAs[Long]("n_shared") shouldBe row.getAs[Long]("n_shingles")
    row.getAs[Double]("share_ratio") shouldBe 1.0
    row.getAs[Int]("contaminated") shouldBe 1
  }

  test("short docs (no full n-gram) are excluded from the report") {
    val train = Seq((7L, "two words"), (8L, "one two three"))
      .toDF("doc_id", "text")
    val ids = Contamination.check(train, benchmark)
      .select("doc_id").as[Long].collect().toSet
    ids shouldBe Set(8L) // doc 7 has < 3 tokens -> no shingles -> no row
  }
}
