package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkTestBase

/** Relational HLL: duplicate-insensitivity (the sketch property), accuracy
  * vs the exact count on the real corpus, and group isolation.
  */
class SketchesSpec extends SparkTestBase {
  import spark.implicits._

  private lazy val docs = spark.read
    .parquet("/root/testdata/sf0.01/documents.parquet")

  test("estimate is duplicate-insensitive: registers are max-merged") {
    val once = Sketches.approxDistinct(docs, "lang", "text")
      .as[(String, Double)].collect().toMap
    // every row duplicated 3x: identical registers, identical estimate
    val tripled = Sketches.approxDistinct(
      docs.union(docs).union(docs), "lang", "text")
      .as[(String, Double)].collect().toMap
    tripled shouldBe once
  }

  test("estimate tracks the exact count within sketch error on the real corpus") {
    val rows = Sketches.approxDistinctWithExact(docs, "lang", "text")
      .as[(String, Double, Long)].collect()
    rows.length should be >= 4
    rows.foreach { case (lang, approx, exact) =>
      // raw estimator (no small-range correction) at 64 registers and
      // 60-220 distinct values/lang: generous but meaningful bound
      withClue(s"$lang approx=$approx exact=$exact:") {
        approx should be > exact * 0.5
        approx should be < exact * 1.7
      }
    }
  }

  test("groups are isolated: a huge group does not move a small group's estimate") {
    val small = Seq(("a", "x1"), ("a", "x2")).toDF("g", "v")
    val noisy = small.union(
      (1 to 500).map(i => ("b", s"value number $i")).toDF("g", "v"))
    val alone = Sketches.approxDistinct(small, "g", "v")
      .filter(col("g") === "a").as[(String, Double)].head()._2
    val together = Sketches.approxDistinct(noisy, "g", "v")
      .filter(col("g") === "a").as[(String, Double)].head()._2
    together shouldBe alone
  }
}
