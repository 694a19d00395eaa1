package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkTestBase

/** Relational HLL: duplicate-insensitivity (the sketch property), accuracy
  * at small range (linear counting) AND at >= 10^6 distinct values (the
  * published sketch bound — the old 30-bit hash could not pass this),
  * group isolation, and merge-of-parts == sketch-of-whole for the dense
  * mergeable vectors.
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

  test("small range: linear counting tracks the exact count tightly") {
    val rows = Sketches.approxDistinctWithExact(docs, "lang", "text")
      .as[(String, Double, Long)].collect()
    rows.length should be >= 4
    rows.foreach { case (lang, approx, exact) =>
      // 60-220 distinct/lang at m=2^14 is deep in linear-counting range,
      // where expected relative error is well under 1% — allow 5%
      withClue(s"$lang approx=$approx exact=$exact:") {
        math.abs(approx - exact) / exact.toDouble should be < 0.05
      }
    }
  }

  test("mid range: >= 10^6 distinct values within the published HLL bound") {
    // 1e6 >> 2.5m, so this exercises the RAW estimator on the 61-bit hash;
    // 3 * 1.04/sqrt(2^14) = 2.4% (3 sigma of the published error)
    val n = 1000000L
    val df = spark.range(n)
      .select(lit("g").as("g"), concat(lit("value-"), col("id")).as("v"))
    val est = Sketches.approxDistinct(df, "g", "v")
      .as[(String, Double)].head()._2
    math.abs(est - n) / n.toDouble should be < (3 * 1.04 / math.sqrt(1 << 14))
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

  test("dense vector: length m, and merge-of-parts == sketch-of-whole exactly") {
    val logM = 10 // smaller m keeps the collected arrays cheap in-test
    val whole = Sketches.sketchVector(docs, Seq("lang"), "text", logM)
      .as[(String, Seq[Int])].collect().toMap
    whole.values.foreach(_.length shouldBe (1 << logM))
    val perSource = Sketches.sketchVector(docs, Seq("lang", "source"), "text", logM)
    val merged = Sketches.mergeSketches(perSource, Seq("lang"), "sketch", logM)
      .as[(String, Seq[Int])].collect().toMap
    merged shouldBe whole
  }

  test("estimate off a merged vector == single-pass sparse estimate, bit for bit") {
    val perSource = Sketches.sketchVector(docs, Seq("lang", "source"), "text")
    val merged = Sketches.mergeSketches(perSource, Seq("lang"), "sketch")
    val viaMerge = Sketches.estimateVector(merged, Seq("lang"), "sketch")
      .as[(String, Double)].collect().toMap
    val direct = Sketches.approxDistinct(docs, "lang", "text")
      .as[(String, Double)].collect().toMap
    viaMerge shouldBe direct
  }
}
