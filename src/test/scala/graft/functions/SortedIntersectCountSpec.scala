package graft.functions

import org.apache.spark.sql.functions._
import org.scalacheck.Gen

import graft.SparkTestBase
import graft.functions.SortedIntersectCount.sortedIntersectCount
import graft.functions.TextFunctions.{jaccard, jaccardSorted, shingleHashes}

/** The native sorted-merge intersect count must agree with
  * `size(array_intersect(a, b))` on every sorted distinct input — it is the
  * verify-join kernel, so a divergence silently changes which near-dup
  * pairs survive.
  */
class SortedIntersectCountSpec extends SparkTestBase {
  import spark.implicits._

  private def assertParity(pairs: Seq[(Seq[Long], Seq[Long])]): Unit = {
    val df = pairs.toDF("a", "b").select(
      col("a"), col("b"),
      sortedIntersectCount(col("a"), col("b")).as("native"),
      org.apache.spark.sql.functions.size(array_intersect(col("a"), col("b")))
        .cast("long").as("hof"))
    val bad = df.filter(!(col("native") <=> col("hof"))).collect()
    assert(bad.isEmpty, s"native != array_intersect size on: ${bad.mkString(", ")}")
  }

  test("native == array_intersect size on random sorted distinct sets") {
    val set = Gen.listOfN(20, Gen.choose(0L, 30L)).map(_.distinct.sorted)
    val pairs = (1 to 60).map { i =>
      (sample(set, 7L * i), sample(set, 900L + i))
    }
    assertParity(pairs)
  }

  test("edge cases: empty, disjoint, identical, containment") {
    assertParity(Seq(
      (Seq.empty[Long], Seq.empty[Long]),
      (Seq.empty[Long], Seq(1L, 2L)),
      (Seq(1L, 3L, 5L), Seq(2L, 4L, 6L)),
      (Seq(1L, 2L, 3L), Seq(1L, 2L, 3L)),
      (Seq(1L, 2L, 3L, 4L, 5L), Seq(2L, 4L)),
      (Seq(Long.MinValue, 0L, Long.MaxValue), Seq(Long.MinValue, Long.MaxValue))))
  }

  test("null propagates") {
    Seq((Option.empty[Seq[Long]], Option(Seq(1L))))
      .toDF("a", "b")
      .select(sortedIntersectCount(col("a"), col("b")))
      .head().isNullAt(0) shouldBe true
  }

  test("jaccardSorted == jaccard witness on real shingle sets") {
    val docs = Seq(
      "the quick brown fox jumps over the lazy dog again and again",
      "the quick brown fox jumps over the sleepy dog again and again",
      "an entirely different document with other words inside it")
    val sets = docs.toDF("text")
      .select(shingleHashes(col("text"), 3).as("h"))
    val pairs = sets.select(col("h").as("a")).crossJoin(sets.select(col("h").as("b")))
    val bad = pairs.select(
        jaccardSorted(col("a"), col("b")).as("fast"),
        jaccard(col("a"), col("b")).as("witness"))
      .filter(!(col("fast") <=> col("witness"))).collect()
    assert(bad.isEmpty, s"jaccardSorted != jaccard on: ${bad.mkString(", ")}")
  }
}
