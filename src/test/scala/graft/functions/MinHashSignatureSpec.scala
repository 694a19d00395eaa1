package graft.functions

import org.apache.spark.sql.functions._
import org.scalacheck.Gen

import graft.SparkTestBase
import graft.functions.TextFunctions.{minhashSignature, minhashSignatureHof}

/** The native one-pass MinHash signature must equal the composed
  * k-array_min-chains form element-for-element (pure integer math, same
  * pinned hash family), including the empty-set -> all-null-signature edge.
  */
class MinHashSignatureSpec extends SparkTestBase {
  import spark.implicits._

  test("native == composed on random hash sets") {
    val setGen = Gen.listOfN(40, Gen.chooseNum(0L, TextFunctions.HashMod - 1))
    val sets = (1 to 25).map(i => sample(setGen, 42L + i)) ++
      Seq(List(0L), List(TextFunctions.HashMod - 1))
    val df = sets.toDF("hashes").select(
      minhashSignature(col("hashes")).as("native"),
      minhashSignatureHof(col("hashes")).as("hof"))
    df.filter(!(col("native") <=> col("hof"))).collect() shouldBe empty
  }

  test("null elements are skipped like the witness's array_min") {
    val df = Seq(1).toDF("i").select(
      minhashSignature(array(lit(7L), lit(null).cast("bigint"), lit(11L))).as("native"),
      minhashSignatureHof(array(lit(7L), lit(null).cast("bigint"), lit(11L))).as("hof"))
    df.filter(!(col("native") <=> col("hof"))).collect() shouldBe empty
    // all-null elements behave like the empty set
    Seq(1).toDF("i")
      .select(minhashSignature(array(lit(null).cast("bigint"))))
      .head().getSeq[Any](0).forall(_ == null) shouldBe true
  }

  test("empty set yields a k-length all-null signature; null propagates") {
    val row = Seq(Seq.empty[Long]).toDF("hashes")
      .select(minhashSignature(col("hashes"))).head().getSeq[Any](0)
    row should have size TextFunctions.MinhashK.toLong
    row.forall(_ == null) shouldBe true
    Seq(Option.empty[Seq[Long]]).toDF("hashes")
      .select(minhashSignature(col("hashes"))).head().isNullAt(0) shouldBe true
  }
}
