package graft.functions

import org.apache.spark.sql.functions._
import org.scalacheck.Gen

import graft.SparkTestBase

/** The native char-window kernel must be bit-identical to the composed
  * HOF it replaces (QualityClassifierSpec pins the fixed adversarial
  * cases; this spec FUZZES mixed-alphabet strings) and to a driver-side
  * window mirror over [[PolyHashImpl]].
  */
class CharNgramHashesSpec extends SparkTestBase {
  import spark.implicits._

  private val mixedGen: Gen[String] = {
    val alphabet = Gen.oneOf(
      Gen.choose(32.toChar, 126.toChar),               // ASCII incl. delims
      Gen.oneOf('à', 'é', 'ß', 'Ö', '中', '語', '\t'), // 2-3 byte UTF-8
      Gen.const('\uD83C'), Gen.const('\uDF89'))        // surrogate halves
    Gen.choose(0, 60).flatMap(n => Gen.listOfN(n, alphabet).map(_.mkString))
  }

  test("fuzz: native == composed HOF on mixed-alphabet strings, all n/buckets") {
    val strings = (1 to 60).map(i => sample(mixedGen, 1300L + i)) ++
      Seq("", "ab", "a b c d", "ÉÉÉ", "🎉🎉", "x" * 300)
    for (n <- Seq(2, 3, 5); buckets <- Seq(7, 4096)) {
      val df = strings.toDF("s").select(col("s"),
        coalesce(CharNgramHashBuckets.charNgramHashBuckets(col("s"), n, buckets),
          expr("CAST(array() AS array<bigint>)")).as("native"),
        graft.operators.QualityClassifier.charNgramBucketsHof(col("s"), n, buckets)
          .as("hof"))
      val bad = df.filter(!(col("native") <=> col("hof"))).collect()
      assert(bad.isEmpty,
        s"n=$n buckets=$buckets native != HOF on: ${bad.take(3).mkString(", ")}")
    }
  }

  test("driver-side window mirror pins the normalized-stream semantics") {
    // norm("The cat!!") = "the cat"; windows: "the", "he ", "e c", " ca", "cat"
    val got = Seq("The cat!!").toDF("s")
      .select(CharNgramHashBuckets.charNgramHashBuckets(col("s"), 3, 1000000007))
      .head().getSeq[Long](0)
    val norm = "the cat"
    val want = (0 to norm.length - 3).map(i =>
      PolyHashImpl.hash(norm.substring(i, i + 3).getBytes("UTF-8")))
    got shouldBe want
  }

  test("null in, null out (callers coalesce to empty)") {
    Seq(Option.empty[String]).toDF("s")
      .select(CharNgramHashBuckets.charNgramHashBuckets(col("s"), 3, 64))
      .head().isNullAt(0) shouldBe true
  }
}
