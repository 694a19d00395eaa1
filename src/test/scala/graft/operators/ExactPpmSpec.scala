package graft.operators

import org.apache.spark.sql.functions._
import org.scalacheck.Gen

import graft.SparkTestBase

/** ExactPpm must equal BigInt floor division at ANY magnitude — including
  * the denominators past ~2e6 where Spark's scale-6 HALF_UP decimal
  * division rounds the quotient up before floor() sees it.
  */
class ExactPpmSpec extends SparkTestBase {
  import spark.implicits._

  private def check(pairs: Seq[(Long, Long)]): Unit = {
    val got = pairs.toDF("num", "den")
      .select(col("num"), col("den"), ExactPpm.ppm(col("num"), col("den")).as("p"))
      .collect()
    got.foreach { r =>
      val (num, den) = (r.getLong(0), r.getLong(1))
      val want =
        if (den <= 0L) null
        else Long.box((BigInt(num) * 1000000 / BigInt(den)).toLong)
      withClue(s"ppm($num, $den): ") {
        (if (r.isNullAt(2)) null else Long.box(r.getLong(2))) shouldBe want
      }
    }
  }

  test("fuzz: matches BigInt floor division across magnitudes; den<=0 is NULL") {
    val gen = for {
      num <- Gen.choose(0L, 4_000_000_000_000L)
      den <- Gen.oneOf(Gen.choose(1L, 1000L), Gen.choose(1L, 40_000_000_000L))
    } yield (num, den.max(1L))
    check((1 to 300).map(i => sample(gen, 777L + i)) ++
      Seq((0L, 1L), (1L, 1L), (5L, 0L), (7L, -3L)))
  }

  test("a ppm that cannot fit BIGINT fails loud, never silently wraps") {
    val e = intercept[Exception] {
      Seq((Long.MaxValue / 2, 3L)).toDF("num", "den")
        .select(ExactPpm.ppm(col("num"), col("den"))).collect()
    }
    (e.getMessage + Option(e.getCause).map(_.getMessage).getOrElse("")) should
      include("CAST_OVERFLOW")
  }

  test("regression: the HALF_UP trap the shared helper exists for") {
    // den coprime to 1e6, remainder den-1: true quotient q + (den-1)/den,
    // which scale-6 HALF_UP rounds to q+1 before floor — ExactPpm must
    // return q. Construct num = (den-1) * inverse(1e6) mod den, plus a
    // full-quotient offset so the value is realistic.
    val den = 2000003L // prime, coprime to 1e6
    val inv = BigInt(1000000).modInverse(BigInt(den))
    val num = ((BigInt(den - 1) * inv) % den + den * 3).toLong
    val truth = (BigInt(num) * 1000000 / den).toLong
    ((BigInt(num) * 1000000) % den).toLong shouldBe den - 1 // trap armed
    check(Seq((num, den)))
    // and the OLD form provably trips here (the reason this spec exists)
    val old = Seq((num, den)).toDF("num", "den")
      .select(floor(col("num").cast("decimal(38,0)") * lit(1000000L) /
        col("den").cast("decimal(38,0)")).cast("long"))
      .head().getLong(0)
    old shouldBe (truth + 1) // HALF_UP pushed it over
  }
}
