package graft.functions

import org.apache.spark.sql.functions.{col, expr}

import graft.SparkTestBase

/** The driver-side ln mirror must be bit-identical to the generated SQL
  * steps (it embeds constants into both engines' texts), and the series
  * must track libm within its documented truncation.
  */
class PinnedMathSpec extends SparkTestBase {
  import spark.implicits._

  private def viaSteps(xs: Seq[Long]): Map[Long, Long] = {
    val df = xs.toDF("x")
    PinnedMath.lnFpSteps("p", "x")
      .foldLeft(df) { case (d, (a, e)) => d.withColumn(a, expr(e)) }
      .select(col("x"), col("p_lnfp")).as[(Long, Long)].collect().toMap
  }

  test("driver mirror == generated steps, bit for bit, across the domain") {
    val xs = Seq(1L, 2L, 3L, 5L, 7L, 10L, 63L, 64L, 65L, 1000L, 999983L,
      (1L << 31) - 1, 1L << 31, (1L << 52) + 12345L, 1L << 61, (1L << 61) + 7L,
      1L << 62) ++ (1 to 50).map(i => i * 37L + 11L)
    val sql = viaSteps(xs)
    xs.foreach { x =>
      withClue(s"x=$x:")(PinnedMath.lnFp(x) shouldBe sql(x))
    }
  }

  test("series tracks libm ln within truncation; fixed point round-trips") {
    (Seq(1L, 2L, 10L, 12345L, 1L << 40) ++ (1 to 20).map(i => i * 7919L)).foreach { x =>
      val got = PinnedMath.lnFp(x).toDouble / PinnedMath.FpScale
      withClue(s"x=$x:")(got shouldBe math.log(x.toDouble) +- 2e-8)
    }
    PinnedMath.lnFp(1L) shouldBe 0L
    an[IllegalArgumentException] should be thrownBy PinnedMath.lnFp(0L)
    // the embedded 2^61 offset is the mirror's own value
    PinnedMath.LnFp2Pow61 shouldBe PinnedMath.lnFp(1L << 61)
  }
}
