package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkTestBase
import graft.functions.TextFunctions

/** Count-min sketch: the upper-bound guarantee, exact shard-merge, and the
  * bounded-state shape that makes it usable at corpus scale.
  */
class FrequencySketchSpec extends SparkTestBase {
  import spark.implicits._

  private def occ = spark.read
    .parquet("/root/testdata/sf0.001/documents.parquet")
    .select(col("source"), explode(TextFunctions.tokens(col("text"))).as("token"))

  test("estimate is an upper bound on the true frequency for EVERY token") {
    val sk = FrequencySketch.sketch(occ, "token")
    val exact = occ.groupBy("token").agg(count(lit(1)).as("tf"))
    val est = FrequencySketch.estimate(sk, exact, "token")
      .select("token", "tf", "cms_est").as[(String, Long, Long)].collect()
    est.length should be > 20
    est.foreach { case (tok, tf, e) =>
      withClue(s"token $tok: est $e < tf $tf — CMS must never undercount: ")(
        e should be >= tf)
    }
    // heavy hitters dominate their cells: the top token is near-exact
    // (within the colliding-mass bound N/Width per row)
    val n = occ.count()
    val worst = est.map { case (_, tf, e) => e - tf }.max
    worst should be <= (4L * n / FrequencySketch.Width)
  }

  test("merge of per-source shard sketches equals the single-pass sketch EXACTLY") {
    val whole = FrequencySketch.sketch(occ, "token")
      .select("r", "idx", "cnt").as[(Int, Long, Long)].collect().toSet
    val merged = FrequencySketch.merge(FrequencySketch.sketch(occ, "token", Seq("source")))
      .select("r", "idx", "cnt").as[(Int, Long, Long)].collect().toSet
    merged shouldBe whole
  }

  test("sketch state is bounded by depth x width regardless of input size") {
    val sk = FrequencySketch.sketch(occ, "token")
    sk.count() should be <= (FrequencySketch.Depth.toLong * FrequencySketch.Width)
    // and total mass per row equals total occurrences (counts only add)
    val n = occ.count()
    val perRow = sk.groupBy("r").agg(sum("cnt").as("mass"))
      .select("mass").as[Long].collect().toSeq
    perRow shouldBe Seq.fill(FrequencySketch.Depth)(n)
  }

  test("NULL values are excluded; absent candidates estimate from cell mass only") {
    val df = Seq(Some("a"), Some("a"), Some("b"), None)
      .toDF("token")
    val sk = FrequencySketch.sketch(df, "token")
    sk.agg(sum("cnt")).as[Long].head() shouldBe 3L * FrequencySketch.Depth
    // a token that never occurred: estimate is >= 0 and bounded by the
    // heaviest colliding cell (here: tiny corpus, so usually 0)
    val est = FrequencySketch.estimate(sk, Seq("zzz-never").toDF("token"), "token")
      .select("cms_est").as[Long].head()
    est should be >= 0L
  }
}
