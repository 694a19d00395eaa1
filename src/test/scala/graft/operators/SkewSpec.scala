package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkTestBase

/** Two-phase distinct must be result-identical to single-phase
  * countDistinct — including null handling and keys whose values are all
  * null (countDistinct yields 0, and the key must still appear).
  */
class SkewSpec extends SparkTestBase {
  import spark.implicits._

  test("distinctCountTwoPhase == countDistinct, nulls ignored") {
    val df = Seq(
      ("click", Some("u1")), ("click", Some("u1")), ("click", Some("u2")),
      ("view", Some("u1")), ("view", None),
      ("error", None)).toDF("event_type", "user_id")

    val twoPhase = Skew.distinctCountTwoPhase(df, Seq(col("event_type")), col("user_id"), "n")
      .as[(String, Long)].collect().toMap
    val singlePhase = df.groupBy("event_type").agg(countDistinct(col("user_id")).as("n"))
      .as[(String, Long)].collect().toMap

    twoPhase shouldBe singlePhase
    twoPhase("click") shouldBe 2L
    twoPhase("view") shouldBe 1L
    twoPhase("error") shouldBe 0L // all-null key survives with 0, like countDistinct
  }
}
