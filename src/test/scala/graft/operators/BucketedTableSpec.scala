package graft.operators

import org.apache.spark.sql.execution.ExplainMode
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.SparkTestBase
import graft.domain.FeaturesDaily
import graft.sources.ProdWriter

/** Bucketing the features table by user_id must let per-user consumers
  * (the online-sync window, the as-of join's key clustering) scan without
  * an exchange — the plan-level payoff the bucketed writer exists for.
  */
class BucketedTableSpec extends SparkTestBase {
  import spark.implicits._

  private def explain(df: org.apache.spark.sql.DataFrame): String =
    df.queryExecution.explainString(ExplainMode.fromString("formatted"))

  test("per-user window over a bucketed features table plans without an exchange") {
    val table = s"graft_test_bucketed_${System.nanoTime()}"
    val plainTable = s"${table}_plain"
    val feats = Seq(
      FeaturesDaily("u1", d("2024-01-01"), Some(1L), Some(1L), Some(0), Some("1")),
      FeaturesDaily("u1", d("2024-01-02"), Some(2L), Some(2L), Some(0), Some("1")),
      FeaturesDaily("u2", d("2024-01-01"), Some(3L), Some(3L), Some(0), Some("1"))).toDF()
    try {
      ProdWriter.insertOverwriteBucketedTable(feats, table, numBuckets = 4, bucketCol = "user_id")

      val w = Window.partitionBy(col("user_id")).orderBy(col("day").desc)
      val latest = spark.table(table)
        .withColumn("__rank", row_number().over(w)).filter(col("__rank") === 1)

      val plan = explain(latest)
      plan should include("SelectedBucketsCount")     // bucketed scan in effect
      plan should not include "Exchange"              // bucket layout satisfies the window

      // and the unbucketed twin DOES need the exchange (the guard guards something)
      ProdWriter.insertOverwriteTable(feats, plainTable)
      val plainPlan = explain(spark.table(plainTable)
        .withColumn("__rank", row_number().over(w)).filter(col("__rank") === 1))
      plainPlan should include("Exchange")

      // rows are identical either way
      val a = latest.drop("__rank").as[FeaturesDaily].collect().sortBy(_.user_id).toSeq
      a.map(_.user_id) shouldBe Seq("u1", "u2")
      a.head.day shouldBe d("2024-01-02")
    } finally {
      sql(s"DROP TABLE IF EXISTS $table")
      ProdWriter.dropTable(spark, plainTable) // plain path is a versioned VIEW
    }
  }

  test("partition-level insert preserves an existing bucketed layout") {
    val table = s"graft_test_bkt_incr_${System.nanoTime()}"
    def feats(day: String, c: Long) =
      Seq(FeaturesDaily("u1", d(day), Some(c), Some(c), Some(0), Some("1")),
        FeaturesDaily("u2", d(day), Some(c), Some(c), Some(0), Some("1"))).toDF()
    try {
      ProdWriter.insertOverwriteBucketedTable(
        feats("2024-01-01", 1L), table, numBuckets = 4, bucketCol = "user_id",
        partitionBy = Seq("day"))
      ProdWriter.overwritePartitions(feats("2024-01-02", 2L), table, Seq("day"))

      spark.table(table).count() shouldBe 4
      // the scan is still bucketed after the incremental insert
      explain(spark.table(table).groupBy(col("user_id")).count()) should
        include("SelectedBucketsCount")
    } finally sql(s"DROP TABLE IF EXISTS $table")
  }

  test("sessionization over a user_id-bucketed events table plans without an exchange") {
    val table = s"graft_test_bkt_events_${System.nanoTime()}"
    try {
      val events = Seq(
        (1L, 1L, ts("2024-01-01 10:00:00"), "view"),
        (2L, 1L, ts("2024-01-01 10:05:00"), "click"),
        (3L, 2L, ts("2024-01-01 09:00:00"), "signup")
      ).toDF("event_id", "user_id", "ts", "event_type")
      ProdWriter.insertOverwriteBucketedTable(events, table, numBuckets = 4, bucketCol = "user_id")
      val sessions = Sessionize.sessions(spark.table(table), gapSeconds = 600L)
      val plan = explain(sessions)
      plan should include("SelectedBucketsCount")
      // the lag window, running session count, and rollup all cluster on
      // user_id — the bucket layout feeds every one of them exchange-free
      plan should not include "Exchange"
      sessions.select("user_id", "session_seq", "n_events")
        .as[(Long, Long, Long)].collect().toSet shouldBe
        Set((1L, 1L, 2L), (2L, 1L, 1L))
    } finally sql(s"DROP TABLE IF EXISTS $table")
  }
}
