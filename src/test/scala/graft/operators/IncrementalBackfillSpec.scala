package graft.operators

import org.apache.spark.sql.functions._

import graft.{InMemoryStorage, SparkTestBase, TestFetcher, TestWriter}
import graft.domain.{BackfillConfig, EventRaw}
import graft.sources.ProdWriter

/** Incremental backfill must be indistinguishable from a full recompute:
  * day partitions are independent (each depends only on events in
  * [day-30d, day] plus the global user universe), so replacing only the new
  * day partitions yields the same table a full overwrite would.
  */
class IncrementalBackfillSpec extends SparkTestBase {
  import spark.implicits._

  private val events = Seq(
    EventRaw("u1", "click", ts("2024-01-01 10:00:00")),
    EventRaw("u1", "purchase", ts("2024-01-04 14:00:00")),
    EventRaw("u2", "view", ts("2024-01-02 09:00:00")),
    EventRaw("u2", "click", ts("2024-01-08 18:00:00")),
    EventRaw("u3", "click", ts("2024-01-09 08:00:00")))

  private def canon(df: org.apache.spark.sql.DataFrame): Seq[String] =
    df.select(col("user_id"), col("day"), col("event_count_7d"),
        col("event_count_30d"), col("last_event_days_ago"), col("event_type_counts"))
      .collect().map(_.mkString("|")).sorted.toSeq

  test("real catalog: dynamic partition overwrite equals full recompute, old partitions untouched") {
    val table = s"graft_test_incr_${System.nanoTime()}"
    val eventsDf = events.toDF()
    // days 1-5 via full overwrite, then 6-10 incrementally
    ProdWriter.insertOverwriteTable(
      BackfillPipeline.transform(eventsDf, "2024-01-01", "2024-01-05"), table, Seq("day"))
    val before = spark.table(table).filter(col("day") <= "2024-01-05")
    val beforeRows = canon(before)

    ProdWriter.overwritePartitions(
      BackfillPipeline.transform(eventsDf, "2024-01-06", "2024-01-10"), table, Seq("day"))

    val full = BackfillPipeline.transform(eventsDf, "2024-01-01", "2024-01-10")
    canon(spark.table(table)) shouldBe canon(full)
    // the untouched day partitions are byte-for-byte what the first write left
    canon(spark.table(table).filter(col("day") <= "2024-01-05")) shouldBe beforeRows
  }

  test("runIncremental through the platform traits chains onto an existing table") {
    val storage = new InMemoryStorage
    val fetcher = new TestFetcher(storage)
    val writer = new TestWriter(storage)
    storage.write("events_raw", events.toDF(), "overwrite")

    BackfillPipeline.run(spark, fetcher, writer,
      BackfillConfig("events_raw", "features_daily", "2024-01-01", "2024-01-05"))
    BackfillPipeline.runIncremental(spark, fetcher, writer,
      BackfillConfig("events_raw", "features_daily", "2024-01-06", "2024-01-10"))

    storage.rows("features_daily") should have size 30 // 3 users x 10 days
    val full = BackfillPipeline.transform(events.toDF(), "2024-01-01", "2024-01-10")
    canon(storage.read(spark, "features_daily")) shouldBe canon(full)
  }

  test("incremental write into an absent table falls back to a full overwrite") {
    val storage = new InMemoryStorage
    val writer = new TestWriter(storage)
    BackfillPipeline.runIncremental(spark, new TestFetcher(storage) {
      storage.write("events_raw", events.toDF(), "overwrite")
    }, writer, BackfillConfig("events_raw", "features_daily", "2024-01-01", "2024-01-03"))
    storage.rows("features_daily") should have size 9
  }
}
