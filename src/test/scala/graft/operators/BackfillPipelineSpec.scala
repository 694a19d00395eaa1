package graft.operators

import graft.SparkTestBase
import graft.domain.{EventRaw, FeaturesDaily}

/** Parity port of the reference backfill scenarios
  * (reference: TestBackfillPipeline.scala:19-236).
  */
class BackfillPipelineSpec extends SparkTestBase {
  import spark.implicits._

  private def run(events: Seq[EventRaw], start: String, end: String): Map[(String, String), FeaturesDaily] =
    BackfillPipeline.transform(events.toDF(), start, end)
      .as[FeaturesDaily].collect()
      .map(f => (f.user_id, f.day.toString) -> f).toMap

  test("every day in range gets a row, including event-free gap days") {
    // user1 events on Jan 1 / 3 / 5, range 01..05 => 5 rows (gap days 2, 4)
    val events = Seq(
      EventRaw("user1", "click", ts("2024-01-01 10:00:00")),
      EventRaw("user1", "purchase", ts("2024-01-03 14:30:00")),
      EventRaw("user1", "click", ts("2024-01-05 16:45:00")))
    val out = run(events, "2024-01-01", "2024-01-05")

    out.size shouldBe 5
    out.keys.map(_._2).toSeq.sorted shouldBe
      Seq("2024-01-01", "2024-01-02", "2024-01-03", "2024-01-04", "2024-01-05")

    // gap day 2: one event (day 1) in both windows, 1 day ago, 1 type
    val day2 = out(("user1", "2024-01-02"))
    day2.event_count_7d shouldBe Some(1L)
    day2.event_count_30d shouldBe Some(1L)
    day2.last_event_days_ago shouldBe Some(1)
    day2.event_type_counts shouldBe Some("1")

    // day 3: events on days 1 and 3 => 2 events, 0 days ago, 2 types
    val day3 = out(("user1", "2024-01-03"))
    day3.event_count_7d shouldBe Some(2L)
    day3.last_event_days_ago shouldBe Some(0)
    day3.event_type_counts shouldBe Some("2")

    // day 5: all 3 events within 7d
    out(("user1", "2024-01-05")).event_count_7d shouldBe Some(3L)
  }

  test("zero-event semantics: counts 0, recency null, types \"0\"") {
    // user2 has an event only on day 5; user2's day-1..4 rows exist with
    // no events in window until day 5
    val events = Seq(
      EventRaw("user1", "click", ts("2024-01-01 10:00:00")),
      EventRaw("user2", "view", ts("2024-01-05 09:00:00")))
    val out = run(events, "2024-01-01", "2024-01-05")

    out.size shouldBe 10
    val u2d2 = out(("user2", "2024-01-02"))
    u2d2.event_count_7d shouldBe Some(0L)
    u2d2.event_count_30d shouldBe Some(0L)
    u2d2.last_event_days_ago shouldBe None
    u2d2.event_type_counts shouldBe Some("0")
  }

  test("multi-user isolation: one user's events never leak into another's counts") {
    val events = Seq(
      EventRaw("user1", "click", ts("2024-01-02 10:00:00")),
      EventRaw("user1", "click", ts("2024-01-02 11:00:00")),
      EventRaw("user2", "purchase", ts("2024-01-02 12:00:00")))
    val out = run(events, "2024-01-01", "2024-01-03")

    out(("user1", "2024-01-02")).event_count_7d shouldBe Some(2L)
    out(("user2", "2024-01-02")).event_count_7d shouldBe Some(1L)
    out(("user1", "2024-01-02")).event_type_counts shouldBe Some("1")
    out(("user2", "2024-01-02")).event_type_counts shouldBe Some("1")
  }

  test("rolling 7d window boundary: a 7-days-ago event is IN, 8-days-ago is OUT") {
    // events on Jan 1, 5, 8; range 01-01..01-10
    // (reference boundary math: TestBackfillPipeline.scala:181-236)
    val events = Seq(
      EventRaw("user1", "click", ts("2024-01-01 08:00:00")),
      EventRaw("user1", "view", ts("2024-01-05 08:00:00")),
      EventRaw("user1", "purchase", ts("2024-01-08 08:00:00")))
    val out = run(events, "2024-01-01", "2024-01-10")

    // day 8: Jan 1 is exactly 7 days ago => all 3 in the 7d window
    out(("user1", "2024-01-08")).event_count_7d shouldBe Some(3L)
    // day 9: Jan 1 is 8 days ago => out; Jan 5 + Jan 8 remain
    out(("user1", "2024-01-09")).event_count_7d shouldBe Some(2L)
    // day 10: same two still within 7d (5 and 2 days ago)
    out(("user1", "2024-01-10")).event_count_7d shouldBe Some(2L)
    // 30d count keeps everything
    out(("user1", "2024-01-10")).event_count_30d shouldBe Some(3L)
    out(("user1", "2024-01-10")).last_event_days_ago shouldBe Some(2)
  }

  test("range endpoints are inclusive on both sides") {
    val events = Seq(EventRaw("user1", "click", ts("2024-01-03 10:00:00")))
    val out = run(events, "2024-01-02", "2024-01-04")
    out.keys.map(_._2).toSeq.sorted shouldBe
      Seq("2024-01-02", "2024-01-03", "2024-01-04")
  }
}
