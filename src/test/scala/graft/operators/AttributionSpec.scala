package graft.operators

import java.sql.Timestamp

import graft.SparkTestBase

/** Multi-touch linear attribution: hand-checked splits, exact credit
  * conservation (remainder to the most recent touch), window pruning,
  * unattributable conversions dropped, determinism.
  */
class AttributionSpec extends SparkTestBase {
  import spark.implicits._

  private def ev(id: Long, day: Int, hour: Int, user: Long, typ: String, v: Double) =
    (id, Timestamp.valueOf(f"2024-01-$day%02d $hour%02d:00:00"), user, typ, v)

  private val events = Seq(
    ev(1, 1, 6, 7, "click", 0.0),
    ev(2, 3, 6, 7, "click", 0.0),
    ev(3, 4, 6, 7, "purchase", 10.0),   // both clicks in the 7d window
    ev(4, 20, 6, 7, "click", 0.0),
    ev(5, 29, 6, 7, "purchase", 1.0),   // click 4 is 9 days prior: outside
    ev(6, 2, 6, 8, "purchase", 5.0)     // user 8: no clicks at all
  ).toDF("event_id", "ts", "user_id", "event_type", "value")

  test("equal split with the remainder on the most recent touch; credits conserve exactly") {
    val out = Attribution.linearAttribution(events, windowDays = 7)
      .collect().map(r => (r.getLong(1), r.getLong(3), r.getLong(5), r.getLong(6)))
    // conversion 3 (10.0 -> 10_000_000 fp) splits over clicks 1 and 2:
    // 5_000_000 each, remainder 0
    out.filter(_._1 == 3L).map(t => t._2 -> t._4).toMap shouldBe
      Map(1L -> 5000000L, 2L -> 5000000L)
    out.filter(_._1 == 3L).map(_._3).toSet shouldBe Set(2L) // n_touches
    // conversion 5: click 4 is outside the 7-day window -> no rows
    out.filter(_._1 == 5L) shouldBe empty
    // user 8's conversion has no touches -> no rows (not a NULL-touch row)
    out.map(_._1).toSet shouldBe Set(3L)
  }

  test("odd split: floor shares + remainder to the latest touch, sum == value exactly") {
    val e3 = Seq(
      ev(1, 1, 6, 7, "click", 0.0),
      ev(2, 2, 6, 7, "click", 0.0),
      ev(3, 3, 6, 7, "click", 0.0),
      ev(4, 4, 6, 7, "purchase", 0.0000100)) // 10 fp units over 3 touches
      .toDF("event_id", "ts", "user_id", "event_type", "value")
    val out = Attribution.linearAttribution(e3, windowDays = 7)
      .collect().map(r => r.getLong(3) -> r.getLong(6)).toMap
    out shouldBe Map(1L -> 3L, 2L -> 3L, 3L -> 4L) // 3+3+4 = 10, remainder on latest
    out.values.sum shouldBe 10L
  }

  test("same-timestamp touches: the remainder owner tie-breaks by event id") {
    val tied = Seq(
      ev(1, 1, 6, 7, "click", 0.0),
      ev(2, 1, 6, 7, "click", 0.0), // same ts as click 1
      ev(3, 2, 6, 7, "purchase", 0.0000050)) // 5 fp units over 2
      .toDF("event_id", "ts", "user_id", "event_type", "value")
    Attribution.linearAttribution(tied, windowDays = 7)
      .collect().map(r => r.getLong(3) -> r.getLong(6)).toMap shouldBe
      Map(1L -> 2L, 2L -> 3L) // higher id wins the remainder on a ts tie
  }

  test("deterministic under repartition") {
    val big = (0L until 500L).map { i =>
      val typ = if (i % 5 == 0) "purchase" else "click"
      ev(i, (i % 28).toInt + 1, (i % 24).toInt, i % 13, typ, (i % 9) * 1.5)
    }.toDF("event_id", "ts", "user_id", "event_type", "value")
    def run(d: org.apache.spark.sql.DataFrame) =
      Attribution.linearAttribution(d)
        .collect().map(r => (r.getLong(1), r.getLong(3), r.getLong(6)))
        .sortBy(t => (t._1, t._2))
    run(big) shouldBe run(big.repartition(17))
  }
}
