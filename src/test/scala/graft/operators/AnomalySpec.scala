package graft.operators

import java.sql.Timestamp

import org.apache.spark.sql.DataFrame

import graft.SparkTestBase

/** Traffic anomaly: hand-computed integer z-test, zero-variance and
  * incomplete-window edges, calendar (not row) windows, loud guards.
  */
class AnomalySpec extends SparkTestBase {
  import spark.implicits._

  /** `n` events on the given day (noon, so all land in one epoch day). */
  private def day(d: Int, n: Int): Seq[(Long, Timestamp)] =
    (1 to n).map(i => (d * 1000L + i, ts(f"2024-01-${d + 1}%02d 12:00:00")))

  private def df(rows: Seq[(Long, Timestamp)]): DataFrame =
    rows.toDF("event_id", "ts")

  private val D0 = 19723L // 2024-01-01

  test("hand-computed verdicts at W=2, k=1: spike flags, calm days don't") {
    // counts 10,10,10,16,10: d2 dev=0 -> 0; d3 dev=12 over zero variance
    // -> 1; d4 dev=-6, var*W^2=36, 36 > 36 false -> 0
    val e = df(day(0, 10) ++ day(1, 10) ++ day(2, 10) ++ day(3, 16) ++ day(4, 10))
    val out = Anomaly.trafficAnomaly(e, windowDays = 2, kNum = 1, kDen = 1)
      .select("day", "n", "w_days", "w_sum", "dev_x_w", "is_anomaly")
      .as[(Long, Long, Long, Long, Long, Option[Int])].collect().toSet
    out shouldBe Set(
      (D0, 10L, 0L, 0L, 20L, None),
      (D0 + 1, 10L, 1L, 10L, 10L, None),
      (D0 + 2, 10L, 2L, 20L, 0L, Some(0)),
      (D0 + 3, 16L, 2L, 20L, 12L, Some(1)),
      (D0 + 4, 10L, 2L, 26L, -6L, Some(0)))
  }

  test("a calendar gap leaves the window incomplete -> NULL verdict") {
    // days 0, 1, 3: day 3's trailing 2-day window covers days 1-2 but
    // only day 1 exists -> w_days = 1, no verdict
    val e = df(day(0, 10) ++ day(1, 10) ++ day(3, 30))
    val out = Anomaly.trafficAnomaly(e, windowDays = 2, kNum = 1, kDen = 1)
      .select("day", "w_days", "is_anomaly")
      .as[(Long, Long, Option[Int])].collect().toSet
    out shouldBe Set(
      (D0, 0L, None), (D0 + 1, 1L, None), (D0 + 3, 1L, None))
  }

  test("rational threshold: k=3/2 passes what k=1 flags") {
    // counts 10,12: day 1 dev=-2? build a mild mover: 10,11,10,13
    val e = df(day(0, 10) ++ day(1, 11) ++ day(2, 10) ++ day(3, 13))
    // d3 window (11,10): sum=21, sumsq=221, dev=26-21=5, varW2=2*221-441=1
    // z^2 = 25 -> k=1 flags (25 > 1), k=3/2 flags too (25*4 > 9)... use
    // d2: window (10,11): sum=21, sumsq=221, dev=20-21=-1, varW2=1:
    // k=1: 1 > 1 false; so drop to k=1/2: 1*4 > 1*1 true
    val strict = Anomaly.trafficAnomaly(e, windowDays = 2, kNum = 1, kDen = 1)
      .filter(s"day = ${D0 + 2}").select("is_anomaly").as[Option[Int]].head()
    strict shouldBe Some(0)
    val loose = Anomaly.trafficAnomaly(e, windowDays = 2, kNum = 1, kDen = 2)
      .filter(s"day = ${D0 + 2}").select("is_anomaly").as[Option[Int]].head()
    loose shouldBe Some(1)
  }

  test("zero variance + zero deviation is calm, not anomalous") {
    val e = df(day(0, 10) ++ day(1, 10) ++ day(2, 10))
    val out = Anomaly.trafficAnomaly(e, windowDays = 2, kNum = 1, kDen = 1)
      .filter(s"day = ${D0 + 2}").select("is_anomaly").as[Option[Int]].head()
    out shouldBe Some(0)
  }

  test("incremental counts sum-merge: increment == one-shot, late days re-open") {
    val head = day(0, 10) ++ day(1, 10) ++ day(2, 10)
    // the shard carries new days AND a late day-0 straggler — the merge
    // must re-open day 0, not just append
    val tail = day(3, 16) ++ day(4, 10) ++ Seq((9999L, ts("2024-01-01 23:00:00")))
    val oneShot = Anomaly.trafficAnomaly(df(head ++ tail),
      windowDays = 2, kNum = 1, kDen = 1).collect().toSet
    Anomaly.trafficAnomalyFromCounts(
      Anomaly.incrementDailyCounts(Anomaly.dailyCounts(df(head)), df(tail)),
      windowDays = 2, kNum = 1, kDen = 1)
      .collect().toSet shouldBe oneShot
    // day 0 really did re-open
    Anomaly.incrementDailyCounts(Anomaly.dailyCounts(df(head)), df(tail))
      .filter(s"day = $D0").select("n").as[Long].head() shouldBe 11L
  }

  test("pre-1970 timestamps bucket with FLOOR division, and day 0 is one day wide") {
    // 1969-12-31 18:00 UTC = -6h = day -1 under floor (truncation toward
    // zero would wrongly fold it into day 0, making day 0 two days wide)
    val e = Seq(
      (1L, ts("1969-12-31 18:00:00")),
      (2L, ts("1969-12-31 23:00:00")),
      (3L, ts("1970-01-01 06:00:00"))
    ).toDF("event_id", "ts")
    Anomaly.dailyCounts(e).as[(Long, Long)].collect().toSet shouldBe
      Set((-1L, 2L), (0L, 1L))
  }

  test("NULL ts raises; out-of-range window and k rejected") {
    val e = Seq((1L, Option.empty[Timestamp])).toDF("event_id", "ts")
    an[Exception] should be thrownBy
      Anomaly.trafficAnomaly(e, windowDays = 2).collect()
    an[IllegalArgumentException] should be thrownBy
      Anomaly.trafficAnomaly(df(day(0, 1)), windowDays = 0)
    an[IllegalArgumentException] should be thrownBy
      Anomaly.trafficAnomaly(df(day(0, 1)), windowDays = 366)
    an[IllegalArgumentException] should be thrownBy
      Anomaly.trafficAnomaly(df(day(0, 1)), kNum = 0)
    an[IllegalArgumentException] should be thrownBy
      Anomaly.trafficAnomaly(df(day(0, 1)), kDen = 1001)
  }
}
