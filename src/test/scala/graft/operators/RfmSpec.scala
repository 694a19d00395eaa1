package graft.operators

import java.sql.Timestamp

import graft.SparkTestBase

/** RFM segmentation: hand-computed quantile scores, tie stability,
  * monetary-type gating, recency inversion, broadcast/shuffle parity.
  */
class RfmSpec extends SparkTestBase {
  import spark.implicits._

  // four users; anchor = u1's Jan 9 view (the corpus max ts).
  // metrics (recency_days, frequency, monetary_fp):
  //   u1 (0, 2, 2_000_000)  u2 (1, 2, 5_500_000)
  //   u3 (4, 1, 0)          u4 (5, 4, 1_000_000)
  private def events = Seq(
    (1L, 1L, ts("2024-01-01 12:00:00"), "purchase", 2.0),
    (2L, 1L, ts("2024-01-09 12:00:00"), "view", 9.9),     // non-monetary value ignored
    (3L, 2L, ts("2024-01-08 11:00:00"), "click", 0.0),
    (4L, 2L, ts("2024-01-08 12:00:00"), "purchase", 5.5),
    (5L, 3L, ts("2024-01-05 12:00:00"), "view", 0.0),
    (6L, 4L, ts("2024-01-01 12:00:00"), "purchase", 1.0),
    (7L, 4L, ts("2024-01-02 12:00:00"), "view", 0.0),
    (8L, 4L, ts("2024-01-03 12:00:00"), "click", 0.0),
    (9L, 4L, ts("2024-01-04 12:00:00"), "view", 0.0)
  ).toDF("event_id", "user_id", "ts", "event_type", "value")

  test("hand-computed scores at nBuckets = 2: value-based ceil(cum·n/N)") {
    val out = Rfm.rfmSegments(events, nBuckets = 2)
      .select("user_id", "recency_days", "frequency", "monetary_fp",
        "r_score", "f_score", "m_score", "rfm_cell")
      .as[(Long, Long, Long, Long, Long, Long, Long, Long)].collect().toSet
    out shouldBe Set(
      (1L, 0L, 2L, 2000000L, 2L, 2L, 2L, 222L),
      (2L, 1L, 2L, 5500000L, 2L, 2L, 2L, 222L),
      (3L, 4L, 1L, 0L, 1L, 1L, 1L, 111L),
      (4L, 5L, 4L, 1000000L, 1L, 2L, 1L, 121L))
  }

  test("ties share a bucket: identical metrics -> identical scores") {
    val e = Seq(
      (1L, 1L, ts("2024-01-09 12:00:00"), "purchase", 3.0),
      (2L, 2L, ts("2024-01-09 12:00:00"), "purchase", 3.0),
      (3L, 3L, ts("2024-01-01 12:00:00"), "view", 0.0)
    ).toDF("event_id", "user_id", "ts", "event_type", "value")
    val out = Rfm.rfmSegments(e, nBuckets = 2)
      .select("user_id", "rfm_cell").as[(Long, Long)].collect().toMap
    out(1L) shouldBe out(2L) // bit-identical cells, never split by ntile
    out(3L) should not be out(1L)
  }

  test("monetary counts only the monetaryType; knob switches the type") {
    val base = Rfm.rfmSegments(events, nBuckets = 2)
      .filter("user_id = 1").select("monetary_fp").as[Long].head()
    base shouldBe 2000000L
    val views = Rfm.rfmSegments(events, nBuckets = 2, monetaryType = "view")
      .filter("user_id = 1").select("monetary_fp").as[Long].head()
    views shouldBe 9900000L // the Jan 9 view's 9.9
  }

  test("recency inverts: the most recent user scores nBuckets on R") {
    val out = Rfm.rfmSegments(events, nBuckets = 2)
      .select("user_id", "r_score").as[(Long, Long)].collect().toMap
    out(1L) shouldBe 2L // recency 0
    out(4L) shouldBe 1L // recency 5
  }

  test("broadcastRanks = true is bit-identical to the default shuffle-hash monetary plan") {
    val a = Rfm.rfmSegments(events, nBuckets = 3)
      .orderBy("user_id").collect().toSeq
    val b = Rfm.rfmSegments(events, nBuckets = 3, broadcastRanks = true)
      .orderBy("user_id").collect().toSeq
    a shouldBe b
  }

  test("NULL value on a monetary event keeps the user (monetary_fp 0, not a dropped row)") {
    val e = Seq(
      (1L, 1L, ts("2024-01-09 12:00:00"), "purchase", Option.empty[Double]),
      (2L, 2L, ts("2024-01-08 12:00:00"), "purchase", Option(3.0)),
      (3L, 3L, ts("2024-01-01 12:00:00"), "view", Option(0.0))
    ).toDF("event_id", "user_id", "ts", "event_type", "value")
    val out = Rfm.rfmSegments(e, nBuckets = 2)
      .select("user_id", "monetary_fp").as[(Long, Long)].collect().toMap
    out.keySet shouldBe Set(1L, 2L, 3L) // one row per user, nobody vanishes
    out(1L) shouldBe 0L
    out(2L) shouldBe 3000000L
  }

  test("incremental state folds order-free: increment == one-shot, either shard order") {
    import org.apache.spark.sql.functions.col
    val head = events.filter(col("event_id") <= 4)
    val tail = events.filter(col("event_id") > 4)
    val oneShot = Rfm.rfmSegments(events, nBuckets = 2)
      .collect().toSet
    Rfm.rfmFromState(
      Rfm.incrementRfm(Rfm.rfmState(head), tail), nBuckets = 2)
      .collect().toSet shouldBe oneShot
    // max/sum/sum are order-free monoids — the reversed fold is identical
    Rfm.rfmFromState(
      Rfm.incrementRfm(Rfm.rfmState(tail), head), nBuckets = 2)
      .collect().toSet shouldBe oneShot
  }

  test("NULL ts raises; nBuckets outside [2, 9] rejected") {
    val e = Seq((1L, 1L, Option.empty[Timestamp], Option("view"), Option(1.0)))
      .toDF("event_id", "user_id", "ts", "event_type", "value")
    an[Exception] should be thrownBy
      Rfm.rfmSegments(e, nBuckets = 2).collect()
    an[IllegalArgumentException] should be thrownBy
      Rfm.rfmSegments(events, nBuckets = 1)
    an[IllegalArgumentException] should be thrownBy
      Rfm.rfmSegments(events, nBuckets = 10)
  }
}
