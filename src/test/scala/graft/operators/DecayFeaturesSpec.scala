package graft.operators

import java.sql.Timestamp

import graft.SparkTestBase

/** Integer-exact EWMA: hand-computed fold, decay-knob edge cases,
  * recency dominance, loud NULL timestamps, partition determinism.
  */
class DecayFeaturesSpec extends SparkTestBase {
  import spark.implicits._

  private val events = Seq(
    (1L, ts("2024-01-01 00:00:00"), 7L, "e", 1.0),
    (2L, ts("2024-01-02 00:00:00"), 7L, "e", 2.0),
    (3L, ts("2024-01-03 00:00:00"), 7L, "e", 0.5)
  ).toDF("event_id", "ts", "user_id", "event_type", "value")

  test("hand-computed fold at decay 0.85") {
    // s1 = 1e6; s2 = 850000 + 2e6 = 2850000; s3 = 2422500 + 500000 = 2922500
    val out = DecayFeatures.ewma(events).collect()
    out.length shouldBe 1
    (out.head.getLong(1), out.head.getLong(2)) shouldBe ((3L, 2922500L))
  }

  test("decay 1e6 is the plain sum; decay 0 keeps only the last event") {
    DecayFeatures.ewma(events, decayPpm = 1000000L)
      .head().getLong(2) shouldBe 3500000L
    DecayFeatures.ewma(events, decayPpm = 0L)
      .head().getLong(2) shouldBe 500000L
  }

  test("recency dominance: the same values in reverse time order score differently") {
    val reversed = Seq(
      (1L, ts("2024-01-01 00:00:00"), 7L, "e", 0.5),
      (2L, ts("2024-01-02 00:00:00"), 7L, "e", 2.0),
      (3L, ts("2024-01-03 00:00:00"), 7L, "e", 1.0)
    ).toDF("event_id", "ts", "user_id", "event_type", "value")
    val fwd = DecayFeatures.ewma(events).head().getLong(2)
    val rev = DecayFeatures.ewma(reversed).head().getLong(2)
    rev should not be fwd
    // forward ends on the small value, reverse on the large one
    rev should be > fwd
  }

  test("same-timestamp events break ties by event id (deterministic)") {
    val tied = Seq(
      (2L, ts("2024-01-01 00:00:00"), 7L, "e", 2.0),
      (1L, ts("2024-01-01 00:00:00"), 7L, "e", 1.0)
    ).toDF("event_id", "ts", "user_id", "event_type", "value")
    // fold order is id 1 then id 2: s = 850000 + 2000000 = 2850000
    DecayFeatures.ewma(tied).head().getLong(2) shouldBe 2850000L
  }

  test("deterministic under repartition; one row per user") {
    val big = (0L until 600L).map(i =>
      (i, ts(f"2024-01-01 ${(i % 24)}%02d:00:00"), i % 29, "e", (i % 13) * 0.25))
      .toDF("event_id", "ts", "user_id", "event_type", "value")
    val a = DecayFeatures.ewma(big)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sortBy(_._1)
    val b = DecayFeatures.ewma(big.repartition(13))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sortBy(_._1)
    a shouldBe b
    a.length shouldBe 29
  }

  test("per-event EWMA: every prefix value matches the recurrence; last row == ewma()") {
    val out = DecayFeatures.ewmaAtEvent(events)
      .collect().map(r => r.getLong(1) -> r.getLong(3)).toMap
    // hand-computed prefixes: 1e6; 850000 + 2e6; 2422500 + 5e5
    out shouldBe Map(1L -> 1000000L, 2L -> 2850000L, 3L -> 2922500L)
    // the final as-of value IS the end-of-stream ewma
    out(3L) shouldBe DecayFeatures.ewma(events).head().getLong(2)
    // one row per event, deterministic under repartition
    val big = (0L until 300L).map(i =>
      (i, ts(f"2024-01-01 ${(i % 24)}%02d:30:00"), i % 11, "e", (i % 7) * 0.5))
      .toDF("event_id", "ts", "user_id", "event_type", "value")
    val a = DecayFeatures.ewmaAtEvent(big)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(3))).sortBy(x => (x._1, x._2))
    a.length shouldBe 300
    val b = DecayFeatures.ewmaAtEvent(big.repartition(13))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(3))).sortBy(x => (x._1, x._2))
    a shouldBe b
  }

  test("native prefix-scan kernel == HOF witness bit-for-bit (incl. negatives and NULL values)") {
    // negative values swing the accumulator through zero, exercising the
    // truncate-toward-zero division both ways; a NULL value must null the
    // accumulator permanently in BOTH forms
    val mixed = (0L until 400L).map { i =>
      val v: java.lang.Double =
        if (i == 137L || i == 310L) null
        else (i % 9).toDouble - 4.0
      (i, ts(f"2024-01-${(i % 28) + 1}%02d ${(i % 24)}%02d:00:00"), i % 13, "e", v)
    }.toDF("event_id", "ts", "user_id", "event_type", "value")
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        if (r.isNullAt(3)) null else r.getLong(3))).sortBy(x => (x._1, x._2))
    rows(DecayFeatures.ewmaAtEvent(mixed)) shouldBe
      rows(DecayFeatures.ewmaAtEventHof(mixed))
    // and at the decay extremes (plain running sum / last-value-only)
    rows(DecayFeatures.ewmaAtEvent(mixed, decayPpm = 1000000L)) shouldBe
      rows(DecayFeatures.ewmaAtEventHof(mixed, decayPpm = 1000000L))
    rows(DecayFeatures.ewmaAtEvent(mixed, decayPpm = 0L)) shouldBe
      rows(DecayFeatures.ewmaAtEventHof(mixed, decayPpm = 0L))
  }

  test("incremental state: chained shard folds == one-shot, users pass through and appear") {
    val all = (0L until 200L).map(i =>
      (i, ts(f"2024-01-${(i % 28) + 1}%02d 06:00:00"), i % 7, "e", (i % 11) * 0.5))
      .toDF("event_id", "ts", "user_id", "event_type", "value")
    import org.apache.spark.sql.functions.{col, lit}
    val cut1 = ts("2024-01-10 00:00:00")
    val cut2 = ts("2024-01-20 00:00:00")
    val st0 = DecayFeatures.ewmaState(all.filter(col("ts") < lit(cut1)))
    val st1 = DecayFeatures.incrementEwma(st0,
      all.filter(col("ts") >= lit(cut1) && col("ts") < lit(cut2)))
    val st2 = DecayFeatures.incrementEwma(st1, all.filter(col("ts") >= lit(cut2)))
    val oneShot = DecayFeatures.ewmaState(all)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).sortBy(_._1)
    st2.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
      .sortBy(_._1) shouldBe oneShot
    // an empty shard passes every user through unchanged
    DecayFeatures.incrementEwma(st0, all.filter(lit(false)))
      .collect().map(_.getLong(2)).sorted shouldBe
      st0.collect().map(_.getLong(2)).sorted
  }

  test("incremental state: an out-of-order shard raises per the stream contract") {
    val st = DecayFeatures.ewmaState(events) // last event 2024-01-03
    val stale = Seq((9L, ts("2024-01-02 12:00:00"), 7L, "e", 1.0))
      .toDF("event_id", "ts", "user_id", "event_type", "value")
    val ex = intercept[Exception] {
      DecayFeatures.incrementEwma(st, stale).collect()
    }
    ex.getMessage should include("stored stream position")
  }

  test("a NULL event time raises instead of silently mis-positioning the event") {
    val bad = Seq((1L, null.asInstanceOf[Timestamp], 7L, "e", 1.0))
      .toDF("event_id", "ts", "user_id", "event_type", "value")
    val ex = intercept[Exception] { DecayFeatures.ewma(bad).collect() }
    ex.getMessage should include("has no stream position")
  }
}
