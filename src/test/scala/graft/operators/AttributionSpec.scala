package graft.operators

import java.sql.Timestamp

import graft.SparkTestBase

/** Multi-touch attribution: hand-checked splits for all three credit
  * schemes, exact credit conservation (remainder to the most recent
  * touch), window pruning, unattributable conversions dropped,
  * determinism, and the incremental contract (increment == one-shot
  * restricted to shard conversions; out-of-order shards raise; state
  * stays window-bounded).
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

  test("U-shape: 40/20/40 with the last touch absorbing remainders; 1 and 2 touch edges") {
    // 4 touches, v = 10.0 -> 10_000_000 fp: first 4_000_000, two middles
    // 1_000_000 each, last 10M - 4M - 2M = 4_000_000
    val e4 = Seq(
      ev(1, 1, 6, 7, "click", 0.0), ev(2, 2, 6, 7, "click", 0.0),
      ev(3, 3, 6, 7, "click", 0.0), ev(4, 4, 6, 7, "click", 0.0),
      ev(5, 5, 6, 7, "purchase", 10.0),
      // user 8: single touch takes everything
      ev(6, 1, 6, 8, "click", 0.0), ev(7, 2, 6, 8, "purchase", 3.0),
      // user 9: two touches split v div 2 / v - v div 2 (odd fp value)
      ev(8, 1, 6, 9, "click", 0.0), ev(9, 2, 6, 9, "click", 0.0),
      ev(10, 3, 6, 9, "purchase", 0.0000070)
    ).toDF("event_id", "ts", "user_id", "event_type", "value")
    val out = Attribution.positionAttribution(e4, windowDays = 7)
      .collect().map(r => (r.getLong(0), r.getLong(3), r.getLong(6)))
    out.filter(_._1 == 7L).map(t => t._2 -> t._3).toMap shouldBe
      Map(1L -> 4000000L, 2L -> 1000000L, 3L -> 1000000L, 4L -> 4000000L)
    out.filter(_._1 == 8L).map(t => t._2 -> t._3).toMap shouldBe Map(6L -> 3000000L)
    out.filter(_._1 == 9L).map(t => t._2 -> t._3).toMap shouldBe
      Map(8L -> 3L, 9L -> 4L) // 7 fp units: 3 / 4, remainder on the last
  }

  test("time-decay: 2^(maxH - h) weights, shares floor, anchor absorbs the slack") {
    // halfLife 1d, window 7d -> maxH = 6; touches 0/1/3 half-lives before
    // the conversion weigh 64/32/8, W = 104, v = 10M fp
    val e = Seq(
      ev(1, 1, 6, 7, "click", 0.0),  // age 3d -> h=3 -> w=8
      ev(2, 3, 6, 7, "click", 0.0),  // age exactly 1d -> h=1 -> w=32
      ev(3, 4, 5, 7, "click", 0.0),  // age 1h -> h=0 -> w=64 (anchor)
      ev(4, 4, 6, 7, "purchase", 10.0)
    ).toDF("event_id", "ts", "user_id", "event_type", "value")
    val out = Attribution.timeDecayAttribution(e, windowDays = 7, halfLifeDays = 1)
      .collect().map(r => r.getLong(3) -> r.getLong(6)).toMap
    // floor(10M*64/104)=6153846 (+1 slack), floor(10M*32/104)=3076923,
    // floor(10M*8/104)=769230
    out shouldBe Map(3L -> 6153847L, 2L -> 3076923L, 1L -> 769230L)
    out.values.sum shouldBe 10000000L
    // a window spanning > 62 half-lives fails loudly (BIGINT weight domain)
    val ex = intercept[IllegalArgumentException] {
      Attribution.timeDecayAttribution(e, windowDays = 7 * 13, halfLifeDays = 1)
    }
    ex.getMessage should include("half-lives")
  }

  test("time-decay weight SUMS don't wrap BIGINT: 2 touches in the newest bucket at maxH=62") {
    // windowDays=63 / halfLife=1d -> maxH=62: each newest-bucket touch
    // weighs 2^62 (fits BIGINT), but TWO of them sum to 2^63 — a plain
    // BIGINT sum wraps negative and the shares go garbage while the
    // anchor's slack silently absorbs the corruption. The decimal(38,0)
    // weight sum keeps the split exact: 5M / 5M.
    val e = Seq(
      ev(1, 4, 5, 7, "click", 0.0),   // age 1h  -> h=0 -> w=2^62
      ev(2, 4, 4, 7, "click", 0.0),   // age 2h  -> h=0 -> w=2^62
      ev(3, 4, 6, 7, "purchase", 10.0)
    ).toDF("event_id", "ts", "user_id", "event_type", "value")
    val out = Attribution.timeDecayAttribution(e, windowDays = 63, halfLifeDays = 1)
      .collect().map(r => r.getLong(3) -> r.getLong(6)).toMap
    out shouldBe Map(1L -> 5000000L, 2L -> 5000000L)
    out.values.foreach(_ should be >= 0L)
    out.values.sum shouldBe 10000000L
  }

  test("exact conservation holds for every scheme on random fan-outs") {
    val big = (0L until 600L).map { i =>
      val typ = if (i % 7 == 0) "purchase" else "click"
      ev(i, (i % 28).toInt + 1, (i % 24).toInt, i % 11, typ, (i % 13) * 0.37)
    }.toDF("event_id", "ts", "user_id", "event_type", "value")
    val expected = 600L / 7L + 1L // conversions exist; each conserves its value
    for (run <- Seq(
        Attribution.linearAttribution(big),
        Attribution.positionAttribution(big),
        Attribution.timeDecayAttribution(big, halfLifeDays = 2))) {
      val sums = run.groupBy("user_id", "conv_event_id")
        .agg(org.apache.spark.sql.functions.sum("credit_fp").as("s"))
        .collect().map(r => r.getLong(1) -> r.getLong(2)).toMap
      sums should not be empty
      sums.foreach { case (convId, s) =>
        s shouldBe Math.round((convId % 13) * 0.37 * 1000000.0)
      }
    }
  }

  test("unattributed conversions: the anti-join closes the revenue accounting") {
    // conversion 5 (no in-window click) and user 8's conversion (no clicks
    // at all) are exactly the rows linearAttribution skips
    val out = Attribution.unattributedConversions(events, windowDays = 7)
      .collect().map(r => (r.getLong(1), r.getLong(3))).toMap
    out shouldBe Map(5L -> 1000000L, 6L -> 5000000L)
    // credits + unattributed values == total conversion value, exactly
    val credits = Attribution.linearAttribution(events, windowDays = 7)
      .collect().map(_.getLong(6)).sum
    credits + out.values.sum shouldBe 16000000L // 10.0 + 1.0 + 5.0 in fp
  }

  test("conversion paths: (ts, id)-ordered journey strings; rollup conserves counts") {
    val e = Seq(
      ev(1, 1, 6, 7, "view", 0.0), ev(2, 2, 6, 7, "click", 0.0),
      ev(3, 2, 7, 7, "signup", 0.0), ev(4, 3, 6, 7, "purchase", 2.0),
      ev(5, 4, 6, 7, "click", 0.0), ev(6, 5, 6, 7, "purchase", 1.0),
      ev(7, 1, 6, 8, "purchase", 9.0) // no steps: no path row
    ).toDF("event_id", "ts", "user_id", "event_type", "value")
    val out = Attribution.conversionPaths(e, windowDays = 7)
      .collect().map(r => r.getLong(1) -> (r.getString(3), r.getLong(4), r.getLong(5))).toMap
    out(4L) shouldBe (("view>click>signup", 3L, 2000000L))
    // conversion 6's window still reaches all four earlier steps
    out(6L) shouldBe (("view>click>signup>click", 4L, 1000000L))
    out.keySet shouldBe Set(4L, 6L)
    // a conversion type doubling as a step is a loud error
    val ex = intercept[IllegalArgumentException] {
      Attribution.conversionPaths(e, touchTypes = Seq("click", "purchase"))
    }
    ex.getMessage should include("journey step")
  }

  test("removal effect: per-channel lost-conversion shares; absent channels score 0") {
    val e = Seq(
      ev(1, 1, 6, 7, "view", 0.0), ev(2, 2, 6, 7, "click", 0.0),
      ev(3, 3, 6, 7, "purchase", 2.0),                               // view>click
      ev(4, 4, 6, 7, "click", 0.0), ev(5, 5, 6, 7, "purchase", 1.0), // view>click>click
      ev(6, 1, 6, 8, "view", 0.0), ev(7, 2, 6, 8, "purchase", 4.0)   // view
    ).toDF("event_id", "ts", "user_id", "event_type", "value")
    val out = Attribution.removalEffectAttribution(e, windowDays = 7,
        touchTypes = Seq("click", "view", "signup"))
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5), r.getLong(6)))).toMap
    // 3 conversions worth 7e6 fp total; click appears in 2 journeys
    // (3e6 fp), view in all 3, signup in none
    out("click") shouldBe ((3L, 7000000L, 2L, 3000000L, 666666L, 428571L))
    out("view") shouldBe ((3L, 7000000L, 3L, 7000000L, 1000000L, 1000000L))
    out("signup") shouldBe ((3L, 7000000L, 0L, 0L, 0L, 0L))
    // a journey-less corpus still reports every channel, all-zero
    import org.apache.spark.sql.functions.col
    val none = Attribution.removalEffectAttribution(
        e.filter(col("event_type") === "purchase"), windowDays = 7,
        touchTypes = Seq("click", "view"))
      .collect().map(r => r.getString(0) -> ((r.getLong(3), r.getLong(5)))).toMap
    none shouldBe Map("click" -> ((0L, 0L)), "view" -> ((0L, 0L)))
  }

  private val cut = Timestamp.valueOf("2024-01-15 00:00:00")

  test("increment == one-shot restricted to shard conversions; chained shards cover everything") {
    import org.apache.spark.sql.functions.{col, lit}
    val big = (0L until 800L).map { i =>
      val typ = if (i % 6 == 0) "purchase" else "click"
      ev(i, (i % 28).toInt + 1, (i % 24).toInt, i % 9, typ, (i % 13) * 0.37)
    }.toDF("event_id", "ts", "user_id", "event_type", "value")
    def rows(d: org.apache.spark.sql.DataFrame) =
      d.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(3), r.getLong(5), r.getLong(6)))
        .sortBy(t => (t._1, t._2, t._3))
    val first = big.filter(col("ts") < lit(cut))
    val second = big.filter(col("ts") >= lit(cut))
    val st0 = Attribution.attributionState(first)
    // shard credits == the one-shot on EVERYTHING, restricted to the
    // shard's conversions
    val oneShotAll = Attribution.linearAttribution(big)
    rows(Attribution.incrementAttribution(st0, second)) shouldBe
      rows(oneShotAll.join(
        second.filter(col("event_type") === "purchase")
          .select(col("event_id").as("conv_event_id")), Seq("conv_event_id"), "left_semi")
        .select(oneShotAll.columns.map(col).toSeq: _*))
    // chained: first-shard one-shot + second-shard increment == one-shot
    rows(Attribution.linearAttribution(first)
      .unionByName(Attribution.incrementAttribution(st0, second))) shouldBe rows(oneShotAll)
    // and the folded state equals the state built from everything at once
    def stRows(d: org.apache.spark.sql.DataFrame) =
      d.collect().map(r => (r.getLong(0),
        if (r.isNullAt(1)) -1L else r.getLong(1),
        if (r.isNullAt(2)) -1L else r.getLong(2),
        r.getLong(3), r.getLong(4))).sortBy(t => (t._1, t._2))
    stRows(Attribution.incrementAttributionState(st0, second)) shouldBe
      stRows(Attribution.attributionState(big))
    // scheme passthrough: the U-shape increment matches its restricted one-shot
    val posAll = Attribution.positionAttribution(big)
    rows(Attribution.incrementAttribution(st0, second, scheme = Attribution.Position)) shouldBe
      rows(posAll.join(
        second.filter(col("event_type") === "purchase")
          .select(col("event_id").as("conv_event_id")), Seq("conv_event_id"), "left_semi")
        .select(posAll.columns.map(col).toSeq: _*))
  }

  test("state is window-bounded: pruned touches vanish, conversion-only users keep a position row") {
    val e = Seq(
      ev(1, 1, 6, 7, "click", 0.0),    // 20 days before the position: pruned
      ev(2, 20, 6, 7, "click", 0.0),   // in-window: retained
      ev(3, 21, 6, 7, "purchase", 1.0),
      ev(4, 5, 6, 8, "purchase", 2.0)  // user 8: conversions only
    ).toDF("event_id", "ts", "user_id", "event_type", "value")
    val st = Attribution.attributionState(e, windowDays = 7).collect()
      .map(r => (r.getLong(0), if (r.isNullAt(1)) -1L else r.getLong(1)))
    st.toSet shouldBe Set((7L, 2L), (8L, -1L))
  }

  test("an out-of-order shard raises — even when the stale event is a touch with no conversion") {
    import org.apache.spark.sql.functions.{col, lit}
    val first = events.filter(col("ts") < lit(cut))
    val st = Attribution.attributionState(first) // user 7 position: day 4 purchase
    val staleTouch = Seq(ev(99, 2, 6, 7, "click", 0.0))
      .toDF("event_id", "ts", "user_id", "event_type", "value")
    val ex1 = intercept[Exception] {
      Attribution.incrementAttribution(st, staleTouch).collect()
    }
    ex1.getMessage should include("stream position")
    val ex2 = intercept[Exception] {
      Attribution.incrementAttributionState(st, staleTouch).collect()
    }
    ex2.getMessage should include("stream position")
    // irrelevant event types are no-ops regardless of their timestamps
    val staleView = Seq(ev(98, 2, 6, 7, "view", 0.0))
      .toDF("event_id", "ts", "user_id", "event_type", "value")
    Attribution.incrementAttribution(st, staleView).collect() shouldBe empty
  }
}
