package graft.operators

import java.sql.Timestamp

import org.apache.spark.sql.functions._

import graft.SparkTestBase

/** Gap-based sessionization: hand-computed assignments, tiebreak
  * determinism, and the rollup's integer-exact session stats.
  */
class SessionizeSpec extends SparkTestBase {
  import spark.implicits._

  // user 1: three events within the 600s gap, then a 2h break, then one
  // more; user 2: a lone event
  private def events = Seq(
    (1L, 1L, ts("2024-01-01 10:00:00"), "view"),
    (2L, 1L, ts("2024-01-01 10:05:00"), "click"),
    (3L, 1L, ts("2024-01-01 10:12:00"), "purchase"),
    (4L, 1L, ts("2024-01-01 12:30:00"), "view"),
    (5L, 2L, ts("2024-01-01 09:00:00"), "signup")
  ).toDF("event_id", "user_id", "ts", "event_type")

  test("gap cut splits sessions exactly; seq numbers from 1 in time order") {
    val out = Sessionize.assign(events, gapSeconds = 600L)
      .select("event_id", "session_seq").as[(Long, Long)].collect().toMap
    out shouldBe Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 2L, 5L -> 1L)
  }

  test("a gap of exactly gapSeconds does NOT split (strictly-greater cut)") {
    val e = Seq(
      (1L, 1L, ts("2024-01-01 10:00:00"), "view"),
      (2L, 1L, ts("2024-01-01 10:10:00"), "view"),      // == 600s
      (3L, 1L, ts("2024-01-01 10:20:00.000001"), "view") // 600s + 1us
    ).toDF("event_id", "user_id", "ts", "event_type")
    val out = Sessionize.assign(e, gapSeconds = 600L)
      .select("event_id", "session_seq").as[(Long, Long)].collect().toMap
    out shouldBe Map(1L -> 1L, 2L -> 1L, 3L -> 2L)
  }

  test("exactly-gap boundary: batch assign and session_window agree (both merge)") {
    // the contract pinned in the scaladoc: an exactly-gap successor stays
    // in the session on BOTH the gaps-and-islands operator and Spark's
    // session_window aggregation, so composing them is safe on boundary data
    val e = Seq(
      (1L, 1L, ts("2024-01-01 10:00:00"), "view"),
      (2L, 1L, ts("2024-01-01 10:10:00"), "view"),      // == 600s: merges
      (3L, 2L, ts("2024-01-01 10:00:00"), "view"),
      (4L, 2L, ts("2024-01-01 10:10:00.000001"), "view") // 600s + 1us: splits
    ).toDF("event_id", "user_id", "ts", "event_type")
    val batch = Sessionize.assign(e, gapSeconds = 600L)
      .groupBy("user_id").agg(max("session_seq").as("n"))
      .as[(Long, Long)].collect().toMap
    val sw = e.groupBy(session_window(col("ts"), "10 minutes"), col("user_id"))
      .count().groupBy("user_id").count()
      .as[(Long, Long)].collect().toMap
    batch shouldBe Map(1L -> 1L, 2L -> 2L)
    sw shouldBe batch
  }

  test("same-timestamp events order by event_id — assignment is deterministic") {
    val e = Seq(
      (20L, 1L, ts("2024-01-01 10:00:00"), "view"),
      (10L, 1L, ts("2024-01-01 10:00:00"), "click"),
      (30L, 1L, ts("2024-01-01 13:00:00"), "view")
    ).toDF("event_id", "user_id", "ts", "event_type")
    val out = Sessionize.assign(e, gapSeconds = 600L)
      .select("event_id", "session_seq").as[(Long, Long)].collect().toMap
    out shouldBe Map(10L -> 1L, 20L -> 1L, 30L -> 2L)
  }

  test("session rollup: counts, span, distinct types — integer-exact") {
    val out = Sessionize.sessions(events, gapSeconds = 600L)
      .orderBy("user_id", "session_seq")
      .select("user_id", "session_seq", "n_events", "duration_us", "n_event_types")
      .as[(Long, Long, Long, Long, Long)].collect().toSeq
    out shouldBe Seq(
      (1L, 1L, 3L, 720L * 1000000L, 3L),
      (1L, 2L, 1L, 0L, 1L),
      (2L, 1L, 1L, 0L, 1L))
  }

  test("NULL event time fails loudly; non-positive gap rejected") {
    val e = Seq((1L, 1L, Option.empty[Timestamp], Option("view")))
      .toDF("event_id", "user_id", "ts", "event_type")
    an[Exception] should be thrownBy
      Sessionize.assign(e, gapSeconds = 600L).collect()
    an[IllegalArgumentException] should be thrownBy
      Sessionize.assign(events, gapSeconds = 0L)
  }

  test("transitions: counted within sessions only, ordered, at most types^2 rows") {
    // user 1 session 1: view->click->purchase; session 2 starts fresh (no
    // cross-session pair); user 2: singleton (no pairs)
    val out = Sessionize.transitions(events, gapSeconds = 600L)
      .select("from_type", "to_type", "n_transitions")
      .as[(String, String, Long)].collect().toSet
    out shouldBe Set(("view", "click", 1L), ("click", "purchase", 1L))
  }

  test("funnel: strict-after chaining, depth histogram is cumulative, spine complete") {
    // session A (user 1): view -> click -> purchase — no signup: depth 0
    // session B (user 3): signup -> view -> purchase in order: depth 3
    // session C (user 4): signup, then purchase BEFORE view: chain breaks
    //   at view even though purchase exists: depth 1... but the later view
    //   (after signup) rescues step 2? min(view)=after signup -> t1 ok;
    //   purchase min is BEFORE view -> r2 < t1 -> depth 2.
    val e = Seq(
      (1L, 1L, ts("2024-01-01 10:00:00"), "view"),
      (2L, 1L, ts("2024-01-01 10:01:00"), "click"),
      (3L, 1L, ts("2024-01-01 10:02:00"), "purchase"),
      (4L, 3L, ts("2024-01-01 09:00:00"), "signup"),
      (5L, 3L, ts("2024-01-01 09:05:00"), "view"),
      (6L, 3L, ts("2024-01-01 09:10:00"), "purchase"),
      (7L, 4L, ts("2024-01-01 08:00:00"), "signup"),
      (8L, 4L, ts("2024-01-01 08:01:00"), "purchase"),
      (9L, 4L, ts("2024-01-01 08:02:00"), "view")
    ).toDF("event_id", "user_id", "ts", "event_type")
    val out = Sessionize.funnel(e, gapSeconds = 3600L,
        steps = Seq("signup", "view", "purchase"))
      .select("depth_level", "step", "n_sessions")
      .as[(Int, String, Long)].collect().toSet
    out shouldBe Set(
      (0, "(all sessions)", 3L),
      (1, "signup", 2L),
      (2, "view", 2L),
      (3, "purchase", 1L))
  }

  test("funnel: guards reject empty or duplicated step lists") {
    an[IllegalArgumentException] should be thrownBy
      Sessionize.funnel(events, 600L, steps = Seq.empty)
    an[IllegalArgumentException] should be thrownBy
      Sessionize.funnel(events, 600L, steps = Seq("view", "view"))
  }

  test("time-to-convert: strict-after deltas per session; broken chains emit nothing") {
    val e = Seq(
      // user 1: signup 09:00, purchase 09:10 -> 600s delta
      (1L, 1L, ts("2024-01-01 09:00:00"), "signup"),
      (2L, 1L, ts("2024-01-01 09:10:00"), "purchase"),
      // user 2: purchase BEFORE signup in the same session -> no row
      (3L, 2L, ts("2024-01-01 09:00:00"), "purchase"),
      (4L, 2L, ts("2024-01-01 09:05:00"), "signup"),
      // user 3: signup only -> no row
      (5L, 3L, ts("2024-01-01 09:00:00"), "signup"),
      // user 1, second session (past the gap): another conversion, 120s
      (6L, 1L, ts("2024-01-01 15:00:00"), "signup"),
      (7L, 1L, ts("2024-01-01 15:02:00"), "purchase")
    ).toDF("event_id", "user_id", "ts", "event_type")
    val out = Sessionize.timeToConvert(e, gapSeconds = 3600L, "signup", "purchase")
      .select("user_id", "session_seq", "delta_us")
      .as[(Long, Long, Long)].collect().toSet
    out shouldBe Set((1L, 1L, 600000000L), (1L, 2L, 120000000L))
    an[IllegalArgumentException] should be thrownBy
      Sessionize.timeToConvert(e, 3600L, "view", "view")
  }

  test("time-to-convert: zero conversions still yield ONE (0, NULL, NULL) summary row") {
    // the q92 composition at its edge: no session converts -> the quantile
    // sides are global aggregates (one NULL-threshold row each, never an
    // empty frame), so the crossJoin chain keeps parity with the oracle's
    // aggregate CTEs, which also return one row on empty input
    import org.apache.spark.sql.functions.{broadcast, col, count, lit}
    val e = Seq((1L, 1L, ts("2024-01-01 09:00:00"), "view"))
      .toDF("event_id", "user_id", "ts", "event_type")
    val deltas = Sessionize.timeToConvert(e, 3600L, "signup", "purchase")
      .select(col("delta_us").cast("double").as("delta_us"))
    val n = deltas.agg(count(lit(1)).as("n_converted"))
    val med = Quantiles.quantileThreshold(deltas, "delta_us", 1L, 2L, 0)
      .withColumnRenamed("threshold", "median_delta_us")
    val p90 = Quantiles.quantileThreshold(deltas, "delta_us", 9L, 10L, 0)
      .withColumnRenamed("threshold", "p90_delta_us")
    val rows = n.crossJoin(broadcast(med)).crossJoin(broadcast(p90)).collect()
    rows.length shouldBe 1
    rows.head.getLong(0) shouldBe 0L
    rows.head.isNullAt(1) shouldBe true
    rows.head.isNullAt(2) shouldBe true
  }
}
