package graft.operators

import org.apache.spark.sql.DataFrame

import graft.SparkTestBase
import graft.domain.{FeaturesDaily, Label, TrainingData}

/** Parity port of the reference PIT scenarios — most importantly the
  * data-leakage assertion (reference: TestPointInTimeJoin.scala:18-105).
  * Every scenario runs through BOTH physical formulations.
  */
class PointInTimeJoinSpec extends SparkTestBase {
  import spark.implicits._

  private def features(rows: (String, String, Long)*): DataFrame =
    rows.map { case (u, day, c) =>
      FeaturesDaily(u, d(day), Some(c), Some(c), Some(0), Some("1"))
    }.toDF()

  private def run(labels: Seq[Label], feats: DataFrame,
      union: Boolean): Seq[TrainingData] =
    PointInTimeJoinPipeline.transform(labels.toDF(), feats, useUnionPlan = union)
      .as[TrainingData].collect().toSeq

  for (plan <- Seq("union" -> true, "rank" -> false)) {
    val (name, union) = plan

    test(s"[$name] no leakage: label at day-2 noon takes day-2 features, never day-3") {
      val feats = features(
        ("user1", "2024-01-01", 1L),
        ("user1", "2024-01-02", 2L),
        ("user1", "2024-01-03", 3L))
      val labels = Seq(Label("user1", 1.0, ts("2024-01-02 12:00:00")))
      val out = run(labels, feats, union)

      out should have size 1
      out.head.day shouldBe Some(d("2024-01-02"))
      out.head.event_count_7d shouldBe Some(2L)      // NOT 3 — day-3 must not leak
      out.head.label shouldBe 1.0
    }

    test(s"[$name] feature dated exactly at the as-of date is visible (inclusive)") {
      val feats = features(("user1", "2024-01-02", 2L))
      // as-of at midnight of day 2: day-2 feature still counts (date granularity)
      val labels = Seq(Label("user1", 1.0, ts("2024-01-02 00:00:00")))
      val out = run(labels, feats, union)
      out.head.day shouldBe Some(d("2024-01-02"))
    }

    test(s"[$name] label with no feature at or before it gets null features, row kept") {
      val feats = features(("user1", "2024-01-05", 5L))
      val labels = Seq(Label("user1", 0.0, ts("2024-01-02 12:00:00")))
      val out = run(labels, feats, union)
      out should have size 1
      out.head.day shouldBe None
      out.head.event_count_7d shouldBe None
      out.head.event_type_counts shouldBe None
    }

    test(s"[$name] multi-user: each label matches only its own user's features") {
      val feats = features(
        ("user1", "2024-01-01", 10L),
        ("user2", "2024-01-01", 20L))
      val labels = Seq(
        Label("user1", 1.0, ts("2024-01-02 12:00:00")),
        Label("user2", 0.0, ts("2024-01-02 12:00:00")),
        Label("user3", 1.0, ts("2024-01-02 12:00:00")))
      val out = run(labels, feats, union).sortBy(_.user_id)

      out should have size 3
      out(0).event_count_7d shouldBe Some(10L)
      out(1).event_count_7d shouldBe Some(20L)
      out(2).day shouldBe None                        // user3: no features at all
    }

    test(s"[$name] multiple labels per user pick their own as-of snapshot") {
      val feats = features(
        ("user1", "2024-01-01", 1L),
        ("user1", "2024-01-03", 3L),
        ("user1", "2024-01-06", 6L))
      val labels = Seq(
        Label("user1", 1.0, ts("2024-01-02 09:00:00")),
        Label("user1", 0.0, ts("2024-01-04 09:00:00")),
        Label("user1", 1.0, ts("2024-01-07 09:00:00")))
      val out = run(labels, feats, union).sortBy(_.as_of_ts.getTime)

      out.map(_.day.map(_.toString)) shouldBe
        Seq(Some("2024-01-01"), Some("2024-01-03"), Some("2024-01-06"))
    }
  }

  for (plan <- Seq("union" -> true, "rank" -> false)) {
    val (name, union) = plan

    test(s"[$name] a newer snapshot's null column is NOT backfilled from an older snapshot") {
      // day-1 snapshot has recency 3; day-10 snapshot has recency null (user
      // idle >30d). A label at day 15 must see the day-10 snapshot verbatim —
      // recency None — not inherit day-1's stale 3 via per-column carry.
      val feats = Seq(
        FeaturesDaily("user1", d("2024-01-01"), Some(5L), Some(9L), Some(3), Some("2")),
        FeaturesDaily("user1", d("2024-01-10"), Some(0L), Some(0L), None, Some("0"))
      ).toDF()
      val labels = Seq(Label("user1", 1.0, ts("2024-01-15 12:00:00")))
      val out = run(labels, feats, union)

      out should have size 1
      out.head.day shouldBe Some(d("2024-01-10"))
      out.head.last_event_days_ago shouldBe None      // the bug returned Some(3)
      out.head.event_count_7d shouldBe Some(0L)
    }

    test(s"[$name] fully-duplicate labels each keep their own output row") {
      val feats = features(("user1", "2024-01-01", 1L))
      val dup = Label("user1", 1.0, ts("2024-01-02 12:00:00"))
      val out = run(Seq(dup, dup), feats, union)
      out should have size 2
      out.map(_.day) shouldBe Seq(Some(d("2024-01-01")), Some(d("2024-01-01")))
    }
  }

  test("both formulations agree row-for-row on a mixed scenario") {
    val feats = features(
      ("a", "2024-01-01", 1L), ("a", "2024-01-04", 4L),
      ("b", "2024-01-02", 2L), ("c", "2024-01-09", 9L))
    val labels = Seq(
      Label("a", 1.0, ts("2024-01-03 10:00:00")),
      Label("a", 0.0, ts("2024-01-05 10:00:00")),
      Label("b", 1.0, ts("2024-01-01 10:00:00")),
      Label("c", 0.0, ts("2024-01-09 00:00:00")),
      Label("d", 1.0, ts("2024-01-05 10:00:00")))
    val u = run(labels, feats, union = true)
      .sortBy(t => (t.user_id, t.as_of_ts.getTime))
    val r = run(labels, feats, union = false)
      .sortBy(t => (t.user_id, t.as_of_ts.getTime))
    u shouldBe r
  }

  test("nearest: picks the closer side, ties go earlier, tolerance nulls, exact tie is distance 0") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val left = Seq(
      (1L, 7L, 100L),  // back at 90 (d=10), fwd at 130 (d=30) -> back
      (2L, 7L, 125L),  // back at 90 (d=35), fwd at 130 (d=5)  -> fwd
      (3L, 7L, 110L),  // back at 90 (d=20), fwd at 130 (d=20) -> TIE -> earlier (90)
      (4L, 7L, 500L),  // nearest is 130 (d=370) > tol -> null
      (5L, 8L, 100L),  // other user: only reading at 100 -> exact tie, d=0
      (6L, 9L, 100L))  // user with NO readings -> null
      .toDF("event_id", "user_id", "ts")
    val right = Seq(
      (7L, 90L, 1.0), (7L, 130L, 2.0), (8L, 100L, 3.0))
      .toDF("user_id", "f_ts", "f_value")
    val out = AsOfJoin.nearest(left, right, "user_id", "ts", "f_ts",
        Seq("f_ts", "f_value"), tolerance = 100L)
      .orderBy("event_id")
      .select("event_id", "f_ts", "f_value")
      .as[(Long, Option[Long], Option[Double])].collect()
    out(0) shouldBe ((1L, Some(90L), Some(1.0)))
    out(1) shouldBe ((2L, Some(130L), Some(2.0)))
    out(2) shouldBe ((3L, Some(90L), Some(1.0)))   // tie -> earlier
    out(3) shouldBe ((4L, None, None))             // out of tolerance
    out(4) shouldBe ((5L, Some(100L), Some(3.0)))  // same-instant reading visible
    out(5) shouldBe ((6L, None, None))             // no readings at all
    an[IllegalArgumentException] should be thrownBy
      AsOfJoin.nearest(left, right, "user_id", "ts", "f_ts", Seq("f_value"), -1L)
  }

  test("nearest == rank-over-band-join witness on real events") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.expressions.Window
    val ev = graft.SparkEntry.events(spark, "/root/testdata/sf0.001")
      .withColumn("ts_us", expr("unix_micros(ts)"))
    val labels = ev.filter(col("event_type") === "purchase")
      .select(col("event_id"), col("user_id"), col("ts_us"))
    val readings = ev.filter(col("event_type") === "view")
      .groupBy(col("user_id"), col("ts_us"))
      .agg(max(col("value")).as("f_value"))
      .withColumnRenamed("ts_us", "f_ts_us")
    val tol = 21600000000L
    val fast = AsOfJoin.nearest(labels, readings, "user_id",
        "ts_us", "f_ts_us", Seq("f_ts_us", "f_value"), tol)
      .select("event_id", "f_ts_us", "f_value")
      .as[(Long, Option[Long], Option[Double])].collect().toSet
    val r = readings.withColumnRenamed("user_id", "__ru")
    val w = Window.partitionBy(col("event_id"))
      .orderBy(abs(col("f_ts_us") - col("ts_us")).asc_nulls_last, col("f_ts_us").asc_nulls_last)
    val witness = labels
      .join(r, col("user_id") === col("__ru") &&
        abs(col("f_ts_us") - col("ts_us")) <= tol, "left")
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .select("event_id", "f_ts_us", "f_value")
      .as[(Long, Option[Long], Option[Double])].collect().toSet
    fast shouldBe witness
    // both matched and unmatched labels occur at this tolerance
    fast.count(_._2.isEmpty) should be > 0
    fast.count(_._2.nonEmpty) should be > 0
  }
}
