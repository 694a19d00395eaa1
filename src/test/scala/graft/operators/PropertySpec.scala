package graft.operators

import org.scalacheck.Gen

import graft.SparkTestBase
import graft.domain.{EventRaw, FeaturesDaily, Label, TrainingData}

/** Property-based invariants over randomized (seeded, reproducible) inputs:
  *  - leakage: every PIT output row satisfies day <= date(as_of_ts);
  *  - plan equivalence: union-sorted and join-rank as-of formulations agree;
  *  - window monotonicity: 0 <= count_7d <= count_30d on every backfill row.
  *
  * Generators sampled directly (the scalatestplus bridge isn't on the
  * offline classpath); each round uses seed 42+i so failures replay.
  */
class PropertySpec extends SparkTestBase {
  import spark.implicits._

  private val userGen = Gen.oneOf("u1", "u2", "u3", "u4", "u5")
  private val typeGen = Gen.oneOf("click", "view", "purchase")
  private val dayGen = Gen.choose(1, 28)
  private val secondGen = Gen.choose(0L, 86399L)

  private def tsOf(day: Int, sec: Long) = java.sql.Timestamp.from(
    java.sql.Timestamp.valueOf(f"2024-01-$day%02d 00:00:00").toInstant.plusSeconds(sec))

  private val eventsGen: Gen[List[EventRaw]] =
    Gen.listOfN(60, for {
      u <- userGen; t <- typeGen; day <- dayGen; s <- secondGen
    } yield EventRaw(u, t, tsOf(day, s)))

  private val labelsGen: Gen[List[Label]] =
    Gen.listOfN(12, for {
      u <- userGen; day <- dayGen; s <- secondGen; v <- Gen.oneOf(0.0, 1.0)
    } yield Label(u, v, tsOf(day, s)))

  private val Rounds = 5

  test("backfill: 0 <= count_7d <= count_30d, recency in [0,30], zero-event semantics") {
    (1 to Rounds).foreach { i =>
      val events = sample(eventsGen, 42L + i)
      val rows = BackfillPipeline.transform(events.toDF(), "2024-01-01", "2024-01-28")
        .as[FeaturesDaily].collect()

      assert(rows.length == events.map(_.user_id).distinct.size * 28,
        s"[seed ${42 + i}] row per (user, day)")
      rows.foreach { r =>
        val c7 = r.event_count_7d.get
        val c30 = r.event_count_30d.get
        assert(c7 >= 0 && c7 <= c30, s"[seed ${42 + i}] window monotonicity: $r")
        r.last_event_days_ago.foreach(v =>
          assert(v >= 0 && v <= 30, s"[seed ${42 + i}] recency out of range: $r"))
        if (c30 == 0)
          assert(r.last_event_days_ago.isEmpty && r.event_type_counts.contains("0"),
            s"[seed ${42 + i}] zero-event semantics: $r")
      }
      // conservation, EXACT: each event at date e contributes to day d's
      // 7d count for every backfill day d in [e, e+7] (the window is
      // BETWEEN day-7 AND day — 8 calendar days, reference semantics), so
      // the sum of all 7d counts must equal the sum of per-event coverage
      val start = java.time.LocalDate.parse("2024-01-01")
      val end = java.time.LocalDate.parse("2024-01-28")
      val expected = events.map { e =>
        val d = e.ts.toLocalDateTime.toLocalDate
        val lo = Seq(d, start).max[java.time.LocalDate](Ordering.by(_.toEpochDay))
        val hi = Seq(d.plusDays(7), end).min[java.time.LocalDate](Ordering.by(_.toEpochDay))
        math.max(0L, hi.toEpochDay - lo.toEpochDay + 1)
      }.sum
      val total7d = rows.map(_.event_count_7d.get).sum
      assert(total7d == expected,
        s"[seed ${42 + i}] 7d-count conservation: got $total7d, expected $expected")
    }
  }

  test("PIT join over >30-day histories: null transitions carried faithfully, plans agree") {
    // Activity only in the first ~10 days of a 75-day backfill, so recency
    // (last_event_days_ago) transitions non-null -> null mid-history — the
    // column-mixing bug class a 28-day range can never exercise.
    def offTs(dayOffset: Int, sec: Long) = java.sql.Timestamp.from(
      java.sql.Timestamp.valueOf("2024-01-01 00:00:00").toInstant
        .plusSeconds(dayOffset * 86400L + sec))
    val sparseEventsGen: Gen[List[EventRaw]] =
      Gen.listOfN(25, for {
        u <- userGen; t <- typeGen; day <- Gen.choose(0, 9); s <- secondGen
      } yield EventRaw(u, t, offTs(day, s)))
    val wideLabelsGen: Gen[List[Label]] =
      Gen.listOfN(15, for {
        u <- userGen; day <- Gen.choose(0, 74); s <- secondGen; v <- Gen.oneOf(0.0, 1.0)
      } yield Label(u, v, offTs(day, s)))

    (1 to Rounds).foreach { i =>
      val events = sample(sparseEventsGen, 342L + i)
      val labels = sample(wideLabelsGen, 442L + i)
      val feats = BackfillPipeline.transform(events.toDF(), "2024-01-01", "2024-03-15")
        .cache()
      def norm(ts: Seq[TrainingData]) =
        ts.sortBy(t => (t.user_id, t.as_of_ts.getTime, t.label))
      val unionOut = norm(PointInTimeJoinPipeline
        .transform(labels.toDF(), feats, useUnionPlan = true)
        .as[TrainingData].collect().toSeq)
      val rankOut = norm(PointInTimeJoinPipeline
        .transform(labels.toDF(), feats, useUnionPlan = false)
        .as[TrainingData].collect().toSeq)

      assert(unionOut == rankOut, s"[seed ${342 + i}] physical plans disagree on long history")
      // a label >40 days after a user's last event must see null recency:
      // its attached snapshot is >30d past the last event by construction
      unionOut.filter(_.as_of_ts.toInstant.isAfter(offTs(40, 0).toInstant)).foreach { t =>
        assert(t.last_event_days_ago.isEmpty,
          s"[seed ${342 + i}] stale recency carried across snapshots: $t")
      }
      feats.unpersist()
    }
  }

  test("PIT join: no future features and both physical plans agree") {
    (1 to Rounds).foreach { i =>
      val events = sample(eventsGen, 142L + i)
      val labels = sample(labelsGen, 242L + i)
      val feats = BackfillPipeline.transform(events.toDF(), "2024-01-01", "2024-01-28")
      def norm(ts: Seq[TrainingData]) =
        ts.sortBy(t => (t.user_id, t.as_of_ts.getTime, t.label))
      val unionOut = norm(PointInTimeJoinPipeline
        .transform(labels.toDF(), feats, useUnionPlan = true)
        .as[TrainingData].collect().toSeq)
      val rankOut = norm(PointInTimeJoinPipeline
        .transform(labels.toDF(), feats, useUnionPlan = false)
        .as[TrainingData].collect().toSeq)

      assert(unionOut.size == labels.size, s"[seed ${142 + i}] one row per label")
      unionOut.foreach { t =>
        t.day.foreach { day =>
          assert(!day.toLocalDate.isAfter(t.as_of_ts.toLocalDateTime.toLocalDate),
            s"[seed ${142 + i}] LEAKAGE: feature $day after label ${t.as_of_ts}")
        }
      }
      assert(unionOut == rankOut, s"[seed ${142 + i}] physical plans disagree")
    }
  }

  test("sessionize: partition, contiguity, and gap invariants on random event streams") {
    val gap = 3600L
    (1 to Rounds).foreach { i =>
      val evs = sample(eventsGen, 42L + i).zipWithIndex
        .map { case (e, idx) => (idx.toLong, e.user_id, e.ts, e.event_type) }
      val df = evs.toDF("event_id", "user_id", "ts", "event_type")
      val assigned = Sessionize.assign(df, gap)
        .select("event_id", "user_id", "ts_us", "session_seq")
        .as[(Long, String, Long, Long)].collect()

      // every event lands in exactly one session
      assigned.length shouldBe evs.length
      assigned.groupBy(_._2).foreach { case (u, rows) =>
        val bySeq = rows.groupBy(_._4)
        // session numbers are contiguous from 1
        bySeq.keySet shouldBe (1L to bySeq.keySet.max).toSet
        // within a session, consecutive events gap <= g; across session
        // boundaries, the gap is > g (the defining cut, both directions)
        val ordered = rows.sortBy(r => (r._3, r._1))
        ordered.sliding(2).foreach {
          case Array((_, _, t1, s1), (_, _, t2, s2)) =>
            if (s1 == s2) assert(t2 - t1 <= gap * 1000000L,
              s"user $u: intra-session gap ${t2 - t1} exceeds the cut")
            else {
              s2 shouldBe s1 + 1
              assert(t2 - t1 > gap * 1000000L,
                s"user $u: sessions split on a gap of only ${t2 - t1}")
            }
          case _ =>
        }
      }

      // the rollup agrees with the assignment it aggregates
      val rolled = Sessionize.sessions(df, gap)
        .select("user_id", "session_seq", "n_events")
        .as[(String, Long, Long)].collect().toSet
      val expected = assigned.groupBy(r => (r._2, r._4))
        .map { case ((u, s), rows) => (u, s, rows.length.toLong) }.toSet
      rolled shouldBe expected

      // funnel: reach counts are monotone non-increasing in depth
      val funnel = Sessionize.funnel(df, gap, Seq("click", "view", "purchase"))
        .orderBy("depth_level").select("n_sessions").as[Long].collect()
      funnel.sliding(2).foreach {
        case Array(a, b) => assert(b <= a, s"funnel not monotone: $a -> $b")
        case _ =>
      }
      funnel.head shouldBe rolled.size.toLong  // depth 0 counts every session
    }
  }

  test("tokenize/pack: decode(encode(x)) == normalized x and the packed stream reconstructs, on random corpora") {
    import org.apache.spark.sql.functions.{col, expr}
    // text over the house alphabet plus punctuation/whitespace noise the
    // tokenizer must strip; empty and punctuation-only docs included
    val wordGen = Gen.choose(1, 10).flatMap(n =>
      Gen.listOfN(n, Gen.frequency(
        9 -> Gen.alphaLowerChar, 2 -> Gen.numChar)).map(_.mkString))
    val sepGen = Gen.oneOf(" ", "  ", ", ", "... ", "! ", "\n", " - ")
    val docGen = Gen.choose(0, 12).flatMap(n =>
      Gen.listOfN(n, for { w <- wordGen; s <- sepGen } yield w + s)
        .map(_.mkString))
    (1 to Rounds).foreach { i =>
      val seed = org.scalacheck.rng.Seed(42L + i)
      val texts = Gen.listOfN(30, docGen).pureApply(Gen.Parameters.default, seed)
      val nMerges = 1 + i  // 2..6 across rounds
      val seqLen = 8 + 7 * i
      val docs = texts.zipWithIndex.map { case (t, j) => (j.toLong, t) }
        .toDF("doc_id", "text")
      val mt = Packing.bpeMergeTable(docs, nMerges = nMerges)
      val enc = Packing.encodeToIds(docs, mt).cache()
      // exact round trip for EVERY doc, whatever the merges learned
      val normalized = docs.select(col("doc_id"),
        expr("array_join(filter(split(lower(text), '[^a-z0-9]+'), t -> t != ''), ' ')").as("exp"))
      val bad = Packing.decodeIds(enc, mt).join(normalized, "doc_id")
        .filter(col("text") =!= col("exp")).count()
      assert(bad == 0L, s"round $i: $bad docs failed the encode/decode round trip")
      // the packed stream is exactly boundaries + ids in doc order + pads
      val packed = Packing.packTokenRows(enc, seqLen = seqLen)
      val stream = packed.orderBy("row_id")
        .select(expr("explode(ids)").as("t")).as[Int].collect().toSeq
      val expected = enc.orderBy("doc_id")
        .select("ids").as[Seq[Int]].collect().flatMap(0 +: _).toSeq
      assert(stream.take(expected.size) == expected, s"round $i: stream mismatch")
      assert(stream.drop(expected.size).forall(_ == 1), s"round $i: tail not padded")
      assert(stream.size % seqLen == 0, s"round $i: ragged rows")
      enc.unpersist()
    }
  }
}
