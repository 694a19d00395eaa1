package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode

import graft.SparkTestBase

/** Structured-Streaming ingest: windowed event-time aggregation with
  * watermark, and stateful running per-user features, driven through
  * MemoryStream micro-batches.
  */
class EventStreamSpec extends SparkTestBase {
  import spark.implicits._
  import EventStream._

  test("ingest dedup drops replayed events within the watermark") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Event]
    // dedup -> windowed counts: each event counted once despite replays
    val query = windowedCounts(dedupedEvents(input.toDF()))
      .writeStream.format("memory").queryName("dwc").outputMode(OutputMode.Update()).start()
    try {
      input.addData(
        Event("u1", "click", ts("2024-01-01 10:05:00"), 1.0),
        Event("u1", "click", ts("2024-01-01 10:05:00"), 1.0)) // same-batch dup
      query.processAllAvailable()
      // replay of the same event in a LATER micro-batch (at-least-once source)
      input.addData(Event("u1", "click", ts("2024-01-01 10:05:00"), 1.0))
      query.processAllAvailable()
      val rows = spark.table("dwc")
        .select("user_id", "n_events").as[(String, Long)].collect().toSet
      rows shouldBe Set(("u1", 1L))
    } finally query.stop()
  }

  test("streaming HLL registers across micro-batches == batch sketch, bit for bit") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(String, String)]
    // complete mode: the sink table holds the full register state each
    // trigger — registers only ratchet upward, state stays <= groups x m
    val query = EventStream.approxDistinctRegisters(
        input.toDF().toDF("g", "v"), "g", "v")
      .writeStream.format("memory").queryName("hllregs")
      .outputMode(OutputMode.Complete()).start()
    try {
      val batch1 = (1 to 400).map(i => ("a", s"user-$i")) :+ (("b", "x1"))
      val batch2 = (201 to 600).map(i => ("a", s"user-$i")) :+ (("b", "x2")) // 200 dups replayed
      input.addData(batch1)
      query.processAllAvailable()
      input.addData(batch2)
      query.processAllAvailable()
      val streamed = graft.operators.Sketches
        .estimateSparse(spark.table("hllregs"), Seq("g"))
        .as[(String, Double)].collect().toMap
      val batch = graft.operators.Sketches
        .approxDistinct((batch1 ++ batch2).toDF("g", "v"), "g", "v")
        .as[(String, Double)].collect().toMap
      streamed shouldBe batch // batch boundaries invisible to max-merge
      // and the estimate is actually tracking: 600 distinct in group a
      streamed("a") should (be > 550.0 and be < 650.0)
    } finally query.stop()
  }

  test("windowed counts aggregate by tumbling event-time window") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Event]
    val query = windowedCounts(input.toDF(), windowLen = "1 hour", watermark = "2 hours")
      .writeStream.format("memory").queryName("wc").outputMode(OutputMode.Update()).start()
    try {
      input.addData(
        Event("u1", "click", ts("2024-01-01 10:05:00"), 1.0),
        Event("u1", "click", ts("2024-01-01 10:45:00"), 2.0),
        Event("u1", "click", ts("2024-01-01 11:05:00"), 4.0),
        Event("u2", "purchase", ts("2024-01-01 10:10:00"), 8.0))
      query.processAllAvailable()
      val rows = spark.table("wc")
        .select("user_id", "event_type", "window_start", "n_events", "sum_value")
        .as[(String, String, java.sql.Timestamp, Long, Double)].collect().toSet
      rows should contain(("u1", "click", ts("2024-01-01 10:00:00"), 2L, 3.0))
      rows should contain(("u1", "click", ts("2024-01-01 11:00:00"), 1L, 4.0))
      rows should contain(("u2", "purchase", ts("2024-01-01 10:00:00"), 1L, 8.0))
    } finally query.stop()
  }

  test("session windows merge gapped events and split distant ones") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Event]
    // session aggregation only supports Append: a session emits once the
    // watermark passes its close — so a later event must advance the clock
    val query = sessionStats(input.toDF(), gap = "30 minutes", watermark = "2 hours")
      .writeStream.format("memory").queryName("sess").outputMode(OutputMode.Append()).start()
    try {
      input.addData(
        Event("u1", "click", ts("2024-01-01 10:00:00"), 1.0),
        Event("u1", "view", ts("2024-01-01 10:20:00"), 2.0),  // <30m gap: same session
        Event("u1", "click", ts("2024-01-01 12:00:00"), 4.0)) // >30m gap: new session
      query.processAllAvailable()
      // advance the watermark to 14:00 (16:00 - 2h) so both sessions close
      input.addData(Event("u2", "click", ts("2024-01-01 16:00:00"), 0.0))
      query.processAllAvailable()
      val rows = spark.table("sess")
        .select("user_id", "session_start", "n_events", "sum_value")
        .as[(String, java.sql.Timestamp, Long, Double)].collect().toSet
      rows should contain(("u1", ts("2024-01-01 10:00:00"), 2L, 3.0))
      rows should contain(("u1", ts("2024-01-01 12:00:00"), 1L, 4.0))
    } finally query.stop()
  }

  test("running user features accumulate across micro-batches") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Event]
    val query = runningUserFeatures(input.toDS())
      .writeStream.format("memory").queryName("ruf").outputMode(OutputMode.Append()).start()
    try {
      input.addData(Event("u1", "click", ts("2024-01-01 10:00:00"), 1.0))
      query.processAllAvailable()
      input.addData(
        Event("u1", "purchase", ts("2024-01-01 11:00:00"), 5.0),
        Event("u1", "click", ts("2024-01-01 12:00:00"), 1.0))
      query.processAllAvailable()
      val snaps = spark.table("ruf").as[UserFeatureState].collect()
        .filter(_.user_id == "u1").sortBy(_.event_count)
      snaps.last.event_count shouldBe 3L
      snaps.last.purchase_count shouldBe 1L
      snaps.last.last_event_ts shouldBe ts("2024-01-01 12:00:00")
    } finally query.stop()
  }

  test("file-source readStream drives the same windowed aggregation") {
    // the real ingestion shape: readStream over a parquet directory with
    // an explicit schema (streaming sources cannot infer), new files
    // become micro-batches
    val dir = s"/tmp/graft-stream-src-${System.nanoTime()}"
    Seq(
      Event("u1", "click", ts("2024-01-01 10:05:00"), 1.0),
      Event("u1", "click", ts("2024-01-01 10:45:00"), 2.0)).toDS()
      .write.parquet(dir)
    val stream = spark.readStream
      .schema(Seq.empty[Event].toDS().schema)
      .parquet(dir)
    val query = windowedCounts(stream, windowLen = "1 hour", watermark = "2 hours")
      .writeStream.format("memory").queryName("fwc").outputMode(OutputMode.Update()).start()
    try {
      query.processAllAvailable()
      val rows = spark.table("fwc")
        .select("user_id", "n_events", "sum_value")
        .as[(String, Long, Double)].collect().toSet
      rows shouldBe Set(("u1", 2L, 3.0))
    } finally {
      query.stop()
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(dir))
    }
  }

  test("streaming KV sync pushes fresh snapshots per micro-batch") {
    implicit val sqlCtx = spark.sqlContext
    import graft.sources.InMemoryKVStore
    InMemoryKVStore.clear()
    val input = MemoryStream[Event]
    val query = kvSyncWriter(runningUserFeatures(input.toDS()), () => InMemoryKVStore)
      .option("checkpointLocation", s"/tmp/graft-ckpt-${System.nanoTime()}")
      .start()
    try {
      input.addData(Event("u1", "click", ts("2024-01-01 10:00:00"), 1.0))
      query.processAllAvailable()
      input.addData(Event("u1", "purchase", ts("2024-01-01 11:00:00"), 5.0))
      query.processAllAvailable()
      val json = InMemoryKVStore.get("features_rt:u1").get
      json should include(""""event_count":"2"""")
      json should include(""""purchase_count":"1"""")
    } finally query.stop()
  }

  test("transformWithState twin matches flatMapGroupsWithState snapshots (true parity)") {
    implicit val sqlCtx = spark.sqlContext
    val key = "spark.sql.streaming.stateStore.providerClass"
    val prevConf = spark.conf.getOption(key)
    spark.conf.set(rocksdbStateStoreConf._1, rocksdbStateStoreConf._2)
    val ckpt = s"/tmp/graft-tws-ckpt-${System.nanoTime()}"
    try {
      // BOTH formulations consume the identical micro-batch sequence —
      // multiple users, purchase-first user, cross-batch accumulation —
      // and every emitted snapshot must match, not just a scripted final
      val batches = Seq(
        Seq(Event("u1", "click", ts("2024-01-01 10:00:00"), 1.0),
          Event("u2", "purchase", ts("2024-01-01 10:10:00"), 9.0)),
        Seq(Event("u1", "purchase", ts("2024-01-01 11:00:00"), 5.0),
          Event("u1", "click", ts("2024-01-01 12:00:00"), 1.0),
          Event("u3", "view", ts("2024-01-01 11:30:00"), 0.5)))
      def run(name: String, mk: org.apache.spark.sql.Dataset[Event] => org.apache.spark.sql.Dataset[UserFeatureState]): Set[UserFeatureState] = {
        val input = MemoryStream[Event]
        val query = mk(input.toDS())
          .writeStream.format("memory").queryName(name).outputMode(OutputMode.Append())
          .option("checkpointLocation", s"$ckpt/$name")
          .start()
        try {
          batches.foreach { b => input.addData(b: _*); query.processAllAvailable() }
          spark.table(name).as[UserFeatureState].collect().toSet
        } finally query.stop()
      }
      val tws = run("tws_par", ds => runningUserFeaturesTws(ds))
      val fmgws = run("fmgws_par", ds => runningUserFeatures(ds))
      tws shouldBe fmgws
      tws.exists(s => s.user_id == "u1" && s.event_count == 3L) shouldBe true
    } finally {
      prevConf match {
        case Some(v) => spark.conf.set(key, v)
        case None => spark.conf.unset(key)
      }
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(ckpt))
    }
  }

  test("serving read sees a streaming-synced user (stream -> KV -> lookup E2E)") {
    implicit val sqlCtx = spark.sqlContext
    import graft.serving.FeatureLookup
    import graft.sources.InMemoryKVStore
    InMemoryKVStore.clear()
    val input = MemoryStream[Event]
    val query = kvSyncWriter(runningUserFeatures(input.toDS()), () => InMemoryKVStore)
      .option("checkpointLocation", s"/tmp/graft-ckpt-${System.nanoTime()}")
      .start()
    try {
      input.addData(
        Event("u9", "click", ts("2024-01-01 10:00:00"), 1.0),
        Event("u9", "purchase", ts("2024-01-01 11:30:00"), 9.0))
      query.processAllAvailable()
      // the serving-tier decode, not a raw KV peek
      val got = FeatureLookup.onlineRealtime(InMemoryKVStore, "u9").get
      got.event_count shouldBe Some(2L)
      got.purchase_count shouldBe Some(1L)
      got.last_event_ts shouldBe Some("2024-01-01 11:30:00")
      got.source shouldBe "online_rt"
      // unknown user is the serving 404
      FeatureLookup.onlineRealtime(InMemoryKVStore, "nobody") shouldBe None
      // and the realtime keyspace never shadows the batch one
      FeatureLookup.online(InMemoryKVStore, "u9") shouldBe None
    } finally query.stop()
  }

  test("stream-stream attribution joins labels to prior-interval events only") {
    implicit val sqlCtx = spark.sqlContext
    val events = MemoryStream[Event]
    val labels = MemoryStream[LabelAt]
    val query = attributedLabels(events.toDF(), labels.toDF(), lookback = "1 hour")
      .writeStream.format("memory").queryName("attr").outputMode(OutputMode.Append()).start()
    try {
      events.addData(
        Event("u1", "click", ts("2024-01-01 10:00:00"), 1.0),    // in window (= boundary)
        Event("u1", "view", ts("2024-01-01 10:50:00"), 2.0),     // in window
        Event("u1", "purchase", ts("2024-01-01 11:30:00"), 9.0), // AFTER label: leakage, excluded
        Event("u2", "click", ts("2024-01-01 09:00:00"), 1.0))    // other user
      labels.addData(
        LabelAt("u1", 1.0, ts("2024-01-01 11:00:00")),
        LabelAt("u3", 0.0, ts("2024-01-01 11:00:00")))           // no events: inner join drops
      query.processAllAvailable()
      val rows = spark.table("attr")
        .select("user_id", "event_type", "value")
        .as[(String, String, Double)].collect().toSet
      rows shouldBe Set(("u1", "click", 1.0), ("u1", "view", 2.0))
    } finally query.stop()
  }

  test("streaming CMS cells across micro-batches == batch sketch, bit for bit") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[String]
    // complete mode: the sink holds the full cell table each trigger —
    // state stays <= depth x width rows forever (counts only grow)
    val query = EventStream.freqSketchCells(input.toDF().toDF("v"), "v")
      .writeStream.format("memory").queryName("cmscells")
      .outputMode(OutputMode.Complete()).start()
    try {
      val batch1 = (1 to 300).map(i => s"tok-${i % 40}")
      val batch2 = (1 to 200).map(i => s"tok-${i % 25}")   // heavy overlap
      input.addData(batch1)
      query.processAllAvailable()
      input.addData(batch2)
      query.processAllAvailable()
      val streamed = spark.table("cmscells")
        .select("r", "idx", "cnt").as[(Int, Long, Long)].collect().toSet
      val batch = graft.operators.FrequencySketch
        .sketch((batch1 ++ batch2).toDF("v"), "v")
        .select("r", "idx", "cnt").as[(Int, Long, Long)].collect().toSet
      streamed shouldBe batch // batch boundaries invisible to sum-merge
      // and estimates read off the streamed cells bound the true counts
      val est = graft.operators.FrequencySketch
        .estimate(spark.table("cmscells"), Seq("tok-1").toDF("v"), "v")
        .select("cms_est").as[Long].head()
      est should be >= (batch1 ++ batch2).count(_ == "tok-1").toLong
    } finally query.stop()
  }

  test("batch sessionize agrees with streaming session windows on session structure") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Event]
    val query = sessionStats(input.toDF(), gap = "30 minutes", watermark = "2 hours")
      .writeStream.format("memory").queryName("sessparity")
      .outputMode(OutputMode.Append()).start()
    val evs = Seq(
      Event("u1", "click", ts("2024-01-01 10:00:00"), 1.0),
      Event("u1", "view", ts("2024-01-01 10:20:00"), 2.0),
      Event("u1", "click", ts("2024-01-01 12:00:00"), 4.0),
      Event("u1", "purchase", ts("2024-01-01 12:10:00"), 8.0),
      Event("u2", "signup", ts("2024-01-01 09:00:00"), 0.0))
    try {
      input.addData(evs)
      query.processAllAvailable()
      // closer event advances the watermark so all real sessions emit
      input.addData(Event("u3", "click", ts("2024-01-01 20:00:00"), 0.0))
      query.processAllAvailable()
      val streamed = spark.table("sessparity")
        .filter("user_id <> 'u3'")
        .select("user_id", "session_start", "n_events")
        .as[(String, java.sql.Timestamp, Long)].collect()
        .map { case (u, start, n) => (u, start.getTime * 1000L, n) }.toSet
      // batch twin over the SAME rows (event ids synthesized in input
      // order; none of the test gaps sits exactly on the 30m boundary,
      // where the two definitions differ: batch merges an exactly-gap
      // successor, streaming's [ts, ts+gap) window excludes it)
      val batchDf = evs.zipWithIndex
        .map { case (e, i) => (i.toLong, e.user_id, e.ts, e.event_type) }
        .toDF("event_id", "user_id", "ts", "event_type")
      val batch = graft.operators.Sessionize.sessions(batchDf, gapSeconds = 1800L)
        .select("user_id", "start_us", "n_events")
        .as[(String, Long, Long)].collect().toSet
      streamed shouldBe batch
    } finally query.stop()
  }

  test("streaming histogram bins across micro-batches == batch histogram, bit for bit") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Double]
    val query = EventStream.histogramBins(input.toDF().toDF("x"), "x", precision = 2)
      .writeStream.format("memory").queryName("histbins")
      .outputMode(OutputMode.Complete()).start()
    try {
      val batch1 = (1 to 200).map(i => (i % 37) * 0.125)
      val batch2 = (1 to 150).map(i => (i % 23) * 0.25)
      input.addData(batch1)
      query.processAllAvailable()
      input.addData(batch2)
      query.processAllAvailable()
      val streamed = spark.table("histbins")
        .select("v", "cnt").as[(Double, Long)].collect().toSet
      val batch = graft.operators.Quantiles
        .histogram((batch1 ++ batch2).toDF("x"), "x", precision = 2)
        .select("v", "cnt").as[(Double, Long)].collect().toSet
      streamed shouldBe batch
      // and a quantile read off the streamed bins matches the batch one
      val thrStream = graft.operators.Quantiles.thresholdFromHistogram(
          spark.table("histbins").withColumn("g", org.apache.spark.sql.functions.lit(1)),
          "g", 1L, 2L).select("threshold").as[Double].head()
      val thrBatch = graft.operators.Quantiles.quantileThreshold(
          (batch1 ++ batch2).toDF("x"), "x", 1L, 2L, 2)
        .select("threshold").as[Double].head()
      thrStream shouldBe thrBatch
    } finally query.stop()
  }
  test("streaming contamination gate across micro-batches == batch audit, bit for bit") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val quote = "the exact benchmark answer string that must never appear in training data at all"
    val benchmark = Seq((9001L, s"question preamble text $quote closing rubric words"))
      .toDF("doc_id", "text")
    // anchor STATE computed once, persisted -- micro-batches reuse it
    val anchors = graft.operators.Contamination.benchmarkAnchors(benchmark).persist()
    val input = MemoryStream[(Long, String)]
    val collected = scala.collection.mutable.ArrayBuffer.empty[(Long, Long, Long, Long)]
    val query = EventStream.contaminationGateWriter(
        input.toDF().toDF("doc_id", "text"), anchors,
        (out, _) => collected.synchronized {
          collected ++= out.select("doc_id", "n_bench_docs", "n_anchors", "max_extent")
            .as[(Long, Long, Long, Long)].collect()
        })
      .start()
    try {
      val filler = (1 to 40).map(i => s"w$i z$i").mkString(" ")
      val batch1 = Seq(
        (1L, s"clean document one $filler nothing shared here"),
        (2L, s"a contaminated page begins $quote and then continues $filler"))
      val batch2 = Seq(
        (3L, s"another clean one $filler totally fine"),
        (4L, s"$filler $quote"))
      input.addData(batch1); query.processAllAvailable()
      input.addData(batch2); query.processAllAvailable()
      val batchAudit = graft.operators.Contamination
        .substringContamination((batch1 ++ batch2).toDF("doc_id", "text"), benchmark)
        .select("doc_id", "n_bench_docs", "n_anchors", "max_extent")
        .as[(Long, Long, Long, Long)].collect().toSet
      collected.toSet shouldBe batchAudit // every column, bit for bit
      collected.map(_._1).toSet shouldBe Set(2L, 4L) // and only the planted docs
    } finally { query.stop(); anchors.unpersist() }
  }
  test("streaming fuzzy-contamination gate: frozen benchmark signatures across micro-batches == batch audit") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val core = (1 to 40).map(i => s"token$i").mkString(" ")
    val benchmark = Seq(
      (9001L, core),
      (9002L, (1 to 40).map(i => s"other$i").mkString(" "))).toDF("doc_id", "text")
    // benchmark SIGNED once, persisted — micro-batches reuse it
    val beSigs = graft.operators.Dedup.signatures(benchmark).persist()
    val input = MemoryStream[(Long, String)]
    val collected = scala.collection.mutable.ArrayBuffer.empty[(Long, Long, Double, Long)]
    val query = EventStream.fuzzyContaminationGateWriter(
        input.toDF().toDF("doc_id", "text"), beSigs, threshold = 0.5,
        sink = (out, _) => collected.synchronized {
          collected ++= out.select("doc_id", "n_bench_docs", "max_jaccard", "best_bench_id")
            .as[(Long, Long, Double, Long)].collect()
        })
      .start()
    try {
      val batch1 = Seq(
        (1L, (1 to 36).map(i => s"token$i").mkString(" ") + " changed tail words here"),
        (2L, (1 to 40).map(i => s"clean$i").mkString(" ")))
      val batch2 = Seq((3L, core), (4L, (1 to 40).map(i => s"spotless$i").mkString(" ")))
      input.addData(batch1); query.processAllAvailable()
      input.addData(batch2); query.processAllAvailable()
      val batchAudit = graft.operators.Contamination
        .fuzzyContamination((batch1 ++ batch2).toDF("doc_id", "text"), benchmark,
          threshold = 0.5)
        .select("doc_id", "n_bench_docs", "max_jaccard", "best_bench_id")
        .as[(Long, Long, Double, Long)].collect().toSet
      collected.toSet shouldBe batchAudit // per-batch independence: identical report
      collected.map(_._1).toSet shouldBe Set(1L, 3L) // only the planted near-dups
    } finally { query.stop(); beSigs.unpersist() }
  }

  test("streaming self-dedup gate: chained micro-batch eras == the one-shot pair recompute") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val statePath = java.nio.file.Files.createTempDirectory("graft_sdgate").toString
    val quote = "a long verbatim passage that easily clears the forty eight character minimum length"
    val filler = (1 to 30).map(i => s"pad$i qq$i").mkString(" ")
    val b1 = Seq(
      (1L, s"first doc contains $quote and more"),
      (2L, s"clean one $filler"))
    val b2 = Seq(
      (3L, s"later doc also quotes $quote differently framed"), // pairs with 1
      (4L, "another clean " +
        (1 to 30).map(i => s"zz$i ww$i").mkString(" ")))
    val input = MemoryStream[(Long, String)]
    val collected = scala.collection.mutable.ArrayBuffer.empty[(Long, Long)]
    val query = EventStream.substringDedupGateWriter(
        input.toDF().toDF("doc_id", "text"), statePath,
        sink = (out, _) => collected.synchronized {
          collected ++= out.select("id_a", "id_b").as[(Long, Long)].collect()
        })
      .start()
    try {
      input.addData(b1); query.processAllAvailable()
      input.addData(b2); query.processAllAvailable()
      val oneShot = graft.operators.Dedup.substringPairs((b1 ++ b2).toDF("doc_id", "text"))
        .select("id_a", "id_b").as[(Long, Long)].collect().toSet
      collected.toSet shouldBe oneShot          // chained eras == one-shot
      collected.toSet shouldBe Set((1L, 3L))    // and it is the planted pair
      // state accumulated: both tables cover all four docs
      spark.read.parquet(s"$statePath/texts").count() shouldBe 4L
      spark.read.parquet(s"$statePath/anchors")
        .select("id").distinct().count() shouldBe 4L
    } finally {
      query.stop()
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(statePath))
    }
  }

  test("streaming media-dedup gate: chained micro-batches == one-shot pairs; payloads fingerprint once") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val statePath = java.nio.file.Files.createTempDirectory("graft_mediagate").toString
    // batch 1 carries keys 1-3's PNGs; batch 2 brings their JPEG mates
    // (cross-batch near-dups) plus key 4's full pair (within-batch)
    def rows(r: Range, fmt: String) = r.map { k =>
      (if (fmt == "png") 2L * k else 2L * k + 1,
        graft.operators.Multimodal.encodeTestCard(k.toLong, fmt),
        if (fmt == "png") "png" else "jpeg")
    }
    val b1 = rows(1 to 3, "png")
    val b2 = rows(1 to 3, "jpg") ++ rows(4 to 4, "png") ++ rows(4 to 4, "jpg")
    val input = MemoryStream[(Long, Array[Byte], String)]
    val collected = scala.collection.mutable.ArrayBuffer.empty[(Long, Long)]
    val query = EventStream.mediaDedupGateWriter(
        graft.operators.Multimodal.asMedia(
          input.toDF().toDF("id", "payload", "fmt"), "id", "payload", "fmt"),
        statePath,
        fingerprint = graft.operators.Multimodal.imageHashState,
        fpConfig = "image",
        sink = (out, _) => collected.synchronized {
          collected ++= out.select("id_a", "id_b").as[(Long, Long)].collect()
        })
      .start()
    try {
      input.addData(b1); query.processAllAvailable()
      val afterB1 = collected.size // no pairs yet: PNGs of distinct cards
      afterB1 shouldBe 0
      input.addData(b2); query.processAllAvailable()
      val oneShot = graft.operators.Multimodal.perceptualImagePairs(
        graft.operators.Multimodal.asMedia(
          (b1 ++ b2).toDF("id", "payload", "fmt"), "id", "payload", "fmt"))
        .select("id_a", "id_b").as[(Long, Long)].collect().toSet
      collected.toSet shouldBe oneShot
      collected.toSet shouldBe (1L to 4L).map(k => (2 * k, 2 * k + 1)).toSet
      // state accumulated one fingerprint row per payload + the config marker
      spark.read.parquet(s"$statePath/hashes").count() shouldBe 8L
      spark.read.parquet(s"$statePath/fp_config").head().getString(0) shouldBe "image"
    } finally {
      query.stop()
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(statePath))
    }
  }

  test("media-dedup gate: a mismatched or missing fp_config marker fails loudly before any fold") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    def runOne(statePath: String, fpConfig: String): Throwable = {
      val input = MemoryStream[(Long, Array[Byte], String)]
      val query = EventStream.mediaDedupGateWriter(
          graft.operators.Multimodal.asMedia(
            input.toDF().toDF("id", "payload", "fmt"), "id", "payload", "fmt"),
          statePath, fingerprint = graft.operators.Multimodal.imageHashState,
          fpConfig = fpConfig, sink = (_, _) => ())
        .start()
      try {
        input.addData(Seq((2L, graft.operators.Multimodal.encodeTestCard(1L, "png"), "png")))
        intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
          query.processAllAvailable()
        }
      } finally query.stop()
    }
    // mismatched marker
    val sp1 = java.nio.file.Files.createTempDirectory("graft_mg_v").toString
    Seq("video:stride=2").toDF("fp_config").write.parquet(s"$sp1/fp_config")
    Seq((1L, 42L)).toDF("id", "hash").write.parquet(s"$sp1/hashes")
    runOne(sp1, "image").getMessage should include("use a separate state path")
    // hashes with NO marker: unknown configuration
    val sp2 = java.nio.file.Files.createTempDirectory("graft_mg_m").toString
    Seq((1L, 42L)).toDF("id", "hash").write.parquet(s"$sp2/hashes")
    runOne(sp2, "image").getMessage should include("no fp_config marker")
    Seq(sp1, sp2).foreach(p =>
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(p)))
  }

  test("url-dedup gate: existing pages with NO canon_version marker fail loudly (pre-v2 state)") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val statePath = java.nio.file.Files.createTempDirectory("graft_urlgate_m").toString
    Seq(("https://example.com/a", 1L, 1L))
      .toDF("canonical_url", "keeper_id", "group_size")
      .write.parquet(s"$statePath/pages")
    val input = MemoryStream[(Long, String)]
    val query = EventStream.urlDedupGateWriter(
        input.toDF().toDF("doc_id", "url"), statePath, sink = (_, _) => ())
      .start()
    try {
      input.addData(Seq((2L, "https://example.com/a")))
      val e = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
        query.processAllAvailable()
      }
      e.getMessage should include("no canon_version marker")
    } finally {
      query.stop()
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(statePath))
    }
  }

  test("pack gate: an all-filtered first micro-batch does not wedge the state") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val statePath = java.nio.file.Files.createTempDirectory("graft_packgate_e").toString
    val corpus = Seq((10L, "the cat sat"), (11L, "the thin cat")).toDF("doc_id", "text")
    val merges = graft.operators.Packing.bpeMergeTable(corpus, nMerges = 2)
    val input = MemoryStream[(Long, String)]
    val query = EventStream.packGateWriter(
        // upstream filter: ids < 10 vanish — batch 1 arrives EMPTY
        input.toDF().toDF("doc_id", "text").filter($"doc_id" >= 10),
        merges, statePath, sink = (_, _) => (), seqLen = 16)
      .start()
    try {
      input.addData(Seq((1L, "filtered away"))); query.processAllAvailable()
      input.addData(Seq((10L, "the cat sat"))); query.processAllAvailable()
      input.addData(Seq((11L, "the thin cat"))); query.processAllAvailable()
      val state = graft.operators.Packing.latestPackedRows(
          spark.read.parquet(s"$statePath/packed"))
        .as[(Long, Seq[Int], Long)].collect().toSet
      val oneShot = graft.operators.Packing.packTokenRows(
          graft.operators.Packing.encodeToIds(corpus, merges), seqLen = 16)
        .as[(Long, Seq[Int], Long)].collect().toSet
      state shouldBe oneShot
    } finally {
      query.stop()
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(statePath))
    }
  }

  test("pack gate replay: a re-delivered batch id re-emits the same tail and never duplicates the corpus") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val statePath = java.nio.file.Files.createTempDirectory("graft_packreplay").toString
    val b1 = Seq((10L, "the cat sat on the mat"), (11L, "the thin cat sat"))
    val b2 = Seq((12L, "a cat on a mat sat"))
    val corpus = (b1 ++ b2).toDF("doc_id", "text")
    val merges = graft.operators.Packing.bpeMergeTable(corpus, nMerges = 2)
    def runStream(batches: Seq[Seq[(Long, String)]]): Seq[Set[(Long, Seq[Int], Long)]] = {
      val input = MemoryStream[(Long, String)]
      val got = scala.collection.mutable.ArrayBuffer.empty[Set[(Long, Seq[Int], Long)]]
      val query = EventStream.packGateWriter(
          input.toDF().toDF("doc_id", "text"), merges, statePath,
          sink = (out, _) => got.synchronized {
            got += out.select("row_id", "ids", "n_pad")
              .as[(Long, Seq[Int], Long)].collect().toSet
          }, seqLen = 16)
        .start()
      try {
        batches.foreach { b => input.addData(b); query.processAllAvailable() }
        got.toSeq
      } finally { query.stop(); () }
    }
    try {
      val first = runStream(Seq(b1)).head
      // a FRESH stream re-delivers b1 as batchId 0 while its era-0 tail
      // already sits in the packed log — the crash-between-append-and-
      // commit shape. The reader must EXCLUDE its own era, or the replay
      // reads its own tail back and packs the batch AGAIN at fresh
      // row_ids (which latest-era-wins can never collapse). The replayed
      // stream then chains b2 as batch 1 to prove the state stayed sound.
      val replayed = runStream(Seq(b1, b2))
      replayed.head shouldBe first
      val state = graft.operators.Packing.latestPackedRows(
          spark.read.parquet(s"$statePath/packed"))
        .as[(Long, Seq[Int], Long)].collect().toSet
      val oneShot = graft.operators.Packing.packTokenRows(
          graft.operators.Packing.encodeToIds(corpus, merges), seqLen = 16)
        .as[(Long, Seq[Int], Long)].collect().toSet
      state shouldBe oneShot
    } finally {
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(statePath))
    }
  }

  test("url-dedup gate replay: a re-delivered batch id reports the same group_size, state unchanged") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val statePath = java.nio.file.Files.createTempDirectory("graft_urlreplay").toString
    val b1 = Seq(
      (1L, "https://Example.com/a/?utm_source=x"),
      (2L, "https://example.com/b"),
      (3L, "https://example.com:443/a//")) // page A twice WITHIN the batch
    def runOnce(): Set[(Long, String, Long, Long, Int)] = {
      val input = MemoryStream[(Long, String)]
      var got = Set.empty[(Long, String, Long, Long, Int)]
      val query = EventStream.urlDedupGateWriter(
          input.toDF().toDF("doc_id", "url"), statePath,
          sink = (out, _) => {
            got = out.select("doc_id", "canonical_url", "keeper_id", "group_size", "is_dup")
              .as[(Long, String, Long, Long, Int)].collect().toSet
          })
        .start()
      try { input.addData(b1); query.processAllAvailable(); got }
      finally { query.stop(); () }
    }
    try {
      val first = runOnce()
      // page A's group_size reads 2 at first ingest (two in-batch crawls)
      first.find(_._1 == 1L).get._4 shouldBe 2L
      // fresh stream re-delivers b1 as batchId 0 while the batch's pages
      // partial already sits in the state dir — the crash-replay shape.
      // The fold must collapse the re-delivered partial against the
      // stored identical rows, or group_size double-counts to 4.
      val replayed = runOnce()
      replayed shouldBe first
      // and the state still holds exactly one copy of the batch's pages
      graft.operators.Dedup.normalizeUrlState(
          spark.read.parquet(s"$statePath/pages"))
        .orderBy("canonical_url").collect().toSeq shouldBe
        graft.operators.Dedup.urlState(b1.toDF("doc_id", "url"))
          .orderBy("canonical_url").collect().toSeq
    } finally {
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(statePath))
    }
  }

  test("streaming EWMA gate: chained micro-batches == one-shot state; replay idempotent") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val statePath = java.nio.file.Files.createTempDirectory("graft_ewmagate").toString
    def ev(id: Long, day: Int, user: Long, v: Double) =
      (id, java.sql.Timestamp.valueOf(f"2024-01-$day%02d 06:00:00"), user, "e", v)
    val b1 = Seq(ev(1, 1, 7, 1.0), ev(2, 2, 7, 2.0), ev(3, 1, 8, 4.0))
    val b2 = Seq(ev(4, 3, 7, 0.5), ev(5, 4, 9, 1.0)) // user 8 untouched
    def runStream(batches: Seq[Seq[(Long, java.sql.Timestamp, Long, String, Double)]])
        : Seq[Map[Long, (Long, Long)]] = {
      val input = MemoryStream[(Long, java.sql.Timestamp, Long, String, Double)]
      val got = scala.collection.mutable.ArrayBuffer.empty[Map[Long, (Long, Long)]]
      val query = EventStream.ewmaGateWriter(
          input.toDF().toDF("event_id", "ts", "user_id", "event_type", "value"),
          statePath,
          sink = (out, _) => got.synchronized {
            got += out.select("user_id", "n_events", "ewma_fp")
              .as[(Long, Long, Long)].collect().map(r => r._1 -> (r._2, r._3)).toMap
          })
        .start()
      try {
        batches.foreach { b => input.addData(b); query.processAllAvailable() }
        got.toSeq
      } finally { query.stop(); () }
    }
    try {
      val first = runStream(Seq(b1))
      // trigger 1 emits exactly the batch's users
      first.head.keySet shouldBe Set(7L, 8L)
      // a FRESH stream re-delivers b1 as batchId 0 with its era-0 rows
      // already in the log — the crash-replay shape; the own-era
      // exclusion must make the replayed emission identical. The second
      // trigger then chains b2: only touched users emit, untouched user 8
      // keeps its stored state.
      val replayed = runStream(Seq(b1, b2))
      replayed.head shouldBe first.head
      replayed(1).keySet shouldBe Set(7L, 9L)
      // latest-era snapshot == the one-shot state over everything
      val all = (b1 ++ b2).toDF("event_id", "ts", "user_id", "event_type", "value")
      val oneShot = graft.operators.DecayFeatures.ewmaState(all)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sortBy(_._1)
      val raw = spark.read.parquet(s"$statePath/ewma")
      val snapshot = raw.groupBy(col("user_id"))
        .agg(org.apache.spark.sql.functions.max_by(
          org.apache.spark.sql.functions.struct(col("n_events"), col("ewma_fp")),
          col("era")).as("v"))
        .select(col("user_id"), col("v.n_events"), col("v.ewma_fp"))
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sortBy(_._1)
      snapshot shouldBe oneShot
      // O(batch) eras: era 1 holds only b2's touched users
      raw.filter(col("era") === 1L).select("user_id").as[Long]
        .collect().toSet shouldBe Set(7L, 9L)
    } finally {
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(statePath))
    }
  }

  test("streaming expectations gate: per-batch verdicts == batch operator; circuit breaker stops bad ingest") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    import graft.operators.Expectations._
    val rules = Seq(NotNull("text"), Unique(Seq("id")),
      InSet("lang", Seq("en", "de")))
    val good = Seq((1L, Option("a"), "en"), (2L, Option("b"), "de"))
    val bad = Seq((3L, Option.empty[String], "xx"), (3L, Option("c"), "en"))
    def run(batches: Seq[Seq[(Long, Option[String], String)]],
            breaker: Boolean): Seq[Map[String, (Long, Int)]] = {
      val input = MemoryStream[(Long, Option[String], String)]
      val got = scala.collection.mutable.ArrayBuffer.empty[Map[String, (Long, Int)]]
      val query = EventStream.expectationsGateWriter(
          input.toDF().toDF("id", "text", "lang"), rules,
          sink = (out, _) => got.synchronized {
            got += out.select("rule", "n_violations", "passed")
              .as[(String, Long, Int)].collect().map(r => r._1 -> (r._2, r._3)).toMap
          }, failOnViolation = breaker)
        .start()
      try {
        batches.foreach { b => input.addData(b); query.processAllAvailable() }
        got.toSeq
      } finally { query.stop(); () }
    }
    // verdicts match the batch operator per micro-batch
    val out = run(Seq(good, bad), breaker = false)
    out(0) shouldBe graft.operators.Expectations.check(
        good.toDF("id", "text", "lang"), rules)
      .select("rule", "n_violations", "passed")
      .as[(String, Long, Int)].collect().map(r => r._1 -> (r._2, r._3)).toMap
    out(0).values.map(_._2).toSet shouldBe Set(1)
    out(1) shouldBe Map("not_null" -> (1L, 0), "unique" -> (2L, 0),
      "in_set" -> (1L, 0))
    // the circuit breaker refuses the bad batch (good one passes first)
    an[Exception] should be thrownBy run(Seq(good, bad), breaker = true)
  }

  test("streaming traffic-anomaly gate: merged verdicts == batch; late days re-open; replay idempotent") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val statePath = java.nio.file.Files.createTempDirectory("graft_tagate").toString
    def day(d: Int, n: Int): Seq[(Long, java.sql.Timestamp)] =
      (1 to n).map(i => (d * 100L + i,
        java.sql.Timestamp.valueOf(f"2024-01-${d + 1}%02d 12:00:00")))
    val b1 = day(0, 10) ++ day(1, 10) ++ day(2, 10)
    // b2 carries new days AND a late day-0 straggler — the merged state
    // must re-open day 0, exactly like the batch increment
    val b2 = day(3, 16) ++ day(4, 10) ++
      Seq((9999L, java.sql.Timestamp.valueOf("2024-01-01 23:00:00")))
    def runStream(batches: Seq[Seq[(Long, java.sql.Timestamp)]])
        : Seq[Seq[(Long, Long, Option[Int])]] = {
      val input = MemoryStream[(Long, java.sql.Timestamp)]
      val got = scala.collection.mutable.ArrayBuffer.empty[Seq[(Long, Long, Option[Int])]]
      val query = EventStream.trafficAnomalyGateWriter(
          input.toDF().toDF("event_id", "ts"), statePath,
          sink = (out, _) => got.synchronized {
            got += out.orderBy("day").select("day", "n", "is_anomaly")
              .as[(Long, Long, Option[Int])].collect().toSeq
          }, windowDays = 2, kNum = 1, kDen = 1)
        .start()
      try {
        batches.foreach { b => input.addData(b); query.processAllAvailable() }
        got.toSeq
      } finally { query.stop(); () }
    }
    try {
      val first = runStream(Seq(b1))
      // crash-replay shape: a fresh stream re-delivers b1 as batchId 0
      // while the batch=0 partial already sits in the state dir — the
      // own-batch exclusion must emit the identical verdict table, then
      // trigger 2 folds b2 in
      val replayed = runStream(Seq(b1, b2))
      replayed.head shouldBe first.head
      // the final emission == the one-shot batch operator over everything
      val want = graft.operators.Anomaly.trafficAnomaly(
          (b1 ++ b2).toDF("event_id", "ts"), windowDays = 2, kNum = 1, kDen = 1)
        .orderBy("day").select("day", "n", "is_anomaly")
        .as[(Long, Long, Option[Int])].collect().toSeq
      replayed(1) shouldBe want
      // state partials sum-merge to the one-shot day counts (day 0 = 11)
      graft.operators.Anomaly.mergeDailyCounts(
          spark.read.parquet(s"$statePath/counts"),
          spark.emptyDataFrame.select(
            org.apache.spark.sql.functions.lit(0L).as("day"),
            org.apache.spark.sql.functions.lit(0L).as("n")).limit(0))
        .collect().map(r => (r.getLong(0), r.getLong(1))).toMap shouldBe
        graft.operators.Anomaly.dailyCounts((b1 ++ b2).toDF("event_id", "ts"))
          .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    } finally {
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(statePath))
    }
  }

  test("streaming attribution gate: chained credits == one-shot; replay idempotent; state window-bounded") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val statePath = java.nio.file.Files.createTempDirectory("graft_attrgate").toString
    def ev(id: Long, day: Int, user: Long, typ: String, v: Double) =
      (id, java.sql.Timestamp.valueOf(f"2024-01-$day%02d 06:00:00"), user, typ, v)
    val b1 = Seq(ev(1, 1, 7, "click", 0.0), ev(2, 3, 7, "click", 0.0),
      ev(3, 4, 7, "purchase", 10.0), ev(4, 2, 8, "click", 0.0))
    // b2's purchase reaches back to b1's click 2 (in-window) but not
    // click 1 (outside 7d); user 8's stored touch pairs with a b2 purchase
    val b2 = Seq(ev(5, 9, 7, "purchase", 3.0), ev(6, 8, 8, "purchase", 5.0))
    def runStream(batches: Seq[Seq[(Long, java.sql.Timestamp, Long, String, Double)]])
        : Seq[Set[(Long, Long, Long)]] = {
      val input = MemoryStream[(Long, java.sql.Timestamp, Long, String, Double)]
      val got = scala.collection.mutable.ArrayBuffer.empty[Set[(Long, Long, Long)]]
      val query = EventStream.attributionGateWriter(
          input.toDF().toDF("event_id", "ts", "user_id", "event_type", "value"),
          statePath,
          sink = (out, _) => got.synchronized {
            got += out.select("conv_event_id", "touch_event_id", "credit_fp")
              .as[(Long, Long, Long)].collect().toSet
          })
        .start()
      try {
        batches.foreach { b => input.addData(b); query.processAllAvailable() }
        got.toSeq
      } finally { query.stop(); () }
    }
    try {
      val first = runStream(Seq(b1))
      // trigger 1 credits only the batch's own conversion
      first.head shouldBe Set((3L, 1L, 5000000L), (3L, 2L, 5000000L))
      // a FRESH stream re-delivers b1 as batchId 0 with its era-0 rows
      // already in the log — the crash-replay shape; the own-era
      // exclusion + dropDuplicates must make the replayed emission
      // identical. The second trigger then chains b2.
      val replayed = runStream(Seq(b1, b2))
      replayed.head shouldBe first.head
      // union of every trigger's credits == the one-shot recompute
      val all = (b1 ++ b2).toDF("event_id", "ts", "user_id", "event_type", "value")
      val oneShot = graft.operators.Attribution.linearAttribution(all)
        .select("conv_event_id", "touch_event_id", "credit_fp")
        .as[(Long, Long, Long)].collect().toSet
      (replayed.head ++ replayed(1)) shouldBe oneShot
      // the state log reconstructs the window-bounded one-shot state
      val raw = spark.read.parquet(s"$statePath/touch_state")
      val maxEra = raw.groupBy(col("user_id"))
        .agg(org.apache.spark.sql.functions.max(col("era")).as("__me"))
      val snapshot = raw.join(maxEra, Seq("user_id"))
        .filter(col("era") === col("__me")).drop("era", "__me").dropDuplicates()
        .collect().map(r => (r.getLong(0),
          if (r.isNullAt(1)) -1L else r.getLong(1), r.getLong(3))).toSet
      snapshot shouldBe graft.operators.Attribution.attributionState(all)
        .collect().map(r => (r.getLong(0),
          if (r.isNullAt(1)) -1L else r.getLong(1), r.getLong(3))).toSet
    } finally {
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(statePath))
    }
  }

  test("streaming url-dedup gate: chained micro-batches == one-shot urlDedup on stable columns") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val statePath = java.nio.file.Files.createTempDirectory("graft_urlgate").toString
    // b2 re-crawls page A under a differently-noised URL; keeper/is_dup
    // must be FINAL at ingest while group_size reads the in-flight count
    val b1 = Seq(
      (1L, "https://Example.com/a/?utm_source=x"),
      (2L, "https://example.com/b"))
    val b2 = Seq(
      (3L, "https://example.com:443/a//"), // page A again
      (4L, "http://other.net/c"))
    val input = MemoryStream[(Long, String)]
    val collected = scala.collection.mutable.ArrayBuffer.empty[(Long, String, Long, Long, Int)]
    val query = EventStream.urlDedupGateWriter(
        input.toDF().toDF("doc_id", "url"), statePath,
        sink = (out, _) => collected.synchronized {
          collected ++= out
            .select("doc_id", "canonical_url", "keeper_id", "group_size", "is_dup")
            .as[(Long, String, Long, Long, Int)].collect()
        })
      .start()
    try {
      input.addData(b1); query.processAllAvailable()
      input.addData(b2); query.processAllAvailable()
      val oneShot = graft.operators.Dedup
        .urlDedup((b1 ++ b2).toDF("doc_id", "url"))
        .select("doc_id", "canonical_url", "keeper_id", "is_dup")
        .as[(Long, String, Long, Int)].collect().toSet
      // stable columns: chained == one-shot exactly
      collected.map(r => (r._1, r._2, r._3, r._5)).toSet shouldBe oneShot
      collected.map(r => (r._1, r._5)).toSet shouldBe
        Set((1L, 0), (2L, 0), (3L, 1), (4L, 0)) // the planted re-crawl
      // group_size is the count AS OF each row's ingest: page A reads 1
      // in batch 1 and 2 in batch 2
      collected.find(_._1 == 1L).get._4 shouldBe 1L
      collected.find(_._1 == 3L).get._4 shouldBe 2L
      // state accumulated: 3 distinct pages, replayable by the CLI layout
      graft.operators.Dedup.normalizeUrlState(
        spark.read.parquet(s"$statePath/pages")).count() shouldBe 3L
      spark.read.parquet(s"$statePath/canon_version").head().getInt(0) shouldBe
        graft.functions.TextFunctions.UrlCanonVersion
    } finally {
      query.stop()
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(statePath))
    }
  }

  test("streaming url-dedup gate: a stale canon_version marker fails loudly before any fold") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val statePath = java.nio.file.Files.createTempDirectory("graft_urlgate_v").toString
    Seq(1).toDF("canon_version").write.parquet(s"$statePath/canon_version")
    val input = MemoryStream[(Long, String)]
    val query = EventStream.urlDedupGateWriter(
        input.toDF().toDF("doc_id", "url"), statePath, sink = (_, _) => ())
      .start()
    try {
      input.addData(Seq((1L, "https://example.com/a")))
      val e = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
        query.processAllAvailable()
      }
      e.getMessage should include("re-seed the state")
    } finally {
      query.stop()
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(statePath))
    }
  }

  test("streaming blocklist gate: row-local screen per micro-batch == batch rollup") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val list = Seq("gambling" -> "casino", "spam" -> "click here")
    val input = MemoryStream[(Long, String)]
    val collected = scala.collection.mutable.ArrayBuffer.empty[(Long, Long, Int)]
    val query = EventStream.blocklistGateWriter(
        input.toDF().toDF("doc_id", "text"), list,
        (out, _) => collected.synchronized {
          collected ++= out.select("doc_id", "total_hits", "keep")
            .as[(Long, Long, Int)].collect()
        })
      .start()
    try {
      val batch1 = Seq((1L, "win at the casino"), (2L, "a clean doc"))
      val batch2 = Seq((3L, "click here now"), (4L, "another clean doc"))
      input.addData(batch1); query.processAllAvailable()
      input.addData(batch2); query.processAllAvailable()
      val batchAudit = graft.operators.Blocklist
        .screenRollup((batch1 ++ batch2).toDF("doc_id", "text"), list)
        .select("doc_id", "total_hits", "keep")
        .as[(Long, Long, Int)].collect().toSet
      collected.toSet shouldBe batchAudit
      collected.filter(_._3 == 0).map(_._1).toSet shouldBe Set(1L, 3L)
    } finally query.stop()
  }

  test("streaming tokenize gate: frozen merges across micro-batches == batch encode, bit for bit") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    // frozen tokenizer artifact: merges trained once, shared by every batch
    val corpus = Seq((1L, "the cat sat"), (2L, "the thin cat"),
      (3L, "that the cat"), (4L, "")).toDF("doc_id", "text")
    val merges = graft.operators.Packing.bpeMergeTable(corpus, nMerges = 3)
    val input = MemoryStream[(Long, String)]
    val collected = scala.collection.mutable.ArrayBuffer.empty[(Long, Seq[Int], Long)]
    val query = EventStream.tokenizeGateWriter(
        input.toDF().toDF("doc_id", "text"), merges,
        (out, _) => collected.synchronized {
          collected ++= out.select("doc_id", "ids", "n_ids")
            .as[(Long, Seq[Int], Long)].collect()
        })
      .start()
    try {
      input.addData(Seq((1L, "the cat sat"), (2L, "the thin cat")))
      query.processAllAvailable()
      input.addData(Seq((3L, "that the cat"), (4L, "")))
      query.processAllAvailable()
      val batchEncode = graft.operators.Packing.encodeToIds(corpus, merges)
        .as[(Long, Seq[Int], Long)].collect().toSet
      collected.toSet shouldBe batchEncode
      // and the streamed ids decode back to the normalized text
      val dec = graft.operators.Packing.decodeIds(
          collected.toSeq.map(r => (r._1, r._2)).toDF("doc_id", "ids"), merges)
        .as[(Long, String)].collect().toMap
      dec(1L) shouldBe "the cat sat"
      dec(4L) shouldBe ""
    } finally query.stop()
  }

  test("streaming pack gate: chained micro-batches fold into the one-shot packed corpus bit for bit") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val statePath = java.nio.file.Files.createTempDirectory("graft_packgate").toString
    val batches = Seq(
      Seq((1L, "the cat sat on the mat"), (2L, "the thin cat sat")),
      Seq((3L, "that the cat sat there")),
      Seq((4L, ""), (5L, "the mat sat still")))
    val corpus = batches.flatten.toDF("doc_id", "text")
    val merges = graft.operators.Packing.bpeMergeTable(corpus, nMerges = 3)
    val input = MemoryStream[(Long, String)]
    var lastTail = Set.empty[(Long, Seq[Int], Long)]
    val query = EventStream.packGateWriter(
        input.toDF().toDF("doc_id", "text"), merges, statePath,
        sink = (out, _) => {
          lastTail = out.select("row_id", "ids", "n_pad")
            .as[(Long, Seq[Int], Long)].collect().toSet
        },
        seqLen = 16)
      .start()
    try {
      batches.foreach { b => input.addData(b); query.processAllAvailable() }
      val oneShot = graft.operators.Packing.packTokenRows(
          graft.operators.Packing.encodeToIds(corpus, merges), seqLen = 16)
        .as[(Long, Seq[Int], Long)].collect().toSet
      // the collapsed append-only log IS the one-shot pack
      val state = graft.operators.Packing.latestPackedRows(
          spark.read.parquet(s"$statePath/packed"))
        .as[(Long, Seq[Int], Long)].collect().toSet
      state shouldBe oneShot
      // the last trigger's sink rows are exactly the corpus rows from the
      // then-current tail on (what a shard exporter must rewrite)
      val cut = lastTail.map(_._1).min
      lastTail shouldBe oneShot.filter(_._1 >= cut)
      lastTail.map(_._1).max shouldBe oneShot.map(_._1).max
    } finally {
      query.stop()
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(statePath))
    }
  }

  test("streaming profile-drift gate: per-batch diff == batch q154 form; schema drift flags") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val corpus = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select(col("doc_id"), col("text"), col("lang"))
    val baseline = graft.operators.Profile.tableProfile(
      corpus, Seq("doc_id", "text", "lang")).persist()
    val batches = Seq(
      // batch 1: a clean sample — everything common
      Seq((9001L, "plain prose sample", "en")),
      // batch 2: lang gone dark (all NULL) — the null_ppm alarm
      Seq((9002L, "more prose", null.asInstanceOf[String]),
        (9003L, "and more", null.asInstanceOf[String])))
    val input = MemoryStream[(Long, String, String)]
    var reports = Map.empty[Long, Seq[org.apache.spark.sql.Row]]
    val query = EventStream.profileDriftGateWriter(
        input.toDF().toDF("doc_id", "text", "lang"), baseline,
        Seq("doc_id", "text", "lang"),
        sink = (out, bid) => reports += bid -> out.collect().toSeq)
      .start()
    try {
      batches.foreach { b => input.addData(b: _*); query.processAllAvailable() }
      // every report row is "common" (same columns both sides)
      reports.values.flatten.map(_.getAs[String]("status")).toSet shouldBe Set("common")
      // batch 2's lang went from 0-null baseline to all-null: delta 1e6
      val lang2 = reports(1L).find(_.getAs[String]("col_name") == "lang").get
      lang2.getAs[Long]("null_ppm_delta") shouldBe 1000000L
      // and the gate body IS the batch diff — bit-identical to composing
      // the operators directly on the same micro-batch
      val direct = graft.operators.Profile.diffProfiles(baseline,
          graft.operators.Profile.tableProfile(
            batches(1).toDF("doc_id", "text", "lang"),
            Seq("doc_id", "text", "lang")))
        .orderBy("col_name").collect().toSeq
      reports(1L).sortBy(_.getAs[String]("col_name")) shouldBe direct
    } finally {
      query.stop()
      baseline.unpersist()
      ()
    }
  }

  test("streaming trigram-LM gate: accumulated state == one-shot model; scores are as-of-ingest") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val statePath = java.nio.file.Files.createTempDirectory("graft_trigate").toString
    val batches = Seq(
      Seq((1L, "the cat sat on the mat"), (2L, "the thin cat sat")),
      Seq((3L, "that the cat sat there")),
      Seq((4L, ""), (5L, "the mat sat still")))
    val corpus = batches.flatten.toDF("doc_id", "text")
    val input = MemoryStream[(Long, String)]
    var perBatch = Map.empty[Long, Map[Long, (Long, Long)]]
    val query = EventStream.trigramGateWriter(
        input.toDF().toDF("doc_id", "text"), statePath,
        sink = (out, bid) => {
          perBatch += bid -> out.select("doc_id", "n_trigrams", "surprisal_fp")
            .as[(Long, Long, Long)].collect()
            .map(r => r._1 -> (r._2, r._3)).toMap
        })
      .start()
    try {
      batches.foreach { b => input.addData(b); query.processAllAvailable() }
      // the accumulated partials collapse to the one-shot whole-corpus state
      val collapsed = graft.operators.LmScore.mergeTrigramStates(
          spark.read.parquet(s"$statePath/counts").select("ord", "gram", "cnt"),
          graft.operators.LmScore.trigramState(corpus).limit(0))
        .orderBy("ord", "gram").collect().toSeq
      val oneShot = graft.operators.LmScore.trigramState(corpus)
        .orderBy("ord", "gram").collect().toSeq
      collapsed shouldBe oneShot
      // trigger 1's scores are as-of-ingest: the model of batch 1 alone
      val asOf1 = graft.operators.LmScore.trigramSurprisal(
          batches.head.toDF("doc_id", "text"))
        .select("doc_id", "n_trigrams", "surprisal_fp")
        .as[(Long, Long, Long)].collect().map(r => r._1 -> (r._2, r._3)).toMap
      perBatch(0L) shouldBe asOf1
      // and scoring the corpus off the final state == the q153 batch form
      val incQ = graft.operators.LmScore.trigramSurprisalFromState(corpus,
          spark.read.parquet(s"$statePath/counts")
            .select("ord", "gram", "cnt")
            .groupBy("ord", "gram").agg(org.apache.spark.sql.functions
              .sum("cnt").as("cnt")))
        .orderBy("doc_id").collect().toSeq
      val batchQ = graft.operators.LmScore.trigramSurprisal(corpus)
        .orderBy("doc_id").collect().toSeq
      incQ shouldBe batchQ
    } finally {
      query.stop()
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(statePath))
    }
  }

  test("trigram gate replay: a re-delivered batch id scores against the same as-of model, state unchanged") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val statePath = java.nio.file.Files.createTempDirectory("graft_trireplay").toString
    val rows = Seq((1L, "the cat sat on the mat"), (2L, "the thin cat sat"))
    def runOnce(): Map[Long, (Long, Long)] = {
      val input = MemoryStream[(Long, String)]
      var got = Map.empty[Long, (Long, Long)]
      val query = EventStream.trigramGateWriter(
          input.toDF().toDF("doc_id", "text"), statePath,
          sink = (out, _) => {
            got = out.select("doc_id", "n_trigrams", "surprisal_fp")
              .as[(Long, Long, Long)].collect()
              .map(r => r._1 -> (r._2, r._3)).toMap
          })
        .start()
      try { input.addData(rows); query.processAllAvailable(); got }
      finally { query.stop(); () }
    }
    try {
      val first = runOnce()
      // a fresh stream re-delivers the same data as batchId 0 while the
      // batch=0 partial already sits in the state dir — the crash-replay
      // shape. The reader must EXCLUDE that partial, or the replayed
      // scores double-count the batch's own grams.
      val replayed = runOnce()
      replayed shouldBe first
      // and the state still holds exactly one copy of the batch's counts
      val st = graft.operators.LmScore.normalizeTrigramState(
          spark.read.parquet(s"$statePath/counts"))
        .orderBy("ord", "gram").collect().toSeq
      val want = graft.operators.LmScore.trigramState(
          rows.toDF("doc_id", "text"))
        .orderBy("ord", "gram").collect().toSeq
      st shouldBe want
    } finally {
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(statePath))
    }
  }

  test("streaming embedding-contamination gate across micro-batches == batch audit") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    import org.apache.spark.sql.functions.{col, lit, transform}
    val bench = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
      .filter(col("vec_id") < 50).persist()
    val corpus = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
      .filter(col("vec_id") >= 50)
    // plant a scaled copy of benchmark vector 3 into the stream
    val plantedVec = bench.filter(col("vec_id") === 3)
      .select(transform(col("embedding"), x => x * lit(0.8f)).as("embedding"))
      .as[Array[Float]].head()
    val rows = corpus.select("vec_id", "embedding").as[(Long, Array[Float])].collect()
    val (half1, half2) = rows.splitAt(rows.length / 2)
    val input = MemoryStream[(Long, Array[Float])]
    val collected = scala.collection.mutable.ArrayBuffer.empty[(Long, Long)]
    val query = EventStream.embedContaminationGateWriter(
        input.toDF().toDF("vec_id", "embedding"), bench, threshold = 0.9,
        (out, _) => collected.synchronized {
          collected ++= out.select("vec_id", "ref_id").as[(Long, Long)].collect()
        })
      .start()
    try {
      input.addData(half1.toSeq :+ ((7777L, plantedVec))); query.processAllAvailable()
      input.addData(half2.toSeq); query.processAllAvailable()
      val batchAudit = graft.operators.SimilaritySearch.crossNearDup(
          (rows :+ ((7777L, plantedVec))).toSeq.toDF("vec_id", "embedding"),
          bench, threshold = 0.9)
        .select("vec_id", "ref_id").as[(Long, Long)].collect().toSet
      collected.toSet shouldBe batchAudit // per-batch independence: same flags
      collected.toSet should contain((7777L, 3L)) // the planted leak is caught
    } finally { query.stop(); bench.unpersist() }
  }

  test("streaming surprisal gate: frozen model across micro-batches == batch scores, bit for bit") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    // model trained ONCE on a clean reference; micro-batches reuse it
    val reference = Seq(
      (100L, "the cat sat on the mat"), (101L, "the dog sat on the rug"))
      .toDF("doc_id", "text")
    val model = graft.operators.LmScore.unigramModel(reference)
    model.wordLn.persist(); model.lnD.persist()
    val input = MemoryStream[(Long, String)]
    val collected = scala.collection.mutable.ArrayBuffer.empty[(Long, Long, Long)]
    val query = EventStream.surprisalGateWriter(
        input.toDF().toDF("doc_id", "text"), model,
        (out, _) => collected.synchronized {
          collected ++= out.select("doc_id", "n_tokens", "surprisal_fp")
            .as[(Long, Long, Long)].collect()
        })
      .start()
    try {
      val batch1 = Seq((1L, "the cat sat"), (2L, "zyzzyva gibberish blob"))
      val batch2 = Seq((3L, "the dog on the mat"), (4L, "..."))
      input.addData(batch1); query.processAllAvailable()
      input.addData(batch2); query.processAllAvailable()
      val batchScores = graft.operators.LmScore
        .surprisalWithModel((batch1 ++ batch2).toDF("doc_id", "text"), model)
        .select("doc_id", "n_tokens", "surprisal_fp")
        .as[(Long, Long, Long)].collect().toSet
      collected.toSet shouldBe batchScores // integer fixed point: bit for bit
      collected.size shouldBe 4 // every doc scored, including the token-less one
      // and the gate separates fluent from gibberish under the frozen model
      val byId = collected.map(t => t._1 -> t._3).toMap
      byId(2L).toDouble / 3 should be > byId(1L).toDouble / 3
    } finally { query.stop(); model.wordLn.unpersist(); model.lnD.unpersist() }
  }

  test("streaming release gate: streamed masks == batch q132/q134 bit-for-bit; replay idempotent") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    import org.apache.spark.sql.functions.{col, concat, lit}
    val statePath = java.nio.file.Files.createTempDirectory("graft_relgate").toString
    // the AppSpec release corpus: suffix the train side so the curation
    // ensemble genuinely splits instead of dropping everything
    val suffix = "\nThe editors have reviewed this report with care and attention." +
      "\nWe hope that you find the coverage to be useful and fair." +
      "\nPlease share the story of the day with friends and family."
    val all = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    // a 200-doc slice keeps the double-run (crash replay re-ingests
    // everything) inside the suite's heap/time budget
    val train = all.filter(col("doc_id") > 40 && col("doc_id") <= 240)
      .withColumn("text", concat(col("text"), lit(suffix)))
      .select(col("doc_id"), col("text"), col("source")).persist()
    val bench = all.filter(col("doc_id") <= 40).select("doc_id", "text").persist()
    val pos = train.filter(col("source").isin("src0", "src1", "src2"))
      .select("doc_id", "text").persist()
    val neg = train.filter(col("source") === "src3").select("doc_id", "text").persist()
    val base = train.select("doc_id", "text")
    // planted duplicates, ids ascending with the stream: 9000 re-sends a
    // BATCH-1 text (cross-batch dup via stored hashes), 9001 re-sends a
    // batch-2 text (in-batch dup)
    val t1 = base.filter(col("doc_id") === 50).head().getString(1)
    val t2 = base.filter(col("doc_id") === 200).head().getString(1)
    val b1 = base.filter(col("doc_id") <= 140).as[(Long, String)].collect().toSeq
    val b2 = base.filter(col("doc_id") > 140).as[(Long, String)].collect().toSeq ++
      Seq((9000L, t1), (9001L, t2))
    val docsAll = (b1 ++ b2).toDF("doc_id", "text")
    type V = (Long, Int, Int, Option[Int], Option[Int], Int)
    def runStream(batches: Seq[Seq[(Long, String)]]): Seq[Set[V]] = {
      val input = MemoryStream[(Long, String)]
      val got = scala.collection.mutable.ArrayBuffer.empty[Set[V]]
      val query = EventStream.releaseGateWriter(
          input.toDF().toDF("doc_id", "text"), statePath, pos, neg, bench,
          sink = (out, _) => got.synchronized {
            got += out.collect().map(r => (r.getLong(0), r.getInt(1), r.getInt(2),
              if (r.isNullAt(3)) None else Some(r.getInt(3)),
              if (r.isNullAt(4)) None else Some(r.getInt(4)),
              r.getInt(5))).toSet
          })
        .start()
      try {
        batches.foreach { b => input.addData(b); query.processAllAvailable() }
        got.toSeq
      } finally { query.stop(); () }
    }
    try {
      // crash-replay shape FIRST (the pack-gate pattern): run b1 alone —
      // its era-0 state commits but the checkpoint is discarded — then a
      // fresh stream re-delivers b1 as batch 0 over that state and chains
      // b2. Own-era exclusion keeps b1's docs from reading as duplicates
      // of themselves on the replay.
      val first = runStream(Seq(b1)).head
      val triggers = runStream(Seq(b1, b2))
      triggers.head shouldBe first
      val streamed = triggers.flatten.toSet
      // batch references over everything ingested: q132's curation masks
      // and q134's contamination masks on the curation-kept docs
      val curB = graft.operators.Verdicts.curationVerdict(docsAll, pos, neg)
      val keptB = docsAll.join(curB.filter(col("keep") === 1).select("doc_id"),
        Seq("doc_id"), "left_semi")
      val conB = graft.operators.Verdicts.contaminationVerdict(keptB, bench)
      val conMap = conB.collect()
        .map(r => r.getAs[Long]("doc_id") ->
          ((r.getAs[Int]("method_mask"), r.getAs[Int]("clean")))).toMap
      val expected = curB.collect().map { r =>
        val id = r.getAs[Long]("doc_id")
        val con = conMap.get(id)
        (id, r.getAs[Int]("fail_mask"), r.getAs[Int]("keep"),
          con.map(_._1), con.map(_._2),
          if (r.getAs[Int]("keep") == 1 && con.exists(_._2 == 1)) 1 else 0)
      }.toSet
      streamed shouldBe expected
      // the planted duplicates were refused with exactly the dup bit set
      streamed.filter(v => v._1 >= 9000L).foreach { v =>
        (v._2 & 16) shouldBe 16
        v._6 shouldBe 0
      }
      // released state + manifest reconcile with the batch release set
      val releasedIds = expected.filter(_._6 == 1).map(_._1)
      releasedIds should not be empty
      spark.read.parquet(s"$statePath/released_docs")
        .dropDuplicates("doc_id").select("doc_id").as[Long].collect().toSet shouldBe releasedIds
      val manifest = spark.read.json(s"$statePath/manifest").head()
      manifest.getAs[Long]("released_docs") shouldBe releasedIds.size.toLong
      manifest.getAs[Long]("last_era") shouldBe 1L
      // the replayed era-0 append landed identical rows only: the merged
      // released state holds ONE copy per doc
      spark.read.parquet(s"$statePath/released_docs")
        .dropDuplicates("doc_id").count() shouldBe releasedIds.size.toLong
    } finally {
      Seq(train, bench, pos, neg).foreach(_.unpersist())
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(statePath))
    }
  }
}

/** streaming label row for the attribution test */
case class LabelAt(user_id: String, label: Double, as_of_ts: java.sql.Timestamp)
