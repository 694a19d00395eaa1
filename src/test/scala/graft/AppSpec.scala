package graft

import graft.domain._
import graft.serving.FeatureLookup
import graft.sources.InMemoryKVStore

/** CLI surface: flag parsing (reference parseArgs App.scala:150-156) and the
  * full subcommand chain dispatched through [[App.run]] with the in-memory
  * platform — the same lifecycle a shell user runs (reference App.scala:78-110).
  */
class AppSpec extends SparkTestBase {
  import spark.implicits._

  test("parseArgs: --k v pairs, later duplicates win, malformed input aborts loudly") {
    App.parseArgs(Seq("--a", "1", "--b", "x y")) shouldBe Map("a" -> "1", "b" -> "x y")
    App.parseArgs(Seq("--a", "1", "--a", "2")) shouldBe Map("a" -> "2")
    App.parseArgs(Seq.empty) shouldBe Map.empty
    // a value-less flag must not silently shift later bindings
    the[IllegalArgumentException] thrownBy
      App.parseArgs(Seq("--a", "--b", "1", "x")) should have message
      "missing value for --a (got flag '--b' instead)"
    an[IllegalArgumentException] should be thrownBy App.parseArgs(Seq("stray", "pair"))
    an[IllegalArgumentException] should be thrownBy App.parseArgs(Seq("--dangling"))
  }

  test("kvFactory: memory resolves, anything else explains itself") {
    App.kvFactory("memory")().set("k", "v")
    InMemoryKVStore.get("k") shouldBe Some("v")
    an[IllegalArgumentException] should be thrownBy App.kvFactory("redis")
  }

  test("subcommand chain: backfill -> point-in-time-join -> online-sync -> lookups") {
    val storage = new InMemoryStorage
    val platform = Platform(spark, new TestFetcher(storage), new TestWriter(storage))
    InMemoryKVStore.clear()

    storage.write("events_raw", Seq(
      EventRaw("user1", "click", ts("2024-01-01 10:00:00")),
      EventRaw("user1", "purchase", ts("2024-01-03 14:30:00")),
      EventRaw("user2", "view", ts("2024-01-02 09:00:00"))).toDF(), "overwrite")
    storage.write("labels", Seq(
      Label("user1", 1.0, ts("2024-01-02 12:00:00"))).toDF(), "overwrite")

    App.run(platform, Seq("backfill",
      "--events-raw-path", "events_raw", "--output-table", "features_daily",
      "--start-date", "2024-01-01", "--end-date", "2024-01-05"))
    storage.rows("features_daily") should have size 10

    App.run(platform, Seq("point-in-time-join",
      "--labels-path", "labels", "--features-table", "features_daily",
      "--output-path", "training_data"))
    storage.rows should contain key "training_data"

    // the rank plan produces the identical training set through the CLI
    App.run(platform, Seq("point-in-time-join",
      "--labels-path", "labels", "--features-table", "features_daily",
      "--output-path", "training_data_rank", "--plan", "rank"))
    storage.rows("training_data_rank").toSet shouldBe storage.rows("training_data").toSet

    App.run(platform, Seq("online-sync",
      "--features-table", "features_daily", "--cutoff", "2024-01-01"))

    // online serving lookup: synced user decodes, missing user is None (404)
    val online = FeatureLookup.online(InMemoryKVStore, "user1")
    online shouldBe defined
    online.get.day shouldBe Some("2024-01-05")
    online.get.event_count_7d shouldBe Some(2L)           // Jan-1 click + Jan-3 purchase
    online.get.event_type_counts shouldBe Some("2")
    FeatureLookup.online(InMemoryKVStore, "ghost") shouldBe None

    // offline point lookup: as-of picks the right snapshot; 404 semantics
    val snap = FeatureLookup.offlineFromTable(spark, platform.fetcher,
      "features_daily", "user1", "2024-01-02")
    snap.map(_.day) shouldBe Some(d("2024-01-02"))
    snap.get.event_count_7d shouldBe Some(1L)
    FeatureLookup.offlineFromTable(spark, platform.fetcher,
      "features_daily", "ghost", "2024-01-02") shouldBe None

    App.run(platform, Seq("offline-lookup",
      "--features-table", "features_daily", "--user-id", "user1",
      "--as-of", "2024-01-03"))
  }

  test("table-history / read-version / vacuum-table expose the versioned-table surface") {
    // needs the REAL warehouse-backed platform: versioned tables live at
    // catalog locations, not in the in-memory test storage
    val platform = Platform(spark, graft.sources.ProdFetcher, graft.sources.ProdWriter)
    val tbl = "graft_appspec_versioned"
    try {
      graft.sources.ProdWriter.insertOverwriteTable(Seq((1L, "a")).toDF("id", "s"), tbl)
      graft.sources.ProdWriter.insertOverwriteTable(Seq((2L, "b"), (3L, "c")).toDF("id", "s"), tbl)
      App.run(platform, Seq("table-history", "--table", tbl))
      val out = java.nio.file.Files.createTempDirectory("graft_rv").toString + "/v1"
      App.run(platform, Seq("read-version",
        "--table", tbl, "--version", "1", "--output-path", out))
      spark.read.parquet(out).as[(Long, String)].collect().toSet shouldBe Set((1L, "a"))
      // diff between the retained snapshots: id 1 removed, 2 and 3 added
      val dp = java.nio.file.Files.createTempDirectory("graft_td").toString + "/d"
      App.run(platform, Seq("table-diff", "--table", tbl,
        "--from", "1", "--to", "2", "--id-col", "id", "--text-col", "s",
        "--output-path", dp))
      spark.read.parquet(dp).select("id", "status").as[(Long, String)]
        .collect().toSet shouldBe Set((1L, "removed"), (2L, "added"), (3L, "added"))
      // compaction: a new version with identical data (small-file
      // maintenance); the prior snapshots stay time-travelable
      App.run(platform, Seq("compact-table", "--table", tbl))
      graft.sources.ProdFetcher.tableVersions(spark, tbl) shouldBe Seq(1L, 2L, 3L)
      graft.sources.ProdFetcher.readTableVersion(spark, tbl, 3L)
        .as[(Long, String)].collect().toSet shouldBe Set((2L, "b"), (3L, "c"))
      App.run(platform, Seq("vacuum-table",
        "--table", tbl, "--keep-last", "1", "--grace-minutes", "0"))
      graft.sources.ProdFetcher.tableVersions(spark, tbl) shouldBe Seq(3L)
      // time travel to the vacuumed snapshot now fails loudly
      an[Exception] should be thrownBy
        graft.sources.ProdFetcher.readTableVersion(spark, tbl, 1L).collect()
    } finally graft.sources.ProdWriter.dropTable(spark, tbl)
  }

  test("corpus-prep subcommand runs the full pipeline and writes packed docs") {
    val storage = new InMemoryStorage
    val platform = Platform(spark, new TestFetcher(storage), new TestWriter(storage))
    // real corpus slice so every stage (dedup pairs, quantile gate,
    // rebalance, packing) has signal
    storage.write("docs_in",
      spark.read.parquet("/root/testdata/sf0.001/documents.parquet"), "overwrite")
    App.run(platform, Seq("corpus-prep",
      "--docs-path", "docs_in", "--output-path", "corpus_out",
      "--quota", "30", "--budget", "256"))
    val out = storage.rows("corpus_out")
    out.size should be > 0
    out.size should be < storage.rows("docs_in").size // gates actually dropped docs
    storage.schemas("corpus_out").fieldNames.toSet shouldBe
      Set("doc_id", "lang", "quality_score", "n_tokens", "chunk_id")
    // packing invariant: the stream starts at chunk 0, and no chunk id can
    // exceed total-tokens/budget (a long doc may SPAN chunks, so ids need
    // not be contiguous)
    val chunks = out.map(_.getAs[Long]("chunk_id"))
    chunks.min shouldBe 0L
    chunks.max should be <= out.map(_.getAs[Long]("n_tokens")).sum / 256L

    // the scale knobs reach the pipeline, and a non-default bucketWidth /
    // uncached gate leave the output IDENTICAL (bucketWidth only tunes
    // packing parallelism; gate-storage only tunes recomputation)
    App.run(platform, Seq("corpus-prep",
      "--docs-path", "docs_in", "--output-path", "corpus_out_bw",
      "--quota", "30", "--budget", "256",
      "--bucket-width", "7", "--gate-storage", "NONE"))
    def canon(name: String) = storage.rows(name)
      .map(r => storage.schemas(name).fieldNames.sorted.map(f => String.valueOf(r.getAs[Any](f))).toSeq)
      .sortBy(_.mkString("|"))
    canon("corpus_out_bw") shouldBe canon("corpus_out")
  }

  test("corpus-prep --state-path: two shard runs converge on the one-shot output") {
    import org.apache.spark.sql.functions.col
    val storage = new InMemoryStorage
    val platform = Platform(spark, new TestFetcher(storage), new TestWriter(storage))
    val all = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    storage.write("docs_all", all, "overwrite")
    storage.write("shard1", all.filter(col("doc_id") <= 50), "overwrite")
    storage.write("shard2", all.filter(col("doc_id") > 50), "overwrite")
    // one-shot reference
    App.run(platform, Seq("corpus-prep",
      "--docs-path", "docs_all", "--output-path", "out_full",
      "--quota", "30", "--budget", "256"))
    // incremental: first run initializes state, second appends the shard
    App.run(platform, Seq("corpus-prep",
      "--docs-path", "shard1", "--output-path", "out_inc1",
      "--quota", "30", "--budget", "256", "--state-path", "cstate"))
    App.run(platform, Seq("corpus-prep",
      "--docs-path", "shard2", "--output-path", "out_inc2",
      "--quota", "30", "--budget", "256", "--state-path", "cstate"))
    // state accumulated both shards
    storage.rows("cstate/meta").size shouldBe storage.rows("docs_all").size
    def canon(name: String) = storage.rows(name)
      .map(r => storage.schemas(name).fieldNames.sorted.map(f => String.valueOf(r.getAs[Any](f))).toSeq)
      .sortBy(_.mkString("|"))
    // after the second shard, incremental output == one-shot full output
    canon("out_inc2") shouldBe canon("out_full")
    // and the first run was itself a valid one-shot over shard1
    storage.rows("out_inc1").size should be > 0
  }

  test("sketch subcommand: per-shard vectors merge to the whole-corpus estimate") {
    import org.apache.spark.sql.functions.col
    val storage = new InMemoryStorage
    val platform = Platform(spark, new TestFetcher(storage), new TestWriter(storage))
    val all = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    storage.write("sk_shard1", all.filter(col("doc_id") <= 50), "overwrite")
    storage.write("sk_shard2", all.filter(col("doc_id") > 50), "overwrite")
    App.run(platform, Seq("sketch", "--docs-path", "sk_shard1", "--output-path", "sk1"))
    App.run(platform, Seq("sketch", "--docs-path", "sk_shard2", "--output-path", "sk2"))
    App.run(platform, Seq("sketch", "--merge", "sk1,sk2",
      "--output-path", "sk_merged", "--estimate-path", "sk_est"))
    val viaCli = storage.rows("sk_est")
      .map(r => r.getAs[String]("lang") -> r.getAs[Double]("approx_distinct")).toMap
    val direct = operators.Sketches.approxDistinct(all, "lang", "text")
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    viaCli shouldBe direct // merge-of-shards == single-pass, bit for bit
  }

  test("demo subcommand runs the whole walkthrough on injected events") {
    val storage = new InMemoryStorage
    val platform = Platform(spark, new TestFetcher(storage), new TestWriter(storage))
    InMemoryKVStore.clear()
    storage.write("demo_events", Seq(
      EventRaw("user1", "click", ts("2024-01-02 10:00:00")),
      EventRaw("user1", "purchase", ts("2024-01-25 14:30:00")),
      EventRaw("user2", "view", ts("2024-01-26 09:00:00"))).toDF(), "overwrite")

    App.run(platform, Seq("demo", "--events-raw-path", "demo_events"))

    // features were built and labels joined through the scratch tables
    storage.rows.keys.exists(_.endsWith("/labels")) shouldBe true
    storage.rows.keys.exists(_.endsWith("/training")) shouldBe true
    // the sync inside demo used cutoff 2024-01-24: both users are fresh
    FeatureLookup.online(InMemoryKVStore, "user1") shouldBe defined
    FeatureLookup.online(InMemoryKVStore, "user2") shouldBe defined
  }

  test("online lookup decodes null features as None (reference null quirk)") {
    InMemoryKVStore.clear()
    InMemoryKVStore.set("features:u9",
      """{"day":"2024-01-05","event_count_7d":"0","event_count_30d":"0","last_event_days_ago":null,"event_type_counts":"0"}""")
    val out = FeatureLookup.online(InMemoryKVStore, "u9").get
    out.last_event_days_ago shouldBe None
    out.event_count_7d shouldBe Some(0L)
  }

  test("sessionize subcommand writes session rollups and prints the funnel") {
    val storage = new InMemoryStorage
    val platform = Platform(spark, new TestFetcher(storage), new TestWriter(storage))
    storage.write("events_s", Seq(
      (1L, 7L, ts("2024-01-01 10:00:00"), "signup"),
      (2L, 7L, ts("2024-01-01 10:05:00"), "view"),
      (3L, 7L, ts("2024-01-01 10:09:00"), "purchase"),
      (4L, 7L, ts("2024-01-01 15:00:00"), "view"),   // > gap: second session
      (5L, 8L, ts("2024-01-01 09:00:00"), "view")
    ).toDF("event_id", "user_id", "ts", "event_type"), "overwrite")
    App.run(platform, Seq("sessionize",
      "--events-raw-path", "events_s", "--output-path", "sessions_out",
      "--gap-seconds", "600", "--funnel-steps", "signup,view,purchase"))
    val out = storage.rows("sessions_out")
    out should have size 3
    storage.schemas("sessions_out").fieldNames.toSet shouldBe
      Set("user_id", "session_seq", "n_events", "start_us", "end_us",
        "duration_us", "n_event_types")
    out.map(r => (r.getAs[Long]("user_id"), r.getAs[Long]("session_seq")) ->
      r.getAs[Long]("n_events")).toMap shouldBe
      Map((7L, 1L) -> 3L, (7L, 2L) -> 1L, (8L, 1L) -> 1L)
  }

  test("curate subcommand: dedup + redact + truncate in one pass; incremental shards match") {
    val storage = new InMemoryStorage
    val platform = Platform(spark, new TestFetcher(storage), new TestWriter(storage))
    storage.write("docs_c", Seq(
      (1L, "BANNER\n\nmail bob@x.io and call 555-123-4567 here"),
      (2L, "BANNER\n\nunique body two with many extra words to cut")
    ).toDF("doc_id", "text"), "overwrite")
    App.run(platform, Seq("curate",
      "--docs-path", "docs_c", "--output-path", "curated", "--max-tokens", "5"))
    val rows = storage.rows("curated")
      .map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Long]("n_kept"), r.getAs[Long]("n_email"),
          r.getAs[Long]("n_phone"), r.getAs[String]("text_curated"))).toMap
    // doc 1 keeps both segments, loses the email and phone, truncates to 5 tokens
    rows(1L) shouldBe ((2L, 1L, 1L, "banner mail email and call"))
    // doc 2 loses the shared banner, keeps its body
    rows(2L) shouldBe ((1L, 0L, 0L, "unique body two with many"))

    // incremental: shard 1 initializes state, shard 2 dedups against it
    storage.write("shard1", Seq((1L, "BANNER\n\none")).toDF("doc_id", "text"), "overwrite")
    storage.write("shard2", Seq((2L, "BANNER\n\ntwo")).toDF("doc_id", "text"), "overwrite")
    App.run(platform, Seq("curate",
      "--docs-path", "shard1", "--output-path", "cur1", "--state-path", "segstate"))
    App.run(platform, Seq("curate",
      "--docs-path", "shard2", "--output-path", "cur2", "--state-path", "segstate"))
    storage.rows("cur2").map(r =>
      (r.getAs[Long]("doc_id"), r.getAs[Long]("n_kept"),
        r.getAs[String]("text_curated"))) shouldBe Seq((2L, 1L, "two"))
    // state grew by shard 2's new segment only
    storage.rows("segstate/segments") should have size 3 // BANNER, one, two
  }

  test("substring-dedup subcommand: full run then the incremental shard path off stored state") {
    import org.apache.spark.sql.functions.col
    val storage = new InMemoryStorage
    val platform = Platform(spark, new TestFetcher(storage), new TestWriter(storage))
    val all = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select(col("doc_id"), col("text"))
    storage.write("docs_all", all, "overwrite")
    storage.write("docs_old", all.filter(col("doc_id") <= 25), "overwrite")
    storage.write("docs_new", all.filter(col("doc_id") > 25), "overwrite")
    // era 1: full run over the stored half, initializing state
    App.run(platform, Seq("substring-dedup",
      "--docs-path", "docs_old", "--output-path", "pairs_old",
      "--init-state-path", "state"))
    // era 2: the new shard against the stored fingerprints
    App.run(platform, Seq("substring-dedup",
      "--docs-path", "docs_all", "--output-path", "pairs_inc",
      "--state-path", "state", "--shard-path", "docs_new"))
    val unioned = (storage.rows("pairs_old") ++ storage.rows("pairs_inc"))
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    // equals the one-shot full recompute
    App.run(platform, Seq("substring-dedup",
      "--docs-path", "docs_all", "--output-path", "pairs_full"))
    val full = storage.rows("pairs_full")
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    unioned shouldBe full
    // state accumulated both eras' fingerprints
    storage.rows("state/fingerprints").size.toLong shouldBe
      graft.operators.Dedup.substringState(all).count()
  }

  test("contamination, lm-score, and weighted-sample subcommands produce their reports") {
    import org.apache.spark.sql.functions.col
    val storage = new InMemoryStorage
    val platform = Platform(spark, new TestFetcher(storage), new TestWriter(storage))
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    storage.write("train", docs.filter(col("doc_id") > 10), "overwrite")
    storage.write("bench", docs.filter(col("doc_id") <= 10), "overwrite")
    App.run(platform, Seq("contamination",
      "--docs-path", "train", "--benchmark-path", "bench",
      "--output-path", "leaks"))
    storage.rows("leaks/shingle_overlap").size should be > 0
    // substring report exists (possibly empty at this corpus slice)
    storage.contains("leaks/substring_leaks") shouldBe true
    // reverse-direction report: one row per benchmark item with shingles
    storage.rows("leaks/benchmark_report").size shouldBe
      docs.filter(col("doc_id") <= 10).count()
    App.run(platform, Seq("lm-score",
      "--docs-path", "train", "--output-path", "scores",
      "--reference-path", "bench"))
    val scores = storage.rows("scores")
    scores.size shouldBe docs.filter(col("doc_id") > 10).count()
    App.run(platform, Seq("weighted-sample",
      "--docs-path", "train", "--output-path", "sample", "--n", "7"))
    storage.rows("sample").size shouldBe 7
    App.run(platform, Seq("weighted-sample",
      "--docs-path", "train", "--output-path", "sample_cat",
      "--n", "2", "--category-col", "lang"))
    storage.rows("sample_cat")
      .groupBy(_.getAs[String]("lang")).values.foreach(_.size should be <= 2)
  }

  test("lm-train/lm-score-with-model, kl-drift, tfidf, and pmi subcommands") {
    import org.apache.spark.sql.functions.col
    val storage = new InMemoryStorage
    val platform = Platform(spark, new TestFetcher(storage), new TestWriter(storage))
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    storage.write("docs", docs, "overwrite")
    storage.write("ref", docs.filter(col("doc_id") <= 250), "overwrite")
    // train-once state, then scoring against it == the one-shot scorer
    App.run(platform, Seq("lm-train",
      "--reference-path", "ref", "--model-path", "model"))
    storage.contains("model/word_ln") shouldBe true
    App.run(platform, Seq("lm-score-with-model",
      "--docs-path", "docs", "--model-path", "model",
      "--output-path", "scores_state"))
    App.run(platform, Seq("lm-score",
      "--docs-path", "docs", "--output-path", "scores_direct",
      "--reference-path", "ref"))
    def scoreSet(p: String) = storage.rows(p)
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("surprisal_fp"))).toSet
    scoreSet("scores_state") shouldBe scoreSet("scores_direct")
    App.run(platform, Seq("kl-drift",
      "--docs-path", "docs", "--output-path", "kl"))
    val kl = storage.rows("kl")
    kl.size shouldBe 20 // one row per source
    kl.foreach(_.getAs[Double]("kl_nats") should be >= 0.0)
    App.run(platform, Seq("tfidf",
      "--docs-path", "docs", "--output-path", "terms", "--k", "3"))
    storage.rows("terms")
      .groupBy(_.getAs[Long]("doc_id")).values.foreach(_.size should be <= 3)
    App.run(platform, Seq("pmi",
      "--docs-path", "docs", "--output-path", "colloc", "--k", "10"))
    storage.rows("colloc").size should be <= 10
    // semantic-leak audit: plant a scaled copy of a benchmark vector
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val planted = emb.filter(col("vec_id") === 3)
      .select(org.apache.spark.sql.functions.lit(8888L).as("vec_id"),
        org.apache.spark.sql.functions.transform(col("embedding"),
          x => x * org.apache.spark.sql.functions.lit(0.8f)).as("embedding"),
        col("label"))
    storage.write("bench_emb", emb.filter(col("vec_id") < 50), "overwrite")
    storage.write("corpus_emb",
      emb.filter(col("vec_id") >= 50).unionByName(planted), "overwrite")
    App.run(platform, Seq("embed-contamination",
      "--corpus-path", "corpus_emb", "--benchmark-path", "bench_emb",
      "--output-path", "leaks_emb"))
    storage.rows("leaks_emb")
      .map(r => (r.getAs[Long]("vec_id"), r.getAs[Long]("ref_id"))) should
      contain((8888L, 3L))
  }

  test("trigram-train/ingest/score and profile subcommands") {
    import org.apache.spark.sql.functions.col
    val storage = new InMemoryStorage
    val platform = Platform(spark, new TestFetcher(storage), new TestWriter(storage))
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    storage.write("docs", docs, "overwrite")
    storage.write("half1", docs.filter(col("doc_id") <= 250), "overwrite")
    storage.write("half2", docs.filter(col("doc_id") > 250), "overwrite")
    // train on half 1, ingest half 2 as an appended partial, score — must
    // equal the one-shot self-model (q153's increment == retrain)
    App.run(platform, Seq("trigram-train",
      "--reference-path", "half1", "--state-path", "tri_state"))
    App.run(platform, Seq("trigram-ingest",
      "--shard-path", "half2", "--state-path", "tri_state"))
    App.run(platform, Seq("trigram-score",
      "--docs-path", "docs", "--state-path", "tri_state",
      "--output-path", "tri_scores"))
    def scoreSet(p: String) = storage.rows(p)
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("surprisal_fp"))).toSet
    val oneShot = graft.operators.LmScore.trigramSurprisal(
        docs.select(col("doc_id"), col("text")))
      .collect().map(r => (r.getLong(0), r.getLong(2))).toSet
    scoreSet("tri_scores") shouldBe oneShot
    // profile + drift alert between the half-1 snapshot and the full corpus
    App.run(platform, Seq("profile",
      "--table-path", "half1", "--output-path", "prof_before",
      "--columns", "doc_id,text,lang,source"))
    App.run(platform, Seq("profile",
      "--table-path", "docs", "--output-path", "prof_after",
      "--columns", "doc_id,text,lang,n_chars",
      "--before-path", "prof_before", "--diff-output-path", "prof_diff"))
    storage.rows("prof_before").size shouldBe 4
    val diff = storage.rows("prof_diff")
      .map(r => r.getAs[String]("col_name") -> r.getAs[String]("status")).toMap
    diff("source") shouldBe "removed"
    diff("n_chars") shouldBe "added"
    diff("doc_id") shouldBe "common"
    // doc_id's max moved between the half and the full corpus
    storage.rows("prof_diff").find(_.getAs[String]("col_name") == "doc_id")
      .get.getAs[Int]("max_changed") shouldBe 1
    // pagerank CLI: a 3-cycle's fixed point is uniform 1e6
    storage.write("edges",
      Seq((1L, 2L), (2L, 3L), (3L, 1L)).toDF("src", "dst"), "overwrite")
    App.run(platform, Seq("pagerank",
      "--edges-path", "edges", "--output-path", "ranks", "--iters", "3"))
    storage.rows("ranks").map(r =>
      r.getAs[Long]("host") -> r.getAs[Long]("rank_ppm")).toMap shouldBe
      Map(1L -> 1000000L, 2L -> 1000000L, 3L -> 1000000L)
  }

  test("heavy-hitters, embed-clusters, and rrf subcommands") {
    import org.apache.spark.sql.functions.col
    val storage = new InMemoryStorage
    val platform = Platform(spark, new TestFetcher(storage), new TestWriter(storage))
    // heavy hitters: 'a' x 6 of 10 rows clears 50%; the rest don't
    storage.write("t",
      (Seq.fill(6)("a") ++ Seq.fill(3)("b") :+ "c").zipWithIndex
        .map { case (v, i) => (i.toLong, v) }.toDF("id", "v"),
      "overwrite")
    App.run(platform, Seq("heavy-hitters",
      "--table-path", "t", "--output-path", "hh",
      "--columns", "v", "--min-share-ppm", "500000"))
    storage.rows("hh").map(r =>
      (r.getAs[String]("value"), r.getAs[Long]("cnt"))) shouldBe Seq(("a", 6L))
    // embed-clusters over the real embeddings + cohesion profile
    storage.write("emb",
      spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet"), "overwrite")
    App.run(platform, Seq("embed-clusters",
      "--input-path", "emb", "--init-pred", "vec_id >= 100 AND vec_id < 116",
      "--output-path", "clu", "--profile-path", "clu_prof"))
    val nVec = storage.rows("emb").size
    storage.rows("clu").size shouldBe nVec // every vector assigned once
    storage.rows("clu_prof").map(_.getAs[Long]("n_members")).sum shouldBe nVec
    // rrf over two stored signals == the operator directly
    storage.write("sa", Seq((10L, 100L), (20L, 90L)).toDF("doc_id", "score_fp"), "overwrite")
    storage.write("sb", Seq((20L, 50L), (30L, 40L)).toDF("doc_id", "score_fp"), "overwrite")
    App.run(platform, Seq("rrf",
      "--signal-paths", "sa,sb", "--output-path", "fused"))
    storage.rows("fused").find(_.getAs[Long]("doc_id") == 20L)
      .get.getAs[Int]("rank") shouldBe 1 // consensus doc wins
    // trustrank CLI: the disconnected island scores exactly 0
    storage.write("tr_edges",
      Seq((1L, 2L), (2L, 3L), (4L, 5L)).toDF("src", "dst"), "overwrite")
    storage.write("tr_seeds", Seq(Tuple1(1L)).toDF("host"), "overwrite")
    App.run(platform, Seq("trustrank",
      "--edges-path", "tr_edges", "--seeds-path", "tr_seeds",
      "--output-path", "tr_ranks"))
    val tr = storage.rows("tr_ranks")
      .map(r => r.getAs[Long]("host") -> r.getAs[Long]("rank_ppm")).toMap
    tr(4L) shouldBe 0L
    tr(2L) should be > 0L
    // auto-K through the CLI: --eps-ppm lets the chain settle itself and
    // the ranks match a fixed-K run at whatever count it stopped at
    App.run(platform, Seq("pagerank",
      "--edges-path", "tr_edges", "--output-path", "pr_auto",
      "--eps-ppm", "0", "--iters", "20"))
    val auto = storage.rows("pr_auto")
      .map(r => r.getAs[Long]("host") -> r.getAs[Long]("rank_ppm")).toMap
    auto.keySet shouldBe Set(1L, 2L, 3L, 4L, 5L) // every node ranked
    App.run(platform, Seq("trustrank",
      "--edges-path", "tr_edges", "--seeds-path", "tr_seeds",
      "--output-path", "tr_auto", "--eps-ppm", "0", "--iters", "20"))
    storage.rows("tr_auto")
      .map(r => r.getAs[Long]("host") -> r.getAs[Long]("rank_ppm"))
      .toMap shouldBe tr // the settled seeded ranks == the fixed-K run
  }

  test("ewma, attribution, and k-anonymity subcommands") {
    import org.apache.spark.sql.functions.col
    val storage = new InMemoryStorage
    val platform = Platform(spark, new TestFetcher(storage), new TestWriter(storage))
    def ev(id: Long, day: Int, user: Long, typ: String, v: Double) =
      (id, java.sql.Timestamp.valueOf(f"2024-01-$day%02d 06:00:00"), user, typ, v)
    val events = Seq(
      ev(1, 1, 7, "click", 1.0), ev(2, 2, 7, "click", 2.0),
      ev(3, 3, 7, "purchase", 10.0), ev(4, 4, 7, "click", 0.5))
      .toDF("event_id", "ts", "user_id", "event_type", "value")
    storage.write("ev", events, "overwrite")
    storage.write("ev_head", events.filter(col("event_id") <= 2), "overwrite")
    storage.write("ev_tail", events.filter(col("event_id") > 2), "overwrite")
    // state train + shard ingest == one-shot state (the q163 contract)
    App.run(platform, Seq("ewma",
      "--events-path", "ev_head", "--output-path", "st0"))
    App.run(platform, Seq("ewma",
      "--events-path", "ev_tail", "--state-path", "st0", "--output-path", "st1"))
    App.run(platform, Seq("ewma",
      "--events-path", "ev", "--output-path", "st_oneshot"))
    def snap(p: String) = storage.rows(p)
      .map(r => (r.getAs[Long]("user_id"), r.getAs[Long]("n_events"),
        r.getAs[Long]("ewma_fp"))).toSet
    snap("st1") shouldBe snap("st_oneshot")
    // per-event form: one row per event
    App.run(platform, Seq("ewma",
      "--events-path", "ev", "--output-path", "pe", "--at-event", "true"))
    storage.rows("pe").size shouldBe 4
    // attribution: the purchase's 1e7 fp credit splits over 2 in-window clicks
    App.run(platform, Seq("attribution",
      "--events-path", "ev", "--output-path", "att"))
    storage.rows("att")
      .map(_.getAs[Long]("credit_fp")).sum shouldBe 10000000L
    // scheme flags conserve the value exactly too
    App.run(platform, Seq("attribution", "--events-path", "ev",
      "--output-path", "attp", "--scheme", "position"))
    storage.rows("attp").map(_.getAs[Long]("credit_fp")).sum shouldBe 10000000L
    App.run(platform, Seq("attribution", "--events-path", "ev",
      "--output-path", "attd", "--scheme", "timedecay", "--half-life-days", "1"))
    storage.rows("attd").map(_.getAs[Long]("credit_fp")).sum shouldBe 10000000L
    // incremental: head seeds the touch state (no conversions -> no
    // credits), the tail shard's purchase credits against STORED clicks;
    // chained shard credits == the one-shot report
    App.run(platform, Seq("attribution", "--events-path", "ev_head",
      "--state-path", "ast", "--output-path", "ai0"))
    App.run(platform, Seq("attribution", "--events-path", "ev_tail",
      "--state-path", "ast", "--output-path", "ai1"))
    def credits(p: String) = storage.rows(p)
      .map(r => (r.getAs[Long]("conv_event_id"), r.getAs[Long]("touch_event_id"),
        r.getAs[Long]("credit_fp"))).toSet
    credits("ai0") shouldBe empty
    (credits("ai0") ++ credits("ai1")) shouldBe credits("att")
    // conflicting ewma modes fail loudly instead of silently picking one
    val exm = intercept[IllegalArgumentException] {
      App.run(platform, Seq("ewma", "--events-path", "ev",
        "--output-path", "nope", "--state-path", "st0", "--at-event", "true"))
    }
    exm.getMessage should include("mutually exclusive")
    // unattributed complement: no purchase lacks an in-window click here
    App.run(platform, Seq("attribution", "--events-path", "ev",
      "--output-path", "attu", "--unattributed", "true"))
    storage.rows("attu") shouldBe empty
    // conversion paths + rollup through the CLI
    App.run(platform, Seq("conversion-paths", "--events-path", "ev",
      "--output-path", "paths"))
    storage.rows("paths").map(_.getAs[String]("path")).toSet shouldBe
      Set("click>click")
    App.run(platform, Seq("conversion-paths", "--events-path", "ev",
      "--output-path", "tops", "--rollup", "true"))
    storage.rows("tops").head.getAs[Long]("n_conversions") shouldBe 1L
    // removal-effect report over the same journeys: click is in the one
    // journey (effect 1e6), the unused channels score 0
    App.run(platform, Seq("conversion-paths", "--events-path", "ev",
      "--output-path", "reff", "--removal-effect", "true"))
    storage.rows("reff")
      .map(r => r.getAs[String]("channel") -> r.getAs[Long]("removal_effect_ppm"))
      .toMap shouldBe Map("click" -> 1000000L, "view" -> 0L, "signup" -> 0L)
    val exr = intercept[IllegalArgumentException] {
      App.run(platform, Seq("conversion-paths", "--events-path", "ev",
        "--output-path", "nope2", "--rollup", "true", "--removal-effect", "true"))
    }
    exr.getMessage should include("mutually exclusive")
    // k-anonymity: user 7's 4 rows form one (user) class at k=5 -> at risk
    App.run(platform, Seq("k-anonymity",
      "--table-path", "ev", "--columns", "user_id,event_type",
      "--output-path", "ka", "--k", "2"))
    storage.rows("ka").find(_.getAs[String]("event_type") == "purchase")
      .get.getAs[Int]("at_risk") shouldBe 1
    // t-closeness through the same command; --t-ppm without the sensitive
    // column is a loud error
    App.run(platform, Seq("k-anonymity",
      "--table-path", "ev", "--columns", "user_id",
      "--sensitive-col", "event_type",
      "--output-path", "tc", "--t-ppm", "100000"))
    storage.rows("tc").head.getAs[Long]("tvd_ppm") shouldBe 0L // one class == global
    val ext = intercept[IllegalArgumentException] {
      App.run(platform, Seq("k-anonymity",
        "--table-path", "ev", "--columns", "user_id",
        "--output-path", "nope", "--t-ppm", "100000"))
    }
    ext.getMessage should include("--sensitive-col")
  }

  test("attribution state: a crashed partial era (surviving pending marker) is excluded") {
    import org.apache.spark.sql.functions.{col, lit}
    val storage = new InMemoryStorage
    val fetcher = new TestFetcher(storage)
    val writer = new TestWriter(storage)
    val platform = Platform(spark, fetcher, writer)
    def ev(id: Long, day: Int, user: Long, typ: String, v: Double) =
      (id, java.sql.Timestamp.valueOf(f"2024-01-$day%02d 06:00:00"), user, typ, v)
    val events = Seq(
      ev(1, 1, 7, "click", 1.0), ev(2, 2, 7, "click", 2.0),
      ev(3, 3, 7, "purchase", 10.0), ev(4, 4, 7, "click", 0.5))
      .toDF("event_id", "ts", "user_id", "event_type", "value")
    storage.write("ev_head", events.filter(col("event_id") <= 2), "overwrite")
    storage.write("ev_tail", events.filter(col("event_id") > 2), "overwrite")
    // era 0 committed: user 7 holds touches 1 and 2
    App.run(platform, Seq("attribution", "--events-path", "ev_head",
      "--state-path", "cst", "--output-path", "ci0"))
    storage.markers shouldBe empty // a clean append leaves no marker behind
    // simulate a crash mid-append of era 1: the pending marker survives and
    // the era's rows are TRUNCATED (the file carrying touch 2 never landed)
    writer.putMarker(spark, "cst/touch_state_eras", "pending_era_1")
    writer.writeParquet(
      fetcher.readParquet(spark, "cst/touch_state")
        .filter(col("touch_event_id") === 1L).withColumn("era", lit(1L)),
      "cst/touch_state", mode = "append")
    // the retry folds the tail shard: the purchase must credit BOTH stored
    // clicks (5M/5M) — reading the partial era would hand it touch 1 only
    // (10M to one click, silent under-crediting of touch 2)
    App.run(platform, Seq("attribution", "--events-path", "ev_tail",
      "--state-path", "cst", "--output-path", "ci1"))
    storage.rows("ci1")
      .map(r => r.getAs[Long]("touch_event_id") -> r.getAs[Long]("credit_fp"))
      .toMap shouldBe Map(1L -> 5000000L, 2L -> 5000000L)
    // the retry skipped PAST the condemned era and committed its own
    storage.rows("cst/touch_state").map(_.getAs[Long]("era")).max shouldBe 2L
    storage.markers.toSet shouldBe Set("cst/touch_state_eras/pending_era_1")
  }

  test("fuzzy-contamination, perplexity-buckets, dup-profile, and entropy subcommands") {
    import org.apache.spark.sql.functions.col
    val storage = new InMemoryStorage
    val platform = Platform(spark, new TestFetcher(storage), new TestWriter(storage))
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    storage.write("docs", docs, "overwrite")
    storage.write("train", docs.filter(col("doc_id") % 5 =!= 0), "overwrite")
    storage.write("bench", docs.filter(col("doc_id") % 5 === 0), "overwrite")
    storage.write("ref", docs.filter(col("source").isin("src0", "src1", "src2")),
      "overwrite")
    App.run(platform, Seq("fuzzy-contamination",
      "--docs-path", "train", "--benchmark-path", "bench",
      "--output-path", "fuzzy", "--threshold", "0.5"))
    storage.contains("fuzzy") shouldBe true
    storage.rows("fuzzy").foreach(_.getAs[Double]("max_jaccard") should be >= 0.5)
    App.run(platform, Seq("perplexity-buckets",
      "--docs-path", "docs", "--reference-path", "ref",
      "--output-path", "tiers"))
    val tiers = storage.rows("tiers")
    tiers.size shouldBe docs.count()
    tiers.flatMap(r => Option(r.getAs[Integer]("bucket")))
      .map(_.toInt).toSet shouldBe Set(1, 2, 3)
    App.run(platform, Seq("dup-profile",
      "--docs-path", "docs", "--output-path", "profile"))
    storage.rows("profile").foreach { r =>
      r.getAs[Double]("dup_ratio") should (be >= 0.0 and be <= 1.0)
    }
    App.run(platform, Seq("entropy",
      "--docs-path", "docs", "--output-path", "ent"))
    storage.rows("ent").size shouldBe docs.count()
    App.run(platform, Seq("corpus-card",
      "--docs-path", "docs", "--output-path", "card"))
    storage.rows("card/languages").map(_.getAs[String]("lang")).toSet shouldBe
      Set("en", "zh", "es", "de", "fr")
    storage.rows("card/sources").size shouldBe 20
    storage.rows("card/duplication").head
      .getAs[Double]("mean_dup_ratio") should (be >= 0.0 and be <= 1.0)
    storage.rows("card/quality").head
      .getAs[Double]("mean_entropy_nats") should be > 0.0
    // histogram buckets are powers of two covering every doc
    storage.rows("card/lengths").map(_.getAs[Long]("docs")).sum shouldBe docs.count()
  }

  test("corpus-card --state-path: two shard runs read off merged state == the one-shot card") {
    import org.apache.spark.sql.functions.col
    val storage = new InMemoryStorage
    val platform = Platform(spark, new TestFetcher(storage), new TestWriter(storage))
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    storage.write("all", docs, "overwrite")
    storage.write("shard1", docs.filter(col("doc_id") <= 25), "overwrite")
    storage.write("shard2", docs.filter(col("doc_id") > 25), "overwrite")
    App.run(platform, Seq("corpus-card",
      "--docs-path", "all", "--output-path", "card_full"))
    App.run(platform, Seq("corpus-card",
      "--docs-path", "shard1", "--output-path", "card_s1", "--state-path", "cstate"))
    App.run(platform, Seq("corpus-card",
      "--docs-path", "shard2", "--output-path", "card_s2", "--state-path", "cstate"))
    // the second incremental run covers the whole corpus: every facet
    // table equals the one-shot build exactly (per-doc stats append,
    // duplication postings union-merge)
    Seq("languages", "sources", "lengths", "duplication", "quality").foreach { t =>
      storage.rows(s"card_s2/$t").map(_.toSeq).toSet shouldBe
        storage.rows(s"card_full/$t").map(_.toSeq).toSet
    }
    // the first run saw only shard1: strictly fewer docs profiled
    storage.rows("card_s1/duplication").head.getAs[Long]("docs_profiled") should
      be < storage.rows("card_full/duplication").head.getAs[Long]("docs_profiled")
  }

  test("audit subcommand writes balance, drift, and padding reports") {
    val storage = new InMemoryStorage
    val platform = Platform(spark, new TestFetcher(storage), new TestWriter(storage))
    storage.write("docs_a", spark.read
      .parquet("/root/testdata/sf0.001/documents.parquet"), "overwrite")
    App.run(platform, Seq("audit",
      "--docs-path", "docs_a", "--output-path", "reports"))
    val balance = storage.rows("reports/split_balance")
    balance.size should be > 0
    balance.map(r => r.getAs[Long]("n_obs")).sum shouldBe 500L
    val drift = storage.rows("reports/source_drift")
    drift.size shouldBe 20 // one row per source
    drift.foreach { r =>
      val tv = r.getAs[Double]("tv_vs_rest")
      tv should (be >= 0.0 and be <= 1.0)
    }
    storage.rows("reports/length_buckets").size should be > 0
  }

  test("url-dedup and host-split subcommands: page dedup with appendable state, site-coherent splits") {
    import org.apache.spark.sql.functions.col
    val storage = new InMemoryStorage
    val platform = Platform(spark, new TestFetcher(storage), new TestWriter(storage))
    val docs = (0L until 60L).map(i =>
      (i, s"http://s${i % 10}.com/p${i % 20}?utm_source=x")).toDF("doc_id", "url")
    storage.write("docs", docs, "overwrite")
    App.run(platform, Seq("url-dedup",
      "--docs-path", "docs", "--output-path", "ud"))
    val oneShot = storage.rows("ud").map(_.toSeq).toSet
    oneShot.size shouldBe 60
    // two-shard incremental run: keeper/is_dup verdicts are FINAL at
    // ingest (ids only increase, so the first crawl can never be
    // displaced); group_size is as-of-ingest by design, so the
    // comparison covers the stable columns
    def stable(rows: Seq[org.apache.spark.sql.Row]) =
      rows.map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getAs[Int]("is_dup"))).toSet
    storage.write("s1", docs.filter(col("doc_id") < 30), "overwrite")
    storage.write("s2", docs.filter(col("doc_id") >= 30), "overwrite")
    App.run(platform, Seq("url-dedup",
      "--docs-path", "s1", "--output-path", "ud1", "--state-path", "ust"))
    App.run(platform, Seq("url-dedup",
      "--docs-path", "s2", "--output-path", "ud2", "--state-path", "ust"))
    (stable(storage.rows("ud1")) ++ stable(storage.rows("ud2"))) shouldBe stable(storage.rows("ud"))
    App.run(platform, Seq("host-split",
      "--docs-path", "docs", "--output-path", "hs"))
    val hs = storage.rows("hs")
      .map(r => (r.getAs[String]("host"), r.getAs[String]("split")))
    hs.groupBy(_._1).values.foreach(_.map(_._2).distinct.length shouldBe 1)
  }

  test("bpe-train -> tokenize -> pack chain; incremental pack equals one-shot") {
    import org.apache.spark.sql.functions.col
    val storage = new InMemoryStorage
    val platform = Platform(spark, new TestFetcher(storage), new TestWriter(storage))
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    storage.write("docs", docs, "overwrite")
    storage.write("shard1", docs.filter(col("doc_id") <= 25), "overwrite")
    storage.write("shard2", docs.filter(col("doc_id") > 25), "overwrite")
    App.run(platform, Seq("bpe-train",
      "--docs-path", "docs", "--merges-path", "merges", "--n-merges", "4"))
    storage.rows("merges").size shouldBe 4
    App.run(platform, Seq("tokenize",
      "--docs-path", "docs", "--merges-path", "merges", "--output-path", "enc"))
    storage.rows("enc").size shouldBe docs.count()
    App.run(platform, Seq("pack",
      "--encoded-path", "enc", "--output-path", "packed", "--seq-len", "48"))
    val oneShot = storage.rows("packed").map(_.toSeq).toSet
    // shard-by-shard: tokenize each against the SAME frozen merges, pack
    // the first, append the second
    App.run(platform, Seq("tokenize",
      "--docs-path", "shard1", "--merges-path", "merges", "--output-path", "enc1"))
    App.run(platform, Seq("tokenize",
      "--docs-path", "shard2", "--merges-path", "merges", "--output-path", "enc2"))
    App.run(platform, Seq("pack",
      "--encoded-path", "enc1", "--output-path", "packed1", "--seq-len", "48"))
    App.run(platform, Seq("pack",
      "--encoded-path", "enc2", "--output-path", "packed2", "--seq-len", "48",
      "--packed-path", "packed1"))
    storage.rows("packed2").map(_.toSeq).toSet shouldBe oneShot
  }

  test("media-dedup subcommand: batch pairs; two-shard incremental state == one-shot") {
    val storage = new InMemoryStorage
    val platform = Platform(spark, new TestFetcher(storage), new TestWriter(storage))
    val rows = (1L to 6L).flatMap { k => Seq(
      (2 * k, operators.Multimodal.encodeTestCard(k, "png"), "png"),
      (2 * k + 1, operators.Multimodal.encodeTestCard(k, "jpg"), "jpeg"))
    }
    val planted = (1L to 6L).map(k => (2 * k, 2 * k + 1)).toSet
    storage.write("media", rows.toDF("media_id", "payload", "format"), "overwrite")
    App.run(platform, Seq("media-dedup",
      "--media-path", "media", "--output-path", "pairs"))
    def pairs(path: String) = storage.rows(path)
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    pairs("pairs") shouldBe planted
    // incremental: PNGs first, JPEG mates second — every pair crosses the
    // shard boundary, so the second ingest must find ALL of them against
    // state alone (the first shard's payloads are never re-read)
    storage.write("shard1",
      rows.filter(_._1 % 2 == 0).toDF("media_id", "payload", "format"), "overwrite")
    storage.write("shard2",
      rows.filter(_._1 % 2 == 1).toDF("media_id", "payload", "format"), "overwrite")
    App.run(platform, Seq("media-dedup",
      "--media-path", "shard1", "--output-path", "p1", "--state-path", "st"))
    App.run(platform, Seq("media-dedup",
      "--media-path", "shard2", "--output-path", "p2", "--state-path", "st"))
    pairs("p1") shouldBe Set.empty
    pairs("p2") shouldBe planted
    storage.rows("st/hashes").size shouldBe 12
    // the fingerprint-config marker rejects a mismatched fold loudly
    the[IllegalArgumentException] thrownBy {
      App.run(platform, Seq("media-dedup",
        "--media-path", "shard2", "--output-path", "p3",
        "--state-path", "st", "--modality", "audio"))
    } should have message ("requirement failed: media-dedup: state at st " +
      "holds 'image' fingerprints but this run asked for 'audio' — " +
      "modality/stride define the signature; use a separate state path " +
      "per configuration")
    // hashes with NO marker (pre-marker or foreign state): unknown
    // configuration must refuse the fold, not silently mix signatures
    storage.write("st2/hashes",
      Seq((1L, 42L)).toDF("id", "hash"), "overwrite")
    the[IllegalArgumentException] thrownBy {
      App.run(platform, Seq("media-dedup",
        "--media-path", "shard2", "--output-path", "p4", "--state-path", "st2"))
    } should have message ("media-dedup: state at st2 has no fp_config " +
      "marker — its fingerprint configuration is unknown; re-seed the state")
    the[IllegalArgumentException] thrownBy {
      App.run(platform, Seq("media-dedup",
        "--media-path", "media", "--output-path", "x", "--modality", "gif"))
    } should have message "media-dedup: unknown modality 'gif' (image|audio|video)"
  }

  test("export-shards: size-bounded deterministic shard files reassemble the packed stream bit-for-bit") {
    import org.apache.spark.sql.functions.col
    // REAL fetcher/writer: the command's contract IS the on-disk layout
    // (one bounded ordered file per shard), which the in-memory doubles
    // cannot witness
    val tmp = java.nio.file.Files.createTempDirectory("graft_shards").toString
    val platform = Platform(spark, graft.sources.ProdFetcher, graft.sources.ProdWriter)
    try {
      spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
        .write.parquet(s"$tmp/docs")
      App.run(platform, Seq("bpe-train",
        "--docs-path", s"$tmp/docs", "--merges-path", s"$tmp/merges", "--n-merges", "4"))
      App.run(platform, Seq("tokenize",
        "--docs-path", s"$tmp/docs", "--merges-path", s"$tmp/merges",
        "--output-path", s"$tmp/enc"))
      App.run(platform, Seq("export-shards",
        "--encoded-path", s"$tmp/enc", "--seq-len", "48",
        "--output-path", s"$tmp/shards", "--rows-per-shard", "7"))
      val packed = operators.Packing.packTokenRows(
        spark.read.parquet(s"$tmp/enc"), seqLen = 48)
      val stream = packed.orderBy("row_id")
        .select("row_id", "ids", "n_pad").collect().map(_.toSeq).toSeq
      // one file per shard_id=K directory, each bounded by rows-per-shard
      val dirs = new java.io.File(s"$tmp/shards").listFiles()
        .filter(_.getName.startsWith("shard_id="))
      dirs.length.toLong shouldBe (stream.size + 6L) / 7L
      dirs.foreach { d =>
        withClue(s"${d.getName}:")(
          d.listFiles().count(_.getName.endsWith(".parquet")) shouldBe 1)
      }
      spark.read.parquet(s"$tmp/shards").groupBy("shard_id").count()
        .collect().foreach(_.getLong(1) should be <= 7L)
      def reassemble(path: String) = spark.read.parquet(path)
        .orderBy(col("shard_id"), col("shard_pos"))
        .select("row_id", "ids", "n_pad").collect().map(_.toSeq).toSeq
      // no epoch: shard concatenation == the packed stream, bit for bit
      reassemble(s"$tmp/shards") shouldBe stream
      // epoch export: deterministic across runs, same rows, genuinely
      // permuted, and the order IS epochShuffle's permutation
      spark.read.parquet(s"$tmp/enc")
        .write.parquet(s"$tmp/enc2") // distinct input path per run below
      App.run(platform, Seq("export-shards",
        "--encoded-path", s"$tmp/enc", "--seq-len", "48",
        "--output-path", s"$tmp/shards_e1", "--rows-per-shard", "7", "--epoch", "1"))
      App.run(platform, Seq("export-shards",
        "--encoded-path", s"$tmp/enc2", "--seq-len", "48",
        "--output-path", s"$tmp/shards_e1b", "--rows-per-shard", "7", "--epoch", "1"))
      val e1 = reassemble(s"$tmp/shards_e1")
      reassemble(s"$tmp/shards_e1b") shouldBe e1
      e1.toSet shouldBe stream.toSet
      e1 should not equal stream
      val expected = packed
        .join(operators.Sampling.epochShuffle(
          packed.select(col("row_id")), 1, idCol = "row_id"), "row_id")
        .orderBy("shuffle_pos")
        .select("row_id", "ids", "n_pad").collect().map(_.toSeq).toSeq
      e1 shouldBe expected
      // --packed-path consumes pre-packed rows identically
      packed.write.parquet(s"$tmp/packed")
      App.run(platform, Seq("export-shards",
        "--packed-path", s"$tmp/packed",
        "--output-path", s"$tmp/shards_pp", "--rows-per-shard", "7"))
      reassemble(s"$tmp/shards_pp") shouldBe stream
      // ...and the streaming pack gate's era-tagged log collapses
      // transparently: a superseded era-0 tail must NOT leak into shards
      packed.withColumn("era", org.apache.spark.sql.functions
          .when(col("row_id") >= 5, 1L).otherwise(0L))
        .unionByName(packed.filter(col("row_id") === 5)
          .withColumn("ids", org.apache.spark.sql.functions.expr(
            "transform(ids, x -> 0)")) // stale era-0 tail version
          .withColumn("era", org.apache.spark.sql.functions.lit(0L)))
        .write.parquet(s"$tmp/packed_log")
      App.run(platform, Seq("export-shards",
        "--packed-path", s"$tmp/packed_log",
        "--output-path", s"$tmp/shards_log", "--rows-per-shard", "7"))
      reassemble(s"$tmp/shards_log") shouldBe stream
      // integrity: the written _manifest verifies clean...
      App.run(platform, Seq("verify-shards", "--shards-path", s"$tmp/shards"))
      // ...a corrupted shard (one id flipped in shard 3) fails loudly with
      // its id; the _manifest dir stays invisible to root parquet reads
      val s3 = spark.read.parquet(s"$tmp/shards/shard_id=3").collect()
      spark.createDataFrame(
          spark.sparkContext.parallelize(s3.toSeq.map { r =>
            // file columns: (shard_pos, row_id, ids, n_pad) — shard_id
            // lives in the directory name
            org.apache.spark.sql.Row(r.getLong(0), r.getLong(1),
              r.getSeq[Int](2).updated(0, 999999), r.getLong(3))
          }),
          spark.read.parquet(s"$tmp/shards/shard_id=3").schema)
        .write.mode("overwrite").parquet(s"$tmp/shards/shard_id=3")
      val e = the[IllegalStateException] thrownBy
        App.run(platform, Seq("verify-shards", "--shards-path", s"$tmp/shards"))
      e.getMessage should include("fail integrity")
      e.getMessage should include("3")
      the[IllegalArgumentException] thrownBy App.run(platform, Seq("export-shards",
        "--packed-path", s"$tmp/packed", "--encoded-path", s"$tmp/enc",
        "--output-path", s"$tmp/x", "--rows-per-shard", "7")) should have message
        "export-shards: exactly one of --packed-path / --encoded-path is required"
    } finally org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(tmp))
  }

  test("release capstone: every gate lands, the manifest names them all, verify-shards passes") {
    import org.apache.spark.sql.functions.col
    // REAL fetcher/writer: the release contract IS the on-disk layout
    // (gate tables + sharded corpus + the manifest JSON written last)
    val tmp = java.nio.file.Files.createTempDirectory("graft_release").toString
    val platform = Platform(spark, graft.sources.ProdFetcher, graft.sources.ProdWriter)
    try {
      // the raw synthetic one-line corpus fails Gopher/C4 wholesale (the
      // q132 lesson) — append the constant clean-page suffix so the
      // ensemble genuinely splits and some docs survive to release
      val suffix = "\nThe editors have reviewed this report with care and attention." +
        "\nWe hope that you find the coverage to be useful and fair." +
        "\nPlease share the story of the day with friends and family."
      val all = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      // suffix the TRAIN side only: the benchmark needs no curation pass,
      // and a suffix shared across the split would (correctly!) trip the
      // substring-contamination gate on every doc
      all.filter(col("doc_id") > 40)
        .withColumn("text", org.apache.spark.sql.functions.concat(
          col("text"), org.apache.spark.sql.functions.lit(suffix)))
        .write.parquet(s"$tmp/docs")
      all.filter(col("doc_id") <= 40).write.parquet(s"$tmp/bench")
      // a gate set that drops EVERYTHING is a loud error, not an empty
      // artifact: raw unsuffixed docs fail curation wholesale
      spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
        .filter(col("doc_id") > 40).write.parquet(s"$tmp/docs_raw")
      val eEmpty = the[IllegalArgumentException] thrownBy App.run(platform, Seq("release",
        "--docs-path", s"$tmp/docs_raw", "--benchmark-path", s"$tmp/bench",
        "--positive-sources", "src0,src1,src2", "--negative-sources", "src3",
        "--output-path", s"$tmp/rel_empty", "--rows-per-shard", "16", "--n-merges", "4"))
      eEmpty.getMessage should include("zero documents survived")
      App.run(platform, Seq("release",
        "--docs-path", s"$tmp/docs", "--benchmark-path", s"$tmp/bench",
        "--positive-sources", "src0,src1,src2", "--negative-sources", "src3",
        "--quasi-columns", "lang", "--sensitive-col", "source",
        "--expectations", "not_null:text;unique:doc_id",
        "--output-path", s"$tmp/rel", "--rows-per-shard", "16", "--n-merges", "4"))
      val m = spark.read.json(s"$tmp/rel/manifest").head()
      // JSON inference may widen large integers to decimal — read
      // numerics type-agnostically
      def mL(name: String): Long = m.getAs[Number](name).longValue()
      // the manifest names every gate (--sensitive-col adds l_diversity,
      // --expectations adds gate 0)
      m.getAs[String]("gates").split(",").toSet shouldBe Set(
        "expectations", "curation", "contamination", "k_anonymity",
        "l_diversity", "corpus_card", "shard_integrity")
      // gate 0's verdict table landed, all rules green
      spark.read.parquet(s"$tmp/rel/expectations")
        .filter(col("passed") === 0).count() shouldBe 0L
      mL("ldiversity_classes") shouldBe
        spark.read.parquet(s"$tmp/rel/l_diversity").count()
      // and its counts are consistent with the written gate tables
      mL("curation_total") shouldBe
        spark.read.parquet(s"$tmp/rel/curation_verdict").count()
      mL("curation_total") shouldBe all.filter(col("doc_id") > 40).count()
      val released = spark.read.parquet(s"$tmp/rel/documents")
      mL("released_docs") shouldBe released.count()
      mL("released_docs") should be > 0L
      // contamination can only drop further; both gates genuinely filter
      mL("curation_kept") should be >= mL("released_docs")
      mL("curation_total") should be > mL("curation_kept")
      mL("contamination_checked") shouldBe mL("curation_kept")
      mL("kanonymity_classes") shouldBe
        spark.read.parquet(s"$tmp/rel/k_anonymity").count()
      m.getAs[String]("corpus_card_tables").split(",") should contain("languages")
      // every named corpus-card table actually landed
      m.getAs[String]("corpus_card_tables").split(",").foreach { t =>
        spark.read.parquet(s"$tmp/rel/corpus_card/$t").count() should be > 0L
      }
      mL("n_shards") shouldBe
        spark.read.parquet(s"$tmp/rel/shards/_manifest").count()
      mL("packed_rows") shouldBe
        spark.read.parquet(s"$tmp/rel/shards").count()
      // the loader-side integrity gate passes on the released shards
      App.run(platform, Seq("verify-shards", "--shards-path", s"$tmp/rel/shards"))
      // released docs all cleared both filters
      val verdicts = spark.read.parquet(s"$tmp/rel/curation_verdict")
      released.join(verdicts.filter(col("keep") === 0), Seq("doc_id"), "left_semi")
        .count() shouldBe 0L
      // the report-only manifest records that no enforcement ran
      m.getAs[String]("privacy_enforced") shouldBe "false"
      // --enforce-privacy: the audits become a GATE — at-risk quasi
      // classes drop before packing, the manifest names the gate and the
      // accounting closes (clean candidates = released + suppressed),
      // and the post-enforcement audits over the released rows read clean
      App.run(platform, Seq("release",
        "--docs-path", s"$tmp/docs", "--benchmark-path", s"$tmp/bench",
        "--positive-sources", "src0,src1,src2", "--negative-sources", "src3",
        "--quasi-columns", "lang", "--sensitive-col", "source",
        "--enforce-privacy", "true",
        "--output-path", s"$tmp/rel_enf", "--rows-per-shard", "16", "--n-merges", "4"))
      val me = spark.read.json(s"$tmp/rel_enf/manifest").head()
      def meL(name: String): Long = me.getAs[Number](name).longValue()
      me.getAs[String]("gates").split(",").toSet should contain("privacy_enforcement")
      me.getAs[String]("privacy_enforced") shouldBe "true"
      meL("privacy_suppressed") shouldBe
        (meL("contamination_clean") - meL("released_docs"))
      meL("privacy_suppressed") should be >= 0L
      meL("released_docs") shouldBe
        spark.read.parquet(s"$tmp/rel_enf/documents").count()
      // dropping a class never changes another class's size or diversity,
      // so the re-run audits must show zero surviving at-risk classes
      meL("kanonymity_at_risk") shouldBe 0L
      meL("ldiversity_at_risk") shouldBe 0L
      // an unknown mode is a loud error
      val eMode = the[IllegalArgumentException] thrownBy App.run(platform, Seq("release",
        "--docs-path", s"$tmp/docs", "--benchmark-path", s"$tmp/bench",
        "--positive-sources", "src0,src1,src2", "--negative-sources", "src3",
        "--enforce-privacy", "nope", "--output-path", s"$tmp/rel_bad"))
      eMode.getMessage should include("enforce-privacy")
      // a failing input expectation refuses the release BEFORE any gate
      // runs — the verdict evidence lands, the manifest does not
      val eExp = the[IllegalArgumentException] thrownBy App.run(platform, Seq("release",
        "--docs-path", s"$tmp/docs", "--benchmark-path", s"$tmp/bench",
        "--positive-sources", "src0,src1,src2", "--negative-sources", "src3",
        "--expectations", "in_set:lang=zz",
        "--output-path", s"$tmp/rel_exp", "--rows-per-shard", "16", "--n-merges", "4"))
      eExp.getMessage should include("expectation")
      spark.read.parquet(s"$tmp/rel_exp/expectations")
        .filter(col("passed") === 0).count() shouldBe 1L
      new java.io.File(s"$tmp/rel_exp/manifest").exists() shouldBe false
    } finally org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(tmp))
  }

  test("curation-verdict subcommand: per-doc keep/drop with the 5-gate fail bitmask") {
    import org.apache.spark.sql.functions.col
    val storage = new InMemoryStorage
    val platform = Platform(spark, new TestFetcher(storage), new TestWriter(storage))
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    storage.write("docs", docs, "overwrite")
    App.run(platform, Seq("curation-verdict",
      "--docs-path", "docs", "--output-path", "verdict",
      "--positive-sources", "src0,src1,src2",
      "--negative-sources", "src3,src4,src5"))
    val rows = storage.rows("verdict")
    rows.size shouldBe docs.count()
    rows.foreach { r =>
      val mask = r.getAs[Int]("fail_mask")
      mask should (be >= 0 and be <= 31)
      r.getAs[Int]("keep") shouldBe (if (mask == 0) 1 else 0)
    }
    // explicit seed frames behave identically to source filters
    storage.write("pos", docs.filter(col("source").isin("src0", "src1", "src2")), "overwrite")
    storage.write("neg", docs.filter(col("source").isin("src3", "src4", "src5")), "overwrite")
    App.run(platform, Seq("curation-verdict",
      "--docs-path", "docs", "--output-path", "verdict2",
      "--positive-path", "pos", "--negative-path", "neg"))
    storage.rows("verdict2").map(r => (r.getLong(0), r.getAs[Int]("fail_mask"))).toSet shouldBe
      rows.map(r => (r.getLong(0), r.getAs[Int]("fail_mask"))).toSet
  }

  test("contamination-verdict subcommand: 4-gate method bitmask; embedding gates optional") {
    import org.apache.spark.sql.functions.col
    val storage = new InMemoryStorage
    val platform = Platform(spark, new TestFetcher(storage), new TestWriter(storage))
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    storage.write("train", docs.filter(col("doc_id") > 10), "overwrite")
    storage.write("bench", docs.filter(col("doc_id") <= 10), "overwrite")
    storage.write("train_emb", emb.filter(col("vec_id") > 10), "overwrite")
    storage.write("bench_emb", emb.filter(col("vec_id") <= 10), "overwrite")
    App.run(platform, Seq("contamination-verdict",
      "--docs-path", "train", "--benchmark-path", "bench",
      "--embeddings-path", "train_emb", "--benchmark-embeddings-path", "bench_emb",
      "--output-path", "leaks"))
    val rows = storage.rows("leaks")
    rows.size shouldBe docs.filter(col("doc_id") > 10).count()
    rows.foreach { r =>
      val mask = r.getAs[Int]("method_mask")
      mask shouldBe (r.getAs[Int]("ngram_hit") + r.getAs[Int]("substr_hit") * 2
        + r.getAs[Int]("fuzzy_hit") * 4 + r.getAs[Int]("embed_hit") * 8)
      r.getAs[Int]("clean") shouldBe (if (mask == 0) 1 else 0)
    }
    // text-only run: embedding bit never sets, other gates unchanged
    App.run(platform, Seq("contamination-verdict",
      "--docs-path", "train", "--benchmark-path", "bench",
      "--output-path", "leaks_text"))
    val textRows = storage.rows("leaks_text")
    textRows.foreach(_.getAs[Int]("embed_hit") shouldBe 0)
    textRows.map(r => (r.getLong(0), r.getAs[Int]("ngram_hit"), r.getAs[Int]("substr_hit"),
      r.getAs[Int]("fuzzy_hit"))).toSet shouldBe
      rows.map(r => (r.getLong(0), r.getAs[Int]("ngram_hit"), r.getAs[Int]("substr_hit"),
        r.getAs[Int]("fuzzy_hit"))).toSet
  }

  test("expectations subcommand: rule parsing, verdicts, fail-on-violation") {
    val storage = new InMemoryStorage
    val platform = Platform(spark, new TestFetcher(storage), new TestWriter(storage))
    storage.write("d", Seq(
      (1L, Option("aaa"), Option("en"), 10L, "src1"),
      (2L, Option("bbb"), Option("de"), 20L, "src2"),
      (2L, Option("ccc"), Option("xx"), 30L, "src3"),
      (4L, None, None, 99L, "weird"))
      .toDF("id", "text", "lang", "score", "source"), "overwrite")
    storage.write("parent", Seq(1L, 2L).toDF("pid"), "overwrite")
    App.run(platform, Seq("expectations",
      "--docs-path", "d", "--output-path", "v",
      "--rules", "not_null:text;unique:id;in_set:lang=en|de;" +
        "in_range:score=0..50;regex:source=^src[0-9]$;row_count:1..1000;" +
        "fk:id->parent:pid"))
    val out = storage.rows("v")
      .map(r => r.getAs[String]("rule") ->
        (r.getAs[Long]("n_violations"), r.getAs[Int]("passed"))).toMap
    out("not_null") shouldBe ((1L, 0))
    out("unique") shouldBe ((2L, 0))
    out("in_set") shouldBe ((1L, 0))
    out("in_range") shouldBe ((1L, 0))
    out("matches_regex") shouldBe ((1L, 0))
    out("row_count_between") shouldBe ((0L, 1))
    out("foreign_key") shouldBe ((1L, 0))
    // the gate form refuses to promote
    an[IllegalStateException] should be thrownBy
      App.run(platform, Seq("expectations",
        "--docs-path", "d", "--output-path", "v2",
        "--rules", "not_null:text", "--fail-on-violation", "true"))
    // unknown rule kinds fail loudly at parse time
    an[IllegalArgumentException] should be thrownBy
      App.run(platform, Seq("expectations",
        "--docs-path", "d", "--output-path", "v3",
        "--rules", "uniq:id"))
  }

  test("rfm and traffic-anomaly subcommands") {
    val storage = new InMemoryStorage
    val platform = Platform(spark, new TestFetcher(storage), new TestWriter(storage))
    def ev(id: Long, day: Int, user: Long, typ: String, v: Double) =
      (id, java.sql.Timestamp.valueOf(f"2024-01-$day%02d 12:00:00"), user, typ, v)
    // RfmSpec's hand case: cells 222/222/111/121 at 2 buckets
    val events = Seq(
      ev(1, 1, 1, "purchase", 2.0), ev(2, 9, 1, "view", 9.9),
      ev(3, 8, 2, "click", 0.0), ev(4, 8, 2, "purchase", 5.5),
      ev(5, 5, 3, "view", 0.0),
      ev(6, 1, 4, "purchase", 1.0), ev(7, 2, 4, "view", 0.0),
      ev(8, 3, 4, "click", 0.0), ev(9, 4, 4, "view", 0.0))
      .toDF("event_id", "ts", "user_id", "event_type", "value")
    storage.write("ev", events, "overwrite")
    App.run(platform, Seq("rfm", "--events-path", "ev",
      "--output-path", "seg", "--buckets", "2"))
    storage.rows("seg")
      .map(r => r.getAs[Long]("user_id") -> r.getAs[Long]("rfm_cell"))
      .toMap shouldBe Map(1L -> 222L, 2L -> 222L, 3L -> 111L, 4L -> 121L)

    // AnomalySpec's hand case: counts 10,10,10,16,10 at W=2, k=1 —
    // the spike day flags, the first two days have no complete window
    val traffic = (1 to 5).flatMap { d =>
      val n = if (d == 4) 16 else 10
      (1 to n).map(i => (d * 100L + i,
        java.sql.Timestamp.valueOf(f"2024-01-$d%02d 12:00:00")))
    }.toDF("event_id", "ts")
    storage.write("traffic", traffic, "overwrite")
    App.run(platform, Seq("traffic-anomaly", "--events-path", "traffic",
      "--output-path", "verdicts", "--window-days", "2",
      "--k-num", "1", "--k-den", "1"))
    val byDay = storage.rows("verdicts").map { r =>
      r.getAs[Long]("day") ->
        (if (r.isNullAt(r.fieldIndex("is_anomaly"))) None
         else Some(r.getAs[Int]("is_anomaly")))
    }.toMap
    byDay shouldBe Map(
      19723L -> None, 19724L -> None,
      19725L -> Some(0), 19726L -> Some(1), 19727L -> Some(0))
  }
}
