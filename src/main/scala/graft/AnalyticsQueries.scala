package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions
import graft.functions.TextFunctions.{collapseRepeats, shingleHashes}
import graft.operators.{BloomFilter, FrequencySketch, Packing, Quantiles, Sampling, Sessionize, Vocabulary}
import graft.TrainingDataQueries.{docSetsSql, polyHashSql, toksSql}

/** Round-6 analytics operators: event sessionization, frequency sketches,
  * Bloom pruning, OLAP reporting shapes, and corpus mixing — each with a
  * DuckDB oracle twin, same parity strategy as [[TrainingDataQueries]]
  * (pinned constants, ordered folds, integer math wherever a value crosses
  * engines).
  */
object AnalyticsQueries {

  /** Session gap: 4 hours. The sf corpus' median per-user inter-event gap
    * is ~7.3h, so this cut yields a real mix of multi-event sessions and
    * singletons (a 30-min web-style gap would make nearly every event its
    * own session in this data).
    */
  private val SessionGapSeconds = 14400L

  /** Latest q186 windowed-replay result, keyed (session, sf dir). The
    * q186b checksum probe exists to roll up the SAME emitted rows q186
    * hashed — sharing one replay per Verify/Bench pass is therefore more
    * faithful to the probe's purpose than paying a second full harness
    * run (and saves ~7s of suite). Directional on purpose: the q186
    * contract row ALWAYS runs a fresh replay (so its bench timing is the
    * honest harness cost) and refreshes the memo; only q186b reuses, and
    * it falls back to its own run when no same-keyed replay exists (e.g.
    * a subset Verify naming only q186b). The stored frame is the
    * harness's already-materialized local result, not a live plan.
    */
  private val windowedReplayMemo =
    new java.util.concurrent.atomic.AtomicReference[(String, DataFrame)](null)

  private def windowedReplayShared(s: SparkSession, dir: String,
                                   refresh: Boolean): DataFrame = {
    val key = System.identityHashCode(s).toString + "|" + dir
    val cur = windowedReplayMemo.get()
    if (!refresh && cur != null && cur._1 == key) cur._2
    else {
      val out = graft.streaming.EventStream.windowedIngestReplay(
        s, SparkEntry.events(s, dir))
      windowedReplayMemo.set((key, out))
      out
    }
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // gap-based sessionization + per-session rollup: one shuffle on
    // user_id, integer-exact outputs (micros, counts)
    "q54_sessionize" -> ((s, dir) =>
      Sessionize.sessions(SparkEntry.events(s, dir), SessionGapSeconds)),

    // count-min sketch term frequencies: per-SOURCE shard sketches,
    // sum-merged to the corpus sketch (merge-of-parts == single-pass, the
    // property the oracle pins), probed for the exact top-50 tokens so the
    // upper-bound estimate sits next to the true tf
    "q55_token_freq_cms" -> ((s, dir) => {
      val docs = s.read.parquet(s"$dir/documents.parquet")
      val occ = docs.select(col("source"),
        explode(TextFunctions.tokens(col("text"))).as("token"))
      val merged = FrequencySketch.merge(
        FrequencySketch.sketch(occ, "token", Seq("source")))
      FrequencySketch.estimate(merged, Vocabulary.topTokens(docs, 50), "token")
    }),

    // Bloom-pruned contamination gate: the benchmark's shingle set
    // collapses to a broadcast 8 KiB bit array instead of q45's full
    // distinct-hash broadcast. No false negatives (every q45 contaminated
    // doc flags here too — BloomFilterSpec pins it); false positives only
    // send extra docs to the exact verifier
    "q56_bloom_contamination" -> ((s, dir) => {
      val sets = s.read.parquet(s"$dir/documents.parquet")
        .select(col("doc_id").as("id"), shingleHashes(col("text"), 3).as("hashes"))
        .filter(size(col("hashes")) > 0)
      val bloom = BloomFilter.build(
        sets.filter(col("id") <= 25).select(explode(col("hashes")).as("h")).distinct(), "h")
      val posting = sets.filter(col("id") > 25)
        .select(col("id"), explode(col("hashes")).as("h"))
      BloomFilter.mightContain(bloom, posting, "h", Seq("id"))
        .groupBy(col("id"))
        .agg(count(lit(1)).as("n_shingles"), sum(col("in_bloom")).as("n_bloom_hits"))
        .select(col("id").as("doc_id"), col("n_shingles"), col("n_bloom_hits"),
          (col("n_bloom_hits") > 0).cast("int").as("maybe_contaminated"))
    }),

    // OLAP rollup report: corpus size by (lang, source) with subtotal and
    // grand-total rows — ONE aggregate producing all three grouping levels
    // (never three scans + union), the standard reporting shape
    "q57_rollup_report" -> ((s, dir) =>
      s.read.parquet(s"$dir/documents.parquet")
        .rollup(col("lang"), col("source"))
        .agg(
          grouping_id().as("grouping_level"),
          count(lit(1)).as("n_docs"),
          sum(col("n_chars")).as("total_chars"))
        .select("lang", "source", "grouping_level", "n_docs", "total_chars")),

    // pivot to a wide per-user feature row: event-type counts as columns,
    // expressed as ONE conditional aggregate over a PINNED type list.
    // Deliberately not RelationalGroupedDataset.pivot: even with explicit
    // values that lowers to a two-phase aggregate — a (user, type) shuffle
    // feeding a second user shuffle — where this shape is a single
    // map-side-combinable pass (PlanSpec pins the 1-Exchange plan)
    "q58_pivot_event_counts" -> ((s, dir) =>
      SparkEntry.events(s, dir)
        .groupBy(col("user_id"))
        .agg(
          count(when(col("event_type") === EventTypes.head, 1)).as(s"n_${EventTypes.head}"),
          EventTypes.tail.map(t =>
            count(when(col("event_type") === t, 1)).as(s"n_$t")): _*)),

    // temperature mixing (unigram^0.5): flatten the language head without
    // the hard quota cut of q44 — per-category keep-rates from one tiny
    // aggregate, membership row-local content hashing
    "q59_temperature_mix" -> ((s, dir) =>
      Sampling.temperatureMix(
        s.read.parquet(s"$dir/documents.parquet"), "lang", "text", targetTotal = 300L)
        .select(col("doc_id"), col("lang"), col("category_n"), col("mix_rate_ppm"))),

    // overlapping sliding-window chunking (window 96, stride 64 — the
    // long-context training cut; sized so the sf corpus' docs actually
    // produce multi-window output): row-local explode, zero shuffle
    "q60_sliding_chunks" -> ((s, dir) =>
      Packing.slidingWindows(
        s.read.parquet(s"$dir/documents.parquet")
          .select(col("doc_id"), size(TextFunctions.tokens(col("text"))).as("n_tokens")),
        windowTokens = 96L, strideTokens = 64L)),

    // consecutive-duplicate collapse: the stutter normalization, with the
    // normalized fingerprint so downstream exact-dedup can run on the
    // cleaned form without materializing it
    "q61_collapse_repeats" -> ((s, dir) => {
      val toks = TextFunctions.tokens(col("text"))
      s.read.parquet(s"$dir/documents.parquet")
        .select(col("doc_id"), toks.as("w"), collapseRepeats(toks).as("kept"))
        .select(
          col("doc_id"),
          size(col("w")).cast("long").as("n_tokens"),
          (size(col("w")) - size(col("kept"))).cast("long").as("n_collapsed"),
          TextFunctions.polyHash(array_join(col("kept"), " ")).as("norm_hash"))
    }),

    // robust per-language length gate: keep docs within 2 MADs of their
    // language's median length (2, not the textbook 3: this corpus' length
    // spread sits inside 3 MADs, which would make the gate a no-op) —
    // medians off bounded per-group histograms, the gate a row-local
    // rational comparison
    "q62_mad_outliers" -> ((s, dir) =>
      Quantiles.madOutlierGate(
        s.read.parquet(s"$dir/documents.parquet")
          .select(col("doc_id"), col("lang"), col("n_chars").cast("double").as("n_chars")),
        "lang", "n_chars", kNum = 2L, kDen = 1L, precision = 6)
        .select("doc_id", "lang", "n_chars", "group_median", "abs_dev", "group_mad")),

    // within-session transition matrix (Markov next-action counts):
    // composes q54's session assignment; output is at most |types|^2 rows
    "q63_session_transitions" -> ((s, dir) =>
      Sessionize.transitions(SparkEntry.events(s, dir), SessionGapSeconds)),

    // the decontamination APPLY step: q45 reports overlap, this one acts
    // on it — drop every training doc sharing any verbatim 3-gram with
    // the benchmark slice, via LEFT ANTI against the (broadcast)
    // contaminated-id set. The kept corpus is what ships to training
    "q64_decontaminate" -> ((s, dir) => {
      val d = s.read.parquet(s"$dir/documents.parquet")
      val contaminated = graft.operators.Contamination
        .check(d.filter(col("doc_id") > 25), d.filter(col("doc_id") <= 25))
        .filter(col("contaminated") === 1)
        .select(col("doc_id").as("bad_id"))
      d.filter(col("doc_id") > 25)
        .join(broadcast(contaminated), col("doc_id") === col("bad_id"), "left_anti")
        .select(col("doc_id"), col("lang"), col("source"), col("n_chars"))
    }),

    // time-series OLAP over the orders fact: daily revenue, 7-day moving
    // window, day-over-day delta. Money is quantized to INTEGER CENTS at
    // the scan — `floor(o_totalprice * 100 + 0.5)` is a fixed sequence of
    // single IEEE-754 ops (multiply, add, floor) that every engine
    // evaluates bit-identically, unlike double→DECIMAL casts whose
    // rounding is engine- and version-dependent (decimal-string HALF_UP
    // vs binary — the round-7 driver mismatch). Everything downstream
    // (sums, window, delta) is BIGINT arithmetic: exact, order-free, and
    // hash-stable across engines by construction. The per-day aggregate
    // collapses the fact table FIRST, then a calendar DATE SPINE
    // densifies gap days to zero-revenue rows — without it the ROWS
    // frames would silently span whatever days happen to be present, and
    // "7-day window" / "day-over-day" would be row-counting lies on
    // sparse calendars. The window's frame is still bounded (calendar
    // days, not orders)
    "q65_revenue_trend" -> ((s, dir) => {
      val daily = s.read.parquet(s"$dir/orders.parquet")
        .groupBy(to_date(col("o_orderdate")).as("day"))
        .agg(
          sum(floor(col("o_totalprice") * lit(100.0d) + lit(0.5d)))
            .cast("bigint").as("revenue_cents"),
          count(lit(1)).as("n_orders"))
      val spine = daily.agg(min(col("day")).as("d0"), max(col("day")).as("d1"))
        .select(explode(sequence(col("d0"), col("d1"))).as("day"))
      val dense = spine.join(daily, Seq("day"), "left")
        .select(col("day"),
          coalesce(col("revenue_cents"), lit(0L)).as("revenue_cents"),
          coalesce(col("n_orders"), lit(0L)).as("n_orders"))
      val w = org.apache.spark.sql.expressions.Window.orderBy(col("day"))
      dense
        .withColumn("revenue_7d_cents",
          sum(col("revenue_cents")).over(w.rowsBetween(-6, 0)))
        .withColumn("prev_cents", lag(col("revenue_cents"), 1).over(w))
        .select(
          col("day"),
          col("revenue_cents"),
          col("n_orders"),
          col("revenue_7d_cents"),
          (col("revenue_cents") - coalesce(col("prev_cents"), col("revenue_cents")))
            .as("dod_delta_cents"))
    }),

    // q65 driver-gate bisection probes: strict prefixes of q65's column
    // set so a residual cross-engine divergence pinpoints itself in the
    // correctness report. q65a carries no money at all (day + counts on
    // the densified spine) — if IT mismatches, the divergence is the
    // date/spine machinery, not arithmetic. q65b adds only the cents
    // rollup — if q65a is green and q65b red, the quantization line is
    // the culprit; if both are green and q65 red, it's the window frame
    "q65a_revenue_days" -> ((s, dir) => {
      val daily = s.read.parquet(s"$dir/orders.parquet")
        .groupBy(to_date(col("o_orderdate")).as("day"))
        .agg(count(lit(1)).as("n_orders"))
      val spine = daily.agg(min(col("day")).as("d0"), max(col("day")).as("d1"))
        .select(explode(sequence(col("d0"), col("d1"))).as("day"))
      spine.join(daily, Seq("day"), "left")
        .select(col("day"), coalesce(col("n_orders"), lit(0L)).as("n_orders"))
    }),
    "q65b_revenue_daily" -> ((s, dir) => {
      val daily = s.read.parquet(s"$dir/orders.parquet")
        .groupBy(to_date(col("o_orderdate")).as("day"))
        .agg(
          sum(floor(col("o_totalprice") * lit(100.0d) + lit(0.5d)))
            .cast("bigint").as("revenue_cents"),
          count(lit(1)).as("n_orders"))
      val spine = daily.agg(min(col("day")).as("d0"), max(col("day")).as("d1"))
        .select(explode(sequence(col("d0"), col("d1"))).as("day"))
      spine.join(daily, Seq("day"), "left")
        .select(col("day"),
          coalesce(col("revenue_cents"), lit(0L)).as("revenue_cents"),
          coalesce(col("n_orders"), lit(0L)).as("n_orders"))
    }),

    // grouped top-k (the per-category leaderboard shape q07/q08 don't
    // cover: k > 1 WITH ties broken deterministically): 3 longest docs
    // per language
    "q66_topk_per_group" -> ((s, dir) => {
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("lang")).orderBy(col("n_chars").desc, col("doc_id").asc)
      s.read.parquet(s"$dir/documents.parquet")
        .select(col("doc_id"), col("lang"), col("n_chars"),
          row_number().over(w).as("rank"))
        .filter(col("rank") <= 3)
    }),

    // per-row percentile rank via the bounded histogram + broadcast
    // lookup — cume_dist semantics WITHOUT sorting each group's rows in
    // one task (the per-lang length percentile as a training feature)
    "q67_length_percentile" -> ((s, dir) =>
      Quantiles.percentileRank(
        s.read.parquet(s"$dir/documents.parquet")
          .select(col("doc_id"), col("lang"), col("n_chars").cast("double").as("n_chars")),
        "lang", "n_chars", precision = 6)
        .select("doc_id", "lang", "n_chars", "pct_rank")),

    // ordered session funnel signup -> view -> purchase: sessions collapse
    // to one bounded row each (min ts per step), the chain walk is
    // row-local, and the report is a |steps|+1-row cumulative
    "q68_session_funnel" -> ((s, dir) =>
      Sessionize.funnel(SparkEntry.events(s, dir), SessionGapSeconds,
        steps = Seq("signup", "view", "purchase"))),

    // q66's leaderboard re-shaped for a skewed group: two-phase salted
    // top-k — no task ever sorts more than hot-group/numSalts rows; the
    // oracle is the SAME single-window SQL as q66 because the result is
    // salt-invariant
    "q69_topk_salted" -> ((s, dir) =>
      graft.operators.Skew.groupedTopK(
        s.read.parquet(s"$dir/documents.parquet")
          .select(col("doc_id"), col("lang"), col("n_chars")),
        "lang", Seq(col("n_chars").desc, col("doc_id").asc), k = 3)
        .select(col("doc_id"), col("lang"), col("n_chars"), col("rank"))),

    // cohort retention: users bucketed by first-seen week, activity
    // counted per (cohort, week offset) — the classic retention matrix.
    // First-seen is ONE combinable min aggregate; the join back is keyed
    // on user_id (the layout every pipeline here shuffles on — a bucketed
    // events table serves it exchange-free); the matrix aggregate's
    // distinct-user count shuffles (cohort, offset, user) short rows
    "q70_cohort_retention" -> ((s, dir) => {
      val ev = SparkEntry.events(s, dir)
      val cohorts = ev.groupBy(col("user_id")).agg(min(col("ts")).as("first_ts"))
        .select(col("user_id").as("__co_user"),
          date_trunc("week", col("first_ts")).cast("date").as("cohort_week"))
      ev.select(col("user_id"), date_trunc("week", col("ts")).cast("date").as("activity_week"))
        .join(cohorts, col("user_id") === col("__co_user"))
        .groupBy(col("cohort_week"),
          expr("CAST(datediff(activity_week, cohort_week) DIV 7 AS INT)").as("week_offset"))
        .agg(countDistinct(col("user_id")).as("n_active"))
    }),

    // character-level verification layered on the LSH pairs: edit distance
    // and normalized similarity for every MinHash near-dup pair — the
    // char-granular confirmation set-based Jaccard can't give (catches
    // e.g. high-overlap shingle sets from reordered text). Distance runs
    // only on CANDIDATE pairs, never all pairs
    "q72_dedup_editdist" -> ((s, dir) => {
      val d = s.read.parquet(s"$dir/documents.parquet")
      val pairs = graft.operators.Dedup.minhashLshPairs(d)
      val ta = d.select(col("doc_id").as("id_a"), col("text").as("__text_a"))
      val tb = d.select(col("doc_id").as("id_b"), col("text").as("__text_b"))
      pairs.join(ta, "id_a").join(tb, "id_b")
        .withColumn("__lev", levenshtein(col("__text_a"), col("__text_b")).cast("long"))
        .withColumn("__maxlen",
          greatest(length(col("__text_a")), length(col("__text_b"))).cast("long"))
        .select(col("id_a"), col("id_b"), col("jaccard"),
          col("__lev").as("edit_dist"),
          // (maxlen-lev)/maxlen rounded half-up to 6 places in exact integer
          // arithmetic + one IEEE division (engine-version-proof; no
          // round(double) anywhere)
          expr("CAST((2000000 * (__maxlen - __lev) + __maxlen)" +
            " div (2 * __maxlen) AS DOUBLE) / 1000000.0").as("edit_sim"))
    }),

    // split drift: total-variation distance between the train and val
    // splits' length distributions — the post-split sanity check that the
    // content-hash assignment didn't skew a feature (exact integer
    // numerator, one pinned double division)
    "q73_split_drift" -> ((s, dir) => {
      val split = Sampling.assignSplit(
        s.read.parquet(s"$dir/documents.parquet"), "text")
        .select(col("split"), col("n_chars").cast("double").as("n_chars"))
      Quantiles.tvDistance(
        split.filter(col("split") === "train"),
        split.filter(col("split") === "val"),
        "n_chars", precision = 6)
    }),

    // NEAREST join (bidirectional as-of): each purchase aligned to the
    // closest view reading within +/- 6h, either direction, ties to the
    // earlier — the sensor-alignment shape backward-only as-of can't
    // express. Readings pre-aggregate to unique (user, ts) per the
    // snapshot contract; times are integer micros end-to-end
    "q85_nearest_join" -> ((s, dir) => {
      val ev = SparkEntry.events(s, dir).withColumn("ts_us", expr("unix_micros(ts)"))
      val labels = ev.filter(col("event_type") === "purchase")
        .select(col("event_id"), col("user_id"), col("ts_us"))
      val readings = ev.filter(col("event_type") === "view")
        .groupBy(col("user_id"), col("ts_us"))
        .agg(max(col("value")).as("f_value"))
        .withColumnRenamed("ts_us", "f_ts_us")
      graft.operators.AsOfJoin.nearest(labels, readings, "user_id",
        "ts_us", "f_ts_us", Seq("f_ts_us", "f_value"),
        tolerance = NearestToleranceUs)
    }),

    // funnel latency: median and p90 signup->purchase delay within a
    // session — per-session deltas (one bounded row each) through the
    // bounded histogram, scalar results broadcast (sanctioned one-row
    // cross joins, the q43 shape)
    "q92_time_to_convert" -> ((s, dir) => {
      val deltas = Sessionize.timeToConvert(
        SparkEntry.events(s, dir), SessionGapSeconds, "signup", "purchase")
        .select(col("delta_us").cast("double").as("delta_us"))
      val n = deltas.agg(count(lit(1)).as("n_converted"))
      val med = Quantiles.quantileThreshold(deltas, "delta_us", 1L, 2L, 0)
        .withColumnRenamed("threshold", "median_delta_us")
      val p90 = Quantiles.quantileThreshold(deltas, "delta_us", 9L, 10L, 0)
        .withColumnRenamed("threshold", "p90_delta_us")
      n.crossJoin(broadcast(med)).crossJoin(broadcast(p90))
    }),

    // the third mergeable sketch: per-(lang, source) HISTOGRAMS sum-merge
    // per lang, and the median read off the merged bins hash-matches the
    // single-pass per-lang median — bin addition is associative, so the
    // oracle computes the direct answer (same contract shape as q50's
    // HLL max-merge and q55's CMS sum-merge)
    "q71_histogram_merge" -> ((s, dir) => {
      val d = s.read.parquet(s"$dir/documents.parquet")
        .select(col("lang"), col("source"), col("n_chars").cast("double").as("n_chars"))
      val perSource = Quantiles.groupedHistogram(d, Seq("lang", "source"), "n_chars", 6)
      val merged = Quantiles.mergeHistograms(perSource, Seq("lang"))
      val thr = Quantiles.thresholdFromHistogram(merged, "lang", qNum = 1L, qDen = 2L)
      val shards = perSource.select(col("lang"), col("source")).distinct()
        .groupBy(col("lang")).agg(count(lit(1)).as("n_shards"))
        .withColumnRenamed("lang", "__hm_lang")
      thr.join(shards, col("lang") <=> col("__hm_lang")).drop("__hm_lang")
    }),

    // table profiling: the per-column data-quality report (rows, nulls,
    // exact distinct, native-order min/max, modal value, mean stringified
    // length) over every documents column — two passes, one combinable
    // aggregate + one (column, value) posting shuffle
    "q150_profile" -> ((s, dir) => graft.operators.Profile.tableProfile(
      s.read.parquet(s"$dir/documents.parquet"), ProfileCols)),

    // profile drift: the before/after data-quality alert — before is the
    // first-half snapshot profiling (doc_id, text, lang, source), after
    // is the full corpus profiling (doc_id, text, lang, n_chars), so the
    // diff exercises common/removed/added rows plus every delta column
    "q154_profile_diff" -> ((s, dir) => {
      val d = s.read.parquet(s"$dir/documents.parquet")
      graft.operators.Profile.diffProfiles(
        graft.operators.Profile.tableProfile(
          d.filter(col("doc_id") <= ProfileSplitId),
          Seq("doc_id", "text", "lang", "source")),
        graft.operators.Profile.tableProfile(d,
          Seq("doc_id", "text", "lang", "n_chars")))
    }),

    // exponentially-decayed per-user event value (EWMA) — the
    // recency-weighted feature-store form of the backfill counts: exact
    // integer fixed point folded in (event time, event id) order via the
    // ordered-collect left fold, one user-keyed shuffle
    "q162_ewma" -> ((s, dir) =>
      graft.operators.DecayFeatures.ewma(SparkEntry.events(s, dir))),

    // INCREMENTAL EWMA: build per-user state on the first half-month,
    // fold the second half in (stored events never re-read — the EWMA
    // recurrence composes exactly by continuing the fold from the stored
    // accumulator), read the features off the merged state — equals the
    // one-shot q162 fold bit-for-bit (the q153/q143 increment contract)
    "q163_ewma_incremental" -> ((s, dir) => {
      val e = SparkEntry.events(s, dir)
      val cut = lit(EwmaCutDate).cast("timestamp")
      graft.operators.DecayFeatures.incrementEwma(
        graft.operators.DecayFeatures.ewmaState(e.filter(col("ts") < cut)),
        e.filter(col("ts") >= cut))
        .select(col("user_id"), col("n_events"), col("ewma_fp"), col("last_ts_us"))
    }),

    // multi-touch linear attribution: each purchase's fixed-point value
    // splits equally across the user's in-window clicks, remainder to the
    // most recent touch — credits conserve the conversion value EXACTLY;
    // one user-keyed band join + one combinable per-conversion aggregate
    "q168_attribution" -> ((s, dir) =>
      graft.operators.Attribution.linearAttribution(
        SparkEntry.events(s, dir), windowDays = AttributionWindowDays)),

    // point-in-time EWMA: the decayed feature AS-OF every event — what a
    // training-set join reads at label time (q162's end-of-stream value
    // would leak the future); per-event rows joinable like the backfill
    // features feed the PIT join
    "q167_ewma_at_event" -> ((s, dir) =>
      graft.operators.DecayFeatures.ewmaAtEvent(SparkEntry.events(s, dir))),

    // k-anonymity audit: quasi-identifier (lang, source, length-bucket)
    // equivalence classes with size-below-k risk flags — the
    // re-identification report a training-data release runs; one
    // combinable aggregate bounded by the distinct quasi domain
    "q165_kanonymity" -> ((s, dir) =>
      graft.operators.Profile.kAnonymity(
        s.read.parquet(s"$dir/documents.parquet")
          .select(col("lang"), col("source"),
            expr("n_chars div 256").as("len_bucket")),
        Seq("lang", "source", "len_bucket"), k = KAnonK)),

    // CMS-prefiltered EXACT heavy hitters — q150's modal-value question
    // at the 100 TB shuffle budget: only plausibly-heavy values cross the
    // exchange (the sketch is a pure performance filter, invisible in the
    // result, so the oracle is plain exact SQL). At 10% share: lang has
    // hitters, the uniform-5% source and all-distinct text have none —
    // the query exercises both the pass and the full-drop path
    "q157_heavy_hitters" -> ((s, dir) => graft.operators.Profile.heavyHitters(
      s.read.parquet(s"$dir/documents.parquet"),
      Seq("lang", "source", "text"), minSharePpm = HeavyHitterSharePpm)),

    // INCREMENTAL attribution: touch state on the first half-month, the
    // second half arrives as a shard — its conversions credit against
    // stored + shard touches (stored conversions immutable, stored
    // touches never re-pair with each other); equals the one-shot q168
    // recompute restricted to the shard's conversions (the q143 pattern)
    "q170_attribution_incremental" -> ((s, dir) => {
      val e = SparkEntry.events(s, dir)
      val cut = lit(EwmaCutDate).cast("timestamp")
      graft.operators.Attribution.incrementAttribution(
        graft.operators.Attribution.attributionState(
          e.filter(col("ts") < cut), windowDays = AttributionWindowDays),
        e.filter(col("ts") >= cut), windowDays = AttributionWindowDays)
    }),

    // U-shape (position-based) 40/20/40 attribution — first and last
    // touch 40% each, middles share 20%, last absorbs floor remainders
    "q171_position_attribution" -> ((s, dir) =>
      graft.operators.Attribution.positionAttribution(
        SparkEntry.events(s, dir), windowDays = AttributionWindowDays)),

    // exponential time-decay attribution — 2^(maxH - elapsed half-lives)
    // integer weights, DECIMAL(38,0) products, anchor absorbs the slack
    "q172_timedecay_attribution" -> ((s, dir) =>
      graft.operators.Attribution.timeDecayAttribution(
        SparkEntry.events(s, dir), windowDays = AttributionWindowDays,
        halfLifeDays = TimeDecayHalfLifeDays)),

    // l-diversity companion to q165: per (lang, length-bucket) class the
    // distinct-source count and modal-source share — a class can be
    // k-large yet 1-diverse, the leak k-anonymity misses; two combinable
    // aggregates bounded by the (quasi x sensitive) domain
    "q173_ldiversity" -> ((s, dir) =>
      graft.operators.Profile.lDiversity(
        s.read.parquet(s"$dir/documents.parquet")
          .select(col("lang"), expr("n_chars div 256").as("len_bucket"),
            col("source")),
        Seq("lang", "len_bucket"), "source", l = LDivL)),

    // the conversions every attribution scheme skips — no in-window touch,
    // so the value is organic; closes the revenue accounting (credits +
    // unattributed = total); the q168 band join turned LEFT ANTI
    "q174_unattributed_conversions" -> ((s, dir) =>
      graft.operators.Attribution.unattributedConversions(
        SparkEntry.events(s, dir), windowDays = AttributionWindowDays)),

    // conversion-path analysis: per conversion the (ts, id)-ordered
    // in-window journey of touch types joined with ">" — the top-paths
    // substrate; one band join + one per-conversion bounded ordered collect
    "q175_conversion_paths" -> ((s, dir) =>
      graft.operators.Attribution.conversionPaths(
        SparkEntry.events(s, dir), windowDays = AttributionWindowDays,
        touchTypes = PathTouchTypes)),

    // top-paths rollup: journeys grouped to (path, n_conversions,
    // total_value_fp) — the classic marketing funnel table, a combinable
    // aggregate over q175's bounded rows
    "q176_top_paths" -> ((s, dir) =>
      graft.operators.Attribution.conversionPaths(
          SparkEntry.events(s, dir), windowDays = AttributionWindowDays,
          touchTypes = PathTouchTypes)
        .groupBy(col("path"))
        .agg(count(lit(1)).as("n_conversions"),
          sum(col("value_fp")).as("total_value_fp"))),

    // t-closeness: the third privacy audit — per quasi-class the exact
    // floor-ppm total-variation distance between the class's source
    // distribution and the global one (a k-large l-diverse class can
    // still concentrate on globally-rare values); windows over the
    // (quasi x sensitive)-bounded frame, never the corpus
    "q177_tcloseness" -> ((s, dir) =>
      graft.operators.Profile.tCloseness(
        s.read.parquet(s"$dir/documents.parquet")
          .select(col("lang"), expr("n_chars div 256").as("len_bucket"),
            col("source")),
        Seq("lang", "len_bucket"), "source", tPpm = TClosePpm)),

    // privacy ENFORCEMENT — the audits applied: rows in quasi-classes
    // failing k-anonymity (q165's k), l-diversity (q173's l), or
    // t-closeness (q177's t) are suppressed; the q64 decontaminate
    // anti-join shape, NULL-SAFE on the quasi tuple, one domain-bounded
    // broadcast back against the corpus
    "q178_suppress_at_risk" -> ((s, dir) =>
      graft.operators.Profile.suppressAtRisk(
        s.read.parquet(s"$dir/documents.parquet")
          .select(col("doc_id"), col("lang"),
            expr("n_chars div 256").as("len_bucket"), col("source")),
        Seq("lang", "len_bucket"), k = KAnonK,
        sensitiveCol = Some("source"), l = LDivL, tPpm = Some(TClosePpm))),

    // Markov removal-effect attribution: per channel, the exact share of
    // conversions (and value) whose observed q175 journey contains it —
    // the data-driven scheme the rule-based splits compare against;
    // q175's band join + one channel-exploded combinable aggregate +
    // a 1-row totals broadcast, output bounded by the channel list
    "q180_removal_effect" -> ((s, dir) =>
      graft.operators.Attribution.removalEffectAttribution(
        SparkEntry.events(s, dir), windowDays = AttributionWindowDays,
        touchTypes = PathTouchTypes)),

    // RFM segmentation: per-user recency/frequency/monetary + exact
    // value-based quantile scores (tie-stable, never ntile) composed to
    // the classic 3-digit cell; one user-keyed agg + three bounded
    // histogram rank tables + a 1-row recency-anchor broadcast
    "q181_rfm_segments" -> ((s, dir) =>
      graft.operators.Rfm.rfmSegments(
        SparkEntry.events(s, dir), nBuckets = RfmBuckets)),

    // traffic anomaly: day-grain volume z-test against the trailing
    // 7-day window, cross-multiplied to exact integers (no sqrt, no
    // division); corpus collapses to one combinable day count, all
    // windows run over the bounded day domain
    "q182_traffic_anomaly" -> ((s, dir) =>
      graft.operators.Anomaly.trafficAnomaly(
        SparkEntry.events(s, dir), windowDays = AnomalyWindowDays,
        kNum = AnomalyKNum, kDen = AnomalyKDen)),

    // incremental RFM: fold the post-cut shard into the pre-cut metric
    // state (every field an order-free monoid: max/sum/sum), score off
    // merged state — equals the one-shot q181 bit-for-bit (the q163
    // increment contract)
    "q183_rfm_incremental" -> ((s, dir) => {
      val e = SparkEntry.events(s, dir)
      val cut = lit(EwmaCutDate).cast("timestamp")
      graft.operators.Rfm.rfmFromState(
        graft.operators.Rfm.incrementRfm(
          graft.operators.Rfm.rfmState(e.filter(col("ts") < cut)),
          e.filter(col("ts") >= cut)),
        nBuckets = RfmBuckets)
    }),

    // incremental traffic anomaly: fold the post-cut shard's day counts
    // into stored counts (sum-merge — late days just re-open), re-score
    // the merged day domain — equals the one-shot q182 bit-for-bit
    "q184_anomaly_incremental" -> ((s, dir) => {
      val e = SparkEntry.events(s, dir)
      val cut = lit(EwmaCutDate).cast("timestamp")
      graft.operators.Anomaly.trafficAnomalyFromCounts(
        graft.operators.Anomaly.incrementDailyCounts(
          graft.operators.Anomaly.dailyCounts(e.filter(col("ts") < cut)),
          e.filter(col("ts") >= cut)),
        windowDays = AnomalyWindowDays,
        kNum = AnomalyKNum, kDen = AnomalyKDen)
    }),

    // declarative expectations: all row-local rules fold into ONE
    // combinable aggregate over a single scan; unique adds one keyed
    // agg, the foreign key one anti-join vs the parent's distinct keys;
    // rules chosen so both verdicts appear (lang/len/regex fail, the
    // key and referential rules pass)
    "q185_expectations" -> ((s, dir) => {
      import graft.operators.Expectations._
      val docs = s.read.parquet(s"$dir/documents.parquet")
      check(docs, Seq(
        NotNull("text"),
        Unique(Seq("doc_id")),
        InSet("lang", Seq("en", "de", "fr")),
        InRange("n_chars", 0L, 256L),
        MatchesRegex("source", "^src[0-9]$"),
        RowCountBetween(1L, 1000000000L)))
        .unionByName(check(SparkEntry.events(s, dir), Seq(
          ForeignKey(Seq("user_id"),
            s.read.parquet(s"$dir/customer.parquet"), Seq("c_custkey")))))
    }),

    // STREAMING under the oracle: the real Structured-Streaming ingest
    // (watermarked dedup -> tumbling windowed counts, Append mode) driven
    // through MemoryStream with replayed duplicates and a watermark-
    // advancing sentinel — the emitted windows must hash-match the batch
    // formulation's DuckDB twin
    "q186_streaming_ingest" -> ((s, dir) =>
      windowedReplayShared(s, dir, refresh = true)),

    // q186 BISECTION PROBE (a): the same batch formulation computed
    // directly in Spark — distinct quantized rows bucketed to floor-hour
    // windows, NO streaming machinery — against the SAME oracle SQL. A
    // red q186 next to a green q186a means the divergence is inside the
    // stream (watermark/flush/state), not Spark-vs-DuckDB arithmetic.
    "q186a_ingest_batch_probe" -> ((s, dir) =>
      SparkEntry.events(s, dir)
        .select(col("user_id"), col("event_type"),
          unix_micros(col("ts")).as("us"),
          expr("CAST(floor(value * CAST(1000000 AS DOUBLE) + CAST(0.5 AS DOUBLE)) AS BIGINT)")
            .as("value_fp"))
        .distinct()
        .withColumn("window_start_us", expr("(us div 3600000000) * 3600000000"))
        .groupBy(col("window_start_us"), col("user_id"), col("event_type"))
        .agg(count(lit(1)).as("n_events"), sum(col("value_fp")).as("sum_value_fp"))),

    // q186 BISECTION PROBE (b): the STREAMED output rolled up to one
    // all-integer checksum row per window hour. A red q186 with a red
    // q186b localizes WHICH hour diverged (and in which column family);
    // a red q186 with a GREEN q186b would mean a per-row difference that
    // cancels in every sum — i.e. the driver compare itself, not the data.
    // (shares q186's replay when the same session+dir already ran it —
    // rolling up the SAME run is the probe's whole point; see
    // [[windowedReplayShared]])
    "q186b_ingest_window_checksum" -> ((s, dir) =>
      windowedReplayShared(s, dir, refresh = false)
        .groupBy(col("window_start_us"))
        .agg(count(lit(1)).as("n_rows"),
          sum(col("user_id")).as("sum_users"),
          sum(length(col("event_type"))).as("sum_type_len"),
          sum(col("n_events")).as("sum_events"),
          sum(col("sum_value_fp")).as("sum_value_fp"))),

    // SESSION WINDOWS under the oracle (q186's twin for the other
    // stateful-window family): the real session_window aggregation
    // driven through MemoryStream + sentinel, hash-matched against the
    // gaps-and-islands DuckDB twin with Spark's exact session semantics
    // (an exactly-gap successor MERGES — same `>` break as q54;
    // end = last + gap)
    "q187_streaming_sessions" -> ((s, dir) =>
      graft.streaming.EventStream.sessionIngestReplay(
        s, SparkEntry.events(s, dir))),

    // STREAM-STREAM interval join under the oracle — the third stateful
    // family (q186 windows, q187 sessions, q188 join state): purchase
    // labels attributed to the same user's events in the trailing hour,
    // both sides streamed, hash-matched against a plain DuckDB interval
    // self-join
    "q188_streaming_interval_join" -> ((s, dir) =>
      graft.streaming.EventStream.intervalJoinReplay(
        s, SparkEntry.events(s, dir))),

    // ARBITRARY STATE (flatMapGroupsWithState) under the oracle — the
    // fourth stateful family: per-user running snapshots across two
    // micro-batches split at the event-time midpoint, so cross-batch
    // state continuation is itself hash-checked (batch-1 snapshots ==
    // prefix aggregates; batch-2 snapshots == full-history aggregates of
    // suffix-active users, folded on top of batch-1 state)
    "q189_streaming_state_snapshots" -> ((s, dir) =>
      graft.streaming.EventStream.statefulSnapshotReplay(
        s, SparkEntry.events(s, dir)))
  )

  /** q181's score axes: classic quintiles. */
  private val RfmBuckets = 5

  /** q182's window and threshold: 7 trailing days, z > 1 (kNum/kDen = 1/1).
    * The sf corpus' daily volume is near-uniform, so a z=3 ops threshold
    * would flag nothing; z>1 exercises both verdicts (and the first 7
    * days pin the NULL incomplete-window path).
    */
  private val AnomalyWindowDays = 7
  private val AnomalyKNum = 1L
  private val AnomalyKDen = 1L

  /** q175/q176's journey steps — the synthetic corpus' three
    * non-conversion, non-error interaction types.
    */
  private val PathTouchTypes = Seq("click", "view", "signup")

  /** q177's distance ceiling: 0.5 — small classes deviate far from the
    * uniform 20-source global distribution and flag, large ones don't.
    */
  private val TClosePpm = 500000L

  private val HeavyHitterSharePpm = 100000L

  /** q165's k floor — small enough that the synthetic corpus has both
    * safe and at-risk classes.
    */
  private val KAnonK = 3L

  /** q173's diversity floor: 2 — flags exactly the homogeneous
    * (single-source) classes, the canonical l-diversity leak.
    */
  private val LDivL = 2L

  /** q168's lookback — wide enough that most purchases find clicks,
    * narrow enough that the window actually prunes pairs.
    */
  private val AttributionWindowDays = 7

  /** q172's decay bucket: 1 day against the 7-day window puts maxH at 6
    * (weights 64..1 — every in-window age bucket actually occurs).
    */
  private val TimeDecayHalfLifeDays = 1

  /** q163's time split — mid-range of the events table, so both halves
    * carry rows for most users and the increment genuinely continues
    * stored folds (equal-ts events can never span a strict ts cut, so
    * the shard-after-stored contract holds by construction).
    */
  private val EwmaCutDate = "2024-01-15"

  private val ProfileCols = Seq("doc_id", "text", "lang", "source", "n_chars")
  /** Same first-half cut the incremental families use (CurationQueries'
    * IncrSplitId2) — here it makes the before-snapshot's counts differ.
    */
  private val ProfileSplitId = 250L

  /** Pinned event-type pivot columns (the values the synthetic events
    * table contains; a new type would land nowhere — pivot contracts pin
    * their columns, that's the point).
    */
  private val EventTypes = Seq("click", "error", "purchase", "signup", "view")

  /** q85's alignment tolerance: 6 hours in micros — below the corpus'
    * ~7.3h median per-user gap, so both matched and unmatched labels
    * actually occur.
    */
  private val NearestToleranceUs = 21600000000L

  /** The q54 session-assignment CTE chain (micros timestamps, lag gap
    * cut, running session number), shared VERBATIM by the q54/q63/q68
    * oracles — one definition so the three twins can never desynchronize
    * from each other or from [[Sessionize.assign]] (the docSetsSql
    * pattern from [[TrainingDataQueries]]).
    */
  private lazy val sessionCtesSql: String =
    s"""e AS (SELECT event_id, user_id, event_type, epoch_ns(ts) // 1000 AS ts_us FROM events),
         |l AS (SELECT *, lag(ts_us) OVER (PARTITION BY user_id ORDER BY ts_us, event_id) AS prev_us FROM e),
         |n AS (SELECT *, CASE WHEN prev_us IS NULL OR ts_us - prev_us > ${SessionGapSeconds * 1000000L} THEN 1 ELSE 0 END AS new_session FROM l),
         |sess AS (SELECT *, CAST(sum(new_session) OVER (PARTITION BY user_id ORDER BY ts_us, event_id ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_seq FROM n)""".stripMargin

  def oracleSql: Map[String, String] = Map(
    // lag/running-sum session assignment over (ts_us, event_id) — the
    // deterministic order Sessionize.assign uses; ts crosses engines as
    // floor-truncated micros (epoch_ns // 1000 == Spark's `ts DIV 1000`)
    "q54_sessionize" ->
      s"""WITH $sessionCtesSql
         |SELECT user_id, session_seq,
         |  CAST(count(*) AS BIGINT) AS n_events,
         |  min(ts_us) AS start_us, max(ts_us) AS end_us,
         |  max(ts_us) - min(ts_us) AS duration_us,
         |  CAST(count(DISTINCT event_type) AS BIGINT) AS n_event_types
         |FROM sess GROUP BY user_id, session_seq""".stripMargin,

    // CMS twin: identical row-hash CASE arms generated from the SAME
    // constants the Spark expressions use; the oracle builds the sketch in
    // one pass — which IS the merge-of-shards by sum-associativity
    "q55_token_freq_cms" ->
      s"""WITH tok AS (SELECT doc_id, $toksSql AS w FROM documents),
         |occ AS (SELECT unnest(w) AS token FROM tok),
         |oh AS (SELECT ${polyHashSql("token")} AS h FROM occ),
         |rr AS (SELECT unnest([${(0 until FrequencySketch.Depth).mkString(", ")}]) AS r),
         |cells AS (SELECT rr.r AS r, ${cmsIdxSql("rr.r", "h")} AS idx,
         |  CAST(count(*) AS BIGINT) AS cnt
         |  FROM oh CROSS JOIN rr GROUP BY 1, 2),
         |tf AS (SELECT token, CAST(count(*) AS BIGINT) AS tf FROM occ GROUP BY token),
         |dfr AS (SELECT token, CAST(count(*) AS BIGINT) AS df
         |  FROM (SELECT unnest(list_distinct(w)) AS token FROM tok) GROUP BY token),
         |top AS (SELECT tf.token, tf.tf, dfr.df FROM tf JOIN dfr ON tf.token = dfr.token
         |  ORDER BY tf.tf DESC, tf.token ASC LIMIT 50),
         |ph AS (SELECT token, tf, df, ${polyHashSql("token")} AS h FROM top),
         |probes AS (SELECT token, tf, df, rr.r AS r, ${cmsIdxSql("rr.r", "h")} AS idx
         |  FROM ph CROSS JOIN rr)
         |SELECT probes.token, probes.tf, probes.df,
         |  CAST(min(coalesce(cells.cnt, 0)) AS BIGINT) AS cms_est
         |FROM probes LEFT JOIN cells ON probes.r = cells.r AND probes.idx = cells.idx
         |GROUP BY probes.token, probes.tf, probes.df""".stripMargin,

    // Bloom twin: same probe CASE arms, same 32-bit word/mask layout; the
    // shared docSetsSql keeps the shingle population identical to q45's
    "q56_bloom_contamination" ->
      s"""WITH $docSetsSql,
         |bh AS (SELECT DISTINCT unnest(hashes) AS h FROM sets WHERE id <= 25),
         |kk AS (SELECT unnest([${(0 until BloomFilter.K).mkString(", ")}]) AS k),
         |bp AS (SELECT ${bloomPosSql("kk.k", "h")} AS pos FROM bh CROSS JOIN kk),
         |bw AS (SELECT CAST(pos // 32 AS INT) AS word,
         |  bit_or(CAST(1 AS BIGINT) << CAST(pos % 32 AS INT)) AS bits
         |  FROM bp GROUP BY 1),
         |posting AS (SELECT id, unnest(hashes) AS h FROM sets WHERE id > 25),
         |pp AS (SELECT id, h, ${bloomPosSql("kk.k", "h")} AS pos FROM posting CROSS JOIN kk),
         |hit AS (SELECT id, h,
         |  min(CASE WHEN bw.bits IS NOT NULL
         |           AND (bw.bits & (CAST(1 AS BIGINT) << CAST(pp.pos % 32 AS INT))) <> 0
         |      THEN 1 ELSE 0 END) AS in_bloom
         |  FROM pp LEFT JOIN bw ON pp.pos // 32 = bw.word GROUP BY id, h)
         |SELECT id AS doc_id, CAST(count(*) AS BIGINT) AS n_shingles,
         |  CAST(sum(in_bloom) AS BIGINT) AS n_bloom_hits,
         |  CASE WHEN sum(in_bloom) > 0 THEN 1 ELSE 0 END AS maybe_contaminated
         |FROM hit GROUP BY id""".stripMargin,

    // ROLLUP twin: GROUPING() bit-encodes the same levels as Spark's
    // grouping_id (0 = leaf, 1 = per-lang subtotal, 3 = grand total)
    "q57_rollup_report" ->
      """SELECT lang, source,
        |  CAST(GROUPING(lang, source) AS BIGINT) AS grouping_level,
        |  CAST(count(*) AS BIGINT) AS n_docs,
        |  CAST(sum(n_chars) AS BIGINT) AS total_chars
        |FROM documents GROUP BY ROLLUP(lang, source)""".stripMargin,

    "q58_pivot_event_counts" ->
      ("SELECT user_id, " + EventTypes.map(t =>
        s"CAST(count(*) FILTER (event_type = '$t') AS BIGINT) AS n_$t")
        .mkString(", ") + " FROM events GROUP BY user_id"),

    // temperature twin: the per-category rate replays Spark's float ops in
    // the SAME order — sqrt of exact integers, an ordered fold for S
    // (NULLS FIRST matches sort_array's struct order), floor(rate * 1e6)
    // — so the ppm threshold is bit-identical
    "q59_temperature_mix" ->
      s"""WITH c AS (SELECT lang, CAST(count(*) AS BIGINT) AS category_n FROM documents GROUP BY lang),
         |sw AS (SELECT list_reduce(list_prepend(CAST(0 AS DOUBLE),
         |    list(sqrt(CAST(category_n AS DOUBLE)) ORDER BY lang NULLS FIRST)),
         |    (a, b) -> a + b) AS sum_w FROM c),
         |r AS (SELECT lang, category_n,
         |  CAST(floor(least(CAST(1 AS DOUBLE),
         |    CAST(300 AS DOUBLE) * sqrt(CAST(category_n AS DOUBLE))
         |      / (sw.sum_w * CAST(category_n AS DOUBLE)))
         |    * CAST(1000000 AS DOUBLE)) AS BIGINT) AS mix_rate_ppm
         |  FROM c, sw)
         |SELECT d.doc_id, d.lang, r.category_n, r.mix_rate_ppm
         |FROM documents d JOIN r ON d.lang IS NOT DISTINCT FROM r.lang
         |WHERE (${polyHashSql("d.text")} % 1000000) < r.mix_rate_ppm""".stripMargin,

    "q60_sliding_chunks" ->
      s"""WITH t AS (SELECT doc_id, CAST(len($toksSql) AS BIGINT) AS n_tokens FROM documents),
         |w AS (SELECT doc_id, n_tokens,
         |  CASE WHEN n_tokens <= 96 THEN 1
         |       ELSE 1 + (n_tokens - 96 + 63) // 64 END AS n_wins
         |  FROM t WHERE n_tokens > 0),
         |e AS (SELECT doc_id, n_tokens, unnest(range(0, n_wins)) AS win_idx FROM w)
         |SELECT doc_id, n_tokens, win_idx,
         |  win_idx * 64 AS win_start,
         |  least(96, n_tokens - win_idx * 64) AS win_len
         |FROM e""".stripMargin,

    // collapse twin: position-indexed CASE keeps first-of-run tokens in
    // order; the normalized fingerprint hashes the re-joined string with
    // the shared rolling-hash fold
    "q61_collapse_repeats" ->
      s"""WITH t AS (SELECT doc_id, $toksSql AS w FROM documents),
         |k AS (SELECT doc_id, len(w) AS n_tokens,
         |  list_filter(list_transform(range(1, len(w)+1),
         |    i -> CASE WHEN i = 1 OR w[i] <> w[i-1] THEN w[i] END),
         |    x -> x IS NOT NULL) AS kept
         |  FROM t),
         |j AS (SELECT doc_id, n_tokens, len(kept) AS n_kept,
         |  array_to_string(kept, ' ') AS norm_text FROM k)
         |SELECT doc_id, CAST(n_tokens AS BIGINT) AS n_tokens,
         |  CAST(n_tokens - n_kept AS BIGINT) AS n_collapsed,
         |  ${polyHashSql("norm_text")} AS norm_hash
         |FROM j""".stripMargin,

    // MAD twin: two grouped type-1 medians off per-lang histograms (the
    // q47 window pattern), the same integer-rational rank math, and the
    // row-local gate `abs_dev * kDen <= mad * kNum`
    "q62_mad_outliers" ->
      s"""WITH v0 AS (SELECT doc_id, lang, CAST(n_chars AS DOUBLE) AS n_chars FROM documents),
         |h1 AS (SELECT lang, round(n_chars, 6) AS v, CAST(count(*) AS BIGINT) AS cnt
         |  FROM v0 WHERE n_chars IS NOT NULL GROUP BY lang, v),
         |hc1 AS (SELECT lang, v,
         |  CAST(sum(cnt) OVER (PARTITION BY lang ORDER BY v ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum,
         |  CAST(sum(cnt) OVER (PARTITION BY lang) AS BIGINT) AS n
         |FROM h1),
         |med AS (SELECT lang, min(v) AS group_median
         |  FROM hc1 WHERE cum >= (n // 2) * 1 + ((n % 2) * 1 + 1) // 2 GROUP BY lang),
         |d2 AS (SELECT v0.doc_id, v0.lang, v0.n_chars, med.group_median,
         |  abs(round(v0.n_chars, 6) - med.group_median) AS abs_dev
         |  FROM v0 JOIN med ON v0.lang IS NOT DISTINCT FROM med.lang),
         |h2 AS (SELECT lang, round(abs_dev, 6) AS v, CAST(count(*) AS BIGINT) AS cnt
         |  FROM d2 WHERE abs_dev IS NOT NULL GROUP BY lang, v),
         |hc2 AS (SELECT lang, v,
         |  CAST(sum(cnt) OVER (PARTITION BY lang ORDER BY v ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum,
         |  CAST(sum(cnt) OVER (PARTITION BY lang) AS BIGINT) AS n
         |FROM h2),
         |mad AS (SELECT lang, min(v) AS group_mad
         |  FROM hc2 WHERE cum >= (n // 2) * 1 + ((n % 2) * 1 + 1) // 2 GROUP BY lang)
         |SELECT d2.doc_id, d2.lang, d2.n_chars, d2.group_median, d2.abs_dev, mad.group_mad
         |FROM d2 JOIN mad ON d2.lang IS NOT DISTINCT FROM mad.lang
         |WHERE d2.abs_dev * 1 <= mad.group_mad * 2""".stripMargin,

    // transition twin: q54's session CTEs + one more lag within (user,
    // session), then the pair count
    "q63_session_transitions" ->
      s"""WITH $sessionCtesSql,
         |tr AS (SELECT lag(event_type) OVER (PARTITION BY user_id, session_seq ORDER BY ts_us, event_id) AS from_type,
         |  event_type AS to_type FROM sess)
         |SELECT from_type, to_type, CAST(count(*) AS BIGINT) AS n_transitions
         |FROM tr WHERE from_type IS NOT NULL GROUP BY from_type, to_type""".stripMargin,

    // decontaminate twin: q45's overlap CTEs, then NOT IN the overlap set.
    // Docs too short to shingle never enter `sets` — they can't match, so
    // they're kept on both sides
    "q64_decontaminate" ->
      s"""WITH $docSetsSql,
         |bench AS (SELECT DISTINCT unnest(hashes) AS h FROM sets WHERE id <= 25),
         |posting AS (SELECT id, unnest(hashes) AS h FROM sets WHERE id > 25),
         |bad AS (SELECT DISTINCT id FROM posting JOIN bench USING (h))
         |SELECT doc_id, lang, source, n_chars FROM documents
         |WHERE doc_id > 25 AND doc_id NOT IN (SELECT id FROM bad)""".stripMargin,

    // revenue twin: money quantizes to integer cents at the scan with the
    // same three IEEE ops as the Spark side (multiply, add, floor), so
    // every downstream value is BIGINT and both engines hash identically
    // by construction — no double→DECIMAL cast survives anywhere
    "q65_revenue_trend" ->
      """WITH daily AS (SELECT CAST(o_orderdate AS DATE) AS day,
        |  CAST(sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)) AS BIGINT) AS revenue_cents,
        |  CAST(count(*) AS BIGINT) AS n_orders
        |FROM orders GROUP BY 1),
        |b AS (SELECT min(day) AS d0, max(day) AS d1 FROM daily),
        |spine AS (SELECT unnest(generate_series(d0, d1, INTERVAL 1 DAY))::DATE AS day FROM b),
        |dense AS (SELECT spine.day,
        |  CAST(coalesce(daily.revenue_cents, 0) AS BIGINT) AS revenue_cents,
        |  CAST(coalesce(daily.n_orders, 0) AS BIGINT) AS n_orders
        |FROM spine LEFT JOIN daily ON spine.day = daily.day)
        |SELECT day, revenue_cents, n_orders,
        |  CAST(sum(revenue_cents) OVER (ORDER BY day ROWS BETWEEN 6 PRECEDING AND CURRENT ROW) AS BIGINT) AS revenue_7d_cents,
        |  CAST(revenue_cents - coalesce(lag(revenue_cents) OVER (ORDER BY day), revenue_cents) AS BIGINT) AS dod_delta_cents
        |FROM dense""".stripMargin,

    // q65 bisection probes (see the query-side comment): q65a = spine +
    // counts only (no money); q65b = + the cents rollup (no window)
    "q65a_revenue_days" ->
      """WITH daily AS (SELECT CAST(o_orderdate AS DATE) AS day,
        |  CAST(count(*) AS BIGINT) AS n_orders
        |FROM orders GROUP BY 1),
        |b AS (SELECT min(day) AS d0, max(day) AS d1 FROM daily),
        |spine AS (SELECT unnest(generate_series(d0, d1, INTERVAL 1 DAY))::DATE AS day FROM b)
        |SELECT spine.day, CAST(coalesce(daily.n_orders, 0) AS BIGINT) AS n_orders
        |FROM spine LEFT JOIN daily ON spine.day = daily.day""".stripMargin,
    "q65b_revenue_daily" ->
      """WITH daily AS (SELECT CAST(o_orderdate AS DATE) AS day,
        |  CAST(sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)) AS BIGINT) AS revenue_cents,
        |  CAST(count(*) AS BIGINT) AS n_orders
        |FROM orders GROUP BY 1),
        |b AS (SELECT min(day) AS d0, max(day) AS d1 FROM daily),
        |spine AS (SELECT unnest(generate_series(d0, d1, INTERVAL 1 DAY))::DATE AS day FROM b)
        |SELECT spine.day,
        |  CAST(coalesce(daily.revenue_cents, 0) AS BIGINT) AS revenue_cents,
        |  CAST(coalesce(daily.n_orders, 0) AS BIGINT) AS n_orders
        |FROM spine LEFT JOIN daily ON spine.day = daily.day""".stripMargin,

    "q66_topk_per_group" ->
      """SELECT doc_id, lang, n_chars, CAST(rank AS INT) AS rank FROM (
        |  SELECT doc_id, lang, n_chars,
        |    row_number() OVER (PARTITION BY lang ORDER BY n_chars DESC, doc_id ASC) AS rank
        |  FROM documents)
        |WHERE rank <= 3""".stripMargin,

    // percentile twin: running counts over the per-lang histogram (q47's
    // window pattern), joined back on (lang, rounded value)
    "q67_length_percentile" ->
      """WITH v0 AS (SELECT doc_id, lang, CAST(n_chars AS DOUBLE) AS n_chars FROM documents),
        |h AS (SELECT lang, round(n_chars, 6) AS v, CAST(count(*) AS BIGINT) AS cnt
        |  FROM v0 WHERE n_chars IS NOT NULL GROUP BY lang, v),
        |hc AS (SELECT lang, v,
        |  CAST(sum(cnt) OVER (PARTITION BY lang ORDER BY v ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum,
        |  CAST(sum(cnt) OVER (PARTITION BY lang) AS BIGINT) AS n
        |FROM h)
        |SELECT v0.doc_id, v0.lang, v0.n_chars,
        |  CAST((2000000 * CAST(hc.cum AS HUGEINT) + hc.n) // (2 * CAST(hc.n AS HUGEINT)) AS DOUBLE) / 1000000 AS pct_rank
        |FROM v0 JOIN hc ON v0.lang IS NOT DISTINCT FROM hc.lang AND round(v0.n_chars, 6) = hc.v""".stripMargin,

    // funnel twin: q54's session CTEs -> per-session min ts per step ->
    // strict-after chain walk -> depth -> level explode -> spine join
    "q68_session_funnel" ->
      s"""WITH $sessionCtesSql,
         |ps AS (SELECT user_id, session_seq,
         |  min(CASE WHEN event_type = 'signup' THEN ts_us END) AS t0,
         |  min(CASE WHEN event_type = 'view' THEN ts_us END) AS r1,
         |  min(CASE WHEN event_type = 'purchase' THEN ts_us END) AS r2
         |FROM sess GROUP BY user_id, session_seq),
         |wk AS (SELECT *, CASE WHEN r1 > t0 THEN r1 END AS t1 FROM ps),
         |wk2 AS (SELECT *, CASE WHEN r2 > t1 THEN r2 END AS t2 FROM wk),
         |d AS (SELECT CASE WHEN t2 IS NOT NULL THEN 3 WHEN t1 IS NOT NULL THEN 2
         |  WHEN t0 IS NOT NULL THEN 1 ELSE 0 END AS depth FROM wk2),
         |lv AS (SELECT unnest(range(0, depth + 1)) AS depth_level FROM d),
         |lc AS (SELECT depth_level, CAST(count(*) AS BIGINT) AS n_sessions FROM lv GROUP BY depth_level),
         |spine AS (SELECT unnest([0, 1, 2, 3]) AS depth_level,
         |  unnest(['(all sessions)', 'signup', 'view', 'purchase']) AS step)
         |SELECT CAST(spine.depth_level AS INT) AS depth_level, spine.step,
         |  CAST(coalesce(lc.n_sessions, 0) AS BIGINT) AS n_sessions
         |FROM spine LEFT JOIN lc ON spine.depth_level = lc.depth_level""".stripMargin,

    // salt-invariant by construction: the oracle IS the single-window
    // formulation (same as q66's shape)
    "q69_topk_salted" ->
      """SELECT doc_id, lang, n_chars, CAST(rank AS INT) AS rank FROM (
        |  SELECT doc_id, lang, n_chars,
        |    row_number() OVER (PARTITION BY lang ORDER BY n_chars DESC, doc_id ASC) AS rank
        |  FROM documents)
        |WHERE rank <= 3""".stripMargin,

    // cohort twin: both engines truncate weeks to Monday; offsets are
    // exact multiples of 7 days by construction (integer div is safe)
    "q70_cohort_retention" ->
      """WITH f AS (SELECT user_id, min(ts) AS first_ts FROM events GROUP BY user_id),
        |c AS (SELECT user_id, CAST(date_trunc('week', first_ts) AS DATE) AS cohort_week FROM f),
        |a AS (SELECT e.user_id, c.cohort_week,
        |  CAST(date_trunc('week', e.ts) AS DATE) AS activity_week
        |  FROM events e JOIN c ON e.user_id = c.user_id)
        |SELECT cohort_week,
        |  CAST(datediff('day', cohort_week, activity_week) // 7 AS INT) AS week_offset,
        |  CAST(count(DISTINCT user_id) AS BIGINT) AS n_active
        |FROM a GROUP BY cohort_week, week_offset""".stripMargin,

    // edit-distance twin: DuckDB's levenshtein is the same unit-cost DP;
    // the candidate set is q25's verified pair CTE
    "q72_dedup_editdist" ->
      s"""WITH ${graft.TrainingDataQueries.minhashCtesSql}
         |SELECT j.id_a, j.id_b, j.jaccard,
         |  CAST(levenshtein(da.text, db.text) AS BIGINT) AS edit_dist,
         |  CAST((2000000 * CAST(greatest(length(da.text), length(db.text)) - levenshtein(da.text, db.text) AS BIGINT)
         |        + greatest(length(da.text), length(db.text)))
         |    // (2 * CAST(greatest(length(da.text), length(db.text)) AS BIGINT)) AS DOUBLE) / 1000000 AS edit_sim
         |FROM j JOIN documents da ON j.id_a = da.doc_id
         |       JOIN documents db ON j.id_b = db.doc_id
         |WHERE j.jaccard >= 0.8""".stripMargin,

    // TV twin: same full-outer bin union, same HUGEINT-exact numerator,
    // same pinned final division
    "q73_split_drift" ->
      s"""WITH sp AS (SELECT ${graft.TrainingDataQueries.splitCaseSql("text")} AS split,
         |  CAST(n_chars AS DOUBLE) AS v0 FROM documents),
         |ha AS (SELECT round(v0, 6) AS v, CAST(count(*) AS BIGINT) AS cnt_a
         |  FROM sp WHERE split = 'train' AND v0 IS NOT NULL GROUP BY 1),
         |hb AS (SELECT round(v0, 6) AS v, CAST(count(*) AS BIGINT) AS cnt_b
         |  FROM sp WHERE split = 'val' AND v0 IS NOT NULL GROUP BY 1),
         |jj AS (SELECT coalesce(cnt_a, 0) AS cnt_a, coalesce(cnt_b, 0) AS cnt_b
         |  FROM ha FULL OUTER JOIN hb ON ha.v = hb.v),
         |t AS (SELECT CAST(sum(cnt_a) AS BIGINT) AS n_a, CAST(sum(cnt_b) AS BIGINT) AS n_b FROM jj)
         |SELECT t.n_a, t.n_b,
         |  CAST((2000000 * sum(abs(CAST(jj.cnt_a AS HUGEINT) * t.n_b - CAST(jj.cnt_b AS HUGEINT) * t.n_a))
         |        + 2 * CAST(t.n_a AS HUGEINT) * t.n_b)
         |    // (4 * CAST(t.n_a AS HUGEINT) * t.n_b) AS DOUBLE) / 1000000 AS tv_distance
         |FROM jj CROSS JOIN t GROUP BY t.n_a, t.n_b
         |HAVING t.n_a > 0 AND t.n_b > 0""".stripMargin,

    // nearest twin: LEFT JOIN inside the tolerance band, rank by
    // (|distance|, earlier-first) — an unmatched label's single
    // null-extended row is its own rank 1
    "q85_nearest_join" ->
      s"""WITH e AS (SELECT event_id, user_id, event_type, value,
         |  epoch_ns(ts) // 1000 AS ts_us FROM events),
         |l AS (SELECT event_id, user_id, ts_us FROM e WHERE event_type = 'purchase'),
         |r AS (SELECT user_id, ts_us AS f_ts_us, max(value) AS f_value
         |  FROM e WHERE event_type = 'view' GROUP BY 1, 2),
         |j AS (SELECT l.event_id, l.user_id, l.ts_us, r.f_ts_us, r.f_value,
         |  row_number() OVER (PARTITION BY l.event_id
         |    ORDER BY abs(r.f_ts_us - l.ts_us), r.f_ts_us) AS rn
         |  FROM l LEFT JOIN r ON l.user_id = r.user_id
         |    AND abs(r.f_ts_us - l.ts_us) <= $NearestToleranceUs)
         |SELECT event_id, user_id, ts_us, f_ts_us, f_value FROM j WHERE rn = 1""".stripMargin,

    // latency twin: q54's session CTEs -> per-session min ts per step ->
    // strict-after filter -> bounded histogram, the q43 rank math for both
    // quantiles
    "q92_time_to_convert" ->
      s"""WITH $sessionCtesSql,
         |ps AS (SELECT user_id, session_seq,
         |  min(CASE WHEN event_type = 'signup' THEN ts_us END) AS from_us,
         |  min(CASE WHEN event_type = 'purchase' THEN ts_us END) AS to_us
         |  FROM sess GROUP BY user_id, session_seq),
         |cv AS (SELECT to_us - from_us AS d FROM ps WHERE to_us > from_us),
         |h AS (SELECT round(CAST(d AS DOUBLE), 0) AS v, CAST(count(*) AS BIGINT) AS cnt
         |  FROM cv GROUP BY 1),
         |hc AS (SELECT v,
         |  CAST(sum(cnt) OVER (ORDER BY v ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum,
         |  CAST(sum(cnt) OVER () AS BIGINT) AS n FROM h),
         |med AS (SELECT min(v) AS median_delta_us FROM hc
         |  WHERE cum >= (n // 2) * 1 + ((n % 2) * 1 + 1) // 2),
         |p90 AS (SELECT min(v) AS p90_delta_us FROM hc
         |  WHERE cum >= (n // 10) * 9 + ((n % 10) * 9 + 9) // 10),
         |c2 AS (SELECT CAST(count(*) AS BIGINT) AS n_converted FROM cv)
         |SELECT c2.n_converted, med.median_delta_us, p90.p90_delta_us
         |FROM c2 CROSS JOIN med CROSS JOIN p90""".stripMargin,

    // merged-histogram twin: merge-of-shards == histogram-of-whole by
    // associativity, so the oracle is the DIRECT per-lang median (q47's
    // pattern over n_chars) + the shard count
    "q71_histogram_merge" ->
      """WITH v0 AS (SELECT lang, source, CAST(n_chars AS DOUBLE) AS v0v FROM documents),
        |h AS (SELECT lang, round(v0v, 6) AS v, CAST(count(*) AS BIGINT) AS cnt
        |  FROM v0 WHERE v0v IS NOT NULL GROUP BY lang, v),
        |hc AS (SELECT lang, v,
        |  CAST(sum(cnt) OVER (PARTITION BY lang ORDER BY v ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum,
        |  CAST(sum(cnt) OVER (PARTITION BY lang) AS BIGINT) AS n
        |FROM h),
        |thr AS (SELECT lang, min(v) AS threshold
        |  FROM hc WHERE cum >= (n // 2) * 1 + ((n % 2) * 1 + 1) // 2 GROUP BY lang),
        |sh AS (SELECT lang, CAST(count(*) AS BIGINT) AS n_shards
        |  FROM (SELECT DISTINCT lang, source FROM v0 WHERE v0v IS NOT NULL) GROUP BY lang)
        |SELECT thr.lang, thr.threshold, sh.n_shards
        |FROM thr JOIN sh ON thr.lang IS NOT DISTINCT FROM sh.lang""".stripMargin,

    // profile twin: per column, the single-aggregate stats block crossed
    // with the modal-value subquery (min over struct(-count, value) — the
    // exact tie-break the operator's struct ordering rides), one UNION ALL
    // arm per profiled column
    "q150_profile" ->
      ProfileCols.map(profileColSql(_, "documents")).mkString("\nUNION ALL\n"),

    // profile-diff twin: two profile CTEs (different column sets AND a
    // different before-relation) full-joined, every delta in the same
    // integer ppm / IS-DISTINCT-FROM flag forms the operator computes
    "q154_profile_diff" -> {
      val relB = s"(SELECT * FROM documents WHERE doc_id <= $ProfileSplitId)"
      val bf = Seq("doc_id", "text", "lang", "source")
        .map(profileColSql(_, relB)).mkString("\nUNION ALL\n")
      val af = Seq("doc_id", "text", "lang", "n_chars")
        .map(profileColSql(_, "documents")).mkString("\nUNION ALL\n")
      def ppmSql(num: String, den: String): String =
        s"CASE WHEN $den > 0 THEN CAST(CAST($num AS HUGEINT) * 1000000 // $den AS BIGINT) END"
      def changedSql(c: String): String =
        s"""CASE WHEN bf.n_rows IS NOT NULL AND af.n_rows IS NOT NULL
           |    THEN CAST(bf.$c IS DISTINCT FROM af.$c AS INT) END""".stripMargin
      s"""WITH bf AS ($bf),
         |af AS ($af)
         |SELECT coalesce(bf.col_name, af.col_name) AS col_name,
         |  CASE WHEN bf.n_rows IS NOT NULL AND af.n_rows IS NOT NULL THEN 'common'
         |       WHEN af.n_rows IS NOT NULL THEN 'added' ELSE 'removed' END AS status,
         |  ${ppmSql("bf.n_null", "bf.n_rows")} AS null_ppm_before,
         |  ${ppmSql("af.n_null", "af.n_rows")} AS null_ppm_after,
         |  (${ppmSql("af.n_null", "af.n_rows")}) -
         |    (${ppmSql("bf.n_null", "bf.n_rows")}) AS null_ppm_delta,
         |  bf.n_distinct AS n_distinct_before,
         |  af.n_distinct AS n_distinct_after,
         |  ${ppmSql("af.n_distinct", "bf.n_distinct")} AS distinct_ratio_ppm,
         |  ${changedSql("min_str")} AS min_changed,
         |  ${changedSql("max_str")} AS max_changed,
         |  ${changedSql("mode_str")} AS mode_changed,
         |  af.avg_len_ppm - bf.avg_len_ppm AS avg_len_delta_ppm
         |FROM bf FULL JOIN af ON bf.col_name = af.col_name""".stripMargin
    },

    // incremental-EWMA twin: increment == one-shot by construction, so
    // the oracle is the q162 fold over EVERYTHING plus the stream
    // position (max (ts_us, event_id)) the state carries
    "q163_ewma_incremental" ->
      s"""WITH e AS (SELECT user_id, epoch_ns(ts) // 1000 AS ts_us, event_id,
         |  CAST(round(value * 1000000) AS BIGINT) AS v FROM events)
         |SELECT user_id, CAST(count(*) AS BIGINT) AS n_events,
         |  list_reduce(list_prepend(CAST(0 AS BIGINT),
         |      list(v ORDER BY ts_us, event_id)),
         |    (acc, x) -> (850000 * acc) // 1000000 + x) AS ewma_fp,
         |  max(ts_us) AS last_ts_us
         |FROM e GROUP BY user_id""".stripMargin,

    // EWMA twin: the same fixed-point fold as a list_reduce over the
    // (ts_us, event_id)-ordered value list — scalar BIGINT accumulator;
    // `//` and Spark's `div` both truncate toward zero, so the step is
    // bit-identical for signed accumulators too
    "q162_ewma" ->
      s"""WITH e AS (SELECT user_id, epoch_ns(ts) // 1000 AS ts_us, event_id,
         |  CAST(round(value * 1000000) AS BIGINT) AS v FROM events)
         |SELECT user_id, CAST(count(*) AS BIGINT) AS n_events,
         |  list_reduce(list_prepend(CAST(0 AS BIGINT),
         |      list(v ORDER BY ts_us, event_id)),
         |    (acc, x) -> (850000 * acc) // 1000000 + x) AS ewma_fp
         |FROM e GROUP BY user_id""".stripMargin,

    // attribution twin: the same band-join pairs, window count per
    // conversion, `div` share + remainder to the max-(ts, id) touch
    "q168_attribution" ->
      s"""WITH e AS (SELECT user_id, event_id, event_type,
         |  epoch_ns(ts) // 1000 AS ts_us,
         |  CAST(round(value * 1000000) AS BIGINT) AS v FROM events),
         |c AS (SELECT user_id, event_id AS conv_event_id, ts_us AS conv_ts_us, v
         |  FROM e WHERE event_type = 'purchase'),
         |t AS (SELECT user_id, event_id AS touch_event_id, ts_us AS touch_ts_us
         |  FROM e WHERE event_type = 'click'),
         |p AS (SELECT c.user_id, c.conv_event_id, c.conv_ts_us, c.v,
         |  t.touch_event_id, t.touch_ts_us
         |  FROM c JOIN t ON c.user_id = t.user_id
         |  AND t.touch_ts_us <= c.conv_ts_us
         |  AND t.touch_ts_us > c.conv_ts_us - ${AttributionWindowDays}::BIGINT * 86400000000),
         |g AS (SELECT *,
         |  CAST(count(*) OVER w AS BIGINT) AS n_touches,
         |  max(struct_pack(ts := touch_ts_us, id := touch_event_id)) OVER w AS last_t
         |  FROM p WINDOW w AS (PARTITION BY user_id, conv_event_id))
         |SELECT user_id, conv_event_id, conv_ts_us, touch_event_id,
         |  touch_ts_us, n_touches,
         |  CAST(v // n_touches + CASE WHEN touch_event_id = last_t.id
         |    THEN v - n_touches * (v // n_touches) ELSE 0 END AS BIGINT) AS credit_fp
         |FROM g""".stripMargin,

    // incremental-attribution twin: increment == one-shot restricted to
    // the shard's conversions by construction, so the oracle is the q168
    // band join with the conversion CTE cut at the shard boundary
    "q170_attribution_incremental" ->
      s"""WITH e AS (SELECT user_id, event_id, event_type,
         |  epoch_ns(ts) // 1000 AS ts_us,
         |  CAST(round(value * 1000000) AS BIGINT) AS v FROM events),
         |c AS (SELECT user_id, event_id AS conv_event_id, ts_us AS conv_ts_us, v
         |  FROM e WHERE event_type = 'purchase'
         |  AND ts_us >= epoch_ns(TIMESTAMP '$EwmaCutDate 00:00:00') // 1000),
         |t AS (SELECT user_id, event_id AS touch_event_id, ts_us AS touch_ts_us
         |  FROM e WHERE event_type = 'click'),
         |p AS (SELECT c.user_id, c.conv_event_id, c.conv_ts_us, c.v,
         |  t.touch_event_id, t.touch_ts_us
         |  FROM c JOIN t ON c.user_id = t.user_id
         |  AND t.touch_ts_us <= c.conv_ts_us
         |  AND t.touch_ts_us > c.conv_ts_us - ${AttributionWindowDays}::BIGINT * 86400000000),
         |g AS (SELECT *,
         |  CAST(count(*) OVER w AS BIGINT) AS n_touches,
         |  max(struct_pack(ts := touch_ts_us, id := touch_event_id)) OVER w AS last_t
         |  FROM p WINDOW w AS (PARTITION BY user_id, conv_event_id))
         |SELECT user_id, conv_event_id, conv_ts_us, touch_event_id,
         |  touch_ts_us, n_touches,
         |  CAST(v // n_touches + CASE WHEN touch_event_id = last_t.id
         |    THEN v - n_touches * (v // n_touches) ELSE 0 END AS BIGINT) AS credit_fp
         |FROM g""".stripMargin,

    // U-shape twin: the same band join; first/last via min/max window
    // structs, middles share the 20% slice, last takes v minus the rest
    "q171_position_attribution" ->
      s"""WITH e AS (SELECT user_id, event_id, event_type,
         |  epoch_ns(ts) // 1000 AS ts_us,
         |  CAST(round(value * 1000000) AS BIGINT) AS v FROM events),
         |c AS (SELECT user_id, event_id AS conv_event_id, ts_us AS conv_ts_us, v
         |  FROM e WHERE event_type = 'purchase'),
         |t AS (SELECT user_id, event_id AS touch_event_id, ts_us AS touch_ts_us
         |  FROM e WHERE event_type = 'click'),
         |p AS (SELECT c.user_id, c.conv_event_id, c.conv_ts_us, c.v,
         |  t.touch_event_id, t.touch_ts_us
         |  FROM c JOIN t ON c.user_id = t.user_id
         |  AND t.touch_ts_us <= c.conv_ts_us
         |  AND t.touch_ts_us > c.conv_ts_us - ${AttributionWindowDays}::BIGINT * 86400000000),
         |g AS (SELECT *,
         |  CAST(count(*) OVER w AS BIGINT) AS n_touches,
         |  max(struct_pack(ts := touch_ts_us, id := touch_event_id)) OVER w AS last_t,
         |  min(struct_pack(ts := touch_ts_us, id := touch_event_id)) OVER w AS first_t
         |  FROM p WINDOW w AS (PARTITION BY user_id, conv_event_id))
         |SELECT user_id, conv_event_id, conv_ts_us, touch_event_id,
         |  touch_ts_us, n_touches,
         |  CAST(CASE WHEN n_touches = 1 THEN v
         |    WHEN n_touches = 2 THEN CASE WHEN touch_event_id = last_t.id
         |      THEN v - v // 2 ELSE v // 2 END
         |    WHEN touch_event_id = first_t.id THEN (v * 40) // 100
         |    WHEN touch_event_id = last_t.id THEN
         |      v - (v * 40) // 100 - (n_touches - 2) * (((v * 20) // 100) // (n_touches - 2))
         |    ELSE ((v * 20) // 100) // (n_touches - 2) END AS BIGINT) AS credit_fp
         |FROM g""".stripMargin,

    // time-decay twin: 2^(maxH - h) weights via integer shifts, HUGEINT
    // products (Spark's DECIMAL(38,0)), floor shares summed per
    // conversion, anchor absorbs v - sum(shares)
    "q172_timedecay_attribution" -> {
      val halfLifeUs = TimeDecayHalfLifeDays.toLong * 86400000000L
      val maxH = (AttributionWindowDays.toLong * 86400000000L - 1) / halfLifeUs
      s"""WITH e AS (SELECT user_id, event_id, event_type,
         |  epoch_ns(ts) // 1000 AS ts_us,
         |  CAST(round(value * 1000000) AS BIGINT) AS v FROM events),
         |c AS (SELECT user_id, event_id AS conv_event_id, ts_us AS conv_ts_us, v
         |  FROM e WHERE event_type = 'purchase'),
         |t AS (SELECT user_id, event_id AS touch_event_id, ts_us AS touch_ts_us
         |  FROM e WHERE event_type = 'click'),
         |p AS (SELECT c.user_id, c.conv_event_id, c.conv_ts_us, c.v,
         |  t.touch_event_id, t.touch_ts_us
         |  FROM c JOIN t ON c.user_id = t.user_id
         |  AND t.touch_ts_us <= c.conv_ts_us
         |  AND t.touch_ts_us > c.conv_ts_us - ${AttributionWindowDays}::BIGINT * 86400000000),
         |g AS (SELECT *,
         |  CAST(count(*) OVER w AS BIGINT) AS n_touches,
         |  max(struct_pack(ts := touch_ts_us, id := touch_event_id)) OVER w AS last_t
         |  FROM p WINDOW w AS (PARTITION BY user_id, conv_event_id)),
         |wg AS (SELECT *, CAST(1::BIGINT << CAST($maxH -
         |    (conv_ts_us - touch_ts_us) // $halfLifeUs AS INT) AS BIGINT) AS w
         |  FROM g),
         |ws AS (SELECT *, CAST(sum(w) OVER w2 AS BIGINT) AS wsum
         |  FROM wg WINDOW w2 AS (PARTITION BY user_id, conv_event_id)),
         |sh AS (SELECT *, CAST((CAST(v AS HUGEINT) * w) // wsum AS BIGINT) AS share
         |  FROM ws),
         |ss AS (SELECT *, CAST(sum(share) OVER w3 AS BIGINT) AS ssum
         |  FROM sh WINDOW w3 AS (PARTITION BY user_id, conv_event_id))
         |SELECT user_id, conv_event_id, conv_ts_us, touch_event_id,
         |  touch_ts_us, n_touches,
         |  CAST(share + CASE WHEN touch_event_id = last_t.id
         |    THEN v - ssum ELSE 0 END AS BIGINT) AS credit_fp
         |FROM ss""".stripMargin
    },

    // point-in-time-EWMA twin: per event, the same fixed-point fold over
    // the (ts_us, event_id)-ordered PREFIX ending at that event — the
    // slice keeps the reduce scalar-accumulated (the safe list_reduce
    // shape), O(history) per event
    "q167_ewma_at_event" ->
      s"""WITH e AS (SELECT user_id, epoch_ns(ts) // 1000 AS ts_us, event_id,
         |  CAST(round(value * 1000000) AS BIGINT) AS v FROM events),
         |w AS (SELECT user_id,
         |  list(struct_pack(t := ts_us, i := event_id, v := v)
         |    ORDER BY ts_us, event_id) AS xs FROM e GROUP BY user_id),
         |x AS (SELECT user_id, xs, unnest(xs) AS el,
         |  generate_subscripts(xs, 1) AS k FROM w)
         |SELECT user_id, el.i AS event_id, el.t AS ts_us,
         |  list_reduce(list_prepend(CAST(0 AS BIGINT),
         |      list_transform(xs[1:k], y -> y.v)),
         |    (acc, vv) -> (850000 * acc) // 1000000 + vv) AS ewma_fp
         |FROM x""".stripMargin,

    // unattributed twin: NOT EXISTS over the same band predicate
    "q174_unattributed_conversions" ->
      s"""WITH e AS (SELECT user_id, event_id, event_type,
         |  epoch_ns(ts) // 1000 AS ts_us,
         |  CAST(round(value * 1000000) AS BIGINT) AS v FROM events),
         |c AS (SELECT user_id, event_id AS conv_event_id, ts_us AS conv_ts_us, v
         |  FROM e WHERE event_type = 'purchase'),
         |t AS (SELECT user_id, ts_us AS touch_ts_us FROM e WHERE event_type = 'click')
         |SELECT c.user_id, c.conv_event_id, c.conv_ts_us, c.v AS value_fp
         |FROM c WHERE NOT EXISTS (SELECT 1 FROM t
         |  WHERE t.user_id = c.user_id
         |  AND t.touch_ts_us <= c.conv_ts_us
         |  AND t.touch_ts_us > c.conv_ts_us - ${AttributionWindowDays}::BIGINT * 86400000000)""".stripMargin,

    // conversion-paths twin: string_agg ordered by (ts, id) over the same
    // band join — the path is a pure function of the integer order
    "q175_conversion_paths" ->
      s"""WITH e AS (SELECT user_id, event_id, event_type,
         |  epoch_ns(ts) // 1000 AS ts_us,
         |  CAST(round(value * 1000000) AS BIGINT) AS v FROM events),
         |c AS (SELECT user_id, event_id AS conv_event_id, ts_us AS conv_ts_us, v
         |  FROM e WHERE event_type = 'purchase'),
         |t AS (SELECT user_id, event_id AS touch_event_id, ts_us AS touch_ts_us,
         |  event_type AS tt FROM e
         |  WHERE event_type IN (${PathTouchTypes.map(s => s"'$s'").mkString(", ")}))
         |SELECT c.user_id, c.conv_event_id,
         |  CAST(min(c.conv_ts_us) AS BIGINT) AS conv_ts_us,
         |  string_agg(t.tt, '>' ORDER BY t.touch_ts_us, t.touch_event_id) AS path,
         |  CAST(count(*) AS BIGINT) AS n_touches,
         |  CAST(min(c.v) AS BIGINT) AS value_fp
         |FROM c JOIN t ON c.user_id = t.user_id
         |  AND t.touch_ts_us <= c.conv_ts_us
         |  AND t.touch_ts_us > c.conv_ts_us - ${AttributionWindowDays}::BIGINT * 86400000000
         |GROUP BY c.user_id, c.conv_event_id""".stripMargin,

    // top-paths twin: the q175 body re-grouped by path
    "q176_top_paths" ->
      s"""WITH e AS (SELECT user_id, event_id, event_type,
         |  epoch_ns(ts) // 1000 AS ts_us,
         |  CAST(round(value * 1000000) AS BIGINT) AS v FROM events),
         |c AS (SELECT user_id, event_id AS conv_event_id, ts_us AS conv_ts_us, v
         |  FROM e WHERE event_type = 'purchase'),
         |t AS (SELECT user_id, event_id AS touch_event_id, ts_us AS touch_ts_us,
         |  event_type AS tt FROM e
         |  WHERE event_type IN (${PathTouchTypes.map(s => s"'$s'").mkString(", ")})),
         |paths AS (SELECT c.user_id, c.conv_event_id,
         |  string_agg(t.tt, '>' ORDER BY t.touch_ts_us, t.touch_event_id) AS path,
         |  CAST(min(c.v) AS BIGINT) AS value_fp
         |  FROM c JOIN t ON c.user_id = t.user_id
         |  AND t.touch_ts_us <= c.conv_ts_us
         |  AND t.touch_ts_us > c.conv_ts_us - ${AttributionWindowDays}::BIGINT * 86400000000
         |  GROUP BY c.user_id, c.conv_event_id)
         |SELECT path, CAST(count(*) AS BIGINT) AS n_conversions,
         |  CAST(sum(value_fp) AS BIGINT) AS total_value_fp
         |FROM paths GROUP BY path""".stripMargin,

    // t-closeness twin: the same window formulation over the
    // (quasi x sensitive) counts — HUGEINT floor ppm shares, the
    // missing-values term via S_g minus the present global shares
    "q177_tcloseness" ->
      s"""WITH pv AS (SELECT lang, n_chars // 256 AS len_bucket, source,
         |  CAST(count(*) AS BIGINT) AS c FROM documents GROUP BY 1, 2, 3),
         |sh AS (SELECT *,
         |  CAST(sum(c) OVER (PARTITION BY lang, len_bucket) AS BIGINT) AS class_size,
         |  CAST(sum(c) OVER (PARTITION BY source) AS BIGINT) AS g,
         |  CAST(sum(c) OVER () AS BIGINT) AS n FROM pv),
         |p AS (SELECT *,
         |  CAST(CAST(c AS HUGEINT) * 1000000 // class_size AS BIGINT) AS pc,
         |  CAST(CAST(g AS HUGEINT) * 1000000 // n AS BIGINT) AS pg FROM sh),
         |sg AS (SELECT CAST(coalesce(sum(pg), 0) AS BIGINT) AS sgv
         |  FROM (SELECT DISTINCT source, pg FROM p)),
         |a AS (SELECT lang, len_bucket, class_size,
         |  CAST(sum(abs(pc - pg)) AS BIGINT) AS present,
         |  CAST(sum(pg) AS BIGINT) AS pgpresent
         |  FROM p GROUP BY 1, 2, 3)
         |SELECT lang, len_bucket, class_size,
         |  CAST((present + sg.sgv - pgpresent) // 2 AS BIGINT) AS tvd_ppm,
         |  CAST((present + sg.sgv - pgpresent) // 2 > $TClosePpm AS INT) AS at_risk
         |FROM a, sg""".stripMargin,

    // removal-effect twin: the q175 paths CTE + a per-channel
    // NOT-contains recount (left join ON TRUE keeps channels alive on an
    // empty journey table), HUGEINT floor-ppm shares
    "q180_removal_effect" ->
      s"""WITH e AS (SELECT user_id, event_id, event_type,
         |  epoch_ns(ts) // 1000 AS ts_us,
         |  CAST(round(value * 1000000) AS BIGINT) AS v FROM events),
         |c AS (SELECT user_id, event_id AS conv_event_id, ts_us AS conv_ts_us, v
         |  FROM e WHERE event_type = 'purchase'),
         |t AS (SELECT user_id, event_id AS touch_event_id, ts_us AS touch_ts_us,
         |  event_type AS tt FROM e
         |  WHERE event_type IN (${PathTouchTypes.map(s => s"'$s'").mkString(", ")})),
         |paths AS (SELECT c.user_id, c.conv_event_id,
         |  string_agg(t.tt, '>' ORDER BY t.touch_ts_us, t.touch_event_id) AS path,
         |  CAST(min(c.v) AS BIGINT) AS value_fp
         |  FROM c JOIN t ON c.user_id = t.user_id
         |  AND t.touch_ts_us <= c.conv_ts_us
         |  AND t.touch_ts_us > c.conv_ts_us - ${AttributionWindowDays}::BIGINT * 86400000000
         |  GROUP BY c.user_id, c.conv_event_id),
         |tot AS (SELECT CAST(count(*) AS BIGINT) AS n_conversions,
         |  CAST(coalesce(sum(value_fp), 0) AS BIGINT) AS total_value_fp FROM paths),
         |ch AS (SELECT unnest([${PathTouchTypes.map(s => s"'$s'").mkString(", ")}]) AS channel),
         |lost AS (SELECT ch.channel,
         |  CAST(coalesce(sum(CASE WHEN list_contains(string_split(p.path, '>'), ch.channel)
         |    THEN 1 ELSE 0 END), 0) AS BIGINT) AS n_lost,
         |  CAST(coalesce(sum(CASE WHEN list_contains(string_split(p.path, '>'), ch.channel)
         |    THEN p.value_fp ELSE 0 END), 0) AS BIGINT) AS value_lost_fp
         |  FROM ch LEFT JOIN paths p ON TRUE GROUP BY ch.channel)
         |SELECT l.channel, tot.n_conversions, tot.total_value_fp,
         |  l.n_lost, l.value_lost_fp,
         |  CAST(CASE WHEN tot.n_conversions > 0
         |    THEN CAST(l.n_lost AS HUGEINT) * 1000000 // tot.n_conversions
         |    ELSE 0 END AS BIGINT) AS removal_effect_ppm,
         |  CAST(CASE WHEN tot.total_value_fp > 0
         |    THEN CAST(l.value_lost_fp AS HUGEINT) * 1000000 // tot.total_value_fp
         |    ELSE 0 END AS BIGINT) AS value_effect_ppm
         |FROM lost l, tot""".stripMargin,

    // suppression twin: the three audit CTEs' at-risk classes unioned,
    // then a NULL-SAFE NOT EXISTS anti-join back to the corpus
    "q178_suppress_at_risk" ->
      s"""WITH pv AS (SELECT lang, n_chars // 256 AS len_bucket, source,
         |  CAST(count(*) AS BIGINT) AS c FROM documents GROUP BY 1, 2, 3),
         |kl AS (SELECT lang, len_bucket, CAST(sum(c) AS BIGINT) AS class_size,
         |  CAST(count(*) AS BIGINT) AS l_distinct FROM pv GROUP BY 1, 2),
         |sh AS (SELECT *,
         |  CAST(sum(c) OVER (PARTITION BY lang, len_bucket) AS BIGINT) AS class_size,
         |  CAST(sum(c) OVER (PARTITION BY source) AS BIGINT) AS g,
         |  CAST(sum(c) OVER () AS BIGINT) AS n FROM pv),
         |p AS (SELECT *,
         |  CAST(CAST(c AS HUGEINT) * 1000000 // class_size AS BIGINT) AS pc,
         |  CAST(CAST(g AS HUGEINT) * 1000000 // n AS BIGINT) AS pg FROM sh),
         |sg AS (SELECT CAST(coalesce(sum(pg), 0) AS BIGINT) AS sgv
         |  FROM (SELECT DISTINCT source, pg FROM p)),
         |tv AS (SELECT lang, len_bucket,
         |  CAST(sum(abs(pc - pg)) AS BIGINT) AS present,
         |  CAST(sum(pg) AS BIGINT) AS pgpresent FROM p GROUP BY 1, 2),
         |risky AS (
         |  SELECT lang, len_bucket FROM kl
         |    WHERE class_size < $KAnonK OR l_distinct < $LDivL
         |  UNION
         |  SELECT tv.lang, tv.len_bucket FROM tv, sg
         |    WHERE (present + sg.sgv - pgpresent) // 2 > $TClosePpm),
         |d AS (SELECT doc_id, lang, n_chars // 256 AS len_bucket, source
         |  FROM documents)
         |SELECT doc_id, lang, len_bucket, source FROM d
         |WHERE NOT EXISTS (SELECT 1 FROM risky r
         |  WHERE r.lang IS NOT DISTINCT FROM d.lang
         |    AND r.len_bucket IS NOT DISTINCT FROM d.len_bucket)""".stripMargin,

    // l-diversity twin: grouped per-(quasi, sensitive) counts re-grouped
    // by quasi — countDistinct-with-NULL-as-a-value falls out of the
    // two-level grouping; modal share is the q157 HUGEINT floor ppm
    "q173_ldiversity" ->
      s"""WITH pv AS (SELECT lang, n_chars // 256 AS len_bucket, source,
         |  CAST(count(*) AS BIGINT) AS c FROM documents GROUP BY 1, 2, 3)
         |SELECT lang, len_bucket,
         |  CAST(sum(c) AS BIGINT) AS class_size,
         |  CAST(count(*) AS BIGINT) AS l_distinct,
         |  CAST(CAST(max(c) AS HUGEINT) * 1000000 // CAST(sum(c) AS HUGEINT) AS BIGINT) AS modal_share_ppm,
         |  CAST(count(*) < $LDivL AS INT) AS at_risk
         |FROM pv GROUP BY 1, 2""".stripMargin,

    // k-anonymity twin: plain grouped count + flag
    "q165_kanonymity" ->
      s"""SELECT lang, source, n_chars // 256 AS len_bucket,
         |  CAST(count(*) AS BIGINT) AS class_size,
         |  CAST(count(*) < $KAnonK AS INT) AS at_risk
         |FROM documents GROUP BY 1, 2, 3""".stripMargin,

    // heavy-hitters twin: the CMS prefilter is invisible in the result
    // (upper-bound estimates admit every true hitter; the exact recount
    // drops the false positives), so the oracle is the plain exact form —
    // values whose count clears the cross-multiplied share threshold
    "q157_heavy_hitters" ->
      s"""WITH p AS (
         |  SELECT 'lang' AS col_name, CAST(lang AS VARCHAR) AS v FROM documents WHERE lang IS NOT NULL
         |  UNION ALL
         |  SELECT 'source', CAST(source AS VARCHAR) FROM documents WHERE source IS NOT NULL
         |  UNION ALL
         |  SELECT 'text', CAST(text AS VARCHAR) FROM documents WHERE text IS NOT NULL),
         |t AS (SELECT col_name, CAST(count(*) AS BIGINT) AS n FROM p GROUP BY col_name),
         |c AS (SELECT col_name, v, CAST(count(*) AS BIGINT) AS cnt FROM p GROUP BY col_name, v),
         |h AS (SELECT c.col_name, c.v, c.cnt, t.n FROM c JOIN t USING (col_name)
         |  WHERE CAST(c.cnt AS HUGEINT) * 1000000 >= $HeavyHitterSharePpm * CAST(t.n AS HUGEINT))
         |SELECT col_name, v AS value, cnt,
         |  CAST(CAST(cnt AS HUGEINT) * 1000000 // n AS BIGINT) AS share_ppm,
         |  CAST(row_number() OVER (PARTITION BY col_name ORDER BY cnt DESC, v ASC) AS INT) AS rank
         |FROM h""".stripMargin,

    // RFM twin: identical exact arithmetic — value-based quantile bucket
    // ceil(cum·n/N) over each metric's distinct-value histogram, recency
    // inverted so nBuckets always means best
    "q181_rfm_segments" -> RfmOracleSql,

    // increment == one-shot: the incremental forms' oracle IS the
    // one-shot twin (the q163 contract)
    "q183_rfm_incremental" -> RfmOracleSql,
    "q184_anomaly_incremental" -> AnomalyOracleSql,

    // expectations twin: per-rule CASE sums off one scan, the unique
    // rollup, a NOT EXISTS referential probe, floor-ppm + cross-
    // multiplied pass verdicts (tol = 0 -> v = 0)
    "q185_expectations" ->
      s"""WITH base AS (SELECT CAST(count(*) AS BIGINT) AS n,
         |  CAST(sum(CASE WHEN text IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS v_nn,
         |  CAST(sum(CASE WHEN lang IS NOT NULL
         |    AND lang NOT IN ('en', 'de', 'fr') THEN 1 ELSE 0 END) AS BIGINT) AS v_set,
         |  CAST(sum(CASE WHEN n_chars IS NOT NULL
         |    AND (n_chars < 0 OR n_chars > 256) THEN 1 ELSE 0 END) AS BIGINT) AS v_rng,
         |  CAST(sum(CASE WHEN source IS NOT NULL
         |    AND NOT regexp_matches(source, '^src[0-9]$$') THEN 1 ELSE 0 END) AS BIGINT) AS v_re
         |  FROM documents),
         |uq AS (SELECT CAST(coalesce(sum(c), 0) AS BIGINT) AS n,
         |  CAST(coalesce(sum(CASE WHEN c > 1 THEN c ELSE 0 END), 0) AS BIGINT) AS v
         |  FROM (SELECT count(*) AS c FROM documents GROUP BY doc_id)),
         |fk AS (SELECT (SELECT CAST(count(*) AS BIGINT) FROM events) AS n,
         |  (SELECT CAST(count(*) AS BIGINT) FROM events ev
         |    WHERE ev.user_id IS NOT NULL AND NOT EXISTS
         |      (SELECT 1 FROM customer c WHERE c.c_custkey = ev.user_id)) AS v),
         |rows_out AS (
         |  SELECT 'not_null' AS rule, 'text' AS target, n AS n_rows, v_nn AS n_violations FROM base
         |  UNION ALL SELECT 'unique', 'doc_id', n, v FROM uq
         |  UNION ALL SELECT 'in_set', 'lang', n, v_set FROM base
         |  UNION ALL SELECT 'in_range', 'n_chars', n, v_rng FROM base
         |  UNION ALL SELECT 'matches_regex', 'source', n, v_re FROM base
         |  UNION ALL SELECT 'row_count_between', '[1, 1000000000]', n,
         |    CASE WHEN n BETWEEN 1 AND 1000000000 THEN 0 ELSE 1 END FROM base
         |  UNION ALL SELECT 'foreign_key', 'user_id', n, v FROM fk)
         |SELECT rule, target, n_rows, CAST(n_violations AS BIGINT) AS n_violations,
         |  CASE WHEN n_rows > 0 THEN
         |    CAST(CAST(n_violations AS HUGEINT) * 1000000 // n_rows AS BIGINT) END
         |    AS violation_ppm,
         |  CAST(CASE WHEN n_violations = 0 THEN 1 ELSE 0 END AS INT) AS passed
         |FROM rows_out""".stripMargin,

    // traffic-anomaly twin: the same cross-multiplied integer z-test in
    // HUGEINT, trailing calendar-day RANGE window, NULL until the window
    // is complete
    "q182_traffic_anomaly" -> AnomalyOracleSql,

    // streaming-ingest twin — see [[StreamingIngestOracleSql]]
    "q186_streaming_ingest" -> StreamingIngestOracleSql,

    // probe (a) shares the contract's oracle verbatim: same formulation,
    // streaming machinery removed on the Spark side only
    "q186a_ingest_batch_probe" -> StreamingIngestOracleSql,

    // probe (b): the contract twin rolled up per window hour — every
    // column an exact integer sum, so a divergent hour (and which column
    // family moved) reads straight off the row diff
    "q186b_ingest_window_checksum" ->
      s"""WITH w AS ($StreamingIngestOracleSql)
         |SELECT window_start_us, CAST(count(*) AS BIGINT) AS n_rows,
         |  CAST(sum(user_id) AS BIGINT) AS sum_users,
         |  CAST(sum(len(event_type)) AS BIGINT) AS sum_type_len,
         |  CAST(sum(n_events) AS BIGINT) AS sum_events,
         |  CAST(sum(sum_value_fp) AS BIGINT) AS sum_value_fp
         |FROM w GROUP BY 1""".stripMargin,

    // session-window twin: gaps-and-islands (lag + running sum per user)
    // over the SAME quantized rows, with Spark session_window semantics
    // pinned exactly — break only when the gap EXCEEDS 30 minutes (an
    // exactly-gap successor MERGES: session_window extends the window to
    // ts+gap inclusive of a touching [ts+gap, …) start, verified
    // empirically on Spark 4.1.2 batch + streaming — the same `>` break
    // as q54's batch operator), session_end = last event + gap
    // interval-join twin: the q188 stream result is exactly the batch
    // interval join of quantized events x derived purchase labels —
    // inclusive both bounds (ts <= as_of AND ts >= as_of - lookback),
    // the purchase's own event row self-matches at distance 0, and
    // every column is exact BIGINT/string; sentinels never leave the
    // harness (the -1 user is filtered before the dump)
    "q188_streaming_interval_join" ->
      """WITH e AS (SELECT user_id, event_type,
        |  epoch_ns(ts) // 1000 AS us,
        |  CAST(floor(value * 1000000 + 0.5) AS BIGINT) AS value_fp
        |  FROM events),
        |l AS (SELECT user_id, us AS as_of_us, value_fp AS label_fp
        |  FROM e WHERE event_type = 'purchase')
        |SELECT l.user_id, l.as_of_us, l.label_fp, e.event_type,
        |  e.us AS event_ts_us, e.value_fp
        |FROM e JOIN l ON e.user_id = l.user_id
        |  AND e.us <= l.as_of_us
        |  AND e.us >= l.as_of_us - 3600000000""".stripMargin,

    // arbitrary-state twin: snapshots after each of the two midpoint-split
    // batches. flatMapGroupsWithState emits only for groups WITH input
    // rows in a trigger, so batch 2's rows are the full-history aggregate
    // restricted to suffix-active users; user_id crosses as VARCHAR (the
    // typed Dataset[Event] key)
    "q189_streaming_state_snapshots" ->
      """WITH e AS (SELECT CAST(user_id AS VARCHAR) AS user_id, event_type,
        |  epoch_ns(ts) // 1000 AS us FROM events),
        |c AS (SELECT (min(us) + max(us)) // 2 AS cut FROM e),
        |b1 AS (SELECT user_id, CAST(count(*) AS BIGINT) AS event_count,
        |  CAST(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS BIGINT)
        |    AS purchase_count,
        |  max(us) AS last_event_us
        |  FROM e, c WHERE us <= cut GROUP BY user_id),
        |act2 AS (SELECT DISTINCT user_id FROM e, c WHERE us > cut),
        |b2 AS (SELECT e.user_id, CAST(count(*) AS BIGINT) AS event_count,
        |  CAST(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS BIGINT)
        |    AS purchase_count,
        |  max(us) AS last_event_us
        |  FROM e JOIN act2 USING (user_id) GROUP BY e.user_id)
        |SELECT * FROM b1 UNION ALL SELECT * FROM b2""".stripMargin,

    "q187_streaming_sessions" ->
      s"""WITH e AS (SELECT user_id,
         |  epoch_ns(ts) // 1000 AS us,
         |  CAST(floor(value * 1000000 + 0.5) AS BIGINT) AS value_fp
         |  FROM events),
         |l AS (SELECT *, lag(us) OVER (PARTITION BY user_id ORDER BY us) AS prev_us FROM e),
         |n AS (SELECT *, CASE WHEN prev_us IS NULL OR us - prev_us > $SessionGapUs
         |  THEN 1 ELSE 0 END AS brk FROM l),
         |g AS (SELECT *, sum(brk) OVER (PARTITION BY user_id ORDER BY us
         |  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid FROM n)
         |SELECT min(us) AS session_start_us, max(us) + $SessionGapUs AS session_end_us,
         |  user_id, CAST(count(*) AS BIGINT) AS n_events,
         |  CAST(sum(value_fp) AS BIGINT) AS sum_value_fp
         |FROM g GROUP BY user_id, sid""".stripMargin
  )

  /** q187's session gap in micros — 30 minutes, [[graft.streaming
    * .EventStream.sessionIngestReplay]]'s default.
    */
  private val SessionGapUs = 1800000000L

  /** The q186 contract's batch formulation in DuckDB: watermarked-dedup +
    * tumbling windows == distinct FULL rows (the replayed duplicates are
    * byte-identical redeliveries, so the dedup key includes the value)
    * bucketed to floor-hour windows; value in 1e6 fixed point
    * (floor(v·1e6 + 0.5), the q65 single-IEEE-op rule) so the window sum
    * is exact BIGINT on both engines; the sentinel row never flushes in
    * Append mode so it has no twin row. Shared verbatim by q186, the
    * q186a batch-Spark probe, and (rolled up) the q186b checksum probe.
    */
  private lazy val StreamingIngestOracleSql: String =
    """WITH e AS (SELECT DISTINCT user_id, event_type,
      |  epoch_ns(ts) // 1000 AS us,
      |  CAST(floor(value * 1000000 + 0.5) AS BIGINT) AS value_fp
      |  FROM events)
      |SELECT (us // 3600000000) * 3600000000 AS window_start_us,
      |  user_id, event_type, CAST(count(*) AS BIGINT) AS n_events,
      |  CAST(sum(value_fp) AS BIGINT) AS sum_value_fp
      |FROM e GROUP BY 1, 2, 3""".stripMargin

  private lazy val RfmOracleSql: String = {
      def bucket(metric: String): String =
        s"""SELECT v, (cum * $RfmBuckets + n - 1) // n AS b FROM (
           |  SELECT v, sum(c) OVER (ORDER BY v) AS cum, sum(c) OVER () AS n
           |  FROM (SELECT $metric AS v, count(*) AS c FROM m GROUP BY 1))""".stripMargin
      s"""WITH e AS (SELECT user_id, epoch_ns(ts) // 1000 AS us,
         |  CASE WHEN event_type = 'purchase'
         |    THEN coalesce(CAST(round(value * 1000000) AS BIGINT), 0)
         |    ELSE 0 END AS v
         |  FROM events),
         |anch AS (SELECT max(us) AS anchor FROM e),
         |m AS (SELECT user_id,
         |  (anch.anchor - max(us)) // 86400000000 AS recency_days,
         |  CAST(count(*) AS BIGINT) AS frequency,
         |  CAST(sum(v) AS BIGINT) AS monetary_fp
         |  FROM e, anch GROUP BY user_id, anch.anchor),
         |rb AS (${bucket("recency_days")}),
         |fb AS (${bucket("frequency")}),
         |mb AS (${bucket("monetary_fp")})
         |SELECT m.user_id, CAST(m.recency_days AS BIGINT) AS recency_days,
         |  m.frequency, m.monetary_fp,
         |  CAST(${RfmBuckets + 1} - rb.b AS BIGINT) AS r_score,
         |  CAST(fb.b AS BIGINT) AS f_score,
         |  CAST(mb.b AS BIGINT) AS m_score,
         |  CAST((${RfmBuckets + 1} - rb.b) * 100 + fb.b * 10 + mb.b AS BIGINT)
         |    AS rfm_cell
         |FROM m JOIN rb ON m.recency_days = rb.v
         |  JOIN fb ON m.frequency = fb.v
         |  JOIN mb ON m.monetary_fp = mb.v""".stripMargin
  }

  private lazy val AnomalyOracleSql: String =
      s"""WITH d AS (SELECT epoch_ns(ts) // 1000 // 86400000000 AS day,
         |  CAST(count(*) AS BIGINT) AS n FROM events GROUP BY 1),
         |w AS (SELECT day, n,
         |  CAST(count(n) OVER win AS BIGINT) AS w_days,
         |  CAST(coalesce(sum(n) OVER win, 0) AS BIGINT) AS w_sum,
         |  coalesce(sum(CAST(n AS HUGEINT) * n) OVER win, 0) AS w_sumsq
         |  FROM d WINDOW win AS (ORDER BY day
         |    RANGE BETWEEN $AnomalyWindowDays PRECEDING AND 1 PRECEDING))
         |SELECT CAST(day AS BIGINT) AS day, n, w_days, w_sum,
         |  CAST(n * $AnomalyWindowDays - w_sum AS BIGINT) AS dev_x_w,
         |  CAST(CASE WHEN w_days = $AnomalyWindowDays THEN
         |    CASE WHEN CAST(n * $AnomalyWindowDays - w_sum AS HUGEINT)
         |        * (n * $AnomalyWindowDays - w_sum)
         |        * ${AnomalyKDen * AnomalyKDen}
         |      > ${AnomalyKNum * AnomalyKNum}
         |        * ($AnomalyWindowDays * w_sumsq - CAST(w_sum AS HUGEINT) * w_sum)
         |    THEN 1 ELSE 0 END
         |  END AS INT) AS is_anomaly
         |FROM w""".stripMargin

  /** One q150/q154 profile UNION ALL arm over relation `rel`: every count
    * CAST to BIGINT (DuckDB count is BIGINT but sum is HUGEINT), min/max
    * in NATIVE type order then stringified, floor-division ppm via `//`
    * on HUGEINT.
    */
  private def profileColSql(c: String, rel: String): String =
    s"""SELECT col_name, n_rows, n_null, n_distinct, min_str, max_str,
       |  mode_str, mode_count, avg_len_ppm
       |FROM (
       |  SELECT '$c' AS col_name,
       |    CAST(count(*) AS BIGINT) AS n_rows,
       |    CAST(count(*) - count($c) AS BIGINT) AS n_null,
       |    CAST(count(DISTINCT $c) AS BIGINT) AS n_distinct,
       |    CAST(min($c) AS VARCHAR) AS min_str,
       |    CAST(max($c) AS VARCHAR) AS max_str,
       |    CASE WHEN count($c) > 0 THEN
       |      CAST(CAST(sum(length(CAST($c AS VARCHAR))) AS HUGEINT) * 1000000
       |        // count($c) AS BIGINT) END AS avg_len_ppm
       |  FROM $rel) pa
       |CROSS JOIN (
       |  SELECT (m).vv AS mode_str, CAST(-(m).nc AS BIGINT) AS mode_count FROM (
       |    SELECT min(struct_pack(nc := -c, vv := v)) AS m FROM (
       |      SELECT CAST($c AS VARCHAR) AS v, CAST(count(*) AS BIGINT) AS c
       |      FROM $rel t WHERE $c IS NOT NULL GROUP BY 1))) pb""".stripMargin

  /** Bloom probe position for probe-index expr `k` over hash expr `h` —
    * CASE arms generated from [[BloomFilter]]'s pinned constants.
    */
  private def bloomPosSql(k: String, h: String): String = {
    val aArms = BloomFilter.ProbeA.zipWithIndex
      .map { case (a, i) => s"WHEN $i THEN $a" }.mkString(" ")
    val bArms = BloomFilter.ProbeB.zipWithIndex
      .map { case (b, i) => s"WHEN $i THEN $b" }.mkString(" ")
    s"((CASE $k $aArms END * $h + CASE $k $bArms END) % ${BloomFilter.ProbeMod}) % ${BloomFilter.Bits}"
  }

  /** CMS cell index for row expr `r` over hash expr `h` — CASE arms
    * generated from [[FrequencySketch]]'s pinned constants so the twin
    * can't drift.
    */
  private def cmsIdxSql(r: String, h: String): String = {
    val aArms = FrequencySketch.RowA.zipWithIndex
      .map { case (a, i) => s"WHEN $i THEN $a" }.mkString(" ")
    val bArms = FrequencySketch.RowB.zipWithIndex
      .map { case (b, i) => s"WHEN $i THEN $b" }.mkString(" ")
    s"((CASE $r $aArms END * $h + CASE $r $bArms END) % ${FrequencySketch.RowMod}) % ${FrequencySketch.Width}"
  }
}
