package graft

import org.apache.spark.sql.execution.ExplainMode

/** Physical-plan regression guards over the driver query suite at sf0.001.
  *
  * Correctness tests prove the right ROWS come back; these prove the right
  * PLAN produces them — the properties that decide whether a query
  * survives a 100x scale-up: filters reaching the parquet scan, projection
  * pruning the read schema, and no accidental nested-loop pair blowups.
  * A refactor that silently un-pushes a filter or degrades a bucketed join
  * to a cross product fails here, not in a 100 TB incident.
  */
class PlanSpec extends SparkTestBase {

  private val dir = "/root/testdata/sf0.001"

  private def plan(name: String): String =
    SparkEntry.queries(name)(spark, dir)
      .queryExecution.explainString(ExplainMode.fromString("formatted"))

  /** Count Exchange OPERATOR headers ("(n) Exchange") in a formatted
    * explain — each physical exchange prints exactly one such line.
    */
  private def exchangeCount(p: String): Int =
    p.linesIterator.count(_.matches("""\(\d+\) Exchange\s*"""))

  test("q02: range+discount filters are pushed into the parquet scan") {
    val p = plan("q02_filter_range")
    p should include("PushedFilters: [")
    p should include("l_discount")             // pushed, not post-scan only
  }

  test("q01: projection prunes the read schema to the selected columns") {
    val p = plan("q01_scan_project")
    val read = p.linesIterator.find(_.contains("ReadSchema")).get
    read should include("r_regionkey")
    read should not include "r_comment"
  }

  test("q14 backfill: date-spine and daily-summary sides broadcast; events scan prunes columns") {
    val p = plan("q14_backfill")
    p should include("BroadcastExchange")
    // raw text/props columns must never enter the backfill scan
    p.linesIterator.filter(_.contains("ReadSchema")).foreach { l =>
      l should not include "props"
    }
  }

  test("q146 media state: scans read doc_id only; payload bytes never enter an exchange") {
    // the media-dedup 100TB contract, asserted on the plan: payloads are
    // generated/decoded and hashed INSIDE one map-side stage — every
    // Exchange (shuffle or broadcast) carries (id, hash)-shaped rows only
    val p = plan("q146_image_state_neardup")
    p.linesIterator.filter(_.contains("ReadSchema")).foreach { l =>
      l should include("doc_id")
      l should not include "text"
    }
    // formatted explain prints one detail section per node, blank-line
    // separated and headed "(n) Exchange" / "(n) BroadcastExchange"
    val exchangeSections = p.split("\n\\s*\n").filter(
      _.linesIterator.nextOption().exists(_.matches("""\(\d+\) (Broadcast)?Exchange.*""")))
    exchangeSections should not be empty
    exchangeSections.foreach { s =>
      withClue(s"exchange section:\n$s\n")(s should not include "payload")
    }
  }

  test("no accidental nested-loop joins: only sanctioned queries may use BNLJ/cartesian") {
    // q05 is an explicit cross join; q31 is the documented small-n exact
    // all-pairs verifier; q28/q35 broadcast a tiny side across the corpus
    // by design (query set / centroids); q14-q17 embed the backfill
    // subplan, whose broadcast date-spine densification is the sanctioned
    // cross join; q43 cross-joins two SCALAR frames (total count, then the
    // one-row quantile threshold) against the corpus — a broadcast of one
    // row, the canonical scalar-join shape; q48/q49 embed that same
    // quantile-gate subplan as their quality stage
    val sanctioned = Set(
      "q05_cross_join", "q31_embed_neardup_exact",
      "q28_knn_brute", "q35_knn_ivf", "q53_knn_ivf_incremental",
      "q13_band_join", "q14_backfill", "q15_pit_join", "q16_pit_join_rank",
      "q17_online_payload", "q43_quantile_gate", "q48_corpus_pipeline",
      "q49_corpus_incremental",
      // q59's sqrt-weight normalizer S is a one-row aggregate cross-joined
      // against the (tiny) per-category counts — the same sanctioned
      // scalar-broadcast shape as q43's threshold; q73's histogram totals
      // row is the identical shape against the bounded bin union, q90's
      // corpus-total row against the per-(group, bin) histogram, and
      // q92's quantile scalars against the one-row count
      // q93's 9-row quantile spine crosses the bounded histogram — both
      // sides histogram/constant-sized, never the corpus
      // q94 is q93's shape over log buckets — same sanctioned spine;
      // q97's one-row piece-vocabulary array crosses the distinct-word
      // table and q99's one-row ln(N+V) model constant crosses the
      // per-doc totals (q43's scalar-broadcast shape); q108's one-row
      // NB model constants (smoothing denominators + priors) are the
      // same shape
      "q59_temperature_mix", "q73_split_drift", "q90_source_drift",
      "q92_time_to_convert", "q93_decile_profile", "q94_logbucket_profile",
      "q97_bpe_packing", "q99_lm_surprisal", "q103_bigram_surprisal",
      // q152/q153 are q103 one order up — the same one-row ln(25D) floor
      // constant crosses as a sanctioned broadcast
      "q152_trigram_surprisal", "q153_trigram_incremental",
      "q108_nb_quality",
      // q136/q137 embed q104's 1-row argmax broadcasts (the merge loop)
      // plus the collected merge-piece inventory — a one-row vocab array
      // crossed into the DISTINCT-word table, the q97 scalar-broadcast
      // shape; q137 adds nothing beyond q136's joins (pack is keyed);
      // q136a is q136's encode path read as per-doc counts — identical
      // sanctioned merge-map broadcasts, no new join
      "q136_encode_ids", "q136a_encode_ids_counts", "q137_pack_ids",
      // q140 adds two more 1-row broadcasts to q137's shape: the stored
      // tail descriptor and the replace-from cut — both limit(1)/agg
      // scalars crossed into keyed frames
      "q140_pack_ids_incremental",
      // q109/q110/q112's one-row ln(N) totals cross the aggregated
      // (distinct-domain) tables — the same q43 scalar-broadcast shape,
      // never corpus x corpus (q116's joins are all keyed: they stay
      // under the full guard); q115 is q109's read off merged state
      "q109_source_kl", "q109a_source_kl_probe", "q109b_source_kl_millinats",
      "q110_tfidf_terms",
      "q112_pmi_collocations", "q115_source_kl_incremental",
      // the fused PQ ADC scan (q111/q113/q114/q117) crosses the broadcast
      // per-query distance maps — |queries| rows, each one bounded
      // m x K map — into the gathered code arrays: the q28
      // broadcast-query shape, with the ADC sum a row-local fold (the
      // BNLJ emits the (query, candidate) score rows the old keyed form
      // emitted m x |queries| partials for, never corpus x corpus); the
      // dedicated q114 guard below pins the count to exactly one and the
      // rerank join as keyed
      "q111_knn_pq", "q113_knn_pq_incremental", "q114_knn_pq_reranked",
      "q117_knn_pq_trained",
      // q119 embeds the q35 trained quantizer: the only cross join is the
      // tiny broadcast centroid set against the corpus (assignment
      // argmax); its in-cell pair stage stays a keyed join on cid —
      // pinned by the dedicated q119 guard below
      "q119_semantic_dedup",
      // q120/q121 embed q108's one-row NB model constants (and q121 the
      // q90 one-row histogram total) — the same sanctioned
      // scalar-broadcast shape
      "q120_nb_calibration", "q121_nb_score_drift",
      // q147/q148/q149 are q108/q120 in hashed feature spaces — identical
      // one-row NB model-constant broadcasts, no new join shape
      "q147_nb_hashed", "q148_nb_hashed_calibration", "q149_nb_chargram",
      // q122 is q119's broadcast-centroid assignment run twice (build +
      // frozen-centroid shard) — same sanctioned shape, pair stage keyed
      "q122_semantic_dedup_incremental",
      // q123's cross joins are the one-row base-constant and the one-row
      // TakeOrdered(n) selection threshold against the corpus — the q43
      // scalar-broadcast shape; the bucket-model join stays keyed (and
      // bounded by DsirBuckets rows), pinned by the q123 guard below
      "q123_dsir_resample",
      // q125's cross joins are the q35 broadcast-centroid assignment
      // (coarse cells, slice-sized) — codes meet the query tables on the
      // keyed (ccid, sub, cid) join, pinned by the q125 guard below;
      // q135 is the same index built in two frozen-quantizer steps
      "q125_knn_ivfpq", "q135_knn_ivfpq_incremental",
      // q139 is q125's shortlist plus a keyed exact-rerank join — its
      // only cross joins are the same broadcast-centroid assignment
      "q139_knn_ivfpq_reranked",
      // q126 embeds q99's one-row ln(N+V) model constant against the
      // per-doc totals — the q43 scalar-broadcast shape; the tier join
      // back is keyed on (lang, bin), pinned by the q126 guard below
      "q126_perplexity_buckets",
      // q132 embeds q108's one-row NB model constants — the same
      // sanctioned scalar-broadcast shape; every other verdict join is
      // keyed on doc_id
      "q132_curation_verdict",
      // q158/q159 embed the q35 trained quantizer — the only cross join
      // is the tiny broadcast-centroid assignment argmax; the profile
      // aggregate is keyed on cluster_id
      "q158_embed_clusters", "q159_cluster_profile",
      // q160/q164 embed q108's one-row NB model constants (the PageRank
      // side of q160 crosses nothing); the RRF fuse and host rollup are
      // keyed aggregates
      "q160_rrf_fusion", "q164_host_quality",
      // q161's only cross joins are HITS' per-round 1-row
      // max-normalization scalars — the q43 scalar-broadcast shape
      "q161_hits",
      // q169 embeds q119's broadcast-centroid assignment; the pair stage
      // and the grid sweep are keyed joins/aggregates
      "q169_semdedup_calibration",
      // q178 embeds q177's t-closeness audit, so it inherits the same
      // one-row S_g scalar cross join; its own join back to the corpus is
      // a null-safe BROADCAST anti-join on the quasi tuple (<=> keys give
      // Spark no equi-join hash keys, so the bounded at-risk frame rides
      // BNLJ by construction — domain-bounded, never corpus x corpus)
      "q178_suppress_at_risk",
      // q180's one cross join is the 1-row conversion/value totals frame
      // broadcast against the |channels|-row effect table — the q43
      // scalar-broadcast shape on both sides
      "q180_removal_effect",
      // q177's only cross join is the one-row S_g (sum of distinct global
      // floor-ppm shares) against the quasi-class aggregate — the q43
      // scalar-broadcast shape over a domain-bounded frame
      "q177_tcloseness",
      // q181's one cross join is the 1-row recency anchor (corpus max ts)
      // broadcast against the per-user metrics frame — the q43
      // scalar-broadcast shape; every bucket lookup is an equi-join
      // (q183 is the same scoring path over incrementally-folded state;
      // q185's foreign-key verdict needs no sanction — the one-pass
      // left-outer marker join made its BNLJ disappear)
      "q181_rfm_segments", "q183_rfm_incremental")
    SparkEntry.queries.keys.filterNot(sanctioned).foreach { name =>
      val p = plan(name)
      withClue(s"$name uses a pair-blowup join:") {
        p should not include "BroadcastNestedLoopJoin"
        p should not include "CartesianProduct"
      }
    }
  }

  test("dedup/similarity bucket joins are hash or sort-merge joins on bucket keys") {
    Seq("q24_dedup_ngram", "q25_dedup_minhash", "q26_dedup_simhash",
        "q27_embed_neardup", "q29_knn_lsh").foreach { name =>
      val p = plan(name)
      withClue(s"$name:") {
        (p.contains("BroadcastHashJoin") || p.contains("SortMergeJoin") ||
          p.contains("ShuffledHashJoin")) shouldBe true
      }
    }
  }

  test("q119: semDedup pair stage is a keyed join on the cell id — vectors never cross-join") {
    val p = plan("q119_semantic_dedup")
    // in-cell candidate generation joins on cid (hash/SMJ); the ONLY
    // nested-loop shapes allowed are the broadcast centroid assignments
    (p.contains("BroadcastHashJoin") || p.contains("SortMergeJoin") ||
      p.contains("ShuffledHashJoin")) shouldBe true
    p should not include "CartesianProduct"
    // keep-priority argmax is the combinable max_by aggregate, not a
    // corpus-wide window
    p should include("max_by")
  }

  test("q123: DSIR model join is keyed, selection threshold is TakeOrdered — no corpus window") {
    val p = plan("q123_dsir_resample")
    // bucket-model scoring joins on b (broadcast hash at <= DsirBuckets
    // rows); the Gumbel-top-k flag compares against a TakeOrdered(n)
    // one-row threshold instead of ranking the corpus in one task
    p should include("BroadcastHashJoin")
    p should include("TakeOrderedAndProject")
    p should not include "Window"
    p should not include "CartesianProduct"
  }

  test("q125: IVF-PQ candidate scan is a keyed join on (cell, sub, codeword) — codes never cross-join") {
    val p = plan("q125_knn_ivfpq")
    // the candidate stage meets the broadcast query tables on a hash
    // join; encode/assign argmins are map-side-combining aggregates
    p should include("BroadcastHashJoin")
    (p.contains("min_by") || p.contains("max_by")) shouldBe true
    p should not include "CartesianProduct"
  }

  test("q157: heavy-hitter CMS estimate is broadcast-joined map-side; no pair blowup") {
    val p = plan("q157_heavy_hitters")
    // the Depth cell lookups and the per-column totals meet the posting
    // on broadcast hash joins (the sketch is cells-bounded); the only
    // window ranks the already-filtered hitters (<= 1e6/minShare rows)
    p should include("BroadcastHashJoin")
    p should not include "BroadcastNestedLoopJoin"
    p should not include "CartesianProduct"
  }

  test("multi-reader frames stay persisted: LM scoring, attribution pairs, journey/means tables") {
    // the round-18 persist rule: a frame consumed by >=2 downstream reads
    // must cache, or its whole subtree re-derives per reader (tokenize
    // passes, band joins). A dropped maybePersist shows here as a missing
    // InMemoryRelation, not as a silent 2-5x sweep regression.
    Seq("q152_trigram_surprisal", "q103_bigram_surprisal",
        "q168_attribution", "q180_removal_effect",
        "q126_perplexity_buckets").foreach { q =>
      withClue(s"$q: ") { plan(q) should include("InMemoryRelation") }
    }
  }

  test("q181/q183: RFM null-safe bucket lookups stay broadcast hash joins") {
    // the recency/frequency rank tables are bounded -> broadcast ALWAYS;
    // the lookup is null-safe (<=>), and EqualNullSafe must keep planning
    // as a BroadcastHashJoin equi-key — a demotion to BNLJ here would be
    // a users-x-ranks pair blowup at scale (the r17 q183 regression
    // suspicion; this pins the plan either way)
    Seq("q181_rfm_segments", "q183_rfm_incremental").foreach { q =>
      val p = plan(q)
      withClue(s"$q: ") {
        // r/f rank lookups broadcast; monetary takes the shuffle_hash
        // policy path. A demoted <=> would show as a conditioned BNLJ and
        // drop these counts (the 1-row anchor crossJoins are BNLJ Cross
        // with NO condition — sanctioned, covered by the global BNLJ test)
        p.linesIterator.count(
          _.matches("""\(\d+\) BroadcastHashJoin.*""")) should be >= 2
        p.linesIterator.count(
          _.matches("""\(\d+\) ShuffledHashJoin.*""")) should be >= 1
        p should not include "CartesianProduct"
      }
    }
  }

  test("q160: per-signal RRF cuts are TakeOrdered, never a corpus-wide sort") {
    val p = plan("q160_rrf_fusion")
    p should include("TakeOrderedAndProject")
    p should not include "CartesianProduct"
  }

  test("q158: cluster assignment is the combinable max_by argmax, not a corpus window") {
    val p = plan("q158_embed_clusters")
    p should include("max_by")
    p should not include "Window"
    p should not include "CartesianProduct"
  }

  test("q17: latest-per-user is a combinable aggregate, not an un-splittable window") {
    val p = plan("q17_online_payload")
    p should include("max_by")
    p should not include "Window"
  }

  test("q39: content-hash split is row-local — zero shuffles in the plan") {
    val p = plan("q39_train_split")
    p should not include "Exchange"
    p should include("[codegen id :")               // hash + case fuse into the scan
  }

  test("q44: rebalance never windows or sorts the corpus — counts broadcast, filter row-local") {
    val p = plan("q44_rebalance_sources")
    p should not include "Window"
    p should not include "Sort"
    p should include("BroadcastHashJoin")
  }

  test("q45: contamination matches the benchmark side via broadcast hash join") {
    val p = plan("q45_contamination")
    p should include("BroadcastHashJoin")
    p should not include "CartesianProduct"
  }

  test("q141/q143: url dedup never reads text — the scan prunes to doc_id; canonicalization is row-local") {
    Seq("q141_url_dedup", "q143_url_dedup_incremental").foreach { q =>
      val p = plan(q)
      val readSchemas = p.linesIterator.filter(_.contains("ReadSchema")).toSeq
      withClue(readSchemas.mkString("\n")) {
        readSchemas.foreach { rs =>
          rs should include("doc_id")
          rs should not include "text"
        }
      }
      p should not include "CartesianProduct"
    }
  }

  test("q142: benchmark leak report matches via broadcast; the corpus side is never the build side") {
    val p = plan("q142_benchmark_leaks")
    p should include("BroadcastHashJoin")
    p should not include "CartesianProduct"
    p should not include "BroadcastNestedLoopJoin"
  }

  test("q51: cross-split contamination must NOT broadcast the holdout (it scales with the corpus)") {
    // the match stage joins posting x holdout-hashes on h: a shuffle join
    // keyed on both sides. Size stats would auto-broadcast the holdout at
    // sf0.001, so the operator pins shuffle_hash — assert the hint survives
    val p = plan("q51_split_contamination")
    withClue(p.linesIterator.filter(_.contains("Join")).mkString("\n")) {
      p should include("ShuffledHashJoin")
    }
    p should not include "CartesianProduct"
    p should not include "BroadcastNestedLoopJoin"
  }

  test("q46/q50: sketch registers max-combine map-side; no windows anywhere in the sketch path") {
    // the whole point of the relational HLL: the shuffle carries partial
    // maxes (<= groups x m rows), never raw values — and the merge path
    // (q50) keeps that property through posexplode/re-aggregate
    Seq("q46_approx_distinct", "q50_sketch_merge").foreach { name =>
      val p = plan(name)
      withClue(s"$name:") {
        p should include("partial_max")
        p should not include "Window"
      }
    }
  }

  test("q42: packing's corpus-wide windows are bucket-partitioned (no global corpus sort)") {
    // two windows exist: the corpus one partitioned by bucket, and the
    // bucket-offset one whose frame is the per-bucket AGGREGATE (one row
    // per bucket). The aggregate must sit below the unpartitioned window,
    // so every unpartitioned Sort covers only aggregated bucket totals.
    val p = plan("q42_pack_chunks")
    p should include("Window")
    // the corpus-side window shuffles by bucket, never into one partition:
    p should include("hashpartitioning(bucket")
  }

  test("whole-stage codegen covers the scan->project pipelines (native expressions fuse)") {
    // the native expressions must not break codegen: fingerprinting
    // (PolyHash) and quality metrics stay inside codegen stages (formatted
    // explain tags fused operators with "[codegen id : N]")
    plan("q22_fingerprint") should include("[codegen id :")
    plan("q20_text_quality") should include("[codegen id :")
  }

  test("q54: sessionization rides ONE user_id shuffle (windows + rollup share it)") {
    // lag, the running session count, and the (user, session) aggregate
    // all cluster by user_id — one Exchange, reused down the plan
    val p = plan("q54_sessionize")
    exchangeCount(p) shouldBe 1
    p should include("hashpartitioning(user_id")
  }

  test("q55/q56: sketch and Bloom sides broadcast — the corpus side never shuffles to meet them") {
    Seq("q55_token_freq_cms", "q56_bloom_contamination").foreach { name =>
      val p = plan(name)
      withClue(s"$name:") {
        p should include("BroadcastHashJoin")
        p should not include "SortMergeJoin"
      }
    }
  }

  test("q57/q58: rollup and pivot are each ONE combinable aggregate — single shuffle, no join") {
    Seq("q57_rollup_report", "q58_pivot_event_counts").foreach { name =>
      val p = plan(name)
      withClue(s"$name:") {
        exchangeCount(p) shouldBe 1
        p should not include "Join"
        p should include("partial_")        // map-side combine before the shuffle
      }
    }
  }

  test("q59: temperature mix never windows or sorts the corpus; membership is row-local") {
    val p = plan("q59_temperature_mix")
    p should not include "Window"
    p should not include "SortMergeJoin"
    p should include("BroadcastHashJoin")   // per-category rates broadcast back
  }

  test("q60/q61: chunking and collapse are row-local — zero shuffles, codegen-fused") {
    Seq("q60_sliding_chunks", "q61_collapse_repeats").foreach { name =>
      val p = plan(name)
      withClue(s"$name:") {
        p should not include "Exchange"
        p should include("[codegen id :")
      }
    }
  }

  test("q64: decontamination is a broadcast anti join — the corpus never shuffles to drop bad ids") {
    val p = plan("q64_decontaminate")
    p should include("BroadcastHashJoin")
    p should include("LeftAnti")
    p should not include "SortMergeJoin"
  }

  test("q65: the fact table collapses to a per-day aggregate BEFORE any window") {
    // the only unpartitioned window runs over calendar-day rows
    // (thousands), never order rows — the same tiny-frame argument as
    // packing's bucket offsets. The date-spine densification joins two
    // DAY-level frames (spine x daily rollup) — broadcast, never a sort
    // of anything order-sized
    val p = plan("q65_revenue_trend")
    p should include("partial_sum")      // map-side combine of the daily rollup
    p should include("Window")
    p should not include "SortMergeJoin"
  }

  test("q105: the epoch shuffle ranks within buckets — no corpus-sized window partition") {
    // the only unpartitioned window runs over the BUCKET TOTALS
    // (hashBuckets rows); the corpus-sized rank is partitioned by bucket,
    // and the offsets come back as a broadcast, never a shuffle join
    val p = plan("q105_epoch_shuffle")
    p should include("partial_count")          // bucket totals combine map-side
    p should include("BroadcastHashJoin")      // offsets join is broadcast
    p should not include "SortMergeJoin"
  }

  test("q109/q110: the pinned-ln series runs on distinct domains; constants come back broadcast") {
    // the 62-arm ln CASE chains must sit ABOVE an aggregate (distinct
    // words / (source, word) pairs), never on per-token rows, and the
    // one-row ln(N) constants re-enter as broadcasts, not shuffle joins
    Seq("q109_source_kl", "q110_tfidf_terms").foreach { q =>
      val p = plan(q)
      withClue(s"$q:") {
        p should include("partial_count")      // token counts combine map-side
        p should include("BroadcastExchange")  // one-row constants broadcast
        p should not include "SortMergeJoin"   // word-key joins stay hash/broadcast at this scale
      }
    }
  }

  test("q111: PQ scans codes against broadcast codebook and distance tables — vectors never shuffle post-encode") {
    val p = plan("q111_knn_pq")
    p should include("BroadcastExchange")      // codebook + ADC distance table
    // encoding's argmin is an aggregate (map-side combining), not a window
    p should include("partial_min_by")
    p should not include "SortMergeJoin"
    p should not include "CartesianProduct"
  }

  test("q112: PMI lns run per distinct bigram/word; top-k is TakeOrdered, not a global sort") {
    val p = plan("q112_pmi_collocations")
    p should include("TakeOrderedAndProject")
    p should include("partial_count")
    p should not include "CartesianProduct"
  }

  test("q118: the Gopher rule bundle is row-local — zero exchanges") {
    exchangeCount(plan("q118_gopher_rules")) shouldBe 0
  }

  test("q124: the C4 cleaning bundle is row-local — zero exchanges") {
    exchangeCount(plan("q124_c4_rules")) shouldBe 0
  }

  test("q126: perplexity tiers window the bounded histogram BY LANGUAGE; no corpus window, no pair join") {
    // the threshold windows shuffle by lang over millinat BINS (the
    // corpus collapsed first — partial_count proves map-side combine),
    // and docs meet their tier on the (lang, bin) key
    val p = plan("q126_perplexity_buckets")
    p should include("partial_count")
    p should include("Window")
    p should include("hashpartitioning(lang")
    p should not include "CartesianProduct"
  }

  test("q127: fuzzy contamination matches the benchmark via broadcast; no pairwise blowup") {
    val p = plan("q127_fuzzy_contamination")
    p should include("BroadcastExchange")       // bench buckets + bench sets
    p should not include "CartesianProduct"
    p should not include "BroadcastNestedLoopJoin"
  }

  test("q128: duplication profile is postings + df count — combinable aggregates, keyed joins only") {
    val p = plan("q128_duplication_profile")
    p should include("partial_count")           // df counts combine map-side
    p should not include "Window"               // no corpus window anywhere
    p should not include "CartesianProduct"
  }

  test("q129: token entropy rides content-keyed aggregates — no windows, no joins beyond the doc spine") {
    val p = plan("q129_token_entropy")
    p should include("partial_count")
    p should not include "Window"
    p should not include "CartesianProduct"
    p should not include "BroadcastNestedLoopJoin"
  }

  test("q150: profile rides combinable aggregates — one-row stats pass + keyed posting, no window") {
    val p = plan("q150_profile")
    p should include("partial_count") // map-side partials on both passes
    p should not include "Window"
    p should not include "CartesianProduct"
    p should not include "BroadcastNestedLoopJoin"
  }

  test("q152: trigram joins stay keyed on gram strings; all ln math on distinct-gram domains") {
    val p = plan("q152_trigram_surprisal")
    p should include("partial_count")
    p should not include "Window"
    p should not include "CartesianProduct"
    // exactly the sanctioned one-row floor-constant broadcast — the gram
    // joins themselves must stay hash joins (count the numbered operator
    // headers; the tree section repeats each name once more)
    p.linesIterator.count(
      _.matches("""\(\d+\) BroadcastNestedLoopJoin.*""")) shouldBe 1
  }

  test("q114: PQ rerank joins stay keyed — no pair blowup re-introduced by the rerank stage") {
    val p = plan("q114_knn_pq_reranked")
    p should include("BroadcastExchange")
    p should not include "CartesianProduct"
    // the ONE nested-loop shape is the fused ADC scan's broadcast
    // query-map cross (|queries| rows, bounded m x K map each); the
    // exact-rerank join back to the vectors must stay a keyed hash or
    // merge join — a second BNLJ would mean the rerank re-introduced the
    // pair blowup
    p.linesIterator.count(
      _.matches("""\(\d+\) BroadcastNestedLoopJoin.*""")) shouldBe 1
    (p.contains("BroadcastHashJoin") || p.contains("SortMergeJoin") ||
      p.contains("ShuffledHashJoin")) shouldBe true
  }

  test("q94: the corpus collapses to the log-bucket histogram BEFORE any window") {
    // the window's frame is the bin-capped bucket histogram — map-side
    // combine shows the aggregate sits below the window, and the window
    // shuffles by the group key, never into one corpus-sized partition
    val p = plan("q94_logbucket_profile")
    p should include("partial_count")
    p should include("Window")
    p should include("hashpartitioning(event_type")
    p should not include "SortMergeJoin"
  }

  test("q66: grouped top-k windows by the group key, one exchange") {
    val p = plan("q66_topk_per_group")
    exchangeCount(p) shouldBe 1
    p should include("hashpartitioning(lang")
  }

  test("q75/q76/q77: the row-local curation ops never shuffle — zero exchanges") {
    Seq("q75_pii_redact", "q76_epoch_mix", "q77_truncate_budget").foreach { name =>
      val p = plan(name)
      withClue(s"$name:") {
        exchangeCount(p) shouldBe 0
        p should include("codegen id")
      }
    }
  }

  test("q74: segment keeper windows by the SEGMENT key (uniform by content, never by doc)") {
    val p = plan("q74_segment_dedup")
    p should include("hashpartitioning(seg")
    // the rebuild joins back on the doc id as a real hash/merge join
    (p.contains("SortMergeJoin") || p.contains("ShuffledHashJoin") ||
      p.contains("BroadcastHashJoin")) shouldBe true
  }

  test("q78: merged-vocab top-k is TakeOrdered over the aggregate, never a global sort") {
    val p = plan("q78_vocab_merge")
    p should include("TakeOrderedAndProject")
  }

  test("q79: winsor thresholds broadcast back to the corpus (bounded histogram side)") {
    val p = plan("q79_winsorize")
    p should include("BroadcastHashJoin")
  }

  test("q85: nearest join is the union-sort formulation — windows, NO join operator") {
    val p = plan("q85_nearest_join")
    p should include("Window")
    p should not include "Join" // no range-join fan-out at any history depth
    // both window passes ride the same user_id partitioning
    p should include("hashpartitioning(user_id")
  }

  test("q80: the stored segment state meets the shard as a hash/merge join, never pairwise") {
    val p = plan("q80_segment_dedup_incremental")
    (p.contains("SortMergeJoin") || p.contains("ShuffledHashJoin") ||
      p.contains("BroadcastHashJoin")) shouldBe true
    p should include("LeftAnti")
  }

  test("q87: standardize broadcasts per-group moments; the corpus is never windowed or sorted") {
    val p = plan("q87_standardize")
    p should include("BroadcastHashJoin")
    p should not include "Window"
  }

  test("q88: bigram top-k is TakeOrdered over a combinable aggregate") {
    val p = plan("q88_bigram_topk")
    p should include("TakeOrderedAndProject")
    exchangeCount(p) shouldBe 1
  }
}
