package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions.shingleHashes

/** Benchmark contamination check: which training documents share verbatim
  * n-grams with a held-out evaluation set?
  *
  * Training on text that overlaps the benchmark inflates eval scores, so a
  * training-data pipeline runs this gate before every release. For each
  * training doc the operator reports how many of its distinct n-gram
  * shingles also occur anywhere in the benchmark corpus
  * (`n_shared`), the doc's total distinct shingles (`n_shingles`), the
  * ratio, and a binary `contaminated` flag (any overlap at all — the
  * conservative cut used in practice; gate on `share_ratio` for a softer
  * policy).
  *
  * Scale shape — this is NOT the near-dup self-join: the benchmark is the
  * small side by construction (eval sets are MBs; the crawl is TBs), so
  * its distinct shingle-hash set broadcasts, and the training side needs
  * only a map-side-combinable per-doc aggregate after a broadcast semi
  * match — the 100 TB side never shuffles its shingles anywhere. Shingle
  * hashing itself is the same row-local native kernel the dedup family
  * uses ([[graft.functions.ShingleHashes]]).
  *
  * Docs with fewer than `n` tokens have no shingles and are excluded (no
  * signal to test — mirroring the dedup operators' population rule).
  */
object Contamination {

  /** `broadcastReference = false` switches the match stage from a
    * broadcast join to a plain shuffle hash join on the shingle hash —
    * for reference sides too big to broadcast (e.g. a whole held-out
    * SPLIT in [[crossSplitCheck]], ~20% of the corpus, vs an MB-scale
    * benchmark suite). Both sides then shuffle only short
    * (hash[, doc_id]) rows, keyed on the same column.
    */
  def check(train: DataFrame, benchmark: DataFrame, n: Int = 3,
            idCol: String = "doc_id", textCol: String = "text",
            broadcastReference: Boolean = true): DataFrame = {
    val sets = train.select(col(idCol).as("id"), shingleHashes(col(textCol), n).as("hashes"))
      .filter(size(col("hashes")) > 0)
    val benchHashes = benchmark
      .select(explode(shingleHashes(col(textCol), n)).as("h")).distinct()
    // the exploded training rows carry only (id, h) through the hot
    // match stage; per-doc totals are recomputed from `sets`
    val posting = sets.select(col("id"), explode(col("hashes")).as("h"))
    // shingleHashes emits DISTINCT hashes per doc, so count(*) after the
    // match is the per-doc count of distinct shared shingles
    // non-broadcast path: pin a shuffled hash join (the reference side
    // scales with the corpus, so size stats must never tempt the planner
    // into building a broadcast of it; the hinted side is the build side)
    val matchSide =
      if (broadcastReference) broadcast(benchHashes)
      else benchHashes.hint("shuffle_hash")
    val shared = posting.join(matchSide, "h")
      .groupBy(col("id")).agg(count(lit(1)).as("n_shared"))
    sets.join(shared, Seq("id"), "left")
      .withColumn("n_shared", coalesce(col("n_shared"), lit(0L)))
      .select(
        col("id").as(idCol),
        size(col("hashes")).cast("long").as("n_shingles"),
        col("n_shared"),
        round(col("n_shared") / size(col("hashes")), 6).as("share_ratio"),
        (col("n_shared") > 0).cast("int").as("contaminated"))
  }

  /** [[check]]'s REVERSE direction: the per-BENCHMARK-doc leak report —
    * the view an eval OWNER needs ("which of my items are compromised,
    * how badly, and by whom") where [[check]] answers the corpus owner's
    * question ("which training docs must go"). One row per benchmark doc
    * with >= 1 shingle, clean items included:
    * (idCol, n_shingles, n_leaked distinct shingles found ANYWHERE in
    * training, leak_ratio, n_train_docs sharing >= 1 shingle,
    * top_offender_id / top_offender_shared — the training doc sharing
    * the most of this item's shingles, ties to the lowest id; NULL/0 on
    * clean items).
    *
    * Scale shape: the training corpus contributes (id, h) posting rows
    * into a keyed join against the (small, broadcast by default)
    * benchmark posting — the same orientation knob as [[check]]; per-pair
    * counts combine map-side and the offender argmax is one max_by
    * struct, never a per-item sort.
    */
  def benchmarkLeakReport(train: DataFrame, benchmark: DataFrame, n: Int = 3,
                          idCol: String = "doc_id", textCol: String = "text",
                          broadcastReference: Boolean = true,
                          storage: org.apache.spark.storage.StorageLevel =
                            org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK): DataFrame = {
    // bSets feeds the match stage AND the final item roster; the corpus
    // side streams once into `matched` below (pinned there) and needs no
    // pin of its own
    val bSets = Caching.maybePersist(benchmark
      .select(col(idCol).as("bid"), shingleHashes(col(textCol), n).as("hashes"))
      .filter(size(col("hashes")) > 0), storage)
    val bPost = bSets.select(col("bid"), explode(col("hashes")).as("h"))
    val tPost = train
      .select(col(idCol).as("tid"), explode(shingleHashes(col(textCol), n)).as("h"))
    def matchSide(df: DataFrame): DataFrame =
      if (broadcastReference) broadcast(df) else df.hint("shuffle_hash")
    // ONE map-side broadcast join feeds both readings: the corpus side
    // streams past the (small) benchmark posting exactly once, and every
    // aggregate below runs over matched (leak-mass-sized) rows only — a
    // corpus-wide distinct before the join would cost a global dedup
    // pass for the same answer
    val matched = Caching.maybePersist(
      tPost.join(matchSide(bPost), "h")
        .select(col("bid"), col("tid"), col("h")), storage)
    // per (bench item, train doc): distinct shared shingles (both sides
    // emit distinct hashes per doc, so count(*) counts distinct shares)
    val pairShared = matched
      .groupBy(col("bid"), col("tid")).agg(count(lit(1)).as("n_shared"))
    val offenders = pairShared.groupBy(col("bid"))
      .agg(count(lit(1)).as("n_train_docs"),
        max_by(struct(col("tid"), col("n_shared")),
          struct(col("n_shared"), -col("tid"))).as("__top"))
    // distinct leaked shingles per item, off the matched rows
    val leaked = matched.select(col("bid"), col("h")).distinct()
      .groupBy(col("bid")).agg(count(lit(1)).as("n_leaked"))
    bSets
      .join(leaked, Seq("bid"), "left")
      .join(offenders, Seq("bid"), "left")
      .select(col("bid").as(idCol),
        size(col("hashes")).cast("long").as("n_shingles"),
        coalesce(col("n_leaked"), lit(0L)).as("n_leaked"),
        round(coalesce(col("n_leaked"), lit(0L)) / size(col("hashes")), 6).as("leak_ratio"),
        coalesce(col("n_train_docs"), lit(0L)).as("n_train_docs"),
        col("__top.tid").as("top_offender_id"),
        coalesce(col("__top.n_shared"), lit(0L)).as("top_offender_shared"))
  }

  /** VERBATIM-SUBSTRING contamination: which training docs contain a
    * literal character run of >= `minLen` from a benchmark document? The
    * character-granular complement of [[check]]: token-shingle overlap
    * needs the quote to survive tokenization and scores it relative to
    * the DOC's shingle count (one long verbatim answer string inside a
    * long page barely moves share_ratio), where this detects the quoted
    * passage itself — the canary-string / eval-answer leak audit.
    *
    * Same winnowing machinery as [[Dedup.substringPairs]], pointed across
    * two frames: both sides emit anchor fingerprints row-locally (the
    * native kernel; text never shuffles), candidates bucket-join on the
    * anchor hash — benchmark side broadcast by default, `.hint("shuffle_
    * hash")` otherwise, mirroring [[check]]'s knob — and each candidate
    * verifies with the O(extent) [[graft.functions.CommonExtent]] kernel.
    * Output: one row per CONTAMINATED training doc — (idCol, n_bench_docs
    * hit, n_anchors verified, max_extent chars) — an empty result is a
    * clean corpus.
    *
    * The winnowing guarantee is directional and exact: any shared run of
    * length >= minLen selects a common anchor hash on both sides, so no
    * contaminated doc escapes; extent verification kills hash collisions.
    *
    * Hot-bucket note: unlike [[Dedup.substringPairs]]' self-join this
    * cross-join is LINEAR in train matches per hash (benchmark side is
    * small), so the cap defaults OFF (`maxBucket = 0`) to keep the
    * audit's no-escape guarantee. For a boilerplate-heavy corpus where a
    * benchmark doc shares chrome with millions of training pages, set
    * `maxBucket > 0`: train anchor hashes above that corpus frequency
    * are dropped before the join — bounded work, and every dropped match
    * is by construction a passage so common in training data that
    * flagging it as "contamination" is noise. A capped run is a triage
    * pass; re-run uncapped on the survivors' shards for the exact audit.
    */
  def substringContamination(train: DataFrame, benchmark: DataFrame,
                             minLen: Int = 48, k: Int = 16,
                             idCol: String = "doc_id", textCol: String = "text",
                             broadcastReference: Boolean = true,
                             maxBucket: Int = 0): DataFrame =
    substringContaminationAgainst(train,
      benchmarkAnchors(benchmark, minLen, k, idCol, textCol),
      minLen, k, idCol, textCol, broadcastReference, maxBucket)

  /** The benchmark side of [[substringContamination]] as a standalone
    * STATE table: (be_id, __be_t, h, be_pos) anchor rows. Compute once,
    * persist (or write to parquet) and reuse across audits — the
    * streaming gate fingerprints the reference exactly once this way
    * instead of once per micro-batch
    * ([[graft.streaming.EventStream.contaminationGateWriter]]).
    */
  def benchmarkAnchors(benchmark: DataFrame, minLen: Int = 48, k: Int = 16,
                       idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    require(k >= 2, s"k-gram width must be >= 2: got $k")
    require(minLen > k, s"minLen must exceed the k-gram width $k: got $minLen")
    benchmark
      .select(col(idCol).as("be_id"), col(textCol).as("__be_t"),
        explode(graft.functions.WinnowFingerprints
          .winnowFingerprints(col(textCol), k, minLen - k + 1)).as("fp"))
      .select(col("be_id"), col("__be_t"), col("fp.h").as("h"),
        col("fp.pos").as("be_pos"))
  }

  /** [[substringContamination]] against a PRE-FINGERPRINTED benchmark
    * ([[benchmarkAnchors]] output — parameters must match). Same result,
    * same plan; the split exists so the reference side can be computed
    * once and reused (batch re-audits, per-micro-batch streaming).
    */
  def substringContaminationAgainst(train: DataFrame, beAnchors: DataFrame,
                                    minLen: Int = 48, k: Int = 16,
                                    idCol: String = "doc_id", textCol: String = "text",
                                    broadcastReference: Boolean = true,
                                    maxBucket: Int = 0): DataFrame = {
    require(k >= 2, s"k-gram width must be >= 2: got $k")
    require(minLen > k, s"minLen must exceed the k-gram width $k: got $minLen")
    val w = minLen - k + 1
    // train side: short (id, h, pos) anchor rows only — its text joins
    // back per CANDIDATE, never per anchor; benchmark text rides the
    // (small, usually broadcast) reference side
    val tr0 = train
      .select(col(idCol).as("tr_id"),
        explode(graft.functions.WinnowFingerprints
          .winnowFingerprints(col(textCol), k, w)).as("fp"))
      .select(col("tr_id"), col("fp.h").as("h"), col("fp.pos").as("tr_pos"))
    val tr =
      if (maxBucket <= 0) tr0
      else {
        // persisted: the capped path reads the train fingerprints twice
        // (frequency count + anti-join) — never re-fingerprint the corpus
        val trP = Caching.maybePersist(tr0,
          org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        val hot = trP.groupBy(col("h")).agg(count(lit(1)).as("__n"))
          .filter(col("__n") > maxBucket).select(col("h"))
        trP.join(hot, Seq("h"), "left_anti")
      }
    val matchSide = if (broadcastReference) broadcast(beAnchors) else beAnchors.hint("shuffle_hash")
    tr.join(matchSide, "h")
      .join(train.select(col(idCol).as("tr_id"), col(textCol).as("__tr_t")), "tr_id")
      .withColumn("__extent", graft.functions.CommonExtent.commonExtent(
        col("__tr_t"), col("tr_pos"), col("__be_t"), col("be_pos"), k))
      .filter(col("__extent") >= minLen)
      .groupBy(col("tr_id"))
      .agg(
        countDistinct(col("be_id")).as("n_bench_docs"),
        count(lit(1)).as("n_anchors"),
        max(col("__extent")).cast("long").as("max_extent"))
      .select(col("tr_id").as(idCol), col("n_bench_docs"), col("n_anchors"),
        col("max_extent"))
  }

  /** FUZZY (near-duplicate) contamination: which training documents are
    * MinHash-LSH near-duplicates of a BENCHMARK document? The Jaccard
    * complement of [[check]]: n-gram overlap counts shared shingles (one
    * quoted sentence flags), where this detects whole-document similarity
    * — a lightly-paraphrased eval page that shares only a fraction of its
    * exact shingles but most of its content. The standard pre-release
    * audit runs BOTH (GPT-3's 13-gram check + the fuzzy-dedup family).
    *
    * Mechanics: both corpora get the house MinHash signature (k=16, 4
    * bands of 4) over n-gram shingle hashes; train band buckets join the
    * benchmark's (broadcast by default — eval suites are MBs; the `.hint
    * ("shuffle_hash")` knob mirrors [[check]] for corpus-scaled
    * references); candidates verify with EXACT Jaccard on the full
    * shingle sets, so LSH affects only recall of candidates, never a
    * reported value. Per contaminated train doc: how many benchmark docs
    * it matches, the best (max) Jaccard, and the best-matching benchmark
    * id (ties break to the smallest id — deterministic on both engines).
    *
    * Scale shape: the 100 TB side contributes 4 short bucket rows per doc
    * map-side against a broadcast; only candidate pairs (tiny) carry
    * shingle sets into the verify; the rollup groups candidate rows, not
    * the corpus. Threshold default 0.5 — contamination wants recall, not
    * dedup's 0.8 near-identity cut.
    */
  def fuzzyContamination(train: DataFrame, benchmark: DataFrame, n: Int = 3,
                         threshold: Double = 0.5,
                         idCol: String = "doc_id", textCol: String = "text",
                         broadcastReference: Boolean = true,
                         storage: org.apache.spark.storage.StorageLevel =
                           org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK): DataFrame =
    fuzzyContaminationAgainst(train, Dedup.signatures(benchmark, n, idCol, textCol),
      n, threshold, idCol, textCol, broadcastReference, storage)

  /** [[fuzzyContamination]] against a PRE-SIGNED benchmark
    * ([[Dedup.signatures]] output — same `n`). The split exists so the
    * reference side is signed once and reused — batch re-audits, and the
    * per-micro-batch streaming gate
    * ([[graft.streaming.EventStream.fuzzyContaminationGateWriter]]), which
    * also passes `storage = NONE` (each micro-batch is a new plan; the
    * default persist would leak one cache entry per trigger).
    */
  def fuzzyContaminationAgainst(train: DataFrame, beSigs: DataFrame, n: Int = 3,
                                threshold: Double = 0.5,
                                idCol: String = "doc_id", textCol: String = "text",
                                broadcastReference: Boolean = true,
                                storage: org.apache.spark.storage.StorageLevel =
                                  org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK): DataFrame = {
    val trSigs = Dedup.signatures(train, n, idCol, textCol)
    val beBuckets = Dedup.bandBuckets(beSigs)
      .select(col("id").as("be_id"), col("band"), col("key"))
    val beMatch = if (broadcastReference) broadcast(beBuckets)
                  else beBuckets.hint("shuffle_hash")
    val candidates = Dedup.bandBuckets(trSigs)
      .join(beMatch, Seq("band", "key"))
      .select(col("id").as("tr_id"), col("be_id")).distinct()
    val beSets = beSigs.select(col("id").as("be_id"), col("hashes").as("be_hashes"))
    // persisted: the argmax tail reads it twice, and without the pin the
    // whole signature front would recompute per consumer
    val verified = Caching.maybePersist(candidates
      .join(trSigs.select(col("id").as("tr_id"), col("hashes").as("tr_hashes")), "tr_id")
      .join(if (broadcastReference) broadcast(beSets) else beSets.hint("shuffle_hash"), "be_id")
      .withColumn("jaccard", round(
        graft.functions.TextFunctions.jaccardSorted(col("tr_hashes"), col("be_hashes")), 6))
      .filter(col("jaccard") >= threshold)
      .select(col("tr_id"), col("be_id"), col("jaccard")), storage)
    val rollup = verified.groupBy(col("tr_id"))
      .agg(count(lit(1)).as("n_bench_docs"), max(col("jaccard")).as("max_jaccard"))
    verified.join(rollup, Seq("tr_id"))
      .filter(col("jaccard") === col("max_jaccard"))
      .groupBy(col("tr_id"), col("n_bench_docs"), col("max_jaccard"))
      .agg(min(col("be_id")).as("best_bench_id"))
      .select(col("tr_id").as(idCol), col("n_bench_docs"), col("max_jaccard"),
        col("best_bench_id"))
  }

  /** The leakage check every team runs AFTER splitting: which TRAIN-split
    * docs share verbatim n-grams with the val/test splits? Content-hash
    * splitting ([[Sampling.assignSplit]]) keeps byte-identical duplicates
    * in one split, but near-duplicates can still straddle — this composes
    * the split with [[check]] to measure exactly that (one row per train
    * doc with >= n tokens; `contaminated = 1` means at least one of its
    * n-grams also occurs in val or test).
    *
    * Scale shape: unlike the benchmark gate, the reference side here is a
    * constant FRACTION of the corpus, so nothing broadcasts — the match is
    * a shuffle join of (hash) rows keyed identically on both sides. Split
    * assignment itself is row-local (zero shuffle), so the whole plan has
    * exactly the two intentional wide stages (match + per-doc count).
    */
  def crossSplitCheck(docs: DataFrame, n: Int = 3,
                      idCol: String = "doc_id", textCol: String = "text",
                      trainPct: Int = 80, valPct: Int = 10): DataFrame = {
    val split = Sampling.assignSplit(docs, textCol, trainPct, valPct)
    check(
      split.filter(col("split") === "train"),
      split.filter(col("split") =!= "train"),
      n, idCol, textCol,
      broadcastReference = false)
  }
}
