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
