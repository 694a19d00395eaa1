package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

import graft.functions.TextFunctions.qualityMetrics

/** The end-to-end corpus preparation pipeline a training-data team ships
  * (q48's implementation, and the `graft.App corpus-prep` subcommand):
  *
  *   1. near-dup dedup — MinHash-LSH pairs -> connected components ->
  *      keepers only ([[Dedup.minhashLshPairs]], [[Dedup.assignClusters]]);
  *   2. quality gate — keep docs at/above the q-th quantile of
  *      quality_score, with the threshold computed on the DEDUPED corpus
  *      (the distribution that matters; duplicates would weight it)
  *      ([[Quantiles.quantileGate]]);
  *   3. per-language rebalance to `quota` docs
  *      ([[Sampling.rebalanceToQuota]]);
  *   4. sequence packing of the survivors into `budget`-token chunks
  *      ([[Packing.packChunks]]).
  *
  * Output: one row per surviving doc — (doc_id, lang, quality_score,
  * n_tokens, chunk_id). Deterministic end to end: every stage is a pure
  * function of the corpus (content hashes, integer rank math, id-ordered
  * prefix sums), so reruns and the DuckDB oracle (q48) reproduce it
  * exactly.
  *
  * Scale knobs (both surfaced on the `corpus-prep` CLI):
  *  - `bucketWidth` — packing's coarse-bucket size in ids. The output is
  *    bucketWidth-INDEPENDENT (PackingSpec pins this); the knob only sets
  *    how many `(bucket, offset)` rows the packing stage broadcasts
  *    (~ id-range/bucketWidth) and how many docs a per-bucket window task
  *    holds (~ bucketWidth). Size it so the densest id range fits a task
  *    and the broadcast stays small: ~1e6 at 10^10-doc scale — NOT a tiny
  *    value like 64, which would broadcast 10^8+ rows and OOM the driver.
  *  - `gateStorage` — persist level for the quality-gate's double
  *    consumption of the deduped+scored corpus (threshold pass + filter
  *    pass). StorageLevel.NONE trades recomputation for zero cache
  *    residency.
  */
object CorpusPipeline {

  def prepare(docs: DataFrame, quota: Long = 100L, budget: Long = 512L,
              qNum: Long = 1L, qDen: Long = 4L,
              bucketWidth: Long = 4096L,
              gateStorage: StorageLevel = StorageLevel.MEMORY_AND_DISK): DataFrame = {
    val keepers = Dedup.minhashKeepers(docs)
    // keeper join FIRST, metrics second: the TextStats tokenization kernel
    // runs only over dedup survivors, not over the duplicates the previous
    // stage just marked for discard (the threshold below is computed on the
    // deduped distribution either way — output is identical)
    val deduped = docs.join(keepers, "doc_id")
      .select(
        col("doc_id") +: col("lang") +: col("text") +:
          qualityMetrics(col("text")).map { case (n, c) => c.as(n) }: _*)
      .select(col("doc_id"), col("lang"), col("text"),
        col("n_tokens"), col("quality_score"))
    val gated = Quantiles
      .quantileGate(deduped, "quality_score", qNum, qDen, precision = 6,
        storage = gateStorage)
      .drop("threshold")
    val balanced = Sampling.rebalanceToQuota(gated, "lang", "text", quota)
    val packed = Packing.packChunks(
      balanced.select(col("doc_id"), col("n_tokens")),
      budget = budget, bucketWidth = bucketWidth)
    balanced.select(col("doc_id"), col("lang"), col("quality_score"))
      .join(packed.select(col("doc_id"), col("n_tokens"), col("chunk_id")), "doc_id")
  }
}
