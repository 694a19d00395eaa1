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
  * ==Incremental runs==
  *
  * A real 100 TB pipeline does not re-shingle yesterday's corpus when
  * today's shard lands. The state functions split the pipeline at the
  * text boundary:
  *
  *   - [[CorpusState]] — everything ever derived FROM TEXT, per doc:
  *     metadata (n_tokens, quality_score, content_bucket — a few dozen
  *     bytes/doc) + shingle-hash sets and MinHash signatures + verified
  *     near-dup pairs. Persist it as three parquet tables; new shards
  *     APPEND.
  *   - [[buildState]] runs the text stages over a corpus/shard;
  *     [[incrementState]] runs them over ONLY a new shard, then derives
  *     the shard's pairs against stored-plus-new signatures
  *     ([[Dedup.lshPairsFromSignatures]]) — the union of stored and new
  *     pairs equals the full-corpus pair set exactly.
  *   - [[prepareFromState]] re-runs the METADATA stages (components,
  *     gate, rebalance, pack) over the combined state. These recompute
  *     globally by design: the quantile threshold, per-language counts,
  *     and chunk offsets are corpus-wide statistics, so appending
  *     yesterday's packed output would silently freeze yesterday's
  *     threshold. They are also orders of magnitude cheaper — (id, label)
  *     and histogram rows, never text.
  *
  * q49 pins incremental == full: buildState(old) -> incrementState(new)
  * -> prepareFromState hash-matches the one-shot q48 oracle over
  * old ∪ new.
  *
  * Scale knobs (all surfaced on the `corpus-prep` CLI):
  *  - `bucketWidth` — packing's coarse-bucket size in ids. The output is
  *    bucketWidth-INDEPENDENT (PackingSpec pins this); the knob only sets
  *    how many `(bucket, offset)` rows the packing stage broadcasts
  *    (~ id-range/bucketWidth) and how many docs a per-bucket window task
  *    holds (~ bucketWidth). Size it so the densest id range fits a task
  *    and the broadcast stays small: ~1e6 at 10^10-doc scale — NOT a tiny
  *    value like 64, which would broadcast 10^8+ rows and OOM the driver.
  *  - `gateStorage` — persist level for the quality-gate's double
  *    consumption of the deduped metadata (threshold pass + filter pass).
  *    StorageLevel.NONE trades recomputation for zero cache residency.
  */
object CorpusPipeline {

  /** content-bucket resolution shared by the full and incremental paths —
    * must match the `buckets` the rebalance stage divides by
    */
  val RebalanceBuckets = 10000

  /** Per-doc derived state: `meta(doc_id, lang, n_tokens, quality_score,
    * content_bucket)` for every doc, `signatures(id, hashes, sig)` for
    * docs with >= 1 shingle, `pairs(id_a, id_b)` verified near-dup pairs.
    */
  case class CorpusState(meta: DataFrame, signatures: DataFrame, pairs: DataFrame)

  /** The text-derived metadata row per doc — the only place the metric
    * set is defined, so the full and incremental paths cannot drift.
    */
  private def metaOf(docs: DataFrame): DataFrame = {
    val m = qualityMetrics(col("text")).toMap
    docs.select(
      col("doc_id"), col("lang"),
      m("n_tokens").as("n_tokens"),
      m("quality_score").as("quality_score"),
      Sampling.contentBucket(col("text"), RebalanceBuckets).as("content_bucket"))
  }

  /** Full text-stage pass over a corpus (or the FIRST shard). */
  def buildState(docs: DataFrame,
                 storage: StorageLevel = StorageLevel.MEMORY_AND_DISK): CorpusState = {
    val sigs = Caching.maybePersist(Dedup.signatures(docs), storage)
    CorpusState(metaOf(docs), sigs,
      Dedup.lshPairsAmong(sigs).select(col("id_a"), col("id_b")))
  }

  /** The state INCREMENT a new shard contributes: text stages over ONLY
    * `newDocs`, plus the shard's near-dup pairs against stored ∪ new
    * signatures. A persistent deployment APPENDS exactly these three
    * frames to its state tables (what the `corpus-prep --state-path` CLI
    * does); [[incrementState]] unions them in-memory.
    */
  def shardIncrement(state: CorpusState, newDocs: DataFrame,
                     storage: StorageLevel = StorageLevel.MEMORY_AND_DISK): CorpusState = {
    val newSigs = Caching.maybePersist(Dedup.signatures(newDocs), storage)
    val newPairs = Dedup
      .lshPairsFromSignatures(newSigs, state.signatures.unionByName(newSigs))
      .select(col("id_a"), col("id_b"))
    CorpusState(metaOf(newDocs), newSigs, newPairs)
  }

  /** Text stages over ONLY `newDocs`; the returned state covers
    * old ∪ new.
    */
  def incrementState(state: CorpusState, newDocs: DataFrame,
                     storage: StorageLevel = StorageLevel.MEMORY_AND_DISK): CorpusState = {
    val inc = shardIncrement(state, newDocs, storage)
    CorpusState(
      state.meta.unionByName(inc.meta),
      state.signatures.unionByName(inc.signatures),
      state.pairs.unionByName(inc.pairs))
  }

  /** Repair a PERSISTED state after partial appends: the CLI writes the
    * three tables in the order pairs -> signatures -> meta, making meta
    * the commit anchor — so a crash mid-append leaves signature/pair rows
    * whose doc ids have no meta row yet, and a retry of the same shard
    * can then duplicate them. This filters both tables to meta-registered
    * ids (both endpoints, for pairs) and drops exact duplicates, so a
    * partial append degrades to "shard not yet added" and a retry is
    * idempotent. Joins and dedups run at metadata scale (short rows, the
    * same keys the pipeline already shuffles on); in-memory states built
    * by [[buildState]]/[[incrementState]] are consistent by construction
    * and don't need it.
    */
  def normalizeState(st: CorpusState): CorpusState = {
    val meta = st.meta.dropDuplicates("doc_id")
    val ids = meta.select(col("doc_id"))
    CorpusState(
      meta,
      st.signatures.dropDuplicates("id")
        .join(ids.withColumnRenamed("doc_id", "id"), Seq("id"), "left_semi"),
      st.pairs.dropDuplicates("id_a", "id_b")
        .join(ids.withColumnRenamed("doc_id", "id_a"), Seq("id_a"), "left_semi")
        .join(ids.withColumnRenamed("doc_id", "id_b"), Seq("id_b"), "left_semi"))
  }

  /** Metadata stages over a (combined) state: components -> keepers ->
    * gate -> rebalance -> pack. No text is touched.
    */
  def prepareFromState(state: CorpusState, quota: Long = 100L, budget: Long = 512L,
                       qNum: Long = 1L, qDen: Long = 4L,
                       bucketWidth: Long = 4096L,
                       gateStorage: StorageLevel = StorageLevel.MEMORY_AND_DISK): DataFrame = {
    val keepers = Dedup
      .assignClusters(state.meta.select(col("doc_id")), state.pairs)
      .filter(col("is_dup") === 0).select(col("doc_id"))
    gateBalancePack(state.meta.join(keepers, "doc_id"),
      quota, budget, qNum, qDen, bucketWidth, gateStorage)
  }

  /** One-shot pipeline over a full corpus. Keeper join FIRST, metrics
    * second: the TextStats tokenization kernel runs only over dedup
    * survivors, not over the duplicates the previous stage just marked
    * for discard (the threshold below is computed on the deduped
    * distribution either way — output is identical, and identical to the
    * state-path formulation).
    */
  def prepare(docs: DataFrame, quota: Long = 100L, budget: Long = 512L,
              qNum: Long = 1L, qDen: Long = 4L,
              bucketWidth: Long = 4096L,
              gateStorage: StorageLevel = StorageLevel.MEMORY_AND_DISK): DataFrame = {
    val keepers = Dedup.minhashKeepers(docs)
    gateBalancePack(metaOf(docs.join(keepers, "doc_id")),
      quota, budget, qNum, qDen, bucketWidth, gateStorage)
  }

  /** The shared metadata-stage tail: gate the deduped metadata at the
    * qNum/qDen quality quantile, rebalance per language via the
    * precomputed content bucket, pack survivors into budget-token chunks.
    * Text never enters this subtree (the gate persist holds only
    * metadata rows).
    *
    * `balanced` is persisted under the same `gateStorage` knob: it feeds
    * BOTH the packing branch and the final projection/join — without the
    * persist each branch re-executes the whole gate+rebalance subtree
    * (measured 103 -> 65 Spark jobs / 10.6 -> 6.4 s on the q48 contract
    * at sf0.1). Rows are survivor metadata only, bounded by the rebalance
    * quota per language.
    */
  private def gateBalancePack(dedupedMeta: DataFrame, quota: Long, budget: Long,
                              qNum: Long, qDen: Long, bucketWidth: Long,
                              gateStorage: StorageLevel): DataFrame = {
    val gated = Quantiles
      .quantileGate(dedupedMeta, "quality_score", qNum, qDen, precision = 6,
        storage = gateStorage)
      .drop("threshold")
    val balanced = Caching.maybePersist(
      Sampling.rebalanceToQuotaOnBucket(
        gated, "lang", "content_bucket", quota, RebalanceBuckets),
      gateStorage)
    val packed = Packing.packChunks(
      balanced.select(col("doc_id"), col("n_tokens")),
      budget = budget, bucketWidth = bucketWidth)
    balanced.select(col("doc_id"), col("lang"), col("quality_score"))
      .join(packed.select(col("doc_id"), col("n_tokens"), col("chunk_id")), "doc_id")
  }
}
