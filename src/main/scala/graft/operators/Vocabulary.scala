package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions.tokens

/** Corpus-level vocabulary statistics — the aggregate the per-doc text
  * metrics ([[graft.functions.TextFunctions]]) don't cover: term frequency
  * and document frequency per token, the raw material for stopword lists,
  * IDF weights, and tokenizer vocabularies.
  *
  * Scale shape: both counts are plain hash aggregates over exploded
  * tokens — map-side combinable, so the shuffle carries one partial row
  * per (partition, token), not one row per occurrence. df explodes the
  * per-doc DISTINCT token set (array_distinct is row-local), which also
  * caps a spammy document's contribution at 1 per token. Top-k is a
  * TakeOrdered over the aggregated vocabulary (vocab << corpus).
  */
object Vocabulary {

  /** token -> document frequency (number of docs containing it); the
    * per-doc distinct explode caps any one document's contribution at 1.
    */
  private def docFreq(docs: DataFrame, textCol: String): DataFrame =
    docs.select(explode(array_distinct(tokens(col(textCol)))).as("token"))
      .groupBy(col("token")).agg(count(lit(1)).as("df"))

  /** (token, tf, df) for every token: tf = total occurrences across the
    * corpus, df = number of documents containing it.
    */
  def tokenStats(docs: DataFrame, textCol: String = "text"): DataFrame = {
    val tf = docs.select(explode(tokens(col(textCol))).as("token"))
      .groupBy(col("token")).agg(count(lit(1)).as("tf"))
    tf.join(docFreq(docs, textCol), "token")
  }

  /** The k most frequent tokens by tf, ties broken by token — the
    * deterministic head of the vocabulary.
    */
  def topTokens(docs: DataFrame, k: Int, textCol: String = "text"): DataFrame =
    tokenStats(docs, textCol)
      .orderBy(col("tf").desc, col("token").asc)
      .limit(k)

  /** Per-(doc, token) TF-IDF: tf(d,t) * ln(N / df(t)). The per-doc tf
    * explode shuffles on (doc, token); the df side is the (small)
    * aggregated vocabulary, broadcast into the join.
    *
    * Deliberately NOT in the oracle contract: `ln` is a transcendental
    * whose last ulp may differ across engines' libm, so hash-exactness
    * can't be promised — VocabularySpec pins hand-computed values instead.
    * Rank/threshold consumers should round before comparing.
    *
    * Stays LAZY like every other operator: N is a 1-row count aggregate
    * broadcast into the plan, not a driver-side action at construction
    * time. The corpus is still read three ways (per-doc tf, df, N) —
    * persist `docs` first when the upstream is expensive.
    */
  def tfIdf(docs: DataFrame, idCol: String = "doc_id",
            textCol: String = "text"): DataFrame = {
    val nDocs = docs.agg(count(lit(1)).cast("double").as("__n"))
    val perDoc = docs
      .select(col(idCol).as("doc_id"), explode(tokens(col(textCol))).as("token"))
      .groupBy(col("doc_id"), col("token")).agg(count(lit(1)).as("tf"))
    perDoc.join(broadcast(docFreq(docs, textCol)), "token")
      .crossJoin(broadcast(nDocs))
      .withColumn("tfidf", col("tf") * log(col("__n") / col("df")))
      .select(col("doc_id"), col("token"), col("tf"), col("df"), col("tfidf"))
  }

  /** Per-shard token counts — the PERSISTABLE vocabulary state: one
    * (shard, token, tf) row per shard-token, built by a map-side
    * combinable aggregate over that shard alone. Per-day/per-source
    * vocabularies accumulate as appended shard rows; nothing global is
    * recomputed at ingest.
    */
  def shardCounts(docs: DataFrame, shardCol: String,
                  textCol: String = "text"): DataFrame =
    docs.select(col(shardCol).as("shard"), explode(tokens(col(textCol))).as("token"))
      .groupBy(col("shard"), col("token")).agg(count(lit(1)).as("tf"))

  /** Sum-merge sharded counts into the corpus vocabulary — count addition
    * is associative, so merge-of-shards equals the single-pass tf EXACTLY
    * (the fourth mergeable sketch, after the HLL's max, the CMS's and
    * histogram's sum — except here the "sketch" is the exact vocabulary).
    * Also reports how many shards contain each token (each shard holds at
    * most one row per token, so a row count is a shard count). Shuffle is
    * bounded by distinct (shard, token) pairs, never raw token volume.
    */
  def mergeShardCounts(shards: DataFrame): DataFrame =
    shards.groupBy(col("token"))
      .agg(sum(col("tf")).as("tf"), count(lit(1)).as("n_shards"))

  /** Per-document out-of-vocabulary rate against a reference vocabulary
    * (`vocab`: any frame with a `token` column — typically [[topTokens]]
    * of a trusted corpus): the integer-exact quality signal that stands in
    * for LM perplexity without a transcendental (gibberish, wrong-language
    * and OCR-damaged docs score high). The vocabulary broadcasts (it is
    * small by construction); the per-doc aggregate is one combinable
    * shuffle keyed by the doc id. Documents with zero tokens emit no row
    * (0/0 has no rate) — same convention as [[Packing.slidingWindows]].
    */
  def oovRate(docs: DataFrame, vocab: DataFrame, idCol: String = "doc_id",
              textCol: String = "text"): DataFrame =
    docs.select(col(idCol), explode(tokens(col(textCol))).as("token"))
      .join(broadcast(vocab.select(col("token").as("__ov_tok")).distinct()),
        col("token") === col("__ov_tok"), "left")
      .groupBy(col(idCol))
      .agg(
        count(lit(1)).as("n_tokens"),
        sum(when(col("__ov_tok").isNull, 1L).otherwise(0L)).as("n_oov"))
      .withColumn("oov_rate", round(col("n_oov") / col("n_tokens"), 6))
}
