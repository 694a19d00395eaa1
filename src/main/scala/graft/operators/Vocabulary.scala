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

  /** (token, tf, df) for every token: tf = total occurrences across the
    * corpus, df = number of documents containing it.
    */
  def tokenStats(docs: DataFrame, textCol: String = "text"): DataFrame = {
    val toks = tokens(col(textCol))
    val tf = docs.select(explode(toks).as("token"))
      .groupBy(col("token")).agg(count(lit(1)).as("tf"))
    val df = docs.select(explode(array_distinct(toks)).as("token"))
      .groupBy(col("token")).agg(count(lit(1)).as("df"))
    tf.join(df, "token")
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
    */
  def tfIdf(docs: DataFrame, idCol: String = "doc_id",
            textCol: String = "text"): DataFrame = {
    val n = docs.count()
    val perDoc = docs
      .select(col(idCol).as("doc_id"), explode(tokens(col(textCol))).as("token"))
      .groupBy(col("doc_id"), col("token")).agg(count(lit(1)).as("tf"))
    val df = docs.select(explode(array_distinct(tokens(col(textCol)))).as("token"))
      .groupBy(col("token")).agg(count(lit(1)).as("df"))
    perDoc.join(broadcast(df), "token")
      .withColumn("tfidf", col("tf") * log(lit(n.toDouble) / col("df")))
      .select(col("doc_id"), col("token"), col("tf"), col("df"), col("tfidf"))
  }
}
