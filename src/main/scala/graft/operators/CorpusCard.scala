package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions

/** The corpus CARD — the one-shot dataset report a team attaches to a
  * release (datasheet-style): composition by language and source, length
  * distribution, duplication pressure, and intrinsic quality signals.
  * Every table is built from operators this library already gates
  * elsewhere; the card is the REPORT surface, so columns favor
  * readability (averages, percents) over the oracle family's exactness
  * discipline.
  *
  * Incremental form: the card's sufficient statistics ([[CardState]])
  * are per-doc rows — composition/length/quality metrics are row-local,
  * and duplication's shingle postings union-merge exactly
  * ([[Dedup.shinglePostings]]) — so shards APPEND without re-reading
  * stored corpora and the card read off merged state equals the
  * one-shot build bit-for-bit (the klState/q115 argument; `build` IS
  * `buildFromState(buildState(docs))`, one code path).
  *
  * Scale shape: one metadata pass (row-local metrics + combinable
  * aggregates) plus the [[Dedup.duplicationProfile]] posting pass —
  * nothing here is heavier than the audits it summarizes.
  */
object CorpusCard {

  /** Appendable sufficient statistics: `meta` is one row per doc
    * (id, lang, source, n_tokens, n_chars, entropy_nats, ttr);
    * `postings` is [[Dedup.shinglePostings]]' (id, h).
    */
  case class CardState(meta: DataFrame, postings: DataFrame)

  /** Per-doc state off a corpus (or a shard — rows are independent). */
  def buildState(docs: DataFrame, idCol: String = "doc_id",
                 textCol: String = "text", n: Int = 3): CardState = {
    def optCol(name: String): org.apache.spark.sql.Column =
      if (docs.columns.contains(name)) coalesce(col(name).cast("string"), lit("??"))
      else lit("??")
    val base = docs.select(col(idCol),
      optCol("lang").as("lang"),
      optCol("source").as("source"),
      size(TextFunctions.tokens(col(textCol))).cast("long").as("n_tokens"),
      length(col(textCol)).cast("long").as("n_chars"))
    val ent = LmScore.tokenEntropy(docs.select(col(idCol), col(textCol)),
        idCol, textCol)
      .select(col(idCol), col("entropy_nats"), col("ttr"))
    CardState(
      base.join(ent, Seq(idCol)),
      Dedup.shinglePostings(docs, n, idCol, textCol))
  }

  /** Fold a new shard into stored state — only the shard computes. */
  def incrementState(state: CardState, shard: DataFrame,
                     idCol: String = "doc_id", textCol: String = "text",
                     n: Int = 3): CardState = {
    val s = buildState(shard, idCol, textCol, n)
    CardState(state.meta.unionByName(s.meta),
      state.postings.unionByName(s.postings))
  }

  /** Crash/retry hygiene for PERSISTED state (the corpus-prep commit-
    * anchor discipline): meta is the append commit anchor (written
    * LAST), so posting rows from a crashed partial append — or
    * duplicates from its retry — are discarded until their doc's meta
    * lands; duplicate meta rows from a retried append collapse to one.
    * A pure in-memory [[incrementState]] chain never needs this.
    */
  def normalizeState(state: CardState, idCol: String = "doc_id"): CardState = {
    val meta = state.meta.dropDuplicates(idCol)
    CardState(meta,
      state.postings.distinct()
        .join(meta.select(col(idCol).as("id")), Seq("id"), "left_semi"))
  }

  /** The card read off (possibly incrementally grown) state. */
  def buildFromState(state: CardState, idCol: String = "doc_id"): Map[String, DataFrame] = {
    val meta = state.meta
    val languages = meta.groupBy(col("lang"))
      .agg(count(lit(1)).as("docs"), sum(col("n_tokens")).as("tokens"),
        round(avg(col("n_tokens")), 2).as("avg_tokens"))
      .orderBy(col("docs").desc, col("lang"))
    val sources = meta.groupBy(col("source"))
      .agg(count(lit(1)).as("docs"), sum(col("n_tokens")).as("tokens"))
      .orderBy(col("docs").desc, col("source"))
    // power-of-2 token buckets: bounded bins at any corpus size
    val lengths = meta
      .withColumn("bucket", when(col("n_tokens") === 0L, lit(0L))
        .otherwise(pow(lit(2.0), floor(log2(col("n_tokens")))).cast("long")))
      .groupBy(col("bucket")).agg(count(lit(1)).as("docs"))
      .orderBy(col("bucket"))
    val duplication = Dedup.duplicationProfileFromPostings(state.postings, idCol)
      .agg(
        count(lit(1)).as("docs_profiled"),
        round(avg(col("dup_ratio")), 4).as("mean_dup_ratio"),
        sum((col("max_df") > 1L).cast("long")).as("docs_with_shared_content"),
        max(col("max_df")).as("max_shingle_df"))
    val quality = meta.agg(
      round(avg(col("entropy_nats")), 4).as("mean_entropy_nats"),
      round(avg(col("ttr")), 4).as("mean_ttr"),
      sum((col("n_tokens") === 0L).cast("long")).as("empty_docs"))
    Map("languages" -> languages, "sources" -> sources, "lengths" -> lengths,
      "duplication" -> duplication, "quality" -> quality)
  }

  /** The card as named tables: `languages`, `sources`, `lengths` (token
    * histogram by power-of-2 bucket), `duplication` (one row),
    * `quality` (one row). Write each to `<out>/<name>` or read off the
    * summaries directly.
    *
    * Required input columns: `idCol` and `textCol`. `lang` and `source`
    * are optional — a frame without them (or with NULLs) reports the
    * facet as the single bucket "??" instead of failing to resolve.
    */
  def build(docs: DataFrame, idCol: String = "doc_id",
            textCol: String = "text"): Map[String, DataFrame] =
    buildFromState(buildState(docs, idCol, textCol), idCol)
}
