package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions

/** Blocklist screening — the C4-style "bad words" page filter (Raffel et
  * al. 2020 use the LDNOOBW list; production pipelines run category lists
  * for gambling/pharma/spam/etc.): count occurrences of any listed word
  * or phrase per document per category, and gate on any hit.
  *
  * Matching is TOKEN-exact, not substring: a phrase of n words matches a
  * document's n-gram token windows (so "class" never matches "classic",
  * and multiword phrases respect token boundaries) — each overlapping
  * window occurrence counts once, the same population rule as the shingle
  * family. Phrases are matched lowercase through the house tokenizer, so
  * list entries must be pre-tokenized phrases ("click here", not
  * "Click-Here!").
  *
  * Scale shape: the corpus explodes to (id, n-gram) rows ONLY for the
  * n-gram widths the list actually contains (a words-only list costs one
  * token explode); the list side is a handful of rows and broadcasts;
  * per-doc counts combine map-side. Row-linear, keyed joins only.
  *
  * Output: one row per INPUT document — (idCol, category hit counts as a
  * (category, hits) long table via [[screen]], or the per-doc rollup via
  * [[screenRollup]]). Docs with zero hits survive with zero counts.
  */
object Blocklist {

  /** Long-format hits: (idCol, category, hits > 0) — one row per (doc,
    * category) with at least one hit. Compose with a pivot or
    * [[screenRollup]] for the wide gate.
    */
  def screen(docs: DataFrame, blocklist: Seq[(String, String)],
             idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    require(blocklist.nonEmpty, "blocklist must not be empty")
    require(blocklist.forall(_._2.trim.nonEmpty), "blocklist phrases must be non-empty")
    val spark = docs.sparkSession
    import spark.implicits._
    // normalize every phrase through the HOUSE tokenizer (lowercase,
    // [^a-z0-9]+ splits, empties dropped), exactly what the document side
    // n-grams are built from: a raw split("\\s+") phrase with doubled
    // spaces or punctuation ("state-of-the-art") would silently never
    // match any single-space-joined gram. A phrase that tokenizes to
    // nothing (pure punctuation) can never match — reject it loudly.
    val entries = blocklist.map { case (cat, phrase) =>
      val toks = phrase.toLowerCase.split("[^a-z0-9]+").filter(_.nonEmpty)
      require(toks.nonEmpty,
        s"blocklist phrase '$phrase' (category $cat) tokenizes to nothing " +
          "under the house tokenizer and could never match")
      (cat, toks.mkString(" "), toks.length)
    }
    val widths = entries.map(_._3).distinct.sorted
    val list = broadcast(entries.toDF("category", "__phrase", "__n"))
    val toks = TextFunctions.tokens(col(textCol))
    widths.map { n =>
      val grams =
        if (n == 1) docs.select(col(idCol), explode(toks).as("__g"))
        else docs.select(col(idCol),
          explode(TextFunctions.wordShinglesAll(toks, n)).as("__g"))
      grams.join(list.filter(col("__n") === n),
          col("__g") === col("__phrase"))
        .groupBy(col(idCol), col("category"))
        .agg(count(lit(1)).as("hits"))
    }.reduce(_ unionByName _)
      .groupBy(col(idCol), col("category"))
      .agg(sum(col("hits")).as("hits"))
  }

  /** Per-doc gate rollup over [[screen]]: every input doc gets a row with
    * total hits, the number of distinct categories hit, the worst
    * category (most hits, ties lexicographic — deterministic on both
    * engines), and the C4 keep flag (zero hits anywhere).
    */
  def screenRollup(docs: DataFrame, blocklist: Seq[(String, String)],
                   idCol: String = "doc_id", textCol: String = "text"): DataFrame =
    screenRollupFromState(docs.select(col(idCol)),
      screen(docs, blocklist, idCol, textCol), idCol)

  /** The screen's appendable STATE is [[screen]]'s own long-format
    * output: per-doc hits are a pure row-local function of (text, list),
    * so a shard's rows union into stored state and the rollup read off
    * merged state equals the one-shot recompute bit-for-bit — provided
    * the LIST is frozen across increments (the same frozen-artifact
    * contract as every incremental gate here; re-screen from scratch
    * when the list changes).
    */
  def incrementScreenState(state: DataFrame, shard: DataFrame,
                           blocklist: Seq[(String, String)],
                           idCol: String = "doc_id",
                           textCol: String = "text"): DataFrame =
    state.unionByName(screen(shard, blocklist, idCol, textCol))

  /** The per-doc gate rollup read off (possibly incrementally grown)
    * state; `ids` is one row per doc the report must cover (hit-less
    * docs keep their row).
    */
  def screenRollupFromState(ids: DataFrame, hits: DataFrame,
                            idCol: String = "doc_id"): DataFrame = {
    val perDoc = hits.groupBy(col(idCol))
      .agg(sum(col("hits")).as("__total"),
        count(lit(1)).as("__ncat"),
        min(struct((-col("hits")).as("neg"), col("category").as("cat")))
          .getField("cat").as("__worst"))
    ids.select(col(idCol))
      .join(perDoc, Seq(idCol), "left")
      .select(col(idCol),
        coalesce(col("__total"), lit(0L)).as("total_hits"),
        coalesce(col("__ncat"), lit(0L)).as("n_categories"),
        col("__worst").as("worst_category"),
        (col("__total").isNull).cast("int").as("keep"))
  }
}
