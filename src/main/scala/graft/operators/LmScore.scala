package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.{PinnedMath, TextFunctions}

/** Unigram language-model quality scoring — the CCNet-style "does this
  * look like natural language" gate: a document's mean token SURPRISAL
  * under an add-one-smoothed unigram model of a reference corpus. Fluent
  * text built from common words scores low; gibberish, boilerplate-coded
  * blobs, and wrong-language text score high, so the downstream cut is a
  * quantile gate on this column (compose with [[Quantiles]]).
  *
  * Model and math: p(w) = (tf_w + 1) / (N + V) over the reference corpus
  * (N tokens, V distinct words; an unseen word gets tf = 0 — add-one
  * smoothing makes OOV fall out of the same formula). Mean surprisal =
  * (1/n) * sum(-ln p(w_i)) = (n * ln(N+V) - sum(ln(tf_{w_i}+1))) / n.
  *
  * Cross-engine exactness is the design constraint, and the float-sum
  * trap is real: a per-doc sum of libm doubles is partition-order
  * sensitive AND engine-divergent. Instead every ln is the PINNED series
  * of [[PinnedMath]] (bit-identical doubles on both engines), computed
  * ONCE PER DISTINCT WORD and quantized to integer 1e-9 nats — per-doc
  * sums are then BIGINT (order-free, exact), and the one float division
  * at the end runs on identical integers.
  *
  * Scale shape: the ln series — ~20 float ops and two 62-arm integer
  * CASEs — runs on the DISTINCT-word table (sublinear in corpus size),
  * never per token; tokens join the word scores on a content-uniform key
  * (short rows) and fold with one combinable integer aggregate. The
  * (N+V) constant is a one-row broadcast.
  */
object LmScore {

  /** Per-document unigram surprisal. `reference` defaults to scoring the
    * corpus against itself (the self-perplexity audit); pass a held-out
    * reference (e.g. a known-clean corpus) for the CCNet-style gate.
    * Output: (idCol, n_tokens, surprisal_fp BIGINT in 1e-9 nats,
    * mean_surprisal DOUBLE nats/token, NULL for token-less docs). Every
    * input row survives.
    */
  def unigramSurprisal(docs: DataFrame, reference: Option[DataFrame] = None,
                       idCol: String = "doc_id",
                       textCol: String = "text"): DataFrame = {
    val refWords = reference.getOrElse(docs)
      .select(explode(TextFunctions.tokens(col(textCol))).as("w"))
    val vocab = refWords.groupBy(col("w")).agg(count(lit(1)).as("tf"))
    // one-row model constant: ln(N + V), fixed-point
    val lnD = PinnedMath.lnFpSteps("lnd", "__d")
      .foldLeft(vocab.agg((sum(col("tf")) + count(lit(1))).as("__d"))) {
        case (df, (alias, e)) => df.withColumn(alias, expr(e))
      }
      .select(col("lnd_lnfp").as("__lnd_fp"))
    // per-distinct-word ln(tf + 1), fixed-point
    val wordLn = PinnedMath.lnFpSteps("lnw", "(tf + 1)")
      .foldLeft(vocab) { case (df, (alias, e)) => df.withColumn(alias, expr(e)) }
      .select(col("w"), col("lnw_lnfp").as("__ln_tf_fp"))
    val docWords = docs.select(col(idCol), explode(TextFunctions.tokens(col(textCol))).as("w"))
    val perDoc = docWords
      .join(wordLn, Seq("w"), "left") // OOV: tf=0 -> ln(1)=0
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("__n"),
        sum(coalesce(col("__ln_tf_fp"), lit(0L))).as("__s"))
    docs.select(col(idCol))
      .join(perDoc, Seq(idCol), "left")
      .crossJoin(broadcast(lnD))
      .withColumn("n_tokens", coalesce(col("__n"), lit(0L)))
      .withColumn("surprisal_fp",
        col("n_tokens") * col("__lnd_fp") - coalesce(col("__s"), lit(0L)))
      .withColumn("mean_surprisal",
        when(col("n_tokens") === 0L, lit(null)).otherwise(expr(
          s"CAST(surprisal_fp AS DOUBLE) / CAST(n_tokens AS DOUBLE)" +
            s" / CAST(${PinnedMath.FpScale} AS DOUBLE)")))
      .select(col(idCol), col("n_tokens"), col("surprisal_fp"),
        col("mean_surprisal"))
  }
}
