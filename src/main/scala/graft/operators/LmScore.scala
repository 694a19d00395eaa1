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

  /** Bigram surprisal with STUPID BACKOFF (Brants et al. 2007) — the
    * web-scale smoothing that keeps every probability a PURE RATIO, which
    * is what makes the pinned-ln discipline carry over unchanged:
    *
    *   S(v|u) = c(uv) / c(u)                   when c(uv) > 0
    *          = 0.4 * (tf_v + 1) / (N + V)     otherwise (add-one unigram)
    *
    * so -ln S is always a DIFFERENCE of integer lns —
    * `lnfp(c(u)) - lnfp(c(uv))` on the seen path and
    * `lnfp(5*(N+V)) - lnfp(2*(tf_v+1))` on the backoff path (0.4 = 2/5
    * folded into the integers; no mixture sums, so nothing outgrows the
    * 2^62 series domain at any corpus size where counts fit a long).
    * An interpolated or Kneser-Ney model sums rationals and needs
    * arbitrary-precision ln — stupid backoff is the standard precisely
    * because it skips that, at scale and here.
    *
    * Per-doc score = mean over the doc's n-1 transitions; docs with < 2
    * tokens emit NULL. The expensive math runs once per DISTINCT BIGRAM
    * (and distinct unigram), never per transition; c(u) is the exact
    * bigram-prefix total (sum over v of c(uv)). Output: (idCol,
    * n_transitions, surprisal_fp, mean_surprisal).
    */
  def bigramSurprisal(docs: DataFrame, reference: Option[DataFrame] = None,
                      idCol: String = "doc_id",
                      textCol: String = "text"): DataFrame = {
    import graft.functions.TextFunctions
    def bigrams(d: DataFrame, cols: Seq[org.apache.spark.sql.Column]) =
      d.select(cols :+ explode(TextFunctions.wordShinglesAll(
        TextFunctions.tokens(col(textCol)), 2)).as("bg"): _*)
    val ref = reference.getOrElse(docs)
    // unigram model (for the backoff path): tf over all token positions
    val vocab = ref.select(explode(TextFunctions.tokens(col(textCol))).as("w"))
      .groupBy(col("w")).agg(count(lit(1)).as("tf"))
    val lnD5 = PinnedMath.lnFpSteps("lnd", "(__d * 5)")
      .foldLeft(vocab.agg((sum(col("tf")) + count(lit(1))).as("__d"))) {
        case (df, (alias, e)) => df.withColumn(alias, expr(e))
      }
      .select(col("lnd_lnfp").as("__lnd5_fp"))
    // bigram counts and their prefix totals, each ln'd once per distinct
    val bg = bigrams(ref, Seq.empty).groupBy(col("bg")).agg(count(lit(1)).as("cuv"))
      .withColumn("__u", substring_index(col("bg"), " ", 1))
    val prefix = bg.groupBy(col("__u")).agg(sum(col("cuv")).as("cu"))
    val seenLn = PinnedMath.lnFpSteps("lcu", "cu")
      .++(PinnedMath.lnFpSteps("lcuv", "cuv"))
      .foldLeft(bg.join(prefix, "__u")) {
        case (df, (alias, e)) => df.withColumn(alias, expr(e))
      }
      .select(col("bg").as("__sb_bg"),
        (col("lcu_lnfp") - col("lcuv_lnfp")).as("__sb_seen_fp"))
    val backoffLn = PinnedMath.lnFpSteps("lbk", "(2 * (tf + 1))")
      .foldLeft(vocab) { case (df, (alias, e)) => df.withColumn(alias, expr(e)) }
      .select(col("w").as("__bk_w"), col("lbk_lnfp").as("__bk_fp"))
    // per-doc transitions: seen bigram -> ln(cu)-ln(cuv); unseen -> the
    // backoff on the CURRENT token (OOV current token: tf=0 -> ln(2))
    val trans = bigrams(docs, Seq(col(idCol)))
      .withColumn("__cur", substring_index(col("bg"), " ", -1))
      .join(seenLn, col("bg") === col("__sb_bg"), "left")
      .join(backoffLn, col("__cur") === col("__bk_w"), "left")
      .crossJoin(broadcast(lnD5))
      .withColumn("__t_fp", coalesce(col("__sb_seen_fp"),
        col("__lnd5_fp") - coalesce(col("__bk_fp"),
          lit(PinnedMath.lnFp(2L)))))
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("__nt"), sum(col("__t_fp")).as("__s"))
    docs.select(col(idCol))
      .join(trans, Seq(idCol), "left")
      .withColumn("n_transitions", coalesce(col("__nt"), lit(0L)))
      .withColumn("surprisal_fp", coalesce(col("__s"), lit(0L)))
      .withColumn("mean_surprisal",
        when(col("n_transitions") === 0L, lit(null)).otherwise(expr(
          s"CAST(surprisal_fp AS DOUBLE) / CAST(n_transitions AS DOUBLE)" +
            s" / CAST(${PinnedMath.FpScale} AS DOUBLE)")))
      .select(col(idCol), col("n_transitions"), col("surprisal_fp"),
        col("mean_surprisal"))
  }

  /** Per-group token-distribution drift: KL(P_group || P_corpus) over the
    * unigram distributions, in nats — the "is this source/shard/snapshot
    * still the same language mix" audit a training-data pipeline runs per
    * ingest. A source whose token distribution matches the corpus scores
    * ~0; boilerplate farms, wrong-language shards, and template spam score
    * high. (q90's total-variation drift audits a NUMERIC column; this
    * audits the token distribution itself.)
    *
    * KL needs no smoothing in this direction: only words with
    * tf_group > 0 contribute, and every such word has tf_corpus > 0
    * because the group is part of the corpus. Every term is then a pure
    * ratio of counts, so the pinned-ln discipline applies verbatim:
    *
    *   KL_g = (1/N_g) * sum_w tf_gw * [ln tf_gw - ln N_g - ln tf_w + ln N]
    *
    * Each ln is a [[PinnedMath]] fixed-point integer computed once per
    * DISTINCT (group, word) / word; the weighted sum runs in
    * DECIMAL(38,0) — tf * lnfp can exceed 2^63 once shard token counts
    * pass ~1e8, and a silent BIGINT wraparound would corrupt the audit
    * exactly on the corpora it exists for. Output: one row per group
    * (group, n_tokens, n_distinct, kl_fp DECIMAL(38,0) in 1e-9
    * token-nats, kl_nats DOUBLE).
    *
    * Scale shape: one corpus tokenize -> (group, word) count (combinable,
    * content-uniform keys); the ln series runs on the distinct domains;
    * the group totals are a tiny broadcast. Nothing is per-token after
    * the first aggregate.
    */
  def sourceKlDrift(docs: DataFrame, groupCol: String = "source",
                    textCol: String = "text"): DataFrame = {
    val gw = docs
      .select(col(groupCol).as("g"), explode(TextFunctions.tokens(col(textCol))).as("w"))
      .groupBy(col("g"), col("w")).agg(count(lit(1)).as("tf_g"))
    // per-distinct-word corpus counts + pinned ln(tf_w)
    val wAll = PinnedMath.lnFpSteps("lnw", "tf_all")
      .foldLeft(gw.groupBy(col("w")).agg(sum(col("tf_g")).as("tf_all"))) {
        case (df, (alias, e)) => df.withColumn(alias, expr(e))
      }
      .select(col("w"), col("lnw_lnfp").as("__ln_tfall_fp"))
    // per-group totals + pinned ln(N_g) — a handful of rows, broadcast
    val gTot = PinnedMath.lnFpSteps("lng", "n_g")
      .foldLeft(gw.groupBy(col("g")).agg(
        sum(col("tf_g")).as("n_g"), count(lit(1)).as("v_g"))) {
        case (df, (alias, e)) => df.withColumn(alias, expr(e))
      }
      .select(col("g"), col("n_g"), col("v_g"), col("lng_lnfp").as("__ln_ng_fp"))
    // one-row corpus total + pinned ln(N)
    val tot = PinnedMath.lnFpSteps("lnt", "n_all")
      .foldLeft(gw.agg(sum(col("tf_g")).as("n_all"))) {
        case (df, (alias, e)) => df.withColumn(alias, expr(e))
      }
      .select(col("lnt_lnfp").as("__ln_nall_fp"))
    // per-(group, word) pinned ln(tf_gw), then the weighted integer sum
    PinnedMath.lnFpSteps("lgw", "tf_g")
      .foldLeft(gw) { case (df, (alias, e)) => df.withColumn(alias, expr(e)) }
      .select(col("g"), col("w"), col("tf_g"), col("lgw_lnfp"))
      .join(wAll, Seq("w"))
      .join(broadcast(gTot), Seq("g"))
      .crossJoin(broadcast(tot))
      .withColumn("__term", col("tf_g").cast("decimal(38,0)") *
        (col("lgw_lnfp") - col("__ln_ng_fp") - col("__ln_tfall_fp") + col("__ln_nall_fp")))
      .groupBy(col("g"))
      .agg(max(col("n_g")).as("n_tokens"), max(col("v_g")).as("n_distinct"),
        sum(col("__term")).cast("decimal(38,0)").as("kl_fp"))
      .withColumn("kl_nats", expr(
        s"CAST(kl_fp AS DOUBLE) / CAST(n_tokens AS DOUBLE)" +
          s" / CAST(${PinnedMath.FpScale} AS DOUBLE)"))
      .select(col("g").as(groupCol), col("n_tokens"), col("n_distinct"),
        col("kl_fp"), col("kl_nats"))
  }

  /** Top-k characteristic terms per document by TF-IDF — the standard
    * keyword-extraction / topic-fingerprint pass (salient-term indexes,
    * near-topic grouping, per-document search keys).
    *
    * idf(w) = ln(D / df_w) is a pure count ratio, so the score stays in
    * exact integers end-to-end: score_fp = tf_dw * (lnfp(D) - lnfp(df_w))
    * — BIGINT is safe here (unlike [[sourceKlDrift]]'s corpus-wide sums)
    * because tf_dw is bounded by a single document's token count. A word
    * in every document gets idf 0 and can never outrank a discriminative
    * term. Ties break by term ascending, so the cut is deterministic.
    *
    * Scale shape: the ln series runs once per DISTINCT word (the df
    * table); doc-term tf rows join it on the content-uniform word key;
    * the top-k is a row_number window partitioned BY DOCUMENT — millions
    * of small partitions, never a global sort. Output: (idCol, term, tf,
    * score_fp, rank), rank 1..k per doc with >= 1 token.
    */
  def tfidfTopTerms(docs: DataFrame, k: Int = 5, idCol: String = "doc_id",
                    textCol: String = "text"): DataFrame = {
    val dw = docs
      .select(col(idCol), explode(TextFunctions.tokens(col(textCol))).as("term"))
      .groupBy(col(idCol), col("term")).agg(count(lit(1)).as("tf"))
    val dfLn = PinnedMath.lnFpSteps("ldf", "df")
      .foldLeft(dw.groupBy(col("term")).agg(count(lit(1)).as("df"))) {
        case (df, (alias, e)) => df.withColumn(alias, expr(e))
      }
      .select(col("term"), col("ldf_lnfp").as("__ln_df_fp"))
    val dTot = PinnedMath.lnFpSteps("lnd", "n_docs")
      .foldLeft(docs.agg(count(lit(1)).as("n_docs"))) {
        case (df, (alias, e)) => df.withColumn(alias, expr(e))
      }
      .select(col("lnd_lnfp").as("__ln_d_fp"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(idCol))
      .orderBy(col("score_fp").desc, col("term").asc)
    dw.join(dfLn, Seq("term"))
      .crossJoin(broadcast(dTot))
      .withColumn("score_fp", col("tf") * (col("__ln_d_fp") - col("__ln_df_fp")))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col(idCol), col("term"), col("tf"), col("score_fp"), col("rank"))
  }
}
