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

  /** Persistable unigram model state: `wordLn(w, __ln_tf_fp)` — the
    * per-distinct-word integer ln(tf+1) — and the one-row `lnD(__lnd_fp)`
    * = ln(N+V) constant. Two plain DataFrames (write as parquet, read
    * back, score): the train-once / score-many split that
    * [[graft.streaming.EventStream.surprisalGateWriter]] uses as FROZEN
    * state across micro-batches — the LM analogue of
    * [[graft.operators.Contamination.benchmarkAnchors]]'s anchor table.
    */
  case class UnigramLm(wordLn: DataFrame, lnD: DataFrame)

  /** Train the add-one unigram model of `reference`: every expensive op
    * (the pinned-ln series) runs once per DISTINCT word. The vocab table
    * persists under `storage` (NONE opts out) — the ln(N+V) constant and
    * the per-word ln table both read it, and without the persist the
    * reference tokenizes once per model table. Train-once semantics:
    * callers that freeze the model to parquet (the streaming gate, `App
    * lm-train`) pay the persist exactly once.
    */
  def unigramModel(reference: DataFrame, textCol: String = "text",
                   storage: org.apache.spark.storage.StorageLevel =
                     org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK): UnigramLm = {
    val vocab = Caching.maybePersist(
      reference
        .select(explode(TextFunctions.tokens(col(textCol))).as("w"))
        .groupBy(col("w")).agg(count(lit(1)).as("tf")),
      storage)
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
    UnigramLm(wordLn, lnD)
  }

  /** Score documents against a (possibly persisted) trained model — the
    * cheap side of the split: tokens join the word scores on a
    * content-uniform key and fold with one combinable integer aggregate.
    */
  def surprisalWithModel(docs: DataFrame, model: UnigramLm,
                         idCol: String = "doc_id",
                         textCol: String = "text"): DataFrame = {
    val docWords = docs.select(col(idCol), explode(TextFunctions.tokens(col(textCol))).as("w"))
    val perDoc = docWords
      .join(model.wordLn, Seq("w"), "left") // OOV: tf=0 -> ln(1)=0
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("__n"),
        sum(coalesce(col("__ln_tf_fp"), lit(0L))).as("__s"))
    docs.select(col(idCol))
      .join(perDoc, Seq(idCol), "left")
      .crossJoin(broadcast(model.lnD))
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

  /** Per-document unigram surprisal. `reference` defaults to scoring the
    * corpus against itself (the self-perplexity audit); pass a held-out
    * reference (e.g. a known-clean corpus) for the CCNet-style gate.
    * Output: (idCol, n_tokens, surprisal_fp BIGINT in 1e-9 nats,
    * mean_surprisal DOUBLE nats/token, NULL for token-less docs). Every
    * input row survives. Train-once / score-many callers use
    * [[unigramModel]] + [[surprisalWithModel]] directly.
    */
  def unigramSurprisal(docs: DataFrame, reference: Option[DataFrame] = None,
                       idCol: String = "doc_id",
                       textCol: String = "text"): DataFrame =
    surprisalWithModel(docs,
      unigramModel(reference.getOrElse(docs), textCol), idCol, textCol)

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
                      textCol: String = "text",
                      storage: org.apache.spark.storage.StorageLevel =
                        org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK): DataFrame = {
    import graft.functions.TextFunctions
    def bigrams(d: DataFrame, cols: Seq[org.apache.spark.sql.Column]) =
      d.select(cols :+ explode(TextFunctions.wordShinglesAll(
        TextFunctions.tokens(col(textCol)), 2)).as("bg"): _*)
    val ref = reference.getOrElse(docs)
    // uni+bi gram counts in ONE tokenize pass over the reference (the
    // [[trigramState]] shape, two orders): the unigram table (backoff
    // path) and the bigram table previously each re-tokenized the
    // reference — one full corpus scan per model table. Persisted: lnD5,
    // backoffLn, and the bigram level all read it.
    val st = Caching.maybePersist(
      ref.select(TextFunctions.tokens(col(textCol)).as("__toks"))
        .select(explode(concat(
          transform(col("__toks"),
            w => struct(lit(1).as("ord"), w.as("gram"))),
          transform(TextFunctions.wordShinglesAll(col("__toks"), 2),
            g => struct(lit(2).as("ord"), g.as("gram"))))).as("p"))
        .select(col("p.ord").as("ord"), col("p.gram").as("gram"))
        .groupBy(col("ord"), col("gram")).agg(count(lit(1)).as("cnt")),
      storage)
    val vocab = st.filter(col("ord") === 1)
      .select(col("gram").as("w"), col("cnt").as("tf"))
    val lnD5 = PinnedMath.lnFpSteps("lnd", "(__d * 5)")
      .foldLeft(vocab.agg((sum(col("tf")) + count(lit(1))).as("__d"))) {
        case (df, (alias, e)) => df.withColumn(alias, expr(e))
      }
      .select(col("lnd_lnfp").as("__lnd5_fp"))
    // bigram counts and their prefix totals, each ln'd once per distinct
    val bg = st.filter(col("ord") === 2)
      .select(col("gram").as("bg"), col("cnt").as("cuv"))
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
    // backoff on the CURRENT token (OOV current token: tf=0 -> ln(2)).
    // Positions collapse to (doc, bigram, k) FIRST and the model joins
    // run once per DISTINCT doc bigram — the trigram plan's restructure,
    // bit-identical by integer-sum reordering
    val docBg = Caching.maybePersist(
      bigrams(docs, Seq(col(idCol)))
        .groupBy(col(idCol), col("bg")).agg(count(lit(1)).as("__k")),
      storage)
    val bgScores = docBg.select(col("bg")).distinct()
      .withColumn("__cur", substring_index(col("bg"), " ", -1))
      .join(seenLn, col("bg") === col("__sb_bg"), "left")
      .join(backoffLn, col("__cur") === col("__bk_w"), "left")
      .crossJoin(broadcast(lnD5))
      .select(col("bg").as("__sc_bg"),
        coalesce(col("__sb_seen_fp"),
          col("__lnd5_fp") - coalesce(col("__bk_fp"),
            lit(PinnedMath.lnFp(2L)))).as("__t_fp"))
    val trans = docBg.join(bgScores, col("bg") === col("__sc_bg"))
      .groupBy(col(idCol))
      .agg(sum(col("__k")).as("__nt"), sum(col("__k") * col("__t_fp")).as("__s"))
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

  /** Trigram surprisal with TWO-LEVEL stupid backoff (Brants et al. 2007 —
    * the MapReduce-scale n-gram LM recipe, one order up from
    * [[bigramSurprisal]]):
    *
    *   S(w|u,v) = c(uvw) / c(uv.)                 when c(uvw) > 0
    *            = 0.4 * c(vw) / c(v.)             elif c(vw) > 0
    *            = 0.4^2 * (tf_w + 1) / (N + V)    otherwise (add-one unigram)
    *
    * where `c(uv.)` / `c(v.)` are the exact PREFIX TOTALS of the trigram /
    * bigram tables (sum over the final token), so every probability stays a
    * pure ratio and every -ln a difference of integer pinned series:
    * `lnfp(c(uv.)) - lnfp(c(uvw))` seen; `lnfp(5*c(v.)) - lnfp(2*c(vw))`
    * one level down (0.4 = 2/5 folded in); `lnfp(25*(N+V)) -
    * lnfp(4*(tf_w+1))` at the floor (0.16 = 4/25). OOV current token:
    * tf = 0, the `lnfp(4)` literal.
    *
    * Per-doc score = mean over the doc's n-2 trigram positions; docs with
    * < 3 tokens emit NULL. Scale shape: all ln math runs once per DISTINCT
    * trigram/bigram/unigram; the per-position work is three hash joins on
    * gram strings plus one broadcast one-row constant — the [[bigramSurprisal]]
    * plan one keyed join wider, no window, no pair blowup.
    * Output: (idCol, n_trigrams, surprisal_fp, mean_surprisal).
    */
  def trigramSurprisal(docs: DataFrame, reference: Option[DataFrame] = None,
                       idCol: String = "doc_id",
                       textCol: String = "text"): DataFrame =
    trigramSurprisalFromState(docs,
      trigramState(reference.getOrElse(docs), textCol), idCol, textCol)

  /** The trigram LM's persistable state: `(ord, gram, cnt)` — uni/bi/tri
    * gram counts (ord 1/2/3) in one frame, built in a SINGLE tokenize
    * pass + one combinable aggregate. Exact and sum-mergeable, so shards
    * APPEND via [[incrementTrigramState]] without retokenizing stored
    * corpora and increment == full retrain bit-for-bit (every downstream
    * ln reads the same integers) — the LM-family analogue of [[klState]].
    */
  def trigramState(reference: DataFrame, textCol: String = "text"): DataFrame = {
    import graft.functions.TextFunctions
    reference.select(TextFunctions.tokens(col(textCol)).as("__toks"))
      .select(explode(concat(
        transform(col("__toks"),
          w => struct(lit(1).as("ord"), w.as("gram"))),
        transform(TextFunctions.wordShinglesAll(col("__toks"), 2),
          g => struct(lit(2).as("ord"), g.as("gram"))),
        transform(TextFunctions.wordShinglesAll(col("__toks"), 3),
          g => struct(lit(3).as("ord"), g.as("gram"))))).as("p"))
      .select(col("p.ord").as("ord"), col("p.gram").as("gram"))
      .groupBy(col("ord"), col("gram")).agg(count(lit(1)).as("cnt"))
  }

  /** Sum-merge two gram-count states (also collapses appended per-shard
    * PARTIALS of the same state — reading raw partials through this is
    * the normalize step).
    */
  def mergeTrigramStates(a: DataFrame, b: DataFrame): DataFrame =
    a.unionByName(b)
      .groupBy(col("ord"), col("gram")).agg(sum(col("cnt")).as("cnt"))

  /** Collapse a state dir's appended per-shard partials to one count per
    * (ord, gram) — what every reader of raw stored state goes through.
    */
  def normalizeTrigramState(raw: DataFrame): DataFrame =
    mergeTrigramStates(raw.select(col("ord"), col("gram"), col("cnt")),
      raw.select(col("ord"), col("gram"), col("cnt")).limit(0))

  /** Fold a new shard's gram counts into stored state — only the shard
    * tokenizes; the merge is one sum per touched (ord, gram).
    */
  def incrementTrigramState(state: DataFrame, shard: DataFrame,
                            textCol: String = "text"): DataFrame =
    mergeTrigramStates(state, trigramState(shard, textCol))

  /** [[trigramSurprisal]] read off (possibly incrementally grown) state.
    *
    * Plan shape (reworked round 18 — the sweep's biggest absolute row):
    * the model-side ln tables always ran once per DISTINCT gram, but the
    * DOC side joined every trigram POSITION through three keyed joins,
    * and the `state` subtree re-aggregated once per model table (4-5
    * tokenize passes when the state is built inline, as q152 does). Now
    * (a) `state` persists across its readers (`storage` opts out — the
    * streaming gate persists its own merged state and a per-trigger
    * persist would leak), and (b) positions collapse FIRST: one
    * (doc, trigram, k) aggregate, the three model joins run once per
    * DISTINCT doc trigram, and credits rejoin through a single keyed
    * join with the per-doc sum weighted by k. Bit-identical (integer
    * sums reorder freely); the per-position shuffle count drops 3 -> 1.
    */
  def trigramSurprisalFromState(docs: DataFrame, state: DataFrame,
                                idCol: String = "doc_id",
                                textCol: String = "text",
                                storage: org.apache.spark.storage.StorageLevel =
                                  org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK): DataFrame = {
    import graft.functions.TextFunctions
    def grams(d: DataFrame, n: Int, cols: Seq[org.apache.spark.sql.Column], as: String) =
      d.select(cols :+ explode(TextFunctions.wordShinglesAll(
        TextFunctions.tokens(col(textCol)), n)).as(as): _*)
    val st = Caching.maybePersist(state, storage)
    val vocab = st.filter(col("ord") === 1)
      .select(col("gram").as("w"), col("cnt").as("tf"))
    // one-row floor constant: ln(25 * (N + V))
    val lnD25 = PinnedMath.lnFpSteps("lnd", "(__d * 25)")
      .foldLeft(vocab.agg((sum(col("tf")) + count(lit(1))).as("__d"))) {
        case (df, (alias, e)) => df.withColumn(alias, expr(e))
      }
      .select(col("lnd_lnfp").as("__lnd25_fp"))
    // bigram level: counts + prefix totals -> ln(5*c(v.)) - ln(2*c(vw))
    val bg = st.filter(col("ord") === 2)
      .select(col("gram").as("bg"), col("cnt").as("cuv"))
      .withColumn("__u", substring_index(col("bg"), " ", 1))
    val pre = bg.groupBy(col("__u")).agg(sum(col("cuv")).as("cu"))
    val seen2 = PinnedMath.lnFpSteps("l5cu", "(5 * cu)")
      .++(PinnedMath.lnFpSteps("l2cuv", "(2 * cuv)"))
      .foldLeft(bg.join(pre, "__u")) {
        case (df, (alias, e)) => df.withColumn(alias, expr(e))
      }
      .select(col("bg").as("__s2_bg"),
        (col("l5cu_lnfp") - col("l2cuv_lnfp")).as("__s2_fp"))
    // trigram level: counts + context totals -> ln(c(uv.)) - ln(c(uvw))
    val tg = st.filter(col("ord") === 3)
      .select(col("gram").as("tg"), col("cnt").as("c3"))
      .withColumn("__p2", substring_index(col("tg"), " ", 2))
    val pre3 = tg.groupBy(col("__p2")).agg(sum(col("c3")).as("c2x"))
    val seen3 = PinnedMath.lnFpSteps("lc2x", "c2x")
      .++(PinnedMath.lnFpSteps("lc3", "c3"))
      .foldLeft(tg.join(pre3, "__p2")) {
        case (df, (alias, e)) => df.withColumn(alias, expr(e))
      }
      .select(col("tg").as("__s3_tg"),
        (col("lc2x_lnfp") - col("lc3_lnfp")).as("__s3_fp"))
    val backoffLn = PinnedMath.lnFpSteps("lbk", "(4 * (tf + 1))")
      .foldLeft(vocab) { case (df, (alias, e)) => df.withColumn(alias, expr(e)) }
      .select(col("w").as("__bk_w"), col("lbk_lnfp").as("__bk_fp"))
    // collapse positions before the model joins: (doc, trigram, k) via
    // one map-side-combining aggregate, score each DISTINCT doc trigram
    // once through the three model joins, rejoin by trigram. The distinct
    // table is read twice (its own joins + as the docTg join's build
    // side), so the collapsed frame persists under the same storage knob.
    val docTg = Caching.maybePersist(
      grams(docs, 3, Seq(col(idCol)), "tg")
        .groupBy(col(idCol), col("tg")).agg(count(lit(1)).as("__k")),
      storage)
    val tgScores = docTg.select(col("tg")).distinct()
      .withColumn("__mid", substring_index(col("tg"), " ", -2))
      .withColumn("__cur", substring_index(col("tg"), " ", -1))
      .join(seen3, col("tg") === col("__s3_tg"), "left")
      .join(seen2, col("__mid") === col("__s2_bg"), "left")
      .join(backoffLn, col("__cur") === col("__bk_w"), "left")
      .crossJoin(broadcast(lnD25))
      .select(col("tg").as("__sc_tg"),
        coalesce(col("__s3_fp"), col("__s2_fp"),
          col("__lnd25_fp") - coalesce(col("__bk_fp"),
            lit(PinnedMath.lnFp(4L)))).as("__t_fp"))
    val trans = docTg.join(tgScores, col("tg") === col("__sc_tg"))
      .groupBy(col(idCol))
      .agg(sum(col("__k")).as("__nt"), sum(col("__k") * col("__t_fp")).as("__s"))
    docs.select(col(idCol))
      .join(trans, Seq(idCol), "left")
      .withColumn("n_trigrams", coalesce(col("__nt"), lit(0L)))
      .withColumn("surprisal_fp", coalesce(col("__s"), lit(0L)))
      .withColumn("mean_surprisal",
        when(col("n_trigrams") === 0L, lit(null)).otherwise(expr(
          s"CAST(surprisal_fp AS DOUBLE) / CAST(n_trigrams AS DOUBLE)" +
            s" / CAST(${PinnedMath.FpScale} AS DOUBLE)")))
      .select(col(idCol), col("n_trigrams"), col("surprisal_fp"),
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
                    textCol: String = "text"): DataFrame =
    sourceKlFromState(klState(docs, groupCol, textCol), groupCol)

  /** The KL audit's persistable state: per-(group, word) token counts —
    * exact and sum-mergeable (count addition is associative), so shards
    * APPEND without retokenizing stored corpora and increment == full
    * recompute bit-for-bit (the [[graft.operators.Vocabulary]] argument,
    * carried to the drift audit).
    */
  def klState(docs: DataFrame, groupCol: String = "source",
              textCol: String = "text"): DataFrame =
    docs
      .select(col(groupCol).as("g"), explode(TextFunctions.tokens(col(textCol))).as("w"))
      .groupBy(col("g"), col("w")).agg(count(lit(1)).as("tf_g"))

  /** Fold a new shard's counts into stored state — only the shard
    * tokenizes; the merge is one sum per touched (group, word).
    */
  def incrementKlState(state: DataFrame, shard: DataFrame,
                       groupCol: String = "source",
                       textCol: String = "text"): DataFrame =
    state.unionByName(klState(shard, groupCol, textCol))
      .groupBy(col("g"), col("w")).agg(sum(col("tf_g")).as("tf_g"))

  /** The audit read off (possibly incrementally grown) state. */
  def sourceKlFromState(gw: DataFrame,
                        groupCol: String = "source"): DataFrame = {
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

  /** Per-document token-distribution statistics: Shannon entropy of the
    * doc's own unigram distribution and the type-token ratio — the
    * model-free repetitiveness signals (a generator loop emitting the same
    * phrase has near-zero entropy however fluent each phrase is; natural
    * prose sits near ln(n_distinct)). Standard curation gates threshold
    * both; unlike [[unigramSurprisal]] no reference corpus is involved, so
    * the score is intrinsic to the document.
    *
    * Exactness: H = ln n - (1/n) * sum_w c_w ln c_w is all count
    * logarithms, so the pinned-ln discipline applies directly:
    * `entropy_fp = n * lnfp(n) - sum(c_w * lnfp(c_w))` is an exact BIGINT
    * (1e-9 token-nats; a billion-token doc would be needed to overflow),
    * and the display double divides identical integers on both engines.
    *
    * Scale shape: token explode -> per-(doc, token) count (map-side
    * combinable) -> per-doc integer fold; the ln series runs once per
    * (doc, DISTINCT token) row and once per doc — never per token
    * instance. Row-linear, one shuffle keyed by (id, token), no joins.
    * Output: (idCol, n_tokens, n_distinct, ttr, entropy_fp, entropy_nats);
    * token-less docs survive with zeros and NULL scores.
    */
  def tokenEntropy(docs: DataFrame, idCol: String = "doc_id",
                   textCol: String = "text"): DataFrame = {
    val wc = docs
      .select(col(idCol), explode(TextFunctions.tokens(col(textCol))).as("w"))
      .groupBy(col(idCol), col("w")).agg(count(lit(1)).as("c"))
    val perDoc = PinnedMath.lnFpSteps("lnc", "c")
      .foldLeft(wc) { case (df, (alias, e)) => df.withColumn(alias, expr(e)) }
      .groupBy(col(idCol))
      .agg(sum(col("c")).as("__n"), count(lit(1)).as("__v"),
        sum(col("c") * col("lnc_lnfp")).as("__s"))
    val withLnN = PinnedMath.lnFpSteps("lnn", "__n")
      .foldLeft(perDoc) { case (df, (alias, e)) => df.withColumn(alias, expr(e)) }
    docs.select(col(idCol))
      .join(withLnN.select(col(idCol), col("__n"), col("__v"),
        (col("__n") * col("lnn_lnfp") - col("__s")).as("__h")), Seq(idCol), "left")
      .withColumn("n_tokens", coalesce(col("__n"), lit(0L)))
      .withColumn("n_distinct", coalesce(col("__v"), lit(0L)))
      .withColumn("ttr", when(col("n_tokens") > 0L,
        round(col("n_distinct") / col("n_tokens"), 6)))
      .withColumn("entropy_fp", col("__h"))
      .withColumn("entropy_nats", when(col("n_tokens") > 0L, expr(
        s"CAST(__h AS DOUBLE) / CAST(n_tokens AS DOUBLE)" +
          s" / CAST(${PinnedMath.FpScale} AS DOUBLE)")))
      .select(col(idCol), col("n_tokens"), col("n_distinct"), col("ttr"),
        col("entropy_fp"), col("entropy_nats"))
  }

  /** CCNet-style perplexity bucketing (Wenzek et al. 2020): score every
    * document's mean surprisal under a unigram model of a CLEAN reference
    * corpus, then split EACH LANGUAGE into `nBuckets` equal tiers by
    * per-language type-1 quantile thresholds — bucket 1 = "head" (most
    * reference-like), `nBuckets` = "tail". CCNet's insight is that
    * perplexity is only comparable within a language, so the cut points
    * must be per-language; a global threshold would just rank languages.
    *
    * Exactness: the score that gets bucketed is `mean_mnats` =
    * `(surprisal_fp div n_tokens) div 1e6` — integer millinats per token,
    * derived from the exact BIGINT surprisal by two floor divisions on
    * non-negative operands (Spark `div` == DuckDB `//` there). The
    * quantile ranks use [[Quantiles]]' overflow-safe decomposition
    * `(n div B)*k + ceil((n mod B)*k / B)`, and a value lands above
    * threshold k iff the cumulative count STRICTLY BELOW it reaches that
    * rank — so ties share a bucket and the assignment is engine-exact.
    *
    * Scale shape: model training and scoring are [[unigramModel]] /
    * [[surprisalWithModel]] (distinct-word ln, combinable integer folds);
    * the threshold math runs on a BOUNDED per-language histogram of
    * millinat means (a few thousand bins — mean surprisals live in single
    * digits of nats), never on the corpus; docs join their bucket on the
    * (language, bin) key. No corpus-sized window anywhere. Output:
    * (idCol, groupCol, n_tokens, surprisal_fp, mean_mnats, bucket) —
    * bucket NULL for token-less docs; every input row survives.
    */
  def perplexityBuckets(docs: DataFrame, reference: DataFrame,
                        nBuckets: Int = 3, groupCol: String = "lang",
                        idCol: String = "doc_id",
                        textCol: String = "text",
                        storage: org.apache.spark.storage.StorageLevel =
                          org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK): DataFrame = {
    require(nBuckets >= 2 && nBuckets <= 1000,
      s"nBuckets must be in [2, 1000]: got $nBuckets")
    import org.apache.spark.sql.expressions.Window
    val scored = surprisalWithModel(docs.select(col(idCol), col(textCol)),
      unigramModel(reference, textCol), idCol, textCol)
    // persisted: the histogram ranking AND the final bucket join both
    // read this frame, and each evaluation re-runs the whole scoring
    // subtree (docs tokenize + model join) — the round-18 LM-family
    // persist rule
    val means = Caching.maybePersist(docs.select(col(idCol), col(groupCol))
      .join(scored, Seq(idCol))
      .withColumn("mean_mnats", when(col("n_tokens") > 0L,
        expr("(surprisal_fp div n_tokens) div 1000000"))), storage)
    val grp = Window.partitionBy(col(groupCol))
    val ranked = means.filter(col("mean_mnats").isNotNull)
      .groupBy(col(groupCol), col("mean_mnats").as("v"))
      .agg(count(lit(1)).as("cnt"))
      .withColumn("cumb", sum(col("cnt")).over(
        grp.orderBy(col("v")).rowsBetween(Window.unboundedPreceding, 0)) - col("cnt"))
      .withColumn("n", sum(col("cnt")).over(grp))
    // bucket(v) = 1 + #{k in 1..nBuckets-1 : cum_below(v) >= rank_k}
    val buckets = ranked.withColumn("bucket",
        (1 until nBuckets).map { k => expr(
          s"CAST(cumb >= (n div $nBuckets) * $k" +
            s" + ((n % $nBuckets) * $k + ${nBuckets - 1}) div $nBuckets AS INT)")
        }.foldLeft(lit(1))(_ + _))
      .select(col(groupCol).as("__g"), col("v").as("__v"), col("bucket"))
    means.join(buckets,
        col(groupCol) <=> col("__g") && col("mean_mnats") === col("__v"), "left")
      .select(col(idCol), col(groupCol), col("n_tokens"),
        col("surprisal_fp"), col("mean_mnats"), col("bucket"))
  }

  /** Top-k collocations by pointwise mutual information — the standard
    * multiword-expression miner ("new york", "machine learning"): pairs
    * that co-occur far more than their word frequencies predict. PMI is a
    * pure ratio of counts,
    *
    *   pmi(u,v) = ln( (c_uv / N_bi) / ((c_u / N_uni) * (c_v / N_uni)) )
    *            = ln c_uv - ln N_bi - ln c_u - ln c_v + 2 ln N_uni,
    *
    * so every term is a pinned integer ln and the score is exact BIGINT —
    * the cut and its ties (bigram ascending) are deterministic.
    * `minCount` drops rare pairs (classic PMI degeneracy: a hapax pair of
    * two hapax words maximizes the ratio).
    *
    * Scale shape: ln once per distinct surviving bigram and distinct
    * word; the top-k is `orderBy(...).limit(k)` — TakeOrdered over the
    * aggregate, never a global sort. Output: (bigram, c_uv, pmi_fp,
    * pmi_nats), rank implied by order.
    */
  def pmiCollocations(docs: DataFrame, k: Int = 25, minCount: Long = 3,
                      textCol: String = "text"): DataFrame = {
    val toks = TextFunctions.tokens(col(textCol))
    val uc = docs.select(explode(toks).as("w"))
      .groupBy(col("w")).agg(count(lit(1)).as("cu"))
    val bc = docs.select(explode(TextFunctions.wordShinglesAll(toks, 2)).as("bigram"))
      .groupBy(col("bigram")).agg(count(lit(1)).as("cuv"))
    val wordLn = PinnedMath.lnFpSteps("lcu", "cu")
      .foldLeft(uc) { case (df, (alias, e)) => df.withColumn(alias, expr(e)) }
      .select(col("w"), col("lcu_lnfp"))
    // totals over the UNFILTERED counts (minCount prunes candidates, not
    // the model), each a one-row broadcast
    val nBi = PinnedMath.lnFpSteps("lnb", "n_bi")
      .foldLeft(bc.agg(sum(col("cuv")).as("n_bi"))) {
        case (df, (alias, e)) => df.withColumn(alias, expr(e))
      }.select(col("lnb_lnfp"))
    val nUni = PinnedMath.lnFpSteps("lnu", "n_uni")
      .foldLeft(uc.agg(sum(col("cu")).as("n_uni"))) {
        case (df, (alias, e)) => df.withColumn(alias, expr(e))
      }.select(col("lnu_lnfp"))
    PinnedMath.lnFpSteps("lcuv", "cuv")
      .foldLeft(bc.filter(col("cuv") >= minCount)) {
        case (df, (alias, e)) => df.withColumn(alias, expr(e))
      }
      .withColumn("__u", substring_index(col("bigram"), " ", 1))
      .withColumn("__v", substring_index(col("bigram"), " ", -1))
      .join(wordLn.select(col("w").as("__u"), col("lcu_lnfp").as("__lu_fp")), Seq("__u"))
      .join(wordLn.select(col("w").as("__v"), col("lcu_lnfp").as("__lv_fp")), Seq("__v"))
      .crossJoin(broadcast(nBi)).crossJoin(broadcast(nUni))
      .withColumn("pmi_fp", col("lcuv_lnfp") - col("lnb_lnfp")
        - col("__lu_fp") - col("__lv_fp") + lit(2L) * col("lnu_lnfp"))
      .withColumn("pmi_nats", expr(
        s"CAST(pmi_fp AS DOUBLE) / CAST(${PinnedMath.FpScale} AS DOUBLE)"))
      .orderBy(col("pmi_fp").desc, col("bigram").asc)
      .limit(k)
      .select(col("bigram"), col("cuv"), col("pmi_fp"), col("pmi_nats"))
  }
}
