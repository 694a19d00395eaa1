package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

import graft.functions.{PinnedMath, PolyHash, PolyHash61, TextFunctions}
import Caching.maybePersist

/** DSIR — Data Selection via Importance Resampling (Xie et al. 2023,
  * arXiv:2302.03169): select raw-corpus documents that look like a small
  * high-quality TARGET corpus by importance weighting in a hashed n-gram
  * feature space, then sampling by weight rather than taking the head.
  *
  * The published recipe, re-expressed relationally:
  *
  *   1. Features: every unigram and word-bigram of a document, hashed
  *      into `buckets` slots (the paper's "hashed n-gram" space — the
  *      dimensionality bound that makes the model a fixed-size table no
  *      matter the corpus size).
  *   2. Bag-of-buckets models of the target (p) and raw (q) corpora,
  *      add-one smoothed: p(b) = (cp_b + 1) / (Np + B).
  *   3. Per-document log importance weight
  *      log w(x) = sum_b c_b(x) * [ln p(b) - ln q(b)]
  *               = sum_feats [ln(cp_b+1) - ln(cq_b+1)]
  *                 + n(x) * [ln(Nq+B) - ln(Np+B)],
  *      a pure sum of count-ratio lns — so the [[PinnedMath]] discipline
  *      applies verbatim: every ln is the pinned integer series computed
  *      once per DISTINCT BUCKET (<= B rows), per-doc sums are BIGINT
  *      (order-free, engine-exact).
  *   4. Gumbel-top-k resampling: rank by log w(x) + G(x) where G is
  *      standard Gumbel noise — equivalent to sampling without
  *      replacement with probability proportional to w (the log-space
  *      twin of the Efraimidis-Spirakis keys [[Sampling.weightedPriority]]
  *      uses). The noise is DETERMINISTIC and exact: u = (h+1)/2^61 from
  *      the content hash, and G = -ln(-ln u) stays in pinned integers by
  *      applying the integer ln series TWICE —
  *        g1_fp  = lnFp(2^61) - lnFp(h+1)          ( = -ln(u), 1e-9 nats)
  *        G_fp   = lnFp(1e9)  - lnFp(max(g1_fp,1)) ( = -ln(g1_fp*1e-9) )
  *      so the sample is replayable bit-for-bit on any engine, with no
  *      float ln anywhere. (Plain top-k by weight — the paper's "top-k
  *      heuristic" baseline — is the k-th rank of [[logWeights]].)
  *
  * Scale shape: the model is <= `buckets` rows — a BROADCAST table at any
  * corpus size (that is the point of feature hashing); the ln series runs
  * on distinct buckets, never per token; scoring is one explode ->
  * broadcast join -> combinable integer aggregate; selection needs no
  * corpus-wide window — the n-th key is a TakeOrdered(n) one-row
  * broadcast and the flag is a row-local comparison.
  *
  * Reference anchor: the reference has no data-selection stage at all
  * (its pipeline ends at feature serving); this extends the curation
  * surface alongside the NB classifier [[QualityClassifier]] — same seed
  * corpora, generative-ratio scoring instead of discriminative.
  */
object Dsir {

  /** Importance-weight model: `bucketLn(b, __dw_fp)` — the per-bucket
    * integer ln(cp+1)-ln(cq+1) — and the one-row `baseLn(__base_fp)` =
    * ln(Nq+B)-ln(Np+B). Two plain DataFrames bounded by `buckets` rows:
    * persist as parquet and score any shard against the frozen model
    * (the [[LmScore.UnigramLm]] train-once / score-many split).
    */
  case class DsirModel(bucketLn: DataFrame, baseLn: DataFrame, buckets: Int)

  /** Hashed feature buckets of one document: unigrams ++ word-bigrams,
    * each `polyHash(f) % buckets` (the rolling hash — both engines share
    * it exactly; avalanche quality is irrelevant for bag-of-bucket
    * counting).
    */
  private[operators] def featureBuckets(textCol: Column, buckets: Int): Column = {
    val toks = TextFunctions.tokens(textCol)
    transform(concat(toks, TextFunctions.wordShinglesAll(toks, 2)),
      f => PolyHash.polyHash(f) % buckets)
  }

  /** Per-bucket feature counts of a corpus: (b, cnt), at most `buckets`
    * rows out of one combinable aggregate.
    */
  def bucketCounts(docs: DataFrame, buckets: Int,
                   textCol: String = "text"): DataFrame =
    docs.select(explode(featureBuckets(col(textCol), buckets)).as("b"))
      .groupBy(col("b")).agg(count(lit(1)).as("cnt"))

  /** Fit the hashed-n-gram importance model of `target` against `raw`.
    * Buckets seen by NEITHER corpus would score ln(1)-ln(1) = 0, so the
    * full-outer merge of the two count tables IS the complete model.
    */
  def trainModel(target: DataFrame, raw: DataFrame, buckets: Int = 4096,
                 textCol: String = "text"): DsirModel = {
    require(buckets > 0, "buckets must be positive")
    val cp = bucketCounts(target, buckets, textCol)
      .withColumnRenamed("cnt", "cp")
    val cq = bucketCounts(raw, buckets, textCol)
      .withColumnRenamed("cnt", "cq")
    modelFromMerged(cp.join(cq, Seq("b"), "full")
      .select(col("b"), coalesce(col("cp"), lit(0L)).as("cp"),
        coalesce(col("cq"), lit(0L)).as("cq")), buckets)
  }

  /** The model from a merged `(b, cp, cq)` count table — ONE definition
    * of the pinned-ln weight and base-rate math, shared by
    * [[trainModel]] and [[resampleFromCorpus]] so the one-pass and
    * composed forms stay identical by construction.
    */
  private def modelFromMerged(merged0: DataFrame, buckets: Int): DsirModel = {
    // persisted: the merged count table (<= buckets rows) feeds BOTH the
    // per-bucket weights and the one-row base-rate aggregate — without
    // the persist each consumer re-runs the full-outer count merge (and,
    // on the trainModel path, both corpus tokenize+count passes)
    val merged = maybePersist(merged0, StorageLevel.MEMORY_AND_DISK)
    val bucketLn = PinnedMath.lnFpSteps("lp", "(cp + 1)")
      .++(PinnedMath.lnFpSteps("lq", "(cq + 1)"))
      .foldLeft(merged) { case (df, (alias, e)) => df.withColumn(alias, expr(e)) }
      .select(col("b"), (col("lp_lnfp") - col("lq_lnfp")).as("__dw_fp"))
    val baseLn = PinnedMath.lnFpSteps("lnp", s"(np + $buckets)")
      .++(PinnedMath.lnFpSteps("lnq", s"(nq + $buckets)"))
      .foldLeft(merged.agg(sum(col("cp")).as("np"), sum(col("cq")).as("nq"))) {
        case (df, (alias, e)) => df.withColumn(alias, expr(e))
      }
      .select((col("lnq_lnfp") - col("lnp_lnfp")).as("__base_fp"))
    DsirModel(bucketLn, baseLn, buckets)
  }

  /** Score documents against a (possibly persisted) model. Output:
    * (idCol, n_feats, logw_fp BIGINT in 1e-9 nats) — every input row
    * survives; a token-less document scores 0 (the empty product).
    */
  def logWeights(docs: DataFrame, model: DsirModel,
                 idCol: String = "doc_id",
                 textCol: String = "text"): DataFrame =
    weightsFromFeatures(docs.select(col(idCol)),
      docs.select(col(idCol),
        explode(featureBuckets(col(textCol), model.buckets)).as("b")),
      model, idCol)

  /** The scoring tail over pre-exploded `(idCol, b)` feature rows — ONE
    * definition shared by [[logWeights]] and [[resampleFromCorpus]].
    */
  private def weightsFromFeatures(docIds: DataFrame, featureRows: DataFrame,
                                  model: DsirModel, idCol: String): DataFrame = {
    val perDoc = featureRows
      .join(broadcast(model.bucketLn), Seq("b"), "left")
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("__n"),
        sum(coalesce(col("__dw_fp"), lit(0L))).as("__s"))
    docIds
      .join(perDoc, Seq(idCol), "left")
      .crossJoin(broadcast(model.baseLn))
      .withColumn("n_feats", coalesce(col("__n"), lit(0L)))
      .withColumn("logw_fp",
        coalesce(col("__s"), lit(0L)) + col("n_feats") * col("__base_fp"))
      .select(col(idCol), col("n_feats"), col("logw_fp"))
  }

  /** ln(FpScale) in fixed point — the constant that turns the second ln
    * application back into nats of the original ratio.
    */
  private val LnFpScaleFp: Long = PinnedMath.lnFp(PinnedMath.FpScale)

  /** Gumbel-top-k importance resample: every row survives with its
    * weight, deterministic Gumbel key, and a `selected` flag marking the
    * `n` sampled documents (inclusion odds proportional to the importance
    * weight; ties and the uniform both derive from content, so the sample
    * is replayable). Output: (idCol, n_feats, logw_fp, key_fp, selected).
    */
  def resample(docs: DataFrame, model: DsirModel, n: Int,
               idCol: String = "doc_id",
               textCol: String = "text"): DataFrame =
    resampleTail(logWeights(docs, model, idCol, textCol),
      docs.select(col(idCol), PolyHash61.polyHash61(col(textCol)).as("__h")),
      n, idCol)

  /** One-pass corpus selection: when the target is a PREDICATE over the
    * corpus itself (the q108-style source-labeled seed), the corpus needs
    * tokenizing ONCE — the bucketed feature rows serve target counts, raw
    * counts, and scoring from a single persisted scan, where composing
    * [[trainModel]] + [[resample]] would explode the same text three
    * times. Identical output to the composed form by construction (same
    * counts, same tail).
    */
  def resampleFromCorpus(docs: DataFrame, targetPred: org.apache.spark.sql.Column,
                         n: Int, buckets: Int = 4096,
                         idCol: String = "doc_id", textCol: String = "text",
                         storage: StorageLevel = StorageLevel.MEMORY_AND_DISK): DataFrame = {
    require(buckets > 0, "buckets must be positive")
    val fb = maybePersist(
      docs.select(col(idCol), targetPred.as("__tgt"),
        explode(featureBuckets(col(textCol), buckets)).as("b")), storage)
    val cq = fb.groupBy(col("b")).agg(count(lit(1)).as("cq"))
    val cp = fb.filter(col("__tgt")).groupBy(col("b")).agg(count(lit(1)).as("cp"))
    val model = modelFromMerged(cp.join(cq, Seq("b"), "full")
      .select(col("b"), coalesce(col("cp"), lit(0L)).as("cp"),
        coalesce(col("cq"), lit(0L)).as("cq")), buckets)
    resampleTail(
      weightsFromFeatures(docs.select(col(idCol)),
        fb.select(col(idCol), col("b")), model, idCol),
      docs.select(col(idCol), PolyHash61.polyHash61(col(textCol)).as("__h")),
      n, idCol)
  }

  /** The Gumbel-key + threshold-broadcast tail shared by [[resample]] and
    * [[resampleFromCorpus]]: `lw` = (idCol, n_feats, logw_fp), `hashSrc` =
    * (idCol, __h).
    */
  private def resampleTail(lw: DataFrame, hashSrc: DataFrame, n: Int,
                           idCol: String): DataFrame = {
    require(n > 0, "sample size must be positive")
    // the (-id) tie-break below needs a numeric id: under a non-ANSI
    // session, negating a string silently yields NULL and the threshold
    // comparison would mis-select rows instead of failing loudly
    require(lw.schema(idCol).dataType.isInstanceOf[org.apache.spark.sql.types.NumericType],
      s"resample tie-break requires a numeric $idCol, got " +
        lw.schema(idCol).dataType.simpleString)
    val hashed = lw.join(hashSrc, Seq(idCol))
    // -ln(u) in 1e-9 nats, floored to 1 so the second series stays in
    // domain (u = 1 - 2^-61 collapses to 0 at this fixed point)
    val withG1 = PinnedMath.lnFpSteps("lnu", "(__h + 1)")
      .foldLeft(hashed) { case (df, (alias, e)) => df.withColumn(alias, expr(e)) }
      .withColumn("__g1",
        greatest(lit(PinnedMath.LnFp2Pow61) - col("lnu_lnfp"), lit(1L)))
    val keyed = PinnedMath.lnFpSteps("lng", "__g1")
      .foldLeft(withG1) { case (df, (alias, e)) => df.withColumn(alias, expr(e)) }
      .withColumn("key_fp",
        col("logw_fp") + lit(LnFpScaleFp) - col("lng_lnfp"))
      .select(col(idCol), col("n_feats"), col("logw_fp"), col("key_fp"))
    // the n-th (key, id) pair — TakeOrdered(n) + one-row broadcast, never
    // a corpus-wide window
    val thr = keyed
      .orderBy(col("key_fp").desc, col(idCol).asc)
      .limit(n)
      .agg(min(struct(col("key_fp"), (-col(idCol)).as("nid"))).as("__thr"))
    keyed.crossJoin(broadcast(thr))
      .withColumn("selected", col("__thr").isNotNull &&
        struct(col("key_fp"), (-col(idCol)).as("nid")) >= col("__thr"))
      .select(col(idCol), col("n_feats"), col("logw_fp"), col("key_fp"),
        col("selected"))
  }
}
