package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions

/** The two flagship composite reports a curation pipeline actually gates
  * on — factored out of the q132/q134 contract queries so the `App`
  * CLI (`curation-verdict` / `contamination-verdict`) runs the exact
  * code the oracle gate checks.
  *
  * Both are compositions of row-local gates and keyed joins: every
  * component is one of the library's scale-shaped operators, and the
  * verdict adds only doc_id-keyed left joins plus integer bitmask
  * arithmetic. (Reference anchor: the mini-feature-store has no
  * curation CLI; these are part of the training-data surface this
  * library adds on top of the §2 parity set.)
  */
object Verdicts {

  /** END-TO-END curation verdict: Gopher document rules, C4 line rules,
    * the seed-trained NB quality model, intrinsic token entropy, and
    * exact dedup joined into one keep/drop per doc with a failure
    * BITMASK saying WHY (1=gopher, 2=c4, 4=nb, 8=entropy, 16=duplicate).
    *
    * `positive`/`negative` are the NB seed frames (same schema as
    * `docs`). The entropy gate keeps docs whose mean token entropy is
    * >= 1 nat (entropy_fp >= n_tokens * FpScale) — the model-free
    * repetitiveness floor.
    */
  def curationVerdict(docs: DataFrame, positive: DataFrame, negative: DataFrame,
                      idCol: String = "doc_id", textCol: String = "text"): DataFrame =
    curationCore(docs, positive, negative,
      Dedup.exact(docs.select(col(idCol), col(textCol)), idCol = idCol, textCol = textCol)
        .select(col(idCol), (lit(1) - col("is_dup")).as("not_dup")),
      idCol, textCol)

  /** [[curationVerdict]] with the duplicate gate widened to EVERYTHING
    * already ingested — the streaming release gate's form: a doc is a
    * duplicate when its md5 content hash appears in `seenHashes` (one
    * `content_hash` column — the stored state of every earlier batch) OR
    * an earlier (lower-id) doc of THIS batch carries it. With an empty
    * state this is exactly [[curationVerdict]]; with id-ascending
    * batches, streamed verdicts equal the one-shot batch verdict over
    * everything ingested, bit-for-bit (EventStreamSpec pins both). The
    * other four gates are row-local or frozen-seed-trained, so they need
    * no state at all.
    */
  def curationVerdictAgainst(docs: DataFrame, positive: DataFrame,
                             negative: DataFrame, seenHashes: DataFrame,
                             idCol: String = "doc_id",
                             textCol: String = "text"): DataFrame = {
    val inBatch = Dedup.exact(docs.select(col(idCol), col(textCol)),
      idCol = idCol, textCol = textCol)
    val seen = seenHashes.select(col("content_hash")).distinct()
      .withColumn("__seen", lit(1))
    val notDup = inBatch.join(seen, Seq("content_hash"), "left")
      .select(col(idCol),
        when(col("is_dup") === 1 || col("__seen").isNotNull, 0)
          .otherwise(1).as("not_dup"))
    curationCore(docs, positive, negative, notDup, idCol, textCol)
  }

  /** The four stateless gates + the supplied duplicate flags -> bitmask. */
  private def curationCore(docs: DataFrame, positive: DataFrame,
                           negative: DataFrame, notDup: DataFrame,
                           idCol: String, textCol: String): DataFrame = {
    def pick(rules: Seq[(String, Column)], name: String): Column =
      rules.find(_._1 == name).get._2
    val d = docs.select(col(idCol), col(textCol))
    val gop = d.select(col(idCol),
      pick(TextFunctions.gopherRules(col(textCol)), "gopher_keep").as("g_keep"))
    val c4k = d.select(col(idCol),
      pick(TextFunctions.c4Rules(col(textCol)), "c4_keep").as("c_keep"))
    val nb = QualityClassifier.nbLogOdds(docs, positive = positive, negative = negative,
        idCol = idCol, textCol = textCol)
      .select(col(idCol), (col("logodds_fp") >= 0L).cast("int").as("nb_pos"))
    val ent = LmScore.tokenEntropy(d, idCol = idCol, textCol = textCol)
      .select(col(idCol), when(col("n_tokens") > 0L &&
        col("entropy_fp") >= col("n_tokens") *
          lit(graft.functions.PinnedMath.FpScale), 1).otherwise(0).as("entropy_ok"))
    d.select(col(idCol))
      .join(gop, idCol).join(c4k, idCol).join(nb, idCol)
      .join(ent, idCol).join(notDup, idCol)
      .withColumn("fail_mask",
        (lit(1) - col("g_keep")) + (lit(1) - col("c_keep")) * 2 +
          (lit(1) - col("nb_pos")) * 4 + (lit(1) - col("entropy_ok")) * 8 +
          (lit(1) - col("not_dup")) * 16)
      .withColumn("keep", (col("fail_mask") === 0).cast("int"))
  }

  /** The CONTAMINATION verdict: all four leak gates — verbatim n-gram,
    * substring, MinHash fuzzy, and (when embeddings are supplied)
    * embedding-space — joined into one per-train-doc report with a
    * method bitmask (1=ngram, 2=substring, 4=fuzzy, 8=embedding).
    * `trainEmb`/`benchEmb` carry (vec_id matching the doc ids, vec);
    * omit them to run the three text gates only (the embedding bit
    * then never sets).
    */
  def contaminationVerdict(train: DataFrame, bench: DataFrame,
                           trainEmb: Option[DataFrame] = None,
                           benchEmb: Option[DataFrame] = None,
                           minLen: Int = 48, k: Int = 16,
                           fuzzyThreshold: Double = 0.5,
                           embedThreshold: Double = 0.3,
                           idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    require(trainEmb.isDefined == benchEmb.isDefined,
      "supply both embedding sides or neither")
    val ng = Contamination.check(train, bench, idCol = idCol, textCol = textCol)
      .select(col(idCol), col("contaminated").as("ngram_hit"))
    val sub = Contamination.substringContamination(train, bench,
        minLen = minLen, k = k, idCol = idCol, textCol = textCol)
      .select(col(idCol), lit(1).as("substr_hit"))
    val fz = Contamination.fuzzyContamination(train, bench,
        threshold = fuzzyThreshold, idCol = idCol, textCol = textCol)
      .select(col(idCol), lit(1).as("fuzzy_hit"))
    val em = (trainEmb, benchEmb) match {
      case (Some(te), Some(be)) =>
        SimilaritySearch.crossNearDup(te, be, threshold = embedThreshold)
          .select(col("vec_id").as(idCol)).distinct()
          .withColumn("embed_hit", lit(1))
      case _ =>
        train.sparkSession.emptyDataFrame
          .withColumn(idCol, lit(null).cast("long"))
          .withColumn("embed_hit", lit(1))
    }
    train.select(col(idCol))
      .join(ng, Seq(idCol), "left").join(sub, Seq(idCol), "left")
      .join(fz, Seq(idCol), "left").join(em, Seq(idCol), "left")
      .select(col(idCol),
        coalesce(col("ngram_hit"), lit(0)).as("ngram_hit"),
        coalesce(col("substr_hit"), lit(0)).as("substr_hit"),
        coalesce(col("fuzzy_hit"), lit(0)).as("fuzzy_hit"),
        coalesce(col("embed_hit"), lit(0)).as("embed_hit"))
      .withColumn("method_mask", col("ngram_hit") + col("substr_hit") * 2
        + col("fuzzy_hit") * 4 + col("embed_hit") * 8)
      .withColumn("clean", (col("method_mask") === 0).cast("int"))
  }
}
