package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{ByteType, DecimalType, IntegerType, LongType, ShortType}
import org.apache.spark.storage.StorageLevel

import graft.functions.TextFunctions._

/** Document deduplication for training-data pipelines, four ways:
  *
  *  - [[exact]]           — content-hash groupBy (byte-identical dups)
  *  - [[ngramJaccardPairs]] — exact n-gram Jaccard via a shingle
  *    inverted-index join (no signatures; exact but superlinear)
  *  - [[minhashLshPairs]] — MinHash signatures + banded LSH bucket join,
  *    then exact-Jaccard verification of candidates (the 100 TB path)
  *  - [[simhashPairs]]    — 30-bit SimHash + pigeonhole-banded Hamming join
  *
  * All signature computation is row-local Column math from
  * [[graft.functions.TextFunctions]]; the only shuffles are the intentional
  * candidate-generation joins, which shuffle short (key, doc_id) rows — never
  * document text. Reference scope: the reference system has no dedup
  * operators; these are the scale extensions its feature-store pipelines
  * would need upstream (SURVEY.md §7.4).
  *
  * Cache lifecycle: the near-dup operators persist their shingle-set stage
  * (it feeds 2-3 downstream consumers). The cached blocks live until Spark's
  * LRU evicts them or the session ends — sized for batch-job lifecycles. A
  * long-lived session driving many corpora can pass
  * `storage = StorageLevel.NONE` to skip the persist entirely (trading
  * recomputation for zero cache residency), or call
  * `spark.sharedState.cacheManager.clearCache()` between runs (or recreate
  * the session) to reclaim disk-spilled blocks.
  */
object Dedup {

  import Caching.maybePersist

  /** Exact dedup: every doc annotated with its content group's keeper (min
    * doc_id) and group size. One shuffle on the md5 content hash; at scale
    * this is the standard first pass before any near-dup method.
    */
  def exact(docs: DataFrame, idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    val h = md5(col(textCol).cast("binary"))
    val w = Window.partitionBy(h)
    docs
      .withColumn("content_hash", h)
      .withColumn("keeper_id", min(col(idCol)).over(w))
      .withColumn("group_size", count(lit(1)).over(w))
      .withColumn("is_dup", (col(idCol) =!= col("keeper_id")).cast("int"))
      .select(col(idCol), col("content_hash"), col("keeper_id"), col("group_size"), col("is_dup"))
  }

  /** URL dedup — the step BEFORE any content pass in a web-corpus
    * pipeline (C4/CCNet drop re-crawls of the same page by URL): group by
    * the [[graft.functions.TextFunctions.canonicalizeUrl]] canonical form
    * (case-folded scheme/host, default ports and fragments and tracking
    * params dropped, surviving params sorted, trailing-slash normalized),
    * keep the lowest id per page. Strictly cheaper than any content
    * dedup: one shuffle of (canonical-url, id) rows, no text read at all.
    * Output: (idCol, canonical_url, keeper_id, group_size, is_dup) for
    * every input row — [[exact]]'s exact shape on the URL key.
    */
  def urlDedup(docs: DataFrame, urlCol: String = "url",
               idCol: String = "doc_id"): DataFrame =
    urlDedupFromState(docs, urlState(docs, urlCol, idCol), urlCol, idCol)

  /** URL dedup's appendable STATE: one (canonical_url, keeper_id,
    * group_size) row per distinct page — sum/min-mergeable, so shard
    * ingest appends without re-reading stored corpora and the report
    * off merged state equals the one-shot recompute bit-for-bit
    * (provided shard ids are increasing, keeper = global min id — the
    * first-write-wins semantics every incremental gate here uses).
    */
  def urlState(docs: DataFrame, urlCol: String = "url",
               idCol: String = "doc_id"): DataFrame =
    docs.select(urlKeyOrRaise(urlCol).as("canonical_url"), col(idCol))
      .groupBy(col("canonical_url"))
      .agg(min(col(idCol)).as("keeper_id"), count(lit(1)).as("group_size"))

  /** A NULL url has no page identity: it would land in a NULL-key group
    * that equi-joins can never match (the report's state join would then
    * misreport it as "not in state") — fail loudly per-row instead, the
    * packChunks NULL-id rule.
    */
  private def urlKeyOrRaise(urlCol: String) =
    when(col(urlCol).isNull,
      raise_error(lit("urlDedup: NULL url has no page identity")))
      .otherwise(graft.functions.TextFunctions.canonicalizeUrl(col(urlCol)))

  /** Fold a new shard's pages into stored state — only the shard
    * canonicalizes; the merge is one min/sum per touched page.
    */
  def incrementUrlState(state: DataFrame, shard: DataFrame,
                        urlCol: String = "url",
                        idCol: String = "doc_id"): DataFrame =
    state.unionByName(urlState(shard, urlCol, idCol))
      .groupBy(col("canonical_url"))
      .agg(min(col("keeper_id")).as("keeper_id"),
        sum(col("group_size")).as("group_size"))

  /** Collapse PERSISTED per-shard state partials into the merged page
    * state: shards append their own [[urlState]] rows (append-only — an
    * overwrite would read-and-clobber the same path), and this re-groups
    * at read. `dropDuplicates()` first makes a crashed append's retry
    * idempotent: a shard's partial rows are a deterministic pure
    * function of the shard, and identical rows can never come from two
    * DIFFERENT shards (disjoint ids give each shard distinct keepers).
    */
  def normalizeUrlState(raw: DataFrame): DataFrame =
    raw.dropDuplicates()
      .groupBy(col("canonical_url"))
      .agg(min(col("keeper_id")).as("keeper_id"),
        sum(col("group_size")).as("group_size"))

  /** The per-row report read off (possibly incrementally grown) state —
    * [[urlDedup]]'s one code path. Caller contract: every doc's page
    * must be IN the state (fold the shard in first); a missing page
    * raises per-row instead of silently dropping the doc from the
    * report (the substringPairsIncremental hazard, made loud here).
    */
  def urlDedupFromState(docs: DataFrame, state: DataFrame,
                        urlCol: String = "url",
                        idCol: String = "doc_id"): DataFrame =
    docs.select(col(idCol), urlKeyOrRaise(urlCol).as("canonical_url"))
      .join(state, Seq("canonical_url"), "left")
      .select(col(idCol), col("canonical_url"),
        when(col("keeper_id").isNull, raise_error(concat(
            lit("urlDedupFromState: page not in state for "),
            col(idCol).cast("string"),
            lit(" — fold the shard into the state first"))))
          .otherwise(col("keeper_id")).as("keeper_id"),
        col("group_size"),
        (col(idCol) =!= col("keeper_id")).cast("int").as("is_dup"))

  /** [[exact]] with a QUALITY-aware keeper: among byte-identical rows, keep
    * the one with the highest `scoreCol` (ties to the lowest id) instead of
    * blindly the lowest id — the variant that matters when duplicates
    * differ in METADATA (crawl date, source trust, attached license): the
    * content is the same, but which ROW survives decides what downstream
    * joins see. Same single content-hash shuffle as [[exact]]; the keeper
    * choice is one max_by of a (score, -id) struct — a combinable
    * aggregate, never a per-group sort.
    */
  def exactKeepBest(docs: DataFrame, scoreCol: String, idCol: String = "doc_id",
                    textCol: String = "text"): DataFrame = {
    val h = md5(col(textCol).cast("binary"))
    val w = Window.partitionBy(h)
    docs
      .withColumn("content_hash", h)
      // max_by over the window: greatest (has_score, score, -id) struct —
      // the leading boolean makes a NULL score lose to ANY non-null score,
      // including a genuine -Infinity (a coalesce floor would tie them),
      // and the id tiebreak keeps the choice deterministic
      .withColumn("__best", max(struct(
        col(scoreCol).isNotNull.as("has"),
        coalesce(col(scoreCol), lit(0.0)).as("s"),
        (-col(idCol)).as("negid"))).over(w))
      .withColumn("keeper_id", -col("__best.negid"))
      .withColumn("group_size", count(lit(1)).over(w))
      .withColumn("is_dup", (col(idCol) =!= col("keeper_id")).cast("int"))
      .select(col(idCol), col(scoreCol), col("content_hash"), col("keeper_id"),
        col("group_size"), col("is_dup"))
  }

  /** Cluster assignment: the step that turns near-dup PAIRS into dedup's
    * actual deliverable — which docs to drop. Connected components over the
    * candidate-pair graph by iterative min-label propagation: every node
    * starts labeled with its own id; each round a node adopts the minimum of
    * its own label and its neighbors' labels. The minimum id of a component
    * spreads outward one hop per round (BFS from the keeper), so the loop
    * converges in at most ecc(min-node) <= diameter rounds — near-dup
    * components are short chains in practice, so typically 2-4. Iterations
    * are bounded by `maxIter`; a non-converged exit LOGS loudly and returns
    * the partial labels (never a silent cap).
    *
    * Scale shape: the edge list (near-dup pairs) is tiny relative to the
    * corpus; each round shuffles (id, label) rows on id — the same key both
    * joins use. Each round's labels are `localCheckpoint`ed LAZILY: the
    * logical plan truncates to the checkpointed RDD immediately (a plain
    * persist leaves the logical plan nesting one level per round, so
    * analysis cost grows quadratically and a deep iteration overflows the
    * analyzer's stack), and the round's one convergence action — the label
    * sum, or the changed-label join for non-numeric ids — is what
    * materializes it, so each round runs exactly ONE Spark job where the
    * eager form ran two (checkpoint job + sum job). On a multi-executor
    * cluster prefer reliable `checkpoint()` (localCheckpoint blocks are
    * lost with an executor); the loop structure is unchanged.
    *
    * Output reuses [[exact]]'s keeper semantics: every doc in `docs` gets a
    * row — singletons form their own cluster — with cluster_id = min doc id
    * of its component, the component size (docs-only members), and
    * is_dup = 1 for every member except the keeper. Pair endpoints absent
    * from `docs` conduct merges (a-x, x-b clusters a with b even when x was
    * filtered out) but never appear as rows, keepers, or size counts.
    */
  def assignClusters(docs: DataFrame, pairs: DataFrame,
                     idCol: String = "doc_id", maxIter: Int = 20,
                     storage: StorageLevel = StorageLevel.MEMORY_AND_DISK): DataFrame = {
    // distinct: dirty inputs may repeat a doc id; without it the final
    // join would duplicate output rows and inflate cluster_size
    val nodes = docs.select(col(idCol).as("id")).distinct()
    val (edges, ownsEdgesCache) = Caching.persistIfNew(
      pairs.select(col("id_a").as("src"), col("id_b").as("dst"))
        .union(pairs.select(col("id_b").as("src"), col("id_a").as("dst"))),
      storage)
    // Labels iterate over PAIR-GRAPH NODES ONLY (both endpoints of every
    // edge — including conduits outside `docs`: a-x, x-b with x filtered
    // out must still cluster a with b). Singleton docs never change label,
    // so carrying them through every round would only inflate each
    // round's shuffle from |graph| to |corpus| — at dedup rates the graph
    // is a small fraction of the corpus, and the full doc set joins the
    // converged labels exactly once below.
    val endpoints = edges.select(col("src").as("id"))
    // LAZY localCheckpoint: truncates the logical plan now; the round's
    // convergence action below materializes it — see scaladoc. Old rounds'
    // blocks are released by the ContextCleaner once unreferenced.
    var labels = endpoints.distinct()
      .select(col("id"), col("id").as("label")).localCheckpoint(false)
    // Convergence, numeric ids: labels only ever DECREASE, so the (exact,
    // decimal — long ids could overflow a bigint sum) label total strictly
    // drops on any change; a stable total means a fixpoint. One
    // map-side-combinable aggregate over the already-checkpointed round —
    // no join, no second shuffle of the label set. The sum trick is ONLY
    // sound for numeric ids: a non-numeric label cast to decimal throws
    // under ANSI mode but yields NULL in a non-ANSI session, where both
    // sums would read as zero and the loop would "converge" after one
    // round with partial clusters — so non-numeric ids take the
    // type-agnostic changed-label join below instead.
    val idIsNumeric = nodes.schema("id").dataType match {
      case ByteType | ShortType | IntegerType | LongType => true
      // a SCALED decimal would ROUND under cast to decimal(38,0) — distinct
      // labels could collide in the sum and fake a fixpoint; only scale-0
      // decimals ride the sum path
      case d: DecimalType if d.scale == 0 => true
      case _ => false
    }
    def labelSum(df: DataFrame): java.math.BigDecimal =
      // empty frame -> sum is SQL NULL -> treat as zero (empty input is a
      // fixpoint, not an NPE)
      Option(df.agg(sum(col("label").cast("decimal(38,0)"))).head().getDecimal(0))
        .getOrElse(java.math.BigDecimal.ZERO)
    var prevSum = if (idIsNumeric) labelSum(labels) else java.math.BigDecimal.ZERO
    var converged = false
    var it = 0
    while (!converged && it < maxIter) {
      val viaEdges = edges.join(labels.select(col("id").as("src"), col("label")), "src")
        .select(col("dst").as("id"), col("label"))
      val next = labels.select(col("id"), col("label")).union(viaEdges)
        .groupBy(col("id")).agg(min(col("label")).as("label"))
        .localCheckpoint(false)
      converged =
        if (idIsNumeric) {
          val nextSum = labelSum(next)
          val same = nextSum.compareTo(prevSum) == 0
          prevSum = nextSum
          same
        } else {
          // exact for ANY id type: a fixpoint means no node's label moved.
          // Costs a co-keyed join of two checkpointed label sets per round
          // (vs the numeric path's single aggregate); both sides are
          // (id, label) rows, never documents.
          next.join(labels.withColumnRenamed("label", "prev_label"), "id")
            .where(col("label") =!= col("prev_label")).isEmpty
        }
      labels = next
      it += 1
    }
    if (!converged)
      org.slf4j.LoggerFactory.getLogger(getClass).warn(
        s"assignClusters stopped after maxIter=$maxIter rounds WITHOUT converging; " +
          "labels are partial (some components carry a non-minimal cluster_id). " +
          "Raise maxIter above the pair graph's diameter.")
    if (ownsEdgesCache) edges.unpersist()
    // Restrict to the documented population: only docs get rows, sizes
    // count docs-only members, and the keeper is the min DOC id of the
    // component — a phantom conduit may hold the component's min label but
    // can never be a keeper (when pairs ⊆ docs, min doc id == label and
    // this is the identity). Docs outside the pair graph are singletons:
    // their own id is their label (the left join's coalesce arm).
    val docLabels = nodes.join(labels, Seq("id"), "left")
      .select(col("id"), coalesce(col("label"), col("id")).as("label"))
    val keepers = docLabels.groupBy(col("label"))
      .agg(min(col("id")).as("cluster_id"), count(lit(1)).as("cluster_size"))
    docLabels.join(keepers, "label")
      .select(col("id").as(idCol), col("cluster_id"), col("cluster_size"),
        (col("id") =!= col("cluster_id")).cast("int").as("is_dup"))
  }

  /** The ids that SURVIVE MinHash-LSH near-dup clustering: one `doc_id`
    * column, exactly the component keepers of [[minhashLshPairs]]'s pair
    * graph under [[assignClusters]]. The standard "deduped corpus" filter —
    * shared by the q38 corpus-prep query and [[CorpusPipeline.prepare]] so
    * the keeper definition can't drift between them.
    */
  def minhashKeepers(docs: DataFrame, idCol: String = "doc_id"): DataFrame =
    assignClusters(docs, minhashLshPairs(docs, idCol = idCol).select("id_a", "id_b"), idCol = idCol)
      .filter(col("is_dup") === 0).select(col(idCol))

  /** Per-doc shingle-hash set: (id, hashes array). Row-local; reused by the
    * exact and LSH variants.
    */
  private def withShingleHashes(docs: DataFrame, idCol: String, textCol: String, n: Int): DataFrame =
    docs.select(col(idCol).as("id"), shingleHashes(col(textCol), n).as("hashes"))
      .filter(size(col("hashes")) > 0)

  /** Corpus self-duplication PROFILE (Lee et al. 2022, "Deduplicating
    * Training Data Makes Language Models Better", §4's measurement side):
    * for every document, how much of its content also appears elsewhere in
    * the corpus? Reports the doc's distinct n-gram shingles (`n_shingles`),
    * how many of those occur in at least one OTHER document (`n_dup`), the
    * ratio, and the doc's maximum shingle document-frequency (`max_df` —
    * 1 means fully unique; a huge value means the doc is built from
    * corpus-wide boilerplate). Dedup operators DECIDE (drop/keep); this
    * MEASURES — the audit a team runs to size the duplication problem and
    * rank sources by boilerplate before choosing thresholds.
    *
    * Scale shape: one shingle pass (row-local native kernel), a df count
    * on the content-uniform hash key, a posting-side join back, and one
    * combinable per-doc aggregate — two shuffles of short rows, no pair
    * joins, nothing quadratic; this runs strictly cheaper than any dedup
    * pass over the same corpus. Docs with < n tokens have no shingles and
    * are excluded (the dedup population rule).
    */
  def duplicationProfile(docs: DataFrame, n: Int = 3,
                         idCol: String = "doc_id", textCol: String = "text"): DataFrame =
    duplicationProfileFromPostings(shinglePostings(docs, n, idCol, textCol), idCol)

  /** The duplication profile's appendable STATE: one (id, h) row per
    * DISTINCT shingle hash per doc. Exact and union-mergeable (a doc's
    * rows are independent of every other doc), so shards append without
    * re-shingling stored corpora and the profile read off merged state
    * equals the one-shot recompute bit-for-bit — the [[Vocabulary]] /
    * klState argument, carried to [[graft.operators.CorpusCard]]'s
    * incremental form.
    */
  def shinglePostings(docs: DataFrame, n: Int = 3,
                      idCol: String = "doc_id", textCol: String = "text"): DataFrame =
    withShingleHashes(docs, idCol, textCol, n)
      .select(col("id"), explode(col("hashes")).as("h"))

  /** The profile read off (possibly incrementally grown) postings.
    * shingleHashes emits DISTINCT hashes per doc, so count(*) per hash =
    * document frequency.
    */
  def duplicationProfileFromPostings(posting: DataFrame,
                                     idCol: String = "doc_id"): DataFrame = {
    val dfreq = posting.groupBy(col("h")).agg(count(lit(1)).as("df"))
    posting.join(dfreq, Seq("h"))
      .groupBy(col("id"))
      .agg(count(lit(1)).as("n_shingles"),
        sum(when(col("df") > 1L, 1L).otherwise(0L)).as("n_dup"),
        max(col("df")).as("max_df"))
      .select(col("id").as(idCol), col("n_shingles"), col("n_dup"),
        round(col("n_dup") / col("n_shingles"), 6).as("dup_ratio"),
        col("max_df"))
  }

  /** Join a candidate-pair set (id_a < id_b) back to the shingle sets and
    * keep pairs with exact Jaccard >= threshold. The per-pair intersection
    * runs in the native sorted-merge kernel ([[jaccardSorted]]) — the
    * shingle arrays arrive sorted from [[graft.functions.ShingleHashes]].
    */
  private def verifyJaccard(pairs: DataFrame, sets: DataFrame, threshold: Double): DataFrame =
    pairs
      .join(sets.select(col("id").as("id_a"), col("hashes").as("h_a")), "id_a")
      .join(sets.select(col("id").as("id_b"), col("hashes").as("h_b")), "id_b")
      .withColumn("jaccard", round(jaccardSorted(col("h_a"), col("h_b")), 6))
      .filter(col("jaccard") >= threshold)
      .select(col("id_a"), col("id_b"), col("jaccard"))

  /** Exact n-gram Jaccard near-dup pairs via a PREFIX-FILTERED inverted
    * index (the SSJoin/PPJoin prefix principle): order each doc's shingles
    * by global document frequency ascending (rarest first), and index only
    * the first `|S| - ceil(t*|S|) + 1` shingles per doc. Any pair with
    * Jaccard >= t must share a shingle inside BOTH prefixes, so the filter
    * is lossless — but a shingle shared by d documents no longer yields d^2
    * candidate rows unless it survives into prefixes, which high-df
    * shingles (the d^2 offenders) by construction do not: they sort last.
    *
    * Candidates are then verified with exact Jaccard on the full shingle
    * sets, so the output is identical to the naive all-sharing-pairs join.
    * The shingle-set stage is persisted: it feeds the prefix index and both
    * sides of the verify join (3 consumers; at 100 TB this materialization
    * is a deliberate pipeline stage, not an optimization detail).
    */
  def ngramJaccardPairs(docs: DataFrame, n: Int = 3, threshold: Double = 0.8,
                        idCol: String = "doc_id", textCol: String = "text",
                        storage: StorageLevel = StorageLevel.MEMORY_AND_DISK): DataFrame = {
    val sets = maybePersist(withShingleHashes(docs, idCol, textCol, n), storage)
    val posting = sets.select(
      col("id"), size(col("hashes")).as("m"), explode(col("hashes")).as("h"))
    val dfreq = posting.groupBy(col("h")).agg(count(lit(1)).as("df"))
    // Prefix bound with an epsilon guard: for thresholds whose double
    // representation rounds UP, t_d * m could land just above an exact
    // integer t*m and ceil() would then shorten the prefix — dropping pairs
    // at exactly the threshold. Subtracting 1e-9 means FP error can only
    // LENGTHEN the prefix (still lossless, a few extra candidates at most).
    val prefix = posting.join(dfreq, "h")
      .withColumn("__rnk",
        row_number().over(Window.partitionBy(col("id")).orderBy(col("df"), col("h"))))
      .filter(col("__rnk") <= col("m") - ceil(lit(threshold) * col("m") - lit(1e-9)) + lit(1))
      .select(col("id"), col("h"))
    val candidates = prefix.as("a").join(prefix.as("b"),
        col("a.h") === col("b.h") && col("a.id") < col("b.id"))
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"))
      .distinct()
    verifyJaccard(candidates, sets, threshold)
  }

  /** MinHash + LSH near-dup pairs: k=16 signature, 4 bands of 4 rows; docs
    * agreeing on any band bucket become candidates; candidates verified by
    * exact Jaccard on the shingle sets.
    *
    * Scale shape: signatures are row-local; the bucket join shuffles 4 short
    * rows per doc keyed by (band, 4-minhash key) — at 100 TB the bucket join
    * is the only wide stage, its key space is huge (few collisions beyond
    * true near-dups), and AQE handles residual bucket skew. The verify join
    * re-shuffles only the candidate pairs (tiny relative to the corpus).
    */
  def minhashLshPairs(docs: DataFrame, n: Int = 3, threshold: Double = 0.8,
                      idCol: String = "doc_id", textCol: String = "text",
                      storage: StorageLevel = StorageLevel.MEMORY_AND_DISK): DataFrame = {
    // Persisted: consumed by the signature stage and both sides of the
    // verify join — without it the whole tokenize/shingle/hash front runs 3x.
    val sets = maybePersist(withShingleHashes(docs, idCol, textCol, n), storage)
    lshPairsAmong(sets.withColumn("sig", minhashSignature(col("hashes"))), threshold)
  }

  /** MinHash-LSH near-dup pairs AMONG one signatures frame (id_a < id_b on
    * the bucket self-join — the self case must not ride the probe-vs-index
    * formulation, whose `!=` join would emit every candidate twice before
    * the distinct). [[minhashLshPairs]] = [[signatures]] + this;
    * [[CorpusPipeline.buildState]] calls it directly on a stored-shape
    * signatures frame.
    */
  def lshPairsAmong(sigs: DataFrame, threshold: Double = 0.8): DataFrame = {
    val buckets = bandBuckets(sigs)
    val candidates = buckets.as("a").join(buckets.as("b"),
        col("a.band") === col("b.band") && col("a.key") === col("b.key") &&
          col("a.id") < col("b.id"))
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"))
      .distinct()
    verifyJaccard(candidates, sigs.select(col("id"), col("hashes")), threshold)
  }

  /** The PERSISTABLE dedup state of a corpus (or shard): one row per doc
    * with >= 1 shingle — (id, hashes: the distinct shingle-hash set,
    * sig: the MinHash signature). Everything the LSH pipeline ever needs
    * from the TEXT lives here, so an incremental run
    * ([[lshPairsFromSignatures]], [[CorpusPipeline.incrementState]]) never
    * re-reads or re-shingles previously ingested documents.
    */
  def signatures(docs: DataFrame, n: Int = 3,
                 idCol: String = "doc_id", textCol: String = "text"): DataFrame =
    withShingleHashes(docs, idCol, textCol, n)
      .withColumn("sig", minhashSignature(col("hashes")))

  /** (id, band, key) LSH bucket rows of a signatures frame. */
  private[operators] def bandBuckets(sigs: DataFrame): DataFrame = {
    val bandKeys: Column = array((0 until LshBands).map { b =>
      struct(lit(b).as("band"), lshBandKey(col("sig"), b).as("key"))
    }: _*)
    sigs.select(col("id"), explode(bandKeys).as("bk"))
      .select(col("id"), col("bk.band").as("band"), col("bk.key").as("key"))
  }

  /** MinHash-LSH near-dup pairs between a PROBE signature set and an INDEX
    * signature set — the incremental formulation: probe = the new shard,
    * index = all signatures (stored ∪ new), and the result is exactly the
    * full-corpus pairs that touch at least one probe doc. Pairs are
    * normalized (id_a = least, id_b = greatest) and verified with exact
    * Jaccard on the index's shingle sets, so
    * `storedPairs ∪ lshPairsFromSignatures(newSigs, allSigs)` equals
    * `minhashLshPairs(old ∪ new)` row for row (IncrementalCorpusSpec pins
    * it). Probe ⊆ index is required (probe docs must be verifiable).
    */
  def lshPairsFromSignatures(probe: DataFrame, index: DataFrame,
                             threshold: Double = 0.8): DataFrame = {
    val candidates = bandBuckets(probe).as("a").join(bandBuckets(index).as("b"),
        col("a.band") === col("b.band") && col("a.key") === col("b.key") &&
          col("a.id") =!= col("b.id"))
      .select(least(col("a.id"), col("b.id")).as("id_a"),
        greatest(col("a.id"), col("b.id")).as("id_b"))
      .distinct()
    verifyJaccard(candidates, index.select(col("id"), col("hashes")), threshold)
  }

  /** Per-doc 30-bit SimHash: weighted sign-sum over token hashes, weight =
    * token frequency in the doc. Computed entirely map-side by the native
    * [[graft.functions.SimHash]] expression — no shuffle; token-less docs
    * drop out (null hash), matching the aggregation formulation's explode.
    */
  def simhash(docs: DataFrame, idCol: String = "doc_id", textCol: String = "text"): DataFrame =
    docs.select(col(idCol).as("id"),
        graft.functions.SimHash.simhash(col(textCol)).as("simhash"))
      .filter(col("simhash").isNotNull)

  /** The two-stage aggregation formulation (token explode -> per-bit
    * explode -> sign sums), kept ONLY as the parity witness for the native
    * expression (DedupSpec asserts identical hashes). Two shuffles whose
    * volume is a multiple of the corpus token count — never the scale path.
    */
  def simhashViaAggregation(docs: DataFrame, idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    val tokenCounts = docs
      .select(col(idCol).as("id"), explode(tokens(col(textCol))).as("tok"))
      .groupBy(col("id"), col("tok"))
      .agg(count(lit(1)).as("cnt"))
      .withColumn("th", polyHash(col("tok")))
    val bitSums = tokenCounts
      .select(col("id"), explode(sequence(lit(0), lit(SimhashBits - 1))).as("bit"),
        col("cnt"), col("th"))
      .withColumn("contrib",
        when(expr("(shiftright(th, bit) & 1)") === 1, col("cnt")).otherwise(-col("cnt")))
      .groupBy(col("id"), col("bit"))
      .agg(sum(col("contrib")).as("s"))
    bitSums
      .groupBy(col("id"))
      .agg(sum(when(col("s") > 0, expr("shiftleft(CAST(1 AS BIGINT), bit)")).otherwise(0L)).as("simhash"))
  }

  /** SimHash near-dup pairs with Hamming distance <= maxHamming, using a
    * pigeonhole-banded join: the 30 bits are cut into 4 blocks (8/8/8/6);
    * any pair within Hamming distance 3 must agree exactly on at least one
    * block, so joining per-block finds all such pairs without a quadratic
    * cross product. Exactness of the band prefilter requires
    * maxHamming < number of blocks.
    */
  def simhashPairs(docs: DataFrame, maxHamming: Int = 3,
                   idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    require(maxHamming < 4, "pigeonhole bands (4 blocks) are only exact for maxHamming <= 3")
    val sh = simhash(docs, idCol, textCol)
    val blockKeys = array((0 until 4).map { k =>
      struct(lit(k).as("blk"), expr(s"shiftright(simhash, ${k * 8}) & 255").as("key"))
    }: _*)
    val blocks = sh.select(col("id"), col("simhash"), explode(blockKeys).as("bk"))
      .select(col("id"), col("simhash"), col("bk.blk").as("blk"), col("bk.key").as("key"))
    blocks.as("a").join(blocks.as("b"),
        col("a.blk") === col("b.blk") && col("a.key") === col("b.key") &&
          col("a.id") < col("b.id"))
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"),
        expr("bit_count(a.simhash ^ b.simhash)").as("hamming"))
      .distinct()
      .filter(col("hamming") <= maxHamming)
  }

  /** Corpus-wide SEGMENT-level dedup with document reassembly — the
    * sub-document pass web-corpus recipes run after whole-doc dedup:
    * boilerplate (nav bars, cookie banners, license headers) repeats
    * across millions of pages whose full texts are all distinct, so
    * whole-doc methods never see it. Split every document on `delimiter`
    * (paragraphs for `"\n\n"`, lines for `"\n"`), keep only the FIRST
    * corpus-wide occurrence of each distinct segment (ordered by
    * (document id, position) — deterministic, replayable), and rebuild
    * each document from its surviving segments in original order.
    *
    * Output: one row per input document — (idCol, n_segments, n_kept,
    * n_dropped, text_dedup). A document whose every segment appeared
    * earlier comes back with n_kept = 0 and an empty rebuilt text (the
    * caller's gate decides whether to drop it — this operator never loses
    * the row).
    *
    * Scale shape: the keeper choice shuffles (segment, id, pos) rows keyed
    * by the segment — content-uniform by construction, same key discipline
    * as [[exact]] — and each segment's window frame is its duplicate
    * count, never the corpus. Reassembly is one combinable-input groupBy
    * on the document id; the per-doc collect is bounded by segments per
    * document (a document's own size), not corpus size. Segment text
    * crosses the wire once — unavoidable for a global first-occurrence
    * rule — but documents are never compared pairwise and nothing is
    * quadratic.
    */
  def dedupSegments(docs: DataFrame, idCol: String = "doc_id",
                    textCol: String = "text", delimiter: String = "\n\n"): DataFrame =
    rebuildDocs(docs, firstOccurrence(segmented(docs, idCol, textCol, delimiter)),
      idCol, textCol, delimiter)

  /** The PERSISTABLE segment-dedup state: one row per DISTINCT segment seen
    * so far — (seg_hash, first_id, first_pos), the md5 fingerprint plus its
    * first owner for audit. GBs of boilerplate text collapse to fixed-width
    * hash rows; [[dedupSegmentsIncremental]] needs only membership, so
    * stored shards' raw text is never rescanned (the same
    * state-table discipline as [[signatures]]/CorpusPipeline). Built by one
    * combinable min aggregate keyed on the hash.
    */
  def segmentState(docs: DataFrame, idCol: String = "doc_id",
                   textCol: String = "text", delimiter: String = "\n\n"): DataFrame =
    segmented(docs, idCol, textCol, delimiter)
      .groupBy(md5(col("seg").cast("binary")).as("seg_hash"))
      .agg(min(struct(col("__sd_id").as("first_id"), col("pos").as("first_pos"))).as("__o"))
      .select(col("seg_hash"), col("__o.first_id").as("first_id"),
        col("__o.first_pos").as("first_pos"))

  /** The state rows a new shard ADDS: its first-occurrence segments not in
    * `state`. Append the result to the stored state table and the chain
    * continues — state grows by distinct NEW segments only.
    */
  def incrementSegmentState(docs: DataFrame, state: DataFrame,
                            idCol: String = "doc_id", textCol: String = "text",
                            delimiter: String = "\n\n"): DataFrame =
    segmentState(docs, idCol, textCol, delimiter)
      .join(state.select(col("seg_hash").as("__st_h")),
        col("seg_hash") === col("__st_h"), "left_anti")

  /** [[dedupSegments]] for a NEW shard against a stored [[segmentState]]:
    * a segment survives iff its hash is absent from the state AND this is
    * its first occurrence within the shard. When shard ids sort after every
    * stored id (the append-only ingest order), the output row-matches the
    * full recompute over (stored ∪ shard) restricted to the shard — the
    * same increment == full contract as the corpus pipeline's q49, pinned
    * by q80's oracle. The state side joins by HASH (fixed-width rows); the
    * shard's text crosses the wire once, stored shards' text never.
    */
  def dedupSegmentsIncremental(docs: DataFrame, state: DataFrame,
                               idCol: String = "doc_id", textCol: String = "text",
                               delimiter: String = "\n\n"): DataFrame = {
    val fresh = segmented(docs, idCol, textCol, delimiter)
      .join(state.select(col("seg_hash").as("__st_h")),
        md5(col("seg").cast("binary")) === col("__st_h"), "left_anti")
    rebuildDocs(docs, firstOccurrence(fresh), idCol, textCol, delimiter)
  }

  /** ASYMMETRIC containment near-dup pairs: `containment(A in B) =
    * |A ∩ B| / |A|` over the n-gram shingle sets — the snippet-in-page
    * relation symmetric Jaccard structurally misses (a paragraph quoted
    * inside a long article has tiny Jaccard but containment 1.0), and the
    * MinHash bands tuned for Jaccard can't even generate as a candidate.
    * Output is DIRECTED: one (id_a, id_b, containment) row means A's
    * shingles sit inside B at >= threshold; a mutual pair yields both
    * orientations.
    *
    * Candidates use the prefix principle adapted to containment: B must
    * hold >= t*|A| of A's shingles, so at least one of A's
    * `|A| - ceil(t*|A|) + 1` RAREST shingles appears in B — the A-side
    * prefix joins the FULL posting index (the B side cannot be
    * prefix-filtered: containment puts no lower bound on |A|/|B|).
    * Lossless, same epsilon guard as [[ngramJaccardPairs]]; the high-df
    * d² offenders still sort out of every prefix. Verification touches
    * candidates only, in the native sorted-merge kernel.
    */
  def containmentPairs(docs: DataFrame, n: Int = 3, threshold: Double = 0.8,
                       idCol: String = "doc_id", textCol: String = "text",
                       storage: StorageLevel = StorageLevel.MEMORY_AND_DISK): DataFrame = {
    val sets = maybePersist(withShingleHashes(docs, idCol, textCol, n), storage)
    val posting = sets.select(
      col("id"), size(col("hashes")).as("m"), explode(col("hashes")).as("h"))
    val dfreq = posting.groupBy(col("h")).agg(count(lit(1)).as("df"))
    val prefix = posting.join(dfreq, "h")
      .withColumn("__rnk",
        row_number().over(Window.partitionBy(col("id")).orderBy(col("df"), col("h"))))
      .filter(col("__rnk") <= col("m") - ceil(lit(threshold) * col("m") - lit(1e-9)) + lit(1))
      .select(col("id"), col("h"))
    val candidates = prefix.as("a")
      .join(posting.select(col("id"), col("h")).as("b"),
        col("a.h") === col("b.h") && col("a.id") =!= col("b.id"))
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"))
      .distinct()
    candidates
      .join(sets.select(col("id").as("id_a"), col("hashes").as("h_a")), "id_a")
      .join(sets.select(col("id").as("id_b"), col("hashes").as("h_b")), "id_b")
      .withColumn("containment", round(
        graft.functions.SortedIntersectCount
          .sortedIntersectCount(col("h_a"), col("h_b")).cast("double")
          / size(col("h_a")), 6))
      .filter(col("containment") >= threshold)
      .select(col("id_a"), col("id_b"), col("containment"))
  }

  /** EXACT long-substring pairs: documents sharing a VERBATIM passage of
    * length >= `minLen` characters — the reuse relation every set-based
    * family misses by construction: a 50-char quote inside two otherwise
    * different docs moves Jaccard ([[ngramJaccardPairs]],
    * [[minhashLshPairs]]), SimHash, and even directed containment
    * ([[containmentPairs]]) barely off zero, but it IS the thing
    * memorization audits and license-compliance sweeps look for.
    *
    * Shape (winnowing, Schleimer et al. SIGMOD'03, the MOSS algorithm):
    *  1. each doc emits its fingerprint anchors row-locally via the native
    *     [[graft.functions.WinnowFingerprints]] kernel — density ~2/(w+1)
    *     per character, never one row per position;
    *  2. anchors bucket-join on the fingerprint HASH (short (h, id, pos)
    *     rows; the text never enters this shuffle), `id_a < id_b`;
    *  3. each candidate verifies row-locally with the native
    *     [[graft.functions.CommonExtent]] kernel: check the k anchor
    *     characters (hash collisions die with extent 0), extend left and
    *     right, keep pairs with extent >= minLen. O(extent) per
    *     candidate — the first formulation here (a w-row offset spine of
    *     fixed-length substr compares) paid w*L character reads per
    *     candidate, and candidates that match only the anchor k-gram
    *     vastly outnumber true pairs (243k candidates -> 254 pairs at
    *     sf0.1: the spine made verification 80% of a 17s wall). The
    *     DuckDB twin keeps the spine EXISTS form — provably the same
    *     predicate: a shared run of length >= L through the anchor
    *     contains an aligned L-window and vice versa.
    *
    * The winnowing guarantee makes step 2 lossless for passages >= L:
    * the window covering the shared span is content-identical in both
    * docs, so both select the same minimal-hash gram. Docs shorter than L
    * emit no anchors at all. Output: (id_a, id_b, n_anchors) with
    * n_anchors = verified anchor pairs (>= 1).
    *
    * Scale: fingerprints are ~2/(w+1) of corpus characters; the hash join
    * keys are near-uniform (polynomial hash), and the spine verification
    * is bounded (w substr compares of length L per candidate). The one
    * genuinely quadratic term is a HOT BUCKET: a boilerplate passage
    * (license header, nav chrome, cookie banner) shared by n documents
    * puts n anchor rows under one hash, and the self-join emits n(n-1)/2
    * candidates from that bucket alone — at web-corpus scale n is
    * millions and the bucket is the job. `maxBucket` bounds it: anchor
    * hashes occurring more than `maxBucket` times across the corpus are
    * dropped BEFORE the join (an anti-join against the tiny hot-hash
    * set), capping any bucket's candidates at ~maxBucket^2/2.
    *
    * Recall tradeoff, stated honestly: a pair whose EVERY shared anchor
    * is corpus-hot is missed. Long shared passages select ~2/(w+1)
    * anchors per character, so real near-duplicate extents carry many
    * anchors and survive unless the entire overlap IS the boilerplate —
    * in which case dropping it is usually the curation intent (the pair
    * "shares a cookie banner", not content). `maxBucket <= 0` disables
    * the cap for exact small-corpus runs; the DuckDB oracle twin replays
    * the uncapped form, which is value-identical whenever no bucket
    * crosses the threshold (true at every test SF).
    */
  def substringPairs(docs: DataFrame, minLen: Int = 48, k: Int = 16,
                     idCol: String = "doc_id", textCol: String = "text",
                     storage: StorageLevel = StorageLevel.MEMORY_AND_DISK,
                     maxBucket: Int = 1024): DataFrame = {
    // persisted: hot-bucket counting + the self-join read the kernel output
    val fp0 = maybePersist(substringState(docs, minLen, k, idCol, textCol), storage)
    val fp = dropHotBuckets(fp0, maxBucket)
    val cand = fp.as("a")
      .join(fp.as("b"), col("a.h") === col("b.h") && col("a.id") < col("b.id"))
      .select(col("a.id").as("id_a"), col("a.pos").as("pos_a"),
        col("b.id").as("id_b"), col("b.pos").as("pos_b"))
    val texts = docs.select(col(idCol), col(textCol))
    windowVerified(cand, texts, minLen, k, idCol, textCol)
      .select(col("id_a"), col("id_b"), col("pos_a"), col("pos_b")).distinct()
      .groupBy(col("id_a"), col("id_b"))
      .agg(count(lit(1)).as("n_anchors"))
  }

  /** The bounded-window verify shared by every substring join: candidates
    * with `extent >= minLen` through their anchors, decided on
    * `2*(minLen-k)+k`-char text WINDOWS instead of whole documents.
    *
    * Why windows: the verify previously joined the FULL text of both
    * sides per candidate row, so a doc with many candidate anchors
    * re-shipped its text once per candidate through the id_b exchange —
    * the round-10 scale finding (substring_remove grew 3.6x at 10x data).
    * Each side's window now slices in the projection right after its own
    * doc-keyed text join, so only ~2*minLen chars per candidate ever
    * cross an exchange, and the kernel stays inside whole-stage codegen.
    *
    * Why the window predicate is EXACT (not a prefilter): with margin
    * m = minLen - k on each side of the anchor, the windowed extent is
    * min(left, m) + k + min(right, m); true extent >= minLen implies the
    * windowed one >= minLen (each truncated side contributes its full m
    * = (minLen-k) bound), and the windowed extent never exceeds the true
    * one — so `windowed >= minLen` iff `true >= minLen`. Returns the
    * surviving (id_a, pos_a, id_b, pos_b) rows.
    */
  private def windowVerified(cand: DataFrame, texts: DataFrame,
                             minLen: Int, k: Int,
                             idCol: String, textCol: String): DataFrame = {
    val m = minLen - k
    val winLen = 2 * m + k
    cand
      .join(texts.select(col(idCol).as("id_a"), col(textCol).as("__ta")), "id_a")
      .select(col("id_a"), col("id_b"), col("pos_a"), col("pos_b"),
        col("__ta").substr(greatest(lit(1), col("pos_a") - m), lit(winLen)).as("__wa"),
        (col("pos_a") - greatest(lit(1), col("pos_a") - m) + 1).as("__rpa"))
      .join(texts.select(col(idCol).as("id_b"), col(textCol).as("__tb")), "id_b")
      .select(col("id_a"), col("id_b"), col("pos_a"), col("pos_b"), col("__wa"), col("__rpa"),
        col("__tb").substr(greatest(lit(1), col("pos_b") - m), lit(winLen)).as("__wb"),
        (col("pos_b") - greatest(lit(1), col("pos_b") - m) + 1).as("__rpb"))
      .filter(graft.functions.CommonExtent.commonExtent(
        col("__wa"), col("__rpa"), col("__wb"), col("__rpb"), k) >= minLen)
      .select(col("id_a"), col("id_b"), col("pos_a"), col("pos_b"))
  }

  /** SPAN-REMOVAL substring dedup — the APPLY side of [[substringPairs]]
    * (Lee et al. 2022 deduplicate the text, not just flag it): every
    * verbatim passage of >= `minLen` chars that also occurs in an
    * EARLIER document (smaller id) is cut out of the later one; the first
    * occurrence keeps its text intact. Spans are computed on ORIGINAL
    * texts (the standard one-pass semantics), overlapping/adjacent spans
    * merge before cutting, and every input doc survives — clean docs with
    * their original text.
    *
    * Mechanics: the [[substringPairs]] candidate join, but the verify
    * kernel returns WHERE the extent sits
    * ([[graft.functions.CommonExtentImpl.evalSpan]] — one pass serves the
    * filter and the cut); spans merge per doc with the classic
    * running-max interval window (partitioned BY DOC — frames bounded by
    * a doc's span count, never the corpus); kept segments rebuild via a
    * per-doc sorted concat. All interval math is integer, so the oracle
    * replays the cut byte-for-byte.
    *
    * Output: (idCol, n_spans merged, chars_removed, text_clean) for EVERY
    * input doc. Scale shape: identical joins to [[substringPairs]] (the
    * hot-bucket cap applies) plus two doc-keyed windows over span rows —
    * span volume is bounded by verified-candidate volume, tiny relative
    * to the corpus.
    */
  def substringRemove(docs: DataFrame, minLen: Int = 48, k: Int = 16,
                      idCol: String = "doc_id", textCol: String = "text",
                      storage: StorageLevel = StorageLevel.MEMORY_AND_DISK,
                      maxBucket: Int = 1024): DataFrame = {
    val fp0 = maybePersist(substringState(docs, minLen, k, idCol, textCol), storage)
    val fp = dropHotBuckets(fp0, maxBucket)
    val texts = docs.select(col(idCol), col(textCol))
    // candidates oriented EARLIER -> LATER: spans cut from the later side
    val cand = fp.as("a")
      .join(fp.as("b"), col("a.h") === col("b.h") && col("a.id") < col("b.id"))
      .select(col("a.id").as("id_a"), col("a.pos").as("pos_a"),
        col("b.id").as("id_b"), col("b.pos").as("pos_b"))
    // two-stage verify: the bounded-window test ([[windowVerified]] —
    // exact for the >= minLen decision) kills the hash-collision bulk of
    // the candidates with ~2*minLen-char windows; only TRUE anchors (a
    // tiny, duplicate-mass-proportional set) join the full texts to learn
    // where their unbounded extent actually sits
    val spans = windowVerified(cand, texts, minLen, k, idCol, textCol)
      .distinct()
      .join(texts.select(col(idCol).as("id_a"), col(textCol).as("__ta")), "id_a")
      .join(texts.select(col(idCol).as("id_b"), col(textCol).as("__tb")), "id_b")
      .withColumn("__span", graft.functions.CommonExtent.commonExtentSpan(
        col("__ta"), col("pos_a"), col("__tb"), col("pos_b"), k))
      .withColumn("__left", shiftright(col("__span"), 32))
      .withColumn("__ext", col("__span").bitwiseAND(lit(4294967295L)))
      .filter(col("__ext") >= minLen)
      .select(col("id_b").as("id"),
        (col("pos_b") - col("__left")).cast("int").as("s"),
        (col("pos_b") - col("__left") + col("__ext") - 1L).cast("int").as("e"))
      .distinct()
    // classic interval merge: running max of e over earlier spans; a span
    // opens a new group only when a GAP separates it from everything
    // before (s > pmax + 1 — ADJACENT spans [a,b][b+1,c] are one removed
    // region and must count as one, per the scaladoc contract)
    val byDoc = Window.partitionBy(col("id")).orderBy(col("s"), col("e"))
    // persisted: three consumers (gaps, tails, stats) — without the pin
    // the candidate join + verify reruns per consumer
    val merged = maybePersist(spans
      .withColumn("__pmax", max(col("e")).over(byDoc.rowsBetween(Window.unboundedPreceding, -1)))
      .withColumn("__new", when(col("__pmax").isNull || col("s") > col("__pmax") + 1, 1).otherwise(0))
      .withColumn("__grp", sum(col("__new")).over(byDoc.rowsBetween(Window.unboundedPreceding, 0)))
      .groupBy(col("id"), col("__grp"))
      .agg(min(col("s")).as("s"), max(col("e")).as("e")), storage)
    // kept segments: the gap BEFORE each merged span, plus the tail after
    // the last one (lead-null marks it — no text-keyed grouping)
    val gapW = Window.partitionBy(col("id")).orderBy(col("s"))
    val withText = merged
      .join(texts.select(col(idCol).as("id"), col(textCol).as("__t")), "id")
      .withColumn("__pe", coalesce(lag(col("e"), 1).over(gapW), lit(0)))
      .withColumn("__islast", lead(col("s"), 1).over(gapW).isNull)
    val gaps = withText.select(col("id"), col("s").as("__ord"),
      col("__t").substr(col("__pe") + 1, col("s") - col("__pe") - 1).as("piece"))
    val tails = withText.filter(col("__islast"))
      .select(col("id"), lit(Int.MaxValue).as("__ord"),
        col("__t").substr(col("e") + 1, length(col("__t")) - col("e")).as("piece"))
    val rebuilt = gaps.unionByName(tails)
      .groupBy(col("id"))
      .agg(array_join(transform(
        array_sort(collect_list(struct(col("__ord"), col("piece")))),
        x => x.getField("piece")), "").as("__clean"))
    val removedStats = merged.groupBy(col("id"))
      .agg(count(lit(1)).as("__nspans"),
        sum(col("e") - col("s") + 1L).as("__removed"))
    docs.select(col(idCol), col(textCol))
      .join(removedStats.withColumnRenamed("id", idCol), Seq(idCol), "left")
      .join(rebuilt.withColumnRenamed("id", idCol), Seq(idCol), "left")
      .select(col(idCol),
        coalesce(col("__nspans"), lit(0L)).as("n_spans"),
        coalesce(col("__removed"), lit(0L)).as("chars_removed"),
        coalesce(col("__clean"), col(textCol)).as("text_clean"))
  }

  /** Drop anchor rows whose hash occurs more than `maxBucket` times in
    * `fp` — the hot-bucket guard for the substring-fingerprint joins.
    * The hot-hash set is at most totalAnchors/maxBucket rows (tiny for
    * any real threshold) and joins as a left-anti; no hint, so AQE
    * broadcasts it when it is as small as it should be and degrades to a
    * shuffle join instead of an OOM if a pathological corpus makes it
    * large. `maxBucket <= 0` = no cap.
    */
  private def dropHotBuckets(fp: DataFrame, maxBucket: Int): DataFrame =
    dropHotBucketsOf(fp, fp, maxBucket)

  /** Same guard with the frequency counted over `countIn` (e.g. the
    * combined incremental state) while filtering `fp`. */
  private def dropHotBucketsOf(fp: DataFrame, countIn: DataFrame,
                               maxBucket: Int): DataFrame =
    if (maxBucket <= 0) fp
    else {
      val hot = countIn.groupBy(col("h"))
        .agg(count(lit(1)).as("__n"))
        .filter(col("__n") > maxBucket)
        .select(col("h"))
      fp.join(hot, Seq("h"), "left_anti")
    }

  /** The appendable STATE for incremental substring dedup: each doc's
    * winnowing anchor fingerprints as short (id, h, pos) rows — what
    * [[substringPairs]] computes row-locally, persisted so stored shards
    * never re-fingerprint. Parameters must match across shards (they
    * define the anchor selection); persist alongside the corpus and
    * append each shard's rows ([[substringPairsIncremental]]).
    */
  def substringState(docs: DataFrame, minLen: Int = 48, k: Int = 16,
                     idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    require(k >= 2, s"k-gram width must be >= 2: got $k")
    require(minLen > k, s"minLen must exceed the k-gram width $k: got $minLen")
    docs.select(col(idCol).as("id"),
        explode(graft.functions.WinnowFingerprints
          .winnowFingerprints(col(textCol), k, minLen - k + 1)).as("fp"))
      .select(col("id"), col("fp.h").as("h"), col("fp.pos").as("pos"))
  }

  /** Incremental [[substringPairs]]: all >= minLen verbatim-passage pairs
    * TOUCHING a new shard, without re-fingerprinting or self-joining the
    * stored corpus — the shard's anchors join themselves plus the stored
    * state, so the per-shard cost is shard-anchors x matching buckets,
    * not corpus x corpus. `corpusTexts` MUST cover every id that can
    * appear (stored + shard): extent verification INNER-joins candidate
    * ids against it, so a missing stored id silently drops its pairs —
    * pass the full corpus, not just the shard.
    * New state = `stored union substringState(shard)` — append and
    * persist, same discipline as [[incrementSegmentState]].
    *
    * Union of the stored corpus' own pairs (computed when their shards
    * arrived) with each increment's output reconstructs exactly
    * [[substringPairs]] of the whole corpus (q100 pins the equivalence).
    *
    * `maxBucket` (same guard as [[substringPairs]]) counts hash
    * frequency over the COMBINED state (stored + shard), so a bucket hot
    * in the accumulated corpus is dropped even if the shard alone is
    * cold. One honesty note on the incremental/full equivalence: a hash
    * that crosses the threshold MID-STREAM keeps the pairs emitted while
    * it was still cold (full recompute would drop them all), so the
    * equivalence is exact only when no bucket crosses between
    * increments — always true below the threshold, e.g. at every test SF.
    */
  def substringPairsIncremental(stored: DataFrame, shard: DataFrame,
                                corpusTexts: DataFrame,
                                minLen: Int = 48, k: Int = 16,
                                idCol: String = "doc_id", textCol: String = "text",
                                storage: StorageLevel = StorageLevel.MEMORY_AND_DISK,
                                maxBucket: Int = 1024): DataFrame = {
    val shardFp0 = maybePersist(substringState(shard, minLen, k, idCol, textCol), storage)
    val allFp0 = maybePersist(stored.unionByName(shardFp0), storage)
    // hot set from the COMBINED state, applied to both join sides; the
    // aggregation reruns per side but reads the persisted union
    val shardFp = dropHotBucketsOf(shardFp0, allFp0, maxBucket)
    val allFp = dropHotBuckets(allFp0, maxBucket)
    // one side pinned to the shard; orientation normalized AFTER the join
    // (a shard-shard pair generates in both orders -> distinct)
    val cand = shardFp.as("a")
      .join(allFp.as("b"), col("a.h") === col("b.h") && col("a.id") =!= col("b.id"))
      .select(
        least(col("a.id"), col("b.id")).as("id_a"),
        when(col("a.id") < col("b.id"), col("a.pos")).otherwise(col("b.pos")).as("pos_a"),
        greatest(col("a.id"), col("b.id")).as("id_b"),
        when(col("a.id") < col("b.id"), col("b.pos")).otherwise(col("a.pos")).as("pos_b"))
      .distinct()
    val texts = corpusTexts.select(col(idCol), col(textCol))
    windowVerified(cand, texts, minLen, k, idCol, textCol)
      .select(col("id_a"), col("id_b"), col("pos_a"), col("pos_b")).distinct()
      .groupBy(col("id_a"), col("id_b"))
      .agg(count(lit(1)).as("n_anchors"))
  }

  /** One (id, pos, segment) row per segment of every document. */
  private def segmented(docs: DataFrame, idCol: String, textCol: String,
                        delimiter: String): DataFrame = {
    require(delimiter.nonEmpty, "delimiter must be non-empty")
    // literal (quoted) delimiter: split() takes a Java regex
    val parts = split(col(textCol), java.util.regex.Pattern.quote(delimiter))
    docs.select(col(idCol).as("__sd_id"), posexplode(parts).as(Seq("pos", "seg")))
  }

  /** First corpus-wide occurrence of each distinct segment wins; (id, pos)
    * order makes the keeper deterministic under any physical row order.
    */
  private def firstOccurrence(segs: DataFrame): DataFrame = {
    val first = Window.partitionBy(col("seg"))
      .orderBy(col("__sd_id").asc, col("pos").asc)
    segs.withColumn("__sd_rnk", row_number().over(first))
      .filter(col("__sd_rnk") === 1)
  }

  /** Reassemble each document from its surviving segments in original
    * order; every input row survives (empty text when nothing did).
    */
  private def rebuildDocs(docs: DataFrame, kept: DataFrame, idCol: String,
                          textCol: String, delimiter: String): DataFrame = {
    val parts = split(col(textCol), java.util.regex.Pattern.quote(delimiter))
    val rebuilt = kept
      .groupBy(col("__sd_id"))
      .agg(
        count(lit(1)).as("n_kept"),
        array_join(
          transform(sort_array(collect_list(struct(col("pos"), col("seg")))),
            s => s.getField("seg")),
          delimiter).as("text_dedup"))
    docs
      .select(col(idCol), size(parts).cast("long").as("n_segments"))
      .join(rebuilt, col(idCol) === col("__sd_id"), "left")
      .select(
        col(idCol),
        col("n_segments"),
        coalesce(col("n_kept"), lit(0L)).as("n_kept"),
        (col("n_segments") - coalesce(col("n_kept"), lit(0L))).as("n_dropped"),
        coalesce(col("text_dedup"), lit("")).as("text_dedup"))
  }
}
