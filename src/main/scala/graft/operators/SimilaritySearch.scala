package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

import graft.functions.VectorFunctions._
import graft.functions.VecDotProduct.{vecDot, vecNorm}

/** Approximate-nearest-neighbor search over an `array<float>` embedding
  * column.
  *
  *  - [[bruteKnn]]    — exact cosine top-k with a broadcast query set: the
  *    corpus streams map-side against the (small) broadcast queries, so the
  *    quadratic term is |queries| x |corpus| with no corpus shuffle. This is
  *    the baseline and the recall oracle for the bucketed variant.
  *  - [[lshKnn]]      — sign-LSH banded candidate generation, then exact
  *    rerank inside buckets: the 100 TB path when the query set is itself
  *    large (corpus shuffles once on short (band, key, id) rows).
  *  - [[nearDupPairs]] — all pairs above a cosine threshold (embedding-based
  *    near-dup detection for training-data dedup).
  *
  * All cosine math runs through the codegen'd
  * [[graft.functions.VecDotProduct]] expression, whose left-fold double
  * accumulation is bit-identical to the interpreted HOF fold in
  * [[graft.functions.VectorFunctions]] (and to the DuckDB oracle), so
  * thresholds and top-k cuts are deterministic and oracle-reproducible;
  * ties broken by neighbor id. Norms are computed once per row in [[prep]],
  * not per pair.
  */
object SimilaritySearch {

  private def prep(embeddings: DataFrame, idCol: String, vecCol: String): DataFrame =
    embeddings.select(col(idCol).as("id"), col(vecCol).as("v"))
      .withColumn("nrm", vecNorm(col("v")))

  import Caching.maybePersist

  /** Nearest-centroid id per corpus vector: (id, cid).
    *
    * The broadcast cross join emits k scored rows per vector; the argmax is
    * a `max_by` AGGREGATE, not a window — the partial aggregate collapses
    * the ×k fan-out map-side, so the shuffle carries one row per vector
    * instead of k (at 100 TB the difference between shuffling the corpus
    * and shuffling it k times), and no un-splittable window partition
    * exists. Tie-break parity with the window form (`cscore DESC, cid
    * ASC`): maximize the (cscore, -cid) pair.
    */
  private def assignCells(e: DataFrame, centroids: DataFrame): DataFrame =
    e.crossJoin(broadcast(centroids))
      .withColumn("cscore", vecDot(col("v"), col("cv")) / (col("nrm") * col("cnrm")))
      .groupBy(col("id"))
      .agg(max_by(col("cid"), struct(col("cscore"), (-col("cid")).as("nc"))).as("cid"))

  /** Exact top-k cosine neighbors for each query row (queries selected by
    * `queryPred` SQL predicate over the raw table). Self-matches excluded.
    */
  def bruteKnn(embeddings: DataFrame, queryPred: String, k: Int,
               idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val corpus = prep(embeddings, idCol, vecCol)
    val queries = prep(embeddings.filter(queryPred), idCol, vecCol)
      .select(col("id").as("query_id"), col("v").as("qv"), col("nrm").as("qnrm"))
    val scored = corpus.join(broadcast(queries), col("id") =!= col("query_id"))
      .withColumn("cos_sim", round(vecDot(col("v"), col("qv")) / (col("nrm") * col("qnrm")), 6))
    val w = Window.partitionBy(col("query_id")).orderBy(col("cos_sim").desc, col("id").asc)
    scored
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("id").as("neighbor_id"), col("cos_sim"), col("rank"))
  }

  /** Sign-LSH approximate top-k: vectors bucketed by the sign pattern of
    * `bands` consecutive 8-dim blocks; query and corpus rows meeting in any
    * bucket are candidates, reranked by exact cosine. Recall < 1 by design;
    * determinism (and the oracle twin) hold because bucketing is a pure
    * function of the vector.
    */
  def lshKnn(embeddings: DataFrame, queryPred: String, k: Int, bands: Int = 2,
             idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val corpus = prep(embeddings, idCol, vecCol)
    def banded(df: DataFrame): DataFrame =
      df.select(col("*"), explode(array((0 until bands).map { b =>
        struct(lit(b).as("band"), signBandKey(col("v"), b).as("key"))
      }: _*)).as("bk"))
        .select(col("id"), col("v"), col("nrm"), col("bk.band").as("band"), col("bk.key").as("key"))
    val queries = banded(prep(embeddings.filter(queryPred), idCol, vecCol))
      .select(col("id").as("query_id"), col("v").as("qv"), col("nrm").as("qnrm"),
        col("band"), col("key"))
    val candidates = banded(corpus).join(broadcast(queries), Seq("band", "key"))
      .filter(col("id") =!= col("query_id"))
      .select(col("query_id"), col("id"), col("v"), col("nrm"), col("qv"), col("qnrm"))
      .dropDuplicates("query_id", "id")
    val scored = candidates
      .withColumn("cos_sim", round(vecDot(col("v"), col("qv")) / (col("nrm") * col("qnrm")), 6))
    val w = Window.partitionBy(col("query_id")).orderBy(col("cos_sim").desc, col("id").asc)
    scored
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("id").as("neighbor_id"), col("cos_sim"), col("rank"))
  }

  /** IVF (inverted-file) approximate top-k: the corpus is partitioned into
    * cells by nearest centroid; a query probes its `nProbe` nearest cells
    * and reranks those cells' members by exact cosine.
    *
    * Centroids here are the UNTRAINED quantizer — the raw vectors of a
    * fixed id slice. [[ivfKnnTrained]] runs deterministic Lloyd k-means
    * from the same seed slice and is the quality path; this form is kept
    * as the zero-training baseline the recall measurement compares against
    * (SimilaritySearchSpec).
    *
    * Scale shape: centroids broadcast; assignment is map-side (argmax over
    * nCells per row) followed by ONE narrow shuffle of (id, cid, score);
    * the candidate join shuffles per-cell slices, never the full pair
    * space. This is the IVF complement to the sign-LSH path of [[lshKnn]].
    */
  def ivfKnn(embeddings: DataFrame, queryPred: String, k: Int,
             centroidPred: String,
             nProbe: Int = 2,
             idCol: String = "vec_id", vecCol: String = "embedding",
             storage: StorageLevel = StorageLevel.MEMORY_AND_DISK): DataFrame = {
    val e = maybePersist(prep(embeddings, idCol, vecCol), storage)
    val centroids = prep(embeddings.filter(centroidPred), idCol, vecCol)
      .select(col("id").as("cid"), col("v").as("cv"), col("nrm").as("cnrm"))
    // An empty centroid set would silently return zero neighbors for every
    // query (empty cells) — fail loudly instead; the predicate is
    // corpus-specific and the caller must pick one that selects rows. The
    // limit(1) bounds the guard to an early-exit scan of one row (this and
    // the same guard in ivfKnnTrained are the only eager checks in this
    // file; every other builder stays lazy).
    require(!embeddings.filter(centroidPred).limit(1).isEmpty,
      s"ivfKnn: centroidPred '$centroidPred' selects no rows — no cells to probe")
    ivfProbe(e, centroids, prep(embeddings.filter(queryPred), idCol, vecCol), k, nProbe)
  }

  /** IVF top-k with a TRAINED coarse quantizer: same cell-probe plan as
    * [[ivfKnn]], but the centroids come from [[trainedCentroids]] (Lloyd
    * k-means seeded by the `initPred` id slice) instead of being raw
    * corpus vectors. Same determinism guarantee — training is replayed
    * bit-for-bit by the oracle — with the recall a trained quantizer buys
    * (SimilaritySearchSpec measures it against [[bruteKnn]]).
    */
  def ivfKnnTrained(embeddings: DataFrame, queryPred: String, k: Int,
                    initPred: String, iters: Int = 2,
                    nProbe: Int = 2,
                    idCol: String = "vec_id", vecCol: String = "embedding",
                    storage: StorageLevel = StorageLevel.MEMORY_AND_DISK): DataFrame = {
    val e = maybePersist(prep(embeddings, idCol, vecCol), storage)
    require(!embeddings.filter(initPred).limit(1).isEmpty,
      s"ivfKnnTrained: initPred '$initPred' selects no rows — nothing to train from")
    val centroids = trainedCentroids(e, prep(embeddings.filter(initPred), idCol, vecCol), iters)
    ivfProbe(e, centroids, prep(embeddings.filter(queryPred), idCol, vecCol), k, nProbe)
  }

  /** Deterministic Lloyd k-means over the prepped corpus `e` (id, v, nrm).
    *
    * Every floating-point reduction is an EXPLICITLY ORDERED left fold —
    * member contributions to a cell mean are summed in ascending member-id
    * order (`sort_array(collect_list(...))` then `aggregate`), dimensions
    * reassembled in index order — so the DuckDB oracle replays the whole
    * training loop bit-for-bit and cell assignments can never diverge on a
    * last-bit tie (this determinism is why the quantizer was an id slice
    * until now; the ordered fold removes the blocker).
    *
    * Mechanics per round: assignment is a broadcast of the (tiny) centroid
    * set + map-side argmax; the recompute shuffles (cid, dim) partial rows
    * — k*dims groups, independent of corpus size. A centroid whose cell
    * emptied keeps its previous position (left join + coalesce), so k is
    * stable. Centroid identity = the seeding vector's id (stable across
    * rounds, and the tie-break key the probe's argmax orders by).
    *
    * At 100 TB the per-round corpus pass dominates; `iters` is a small
    * fixed constant (the oracle unrolls it), and the assignment reuses the
    * persisted corpus. Initialization from a fixed id slice is the
    * deterministic stand-in for kmeans||-style seeding.
    */
  private[operators] def trainedCentroids(e: DataFrame, init: DataFrame, iters: Int): DataFrame = {
    var cent = init.select(
      col("id").as("cid"), toDoubleVec(col("v")).as("cv"), col("nrm").as("cnrm"))
    for (_ <- 1 to iters) {
      val members = e.select(col("id"), col("v")).join(assignCells(e, cent), "id")
      val dims = members
        .select(col("id"), col("cid"), posexplode(col("v")))
        .select(col("id"), col("cid"), col("pos"), col("col").cast("double").as("x"))
      val sums = dims.groupBy(col("cid"), col("pos"))
        .agg(
          sort_array(collect_list(struct(col("id"), col("x")))).as("xs"),
          count(lit(1)).cast("double").as("n"))
        .withColumn("sx", aggregate(col("xs"), lit(0.0), (acc, s) => acc + s.getField("x")))
        .withColumn("mean", col("sx") / col("n"))
      val newCv = sums.groupBy(col("cid"))
        .agg(transform(array_sort(collect_list(struct(col("pos"), col("mean")))),
          s => s.getField("mean")).as("cv"))
      // persist per iteration: the loop's plan otherwise NESTS —
      // iteration i embeds every prior iteration's full member-assignment
      // pipeline, and each downstream reference to the trained centroids
      // (assign, encode, ADC tables, probes) re-runs the whole training.
      // LAZY persist deliberately — no eager count / previous-round
      // unpersist (the PageRank rotation): an A/B on this tree read the
      // eager form 2x SLOWER across the trained-ANN/semantic-dedup family
      // (serialized materialization jobs vs fused downstream stages), and
      // the retained frames are K rows each — eviction pressure nil.
      cent = maybePersist(cent.select(col("cid"), col("cv").as("cv0"))
        .join(newCv, Seq("cid"), "left")
        .select(col("cid"), coalesce(col("cv"), col("cv0")).as("cv"))
        .withColumn("cnrm", vecNorm(col("cv"))), StorageLevel.MEMORY_AND_DISK)
    }
    cent
  }

  /** Persistable IVF index state: `centroids(cid, cv, cnrm)` — the trained
    * coarse quantizer — and `assignments(id, v, nrm, cid)` — the corpus
    * with each vector's cell. Two parquet tables; the assignments table
    * APPENDS as shards arrive ([[addToIndex]]) — the ANN analogue of
    * [[CorpusPipeline.CorpusState]].
    */
  case class IvfIndex(centroids: DataFrame, assignments: DataFrame)

  /** Train the quantizer and assign the initial corpus — the expensive,
    * once-per-index step.
    */
  def buildIvfIndex(embeddings: DataFrame, initPred: String, iters: Int = 2,
                    idCol: String = "vec_id", vecCol: String = "embedding",
                    storage: StorageLevel = StorageLevel.MEMORY_AND_DISK): IvfIndex = {
    val e = maybePersist(prep(embeddings, idCol, vecCol), storage)
    require(!embeddings.filter(initPred).limit(1).isEmpty,
      s"buildIvfIndex: initPred '$initPred' selects no rows — nothing to train from")
    val centroids = trainedCentroids(e, prep(embeddings.filter(initPred), idCol, vecCol), iters)
    IvfIndex(centroids, e.join(assignCells(e, centroids), "id"))
  }

  /** Add a shard to an existing index WITHOUT retraining — the standard
    * IVF add path: new vectors are assigned to the FROZEN centroids
    * (map-side argmax over k cells), and only the shard's assignment rows
    * are new (a persistent deployment appends exactly
    * `result.assignments minus index.assignments`, i.e. the shard's
    * rows). Queries immediately see the added vectors; periodic retrains
    * rebuild the index when drift warrants — the same recompute-vs-append
    * split as the corpus state.
    */
  def addToIndex(index: IvfIndex, newEmbeddings: DataFrame,
                 idCol: String = "vec_id", vecCol: String = "embedding"): IvfIndex = {
    val e = prep(newEmbeddings, idCol, vecCol)
    IvfIndex(index.centroids,
      index.assignments.unionByName(e.join(assignCells(e, index.centroids), "id")))
  }

  /** Top-k query against a (possibly incrementally grown) index: probe
    * each query's nProbe nearest cells, exact-rerank their members.
    * Queries need not be index members.
    */
  def queryIndex(index: IvfIndex, queries: DataFrame, k: Int, nProbe: Int = 2,
                 idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame =
    ivfProbeCells(index.assignments, index.centroids,
      prep(queries, idCol, vecCol), k, nProbe)

  /** The shared IVF probe: assign the corpus to nearest cells, probe each
    * query's nProbe nearest cells, exact-rerank inside them.
    */
  private def ivfProbe(e: DataFrame, centroids: DataFrame, queries: DataFrame,
                       k: Int, nProbe: Int): DataFrame =
    // corpus: nearest cell per vector via the map-side-combining argmax
    ivfProbeCells(e.join(assignCells(e, centroids), "id"), centroids, queries, k, nProbe)

  /** [[ivfProbe]] over PRE-ASSIGNED cells (an [[IvfIndex]]'s stored
    * assignments skip the per-query re-assignment entirely).
    */
  private def ivfProbeCells(cells: DataFrame, centroids: DataFrame, queries: DataFrame,
                            k: Int, nProbe: Int): DataFrame = {
    // queries: nProbe nearest cells each — a top-N, so this one is a
    // window; the query set is the small side by construction
    val wCell = Window.partitionBy(col("id")).orderBy(col("cscore").desc, col("cid").asc)
    val qcells = queries.crossJoin(broadcast(centroids))
      .withColumn("cscore", vecDot(col("v"), col("cv")) / (col("nrm") * col("cnrm")))
      .select(col("id"), col("v"), col("nrm"), col("cid"), col("cscore"))
      .withColumn("__r", row_number().over(wCell)).filter(col("__r") <= nProbe)
      .select(col("id").as("query_id"), col("v").as("qv"), col("nrm").as("qnrm"), col("cid"))
    val candidates = cells.join(broadcast(qcells), Seq("cid"))
      .filter(col("id") =!= col("query_id"))
    val wRank = Window.partitionBy(col("query_id")).orderBy(col("cos_sim").desc, col("id").asc)
    candidates
      .withColumn("cos_sim", round(vecDot(col("v"), col("qv")) / (col("nrm") * col("qnrm")), 6))
      .withColumn("rank", row_number().over(wRank))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("id").as("neighbor_id"), col("cos_sim"), col("rank"))
  }

  /** Embedding near-dup pairs, the 100 TB formulation: sign-LSH band keys
    * generate candidate pairs (vectors agreeing on any one 8-dim sign
    * block), which are then verified with exact cosine >= threshold. The
    * corpus shuffles once on short (band, key, id) rows — never an
    * unbounded cross product; candidate volume is bounded by bucket
    * co-occupancy, with AQE absorbing residual bucket skew.
    *
    * Deterministic-approximate: bucketing is a pure function of the vector,
    * so the output is exactly reproducible (the DuckDB oracle twin replays
    * the identical candidate generation), but pairs sharing NO sign block
    * are not reported. Recall rises with threshold — near-dup thresholds
    * (>= ~0.9) imply near-identical sign patterns; at loose thresholds use
    * more/wider bands or [[nearDupPairsExact]] on a bounded subset.
    */
  def nearDupPairs(embeddings: DataFrame, threshold: Double, bands: Int = 8,
                   idCol: String = "vec_id", vecCol: String = "embedding",
                   storage: StorageLevel = StorageLevel.MEMORY_AND_DISK): DataFrame = {
    // Persisted: feeds band-key generation and both sides of the verify join.
    val e = maybePersist(prep(embeddings, idCol, vecCol), storage)
    val banded = e.select(col("id"), explode(array((0 until bands).map { b =>
        struct(lit(b).as("band"), signBandKey(col("v"), b).as("key"))
      }: _*)).as("bk"))
      .select(col("id"), col("bk.band").as("band"), col("bk.key").as("key"))
    val candidates = banded.as("a").join(banded.as("b"),
        col("a.band") === col("b.band") && col("a.key") === col("b.key") &&
          col("a.id") < col("b.id"))
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"))
      .distinct()
    candidates
      .join(e.select(col("id").as("id_a"), col("v").as("va"), col("nrm").as("na")), "id_a")
      .join(e.select(col("id").as("id_b"), col("v").as("vb"), col("nrm").as("nb")), "id_b")
      .withColumn("cos_sim", round(vecDot(col("va"), col("vb")) / (col("na") * col("nb")), 6))
      .filter(col("cos_sim") >= threshold)
      .select(col("id_a"), col("id_b"), col("cos_sim"))
  }

  /** Product-quantization top-k with asymmetric distance computation
    * (ADC; Jégou et al., "Product quantization for nearest neighbor
    * search", TPAMI 2011) — the memory-compression ANN path: each vector
    * is stored as `m` small code ids (one per `dim/m`-dim subspace, the
    * nearest codeword in that subspace), and a query scans CODES, not
    * vectors — its exact distance to every codeword of every subspace is
    * a tiny table, and a vector's approximate distance is `m` lookups
    * into it. At 100 TB this is the difference between shuffling
    * `n * dim` floats and `n * m` ints: the corpus's full vectors are
    * read once (to encode) and never move again.
    *
    * Vectors are UNIT-NORMALIZED before encoding, so approximate L2 is
    * cosine-consistent (`||a-b||^2 = 2 - 2 cos` on the unit sphere) and
    * the ranking targets the same similarity as [[bruteKnn]] — on raw
    * magnitudes L2-ADC would rank by vector length, not direction.
    *
    * The codebook here is the UNTRAINED quantizer — the subvectors of a
    * fixed id slice (the same zero-training baseline as [[ivfKnn]]'s raw
    * centroids; a trained variant would run [[trainedCentroids]] per
    * subspace). Determinism: every per-subspace distance is
    * `svv + cvv - 2*dot` — three left-fold doubles shared with the
    * oracle — quantized to integer 1e-9 units, so the ADC sum over
    * subspaces is an order-free BIGINT sum and ties break by (cid) /
    * (neighbor id). Self-matches excluded.
    *
    * Output: (query_id, neighbor_id, adist_fp BIGINT — approximate
    * squared L2 between unit vectors in 1e-9 units, rank 1..k).
    */
  def pqKnn(embeddings: DataFrame, queryPred: String, k: Int,
            codebookPred: String, m: Int = 4, dim: Int = 64,
            idCol: String = "vec_id", vecCol: String = "embedding",
            storage: StorageLevel = StorageLevel.MEMORY_AND_DISK): DataFrame = {
    require(dim % m == 0, s"pqKnn: dim $dim must split into $m subspaces")
    require(!embeddings.filter(codebookPred).limit(1).isEmpty,
      s"pqKnn: codebookPred '$codebookPred' selects no rows — empty codebook")
    val cb = pqCodebook(embeddings.filter(codebookPred), m, dim, idCol, vecCol)
    val codes = pqEncode(
      maybePersist(pqSubbed(embeddings, m, dim, idCol, vecCol), storage), cb)
    pqAdcQuery(codes, cb,
      pqSubbed(embeddings.filter(queryPred), m, dim, idCol, vecCol), k)
  }

  /** (id, sub, sv, svv): one row per UNIT vector per subspace, svv = sv.sv */
  private[operators] def pqSubbed(df: DataFrame, m: Int, dim: Int,
                       idCol: String, vecCol: String): DataFrame = {
    val subDim = dim / m
    // zero-norm guard: an all-zero embedding has no direction — dividing
    // through would poison pqEncode's argmin and the ADC sums with
    // NULL/NaN silently (and Spark-NULL vs DuckDB-NaN diverge from the
    // oracle). Fail fast row-locally instead of scanning up front.
    val safeNrm = when(col("nrm") > 0, col("nrm")).otherwise(
      raise_error(concat(lit("pqSubbed: zero-norm embedding id="), col("id").cast("string")))
        .cast("double"))
    df.select(col(idCol).as("id"), col(vecCol).as("v"))
      .withColumn("nrm", vecNorm(col("v")))
      .withColumn("vn", transform(col("v"), x => x.cast("double") / safeNrm))
      .select(col("id"), explode(array((0 until m).map { i =>
        struct(lit(i).as("sub"), slice(col("vn"), i * subDim + 1, subDim).as("sv"))
      }: _*)).as("s"))
      .select(col("id"), col("s.sub").as("sub"), col("s.sv").as("sv"))
      .withColumn("svv", vecDot(col("sv"), col("sv")))
  }

  private[operators] def pqCodebook(codebookRows: DataFrame, m: Int, dim: Int,
                         idCol: String, vecCol: String): DataFrame =
    pqSubbed(codebookRows, m, dim, idCol, vecCol)
      .select(col("id").as("cid"), col("sub"), col("sv").as("cv"), col("svv").as("cvv"))

  /** Encode: nearest codeword per (vector, subspace). Broadcast codebook,
    * argmin as a map-side-combining aggregate (the assignCells pattern):
    * the shuffle carries one short code row per (vector, subspace), never
    * the xK scored fan-out and never the subvectors.
    */
  private[operators] def pqEncode(subs: DataFrame, cb: DataFrame): DataFrame =
    subs.join(broadcast(cb), Seq("sub"))
      .withColumn("d2", col("svv") + col("cvv") - lit(2.0) * vecDot(col("sv"), col("cv")))
      .groupBy(col("id"), col("sub"))
      .agg(min_by(col("cid"), struct(col("d2"), col("cid"))).as("cid"))

  /** ADC scan: the query distance tables (exact distance to every
    * codeword, quantized to integer 1e-9 units — |queries| * m * K rows,
    * broadcast-sized) meet the codes row-locally: each vector's m codes
    * gather into ONE array row (the only code shuffle — N rows, no query
    * or subspace fan-out), each query's table broadcasts as ONE
    * (sub, cid) -> dfp map row, and the ADC sum is a row-local integer
    * fold over the code array. The pre-fusion form joined codes to the
    * table on (sub, cid) and aggregated N x m x |queries| scored partials
    * through a (query, id) shuffle; the fold computes the identical
    * order-free BIGINT sum (integer addition reorders freely) with the
    * m x |queries| factor gone from the exchange. Same (adist, id)
    * tie-break, top-k per query. A code whose (sub, cid) is missing from
    * a query's table would mean a codebook mismatch — raised loudly, not
    * a silent NULL that would sort first and fake a nearest neighbor.
    */
  private def pqAdcQuery(codes: DataFrame, cb: DataFrame,
                         querySubs: DataFrame, k: Int): DataFrame = {
    val dt = querySubs
      .select(col("id").as("query_id"), col("sub"), col("sv").as("qv"), col("svv").as("qvv"))
      .join(broadcast(cb), Seq("sub"))
      .withColumn("d2", col("qvv") + col("cvv") - lit(2.0) * vecDot(col("qv"), col("cv")))
      .withColumn("dfp", expr(
        "CAST(floor(d2 * CAST(1000000000 AS DOUBLE) + CAST(0.5 AS DOUBLE)) AS BIGINT)"))
      .select(col("query_id"), col("sub"), col("cid"), col("dfp"))
    val dtMap = dt.groupBy(col("query_id"))
      .agg(map_from_entries(collect_list(struct(
        struct(col("sub"), col("cid")).as("key"), col("dfp").as("value")))).as("__dt"))
    val codeArr = codes.groupBy(col("id"))
      .agg(sort_array(collect_list(struct(col("sub"), col("cid")))).as("__cids"))
    val w = Window.partitionBy(col("query_id")).orderBy(col("adist_fp").asc, col("id").asc)
    codeArr.crossJoin(broadcast(dtMap))
      .filter(col("id") =!= col("query_id"))
      .withColumn("adist_fp", expr(
        """aggregate(__cids, 0L, (acc, c) -> acc +
          |  coalesce(element_at(__dt, named_struct('sub', c.sub, 'cid', c.cid)),
          |    CAST(raise_error('pqAdcQuery: code (sub, cid) missing from the query ADC table - codebook mismatch') AS BIGINT)))""".stripMargin))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("id").as("neighbor_id"), col("adist_fp"), col("rank"))
  }

  /** [[pqKnn]] with TRAINED codebooks: deterministic per-subspace Lloyd
    * k-means (L2 on the sliced unit vectors — PQ's native objective,
    * where the full-vector quantizer of [[trainedCentroids]] uses
    * cosine) seeded by the `initPred` id slice. Same determinism
    * contract: member contributions to every subspace mean fold in
    * ascending id order, so the DuckDB oracle replays training
    * bit-for-bit and assignments can never diverge on a last-bit tie.
    * Trained codewords cut quantization error where the raw slice
    * happens to be unrepresentative — the quality path, exactly as
    * [[ivfKnnTrained]] is to [[ivfKnn]].
    */
  def pqKnnTrained(embeddings: DataFrame, queryPred: String, k: Int,
                   initPred: String, iters: Int = 2,
                   m: Int = 4, dim: Int = 64,
                   idCol: String = "vec_id", vecCol: String = "embedding",
                   storage: StorageLevel = StorageLevel.MEMORY_AND_DISK): DataFrame = {
    require(dim % m == 0, s"pqKnnTrained: dim $dim must split into $m subspaces")
    require(!embeddings.filter(initPred).limit(1).isEmpty,
      s"pqKnnTrained: initPred '$initPred' selects no rows — nothing to train from")
    val subs = maybePersist(pqSubbed(embeddings, m, dim, idCol, vecCol), storage)
    val cent = trainedSubCentroids(subs,
      pqCodebook(embeddings.filter(initPred), m, dim, idCol, vecCol), iters)
    pqAdcQuery(pqEncode(subs, cent), cent,
      pqSubbed(embeddings.filter(queryPred), m, dim, idCol, vecCol), k)
  }

  /** Deterministic per-subspace Lloyd rounds over the subbed corpus
    * (id, sub, sv, svv): assignment is the broadcast L2 argmin of
    * [[pqEncode]]; the mean recompute shuffles (sub, cid, pos) partials —
    * m * k * subDim groups, independent of corpus size — with the same
    * explicitly-ordered fold as [[trainedCentroids]]. A codeword whose
    * cell emptied keeps its position, so every subspace keeps k codes.
    */
  private[operators] def trainedSubCentroids(subs: DataFrame, init: DataFrame,
                                             iters: Int): DataFrame = {
    var cent = init
    for (_ <- 1 to iters) {
      val assigned = pqEncode(subs, cent)
      val dims = subs.select(col("id"), col("sub"), col("sv"))
        .join(assigned, Seq("id", "sub"))
        .select(col("id"), col("sub"), col("cid"), posexplode(col("sv")))
        .select(col("id"), col("sub"), col("cid"), col("pos"), col("col").as("x"))
      val sums = dims.groupBy(col("sub"), col("cid"), col("pos"))
        .agg(
          sort_array(collect_list(struct(col("id"), col("x")))).as("xs"),
          count(lit(1)).cast("double").as("n"))
        .withColumn("sx", aggregate(col("xs"), lit(0.0), (acc, s) => acc + s.getField("x")))
        .withColumn("mean", col("sx") / col("n"))
      val newCv = sums.groupBy(col("sub"), col("cid"))
        .agg(transform(array_sort(collect_list(struct(col("pos"), col("mean")))),
          s => s.getField("mean")).as("cv"))
      // per-iteration persist, same rationale as trainedCentroids: K x m
      // rows, and every downstream encode/ADC reference re-runs the
      // nested training plan without it; lazy for the same A/B reason
      cent = maybePersist(cent.select(col("cid"), col("sub"), col("cv").as("cv0"))
        .join(newCv, Seq("sub", "cid"), "left")
        .select(col("cid"), col("sub"), coalesce(col("cv"), col("cv0")).as("cv"))
        .withColumn("cvv", vecDot(col("cv"), col("cv"))), StorageLevel.MEMORY_AND_DISK)
    }
    cent
  }

  /** Two-stage PQ retrieval — ADC shortlist, EXACT cosine rerank (the
    * production IVFADC+rerank shape): [[pqKnn]]'s code scan cuts the
    * corpus to `shortlist` candidates per query, and only those
    * candidates' float vectors are read again for the exact score. This
    * recovers the exact ranking within whatever the shortlist caught —
    * on clustered data the shortlist IS the cluster, so the result
    * equals brute force (SimilaritySearchSpec asserts equality on the
    * planted corpus) — while the corpus-wide work stays codes-only.
    * Output matches [[bruteKnn]]'s schema: (query_id, neighbor_id,
    * cos_sim, rank).
    */
  def pqKnnReranked(embeddings: DataFrame, queryPred: String, k: Int,
                    codebookPred: String, shortlist: Int = 32,
                    m: Int = 4, dim: Int = 64,
                    idCol: String = "vec_id", vecCol: String = "embedding",
                    storage: StorageLevel = StorageLevel.MEMORY_AND_DISK): DataFrame = {
    require(shortlist >= k, s"pqKnnReranked: shortlist $shortlist must cover k $k")
    val cand = pqKnn(embeddings, queryPred, shortlist, codebookPred,
      m, dim, idCol, vecCol, storage)
    val e = prep(embeddings, idCol, vecCol)
    val queries = prep(embeddings.filter(queryPred), idCol, vecCol)
      .select(col("id").as("query_id"), col("v").as("qv"), col("nrm").as("qnrm"))
    val w = Window.partitionBy(col("query_id")).orderBy(col("cos_sim").desc, col("neighbor_id").asc)
    cand.select(col("query_id"), col("neighbor_id"))
      .join(e.select(col("id").as("neighbor_id"), col("v"), col("nrm")), Seq("neighbor_id"))
      .join(broadcast(queries), Seq("query_id"))
      .withColumn("cos_sim", round(vecDot(col("v"), col("qv")) / (col("nrm") * col("qnrm")), 6))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("neighbor_id"), col("cos_sim"), col("rank"))
  }

  /** IVFADC + exact rerank — the full production retrieval shape: the
    * composite index ([[ivfPqKnn]]: coarse route + residual-PQ ADC)
    * shortlists `shortlist` candidates per query touching only code
    * rows, then true cosine re-scores just the shortlist (the one place
    * full vectors are read, `queries x shortlist` rows). This is what
    * makes the composite index's recall CITABLE: ADC distance separates
    * cells cleanly but collapses within-cell ranking to code resolution
    * (ties break by id — the documented PQ tradeoff); the rerank
    * restores exact top-k order whenever the true neighbors are inside
    * the shortlist. ScaleBench's planted-cluster rows measure exactly
    * this (recall@10 >= 0.9 at bench scale).
    */
  def ivfPqKnnReranked(embeddings: DataFrame, queryPred: String, k: Int,
                       centroidPred: String, codebookPred: String,
                       shortlist: Int = 32, nProbe: Int = 2,
                       m: Int = 4, dim: Int = 64,
                       idCol: String = "vec_id", vecCol: String = "embedding",
                       storage: StorageLevel = StorageLevel.MEMORY_AND_DISK): DataFrame = {
    require(shortlist >= k, s"ivfPqKnnReranked: shortlist $shortlist must cover k $k")
    val cand = ivfPqKnn(embeddings, queryPred, shortlist, centroidPred,
      codebookPred, nProbe, m, dim, idCol, vecCol, storage)
    val e = prep(embeddings, idCol, vecCol)
    val queries = prep(embeddings.filter(queryPred), idCol, vecCol)
      .select(col("id").as("query_id"), col("v").as("qv"), col("nrm").as("qnrm"))
    val w = Window.partitionBy(col("query_id")).orderBy(col("cos_sim").desc, col("neighbor_id").asc)
    cand.select(col("query_id"), col("neighbor_id"))
      .join(e.select(col("id").as("neighbor_id"), col("v"), col("nrm")), Seq("neighbor_id"))
      .join(broadcast(queries), Seq("query_id"))
      .withColumn("cos_sim", round(vecDot(col("v"), col("qv")) / (col("nrm") * col("qnrm")), 6))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("neighbor_id"), col("cos_sim"), col("rank"))
  }

  /** Persistable PQ index state: `codebook(cid, sub, cv, cvv)` and
    * `codes(id, sub, cid)` — the corpus compressed to m small ints per
    * vector. Two parquet-able tables; codes APPEND as shards arrive
    * ([[addToPqIndex]]) — the PQ analogue of [[IvfIndex]], with an even
    * stronger append story: the stored corpus is m ints per vector, so
    * re-encoding old shards is never needed and queries touch no floats
    * except the (tiny) codebook.
    */
  case class PqIndex(codebook: DataFrame, codes: DataFrame,
                     m: Int = 4, dim: Int = 64)

  /** Encode the initial corpus against a codebook drawn from `codebookPred`
    * rows — the once-per-index step.
    */
  def buildPqIndex(embeddings: DataFrame, codebookPred: String,
                   m: Int = 4, dim: Int = 64,
                   idCol: String = "vec_id", vecCol: String = "embedding",
                   storage: StorageLevel = StorageLevel.MEMORY_AND_DISK): PqIndex = {
    require(dim % m == 0, s"buildPqIndex: dim $dim must split into $m subspaces")
    require(!embeddings.filter(codebookPred).limit(1).isEmpty,
      s"buildPqIndex: codebookPred '$codebookPred' selects no rows — empty codebook")
    // persist the (tiny) codebook: build-encode, every addToPqIndex
    // shard-encode, and every query ADC table re-reference it — without
    // the pin each broadcast re-derives it from the source scan
    val cb = maybePersist(
      pqCodebook(embeddings.filter(codebookPred), m, dim, idCol, vecCol), storage)
    PqIndex(cb,
      pqEncode(maybePersist(pqSubbed(embeddings, m, dim, idCol, vecCol), storage), cb),
      m, dim)
  }

  /** Add a shard WITHOUT touching the stored corpus: frozen-codebook
    * encoding is row-local, so only the shard's vectors read their floats
    * and only its code rows are new — incremental == one-shot by
    * construction (the q53 argument, stronger here because stored state
    * is codes, not vectors).
    */
  def addToPqIndex(index: PqIndex, newEmbeddings: DataFrame,
                   idCol: String = "vec_id", vecCol: String = "embedding"): PqIndex =
    index.copy(codes = index.codes.unionByName(pqEncode(
      pqSubbed(newEmbeddings, index.m, index.dim, idCol, vecCol), index.codebook)))

  /** Top-k ADC query against a (possibly incrementally grown) index.
    * Queries need not be index members; only they touch float vectors.
    */
  def queryPqIndex(index: PqIndex, queries: DataFrame, k: Int,
                   idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame =
    pqAdcQuery(index.codes, index.codebook,
      pqSubbed(queries, index.m, index.dim, idCol, vecCol), k)

  /** IVF-PQ composite index (Jégou et al. 2011's IVFADC — the
    * architecture behind every billion-scale ANN deployment): a coarse
    * IVF quantizer routes each vector to a cell, and PQ encodes the
    * RESIDUAL vn - cn (what the cell centroid failed to explain) rather
    * than the vector itself. Residuals concentrate near the origin, so
    * the same K codewords cover them far more densely than the raw
    * space — the codes carry strictly more information per bit than
    * [[pqKnn]]'s direct encoding, and the cell routing prunes the scan
    * to `nProbe` cells the way [[ivfKnn]] does, but over codes instead
    * of floats.
    *
    * Query: probe the nProbe nearest cells; in EACH probed cell the
    * query's own residual against THAT cell's centroid builds the ADC
    * table (per-cell tables are what makes residual ADC correct — a
    * single table would compare residuals taken against different
    * origins). Candidates are code rows in probed cells only, met on
    * the (cell, sub, codeword) key.
    *
    * Scale shape: the corpus floats are read once (assignment +
    * residual encode); everything after is (id, ccid, sub, cid) int
    * rows. Coarse centroids and the codebook broadcast (both
    * slice-sized); the query tables broadcast at
    * |queries| * nProbe * m * K rows; the candidate join is keyed —
    * never corpus x corpus, and unprobed cells are never read.
    * Determinism: the d2 folds and floor quantization are [[pqKnn]]'s;
    * assignment/probe ties break by centroid id, so the oracle replays
    * the whole index bit-for-bit. Coarse quantizer and codebook are
    * the untrained fixed-slice convention of [[ivfKnn]]/[[pqKnn]]
    * (trained variants compose exactly as [[ivfKnnTrained]] /
    * [[pqKnnTrained]] do).
    *
    * Output: (query_id, neighbor_id, adist_fp BIGINT — approximate
    * squared L2 between unit vectors in 1e-9 units, rank 1..k).
    */
  def ivfPqKnn(embeddings: DataFrame, queryPred: String, k: Int,
               centroidPred: String, codebookPred: String,
               nProbe: Int = 2, m: Int = 4, dim: Int = 64,
               idCol: String = "vec_id", vecCol: String = "embedding",
               storage: StorageLevel = StorageLevel.MEMORY_AND_DISK): DataFrame =
    queryIvfPqIndex(
      buildIvfPqIndex(embeddings, centroidPred, codebookPred, m, dim,
        idCol, vecCol, storage),
      embeddings.filter(queryPred), k, nProbe, idCol, vecCol)

  /** The PERSISTABLE IVF-PQ index: coarse unit centroids `cents(ccid,
    * cn)`, residual codebook `cbook(cid, sub, cv, cvv)`, and the code
    * table `codes(id, ccid, sub, cid)` — m ints per stored vector. Both
    * quantizers are FROZEN at build, so appending a shard
    * ([[addToIvfPqIndex]]) is row-local (assign + residual-encode against
    * broadcasts) and build-then-add equals one-shot EXACTLY — the
    * [[PqIndex]]/q113 argument carried to the composite index.
    */
  case class IvfPqIndex(cents: DataFrame, cbook: DataFrame, codes: DataFrame,
                        m: Int = 4, dim: Int = 64)

  // (id, vn): unit vectors, with pqSubbed's zero-norm fail-fast
  private def ivfPqUnit(df: DataFrame, idCol: String, vecCol: String): DataFrame = {
    val p = prep(df, idCol, vecCol)
    val safeNrm = when(col("nrm") > 0, col("nrm")).otherwise(
      raise_error(concat(lit("ivfPqKnn: zero-norm embedding id="), col("id").cast("string")))
        .cast("double"))
    p.withColumn("vn", transform(col("v"), x => x.cast("double") / safeNrm))
      .select(col("id"), col("vn"))
  }

  // argmax-cosine cell (the assignCells aggregate — the xK fan-out
  // collapses map-side), centroid re-attached by its key
  private def ivfPqAssigned(df: DataFrame, cents: DataFrame): DataFrame = {
    val cell = df.crossJoin(broadcast(cents))
      .withColumn("cscore", vecDot(col("vn"), col("cn")))
      .groupBy(col("id"))
      .agg(max_by(col("ccid"), struct(col("cscore"), (-col("ccid")).as("nc"))).as("ccid"))
    df.join(cell, Seq("id")).join(broadcast(cents), Seq("ccid"))
  }

  // subspace slices of the residual carried under `keyCols`
  private def ivfPqResidSubs(df: DataFrame, keyCols: Seq[String],
                             m: Int, subDim: Int): DataFrame =
    df.withColumn("r", zip_with(col("vn"), col("cn"), (a, b) => a - b))
      .select(keyCols.map(col) :+ explode(array((0 until m).map { i =>
        struct(lit(i).as("sub"), slice(col("r"), i * subDim + 1, subDim).as("rv"))
      }: _*)).as("s"): _*)
      .select(keyCols.map(col) :+ col("s.sub").as("sub") :+ col("s.rv").as("rv"): _*)
      .withColumn("rvv", vecDot(col("rv"), col("rv")))

  // residual-subspace rows -> (id, ccid, sub, cid) code rows
  private def ivfPqEncode(subs: DataFrame, cbook: DataFrame): DataFrame =
    subs.join(broadcast(cbook), Seq("sub"))
      .withColumn("d2", col("rvv") + col("cvv") - lit(2.0) * vecDot(col("rv"), col("cv")))
      .groupBy(col("id"), col("ccid"), col("sub"))
      .agg(min_by(col("cid"), struct(col("d2"), col("cid"))).as("cid"))

  /** Build the index over the initial corpus: coarse centroids and the
    * residual codebook from their slice predicates, every corpus vector
    * assigned + residual-encoded once.
    */
  def buildIvfPqIndex(embeddings: DataFrame,
                      centroidPred: String, codebookPred: String,
                      m: Int = 4, dim: Int = 64,
                      idCol: String = "vec_id", vecCol: String = "embedding",
                      storage: StorageLevel = StorageLevel.MEMORY_AND_DISK): IvfPqIndex = {
    require(dim % m == 0, s"ivfPqKnn: dim $dim must split into $m subspaces")
    require(!embeddings.filter(centroidPred).limit(1).isEmpty,
      s"ivfPqKnn: centroidPred '$centroidPred' selects no rows — no cells")
    require(!embeddings.filter(codebookPred).limit(1).isEmpty,
      s"ivfPqKnn: codebookPred '$codebookPred' selects no rows — empty codebook")
    val subDim = dim / m
    // persist the (tiny) quantizer frames: the coarse centroids are
    // referenced by the corpus assign, the codebook train, every
    // addToIvfPqIndex shard assign, and every query probe; the residual
    // codebook by every encode and every ADC table — without the pin
    // each broadcast re-derives them from the source scan
    val cents = maybePersist(
      ivfPqUnit(embeddings.filter(centroidPred), idCol, vecCol)
        .select(col("id").as("ccid"), col("vn").as("cn")), storage)
    val cbook = maybePersist(ivfPqResidSubs(
        ivfPqAssigned(ivfPqUnit(embeddings.filter(codebookPred), idCol, vecCol), cents),
        Seq("id"), m, subDim)
      .select(col("id").as("cid"), col("sub"), col("rv").as("cv"), col("rvv").as("cvv")),
      storage)
    val corpus = maybePersist(ivfPqResidSubs(
      ivfPqAssigned(ivfPqUnit(embeddings, idCol, vecCol), cents),
      Seq("id", "ccid"), m, subDim), storage)
    IvfPqIndex(cents, cbook, ivfPqEncode(corpus, cbook), m, dim)
  }

  /** Append a shard against the FROZEN quantizers: the new vectors
    * assign + encode row-locally against the broadcast centroids and
    * codebook — stored floats are never re-read, and the grown index
    * equals a one-shot build over the union exactly.
    */
  def addToIvfPqIndex(index: IvfPqIndex, newEmbeddings: DataFrame,
                      idCol: String = "vec_id", vecCol: String = "embedding"): IvfPqIndex = {
    val subs = ivfPqResidSubs(
      ivfPqAssigned(ivfPqUnit(newEmbeddings, idCol, vecCol), index.cents),
      Seq("id", "ccid"), index.m, index.dim / index.m)
    index.copy(codes = index.codes.unionByName(ivfPqEncode(subs, index.cbook)))
  }

  /** Query a (possibly incrementally grown) index: probe the nProbe
    * nearest cells, per-cell ADC tables, candidates met on the
    * (cell, sub, codeword) key.
    */
  def queryIvfPqIndex(index: IvfPqIndex, queries: DataFrame, k: Int,
                      nProbe: Int = 2,
                      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    require(nProbe > 0, "ivfPqKnn: nProbe must be positive")
    val subDim = index.dim / index.m
    // nProbe nearest cells per query; the window is |queries| x nCells
    // rows, never the corpus
    val wProbe = Window.partitionBy(col("id"))
      .orderBy(col("cscore").desc, col("ccid").asc)
    val probes = ivfPqUnit(queries, idCol, vecCol)
      .crossJoin(broadcast(index.cents))
      .withColumn("cscore", vecDot(col("vn"), col("cn")))
      .withColumn("pr", row_number().over(wProbe))
      .filter(col("pr") <= nProbe)
      .select(col("id"), col("ccid"), col("vn"), col("cn"))
    val dt = ivfPqResidSubs(probes, Seq("id", "ccid"), index.m, subDim)
      .join(broadcast(index.cbook), Seq("sub"))
      .withColumn("d2", col("rvv") + col("cvv") - lit(2.0) * vecDot(col("rv"), col("cv")))
      .withColumn("dfp", expr(
        "CAST(floor(d2 * CAST(1000000000 AS DOUBLE) + CAST(0.5 AS DOUBLE)) AS BIGINT)"))
      .select(col("id").as("query_id"), col("ccid"), col("sub"), col("cid"), col("dfp"))

    val w = Window.partitionBy(col("query_id")).orderBy(col("adist_fp").asc, col("id").asc)
    index.codes.join(broadcast(dt), Seq("ccid", "sub", "cid"))
      .filter(col("id") =!= col("query_id"))
      .groupBy(col("query_id"), col("id"))
      .agg(sum(col("dfp")).as("adist_fp"))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("id").as("neighbor_id"), col("adist_fp"), col("rank"))
  }

  /** Cross-corpus embedding near-dups: training vectors within cosine >=
    * threshold of any REFERENCE (benchmark) vector — the SEMANTIC
    * contamination audit. The token-level family (shingle overlap,
    * verbatim substrings, Bloom prune) catches copies; this catches
    * paraphrases and translations, which share embeddings but no
    * n-grams — the leak mode eval-set decontamination actually worries
    * about. Same plan shape as [[nearDupPairs]], with the two sides kept
    * distinct: both corpora bucket by sign-LSH band keys, candidates are
    * (corpus, reference) co-occupants, exact cosine verifies. The corpus
    * shuffles once on short band rows; the reference is typically the
    * small side but the join stays keyed (hash), never broadcast-forced,
    * so a large holdout also works. Output: (idCol, ref_id, cos_sim) —
    * one row per contaminated (train, bench) pair above threshold.
    */
  def crossNearDup(corpus: DataFrame, reference: DataFrame, threshold: Double,
                   bands: Int = 8,
                   idCol: String = "vec_id", vecCol: String = "embedding",
                   storage: StorageLevel = StorageLevel.MEMORY_AND_DISK): DataFrame = {
    val c = maybePersist(prep(corpus, idCol, vecCol), storage)
    val r = maybePersist(prep(reference, idCol, vecCol), storage)
    def banded(df: DataFrame): DataFrame =
      df.select(col("id"), explode(array((0 until bands).map { b =>
        struct(lit(b).as("band"), signBandKey(col("v"), b).as("key"))
      }: _*)).as("bk"))
        .select(col("id"), col("bk.band").as("band"), col("bk.key").as("key"))
    val candidates = banded(c)
      .join(banded(r).select(col("id").as("ref_id"), col("band"), col("key")),
        Seq("band", "key"))
      .select(col("id"), col("ref_id"))
      .distinct()
    candidates
      .join(c.select(col("id"), col("v").as("cv"), col("nrm").as("cn")), Seq("id"))
      .join(r.select(col("id").as("ref_id"), col("v").as("rv"), col("nrm").as("rn")), Seq("ref_id"))
      .withColumn("cos_sim", round(vecDot(col("cv"), col("rv")) / (col("cn") * col("rn")), 6))
      .filter(col("cos_sim") >= threshold)
      .select(col("id").as(idCol), col("ref_id"), col("cos_sim"))
  }

  /** SemDeDup-style SEMANTIC deduplication (Abbas et al. 2023,
    * arXiv:2303.09540): cluster the corpus with the deterministic trained
    * quantizer ([[trainedCentroids]] — same ordered-fold Lloyd rounds the
    * IVF/PQ paths replay in the oracle), then inside each cluster drop
    * every member that has a near-duplicate (cosine >= `threshold`) with
    * higher keep-priority. Priority follows the paper's finding: among
    * duplicates, KEEP the member least similar to its centroid (the
    * cluster's "outlier" carries the most marginal information); ties break
    * to the lower id. The rule is pairwise domination — drop x iff some
    * in-cluster y with cos(x,y) >= threshold has lower (cent_sim, id) — so
    * the decision is one relational pass, deterministic, and
    * oracle-replayable (no greedy sequential scan).
    *
    * This is the paraphrase-level complement to token-set dedup
    * ([[graft.operators.Dedup.minhashLshPairs]]) and verbatim substring
    * dedup: rewordings and translations share embeddings, not n-grams.
    *
    * Scale shape: centroids broadcast, assignment is map-side argmax + one
    * narrow shuffle; the pair stage self-joins SLIM (id, cid) rows per
    * cell and re-attaches vectors by id, so vectors shuffle once, never
    * quadratically. Pair work is sum of cell sizes squared — k is the
    * knob: grow centroids with the corpus (n/k bounded) exactly as the
    * paper does (50k clusters for LAION), and the per-cell quadratic term
    * stays constant. Output: one row per vector — (id, cid, cent_sim,
    * kept).
    */
  def semDedup(embeddings: DataFrame, threshold: Double, initPred: String,
               iters: Int = 2,
               idCol: String = "vec_id", vecCol: String = "embedding",
               storage: StorageLevel = StorageLevel.MEMORY_AND_DISK): DataFrame = {
    val e = maybePersist(prep(embeddings, idCol, vecCol), storage)
    require(!embeddings.filter(initPred).limit(1).isEmpty,
      s"semDedup: initPred '$initPred' selects no rows — nothing to train from")
    val cent = trainedCentroids(e, prep(embeddings.filter(initPred), idCol, vecCol), iters)
    // assignment keeps the winning cell's SCORE: it is the keep-priority
    val assigned = maybePersist(assignCellsScored(e, cent), storage)
    val slim = assigned.select(col("id"), col("cid"), col("cent_sim"))
    val pairs = slim
      .select(col("id").as("id_a"), col("cid"), col("cent_sim").as("ca"))
      .join(slim.select(col("id").as("id_b"), col("cid"), col("cent_sim").as("cb")),
        Seq("cid"))
      .filter(col("id_a") < col("id_b"))
      .join(e.select(col("id").as("id_a"), col("v").as("va"), col("nrm").as("na")), Seq("id_a"))
      .join(e.select(col("id").as("id_b"), col("v").as("vb"), col("nrm").as("nb")), Seq("id_b"))
      .withColumn("cos_sim", round(vecDot(col("va"), col("vb")) / (col("na") * col("nb")), 6))
      .filter(col("cos_sim") >= threshold)
    // the pair's CLOSER-to-centroid side drops (tie: higher id drops)
    val dropped = pairs
      .select(when(col("ca") > col("cb"), col("id_a")).otherwise(col("id_b")).as("id"))
      .distinct()
      .withColumn("dup", lit(true))
    assigned.join(dropped, Seq("id"), "left")
      .select(col("id").as(idCol), col("cid"), col("cent_sim"),
        (!coalesce(col("dup"), lit(false))).as("kept"))
  }

  /** The [[semDedup]] OPERATING-POINT table — what q120's calibration
    * sweep is to the NB gate, this is to the semantic-dedup threshold:
    * per candidate threshold, how many in-cell pairs clear it and how
    * many documents the keep rule would drop. The knob is read off this
    * table instead of hardcoding 0.4; thresholds are integer ppm and
    * pairs compare on `round(cos_sim * 1e6)`, so every count is exact on
    * both engines. The pair stage runs ONCE at the grid minimum; the
    * sweep is an explode + combinable aggregate over the already-scored
    * pairs (|grid| groups — the q120 fan-out/collapse shape). Thresholds
    * no pair clears still emit a zero row. Output: (threshold_ppm,
    * n_pairs, n_dropped).
    */
  def semDedupCalibration(embeddings: DataFrame, thresholdsPpm: Seq[Long],
                          initPred: String, iters: Int = 2,
                          idCol: String = "vec_id", vecCol: String = "embedding",
                          storage: StorageLevel = StorageLevel.MEMORY_AND_DISK): DataFrame = {
    require(thresholdsPpm.nonEmpty, "semDedupCalibration needs at least one threshold")
    val e = maybePersist(prep(embeddings, idCol, vecCol), storage)
    require(!embeddings.filter(initPred).limit(1).isEmpty,
      s"semDedupCalibration: initPred '$initPred' selects no rows — nothing to train from")
    val cent = trainedCentroids(e, prep(embeddings.filter(initPred), idCol, vecCol), iters)
    val slim = assignCellsScored(e, cent)
    val pairs = slim
      .select(col("id").as("id_a"), col("cid"), col("cent_sim").as("ca"))
      .join(slim.select(col("id").as("id_b"), col("cid"), col("cent_sim").as("cb")),
        Seq("cid"))
      .filter(col("id_a") < col("id_b"))
      .join(e.select(col("id").as("id_a"), col("v").as("va"), col("nrm").as("na")), Seq("id_a"))
      .join(e.select(col("id").as("id_b"), col("v").as("vb"), col("nrm").as("nb")), Seq("id_b"))
      .withColumn("sim_ppm",
        round(round(vecDot(col("va"), col("vb")) / (col("na") * col("nb")), 6) * lit(1000000.0))
          .cast("long"))
      .filter(col("sim_ppm") >= lit(thresholdsPpm.min))
      // the keep rule's victim is threshold-independent: score it once
      .select(col("sim_ppm"),
        when(col("ca") > col("cb"), col("id_a")).otherwise(col("id_b")).as("drop_id"))
    val agg = pairs
      .withColumn("threshold_ppm", explode(array(thresholdsPpm.map(lit): _*)))
      .filter(col("sim_ppm") >= col("threshold_ppm"))
      .groupBy(col("threshold_ppm"))
      .agg(count(lit(1)).as("n_pairs"),
        countDistinct(col("drop_id")).as("n_dropped"))
    import e.sparkSession.implicits._
    thresholdsPpm.toDF("threshold_ppm")
      .join(agg, Seq("threshold_ppm"), "left")
      .select(col("threshold_ppm"),
        coalesce(col("n_pairs"), lit(0L)).as("n_pairs"),
        coalesce(col("n_dropped"), lit(0L)).as("n_dropped"))
  }

  /** Full-corpus k-means clustering as a DELIVERABLE — the topic-bucket /
    * data-mixing primitive (SemDeDup's §4 "cluster then act" shape, with
    * the clustering itself as the output): train the deterministic Lloyd
    * quantizer from the `initPred` seed slice ([[trainedCentroids]] — the
    * same ordered-fold training q35/q119 replay bit-for-bit in the
    * oracle), then assign EVERY vector to its argmax-cosine cluster.
    * Downstream: per-cluster mixture weights, cluster-coherent splits
    * ([[Sampling]]'s cluster splits consume exactly this), per-topic
    * dedup budgets.
    *
    * Scale shape: training is `iters` bounded corpus passes (the
    * recompute shuffle is k x dims groups, corpus-size-independent);
    * assignment is one broadcast of the tiny centroid set + a map-side
    * argmax collapsed by a combinable max_by — one row per vector crosses
    * the exchange, never the xk fan-out. Output: (idCol, cluster_id,
    * cent_sim DOUBLE rounded to 6dp).
    */
  def embeddingClusters(embeddings: DataFrame, initPred: String, iters: Int = 2,
                        idCol: String = "vec_id", vecCol: String = "embedding",
                        storage: StorageLevel = StorageLevel.MEMORY_AND_DISK): DataFrame = {
    val e = maybePersist(prep(embeddings, idCol, vecCol), storage)
    require(!embeddings.filter(initPred).limit(1).isEmpty,
      s"embeddingClusters: initPred '$initPred' selects no rows — nothing to train from")
    val cent = trainedCentroids(e, prep(embeddings.filter(initPred), idCol, vecCol), iters)
    assignCellsScored(e, cent)
      .select(col("id").as(idCol), col("cid").as("cluster_id"), col("cent_sim"))
  }

  /** Per-cluster corpus summary off [[embeddingClusters]] output: member
    * count and the mean centroid similarity (cluster cohesion) — the
    * table mixture planning reads. The mean is INTEGER ppm over the
    * 6dp-rounded similarities — a sum of exact per-member longs, then
    * `div` (truncation toward zero, bit-matching DuckDB's `//` on signed
    * sums) — so it is order-free and engine-exact where a float mean
    * would drift with partition order. One combinable aggregate over a
    * member-count-sized input; output is k rows.
    */
  def clusterProfile(clusters: DataFrame): DataFrame =
    clusters.groupBy(col("cluster_id"))
      .agg(count(lit(1)).as("n_members"),
        sum(round(col("cent_sim") * lit(1000000.0)).cast("long")).as("__s"))
      .select(col("cluster_id"), col("n_members"),
        expr("__s div n_members").as("mean_sim_ppm"))

  /** Scored frozen-centroid assignment: (id, cid, cent_sim) — the argmax
    * cell plus the winning score, rounded like every gated cosine.
    */
  private def assignCellsScored(e: DataFrame, centroids: DataFrame): DataFrame =
    e.crossJoin(broadcast(centroids))
      .withColumn("cscore", vecDot(col("v"), col("cv")) / (col("nrm") * col("cnrm")))
      .groupBy(col("id"))
      .agg(max_by(struct(col("cid"), col("cscore")), struct(col("cscore"), (-col("cid")).as("nc"))).as("a"))
      .select(col("id"), col("a.cid").as("cid"), round(col("a.cscore"), 6).as("cent_sim"))

  /** Persistable semantic-dedup state: the FROZEN trained quantizer and
    * every processed vector with its cell — two parquet tables, members
    * appendable as shards arrive (the SemDeDup analogue of [[IvfIndex]]
    * and [[graft.operators.CorpusPipeline.CorpusState]]).
    */
  case class SemDedupState(centroids: DataFrame, members: DataFrame)

  /** Train the quantizer on the initial corpus, assign it, and judge it
    * with FIRST-WRITE-WINS priority (lowest id kept) — the incremental
    * dedup semantics: a document already accepted into the training set is
    * never retroactively dropped by a later arrival. Returns the verdicts
    * for the initial corpus and the state to increment.
    */
  def buildSemDedupState(embeddings: DataFrame, threshold: Double,
                         initPred: String, iters: Int = 2,
                         idCol: String = "vec_id", vecCol: String = "embedding",
                         storage: StorageLevel = StorageLevel.MEMORY_AND_DISK):
      (DataFrame, SemDedupState) = {
    val e = maybePersist(prep(embeddings, idCol, vecCol), storage)
    require(!embeddings.filter(initPred).limit(1).isEmpty,
      s"buildSemDedupState: initPred '$initPred' selects no rows — nothing to train from")
    val cent = trainedCentroids(e, prep(embeddings.filter(initPred), idCol, vecCol), iters)
    val members = maybePersist(e.join(assignCellsScored(e, cent), "id"), storage)
    val verdicts = judgeAgainst(members, members, threshold, idCol)
    (verdicts, SemDedupState(cent, members))
  }

  /** Judge a NEW shard against the stored state: a shard vector drops iff
    * some SAME-CELL vector with a LOWER id (stored corpus or earlier in
    * the shard) sits within the cosine threshold. Because priority is the
    * id order and ids only grow, stored verdicts never change and
    * build-then-add equals judging everything at once — the q49/q53/q115
    * incremental contract, exact by construction. Requires shard ids above
    * all stored ids (the natural ingest order); a violated precondition
    * shows up as a shard row "dominated" by a future arrival.
    *
    * Scale shape: the shard assigns to frozen broadcast centroids
    * (row-local argmax); the pair probe joins the shard against ONLY its
    * cells' members. Stored vectors are never re-judged and never pair
    * among themselves again.
    */
  def semDedupIncrement(state: SemDedupState, shard: DataFrame, threshold: Double,
                        idCol: String = "vec_id", vecCol: String = "embedding",
                        storage: StorageLevel = StorageLevel.MEMORY_AND_DISK):
      (DataFrame, SemDedupState) = {
    val s = maybePersist(prep(shard, idCol, vecCol), storage)
    val assigned = maybePersist(s.join(assignCellsScored(s, state.centroids), "id"), storage)
    val all = state.members.unionByName(assigned)
    val verdicts = judgeAgainst(assigned, all, threshold, idCol)
    (verdicts, SemDedupState(state.centroids, all))
  }

  /** First-write-wins domination: for each row of `judged`, is there a
    * same-cell row of `against` with lower id within the threshold?
    * Output: (idCol, cid, cent_sim, kept).
    */
  private def judgeAgainst(judged: DataFrame, against: DataFrame,
                           threshold: Double, idCol: String): DataFrame = {
    // candidates pair SLIM (id, cid) rows; vectors re-attach by id, so
    // they shuffle once on the id key, never on the cell fan-out
    val pairs = judged.select(col("id").as("id_b"), col("cid"))
      .join(against.select(col("id").as("id_a"), col("cid")), Seq("cid"))
      .filter(col("id_a") < col("id_b"))
      .join(against.select(col("id").as("id_a"), col("v").as("va"), col("nrm").as("na")), Seq("id_a"))
      .join(judged.select(col("id").as("id_b"), col("v").as("vb"), col("nrm").as("nb")), Seq("id_b"))
      .withColumn("cos_sim", round(vecDot(col("va"), col("vb")) / (col("na") * col("nb")), 6))
      .filter(col("cos_sim") >= threshold)
    val dropped = pairs.select(col("id_b").as("id")).distinct().withColumn("dup", lit(true))
    judged.select(col("id"), col("cid"), col("cent_sim"))
      .join(dropped, Seq("id"), "left")
      .select(col("id").as(idCol), col("cid"), col("cent_sim"),
        (!coalesce(col("dup"), lit(false))).as("kept"))
  }

  /** All vector pairs (id_a < id_b) with cosine >= threshold — the EXACT
    * all-pairs form. O(n^2) pairs (BroadcastNestedLoopJoin under the `<`
    * condition): strictly a small-n tool — the recall oracle for
    * [[nearDupPairs]] on bounded subsets, never the 100 TB path.
    */
  def nearDupPairsExact(embeddings: DataFrame, threshold: Double,
                        idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val e = prep(embeddings, idCol, vecCol)
    e.select(col("id").as("id_a"), col("v").as("va"), col("nrm").as("na"))
      .join(e.select(col("id").as("id_b"), col("v").as("vb"), col("nrm").as("nb")),
        col("id_a") < col("id_b"))
      .withColumn("cos_sim", round(vecDot(col("va"), col("vb")) / (col("na") * col("nb")), 6))
      .filter(col("cos_sim") >= threshold)
      .select(col("id_a"), col("id_b"), col("cos_sim"))
  }
}
