package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Fixed-point PageRank over a (src, dst) edge list — the host/domain
  * authority signal a web-corpus pipeline uses to prioritize crawl and
  * weight quality (the CommonCrawl host-ranking shape; Page et al. 1999).
  *
  * Engine-exact by the same discipline as the pinned-ln family: ranks are
  * INTEGER ppm (1e-6), every contribution is floor division
  * `rank_ppm div outdeg`, the damped update is
  * `(1 - d) * 1e6 + (d_ppm * sum) div 1e6` on exact integers — sums are
  * BIGINT (order-free, combinable), so the result is bit-identical across
  * engines and partitionings, where a float power iteration drifts with
  * partition order and libm. (Classic normalization divides by N; this
  * keeps the scale-invariant un-normalized form — init 1.0 per node —
  * so ranks stay integers and rankings are unchanged.)
  *
  * Keys: src/dst may be ANY atomic type — numeric host ids or raw host
  * STRINGS both work; every step (self-loop filter, distinct, the keyed
  * join, groupBy(dst), the spine join) is key-type-agnostic, so the
  * string hosts a real crawl edge table carries never need a pre-mapping
  * to ids. A NULL endpoint has no node identity (it would silently drop
  * through every equi-join and the ranking would quietly lose edges) —
  * it raises per-row instead, the urlDedup NULL-url rule.
  *
  * Semantics: parallel edges and self-loops are dropped. Dangling nodes
  * (no out-edges) leak their mass by default — the standard
  * simplification (their rank is still computed and they still receive
  * the teleport term). Real crawl host graphs are ~30-40% dangling, and
  * leaked mass shifts top-k ordering that authority-weighted sampling
  * consumes — so `danglingRedistribute = true` folds the dangling rank
  * mass back in uniformly (the exact treatment): per iteration, ONE
  * combinable sum over the node-count-sized rank frame computes the
  * dangling mass, `share = dangling_sum div N` (floor — stays integer,
  * stays replayable) joins in as a 1-row broadcast, and the update
  * becomes `(1-d)*1e6 + (d_ppm * (contrib_sum + share)) div 1e6`. Total
  * mass then holds at N * 1e6 within floor-division slack
  * (PageRankSpec pins it). Default OFF: the leaky form is the
  * documented q155 contract and the cross-engine oracle.
  *
  * Scale shape: each iteration is ONE keyed join (ranks to edges on src —
  * both sides hash-partitioned on the same key, so AQE reuses the
  * exchange) + one combinable groupBy(dst) sum + a left join back to the
  * node spine (+ with redistribution: one node-count-sized combinable
  * aggregate, broadcast back as a single row). K iterations = K such
  * rounds over an edge table that never grows; edges/spine/degrees and
  * each round's ranks are LAZILY localCheckpoint-ed — leaf logical plans
  * per round (no re-embedded edge-build subtrees, no per-round plan
  * growth) and ZERO materialization jobs inside the loop: the consumer's
  * single action runs the whole chain, caching each round's
  * node-count-sized blocks (MEMORY_AND_DISK) as it passes. No windows,
  * no collect, no pair blowup — edge-linear per iteration at any graph
  * size.
  *
  * The RETURNED frame is checkpoint-cached on first materialization
  * (node-count-sized — one row per host) so consumers re-read
  * materialized ranks instead of replaying the iteration lineage. Cached
  * blocks (inputs + rounds) release with the session's cache cleanup
  * (Bench clears persistent RDDs between queries); long-lived callers
  * ranking many graphs should release via
  * `spark.sparkContext.getPersistentRDDs` when done. On a multi-executor
  * cluster prefer reliable `checkpoint()` if executor loss mid-iteration
  * must be survivable (results are unaffected — the math is order-free).
  * No incremental form on
  * purpose: ranks are a GLOBAL fixed point of the whole graph — new
  * edges shift every node's rank, so "increment == recompute" holds
  * trivially and an appendable-state variant would be a lie.
  */
object PageRank {

  def rank(edges: DataFrame, iters: Int = 5, dampPpm: Long = 850000L,
           srcCol: String = "src", dstCol: String = "dst",
           danglingRedistribute: Boolean = false): DataFrame =
    rankCore(edges, iters, dampPpm, srcCol, dstCol, danglingRedistribute,
      measure = false)._1

  /** [[rank]] plus convergence observability: also returns the FINAL
    * round's total rank movement `sum(|rank_k - rank_{k-1}|)` in ppm —
    * one combinable BIGINT sum over two node-count-sized frames, joined
    * on the host key (driver reads a single row). The iteration count is
    * otherwise a blind knob: 0 says the integer fixed point was reached
    * at or before K (a cycle reports 0 — PageRankSpec pins it); a large
    * delta says K was too few for THIS graph and top-k orderings may
    * still be in flight. See SCALING.md on choosing K.
    */
  def rankWithConvergence(edges: DataFrame, iters: Int = 5, dampPpm: Long = 850000L,
                          srcCol: String = "src", dstCol: String = "dst",
                          danglingRedistribute: Boolean = false): (DataFrame, Long) = {
    val (r, _, d) = rankCore(edges, iters, dampPpm, srcCol, dstCol,
      danglingRedistribute, measure = true)
    (r, d)
  }

  /** AUTO-K: iterate until the round's total rank movement drops to
    * `epsPpm` or below, or `maxIters` rounds run — K stops being a blind
    * input (the r15 convergence plumbing made the delta observable; this
    * closes the loop on it). Returns (ranks, iterations run, final
    * delta). Every round pays the delta's one combinable 1-row aggregate
    * — already the convergence path's cost — and the ranks equal a
    * fixed-K run at the stop count bit-for-bit (the rounds are the same
    * computation; PageRankSpec pins it). An integer fixed point reports
    * delta 0, so `epsPpm = 0` means "run to the exact fixed point or
    * maxIters, whichever first".
    */
  def rankUntil(edges: DataFrame, epsPpm: Long, maxIters: Int = 50,
                dampPpm: Long = 850000L,
                srcCol: String = "src", dstCol: String = "dst",
                danglingRedistribute: Boolean = false): (DataFrame, Int, Long) = {
    require(epsPpm >= 0, "epsPpm must be non-negative")
    rankCore(edges, maxIters, dampPpm, srcCol, dstCol, danglingRedistribute,
      measure = true, epsPpm = epsPpm)
  }

  /** One combinable sum of |a - b| over two rank frames sharing the node
    * spine; -1 when not measured (iters == 1 has no previous round only
    * when measurement is off — with it on, round 1 measures against the
    * uniform init).
    */
  private def totalDelta(prev: DataFrame, curr: DataFrame): Long =
    prev.select(col("host"), col("rank_ppm").as("__prev"))
      .join(curr, Seq("host"))
      .agg(coalesce(sum(abs(col("rank_ppm") - col("__prev"))), lit(0L)))
      .head().getLong(0)

  private def rankCore(edges: DataFrame, iters: Int, dampPpm: Long,
                       srcCol: String, dstCol: String,
                       danglingRedistribute: Boolean,
                       measure: Boolean,
                       epsPpm: Long = -1L): (DataFrame, Int, Long) = {
    require(iters >= 1, "pagerank needs at least one iteration")
    require(dampPpm >= 0 && dampPpm <= 1000000L, "dampPpm must be in [0, 1e6]")
    def keyOrRaise(c: String) =
      when(col(c).isNull, raise_error(lit(
        s"pagerank: NULL $c — a null endpoint has no node identity " +
          "(it would drop through every keyed join and silently lose edges)")))
        .otherwise(col(c))
    // LAZY localCheckpoint on every loop input and every loop-carried
    // frame: the returned Dataset's logical plan is a LogicalRDD leaf
    // IMMEDIATELY (truncation does not wait for materialization), and the
    // RDD caches (MEMORY_AND_DISK) the first time an action computes it.
    // Two problems this kills at once, measured on the r19 bench:
    //  - plan blowup: a persist() does NOT truncate the logical plan, and
    //    each iteration references e/nodes/deg again, re-embedding the
    //    full edge-build subtree ~4x per round — q155's final plan printed
    //    at ~2 MB of text, and the analyzer re-walked that tree on every
    //    one of the 5 per-iteration materializations (driver-side cost,
    //    guide §7.3);
    //  - job count: the old persist+count()-per-iteration rotation ran one
    //    Spark job per round purely to materialize before releasing the
    //    predecessor. With lazy checkpoints the WHOLE K-round chain runs
    //    in the consumer's single action, each round's blocks caching as
    //    the job passes through them (iterations are inherently
    //    sequential — their shuffles pipeline inside one job just fine).
    // With redistribution ON each iteration additionally references the
    // rank frame twice (contrib join + dangling-mass aggregate) — under
    // persist() THAT plan would DOUBLE per round (2^K nodes, a driver OOM
    // on plan analysis alone); the leaf-plan truncation makes both shapes
    // linear and tiny. Cache release: nothing here unpersists — blocks
    // are node/edge-count-sized and release with the session's cache
    // cleanup (Bench clears persistent RDDs between queries; long-lived
    // library callers should release via sparkContext.getPersistentRDDs
    // or catalog.clearCache when done ranking). Until/measure modes still
    // run one delta action per round — the stop test needs the value.
    val e = edges.select(keyOrRaise(srcCol).as("src"),
        keyOrRaise(dstCol).as("dst"))
      .filter(col("src") =!= col("dst")).distinct()
      .localCheckpoint(false)
    val nodes = e.select(col("src").as("host"))
      .union(e.select(col("dst").as("host"))).distinct()
      .localCheckpoint(false)
    val deg = e.groupBy(col("src")).agg(count(lit(1)).as("__d"))
      .localCheckpoint(false)
    val teleport = 1000000L - dampPpm
    // redistribution inputs, built once: the dangling node set (in the
    // spine, absent from the out-degree table) and the 1-row node count
    val dangling =
      if (!danglingRedistribute) null
      else nodes.join(e.select(col("src").as("host")).distinct(),
        Seq("host"), "left_anti").localCheckpoint(false)
    val nCount =
      if (!danglingRedistribute) null
      else nodes.agg(count(lit(1)).as("__N")).localCheckpoint(false)
    var r = nodes.select(col("host"), lit(1000000L).as("rank_ppm"))
      .localCheckpoint(false)
    var lastDelta = -1L
    var i = 0
    var converged = false
    while (i < iters && !converged) {
      i += 1
      val contrib = e
        .join(r.select(col("host").as("src"), col("rank_ppm")), "src")
        .join(deg, "src")
        .select(col("dst"), expr("rank_ppm div __d").as("__c"))
        .groupBy(col("dst")).agg(sum(col("__c")).as("__cs"))
      // the uniform dangling share for THIS iteration: one combinable
      // sum over the current ranks, floor-divided by N — a 1-row frame
      // broadcast into the update (0 when redistribution is off)
      val share =
        if (!danglingRedistribute) lit(0L)
        else col("__share")
      val spine =
        if (!danglingRedistribute) nodes
        else nodes.crossJoin(broadcast(
          r.join(dangling, Seq("host"))
            .agg(coalesce(sum(col("rank_ppm")), lit(0L)).as("__dsum"))
            .crossJoin(nCount)
            .select(expr("__dsum div __N").as("__share"))))
      val rMat = spine
        .join(contrib.select(col("dst").as("host"), col("__cs")), Seq("host"), "left")
        .withColumn("__mass", coalesce(col("__cs"), lit(0L)) + share)
        .select(col("host"),
          (lit(teleport) + expr(
            s"CAST((CAST($dampPpm AS DECIMAL(38,0)) * __mass) div 1000000 AS BIGINT)"))
            .as("rank_ppm"))
        .localCheckpoint(false)
      // until-mode measures EVERY round (the stop test needs it); plain
      // convergence mode measures the final round only
      if (epsPpm >= 0 || (measure && i == iters))
        lastDelta = totalDelta(r, rMat)
      r = rMat
      if (epsPpm >= 0 && lastDelta <= epsPpm) converged = true
    }
    (r, i, lastDelta)
  }

  /** TrustRank / personalized PageRank (Gyöngyi et al. 2004): the
    * teleport mass lands ONLY on a trusted seed set, so rank measures
    * PROXIMITY TO TRUST instead of raw link popularity — the standard
    * web-corpus recipe for propagating a small hand-verified whitelist
    * (or, negated, a spam blacklist) over the whole host graph. A page
    * no trusted host (transitively) links to scores exactly 0 — unlike
    * [[rank]]'s uniform teleport floor, which gives every spam host
    * 150000 ppm for free.
    *
    * Same pinned-integer discipline as [[rank]]: init = 1e6 on seeds / 0
    * elsewhere (the scale-invariant un-normalized form), per-iteration
    * update `(seed ? (1-d)*1e6 : 0) + (d_ppm * contrib_sum) div 1e6` on
    * exact BIGINTs — bit-identical across engines and partitionings,
    * oracle-unrollable. Same edge normalization (parallel/self-loop
    * drop, NULL raise) and the same dangling-leak simplification; same
    * K-edge-linear-rounds scale shape plus ONE broadcast-able seed-flag
    * join on the node spine built once. `seeds` is a 1-column frame of
    * node keys (extra rows that match no node are ignored — they receive
    * no edges and appear in no spine). The returned frame is
    * checkpoint-cached on first materialization ([[rank]]'s contract).
    */
  def trustRank(edges: DataFrame, seeds: DataFrame, iters: Int = 5,
                dampPpm: Long = 850000L,
                srcCol: String = "src", dstCol: String = "dst"): DataFrame =
    trustRankCore(edges, seeds, iters, dampPpm, srcCol, dstCol,
      measure = false)._1

  /** [[trustRank]] plus the final round's total rank movement — the
    * [[rankWithConvergence]] companion for the seeded form.
    */
  def trustRankWithConvergence(edges: DataFrame, seeds: DataFrame, iters: Int = 5,
                               dampPpm: Long = 850000L,
                               srcCol: String = "src", dstCol: String = "dst")
      : (DataFrame, Long) = {
    val (r, _, d) = trustRankCore(edges, seeds, iters, dampPpm, srcCol, dstCol,
      measure = true)
    (r, d)
  }

  /** [[rankUntil]] for the seeded form: iterate until the round's total
    * movement drops to `epsPpm` or below, or `maxIters` rounds run.
    * Returns (ranks, iterations run, final delta); ranks equal a fixed-K
    * [[trustRank]] at the stop count bit-for-bit.
    */
  def trustRankUntil(edges: DataFrame, seeds: DataFrame, epsPpm: Long,
                     maxIters: Int = 50, dampPpm: Long = 850000L,
                     srcCol: String = "src", dstCol: String = "dst")
      : (DataFrame, Int, Long) = {
    require(epsPpm >= 0, "epsPpm must be non-negative")
    trustRankCore(edges, seeds, maxIters, dampPpm, srcCol, dstCol,
      measure = true, epsPpm = epsPpm)
  }

  private def trustRankCore(edges: DataFrame, seeds: DataFrame, iters: Int,
                            dampPpm: Long, srcCol: String, dstCol: String,
                            measure: Boolean,
                            epsPpm: Long = -1L): (DataFrame, Int, Long) = {
    require(iters >= 1, "trustrank needs at least one iteration")
    require(dampPpm >= 0 && dampPpm <= 1000000L, "dampPpm must be in [0, 1e6]")
    def keyOrRaise(c: String) =
      when(col(c).isNull, raise_error(lit(
        s"trustrank: NULL $c — a null endpoint has no node identity " +
          "(it would drop through every keyed join and silently lose edges)")))
        .otherwise(col(c))
    // same lazy-localCheckpoint shape as [[rankCore]]: leaf plans per
    // round (no re-embedded edge-build subtrees), zero per-round
    // materialization jobs — the whole K-round chain runs in the
    // consumer's single action, caching each round's blocks as it goes.
    val e = edges.select(keyOrRaise(srcCol).as("src"),
        keyOrRaise(dstCol).as("dst"))
      .filter(col("src") =!= col("dst")).distinct()
      .localCheckpoint(false)
    val seedKeys = seeds.select(seeds.columns.head).toDF("host").distinct()
    // the spine carries the seed flag once; every iteration reads it
    val nodes = e.select(col("src").as("host"))
      .union(e.select(col("dst").as("host"))).distinct()
      .join(seedKeys.select(col("host"), lit(1).as("__seed")), Seq("host"), "left")
      .select(col("host"), coalesce(col("__seed"), lit(0)).as("__seed"))
      .localCheckpoint(false)
    val deg = e.groupBy(col("src")).agg(count(lit(1)).as("__d"))
      .localCheckpoint(false)
    val teleport = 1000000L - dampPpm
    var r = nodes.select(col("host"),
        (col("__seed").cast("long") * lit(1000000L)).as("rank_ppm"))
      .localCheckpoint(false)
    var lastDelta = -1L
    var i = 0
    var converged = false
    while (i < iters && !converged) {
      i += 1
      val contrib = e
        .join(r.select(col("host").as("src"), col("rank_ppm")), "src")
        .join(deg, "src")
        .select(col("dst"), expr("rank_ppm div __d").as("__c"))
        .groupBy(col("dst")).agg(sum(col("__c")).as("__cs"))
      val rMat = nodes
        .join(contrib.select(col("dst").as("host"), col("__cs")), Seq("host"), "left")
        .select(col("host"),
          (col("__seed").cast("long") * lit(teleport) + expr(
            s"CAST((CAST($dampPpm AS DECIMAL(38,0)) * coalesce(__cs, 0L)) div 1000000 AS BIGINT)"))
            .as("rank_ppm"))
        .localCheckpoint(false)
      if (epsPpm >= 0 || (measure && i == iters)) lastDelta = totalDelta(r, rMat)
      r = rMat
      if (epsPpm >= 0 && lastDelta <= epsPpm) converged = true
    }
    (r, i, lastDelta)
  }
}
