package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** HITS hubs-and-authorities over a (src, dst) edge list (Kleinberg 1999)
  * — [[PageRank]]'s complement for link analysis of a crawl graph:
  * authority separates the PAGES worth keeping (pointed at by good
  * hubs), hub scores separate the LINK PAGES worth recrawling for
  * discovery. PageRank conflates the two into one stationary mass.
  *
  * Engine-exact by the pinned-integer discipline: scores are INTEGER ppm;
  * each half-step is a BIGINT sum over the in/out edge join (order-free,
  * combinable), and the per-round normalization — mandatory for HITS,
  * whose un-normalized scores grow geometrically with the iteration
  * count — divides by the round's MAXIMUM via exact floor division
  * `score * 1e6 div max` (a DECIMAL(38,0) product, so no overflow at any
  * graph size), putting the top node at exactly 1e6 each round. Every
  * quantity is a pure integer function of the graph: bit-identical
  * across engines and partitionings, replayable by an unrolled oracle.
  *
  * Semantics: parallel edges and self-loops are dropped (the [[PageRank]]
  * edge normalization); NULL endpoints raise per-row. Every node gets a
  * row; a node with no in-edges has authority 0 after the first round,
  * no out-edges hub 0 — genuine zeros, unlike PageRank's teleport floor.
  *
  * Scale shape: each iteration is TWO keyed joins (scores to edges — the
  * same hash partitioning both directions, so AQE reuses exchanges) +
  * two combinable sums + two 1-row max aggregates broadcast back into
  * the normalization. K iterations = 2K edge-linear rounds; edges and
  * the node spine persist once. No windows, no collect.
  *
  * The returned frame is checkpoint-cached on first materialization (one
  * row per node) — the [[PageRank.rank]] contract; blocks release with
  * the session's cache cleanup.
  */
object Hits {

  def rank(edges: DataFrame, iters: Int = 4,
           srcCol: String = "src", dstCol: String = "dst"): DataFrame =
    rankCore(edges, iters, srcCol, dstCol, measure = false)._1

  /** [[rank]] plus convergence observability: the FINAL iteration's total
    * movement `sum(|hub_k - hub_{k-1}|) + sum(|auth_k - auth_{k-1}|)` in
    * ppm — two combinable sums over node-count-sized checkpointed frames.
    * 0 says the normalized integer fixed point was reached at or before K
    * (a directed cycle reports 0 — HitsSpec pins it); see SCALING.md on
    * choosing K.
    */
  def rankWithConvergence(edges: DataFrame, iters: Int = 4,
                          srcCol: String = "src", dstCol: String = "dst")
      : (DataFrame, Long) = {
    val (r, _, d) = rankCore(edges, iters, srcCol, dstCol, measure = true)
    (r, d)
  }

  /** [[PageRank.rankUntil]] for HITS: iterate until the round's total
    * movement (hub + authority, vs the previous round) drops to `epsPpm`
    * or below, or `maxIters` rounds run. Returns (scores, iterations run,
    * final delta); scores equal a fixed-K [[rank]] at the stop count
    * bit-for-bit. Each round pays two combinable 1-row delta aggregates —
    * the convergence path's cost.
    */
  def rankUntil(edges: DataFrame, epsPpm: Long, maxIters: Int = 50,
                srcCol: String = "src", dstCol: String = "dst")
      : (DataFrame, Int, Long) = {
    require(epsPpm >= 0, "epsPpm must be non-negative")
    rankCore(edges, maxIters, srcCol, dstCol, measure = true, epsPpm = epsPpm)
  }

  private def delta(prev: DataFrame, curr: DataFrame, scoreCol: String): Long =
    prev.select(col("host"), col(scoreCol).as("__prev"))
      .join(curr, Seq("host"))
      .agg(coalesce(sum(abs(col(scoreCol) - col("__prev"))), lit(0L)))
      .head().getLong(0)

  private def rankCore(edges: DataFrame, iters: Int,
                       srcCol: String, dstCol: String,
                       measure: Boolean,
                       epsPpm: Long = -1L): (DataFrame, Int, Long) = {
    require(iters >= 1, "hits needs at least one iteration")
    def keyOrRaise(c: String) =
      when(col(c).isNull, raise_error(lit(
        s"hits: NULL $c — a null endpoint has no node identity " +
          "(it would drop through every keyed join and silently lose edges)")))
        .otherwise(col(c))
    val e = edges.select(keyOrRaise(srcCol).as("src"),
        keyOrRaise(dstCol).as("dst"))
      .filter(col("src") =!= col("dst")).distinct()
      .localCheckpoint(false)
    val nodes = e.select(col("src").as("host"))
      .union(e.select(col("dst").as("host"))).distinct()
      .localCheckpoint(false)
    // re-normalize a raw BIGINT score column to [0, 1e6] by the round max:
    // exact integer floor division on a DECIMAL(38,0) product. `raw` is
    // lazily checkpoint-cached first: the normalization references it
    // twice (the 1-row max + the projection), and without the leaf plan
    // the logical tree would DOUBLE per half-step (2^(2*iters) nodes — a
    // driver OOM on the plan STRING alone); the cache also makes the
    // second reference read blocks instead of re-running the half-step's
    // join+aggregate.
    def normalized(raw0: DataFrame, scoreCol: String): DataFrame = {
      val raw = raw0.localCheckpoint(false)
      val mx = raw.agg(max(col(scoreCol)).as("__mx"))
      raw.crossJoin(broadcast(mx))
        .select(col("host"),
          when(col("__mx") > 0L, expr(
            s"CAST((CAST($scoreCol AS DECIMAL(38,0)) * 1000000) div __mx AS BIGINT)"))
            .otherwise(lit(0L)).as(scoreCol))
    }
    // every loop-carried frame is LAZILY localCheckpoint-ed: the logical
    // plan truncates to a LogicalRDD leaf immediately (lineage can never
    // re-embed the edge build or double through the normalization), but
    // NO job runs inside the loop — the consumer's single action executes
    // the whole 2K-half-step chain, caching each node-count-sized frame
    // (MEMORY_AND_DISK) as it passes. The old EAGER checkpoints spent one
    // Spark job per half-step purely on materialization (8 jobs at K=4,
    // the q161 bench cost); measure/until modes still act per round — the
    // delta needs the value. Blocks release with the session's cache
    // cleanup (Bench clears persistent RDDs between queries). On a real
    // cluster swap localCheckpoint for reliable checkpointing if executor
    // loss mid-iteration must be survivable — the standard iterative-
    // graph tradeoff; results are unaffected (the math is order-free).
    var h = nodes.select(col("host"), lit(1000000L).as("hub_ppm"))
      .localCheckpoint(false)
    var a: DataFrame = null
    var lastDelta = -1L
    var i = 0
    var converged = false
    while (i < iters && !converged) {
      i += 1
      val (hPrev, aPrev) = (h, a)
      // authority half-step: a(v) = sum of h(u) over in-edges (u -> v)
      val aRaw = nodes.join(
          e.join(h.select(col("host").as("src"), col("hub_ppm")), "src")
            .groupBy(col("dst").as("host")).agg(sum(col("hub_ppm")).as("auth_ppm")),
          Seq("host"), "left")
        .select(col("host"), coalesce(col("auth_ppm"), lit(0L)).as("auth_ppm"))
      a = normalized(aRaw, "auth_ppm").localCheckpoint(false)
      // hub half-step: h(u) = sum of a(v) over out-edges (u -> v)
      val hRaw = nodes.join(
          e.join(a.select(col("host").as("dst"), col("auth_ppm")), "dst")
            .groupBy(col("src").as("host")).agg(sum(col("auth_ppm")).as("hub_ppm")),
          Seq("host"), "left")
        .select(col("host"), coalesce(col("hub_ppm"), lit(0L)).as("hub_ppm"))
      h = normalized(hRaw, "hub_ppm").localCheckpoint(false)
      // movement: hub vs previous hub, auth vs previous auth (round 1 has
      // no previous auth — hub movement alone). Until-mode measures every
      // round (the stop test needs it); plain convergence mode the final
      // round only.
      if (epsPpm >= 0 || (measure && i == iters))
        lastDelta = delta(hPrev, h, "hub_ppm") +
          (if (aPrev == null) 0L else delta(aPrev, a, "auth_ppm"))
      if (epsPpm >= 0 && lastDelta <= epsPpm) converged = true
    }
    val out = h.join(a, Seq("host"))
      .select(col("host"), col("hub_ppm"), col("auth_ppm"))
      .localCheckpoint(false)
    (out, i, lastDelta)
  }
}
