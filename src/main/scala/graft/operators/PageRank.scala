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
  * Semantics: parallel edges and self-loops are dropped; dangling nodes
  * (no out-edges) leak their mass — the standard simplification (their
  * rank is still computed and they still receive the teleport term).
  *
  * Scale shape: each iteration is ONE keyed join (ranks to edges on src —
  * both sides hash-partitioned on the same key, so AQE reuses the
  * exchange) + one combinable groupBy(dst) sum + a left join back to the
  * node spine. K iterations = K such rounds over an edge table that never
  * grows; ranks/edges persist across iterations (edges once, each rank
  * frame until its successor materializes). No windows, no collect, no
  * pair blowup — edge-linear per iteration at any graph size.
  *
  * The RETURNED frame stays persisted (node-count-sized — one row per
  * host) so consumers read the materialized ranks instead of replaying
  * the iteration lineage; long-lived callers ranking many graphs should
  * `unpersist()` results they are done with. No incremental form on
  * purpose: ranks are a GLOBAL fixed point of the whole graph — new
  * edges shift every node's rank, so "increment == recompute" holds
  * trivially and an appendable-state variant would be a lie.
  */
object PageRank {

  def rank(edges: DataFrame, iters: Int = 5, dampPpm: Long = 850000L,
           srcCol: String = "src", dstCol: String = "dst"): DataFrame = {
    require(iters >= 1, "pagerank needs at least one iteration")
    require(dampPpm >= 0 && dampPpm <= 1000000L, "dampPpm must be in [0, 1e6]")
    val storage = org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK
    val e = edges.select(col(srcCol).cast("long").as("src"),
        col(dstCol).cast("long").as("dst"))
      .filter(col("src") =!= col("dst")).distinct()
      .persist(storage)
    val nodes = e.select(col("src").as("host"))
      .union(e.select(col("dst").as("host"))).distinct()
      .persist(storage)
    val deg = e.groupBy(col("src")).agg(count(lit(1)).as("__d"))
    val teleport = 1000000L - dampPpm
    var r = nodes.select(col("host"), lit(1000000L).as("rank_ppm"))
      .persist(storage)
    for (_ <- 1 to iters) {
      val contrib = e
        .join(r.select(col("host").as("src"), col("rank_ppm")), "src")
        .join(deg, "src")
        .select(col("dst"), expr("rank_ppm div __d").as("__c"))
        .groupBy(col("dst")).agg(sum(col("__c")).as("__cs"))
      val rNew = nodes
        .join(contrib.select(col("dst").as("host"), col("__cs")), Seq("host"), "left")
        .select(col("host"),
          (lit(teleport) + expr(
            s"CAST((CAST($dampPpm AS DECIMAL(38,0)) * coalesce(__cs, 0L)) div 1000000 AS BIGINT)"))
            .as("rank_ppm"))
        .persist(storage)
      rNew.count() // materialize before releasing the previous iteration
      r.unpersist()
      r = rNew
    }
    // the final ranks are materialized, so the big inputs can release;
    // a cache-evicted recompute of `r` would re-derive them (slower,
    // still correct)
    e.unpersist()
    nodes.unpersist()
    r
  }
}
