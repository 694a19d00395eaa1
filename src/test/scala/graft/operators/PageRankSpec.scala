package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkTestBase

/** Fixed-point PageRank: cycle fixed point, hub concentration, dangling
  * and teleport-only nodes, edge normalization, and the partition-order
  * determinism the integer design buys.
  */
class PageRankSpec extends SparkTestBase {
  import spark.implicits._

  private def ranks(edges: Seq[(Long, Long)], iters: Int = 5): Map[Long, Long] =
    PageRank.rank(edges.toDF("src", "dst"), iters)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  test("a cycle is a fixed point: uniform 1e6 survives any iteration count") {
    // each node passes its whole rank along: 150000 + 0.85 * 1e6 = 1e6
    ranks(Seq((1L, 2L), (2L, 3L), (3L, 1L)), iters = 7) shouldBe
      Map(1L -> 1000000L, 2L -> 1000000L, 3L -> 1000000L)
  }

  test("a hub out-ranks its spokes; leaf-only nodes sit at the teleport floor") {
    // spokes 1..4 all link to hub 5; hub links back to spoke 1
    val r = ranks(Seq((1L, 5L), (2L, 5L), (3L, 5L), (4L, 5L), (5L, 1L)))
    r(5L) should be > r(1L)
    r(1L) should be > r(2L) // spoke 1 also receives the hub's mass
    // spokes 2-4 receive nothing: exactly the teleport term
    Seq(2L, 3L, 4L).map(r) shouldBe Seq(150000L, 150000L, 150000L)
  }

  test("parallel edges and self-loops are dropped; dangling nodes keep rows") {
    val r = ranks(Seq((1L, 2L), (1L, 2L), (1L, 1L), (3L, 1L)))
    // node 2 is dangling (no out-edges) but still ranked
    r.keySet shouldBe Set(1L, 2L, 3L)
    // the duplicate 1->2 must not double node 1's contribution: with
    // dedup, node 1's only out-edge is 1->2, so 2 gets all of 1's rank
    val rNoDup = ranks(Seq((1L, 2L), (3L, 1L)))
    r shouldBe rNoDup
  }

  test("deterministic under repartition (integer sums are order-free)") {
    val edges = (0L until 400L).flatMap(i =>
      Seq((i % 37, (i * 31 + 7) % 37), (i % 37, (i * 3 + 5) % 37)))
    val a = PageRank.rank(edges.toDF("src", "dst"), iters = 4)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val b = PageRank.rank(edges.toDF("src", "dst").repartition(17), iters = 4)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    a shouldBe b
  }

  test("mass accounting: total rank never exceeds teleport + damped total") {
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 2L), (5L, 2L))
    val r = ranks(edges)
    // dangling leakage only ever REMOVES mass vs the closed-system total
    r.values.sum should be <= 1000000L * r.size
    all(r.values.toSeq) should be >= 150000L
  }

  test("danglingRedistribute conserves mass within floor-division slack") {
    // a dangling-heavy graph (the crawl shape): 2 and 4 have no out-edges
    val edges = Seq((1L, 2L), (3L, 2L), (3L, 4L), (1L, 4L), (5L, 1L))
    val iters = 6
    val leaky = PageRank.rank(edges.toDF("src", "dst"), iters)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val closed = PageRank.rank(edges.toDF("src", "dst"), iters,
        danglingRedistribute = true)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val n = closed.size.toLong
    // leaky form loses the dangling mass visibly (~damped share of 2/5
    // of the graph's rank per round); the closed form holds N * 1e6
    // within the per-round floor-division slack (< ~3 ppm per node per
    // round, geometric-damped — budget generously at 10 per node-round)
    leaky.values.sum should be < n * 1000000L - n * 10 * iters
    math.abs(closed.values.sum - n * 1000000L) should be <= n * 10L * iters
    // redistribution preserves who the receivers are and the teleport
    // floor; dangling nodes still receive mass and rank above it
    closed.keySet shouldBe leaky.keySet
    all(closed.values.toSeq) should be >= 150000L
    closed(2L) should be > leaky(2L) // receivers gain the recycled mass
  }

  test("convergence report: a cycle reads delta 0; a hub graph is still moving at K=1") {
    // a 3-cycle is the integer fixed point from round 1 — the report must
    // say so exactly (delta 0), making K a measured knob instead of blind
    val cycle = Seq((1L, 2L), (2L, 3L), (3L, 1L)).toDF("src", "dst")
    val (cr, cd) = PageRank.rankWithConvergence(cycle, iters = 3)
    cd shouldBe 0L
    cr.collect().map(_.getLong(1)).toSet shouldBe Set(1000000L)
    // a star graph at K=1 has not converged; by K=8 the damped geometric
    // tail has shrunk the movement
    val star = Seq((1L, 9L), (2L, 9L), (3L, 9L), (9L, 1L)).toDF("src", "dst")
    val (_, d1) = PageRank.rankWithConvergence(star, iters = 1)
    val (_, d8) = PageRank.rankWithConvergence(star, iters = 8)
    d1 should be > 0L
    d8 should be < d1
    // the seeded form converges to 0 on a seed-covered cycle too
    val (_, td) = PageRank.trustRankWithConvergence(
      cycle, Seq(1L, 2L, 3L).toDF("host"), iters = 12)
    td shouldBe 0L
    // the unmeasured public forms are byte-identical to the measured ones
    PageRank.rank(star, iters = 3).collect().map(r => (r.get(0), r.getLong(1))).toSet shouldBe
      PageRank.rankWithConvergence(star, iters = 3)._1
        .collect().map(r => (r.get(0), r.getLong(1))).toSet
  }

  test("rankUntil: fixed point stops the loop; maxIters bounds it; ranks == fixed-K at the stop count") {
    def m(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // the cycle IS the integer fixed point: round 1 reads delta 0
    val cycle = Seq((1L, 2L), (2L, 3L), (3L, 1L)).toDF("src", "dst")
    val (r0, n0, d0) = PageRank.rankUntil(cycle, epsPpm = 0L, maxIters = 10)
    n0 should be <= 2
    d0 shouldBe 0L
    m(r0) shouldBe Map(1L -> 1000000L, 2L -> 1000000L, 3L -> 1000000L)
    // the chain settles node-by-node: a tight budget stops at maxIters
    // still moving; a loose one runs to the exact fixed point and stops
    // ITSELF well before the budget
    val chain = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L)).toDF("src", "dst")
    val (r2, n2, d2) = PageRank.rankUntil(chain, epsPpm = 0L, maxIters = 2)
    n2 shouldBe 2
    d2 should be > 0L
    m(r2) shouldBe m(PageRank.rank(chain, iters = 2))
    val (rf, nf, d3) = PageRank.rankUntil(chain, epsPpm = 0L, maxIters = 20)
    d3 shouldBe 0L
    nf should (be > 2 and be < 20)
    m(rf) shouldBe m(PageRank.rank(chain, iters = nf))
    // the dangling-redistribution path rides the same loop
    val hub = Seq((1L, 5L), (2L, 5L), (3L, 5L), (4L, 5L)).toDF("src", "dst")
    val (rd, nd, _) = PageRank.rankUntil(hub, epsPpm = 0L, maxIters = 3,
      danglingRedistribute = true)
    m(rd) shouldBe m(PageRank.rank(hub, iters = nd, danglingRedistribute = true))
    // trustrank: trust floods hop by hop, then the loop stops itself
    val seeds = Seq(Tuple1(1L)).toDF("host")
    val (tr, tn, td) = PageRank.trustRankUntil(chain, seeds,
      epsPpm = 0L, maxIters = 15)
    td shouldBe 0L
    tn should be < 15
    m(tr) shouldBe m(PageRank.trustRank(chain, seeds, iters = tn))
    an[IllegalArgumentException] should be thrownBy
      PageRank.rankUntil(cycle, epsPpm = -1L)
    Seq(r0, r2, rf, rd, tr).foreach(_.unpersist())
  }

  test("danglingRedistribute truncates lineage per iteration (constant-size plan)") {
    // each redistribution round references the rank frame TWICE (contrib
    // join + dangling-mass aggregate) — without per-round truncation the
    // logical plan doubles per iteration (2^iters nodes) and iters=16
    // would hang plan analysis long before any data moved (r14 advice)
    val edges = Seq((1L, 2L), (3L, 2L), (3L, 4L), (1L, 4L), (5L, 1L))
    val iters = 16
    val r = PageRank.rank(edges.toDF("src", "dst"), iters,
      danglingRedistribute = true)
    // the returned frame is a checkpointed leaf, not an iteration chain
    r.queryExecution.analyzed.collectLeaves() should have size 1
    r.queryExecution.analyzed.collect { case n => n }.size should be <= 3
    // and the deep run still conserves mass within floor-division slack
    val ranks = r.collect().map(x => x.getLong(0) -> x.getLong(1)).toMap
    val n = ranks.size.toLong
    math.abs(ranks.values.sum - n * 1000000L) should be <= n * 10L * iters
  }

  test("trustrank: mass reaches only hosts downstream of seeds; unreachable hosts score 0") {
    // 1 (seed) -> 2 -> 3; 4 -> 5 is a disconnected spam island
    val edges = Seq((1L, 2L), (2L, 3L), (4L, 5L)).toDF("src", "dst")
    val seeds = Seq(1L).toDF("host")
    val r = PageRank.trustRank(edges, seeds, iters = 5)
      .collect().map(x => x.getLong(0) -> x.getLong(1)).toMap
    r(1L) shouldBe 150000L                 // teleport only (no in-links)
    r(2L) should be > 0L                   // one hop from trust
    r(3L) should be > 0L                   // two hops
    r(2L) should be > r(3L)                // trust decays with distance
    r(4L) shouldBe 0L                      // the island gets NOTHING —
    r(5L) shouldBe 0L                      // unlike rank()'s uniform floor
    // the uniform-teleport form floors the island at 150000
    val pr = PageRank.rank(edges, iters = 5)
      .collect().map(x => x.getLong(0) -> x.getLong(1)).toMap
    pr(4L) shouldBe 150000L
  }

  test("trustrank: deterministic under repartition; seed rows matching no node are ignored") {
    val edges = (0L until 400L).flatMap(i =>
      Seq((i % 37, (i * 31 + 7) % 37), (i % 37, (i * 3 + 5) % 37)))
    val seeds = Seq(0L, 1L, 2L, 999999L).toDF("host") // 999999 not in graph
    val a = PageRank.trustRank(edges.toDF("src", "dst"), seeds, iters = 4)
      .collect().map(x => x.getLong(0) -> x.getLong(1)).toMap
    val b = PageRank.trustRank(edges.toDF("src", "dst").repartition(17),
        seeds, iters = 4)
      .collect().map(x => x.getLong(0) -> x.getLong(1)).toMap
    a shouldBe b
    a.keySet should not contain 999999L
  }

  test("string keys rank identically to their numeric relabeling") {
    val edges = Seq((1L, 5L), (2L, 5L), (3L, 5L), (4L, 5L), (5L, 1L))
    val byId = ranks(edges)
    val hosts = edges.map { case (s, d) => (s"host-$s.example", s"host-$d.example") }
    val byHost = PageRank.rank(hosts.toDF("src", "dst"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    byHost shouldBe byId.map { case (k, v) => s"host-$k.example" -> v }
  }

  test("a NULL edge endpoint raises instead of silently dropping edges") {
    val e = Seq((Some(1L), Some(2L)), (None, Some(3L)))
      .toDF("src", "dst")
    val ex = intercept[Exception] {
      PageRank.rank(e, iters = 1).collect()
    }
    ex.getMessage should include("null endpoint has no node identity")
  }
}
