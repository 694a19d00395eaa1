package graft.operators

import graft.SparkTestBase

/** HITS: star-graph fixed point, hand-computed max-normalization on a
  * mixed-degree bipartite graph, genuine zeros, edge normalization, and
  * partition-order determinism.
  */
class HitsSpec extends SparkTestBase {
  import spark.implicits._

  private def ranks(edges: Seq[(Long, Long)], iters: Int = 4): Map[Long, (Long, Long)] =
    Hits.rank(edges.toDF("src", "dst"), iters)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap

  test("star graph: spokes are pure hubs, the center a pure authority") {
    val r = ranks(Seq((1L, 5L), (2L, 5L), (3L, 5L), (4L, 5L)))
    Seq(1L, 2L, 3L, 4L).foreach { u => r(u) shouldBe ((1000000L, 0L)) }
    r(5L) shouldBe ((0L, 1000000L))
  }

  test("a cycle is a fixed point: uniform 1e6 hubs and authorities") {
    ranks(Seq((1L, 2L), (2L, 3L), (3L, 1L)), iters = 6) shouldBe
      Map(1L -> ((1000000L, 1000000L)), 2L -> ((1000000L, 1000000L)),
        3L -> ((1000000L, 1000000L)))
  }

  test("convergence report: a directed cycle reads delta 0; mixed graphs move at K=1") {
    val cycle = Seq((1L, 2L), (2L, 3L), (3L, 1L)).toDF("src", "dst")
    val (cr, cd) = Hits.rankWithConvergence(cycle, iters = 3)
    cd shouldBe 0L
    cr.collect().map(r => (r.getLong(1), r.getLong(2))).toSet shouldBe
      Set((1000000L, 1000000L))
    // the bipartite graph's scores approach the 1/phi fixed point only
    // asymptotically (integer floor keeps them moving by a few ppm) — the
    // report must show the movement SHRINKING, which is exactly the signal
    // a caller uses to size K
    val mixed = Seq((1L, 10L), (2L, 10L), (2L, 11L)).toDF("src", "dst")
    val (_, d1) = Hits.rankWithConvergence(mixed, iters = 1)
    val (mr, d4) = Hits.rankWithConvergence(mixed, iters = 4)
    d1 should be > 0L
    d4 should be < d1 / 10L // two extra rounds shrink movement >10x here
    // measured == unmeasured byte-for-byte
    mr.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet shouldBe
      Hits.rank(mixed, iters = 4)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
  }

  test("rankUntil: a cycle stops at round 1; a moving graph runs to maxIters at eps 0; == fixed-K at stop") {
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val cycle = Seq((1L, 2L), (2L, 3L), (3L, 1L)).toDF("src", "dst")
    val (cr, cn, cd) = Hits.rankUntil(cycle, epsPpm = 0L, maxIters = 8)
    cn shouldBe 1
    cd shouldBe 0L
    // the bipartite graph approaches its fixed point asymptotically (the
    // convergence-report test's graph): still moving at round 3, so
    // maxIters wins at eps 0 — and the scores equal the fixed-K run
    val mixed = Seq((1L, 10L), (2L, 10L), (2L, 11L)).toDF("src", "dst")
    val (mr, mn, md) = Hits.rankUntil(mixed, epsPpm = 0L, maxIters = 3)
    mn shouldBe 3
    md should be > 0L
    rows(mr) shouldBe rows(Hits.rank(mixed, iters = 3))
    // a loose eps stops as soon as the movement falls under it
    val (er, en, ed) = Hits.rankUntil(mixed, epsPpm = 100000L, maxIters = 12)
    en should be < 12
    ed should be <= 100000L
    rows(er) shouldBe rows(Hits.rank(mixed, iters = en))
    an[IllegalArgumentException] should be thrownBy
      Hits.rankUntil(cycle, epsPpm = -5L)
    Seq(cr, mr, er).foreach(_.unpersist())
  }

  test("hand-computed normalization on a mixed-degree bipartite graph") {
    // 1 -> 10, 2 -> 10, 2 -> 11; two iterations by hand:
    //   a1: raw (2e6, 1e6) -> (1e6, 500000); h1: raw (1e6, 1.5e6) -> (666666, 1e6)
    //   a2: raw (1666666, 1e6) -> (1e6, 600000); h2: raw (1e6, 1.6e6) -> (625000, 1e6)
    val r = ranks(Seq((1L, 10L), (2L, 10L), (2L, 11L)), iters = 2)
    r(1L)._1 shouldBe 625000L
    r(2L)._1 shouldBe 1000000L
    r(10L)._2 shouldBe 1000000L
    r(11L)._2 shouldBe 600000L
    // pure sources/sinks have genuine zeros on the other score
    r(10L)._1 shouldBe 0L
    r(1L)._2 shouldBe 0L
  }

  test("parallel edges and self-loops are dropped") {
    val withDups = ranks(Seq((1L, 5L), (1L, 5L), (5L, 5L), (2L, 5L)))
    withDups shouldBe ranks(Seq((1L, 5L), (2L, 5L)))
  }

  test("deterministic under repartition (integer sums + exact normalization)") {
    val edges = (0L until 400L).flatMap(i =>
      Seq((i % 37, (i * 31 + 7) % 37), (i % 37, (i * 3 + 5) % 37)))
    val a = Hits.rank(edges.toDF("src", "dst"), iters = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sortBy(_._1)
    val b = Hits.rank(edges.toDF("src", "dst").repartition(17), iters = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sortBy(_._1)
    a shouldBe b
  }

  test("a NULL edge endpoint raises instead of silently dropping edges") {
    val e = Seq((Some(1L), Some(2L)), (Some(3L), None)).toDF("src", "dst")
    val ex = intercept[Exception] { Hits.rank(e, iters = 1).collect() }
    ex.getMessage should include("null endpoint has no node identity")
  }
}
