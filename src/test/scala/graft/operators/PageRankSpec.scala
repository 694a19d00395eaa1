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
}
