package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions.polyHash

/** Count-min sketch as RELATIONAL state: cells are rows, the build is one
  * map-side-combinable aggregate, the merge is `sum`, and every hash is
  * pinned integer math a DuckDB oracle replays bit-for-bit — the frequency
  * twin of the relational HyperLogLog in [[Sketches]].
  *
  * Why a sketch at all: exact term frequencies over a 100 TB corpus shuffle
  * one row per DISTINCT token (billions for web text). The CMS shuffle is
  * bounded by `depth x width` cells per group — a fixed 16 Ki rows here —
  * no matter how many tokens stream in, and per-shard sketches sum into the
  * corpus sketch without rescanning (the same incremental contract as
  * [[Sketches.mergeSketches]], with `+` in place of `max`).
  *
  * Estimates are upper bounds: `est(x) = min_i cells[i][h_i(x)] >= tf(x)`,
  * always (counts only ever add). Overestimate is bounded by colliding
  * mass: P[est > tf + (e/width) N] < e^-depth. Heavy hitters — the tokens
  * a vocabulary/stopword pass cares about — dominate their cells, so their
  * estimates are near-exact.
  *
  * Row hashes: `((a_i * h + b_i) mod P) mod width` over the 30-bit portable
  * rolling hash `h` (a_i < 2^31, h < 2^30: products stay inside signed 64).
  * P = 2^31-1 (Mersenne). The 30-bit base hash is fine HERE (unlike the
  * HLL, which needed 61 bits): a base-hash collision merely merges two
  * tokens' counts — one more overestimate source, not a cardinality cap.
  */
object FrequencySketch {

  val Depth = 4
  val Width = 4096
  val RowMod = 2147483647L
  val RowA: Seq[Long] = Seq(1103515245L, 1299709L, 784923521L, 179424673L)
  val RowB: Seq[Long] = Seq(12345L, 971L, 31337L, 271828L)

  /** The d probe cells of one hashed value: (row, idx) pairs. */
  private[operators] def cellIdx(h: Column, i: Int): Column =
    ((lit(RowA(i)) * h + lit(RowB(i))) % lit(RowMod)) % lit(Width)

  /** Build the sketch: one row per (groupCols..., r, idx) touched cell with
    * its count. NULL values are excluded (a NULL token has no frequency).
    * The explode emits `Depth` short rows per input row map-side; the only
    * shuffle is the combinable count aggregate.
    */
  def sketch(df: DataFrame, valueCol: String,
             groupCols: Seq[String] = Nil): DataFrame = {
    val hashed = df.filter(col(valueCol).isNotNull)
      .select(groupCols.map(col) :+ polyHash(col(valueCol)).as("__h"): _*)
    val cells = (0 until Depth).map(i =>
      struct(lit(i).as("r"), cellIdx(col("__h"), i).as("idx")))
    hashed
      .select(groupCols.map(col) :+ explode(array(cells: _*)).as("cell"): _*)
      .select(groupCols.map(col) ++ Seq(col("cell.r").as("r"), col("cell.idx").as("idx")): _*)
      .groupBy((groupCols ++ Seq("r", "idx")).map(col): _*)
      .agg(count(lit(1)).as("cnt"))
  }

  /** Sum-merge sharded sketches down to `keepGroupCols` (drop the shard
    * key): count addition is associative, so merge-of-parts is EXACTLY the
    * single-pass sketch of the union — q55 pins this against the oracle.
    */
  def merge(sketches: DataFrame, keepGroupCols: Seq[String] = Nil): DataFrame =
    sketches
      .groupBy((keepGroupCols ++ Seq("r", "idx")).map(col): _*)
      .agg(sum(col("cnt")).as("cnt"))

  /** Point estimates for a candidate list: `min` over the d probed cells,
    * absent cells counting 0. The candidate side is expected small (a
    * vocabulary head, a stopword list); the sketch side is at most
    * depth x width rows — both broadcastable, nothing corpus-sized moves.
    */
  def estimate(sk: DataFrame, candidates: DataFrame, valueCol: String): DataFrame = {
    val candCols = candidates.columns.toSeq
    val probes = candidates
      .withColumn("__h", polyHash(col(valueCol)))
      .withColumn("__probe", explode(array((0 until Depth).map(i =>
        struct(lit(i).as("r"), cellIdx(col("__h"), i).as("idx"))): _*)))
      .select(candCols.map(col) ++ Seq(col("__probe.r").as("__pr"), col("__probe.idx").as("__pidx")): _*)
    probes
      .join(broadcast(sk), col("__pr") === col("r") && col("__pidx") === col("idx"), "left")
      .groupBy(candCols.map(col): _*)
      .agg(min(coalesce(col("cnt"), lit(0L))).as("cms_est"))
  }
}
