package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** A relational Bloom filter: bit array as (word, bits) rows, build is one
  * `bit_or` aggregate, membership is a broadcast join + bit test — every
  * step pinned integer math a DuckDB oracle replays bit-for-bit.
  *
  * The 100 TB use case is PRE-FILTERING: [[Contamination.check]] broadcasts
  * the benchmark's full distinct shingle-hash set, which is fine for
  * MB-scale eval suites but grows with the reference corpus. The Bloom
  * collapses ANY reference set to a fixed 64 Ki-bit (8 KiB) array with no
  * false negatives — a contaminated doc can never slip through; false
  * positives only send a few extra docs to the exact verifier. The classic
  * two-stage gate: Bloom prune map-side, exact check on survivors only.
  *
  * Geometry: m = 2^16 bits as 2048 x 32-bit words (shifts stay far from
  * the sign bit in BOTH engines), k = 5 probes — false-positive rate
  * (1 - e^(-kn/m))^k ~ 0.6% at n = 10k reference shingles. Probe j of hash
  * `h` is `((a_j * h + b_j) mod P) mod m`, P = 2^31-1; `h` is the 30-bit
  * shingle hash, so products stay inside signed 64.
  */
object BloomFilter {

  val Bits = 1 << 16
  val WordBits = 32
  val Words: Int = Bits / WordBits
  val K = 5
  val ProbeMod = 2147483647L
  val ProbeA: Seq[Long] = Seq(2654435761L, 2246822519L, 3266489917L, 668265263L, 374761393L)
  val ProbeB: Seq[Long] = Seq(1L, 7919L, 104729L, 1299709L, 15485863L)

  private def probePos(h: Column, j: Int): Column =
    ((lit(ProbeA(j)) * h + lit(ProbeB(j))) % lit(ProbeMod)) % lit(Bits)

  /** Build the filter from a column of hash values: at most [[Words]]
    * (word, bits) rows. The explode emits k short rows per hash map-side;
    * the only shuffle is the combinable `bit_or` — and the result is
    * merge-able across shards by the same `bit_or` (set union).
    */
  def build(hashes: DataFrame, hashCol: String): DataFrame =
    hashes.filter(col(hashCol).isNotNull)
      .select(explode(array((0 until K).map(j => probePos(col(hashCol), j)): _*)).as("pos"))
      .select(
        shiftright(col("pos"), 5).cast("int").as("word"),
        expr("shiftleft(CAST(1 AS BIGINT), CAST(pos % 32 AS INT))").as("mask"))
      .groupBy(col("word"))
      .agg(expr("bit_or(mask)").as("bits"))

  /** Per-row membership: adds `in_bloom` (1 iff all k probed bits are set)
    * to `df`'s (keyCols, hashCol) rows. The filter side is <= [[Words]]
    * rows — always broadcast; the probe explode and bit tests are
    * map-side, so the corpus side never shuffles here (the per-key
    * regroup is on rows the caller already owns).
    */
  def mightContain(bloom: DataFrame, df: DataFrame, hashCol: String,
                   keyCols: Seq[String]): DataFrame = {
    val probeCols = keyCols :+ hashCol
    // NULL probes are excluded, mirroring build()'s NULL-member rule — a
    // NULL hash has no positions to test, and letting it through would
    // surface as a spurious in_bloom=0 row skewing per-key hit ratios
    df.filter(col(hashCol).isNotNull)
      .withColumn("__probe", explode(array((0 until K).map(j =>
        probePos(col(hashCol), j)): _*)))
      .select(probeCols.map(col) ++ Seq(
        shiftright(col("__probe"), 5).cast("int").as("__word"),
        expr("shiftleft(CAST(1 AS BIGINT), CAST(__probe % 32 AS INT))").as("__mask")): _*)
      .join(broadcast(bloom), col("__word") === col("word"), "left")
      .withColumn("__hit",
        when(col("bits").isNotNull && (col("bits").bitwiseAND(col("__mask")) =!= 0L), 1)
          .otherwise(0))
      .groupBy(probeCols.map(col): _*)
      .agg(min(col("__hit")).as("in_bloom"))
  }
}
