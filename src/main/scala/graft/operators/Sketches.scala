package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions.polyHash

/** Approximate distinct counting as a RELATIONAL HyperLogLog — registers
  * are rows, the merge is `max`, and every step is replayable by the
  * DuckDB oracle.
  *
  * Spark's `approx_count_distinct` is a fine production default, but its
  * HLL++ buffers are engine-internal: no other system can replay them, so
  * a cross-engine pipeline can't verify the estimate. This formulation
  * keeps the sketch IN the relational algebra:
  *
  *   - register index = polyHash(value) mod m;
  *   - rho = (trailing zeros of polyHash(value) div m) + 1 — computed with
  *     pure integer bit math (`w & -w` isolates the lowest set bit,
  *     `bit_count(lowbit - 1)` is its position), never a float log;
  *   - per (group, register): `max(rho)` — ONE map-side-combinable
  *     aggregate, so the shuffle carries at most groups × m short rows no
  *     matter how many raw values stream in. That is the entire point vs
  *     exact countDistinct, whose shuffle carries every distinct (group,
  *     value) pair;
  *   - estimate = alpha_m * m^2 / sum(2^-R_j), the harmonic-mean HLL
  *     estimator, folded over registers IN INDEX ORDER (missing registers
  *     contribute 2^0), with 2^-R as `1.0 / (1 << R)` — an exact integer
  *     shift and one exact division, no libm — so the float sum is
  *     bit-identical on both engines.
  *
  * This is the RAW estimator: no small-range (linear-counting) or
  * large-range correction, which keeps the oracle twin exact — expect the
  * documented ~1.04/sqrt(m) relative error only in the mid range, worse
  * below ~2.5*m distinct values. The companion exact count in
  * [[approxDistinctWithExact]] makes the error visible instead of hidden.
  */
object Sketches {

  /** registers per group (a power of two — the bit math requires it) */
  val Registers = 64
  /** polyHash values span < 2^30, so w = h div 64 spans < 2^24: a zero w
    * means 24 trailing zero bits -> rho caps at 25
    */
  val MaxRho = 25
  /** standard HLL bias constant alpha_m for m = 64 */
  val Alpha: Double = 0.7213 / (1.0 + 1.079 / Registers)

  private def rho(w: Column): Column = {
    // lowest set bit of w, as a power of two; its position is
    // bit_count(lowbit - 1)
    val lowbit = w.bitwiseAND(-w)
    when(w === 0L, lit(MaxRho))
      .otherwise(bit_count(lowbit - lit(1L)) + lit(1))
  }

  /** Per-group approximate distinct count of `valueCol` (a string column;
    * hashed with the portable rolling hash).
    */
  def approxDistinct(df: DataFrame, groupCol: String, valueCol: String): DataFrame = {
    val h = polyHash(col(valueCol))
    // h < 2^53, so the double divide by the power-of-two register count is
    // exact and the truncating cast is a floor
    val w = (h / lit(Registers)).cast("long")
    val regs = df
      // countDistinct ignores NULLs; the sketch must too — an unfiltered
      // NULL value would hash to a NULL register whose NULL rho poisons
      // the whole group's fold to NULL
      .filter(col(valueCol).isNotNull)
      .select(col(groupCol),
        (h % Registers).cast("int").as("reg"),
        rho(w).as("rho"))
      .groupBy(col(groupCol), col("reg"))
      .agg(max(col("rho")).as("r"))
    // fold registers in index order; absent registers contribute 2^0 = 1
    // (the 64-minus-size term — kept OUTSIDE the fold, one exact add).
    // 2^-r is an exact integer shift + one exact division (SQL shiftleft
    // accepts a column shift amount; the Scala helper does not)
    val folded = regs
      // CAST(1 AS DOUBLE), not the literal 1.0: Spark parses 1.0 as
      // DECIMAL(2,1) and decimal division's scale-22 result ROUNDS 2^-r
      // for r >= 23 — breaking the exactness the oracle fold relies on
      .withColumn("inv", expr("CAST(1 AS DOUBLE) / shiftleft(CAST(1 AS BIGINT), r)"))
      .groupBy(col(groupCol))
      .agg(sort_array(collect_list(struct(col("reg"), col("inv")))).as("rs"))
      .withColumn("inv_sum",
        aggregate(col("rs"), lit(0.0), (acc, s) => acc + s.getField("inv"))
          + (lit(Registers.toDouble) - size(col("rs")).cast("double")))
    folded.select(
      col(groupCol),
      round(lit(Alpha * Registers * Registers) / col("inv_sum"), 6)
        .as("approx_distinct"))
  }

  /** [[approxDistinct]] plus the exact count — the error made visible.
    * (The exact side shuffles (group, value) pairs; it exists for audit
    * and tests, not for the 100 TB hot path.)
    */
  def approxDistinctWithExact(df: DataFrame, groupCol: String, valueCol: String): DataFrame = {
    // null-safe join: a NULL group key is a real group (same rule as
    // Sampling.rebalanceToQuota) — a plain equi-join would silently drop it
    val exact = df.groupBy(col(groupCol))
      .agg(countDistinct(col(valueCol)).as("exact_distinct"))
      .withColumnRenamed(groupCol, "__sk_group")
    approxDistinct(df, groupCol, valueCol)
      .join(exact, col(groupCol) <=> col("__sk_group"))
      .drop("__sk_group")
  }
}
