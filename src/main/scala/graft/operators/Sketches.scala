package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.PolyHash61.polyHash61
import graft.functions.PolyHash61Impl

/** Approximate distinct counting as a RELATIONAL HyperLogLog — registers
  * are rows (or a dense per-group vector), the merge is `max`, and every
  * step is replayable by the DuckDB oracle.
  *
  * Spark's `approx_count_distinct` is a fine production default, but its
  * HLL++ buffers are engine-internal: no other system can replay them, so
  * a cross-engine pipeline can't verify the estimate. This formulation
  * keeps the sketch IN the relational algebra:
  *
  *   - hash = [[graft.functions.PolyHash61]]: a 61-bit portable polynomial
  *     hash mod the Mersenne prime 2^61-1 (the earlier 30-bit poly hash
  *     saturates a cardinality sketch near 2^30 and collision-biases it
  *     down long before that; 61 bits leave headroom far past 100 TB-scale
  *     cardinalities);
  *   - register index = low `logM` bits of the hash (m = 2^logM registers,
  *     default 2^14 for ~1.04/sqrt(m) = 0.8% mid-range error);
  *   - rho = (trailing zeros of hash >> logM) + 1 — pure integer bit math
  *     (`w & -w` isolates the lowest set bit, `bit_count(lowbit - 1)` is
  *     its position), never a float log; a zero w means all 61-logM
  *     remaining bits are zero -> rho caps at 62-logM;
  *   - per (group, register): `max(rho)` — ONE map-side-combinable
  *     aggregate, so the shuffle carries at most groups × m short rows no
  *     matter how many raw values stream in;
  *   - estimate = alpha_m * m^2 / sum(2^-R_j), the harmonic-mean HLL
  *     estimator, folded over registers IN INDEX ORDER (absent/zero
  *     registers contribute 2^0 via one exact add), with 2^-R as an exact
  *     integer shift and one exact division — so the float sum is
  *     bit-identical on both engines;
  *   - small-range correction: when the raw estimate is <= 2.5m and some
  *     registers are still zero, linear counting `m * ln(m / V)` (V = zero
  *     registers) replaces it. `ln` is NOT libm (libm results differ
  *     across engines in the last ulp): both engines evaluate the same
  *     pinned atanh series over the same exact inputs — see
  *     [[estimateSteps]] — so even the corrected estimate is
  *     bit-replayable.
  *
  * No large-range correction is needed: the 61-bit hash space keeps
  * collision bias negligible past 10^12 distinct values.
  *
  * Mergeability — the feature-store workflow: [[sketchVector]] emits the
  * registers as a dense `array<int>` column (one row per group, m
  * elements), [[mergeSketches]] element-wise-max-merges vectors across
  * shards/days relationally, and [[estimateVector]] reads an estimate off
  * any (merged) vector. Because max is associative and commutative,
  * merge-of-parts is EXACTLY the sketch of the whole (q50 pins this
  * against the oracle), so per-day sketches union without rescanning —
  * the cardinality analogue of incremental backfill.
  */
object Sketches {

  /** log2 of the default register count: m = 2^14 -> ~0.8% relative error,
    * 16 Ki registers (64 KiB dense vector) per group.
    */
  val DefaultLogRegisters = 14

  /** rho cap: hash < 2^61, so w = hash >> logM spans 61-logM bits; w == 0
    * means 61-logM trailing zeros -> rho = 62-logM.
    */
  def maxRho(logM: Int): Int = 62 - logM

  /** standard HLL bias constant alpha_m, times m^2 (valid for m >= 128) */
  def alphaM2(logM: Int): Double = {
    val m = (1L << logM).toDouble
    0.7213 / (1.0 + 1.079 / m) * m * m
  }

  /** pinned ln(2) literal (Double.toString(Math.log(2))) — embedded
    * verbatim in both engines' expressions so they parse the same double
    */
  val Ln2Lit = "0.6931471805599453"

  private def requireLogM(logM: Int): Unit =
    require(logM >= 7 && logM <= 20,
      s"logM must be in [7, 20] (alpha_m constant needs m >= 128; got $logM)")

  private def rho(w: Column, cap: Int): Column = {
    // lowest set bit of w, as a power of two; its position is
    // bit_count(lowbit - 1)
    val lowbit = w.bitwiseAND(-w)
    when(w === 0L, lit(cap))
      .otherwise(bit_count(lowbit - lit(1L)) + lit(1))
  }

  /** The sparse register table: one row per (group, touched register) with
    * the max rho seen — the sketch in relational form. NULL values are
    * excluded (countDistinct ignores NULLs; the sketch must too).
    */
  def registers(df: DataFrame, groupCols: Seq[String], valueCol: String,
                logM: Int = DefaultLogRegisters): DataFrame = {
    requireLogM(logM)
    val m = 1L << logM
    val h = polyHash61(col(valueCol))
    df.filter(col(valueCol).isNotNull)
      .select(groupCols.map(col) ++ Seq(
        h.bitwiseAND(lit(m - 1)).cast("int").as("reg"),
        rho(shiftright(h, logM), maxRho(logM)).as("rho")): _*)
      .groupBy((groupCols :+ "reg").map(col): _*)
      .agg(max(col("rho")).as("r"))
  }

  /** The estimator tail as (column name, SQL expression text) steps over
    * columns `inv_sum` (the index-ordered 2^-R fold, zero registers
    * included as 2^0) and `nregs` (count of touched registers). The SAME
    * texts run as Spark `expr`s and as DuckDB lateral-aliased SELECT
    * columns: both engines parse identical op trees over doubles, and
    * IEEE +,-,*,/ are correctly rounded everywhere, so the results are
    * bit-identical — the property that makes even the linear-counting
    * branch oracle-replayable without libm.
    *
    * ln(V) for the integer V in [1, m): k = floor(log2 V) off a CASE
    * ladder, x = V / 2^k in [1, 2) (exact: V is integer-exact in double
    * and the divisor a power of two), then the atanh series
    * ln(x) = 2(t + t^3/3 + ... + t^13/13), t = (x-1)/(x+1), |t| <= 1/3 —
    * truncation < 1.1e-8, far below the estimator's own error and
    * deterministic, which is what parity needs.
    */
  def estimateSteps(logM: Int): Seq[(String, String)] = {
    requireLogM(logM)
    val m = 1L << logM
    val ln2 = s"CAST($Ln2Lit AS DOUBLE)"
    // the atanh-series ln is the SHARED PinnedMath chain (one copy of the
    // parity-critical series in the codebase): its 62-arm range reduction
    // picks the same k as a logM-arm ladder for every reachable v_zero
    // (< 2^logM), so the values are bit-identical to the inlined original
    Seq("v_zero" -> s"$m - nregs") ++
      graft.functions.PinnedMath.lnSteps("lnv", "v_zero") ++
      Seq(
        "raw_est" -> s"CAST(${alphaM2(logM)} AS DOUBLE) / inv_sum",
        // linear counting: est = m * (ln m - ln V) = m * (logM*ln2 - ln V);
        // ln m is exact-by-construction (m a power of two)
        "est" -> (s"CASE WHEN raw_est <= CAST(${2.5 * m} AS DOUBLE) AND v_zero > 0 " +
          s"THEN CAST(${m.toDouble} AS DOUBLE) * (CAST($logM AS DOUBLE) * $ln2 - lnv_ln) " +
          "ELSE raw_est END"),
        "approx_distinct" -> "round(est, 6)")
  }

  /** [[estimateSteps]] as a DuckDB SELECT-list fragment (lateral aliases:
    * each step references the previous ones by name).
    */
  def estimateSelectSql(logM: Int): String =
    estimateSteps(logM).map { case (n, e) => s"$e AS $n" }.mkString(",\n  ")

  private def applySteps(df: DataFrame, steps: Seq[(String, String)]): DataFrame =
    steps.foldLeft(df) { case (d, (n, e)) => d.withColumn(n, expr(e)) }

  /** Estimate per group from the sparse register table: fold 2^-r over
    * present registers in index order (one exact shift + division each),
    * add the zero-register mass as one exact add, then the
    * [[estimateSteps]] tail.
    */
  def estimateSparse(regs: DataFrame, groupCols: Seq[String],
                     logM: Int = DefaultLogRegisters): DataFrame = {
    requireLogM(logM)
    val m = 1L << logM
    val folded = regs
      // CAST(1 AS DOUBLE), not the literal 1.0: Spark parses 1.0 as
      // DECIMAL(2,1) and decimal division's scale-22 result ROUNDS 2^-r
      // for r >= 23 — breaking the exactness the oracle fold relies on
      .withColumn("inv", expr("CAST(1 AS DOUBLE) / shiftleft(CAST(1 AS BIGINT), r)"))
      .groupBy(groupCols.map(col): _*)
      .agg(sort_array(collect_list(struct(col("reg"), col("inv")))).as("rs"))
      .withColumn("nregs", size(col("rs")).cast("bigint"))
      .withColumn("inv_sum",
        aggregate(col("rs"), lit(0.0), (acc, s) => acc + s.getField("inv"))
          + (lit(m.toDouble) - col("nregs").cast("double")))
    applySteps(folded, estimateSteps(logM))
      .select(groupCols.map(col) :+ col("approx_distinct"): _*)
  }

  /** Per-group approximate distinct count of `valueCol` (a string column,
    * hashed with the 61-bit portable hash).
    */
  def approxDistinct(df: DataFrame, groupCol: String, valueCol: String,
                     logM: Int = DefaultLogRegisters): DataFrame =
    estimateSparse(registers(df, Seq(groupCol), valueCol, logM), Seq(groupCol), logM)

  /** [[approxDistinct]] plus the exact count — the error made visible.
    * (The exact side shuffles (group, value) pairs; it exists for audit
    * and tests, not for the 100 TB hot path.)
    */
  def approxDistinctWithExact(df: DataFrame, groupCol: String, valueCol: String,
                              logM: Int = DefaultLogRegisters): DataFrame = {
    // null-safe join: a NULL group key is a real group (same rule as
    // Sampling.rebalanceToQuota) — a plain equi-join would silently drop it
    val exact = df.groupBy(col(groupCol))
      .agg(countDistinct(col(valueCol)).as("exact_distinct"))
      .withColumnRenamed(groupCol, "__sk_group")
    approxDistinct(df, groupCol, valueCol, logM)
      .join(exact, col(groupCol) <=> col("__sk_group"))
      .drop("__sk_group")
  }

  /** The sketch as a first-class DENSE column: one row per group, `sketch`
    * an `array<int>` of length m (register index -> max rho, 0 = untouched)
    * — the persistable/mergeable form (64 KiB per group at the default m).
    * Built from the sparse table by filling index gaps with zeros (O(m)
    * per group; element_at on the sorted sparse list is O(1)).
    */
  def sketchVector(df: DataFrame, groupCols: Seq[String], valueCol: String,
                   logM: Int = DefaultLogRegisters): DataFrame = {
    requireLogM(logM)
    val m = (1L << logM).toInt
    val rs = col("rs")
    registers(df, groupCols, valueCol, logM)
      .groupBy(groupCols.map(col): _*)
      .agg(sort_array(collect_list(struct(col("reg"), col("r")))).as("rs"))
      .withColumn("sketch",
        // a group only exists with >= 1 register, but guard the empty case
        // anyway: sequence(1, 0) would step BACKWARD, not produce []
        when(size(rs) === 0, array_repeat(lit(0), lit(m))).otherwise(
          concat(
            flatten(transform(sequence(lit(1), size(rs)), i => {
              val cur = element_at(rs, i)
              val prevReg = when(i === 1, lit(-1))
                .otherwise(element_at(rs, i - 1).getField("reg"))
              concat(
                array_repeat(lit(0), cur.getField("reg") - prevReg - lit(1)),
                array(cur.getField("r")))
            })),
            array_repeat(lit(0),
              lit(m - 1) - element_at(rs, size(rs)).getField("reg")))))
      .drop("rs")
  }

  /** Element-wise max-merge of dense sketch vectors across the rows of each
    * group — RELATIONALLY: positions explode to (group, pos, rho) rows, max
    * combines map-side, and the dense vector reassembles from the (complete)
    * position set. Shuffle volume is groups × m short rows regardless of how
    * many shard sketches merge; no aggregation buffer ever holds more than
    * one row's vector.
    */
  def mergeSketches(df: DataFrame, groupCols: Seq[String], sketchCol: String,
                    logM: Int = DefaultLogRegisters): DataFrame = {
    requireLogM(logM)
    df.select(groupCols.map(col) :+ posexplode(col(sketchCol)).as(Seq("pos", "rho")): _*)
      .groupBy((groupCols :+ "pos").map(col): _*)
      .agg(max(col("rho")).as("r"))
      .groupBy(groupCols.map(col): _*)
      .agg(sort_array(collect_list(struct(col("pos"), col("r")))).as("ps"))
      .withColumn(sketchCol, transform(col("ps"), s => s.getField("r")))
      .drop("ps")
  }

  /** Estimate per group off a dense sketch vector column. Replays the
    * sparse fold EXACTLY: non-zero registers in index order (filter keeps
    * order), zero-register mass as one exact add — so an estimate off a
    * merged vector hash-matches the single-pass sparse estimate of the
    * same data (q50).
    */
  def estimateVector(df: DataFrame, groupCols: Seq[String], sketchCol: String,
                     logM: Int = DefaultLogRegisters): DataFrame = {
    requireLogM(logM)
    val m = 1L << logM
    // 2^-r lookup table: exact doubles, identical to the engine-side
    // CAST(1 AS DOUBLE) / shiftleft(1, r) values the sparse path divides out
    val invTable = array((0 to maxRho(logM)).map(r => lit(1.0 / (1L << r))): _*)
    val nz = filter(col(sketchCol), r => r =!= 0)
    val folded = df
      .withColumn("nregs", size(nz).cast("bigint"))
      .withColumn("inv_sum",
        aggregate(nz, lit(0.0), (acc, r) => acc + element_at(invTable, r + 1))
          + (lit(m.toDouble) - col("nregs").cast("double")))
    applySteps(folded, estimateSteps(logM))
      .select(groupCols.map(col) :+ col("approx_distinct"): _*)
  }
}
