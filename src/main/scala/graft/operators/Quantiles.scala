package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Scalable exact quantiles over a bounded-precision value column, and the
  * quantile-threshold filter ("quality gate") built on them.
  *
  * The obvious formulations both fail at 100 TB: Spark's exact
  * `percentile` buffers every value of the group in one aggregation
  * buffer, and `approx_percentile`'s t-digest merge is
  * partition-order-sensitive — not replayable by an oracle. This operator
  * instead discretizes: values are rounded to `precision` decimals, the
  * distribution collapses to a HISTOGRAM of at most ~10^precision distinct
  * rows (bounded by the value domain, independent of corpus size) via one
  * map-side-combinable aggregate, and the quantile is read exactly off the
  * histogram's running counts. The returned threshold is the type-1 (lower)
  * quantile of the ROUNDED distribution: the smallest rounded value v with
  * `count(values <= v) >= ceil(q * N)`.
  *
  * NULL values carry no rank information and are EXCLUDED before the
  * histogram (N counts non-null values only) — Spark's window would sort a
  * NULL group first while DuckDB sorts it last, so admitting NULLs would
  * both skew the rank and break oracle parity. A NULL can never pass the
  * gate either way (`round(NULL) >= t` is NULL).
  *
  * Determinism: counts are integers, the quantile rank is computed with
  * integer arithmetic from a RATIONAL q = qNum/qDen (never a float
  * multiply), and rounding is fixed-precision — the DuckDB oracle replays
  * every step bit-for-bit.
  */
object Quantiles {

  /** Histogram of non-null `valueCol` rounded to `precision` decimals:
    * (v, cnt).
    */
  def histogram(df: DataFrame, valueCol: String, precision: Int): DataFrame =
    df.filter(col(valueCol).isNotNull)
      .groupBy(round(col(valueCol), precision).as("v"))
      .agg(count(lit(1)).as("cnt"))

  /** One row: the type-1 quantile threshold of the rounded distribution at
    * q = qNum/qDen. The window over the histogram is unpartitioned by
    * design — its frame is the bounded histogram, not the corpus.
    */
  def quantileThreshold(df: DataFrame, valueCol: String,
                        qNum: Long, qDen: Long, precision: Int): DataFrame = {
    require(qDen > 0 && qNum >= 0 && qNum <= qDen,
      s"q must be a rational in [0, 1]: got $qNum/$qDen")
    val h = histogram(df, valueCol, precision)
      .withColumn("cum",
        sum(col("cnt")).over(
          Window.orderBy(col("v")).rowsBetween(Window.unboundedPreceding, 0)))
    val total = h.agg(sum(col("cnt")).as("n"))
    // rank k = ceil(qNum*N / qDen) in pure integer math — `div`, not `/`
    // (Column./ on longs is a DOUBLE divide, inexact past 2^53), and
    // decomposed as (N div qDen)*qNum + ceil((N mod qDen)*qNum / qDen) so
    // no intermediate exceeds max(N, qDen^2): N*qNum itself would overflow
    // a long for petabyte-scale row counts at fine-grained q
    require(qDen <= 1000000000L, s"qDen must be <= 1e9 (got $qDen)")
    h.crossJoin(broadcast(total))
      .withColumn("k", expr(
        s"(n div $qDen) * $qNum + ((n % $qDen) * $qNum + ${qDen - 1L}) div $qDen"))
      .filter(col("cum") >= col("k"))
      .agg(min(col("v")).as("threshold"))
  }

  /** Per-group type-1 quantile thresholds: one row per group value. Same
    * histogram construction as [[quantileThreshold]], but every window is
    * PARTITIONED by the group — per-group frames are bounded by the
    * histogram size, so a hot group never serializes the corpus into one
    * task (the per-group analogue of the scalar version's tiny-frame
    * argument). The per-language quality cut of a multilingual corpus is
    * the motivating use.
    */
  def groupedQuantileThreshold(df: DataFrame, groupCol: String, valueCol: String,
                               qNum: Long, qDen: Long, precision: Int): DataFrame =
    thresholdFromHistogram(
      groupedHistogram(df, Seq(groupCol), valueCol, precision), groupCol, qNum, qDen)

  /** Per-group histogram of non-null rounded values: (groupCols..., v,
    * cnt) — the quantile sketch in relational form, and (with `sum` as the
    * merge) the third MERGEABLE sketch alongside the HLL (`max`) and the
    * CMS (`sum` over cells): bin addition is associative, so per-shard
    * histograms merged with [[mergeHistograms]] are EXACTLY the histogram
    * of the union — and any quantile read off the merged bins equals the
    * single-pass answer (q71 pins it against the oracle).
    */
  def groupedHistogram(df: DataFrame, groupCols: Seq[String], valueCol: String,
                       precision: Int): DataFrame =
    df.filter(col(valueCol).isNotNull)
      .groupBy(groupCols.map(col) :+ round(col(valueCol), precision).as("v"): _*)
      .agg(count(lit(1)).as("cnt"))

  /** Sum-merge sharded histograms down to `keepGroupCols` (drop the shard
    * key) — bounded state per group, no rescan of the shards' raw values.
    */
  def mergeHistograms(hists: DataFrame, keepGroupCols: Seq[String]): DataFrame =
    hists.groupBy((keepGroupCols :+ "v").map(col): _*)
      .agg(sum(col("cnt")).as("cnt"))

  /** Type-1 quantile thresholds per `groupCol`, read off an existing
    * (groupCol, v, cnt) histogram — the shared tail of
    * [[groupedQuantileThreshold]] and the merged-sketch path. Windows are
    * partitioned by the group and framed by the bounded histogram.
    */
  def thresholdFromHistogram(h: DataFrame, groupCol: String,
                             qNum: Long, qDen: Long): DataFrame = {
    require(qDen > 0 && qNum >= 0 && qNum <= qDen,
      s"q must be a rational in [0, 1]: got $qNum/$qDen")
    require(qDen <= 1000000000L, s"qDen must be <= 1e9 (got $qDen)")
    val grp = Window.partitionBy(col(groupCol))
    h.withColumn("cum",
        sum(col("cnt")).over(grp.orderBy(col("v")).rowsBetween(Window.unboundedPreceding, 0)))
      .withColumn("n", sum(col("cnt")).over(grp))
      .withColumn("k", expr(
        s"(n div $qDen) * $qNum + ((n % $qDen) * $qNum + ${qDen - 1L}) div $qDen"))
      .filter(col("cum") >= col("k"))
      .groupBy(col(groupCol)).agg(min(col("v")).as("threshold"))
  }

  /** Total-variation distance between two samples' value distributions —
    * the drift check a pipeline runs between train/val splits, or between
    * yesterday's and today's corpus (PSI without the logarithm: TV is
    * `0.5 * sum_v |p_v - q_v|`, equally standard and — unlike PSI —
    * expressible in EXACT arithmetic both engines replay bit-for-bit).
    *
    * Shape: two bounded histograms (combinable aggregates), FULL OUTER
    * joined on the bin (a bin present on one side only contributes its
    * whole mass), then ONE integer-exact aggregate: the numerator
    * `sum_v |cnt_a * n_b - cnt_b * n_a|` sums DECIMAL(38) products —
    * exact and order-independent where a float p-q fold would be
    * order-sensitive — and the half-up rounding to 6 places happens in
    * integer arithmetic too (ppm = (2e6*num + den) div (2*den)); the only
    * float op is the final bit-deterministic ppm/1e6 division. Returns one
    * row: (n_a, n_b, tv_distance in [0,1]).
    */
  def tvDistance(a: DataFrame, b: DataFrame, valueCol: String,
                 precision: Int): DataFrame = {
    val ha = histogram(a, valueCol, precision).withColumnRenamed("cnt", "cnt_a")
    val hb = histogram(b, valueCol, precision).withColumnRenamed("cnt", "cnt_b")
    val joined = ha.join(hb, Seq("v"), "full_outer")
      .select(
        coalesce(col("cnt_a"), lit(0L)).as("cnt_a"),
        coalesce(col("cnt_b"), lit(0L)).as("cnt_b"))
    // one-row totals cross-joined back — the q43 scalar-broadcast shape
    val totals = joined.agg(sum(col("cnt_a")).as("n_a"), sum(col("cnt_b")).as("n_b"))
    joined.crossJoin(broadcast(totals))
      .agg(
        max(col("n_a")).as("n_a"),
        max(col("n_b")).as("n_b"),
        // decimal(19,0) operands: a long always fits, and the product's
        // inferred precision (39 -> capped 38) still holds every
        // long x long value exactly — no float, no overflow, order-free
        sum(abs(
          col("cnt_a").cast("decimal(19,0)") * col("n_b").cast("decimal(19,0)")
            - col("cnt_b").cast("decimal(19,0)") * col("n_a").cast("decimal(19,0)")))
          .as("num"))
      .select(col("n_a"), col("n_b"),
        // num / (2*n_a*n_b) rounded half-up to 6 places with INTEGER-only
        // arithmetic (ppm = (2e6*num + den) div (2*den)), then one pinned
        // IEEE division — no engine's double-rounding can disagree
        expr("CAST((CAST(num AS DECIMAL(38,0)) * 2000000" +
          " + CAST(n_a AS DECIMAL(19,0)) * n_b * 2)" +
          " div (CAST(n_a AS DECIMAL(19,0)) * n_b * 4) AS DOUBLE) / 1000000.0")
          .as("tv_distance"))
      // an empty side makes TV undefined (0/0 — and Spark's NULL vs
      // DuckDB's NaN would even disagree): emit NO row rather than a
      // sentinel, deterministically on both engines
      .filter(col("n_a") > 0 && col("n_b") > 0)
  }

  /** The FULL quantile profile per group — every k/qDen threshold
    * (deciles at qDen=10, percentiles at 100) from ONE histogram pass,
    * where calling [[groupedQuantileThreshold]] per quantile would rescan
    * the corpus qDen times. The bounded histogram cross-joins a
    * qDen-1-row quantile spine (histogram-sized × spine — bounded, the
    * sanctioned small-side nested loop, never corpus-sized) and each
    * (group, q) picks its type-1 threshold with the same integer-rational
    * rank math as every quantile here.
    */
  def groupedQuantileProfile(df: DataFrame, groupCol: String, valueCol: String,
                             qDen: Long, precision: Int): DataFrame =
    profileFromHistogram(
      groupedHistogram(df, Seq(groupCol), valueCol, precision), groupCol, qDen)

  /** The spine-cross-histogram profile core shared by the exact
    * ([[groupedQuantileProfile]]) and log-bucketed
    * ([[logBucketQuantileProfile]]) variants: `h` is any (groupCol, v, cnt)
    * histogram; every window frame is histogram-sized.
    */
  private def profileFromHistogram(h: DataFrame, groupCol: String,
                                   qDen: Long): DataFrame = {
    require(qDen >= 2 && qDen <= 1000, s"qDen must be in [2, 1000]: got $qDen")
    val grp = Window.partitionBy(col(groupCol))
    val hc = h
      .withColumn("cum",
        sum(col("cnt")).over(grp.orderBy(col("v")).rowsBetween(Window.unboundedPreceding, 0)))
      .withColumn("n", sum(col("cnt")).over(grp))
    val spine = h.sparkSession.range(1, qDen).toDF("q")
    hc.crossJoin(broadcast(spine))
      .filter(col("cum") >=
        expr(s"(n div $qDen) * q + ((n % $qDen) * q + ${qDen - 1}) div $qDen"))
      .groupBy(col(groupCol), col("q"))
      .agg(min(col("v")).as("threshold"))
  }

  /** Powers of ten as exact longs, 10^0 .. 10^18. */
  private val Pow10: Array[Long] = Iterator.iterate(1L)(_ * 10L).take(19).toArray

  /** Deterministic LOG-BUCKET of a double value: the fixed-point magnitude
    * `m = floor(|v| * 10^precision)` truncated to its top `sigDigits`
    * decimal digits (sign restored). This is the bounded-bin fallback the
    * rounded-precision histogram family needs for genuinely CONTINUOUS
    * heavy-tailed columns, where distinct rounded values ~ distinct values
    * and the "bounded histogram" claim collapses: here the bin count is
    * capped at 2 * 9*10^(sigDigits-1) * 19 + 1 (sign x buckets-per-decade x
    * decades) REGARDLESS of the value domain, and the bucket edge is a
    * lower bound with relative error < 10^(1-sigDigits).
    *
    * Determinism is the design constraint: no log()/pow() (libm calls an
    * oracle could round differently) — the magnitude test is a when-chain
    * against exact long powers of ten and the truncation is `m - m % 10^j`,
    * all integer ops both engines replay bit-for-bit
    * ([[sigTruncCaseSql]] emits the same chain as SQL). The only float ops
    * are abs/multiply/floor/least — single IEEE operations with one correct
    * answer. Values beyond the long fixed-point range clamp into the top
    * bucket (9e18, ~292k years in micros) rather than overflowing.
    *
    * Ordering is preserved (v1 <= v2 implies bucket(v1) <= bucket(v2)):
    * positive magnitudes truncate DOWN and negatives truncate toward zero,
    * both monotone step functions, so histogram rank math stays valid.
    */
  def logBucket(c: org.apache.spark.sql.Column, precision: Int,
                sigDigits: Int): org.apache.spark.sql.Column = {
    require(precision >= 0 && precision <= 6,
      s"precision must be in [0, 6]: got $precision")
    require(sigDigits >= 1 && sigDigits <= 15,
      s"sigDigits must be in [1, 15]: got $sigDigits")
    // NULL stays NULL: least() SKIPS nulls (the winsorize lesson), so
    // without the explicit guard a missing measurement would clamp to
    // the 9e18 literal and land in the TOP bucket
    val m = when(c.isNull, lit(null))
      .otherwise(least(floor(abs(c) * lit(Pow10(precision).toDouble)), lit(9.0e18)))
      .cast("long")
    // m has d+1 digits when m >= 10^d: wrap ascending so the OUTERMOST
    // when() tests the largest threshold first
    var divisor: org.apache.spark.sql.Column = lit(1L)
    for (d <- sigDigits until 19)
      divisor = when(m >= Pow10(d), lit(Pow10(d + 1 - sigDigits))).otherwise(divisor)
    val mag = m - (m % divisor)
    when(c < 0, -mag).otherwise(mag)
  }

  /** The DuckDB twin of [[logBucket]]'s significant-digit truncation,
    * generated from the same Pow10 constants so the two chains cannot
    * drift: a flat CASE over the fixed-point column `m` (descending
    * thresholds — first match wins, same semantics as the when-chain).
    */
  def sigTruncCaseSql(m: String, sigDigits: Int): String =
    "CASE " + (18 to sigDigits by -1).map(d =>
      s"WHEN $m >= ${Pow10(d)} THEN $m - ($m % ${Pow10(d + 1 - sigDigits)})")
      .mkString(" ") + s" ELSE $m END"

  /** [[sigTruncCaseSql]]'s companion: the fixed-point magnitude expression
    * for a value column, identical to [[logBucket]]'s first step.
    */
  def fixedPointSql(v: String, precision: Int): String =
    s"CAST(least(floor(abs($v) * ${Pow10(precision)}.0), 9e18) AS BIGINT)"

  /** Per-group log-bucketed histogram: (groupCol, v = bucket as long, cnt).
    * Bounded by the [[logBucket]] bin cap, never by the value domain.
    */
  def logBucketHistogram(df: DataFrame, groupCol: String, valueCol: String,
                         precision: Int, sigDigits: Int): DataFrame =
    df.filter(col(valueCol).isNotNull)
      .groupBy(col(groupCol), logBucket(col(valueCol), precision, sigDigits).as("v"))
      .agg(count(lit(1)).as("cnt"))

  /** [[groupedQuantileProfile]] over LOG buckets: every k/qDen threshold per
    * group where the value domain is continuous/heavy-tailed and the exact
    * rounded histogram would grow with the corpus. The returned threshold is
    * the bucket edge (divided back to value scale) of the type-1 quantile
    * of the bucketized distribution, within relative error 10^(1-sigDigits)
    * of the exact quantile. Bound direction follows the sign: [[logBucket]]
    * truncates the MAGNITUDE's trailing digits, so for positive values the
    * edge is a conservative LOWER bound of the exact quantile, while for
    * negative values truncation-toward-zero makes it an UPPER bound (e.g.
    * -123 buckets to -120 >= -123). Ordering and cross-engine parity are
    * unaffected either way. The window frames and the spine cross join stay
    * bin-cap-bounded even when every row's value is distinct.
    */
  def logBucketQuantileProfile(df: DataFrame, groupCol: String, valueCol: String,
                               qDen: Long, precision: Int,
                               sigDigits: Int): DataFrame =
    profileFromHistogram(
      logBucketHistogram(df, groupCol, valueCol, precision, sigDigits),
      groupCol, qDen)
      .select(col(groupCol), col("q"),
        (col("threshold").cast("double") / lit(Pow10(precision).toDouble))
          .as("threshold"))

  /** One log-bucketed quantile per group — [[groupedQuantileThreshold]]'s
    * contract with [[logBucket]]'s bounded bins.
    */
  def groupedLogBucketQuantile(df: DataFrame, groupCol: String, valueCol: String,
                               qNum: Long, qDen: Long, precision: Int,
                               sigDigits: Int): DataFrame =
    thresholdFromHistogram(
      logBucketHistogram(df, groupCol, valueCol, precision, sigDigits),
      groupCol, qNum, qDen)
      .select(col(groupCol),
        (col("threshold").cast("double") / lit(Pow10(precision).toDouble))
          .as("threshold"))

  /** GROUPED drift: each group's total-variation distance from THE REST of
    * the corpus — [[tvDistance]] fanned out per group without running |G|
    * two-frame comparisons (which would rescan the corpus per group). The
    * which-source-drifted audit: a source whose length/quality
    * distribution diverges from everyone else's is the one to inspect.
    *
    * One bounded per-group histogram is the only corpus pass. For group g
    * with n_g rows out of N, and per-bin counts cnt_g vs global cnt_all:
    * `TV(g, rest) = Σ_v |cnt_g*(N-n_g) - (cnt_all-cnt_g)*n_g| /
    * (2*n_g*(N-n_g))`. Bins where g is ABSENT contribute their whole rest
    * mass — accounted in closed form as `(N - Σ_present cnt_all) * n_g`,
    * so the join only ever touches (group, bin) pairs that exist. Exact
    * DECIMAL arithmetic end-to-end; one pinned double division per group.
    * Groups owning the whole corpus (N == n_g: "rest" is empty, TV
    * undefined) emit no row, like [[tvDistance]]'s empty-side rule.
    */
  def groupedTvDrift(df: DataFrame, groupCol: String, valueCol: String,
                     precision: Int): DataFrame = {
    val d19 = (c: org.apache.spark.sql.Column) => c.cast("decimal(19,0)")
    val h = groupedHistogram(df, Seq(groupCol), valueCol, precision)
    // bin totals, group sizes, and the corpus total are WINDOWS over the
    // bounded histogram, not self-joins: a self-join formulation consumed h
    // four times, recomputing an expensive upstream once per consumer (the
    // NB-scored corpus in the q121 calibration audit measured 22x). The
    // single-partition total window is safe precisely because h is
    // histogram-sized (groups x bins), never the corpus
    import org.apache.spark.sql.expressions.Window
    h.withColumn("cnt_all", sum(col("cnt")).over(Window.partitionBy(col("v"))))
      .withColumn("n_group", sum(col("cnt")).over(Window.partitionBy(col(groupCol))))
      .withColumn("n_total", sum(col("cnt")).over(Window.partitionBy(lit(0))))
      .withColumn("__term", abs(
        d19(col("cnt")) * (d19(col("n_total")) - d19(col("n_group")))
          - d19(col("cnt_all") - col("cnt")) * d19(col("n_group"))))
      .groupBy(col(groupCol))
      .agg(
        max(col("n_group")).as("n_group"),
        max(col("n_total")).as("n_total"),
        sum(col("cnt_all")).as("present_all"),
        sum(col("__term")).as("present_num"))
      .select(
        col(groupCol),
        col("n_group"),
        (col("n_total") - col("n_group")).as("n_rest"),
        // same exact-ppm rounding as [[tvDistance]]: numerator includes the
        // absent-bin closed form, denominator 2*n_g*n_rest, all integer
        expr("CAST((CAST(present_num" +
          " + CAST(n_total - present_all AS DECIMAL(19,0)) * n_group" +
          " AS DECIMAL(38,0)) * 2000000" +
          " + CAST(n_group AS DECIMAL(19,0)) * (n_total - n_group) * 2)" +
          " div (CAST(n_group AS DECIMAL(19,0)) * (n_total - n_group) * 4)" +
          " AS DOUBLE) / 1000000.0").as("tv_vs_rest"))
      .filter(col("n_rest") > 0)
  }

  /** Per-row percentile rank WITHOUT a corpus-wide window: the fraction of
    * the row's group with value <= the row's (rounded) value. The naive
    * formulation — `cume_dist() OVER (PARTITION BY group ORDER BY v)` —
    * sorts every group's rows inside one task each; this one aggregates
    * the bounded per-group HISTOGRAM (same state as
    * [[groupedQuantileThreshold]]), computes running counts over histogram
    * rows, and broadcasts the tiny (group, v, cum, n) table back for a
    * row-local lookup join. Identical result to cume_dist on the rounded
    * values (`cum / n`, rounded to 6), at histogram cost instead of a
    * per-group sort of the corpus.
    *
    * The rank table is bounded by groups x 10^precision x value-range
    * rows — broadcastable at the coarse precisions percentile FEATURES
    * use (3-4 decimals). For fine precisions over wide domains pass
    * `broadcastRanks = false`: the lookup becomes a shuffle join keyed on
    * (group, rounded value), both sides short rows.
    */
  def percentileRank(df: DataFrame, groupCol: String, valueCol: String,
                     precision: Int, broadcastRanks: Boolean = true): DataFrame = {
    val grp = Window.partitionBy(col("__pr_grp"))
    val h = df.filter(col(valueCol).isNotNull)
      .groupBy(col(groupCol).as("__pr_grp"), round(col(valueCol), precision).as("__pr_v"))
      .agg(count(lit(1)).as("cnt"))
    val ranks = h
      .withColumn("__pr_cum",
        sum(col("cnt")).over(grp.orderBy(col("__pr_v")).rowsBetween(Window.unboundedPreceding, 0)))
      .withColumn("__pr_n", sum(col("cnt")).over(grp))
      .select(col("__pr_grp"), col("__pr_v"),
        // round-half-up to 6 places in EXACT integer arithmetic, then one
        // IEEE division by 1e6: int->double conversion and a single divide
        // are bit-deterministic in every engine, where round(double, 6) of
        // the quotient is a last-ulp coin flip across engine versions
        expr("CAST((CAST(__pr_cum AS DECIMAL(38,0)) * 2000000 + __pr_n)" +
          " div (CAST(__pr_n AS DECIMAL(38,0)) * 2) AS DOUBLE) / 1000000.0")
          .as("pct_rank"))
    val lookup = if (broadcastRanks) broadcast(ranks) else ranks.hint("shuffle_hash")
    df.filter(col(valueCol).isNotNull)
      .join(lookup,
        col(groupCol) <=> col("__pr_grp") && round(col(valueCol), precision) === col("__pr_v"))
      .drop("__pr_grp", "__pr_v")
  }

  /** Robust per-group outlier gate: keep rows within `kNum/kDen` MADs
    * (median absolute deviations) of their group median — the
    * length/score sanity filter a corpus pass runs per language, robust
    * where a mean/stddev cut is dragged by the very outliers it should
    * remove. Both medians are [[groupedQuantileThreshold]]s (bounded
    * per-group histogram frames, never a corpus sort), the per-group
    * stats broadcast back, and the gate is a row-local integer-rational
    * comparison `abs_dev * kDen <= mad * kNum` — fully oracle-replayable.
    *
    * `group_median`, `abs_dev`, and `group_mad` ride along as columns so
    * the cut is auditable. `df` feeds three passes (median, MAD, gate);
    * `storage` persists it across them — same policy knob as
    * [[quantileGate]].
    */
  def madOutlierGate(df: DataFrame, groupCol: String, valueCol: String,
                     kNum: Long, kDen: Long, precision: Int,
                     storage: StorageLevel = StorageLevel.MEMORY_AND_DISK): DataFrame = {
    require(kNum >= 0 && kDen > 0, s"k must be a non-negative rational: got $kNum/$kDen")
    val d = Caching.maybePersist(df, storage)
    val med = groupedQuantileThreshold(d, groupCol, valueCol, 1L, 2L, precision)
      .withColumnRenamed("threshold", "group_median")
      .withColumnRenamed(groupCol, "__mad_grp")
    // null-safe group join throughout: a NULL group has a real median
    val withMed = d.join(broadcast(med), col(groupCol) <=> col("__mad_grp"))
      .drop("__mad_grp")
      .withColumn("abs_dev", abs(round(col(valueCol), precision) - col("group_median")))
    val mad = groupedQuantileThreshold(withMed, groupCol, "abs_dev", 1L, 2L, precision)
      .withColumnRenamed("threshold", "group_mad")
      .withColumnRenamed(groupCol, "__mad_grp")
    withMed.join(broadcast(mad), col(groupCol) <=> col("__mad_grp"))
      .drop("__mad_grp")
      .filter(col("abs_dev") * lit(kDen) <= col("group_mad") * lit(kNum))
  }

  /** Keep rows whose rounded value is >= the q-th quantile threshold (the
    * "top 1-q by score" gate). The threshold rides along as a column so
    * the cut is auditable. The threshold side is one row — broadcast by
    * construction; the gate itself is a row-local filter. `df` is consumed
    * twice (threshold pass + gate pass): `storage` persists it across the
    * two, the same policy knob as the dedup operators — pass
    * StorageLevel.NONE when upstream is a cheap scan.
    */
  def quantileGate(df: DataFrame, valueCol: String,
                   qNum: Long, qDen: Long, precision: Int,
                   storage: StorageLevel = StorageLevel.MEMORY_AND_DISK): DataFrame = {
    val d = Caching.maybePersist(df, storage)
    d.crossJoin(broadcast(quantileThreshold(d, valueCol, qNum, qDen, precision)))
      .filter(round(col(valueCol), precision) >= col("threshold"))
  }

  /** Per-group z-score standardization of an INTEGRAL value column — the
    * feature-normalization pass before training. Moments accumulate as
    * EXACT integer sums (count, sum, sum-of-squares in DECIMAL(38) —
    * order-independent where a float fold drifts with partitioning);
    * sample variance `(n*ss - s*s) / (n*(n-1))` converts to double once,
    * in a pinned expression an oracle replays (HUGEINT on the DuckDB
    * side). sqrt of the same double is correctly-rounded IEEE on both
    * engines, so even z itself is bit-replayable. Groups with n <= 1 or
    * zero variance get NULL std and z (never a divide-by-zero or an
    * Infinity that poisons downstream aggregates).
    *
    * One combinable aggregate (3 numbers per group) broadcast back; the
    * z computation is row-local. Adds (group_mean, group_std, z), each
    * rounded to `scale` decimals.
    */
  def standardize(df: DataFrame, groupCol: String, valueCol: String,
                  scale: Int = 6): DataFrame = {
    val integral: Boolean = df.schema(valueCol).dataType match {
      case org.apache.spark.sql.types.ByteType | org.apache.spark.sql.types.ShortType |
           org.apache.spark.sql.types.IntegerType | org.apache.spark.sql.types.LongType => true
      case _ => false
    }
    require(integral,
      s"standardize needs an INTEGRAL value column for exact moments; " +
        s"'$valueCol' is ${df.schema(valueCol).dataType.sql} — discretize or scale upstream")
    val d = col(valueCol).cast("decimal(19,0)")
    val m = df.groupBy(col(groupCol))
      .agg(
        count(col(valueCol)).as("__n"),
        sum(d).as("__s"),
        sum(d * d).as("__ss"))
      .withColumnRenamed(groupCol, "__std_grp")
    val mean = col("__s").cast("double") / col("__n")
    val varS = (col("__n") * col("__ss") - col("__s") * col("__s")).cast("double") /
      (col("__n") * (col("__n") - lit(1L))).cast("double")
    val std = when(col("__n") > 1 && varS > 0, sqrt(varS))
    df.join(broadcast(m), col(groupCol) <=> col("__std_grp")).drop("__std_grp")
      .withColumn("group_mean", round(mean, scale))
      .withColumn("group_std", round(std, scale))
      .withColumn("z", round((col(valueCol).cast("double") - mean) / std, scale))
      .drop("__n", "__s", "__ss")
  }

  /** Per-group Pearson correlation of two INTEGER-valued columns — the
    * feature-relationship audit (does length track token count? does
    * quality track recency?) with the same exactness discipline as
    * [[standardize]]: all five moments (sum x, y, xy, x², y²) accumulate
    * in DECIMAL(38,0) — exact and order-independent where float moments
    * drift with partitioning — and the float boundary is crossed ONCE per
    * group: one decimal→double conversion per term, two sqrt calls (IEEE
    * correctly-rounded, so deterministic everywhere), one division.
    * Degenerate groups (n < 2 or zero variance in either column) emit
    * NULL r. One combinable aggregate; output is group-sized.
    *
    * Magnitude bound (caller contract): the n*sum(x²) moments must fit
    * DECIMAL(38,0), i.e. roughly |x|,|y| < 1e14 for group sizes up to
    * 1e9 (|x|² * n <= 1e38). Beyond it the engines FAIL DIFFERENTLY —
    * Spark's non-ANSI decimal overflow silently yields NULL r where the
    * DuckDB twin's HUGEINT sum raises — so a pipeline feeding unbounded
    * magnitudes must pre-scale (divide by a power of ten; r is
    * scale-invariant) rather than rely on either engine's overflow
    * behavior.
    */
  def groupedPearson(df: DataFrame, groupCol: String, xCol: String,
                     yCol: String): DataFrame = {
    val d38 = (c: org.apache.spark.sql.Column) => c.cast("decimal(38,0)")
    df.filter(col(xCol).isNotNull && col(yCol).isNotNull)
      .groupBy(col(groupCol))
      .agg(
        count(lit(1)).as("n"),
        sum(d38(col(xCol))).as("__sx"),
        sum(d38(col(yCol))).as("__sy"),
        sum(d38(col(xCol)) * d38(col(yCol))).as("__sxy"),
        sum(d38(col(xCol)) * d38(col(xCol))).as("__sxx"),
        sum(d38(col(yCol)) * d38(col(yCol))).as("__syy"))
      .withColumn("__num", d38(col("n")) * col("__sxy") - col("__sx") * col("__sy"))
      .withColumn("__vx", d38(col("n")) * col("__sxx") - col("__sx") * col("__sx"))
      .withColumn("__vy", d38(col("n")) * col("__syy") - col("__sy") * col("__sy"))
      .select(col(groupCol), col("n"),
        when(col("n") >= 2 && col("__vx") > 0 && col("__vy") > 0,
          col("__num").cast("double")
            / (sqrt(col("__vx").cast("double")) * sqrt(col("__vy").cast("double"))))
          .as("r"))
  }

  /** Per-group winsorization: clamp each row's value into its group's
    * [lo, hi] quantile band (the outlier treatment that KEEPS the row —
    * [[madOutlierGate]] drops; this caps — standard before averaging
    * heavy-tailed features). Both thresholds read off ONE bounded
    * per-group histogram (built once, two threshold passes over its
    * already-aggregated bins), joined back null-safe and broadcast; the
    * clamp is a row-local greatest/least. Adds (group_lo, group_hi,
    * clamped) — clamped in the rounded domain the histogram lives in,
    * exact on both engines.
    */
  def winsorize(df: DataFrame, groupCol: String, valueCol: String,
                loNum: Long, hiNum: Long, qDen: Long, precision: Int,
                storage: StorageLevel = StorageLevel.MEMORY_AND_DISK): DataFrame = {
    require(loNum <= hiNum, s"lo quantile must be <= hi: got $loNum/$qDen > $hiNum/$qDen")
    // d feeds three consumers (two threshold passes + the clamp join);
    // the histogram itself is bounded, so caching the INPUT is the win
    val d = Caching.maybePersist(df, storage)
    val hist = groupedHistogram(d, Seq(groupCol), valueCol, precision)
    val lo = thresholdFromHistogram(hist, groupCol, loNum, qDen)
      .withColumnRenamed("threshold", "group_lo")
      .withColumnRenamed(groupCol, "__wz_grp")
    val hi = thresholdFromHistogram(hist, groupCol, hiNum, qDen)
      .withColumnRenamed("threshold", "group_hi")
      .withColumnRenamed(groupCol, "__wz_grp")
    d.join(broadcast(lo), col(groupCol) <=> col("__wz_grp")).drop("__wz_grp")
      .join(broadcast(hi), col(groupCol) <=> col("__wz_grp")).drop("__wz_grp")
      .withColumn("clamped",
        // NULL stays NULL: least/greatest SKIP nulls, so without the guard
        // a missing measurement would silently clamp to group_hi — a NULL
        // value has no place in the band, it is reported as NULL
        when(col(valueCol).isNull, lit(null))
          .otherwise(greatest(col("group_lo"),
            least(col("group_hi"), round(col(valueCol), precision)))))
  }
}
