package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Traffic anomaly detection over the event log: flag days whose event
  * count sits more than k standard deviations from the trailing-window
  * mean — the ops-facing "did ingestion spike or silently drop"
  * monitor that runs next to the [[Profile]] drift audits (those watch
  * value DISTRIBUTIONS; this watches VOLUME over time).
  *
  * The z-test is exact integer arithmetic end to end — no sqrt, no
  * floating point: with W prior-day counts (sum `s`, sum of squares
  * `q`), deviation `d = n·W − s` and W²-scaled variance `v = W·q − s²`,
  *
  *   z² > k²  ⟺  d² · kDen² > kNum² · v
  *
  * (k as the integer rational kNum/kDen, the [[Quantiles.madOutlierGate]]
  * convention). Cross-multiplying removes the division AND the sqrt, so
  * engine and oracle agree bit-for-bit; a zero-variance window flags any
  * nonzero deviation (the strict `>` handles it with no special case). A
  * day is only scored when all `windowDays` prior calendar days are
  * present (`w_days = windowDays`); gappy history yields a NULL verdict
  * rather than a z-score against a window that silently isn't there.
  *
  * Scale shape: the corpus collapses to day grain in one combinable
  * count — the only corpus-sized exchange; every window after that runs
  * over the bounded day-domain frame (365 rows/year), the q43/q177
  * sanctioned shape. Squares are summed in DECIMAL(38,0) (counts of
  * 1e11 events/day square to 1e22 — past BIGINT), and the require bounds
  * keep every product inside 38 digits at any plausible daily volume.
  */
object Anomaly {

  private val DayUs = 86400000000L

  private def dec(c: Column): Column = c.cast("decimal(38,0)")

  /** One row per observed day: `n` events, trailing-window coverage
    * (`w_days`, `w_sum`), the W-scaled deviation `dev_x_w = n·W − w_sum`,
    * and `is_anomaly` (1/0, NULL when the trailing window is incomplete).
    */
  def trafficAnomaly(events: DataFrame, windowDays: Int = 7,
                     kNum: Long = 3L, kDen: Long = 1L,
                     tsCol: String = "ts"): DataFrame =
    trafficAnomalyFromCounts(dailyCounts(events, tsCol),
      windowDays, kNum, kDen)

  /** Day-grain volume state: `(day, n)` — counts sum-merge in ANY
    * arrival order (a late event simply re-opens its day), so shard
    * ingestion never rescans stored history and increment == one-shot
    * bit-for-bit. Verdicts recomputed off merged state can legitimately
    * CHANGE when late data lands — that is the honest semantics of a
    * volume monitor, not a replay bug.
    *
    * Day bucketing is FLOOR division (`a − pmod(a, W)) div W` in exact
    * BIGINT — Spark's `div` truncates toward zero, which would put
    * pre-1970 timestamps on the wrong day and make day 0 two days wide;
    * floor matches the oracle's `//` for every epoch sign.
    */
  def dailyCounts(events: DataFrame, tsCol: String = "ts"): DataFrame =
    events
      .select(when(col(tsCol).isNull,
        raise_error(lit(s"trafficAnomaly: NULL $tsCol has no day")).cast("long"))
        .otherwise(expr(s"(unix_micros(`$tsCol`) - pmod(unix_micros(`$tsCol`), ${DayUs}L))" +
          s" div ${DayUs}L")).as("day"))
      .groupBy(col("day"))
      .agg(count(lit(1)).as("n"))

  /** Fold a shard into stored day counts: one groupBy-sum over the
    * (tiny) union of two day-domain frames.
    */
  def incrementDailyCounts(state: DataFrame, shard: DataFrame,
                           tsCol: String = "ts"): DataFrame =
    mergeDailyCounts(state, dailyCounts(shard, tsCol))

  /** Sum-merge two day-count frames (shard partials, stored state). */
  def mergeDailyCounts(a: DataFrame, b: DataFrame): DataFrame =
    a.select(col("day"), col("n")).unionByName(b.select(col("day"), col("n")))
      .groupBy(col("day"))
      .agg(sum(col("n")).as("n"))

  /** Score a `(day, n)` frame — [[trafficAnomaly]] without the event
    * scan, the form stored state and the streaming gate read.
    */
  def trafficAnomalyFromCounts(daily: DataFrame, windowDays: Int = 7,
                               kNum: Long = 3L, kDen: Long = 1L): DataFrame = {
    require(windowDays > 0 && windowDays <= 365,
      s"windowDays must be in [1, 365]: got $windowDays")
    require(kNum > 0 && kNum <= 1000 && kDen > 0 && kDen <= 1000,
      s"k must be a rational in (0, 1000]/(0, 1000]: got $kNum/$kDen")
    val w = windowDays.toLong

    // bounded frame: one row per observed day — never the corpus
    val win = Window.orderBy(col("day")).rangeBetween(-w, -1L)
    val scored = daily
      .withColumn("w_days", count(col("n")).over(win))
      .withColumn("w_sum", coalesce(sum(col("n")).over(win), lit(0L)))
      .withColumn("__w_sumsq",
        coalesce(sum(dec(col("n")) * dec(col("n"))).over(win), dec(lit(0L))))
      .withColumn("dev_x_w", col("n") * lit(w) - col("w_sum"))

    val d2 = dec(col("dev_x_w")) * dec(col("dev_x_w"))
    val varW2 = dec(lit(w)) * col("__w_sumsq") - dec(col("w_sum")) * dec(col("w_sum"))
    scored
      .withColumn("is_anomaly",
        when(col("w_days") === w,
          (d2 * dec(lit(kDen * kDen)) > dec(lit(kNum * kNum)) * varW2)
            .cast("int")))
      .drop("__w_sumsq")
  }
}
