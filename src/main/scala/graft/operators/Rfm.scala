package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** RFM segmentation over the event log: score every user 1..n on
  * Recency (days since last activity), Frequency (event count), and
  * Monetary (summed conversion value), then compose the classic
  * three-digit RFM cell — the audience table a feature platform serves
  * next to its attribution and retention views.
  *
  * Buckets are VALUE-based exact quantile buckets, not `ntile`: ntile
  * balances bucket sizes by splitting ties arbitrarily (plan-order
  * nondeterminism an oracle can't replay), whereas here every user with
  * the same metric value lands in the same bucket —
  * `bucket(v) = ceil(cum(v) · n / N)` on the inclusive cumulative count,
  * computed in exact BIGINT arithmetic. Recency scores are inverted
  * (`n+1 − bucket`) so that n always means "best": most recent, most
  * frequent, highest spend.
  *
  * Scale shape: per-user metrics are one combinable user-keyed
  * aggregation (the only corpus-sized exchange); the recency anchor is a
  * 1-row broadcast (the q43 scalar shape). Bucket lookup is PER-METRIC:
  * the recency and frequency histograms are bounded by the day span and
  * the per-user activity ceiling — tiny at any corpus size — so they
  * always broadcast; the monetary histogram can be as wide as the user
  * count, so it defaults to a shuffle-hash join of short rows and only
  * broadcasts when `broadcastRanks = true` says the spend domain is
  * known-small (the [[Quantiles.percentileRank]] policy knob, same
  * rationale — a users-wide broadcast is a driver OOM at scale).
  */
object Rfm {

  private val DayUs = 86400000000L

  /** One row per user: raw metrics (`recency_days`, `frequency`,
    * `monetary_fp` — value in 1e6 fixed point) and scores (`r_score`,
    * `f_score`, `m_score`, each 1..nBuckets with nBuckets best, plus the
    * composed `rfm_cell` = r·100 + f·10 + m).
    */
  def rfmSegments(events: DataFrame, nBuckets: Int = 5,
                  monetaryType: String = "purchase",
                  userCol: String = "user_id", tsCol: String = "ts",
                  typeCol: String = "event_type", valueCol: String = "value",
                  broadcastRanks: Boolean = false): DataFrame =
    rfmFromState(
      rfmState(events, monetaryType, userCol, tsCol, typeCol, valueCol),
      nBuckets, broadcastRanks)

  /** Per-user metric state: `(user_id, last_ts_us, n_events,
    * monetary_fp)` — every field merges order-free (max, sum, sum), so
    * shards fold in ANY arrival order and increment == one-shot
    * bit-for-bit (no stream-position raise needed, unlike the EWMA
    * fold whose accumulator is order-sensitive).
    */
  def rfmState(events: DataFrame, monetaryType: String = "purchase",
               userCol: String = "user_id", tsCol: String = "ts",
               typeCol: String = "event_type",
               valueCol: String = "value"): DataFrame =
    events.select(
      col(userCol).as("user_id"),
      when(col(tsCol).isNull,
        raise_error(lit(s"rfm: NULL $tsCol has no recency")).cast("long"))
        .otherwise(unix_micros(col(tsCol))).as("__us"),
      // NULL value on a monetary event contributes 0 (not NULL — a NULL
      // monetary_fp would sum to NULL and silently drop the user from the
      // one-row-per-user output at the bucket join)
      when(col(typeCol) === monetaryType,
        coalesce(round(col(valueCol) * lit(1000000.0), 0).cast("long"), lit(0L)))
        .otherwise(lit(0L)).as("__v"))
      .groupBy(col("user_id"))
      .agg(max(col("__us")).as("last_ts_us"),
        count(lit(1)).as("n_events"),
        sum(col("__v")).as("monetary_fp"))

  /** Fold a shard's metrics into stored state: one full-outer merge on
    * the user key, each field combining with its own monoid.
    */
  def incrementRfm(state: DataFrame, shard: DataFrame,
                   monetaryType: String = "purchase",
                   userCol: String = "user_id", tsCol: String = "ts",
                   typeCol: String = "event_type",
                   valueCol: String = "value"): DataFrame = {
    val sh = rfmState(shard, monetaryType, userCol, tsCol, typeCol, valueCol)
      .withColumnsRenamed(Map("last_ts_us" -> "__s_last",
        "n_events" -> "__s_n", "monetary_fp" -> "__s_m"))
    state.join(sh, Seq("user_id"), "full_outer")
      .select(col("user_id"),
        greatest(col("last_ts_us"), col("__s_last")).as("last_ts_us"),
        (coalesce(col("n_events"), lit(0L)) +
          coalesce(col("__s_n"), lit(0L))).as("n_events"),
        (coalesce(col("monetary_fp"), lit(0L)) +
          coalesce(col("__s_m"), lit(0L))).as("monetary_fp"))
  }

  /** Score stored metric state without rescanning any event: the anchor
    * is the state's own latest activity, buckets as in [[rfmSegments]].
    *
    * The state is consumed five times (anchor, three metric histograms,
    * the score join spine) — `storage` persists the users-sized frame
    * across them so the upstream (a corpus aggregation when called via
    * [[rfmSegments]]) runs ONCE; each histogram then reads the cache,
    * never the corpus. StorageLevel.NONE opts out (cheap stored-state
    * scans).
    */
  def rfmFromState(state: DataFrame, nBuckets: Int = 5,
                   broadcastRanks: Boolean = false,
                   storage: org.apache.spark.storage.StorageLevel =
                     org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK): DataFrame = {
    require(nBuckets >= 2 && nBuckets <= 9,
      s"nBuckets must be in [2, 9] (rfm_cell is one digit per axis): got $nBuckets")

    val st = Caching.maybePersist(state, storage)
    // recency anchor: the latest activity in state — 1 row, broadcast
    val anchor = st.agg(max(col("last_ts_us")).as("__anchor"))
    val metrics = st
      .crossJoin(broadcast(anchor))
      .withColumn("recency_days",
        expr(s"(__anchor - last_ts_us) div ${DayUs}L"))
      .withColumnRenamed("n_events", "frequency")
      .drop("__anchor", "last_ts_us")

    val scored = Seq(
      // recency/frequency domains are bounded (day span, activity
      // ceiling) → always broadcast; monetary can be users-wide → policy
      ("recency_days", "__b_r", true), ("frequency", "__b_f", true),
      ("monetary_fp", "__b_m", broadcastRanks))
      .foldLeft(metrics) { case (df, (metric, out, bc)) =>
        // histograms read the CACHED metrics projection, never the
        // accumulating join pyramid (each fold step would otherwise
        // re-execute every prior join inside its histogram subtree)
        withBucket(df, metrics, metric, nBuckets, out, bc)
      }
    scored
      .withColumn("r_score", lit(nBuckets.toLong + 1L) - col("__b_r"))
      .withColumn("f_score", col("__b_f"))
      .withColumn("m_score", col("__b_m"))
      .withColumn("rfm_cell",
        col("r_score") * 100L + col("f_score") * 10L + col("m_score"))
      .select(col("user_id"), col("recency_days"), col("frequency"),
        col("monetary_fp"), col("r_score"), col("f_score"), col("m_score"),
        col("rfm_cell"))
  }

  /** Exact value-based quantile bucket: histogram over distinct metric
    * values of `histSource`, inclusive cumulative count,
    * `ceil(cum · n / N)` in BIGINT. The rank table is bounded by the
    * metric's distinct-value domain.
    */
  private def withBucket(df: DataFrame, histSource: DataFrame,
                         metric: String, nBuckets: Int,
                         out: String, broadcastRanks: Boolean): DataFrame = {
    val h = histSource.groupBy(col(metric).as("__rfm_v")).agg(count(lit(1)).as("__rfm_c"))
    val ord = Window.orderBy(col("__rfm_v"))
    val ranks = h
      .withColumn("__rfm_cum", sum(col("__rfm_c"))
        .over(ord.rowsBetween(Window.unboundedPreceding, 0)))
      .withColumn("__rfm_n", sum(col("__rfm_c"))
        .over(ord.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)))
      .select(col("__rfm_v"),
        expr(s"(__rfm_cum * $nBuckets + __rfm_n - 1) div __rfm_n").as(out))
    val lookup = if (broadcastRanks) broadcast(ranks) else ranks.hint("shuffle_hash")
    // null-safe equality: a NULL metric value (none exist today — ts
    // raises, value coalesces — but defense in depth) still finds its
    // histogram row instead of silently dropping the user
    df.join(lookup, col(metric) <=> col("__rfm_v")).drop("__rfm_v")
  }
}
