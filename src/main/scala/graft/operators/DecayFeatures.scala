package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Exponentially-decayed event features — the recency-weighted form of
  * the backfill counts (reference: mini-feature-store's per-user activity
  * features weight all history equally; production feature stores keep an
  * EWMA per user so yesterday's burst outweighs last month's):
  *
  *   s_0 = 0;  s_k = decay * s_{k-1} + v_k   over the user's events in
  *   (event time, event id) order.
  *
  * Engine-exact by the pinned-integer discipline: values enter as
  * `round(value * 1e6)` BIGINT fixed point, the decay step is
  * `(decay_ppm * s) div 1e6 + v` — `div` truncates toward zero, which is
  * bit-identical to DuckDB's `//` on signed values (both engines' native
  * integral division), so the fold matches across engines for negative
  * accumulators too. The fold itself is
  * ORDERED — a float or integer EWMA is inherently order-dependent — so
  * it runs as the ordered-collect + `aggregate` left fold the Lloyd
  * trainer established: one shuffle keyed by user, a user's history
  * serializes into one task (bounded by per-user history, not corpus
  * size — the Sessionize skew note applies).
  *
  * A NULL event time has no stream position — loud per-row raise, the
  * Sessionize rule. Output: (userCol, n_events, ewma_fp BIGINT 1e-6).
  */
object DecayFeatures {

  def ewma(events: DataFrame, decayPpm: Long = 850000L,
           userCol: String = "user_id", tsCol: String = "ts",
           idCol: String = "event_id", valueCol: String = "value"): DataFrame =
    ewmaState(events, decayPpm, userCol, tsCol, idCol, valueCol)
      .select(col(userCol), col("n_events"), col("ewma_fp"))

  /** The exact integer decay step as a SQL lambda body: `div` truncates
    * toward zero, bit-matching DuckDB's `//` on a (possibly negative)
    * accumulator.
    */
  private def stepSql(decayPpm: Long): String =
    s"(acc, x) -> ($decayPpm * acc) div 1000000 + x.v"

  private def prepped(events: DataFrame, userCol: String, tsCol: String,
                      idCol: String, valueCol: String): DataFrame = {
    val tsUs = when(col(tsCol).isNull,
      raise_error(lit(s"ewma: NULL $tsCol has no stream position")))
      .otherwise(unix_micros(col(tsCol)))
    events.select(col(userCol),
      struct(tsUs.as("t"), col(idCol).as("i"),
        round(col(valueCol) * lit(1000000.0), 0).cast("long").as("v")).as("s"))
  }

  /** [[ewma]] plus the stream position that makes the state INCREMENTAL:
    * (userCol, n_events, ewma_fp, last_ts_us, last_event_id). Persist it
    * and fold new shards in with [[incrementEwma]] — the EWMA recurrence
    * composes exactly (continuing the fold from the stored accumulator IS
    * the one-shot fold), so shard ingest never re-reads stored events and
    * increment == one-shot retrain bit-for-bit (the q153/q143 contract;
    * DecayFeaturesSpec and the q163 oracle pin it).
    */
  def ewmaState(events: DataFrame, decayPpm: Long = 850000L,
                userCol: String = "user_id", tsCol: String = "ts",
                idCol: String = "event_id", valueCol: String = "value"): DataFrame = {
    require(decayPpm >= 0 && decayPpm <= 1000000L, "decayPpm must be in [0, 1e6]")
    prepped(events, userCol, tsCol, idCol, valueCol)
      .groupBy(col(userCol))
      .agg(sort_array(collect_list(col("s"))).as("__xs"),
        count(lit(1)).as("n_events"),
        max(struct(col("s.t"), col("s.i"))).as("__last"))
      .select(col(userCol), col("n_events"),
        expr(s"aggregate(__xs, 0L, ${stepSql(decayPpm)})").as("ewma_fp"),
        col("__last.t").as("last_ts_us"), col("__last.i").as("last_event_id"))
  }

  /** The EWMA AS-OF every event — the point-in-time-correct per-event
    * feature (what a training-set join must read at label time, where
    * [[ewma]]'s single end-of-stream value would LEAK the future): for
    * each event, the accumulator value INCLUDING that event,
    * bit-identical to running the [[ewma]] recurrence on the prefix
    * ending there. Output: (userCol, event_id, ts_us, ewma_fp) — one row
    * per event, joinable against labels by (user, time) exactly like the
    * backfill features feed the PIT join.
    *
    * Same ordered-collect shuffle as [[ewma]]; the per-user prefix array
    * comes from the native [[graft.functions.EwmaScan]] kernel — ONE
    * O(history) codegen'd pass over the sorted value array (the composed
    * `aggregate` fold appended to its accumulator array via `concat`,
    * O(history^2) copies inside one un-splittable collect_list row, with
    * the step inlined twice per element — the r14 watch item). The HOF
    * form survives as [[ewmaAtEventHof]], the bit-parity witness
    * DecayFeaturesSpec pins (the RepStats/GreedyEncode discipline).
    */
  def ewmaAtEvent(events: DataFrame, decayPpm: Long = 850000L,
                  userCol: String = "user_id", tsCol: String = "ts",
                  idCol: String = "event_id", valueCol: String = "value"): DataFrame = {
    require(decayPpm >= 0 && decayPpm <= 1000000L, "decayPpm must be in [0, 1e6]")
    prepped(events, userCol, tsCol, idCol, valueCol)
      .groupBy(col(userCol))
      .agg(sort_array(collect_list(col("s"))).as("__xs"))
      .withColumn("__ws", graft.functions.EwmaScan.ewmaScan(
        expr("transform(__xs, x -> x.v)"), decayPpm))
      .select(col(userCol),
        explode(expr(
          "zip_with(__xs, __ws, (x, w) -> struct(x.i AS event_id, x.t AS ts_us, w AS ewma_fp))")).as("r"))
      .select(col(userCol), col("r.event_id").as("event_id"),
        col("r.ts_us").as("ts_us"), col("r.ewma_fp").as("ewma_fp"))
  }

  /** The composed higher-order-function form of [[ewmaAtEvent]] — the
    * accumulator struct carries the growing prefix array (O(history^2)
    * `concat` copies per user). Kept as the kernel's bit-parity WITNESS,
    * never the production path.
    */
  private[graft] def ewmaAtEventHof(events: DataFrame, decayPpm: Long = 850000L,
                                    userCol: String = "user_id", tsCol: String = "ts",
                                    idCol: String = "event_id", valueCol: String = "value"): DataFrame = {
    require(decayPpm >= 0 && decayPpm <= 1000000L, "decayPpm must be in [0, 1e6]")
    val step = s"($decayPpm * acc.s) div 1000000 + x.v"
    prepped(events, userCol, tsCol, idCol, valueCol)
      .groupBy(col(userCol))
      .agg(sort_array(collect_list(col("s"))).as("__xs"))
      .select(col(userCol),
        explode(expr(
          s"""zip_with(__xs,
             |  aggregate(__xs,
             |    struct(CAST(0 AS BIGINT) AS s, CAST(array() AS array<bigint>) AS a),
             |    (acc, x) -> struct(CAST($step AS BIGINT) AS s,
             |                       concat(acc.a, array(CAST($step AS BIGINT))) AS a),
             |    acc -> acc.a),
             |  (x, w) -> struct(x.i AS event_id, x.t AS ts_us, w AS ewma_fp))""".stripMargin)).as("r"))
      .select(col(userCol), col("r.event_id").as("event_id"),
        col("r.ts_us").as("ts_us"), col("r.ewma_fp").as("ewma_fp"))
  }

  /** Fold a new shard of events into stored [[ewmaState]]: each user's
    * shard events fold IN ORDER from the stored accumulator — O(shard)
    * work, stored events never re-read. Caller contract (the
    * incremental-family discipline): every shard event must come AFTER
    * the user's stored position; a violation raises per-row (a silently
    * mis-ordered fold would compute a different, wrong EWMA), and
    * `decayPpm` is frozen with the state like every incremental consumer.
    * Users absent from the shard pass through; new users start at 0.
    */
  def incrementEwma(state: DataFrame, shard: DataFrame, decayPpm: Long = 850000L,
                    userCol: String = "user_id", tsCol: String = "ts",
                    idCol: String = "event_id", valueCol: String = "value"): DataFrame = {
    require(decayPpm >= 0 && decayPpm <= 1000000L, "decayPpm must be in [0, 1e6]")
    val sh = prepped(shard, userCol, tsCol, idCol, valueCol)
      .groupBy(col(userCol))
      .agg(sort_array(collect_list(col("s"))).as("__xs"),
        count(lit(1)).as("__sn"),
        min(struct(col("s.t"), col("s.i"))).as("__first"),
        max(struct(col("s.t"), col("s.i"))).as("__slast"))
    val st = state.select(col(userCol), col("n_events").as("__n0"),
      col("ewma_fp").as("__s0"), col("last_ts_us").as("__lt"),
      col("last_event_id").as("__li"))
    val outOfOrder = col("__lt").isNotNull && col("__xs").isNotNull &&
      (col("__first.t") < col("__lt") ||
        (col("__first.t") === col("__lt") && col("__first.i") <= col("__li")))
    st.join(sh, Seq(userCol), "full_outer")
      .select(col(userCol),
        when(outOfOrder, raise_error(concat(
            lit("incrementEwma: shard event at or before the stored stream "),
            lit("position for user "), col(userCol).cast("string"),
            lit(" — shards must arrive in time order"))))
          .otherwise(coalesce(col("__n0"), lit(0L)) + coalesce(col("__sn"), lit(0L)))
          .as("n_events"),
        when(col("__xs").isNotNull,
          expr(s"aggregate(__xs, coalesce(__s0, 0L), ${stepSql(decayPpm)})"))
          .otherwise(col("__s0")).as("ewma_fp"),
        coalesce(col("__slast.t"), col("__lt")).as("last_ts_us"),
        coalesce(col("__slast.i"), col("__li")).as("last_event_id"))
  }
}
