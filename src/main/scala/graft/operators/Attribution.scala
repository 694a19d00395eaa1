package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Multi-touch conversion attribution — the credit-assignment report an
  * events pipeline derives once sessions and funnels exist (reference:
  * mini-feature-store's event log carries purchase values; attribution
  * answers WHICH prior touches earned them): each conversion's value
  * splits LINEARLY (equal credit) across the user's touch events inside
  * the lookback window.
  *
  * Engine-exact credit conservation: value enters as `round(value*1e6)`
  * BIGINT fixed point; each touch gets `v div n` and the MOST RECENT
  * touch additionally receives the remainder `v - n * (v div n)`, so the
  * per-conversion credits sum to the conversion value EXACTLY (no
  * floor-slack leak) and the split is deterministic (recency tie-break
  * by event id). Conversions with no in-window touch produce no rows —
  * unattributable value is a separate query (`conversions anti-join
  * this`), not a NULL-touch row every aggregate downstream would trip
  * over.
  *
  * Scale shape: ONE user-keyed join (conversions x touches, both sides
  * hash-partitioned on the user — the q13 band-join discipline: the
  * window predicate prunes pairs inside the join, fan-out bounded by
  * per-user activity, never corpus-quadratic) + one combinable
  * per-conversion count/max aggregate joined back on the (user,
  * conversion) key. NULL event times raise per-row (the Sessionize
  * rule).
  *
  * Output: (userCol, conv_event_id, conv_ts_us, touch_event_id,
  * touch_ts_us, n_touches, credit_fp).
  */
object Attribution {

  def linearAttribution(events: DataFrame, windowDays: Int = 7,
                        convType: String = "purchase",
                        touchType: String = "click",
                        userCol: String = "user_id", tsCol: String = "ts",
                        idCol: String = "event_id",
                        typeCol: String = "event_type",
                        valueCol: String = "value"): DataFrame = {
    require(windowDays >= 1, "windowDays must be positive")
    val tsUs = when(col(tsCol).isNull,
      raise_error(lit(s"attribution: NULL $tsCol has no stream position")))
      .otherwise(unix_micros(col(tsCol)))
    val windowUs = windowDays.toLong * 86400000000L
    val conv = events.filter(col(typeCol) === convType)
      .select(col(userCol), col(idCol).as("conv_event_id"),
        tsUs.as("conv_ts_us"),
        round(col(valueCol) * lit(1000000.0), 0).cast("long").as("__v"))
    val touch = events.filter(col(typeCol) === touchType)
      .select(col(userCol), col(idCol).as("touch_event_id"),
        tsUs.as("touch_ts_us"))
    val pairs = conv.join(touch, Seq(userCol))
      .filter(col("touch_ts_us") <= col("conv_ts_us") &&
        col("touch_ts_us") > col("conv_ts_us") - lit(windowUs))
    // per-conversion touch count + the most recent touch (remainder owner)
    val perConv = pairs.groupBy(col(userCol), col("conv_event_id"))
      .agg(count(lit(1)).as("n_touches"),
        max(struct(col("touch_ts_us"), col("touch_event_id"))).as("__last"))
    pairs.join(perConv, Seq(userCol, "conv_event_id"))
      .select(col(userCol), col("conv_event_id"), col("conv_ts_us"),
        col("touch_event_id"), col("touch_ts_us"), col("n_touches"),
        (expr("__v div n_touches") +
          when(col("touch_event_id") === col("__last.touch_event_id"),
            col("__v") - col("n_touches") * expr("__v div n_touches"))
            .otherwise(lit(0L))).as("credit_fp"))
  }
}
