package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Gap-based sessionization: group each user's event stream into sessions
  * separated by inactivity gaps, then aggregate per session.
  *
  * The batch twin of [[graft.streaming.EventStream]]'s
  * `session_window` aggregation (reference: mini-feature-store computes
  * per-user activity features; sessions are the standard unit an analytics
  * engine derives from a raw event log — funnel/duration/attribution work
  * all starts here).
  *
  * Semantics: events of one user, ordered by (event time, event id), start
  * a new session whenever the gap to the previous event exceeds
  * `gapSeconds`. `session_seq` numbers a user's sessions from 1 in time
  * order; the (user_id, session_seq) pair is the session key. The event-id
  * tiebreak makes the order — and therefore the assignment — fully
  * deterministic even for same-timestamp events.
  *
  * Boundary contract: the break is strictly `> gapSeconds` — an event
  * arriving EXACTLY `gapSeconds` after its predecessor stays in the same
  * session. This matches Spark's `session_window` (verified empirically
  * on 4.1.2, batch and streaming: two events exactly one gap apart merge
  * into a single [t, t+2·gap) session), so composing this batch operator
  * with [[graft.streaming.EventStream.sessionStats]] yields identical
  * session counts on boundary data; SessionizeSpec pins the boundary on
  * both sides.
  *
  * Scale shape: ONE shuffle, partitioned by `user_id` — the same key
  * layout every feature pipeline here shuffles on, so a pre-bucketed
  * events table (Writers `--buckets`) serves this without an exchange.
  * Both windows ride that single partitioning (lag and the running
  * session count use the same (user, time) sort), and the per-session
  * aggregate is map-side combinable on the already-co-located key. A
  * user's rows serialize into one task — bounded by per-user history, not
  * corpus size (the as-of-join skew note in SCALING.md applies verbatim).
  *
  * Times flow as microsecond longs (`unix_micros`), not timestamps: exact
  * integer gap math, no sub-second precision loss crossing engines.
  */
object Sessionize {

  /** Per-event session assignment: adds `ts_us` (event time in micros),
    * `session_seq` (1-based per-user session number).
    */
  def assign(events: DataFrame, gapSeconds: Long,
             userCol: String = "user_id", tsCol: String = "ts",
             idCol: String = "event_id"): DataFrame = {
    require(gapSeconds > 0, "gapSeconds must be positive")
    val gapMicros = gapSeconds * 1000000L
    val order = Window.partitionBy(col(userCol))
      .orderBy(col("ts_us"), col(idCol))
    // a NULL event time has no position in the stream — same loud-failure
    // rule as Packing's NULL id (a silent NULLS FIRST placement would
    // split/merge real sessions depending on engine sort defaults)
    events.withColumn("ts_us",
        when(col(tsCol).isNull,
          raise_error(lit(s"sessionize: NULL $tsCol has no stream position")))
          .otherwise(unix_micros(col(tsCol))))
      .withColumn("new_session",
        when(col("ts_us") - lag(col("ts_us"), 1).over(order) > gapMicros, 1L)
          .otherwise(when(lag(col("ts_us"), 1).over(order).isNull, 1L).otherwise(0L)))
      .withColumn("session_seq",
        sum(col("new_session")).over(
          order.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .drop("new_session")
  }

  /** Within-session transition counts: how often does event type A
    * immediately precede event type B inside one session? The Markov
    * transition matrix of product analytics (drop-off analysis, next-action
    * models) — and a session-level training feature source. Rides the SAME
    * single user_id shuffle as [[assign]] (the lag window clusters by a
    * superset of the user key); the final count is a tiny combinable
    * aggregate over (from, to) pairs — at most |types|^2 rows.
    */
  def transitions(events: DataFrame, gapSeconds: Long,
                  userCol: String = "user_id", tsCol: String = "ts",
                  idCol: String = "event_id",
                  typeCol: String = "event_type"): DataFrame = {
    val sessionOrder = Window
      .partitionBy(col(userCol), col("session_seq"))
      .orderBy(col("ts_us"), col(idCol))
    assign(events, gapSeconds, userCol, tsCol, idCol)
      .withColumn("from_type", lag(col(typeCol), 1).over(sessionOrder))
      .filter(col("from_type").isNotNull)
      .groupBy(col("from_type"), col(typeCol).as("to_type"))
      .agg(count(lit(1)).as("n_transitions"))
  }

  /** Ordered funnel over sessions: how far through `steps` does each
    * session get, requiring each step to happen strictly AFTER the
    * previous one? Returns one row per funnel depth with the session
    * count that reached at least that depth (depth 0 = all sessions).
    *
    * The scalable shape: sessions collapse FIRST to one row with a
    * bounded min-timestamp-per-step struct (a conditional aggregate per
    * step — map-side combinable on the session key the assignment
    * already shuffled on); the step-ordering walk is then row-local over
    * |steps| columns, and the final depth histogram is a |steps|+1-row
    * aggregate. The corpus-sized data is never windowed per step and no
    * self-join per step exists — the two ways naive funnel queries blow
    * up.
    *
    * Strict-after semantics: step k counts only if some event of step k
    * happens at a strictly later micros timestamp than the chosen
    * occurrence of step k-1 (the earliest valid one). Simultaneous-tick
    * events do NOT chain — deterministic under the micros clock.
    */
  /** Per-session conversion DELAYS for a two-step chain: sessions where
    * `toStep`'s earliest occurrence falls strictly after `fromStep`'s
    * earliest get one row with the delay in micros — the raw material for
    * "median time from signup to purchase" (feed `delta_us` to
    * [[Quantiles.quantileThreshold]]; q92 does exactly that). Same strict
    * chain rule as [[funnel]]'s walk, same single user_id shuffle, one
    * bounded row per converted session.
    */
  def timeToConvert(events: DataFrame, gapSeconds: Long,
                    fromStep: String, toStep: String,
                    userCol: String = "user_id", tsCol: String = "ts",
                    idCol: String = "event_id",
                    typeCol: String = "event_type"): DataFrame = {
    require(fromStep != toStep, "fromStep and toStep must differ")
    assign(events, gapSeconds, userCol, tsCol, idCol)
      .groupBy(col(userCol), col("session_seq"))
      .agg(
        min(when(col(typeCol) === fromStep, col("ts_us"))).as("from_us"),
        min(when(col(typeCol) === toStep, col("ts_us"))).as("to_us"))
      .filter(col("to_us") > col("from_us")) // null-safe: NULL > x is NULL -> dropped
      .select(col(userCol), col("session_seq"), col("from_us"), col("to_us"),
        (col("to_us") - col("from_us")).as("delta_us"))
  }

  def funnel(events: DataFrame, gapSeconds: Long, steps: Seq[String],
             userCol: String = "user_id", tsCol: String = "ts",
             idCol: String = "event_id",
             typeCol: String = "event_type"): DataFrame = {
    require(steps.nonEmpty && steps.distinct == steps,
      "steps must be a non-empty list of distinct event types")
    val perSession = assign(events, gapSeconds, userCol, tsCol, idCol)
      .groupBy(col(userCol), col("session_seq"))
      .agg(
        min(when(col(typeCol) === steps.head, col("ts_us"))).as("ts_0"),
        steps.tail.zipWithIndex.map { case (s, i) =>
          min(when(col(typeCol) === s, col("ts_us"))).as(s"raw_${i + 1}")
        }: _*)
    // row-local walk: step k's chosen occurrence is its per-session MIN
    // timestamp, valid only when strictly after step k-1's chosen one.
    // (Deliberately min-of-step, not earliest-after-previous: a stray
    // step-k event BEFORE step k-1 breaks the chain. Stricter than some
    // funnel definitions, deterministic, and exactly what the oracle
    // replays.)
    val walked = steps.tail.zipWithIndex.foldLeft(perSession) { case (d, (_, i)) =>
      d.withColumn(s"ts_${i + 1}",
        when(col(s"raw_${i + 1}") > col(s"ts_$i"), col(s"raw_${i + 1}")))
    }
    // depth = deepest k with a surviving chain; the walk nulls everything
    // past a break, so "last non-null ts_k" is well-defined
    val depth = steps.indices.foldLeft(lit(0)) { (acc, k) =>
      when(col(s"ts_$k").isNotNull, lit(k + 1)).otherwise(acc)
    }
    // each session emits one row per level it reached (bounded by
    // |steps|+1); counting those rows IS the "reached at least depth d"
    // cumulative — no window, no non-equi join, fully lazy
    val levelCounts = walked.withColumn("depth", depth)
      .select(explode(sequence(lit(0), col("depth"))).as("depth_level"))
      .groupBy(col("depth_level")).agg(count(lit(1)).as("n_sessions"))
    val spark = events.sparkSession
    import spark.implicits._
    val spine = (0 to steps.length).map(d =>
      (d, if (d == 0) "(all sessions)" else steps(d - 1))).toDF("depth_level", "step")
    spine.join(levelCounts, Seq("depth_level"), "left")
      .withColumn("n_sessions", coalesce(col("n_sessions"), lit(0L)))
  }

  /** Per-session rollup: event count, span, and distinct event types.
    * Integer-exact outputs only (micros, counts) — bit-stable across
    * engines by construction.
    */
  def sessions(events: DataFrame, gapSeconds: Long,
               userCol: String = "user_id", tsCol: String = "ts",
               idCol: String = "event_id",
               typeCol: String = "event_type"): DataFrame =
    assign(events, gapSeconds, userCol, tsCol, idCol)
      .groupBy(col(userCol), col("session_seq"))
      .agg(
        count(lit(1)).as("n_events"),
        min(col("ts_us")).as("start_us"),
        max(col("ts_us")).as("end_us"),
        (max(col("ts_us")) - min(col("ts_us"))).as("duration_us"),
        countDistinct(col(typeCol)).as("n_event_types"))
}
