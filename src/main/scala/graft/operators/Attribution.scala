package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Multi-touch conversion attribution — the credit-assignment report an
  * events pipeline derives once sessions and funnels exist (reference:
  * mini-feature-store's event log carries purchase values; attribution
  * answers WHICH prior touches earned them): each conversion's value
  * splits across the user's touch events inside the lookback window,
  * under one of three credit schemes real marketing/event pipelines
  * parameterize first:
  *
  *  - [[linearAttribution]]  — equal credit per touch;
  *  - [[positionAttribution]] — the U-shape 40/20/40 split (first touch
  *    40%, last touch 40%, the middle touches share 20% equally; with
  *    one touch everything, with two a 50/50 split);
  *  - [[timeDecayAttribution]] — exponential decay by elapsed half-lives
  *    (a touch `h` whole half-lives before the conversion weighs
  *    `2^(maxH - h)`, so the newest bucket always weighs the most).
  *
  * Engine-exact credit conservation, all three schemes: value enters as
  * `round(value*1e6)` BIGINT fixed point, every per-touch share is
  * integer floor arithmetic, and the ANCHOR touch — the most recent, by
  * (ts, event id) — absorbs the remainder, so per-conversion credits sum
  * to the conversion value EXACTLY (no floor-slack leak) and the split
  * is deterministic. Conversions with no in-window touch produce no
  * rows — unattributable value is a separate query (`conversions
  * anti-join this`), not a NULL-touch row every aggregate downstream
  * would trip over.
  *
  * Scale shape: ONE (user, time-bucket)-keyed join (conversions x
  * touches). The join key carries a time BUCKET of width = the lookback
  * window (each conversion probes its own bucket and the previous one —
  * every in-window touch provably lives in those two), so candidate
  * pairs are bounded by per-user IN-WINDOW activity: a user-only key
  * would materialize all-history conv x touch pairs per user and grow
  * QUADRATICALLY in history length before the band predicate could
  * prune them. The exact window predicate then filters inside the join,
  * and combinable per-conversion aggregates join back on the (user,
  * conversion) key. NULL event times raise per-row (the Sessionize
  * rule).
  *
  * Output: (userCol, conv_event_id, conv_ts_us, touch_event_id,
  * touch_ts_us, n_touches, credit_fp).
  *
  * INCREMENTAL form ([[attributionState]] / [[incrementAttribution]] /
  * [[incrementAttributionState]]): stored per-user touch state
  * band-joins each conversion shard (stored x stored never recomputes —
  * the substringPairsIncremental contract), credits for an
  * already-attributed conversion are immutable (a conversion is
  * attributed exactly once, by the shard that carries it), and the
  * state stays bounded: touches older than the stream position minus
  * the lookback can never enter any FUTURE conversion's window (shards
  * only move forward — the incrementEwma per-row guard), so they prune
  * at every fold.
  */
object Attribution {

  /** Credit schemes. `TimeDecay.halfLifeUs` buckets a touch's age into
    * whole half-lives; weights are exact powers of two, products run
    * through DECIMAL(38,0) (HUGEINT on the oracle side) so the math is
    * engine-portable at any value scale.
    */
  sealed trait Scheme
  case object Linear extends Scheme
  case object Position extends Scheme
  final case class TimeDecay(halfLifeUs: Long) extends Scheme

  def linearAttribution(events: DataFrame, windowDays: Int = 7,
                        convType: String = "purchase",
                        touchType: String = "click",
                        userCol: String = "user_id", tsCol: String = "ts",
                        idCol: String = "event_id",
                        typeCol: String = "event_type",
                        valueCol: String = "value"): DataFrame =
    oneShot(events, Linear, windowDays, convType, touchType,
      userCol, tsCol, idCol, typeCol, valueCol)

  /** U-shape (position-based) 40/20/40 attribution — first and last
    * touch 40% each, middles share 20% equally; 1 touch takes all,
    * 2 touches split 50/50. The last touch absorbs every floor
    * remainder (exact conservation).
    */
  def positionAttribution(events: DataFrame, windowDays: Int = 7,
                          convType: String = "purchase",
                          touchType: String = "click",
                          userCol: String = "user_id", tsCol: String = "ts",
                          idCol: String = "event_id",
                          typeCol: String = "event_type",
                          valueCol: String = "value"): DataFrame =
    oneShot(events, Position, windowDays, convType, touchType,
      userCol, tsCol, idCol, typeCol, valueCol)

  /** Exponential time-decay attribution: a touch `h = age div halfLife`
    * whole half-lives old weighs `2^(maxH - h)` where `maxH` is the
    * oldest in-window bucket — integer powers of two, so the decay is
    * exact and engine-portable. The most recent touch absorbs the floor
    * remainder. Requires the window to span at most 62 half-lives (the
    * BIGINT weight domain — fail loudly, never wrap).
    */
  def timeDecayAttribution(events: DataFrame, windowDays: Int = 7,
                           halfLifeDays: Int = 1,
                           convType: String = "purchase",
                           touchType: String = "click",
                           userCol: String = "user_id", tsCol: String = "ts",
                           idCol: String = "event_id",
                           typeCol: String = "event_type",
                           valueCol: String = "value"): DataFrame = {
    require(halfLifeDays >= 1, "halfLifeDays must be positive")
    oneShot(events, TimeDecay(halfLifeDays.toLong * 86400000000L),
      windowDays, convType, touchType, userCol, tsCol, idCol, typeCol, valueCol)
  }

  // ---- shared skeleton ---------------------------------------------------

  private def tsOrRaise(tsCol: String): Column =
    when(col(tsCol).isNull,
      raise_error(lit(s"attribution: NULL $tsCol has no stream position")))
      .otherwise(unix_micros(col(tsCol)))

  private def convsOf(events: DataFrame, convType: String, userCol: String,
                      tsCol: String, idCol: String, typeCol: String,
                      valueCol: String): DataFrame =
    events.filter(col(typeCol) === convType)
      .select(col(userCol), col(idCol).as("conv_event_id"),
        tsOrRaise(tsCol).as("conv_ts_us"),
        round(col(valueCol) * lit(1000000.0), 0).cast("long").as("__v"))

  private def touchesOf(events: DataFrame, touchType: String, userCol: String,
                        tsCol: String, idCol: String, typeCol: String): DataFrame =
    events.filter(col(typeCol) === touchType)
      .select(col(userCol), col(idCol).as("touch_event_id"),
        tsOrRaise(tsCol).as("touch_ts_us"))

  /** The candidate-pair join every attribution form shares: conversions x
    * touches on (user, time bucket) with the exact window predicate
    * applied inside. Buckets are FLOOR(ts / windowUs) (exact BIGINT,
    * sign-safe); a touch in `(conv_ts − window, conv_ts]` always lands in
    * the conversion's bucket or the one before it, so each conversion
    * probes exactly two buckets (an explode-by-2 on the smaller side) and
    * each qualifying pair matches EXACTLY once (a touch has one bucket).
    * Per-user all-history fan-out never materializes — the candidate set
    * is linear in history where a user-only join key is quadratic.
    */
  private def bandPairs(conv: DataFrame, touch: DataFrame, windowUs: Long,
                        userCol: String): DataFrame = {
    def bucketOf(c: String) =
      expr(s"($c - pmod($c, ${windowUs}L)) div ${windowUs}L")
    val probed = conv.withColumn("__band",
      explode(array(bucketOf("conv_ts_us") - lit(1L), bucketOf("conv_ts_us"))))
    val banded = touch.withColumn("__band", bucketOf("touch_ts_us"))
    probed.join(banded, Seq(userCol, "__band"))
      .filter(col("touch_ts_us") <= col("conv_ts_us") &&
        col("touch_ts_us") > col("conv_ts_us") - lit(windowUs))
      .drop("__band")
  }

  private def oneShot(events: DataFrame, scheme: Scheme, windowDays: Int,
                      convType: String, touchType: String,
                      userCol: String, tsCol: String, idCol: String,
                      typeCol: String, valueCol: String): DataFrame = {
    require(windowDays >= 1, "windowDays must be positive")
    creditsFor(
      convsOf(events, convType, userCol, tsCol, idCol, typeCol, valueCol),
      touchesOf(events, touchType, userCol, tsCol, idCol, typeCol),
      scheme, windowDays.toLong * 86400000000L, userCol)
  }

  /** The band join + per-conversion aggregate + per-scheme credit split
    * all public forms share. `conv` carries (userCol, conv_event_id,
    * conv_ts_us, __v); `touch` carries (userCol, touch_event_id,
    * touch_ts_us). The candidate-pair frame is read by BOTH the
    * per-conversion aggregate and the credit join (TimeDecay adds two
    * more), so it persists — without this the whole conv/touch band join
    * re-derives per reference, the fixed overhead behind the r17 sweep
    * row's flapping ratio. `storage = NONE` opts out (the streaming
    * gate: one NEW plan per trigger would leak a cache entry each).
    */
  private def creditsFor(conv: DataFrame, touch: DataFrame, scheme: Scheme,
                         windowUs: Long, userCol: String,
                         storage: org.apache.spark.storage.StorageLevel =
                           org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK): DataFrame = {
    scheme match {
      case TimeDecay(halfLifeUs) =>
        require(halfLifeUs >= 1, "halfLifeUs must be positive")
        require((windowUs - 1) / halfLifeUs <= 62,
          s"timeDecayAttribution: the window spans ${(windowUs - 1) / halfLifeUs} " +
            "half-lives — integer 2^h weights only cover 62 (shrink the window " +
            "or grow the half-life)")
      case _ => ()
    }
    val pairs = Caching.maybePersist(
      bandPairs(conv, touch, windowUs, userCol), storage)
    // per-conversion touch count + the most recent (remainder anchor) and,
    // for the U-shape, the earliest touch — all combinable aggregates
    val perConv = pairs.groupBy(col(userCol), col("conv_event_id"))
      .agg(count(lit(1)).as("n_touches"),
        max(struct(col("touch_ts_us"), col("touch_event_id"))).as("__last"),
        min(struct(col("touch_ts_us"), col("touch_event_id"))).as("__first"))
    val base = pairs.join(perConv, Seq(userCol, "conv_event_id"))
    val isLast = col("touch_event_id") === col("__last.touch_event_id")
    val isFirst = col("touch_event_id") === col("__first.touch_event_id")
    val out = scheme match {
      case Linear =>
        base.withColumn("credit_fp",
          expr("__v div n_touches") +
            when(isLast, col("__v") - col("n_touches") * expr("__v div n_touches"))
              .otherwise(lit(0L)))
      case Position =>
        // 40/20/40: first (v*40) div 100, middles ((v*20) div 100) div (n-2)
        // each, last = v minus everything else (exact conservation);
        // n=1 takes all, n=2 splits v div 2 / v - v div 2
        val firstShare = expr("(__v * 40) div 100")
        val midShare = expr("((__v * 20) div 100) div (n_touches - 2)")
        base.withColumn("credit_fp",
          when(col("n_touches") === 1, col("__v"))
            .when(col("n_touches") === 2,
              when(isLast, col("__v") - expr("__v div 2")).otherwise(expr("__v div 2")))
            .when(isFirst, firstShare)
            .when(isLast,
              col("__v") - firstShare - (col("n_touches") - 2) * midShare)
            .otherwise(midShare))
      case TimeDecay(halfLifeUs) =>
        // weight = 2^(maxH - h), h = whole elapsed half-lives; the product
        // v * w runs in DECIMAL(38,0) (the PageRank overflow discipline),
        // the floor shares sum per conversion, and the anchor absorbs
        // v - sum(shares). The WEIGHT SUM is DECIMAL(38,0) too: a single
        // weight fits BIGINT (maxH <= 62), but n touches in the newest
        // bucket sum to n*2^maxH, which wraps a BIGINT sum silently under
        // non-ANSI Spark at e.g. maxH=62, n=2 — the oracle's HUGEINT sum
        // would diverge in exactly those configs.
        val maxH = (windowUs - 1) / halfLifeUs
        val weighted = base.withColumn("__w", expr(
          s"shiftleft(CAST(1 AS BIGINT), CAST($maxH - " +
            s"(conv_ts_us - touch_ts_us) div ${halfLifeUs}L AS INT))"))
        val sums = weighted.groupBy(col(userCol), col("conv_event_id"))
          .agg(sum(col("__w").cast("decimal(38,0)")).as("__wsum"))
        val shared = weighted.join(sums, Seq(userCol, "conv_event_id"))
          .withColumn("__share", expr(
            "CAST((CAST(__v AS DECIMAL(38,0)) * __w) div __wsum AS BIGINT)"))
        val slack = shared.groupBy(col(userCol), col("conv_event_id"))
          .agg(sum(col("__share")).as("__ssum"))
        shared.join(slack, Seq(userCol, "conv_event_id"))
          .withColumn("credit_fp",
            col("__share") +
              when(isLast, col("__v") - col("__ssum")).otherwise(lit(0L)))
    }
    out.select(col(userCol), col("conv_event_id"), col("conv_ts_us"),
      col("touch_event_id"), col("touch_ts_us"), col("n_touches"),
      col("credit_fp"))
  }

  /** The conversions every attribution scheme SKIPS — no touch inside the
    * lookback window, so their value is organic/unattributable (the
    * scaladoc's "separate query", made first-class so the revenue
    * accounting closes: attributed credits + unattributed values = total
    * conversion value). Output: (userCol, conv_event_id, conv_ts_us,
    * value_fp). One user-keyed band join turned LEFT ANTI — same
    * per-user-bounded fan-out as the credit path.
    */
  def unattributedConversions(events: DataFrame, windowDays: Int = 7,
                              convType: String = "purchase",
                              touchType: String = "click",
                              userCol: String = "user_id", tsCol: String = "ts",
                              idCol: String = "event_id",
                              typeCol: String = "event_type",
                              valueCol: String = "value"): DataFrame = {
    require(windowDays >= 1, "windowDays must be positive")
    val windowUs = windowDays.toLong * 86400000000L
    val conv = convsOf(events, convType, userCol, tsCol, idCol, typeCol, valueCol)
    val touch = touchesOf(events, touchType, userCol, tsCol, idCol, typeCol)
    // attributed keys via the bucketed candidate join (linear in history),
    // then one equi anti join — an anti join over the raw band predicate
    // would re-materialize the per-user all-history pair fan-out
    val attributed = bandPairs(conv, touch, windowUs, userCol)
      .select(col(userCol), col("conv_event_id"))
    conv.join(attributed, Seq(userCol, "conv_event_id"), "left_anti")
      .select(col(userCol), col("conv_event_id"), col("conv_ts_us"),
        col("__v").as("value_fp"))
  }

  /** Conversion-PATH analysis — the journey report attribution models
    * argue about: for each conversion, the (time, event id)-ordered
    * sequence of in-window touch event TYPES joined with ">" (e.g.
    * "view>click>click"), plus the touch count and the conversion's
    * fixed-point value. `touchTypes` picks which event types count as
    * journey steps; conversions with no in-window step produce no row
    * ([[unattributedConversions]] is their report). Downstream `groupBy
    * (path)` rolls journeys up to the classic top-paths table.
    *
    * Engine-exact: the path is a pure function of the (ts, id) order —
    * no floats anywhere. Scale shape: the same user-keyed band join as
    * the credit path + ONE per-conversion ordered collect, bounded by
    * per-user in-window activity, never corpus size.
    */
  def conversionPaths(events: DataFrame, windowDays: Int = 7,
                      convType: String = "purchase",
                      touchTypes: Seq[String] = Seq("click", "view", "signup"),
                      userCol: String = "user_id", tsCol: String = "ts",
                      idCol: String = "event_id",
                      typeCol: String = "event_type",
                      valueCol: String = "value"): DataFrame = {
    require(windowDays >= 1, "windowDays must be positive")
    require(touchTypes.nonEmpty, "conversionPaths needs at least one touch type")
    require(!touchTypes.contains(convType),
      s"conversion type $convType cannot also be a journey step " +
        "(every path would end in its own conversion)")
    val windowUs = windowDays.toLong * 86400000000L
    val conv = convsOf(events, convType, userCol, tsCol, idCol, typeCol, valueCol)
    val touch = events.filter(col(typeCol).isin(touchTypes: _*))
      .select(col(userCol), col(idCol).as("touch_event_id"),
        tsOrRaise(tsCol).as("touch_ts_us"), col(typeCol).as("__tt"))
    bandPairs(conv, touch, windowUs, userCol)
      .groupBy(col(userCol), col("conv_event_id"))
      .agg(min(col("conv_ts_us")).as("conv_ts_us"),
        min(col("__v")).as("value_fp"),
        count(lit(1)).as("n_touches"),
        sort_array(collect_list(struct(
          col("touch_ts_us"), col("touch_event_id"), col("__tt")))).as("__steps"))
      .select(col(userCol), col("conv_event_id"), col("conv_ts_us"),
        expr("array_join(transform(__steps, s -> s.__tt), '>')").as("path"),
        col("n_touches"), col("value_fp"))
  }

  /** Markov REMOVAL-EFFECT attribution — the data-driven scheme real
    * platforms compare rule-based splits (linear / U-shape / time-decay)
    * against: a channel's importance is what would be LOST without it.
    * On the OBSERVED [[conversionPaths]] journeys, a channel's removal
    * effect is `1 - (conversions still reachable when every path
    * containing that channel is dropped / total conversions)` — which on
    * observed paths reduces to the exact share of conversions whose
    * journey touches the channel (no transition-matrix chain inversion:
    * the counts are exact integers, engine-portable, and bounded by the
    * observed-path domain). Reported per channel in `touchTypes` (a
    * channel in no journey scores 0):
    *
    *   - `n_conversions` / `total_value_fp` — the corpus totals (repeated
    *     per row, the denominator audit);
    *   - `n_lost` / `value_lost_fp` — conversions (and their fixed-point
    *     value) whose journey contains the channel;
    *   - `removal_effect_ppm` / `value_effect_ppm` — exact floor-ppm
    *     shares of each (0 when the journey table is empty).
    *
    * Effects across channels sum to MORE than 1e6 when journeys span
    * channels (each multi-channel conversion is lost by several removals)
    * — that is the semantics, not double counting; normalize downstream
    * when a credit SPLIT is wanted.
    *
    * Scale shape: [[conversionPaths]]' user-keyed band join + bounded
    * ordered collect, then one channel-exploded combinable aggregate over
    * the per-conversion rows (distinct channels per journey — never
    * per-touch fan-out) and a 1-row totals broadcast; the channel list
    * joins in as a literal array, so the output is |touchTypes| rows.
    */
  def removalEffectAttribution(events: DataFrame, windowDays: Int = 7,
                               convType: String = "purchase",
                               touchTypes: Seq[String] = Seq("click", "view", "signup"),
                               userCol: String = "user_id", tsCol: String = "ts",
                               idCol: String = "event_id",
                               typeCol: String = "event_type",
                               valueCol: String = "value",
                               storage: org.apache.spark.storage.StorageLevel =
                                 org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK): DataFrame = {
    // persisted: the corpus totals AND the per-channel explode both read
    // the journey table, and each evaluation re-runs the whole band-join
    // + path-assembly pipeline (the creditsFor persist rule)
    val paths = Caching.maybePersist(
      conversionPaths(events, windowDays, convType, touchTypes,
        userCol, tsCol, idCol, typeCol, valueCol), storage)
    val totals = paths.agg(count(lit(1)).as("n_conversions"),
      coalesce(sum(col("value_fp")), lit(0L)).as("total_value_fp"))
    val perChannel = paths
      .select(col("value_fp"),
        explode(array_distinct(split(col("path"), ">"))).as("channel"))
      .groupBy(col("channel"))
      .agg(count(lit(1)).as("n_lost"), sum(col("value_fp")).as("value_lost_fp"))
    events.sparkSession.range(1)
      .select(explode(typedLit(touchTypes.distinct)).as("channel"))
      .join(perChannel, Seq("channel"), "left")
      .crossJoin(broadcast(totals))
      .select(col("channel"), col("n_conversions"), col("total_value_fp"),
        coalesce(col("n_lost"), lit(0L)).as("n_lost"),
        coalesce(col("value_lost_fp"), lit(0L)).as("value_lost_fp"),
        coalesce(ExactPpm.ppm(coalesce(col("n_lost"), lit(0L)),
          col("n_conversions")), lit(0L)).as("removal_effect_ppm"),
        coalesce(ExactPpm.ppm(coalesce(col("value_lost_fp"), lit(0L)),
          col("total_value_fp")), lit(0L)).as("value_effect_ppm"))
  }

  // ---- incremental form ----------------------------------------------

  /** Build the appendable attribution state from an initial event batch:
    * one row per RETAINED touch — (userCol, touch_event_id, touch_ts_us,
    * last_ts_us, last_event_id), the per-user stream position repeated on
    * each row, plus one NULL-touch row for users with a position but no
    * retained touch (only conversions, or every touch pruned). A touch is
    * retained while `touch_ts_us > last_ts_us - window`: anything older
    * can never enter a future conversion's window (shards only move
    * forward), so the state is bounded by per-user IN-WINDOW activity,
    * never history length. The position tracks conversions AND touches —
    * exactly the events whose order the increment contract guards.
    */
  def attributionState(events: DataFrame, windowDays: Int = 7,
                       convType: String = "purchase",
                       touchType: String = "click",
                       userCol: String = "user_id", tsCol: String = "ts",
                       idCol: String = "event_id",
                       typeCol: String = "event_type"): DataFrame = {
    require(windowDays >= 1, "windowDays must be positive")
    val windowUs = windowDays.toLong * 86400000000L
    val rel = events.filter(col(typeCol).isin(convType, touchType))
      .select(col(userCol), col(idCol), tsOrRaise(tsCol).as("__t"), col(typeCol))
    val pos = rel.groupBy(col(userCol))
      .agg(max(struct(col("__t"), col(idCol))).as("__p"))
      .select(col(userCol), col("__p.__t").as("last_ts_us"),
        col(s"__p.$idCol").as("last_event_id"))
    val kept = rel.filter(col(typeCol) === touchType)
      .select(col(userCol), col(idCol).as("touch_event_id"), col("__t").as("touch_ts_us"))
      .join(pos, Seq(userCol))
      .filter(col("touch_ts_us") > col("last_ts_us") - lit(windowUs))
      .select(col(userCol), col("touch_event_id"), col("touch_ts_us"))
    pos.join(kept, Seq(userCol), "left")
      .select(col(userCol), col("touch_event_id"), col("touch_ts_us"),
        col("last_ts_us"), col("last_event_id"))
  }

  /** Per-user merged stream position shared by the two increment entry
    * points: collapses the state's repeated position, computes the
    * shard's first/last relevant event, and flags users whose shard
    * carries an event at or before the stored position (`__poisoned` —
    * a silently mis-ordered fold would attribute against a pruned touch
    * pool: wrong, quietly; callers turn the flag into a per-row raise on
    * a column their output genuinely reads, so the optimizer can never
    * prune the guard).
    */
  private def mergedPosition(state: DataFrame, rel: DataFrame,
                             userCol: String, idCol: String): DataFrame = {
    val st = state.groupBy(col(userCol))
      .agg(max(struct(col("last_ts_us"), col("last_event_id"))).as("__sp"))
      .select(col(userCol), col("__sp.last_ts_us").as("__lt"),
        col("__sp.last_event_id").as("__li"))
    val sh = rel.groupBy(col(userCol))
      .agg(min(struct(col("__t"), col(idCol))).as("__first"),
        max(struct(col("__t"), col(idCol))).as("__slast"))
    st.join(sh, Seq(userCol), "full_outer")
      .select(col(userCol),
        (col("__lt").isNotNull && col("__first").isNotNull &&
          (col("__first.__t") < col("__lt") ||
            (col("__first.__t") === col("__lt") &&
              col(s"__first.$idCol") <= col("__li")))).as("__poisoned"),
        coalesce(col("__slast.__t"), col("__lt")).as("last_ts_us"),
        coalesce(col(s"__slast.$idCol"), col("__li")).as("last_event_id"))
  }

  private def orderRaise(userCol: String): Column =
    raise_error(concat(
      lit("incrementAttribution: shard event at or before the stored "),
      lit("stream position for user "), col(userCol).cast("string"),
      lit(" — shards must arrive in time order")))

  /** Credits for the SHARD's conversions, attributed against the stored
    * touch state plus the shard's own touches — O(shard x in-window
    * state) work; stored conversions are never recomputed (their credits
    * are immutable) and stored touches never re-pair with each other
    * (stored x stored happened when they were the shard). Equals the
    * one-shot recompute restricted to the shard's conversions (the q143
    * pattern; AttributionSpec and the q170 oracle pin it). Same scheme
    * knobs as the one-shot forms.
    */
  def incrementAttribution(state: DataFrame, shard: DataFrame,
                           windowDays: Int = 7,
                           scheme: Scheme = Linear,
                           convType: String = "purchase",
                           touchType: String = "click",
                           userCol: String = "user_id", tsCol: String = "ts",
                           idCol: String = "event_id",
                           typeCol: String = "event_type",
                           valueCol: String = "value",
                           storage: org.apache.spark.storage.StorageLevel =
                             org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK): DataFrame = {
    require(windowDays >= 1, "windowDays must be positive")
    val windowUs = windowDays.toLong * 86400000000L
    val rel = shard.filter(col(typeCol).isin(convType, touchType))
      .select(col(userCol), col(idCol), tsOrRaise(tsCol).as("__t"), col(typeCol))
    val conv = convsOf(shard, convType, userCol, tsCol, idCol, typeCol, valueCol)
    val pool = state.filter(col("touch_event_id").isNotNull)
      .select(col(userCol), col("touch_event_id"), col("touch_ts_us"))
      .unionByName(touchesOf(shard, touchType, userCol, tsCol, idCol, typeCol))
    val credits = creditsFor(conv, pool, scheme, windowUs, userCol, storage)
    // the out-of-order guard must fire even for a poisoned user with no
    // shard CONVERSION (their late touch silently never pairs with the
    // already-attributed stored conversions — the exact breach the
    // contract forbids), so it rides a unioned frame that is empty unless
    // a poisoned row raises: the filter predicate evaluates per position
    // row and cannot be pruned (its when-branch is not statically false)
    val poison = mergedPosition(state, rel, userCol, idCol)
      .filter(when(col("__poisoned"), orderRaise(userCol).cast("boolean"))
        .otherwise(lit(false)))
      .select(credits.schema.fields.map(f =>
        lit(null).cast(f.dataType).as(f.name)).toSeq: _*)
    credits.unionByName(poison)
  }

  /** Reconstruct the current state snapshot from an era-tagged append log
    * — the layout the streaming gate and the CLI share (the
    * ewmaGateWriter pattern, multi-row-per-user form): per user the rows
    * of the LATEST era win, and `dropDuplicates` collapses a crashed
    * append's re-delivered identical rows. `excludeEra` drops that era
    * first — a replaying trigger excludes its own half-written rows.
    */
  def latestState(raw: DataFrame, userCol: String = "user_id",
                  excludeEra: Option[Long] = None): DataFrame = {
    val noOwn = excludeEra match {
      case Some(e) => raw.filter(col("era") =!= lit(e))
      case None => raw
    }
    val maxEra = noOwn.groupBy(col(userCol)).agg(max(col("era")).as("__me"))
    noOwn.join(maxEra, Seq(userCol)).filter(col("era") === col("__me"))
      .drop("era", "__me").dropDuplicates()
  }

  /** The state after folding `shard` in: merged positions (new users
    * appear, untouched users pass through), merged touches re-pruned
    * against the ADVANCED position. Same out-of-order raise as
    * [[incrementAttribution]]; `windowDays` is frozen with the state like
    * every incremental consumer's knobs.
    */
  def incrementAttributionState(state: DataFrame, shard: DataFrame,
                                windowDays: Int = 7,
                                convType: String = "purchase",
                                touchType: String = "click",
                                userCol: String = "user_id", tsCol: String = "ts",
                                idCol: String = "event_id",
                                typeCol: String = "event_type"): DataFrame = {
    require(windowDays >= 1, "windowDays must be positive")
    val windowUs = windowDays.toLong * 86400000000L
    val rel = shard.filter(col(typeCol).isin(convType, touchType))
      .select(col(userCol), col(idCol), tsOrRaise(tsCol).as("__t"), col(typeCol))
    // the raise rides last_ts_us — every state row carries it, so the
    // guard evaluates whenever the new state materializes
    val pos = mergedPosition(state, rel, userCol, idCol)
      .select(col(userCol),
        when(col("__poisoned"), orderRaise(userCol).cast("long"))
          .otherwise(col("last_ts_us")).as("last_ts_us"),
        col("last_event_id"))
    val kept = state.filter(col("touch_event_id").isNotNull)
      .select(col(userCol), col("touch_event_id"), col("touch_ts_us"))
      .unionByName(rel.filter(col(typeCol) === touchType)
        .select(col(userCol), col(idCol).as("touch_event_id"), col("__t").as("touch_ts_us")))
      .join(pos, Seq(userCol))
      .filter(col("touch_ts_us") > col("last_ts_us") - lit(windowUs))
      .select(col(userCol), col("touch_event_id"), col("touch_ts_us"))
    pos.join(kept, Seq(userCol), "left")
      .select(col(userCol), col("touch_event_id"), col("touch_ts_us"),
        col("last_ts_us"), col("last_event_id"))
  }
}
