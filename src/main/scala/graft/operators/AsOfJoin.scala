package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{StructField, StructType}

/** Point-in-time (as-of) left join: for each left row, attach the single
  * right row with the greatest right-time <= left-time for the same key —
  * the leakage-free feature-attachment primitive (reference:
  * PointInTimeJoinPipeline.scala:9-16, 102-122).
  *
  * Two physical formulations with identical semantics:
  *
  *  - [[joinRank]]: equi+range join then `row_number` top-1. Simple, but the
  *    range join fans out to |matching right rows| intermediates per left
  *    row before the rank filter — fine when the right side is a bounded
  *    snapshot table, quadratic-ish when a key has deep history.
  *
  *  - [[unionSorted]]: the scale formulation. Tag both sides, union, and
  *    carry the latest right row forward with `last(_, ignoreNulls)` over a
  *    (key ORDER BY time) running window. ONE shuffle, NO fan-out: cost is
  *    a sort of |left|+|right| regardless of history depth per key. This is
  *    the one that survives 100 TB.
  */
object AsOfJoin {

  /** join + window-rank formulation (parity with the reference plan). */
  def joinRank(left: DataFrame, right: DataFrame, key: String,
      leftTime: String, rightTime: String,
      rightValueCols: Seq[String]): DataFrame = {
    // Rank per physical left ROW, not per distinct left value: two fully
    // identical left rows (duplicate labels) must each keep their match,
    // so partition the window by a synthetic unique id.
    val l = left.withColumn("__lid", monotonically_increasing_id()).alias("l")
    val r = right.alias("r")
    val joined = l.join(r,
      col(s"l.$key") === col(s"r.$key") &&
        col(s"r.$rightTime") <= col(s"l.$leftTime"),
      "left")
    // Deterministic tie-break on rightTime desc (the reference orders by
    // feature time only; ties cannot arise there because (key, time) is
    // unique per snapshot — same ordering kept defensively).
    val w = Window
      .partitionBy(col("l.__lid"))
      .orderBy(col(s"r.$rightTime").desc_nulls_last)
    val outCols: Seq[Column] =
      left.columns.toIndexedSeq.map(c => col(s"l.$c").as(c)) ++
        rightValueCols.map(c => col(s"r.$c").as(c))
    joined
      .withColumn("__rank", row_number().over(w))
      .filter(col("__rank") === 1)
      .select(outCols: _*)
  }

  /** union + running-last formulation (single-shuffle scale path).
    *
    * Right rows sort BEFORE left rows at equal time (side tag 0 < 1), so a
    * feature stamped exactly at the label's as-of instant is visible —
    * matching the reference's `feature_date <= as_of_date` inclusivity.
    */
  def unionSorted(left: DataFrame, right: DataFrame, key: String,
      leftTime: String, rightTime: String,
      rightValueCols: Seq[String]): DataFrame = {
    val leftPayload = left.columns.toSeq.filterNot(_ == key)
    // Pack the right row's values into ONE struct so the running `last`
    // carries the latest snapshot ATOMICALLY. Carrying each column with its
    // own last(_, ignoreNulls) would mix snapshots: a newer snapshot's
    // legitimately-null column inherits an older snapshot's value.
    val rvStructType = StructType(rightValueCols.map(c =>
      StructField(c, right.schema(c).dataType, nullable = true)))
    // Common shape: key, __t (event time), __side, left payload, __rv struct.
    val taggedRight = right.select(
      Seq(col(key), col(rightTime).cast("timestamp").as("__t"), lit(0).as("__side")) ++
        leftPayload.map(c => lit(null).cast(left.schema(c).dataType).as(c)) :+
        struct(rightValueCols.map(c => col(c)): _*).as("__rv"): _*)
    val taggedLeft = left.select(
      Seq(col(key), col(leftTime).cast("timestamp").as("__t"), lit(1).as("__side")) ++
        leftPayload.map(c => col(c)) :+
        lit(null).cast(rvStructType).as("__rv"): _*)
    val w = Window.partitionBy(col(key))
      .orderBy(col("__t").asc, col("__side").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    taggedRight.unionByName(taggedLeft)
      .withColumn("__rv", last(col("__rv"), ignoreNulls = true).over(w))
      .filter(col("__side") === 1)
      .select(Seq(col(key)) ++ leftPayload.map(c => col(c)) ++
        rightValueCols.map(c => col("__rv").getField(c).as(c)): _*)
  }

  /** NEAREST join: for each left row, the single right row of the same key
    * whose time is CLOSEST (either direction) within `tolerance` — the
    * sensor-alignment primitive the backward-only as-of can't express
    * (align a label to the nearest reading, before or after). Ties prefer
    * the EARLIER right row — the leakage-conservative choice. Left rows
    * with no right row inside the tolerance keep NULL value columns
    * (left-join semantics, like [[unionSorted]]).
    *
    * Time columns must be NUMERIC (epoch micros/nanos — cast timestamps
    * upstream): all distance math is then exact integer arithmetic an
    * oracle replays, and `tolerance` is in the same unit.
    *
    * Scale shape: [[unionSorted]]'s single-shuffle discipline, doubled in
    * direction, not in cost — ONE sort of |left|+|right| on (key, time)
    * feeds BOTH a running-last (nearest earlier) and a running-first
    * (nearest later) over the same window partitioning; no range-join
    * fan-out at any history depth. Right rows sort before left rows at
    * equal time, so an exact-tie reading is visible to the backward pass
    * at distance 0. Assumes (key, rightTime) unique (the snapshot-table
    * contract joinRank documents); pre-aggregate duplicates upstream.
    */
  def nearest(left: DataFrame, right: DataFrame, key: String,
      leftTime: String, rightTime: String,
      rightValueCols: Seq[String], tolerance: Long): DataFrame = {
    require(tolerance >= 0, "tolerance must be non-negative")
    require(left.schema(leftTime).dataType.isInstanceOf[org.apache.spark.sql.types.NumericType] &&
      right.schema(rightTime).dataType.isInstanceOf[org.apache.spark.sql.types.NumericType],
      "nearest joins NUMERIC time columns (epoch micros/nanos); cast timestamps upstream")
    val leftPayload = left.columns.toSeq.filterNot(_ == key)
    // the carried struct leads with the right TIME so distance math can
    // run off whichever side won
    val rvStructType = StructType(
      StructField("__rt", right.schema(rightTime).dataType, nullable = true) +:
        rightValueCols.map(c => StructField(c, right.schema(c).dataType, nullable = true)))
    val taggedRight = right.select(
      Seq(col(key), col(rightTime).cast("long").as("__t"), lit(0).as("__side")) ++
        leftPayload.map(c => lit(null).cast(left.schema(c).dataType).as(c)) :+
        struct(col(rightTime).as("__rt") +: rightValueCols.map(col): _*).as("__rv"): _*)
    val taggedLeft = left.select(
      Seq(col(key), col(leftTime).cast("long").as("__t"), lit(1).as("__side")) ++
        leftPayload.map(c => col(c)) :+
        lit(null).cast(rvStructType).as("__rv"): _*)
    val ordered = Window.partitionBy(col(key)).orderBy(col("__t").asc, col("__side").asc)
    val wBack = ordered.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    // the label's own row carries a null __rv, so first(ignoreNulls)
    // lands on the next RIGHT row; same-time right rows sorted before the
    // label are the backward pass's distance-0 case, not this one's
    val wFwd = ordered.rowsBetween(Window.currentRow, Window.unboundedFollowing)
    val withBoth = taggedRight.unionByName(taggedLeft)
      .withColumn("__back", last(col("__rv"), ignoreNulls = true).over(wBack))
      .withColumn("__fwd", first(col("__rv"), ignoreNulls = true).over(wFwd))
      .filter(col("__side") === 1)
    val dBack = col("__t") - col("__back.__rt").cast("long")
    val dFwd = col("__fwd.__rt").cast("long") - col("__t")
    val nearer = when(col("__back").isNull, col("__fwd"))
      .when(col("__fwd").isNull, col("__back"))
      .when(dBack <= dFwd, col("__back")) // tie -> earlier
      .otherwise(col("__fwd"))
    val dist = abs(nearer.getField("__rt").cast("long") - col("__t"))
    val chosen = when(nearer.isNotNull && dist <= tolerance, nearer)
    withBoth.select(
      Seq(col(key)) ++ leftPayload.map(col) ++
        rightValueCols.map(c => chosen.getField(c).as(c)): _*)
  }

  /** Generic band (range) join: left rows paired with right rows of the same
    * key whose time falls in [leftTime - windowDays, leftTime]. The band
    * bound is the optimizer: it caps fan-out to the window width, and with
    * day-partitioned storage it prunes the scan (reference intent:
    * BackfillPipeline.scala:22, 124-131).
    */
  def bandJoin(left: DataFrame, right: DataFrame,
      leftKey: String, rightKey: String,
      leftDay: String, rightDay: String, windowDays: Int,
      joinType: String = "left"): DataFrame = {
    val l = left.alias("__bl")
    val r = right.alias("__br")
    l.join(r,
      col(s"__bl.$leftKey") === col(s"__br.$rightKey") &&
        col(s"__br.$rightDay") <= col(s"__bl.$leftDay") &&
        col(s"__br.$rightDay") >= date_sub(col(s"__bl.$leftDay"), windowDays),
      joinType)
  }
}
