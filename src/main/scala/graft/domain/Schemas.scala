package graft.domain

import java.sql.{Date, Timestamp}

import org.apache.spark.sql.types._

/** Central schema declarations for the feature-store domain tables.
  *
  * Mirrors the reference's schema surface (reference:
  * spark/src/main/scala/com/example/featurestore/domain/Schemas.scala:9-53):
  * five primitive types, explicit nullability (keys/time non-null, feature
  * columns nullable), schemas passed to readers to disable inference.
  */
object Schemas {

  /** Raw event log: one row per user action. */
  val eventsRaw: StructType = StructType(Seq(
    StructField("user_id", StringType, nullable = false),
    StructField("event_type", StringType, nullable = false),
    StructField("ts", TimestampType, nullable = false)
  ))

  /** Training labels with an as-of timestamp for point-in-time joins. */
  val labels: StructType = StructType(Seq(
    StructField("user_id", StringType, nullable = false),
    StructField("label", DoubleType, nullable = false),
    StructField("as_of_ts", TimestampType, nullable = false)
  ))

  /** Daily per-user feature snapshot (backfill output; partitioned by day). */
  val featuresDaily: StructType = StructType(Seq(
    StructField("user_id", StringType, nullable = false),
    StructField("day", DateType, nullable = false),
    StructField("event_count_7d", LongType, nullable = true),
    StructField("event_count_30d", LongType, nullable = true),
    StructField("last_event_days_ago", IntegerType, nullable = true),
    StructField("event_type_counts", StringType, nullable = true)
  ))

  /** Point-in-time-join output: label columns + feature columns. */
  val trainingData: StructType = StructType(
    labels.fields ++ featuresDaily.fields.filterNot(_.name == "user_id"))

  /** Normalize an event log's `ts` to TimestampType. Event logs written with
    * parquet TIMESTAMP(NANOS) arrive as raw nanosecond longs (readers must
    * set `spark.sql.legacy.parquet.nanosAsLong`; Spark 4 has no nanosecond
    * timestamp type) — truncate to microseconds with integer division (ns
    * since epoch exceeds double's 2^53 exact range). TIMESTAMP(MICROS)
    * without a timezone loads as TIMESTAMP_NTZ, which Spark's epoch
    * functions (`unix_micros`, `to_utc_timestamp`) refuse — cast it to
    * TimestampType, interpreting the wall-clock in the session timezone
    * (our entry points pin it to UTC, which is how DuckDB treats a naive
    * parquet timestamp, so the oracle agrees on absolute epoch values).
    * Already-LTZ inputs pass through untouched.
    */
  def normalizeEventTs(df: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame =
    df.schema("ts").dataType match {
      case LongType =>
        df.withColumn("ts", org.apache.spark.sql.functions.timestamp_micros(
          org.apache.spark.sql.functions.expr("ts DIV 1000")))
      case TimestampNTZType =>
        // the cast interprets the wall-clock in the session timezone: a
        // non-UTC session would silently shift every event epoch, so
        // refuse rather than corrupt (entry points all pin UTC)
        val tz = df.sparkSession.conf.get("spark.sql.session.timeZone")
        require(tz == "UTC",
          s"normalizeEventTs: NTZ ts cast requires spark.sql.session.timeZone=UTC, got '$tz'")
        df.withColumn("ts", org.apache.spark.sql.functions.col("ts").cast(TimestampType))
      case _ => df
    }
}

/** One raw event (reference: domain/EventRaw.scala:9-13). */
final case class EventRaw(user_id: String, event_type: String, ts: Timestamp)

/** One training label (reference: domain/Label.scala:9-13). */
final case class Label(user_id: String, label: Double, as_of_ts: Timestamp)

/** One daily feature row (reference: domain/FeaturesDaily.scala:13-20).
  * Zero-event-day semantics (SURVEY §2.4): counts 0, recency None,
  * event_type_counts Some("0").
  */
final case class FeaturesDaily(
    user_id: String,
    day: Date,
    event_count_7d: Option[Long],
    event_count_30d: Option[Long],
    last_event_days_ago: Option[Int],
    event_type_counts: Option[String])

/** One training row (reference: domain/TrainingData.scala:10-19). */
final case class TrainingData(
    user_id: String,
    label: Double,
    as_of_ts: Timestamp,
    day: Option[Date],
    event_count_7d: Option[Long],
    event_count_30d: Option[Long],
    last_event_days_ago: Option[Int],
    event_type_counts: Option[String])

/** Pipeline configs (reference: the per-pipeline Config case classes). */
final case class BackfillConfig(
    eventsRawPath: String,
    outputTable: String,
    startDate: String,
    endDate: String,
    partitionBy: Seq[String] = Seq("day"),
    // bucket the output by user_id into N buckets: downstream per-user
    // windows/joins (online sync, as-of join) then scan without an exchange
    buckets: Option[Int] = None)

final case class PointInTimeJoinConfig(
    labelsPath: String,
    featuresTable: String,
    outputPath: String,
    partitionBy: Seq[String] = Seq("as_of_ts"),
    // union: single-shuffle running-last plan (default, no fan-out at deep
    // history); rank: reference-shaped join+row_number plan
    useUnionPlan: Boolean = true)

final case class OnlineSyncConfig(
    featuresTable: String,
    hoursBack: Int = 24,
    keyPrefix: String = "features:")
