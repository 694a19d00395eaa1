package graft.serving

import com.fasterxml.jackson.databind.ObjectMapper

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.domain.FeaturesDaily
import graft.sources.{Fetcher, KVClient}

/** One user's decoded online feature snapshot (reference response model:
  * models.py:5-10 — user_id + feature map + source tag).
  */
final case class OnlineFeatures(
    user_id: String,
    day: Option[String],
    event_count_7d: Option[Long],
    event_count_30d: Option[Long],
    last_event_days_ago: Option[Int],
    event_type_counts: Option[String],
    source: String = "online")

/** One user's decoded REALTIME feature snapshot — the streaming sync's
  * running counters (see [[graft.streaming.EventStream.kvSyncWriter]]), as
  * opposed to the batch pipeline's daily snapshot.
  */
final case class RealtimeFeatures(
    user_id: String,
    event_count: Option[Long],
    purchase_count: Option[Long],
    last_event_ts: Option[String],
    source: String = "online_rt")

/** Serving-path point lookups (reference: api/online.py:19-51 and
  * api/offline.py:52-125). Not Spark operators — the online path is a
  * single KV GET + JSON decode, exactly what a request-time feature
  * service does; the offline path is the README-documented
  * `ORDER BY day DESC LIMIT 1` debug query.
  *
  * Keyspace contract: batch online-sync writes the DAILY snapshot under
  * `features:{user_id}` (decoded by [[online]]); the streaming sync writes
  * RUNNING counters under `features_rt:{user_id}` (decoded by
  * [[onlineRealtime]]). Same store, disjoint prefixes — a serving tier
  * reads both and merges: the batch row for the modeled features, the
  * realtime row for freshness between backfills.
  */
object FeatureLookup {

  private val mapper = new ObjectMapper()

  /** `GET features:{user_id}` -> decoded snapshot; `None` is the reference's
    * 404. Decodes the sync payload's quirk (reference online.py:38-44,
    * README.md:158-169): numeric values arrive as JSON *strings*
    * ("event_count_7d":"5"), absent values as unquoted null.
    */
  def online(client: KVClient, userId: String,
      keyPrefix: String = "features:"): Option[OnlineFeatures] =
    client.get(keyPrefix + userId).map { json =>
      val node = mapper.readTree(json)
      def field(f: String): Option[String] =
        Option(node.get(f)).filterNot(_.isNull).map(_.asText)
      OnlineFeatures(
        user_id = userId,
        day = field("day"),
        event_count_7d = field("event_count_7d").map(_.toLong),
        event_count_30d = field("event_count_30d").map(_.toLong),
        last_event_days_ago = field("last_event_days_ago").map(_.toInt),
        event_type_counts = field("event_type_counts"))
    }

  /** `GET features_rt:{user_id}` -> the streaming sync's running counters;
    * `None` when the user has never streamed. Same string-quoted payload
    * convention as the batch sync (both go through the same cast-to-string
    * struct + to_json).
    */
  def onlineRealtime(client: KVClient, userId: String,
      keyPrefix: String = "features_rt:"): Option[RealtimeFeatures] =
    client.get(keyPrefix + userId).map { json =>
      val node = mapper.readTree(json)
      def field(f: String): Option[String] =
        Option(node.get(f)).filterNot(_.isNull).map(_.asText)
      RealtimeFeatures(
        user_id = userId,
        event_count = field("event_count").map(_.toLong),
        purchase_count = field("purchase_count").map(_.toLong),
        last_event_ts = field("last_event_ts"))
    }

  /** Latest snapshot for one user at or before `asOfDate` (inclusive):
    * `user_id = ? AND day <= ?` then `ORDER BY day DESC LIMIT 1`
    * (reference offline.py:85-103 scans then driver-maxes; the SQL-shaped
    * form is README.md:237-243). On a day-partitioned features table the
    * day predicate prunes partitions, so the scan touches one user's slice
    * of a bounded day range. `None` when the user has no snapshot.
    */
  def offline(features: DataFrame, userId: String,
      asOfDate: String): Option[FeaturesDaily] = {
    val spark = features.sparkSession
    import spark.implicits._
    features
      .filter(col("user_id") === userId && col("day") <= to_date(lit(asOfDate)))
      .orderBy(col("day").desc)
      .limit(1)
      .as[FeaturesDaily]
      .collect()
      .headOption
  }

  /** Offline lookup through the platform's fetcher by table name. */
  def offlineFromTable(spark: SparkSession, fetcher: Fetcher,
      featuresTable: String, userId: String, asOfDate: String): Option[FeaturesDaily] =
    offline(fetcher.readTable(spark, featuresTable), userId, asOfDate)
}
