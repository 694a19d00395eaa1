package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.Sessionize

/** Round-6 analytics operators: event sessionization, frequency sketches,
  * Bloom pruning, OLAP reporting shapes, and corpus mixing — each with a
  * DuckDB oracle twin, same parity strategy as [[TrainingDataQueries]]
  * (pinned constants, ordered folds, integer math wherever a value crosses
  * engines).
  */
object AnalyticsQueries {

  /** Session gap: 4 hours. The sf corpus' median per-user inter-event gap
    * is ~7.3h, so this cut yields a real mix of multi-event sessions and
    * singletons (a 30-min web-style gap would make nearly every event its
    * own session in this data).
    */
  private val SessionGapSeconds = 14400L

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // gap-based sessionization + per-session rollup: one shuffle on
    // user_id, integer-exact outputs (micros, counts)
    "q54_sessionize" -> ((s, dir) =>
      Sessionize.sessions(SparkEntry.events(s, dir), SessionGapSeconds))
  )

  def oracleSql: Map[String, String] = Map(
    // lag/running-sum session assignment over (ts_us, event_id) — the
    // deterministic order Sessionize.assign uses; ts crosses engines as
    // floor-truncated micros (epoch_ns // 1000 == Spark's `ts DIV 1000`)
    "q54_sessionize" ->
      s"""WITH e AS (SELECT event_id, user_id, event_type, epoch_ns(ts) // 1000 AS ts_us FROM events),
         |l AS (SELECT *, lag(ts_us) OVER (PARTITION BY user_id ORDER BY ts_us, event_id) AS prev_us FROM e),
         |n AS (SELECT *, CASE WHEN prev_us IS NULL OR ts_us - prev_us > ${SessionGapSeconds * 1000000L} THEN 1 ELSE 0 END AS new_session FROM l),
         |sess AS (SELECT *, CAST(sum(new_session) OVER (PARTITION BY user_id ORDER BY ts_us, event_id ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_seq FROM n)
         |SELECT user_id, session_seq,
         |  CAST(count(*) AS BIGINT) AS n_events,
         |  min(ts_us) AS start_us, max(ts_us) AS end_us,
         |  max(ts_us) - min(ts_us) AS duration_us,
         |  CAST(count(DISTINCT event_type) AS BIGINT) AS n_event_types
         |FROM sess GROUP BY user_id, session_seq""".stripMargin
  )
}
