package graft.streaming

import scala.collection.immutable.ListMap
import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.Tables

/** Driver-facing streaming queries (SURVEY §2 I1-I3), run through the
  * BATCH side of the unified API — semantics identical to the
  * streaming side (StreamingSpec proves session parity on the real
  * flatMapGroupsWithState path).
  */
object StreamQueries {

  def evWindowed(spark: SparkSession, dir: String): DataFrame =
    Streaming.windowedCounts(Tables.events(spark, dir))

  def evSessions(spark: SparkSession, dir: String): DataFrame =
    Streaming.sessionsBatch(Tables.events(spark, dir))

  def evProps(spark: SparkSession, dir: String): DataFrame =
    Streaming.parseProps(Tables.events(spark, dir))

  def evAttribution(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir)
    Streaming.attributionJoin(
      ev.filter(org.apache.spark.sql.functions.col("event_type") === "click"),
      ev.filter(org.apache.spark.sql.functions.col("event_type") === "purchase"))
  }

  def queries: ListMap[String, (SparkSession, String) => DataFrame] = ListMap(
    "ev_windowed"    -> (evWindowed _),
    "ev_sessions"    -> (evSessions _),
    "ev_props"       -> (evProps _),
    "ev_attribution" -> (evAttribution _),
  )

  def oracleSql: Map[String, String] = Map(
    "ev_windowed" ->
      """SELECT time_bucket(INTERVAL '5 minutes', ts) AS window_start, event_type,
        |  count(*) AS n_events, round(sum(value), 2) AS sum_value
        |FROM events GROUP BY 1, 2""".stripMargin,

    "ev_sessions" ->
      s"""WITH g AS (
         |  SELECT user_id, ts, value,
         |    CASE WHEN epoch(ts) - epoch(lag(ts) OVER (PARTITION BY user_id ORDER BY ts))
         |              > ${Streaming.SessionGapSec}
         |           OR lag(ts) OVER (PARTITION BY user_id ORDER BY ts) IS NULL
         |         THEN 1 ELSE 0 END AS new_s
         |  FROM events
         |), s AS (
         |  SELECT user_id, ts, value,
         |    (sum(new_s) OVER (PARTITION BY user_id ORDER BY ts
         |                      ROWS UNBOUNDED PRECEDING))::bigint AS session_idx
         |  FROM g
         |)
         |SELECT user_id, session_idx, min(ts) AS session_start, max(ts) AS session_end,
         |  count(*) AS n_events, round(sum(value), 2) AS sum_value
         |FROM s GROUP BY user_id, session_idx""".stripMargin,

    "ev_attribution" ->
      """SELECT c.user_id, c.event_id AS click_id, p.event_id AS purchase_id,
        |  c.ts AS click_ts, p.ts AS purchase_ts, p.value
        |FROM events c JOIN events p
        |  ON c.user_id = p.user_id
        | AND p.ts >= c.ts AND p.ts < c.ts + INTERVAL 300 SECONDS
        |WHERE c.event_type = 'click' AND p.event_type = 'purchase'""".stripMargin,

    "ev_props" ->
      """SELECT event_id, user_id, event_type,
        |  CAST(json_extract_string(props, '$.k') AS INTEGER) AS k
        |FROM events
        |WHERE CAST(json_extract_string(props, '$.k') AS INTEGER) >= 50""".stripMargin,
  )
}
