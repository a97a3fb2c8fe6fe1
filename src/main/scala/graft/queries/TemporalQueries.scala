package graft.queries

import graft.Tables
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import Qutil._

/** SURVEY §2.9 — temporal / sessionization over `events` (the batch face of
  * the Airflow micro-batch cadence, /root/reference/README.md:9). The same
  * window/session_window/dropDuplicates dialect runs unchanged on a
  * Structured Streaming source (see graft.streaming + StreamingSpec). */
object TemporalQueries {

  val queries: Map[String, Q] = Map(
    // 1-hour tumbling windows per event type.
    "ts_tumbling" -> ((s, d) =>
      Tables.events(s, d)
        .groupBy(window(col("ts"), "1 hour"), col("event_type"))
        .agg(count(lit(1)).as("n"), sumDec2(col("value")).as("sum_value"))
        .select(col("window.start").as("wstart"), col("event_type"),
          col("n"), col("sum_value"))
        .orderBy("wstart", "event_type")),

    // 1-hour windows sliding every 15 min (each event lands in 4 windows).
    "ts_sliding" -> ((s, d) =>
      Tables.events(s, d)
        .groupBy(window(col("ts"), "1 hour", "15 minutes"))
        .agg(count(lit(1)).as("n"))
        .select(col("window.start").as("wstart"), col("n"))
        .orderBy("wstart")),

    // Session windows per user, 30-minute gap. Spark semantics: a session is
    // [first_ts, last_ts + gap); an event at exactly prev_ts+gap starts a
    // NEW session — the oracle's gaps-and-islands SQL uses `>= gap`.
    "ts_session" -> ((s, d) =>
      Tables.events(s, d)
        .groupBy(col("user_id"), session_window(col("ts"), "30 minutes"))
        .agg(count(lit(1)).as("n_events"), sumDec2(col("value")).as("sum_value"))
        .select(col("user_id"), col("session_window.start").as("sess_start"),
          col("session_window.end").as("sess_end"), col("n_events"), col("sum_value"))
        .orderBy("user_id", "sess_start")),

    // CDC "last write wins": latest event per (user, type) — the Salesforce
    // upsert-compaction the reference's migration performs per object.
    "ts_dedup_latest" -> ((s, d) => {
      val w = Window.partitionBy("user_id", "event_type")
        .orderBy(col("ts").desc, col("event_id").desc)
      Tables.events(s, d)
        .withColumn("rn", row_number().over(w))
        .where(col("rn") === 1)
        .select("user_id", "event_type", "event_id", "ts", "value")
        .orderBy("user_id", "event_type")
    })
  )

  val oracle: Map[String, String] = Map(
    "ts_tumbling" ->
      ("SELECT date_trunc('hour', ts) AS wstart, event_type, COUNT(*) AS n, " +
       "CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value " +
       "FROM events GROUP BY 1,2 ORDER BY 1,2"),
    "ts_sliding" ->
      ("SELECT wstart, COUNT(*) AS n FROM (" +
       "SELECT time_bucket(INTERVAL '15 minutes', ts) - (k * INTERVAL '15 minutes') AS wstart " +
       "FROM events CROSS JOIN (SELECT unnest([0,1,2,3]) AS k)" +
       ") GROUP BY 1 ORDER BY 1"),
    "ts_session" ->
      ("WITH marked AS (SELECT user_id, ts, value, " +
       "CASE WHEN lag(ts) OVER w IS NULL OR ts - lag(ts) OVER w >= INTERVAL 30 MINUTE THEN 1 ELSE 0 END AS ns " +
       "FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts)), " +
       "sess AS (SELECT *, SUM(ns) OVER (PARTITION BY user_id ORDER BY ts ROWS UNBOUNDED PRECEDING) AS sid FROM marked) " +
       "SELECT user_id, MIN(ts) AS sess_start, MAX(ts) + INTERVAL 30 MINUTE AS sess_end, " +
       "COUNT(*) AS n_events, CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value " +
       "FROM sess GROUP BY user_id, sid ORDER BY user_id, sess_start"),
    "ts_dedup_latest" ->
      ("SELECT user_id, event_type, event_id, ts, value FROM " +
       "(SELECT *, row_number() OVER (PARTITION BY user_id, event_type ORDER BY ts DESC, event_id DESC) AS rn " +
       "FROM events) WHERE rn = 1 ORDER BY user_id, event_type")
  )
}
