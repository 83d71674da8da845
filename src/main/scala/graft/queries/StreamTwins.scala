package graft.queries

import graft.{Determinism, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DoubleType

/** SURVEY §2.8 — batch twins of the streaming windowed aggregations.
  *
  * Streaming and batch share the same Catalyst plan for `window()` /
  * sessionization, so these oracle-checked twins pin the semantics the
  * streaming pipeline (graft.streaming) runs with watermarks. Oracle
  * mapping: tumbling → `time_bucket`; sliding → 4 shifted 15-min
  * buckets; session → lag+cumsum sessionization (portable SQL).
  */
object StreamTwins {
  import Determinism._

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // Tumbling 1 h window per event_type.
    "q_stream_tumble_twin" -> ((s, d) => {
      import s.implicits._
      Tables.events(s, d)
        .withColumn("ts_ms", tsMs($"ts"))
        .groupBy(window($"ts_ms", "1 hour").as("w"), $"event_type")
        .agg(
          count(lit(1)).as("n"),
          sumd($"value").as("sum_value"))
        .select($"w.start".as("wstart"), $"event_type", $"n", $"sum_value")
        .orderBy($"wstart", $"event_type")
    }),

    // Sliding 1 h window every 15 min.
    "q_stream_slide_twin" -> ((s, d) => {
      import s.implicits._
      Tables.events(s, d)
        .withColumn("ts_ms", tsMs($"ts"))
        .groupBy(window($"ts_ms", "1 hour", "15 minutes").as("w"), $"event_type")
        .agg(
          count(lit(1)).as("n"),
          sumd($"value").as("sum_value"))
        .select($"w.start".as("wstart"), $"event_type", $"n", $"sum_value")
        .orderBy($"wstart", $"event_type")
    }),

    // Session windows (30 min gap) per user via lag+cumsum — the
    // portable twin of streaming session_window (SessionTwinSpec asserts
    // the streaming operator agrees on the same input, including the
    // exactly-at-gap edge: session_window windows are [ts, ts+gap) and
    // merge on touching boundaries, so a new session needs delta > gap
    // STRICTLY).
    "q_stream_session_twin" -> ((s, d) => {
      import s.implicits._
      val wOrd = Window.partitionBy($"user_id").orderBy($"ts_ms", $"event_id")
      val wRun = wOrd.rowsBetween(Window.unboundedPreceding, Window.currentRow)
      Tables.events(s, d)
        .withColumn("ts_ms", tsMs($"ts"))
        .withColumn("ms", msEpoch($"ts"))
        .withColumn("new_session",
          when(lag($"ms", 1).over(wOrd).isNull ||
               ($"ms" - lag($"ms", 1).over(wOrd)) > lit(30L * 60 * 1000), 1)
            .otherwise(0))
        .withColumn("session_id", sum($"new_session").over(wRun))
        .groupBy($"user_id", $"session_id")
        .agg(
          min($"ts_ms").as("session_start"),
          max($"ts_ms").as("session_end"),
          count(lit(1)).as("n_events"),
          sumd($"value").as("sum_value"))
        .orderBy($"user_id", $"session_id")
    })
  )

  private val eCte =
    "WITH e AS (SELECT event_id, user_id, event_type, value, " +
    "date_trunc('milliseconds', ts) AS ts_ms, " +
    "epoch_ms(date_trunc('milliseconds', ts)) AS ms FROM events) "

  val oracle: Map[String, String] = Map(
    "q_stream_tumble_twin" ->
      (eCte + "SELECT time_bucket(INTERVAL '1 hour', ts_ms) AS wstart, event_type, " +
       "COUNT(*) AS n, " + sqlSumd("value") + " AS sum_value " +
       "FROM e GROUP BY wstart, event_type ORDER BY wstart, event_type"),
    "q_stream_slide_twin" ->
      (eCte + ", shifted AS (SELECT e.*, time_bucket(INTERVAL '15 minutes', ts_ms) - INTERVAL 15 MINUTE * j AS wstart " +
       "FROM e CROSS JOIN (VALUES (0),(1),(2),(3)) AS s(j)) " +
       "SELECT wstart, event_type, COUNT(*) AS n, " + sqlSumd("value") + " AS sum_value " +
       "FROM shifted GROUP BY wstart, event_type ORDER BY wstart, event_type"),
    "q_stream_session_twin" ->
      (eCte + ", flagged AS (SELECT e.*, CASE WHEN LAG(ms, 1) OVER w IS NULL " +
       "OR ms - LAG(ms, 1) OVER w > 30 * 60 * 1000 THEN 1 ELSE 0 END AS new_session " +
       "FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ts_ms, event_id)), " +
       "sess AS (SELECT flagged.*, CAST(SUM(new_session) OVER " +
       "(PARTITION BY user_id ORDER BY ts_ms, event_id ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_id " +
       "FROM flagged) " +
       "SELECT user_id, session_id, MIN(ts_ms) AS session_start, MAX(ts_ms) AS session_end, " +
       "COUNT(*) AS n_events, " + sqlSumd("value") + " AS sum_value " +
       "FROM sess GROUP BY user_id, session_id ORDER BY user_id, session_id")
  )
}
