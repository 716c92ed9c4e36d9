package graft.queries

import graft.{QueryDef, Tables}
import graft.streaming.Events
import org.apache.spark.sql.functions._

/** Streaming surface queries (SURVEY.md §2.11). q43 runs a REAL Structured
  * Streaming query (file source → watermark → windowed agg → memory sink,
  * drained synchronously); its oracle is the batch-SQL equivalent of the
  * same tumbling window. q44 is distributed gap-sessionization.
  */
object StreamingQueries {

  val defs: Seq[QueryDef] = Seq(

    QueryDef.sql(
      "q43_stream_windowed",
      """SELECT make_timestamp((epoch_us(ts) // 21600000000) * 21600000000) AS wstart,
        |  event_type, CAST(COUNT(*) AS BIGINT) AS n,
        |  ROUND(SUM(value), 2) AS total_value
        |FROM events GROUP BY wstart, event_type
        |ORDER BY wstart, event_type""".stripMargin) { (s, d) =>
      Events.windowedCountsStreaming(s, d, "6 hours")
        .orderBy(col("wstart"), col("event_type"))
    },

    QueryDef.sql(
      "q44_sessionize",
      """WITH marked AS (
        |  SELECT user_id, event_id, ts,
        |    CASE WHEN lag(epoch_us(ts)) OVER w IS NULL
        |           OR epoch_us(ts) - lag(epoch_us(ts)) OVER w > 1800000000
        |         THEN 1 ELSE 0 END AS new_sess
        |  FROM events
        |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
        |sess AS (
        |  SELECT user_id, event_id,
        |    SUM(new_sess) OVER (PARTITION BY user_id ORDER BY ts, event_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sess_id
        |  FROM marked)
        |SELECT user_id, CAST(MAX(sess_id) AS BIGINT) AS n_sessions,
        |  CAST(COUNT(*) AS BIGINT) AS n_events
        |FROM sess GROUP BY user_id ORDER BY user_id""".stripMargin) { (s, d) =>
      Events.sessionizeBatch(Tables.events(s, d), gapMinutes = 30)
        .groupBy(col("user_id"))
        .agg(max(col("sess_id")).as("n_sessions"), count(lit(1)).as("n_events"))
        .orderBy(col("user_id"))
    }
  )
}
