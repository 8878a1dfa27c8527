package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Sessionization over an event stream (extension surface, SURVEY
  * §7.6): a session is a run of events per user with gaps below a
  * threshold. Batch formulation: lag-gap flag → running sum = session
  * number → aggregate. One shuffle on user_id (both windows and the
  * final groupBy share the partitioning, so Catalyst plans a single
  * exchange).
  *
  * Gap arithmetic is done in exact integer microseconds
  * (`unix_micros` / DuckDB `epoch_us`) so the oracle agrees.
  */
object Sessions {

  def sessionize(events: DataFrame, userCol: String, tsCol: String,
                 gapSeconds: Long, tiebreak: Seq[String] = Nil): DataFrame = {
    val order = (col(tsCol).asc +: tiebreak.map(col(_).asc))
    val w = Window.partitionBy(col(userCol)).orderBy(order: _*)
    val micros = unix_micros(col(tsCol).cast("timestamp"))
    val prevTs = lag(micros, 1).over(w)
    val newSession = when(prevTs.isNull ||
      micros - prevTs > gapSeconds * 1000000L, 1L)
      .otherwise(0L)
    events
      .withColumn("__new", newSession)
      .withColumn("session_num",
        sum(col("__new")).over(w.rowsBetween(Window.unboundedPreceding, 0)))
      .drop("__new")
  }

  /** Per-session rollup used by the declared query. */
  def sessionStats(events: DataFrame, userCol: String, tsCol: String,
                   valueCol: String, gapSeconds: Long,
                   tiebreak: Seq[String] = Nil): DataFrame =
    sessionize(events, userCol, tsCol, gapSeconds, tiebreak)
      .groupBy(col(userCol), col("session_num"))
      .agg(count(lit(1)).as("n_events"),
        min(col(tsCol)).as("session_start"),
        max(col(tsCol)).as("session_end"),
        sum(col(valueCol).cast("decimal(12,2)")).cast("decimal(18,2)")
          .cast("double").as("total_value"))

  def sessionStatsOracleSql(gapSeconds: Long): String =
    s"""
    |WITH flagged AS (
    |  SELECT user_id, event_id, ts, value,
    |    CASE WHEN lag(epoch_us(ts)) OVER w IS NULL
    |           OR epoch_us(ts) - lag(epoch_us(ts)) OVER w > ${gapSeconds * 1000000L}
    |         THEN 1 ELSE 0 END AS new_sess
    |  FROM events
    |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
    |sess AS (
    |  SELECT *, sum(new_sess) OVER (PARTITION BY user_id ORDER BY ts, event_id
    |    ROWS UNBOUNDED PRECEDING) AS session_num
    |  FROM flagged)
    |SELECT user_id, CAST(session_num AS BIGINT) AS session_num,
    |  count(*) AS n_events, min(ts) AS session_start, max(ts) AS session_end,
    |  CAST(CAST(sum(CAST(value AS DECIMAL(12,2))) AS DECIMAL(18,2)) AS DOUBLE) AS total_value
    |FROM sess GROUP BY 1, 2
    |ORDER BY user_id, session_num
    |""".stripMargin.trim
}
