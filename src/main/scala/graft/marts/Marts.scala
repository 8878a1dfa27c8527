package graft.marts

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Mart publishing — reference Stage 4 (SQL:1548-1612): current-only,
  * column-pruned BI projections of the dims plus a passthrough fact
  * view. Kept as pure DataFrame functions so Catalyst inlines them
  * into consumer plans (the Spark analog of SQL Server view inlining,
  * SURVEY §3.2); `Pipeline` optionally materializes them.
  */
object Marts {

  /** Current-version-only projection of an SCD2 dimension
    * (reference SQL:1555-1565). */
  def current(dim: DataFrame, columns: Seq[String]): DataFrame =
    dim.filter(col("is_current") === 1L).select(columns.map(col): _*)

  /** Passthrough fact view (reference SQL:1597-1612): the fact is
    * already surrogate-resolved; marts only prune audit columns. */
  def fact(fact: DataFrame, dropColumns: Seq[String] = Nil): DataFrame =
    fact.drop(dropColumns: _*)

  /** Run-history inspection mart over the ETL run log — the
    * reference's evidence view (README:39-40, Runlogs.png: the run log
    * queried after each load to show per-run row counts and timing).
    * Adds what the raw log makes the reader compute: wall-clock
    * duration, total rows touched, and an `is_latest` flag per run
    * name (window over run_name — the log has one row per load per
    * run, so the partition is trivially small at any corpus scale). */
  def runHistory(log: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val recency = Window.partitionBy(col("run_name"))
      .orderBy(col("started_at").desc, col("ended_at").desc)
    log.select(col("run_name"), col("started_at"), col("ended_at"),
        ((unix_millis(col("ended_at")) - unix_millis(col("started_at")))
          / 1000.0).as("duration_sec"),
        col("rows_inserted"), col("rows_updated"), col("rows_deleted"),
        (col("rows_inserted") + col("rows_updated") + col("rows_deleted"))
          .as("rows_touched"),
        col("status"), col("error_message"))
      .withColumn("is_latest",
        (row_number().over(recency) === 1).cast("long"))
  }
}
