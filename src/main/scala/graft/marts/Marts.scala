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
}
