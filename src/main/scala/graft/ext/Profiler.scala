package graft.ext

import org.apache.spark.sql.{DataFrame, Column}
import org.apache.spark.sql.functions._

/** One-pass column profiler — the deequ/"ANALYZE TABLE"-shaped data
  * quality summary a warehouse publishes next to every load: per
  * column, the null count, the EXACT distinct count, and the row
  * count, as rows (so downstream checks can join/alert on them).
  *
  * Shape: the columns are stacked into (col_name, value-as-string)
  * pairs with one `explode` projection — a width-fold row expansion
  * that collapses immediately into the partial hash aggregate on
  * (col_name, value), so the shuffle carries only per-partition
  * distinct values per column, never the expanded rows. A second
  * (col_name)-keyed aggregate folds the value groups into the three
  * stats. Exactly two shuffles for ANY number of columns — versus the
  * naive `count(distinct a), count(distinct b), ...` single-agg plan,
  * which Catalyst expands into a #cols-fold row multiplication that
  * must SHUFFLE the multiplied rows (distinct aggregates cannot
  * partial-aggregate together).
  *
  * The string cast is for stacking heterogeneous types only; it is
  * injective per column on every fixture type (Java's Double/
  * Timestamp renderings are value-unique), so distinct counts equal
  * distinct counts of the raw values. Exact distinct at 100 TB
  * deliberately pays one |distinct-values| shuffle — the sketch
  * alternative is the declared `approx_distinct` surface.
  */
object Profiler {

  def profileStats(df: DataFrame, cols: Seq[String]): DataFrame = {
    val stacked = df.select(explode(array(cols.map(c =>
        struct(lit(c).as("col_name"), col(c).cast("string").as("__v"))): _*))
        .as("__s"))
      .select(col("__s.col_name").as("col_name"), col("__s.__v").as("__v"))
    stacked.groupBy(col("col_name"), col("__v"))
      .agg(count(lit(1)).as("__n"))
      .groupBy(col("col_name"))
      .agg(
        sum(when(col("__v").isNull, col("__n")).otherwise(lit(0L)))
          .cast("long").as("n_null"),
        count(when(col("__v").isNotNull, lit(1))).cast("long")
          .as("n_distinct"),
        sum(col("__n")).cast("long").as("n_rows"))
  }

  /** DuckDB twin of [[profileStats]]: one SELECT per column. */
  def profileStatsOracleSql(table: String, cols: Seq[String]): String =
    cols.map { c =>
      s"""SELECT '$c' AS col_name,
         |  CAST(count(*) - count($c) AS BIGINT) AS n_null,
         |  CAST(count(DISTINCT $c) AS BIGINT) AS n_distinct,
         |  CAST(count(*) AS BIGINT) AS n_rows FROM $table""".stripMargin
    }.mkString("", "\nUNION ALL\n", "\nORDER BY col_name")
}
