package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-resistant aggregation (extension surface; 100 TB posture).
  *
  * A plain `groupBy(key)` sends every row of a hot key to one reducer.
  * Salting splits each key into `buckets` sub-groups, partially
  * aggregates per (key, salt) — spreading the hot key over `buckets`
  * reducers — then re-aggregates per key. The result is exactly the
  * plain groupBy's (sums/counts are associative); only the shuffle
  * shape changes. AQE's skew handling covers joins; this covers
  * aggregations whose partial state is small.
  *
  * The salt here is deterministic (`pmod` of a row column) so the
  * declared query is oracle-checkable; at scale any cheap per-row
  * value works — the salt never appears in the result.
  */
object Skew {

  /** sum/count per key, two-phase over a deterministic salt column.
    * Emits (key..., sum_<col>, n_rows) exactly like
    * `df.groupBy(keys).agg(sum, count)`. */
  def saltedSumCount(df: DataFrame, keys: Seq[String], value: Column,
                     saltSource: Column, buckets: Int): DataFrame = {
    val salted = df.withColumn("__salt", pmod(saltSource, lit(buckets)))
    val partial = salted
      .groupBy((keys :+ "__salt").map(col): _*)
      .agg(sum(value).as("__psum"), count(lit(1)).as("__pcnt"))
    partial.groupBy(keys.map(col): _*)
      .agg(sum(col("__psum")).as("sum_value"),
        sum(col("__pcnt")).as("n_rows"))
  }
}
