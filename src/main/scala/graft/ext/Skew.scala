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
    * Emits (key..., sum_value, n_rows). Exactness precondition: the
    * value must be integral or decimal — sum-of-partial-sums is only
    * identical to the plain groupBy when addition is associative, and
    * IEEE float addition is not (callers pre-cast, e.g. the declared
    * salted_agg casts to decimal(14,4)). Note also that decimal
    * re-aggregation widens the result precision relative to the
    * one-phase sum — compare values, not schemas. */
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
