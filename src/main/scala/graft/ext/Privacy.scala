package graft.ext

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

import graft.functions.Hashing

/** Privacy primitives for training-data pipelines (extension surface,
  * SURVEY §7.6): deterministic masking, pseudonymization, and
  * generalization — the standard pre-release scrub pass a corpus goes
  * through before leaving the warehouse. No reference analog; the
  * operations are the public k-anonymity / pseudonymization textbook
  * set expressed as pure column expressions (whole-stage codegen, no
  * UDFs, stateless — a projection even at 100 TB).
  *
  * All three are DETERMINISTIC on purpose: the same input always maps
  * to the same output, so a scrubbed corpus is reproducible, joins on
  * pseudonyms still work across tables, and re-runs are idempotent.
  * (True randomized anonymization would break the oracle and the
  * idempotence contract both.)
  */
object Privacy {

  /** Masking: every digit replaced by `mask` — removes numeric
    * identifiers (account numbers, phone digits) while preserving the
    * field shape for downstream format checks. */
  def maskDigits(c: Column, mask: String = "#"): Column =
    regexp_replace(c, "[0-9]", mask)

  /** DuckDB twin of [[maskDigits]] ('g' = replace all, matching
    * Spark's regexp_replace default). */
  def maskDigitsSql(c: String, mask: String = "#"): String =
    s"regexp_replace($c, '[0-9]', '$mask', 'g')"

  /** Pseudonymization: engine-portable polynomial hash of the value —
    * a stable int64 token that joins like the original value but
    * reveals nothing (beyond equality) about it. Same hash family as
    * the dedup/split pipelines ([[graft.functions.Hashing.polyHash]]),
    * so the token space is consistent across the whole library. */
  def pseudonym(c: Column): Column = Hashing.polyHash(c)

  def pseudonymSql(c: String): String = Hashing.polyHashSql(c)

  /** Generalization: numeric value floored to a bucket of `width` —
    * the k-anonymity "coarsen until groups are large" primitive for
    * continuous attributes. Input is cast to double first so the
    * division semantics are identical on both engines regardless of
    * the stored type. */
  def bucketize(c: Column, width: Long): Column =
    (floor(c.cast("double") / width) * width).cast("long")

  def bucketizeSql(c: String, width: Long): String =
    s"CAST(floor(CAST($c AS DOUBLE) / $width) * $width AS BIGINT)"

  /** k-anonymity audit over a quasi-identifier tuple: the group-size
    * histogram of the QI partition plus which sizes violate k — the
    * release gate that says whether [[bucketize]]/[[maskDigits]]
    * generalized ENOUGH. A row whose QI combination is shared by
    * fewer than k individuals is re-identifiable by linkage; the
    * histogram form (size → how many groups / rows) is what the
    * privacy officer actually reads, and it is |distinct sizes|-
    * bounded regardless of table size. Two hash aggregates — QI
    * partition sizes, then the size histogram. */
  def kAnonymity(df: org.apache.spark.sql.DataFrame,
                 quasiIds: Seq[Column], k: Long): org.apache.spark.sql.DataFrame =
    df.groupBy(quasiIds: _*)
      .agg(count(lit(1)).as("group_size"))
      .groupBy(col("group_size"))
      .agg(count(lit(1)).cast("long").as("n_groups"),
        (count(lit(1)) * col("group_size")).cast("long").as("n_rows"))
      .select(col("group_size").cast("long").as("group_size"),
        col("n_groups"), col("n_rows"),
        when(col("group_size") < k, lit(1L)).otherwise(lit(0L))
          .as("violates_k"))

  /** DuckDB twin of [[kAnonymity]] for `qiExprs` over `table`. */
  def kAnonymityOracleSql(table: String, qiExprs: Seq[String],
                          k: Long): String =
    s"""
    |WITH groups AS (
    |  SELECT ${qiExprs.mkString(", ")}, count(*) AS group_size
    |  FROM $table GROUP BY ${(1 to qiExprs.size).mkString(", ")})
    |SELECT CAST(group_size AS BIGINT) AS group_size,
    |  CAST(count(*) AS BIGINT) AS n_groups,
    |  CAST(count(*) * group_size AS BIGINT) AS n_rows,
    |  CAST(CASE WHEN group_size < $k THEN 1 ELSE 0 END AS BIGINT)
    |    AS violates_k
    |FROM groups GROUP BY group_size
    |ORDER BY group_size
    |""".stripMargin.trim
}
