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
}
