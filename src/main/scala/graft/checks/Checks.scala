package graft.checks

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Validation suite — reference Stage 5/X (SQL:1616-1839). The
  * reference's hard constraints (PK/FK/unique indexes, SQL:536-565)
  * are unenforceable on Parquet, so — exactly as its author frames at
  * SQL:1747-1750 — they become "soft refs with checks": each invariant
  * is a DataFrame that must come back empty (SURVEY §5).
  */
object Checks {

  /** Duplicate detection (reference SQL:1642-1650 etc.):
    * GROUP BY key HAVING COUNT(*) > 1. */
  def duplicates(df: DataFrame, key: Seq[String]): DataFrame =
    df.groupBy(key.map(col): _*).count().filter(col("count") > 1)

  /** At most one current row per natural key (reference SQL:1658-1663). */
  def multipleCurrent(dim: DataFrame, nk: String): DataFrame =
    duplicates(dim.filter(col("is_current") === 1L), Seq(nk))

  /** No NULL validity bounds (reference SQL:1664-1667). */
  def nullValidity(dim: DataFrame): DataFrame =
    dim.filter(col("active_from").isNull || col("active_to").isNull)

  /** No overlapping SCD2 intervals per key (reference SQL:1668-1683
    * self theta-join). The windowed `lead` formulation is equivalent
    * and one shuffle cheaper (SURVEY §2.C9); the self-join form is in
    * [[overlappingPairs]] for the declared query surface. */
  def overlaps(dim: DataFrame, nk: String): DataFrame = {
    val w = Window.partitionBy(col(nk)).orderBy(col("active_from").asc)
    dim.withColumn("__next_from", lead(col("active_from"), 1).over(w))
      .filter(col("__next_from").isNotNull &&
        col("active_to") > col("__next_from"))
      .drop("__next_from")
  }

  /** Self theta-join overlap detection over arbitrary intervals —
    * the reference's literal formulation (SQL:1677-1683). */
  def overlappingPairs(iv: DataFrame, key: String, id: String,
                       from: String, to: String): DataFrame = {
    val a = iv.select(col(key), col(id).as("id1"),
      col(from).as("f1"), col(to).as("t1"))
    val b = iv.select(col(key).as("__k2"), col(id).as("id2"),
      col(from).as("f2"), col(to).as("t2"))
    a.join(b, col(key) === col("__k2") && col("id1") < col("id2") &&
        col("f1") < col("t2") && col("f2") < col("t1"))
      .select(col(key), col("id1"), col("id2"))
  }

  /** Soft referential integrity (reference SQL:1746-1783): fact rows
    * whose dim key resolves to nothing. Returns the FULL violation
    * set; callers wanting the reference's `TOP 100` listing apply
    * their own deterministic `orderBy(...).limit(n)` (a cap applied
    * here, before the caller's sort, would pick arbitrary rows). */
  def refIntegrityViolations(fact: DataFrame, dim: DataFrame,
                             factKey: Column, dimKey: Column): DataFrame =
    fact.join(dim, factKey === dimKey, "left")
      .filter(dimKey.isNull)

  /** Source↔DW reconciliation (reference Stage X, SQL:1814-1839). */
  def reconcile(source: DataFrame, dw: DataFrame, sourceSum: Column,
                dwSum: Column): DataFrame = {
    val s = source.agg(count(lit(1)).as("src_rows"), sourceSum.as("src_sum"))
    val d = dw.agg(count(lit(1)).as("dw_rows"), dwSum.as("dw_sum"))
    s.crossJoin(d)
  }
}
