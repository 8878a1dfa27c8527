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

  /** ℓ-diversity audit (Machanavajjhala et al. 2006 — public): the
    * companion gate [[kAnonymity]] cannot express. A QI group can be
    * large (k-anonymous) yet still leak if every member shares the
    * SAME sensitive value — group size bounds LINKAGE, diversity
    * bounds ATTRIBUTE disclosure. Per QI group count the DISTINCT
    * sensitive values, then histogram by that diversity: (diversity →
    * n_groups, n_rows, violates_l). Distinct-ℓ (not entropy-ℓ) on
    * purpose: exact integers, no transcendentals, same answer on both
    * engines. Three hash aggs — (QI, sensitive) dedup, QI group
    * fold, diversity histogram — each map-side combining; output is
    * |distinct diversities|-bounded regardless of table size. */
  def lDiversity(df: org.apache.spark.sql.DataFrame, quasiIds: Seq[Column],
                 sensitive: Column, l: Long): org.apache.spark.sql.DataFrame =
    df.select((quasiIds.zipWithIndex.map { case (q, i) => q.as(s"q$i") } :+
        sensitive.as("sv")): _*)
      .groupBy(quasiIds.indices.map(i => col(s"q$i")): _*)
      .agg(countDistinct(col("sv")).as("diversity"),
        count(lit(1)).as("n_in_group"))
      .groupBy(col("diversity"))
      .agg(count(lit(1)).cast("long").as("n_groups"),
        sum(col("n_in_group")).cast("long").as("n_rows"))
      .select(col("diversity").cast("long").as("diversity"),
        col("n_groups"), col("n_rows"),
        when(col("diversity") < l, lit(1L)).otherwise(lit(0L))
          .as("violates_l"))

  /** DuckDB twin of [[lDiversity]] for `qiExprs`/`sensitiveExpr`
    * over `table`. */
  def lDiversityOracleSql(table: String, qiExprs: Seq[String],
                          sensitiveExpr: String, l: Long): String =
    s"""
    |WITH groups AS (
    |  SELECT ${qiExprs.mkString(", ")},
    |    count(DISTINCT $sensitiveExpr) AS diversity,
    |    count(*) AS n_in_group
    |  FROM $table GROUP BY ${(1 to qiExprs.size).mkString(", ")})
    |SELECT CAST(diversity AS BIGINT) AS diversity,
    |  CAST(count(*) AS BIGINT) AS n_groups,
    |  CAST(sum(n_in_group) AS BIGINT) AS n_rows,
    |  CAST(CASE WHEN diversity < $l THEN 1 ELSE 0 END AS BIGINT)
    |    AS violates_l
    |FROM groups GROUP BY diversity
    |ORDER BY diversity
    |""".stripMargin.trim

  /** Small-group suppression for published rollups: groups under the
    * disclosure floor `k` are not dropped (their mass would vanish
    * from the totals) and not published (their key is identifying) —
    * they are MERGED into one '(suppressed)' residual row. The
    * standard statistical-disclosure-control move for any externally
    * shared aggregate. Two hash aggs (the rollup, then the residual
    * fold); totals are conserved by construction (the spec pins
    * Σ published = Σ raw). Counts and cent-exact sums only. */
  def suppressedRollup(df: org.apache.spark.sql.DataFrame,
                       keys: Seq[Column], amount: Column,
                       k: Long): org.apache.spark.sql.DataFrame = {
    val rolled = df.select((keys.zipWithIndex.map { case (c, i) =>
        c.cast("string").as(s"g$i") } :+
        amount.cast("decimal(14,2)").as("amt")): _*)
      .groupBy(keys.indices.map(i => col(s"g$i")): _*)
      .agg(count(lit(1)).as("n"),
        (sum(col("amt")) * 100).cast("long").as("total_cents"))
    val big = rolled.filter(col("n") >= k)
      .select((keys.indices.map(i => col(s"g$i")) :+
        col("n").cast("long").as("n_rows") :+ col("total_cents") :+
        lit(0L).as("is_suppressed")): _*)
    val small = rolled.filter(col("n") < k)
      .agg(sum(col("n")).as("n"), sum(col("total_cents")).as("tc"),
        count(lit(1)).as("n_groups"))
      .filter(col("n_groups") > 0)
      .select((keys.indices.map(i => lit("(suppressed)").as(s"g$i")) :+
        col("n").cast("long").as("n_rows") :+
        col("tc").cast("long").as("total_cents") :+
        lit(1L).as("is_suppressed")): _*)
    big.unionAll(small)
      .orderBy(col("is_suppressed") +:
        keys.indices.map(i => col(s"g$i")): _*)
  }

  /** DuckDB twin of [[suppressedRollup]] for `keyExprs`/`amountExpr`
    * over `table`. */
  def suppressedRollupOracleSql(table: String, keyExprs: Seq[String],
                                amountExpr: String, k: Long): String = {
    val gs = keyExprs.indices.map(i => s"g$i")
    s"""
    |WITH rolled AS (
    |  SELECT ${keyExprs.zipWithIndex.map { case (e, i) =>
        s"CAST($e AS VARCHAR) AS g$i" }.mkString(", ")},
    |    count(*) AS n,
    |    CAST(sum(CAST($amountExpr AS DECIMAL(14,2))) * 100 AS BIGINT)
    |      AS total_cents
    |  FROM $table GROUP BY ${(1 to keyExprs.size).mkString(", ")})
    |SELECT ${gs.mkString(", ")}, CAST(n AS BIGINT) AS n_rows,
    |  total_cents, CAST(0 AS BIGINT) AS is_suppressed
    |FROM rolled WHERE n >= $k
    |UNION ALL
    |SELECT ${gs.map(_ => "'(suppressed)'").mkString(", ")},
    |  CAST(sum(n) AS BIGINT), CAST(sum(total_cents) AS BIGINT),
    |  CAST(1 AS BIGINT)
    |FROM rolled WHERE n < $k
    |HAVING count(*) > 0
    |ORDER BY is_suppressed, ${gs.mkString(", ")}
    |""".stripMargin.trim
  }

  /** t-closeness audit (Li/Li/Venkatasubramanian 2007 — public) for
    * an ORDERED sensitive attribute: even an ℓ-diverse group leaks if
    * its sensitive DISTRIBUTION skews far from the table's (all
    * salaries in the group are "some high value" — diverse, yet
    * disclosing). Per group, the Earth Mover's Distance between the
    * group's banded sensitive distribution and the global one; for
    * ordered 1-D bands EMD has the closed form
    * Σ_b |cumP(b) − cumQ(b)| / (m−1) — prefix sums, no LP solver.
    *
    * Exact integer ppm throughout: cumulative COUNTS are folded
    * first, each cum count scaled by 10⁶ and integer-divided by its
    * total, so both engines round identically. The band grid is
    * densified (groups × bands cross join — both aggregate-bounded,
    * broadcast) because a band ABSENT from a group still contributes
    * |0 − cumQ| mass; skipping it would understate the distance.
    * Three hash aggs over the table, then windows over the
    * |groups|·|bands| grid. */
  def tCloseness(df: org.apache.spark.sql.DataFrame, group: Column,
                 sensitiveBand: Column, tPpm: Long): org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val base = df.select(group.as("g"), sensitiveBand.cast("long").as("b"))
    val gb = base.groupBy("g", "b").agg(count(lit(1)).as("n_gb"))
    val gTot = base.groupBy("g").agg(count(lit(1)).as("n_g"))
    val wAll = Window.partitionBy()
    val wCumB = Window.orderBy(col("b"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val bTot = base.groupBy("b").agg(count(lit(1)).as("n_b"))
      .withColumn("cum_nb", sum(col("n_b")).over(wCumB))
      .withColumn("n_total", sum(col("n_b")).over(wAll))
      .withColumn("m", count(lit(1)).over(wAll))
    val wCumGb = Window.partitionBy(col("g")).orderBy(col("b"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val grid = gTot.crossJoin(bTot)
      .join(gb, Seq("g", "b"), "left")
      .withColumn("cum_gb",
        sum(coalesce(col("n_gb"), lit(0L))).over(wCumGb))
    grid
      .select(col("g"), col("n_g"), col("m"),
        abs(expr("cum_gb * 1000000 div n_g") -
          expr("cum_nb * 1000000 div n_total")).as("__cd"))
      .groupBy("g")
      .agg(first(col("n_g")).as("n_rows"), first(col("m")).as("__m"),
        sum(col("__cd")).as("__sum"))
      .select(col("g"), col("n_rows").cast("long").as("n_rows"),
        when(col("__m") > 1, expr("__sum div (__m - 1)"))
          .otherwise(lit(0L)).cast("long").as("emd_ppm"))
      .withColumn("violates_t",
        when(col("emd_ppm") > tPpm, lit(1L)).otherwise(lit(0L)))
      .orderBy("g")
  }

  /** DuckDB twin of [[tCloseness]] for `groupExpr`/`bandExpr` over
    * `table`. */
  def tClosenessOracleSql(table: String, groupExpr: String,
                          bandExpr: String, tPpm: Long): String =
    s"""
    |WITH base AS (
    |  SELECT $groupExpr AS g, CAST($bandExpr AS BIGINT) AS b
    |  FROM $table),
    |gb AS (SELECT g, b, count(*) AS n_gb FROM base GROUP BY g, b),
    |gt AS (SELECT g, count(*) AS n_g FROM base GROUP BY g),
    |bt AS (
    |  SELECT b, count(*) AS n_b,
    |    sum(count(*)) OVER (ORDER BY b
    |      ROWS UNBOUNDED PRECEDING) AS cum_nb,
    |    sum(count(*)) OVER () AS n_total,
    |    count(*) OVER () AS m
    |  FROM base GROUP BY b),
    |grid AS (
    |  SELECT gt.g, gt.n_g, bt.b, bt.cum_nb, bt.n_total, bt.m,
    |    sum(coalesce(gb.n_gb, 0)) OVER (PARTITION BY gt.g ORDER BY bt.b
    |      ROWS UNBOUNDED PRECEDING) AS cum_gb
    |  FROM gt CROSS JOIN bt
    |  LEFT JOIN gb ON gb.g = gt.g AND gb.b = bt.b)
    |SELECT g, CAST(any_value(n_g) AS BIGINT) AS n_rows,
    |  CAST(CASE WHEN any_value(m) > 1 THEN
    |    sum(abs(cum_gb * 1000000 // n_g - cum_nb * 1000000 // n_total))
    |      // (any_value(m) - 1)
    |    ELSE 0 END AS BIGINT) AS emd_ppm,
    |  CAST(CASE WHEN (CASE WHEN any_value(m) > 1 THEN
    |    sum(abs(cum_gb * 1000000 // n_g - cum_nb * 1000000 // n_total))
    |      // (any_value(m) - 1) ELSE 0 END) > $tPpm
    |    THEN 1 ELSE 0 END AS BIGINT) AS violates_t
    |FROM grid GROUP BY g ORDER BY g
    |""".stripMargin.trim
}
