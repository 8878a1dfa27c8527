package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.ZOrder

/** Data-layout effectiveness audit — the quantified answer to "should
  * this table be z-ordered?". Zone-map (file min/max) skipping is how
  * a 100 TB scan with a selective 2-D predicate avoids reading 100 TB:
  * the planner drops every file whose [min,max] envelope misses the
  * predicate box. How MANY files it can drop is purely a property of
  * the layout, and this operator measures it ahead of a rewrite, on
  * the live table, as a plain query: simulate files of `rowsPerFile`
  * rows under (a) the natural time-append order and (b) the z-order
  * curve, build each file's min/max zone map, and count files/rows a
  * zone-map scan must touch for one representative box predicate.
  *
  * Time-append layouts prune the time dimension only — a customer-key
  * range touches nearly every file; the Morton interleave bounds BOTH
  * dimensions per file, which is the entire case for "OPTIMIZE ZORDER
  * BY" and why the two summary rows this emits usually differ by an
  * order of magnitude.
  *
  * Scale shape: the file assignment is a global ROW NUMBER under each
  * layout order, computed as the two-phase range-partitioned cumsum
  * ([[Profiler.globalCumsum]] — never a single-task window); zone maps
  * are one hash aggregate per layout on the simulated file id. Rows
  * scanned/matched are exact integers; nothing floats.
  */
object Layout {

  /** Zone-map skip audit over `orders` for the 2-D box
    * custkey ∈ [cLo, cHi] × orderdate ∈ [dLo, dHi].
    * Output: one row per layout — (layout, n_files, files_scanned,
    * rows_scanned, rows_matching). */
  def layoutSkipping(orders: DataFrame, rowsPerFile: Int,
                     cLo: Long, cHi: Long,
                     dLo: String, dHi: String,
                     bits: Int = 16): DataFrame = {
    val epoch = to_date(lit("1970-01-01"))
    val base = orders.select(
        col("o_orderkey").cast("long").as("o_orderkey"),
        col("o_custkey").cast("long").as("ck"),
        datediff(to_date(col("o_orderdate")), epoch).cast("long").as("day"))
      .withColumn("zv", ZOrder.zValue(col("ck"), col("day"), bits))
    val dayLo = datediff(to_date(lit(dLo)), epoch).cast("long")
    val dayHi = datediff(to_date(lit(dHi)), epoch).cast("long")

    def audit(label: String, order: Seq[Column]): DataFrame = {
      val ranked = Profiler.globalCumsum(base, order, lit(1L), "rk")
      val zones = ranked
        .withColumn("fid", expr(s"(rk - 1) div $rowsPerFile"))
        .groupBy("fid")
        .agg(min("ck").as("ck_lo"), max("ck").as("ck_hi"),
          min("day").as("d_lo"), max("day").as("d_hi"),
          count(lit(1)).as("n"))
      val scanned = col("ck_hi") >= cLo && col("ck_lo") <= cHi &&
        col("d_hi") >= dayLo && col("d_lo") <= dayHi
      zones.agg(
          count(lit(1)).cast("long").as("n_files"),
          sum(when(scanned, 1L).otherwise(0L)).cast("long")
            .as("files_scanned"),
          sum(when(scanned, col("n")).otherwise(0L)).cast("long")
            .as("rows_scanned"))
        .select(lit(label).as("layout"), col("n_files"),
          col("files_scanned"), col("rows_scanned"))
    }

    val matching = base.agg(count(when(
        col("ck") >= cLo && col("ck") <= cHi &&
          col("day") >= dayLo && col("day") <= dayHi, lit(1)))
      .cast("long").as("rows_matching"))

    audit("natural", Seq(col("day").asc, col("o_orderkey").asc))
      .union(audit("zorder", Seq(col("zv").asc, col("o_orderkey").asc)))
      .crossJoin(broadcast(matching))
      .select("layout", "n_files", "files_scanned", "rows_scanned",
        "rows_matching")
  }

  /** DuckDB twin of [[layoutSkipping]] over `orders`. */
  def layoutSkippingOracleSql(rowsPerFile: Int, cLo: Long, cHi: Long,
                              dLo: String, dHi: String,
                              bits: Int = 16): String = {
    val dayExpr = "date_diff('day', DATE '1970-01-01', CAST(o_orderdate AS DATE))"
    val zv = ZOrder.zValueSql("o_custkey", dayExpr, bits)
    val dayLo = s"date_diff('day', DATE '1970-01-01', DATE '$dLo')"
    val dayHi = s"date_diff('day', DATE '1970-01-01', DATE '$dHi')"
    def auditSql(label: String, orderBy: String): String =
      s"""SELECT '$label' AS layout,
      |  CAST(count(*) AS BIGINT) AS n_files,
      |  CAST(sum(CASE WHEN scanned THEN 1 ELSE 0 END) AS BIGINT)
      |    AS files_scanned,
      |  CAST(sum(CASE WHEN scanned THEN n ELSE 0 END) AS BIGINT)
      |    AS rows_scanned
      |FROM (
      |  SELECT fid, count(*) AS n,
      |    max(ck) >= $cLo AND min(ck) <= $cHi
      |      AND max(day) >= $dayLo AND min(day) <= $dayHi AS scanned
      |  FROM (SELECT *, (row_number() OVER (ORDER BY $orderBy) - 1)
      |          // $rowsPerFile AS fid
      |        FROM base)
      |  GROUP BY fid)""".stripMargin
    s"""
    |WITH base AS (
    |  SELECT o_orderkey, CAST(o_custkey AS BIGINT) AS ck,
    |    CAST($dayExpr AS BIGINT) AS day, $zv AS zv
    |  FROM orders),
    |m AS (
    |  SELECT CAST(count(*) AS BIGINT) AS rows_matching FROM base
    |  WHERE ck BETWEEN $cLo AND $cHi
    |    AND day BETWEEN $dayLo AND $dayHi),
    |audits AS (
    |${auditSql("natural", "day, o_orderkey")}
    |UNION ALL
    |${auditSql("zorder", "zv, o_orderkey")})
    |SELECT layout, n_files, files_scanned, rows_scanned, rows_matching
    |FROM audits CROSS JOIN m
    |ORDER BY layout
    |""".stripMargin.trim
  }

  /** Estimated bytes per lineitem row: 16 columns, mostly fixed-width
    * numerics/dates plus three short strings — the declared planning
    * width (a constant by design: the planner must be computable from
    * row counts alone for fixed-schema tables). */
  val LineitemRowBytes: Long = 120L

  /** Per-row envelope overhead for variable-width documents (ids,
    * offsets, metadata columns) added to the measured text bytes. */
  val DocRowOverheadBytes: Long = 64L

  /** Shuffle/partition sizing audit — the "would this partition
    * strategy hold at 1000×?" arithmetic as a QUERY, so the numbers
    * that size `spark.sql.shuffle.partitions` and
    * `files.maxPartitionBytes` come from the data, not from a guess.
    * Per table: row count, estimated bytes (documents: measured text
    * mass + per-row envelope; lineitem: declared fixed row width),
    * the target partition size, the partition count that hits it
    * (ceil division — exact integers), and the resulting rows per
    * partition. Two 1-row aggregates; output is |tables| rows at any
    * scale. The interesting property at 100 TB: `n_partitions` grows
    * linearly with data while `rows_per_partition` stays FLAT — the
    * invariant that keeps per-task memory constant at any corpus
    * size. */
  def partitionPlanner(lineitem: DataFrame, docs: DataFrame,
                       targetBytes: Long = 134217728L): DataFrame = {
    val li = lineitem.agg(count(lit(1)).as("n_rows"))
      .select(lit("lineitem").as("table_name"),
        col("n_rows").cast("long").as("n_rows"),
        (col("n_rows") * LineitemRowBytes).cast("long").as("est_bytes"))
    // coalesce: sum(n_chars) is NULL on an empty documents table.
    val dc = docs.agg(count(lit(1)).as("n_rows"),
        coalesce(sum(col("n_chars")), lit(0L)).as("chars"))
      .select(lit("documents").as("table_name"),
        col("n_rows").cast("long").as("n_rows"),
        (col("chars") + col("n_rows") * DocRowOverheadBytes)
          .cast("long").as("est_bytes"))
    li.unionAll(dc)
      .withColumn("target_bytes", lit(targetBytes))
      // greatest(...,1): an empty table plans 1 partition, not a
      // 0-partition divide-by-zero (NULL in Spark, error in DuckDB).
      .withColumn("n_partitions",
        expr(s"greatest((est_bytes + $targetBytes - 1) div $targetBytes, 1)")
          .cast("long"))
      .withColumn("rows_per_partition",
        expr("n_rows div n_partitions").cast("long"))
      .orderBy("table_name")
  }

  /** DuckDB twin of [[partitionPlanner]]. */
  def partitionPlannerOracleSql(targetBytes: Long = 134217728L): String =
    s"""
    |WITH t AS (
    |  SELECT 'lineitem' AS table_name, count(*) AS n_rows,
    |    count(*) * $LineitemRowBytes AS est_bytes
    |  FROM lineitem
    |  UNION ALL
    |  SELECT 'documents', count(*),
    |    coalesce(sum(n_chars), 0) + count(*) * $DocRowOverheadBytes
    |  FROM documents)
    |SELECT table_name, CAST(n_rows AS BIGINT) AS n_rows,
    |  CAST(est_bytes AS BIGINT) AS est_bytes,
    |  CAST($targetBytes AS BIGINT) AS target_bytes,
    |  CAST(greatest((est_bytes + $targetBytes - 1) // $targetBytes, 1)
    |    AS BIGINT) AS n_partitions,
    |  CAST(n_rows
    |    // greatest((est_bytes + $targetBytes - 1) // $targetBytes, 1)
    |    AS BIGINT) AS rows_per_partition
    |FROM t ORDER BY table_name
    |""".stripMargin.trim
}
