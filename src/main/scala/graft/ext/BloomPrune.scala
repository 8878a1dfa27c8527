package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftext.BloomBridge

/** Bloom-filter semi-join pruning — the runtime-filter technique a
  * 100 TB join survives by: build a bloom sketch over the SMALL
  * side's join keys, broadcast it as a literal, and filter the BIG
  * side at the scan, so rows that cannot match never enter the
  * shuffle. This composes Spark's own internals (the same
  * `BloomFilterAggregate` / `BloomFilterMightContain` pair that
  * AQE's `InjectRuntimeFilter` plants automatically when it can) —
  * exposed here for the cases the optimizer's heuristics miss: a
  * pre-computed dim published as a table, a cross-job filter handed
  * between pipeline stages, or a probe the planner cannot prove
  * selective.
  *
  * Scale shape: the build is ONE distributed aggregate over the
  * small side (bit-OR merge per partition — order-independent, so
  * the sketch is deterministic for a given key set); the sketch
  * (~1.2 MB per million keys at 1% fpp) travels to the driver once
  * and rides the probe-side plan as a literal, evaluated inside
  * whole-stage codegen at the scan. No shuffle, no join, no
  * per-executor rebuild. The driver hop is the sanctioned
  * broadcast-scalar pattern (LoadTracker watermark, k-means cells):
  * O(sketch), never O(rows).
  *
  * Determinism caveat for oracles: the sketch's BITS are
  * deterministic, but no other engine reproduces them, so
  * oracle-checked output must only expose bloom-DERIVED facts that
  * are exactly checkable — the audit below emits the exact match
  * count, the (provably zero) false-negative count, and a boolean
  * false-positive-rate bound, never raw bloom pass counts.
  */
object BloomPrune {

  /** Build the sketch for `build`'s `key` column and return the probe
    * predicate for the big side. `numBits` from the standard
    * `-n·ln(fpp)/ln(2)²` sizing. */
  def buildPredicate(build: DataFrame, key: Column, estItems: Long,
                     fpp: Double = 0.01): Column => Column = {
    val numBits = math.ceil(
      -estItems * math.log(fpp) / (math.log(2) * math.log(2))).toLong
    val bytes = build.agg(BloomBridge.agg(key, estItems, numBits).as("bf"))
      .collect()(0).getAs[Array[Byte]](0)
    probeKey => BloomBridge.mightContain(bytes, probeKey)
  }

  /** Pruning audit over a dim-filtered fact probe: customers in
    * `nationKey`'s nation are the build side; `orders` is the probe.
    * Emits only exactly-checkable facts:
    *   - `n_build`        — build-side key count
    *   - `n_probe`        — probe-side row count
    *   - `n_match`        — exact semi-join survivors
    *   - `false_negatives`— exact matches REJECTED by the bloom
    *                        (zero by the bloom contract; the audit
    *                        proves the wiring, not the math)
    *   - `fp_rate_ok`     — bloom false-positive rate ≤ 5× the
    *                        configured 1% fpp (pass counts stay
    *                        internal — no other engine can reproduce
    *                        the sketch bits)
    */
  def pruneAudit(build: DataFrame, buildKey: Column,
                 probe: DataFrame, probeKey: Column): DataFrame = {
    val keys = build.select(buildKey.as("k"))
    val nBuild = keys.count()
    val pred = buildPredicate(keys, col("k"), math.max(nBuild, 1L))
    // exact membership via broadcast semi-join (the truth the bloom
    // approximates)
    val marked = probe.select(probeKey.as("k"))
      .withColumn("bloom_pass", pred(col("k")).cast("long"))
      .join(broadcast(keys.distinct().withColumn("is_match", lit(1L))),
        Seq("k"), "left")
      .withColumn("is_match", coalesce(col("is_match"), lit(0L)))
    marked.agg(
        lit(nBuild).as("n_build"),
        count(lit(1)).as("n_probe"),
        sum(col("is_match")).as("n_match"),
        sum(when(col("is_match") === 1L && col("bloom_pass") === 0L, 1L)
          .otherwise(0L)).as("false_negatives"),
        // fp among true non-matches, vs 5% (5x the 1% sizing)
        (sum(when(col("is_match") === 0L && col("bloom_pass") === 1L, 1L)
          .otherwise(0L)) * lit(100L) <=
          sum(when(col("is_match") === 0L, 1L).otherwise(0L)) * lit(5L))
          .as("fp_rate_ok"))
      .select("n_build", "n_probe", "n_match", "false_negatives",
        "fp_rate_ok")
  }

  /** DuckDB twin of [[pruneAudit]] for the declared query (build =
    * customers of nations < 5, probe = orders): the exact counts are
    * reproducible; `false_negatives` is exactly 0 by the bloom
    * membership contract, and `fp_rate_ok` is deterministic for a
    * given sketch (bit-OR of hash positions — insertion-order
    * independent), sized with 5× margin over the configured fpp so
    * sketch-parameter drift, not chance, is the only thing that
    * could flip it. */
  def pruneAuditOracleSql: String =
    s"""
    |WITH build AS (
    |  SELECT c_custkey AS k FROM customer WHERE c_nationkey < 5),
    |probe AS (SELECT o_custkey AS k FROM orders)
    |SELECT
    |  (SELECT count(*) FROM build) AS n_build,
    |  (SELECT count(*) FROM probe) AS n_probe,
    |  (SELECT count(*) FROM probe WHERE k IN (SELECT k FROM build))
    |    AS n_match,
    |  CAST(0 AS BIGINT) AS false_negatives,
    |  true AS fp_rate_ok
    |""".stripMargin.trim
}
