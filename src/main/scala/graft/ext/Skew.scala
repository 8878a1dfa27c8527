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
  * shape changes. Measured caveat (SCALE.md §8): for COMBINABLE aggs
  * Spark's map-side partial aggregation already collapses a hot key
  * to one partial row per mapper, so the plain form is skew-immune
  * and salting is pure overhead — the two-phase form earns its keep
  * for aggregations whose partial state map-side combine cannot
  * shrink (exact distincts, large collect-style state).
  *
  * The salt here is deterministic (`pmod` of a row column) so the
  * declared query is oracle-checkable; at scale any cheap per-row
  * value works — the salt never appears in the result.
  */
object Skew {

  /** Skew-resistant inner equi-join: the probe side gets a
    * deterministic salt in [0, buckets), the build side is replicated
    * once per salt value, and the join key widens to (key, salt) — a
    * hot probe key's rows spread over `buckets` reducers instead of
    * hammering one. The result is exactly the plain inner join (the
    * salt never appears in it; every probe row still meets every
    * matching build row, in exactly one bucket).
    *
    * AQE's OptimizeSkewedJoin splits oversized partitions adaptively,
    * but only post-shuffle on sort-merge joins and only when runtime
    * stats reveal the skew; the explicit form works regardless of
    * join strategy or stats and survives a 1000-executor scale-up
    * unchanged. The build side carries a shuffle-hash hint: salting a
    * broadcast join would be theater (a broadcast join has no
    * per-key reducer to overload), so the helper pins the join shape
    * it exists to fix. Replication cost = buckets × build rows —
    * meant for the dimension-sized build sides where skew joins
    * actually hurt, and `buckets` must be sized to the SKEW (≈ the
    * hot key's share of a reducer, a handful), not to the core
    * count: measured at 19M rows / 50% hot key (SCALE.md §8),
    * buckets=4 beats the unsalted straggler while buckets=32 is 5×
    * WORSE than plain — the replicated build swamps the join. When
    * runtime stats are available, AQE's skew-split achieves the same
    * end with zero replication; this form is the deterministic
    * fallback for when they aren't. */
  def saltedJoin(probe: DataFrame, build: DataFrame,
                 probeKey: Column, buildKey: Column,
                 saltSource: Column, buckets: Int): DataFrame = {
    require(buckets >= 1, s"salt buckets must be >= 1, got $buckets")
    // a NULL salt source must not eject the row from the join (the
    // plain inner join it replaces doesn't care about the salt
    // column) — null rows all land in bucket 0, preserving equality
    val salted = probe.withColumn("__salt",
      coalesce(pmod(saltSource, lit(buckets)), lit(0)).cast("int"))
    val replicated = build.withColumn("__bsalt",
      explode(sequence(lit(0), lit(buckets - 1))))
    salted.join(replicated.hint("shuffle_hash"),
        probeKey === buildKey && col("__salt") === col("__bsalt"))
      .drop("__salt", "__bsalt")
  }

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
