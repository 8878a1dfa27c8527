package org.apache.spark.sql.graftext

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.BloomFilterMightContain
import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.functions.{lit, xxhash64}

/** Column bridges over Spark's own runtime-filter internals — the
  * `BloomFilterAggregate` / `BloomFilterMightContain` pair that
  * `InjectRuntimeFilter` plants when its heuristics fire — for the
  * cases they don't (pre-computed dims, cross-job filters). See
  * [[graft.ext.BloomPrune]] for the user-facing surface and the
  * scale rationale. */
object BloomBridge {

  /** Distributed bloom build over xxhash64(keys): one binary cell. */
  def agg(keys: Column, estItems: Long, numBits: Long): Column =
    ExpressionUtils.column(new BloomFilterAggregate(
      ExpressionUtils.expression(xxhash64(keys)),
      ExpressionUtils.expression(lit(estItems)),
      ExpressionUtils.expression(lit(numBits)))
      .toAggregateExpression())

  /** Membership probe against a collected sketch literal —
    * codegen'd, scan-evaluable. */
  def mightContain(bloomBytes: Array[Byte], keys: Column): Column =
    ExpressionUtils.column(BloomFilterMightContain(
      ExpressionUtils.expression(lit(bloomBytes)),
      ExpressionUtils.expression(xxhash64(keys))))
}
