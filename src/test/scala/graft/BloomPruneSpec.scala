package graft

import org.apache.spark.sql.functions._

import graft.ext.BloomPrune

class BloomPruneSpec extends SparkSpec {
  import spark.implicits._

  private lazy val customer = spark.read.parquet(s"$sf/customer.parquet")
  private lazy val orders = spark.read.parquet(s"$sf/orders.parquet")

  test("bloom predicate never rejects a true member (no false negatives)") {
    val keys = customer.filter(col("c_nationkey") < 5)
      .select(col("c_custkey").as("k"))
    val pred = BloomPrune.buildPredicate(keys, col("k"),
      math.max(keys.count(), 1L))
    val rejectedMembers = orders.select(col("o_custkey").as("k"))
      .join(keys.distinct(), Seq("k"))
      .filter(!pred(col("k"))).count()
    assert(rejectedMembers == 0L)
  }

  test("bloom pruning is selective: pass rate tracks true selectivity") {
    val keys = customer.filter(col("c_nationkey") === 0)
      .select(col("c_custkey").as("k"))
    val nKeys = keys.count()
    val pred = BloomPrune.buildPredicate(keys, col("k"), math.max(nKeys, 1L))
    val probe = orders.select(col("o_custkey").as("k"))
    val nProbe = probe.count()
    val nPass = probe.filter(pred(col("k"))).count()
    val nTrue = probe.join(keys.distinct(), Seq("k")).count()
    // pass everything that matches, plus at most 5% fp on the rest
    assert(nPass >= nTrue)
    assert(nPass - nTrue <= math.max(1L, (nProbe - nTrue) / 20),
      s"fp too high: pass=$nPass true=$nTrue probe=$nProbe")
  }

  test("probe predicate evaluates as a scan filter, not a join") {
    val keys = customer.filter(col("c_nationkey") < 5)
      .select(col("c_custkey").as("k"))
    val pred = BloomPrune.buildPredicate(keys, col("k"),
      math.max(keys.count(), 1L))
    val plan = orders.filter(pred(col("o_custkey")))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Join"), s"bloom probe planned a join:\n$plan")
    assert(plan.contains("might_contain"), plan)
    // and it runs inside whole-stage codegen (the *(n) prefix)
    assert(plan.contains("*(1) Filter might_contain"), plan)
  }

  test("audit on a synthetic worst case: disjoint probe yields 0 matches") {
    val build = Seq(1L, 2L, 3L).toDF("k")
    val probe = (1000L to 2000L).toDF("k")
    val row = BloomPrune.pruneAudit(build, col("k"), probe, col("k"))
      .collect()(0)
    assert(row.getAs[Long]("n_build") == 3L)
    assert(row.getAs[Long]("n_probe") == 1001L)
    assert(row.getAs[Long]("n_match") == 0L)
    assert(row.getAs[Long]("false_negatives") == 0L)
    assert(row.getAs[Boolean]("fp_rate_ok"))
  }
}
