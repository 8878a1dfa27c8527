package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

/** The reference's headline test (SQL:70-74): run the whole warehouse
  * build twice — second run must be a no-op (0 inserts everywhere) and
  * all Stage-5 invariants must hold after both runs.
  */
class PipelineSpec extends SparkSpec {

  test("runAll is idempotent and passes all validation checks") {
    val root = Files.createTempDirectory("graft_wh").toString

    // strict mode arms the stage-local pre-publish gates (which must
    // pass on every real candidate frame here) and the post-publish
    // sweep (which must find nothing)
    val first = Pipeline.runAll(spark, sf, root, strict = true)
    assert(first.dimDateRows > 2000L)
    assert(first.dimInserts.values.forall(_ > 0L), s"first run must load: ${first.dimInserts}")
    assert(first.factInserts > 0L)
    first.violations.foreach { case (name, n) =>
      assert(n == 0L, s"validation $name: $n violations")
    }

    val factAfterFirst = spark.read.parquet(s"$root/int/factsales")
      .orderBy("sales_nk").collect()

    // rerun in strict mode: arms the stage-local pre-publish gates AND
    // the post-publish sweep — a healthy warehouse must sail through
    val second = Pipeline.runAll(spark, sf, root, strict = true)
    assert(second.dimInserts.values.forall(_ == 0L),
      s"rerun must insert 0 dim rows: ${second.dimInserts}")
    assert(second.factInserts == 0L, "rerun must insert 0 fact rows")
    second.violations.foreach { case (name, n) =>
      assert(n == 0L, s"validation $name after rerun: $n violations")
    }

    val factAfterSecond = spark.read.parquet(s"$root/int/factsales")
      .orderBy("sales_nk").collect()
    assert(factAfterFirst.toSeq == factAfterSecond.toSeq,
      "fact table must be byte-identical after a no-op rerun")

    // run log recorded SUCCESS rows for both runs
    val log = spark.read.parquet(s"$root/meta/etl_run_log")
    assert(log.filter(col("status") === "SUCCESS").count() >= 10L)

    // run-history mart: one row per log entry, exactly one latest per
    // run name, non-negative durations, touched = inserted+updated+deleted
    val hist = spark.read.parquet(s"$root/mart/run_history")
    assert(hist.count() == log.count(),
      "run_history must cover every run-log row")
    val latestPerName = hist.filter(col("is_latest") === 1L)
      .groupBy("run_name").count().filter(col("count") =!= 1L).count()
    assert(latestPerName == 0L, "exactly one is_latest row per run name")
    assert(hist.filter(col("duration_sec") < 0).count() == 0L)
    assert(hist.filter(col("rows_touched") =!=
      col("rows_inserted") + col("rows_updated") + col("rows_deleted"))
      .count() == 0L)

    // watermark semantics: data watermark unchanged by empty rerun
    val tracker = spark.read.parquet(s"$root/meta/etl_load_tracker")
    assert(tracker.count() >= 5L)
  }
}
