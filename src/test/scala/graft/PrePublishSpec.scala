package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.checks.{Checks, PrePublishViolation}
import graft.dims.Scd2Dimension
import graft.facts.FactLoader
import graft.meta.{LoadTracker, RunLog}

/** Stage-local pre-publish validation (reference author's production
  * note, SQL:1622) and the run-log update/delete counts
  * (SQL:1011-1023): a violating candidate must abort BEFORE the staged
  * publish — published table, watermark, and success log untouched —
  * and incremental changes must log nonzero updated/deleted counts.
  */
class PrePublishSpec extends SparkSpec {

  import spark.implicits._

  private def ntz(s: String) = to_timestamp(lit(s)).cast("timestamp_ntz")

  private def feedOf(rows: Seq[(Long, String, String)]) =
    rows.toDF("nk", "attr", "ts_s")
      .withColumn("valid_from", col("ts_s").cast("timestamp_ntz"))
      .drop("ts_s")

  test("dim gate: violating candidate leaves table, tracker, log untouched") {
    val root = Files.createTempDirectory("graft_gate").toString
    val tracker = new LoadTracker(spark, s"$root/tracker")
    val log = new RunLog(spark, s"$root/log")
    val path = s"$root/dim_thing"
    val dim = new Scd2Dimension("thing", "nk", "valid_from", Seq("attr"))

    val feed1 = feedOf(Seq((1L, "a", "2024-01-01 00:00:00"),
      (2L, "b", "2024-01-01 00:00:00")))
    assert(dim.load(spark, feed1, None, path, tracker, log,
      preValidate = true) == 2L)
    val wmBefore = tracker.watermark("thing")

    // corrupt the PUBLISHED table: duplicate current row for key 1
    // (e.g. a partial write by some out-of-band process); key 1 is
    // untouched by the next delta, so the corruption rides into the
    // candidate byte-identical and the gate must catch it
    val corrupt = spark.read.parquet(path).filter(col("nk") === 1L)
      .withColumn("thing_id", lit(999L))
    corrupt.write.mode("append").parquet(path)
    val tableBefore = spark.read.parquet(path)
      .orderBy("nk", "active_from", "thing_id").collect()

    val feed2 = feedOf(Seq((1L, "a", "2024-01-01 00:00:00"),
      (2L, "b", "2024-01-01 00:00:00"), (2L, "c", "2024-02-01 00:00:00")))
    val e = intercept[PrePublishViolation] {
      dim.load(spark, feed2, None, path, tracker, log, preValidate = true)
    }
    assert(e.failing.contains("multi_current"))

    // nothing moved: table bytes, data watermark, no new SUCCESS row
    val tableAfter = spark.read.parquet(path)
      .orderBy("nk", "active_from", "thing_id").collect()
    assert(tableBefore.toSeq == tableAfter.toSeq)
    assert(tracker.watermark("thing") == wmBefore)
    val logRows = log.read().filter(col("run_name") === "etl_load_thing")
    assert(logRows.filter(col("status") === RunLog.Success).count() == 1L)
    assert(logRows.filter(col("status") === RunLog.Fail).count() == 1L)

    // an uncorrupted rerun of the same delta publishes fine once the
    // corruption is cleared (prove the gate, not the load, was the
    // blocker): rebuild the table from scratch
    val root2 = Files.createTempDirectory("graft_gate2").toString
    val dim2 = new Scd2Dimension("thing", "nk", "valid_from", Seq("attr"))
    val tracker2 = new LoadTracker(spark, s"$root2/tracker")
    val log2 = new RunLog(spark, s"$root2/log")
    assert(dim2.load(spark, feed2, None, s"$root2/dim_thing", tracker2, log2,
      preValidate = true) == 3L)
  }

  test("fact gate: duplicate natural key aborts before publish") {
    val root = Files.createTempDirectory("graft_gate_fact").toString
    val tracker = new LoadTracker(spark, s"$root/tracker")
    val log = new RunLog(spark, s"$root/log")
    val path = s"$root/factsales"
    val lineitem = spark.read.parquet(s"$sf/lineitem.parquet")
    val orders = spark.read.parquet(s"$sf/orders.parquet")

    assert(FactLoader.load(spark, lineitem, orders, Map.empty, path,
      tracker, log, preValidate = true) > 0L)
    val wmBefore = tracker.watermark("factsales")

    // corrupt: duplicate the stored fact row with the SMALLEST natural
    // key (deterministically different from the delta key below, which
    // is the largest — so the contested-key dedup can't silently heal
    // the corruption)
    spark.read.parquet(path).orderBy("sales_nk").limit(1)
      .write.mode("append").parquet(path)
    val rowsBefore = spark.read.parquet(path).count()

    // new delta (strictly later edit for ONE key) so the load is not a
    // no-op; the corrupted row is uncontested and passes through
    val shipType = lineitem.schema("l_shipdate").dataType
    val li2 = lineitem.unionByName(
      lineitem.orderBy(desc("l_orderkey"), desc("l_linenumber")).limit(1)
        .withColumn("l_shipdate", ntz("2099-01-01 00:00:00").cast(shipType)))
    val e = intercept[PrePublishViolation] {
      FactLoader.load(spark, li2, orders, Map.empty, path, tracker, log,
        preValidate = true)
    }
    assert(e.failing == Seq("dup_nk"))
    assert(spark.read.parquet(path).count() == rowsBefore)
    assert(tracker.watermark("factsales") == wmBefore)
  }

  test("run log records SCD2 close-out and delete counts") {
    val root = Files.createTempDirectory("graft_counts").toString
    val tracker = new LoadTracker(spark, s"$root/tracker")
    val log = new RunLog(spark, s"$root/log")
    val path = s"$root/dim_thing"
    val dim = new Scd2Dimension("thing", "nk", "valid_from", Seq("attr"))
    def snap(keys: Long*) = keys.toSeq.toDF("nk")

    // run 1: initial — 3 inserted, nothing updated/deleted
    dim.load(spark, feedOf(Seq((1L, "a", "2024-01-01 00:00:00"),
      (2L, "b", "2024-01-01 00:00:00"), (3L, "c", "2024-01-01 00:00:00"))),
      Some(snap(1L, 2L, 3L)), path, tracker, log)

    // run 2: key 1 gets a new version (one close-out) and key 3
    // vanishes from the snapshot (one delete close-out)
    dim.load(spark, feedOf(Seq((1L, "a", "2024-01-01 00:00:00"),
      (2L, "b", "2024-01-01 00:00:00"), (3L, "c", "2024-01-01 00:00:00"),
      (1L, "a2", "2024-02-01 00:00:00"))),
      Some(snap(1L, 2L)), path, tracker, log)

    val rows = log.read().filter(col("run_name") === "etl_load_thing")
      .orderBy("started_at")
      .select("rows_inserted", "rows_updated", "rows_deleted")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(rows.length == 2)
    assert(rows(0) == ((3L, 0L, 0L)), s"initial run: ${rows(0)}")
    assert(rows(1) == ((1L, 1L, 1L)), s"incremental run: ${rows(1)}")

    // published state agrees with the logged counts
    val published = spark.read.parquet(path)
    assert(published.filter(col("nk") === 1L).count() == 2L)
    assert(published.filter(col("nk") === 1L &&
      col("is_current") === 1L).count() == 1L)
    assert(published.filter(col("nk") === 3L &&
      col("is_current") === 1L).count() == 0L)
  }

  test("structure check reports missing warehouse tables") {
    val root = Files.createTempDirectory("graft_struct").toString
    new java.io.File(s"$root/present").mkdirs()
    val missing = Checks.structure(spark, Seq(
      "present" -> s"$root/present",
      "absent" -> s"$root/absent"))
    assert(missing.collect().map(_.getString(0)).toSeq == Seq("absent"))
  }
}
