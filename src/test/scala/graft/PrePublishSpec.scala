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

  test("gate scoping: in-scope violations fire, out-of-scope don't") {
    // candidate with TWO current rows for key 1 (a multi_current
    // violation) and a clean key 2
    val candidate = Seq(
      (1L, "a", 10L, 1L), (1L, "a2", 11L, 1L), (2L, "b", 12L, 1L))
      .toDF("nk", "attr", "thing_id", "is_current")
      .withColumn("active_from", ntz("2024-01-01 00:00:00"))
      .withColumn("active_to", ntz("9999-12-31 00:00:00"))

    // violation key inside the touched scope -> fires
    val eIn = intercept[PrePublishViolation] {
      Checks.prePublishDim(candidate, "nk",
        touchedKeys = Some(Seq(1L).toDF("nk")))
    }
    assert(eIn.failing.contains("multi_current"))
    // no scope given -> full validation -> fires
    val eFull = intercept[PrePublishViolation] {
      Checks.prePublishDim(candidate, "nk")
    }
    assert(eFull.failing.contains("multi_current"))
    // violation key OUTSIDE the touched scope -> must NOT fire:
    // untouched rows were validated when they were published; the
    // post-publish sweep owns out-of-band corruption
    Checks.prePublishDim(candidate, "nk",
      touchedKeys = Some(Seq(2L).toDF("nk")))

    // same contract for the fact gate
    val factCand = Seq((1L, 5.0), (1L, 6.0), (2L, 7.0))
      .toDF("sales_nk", "value_gross")
    val eFact = intercept[PrePublishViolation] {
      Checks.prePublishFact(factCand, "sales_nk",
        touchedKeys = Some(Seq(1L).toDF("sales_nk")))
    }
    assert(eFact.failing == Seq("dup_nk"))
    Checks.prePublishFact(factCand, "sales_nk",
      touchedKeys = Some(Seq(2L).toDF("sales_nk")))
  }

  test("dim gate: untouched-key corruption is out of gate scope") {
    val root = Files.createTempDirectory("graft_gate").toString
    val tracker = new LoadTracker(spark, s"$root/tracker")
    val log = new RunLog(spark, s"$root/log")
    val path = s"$root/dim_thing"
    val dim = new Scd2Dimension("thing", "nk", "valid_from", Seq("attr"))

    val feed1 = feedOf(Seq((1L, "a", "2024-01-01 00:00:00"),
      (2L, "b", "2024-01-01 00:00:00")))
    assert(dim.load(spark, feed1, None, path, tracker, log,
      preValidate = true) == 2L)

    // corrupt the PUBLISHED table out-of-band: duplicate current row
    // for key 1. The next delta touches only key 2, so the corruption
    // rides through OUTSIDE the gate's touched-key scope: the load
    // publishes (gate cost tracks the delta, not the table) and the
    // full-table post-publish sweep is the layer that reports it.
    val corrupt = spark.read.parquet(path).filter(col("nk") === 1L)
      .withColumn("thing_id", lit(999L))
    corrupt.write.mode("append").parquet(path)

    val feed2 = feedOf(Seq((1L, "a", "2024-01-01 00:00:00"),
      (2L, "b", "2024-01-01 00:00:00"), (2L, "c", "2024-02-01 00:00:00")))
    assert(dim.load(spark, feed2, None, path, tracker, log,
      preValidate = true) == 1L) // only key 2's new version is delta
    val published = spark.read.parquet(path)
    // key 2's recompute is correct, corruption passed through untouched
    assert(published.filter(col("nk") === 2L &&
      col("is_current") === 1L).count() == 1L)
    assert(Checks.multipleCurrent(published, "nk").count() == 1L)

    // an initial (full) load of a corrupt candidate would still fire:
    // initial loads carry no scope
    val eFull = intercept[PrePublishViolation] {
      Checks.prePublishDim(published, "nk")
    }
    assert(eFull.failing.contains("multi_current"))
  }

  test("fact gate: scoped to delta keys; full sweep owns the rest") {
    val root = Files.createTempDirectory("graft_gate_fact").toString
    val tracker = new LoadTracker(spark, s"$root/tracker")
    val log = new RunLog(spark, s"$root/log")
    val path = s"$root/factsales"
    val lineitem = spark.read.parquet(s"$sf/lineitem.parquet")
    val orders = spark.read.parquet(s"$sf/orders.parquet")

    assert(FactLoader.load(spark, lineitem, orders, Map.empty, path,
      tracker, log, preValidate = true) > 0L)

    // duplicate the stored fact row with the SMALLEST natural key
    // (deterministically different from the delta key below, which is
    // the largest — so the contested-key dedup can't silently heal it)
    spark.read.parquet(path).orderBy("sales_nk").limit(1)
      .write.mode("append").parquet(path)
    val rowsBefore = spark.read.parquet(path).count()

    // new delta (strictly later edit for ONE key): the corrupted key is
    // uncontested, hence OUT of the gate's scope — the load publishes
    val shipType = lineitem.schema("l_shipdate").dataType
    val li2 = lineitem.unionByName(
      lineitem.orderBy(desc("l_orderkey"), desc("l_linenumber")).limit(1)
        .withColumn("l_shipdate", ntz("2099-01-01 00:00:00").cast(shipType)))
    assert(FactLoader.load(spark, li2, orders, Map.empty, path, tracker, log,
      preValidate = true) > 0L)
    // contested key was deduped to its latest edit; corrupt dup remains
    // for the post-publish sweep to report
    val published = spark.read.parquet(path)
    assert(published.count() == rowsBefore)
    assert(Checks.duplicates(published, Seq("sales_nk")).count() == 1L)
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
