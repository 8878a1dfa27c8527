package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.checks.Checks
import graft.dims.{DateDim, Scd2, Scd2Dimension}
import graft.facts.FactLoader
import graft.marts.Marts
import graft.meta.{LoadTracker, RunLog, StagedWrite}
import graft.schema.{Tables, Warehouse}

/** End-to-end warehouse build — the reference's documented run order
  * (SQL:1799-1811): date dim, then SCD2 dims, then the fact (always
  * last, J46), then marts, then validation. Re-running is the
  * reference's headline test (SQL:70-74): every load must be
  * idempotent — second run inserts 0 rows and leaves tables unchanged.
  *
  * Fixture roles (FIXTURES.md §C): `customer`/`part`/`supplier` are
  * the dimension sources (static snapshot, one initial version);
  * `events` is the change feed for a genuinely versioned dim
  * (user_id -> SCD2 history); `orders ⋈ lineitem` is the fact source.
  */
object Pipeline {

  final case class RunResult(dimDateRows: Long, dimInserts: Map[String, Long],
                             factInserts: Long, violations: Map[String, Long])

  /** Seed validity for snapshot-style dims: just after the tracker
    * epoch so the first load's watermark filter (`> epoch`) picks the
    * rows up, and every rerun sees an empty delta. */
  private val SeedTs = java.time.LocalDateTime.of(1900, 1, 2, 0, 0, 0)

  /** `strict = true` arms BOTH validation layers:
    *
    *   - the stage-local PRE-publish gates (the reference author's
    *     production note, SQL:1622): each load validates its candidate
    *     frame before `StagedWrite.overwrite` and aborts — table,
    *     watermark, success log untouched — on a violation
    *     ([[graft.checks.Checks.prePublishDim]]/[[graft.checks.Checks.prePublishFact]]);
    *   - the POST-publish sweep below (the reference's own Stage 5
    *     runs after its loads, SQL:1616-1622), which additionally
    *     covers cross-table invariants (referential integrity,
    *     structure) that no single stage owns, and throws on any
    *     non-empty result instead of returning counts. */
  def runAll(spark: SparkSession, sfDir: String, root: String,
             strict: Boolean = false): RunResult = {
    val wh = Warehouse(root)
    val tracker = new LoadTracker(spark, wh.meta("etl_load_tracker"))
    val log = new RunLog(spark, wh.meta("etl_run_log"))

    // 1. date dimension (reference Stage 2.2)
    val dimDate = DateDim.build(spark, "1995-01-01", "2001-12-31")
    StagedWrite.overwrite(dimDate, wh.int("dim_date"))
    val dimDateRows = spark.read.parquet(wh.int("dim_date")).count()

    // 2. SCD2 dims (reference Stage 2.3-2.5 / procs)
    def snapshotFeed(df: DataFrame, nk: String): DataFrame =
      df.withColumn("valid_from", lit(SeedTs))

    val dimSpecs: Seq[(String, DataFrame, DataFrame, Seq[String])] = Seq(
      ("customer",
        snapshotFeed(Tables.src(spark, sfDir, "customer"), "c_custkey"),
        Tables.src(spark, sfDir, "customer").select("c_custkey"),
        Seq("c_name", "c_mktsegment")),
      ("part",
        snapshotFeed(Tables.src(spark, sfDir, "part"), "p_partkey"),
        Tables.src(spark, sfDir, "part").select("p_partkey"),
        Seq("p_name", "p_brand")),
      ("supplier",
        snapshotFeed(Tables.src(spark, sfDir, "supplier"), "s_suppkey"),
        Tables.src(spark, sfDir, "supplier").select("s_suppkey"),
        Seq("s_name", "s_acctbal")))

    val dimInserts = dimSpecs.map { case (name, feed, snap, tracked) =>
      val nk = feed.columns.head // c_custkey / p_partkey / s_suppkey
      val dim = new Scd2Dimension(name, nk, "valid_from", tracked)
      name -> dim.load(spark, feed, Some(snap), wh.int(s"dim_$name"),
        tracker, log, preValidate = strict)
    }.toMap

    // genuinely versioned dim from the events change feed. Named
    // "user_profile", NOT "user": the surrogate column is
    // "<name>_id" and a name of "user" would make it collide with —
    // and silently overwrite — the "user_id" natural key.
    val userFeed = Queries.eventsTable(spark, sfDir).select(
      col("user_id"), col("event_type"), col("value"),
      col("ts").as("valid_from"), col("event_id"))
    val dimUser = new Scd2Dimension("user_profile", "user_id", "valid_from",
      Seq("event_type", "value"), Seq("event_id"))
    val userInserts = dimUser.load(spark, userFeed, None,
      wh.int("dim_user_profile"), tracker, log, preValidate = strict)

    // 3. fact load — always last (J46)
    val currentDim = (name: String, nk: String) =>
      spark.read.parquet(wh.int(s"dim_$name"))
        .filter(col("is_current") === 1L)
        .select(col(s"${name}_id"), col(nk))
    val factInserts = FactLoader.load(spark,
      Tables.src(spark, sfDir, "lineitem"), Tables.src(spark, sfDir, "orders"),
      Map(
        "customer" -> ((currentDim("customer", "c_custkey"),
          col("o_custkey"), col("c_custkey"))),
        "part" -> ((currentDim("part", "p_partkey"),
          col("l_partkey"), col("p_partkey"))),
        "supplier" -> ((currentDim("supplier", "s_suppkey"),
          col("l_suppkey"), col("s_suppkey")))),
      wh.int("factsales"), tracker, log, preValidate = strict)

    // 4. marts (reference Stage 4)
    StagedWrite.overwrite(
      Marts.current(spark.read.parquet(wh.int("dim_customer")),
        Seq("customer_id", "c_custkey", "c_name", "c_mktsegment")),
      wh.mart("dim_customer_current"))
    StagedWrite.overwrite(
      Marts.fact(spark.read.parquet(wh.int("factsales"))),
      wh.mart("factsales"))
    // run-history evidence mart (reference Runlogs.png, README:39-40);
    // written after the loads so it covers this run's own log rows
    StagedWrite.overwrite(Marts.runHistory(log.read()),
      wh.mart("run_history"))

    // 5. validation (reference Stage 5): all must be empty
    val fact = spark.read.parquet(wh.int("factsales"))
    // soft referential integrity (reference SQL:1746-1783): every
    // stored non-Unknown surrogate must resolve in its dimension —
    // this is what the stable-SK contract of Scd2Dimension protects
    val refViolations = dimSpecs.map(_._1).map { dname =>
      val dimSk = spark.read.parquet(wh.int(s"dim_$dname"))
        .select(col(s"${dname}_id"))
      s"ref_${dname}" -> fact.filter(col(s"${dname}_sk") =!= -1L)
        .join(dimSk, fact(s"${dname}_sk") === dimSk(s"${dname}_id"),
          "left_anti")
        .count()
    }.toMap
    // warehouse structure (reference Stage 5.1, SQL:1626-1638): the
    // expected table list must exist on disk
    val expectedTables =
      (Seq("dim_date", "dim_customer", "dim_part", "dim_supplier",
        "dim_user_profile", "factsales").map(n => n -> wh.int(n)) ++
        Seq("dim_customer_current", "factsales", "run_history").map(n =>
          s"mart_$n" -> wh.mart(n)) ++
        Seq("etl_load_tracker", "etl_run_log").map(n => n -> wh.meta(n)))
    val violations = refViolations ++ Map(
      "structure_missing" -> Checks.structure(spark, expectedTables).count(),
      "dup_fact_nk" -> Checks.duplicates(fact, Seq("sales_nk")).count(),
      "dup_date" -> Checks.duplicates(spark.read.parquet(wh.int("dim_date")),
        Seq("date_value")).count()) ++
      (dimSpecs.map(_._1) :+ "user_profile").flatMap { name =>
        val dim = spark.read.parquet(wh.int(s"dim_$name"))
        val nk = dim.columns.find(c => c.endsWith("key") || c == "user_id").get
        Seq(
          s"multi_current_$name" -> Checks.multipleCurrent(dim, nk).count(),
          s"null_validity_$name" -> Checks.nullValidity(dim).count(),
          // tiebreak on active_to: versions can share an active_from
          // (two changes at one timestamp -> a zero-width version);
          // end-ordering puts the zero-width interval first so the
          // lead comparison is deterministic and overlap-free chains
          // never flag spuriously
          s"overlaps_$name" ->
            Checks.overlaps(dim, nk, Seq(col("active_to"))).count())
      }.toMap

    val result = RunResult(dimDateRows,
      dimInserts + ("user_profile" -> userInserts), factInserts, violations)
    if (strict) {
      val broken = violations.filter(_._2 > 0)
      if (broken.nonEmpty)
        throw new IllegalStateException(
          s"validation failed: ${broken.toSeq.sortBy(_._1).mkString(", ")}")
    }
    result
  }
}
