package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec

import graft.sources.Sources

class SourcesSpec extends SparkSpec {

  private def tmp(p: String): String = Files.createTempDirectory(p).toString

  private lazy val customer = spark.read.parquet(s"$sf/customer.parquet")

  test("csv round-trip with explicit schema preserves values") {
    val dir = tmp("src-csv") + "/customer"
    customer.write.option("header", "true").csv(dir)
    val back = Sources.csv(spark, dir, customer.schema)
    assert(back.schema == customer.schema)
    assert(back.orderBy("c_custkey").collect().toSeq ==
      customer.orderBy("c_custkey").collect().toSeq)
  }

  test("jsonl round-trip with explicit schema preserves values") {
    val dir = tmp("src-json") + "/customer"
    customer.write.json(dir)
    val back = Sources.jsonl(spark, dir, customer.schema)
    assert(back.orderBy("c_custkey").collect().toSeq ==
      customer.orderBy("c_custkey").collect().toSeq)
  }

  test("orc round-trip preserves values and pushes filters to the scan") {
    val dir = tmp("src-orc") + "/customer"
    Sources.writeOrc(customer, dir)
    val back = Sources.orc(spark, dir, customer.schema)
    assert(back.orderBy("c_custkey").collect().toSeq ==
      customer.orderBy("c_custkey").collect().toSeq)
    val plan = back.filter(col("c_custkey") === 42L)
      .queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters: [IsNotNull(c_custkey), EqualTo(c_custkey,42)"),
      s"orc scan did not push the predicate:\n$plan")
  }

  test("partitioned write prunes partitions on read") {
    val dir = tmp("src-part") + "/customer"
    Sources.writePartitioned(customer, dir, Seq("c_mktsegment"))
    val one = spark.read.parquet(dir)
      .filter(col("c_mktsegment") === "AUTOMOBILE")
    // partition filter must not survive as a data filter: pruning
    // happens at planning, so scanned files all come from one dir
    val files = one.select(input_file_name()).distinct()
      .collect().map(_.getString(0))
    assert(files.nonEmpty)
    assert(files.forall(_.contains("c_mktsegment=AUTOMOBILE")))
  }

  test("sorted write clusters a key range into one file") {
    val dir = tmp("src-sorted") + "/orders"
    val orders = spark.read.parquet(s"$sf/orders.parquet")
    Sources.writeSorted(orders, dir, Seq("o_orderkey"))
    val back = spark.read.parquet(dir)
    assert(back.count() == orders.count())
    // range-partitioned + sorted: a narrow key range lives in exactly
    // one file, so min/max stats let scans skip the rest
    val lo = orders.agg(min("o_orderkey")).head().getLong(0)
    val files = back.filter(col("o_orderkey") <= lo + 5)
      .select(input_file_name()).distinct().collect()
    assert(files.length == 1, s"range not clustered: ${files.length} files")
  }

  test("z-ordered write clusters BOTH keys; data and schema survive") {
    import graft.functions.ZOrder
    val dir = tmp("src-zorder") + "/orders"
    val orders = spark.read.parquet(s"$sf/orders.parquet")
      .withColumn("order_day",
        datediff(col("o_orderdate"), lit("1970-01-01")).cast("long"))
    Sources.writeZOrdered(orders, dir, "o_custkey", "order_day", bits = 16,
      nFiles = Some(8))
    val back = spark.read.parquet(dir)
    assert(back.count() == orders.count())
    assert(!back.columns.contains("__z"), "curve key must not be persisted")
    // locality on both dimensions: a tight box on (custkey, day) maps
    // to a z range touching few files; compare against the worst case
    // of every file (the sorted-by-one-key layout degrades to that on
    // its trailing key)
    val nFiles = back.select(input_file_name()).distinct().count()
    assert(nFiles > 1, "explicit nFiles must yield a multi-file layout")
    val (loC, loD) = orders.agg(min("o_custkey"), min("order_day"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).head
    def filesTouched(df: org.apache.spark.sql.DataFrame) =
      df.filter(col("o_custkey").between(loC, loC + 32) &&
          col("order_day").between(loD, loD + 32))
        .select(input_file_name()).distinct().count()
    assert(filesTouched(back) < nFiles,
      "z-order box query must not touch every file")
  }

  test("compact rewrites many small files into few, preserving data") {
    val dir = tmp("src-compact") + "/customer"
    customer.repartition(37).write.parquet(dir)
    def nFiles = spark.read.parquet(dir).select(input_file_name())
      .distinct().count()
    assert(nFiles == 37)
    Sources.compact(spark, dir)
    assert(nFiles <= 2, s"expected compacted file count, got $nFiles")
    assert(spark.read.parquet(dir).orderBy("c_custkey").collect().toSeq ==
      customer.orderBy("c_custkey").collect().toSeq)
  }

  test("compact preserves hive partition layout when given partition columns") {
    val dir = tmp("src-compact-part") + "/customer"
    Sources.writePartitioned(customer.repartition(8), dir,
      Seq("c_mktsegment"))
    val before = spark.read.parquet(dir)
      .select(input_file_name()).distinct().count()
    Sources.compact(spark, dir, partitionCols = Seq("c_mktsegment"))
    val files = spark.read.parquet(dir).select(input_file_name())
      .distinct().collect().map(_.getString(0))
    assert(files.length < before, "compaction must reduce file count")
    // layout survived: every file still lives under a partition dir
    assert(files.forall(_.contains("c_mktsegment=")),
      s"partition layout flattened:\n${files.mkString("\n")}")
    // and pruning still works
    val one = spark.read.parquet(dir)
      .filter(col("c_mktsegment") === "AUTOMOBILE")
      .select(input_file_name()).distinct().collect().map(_.getString(0))
    assert(one.nonEmpty &&
      one.forall(_.contains("c_mktsegment=AUTOMOBILE")))
    assert(spark.read.parquet(dir).count() == customer.count())
  }

  test("same-bucketed tables join without a shuffle") {
    val dir = tmp("src-bucket")
    Sources.writeBucketed(customer, "cust_b", s"$dir/cust", "c_custkey", 4)
    Sources.writeBucketed(
      spark.read.parquet(s"$sf/orders.parquet"), "ord_b", s"$dir/ord",
      "o_custkey", 4)
    // disable auto-broadcast or the tiny test tables would pass via
    // BroadcastHashJoin without exercising the bucketed-join path
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val joined = spark.table("cust_b").join(spark.table("ord_b"),
        col("c_custkey") === col("o_custkey"))
      val shuffles = joined.queryExecution.executedPlan.collect {
        case s: ShuffleExchangeExec => s
      }
      assert(shuffles.isEmpty,
        s"bucketed join must not shuffle, found: $shuffles")
      assert(joined.count() > 0)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
      spark.sql("DROP TABLE IF EXISTS cust_b")
      spark.sql("DROP TABLE IF EXISTS ord_b")
    }
  }
}
