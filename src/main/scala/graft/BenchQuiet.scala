package graft

import org.apache.spark.sql.SparkSession

/** Child half of the bench's self-adjudication protocol (VERDICT r10
  * Next #5): `BenchQuiet <sfDir> <n> <name> [<name>...]`.
  *
  * Runs in a FRESH JVM forked by [[Bench]] — the judge's isolated
  * BenchOne conditions (no 266-query JIT/GC history, no cross-query
  * heap churn), reproduced inside the bench protocol itself so the
  * artifact carries the quiet number instead of requiring a manual
  * re-measure whenever the all-queries wall spikes. Protocol per
  * name, identical to the main loop's steady-state posture: one
  * warmup run at the smallest SF (codegen/JIT compile outside the
  * timed window), then n timed runs at the bench SF, min reported.
  *
  * Output contract: ONE line `QUIET_JSON:{"<name>":<min_s>,...}` on
  * stdout — the parent scans for the prefix, so Spark log noise or
  * JVM warnings can't break the parse. A query that fails here maps
  * to -1.0 (the parent records it as unadjudicated, never as a
  * timing).
  */
object BenchQuiet {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val n = args(1).toInt
    val names = args.drop(2).toSeq
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS",
      math.min(32, Runtime.getRuntime.availableProcessors).toString)
    val spark = GraftConf.applyBase(SparkSession.builder()
        .master(s"local[$cpus]"), cpus.toInt)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(1000).count()
    val warmupDir = "/root/testdata/sf0.001"
    def canon(p: String) = new java.io.File(p).getCanonicalPath
    val warm = new java.io.File(warmupDir).exists &&
      canon(warmupDir) != canon(sfDir)
    val mins = names.map { name =>
      val res =
        try {
          val fn = SparkEntry.queries(name)
          // warmup failures are swallowed exactly as in the parent
          // Bench's warmup loop — a query whose plan fails at the
          // tiny fixture but runs at the bench SF must still be
          // adjudicated, just without the pre-compile
          if (warm)
            try fn(spark, warmupDir).count()
            catch { case scala.util.control.NonFatal(_) => () }
          (1 to n).map { _ =>
            val t0 = System.nanoTime()
            fn(spark, sfDir).count()
            val w = (System.nanoTime() - t0) / 1e9
            // same no-cross-run-cache discipline as graft.Bench:
            // every trial rebuilds pinned intermediates from parquet
            spark.sharedState.cacheManager.clearCache()
            w
          }.min
        } catch { case scala.util.control.NonFatal(e) =>
          System.err.println(s"[quiet] $name failed: $e"); -1.0
        }
      name -> res
    }
    spark.stop()
    val body = mins.map { case (k, v) => "\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    println("QUIET_JSON:" + body)
    System.out.flush()
  }
}
