package graft

import org.apache.spark.sql.SparkSession

/** Run several declared queries in sequence in ONE session — for
  * reproducing cross-query interference the per-query harness hides. */
object BenchSeq {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(1000).count()
    args.foreach { name =>
      val t0 = System.nanoTime()
      val cnt = SparkEntry.queries(name)(spark, sfDir).count()
      println(f"$name: ${(System.nanoTime() - t0) / 1e9}%.2f s ($cnt rows)")
    }
    spark.stop()
  }
}
