package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.ext.Skew

/** Skew micro-study (`SkewStudy <sfDir> [buckets]`) — measures, on a
  * corpus with a deliberately hot key (SynthGen's `skewHot`), the
  * shapes [[graft.ext.Skew]] exists to fix:
  *
  *   - plain `groupBy(l_partkey)` vs [[Skew.saltedSumCount]]
  *   - plain shuffle-hash `lineitem ⋈ part` vs [[Skew.saltedJoin]]
  *     (broadcast disabled: a broadcast join has no per-key reducer
  *     to overload, so it would mask the effect under study)
  *
  * Each variant runs twice; the second (warm) time is reported. Both
  * variants' results are counted so the work compared is identical.
  * Used by SCALE.md §8 — run on /tmp synth data, never the fixtures.
  */
object SkewStudy {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val buckets = if (args.length > 1) args(1).toInt else 32
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS",
      math.min(32, Runtime.getRuntime.availableProcessors).toString)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val li = spark.read.parquet(s"$sfDir/lineitem.parquet")
    val part = spark.read.parquet(s"$sfDir/part.parquet")
    val hot = li.filter(col("l_partkey") === 1L).count()
    println(s"[skew] lineitem=${li.count()} hot-key rows=$hot")

    def time(name: String)(thunk: => Long): Unit = {
      thunk // warmup
      val t0 = System.nanoTime()
      val n = thunk
      println(f"[skew] $name: ${(System.nanoTime() - t0) / 1e9}%.2f s ($n rows)")
    }

    val value = col("l_quantity").cast("decimal(14,4)")
    time("plain groupBy")(
      li.groupBy("l_partkey").agg(sum(value), count(lit(1))).count())
    time("salted groupBy")(
      Skew.saltedSumCount(li, Seq("l_partkey"), value,
        col("l_orderkey"), buckets).count())

    // AQE's OptimizeSkewedJoin is the built-in answer for sort-merge;
    // pin shuffle-hash + no broadcast so the salted form's effect is
    // attributable (and measure AQE's own skew handling separately)
    val noBroadcast = "spark.sql.autoBroadcastJoinThreshold"
    val prev = spark.conf.get(noBroadcast)
    spark.conf.set(noBroadcast, "-1")
    try {
      time("plain shuffle join (AQE skew-split on)")(
        li.join(part.hint("shuffle_hash"),
          col("l_partkey") === col("p_partkey")).count())
      val aqe = "spark.sql.adaptive.enabled"
      spark.conf.set(aqe, "false")
      try
        time("plain shuffle join (AQE off)")(
          li.join(part.hint("shuffle_hash"),
            col("l_partkey") === col("p_partkey")).count())
      finally spark.conf.set(aqe, "true")
      time(s"salted shuffle join (buckets=$buckets)")(
        Skew.saltedJoin(li, part, col("l_partkey"), col("p_partkey"),
          col("l_orderkey"), buckets).count())
      time("salted shuffle join (buckets=4)")(
        Skew.saltedJoin(li, part, col("l_partkey"), col("p_partkey"),
          col("l_orderkey"), 4).count())
    } finally spark.conf.set(noBroadcast, prev)
    spark.stop()
  }
}
