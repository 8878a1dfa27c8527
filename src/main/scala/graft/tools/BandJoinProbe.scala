package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.ext.FuzzyJoin

/** Scale probe for the ε-band self-join: bucketed equi-join vs brute
  * theta join on synthetic uniform data at growing n — the measured
  * divergence (linear vs per-group-quadratic) that backs band_join's
  * 100 TB claim in SCALE.md. Values are deterministic (hash of the
  * row id), groups uniform, δ fixed, so pair counts are stable across
  * runs and the two shapes return identical aggregates (asserted).
  *
  * Usage: `graft.tools.BandJoinProbe [maxBruteN] [sizesCsv]`
  * defaults: brute capped at 100k rows; sizes 100k,300k,1M,3M.
  */
object BandJoinProbe {
  def main(args: Array[String]): Unit = {
    val maxBruteN = args.headOption.map(_.toLong).getOrElse(100000L)
    val sizes = args.lift(1).map(_.split(",").map(_.trim.toLong).toSeq)
      .getOrElse(Seq(100000L, 300000L, 1000000L, 3000000L))
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = graft.GraftConf.applyBase(
        SparkSession.builder().master(s"local[$cpus]"), cpus.toInt)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(1000).count() // JVM warm

    def synth(n: Long) = spark.range(n).select(
      col("id").as("k"),
      pmod(xxhash64(col("id"), lit(7)), lit(10L)).cast("string").as("g"),
      pmod(xxhash64(col("id")), lit(1000000000L)).as("x"))

    def time(f: => Array[org.apache.spark.sql.Row]): (Double, Long) = {
      val t0 = System.nanoTime()
      val rows = f
      ((System.nanoTime() - t0) / 1e9,
        rows.map(_.getAs[Long]("n_pairs")).sum)
    }

    sizes.foreach { n =>
      val df = synth(n)
      val (tb, pb) = time(FuzzyJoin.bandSelfJoinAgg(df, col("g"),
        col("k"), col("x"), 1000L).collect())
      val brute = if (n <= maxBruteN) {
        val (tx, px) = time(FuzzyJoin.bandSelfJoinAggBrute(df, col("g"),
          col("k"), col("x"), 1000L).collect())
        assert(px == pb, s"pair-set mismatch at n=$n: brute=$px fast=$pb")
        f"$tx%.1f s"
      } else "skipped"
      println(f"n=$n%8d  bucketed=$tb%6.1f s  brute=$brute  pairs=$pb")
    }
    spark.stop()
  }
}
