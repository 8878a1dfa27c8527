package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.ext.Similarity

/** IVF-PQ stage decomposition (`PqProf <sfDir> [runs]`): separates the
  * one-time index cost (cell assignment + PQ encode — what a
  * production pipeline materializes offline) from the per-query ADC
  * search + exact re-rank that the declared `ann_ivf_pq` query pays
  * TOGETHER on every run (the oracle contract re-derives the index so
  * DuckDB can replay it). */
object PqProf {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val runs = if (args.length > 1) args(1).toInt else 3
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = graft.GraftConf.applyBase(SparkSession.builder()
        .master(s"local[$cpus]"), cpus.toInt)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
    val queries = emb.filter(col("vec_id") < 10)
    val n = emb.count()
    println(s"corpus: $n vectors")
    def time(name: String)(f: => Long): Unit =
      for (i <- 1 to runs) {
        val t0 = System.nanoTime()
        val r = f
        println(f"$name run $i: ${(System.nanoTime() - t0) / 1e9}%.2f s ($r)")
      }
    // index-build proxy: the encode argmin over every corpus vector
    // (pqQuantizationError runs the identical m·ksub subspace-dot
    // argmin shape + one reduce)
    time("encode(argmin all vectors)") {
      Similarity.pqQuantizationError(emb, Similarity.pqSampleCodebooks(
        emb, 8, 16, 8), 8, 64).longValue()
    }
    // full declared query: index build + ADC search + exact re-rank
    time("ann_ivf_pq(total)") {
      Similarity.ivfPqTopK(emb, queries, 5, 16, 4, 8, 16, 64, 20).count()
    }
    spark.stop()
  }
}
