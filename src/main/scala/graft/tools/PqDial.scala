package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.ext.Similarity

/** The PRODUCTION PQ dial, measured (`PqDial <dir> [iters] [ksub]`):
  * SCALE.md §18 names ksub=256 × m=8 as the deployment
  * configuration (1 byte/code → an 8-byte payload per 64-dim vector,
  * 32× under float32) but the oracle-checked surface ships ksub=16.
  * This tool trains the Lloyd codebooks at the production width on a
  * SynthGen ×100 corpus and reports, for sample-init vs trained:
  * total quantization error, mean recall@10 (identical search legs —
  * nCentroids=64, nProbe=8, rerank=50), training wall per iteration,
  * and the ADC index payload (codes bytes vs raw float bytes). */
object PqDial {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val iters = if (args.length > 1) args(1).toInt else 3
    val ksub = if (args.length > 2) args(2).toInt else 256
    val m = 8; val dim = 64; val subLen = dim / m
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = graft.GraftConf.applyBase(SparkSession.builder()
        .master(s"local[$cpus]"), cpus.toInt)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val emb = spark.read.parquet(s"$dir/embeddings.parquet").localCheckpoint()
    val queries = emb.filter(col("vec_id") < 10)
    val n = emb.count()
    println(s"corpus: $n vectors, dim=$dim; dial m=$m ksub=$ksub")
    println(f"index payload: codes ${n * m} B vs float32 ${n * dim * 4} B " +
      f"(${dim * 4.0 / m}%.0fx)")
    def audit(tag: String, cw: org.apache.spark.sql.DataFrame): Unit = {
      val t0 = System.nanoTime()
      val err = Similarity.pqQuantizationError(emb, cw, m, dim)
      val t1 = System.nanoTime()
      val rec = Similarity.pqRecallWith(emb, queries, cw, 10,
          nCentroids = 64, nProbe = 8, m = m, dim = dim, rerank = 50)
        .agg(avg(col("recall_at_k"))).collect()(0).getDouble(0)
      val t2 = System.nanoTime()
      println(f"$tag: qerr=$err recall@10=$rec%.4f " +
        f"(err leg ${(t1 - t0) / 1e9}%.1f s, search+exact leg ${(t2 - t1) / 1e9}%.1f s)")
    }
    audit("sample-init", Similarity.pqSampleCodebooks(emb, m, ksub, subLen))
    val t0 = System.nanoTime()
    val trained = Similarity.pqTrainCodebooks(emb, m, ksub, dim, iters)
      .localCheckpoint()
    println(f"lloyd: $iters iters in ${(System.nanoTime() - t0) / 1e9}%.1f s")
    audit(s"lloyd-$iters", trained)
    spark.stop()
  }
}
