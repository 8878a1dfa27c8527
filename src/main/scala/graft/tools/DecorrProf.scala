package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.SynthGen
import graft.ext.{Pca, Similarity}

/** The decorrelation A/B, measured (`DecorrProf [mult] [aniso]`):
  * recall@10 of plain IVF-PQ vs the decorrelated index
  * ([[Similarity.ivfPqTopKDecorrelated]]) at IDENTICAL dials on two
  * SynthGen corpora — the isotropic control (aniso=0, the fixture
  * shape) and one with a PLANTED dominant direction (aniso>0: a
  * common axis carrying a multiple of the per-dim noise variance).
  * Also prints `explained_ppm` for each corpus, so the table shows
  * whether the pre-pass's decision number actually predicts the
  * recall delta — the loop SCALE.md §48 documents.
  *
  * Dials mirror PqDial's production search shape: nCentroids=64,
  * nProbe=8, m=8, ksub=16 (the oracle-expressible sample init on
  * BOTH arms — codebook training is orthogonal to this A/B),
  * rerank=50, |Q|=100.
  */
object DecorrProf {
  def main(args: Array[String]): Unit = {
    val mult = if (args.length > 0) args(0).toDouble else 10.0
    val aniso = if (args.length > 1) args(1).toDouble else 2.5
    val dim = 64; val k = 10; val iters = 8
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = graft.GraftConf.applyBase(SparkSession.builder()
        .master(s"local[$cpus]"), cpus.toInt)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val n = math.max(1L, (2000 * mult).toLong)

    def arm(tag: String, a: Double): Unit = {
      val emb = SynthGen.embeddings(spark, n, dim, a).localCheckpoint()
      val queries = emb.filter(col("vec_id") < 100)
      val cov = Pca.covariance(emb, col("vec_id"), col("embedding"),
        dim).localCheckpoint()
      val v1df = Pca.powerIteration(cov, dim, iters)
      val ppm = Pca.explained(cov, v1df)
        .select("explained_ppm").collect()(0).getLong(0)
      def recall(name: String,
                 f: () => org.apache.spark.sql.DataFrame): Double = {
        val t0 = System.nanoTime()
        val r = f().agg(avg(col("recall_at_k"))).collect()(0).getDouble(0)
        println(f"  $name: recall@$k=$r%.4f " +
          f"(${(System.nanoTime() - t0) / 1e9}%.1f s)")
        r
      }
      println(s"$tag: n=$n aniso=$a explained_ppm=$ppm")
      val plain = recall("plain ivf-pq", () =>
        Similarity.pqRecall(emb, queries, k, nCentroids = 64,
          nProbe = 8, m = 8, ksub = 16, dim = dim, rerank = 50))
      val dec = recall("decorrelated", () =>
        Similarity.pqDecorrelatedRecall(emb, queries, k,
          nCentroids = 64, nProbe = 8, m = 8, ksub = 16, dim = dim,
          rerank = 50, iters = iters))
      println(f"  delta: ${dec - plain}%+.4f")
    }

    arm("isotropic control", 0.0)
    arm("planted dominant direction", aniso)
    spark.stop()
  }
}
