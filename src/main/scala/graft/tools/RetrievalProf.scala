package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.ext.{Pca, RetrievalEval}

/** Decade walls for the round-12 eval family
  * (`RetrievalProf <dir> [n] [qMax]`): the three @k retrieval
  * metrics (shared exact-cosine top-k front — the corpus scan is
  * the cost, the metric arithmetic is noise) and the per-label
  * enriched table. Claims under test:
  *
  *  - @k metrics price at |Q|·|corpus| scoring with |Q| BOUNDED
  *    (qMax is a declared dial, the query side broadcasts), so at
  *    fixed qMax the wall is corpus-linear decade over decade.
  *  - enrichByLabel prices at ONE corpus moments pass plus a
  *    broadcast-join map — |labels|·d(d+3)/2 driver cells are
  *    codebook-class, so the wall is also corpus-linear and the
  *    per-label split adds no second scan over the global form.
  */
object RetrievalProf {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val n = if (args.length > 1) args(1).toInt else 3
    val qMax = if (args.length > 2) args(2).toLong else 50L
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = graft.GraftConf.applyBase(SparkSession.builder()
        .master(s"local[$cpus]"), cpus.toInt)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(1000).count()

    val emb = spark.read.parquet(s"$dir/embeddings.parquet")
      .localCheckpoint()
    println(s"corpus: ${emb.count()} vectors, qMax=$qMax")
    def timeIt[T](f: => T): (Double, T) = {
      var best = Double.MaxValue
      var last: Option[T] = None
      (1 to n).foreach { _ =>
        val t0 = System.nanoTime()
        last = Some(f)
        best = math.min(best, (System.nanoTime() - t0) / 1e9)
      }
      (best, last.get)
    }
    val (tr, rr) = timeIt(
      RetrievalEval.labelRecallAtK(emb, qMax, k = 10).count())
    println(f"recall@10: $tr%.2f s min-of-$n ($rr rows)")
    val (tn, _) = timeIt(
      RetrievalEval.labelNdcgAtK(emb, qMax, k = 10).count())
    println(f"ndcg@10:   $tn%.2f s min-of-$n")
    val (ta, _) = timeIt(
      RetrievalEval.labelApAtK(emb, qMax, k = 10).count())
    println(f"ap@10:     $ta%.2f s min-of-$n")
    val (tg, rg) = timeIt(
      Pca.enrich(emb, col("vec_id"), col("embedding"),
        dim = 64, iters = 8).count())
    println(f"enrich (global):    $tg%.2f s min-of-$n ($rg rows)")
    val (tl, rl) = timeIt(
      Pca.enrichByLabel(emb, col("label"), col("vec_id"),
        col("embedding"), dim = 64, iters = 8).count())
    println(f"enrich_by_label:    $tl%.2f s min-of-$n ($rl rows)")
    spark.stop()
  }
}
