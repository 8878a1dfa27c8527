package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.ext.{Dedup, Similarity}

/** `ann_pq_incremental` stage decomposition (`PqIncProf <sfDir>
  * [runs]`): the incremental query's shape INVERTS ann_ivf_pq's —
  * the corpus (index side) is the small settled slice (vec_id < 400)
  * and the QUERY side is the whole appended batch (every later
  * vector), so per-query-side costs (probe assignment, the |Q|·m·ksub
  * LUT, the survivor window, the |Q|·rerank re-rank dots) dominate
  * where ann_ivf_pq's build leg does.
  *
  * This harness found the round-11 fix (SCALE.md §43): per-stage
  * walls from a SparkListener showed 3.8 s of the 5.6 s search leg in
  * TWO single-task stages — the LUT computed on the query table's one
  * scan partition, and the survivor window's exchange AQE-coalesced
  * to one task (decimal rows are byte-light but CPU-heavy, and AQE
  * sizes by bytes). The fix is the Dedup.spread discipline at those
  * narrow points, not a different algorithm. Set PQINC_ONLY=<substr>
  * to run matching legs only (stack-sampling aid). */
object PqIncProf {
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
    val corpus = emb.filter(col("vec_id") < 400)
    val queries = emb.filter(col("vec_id") >= 400)
    println(s"corpus=${corpus.count()} queries=${queries.count()}")
    val (m, ksub, dim, nCentroids, nProbe, rerank) = (8, 16, 64, 16, 4, 20)
    val subLen = dim / m
    val only = sys.env.get("PQINC_ONLY")
    def time(name: String)(f: => Long): Unit =
      if (only.forall(name.contains))
        for (i <- 1 to runs) {
          val t0 = System.nanoTime()
          val r = f
          println(f"$name run $i: ${(System.nanoTime() - t0) / 1e9}%.2f s ($r)")
        }
    val cw = Similarity.pqSampleCodebooks(corpus, m, ksub, subLen)
    time("build: ivfPqIndex(corpus)") {
      Similarity.ivfPqIndex(corpus, cw, nCentroids, m, dim).count()
    }
    val cb = Similarity.collectCodebook(corpus, "vec_id", "embedding",
      nCentroids)
    val q = Dedup.spread(queries.select(col("vec_id").as("query_id"),
      col("embedding").as("q_emb")), col("query_id"))
    time("probes: assignedCells(queries) [kernel]") {
      Similarity.assignedCells(q, cb, "query_id", "q_emb", nProbe).count()
    }
    time("lut: |Q|*m*ksub decimal table") {
      q.withColumn("sub", explode(sequence(lit(0), lit(m - 1))))
        .withColumn("__n2s",
          Similarity.dotSub(col("q_emb"), col("q_emb"), col("sub"), subLen))
        .join(broadcast(cw), Seq("sub"))
        .withColumn("lut_d", col("__n2s") + col("cw_n2s") -
          lit(2) * Similarity.dotSub(col("q_emb"), col("cw_emb"),
            col("sub"), subLen))
        .count()
    }
    // tail from materialized inputs: index + probes cached, so this
    // times ADC join + survivor window + rerank dots alone
    val index = Similarity.ivfPqIndex(corpus, cw, nCentroids, m, dim)
      .localCheckpoint()
    val probes = Similarity.assignedCells(q, cb, "query_id", "q_emb",
      nProbe).select(col("query_id"), col("c_id")).localCheckpoint()
    val qc = q.localCheckpoint()
    time("tail: ivfPqSearchStages(cached index+probes)") {
      Similarity.ivfPqSearchStages(index, corpus, qc, cw, probes, 5,
        m, subLen, rerank).count()
    }
    // one instrumented run: per-stage submit->complete walls — the
    // view that exposed the two single-task decimal stages
    if (only.isEmpty) locally {
      val events =
        new java.util.concurrent.ConcurrentLinkedQueue[(Int, Long, Int)]
      val listener = new org.apache.spark.scheduler.SparkListener {
        override def onStageCompleted(
            sc: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit = {
          val si = sc.stageInfo
          val wall = (for {
            a <- si.submissionTime; b <- si.completionTime
          } yield b - a).getOrElse(-1L)
          events.add((si.stageId, wall, si.numTasks))
        }
      }
      spark.sparkContext.addSparkListener(listener)
      val t0 = System.nanoTime()
      Similarity.ivfPqSearchStages(index, corpus, qc, cw, probes, 5,
        m, subLen, rerank).count()
      val wall = (System.nanoTime() - t0) / 1e9
      Thread.sleep(500)
      spark.sparkContext.removeSparkListener(listener)
      println(f"instrumented tail run: $wall%.2f s")
      import scala.jdk.CollectionConverters._
      val evs = events.asScala.toSeq.sortBy(_._1)
      evs.foreach { case (id, w, nt) =>
        println(f"  stage $id%4d  $w%6d ms  $nt%3d tasks")
      }
      println(f"  sum of stage walls: ${evs.map(_._2).sum} ms over" +
        f" ${evs.size} stages")
    }
    time("full: ivfPqTopK(incremental shape)") {
      Similarity.ivfPqTopK(corpus, queries, 5, nCentroids, nProbe, m,
        ksub, dim, rerank).count()
    }
    spark.stop()
  }
}
