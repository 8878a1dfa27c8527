package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.ext.Similarity

/** Serve-path economics for [[graft.streaming.Streams.annServeSink]]
  * (`ServeProf <dir> [nTriggers] [qPerTrigger] [nCentroids]`): build
  * the persisted IVF-PQ index over the dir's embeddings, write
  * `nTriggers` query files, run the sink with maxFilesPerTrigger=1
  * (AvailableNow), and price the request-log output against ONE
  * batch search over the union of all queries.
  *
  * The number under test is the PER-TRIGGER overhead: each trigger
  * re-reads the published store (probe assignment re-broadcast, ADC
  * shortlist re-planned), so serve wall ≈ nTriggers · (store-read +
  * search(q)) while the batch wall is store-read + search(n·q). The
  * gap is the price of trigger-granular freshness — a deployment
  * picks its trigger size by this table, not by guessing. */
object ServeProf {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val nTriggers = if (args.length > 1) args(1).toInt else 10
    val qPer = if (args.length > 2) args(2).toInt else 50
    val nCentroids = if (args.length > 3) args(3).toInt else 64
    val m = 8; val dim = 64
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = graft.GraftConf.applyBase(SparkSession.builder()
        .master(s"local[$cpus]"), cpus.toInt)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(1000).count()

    val scratch = java.nio.file.Files
      .createTempDirectory("serve-prof").toString
    val ixDir = s"$scratch/ix"
    val srcDir = s"$scratch/queries"
    val outDir = s"$scratch/served"
    val emb = spark.read.parquet(s"$dir/embeddings.parquet")
      .localCheckpoint()
    val nVec = emb.count()
    println(s"corpus: $nVec vectors; $nTriggers triggers x $qPer queries")

    val cw = Similarity.pqSampleCodebooks(emb, m, 16, dim / m)
    var t0 = System.nanoTime()
    Similarity.ivfPqWriteIndex(emb, cw, nCentroids, m, dim, ixDir)
    println(f"index build+persist (nCentroids=$nCentroids): " +
      f"${(System.nanoTime() - t0) / 1e9}%.1f s")

    (0 until nTriggers).foreach { i =>
      emb.filter(col("vec_id") >= i.toLong * qPer &&
          col("vec_id") < (i + 1).toLong * qPer)
        .coalesce(1).write.mode("append").parquet(srcDir)
    }
    val schema = emb.schema

    t0 = System.nanoTime()
    val q = graft.streaming.Streams.annServeSink(
      spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1).parquet(srcDir),
      emb, ixDir, outDir, k = 10, nProbe = 4, m = m, dim = dim,
      rerank = 50,
      java.nio.file.Files.createTempDirectory("serve-ckpt").toString)
    try q.awaitTermination() finally q.stop()
    val serveWall = (System.nanoTime() - t0) / 1e9
    val served = spark.read.parquet(outDir)
    val nBatches = served.select("batch_id").distinct().count()
    println(f"serve: $serveWall%.1f s for $nBatches triggers " +
      f"(${serveWall / nTriggers}%.2f s/trigger, " +
      f"${nTriggers.toLong * qPer / serveWall}%.0f queries/s)")

    t0 = System.nanoTime()
    val batchRows = Similarity.ivfPqSearchPersisted(spark, ixDir,
      emb, emb.filter(col("vec_id") < nTriggers.toLong * qPer),
      k = 10, nProbe = 4, m = m, dim = dim, rerank = 50).count()
    val batchWall = (System.nanoTime() - t0) / 1e9
    println(f"batch union search: $batchWall%.1f s ($batchRows rows) " +
      f"-> per-trigger overhead ~" +
      f"${(serveWall - batchWall) / nTriggers}%.2f s")

    val p = new org.apache.hadoop.fs.Path(scratch)
    p.getFileSystem(spark.sparkContext.hadoopConfiguration)
      .delete(p, true)
    spark.stop()
  }
}
