package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.ext.Similarity

/** Persisted-index scaling probes (`PqIndexDial <mode> <dir> ...`),
  * the SCALE.md §33 protocol (min-of-N walls, quiet box, SynthGen
  * fixtures). Two questions VERDICT r9 left open:
  *
  *  - `decade <dir> <nCentroids> [n]` — build the persisted IVF-PQ
  *    index into a fresh scratch dir (build wall reported once),
  *    then min-of-n search-leg walls at the declared 10-query batch.
  *    Run across ×10/×30/×100 corpora with nCentroids ∝ n (fixed
  *    occupancy): if dynamic partition pruning holds, the probed
  *    row count — and the search wall — stays ~flat as the corpus
  *    decades, because a probe touches nProbe cells of constant
  *    occupancy regardless of how many sibling cells exist.
  *
  *  - `layout <dir> <nCentroids> [n]` — hive-partitioned codes
  *    (dynamic partition pruning) vs BUCKETED codes
  *    ([[graft.sources.Sources.writeBucketed]] on c_id, shuffle-free
  *    join side) on the SAME index relation, measured at the two
  *    probe regimes that decide the layout: a bounded query batch
  *    (10 queries — the search-service shape, probes broadcast) and
  *    an index×index probe set (every corpus vector a query — the
  *    knn-join / batch-scoring shape, probes too big to broadcast).
  *    The measured join is probes ⋈ codes on c_id + a cheap agg —
  *    the exact stage the layout exists for.
  */
object PqIndexDial {
  def main(args: Array[String]): Unit = {
    val mode = args(0)
    val dir = args(1)
    val nCentroids = args(2).toInt
    val n = if (args.length > 3) args(3).toInt else 3
    val m = 8; val dim = 64; val ksub = 16
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = graft.GraftConf.applyBase(SparkSession.builder()
        .master(s"local[$cpus]"), cpus.toInt)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(1000).count()
    // drift mode takes a SynthGen vector count in the dir slot (no
    // fixture on disk needed); every other mode reads the fixture
    lazy val emb = (if (mode == "drift")
        graft.SynthGen.embeddings(spark, dir.toLong)
      else spark.read.parquet(s"$dir/embeddings.parquet"))
      .localCheckpoint()
    lazy val nVec = emb.count()
    println(s"corpus: $nVec vectors, nCentroids=$nCentroids " +
      s"(occupancy ~${nVec / nCentroids})")

    def timeIt[T](k: Int)(f: => T): (Double, T) = {
      var best = Double.MaxValue
      var last: Option[T] = None
      (1 to k).foreach { _ =>
        val t0 = System.nanoTime()
        last = Some(f)
        best = math.min(best, (System.nanoTime() - t0) / 1e9)
      }
      (best, last.get)
    }

    mode match {
      case "drift" =>
        // WHERE a deployment sets ivfPqRebuildIfDrifted's threshold:
        // drift_ppm for a same-distribution continuation vs two
        // shifted appended slices, plus what a rebuild buys back.
        // `PqIndexDial drift <nVectors> <unused> [trainIters]`
        val half = nVec / 2
        val base = emb.filter(col("vec_id") < half)
        val cont = emb.filter(col("vec_id") >= half)
        val cw = Similarity.pqSampleCodebooks(base, m, ksub, dim / m)
        def shifted(f: org.apache.spark.sql.Column =>
            org.apache.spark.sql.Column) =
          cont.withColumn("embedding",
            transform(col("embedding"), x => f(x).cast("float")))
        def audit(name: String, appended: DataFrame,
                  books: DataFrame): Long = {
          val corpus = base.unionByName(appended)
          val r = Similarity.pqDriftAudit(corpus, books, m, dim, half)
            .collect().head
          val drift = if (r.isNullAt(r.fieldIndex("drift_ppm"))) -1L
            else r.getAs[Long]("drift_ppm")
          println(f"$name%-28s drift_ppm=$drift%,12d  " +
            f"mean_err_new_pico=${r.getAs[Long]("err_new_pico") /
              math.max(1L, r.getAs[Long]("n_new"))}%,15d")
          drift
        }
        audit("continuation (no shift)", cont, cw)
        audit("scale x1.3", shifted(_ * lit(1.3)), cw)
        val off = shifted(_ + lit(0.4))
        audit("offset +0.4", off, cw)
        // rebuild effect on the offset-drifted mix: the sample init
        // cannot adapt (its codewords are all base-slice vectors);
        // trained books descend the objective on the post-drift mix
        val iters = n
        val mix = base.unionByName(off).localCheckpoint()
        audit("offset +0.4, rebuilt-sample",
          off, Similarity.pqSampleCodebooks(mix, m, ksub, dim / m))
        audit(s"offset +0.4, trained($iters)",
          off, Similarity.pqTrainCodebooks(mix, m, ksub, dim, iters))

      case "decade" =>
        val ixDir = java.nio.file.Files
          .createTempDirectory("pq-decade-ix").toString
        val cw = Similarity.pqSampleCodebooks(emb, m, ksub, dim / m)
        val t0 = System.nanoTime()
        Similarity.ivfPqWriteIndex(emb, cw, nCentroids, m, dim, ixDir)
        println(f"build+persist: ${(System.nanoTime() - t0) / 1e9}%.1f s")
        val q = emb.filter(col("vec_id") < 10)
        val (ts, rows) = timeIt(n)(
          Similarity.ivfPqSearchPersisted(spark, ixDir, emb, q,
            k = 5, nProbe = 4, m = m, dim = dim, rerank = 20).count())
        println(f"search leg (10 queries, nProbe=4): $ts%.2f s " +
          f"min-of-$n ($rows rows)")
        if (sys.env.contains("EXPLAIN")) {
          val df = Similarity.ivfPqSearchPersisted(spark, ixDir, emb, q,
            k = 5, nProbe = 4, m = m, dim = dim, rerank = 20)
          df.count()
          println(df.queryExecution.executedPlan.toString.take(12000))
        }
        val p = new org.apache.hadoop.fs.Path(ixDir)
        p.getFileSystem(spark.sparkContext.hadoopConfiguration)
          .delete(p, true)

      case "stages" =>
        // attribute the search-leg wall: build once, then time each
        // stage of ivfPqSearchPersisted in isolation
        val ixDir = java.nio.file.Files
          .createTempDirectory("pq-stages-ix").toString
        val cw0 = Similarity.pqSampleCodebooks(emb, m, ksub, dim / m)
        Similarity.ivfPqWriteIndex(emb, cw0, nCentroids, m, dim, ixDir)
        val q = emb.filter(col("vec_id") < 10)
        def stage(tag: String)(f: => Long): Unit = {
          val (t, rows) = timeIt(n)(f)
          println(f"$tag: $t%.2f s min-of-$n ($rows rows)")
        }
        stage("read codes (list+scan+count)")(
          spark.read.parquet(s"$ixDir/codes").count())
        stage("read centroids + collect")({
          spark.read.parquet(s"$ixDir/centroids").collect().length.toLong
        })
        stage("probes assignment (collect)")({
          val cb = spark.read.parquet(s"$ixDir/centroids").collect()
            .map { r =>
              val v = r.getSeq[Float](r.fieldIndex("c_emb"))
              var n2 = 0.0
              v.foreach(x => n2 += x.toDouble * x.toDouble)
              (r.getLong(r.fieldIndex("c_id")), v, math.sqrt(n2))
            }.sortBy(_._1).toSeq
          Similarity.assignedCells(
            q.select(col("vec_id").as("query_id"),
              col("embedding").as("q_emb")),
            cb, "query_id", "q_emb", 4)
            .select(col("query_id"), col("c_id")).count()
        })
        stage("full persisted search")(
          Similarity.ivfPqSearchPersisted(spark, ixDir, emb, q,
            k = 5, nProbe = 4, m = m, dim = dim, rerank = 20).count())
        val p2 = new org.apache.hadoop.fs.Path(ixDir)
        p2.getFileSystem(spark.sparkContext.hadoopConfiguration)
          .delete(p2, true)

      case "layout" =>
        val cw = Similarity.pqSampleCodebooks(emb, m, ksub, dim / m)
        val index = Similarity.ivfPqIndex(emb, cw, nCentroids, m, dim)
          .localCheckpoint()
        val cb = Similarity.collectCodebook(emb, "vec_id", "embedding",
          nCentroids)
        val scratch = java.nio.file.Files
          .createTempDirectory("pq-layout").toString
        // hive-partitioned layout (the shipped ivfPqWriteIndex shape)
        index.repartition(col("c_id"))
          .write.mode("overwrite").partitionBy("c_id")
          .parquet(s"$scratch/hive")
        val hive = spark.read.parquet(s"$scratch/hive")
          .withColumn("c_id", col("c_id").cast("long"))
        // bucketed layout (the scaladoc's cluster-scale claim)
        spark.sql("DROP TABLE IF EXISTS codes_bucketed")
        graft.sources.Sources.writeBucketed(index, "codes_bucketed",
          s"$scratch/bucketed", "c_id", 32)
        val bucketed = spark.table("codes_bucketed")

        def probesFor(q: DataFrame): DataFrame =
          Similarity.assignedCells(
            q.select(col("vec_id").as("query_id"),
              col("embedding").as("q_emb")),
            cb, "query_id", "q_emb", 2)
            .select(col("query_id"), col("c_id"))

        val smallProbes = probesFor(emb.filter(col("vec_id") < 10))
          .localCheckpoint()
        val bigProbes = probesFor(emb).localCheckpoint()
        println(s"probe sets: small=${smallProbes.count()} rows, " +
          s"big=${bigProbes.count()} rows")

        def leg(tag: String, probes: DataFrame, codes: DataFrame,
                bcast: Boolean): Unit = {
          val p = if (bcast) broadcast(probes) else probes
          val (t, rows) = timeIt(n)(
            p.join(codes, Seq("c_id"))
              .agg(count(lit(1)), sum(col("code"))).collect()(0).getLong(0))
          println(f"$tag: $t%.2f s min-of-$n ($rows join rows)")
        }
        leg("small-batch  hive+DPP     ", smallProbes, hive, bcast = true)
        leg("small-batch  bucketed     ", smallProbes, bucketed, bcast = true)
        leg("index-x-index hive (no bc)", bigProbes, hive, bcast = false)
        leg("index-x-index bucketed    ", bigProbes, bucketed, bcast = false)
        spark.sql("DROP TABLE IF EXISTS codes_bucketed")
        val sp = new org.apache.hadoop.fs.Path(scratch)
        sp.getFileSystem(spark.sparkContext.hadoopConfiguration)
          .delete(sp, true)

      case other => sys.error(s"unknown mode $other")
    }
    spark.stop()
  }
}
