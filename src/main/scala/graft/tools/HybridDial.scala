package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.ext.{Lexical, Similarity}

/** Hybrid-retrieval serve economics, measured
  * (`HybridDial <mult> [n]`): SynthGen documents + embeddings at
  * `mult` × the sf0.1 counts, both persisted indexes built once,
  * then min-of-`n` steady-state walls for
  *  - `serve`: [[Similarity.hybridServeTopK]] — BM25 leg reads the
  *    inverted index, vector leg reads the IVF-PQ index; zero
  *    corpus scans,
  *  - `onepass`: [[Similarity.hybridRrfTopK]] — both legs re-score
  *    the corpus (the batch posture the serve path displaces).
  * Claim under test: the serve wall is the SUM of the two persisted
  * leg walls (§43 PQ, §52 lex) plus a fusion term that never grows —
  * the fusion joins ≤ 2·depth rows whatever the corpus size — while
  * the one-pass wall is two corpus scans. Two term regimes as in
  * [[LexDial]]: common (postings ≈ corpus, the lex leg's worst case)
  * and selective (a 0.1% planted marker — the query class the
  * inverted index exists for).
  */
object HybridDial {
  def main(args: Array[String]): Unit = {
    val mult = args(0).toLong
    val n = if (args.length > 1) args(1).toInt else 3
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = graft.GraftConf.applyBase(SparkSession.builder()
        .master(s"local[$cpus]"), cpus.toInt)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val nDocs = 5000L * mult
    val dim = 64
    val m = 8
    // coarse centroids scale ~√corpus so cell size and cell count
    // grow together (the ivfPq sizing rule); nProbe stays 4
    val nCentroids = math.max(16,
      math.sqrt(nDocs.toDouble).toInt / 4)
    val root = java.nio.file.Files.createTempDirectory("hybrid-dial")
      .toString
    val common = Seq("spark", "merge", "window", "customer")
    val selective = Seq("rareterm123", "customer")
    val docs0 = graft.SynthGen.documents(spark, nDocs)
    // plant the selective marker on 0.1% of docs (the LexDial probe)
    val docs = docs0.withColumn("text",
      when(col("doc_id") % 1000 === 7,
        concat(col("text"), lit(" rareterm123"))).otherwise(col("text")))
    val emb = graft.SynthGen.embeddings(spark, nDocs, dim)
    val docsDir = s"$root/docs"; val embDir = s"$root/emb"
    docs.write.parquet(docsDir); emb.write.parquet(embDir)
    val docsDisk = spark.read.parquet(docsDir)
    val embDisk = spark.read.parquet(embDir)
    println(s"docs/vecs: $nDocs  nCentroids: $nCentroids")

    val lexDir = s"$root/lex"; val pqDir = s"$root/pq"
    def wall[T](f: => T): Double = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }
    def timeMin[T](tag: String)(f: => T): Double = {
      val walls = (1 to n).map(_ => wall(f))
      println(f"$tag: min ${walls.min}%.2f s  (runs ${
        walls.map(w => f"$w%.2f").mkString(" ")})")
      walls.min
    }
    println(f"build lex: ${wall(Lexical.lexWriteIndex(docsDisk,
      col("doc_id"), col("text"), lexDir, nBuckets = 64))}%.2f s")
    println(f"build pq:  ${wall(Similarity.ivfPqWriteIndex(embDisk,
      Similarity.pqSampleCodebooks(embDisk, m, 16, dim / m),
      nCentroids, m, dim, pqDir))}%.2f s")

    for ((tag, terms) <- Seq("common" -> common,
        "selective" -> selective)) {
      timeMin(s"serve $tag (two persisted indexes)")(
        Similarity.hybridServeTopK(spark, lexDir, pqDir, embDisk,
          terms, 0L, 10, depth = 20, nBuckets = 64, nProbe = 4,
          m = m, dim = dim, rerank = 20).collect())
      timeMin(s"onepass $tag (two corpus scans)")(
        Similarity.hybridRrfTopK(docsDisk, embDisk, terms, 0L, 10,
          depth = 20).collect())
    }

    // the REQUEST-BATCH sweep: the single-request rows above hide
    // the indexes' real economics (one query vector's brute scan is
    // cheap at any corpus the driver can host) — serving amortizes
    // both passes over |Q| requests while the per-request loop pays
    // |Q| stats hops, |Q| postings reads and |Q| searches
    val qSizes = if (args.length > 2)
      args(2).split(",").map(_.toInt).toSeq else Seq(8, 32)
    for (nq <- qSizes) {
      val qTerms = spark.range(nq).select(col("id").as("query_id"),
        explode(array(
          element_at(typedLit(common), (col("id") % 4 + 1).cast("int")),
          element_at(typedLit(common), ((col("id") + 1) % 4 + 1).cast("int"))))
          .as("term")).localCheckpoint()
      val qVecs = embDisk.filter(col("vec_id") < nq).localCheckpoint()
      timeMin(s"serve-batch |Q|=$nq (one pass each index)")(
        Similarity.hybridServeMany(spark, lexDir, pqDir, embDisk,
          qTerms, qVecs, 10, depth = 20, nBuckets = 64, nProbe = 4,
          m = m, dim = dim, rerank = 20).collect())
      val termSets = (0 until nq).map(i =>
        Seq(common(i % 4), common((i + 1) % 4)).distinct)
      timeMin(s"serve-loop |Q|=$nq (per-request calls)")(
        termSets.zipWithIndex.foreach { case (ts, i) =>
          Similarity.hybridServeTopK(spark, lexDir, pqDir, embDisk,
            ts, i.toLong, 10, depth = 20, nBuckets = 64, nProbe = 4,
            m = m, dim = dim, rerank = 20).collect()
        })
    }
    spark.stop()
  }
}
