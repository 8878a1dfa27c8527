package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.ext.{Corpus, Lexical}

/** Persisted-lexical-index economics, measured
  * (`LexDial <mult> [nBuckets] [n]`): SynthGen documents at
  * `mult` × the sf0.1 count (5,000·mult docs), then min-of-`n`
  * steady-state walls for
  *  - `build`: full index write (one-time ingest cost),
  *  - `search`: [[Lexical.lexSearchIndex]] over the persisted index
  *    (the per-query price of a deployment),
  *  - `onepass`: [[Corpus.bm25TopK]] re-scoring the corpus (the
  *    batch-posture baseline the search leg must beat),
  *  - `append`: a 1% batch through [[Lexical.lexAppendIndex]]
  *    (the day-2 ingest increment).
  * The claim under test: search tracks |postings of the query terms|
  * while onepass tracks |corpus| — the gap should WIDEN with mult.
  */
object LexDial {
  def main(args: Array[String]): Unit = {
    val mult = args(0).toLong
    val nBuckets = if (args.length > 1) args(1).toInt else 64
    val n = if (args.length > 2) args(2).toInt else 3
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = graft.GraftConf.applyBase(SparkSession.builder()
        .master(s"local[$cpus]"), cpus.toInt)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val common = Seq("spark", "merge", "window", "customer")
    // selective regime: a marker term planted on 0.1% of docs — the
    // rare-entity / exact-phrase query class an inverted index exists
    // for (SynthGen's 30-word vocab alone makes every term match
    // ~every doc, which only exercises the common-term regime)
    val selective = Seq("rareterm123", "customer")
    val nDocs = 5000L * mult
    val root = java.nio.file.Files.createTempDirectory("lex-dial").toString
    val dir = s"$root/ix"
    // corpus lives ON DISK for every leg: the one-pass baseline must
    // pay the same storage read a deployment pays, not a RAM replay
    graft.SynthGen.documents(spark, nDocs)
      .withColumn("text",
        when(col("doc_id") % 1000 === 0,
          concat(col("text"), lit(" rareterm123")))
          .otherwise(col("text")))
      .write.mode("overwrite").parquet(s"$root/docs")
    val docs = spark.read.parquet(s"$root/docs")
    println(s"docs: ${docs.count()}")
    def timeMin[T](tag: String)(f: => T): Double = {
      val walls = (1 to n).map { _ =>
        val t0 = System.nanoTime(); f
        (System.nanoTime() - t0) / 1e9
      }
      println(f"$tag: min ${walls.min}%.2f s  (runs ${walls.map(w => f"$w%.2f").mkString(" ")})")
      walls.min
    }
    timeMin("build")(
      graft.ext.Lexical.lexWriteIndex(docs, col("doc_id"), col("text"),
        dir, nBuckets))
    timeMin("search common (persisted)")(
      Lexical.lexSearchIndex(spark, dir, common, 20, nBuckets).count())
    timeMin("onepass common bm25TopK")(
      Corpus.bm25TopK(docs, col("doc_id"), col("text"), common, 20).count())
    timeMin("search selective (persisted)")(
      Lexical.lexSearchIndex(spark, dir, selective, 20, nBuckets).count())
    timeMin("onepass selective bm25TopK")(
      Corpus.bm25TopK(docs, col("doc_id"), col("text"), selective, 20)
        .count())
    val batch = docs.filter(col("doc_id") % 100 === 0)
      .select((col("doc_id") + nDocs).as("doc_id"), col("text"))
      .localCheckpoint()
    println(s"append batch: ${batch.count()}")
    timeMin("append 1%")(
      Lexical.lexAppendIndex(spark, batch, col("doc_id"), col("text"),
        dir, nBuckets))
    spark.stop()
  }
}
