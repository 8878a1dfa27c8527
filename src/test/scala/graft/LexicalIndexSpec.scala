package graft

import org.apache.spark.sql.functions._
import graft.ext.{Lexical, Corpus}

/** Day-2 lifecycle pins for the persisted lexical index: search
  * parity with the one-pass bm25TopK, append ≡ rebuild, compaction
  * invariance, stats repair, and the driver/engine hash-twin. */
class LexicalIndexSpec extends SparkSpec {

  private def docs = spark.read.parquet(s"$sf/documents.parquet")
  private val terms = Seq("spark", "merge", "window", "customer")

  private def tmpDir(tag: String): String = {
    val d = java.nio.file.Files.createTempDirectory(s"lexspec-$tag-")
    java.nio.file.Files.deleteIfExists(d)
    d.toString
  }

  private def rows(df: org.apache.spark.sql.DataFrame) =
    df.collect().map(r => (r.getLong(0), r.getLong(1))).toSeq

  test("polyHashLocal is the engine kernel's exact driver twin") {
    val sample = terms :+ "zebra" :+ "a b" :+ ""
    val spark2 = spark
    import spark2.implicits._
    val viaEngine = sample.toDF("s")
      .select(col("s"), graft.functions.Hashing.polyHash(col("s")))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    sample.foreach { s =>
      assert(Lexical.polyHashLocal(s) == viaEngine(s), s"term '$s'")
    }
  }

  test("persisted search ≡ one-pass bm25TopK, row for row") {
    val dir = tmpDir("parity")
    Lexical.lexWriteIndex(docs, col("doc_id"), col("text"), dir, 16)
    val persisted = rows(Lexical.lexSearchIndex(spark, dir, terms, 20, 16))
    val onePass = rows(Corpus.bm25TopK(docs, col("doc_id"), col("text"),
      terms, 20))
    assert(persisted == onePass)
  }

  test("append ≡ rebuild: same search, same stats") {
    val full = tmpDir("full"); val inc = tmpDir("inc")
    Lexical.lexWriteIndex(docs, col("doc_id"), col("text"), full, 16)
    Lexical.lexWriteIndex(docs.filter(col("doc_id") < 30),
      col("doc_id"), col("text"), inc, 16)
    Lexical.lexAppendIndex(spark, docs.filter(col("doc_id") >= 30),
      col("doc_id"), col("text"), inc, 16)
    assert(rows(Lexical.lexSearchIndex(spark, inc, terms, 20, 16)) ==
      rows(Lexical.lexSearchIndex(spark, full, terms, 20, 16)))
    val sInc = Lexical.lexIndexStats(spark, inc).collect()(0)
    val sFull = Lexical.lexIndexStats(spark, full).collect()(0)
    assert(sInc.toSeq == sFull.toSeq)
  }

  test("compaction: one file per bucket, search unchanged") {
    val dir = tmpDir("compact")
    Lexical.lexWriteIndex(docs.filter(col("doc_id") < 30),
      col("doc_id"), col("text"), dir, 4)
    Lexical.lexAppendIndex(spark, docs.filter(col("doc_id") >= 30),
      col("doc_id"), col("text"), dir, 4)
    val before = rows(Lexical.lexSearchIndex(spark, dir, terms, 20, 4))
    Lexical.lexCompactIndex(spark, dir)
    assert(rows(Lexical.lexSearchIndex(spark, dir, terms, 20, 4)) == before)
    val root = new java.io.File(s"$dir/postings")
    val perBucket = root.listFiles().filter(_.getName.startsWith("bucket="))
    assert(perBucket.nonEmpty)
    perBucket.foreach { b =>
      val files = b.listFiles().filter(_.getName.endsWith(".parquet"))
      assert(files.length == 1, s"${b.getName}: ${files.length} files")
    }
  }

  test("lexRepairStats recovers exact stats from postings alone") {
    val dir = tmpDir("repair")
    Lexical.lexWriteIndex(docs, col("doc_id"), col("text"), dir, 8)
    val good = Lexical.lexIndexStats(spark, dir).collect()(0).toSeq
    // simulate the crash window: stats wiped (postings intact)
    val statsDir = new java.io.File(s"$dir/stats")
    statsDir.listFiles().foreach(_.delete())
    spark.range(0).select(lit(0L).as("seg"), lit(0L).as("n_docs"),
      lit(0L).as("toks")).write.mode("overwrite").parquet(s"$dir/stats")
    Lexical.lexRepairStats(spark, dir)
    assert(Lexical.lexIndexStats(spark, dir).collect()(0).toSeq == good)
  }

  test("search scan is bucket-pruned (partition filter in the plan)") {
    val dir = tmpDir("prune")
    Lexical.lexWriteIndex(docs, col("doc_id"), col("text"), dir, 16)
    val plan = Lexical.lexSearchIndex(spark, dir, Seq("spark"), 5, 16)
      .queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") &&
      plan.contains("bucket"), plan.take(2000))
  }

  test("lexSearchMany: a single-query batch equals lexSearchIndex " +
      "row for row; duplicate query rows don't double-count") {
    val spark2 = spark
    import spark2.implicits._
    val dir = tmpDir("many")
    Lexical.lexWriteIndex(docs, col("doc_id"), col("text"), dir, 16)
    val single = rows(Lexical.lexSearchIndex(spark, dir, terms, 20, 16))
    // the same term set as query 7, with one (query, term) row
    // duplicated: distinct() must make it harmless
    val q = (terms.map(7L -> _) :+ (7L -> terms.head))
      .toDF("query_id", "term")
    val batch = Lexical.lexSearchMany(spark, dir, q, 20, 16)
      .select("doc_id", "score_fp")
    assert(rows(batch) == single,
      "batch form drifted from the single-query form")
  }

  test("lexSearchMany: queries rank independently (a term set that " +
      "differs gets a different ranking)") {
    val spark2 = spark
    import spark2.implicits._
    val dir = tmpDir("many2")
    Lexical.lexWriteIndex(docs, col("doc_id"), col("text"), dir, 16)
    val q = Seq(0L -> "spark", 1L -> "customer").toDF("query_id", "term")
    val got = Lexical.lexSearchMany(spark, dir, q, 5, 16)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    val q0 = got.filter(_._1 == 0L).map(_._2)
    val q1 = got.filter(_._1 == 1L).map(_._2)
    assert(q0.nonEmpty && q1.nonEmpty)
    val w0 = rows(Lexical.lexSearchIndex(spark, dir, Seq("spark"), 5, 16))
      .map(_._1)
    val w1 = rows(Lexical.lexSearchIndex(spark, dir, Seq("customer"), 5,
      16)).map(_._1)
    assert(q0 == w0 && q1 == w1,
      "per-query rankings drifted from the single-query form")
  }
}
