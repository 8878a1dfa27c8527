package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.ext.Similarity

/** Persisted IVF-PQ index (build-once / search-many): the on-disk
  * layout carries no raw floats, the persisted search leg reproduces
  * the in-query result row-for-row, the probe join prunes the
  * cell-partitioned codes scan, and reuse is gated by the completion
  * marker. */
class PersistedPqSpec extends SparkSpec {

  private lazy val emb = spark.read.parquet(s"$sf/embeddings.parquet")
  private val dim = 64
  private val m = 8
  private val ksub = 16
  private val nCentroids = 16

  private def freshDir(): String =
    Files.createTempDirectory("pq-index-spec").toString

  private def build(dir: String): Unit =
    Similarity.ivfPqWriteIndex(emb,
      Similarity.pqSampleCodebooks(emb, m, ksub, dim / m),
      nCentroids, m, dim, dir)

  test("persisted search == in-query ivfPqTopK, row for row") {
    val dir = freshDir()
    build(dir)
    val q = emb.filter(col("vec_id") < 10)
    val persisted = Similarity.ivfPqSearchPersisted(spark, dir, emb, q,
        k = 5, nProbe = 4, m = m, dim = dim, rerank = 20)
      .orderBy("query_id", "rank").collect().toSeq
    val inQuery = Similarity.ivfPqTopK(emb, q, 5, nCentroids,
        nProbe = 4, m = m, ksub = ksub, dim = dim, rerank = 20)
      .orderBy("query_id", "rank").collect().toSeq
    assert(persisted.nonEmpty)
    assert(persisted == inQuery,
      "persisted search drifted from the in-query result")
  }

  test("codes relation on disk carries no float columns (32x claim)") {
    val dir = freshDir()
    build(dir)
    val codes = spark.read.parquet(s"$dir/codes")
    val floatish = codes.schema.fields.filter(f =>
      f.dataType.sql.toLowerCase.contains("float") ||
        f.dataType.sql.toLowerCase.contains("double"))
    assert(floatish.isEmpty,
      s"index codes leaked float columns: ${floatish.map(_.name).toSeq}")
    // exactly the (cand_id, sub, code) payload + the c_id partition col
    assert(codes.columns.sorted.toSeq ==
      Seq("c_id", "cand_id", "code", "sub"))
    // one directory per coarse cell: the unit partition pruning skips
    val cellDirs = new java.io.File(s"$dir/codes").listFiles()
      .filter(f => f.isDirectory && f.getName.startsWith("c_id="))
    assert(cellDirs.length > 1, "codes not partitioned by cell")
  }

  test("probe join prunes the partitioned codes scan (DPP or pushed)") {
    val dir = freshDir()
    build(dir)
    val q = emb.filter(col("vec_id") < 10)
    val plan = Similarity.ivfPqSearchPersisted(spark, dir, emb, q,
        k = 5, nProbe = 4, m = m, dim = dim, rerank = 20)
      .queryExecution.executedPlan.toString
    assert(plan.toLowerCase.contains("dynamicpruning"),
      "codes scan is not dynamic-partition-pruned — the search leg " +
        "would read every cell directory instead of the probed ones")
  }

  test("append path: build(base) + append(batch) searches == " +
      "build(base) with the batch encoded against base codebooks") {
    val dir = freshDir()
    val base = emb.filter(col("vec_id") < 400)
    val batch = emb.filter(col("vec_id") >= 400)
    Similarity.ivfPqWriteIndex(base,
      Similarity.pqSampleCodebooks(base, m, ksub, dim / m),
      nCentroids, m, dim, dir)
    Similarity.ivfPqAppendToIndex(spark, batch, m, dim, dir)
    val q = emb.filter(col("vec_id") < 10)
    val appended = Similarity.ivfPqSearchPersisted(spark, dir, emb, q,
        k = 5, nProbe = 4, m = m, dim = dim, rerank = 20)
      .orderBy("query_id", "rank").collect().toSeq
    // truth: the incremental contract — codebooks/centroids from the
    // BASE side only, full corpus searched
    val want = Similarity.ivfPqTopKWith(emb, q,
        Similarity.pqSampleCodebooks(base, m, ksub, dim / m),
        5, nCentroids, 4, m, dim, 20)
      .orderBy("query_id", "rank").collect().toSeq
    assert(appended.nonEmpty)
    assert(appended == want, "append path drifted from base-codebook truth")
  }

  test("rebuild policy: ivfPqRebuildIfDrifted consumes the drift " +
      "audit — below threshold appends stand, above it the rebuilt " +
      "index searches == a fresh full-corpus build row-for-row") {
    val dir = freshDir()
    val base = emb.filter(col("vec_id") < 400)
    val batch = emb.filter(col("vec_id") >= 400)
    Similarity.ivfPqWriteIndex(base,
      Similarity.pqSampleCodebooks(base, m, ksub, dim / m),
      nCentroids, m, dim, dir)
    Similarity.ivfPqAppendToIndex(spark, batch, m, dim, dir)
    val q = emb.filter(col("vec_id") < 10)
    def search() = Similarity.ivfPqSearchPersisted(spark, dir, emb, q,
        k = 5, nProbe = 4, m = m, dim = dim, rerank = 20)
      .orderBy("query_id", "rank").collect().toSeq
    val appended = search()
    // below threshold: no rebuild, the appended index stands untouched
    assert(!Similarity.ivfPqRebuildIfDrifted(spark, emb, splitId = 400L,
      nCentroids, m, ksub, dim, dir, thresholdPpm = Long.MaxValue))
    assert(search() == appended,
      "a declined rebuild must leave the index untouched")
    // above threshold (0 ppm = always): rebuild fires and the index
    // now equals a FRESH build over the full corpus, search for search
    assert(Similarity.ivfPqRebuildIfDrifted(spark, emb, splitId = 400L,
      nCentroids, m, ksub, dim, dir, thresholdPpm = 0L))
    assert(Similarity.ivfPqIndexExists(spark, dir),
      "rebuild must leave a complete index")
    val freshd = freshDir()
    Similarity.ivfPqWriteIndex(emb,
      Similarity.pqSampleCodebooks(emb, m, ksub, dim / m),
      nCentroids, m, dim, freshd)
    val want = Similarity.ivfPqSearchPersisted(spark, freshd, emb, q,
        k = 5, nProbe = 4, m = m, dim = dim, rerank = 20)
      .orderBy("query_id", "rank").collect().toSeq
    assert(search() == want,
      "rebuilt index must search identically to a fresh full build")
    // nothing appended since the rebuild -> no drift signal -> no-op
    assert(!Similarity.ivfPqRebuildIfDrifted(spark, emb,
      splitId = Long.MaxValue, nCentroids, m, ksub, dim, dir,
      thresholdPpm = 0L),
      "an empty appended slice must never trigger a rebuild")
  }

  test("pqIngestSink: streamed appends search identically to batch " +
      "append; replays append nothing") {
    import org.apache.spark.sql.types._
    val dir = freshDir()
    val srcDir = freshDir()
    val base = emb.filter(col("vec_id") < 400)
    val batch = emb.filter(col("vec_id") >= 400)
    Similarity.ivfPqWriteIndex(base,
      Similarity.pqSampleCodebooks(base, m, ksub, dim / m),
      nCentroids, m, dim, dir)
    // two stream files -> two micro-batches
    batch.filter(col("vec_id") % 2 === 0).coalesce(1)
      .write.mode("append").parquet(srcDir)
    batch.filter(col("vec_id") % 2 === 1).coalesce(1)
      .write.mode("append").parquet(srcDir)
    val schema = StructType(Seq(
      StructField("vec_id", LongType),
      StructField("embedding", ArrayType(FloatType)),
      StructField("label", IntegerType)))
    def run(ckpt: String) = {
      val q = graft.streaming.Streams.pqIngestSink(
        spark.readStream.schema(schema)
          .option("maxFilesPerTrigger", 1).parquet(srcDir),
        m, dim, dir, ckpt)
      try q.awaitTermination() finally q.stop()
    }
    run(Files.createTempDirectory("pq-ingest-ckpt").toString)
    val q10 = emb.filter(col("vec_id") < 10)
    val got = Similarity.ivfPqSearchPersisted(spark, dir, emb, q10,
        k = 5, nProbe = 4, m = m, dim = dim, rerank = 20)
      .orderBy("query_id", "rank").collect().toSeq
    val want = Similarity.ivfPqTopKWith(emb, q10,
        Similarity.pqSampleCodebooks(base, m, ksub, dim / m),
        5, nCentroids, 4, m, dim, 20)
      .orderBy("query_id", "rank").collect().toSeq
    assert(got.nonEmpty && got == want,
      "streamed index drifted from base-codebook truth")
    // replay with a FRESH checkpoint: the vec_id ledger (the codes
    // table itself) must reject every row
    val before = spark.read.parquet(s"$dir/codes").count()
    run(Files.createTempDirectory("pq-ingest-ckpt2").toString)
    assert(spark.read.parquet(s"$dir/codes").count() == before,
      "replayed ingest appended duplicate codes")
  }

  test("annServeSink: each trigger's served results == the batch " +
      "persisted search over that trigger's queries; replay is " +
      "bit-stable per batch_id") {
    import org.apache.spark.sql.types._
    val dir = freshDir()
    build(dir)
    val srcDir = freshDir()
    val outDir = freshDir() + "/served"
    // two query files -> two triggers (maxFilesPerTrigger=1)
    emb.filter(col("vec_id") < 5).coalesce(1)
      .write.mode("append").parquet(srcDir)
    emb.filter(col("vec_id") >= 5 && col("vec_id") < 10).coalesce(1)
      .write.mode("append").parquet(srcDir)
    val schema = StructType(Seq(
      StructField("vec_id", LongType),
      StructField("embedding", ArrayType(FloatType)),
      StructField("label", IntegerType)))
    val q = graft.streaming.Streams.annServeSink(
      spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1).parquet(srcDir),
      emb, dir, outDir, k = 5, nProbe = 4, m = m, dim = dim,
      rerank = 20,
      Files.createTempDirectory("ann-serve-ckpt").toString)
    try q.awaitTermination() finally q.stop()
    val served = spark.read.parquet(outDir)
    assert(served.select("batch_id").distinct().count() == 2,
      "two triggers must stamp two batch ids")
    // serving is stateless: the union of served rows equals one
    // batch search over the union of queries, column for column
    val got = served.drop("batch_id")
      .orderBy("query_id", "rank").collect().toSeq
    val want = Similarity.ivfPqSearchPersisted(spark, dir, emb,
        emb.filter(col("vec_id") < 10), k = 5, nProbe = 4, m = m,
        dim = dim, rerank = 20)
      .orderBy("query_id", "rank").collect().toSeq
    assert(got.nonEmpty && got == want,
      "served stream drifted from the batch persisted search")
    // per-trigger isolation: batch 0 served exactly the first file's
    // queries (each trigger answers only its own requests)
    val b0 = served.filter(col("batch_id") === 0)
      .select("query_id").distinct()
      .as[Long](org.apache.spark.sql.Encoders.scalaLong)
      .collect().toSet
    assert(b0 == (0L until 5L).toSet, s"batch 0 answered: $b0")
  }

  test("compaction: append -> compact -> search == pre-compaction " +
      "search row-for-row; file count shrinks, layout + marker survive") {
    val dir = freshDir()
    val base = emb.filter(col("vec_id") < 400)
    val batch = emb.filter(col("vec_id") >= 400)
    Similarity.ivfPqWriteIndex(base,
      Similarity.pqSampleCodebooks(base, m, ksub, dim / m),
      nCentroids, m, dim, dir)
    // two appends = the small-files accumulation compaction exists for
    Similarity.ivfPqAppendToIndex(spark,
      batch.filter(col("vec_id") % 2 === 0), m, dim, dir)
    Similarity.ivfPqAppendToIndex(spark,
      batch.filter(col("vec_id") % 2 === 1), m, dim, dir)
    val q = emb.filter(col("vec_id") < 10)
    def search(): Seq[org.apache.spark.sql.Row] =
      Similarity.ivfPqSearchPersisted(spark, dir, emb, q,
          k = 5, nProbe = 4, m = m, dim = dim, rerank = 20)
        .orderBy("query_id", "rank").collect().toSeq
    def parquetFiles(): Int = {
      def walk(f: java.io.File): Seq[java.io.File] =
        if (f.isDirectory) f.listFiles().toSeq.flatMap(walk) else Seq(f)
      walk(new java.io.File(s"$dir/codes"))
        .count(_.getName.endsWith(".parquet"))
    }
    val before = search()
    val nBefore = parquetFiles()
    Similarity.ivfPqCompactIndex(spark, dir)
    assert(Similarity.ivfPqIndexExists(spark, dir),
      "compaction lost the completion marker")
    assert(parquetFiles() < nBefore,
      s"compaction did not reduce file count ($nBefore)")
    val cellDirs = new java.io.File(s"$dir/codes").listFiles()
      .filter(f => f.isDirectory && f.getName.startsWith("c_id="))
    assert(cellDirs.length > 1,
      "compaction flattened the cell partitioning — DPP is gone")
    assert(search() == before,
      "search result drifted across compaction")
  }

  test("append racing compaction loses ZERO rows (maintenance lock): " +
      "appends block mid-compaction, land on the compacted table") {
    val dir = freshDir()
    val base = emb.filter(col("vec_id") < 300)
    Similarity.ivfPqWriteIndex(base,
      Similarity.pqSampleCodebooks(base, m, ksub, dim / m),
      nCentroids, m, dim, dir)
    // hammer the interleaving: one thread compacts repeatedly while
    // the other appends disjoint batches — without the lock this
    // drops whichever batch lands between a compaction's read and
    // its staged swap
    val batches = (0 until 4).map(i =>
      emb.filter(col("vec_id") >= 300 + i * 75 &&
        col("vec_id") < 300 + (i + 1) * 75).localCheckpoint())
    @volatile var compactErr: Option[Throwable] = None
    val compactor = new Thread(() => {
      try (1 to 4).foreach { _ =>
        Similarity.ivfPqCompactIndex(spark, dir)
      } catch { case t: Throwable => compactErr = Some(t) }
    })
    compactor.start()
    batches.foreach(b =>
      Similarity.ivfPqAppendToIndex(spark, b, m, dim, dir))
    compactor.join(300000)
    assert(compactErr.isEmpty, s"compactor failed: $compactErr")
    assert(!graft.meta.MaintenanceLock.isHeld(spark, dir))
    // zero loss: every appended vector has exactly m code rows
    val got = spark.read.parquet(s"$dir/codes")
      .groupBy("cand_id").count().collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val wantIds = emb.filter(col("vec_id") < 600)
      .select("vec_id").collect().map(_.getLong(0)).toSet
    assert(got.keySet == wantIds,
      s"rows lost in the race: missing ${wantIds -- got.keySet}")
    assert(got.values.forall(_ == m.toLong),
      "duplicated or partial code rows after the race")
  }

  test("reuse is gated by the completion marker; rebuild heals") {
    val dir = freshDir()
    assert(!Similarity.ivfPqIndexExists(spark, dir))
    build(dir)
    assert(Similarity.ivfPqIndexExists(spark, dir))
    // simulate a crash mid-build: marker gone -> not reusable
    new java.io.File(s"$dir/codes/_SUCCESS").delete()
    assert(!Similarity.ivfPqIndexExists(spark, dir))
    // rebuild over the partial output heals (mode=overwrite)
    build(dir)
    assert(Similarity.ivfPqIndexExists(spark, dir))
    val q = emb.filter(col("vec_id") < 3)
    assert(Similarity.ivfPqSearchPersisted(spark, dir, emb, q,
      k = 3, nProbe = 4, m = m, dim = dim, rerank = 10).count() > 0)
  }

  test("stale-sibling sweep: same fixture's old fingerprints only — " +
    "a canon that extends another with '-suffix' is not its sibling") {
    // the r10 collision: '-' is legal inside the sanitized canonical
    // path, so startsWith(canon + "-") matched fixture
    // /data/sf0.1-old's index from fixture /data/sf0.1's sweep and
    // deleted it after every publish
    val base = "_data_sf0.1-1a2b3c"
    assert(Queries.isStaleSibling(base, "_data_sf0.1-9f9f9f"),
      "older fingerprint of the same fixture must be swept")
    assert(!Queries.isStaleSibling(base, "_data_sf0.1-old-1a2b3c"),
      "a DIFFERENT fixture whose canon extends ours must survive")
    assert(!Queries.isStaleSibling(base, base),
      "the freshly published dir itself must survive")
    assert(!Queries.isStaleSibling(base, ".build-xyz"),
      "in-flight builder temp dirs must survive")
    // and the reverse direction: the longer canon's sweep must not
    // claim the shorter canon's index either
    assert(!Queries.isStaleSibling("_data_sf0.1-old-77aa", base))
  }

  test("sweep is AGE-GATED: a just-published old-fingerprint sibling " +
      "survives (a concurrent session may still be reading it); an " +
      "idle one is swept") {
    val parent = java.nio.file.Files
      .createTempDirectory("sweep-age-spec")
    val dest = parent.resolve("_data_sf0.1-aaaaaa")
    val fresh = parent.resolve("_data_sf0.1-bbbbbb")
    val idle = parent.resolve("_data_sf0.1-cccccc")
    Seq(dest, fresh, idle).foreach(java.nio.file.Files.createDirectory(_))
    assert(idle.toFile.setLastModified(
      System.currentTimeMillis - Queries.SweepAgeMs - 60000))
    Queries.sweepStaleSiblings(spark, dest)
    assert(dest.toFile.exists, "the published dir itself was swept")
    assert(fresh.toFile.exists,
      "a sibling younger than the grace period was swept — a " +
        "concurrent session on the old fingerprint loses its read")
    assert(!idle.toFile.exists,
      "an idle stale sibling survived — tmpdir leaks forever")
  }
}
