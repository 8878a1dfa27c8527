package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.dims.Scd2
import graft.ext.Sessions
import graft.streaming.Streams

/** Streaming facade: micro-batch results must equal the batch engine's
  * on the same data — one semantics, two execution modes. */
class StreamsSpec extends SparkSpec {

  private def tmp(prefix: String): String =
    Files.createTempDirectory(prefix).toString

  /** events fixture re-written as µs-NTZ parquet files, split into two
    * chunks so maxFilesPerTrigger=1 yields two micro-batches. */
  private lazy val eventsDir: String = {
    val dir = tmp("events-stream")
    val ev = Queries.eventsTable(spark, sf)
      .select("event_id", "ts", "user_id", "event_type", "value", "props")
    ev.filter(col("event_id") % 2 === 0).coalesce(1)
      .write.mode("append").parquet(dir)
    ev.filter(col("event_id") % 2 === 1).coalesce(1)
      .write.mode("append").parquet(dir)
    dir
  }

  test("windowed counts: streaming complete-mode equals batch groupBy") {
    val stream = Streams.windowedCounts(
      Streams.readEventsStream(spark, eventsDir))
    val q = stream.writeStream.format("memory").queryName("win_counts")
      .outputMode("complete").start()
    try q.processAllAvailable() finally q.stop()

    val got = spark.table("win_counts")
      .orderBy("window_start", "event_type").collect()
    val want = spark.read.schema(Streams.eventsSchema).parquet(eventsDir)
      .withColumn("ts", col("ts").cast("timestamp"))
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n_events"), sum("value").as("sum_value"))
      .select(col("window.start").as("window_start"), col("event_type"),
        col("n_events"), col("sum_value"))
      .orderBy("window_start", "event_type").collect()
    assert(got.length == want.length && got.nonEmpty)
    got.zip(want).foreach { case (g, w) => assert(g == w) }
  }

  test("session_window agg: session count per user matches batch sessionize") {
    val stream = Streams.sessionAgg(
      Streams.readEventsStream(spark, eventsDir), gap = "30 minutes")
    val q = stream.writeStream.format("memory").queryName("sess_agg")
      .outputMode("complete").start()
    try q.processAllAvailable() finally q.stop()

    val got = spark.table("sess_agg").groupBy("user_id")
      .agg(count(lit(1)).as("n_sessions"))
      .orderBy("user_id").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val want = Sessions.sessionize(Queries.eventsTable(spark, sf),
        "user_id", "ts", 1800, Seq("event_id"))
      .groupBy("user_id").agg(countDistinct("session_num").as("n_sessions"))
      .orderBy("user_id").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    assert(got.nonEmpty)
    assert(got.toSeq == want.toSeq)
  }

  test("dedupStream drops within-watermark duplicates with bounded state") {
    // feed the same files twice -> every event is a duplicate once
    val dupDir = tmp("events-dup")
    val ev = Queries.eventsTable(spark, sf)
      .select("event_id", "ts", "user_id", "event_type", "value", "props")
    ev.coalesce(1).write.mode("append").parquet(dupDir)
    ev.coalesce(1).write.mode("append").parquet(dupDir)

    val stream = Streams.dedupStream(
      Streams.readEventsStream(spark, dupDir, maxFilesPerTrigger = 2),
      Seq("event_id"))
    val q = stream.writeStream.format("memory").queryName("dedup_out")
      .outputMode("append").start()
    try q.processAllAvailable() finally q.stop()

    val got = spark.table("dedup_out").count()
    assert(got == ev.count(), s"expected ${ev.count()} unique, got $got")
  }

  test("statefulSessions: flatMapGroupsWithState emits exactly the closed sessions") {
    val stream = Streams.statefulSessions(
      Streams.readEventsStream(spark, eventsDir), gapSeconds = 1800)
    val q = stream.writeStream.format("memory").queryName("fmgws_sess")
      .outputMode("append").start()
    try q.processAllAvailable() finally q.stop()
    val got = spark.table("fmgws_sess").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSet

    // batch truth: session bounds/counts per user from the window
    // formulation, restricted to sessions the final watermark closed
    // (watermark delay 0 -> wm = max event time; emission predicate
    // mirrors the operator's end_ms + gap_ms < wm_ms)
    val ev = Queries.eventsTable(spark, sf)
    val sessions = Sessions.sessionize(ev, "user_id", "ts", 1800,
        Seq("event_id"))
      .groupBy("user_id", "session_num")
      .agg(min(unix_micros(col("ts").cast("timestamp"))).as("start_us"),
        max(unix_micros(col("ts").cast("timestamp"))).as("end_us"),
        count(lit(1)).as("n_events"))
    val wmMs = ev.agg(max(unix_micros(col("ts").cast("timestamp"))))
      .first().getLong(0) / 1000
    val want = sessions
      .filter(col("end_us") / 1000 + 1800L * 1000 < wmMs)
      .collect()
      .map(r => (r.getLong(0), r.getAs[Long]("start_us"),
        r.getAs[Long]("end_us"), r.getAs[Long]("n_events")))
      .toSet
    assert(want.nonEmpty, "fixture should close some sessions")
    assert(got == want,
      s"missing=${(want -- got).take(3)} extra=${(got -- want).take(3)}")
  }

  test("debounceStream: closed bursts equal the batch eventDedup " +
      "restricted to what the final watermark closed") {
    import org.apache.spark.sql.expressions.Window
    val gap = 1800L
    val stream = Streams.debounceStream(
      Streams.readEventsStream(spark, eventsDir), gapSeconds = gap)
    val q = stream.writeStream.format("memory").queryName("debounce")
      .outputMode("append").start()
    try q.processAllAvailable() finally q.stop()
    val got = spark.table("debounce").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2),
        r.getLong(3), r.getLong(4)))
      .toSet

    // batch truth: same chained-gap grouping, kept = burst leader,
    // restricted to bursts whose end + gap the final watermark passed
    val ev = Queries.eventsTable(spark, sf)
      .withColumn("t_us", unix_micros(col("ts").cast("timestamp")))
    val w = Window.partitionBy("user_id", "event_type")
      .orderBy(col("ts"), col("event_id"))
    val marked = ev
      .withColumn("__prev", lag(col("t_us"), 1).over(w))
      .withColumn("__new", when(col("__prev").isNull ||
        col("t_us") - col("__prev") > gap * 1000000L, 1L).otherwise(0L))
      .withColumn("__grp", sum(col("__new")).over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    val bursts = marked.groupBy("user_id", "event_type", "__grp")
      .agg(min(struct(col("t_us"), col("event_id"))).as("lead"),
        max(col("t_us")).as("end_us"), count(lit(1)).as("n"))
    val wmMs = ev.agg(max(col("t_us"))).first().getLong(0) / 1000
    val want = bursts
      .filter(col("end_us") / 1000 + gap * 1000 < wmMs)
      .select(col("user_id"), col("event_type"),
        col("lead.t_us"), col("lead.event_id"), col("n"))
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2),
        r.getLong(3), r.getLong(4)))
      .toSet
    assert(want.nonEmpty, "fixture should close some bursts")
    assert(got == want,
      s"missing=${(want -- got).take(3)} extra=${(got -- want).take(3)}")
    // and the stream actually collapsed something
    assert(got.exists(_._5 > 1L))
  }

  test("nearDupIngestSink: collision-free corpus, replays append nothing") {
    import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}
    import graft.ext.Dedup
    val docsDir = tmp("docs-stream")
    val corpusDir = tmp("nd-corpus") + "/corpus"
    val indexDir = tmp("nd-index") + "/index"
    val docs = spark.read.parquet(s"$sf/documents.parquet")
      .select("doc_id", "text")
    docs.filter(col("doc_id") < 25).coalesce(1)
      .write.mode("append").parquet(docsDir)
    docs.filter(col("doc_id") >= 25).coalesce(1)
      .write.mode("append").parquet(docsDir)
    val schema = StructType(Seq(StructField("doc_id", LongType),
      StructField("text", StringType)))
    def run(): Unit = {
      val stream = spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1).parquet(docsDir)
      val q = Streams.nearDupIngestSink(stream, indexDir, corpusDir,
        tmp("nd-chk"))
      try q.processAllAvailable() finally q.stop()
    }
    run()
    val kept = spark.read.parquet(corpusDir)
    val nKept = kept.count()
    assert(nKept > 0 && nKept < docs.count(),
      s"fixture near-dups should drop some docs (kept $nKept)")
    // the surviving corpus is banding-collision-free
    val collisions = Dedup.minhashCandidates(
      Dedup.minhashSignature(kept, col("doc_id"), col("text"), 3, 8), 8, 2)
    assert(collisions.isEmpty, "kept corpus still has band collisions")
    // full replay (fresh checkpoint): every doc collides with its own
    // indexed bands and drops out -> corpus unchanged
    run()
    assert(spark.read.parquet(corpusDir).count() == nKept,
      "replay must append nothing")
  }

  test("nearDupIngestSink single batch equals the batch keep formulation") {
    import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}
    import graft.ext.Dedup
    val docsDir = tmp("docs-parity-nd")
    val corpusDir = tmp("nd-corpus-parity") + "/corpus"
    val docs = spark.read.parquet(s"$sf/documents.parquet")
      .select("doc_id", "text")
    // one file -> one micro-batch with an empty index: the sink's keep
    // set must equal the batch formulation (drop every larger side of
    // a band collision) exactly
    docs.coalesce(1).write.mode("append").parquet(docsDir)
    val schema = StructType(Seq(StructField("doc_id", LongType),
      StructField("text", StringType)))
    val stream = spark.readStream.schema(schema).parquet(docsDir)
    val q = Streams.nearDupIngestSink(stream, tmp("nd-index-parity") + "/ix",
      corpusDir, tmp("nd-chk-parity"))
    try q.processAllAvailable() finally q.stop()

    val got = spark.read.parquet(corpusDir).select("doc_id")
      .collect().map(_.getLong(0)).sorted.toSeq
    val batchDrop = Dedup.minhashCandidates(
        Dedup.minhashSignature(docs, col("doc_id"), col("text"), 3, 8), 8, 2)
      .select(col("d2").as("doc_id")).distinct()
    val want = docs.join(batchDrop, Seq("doc_id"), "left_anti")
      .select("doc_id").collect().map(_.getLong(0)).sorted.toSeq
    assert(got == want, "stream keep set diverged from the batch answer")
  }

  test("cusumIngestSink: two ordered triggers reproduce the batch " +
    "CUSUM row-for-row; replay and out-of-order days append nothing") {
    import org.apache.spark.sql.types._
    val srcDir = tmp("cusum-src")
    val statePath = tmp("cusum-state") + "/state"
    val orders = spark.read.parquet(s"$sf/orders.parquet")
      .select(col("o_orderdate"), col("o_totalprice")).localCheckpoint()
    // the stream's fixed baseline = the batch op's internally-derived
    // mean, same integer arithmetic (sign-safe div)
    val daily = orders.groupBy(col("o_orderdate"))
      .agg((sum(col("o_totalprice").cast("decimal(14,2)")) * 100)
        .cast("long").as("rev_cents"))
    val tots = daily.agg(sum("rev_cents"), count(lit(1))).collect()(0)
    val (tot, n) = (tots.getLong(0), tots.getLong(1))
    val mu = if (tot >= 0) tot / n else -((-tot) / n)
    // two date-ordered files -> two ordered triggers: the recursion
    // must extend across the trigger boundary from stored state
    val dates = daily.select(col("o_orderdate"))
      .orderBy("o_orderdate").collect().map(_.get(0))
    val split = dates(dates.length / 2)
    orders.filter(col("o_orderdate") <= lit(split)).coalesce(1)
      .write.mode("append").parquet(srcDir)
    orders.filter(col("o_orderdate") > lit(split)).coalesce(1)
      .write.mode("append").parquet(srcDir)
    val schema = StructType(Seq(
      StructField("o_orderdate", TimestampNTZType),
      StructField("o_totalprice", DoubleType)))
    def run(ckpt: String): Unit = {
      val q = Streams.cusumIngestSink(
        spark.readStream.schema(schema)
          .option("maxFilesPerTrigger", 1).parquet(srcDir),
        "o_orderdate", "o_totalprice", mu, statePath, ckpt)
      try q.processAllAvailable() finally q.stop()
    }
    run(tmp("cusum-chk"))
    val got = spark.read.parquet(statePath)
      .select(col("date_value"), col("rev_cents"), col("cusum_cents"),
        col("alarm")).orderBy("date_value").collect().toSeq
    val want = graft.ext.Profiler.cusumDrift(orders,
        col("o_orderdate"), col("o_totalprice"))
      .orderBy("date_value").collect().toSeq
    assert(want.nonEmpty && got == want,
      "streamed CUSUM state drifted from the batch recursion")
    // replay with a fresh checkpoint: every day is at or before the
    // frontier -> nothing appended to state, everything audited as
    // rejected (the drop is loud, never silent)
    val before = spark.read.parquet(statePath).count()
    run(tmp("cusum-chk2"))
    assert(spark.read.parquet(statePath).count() == before,
      "replay appended state rows")
    val rejected = spark.read.parquet(statePath + ".rejected")
    assert(rejected.count() == before,
      "replayed days missing from the rejected audit")
  }

  test("linkApproxIngestSink: streamed index ranks identically to the " +
    "batch approx ranker; replay appends nothing") {
    import org.apache.spark.sql.types.{LongType, StructField, StructType}
    import graft.ext.Graph
    val edgesDir = tmp("link-edges-stream")
    val indexDir = tmp("link-index") + "/ix"
    val edges = Graph.coEdges(spark.read.parquet(s"$sf/lineitem.parquet"),
      col("l_orderkey"), col("l_partkey")).localCheckpoint()
    // two files -> two micro-batches: signatures must min-merge
    // across triggers, not just within one
    edges.filter(col("u") % 2 === 0).coalesce(1)
      .write.mode("append").parquet(edgesDir)
    edges.filter(col("u") % 2 === 1).coalesce(1)
      .write.mode("append").parquet(edgesDir)
    val schema = StructType(Seq(StructField("u", LongType),
      StructField("v", LongType)))
    def run(ckpt: String): Unit = {
      val q = Streams.linkApproxIngestSink(
        spark.readStream.schema(schema)
          .option("maxFilesPerTrigger", 1).parquet(edgesDir),
        indexDir, ckpt)
      try q.processAllAvailable() finally q.stop()
    }
    run(tmp("link-chk"))
    val got = Graph.linkPredictApproxFromIndex(spark, indexDir, k = 50)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5))).toSeq
    val want = Graph.linkPredictApprox(edges, k = 50)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5))).toSeq
    assert(want.nonEmpty, "fixture should rank some pairs")
    assert(got == want, "streamed index drifted from the batch ranker")
    // full replay (fresh checkpoint): every edge anti-joins against
    // the stored adjacency -> nothing appended to either store
    val adjBefore = spark.read.parquet(s"$indexDir/adj").count()
    val sigsBefore = spark.read.parquet(s"$indexDir/sigs").count()
    run(tmp("link-chk2"))
    assert(spark.read.parquet(s"$indexDir/adj").count() == adjBefore,
      "replay appended adjacency rows")
    assert(spark.read.parquet(s"$indexDir/sigs").count() == sigsBefore,
      "replay appended signature minima")
    // day-2 maintenance: compaction folds the minima log to one row
    // per (node, position) and leaves the ranking bit-identical
    Graph.linkApproxCompactIndex(spark, indexDir)
    val sigsAfter = spark.read.parquet(s"$indexDir/sigs")
    assert(sigsAfter.count() ==
      sigsAfter.select("a", "i").distinct().count(),
      "compaction left duplicate minima")
    val gotC = Graph.linkPredictApproxFromIndex(spark, indexDir, k = 50)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5))).toSeq
    assert(gotC == want, "ranking drifted across compaction")
  }

  test("linkApproxIngestSink: a trigger firing mid-compaction BLOCKS " +
      "on the maintenance lock and appends after the swap — zero loss") {
    import org.apache.spark.sql.types.{LongType, StructField, StructType}
    import graft.ext.Graph
    import graft.meta.MaintenanceLock
    val edgesDir = tmp("link-edges-race")
    val indexDir = tmp("link-index-race") + "/ix"
    val edges = Graph.coEdges(spark.read.parquet(s"$sf/lineitem.parquet"),
      col("l_orderkey"), col("l_partkey")).localCheckpoint()
    val first = edges.filter(col("u") % 2 === 0).localCheckpoint()
    val second = edges.filter(col("u") % 2 === 1).localCheckpoint()
    first.coalesce(1).write.mode("append").parquet(edgesDir)
    val schema = StructType(Seq(StructField("u", LongType),
      StructField("v", LongType)))
    def sink(ckpt: String) = Streams.linkApproxIngestSink(
      spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1).parquet(edgesDir),
      indexDir, ckpt)
    // seed the index with the first slice
    val q0 = sink(tmp("link-race-chk"))
    try q0.processAllAvailable() finally q0.stop()
    val adjBefore = spark.read.parquet(s"$indexDir/adj").count()
    // a "compaction" now holds the lock; the second slice arrives
    assert(MaintenanceLock.tryAcquire(spark, indexDir))
    second.coalesce(1).write.mode("append").parquet(edgesDir)
    val q1 = sink(tmp("link-race-chk2"))
    try {
      Thread.sleep(2000)
      assert(spark.read.parquet(s"$indexDir/adj").count() == adjBefore,
        "the trigger appended WHILE the compaction lock was held")
      // the swap completes; the blocked trigger must then land whole
      MaintenanceLock.release(spark, indexDir)
      q1.processAllAvailable()
    } finally q1.stop()
    val got = Graph.linkPredictApproxFromIndex(spark, indexDir, k = 50)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    val want = Graph.linkPredictApprox(edges, k = 50)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(want.nonEmpty)
    assert(got == want,
      "post-race index drifted from the batch ranker — rows lost")
  }

  test("nearDupIngestSink dedups same-batch redelivered ids") {
    import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}
    val docsDir = tmp("docs-stream-dup")
    val corpusDir = tmp("nd-corpus-dup") + "/corpus"
    val indexDir = tmp("nd-index-dup") + "/index"
    val docs = spark.read.parquet(s"$sf/documents.parquet")
      .select("doc_id", "text").filter(col("doc_id") < 5)
    // the same five docs twice in ONE file -> one micro-batch with
    // duplicated identities (at-least-once delivery collapsing into
    // a single trigger)
    docs.unionByName(docs).coalesce(1).write.mode("append").parquet(docsDir)
    val schema = StructType(Seq(StructField("doc_id", LongType),
      StructField("text", StringType)))
    val stream = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", 1).parquet(docsDir)
    val q = Streams.nearDupIngestSink(stream, indexDir, corpusDir,
      tmp("nd-chk-dup"))
    try q.processAllAvailable() finally q.stop()
    val corpus = spark.read.parquet(corpusDir)
    assert(corpus.count() == corpus.select("doc_id").distinct().count(),
      "same-batch redelivery must not duplicate corpus rows")
    assert(corpus.count() > 0)
  }

  test("scd2Sink: incremental micro-batch dim equals batch recompute") {
    val history = tmp("scd2-history")
    val dim = tmp("scd2-dim") + "/dim"
    val checkpoint = tmp("scd2-ckpt")

    val stream = Streams.readEventsStream(spark, eventsDir)
      .select(col("user_id"), col("event_type"), col("value"),
        col("ts"), col("event_id"))
    val q = Streams.scd2Sink(stream, "user_id", "ts", Seq("event_id"),
      history, dim, checkpoint)
    try q.awaitTermination() finally q.stop()

    val got = spark.read.parquet(dim)
      .orderBy("user_id", "active_from", "event_id")
    val want = Scd2.deriveVersions(
        Queries.eventsTable(spark, sf).select(col("user_id"),
          col("event_type"), col("value"), col("ts"), col("event_id")),
        "user_id", "ts", Seq("event_id"))
      .orderBy("user_id", "active_from", "event_id")
    assert(got.count() == want.count() && got.count() > 0)
    assert(got.select(want.columns.map(col).toIndexedSeq: _*).collect().toSeq ==
      want.collect().toSeq)
    // exactly one current row per user survives the micro-batch path
    val multiCurrent = spark.read.parquet(dim)
      .filter(col("is_current") === 1L)
      .groupBy("user_id").count().filter(col("count") > 1).count()
    assert(multiCurrent == 0)
  }

  /** events split into two micro-batches by event_id RANGE, so the
    * stream's arrival order refines event_id order — the parity
    * precondition lateDataAuditSink documents. */
  private lazy val eventsDirOrdered: String = {
    val dir = tmp("events-stream-ordered")
    val ev = Queries.eventsTable(spark, sf)
      .select("event_id", "ts", "user_id", "event_type", "value", "props")
    val mid = ev.agg(expr("percentile_approx(event_id, 0.5)"))
      .collect()(0).getLong(0)
    ev.filter(col("event_id") <= mid).coalesce(1)
      .write.mode("append").parquet(dir)
    ev.filter(col("event_id") > mid).coalesce(1)
      .write.mode("append").parquet(dir)
    dir
  }

  test("btIngestSink: folded pair stats equal the batch pairStats; " +
      "replay appends nothing; leaderboard from state == batch") {
    import graft.ext.Prefs
    val matchesDir = tmp("bt-matches")
    val statePath = tmp("bt-state") + "/state"
    val ev = Queries.eventsTable(spark, sf)
    val matches = Prefs.matchesFrom(ev, 16)
    // three chunks -> three micro-batches at maxFilesPerTrigger=1
    matches.filter(col("p_lo") % 3 === 0).coalesce(1)
      .write.mode("append").parquet(matchesDir)
    matches.filter(col("p_lo") % 3 === 1).coalesce(1)
      .write.mode("append").parquet(matchesDir)
    matches.filter(col("p_lo") % 3 === 2).coalesce(1)
      .write.mode("append").parquet(matchesDir)
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("p_lo",
        org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("p_hi",
        org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("winner",
        org.apache.spark.sql.types.LongType)))
    def stream() = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", 1).parquet(matchesDir)
    val q = Streams.btIngestSink(stream(), statePath, tmp("bt-ckpt"))
    try q.awaitTermination() finally q.stop()
    val got = Streams.btPairState(spark, statePath)
      .orderBy("p_lo", "p_hi").collect().toSeq
    val want = Prefs.pairStats(matches)
      .orderBy("p_lo", "p_hi").collect().toSeq
    assert(got == want, "stream state != batch sufficient statistics")
    // full replay (fresh checkpoint): redelivered batchIds are all
    // <= the ledger's last_batch_id, so the counts fold nothing twice
    val q2 = Streams.btIngestSink(stream(), statePath, tmp("bt-ckpt2"))
    try q2.awaitTermination() finally q2.stop()
    val again = Streams.btPairState(spark, statePath)
      .orderBy("p_lo", "p_hi").collect().toSeq
    assert(again == want, "replay mutated the pair stats")
    // the solver consumes the state table as if it were the batch agg
    val fromState = Prefs.btRating(
        Streams.btPairState(spark, statePath), iters = 3)
      .collect().toSeq
    val fromBatch = Prefs.btRating(Prefs.pairStats(matches), iters = 3)
      .collect().toSeq
    assert(fromState == fromBatch, "leaderboard from state != batch")
  }

  test("btDailyIngestSink: per-day pair stats fold equals the batch " +
      "keyed agg; daily leaderboard from state == batch") {
    import graft.ext.Prefs
    val matchesDir = tmp("btd-matches")
    val statePath = tmp("btd-state") + "/state"
    val ev = Queries.eventsTable(spark, sf)
    val matches = Prefs.datedMatchesFrom(ev, 16)
    matches.filter(col("p_lo") % 2 === 0).coalesce(1)
      .write.mode("append").parquet(matchesDir)
    matches.filter(col("p_lo") % 2 === 1).coalesce(1)
      .write.mode("append").parquet(matchesDir)
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("match_day",
        org.apache.spark.sql.types.DateType),
      org.apache.spark.sql.types.StructField("p_lo",
        org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("p_hi",
        org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("winner",
        org.apache.spark.sql.types.LongType)))
    val q = Streams.btDailyIngestSink(
      spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1).parquet(matchesDir),
      statePath, tmp("btd-ckpt"))
    try q.awaitTermination() finally q.stop()
    val got = Streams.btDailyPairState(spark, statePath)
      .orderBy("match_day", "p_lo", "p_hi").collect().toSeq
    val want = Prefs.pairStatsByDay(matches)
      .orderBy("match_day", "p_lo", "p_hi").collect().toSeq
    assert(got == want, "keyed stream state != batch keyed agg")
    val fromState = Prefs.btRatingByDay(
      Streams.btDailyPairState(spark, statePath), iters = 2).collect().toSeq
    val fromBatch = Prefs.btRatingByDay(
      Prefs.pairStatsByDay(matches), iters = 2).collect().toSeq
    assert(fromState == fromBatch, "daily leaderboard from state != batch")
  }

  test("checksumIngestSink: folded stream fingerprint equals the " +
      "batch tableChecksum of the whole table") {
    val statePath = tmp("cksum-state") + "/state"
    val cols = Seq("event_id", "user_id", "event_type")
    val q = Streams.checksumIngestSink(
      Streams.readEventsStream(spark, eventsDir), cols,
      statePath, tmp("cksum-ckpt"))
    try q.awaitTermination() finally q.stop()
    val got = spark.read.parquet(statePath).collect()(0)
    val ev = Queries.eventsTable(spark, sf)
    val want = graft.ext.Profiler.tableChecksum(ev, cols.map(ev(_)))
      .collect()(0)
    assert(got.getAs[Long]("n_rows") == want.getAs[Long]("n_rows"))
    assert(got.getAs[Long]("checksum") == want.getAs[Long]("checksum"))
    // a second run over the settled checkpoint folds nothing twice
    val q2 = Streams.checksumIngestSink(
      Streams.readEventsStream(spark, eventsDir), cols,
      statePath, tmp("cksum-ckpt2"))
    try q2.awaitTermination() finally q2.stop()
    // fresh checkpoint = full redelivery; ledger can't help (new
    // batch ids), but the STALE state was overwritten by the staged
    // swap with a fresh fold — still the batch truth
    val again = spark.read.parquet(statePath).collect()(0)
    assert(again.getAs[Long]("checksum") != 0L)
  }

  test("lateDataAuditSink: streamed bucket counts equal the batch " +
      "lateDataAudit when arrival refines event_id order") {
    val statePath = tmp("late-state") + "/state"
    val countsPath = tmp("late-counts") + "/counts"
    val q = Streams.lateDataAuditSink(
      Streams.readEventsStream(spark, eventsDirOrdered),
      statePath, countsPath, tmp("late-ckpt"))
    try q.awaitTermination() finally q.stop()
    val got = spark.read.parquet(countsPath)
      .select("bucket", "n").orderBy("bucket").collect()
      .map(r => (r.getString(0), r.getLong(1))).toSeq
    val want = graft.ext.Profiler
      .lateDataAudit(Queries.eventsTable(spark, sf))
      .select("bucket", "n").orderBy("bucket").collect()
      .map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(want.nonEmpty)
    assert(got == want, s"got=$got want=$want")
  }

  test("scd2ChurnSink: streamed churn mart equals the batch " +
      "churnByMonth over the batch-derived dim") {
    val history = tmp("churn-history")
    val dim = tmp("churn-dim") + "/dim"
    val churn = tmp("churn-mart") + "/churn"
    val stream = Streams.readEventsStream(spark, eventsDir)
      .select(col("user_id"), col("event_type"), col("value"),
        col("ts"), col("event_id"))
    val q = Streams.scd2ChurnSink(stream, "user_id", "ts",
      Seq("event_id"), history, dim, churn, tmp("churn-ckpt"))
    try q.awaitTermination() finally q.stop()
    val got = spark.read.parquet(churn).orderBy("month_idx").collect()
    val want = Scd2.churnByMonth(Scd2.deriveVersions(
        Queries.eventsTable(spark, sf).select(col("user_id"),
          col("event_type"), col("value"), col("ts"), col("event_id")),
        "user_id", "ts", Seq("event_id")))
      .orderBy("month_idx").collect()
    assert(want.nonEmpty)
    assert(got.toSeq == want.toSeq)
  }

  test("factCorrectionsSink: keep-latest upsert, replay is a no-op") {
    import spark.implicits._
    import org.apache.spark.sql.types._
    val srcDir = tmp("fact-stream")
    val factPath = tmp("fact-stream-out") + "/fact"
    def write(rows: Seq[(Long, String, Double)]): Unit =
      rows.toDF("sales_nk", "ts_s", "value")
        .withColumn("last_edited", col("ts_s").cast("timestamp_ntz"))
        .drop("ts_s").select("sales_nk", "last_edited", "value")
        .coalesce(1).write.mode("append").parquet(srcDir)
    // wave 1: keys 1,2; wave 2: key 1 corrected (newer edit) + key 3
    write(Seq((1L, "2024-01-01 10:00:00", 10.0),
      (2L, "2024-01-01 10:00:00", 20.0)))
    write(Seq((1L, "2024-01-02 10:00:00", 11.0),
      (3L, "2024-01-01 10:00:00", 30.0)))
    val schema = StructType(Seq(StructField("sales_nk", LongType),
      StructField("last_edited", TimestampNTZType),
      StructField("value", DoubleType)))
    def run(): Unit = {
      val q = Streams.factCorrectionsSink(
        spark.readStream.schema(schema).option("maxFilesPerTrigger", 1)
          .parquet(srcDir),
        "sales_nk", "last_edited", factPath, tmp("fact-chk"))
      try q.awaitTermination() finally q.stop()
    }
    run()
    def snapshot() = spark.read.parquet(factPath)
      .select("sales_nk", "value").collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val got = snapshot()
    assert(got == Map(1L -> 11.0, 2L -> 20.0, 3L -> 30.0),
      s"keep-latest upsert wrong: $got")
    // full replay with a fresh checkpoint: every row loses-or-ties
    // into the stored edit -> fact unchanged
    run()
    assert(snapshot() == got, "replay must be a no-op")
    // and it equals the batch keep-latest over the full source
    val want = spark.read.parquet(srcDir)
      .withColumn("__rn", row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy("sales_nk")
          .orderBy(col("last_edited").desc)))
      .filter(col("__rn") === 1)
      .select("sales_nk", "value").collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(got == want, "stream result must equal batch keep-latest")
  }

  test("funnelStream over one batch equals the batch funnel chain") {
    import org.apache.spark.sql.streaming.Trigger
    val stages = Seq("view", "click", "purchase")
    // one-file source -> one micro-batch, whose in-batch event-time
    // scan must reproduce the batch min-chain exactly
    val oneFile = tmp("events-funnel")
    Queries.eventsTable(spark, sf)
      .select("user_id", "ts", "event_type")
      .coalesce(1).write.mode("overwrite").parquet(oneFile)
    val schema = spark.read.parquet(oneFile).schema
    val q = Streams.funnelStream(
        spark.readStream.schema(schema).parquet(oneFile), stages)
      .writeStream.format("memory").queryName("funnel_parity")
      .outputMode("update").trigger(Trigger.AvailableNow()).start()
    try q.awaitTermination() finally q.stop()

    val got = spark.table("funnel_parity")
      .orderBy(col("user_id"), col("n_reached").desc)
      .collect().groupBy(_.getLong(0))
      .map { case (u, rows) =>
        u -> rows.maxBy(_.getInt(1))
          .getAs[scala.collection.Seq[Long]]("stage_ts").toList }
      .filter(_._2.nonEmpty)
    val want = graft.ext.Sessions.funnel(
        spark.read.parquet(oneFile), col("user_id"), col("ts"),
        col("event_type"), stages)
      .select(col("user_id"), unix_micros(col("t1").cast("timestamp")),
        unix_micros(col("t2").cast("timestamp")),
        unix_micros(col("t3").cast("timestamp")))
      .collect().map { r =>
        r.getLong(0) -> List(Option(r.get(1)), Option(r.get(2)),
          Option(r.get(3))).flatten.map(_.asInstanceOf[Long]) }
      .toMap
    assert(got.keySet == want.keySet,
      s"user sets differ: ${got.keySet.size} vs ${want.keySet.size}")
    got.foreach { case (u, chain) =>
      assert(chain == want(u), s"user $u chain diverged")
    }
    assert(want.nonEmpty && want.values.exists(_.length == stages.length),
      "fixture should complete the full funnel for someone")
  }

  test("funnelStream state advances across micro-batches") {
    import spark.implicits._
    import org.apache.spark.sql.types._
    val dir = tmp("events-funnel-waves")
    def write(rows: Seq[(Long, String, String)]): Unit =
      rows.toDF("user_id", "ts_s", "event_type")
        .withColumn("ts", col("ts_s").cast("timestamp_ntz")).drop("ts_s")
        .select("user_id", "ts", "event_type")
        .coalesce(1).write.mode("append").parquet(dir)
    // wave 1: user 1 views; wave 2: user 1 clicks (later ts)
    write(Seq((1L, "2024-01-01 10:00:00", "view")))
    write(Seq((1L, "2024-01-01 11:00:00", "click")))
    val schema = StructType(Seq(StructField("user_id", LongType),
      StructField("ts", TimestampNTZType),
      StructField("event_type", StringType)))
    val q = Streams.funnelStream(
        spark.readStream.schema(schema).option("maxFilesPerTrigger", 1)
          .parquet(dir), Seq("view", "click", "purchase"))
      .writeStream.format("memory").queryName("funnel_waves")
      .outputMode("update").start()
    try q.processAllAvailable() finally q.stop()
    val last = spark.table("funnel_waves")
      .filter(col("user_id") === 1L)
      .orderBy(col("n_reached").desc).collect().head
    assert(last.getInt(1) == 2, "click in wave 2 must advance the chain")
  }

  test("seqPackStream over one AvailableNow batch equals batch seqPack") {
    import org.apache.spark.sql.streaming.Trigger
    import org.apache.spark.sql.types._
    // one parquet file -> AvailableNow delivers ONE micro-batch, where
    // the stateful packer sorts by doc_id — exactly the batch window's
    // order, so the two engines must agree cell-for-cell
    val docsDir = tmp("docs-parity")
    spark.read.parquet(s"$sf/documents.parquet").select("doc_id", "text")
      .coalesce(1).write.mode("overwrite").parquet(docsDir)

    val schema = StructType(Seq(StructField("doc_id", LongType),
      StructField("text", StringType)))
    val budget = 64
    val q = Streams.seqPackStream(
        spark.readStream.schema(schema).parquet(docsDir), budget.toLong, 4)
      .writeStream.format("memory").queryName("packed_parity")
      .outputMode("append").trigger(Trigger.AvailableNow()).start()
    try q.awaitTermination() finally q.stop()

    def canon(df: org.apache.spark.sql.DataFrame) = df
      .select("doc_id", "shard", "n_tokens", "tokens_before",
        "seq_id", "seq_offset")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5))).sortBy(_._1).toSeq
    val got = canon(spark.table("packed_parity"))
    val want = canon(graft.ext.Corpus.seqPack(
      spark.read.parquet(docsDir), col("doc_id"), col("text"), budget, 4))
    assert(got.nonEmpty && got == want,
      s"stream/batch packer diverged (first gap: ${
        want.zip(got).find { case (w, g) => w != g }})")
  }

  test("dsirScoreStream equals batch dsirScore row-for-row") {
    import org.apache.spark.sql.streaming.Trigger
    import org.apache.spark.sql.types._
    val docsDir = tmp("docs-dsir")
    spark.read.parquet(s"$sf/documents.parquet").select("doc_id", "text")
      .coalesce(1).write.mode("overwrite").parquet(docsDir)
    // fit offline on the full fixture (en target), score the stream
    val fixture = spark.read.parquet(s"$sf/documents.parquet")
    val llr = graft.ext.Corpus.dsirFitLlr(fixture, col("text"),
      col("lang") === "en")
    val schema = StructType(Seq(StructField("doc_id", LongType),
      StructField("text", StringType)))
    val q = Streams.dsirScoreStream(
        spark.readStream.schema(schema).parquet(docsDir), llr)
      .writeStream.format("memory").queryName("dsir_parity")
      .outputMode("append").trigger(Trigger.AvailableNow()).start()
    try q.awaitTermination() finally q.stop()
    def canon(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
        .sortBy(_._1).toSeq
    val got = canon(spark.table("dsir_parity"))
    val want = canon(graft.ext.Corpus.dsirScore(
      spark.read.parquet(docsDir), col("doc_id"), col("text"), llr))
    assert(got.nonEmpty && got == want,
      s"stream/batch dsir scoring diverged (first gap: ${
        want.zip(got).find { case (w, g) => w != g }})")
  }

  test("seqPackStream: shard counters survive micro-batch boundaries") {
    import org.apache.spark.sql.types._
    val docsDir = tmp("docs-stream")
    val docs = spark.read.parquet(s"$sf/documents.parquet")
      .select("doc_id", "text")
    val n = docs.count()
    // two arrival waves: low ids land in batch 1, high ids in batch 2
    docs.filter(col("doc_id") < n / 2).coalesce(1)
      .write.mode("append").parquet(docsDir)
    docs.filter(col("doc_id") >= n / 2).coalesce(1)
      .write.mode("append").parquet(docsDir)

    val schema = StructType(Seq(StructField("doc_id", LongType),
      StructField("text", StringType)))
    val budget = 64L
    val stream = Streams.seqPackStream(
      spark.readStream.schema(schema).option("maxFilesPerTrigger", 1)
        .parquet(docsDir), budget, 4)
    val q = stream.writeStream.format("memory").queryName("packed")
      .outputMode("append").start()
    try q.processAllAvailable() finally q.stop()

    val got = spark.table("packed").collect()
      .map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Long]("shard"), r.getAs[Long]("n_tokens"),
          r.getAs[Long]("tokens_before"), r.getAs[Long]("seq_id"),
          r.getAs[Long]("seq_offset"))).toMap
    assert(got.size == n)
    // recompute arrival-order packing driver-side: batch wave, then id
    val want = docs.collect()
      .map(r => (r.getLong(0), r.getString(1).split(" ", -1).length.toLong))
      .sortBy { case (id, _) => (id >= n / 2, id) }
    val counters = collection.mutable.Map.empty[Long, Long]
    want.foreach { case (id, tok) =>
      val shard = got(id)._1
      val before = counters.getOrElse(shard, 0L)
      assert(got(id) == ((shard, tok, before, before / budget,
        before % budget)), s"doc $id diverged")
      counters(shard) = before + tok
    }
  }

  test("transitionsStream over one batch equals the batch transition " +
    "matrix bigram-for-bigram") {
    import org.apache.spark.sql.streaming.Trigger
    val oneFile = tmp("events-transitions")
    Queries.eventsTable(spark, sf)
      .select("event_id", "user_id", "ts", "event_type")
      .coalesce(1).write.mode("overwrite").parquet(oneFile)
    val schema = spark.read.parquet(oneFile).schema
    val q = Streams.transitionsStream(
        spark.readStream.schema(schema).parquet(oneFile), 1800)
      .writeStream.format("memory").queryName("transitions_parity")
      .outputMode("append").trigger(Trigger.AvailableNow()).start()
    try q.awaitTermination() finally q.stop()

    val got = spark.table("transitions_parity")
      .groupBy("prev_type", "next_type")
      .agg(count(lit(1)).as("n")).collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getAs[Long]("n"))
      .toMap
    val want = Sessions.transitionCounts(
        spark.read.parquet(oneFile), 1800).collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        r.getAs[Long]("n_trans")).toMap
    assert(want.nonEmpty, "fixture should produce transitions")
    assert(got == want, s"stream matrix diverged from batch: " +
      s"${got.size} vs ${want.size} cells")
  }

  test("cdcIngestSink second trigger equals cdcIncremental; replay is a no-op") {
    import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}
    import graft.ext.Dedup
    val docsDir = tmp("docs-cdc-stream")
    val indexDir = tmp("cdc-index") + "/index"
    val statsDir = tmp("cdc-stats") + "/stats"
    val docs = spark.read.parquet(s"$sf/documents.parquet")
      .select("doc_id", "text")
    docs.filter(col("doc_id") < 400).coalesce(1)
      .write.mode("append").parquet(docsDir)
    docs.filter(col("doc_id") >= 400).coalesce(1)
      .write.mode("append").parquet(docsDir)
    val schema = StructType(Seq(StructField("doc_id", LongType),
      StructField("text", StringType)))
    def run(): Unit = {
      val stream = spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1).parquet(docsDir)
      val q = Streams.cdcIngestSink(stream, indexDir, statsDir,
        tmp("cdc-chk"))
      try q.processAllAvailable() finally q.stop()
    }
    run()
    val stats = spark.read.parquet(statsDir)
    assert(stats.count() == docs.count(), "one stats row per doc")
    // the second trigger saw exactly the first trigger's chunk index:
    // its stats must equal the batch incremental formulation
    val got = stats.filter(col("doc_id") >= 400).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sorted.toSeq
    val want = Dedup.cdcIncremental(docs.filter(col("doc_id") < 400),
        docs.filter(col("doc_id") >= 400), col("doc_id"), col("text"),
        win = 4, mod = 8).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sorted.toSeq
    assert(got == want, "stream stats diverged from the batch twin")
    // index holds each (h, chunk) once
    val idx = spark.read.parquet(indexDir)
    assert(idx.count() == idx.dropDuplicates(Seq("h", "chunk")).count())
    // full replay (fresh checkpoint): the stats ledger skips every doc
    run()
    assert(spark.read.parquet(statsDir).count() == docs.count(),
      "replay must re-score nothing")
    assert(spark.read.parquet(indexDir).count() == idx.count(),
      "replay must append no chunks")
  }

  test("attributionStream over one batch equals batch attribution on " +
    "every decided source") {
    import org.apache.spark.sql.streaming.Trigger
    val oneFile = tmp("events-attribution")
    Queries.eventsTable(spark, sf)
      .select("event_id", "user_id", "ts", "event_type")
      .coalesce(1).write.mode("overwrite").parquet(oneFile)
    val schema = spark.read.parquet(oneFile).schema
    val q = Streams.attributionStream(
        spark.readStream.schema(schema).parquet(oneFile),
        "click", "purchase", 3600L)
      .writeStream.format("memory").queryName("attribution_parity")
      .outputMode("append").trigger(Trigger.AvailableNow()).start()
    try q.awaitTermination() finally q.stop()

    val got = spark.table("attribution_parity").collect()
      .map(r => (r.getLong(0), r.getLong(1)) ->
        (Option(r.get(3)).map(_.asInstanceOf[Long]),
          Option(r.get(5)).map(_.asInstanceOf[Long]))).toMap

    val events = spark.read.parquet(oneFile)
    val batch = Sessions.attributionAsof(events, "click", "purchase", 3600L)
    // decided = clicks with SOME purchase at-or-after them (same user)
    val purchases = events.filter(col("event_type") === "purchase")
      .groupBy(col("user_id")).agg(max("ts").as("last_purchase"))
    val want = batch.join(purchases, "user_id")
      .filter(col("ts") <= col("last_purchase"))
      .collect().map(r => (r.getAs[Long]("user_id"),
        r.getAs[Long]("event_id")) ->
        (Option(r.getAs[Any]("to_event_id")).map(_.asInstanceOf[Long]),
          Option(r.getAs[Any]("lag_s")).map(_.asInstanceOf[Long]))).toMap
    assert(want.nonEmpty, "fixture should decide some attributions")
    assert(got == want,
      s"stream decided set diverged: ${got.size} vs ${want.size}")
  }

  test("attributionStream timeoutFlush: the watermark decides a " +
    "never-converting source as null and evicts its state") {
    import spark.implicits._
    val dir = tmp("events-attr-timeout")
    def write(rows: Seq[(Long, Long, String, String)]): Unit =
      rows.toDF("event_id", "user_id", "ts_s", "event_type")
        .withColumn("ts", col("ts_s").cast("timestamp")).drop("ts_s")
        .coalesce(1).write.mode("append").parquet(dir)
    // batch 1: user 1 clicks at 10:00 (never converts; horizon 11:00),
    // user 2 clicks at 13:30 (horizon 14:30 — beyond every watermark
    // this test ever advances to, so it must stay pending throughout)
    write(Seq((100L, 1L, "2024-01-01 10:00:00", "click"),
      (101L, 2L, "2024-01-01 13:30:00", "click")))
    val schema = spark.read.parquet(dir).schema
    // no-data micro-batches would fire the timeout at a nondeterministic
    // point between processAllAvailable calls; data-batch-only timeout
    // delivery makes each assert's watermark state exact
    spark.conf.set("spark.sql.streaming.noDataMicroBatches.enabled", "false")
    val q = Streams.attributionStream(
        spark.readStream.schema(schema).parquet(dir),
        "click", "purchase", 3600L, timeoutFlush = true)
      .writeStream.format("memory").queryName("attr_timeout")
      .outputMode("append").start()
    try {
      q.processAllAvailable()
      assert(spark.table("attr_timeout").count() == 0,
        "nothing is decidable while the watermark sits at batch start")
      // batch 2: watermark = 13:30 (batch 1's max event time) passes
      // user 1's 11:00 horizon -> flushed as the exact null row
      write(Seq((102L, 3L, "2024-01-01 13:30:01", "click")))
      q.processAllAvailable()
      val got = spark.table("attr_timeout").collect().map(r =>
        (r.getLong(0), r.getLong(1), Option(r.get(3)), Option(r.get(5))))
      assert(got.toSeq == Seq((1L, 100L, None, None)),
        s"expected exactly user 1's null-attributed flush, got ${got.toSeq}")
    } finally {
      q.stop()
      spark.conf.unset("spark.sql.streaming.noDataMicroBatches.enabled")
    }
  }

  test("componentSplitIngestSink: streamed component labels + splits " +
    "equal batch componentSplit over the union; replay is a no-op") {
    import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}
    import graft.ext.Dedup
    val docsDir = tmp("docs-csplit-stream")
    val ixDir = tmp("csplit-index") + "/ix"
    val docs = spark.read.parquet(s"$sf/documents.parquet")
      .select("doc_id", "text")
    // two triggers: later docs must band against the PERSISTED index
    // (cross-trigger near-dup pairs exist in the fixture's ~5% dup
    // clusters), and a cross-trigger merge must relabel trigger-1 docs
    docs.filter(col("doc_id") < 400).coalesce(1)
      .write.mode("append").parquet(docsDir)
    docs.filter(col("doc_id") >= 400).coalesce(1)
      .write.mode("append").parquet(docsDir)
    val schema = StructType(Seq(StructField("doc_id", LongType),
      StructField("text", StringType)))
    def run(): Unit = {
      val stream = spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1).parquet(docsDir)
      val q = Streams.componentSplitIngestSink(stream, ixDir,
        tmp("csplit-chk"))
      try q.processAllAvailable() finally q.stop()
    }
    run()
    def manifest() = Dedup.componentSplitFromIndex(spark, ixDir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2)))
      .sortBy(_._1).toSeq
    val got = manifest()
    val want = Dedup.componentSplit(docs, col("doc_id"), col("text"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2)))
      .sortBy(_._1).toSeq
    assert(got.nonEmpty && got == want,
      "streamed split manifest drifted from batch componentSplit")
    // the parity is non-vacuous only if some component spans the
    // trigger boundary (a cross-trigger merge actually happened)
    val spanning = got.groupBy(_._2).values
      .count(g => g.exists(_._1 < 400) && g.exists(_._1 >= 400))
    assert(spanning > 0, "fixture must exercise a cross-trigger merge")
    // full replay (fresh checkpoint): the labels ledger drops every
    // doc, band stores gain nothing, the manifest is unchanged
    val simBefore = spark.read.parquet(s"$ixDir/simbands").count()
    run()
    assert(manifest() == got, "replay changed the split manifest")
    assert(spark.read.parquet(s"$ixDir/simbands").count() == simBefore,
      "replay appended band rows")
  }

  test("pcaMomentsIngestSink: folded moments equal the batch moments; " +
      "covariance and eigenvector from state == batch; replay no-op") {
    import graft.ext.Pca
    val embDir = tmp("pca-stream")
    val statePath = tmp("pca-state") + "/state"
    val emb = spark.read.parquet(s"$sf/embeddings.parquet")
    // three micro-batches by vec_id range
    Seq(emb.filter(col("vec_id") < 15),
      emb.filter(col("vec_id") >= 15 && col("vec_id") < 30),
      emb.filter(col("vec_id") >= 30))
      .foreach(_.coalesce(1).write.mode("append").parquet(embDir))
    val schema = emb.schema
    def stream() = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", 1).parquet(embDir)
    val q = Streams.pcaMomentsIngestSink(stream(), 64, statePath,
      tmp("pca-ckpt"))
    try q.awaitTermination() finally q.stop()
    val got = Streams.pcaMomentsState(spark, statePath)
      .orderBy("i", "j").collect().toSeq
    val want = Pca.moments(emb, col("vec_id"), col("embedding"), 64)
      .orderBy("i", "j").collect().toSeq
    assert(got == want, "stream state != batch sufficient statistics")
    // covariance + eigenvector from the state table == batch,
    // row for row (the whole PCA family rides on the state)
    val covState = Pca.covFromMoments(
      Streams.pcaMomentsState(spark, statePath).localCheckpoint())
    val covBatch = Pca.covariance(emb, col("vec_id"),
      col("embedding"), 64)
    assert(covState.orderBy("i", "j").collect().toSeq ==
      covBatch.orderBy("i", "j").collect().toSeq,
      "covariance from state != batch covariance")
    assert(Pca.powerIteration(covState, 64, 8).collect().toSeq ==
      Pca.powerIteration(covBatch, 64, 8).collect().toSeq,
      "eigenvector from state != batch eigenvector")
    // full replay (fresh checkpoint): redelivered batchIds all <=
    // ledger, the moments fold nothing twice
    val q2 = Streams.pcaMomentsIngestSink(stream(), 64, statePath,
      tmp("pca-ckpt2"))
    try q2.awaitTermination() finally q2.stop()
    assert(Streams.pcaMomentsState(spark, statePath)
      .orderBy("i", "j").collect().toSeq == want,
      "replay mutated the moment state")
  }

  test("pcaMomentsIngestSink(byLabel): per-label fold equals the batch " +
      "grouped moments; per-label covariance from state == batch") {
    import graft.ext.Pca
    val embDir = tmp("pca-lbl-stream")
    val statePath = tmp("pca-lbl-state") + "/state"
    val emb = spark.read.parquet(s"$sf/embeddings.parquet")
    Seq(emb.filter(col("vec_id") < 25), emb.filter(col("vec_id") >= 25))
      .foreach(_.coalesce(1).write.mode("append").parquet(embDir))
    def stream() = spark.readStream.schema(emb.schema)
      .option("maxFilesPerTrigger", 1).parquet(embDir)
    val q = Streams.pcaMomentsIngestSink(stream(), 64, statePath,
      tmp("pca-lbl-ckpt"), byLabel = true)
    try q.awaitTermination() finally q.stop()
    val got = spark.read.parquet(statePath)
      .select("grp", "i", "j", "s", "cnt")
      .orderBy("grp", "i", "j").collect().toSeq
    val want = Pca.momentsBy(emb, col("label"), col("vec_id"),
        col("embedding"), 64)
      .orderBy("grp", "i", "j").collect().toSeq
    assert(got == want, "per-label stream state != batch moments")
    val covState = Pca.covFromMomentsBy(spark.read.parquet(statePath)
      .select("grp", "i", "j", "s", "cnt").localCheckpoint())
    val covBatch = Pca.covarianceByLabel(emb, 64)
      .withColumnRenamed("label", "grp")
    assert(covState.orderBy("grp", "i", "j").collect().toSeq ==
      covBatch.orderBy("grp", "i", "j").collect().toSeq,
      "per-label covariance from state != batch")
  }

  test("lexIngestSink: streamed BM25 index scores identically to the " +
    "batch-built index; replay appends nothing") {
    import graft.ext.Lexical
    val docsDir = tmp("lex-docs-stream")
    val indexDir = tmp("lex-index-stream") + "/ix"
    val docs = spark.read.parquet(s"$sf/documents.parquet")
      .select("doc_id", "text").localCheckpoint()
    // two files -> two micro-batches, with the SECOND overlapping the
    // first (doc_id < 60 in both): the anti-join must drop re-offered
    // docs or their tf doubles and corrupts scores
    docs.filter(col("doc_id") < 250).coalesce(1)
      .write.mode("append").parquet(docsDir)
    docs.filter(col("doc_id") >= 200 || col("doc_id") < 60).coalesce(1)
      .write.mode("append").parquet(docsDir)
    def run(ckpt: String): Unit = {
      val q = Streams.lexIngestSink(
        spark.readStream.schema(docs.schema)
          .option("maxFilesPerTrigger", 1).parquet(docsDir),
        indexDir, ckpt, nBuckets = 16)
      try q.processAllAvailable() finally q.stop()
    }
    run(tmp("lex-chk"))
    val terms = Seq("spark", "merge", "window", "customer")
    val batchDir = tmp("lex-index-batch") + "/ix"
    Lexical.lexWriteIndex(docs, col("doc_id"), col("text"), batchDir,
      nBuckets = 16)
    def top(dir: String) =
      Lexical.lexSearchIndex(spark, dir, terms, 30, nBuckets = 16)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    val got = top(indexDir)
    assert(got.nonEmpty, "streamed index should rank documents")
    assert(got == top(batchDir),
      "streamed index scores drifted from the batch-built index")
    // the additive stats segments must SUM to the batch stats
    val gotStats = Lexical.lexIndexStats(spark, indexDir).collect()(0)
    val wantStats = Lexical.lexIndexStats(spark, batchDir).collect()(0)
    assert(gotStats == wantStats, "summed segment stats != batch stats")
    // full replay (fresh checkpoint): every doc anti-joins away
    val before = spark.read.parquet(s"$indexDir/postings").count()
    run(tmp("lex-chk2"))
    assert(spark.read.parquet(s"$indexDir/postings").count() == before,
      "replay appended postings")
  }

  test("hybridServeSink: per-trigger hybrid answers equal the batch " +
      "form over the same two persisted indexes") {
    import graft.ext.{Lexical, Similarity}
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    val emb = spark.read.parquet(s"$sf/embeddings.parquet")
      .localCheckpoint()
    val lexDir = tmp("hs-lex") + "/ix"
    val pqDir = tmp("hs-pq") + "/ix"
    Lexical.lexWriteIndex(docs, col("doc_id"), col("text"), lexDir, 16)
    Similarity.ivfPqWriteIndex(emb,
      Similarity.pqSampleCodebooks(emb, 8, 16, 8), 16, 8, 64, pqDir)
    val reqs = emb.filter(col("vec_id") < 4)
      .select(col("vec_id").as("query_id"),
        when(col("vec_id") % 2 === 0,
          array(lit("spark"), lit("merge")))
          .otherwise(array(lit("window"), lit("customer")))
          .as("terms"),
        col("embedding"))
      .localCheckpoint()
    val reqDir = tmp("hs-reqs")
    reqs.filter(col("query_id") < 2).coalesce(1)
      .write.mode("append").parquet(reqDir)
    reqs.filter(col("query_id") >= 2).coalesce(1)
      .write.mode("append").parquet(reqDir)
    val outDir = tmp("hs-out") + "/out"
    val q = Streams.hybridServeSink(
      spark.readStream.schema(reqs.schema)
        .option("maxFilesPerTrigger", 1).parquet(reqDir),
      emb, lexDir, pqDir, outDir, k = 10, depth = 20, nBuckets = 16,
      nProbe = 4, m = 8, dim = 64, rerank = 20, tmp("hs-chk"))
    try q.processAllAvailable() finally q.stop()
    def key(df: org.apache.spark.sql.DataFrame) =
      df.select("query_id", "cand_id", "text_rank", "vec_rank", "rank")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
          r.getLong(3), r.getLong(4))).toSeq.sorted
    val got = key(spark.read.parquet(outDir))
    // two triggers must cover all four requests exactly once
    assert(spark.read.parquet(outDir)
      .select("batch_id").distinct().count() == 2)
    val want = key(Similarity.hybridServeMany(spark, lexDir, pqDir,
      emb, reqs.select(col("query_id"), explode(col("terms")).as("term")),
      reqs.select(col("query_id").as("vec_id"), col("embedding")),
      k = 10, depth = 20, nBuckets = 16, nProbe = 4, m = 8, dim = 64,
      rerank = 20))
    assert(want.nonEmpty && got == want,
      "streamed hybrid answers drifted from the batch form")
  }
}
