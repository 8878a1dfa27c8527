package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode, StreamingQuery, Trigger}
import org.apache.spark.sql.types._

import graft.dims.Scd2
import graft.meta.StagedWrite

/** Structured Streaming facade over the warehouse's incremental-batch
  * core (SURVEY §2 "Streaming" note). The reference's watermark +
  * delta-view pattern (SQL:484-510) is exactly Spark's micro-batch
  * model: each trigger sees only new source rows, the engine tracks
  * progress (checkpoint = the reference's `etl_load_tracker`), and a
  * `foreachBatch` sink runs the same SCD2 derivation the batch
  * pipeline uses — one code path, two execution modes.
  *
  * Scale posture: all aggregations are keyed (shuffle by key, state
  * store partitioned by `spark.sql.shuffle.partitions`); watermarks
  * bound state; the SCD2 sink shuffles only by natural key.
  */
object Streams {

  /** Explicit source schema (streaming reads cannot infer). `ts` is
    * µs TIMESTAMP_NTZ — the test fixtures' nanos are truncated on the
    * way in by the writer (see StreamsSpec / Queries.eventsTable). */
  val eventsSchema: StructType = StructType(Seq(
    StructField("event_id", LongType),
    StructField("ts", TimestampNTZType),
    StructField("user_id", LongType),
    StructField("event_type", StringType),
    StructField("value", DoubleType),
    StructField("props", StringType)))

  /** File-source stream over a directory of event parquet files.
    * `maxFilesPerTrigger=1` makes each file one micro-batch — the
    * streaming analog of one watermark-delta load. */
  def readEventsStream(spark: SparkSession, dir: String,
                       maxFilesPerTrigger: Int = 1): DataFrame =
    spark.readStream
      .schema(eventsSchema)
      .option("maxFilesPerTrigger", maxFilesPerTrigger)
      .parquet(dir)

  /** Watermarked tumbling-window aggregate per event type. Late rows
    * beyond `watermark` are dropped — the reference documents the same
    * policy for its batch deltas ("Does not allow late arriving data",
    * SQL:487). */
  def windowedCounts(events: DataFrame, watermark: String = "1 hour",
                     windowLen: String = "1 hour"): DataFrame =
    events
      // event-time tracking requires TIMESTAMP (LTZ); session TZ is
      // pinned UTC so NTZ -> LTZ is a relabel, not a shift
      .withColumn("ts", col("ts").cast("timestamp"))
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), windowLen), col("event_type"))
      .agg(count(lit(1)).as("n_events"), sum("value").as("sum_value"))
      .select(col("window.start").as("window_start"), col("event_type"),
        col("n_events"), col("sum_value"))

  /** Gap-based session aggregation via the native `session_window`
    * operator — the streaming twin of [[graft.ext.Sessions]]. */
  def sessionAgg(events: DataFrame, gap: String = "30 minutes",
                 watermark: String = "1 hour"): DataFrame =
    events
      .withColumn("ts", col("ts").cast("timestamp"))
      .withWatermark("ts", watermark)
      .groupBy(session_window(col("ts"), gap), col("user_id"))
      .agg(count(lit(1)).as("n_events"), sum("value").as("sum_value"))
      .select(col("session_window.start").as("session_start"),
        col("session_window.end").as("session_end"),
        col("user_id"), col("n_events"), col("sum_value"))

  /** Streaming exact dedup bounded by event time: duplicates of a key
    * arriving within `watermark` of each other are dropped with
    * bounded state (`dropDuplicatesWithinWatermark` evicts key state
    * once the watermark passes it — an unbounded `dropDuplicates`
    * would grow state forever on an infinite stream). */
  def dedupStream(events: DataFrame, keys: Seq[String],
                  watermark: String = "1 hour"): DataFrame =
    events
      .withColumn("ts", col("ts").cast("timestamp"))
      .withWatermark("ts", watermark)
      .dropDuplicatesWithinWatermark(keys)

  /** A closed session emitted by [[statefulSessions]]; bounds are
    * exact event-time microseconds (longs, not ms-lossy Timestamps). */
  case class ClosedSession(user_id: Long, start_us: Long, end_us: Long,
                           n_events: Long)
  /** Per-user state: the still-open session spans. */
  case class SessionSpan(start_us: Long, end_us: Long, n: Long)
  case class UserSessions(spans: Seq[SessionSpan])

  /** Custom-state sessionization via `flatMapGroupsWithState` — the
    * third point on the sessionization spectrum after the batch window
    * formulation ([[graft.ext.Sessions]]) and the built-in
    * [[sessionAgg]] `session_window`: full control over per-key state,
    * for semantics the built-ins can't express (multiple concurrent
    * open spans per key, cross-batch merging of out-of-order arrivals
    * within the watermark, custom emission policy).
    *
    * Mechanics: state holds each user's OPEN spans; every batch merges
    * its events into the span set (gap-bridged spans coalesce, so late
    * rows inside the watermark can stitch two spans — eager emission
    * would have split them); a span is emitted exactly once, when the
    * event-time watermark passes `end + gap` and it can no longer
    * grow. Event-time timeouts flush users with no new data. State is
    * bounded: open spans only, keyed shuffle, store partitioned by
    * `spark.sql.shuffle.partitions`. */
  def statefulSessions(events: DataFrame, gapSeconds: Long,
                       watermark: String = "0 seconds"): Dataset[ClosedSession] = {
    val spark = events.sparkSession
    import spark.implicits._
    val gapUs = gapSeconds * 1000000L
    val gapMs = gapSeconds * 1000L

    def mergeSpans(spans: List[SessionSpan]): List[SessionSpan] =
      spans.sortBy(s => (s.start_us, s.end_us)).foldLeft(List.empty[SessionSpan]) {
        case (prev :: rest, s) if s.start_us <= prev.end_us + gapUs =>
          SessionSpan(prev.start_us, math.max(prev.end_us, s.end_us),
            prev.n + s.n) :: rest
        case (acc, s) => s :: acc
      }.reverse

    def flush(user: Long, spans: List[SessionSpan],
              gs: GroupState[UserSessions]): Iterator[ClosedSession] = {
      val wmMs = gs.getCurrentWatermarkMs()
      val (closed, open) = spans.partition(s => s.end_us / 1000 + gapMs < wmMs)
      if (open.isEmpty) gs.remove()
      else {
        gs.update(UserSessions(open))
        // earliest instant any open span becomes closable; must exceed
        // the current watermark per the GroupState contract
        gs.setTimeoutTimestamp(
          math.max(open.map(_.end_us).min / 1000 + gapMs + 1, wmMs + 1))
      }
      closed.sortBy(_.start_us).iterator
        .map(s => ClosedSession(user, s.start_us, s.end_us, s.n))
    }

    events
      .withColumn("ts", col("ts").cast("timestamp"))
      .withWatermark("ts", watermark)
      // the watermark-tagged column must stay in the projection or the
      // analyzer rejects the event-time timeout
      .select(col("user_id"), col("ts"), unix_micros(col("ts")).as("t_us"))
      .as[(Long, java.sql.Timestamp, Long)]
      .groupByKey(_._1)
      .flatMapGroupsWithState[UserSessions, ClosedSession](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (user, it, gs) =>
          val prior = if (gs.exists) gs.get.spans.toList else Nil
          val incoming = it.map { case (_, _, t) => SessionSpan(t, t, 1L) }.toList
          flush(user, mergeSpans(prior ++ incoming), gs)
      }
  }

  /** A kept (burst-leading) event emitted by [[debounceStream]]. */
  case class DebouncedEvent(user_id: Long, event_type: String,
                            t_us: Long, event_id: Long, n_collapsed: Long)
  /** An open burst: span bounds, the leading event's id, its count. */
  case class Burst(start_us: Long, end_us: Long, first_id: Long, n: Long)
  case class KeyBursts(bursts: Seq[Burst])

  /** Streaming twin of [[graft.ext.Sessions.eventDedup]] — the
    * chained-gap debounce as live state: bursts of same-(user, type)
    * events whose inter-arrival gaps chain within `gapSeconds`
    * collapse to their FIRST event, emitted once the event-time
    * watermark passes `burst end + gap` (the burst can no longer
    * grow). Same `flatMapGroupsWithState` shape as
    * [[statefulSessions]], with the leading event's identity carried
    * through the merge (ties on start time resolve by event_id, the
    * batch operator's exact order). State per key = open bursts
    * only; late rows inside the watermark stitch bursts and the
    * leader re-resolves, so out-of-order delivery converges to the
    * batch answer — StreamsSpec pins the row-for-row parity. */
  def debounceStream(events: DataFrame, gapSeconds: Long,
                     watermark: String = "0 seconds"): Dataset[DebouncedEvent] = {
    val spark = events.sparkSession
    import spark.implicits._
    val gapUs = gapSeconds * 1000000L
    val gapMs = gapSeconds * 1000L

    def mergeBursts(bs: List[Burst]): List[Burst] =
      bs.sortBy(b => (b.start_us, b.first_id))
        .foldLeft(List.empty[Burst]) {
          case (prev :: rest, b) if b.start_us <= prev.end_us + gapUs =>
            // prev leads (sorted by (start, id)); ties keep min id
            val lead =
              if (b.start_us == prev.start_us && b.first_id < prev.first_id)
                b.first_id
              else prev.first_id
            Burst(prev.start_us, math.max(prev.end_us, b.end_us),
              lead, prev.n + b.n) :: rest
          case (acc, b) => b :: acc
        }.reverse

    def flush(key: (Long, String), bursts: List[Burst],
              gs: GroupState[KeyBursts]): Iterator[DebouncedEvent] = {
      val wmMs = gs.getCurrentWatermarkMs()
      val (closed, open) =
        bursts.partition(b => b.end_us / 1000 + gapMs < wmMs)
      if (open.isEmpty) gs.remove()
      else {
        gs.update(KeyBursts(open))
        gs.setTimeoutTimestamp(
          math.max(open.map(_.end_us).min / 1000 + gapMs + 1, wmMs + 1))
      }
      closed.sortBy(_.start_us).iterator.map(b =>
        DebouncedEvent(key._1, key._2, b.start_us, b.first_id, b.n))
    }

    events
      .withColumn("ts", col("ts").cast("timestamp"))
      .withWatermark("ts", watermark)
      .select(col("user_id"), col("event_type"), col("ts"),
        unix_micros(col("ts")).as("t_us"), col("event_id"))
      .as[(Long, String, java.sql.Timestamp, Long, Long)]
      .groupByKey(r => (r._1, r._2))
      .flatMapGroupsWithState[KeyBursts, DebouncedEvent](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (key, it, gs) =>
          val prior = if (gs.exists) gs.get.bursts.toList else Nil
          val incoming =
            it.map { case (_, _, _, t, id) => Burst(t, t, id, 1L) }.toList
          flush(key, mergeBursts(prior ++ incoming), gs)
      }
  }

  /** Micro-batch SCD2 sink: every trigger appends the batch to the
    * change-history table, dedups on the event identity (exactly-once
    * on top of the source's at-least-once), and republishes the dim
    * with the same pure derivation the batch pipeline uses
    * ([[Scd2.deriveVersions]]). Checkpoint dir plays the
    * `etl_load_tracker` role (J35): restart resumes, reruns are no-ops.
    */
  def scd2Sink(stream: DataFrame, nk: String, tsCol: String,
               tieBreak: Seq[String], historyPath: String, dimPath: String,
               checkpoint: String): StreamingQuery =
    stream.writeStream
      .option("checkpointLocation", checkpoint)
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: DataFrame, _: Long) =>
        val spark = batch.sparkSession
        batch.dropDuplicates(Seq(nk, tsCol) ++ tieBreak)
          .write.mode("append").parquet(historyPath)
        val history = spark.read.parquet(historyPath)
          .dropDuplicates(Seq(nk, tsCol) ++ tieBreak)
        StagedWrite.overwrite(
          Scd2.deriveVersions(history, nk, tsCol, tieBreak), dimPath)
      }
      .start()

  /** Micro-batch FACT sink — the streaming twin of
    * [[graft.facts.FactLoader]]'s correction semantics: each trigger's
    * rows upsert into the fact by natural key with keep-latest-edit
    * (I4), scoped exactly like the batch loader — stored rows whose
    * key is NOT in the batch pass through untouched, contested keys
    * resolve to the newest `editTs` (ties: the batch side wins, as a
    * correction should). Replayed batches are no-ops: every replayed
    * row loses (or ties into) the already-stored edit. Same staged
    * publish as the batch path, so a crash never leaves a torn fact.
    */
  def factCorrectionsSink(stream: DataFrame, nk: String, editTs: String,
                          factPath: String,
                          checkpoint: String): StreamingQuery =
    stream.writeStream
      .option("checkpointLocation", checkpoint)
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch0: DataFrame, _: Long) =>
        val spark = batch0.sparkSession
        // same-batch redelivery: keep the newest edit per key up front
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy(col(nk)).orderBy(col(editTs).desc)
        val batch = batch0.withColumn("__rn", row_number().over(w))
          .filter(col("__rn") === 1).drop("__rn")
        val fs = new org.apache.hadoop.fs.Path(factPath).getFileSystem(
          spark.sparkContext.hadoopConfiguration)
        val merged =
          if (!fs.exists(new org.apache.hadoop.fs.Path(factPath))) batch
          else {
            val stored = spark.read.parquet(factPath)
            val keys = batch.select(col(nk)).distinct()
            val untouched = stored.join(keys, Seq(nk), "left_anti")
            // contested: stored loses to a strictly-newer or equal
            // batch edit (batch wins ties — corrections override)
            val keptStored = stored.join(keys, Seq(nk), "left_semi")
              .join(batch.select(col(nk), col(editTs).as("__bts")),
                Seq(nk))
              .filter(col(editTs) > col("__bts")).drop("__bts")
            untouched.unionByName(keptStored).unionByName(
              batch.join(keptStored.select(col(nk)), Seq(nk), "left_anti"))
          }
        StagedWrite.overwrite(merged, factPath)
      }
      .start()

  /** Streaming near-dup ingest: each micro-batch of documents is
    * checked against the PERSISTED corpus band index
    * ([[graft.ext.Dedup.minhashBandRows]] layout) — a batch doc whose
    * signature shares any band with the corpus (or with an
    * earlier-id batch doc) is dropped; survivors are appended to the
    * corpus and their bands to the index. The streaming twin of
    * [[graft.ext.Dedup.minhashCandidatesIncremental]]: per trigger,
    * the probe side is just the batch, the corpus side is an
    * equi-lookup into the index — never corpus×corpus. At scale the
    * index is bucketed by (band, sig) so the lookup co-locates.
    *
    * Delivery: a replayed batch collides with its own banded bands in
    * the index and drops out, so completed batches are no-ops. The
    * corpus append deliberately runs BEFORE the index append: a crash
    * between the two can duplicate a doc in the corpus (healed by any
    * later dedup pass over the corpus) but can never silently LOSE
    * one, which the opposite order would. Docs with fewer than
    * `shingle` words have no signature, are always kept, and are NOT
    * replay-protected (nothing of theirs is in the index) — pick a
    * shingle that fits the minimum document length, or exact-dedup
    * the corpus downstream. */
  def nearDupIngestSink(stream: DataFrame, indexPath: String,
                        corpusPath: String, checkpoint: String,
                        shingle: Int = 3, k: Int = 8,
                        rowsPerBand: Int = 2): StreamingQuery =
    stream.writeStream
      .option("checkpointLocation", checkpoint)
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch0: DataFrame, _: Long) =>
        val spark = batch0.sparkSession
        import graft.ext.Dedup
        // same-batch redelivery: equal ids never band-collide (the
        // pair joins are strict <), so dedup the identity up front —
        // the scd2Sink exactly-once pattern
        val batch = batch0.dropDuplicates(Seq("doc_id"))
        // signatures anchor three consumers (band rows twice, the
        // within-batch candidate join); materialize the kernel once
        val sigs = Dedup.minhashSignature(batch, col("doc_id"),
          col("text"), shingle, k).localCheckpoint()
        val bands = Dedup.minhashBandRows(sigs, k, rowsPerBand)
          .select(col("doc_id"), col("band"), col("sig"))
        val fs = new org.apache.hadoop.fs.Path(indexPath).getFileSystem(
          spark.sparkContext.hadoopConfiguration)
        val vsIndex =
          if (fs.exists(new org.apache.hadoop.fs.Path(indexPath)))
            bands.join(spark.read.parquet(indexPath),
              Seq("band", "sig"), "left_semi").select(col("doc_id"))
          else bands.select(col("doc_id")).limit(0)
        // within-batch collisions, keep the smaller id: reuse the
        // candidate generator (explicit-N spread + first-matching-band
        // predicate) rather than re-implementing the pair join bare
        val vsBatch = Dedup.minhashCandidates(sigs, k, rowsPerBand)
          .select(col("d2").as("doc_id"))
        // materialized: two writes below consume it, and evaluating it
        // is the trigger's only scan of the (growing) index
        val dropIds = vsIndex.unionByName(vsBatch).distinct()
          .localCheckpoint()
        val keep = batch.join(dropIds, Seq("doc_id"), "left_anti")
        keep.write.mode("append").parquet(corpusPath)
        bands.join(dropIds, Seq("doc_id"), "left_anti")
          .write.mode("append").parquet(indexPath)
      }
      .start()

  /** Streaming CDC ingest — the streaming twin of
    * [[graft.ext.Dedup.cdcIncremental]]: each micro-batch of documents
    * is content-defined-chunked, scored against the PERSISTED distinct
    * chunk index, its per-doc stats (doc_id, n_chunks,
    * n_dup_vs_index) appended to `statsPath`, and its genuinely NEW
    * (h, chunk) pairs appended to the index. Per trigger the batch
    * pays its own chunking + one (h, chunk)-keyed lookup into the
    * index — never a corpus re-chunk; at scale the index is persisted
    * bucketed by h so the lookup co-locates.
    *
    * Delivery: the stats file doubles as the doc-level ledger — batch
    * docs whose doc_id already has a stats row are skipped up front,
    * so a replayed (or crash-recovered) batch re-scores nothing and a
    * doc's stats are immune to its OWN chunks having landed in the
    * index meanwhile. Stats append BEFORE index append: a crash
    * between the two can leave a doc's chunks out of the index until
    * a later identical chunk arrives (under-counting later dups, the
    * recoverable direction) but can never double-score a doc. */
  def cdcIngestSink(stream: DataFrame, indexPath: String,
                    statsPath: String, checkpoint: String,
                    win: Int = 4, mod: Int = 8): StreamingQuery =
    stream.writeStream
      .option("checkpointLocation", checkpoint)
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch0: DataFrame, _: Long) =>
        val spark = batch0.sparkSession
        import graft.ext.Dedup
        val fs = new org.apache.hadoop.fs.Path(statsPath).getFileSystem(
          spark.sparkContext.hadoopConfiguration)
        def exists(p: String) =
          fs.exists(new org.apache.hadoop.fs.Path(p))
        val deduped = batch0.dropDuplicates(Seq("doc_id"))
        val batch =
          if (exists(statsPath))
            deduped.join(spark.read.parquet(statsPath).select("doc_id"),
              Seq("doc_id"), "left_anti")
          else deduped
        // one chunking pass feeds the stats agg AND the index append
        val chunks = Dedup.cdcChunks(batch, col("doc_id"), col("text"),
          win, mod).localCheckpoint()
        val idx =
          if (exists(indexPath))
            spark.read.parquet(indexPath).withColumn("__hit", lit(1L))
          else chunks.select(col("h"), col("chunk")).limit(0)
            .withColumn("__hit", lit(1L))
        chunks.join(idx, Seq("h", "chunk"), "left")
          .groupBy(col("doc_id"))
          .agg(count(lit(1)).as("n_chunks"),
            sum(coalesce(col("__hit"), lit(0L))).as("n_dup_vs_index"))
          .write.mode("append").parquet(statsPath)
        chunks.select(col("h"), col("chunk")).distinct()
          .join(idx, Seq("h", "chunk"), "left_anti")
          .write.mode("append").parquet(indexPath)
      }
      .start()

  case class PackedDoc(doc_id: Long, shard: Long, n_tokens: Long,
                       tokens_before: Long, seq_id: Long, seq_offset: Long)

  /** Streaming table-checksum maintenance — the streaming twin of
    * [[graft.ext.Profiler.checksumIncremental]]'s append algebra:
    * because the fingerprint is a SUM mod M, each micro-batch folds
    * in as `new = (old + checksum(batch)) mod M` — O(batch) per
    * trigger, the base is never re-hashed. State is ONE row
    * (last_batch_id, n_rows, checksum) at `statePath`.
    *
    * Delivery: exactly-once via the batchId ledger — foreachBatch
    * redelivers a failed trigger with the SAME batchId and data, so
    * folding only batchId > last_batch_id makes replays no-ops (the
    * checksum fold is NOT naturally idempotent; the ledger is what
    * the algebra needs from the harness). State publishes through
    * the staged swap, so a crash never leaves a torn fingerprint. */
  def checksumIngestSink(stream: DataFrame, cols: Seq[String],
                         statePath: String,
                         checkpoint: String): StreamingQuery =
    stream.writeStream
      .option("checkpointLocation", checkpoint)
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val spark = batch.sparkSession
        import spark.implicits._
        val fs = new org.apache.hadoop.fs.Path(statePath).getFileSystem(
          spark.sparkContext.hadoopConfiguration)
        val prior: (Long, Long, Long) =
          if (fs.exists(new org.apache.hadoop.fs.Path(statePath))) {
            val r = spark.read.parquet(statePath).collect()(0)
            (r.getAs[Long]("last_batch_id"), r.getAs[Long]("n_rows"),
              r.getAs[Long]("checksum"))
          } else (-1L, 0L, 0L)
        if (batchId > prior._1) {
          val d = graft.ext.Profiler.tableChecksum(batch,
            cols.map(batch(_))).collect()(0)
          val m = 2305843009213693951L
          val next = Seq((batchId, prior._2 + d.getAs[Long]("n_rows"),
            java.math.BigInteger.valueOf(prior._3)
              .add(java.math.BigInteger.valueOf(d.getAs[Long]("checksum")))
              .mod(java.math.BigInteger.valueOf(m)).longValueExact()))
            .toDF("last_batch_id", "n_rows", "checksum")
          StagedWrite.overwrite(next, statePath)
        }
      }
      .start()

  /** Streaming disorder audit — the streaming twin of
    * [[graft.ext.Profiler.lateDataAudit]]: per trigger, each event's
    * lateness vs the latest event time ALREADY SEEN for its user
    * (persisted per-user running max at `statePath` + the
    * within-batch prior max in event_id order, exactly the batch
    * operator's window), bucketed into the same ≤6 fixed buckets and
    * folded into persisted counts at `countsPath`. This is the audit
    * the reference's watermark disclaimer gives up (SQL:487 "Does not
    * allow late arriving data") measured ONLINE: read the bucket
    * table to size `withWatermark` instead of guessing.
    *
    * State: one row per user (the unit Spark keys streaming state by)
    * + ≤6 count rows + the batchId ledger riding on the counts table;
    * replays are no-ops. Parity with the batch audit holds when
    * arrival order refines event_id order (triggers deliver id
    * ranges in order) — the property StreamsSpec pins; out-of-order
    * TRIGGERS measure lateness vs what actually arrived first, which
    * is the online semantics. */
  def lateDataAuditSink(stream: DataFrame, statePath: String,
                        countsPath: String,
                        checkpoint: String): StreamingQuery =
    stream.writeStream
      .option("checkpointLocation", checkpoint)
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val spark = batch.sparkSession
        import spark.implicits._
        val fs = new org.apache.hadoop.fs.Path(countsPath).getFileSystem(
          spark.sparkContext.hadoopConfiguration)
        def exists(p: String) = fs.exists(new org.apache.hadoop.fs.Path(p))
        val lastId =
          if (exists(countsPath))
            spark.read.parquet(countsPath)
              .agg(max(col("last_batch_id"))).collect()(0).getLong(0)
          else -1L
        if (batchId > lastId) {
          val priorMax =
            if (exists(statePath)) spark.read.parquet(statePath)
            else Seq.empty[(Long, Long)].toDF("user_id", "max_us")
          val wPrev = org.apache.spark.sql.expressions.Window
            .partitionBy(col("user_id")).orderBy(col("event_id"))
            .rowsBetween(org.apache.spark.sql.expressions.Window
              .unboundedPreceding, -1)
          val withLate = batch
            .withColumn("__t", unix_micros(col("ts").cast("timestamp")))
            .join(priorMax, Seq("user_id"), "left")
            .withColumn("__seen", greatest(
              coalesce(max(col("__t")).over(wPrev), lit(Long.MinValue)),
              coalesce(col("max_us"), lit(Long.MinValue))))
            .withColumn("late_us",
              greatest(when(col("__seen") === Long.MinValue, lit(0L))
                .otherwise(col("__seen") - col("__t")), lit(0L)))
          val bucketed = withLate
            .select(when(col("late_us") === 0, "0_in_order")
              .when(col("late_us") <= 1000000L, "1_upto_1s")
              .when(col("late_us") <= 10000000L, "2_upto_10s")
              .when(col("late_us") <= 60000000L, "3_upto_1m")
              .when(col("late_us") <= 600000000L, "4_upto_10m")
              .otherwise("5_over_10m").as("bucket"))
            .groupBy("bucket").agg(count(lit(1)).as("n"))
          val priorCounts =
            if (exists(countsPath))
              spark.read.parquet(countsPath).select("bucket", "n")
            else Seq.empty[(String, Long)].toDF("bucket", "n")
          val merged = priorCounts.unionByName(bucketed)
            .groupBy("bucket").agg(sum(col("n")).cast("long").as("n"))
            .withColumn("last_batch_id", lit(batchId))
          // counts BEFORE user-max state: a crash between the two
          // under-states the max (later events read as less late —
          // the recoverable direction) but never double-counts,
          // because the ledger rides on the counts table
          StagedWrite.overwrite(merged, countsPath)
          val nextMax = priorMax.unionByName(
              batch.select(col("user_id"),
                unix_micros(col("ts").cast("timestamp")).as("max_us")))
            .groupBy("user_id").agg(max(col("max_us")).as("max_us"))
          StagedWrite.overwrite(nextMax, statePath)
        }
      }
      .start()

  /** Streaming SCD2 churn mart — [[scd2Sink]] plus the monthly
    * opened/closed churn table ([[graft.dims.Scd2.churnByMonth]],
    * the same derivation the `scd2_churn` declared query publishes)
    * recomputed from the fresh dim each trigger. The churn mart is
    * |months| rows — rederiving it from the dim is cheaper than any
    * incremental bookkeeping and inherits scd2Sink's replay safety
    * (history append dedups on (nk, ts, tiebreak), so the derived
    * dim — and hence the churn — is a pure function of the settled
    * history). */
  def scd2ChurnSink(stream: DataFrame, nk: String, tsCol: String,
                    tieBreak: Seq[String], historyPath: String,
                    dimPath: String, churnPath: String,
                    checkpoint: String): StreamingQuery =
    stream.writeStream
      .option("checkpointLocation", checkpoint)
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: DataFrame, _: Long) =>
        val spark = batch.sparkSession
        batch.dropDuplicates(Seq(nk, tsCol) ++ tieBreak)
          .write.mode("append").parquet(historyPath)
        val history = spark.read.parquet(historyPath)
          .dropDuplicates(Seq(nk, tsCol) ++ tieBreak)
        val dim = Scd2.deriveVersions(history, nk, tsCol, tieBreak)
        StagedWrite.overwrite(dim, dimPath)
        StagedWrite.overwrite(
          Scd2.churnByMonth(spark.read.parquet(dimPath)), churnPath)
      }
      .start()

  /** Streaming ANN-index maintenance — the online twin of
    * [[graft.ext.Similarity.ivfPqAppendToIndex]]: each micro-batch of
    * vectors is PQ-encoded against the persisted index's OWN
    * codebooks/centroids and appended into the cell-partitioned codes
    * layout; searches ([[graft.ext.Similarity.ivfPqSearchPersisted]])
    * see every settled batch. O(batch) per trigger — assignment +
    * encode argmin + a dynamic-partition append touching only the
    * batch's cells; the corpus is never re-indexed.
    *
    * Delivery: exactly-once via a vec_id ledger riding ON the codes
    * table itself — a replayed batch left-antis against the already-
    * indexed ids and appends nothing (the cdcIngestSink discipline;
    * an id-keyed ledger beats a batchId ledger here because the codes
    * table IS the ledger — no second table to crash between). The
    * index must already exist ([[graft.ext.Similarity.ivfPqWriteIndex]]
    * runs once at bootstrap; codebook drift under a shifting
    * distribution is the declared rebuild trigger, audited by
    * [[graft.ext.Similarity.pqQuantizationError]]). */
  def pqIngestSink(stream: DataFrame, m: Int, dim: Int, indexDir: String,
                   checkpoint: String): StreamingQuery =
    stream.writeStream
      .option("checkpointLocation", checkpoint)
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch0: DataFrame, _: Long) =>
        val spark = batch0.sparkSession
        val deduped = batch0.dropDuplicates(Seq("vec_id"))
        val indexed = spark.read.parquet(s"$indexDir/codes")
          .select(col("cand_id").as("vec_id")).distinct()
        val batch = deduped.join(indexed, Seq("vec_id"), "left_anti")
        if (!batch.isEmpty)
          graft.ext.Similarity.ivfPqAppendToIndex(spark, batch, m, dim,
            indexDir)
      }
      .start()

  /** Streaming ANN SERVE — the search-side twin of [[pqIngestSink]],
    * closing the index's online loop: ingest maintains the persisted
    * IVF-PQ store, serve answers a QUERY stream from it. Per
    * trigger, the batch's query vectors run the exact
    * [[graft.ext.Similarity.ivfPqSearchPersisted]] leg (broadcast
    * probe assignment, ADC shortlist, exact re-rank on original
    * floats) and the ranked results append to `outDir` stamped with
    * the trigger's `batch_id` — the online-serving deployment shape
    * (a request log partition per trigger) rather than a state
    * table: serving is stateless by construction, every trigger's
    * answer derives only from the index and that trigger's queries.
    *
    * Index versioning: each trigger re-reads the store, so results
    * reflect the index AS OF ITS TRIGGER — a concurrent append
    * lands in the next trigger's answers, never a torn half-batch
    * (the maintenance lock serializes append vs compaction; reads
    * see the published `_SUCCESS`-marked store either side of a
    * staged swap). Delivery is the foreachBatch contract:
    * at-least-once, a crash-replayed trigger re-appends the SAME
    * rows with the SAME batch_id, so a reader gets exactly-once by
    * deduping on (batch_id, query_id, rank). Queries dedup by
    * vec_id within a trigger (a request retry inside one batch is
    * one question, not two). */
  def annServeSink(queryStream: DataFrame, corpus: DataFrame,
                   indexDir: String, outDir: String, k: Int,
                   nProbe: Int, m: Int, dim: Int, rerank: Int,
                   checkpoint: String): StreamingQuery =
    queryStream.writeStream
      .option("checkpointLocation", checkpoint)
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch0: DataFrame, batchId: Long) =>
        val spark = batch0.sparkSession
        val q = batch0.dropDuplicates(Seq("vec_id"))
        if (!q.isEmpty)
          graft.ext.Similarity.ivfPqSearchPersisted(spark, indexDir,
              corpus, q, k, nProbe, m, dim, rerank)
            .withColumn("batch_id", lit(batchId))
            .write.mode("append").parquet(outDir)
      }
      .start()

  /** Streaming HYBRID serve — the request-path composition of
    * [[annServeSink]] and the lexical index: each trigger's requests
    * (`(query_id, terms: array<string>, embedding)`) are answered by
    * [[graft.ext.Similarity.hybridServeMany]] — ONE pruned postings
    * pass plus ONE PQ pass for the whole trigger, fused per request —
    * and the ranked results append to `outDir` stamped with the
    * trigger's `batch_id`. Same deployment contract as annServeSink:
    * stateless by construction (every answer derives from the two
    * indexes and that trigger's requests), at-least-once delivery
    * with exactly-once via (batch_id, query_id, rank) dedup, index
    * versioning AS OF the trigger (both index reads see
    * `_SUCCESS`-published stores either side of any staged swap;
    * appends racing a trigger land in the next trigger's answers).
    * Requests dedup by query_id within a trigger. */
  def hybridServeSink(requestStream: DataFrame, corpus: DataFrame,
                      lexDir: String, pqDir: String, outDir: String,
                      k: Int, depth: Int, nBuckets: Int, nProbe: Int,
                      m: Int, dim: Int, rerank: Int,
                      checkpoint: String): StreamingQuery =
    requestStream.writeStream
      .option("checkpointLocation", checkpoint)
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch0: DataFrame, batchId: Long) =>
        val spark = batch0.sparkSession
        val req = batch0.dropDuplicates(Seq("query_id"))
          .localCheckpoint()
        if (!req.isEmpty) {
          val qTerms = req.select(col("query_id"),
            explode(col("terms")).as("term"))
          val qVecs = req.select(col("query_id").as("vec_id"),
            col("embedding"))
          graft.ext.Similarity.hybridServeMany(spark, lexDir, pqDir,
              corpus, qTerms, qVecs, k, depth, nBuckets = nBuckets,
              nProbe = nProbe, m = m, dim = dim, rerank = rerank)
            .withColumn("batch_id", lit(batchId))
            .write.mode("append").parquet(outDir)
        }
      }
      .start()

  /** Streaming retrieval-eval canary — the online twin of the
    * `retrieval_summary` batch op, and the EVAL-side companion of
    * [[annServeSink]]: where serve answers a query stream, this
    * SCORES one. Per trigger, the batch's labeled query vectors run
    * the exact ranked-top-k front against the static corpus and the
    * trigger appends ONE macro row (n_queries, macro recall/nDCG/AP
    * ppm) stamped with batch_id — the canary a deployment watches
    * after an embedding refresh: a falling macro line means the new
    * embedding ranks relatives worse, trigger over trigger, with the
    * same integer-exact arithmetic as the declared batch query
    * (StreamsSpec pins per-trigger row ≡ batch labelEvalSummary on
    * that trigger's queries).
    *
    * Stateless like serve: each trigger's row derives only from the
    * corpus and that trigger's queries, so replay re-appends the
    * SAME row for the same batch_id (at-least-once; dedup on
    * batch_id reads exactly-once). Queries dedup by vec_id within a
    * trigger. A trigger whose queries all lack a same-label relative
    * appends nothing (the batch op's singleton exclusion, inherited). */
  def retrievalEvalSink(queryStream: DataFrame, corpus: DataFrame,
                        outDir: String, k: Int,
                        checkpoint: String): StreamingQuery =
    queryStream.writeStream
      .option("checkpointLocation", checkpoint)
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch0: DataFrame, batchId: Long) =>
        val q = batch0.dropDuplicates(Seq("vec_id"))
        if (!q.isEmpty) {
          val row = graft.ext.RetrievalEval
            .labelEvalSummaryOf(corpus, q, k)
            .withColumn("batch_id", lit(batchId))
          if (!row.filter(col("n_queries") > 0).isEmpty)
            row.write.mode("append").parquet(outDir)
        }
      }
      .start()

  /** Streaming CUSUM drift monitor — the online twin of
    * [[graft.ext.Profiler.cusumDrift]], which is the shape a
    * deployment actually runs it in: the batch op derives μ from the
    * whole series (retrospective analysis), the stream monitors NEW
    * days against a FIXED baseline μ (in integer cents — computed
    * once from a settled reference window, exactly how Page's CUSUM
    * is deployed). Maintains a state table at `statePath` with one
    * row per day: (date_value, rev_cents, p, minp, cusum_cents,
    * alarm) — `p`/`minp` are the prefix-sum closed form's running
    * terms, so each trigger extends the recursion from the stored
    * tail in O(batch days): no day is ever re-read, and the
    * per-trigger window runs over that trigger's days only.
    *
    * Delivery: the state table is its own ledger (the pqIngestSink
    * discipline) — a day at or before the stored frontier is dropped,
    * so replays append nothing and out-of-order days are REJECTED
    * rather than silently corrupting the recursion (CUSUM is
    * order-defined). The feed contract is therefore DAY-ATOMIC: a
    * day's rows must not span triggers, or the frontier day settles
    * with a partial sum and its remainder is rejected — feed from a
    * date-partitioned source (one day's files per trigger). The drop
    * is never silent: rejected (date, rev_cents, batch_id) mass is
    * appended to `<statePath>.rejected` (the lateDataAuditSink
    * discipline), so a violated contract shows up as audit rows, not
    * as a quietly wrong alarm series. Replay caveat: the audit is
    * at-least-once — a crash after the state append but before the
    * checkpoint commit makes the retried trigger classify its own
    * (correctly settled) days as stale, so rejected MASS can
    * overstate true feed violations; each row carries the trigger's
    * `batch_id`, so a reader distinguishes replay duplicates (same
    * day, later batch_id, matching settled state) from genuine
    * contract violations and dedupes on (date_value) as needed. A
    * `.rejected` store written across the batch_id upgrade holds
    * files with and without the column — read it with
    * `option("mergeSchema", "true")` (Spark otherwise resolves the
    * schema from one sampled footer, and an old file winning drops
    * batch_id silently). With μ equal to the batch op's internally-derived
    * mean, the state table reproduces
    * [[graft.ext.Profiler.cusumDrift]] row-for-row (StreamsSpec pins
    * it across two triggers). */
  def cusumIngestSink(stream: DataFrame, dateCol: String,
                      amountCol: String, muCents: Long,
                      statePath: String, checkpoint: String): StreamingQuery =
    stream.writeStream
      .option("checkpointLocation", checkpoint)
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch0: DataFrame, batchId: Long) =>
        val spark = batch0.sparkSession
        val slack = if (muCents >= 0) muCents / 20 else -((-muCents) / 20)
        val daily = batch0
          .select(col(dateCol).as("date_value"),
            col(amountCol).cast("decimal(14,2)").as("amt"))
          .groupBy("date_value")
          .agg((sum(col("amt")) * 100).cast("long").as("rev_cents"))
        val fs = new org.apache.hadoop.fs.Path(statePath).getFileSystem(
          spark.sparkContext.hadoopConfiguration)
        val (pTail, minTail, frontier) =
          if (fs.exists(new org.apache.hadoop.fs.Path(statePath))) {
            val last = spark.read.parquet(statePath)
              .orderBy(col("date_value").desc).limit(1).collect()
            if (last.isEmpty) (0L, 0L, None)
            else (last(0).getAs[Long]("p"), last(0).getAs[Long]("minp"),
              Some(last(0).getAs[Any]("date_value")))
          } else (0L, 0L, None)
        val fresh = frontier match {
          case Some(d) => daily.filter(col("date_value") > lit(d))
          case None => daily
        }
        // loud, not silent: at-or-before-frontier mass (replays, late
        // days, a day split across triggers) lands in the audit file
        frontier.foreach { d =>
          val stale = daily.filter(col("date_value") <= lit(d))
          if (!stale.isEmpty)
            stale.withColumn("batch_id", lit(batchId))
              .write.mode("append").parquet(statePath + ".rejected")
        }
        if (!fresh.isEmpty) {
          // |days-per-trigger|-bounded single-partition window — the
          // same bound the batch op's daily window carries
          val w = org.apache.spark.sql.expressions.Window
            .orderBy(col("date_value"))
            .rowsBetween(
              org.apache.spark.sql.expressions.Window.unboundedPreceding,
              org.apache.spark.sql.expressions.Window.currentRow)
          fresh
            .withColumn("__d", col("rev_cents") - lit(muCents) - lit(slack))
            .withColumn("p", (lit(pTail) + sum(col("__d")).over(w))
              .cast("long"))
            .withColumn("minp",
              least(lit(minTail), min(col("p")).over(w)).cast("long"))
            .withColumn("cusum_cents",
              (col("p") - least(col("minp"), lit(0L))).cast("long"))
            .withColumn("alarm",
              when(col("cusum_cents") > lit(muCents), 1L).otherwise(0L))
            .select(col("date_value"), col("rev_cents"), col("p"),
              col("minp"), col("cusum_cents"), col("alarm"))
            .write.mode("append").parquet(statePath)
        }
      }
      .start()

  /** Streaming link-prediction index maintenance — the online twin of
    * [[graft.ext.Graph.linkPredictApprox]]'s candidate machinery:
    * each micro-batch of EDGES updates a persisted per-node state
    * under `indexDir` that [[graft.ext.Graph.linkPredictApproxFromIndex]]
    * ranks from at any time, equal to the batch ranker over the union
    * of all streamed edges row-for-row:
    *
    *  - `adj/` — (a, n) adjacency rows, both orientations, distinct;
    *  - `sigs/` — an append-only log of per-(a, i) minhash MINIMA
    *    ([[graft.ext.Graph.neighborMinhash]] over each trigger's NEW
    *    adjacency rows). Min is associative, so the reader's min-fold
    *    over the log equals the full neighbor-set signature — no
    *    signature is ever recomputed from the whole graph.
    *
    * Per trigger: canonicalize + dedup the batch's edges, anti-join
    * against stored adjacency (the exactly-once ledger — adjacency IS
    * the ledger, the pqIngestSink discipline), hash only the truly
    * new rows (O(batch · nHashes)), append sigs THEN adj. That order
    * is the crash contract: a crash between the two appends leaves
    * orphan sig minima whose adjacency rows retry on replay (the
    * min-fold absorbs the duplicate minima); the opposite order would
    * mark rows as settled while their signature delta is lost
    * forever — the cdcIngestSink under-count-not-lose rule. */
  def linkApproxIngestSink(stream: DataFrame, indexDir: String,
                           checkpoint: String,
                           nHashes: Int = 8): StreamingQuery =
    stream.writeStream
      .option("checkpointLocation", checkpoint)
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch0: DataFrame, _: Long) =>
        val spark = batch0.sparkSession
        val e = batch0.select(
            least(col("u"), col("v")).cast("long").as("u"),
            greatest(col("u"), col("v")).cast("long").as("v"))
          .filter(col("u") =!= col("v")).dropDuplicates(Seq("u", "v"))
        val badj = e.select(col("u").as("a"), col("v").as("n"))
          .unionByName(e.select(col("v").as("a"), col("u").as("n")))
          .dropDuplicates(Seq("a", "n"))
        // the whole ledger-read → append sequence serializes against
        // linkApproxCompactIndex through the maintenance lock: a
        // trigger that fires mid-compaction blocks, then anti-joins
        // against the COMPACTED adj and appends to it — zero loss
        // (the r11 prose precondition, now code; StreamsSpec pins it)
        graft.meta.MaintenanceLock.withLock(spark, indexDir) {
          val fs = new org.apache.hadoop.fs.Path(indexDir).getFileSystem(
            spark.sparkContext.hadoopConfiguration)
          val newAdj = (if (fs.exists(
              new org.apache.hadoop.fs.Path(s"$indexDir/adj")))
            badj.join(spark.read.parquet(s"$indexDir/adj"),
              Seq("a", "n"), "left_anti")
          else badj).localCheckpoint()
          if (!newAdj.isEmpty) {
            graft.ext.Graph.neighborMinhash(newAdj, nHashes)
              .write.mode("append").parquet(s"$indexDir/sigs")
            newAdj.write.mode("append").parquet(s"$indexDir/adj")
          }
        }
      }
      .start()

  /** Streaming lexical-index ingest — the sparse-retrieval member of
    * the index-sink family ([[pqIngestSink]] dense,
    * [[linkApproxIngestSink]] graph): each trigger's documents
    * append postings + one additive stats segment to the persisted
    * BM25 inverted index, O(batch) and corpus-independent (the
    * measured flat append row, SCALE.md §52). Expects columns
    * `(doc_id, text)`.
    *
    * Exactly-once: a crash-replayed trigger re-offers documents whose
    * postings already landed; the anti-join against the index's doc
    * ids drops them. Duplicated postings would not merely over-count
    * here — they would double tf and CORRUPT every score of the
    * affected terms, so the ledger discipline is load-bearing, not
    * hygiene. The anti-join and the append run under ONE maintenance
    * lock hold ([[graft.ext.Lexical.lexAppendUnlocked]]), so a
    * compaction can never interleave between them, and a trigger
    * that fires mid-compaction blocks then appends to the compacted
    * store — the linkApproxIngestSink zero-loss contract. A crash
    * INSIDE the append (postings landed, stats row not) leaves
    * N/avgdl lagging one batch — the module's declared recovery is
    * [[graft.ext.Lexical.lexRepairStats]]; df and tf stay exact
    * throughout because both derive from postings alone. */
  def lexIngestSink(stream: DataFrame, indexDir: String,
                    checkpoint: String,
                    nBuckets: Int = 64): StreamingQuery =
    stream.writeStream
      .option("checkpointLocation", checkpoint)
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch0: DataFrame, _: Long) =>
        val spark = batch0.sparkSession
        val deduped = batch0.select(col("doc_id"), col("text"))
          .dropDuplicates(Seq("doc_id"))
        graft.meta.MaintenanceLock.withLock(spark, indexDir) {
          val fs = new org.apache.hadoop.fs.Path(indexDir).getFileSystem(
            spark.sparkContext.hadoopConfiguration)
          if (!fs.exists(
              new org.apache.hadoop.fs.Path(s"$indexDir/postings"))) {
            // first trigger bootstraps the store (stats seg 0 +
            // postings, postings last — the build's crash contract)
            if (!deduped.isEmpty)
              graft.ext.Lexical.lexWriteIndex(deduped, col("doc_id"),
                col("text"), indexDir, nBuckets)
          } else {
            val fresh = deduped.join(
                spark.read.parquet(s"$indexDir/postings")
                  .select(col("doc_id")).distinct(),
                Seq("doc_id"), "left_anti")
              .localCheckpoint()
            if (!fresh.isEmpty)
              graft.ext.Lexical.lexAppendUnlocked(spark, fresh,
                col("doc_id"), col("text"), indexDir, nBuckets)
          }
        }
      }
      .start()

  /** Streaming leakage-free split enforcement — the online twin of
    * [[graft.ext.Dedup.componentSplit]]: each micro-batch of documents
    * is banded against the PERSISTED signature indexes (simhash band
    * rows + minhash band rows — the nearDupIngestSink band-index
    * pattern, both detectors because the batch op unions both pair
    * sets), its new near-dup edges merged into the incremental
    * component labels under `dir/labels`, and the whole manifest read
    * back at any time via [[graft.ext.Dedup.componentSplitFromIndex]]
    * — equal to the batch op over the union of all streamed documents
    * row-for-row (StreamsSpec pins it).
    *
    * Per trigger: batch signatures + band rows are O(batch); both
    * candidate joins probe with the BATCH side only (the corpus side
    * is an equi-lookup into the band indexes — never corpus×corpus;
    * at scale the indexes persist bucketed by (band, sig)).
    * Components merge in CONTRACTED space: stored endpoints map to
    * their component label first, so the star contraction runs over
    * batch docs + touched components, never the corpus. Labels are
    * min-reachable-doc-ids exactly as the batch op computes them
    * (the min of merged mins IS the global min), so split assignment
    * — a deterministic bucket of the component label — never flips
    * for an untouched component. The labels store rewrites through
    * StagedWrite each trigger (merges can relabel old rows); at 100 TB
    * partition labels by a bucket of `component` and rewrite only the
    * buckets the trigger's merge map touches.
    *
    * Delivery: labels ARE the ledger (docs already labeled drop out
    * up front), written LAST; band appends anti-join the stored band
    * docs, so the crash window between bands and labels replays to
    * the identical state instead of duplicating band rows. Docs too
    * short for either signature still get (self-)labeled — the batch
    * op's vertices are ALL docs. The no-straddle invariant — no
    * candidate pair crosses a split boundary — is re-checked on the
    * trigger's own edges after every merge and fails the trigger
    * loudly rather than let a violated merge settle. */
  def componentSplitIngestSink(stream: DataFrame, dir: String,
                               checkpoint: String, maxHamming: Int = 3,
                               shingle: Int = 3, k: Int = 8,
                               rowsPerBand: Int = 2, trainPct: Int = 90,
                               validPct: Int = 5): StreamingQuery =
    stream.writeStream
      .option("checkpointLocation", checkpoint)
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch0: DataFrame, _: Long) =>
        val spark = batch0.sparkSession
        import graft.ext.Dedup
        val simPath = s"$dir/simbands"
        val mhPath = s"$dir/mhbands"
        val labelsPath = s"$dir/labels"
        val fs = new org.apache.hadoop.fs.Path(dir).getFileSystem(
          spark.sparkContext.hadoopConfiguration)
        def exists(p: String) = fs.exists(new org.apache.hadoop.fs.Path(p))
        val deduped = batch0.dropDuplicates(Seq("doc_id"))
        val batch = (if (exists(labelsPath))
            deduped.join(spark.read.parquet(labelsPath).select("doc_id"),
              Seq("doc_id"), "left_anti")
          else deduped).localCheckpoint()
        if (!batch.isEmpty) {
          val ssigs = Dedup.simhash(batch, col("doc_id"), col("text"))
            .localCheckpoint()
          val msigs = Dedup.minhashSignature(batch, col("doc_id"),
            col("text"), shingle, k).localCheckpoint()
          val sBands = Dedup.simhashBandRows(ssigs).localCheckpoint()
          val mBands = Dedup.minhashBandRows(msigs, k, rowsPerBand)
            .select(col("doc_id"), col("band"), col("sig"))
            .localCheckpoint()
          // within-batch pairs: the batch op's own generators
          val within = Dedup.simhashPairs(ssigs, maxHamming)
            .select(col("d1"), col("d2"))
            .unionByName(Dedup.minhashCandidates(msigs, k, rowsPerBand)
              .select(col("d1"), col("d2")))
          // batch-vs-index pairs: equi-lookup into the band stores,
          // exact hamming re-check on the sim side (duplicate
          // surfacing across bands is fine — one distinct below)
          val vsSim = if (exists(simPath))
            sBands.select(col("band"), col("bv"),
                col("doc_id").as("__bd"), col("simhash").as("__bs"))
              .join(spark.read.parquet(simPath).select(col("band"),
                col("bv"), col("doc_id").as("__sd"),
                col("simhash").as("__ss")), Seq("band", "bv"))
              .filter(col("__bd") =!= col("__sd") &&
                bit_count(col("__bs").bitwiseXOR(col("__ss")))
                  <= maxHamming)
              .select(least(col("__bd"), col("__sd")).as("d1"),
                greatest(col("__bd"), col("__sd")).as("d2"))
          else within.limit(0)
          val vsMh = if (exists(mhPath))
            mBands.select(col("band"), col("sig"),
                col("doc_id").as("__bd"))
              .join(spark.read.parquet(mhPath).select(col("band"),
                col("sig"), col("doc_id").as("__sd")), Seq("band", "sig"))
              .filter(col("__bd") =!= col("__sd"))
              .select(least(col("__bd"), col("__sd")).as("d1"),
                greatest(col("__bd"), col("__sd")).as("d2"))
          else within.limit(0)
          val pairs = within.unionByName(vsSim).unionByName(vsMh)
            .distinct().localCheckpoint()
          // contract stored endpoints to their component label; new
          // docs stand for themselves (label spaces are disjoint:
          // stored labels are old doc ids, the batch is new ids)
          val stored = if (exists(labelsPath))
            spark.read.parquet(labelsPath)
          else spark.range(0).select(col("id").as("doc_id"),
            col("id").as("component"))
          val contracted = pairs
            .join(stored.select(col("doc_id").as("d1"),
              col("component").as("__c1")), Seq("d1"), "left")
            .join(stored.select(col("doc_id").as("d2"),
              col("component").as("__c2")), Seq("d2"), "left")
            .select(coalesce(col("__c1"), col("d1")).as("u"),
              coalesce(col("__c2"), col("d2")).as("v"))
            .filter(col("u") =!= col("v"))
            .select(least(col("u"), col("v")).as("d1"),
              greatest(col("u"), col("v")).as("d2")).distinct()
          val verts = batch.select(col("doc_id"))
            .unionByName(contracted.select(col("d1").as("doc_id")))
            .unionByName(contracted.select(col("d2").as("doc_id")))
            .distinct()
          val merged = Dedup.starComponents(contracted, verts)
            .select(col("doc_id").as("__node"),
              col("component").as("__new")).localCheckpoint()
          // bands append BEFORE labels (labels are the ledger): a
          // crash in between replays to the same state via the
          // band-store anti-joins above / here
          def appendNew(bands: DataFrame, path: String): Unit = {
            val fresh = if (exists(path))
              bands.join(spark.read.parquet(path)
                .select("doc_id").distinct(), Seq("doc_id"), "left_anti")
            else bands
            fresh.write.mode("append").parquet(path)
          }
          appendNew(sBands, simPath)
          appendNew(mBands, mhPath)
          val batchLabels = batch.select(col("doc_id"))
            .join(merged, col("doc_id") === col("__node"), "left")
            .select(col("doc_id"),
              coalesce(col("__new"), col("doc_id")).as("component"))
          val remapped = stored
            .join(merged, col("component") === col("__node"), "left")
            .select(col("doc_id"),
              coalesce(col("__new"), col("component")).as("component"))
          val all = remapped.unionByName(batchLabels).localCheckpoint()
          // the invariant the sink exists for, checked per trigger on
          // its own edges BEFORE the labels publish: a candidate pair
          // must never straddle. Publishing first would let a
          // violated merge settle durably — on restart the replayed
          // batch anti-joins away against the completed labels store,
          // the trigger no-ops, and the exception never recurs, so
          // the leakage-violating manifest would persist silently.
          // Checking on the candidate state keeps the failure
          // re-detectable on every replay until fixed.
          val split = all.select(col("doc_id"),
            Dedup.splitOfComponent(col("component"), trainPct, validPct)
              .as("split"))
          val straddle = pairs
            .join(split.select(col("doc_id").as("d1"),
              col("split").as("__s1")), Seq("d1"))
            .join(split.select(col("doc_id").as("d2"),
              col("split").as("__s2")), Seq("d2"))
            .filter(col("__s1") =!= col("__s2")).count()
          if (straddle != 0)
            throw new IllegalStateException(
              s"component_split invariant violated: $straddle candidate " +
                "pairs straddle a split boundary after merge")
          graft.meta.StagedWrite.overwrite(all, labelsPath)
        }
      }
      .start()

  /** Streaming sequence packer — the incremental twin of
    * [[graft.ext.Corpus.seqPack]]: documents arrive as a stream, each
    * shard's running token total lives in keyed state, and every doc
    * is placed at the stream position the counter had when it arrived.
    * Within a micro-batch a shard's docs pack in doc_id order; across
    * batches, in arrival order — the online packing contract (a
    * streaming packer cannot re-order history; the batch op re-derives
    * the id-ordered layout when determinism across the whole corpus
    * matters more than latency).
    *
    * State per shard is ONE int64 — bounded regardless of stream
    * length, shuffled once by shard like every keyed stateful op here.
    * `nShards` bounds the useful parallelism of the stateful stage,
    * exactly as it bounds the batch window's. Null text counts as 0
    * tokens (the doc is placed but consumes no budget) — a stream
    * must define the case rather than poison the query; the batch op
    * propagates the null instead. */
  def seqPackStream(docs: DataFrame, budget: Long,
                    nShards: Int): Dataset[PackedDoc] = {
    require(budget > 0, s"budget must be positive, got $budget")
    require(nShards > 0, s"nShards must be positive, got $nShards")
    val spark = docs.sparkSession
    import spark.implicits._
    docs
      .select(col("doc_id").cast("long"),
        graft.functions.Hashing.permBucket(col("doc_id"), 2, nShards)
          .as("shard"),
        coalesce(size(split(col("text"), " ")).cast("long"), lit(0L))
          .as("n_tokens"))
      .as[(Long, Long, Long)]
      .groupByKey(_._2)
      .flatMapGroupsWithState[Long, PackedDoc](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (shard, it, gs) =>
          var run = if (gs.exists) gs.get else 0L
          val out = it.toSeq.sortBy(_._1).map { case (id, _, n) =>
            val d = PackedDoc(id, shard, n, run,
              run / budget, run % budget)
            run += n
            d
          }
          gs.update(run)
          out.iterator
      }
  }

  case class FunnelUpdate(user_id: Long, n_reached: Int,
                          stage_ts: Seq[Long])

  /** Streaming ordered funnel — the incremental twin of
    * [[graft.ext.Sessions.funnel]]: per-user keyed state holds the
    * greedy stage-completion chain (first stage-1 time, first later
    * stage-2 time, …), advanced by a forward scan of each
    * micro-batch's events in event-time order. The forward greedy
    * scan IS the batch min-chain (t1 = first stage-1 event; tₙ =
    * first stage-n event after tₙ₋₁), so a single-batch run matches
    * the batch operator exactly; across batches the online contract
    * applies (arrival order — a late-arriving earlier event cannot
    * retroactively lower a finalized stage, the same
    * cannot-reorder-history contract as [[seqPackStream]]).
    *
    * State per user is at most `stages.length` int64s — bounded for
    * any stream length; one keyed shuffle, like every stateful op
    * here. Emits the user's full chain (timestamps as epoch µs) each
    * time their group is processed; `n_reached` only grows, so the
    * max-`n_reached` row per user is the current funnel position. */
  /** Streaming DSIR scorer — the online face of
    * [[graft.ext.Corpus.dsirIncremental]]: the LLR table is fitted
    * OFFLINE ([[graft.ext.Corpus.dsirFitLlr]], persisted with the
    * model run) and every arriving document is scored as a pure
    * stateless projection (compiled feature-hash pass + two codegen
    * int64 dots — no state store, no shuffle, any micro-batch size).
    * Because scoring is stateless and integer-exact, stream output
    * equals the batch [[graft.ext.Corpus.dsirScore]] row-for-row on
    * the same documents (StreamsSpec pins the parity). Selection
    * (top-quarter-per-stratum) stays a batch/trigger-level decision
    * downstream — a streaming operator cannot rank against documents
    * it has not seen. */
  def dsirScoreStream(docs: DataFrame, llr: Array[Long]): DataFrame =
    graft.ext.Corpus.dsirScore(docs, col("doc_id"), col("text"), llr)

  def funnelStream(events: DataFrame,
                   stages: Seq[String]): Dataset[FunnelUpdate] = {
    require(stages.nonEmpty, "funnel needs at least one stage")
    val spark = events.sparkSession
    import spark.implicits._
    events
      .select(col("user_id").cast("long"),
        unix_micros(col("ts").cast("timestamp")).as("ts_us"),
        col("event_type"))
      .as[(Long, Long, String)]
      .groupByKey(_._1)
      .mapGroupsWithState[List[Long], FunnelUpdate](
        GroupStateTimeout.NoTimeout) { (user, it, gs) =>
        // state list is reversed: head = most recent filled stage
        var st = if (gs.exists) gs.get else Nil
        it.toSeq.sortBy(r => (r._2, r._3)).foreach { case (_, ts, tp) =>
          val n = st.length
          if (n < stages.length && tp == stages(n) &&
              (st.isEmpty || ts > st.head)) st = ts :: st
        }
        gs.update(st)
        FunnelUpdate(user, st.length, st.reverse)
      }
  }

  /** One within-session event-type transition observed on the
    * stream; aggregate downstream for the live transition matrix. */
  case class TransitionEvent(prev_type: String, next_type: String)

  /** Streaming transition extractor — the incremental twin of
    * [[graft.ext.Sessions.transitionCounts]]: per-user keyed state
    * holds only the LAST event (timestamp, type); each micro-batch's
    * events fold through it in event-time order, emitting a
    * (prev → next) row whenever the gap rule keeps the pair inside
    * one session. The in-batch event-time fold IS the batch lag
    * window (same (ts, event_id) tie order, same `ts − prev ≤ gap`
    * session rule), so a single-batch run matches
    * [[graft.ext.Sessions.transitionCounts]] bigram-for-bigram
    * (StreamsSpec pins it); across batches the arrival-order online
    * contract applies, as for [[funnelStream]]/[[seqPackStream]].
    *
    * State per user is ONE (int64, string) pair — bounded for any
    * stream length, smaller than the session ops' span state; one
    * keyed shuffle. Emitted rows feed a streaming groupBy count (the
    * |types|²-bounded matrix), with ppm normalization left to the
    * reader of the counts table, where the row totals live. */
  def transitionsStream(events: DataFrame,
                        gapSeconds: Long): Dataset[TransitionEvent] = {
    val spark = events.sparkSession
    import spark.implicits._
    val gapUs = gapSeconds * 1000000L
    events
      .select(col("user_id").cast("long"),
        unix_micros(col("ts").cast("timestamp")).as("ts_us"),
        col("event_id").cast("long"), col("event_type"))
      .as[(Long, Long, Long, String)]
      .groupByKey(_._1)
      .flatMapGroupsWithState[(Long, String), TransitionEvent](
        OutputMode.Append, GroupStateTimeout.NoTimeout) { (_, it, gs) =>
        var last: Option[(Long, String)] =
          if (gs.exists) Some(gs.get) else None
        val out = List.newBuilder[TransitionEvent]
        it.toSeq.sortBy(r => (r._2, r._3)).foreach { case (_, ts, _, tp) =>
          last match {
            case Some((lts, ltp)) if ts - lts <= gapUs =>
              out += TransitionEvent(ltp, tp)
            case _ => ()
          }
          last = Some((ts, tp))
        }
        last.foreach(gs.update)
        out.result().iterator
      }
  }

  /** One DECIDED attribution on the stream: a source event matched to
    * its first at-or-after target within tolerance, or null-attributed
    * when the first target landed beyond it. */
  case class AttributionResult(user_id: Long, event_id: Long, ts_us: Long,
      to_event_id: Option[Long], to_ts_us: Option[Long],
      lag_s: Option[Long])

  /** Streaming forward as-of attribution — the incremental twin of
    * [[graft.ext.Sessions.attributionAsof]]. Per-user keyed state
    * holds the PENDING source events (clicks awaiting their first
    * purchase); each arriving target DECIDES every pending source at
    * or before it — matched when the lag fits the tolerance, null
    * otherwise — and removes them from state. The in-batch event-time
    * fold uses the batch's exact (ts, kind, event_id) tie order
    * (sources before targets at the same instant, so same-instant
    * targets attribute), so a single-batch run equals the batch
    * operator row-for-row on every DECIDED source (StreamsSpec pins
    * it). Sources with no subsequent target stay pending — online,
    * "never converted" is unknowable without a horizon.
    *
    * State per user is the pending-source list. With
    * `timeoutFlush = false` (default) it is bounded by the source
    * rate within one source→target gap ONLY for users that
    * eventually convert — a user who never emits a target
    * accumulates every source forever (NoTimeout, nothing evicts).
    * The production posture is `timeoutFlush = true` (the caller
    * must declare `withWatermark` on `ts` upstream): once the
    * event-time watermark passes a pending source's
    * `ts + tolSeconds` horizon, ANY future target must land beyond
    * tolerance, so the source is decidable — it is flushed as the
    * exact null-attributed row the batch operator would emit and
    * removed from state, via an event-time timeout registered at the
    * earliest pending horizon. State is then bounded by the source
    * rate within one tolerance window for EVERY user. One keyed
    * shuffle, like the session ops.
    *
    * `timeoutFlush = true` declares the watermark ITSELF (on the
    * projected event-time column, `watermarkDelay` behind max event
    * time) — Spark requires the watermark-tagged attribute in the
    * stateful operator's direct input, so an upstream `withWatermark`
    * on a column this projection replaces would not satisfy the
    * planner anyway. */
  /** Streaming twin of [[graft.ext.Prefs.pairStats]] — incremental
    * Bradley–Terry sufficient statistics. The BT design premise
    * ("the corpus is touched once; the solver runs on ≤ |players|²
    * rows") is exactly a streaming fold: per-pair (n, wins) counts
    * are a commutative monoid, so each trigger aggregates ITS match
    * rows (O(batch)) and merges into the persisted pair table
    * (O(players²)) — the 100 TB match log never re-aggregates, and
    * [[graft.ext.Prefs.ratingChain]] re-solves from the tiny state
    * table whenever a fresh leaderboard is wanted.
    *
    * Delivery: exactly-once via the batchId ledger riding on the
    * state rows (the [[checksumIngestSink]] contract — counts are
    * NOT idempotent, so replays must be no-ops, not re-folds);
    * publish is a staged swap, so a crash never tears the table.
    * Input schema = [[graft.ext.Prefs.matchesFrom]] output:
    * (p_lo, p_hi, winner). */
  def btIngestSink(matches: DataFrame, statePath: String,
                   checkpoint: String): StreamingQuery =
    btIngest(matches, statePath, checkpoint, dated = false)

  /** Keyed twin of [[btIngestSink]] for the windowed leaderboard:
    * input = [[graft.ext.Prefs.datedMatchesFrom]] rows (match_day,
    * p_lo, p_hi, winner), state = per-(day, pair) counts. The state
    * stays metadata-scale (|days|·|players|² rows) and
    * [[graft.ext.Prefs.btRatingByDay]] re-solves every window from
    * it — the streaming path to rating-over-time without ever
    * re-aggregating the match log. */
  def btDailyIngestSink(matches: DataFrame, statePath: String,
                        checkpoint: String): StreamingQuery =
    btIngest(matches, statePath, checkpoint, dated = true)

  private def btIngest(matches: DataFrame, statePath: String,
                       checkpoint: String,
                       dated: Boolean): StreamingQuery =
    matches.writeStream
      .option("checkpointLocation", checkpoint)
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val spark = batch.sparkSession
        def agg(m: DataFrame): DataFrame =
          if (dated) graft.ext.Prefs.pairStatsByDay(m)
          else graft.ext.Prefs.pairStats(m)
        val keys = (if (dated) Seq("match_day") else Nil) ++
          Seq("p_lo", "p_hi")
        val fs = new org.apache.hadoop.fs.Path(statePath).getFileSystem(
          spark.sparkContext.hadoopConfiguration)
        val prior: DataFrame =
          if (fs.exists(new org.apache.hadoop.fs.Path(statePath)))
            spark.read.parquet(statePath)
          // schema-correct empty state derived from the input itself
          else agg(batch.limit(0)).withColumn("last_batch_id", lit(-1L))
        val lastId = prior.agg(coalesce(max(col("last_batch_id")),
          lit(-1L))).collect()(0).getLong(0)
        if (batchId > lastId) {
          val merged = prior
            .select(keys.map(col) :+ col("n_matches") :+ col("wins_lo"): _*)
            .unionAll(agg(batch))
            .groupBy(keys.map(col): _*)
            .agg(sum(col("n_matches")).cast("long").as("n_matches"),
              sum(col("wins_lo")).cast("long").as("wins_lo"))
            .withColumn("last_batch_id", lit(batchId))
          StagedWrite.overwrite(merged, statePath)
        }
      }
      .start()

  /** The canonical pair relation from a [[btIngestSink]] state table
    * — drop the ledger column; feed [[graft.ext.Prefs.btRating]]. */
  def btPairState(spark: SparkSession, statePath: String): DataFrame =
    spark.read.parquet(statePath)
      .select("p_lo", "p_hi", "n_matches", "wins_lo")

  /** [[btPairState]] for a [[btDailyIngestSink]] table — feeds
    * [[graft.ext.Prefs.btRatingByDay]]. */
  def btDailyPairState(spark: SparkSession, statePath: String): DataFrame =
    spark.read.parquet(statePath)
      .select("match_day", "p_lo", "p_hi", "n_matches", "wins_lo")

  /** Streaming PCA sufficient statistics: each trigger's embedding
    * micro-batch folds its moment cells ([[graft.ext.Pca.moments]] —
    * first+second moments, exact integers) into a d(d+3)/2-row state
    * table. Covariance / eigenvectors / projections derive from the
    * state at ANY point via [[graft.ext.Pca.covFromMoments]] without
    * rescanning a single settled vector — the additive-statistics
    * twin of [[btIngestSink]], same exactly-once batchId ledger
    * (foreachBatch redelivers a failed trigger with the SAME batchId
    * and data; folding only batchId > last_batch_id makes replays
    * no-ops), same staged atomic publish. */
  def pcaMomentsIngestSink(stream: DataFrame, dim: Int,
                           statePath: String, checkpoint: String,
                           byLabel: Boolean = false): StreamingQuery =
    stream.writeStream
      .option("checkpointLocation", checkpoint)
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val spark = batch.sparkSession
        // byLabel keys the fold by the label column too — the
        // per-domain drift posture (watch each domain's covariance
        // move as its batches arrive), same ledger, same publish
        def mom(df: DataFrame): DataFrame =
          if (byLabel) graft.ext.Pca.momentsBy(df, col("label"),
            col("vec_id"), col("embedding"), dim)
          else graft.ext.Pca.moments(df, col("vec_id"),
            col("embedding"), dim)
        val keys = (if (byLabel) Seq("grp") else Nil) ++
          Seq("i", "j", "s", "cnt")
        def merge(ts: Seq[DataFrame]): DataFrame =
          if (byLabel) graft.ext.Pca.mergeMomentsBy(ts)
          else graft.ext.Pca.mergeMoments(ts)
        val fs = new org.apache.hadoop.fs.Path(statePath).getFileSystem(
          spark.sparkContext.hadoopConfiguration)
        val prior: DataFrame =
          if (fs.exists(new org.apache.hadoop.fs.Path(statePath)))
            spark.read.parquet(statePath)
          // schema-correct empty state derived from the input itself
          else mom(batch.limit(0)).withColumn("last_batch_id", lit(-1L))
        val lastId = prior.agg(coalesce(max(col("last_batch_id")),
          lit(-1L))).collect()(0).getLong(0)
        if (batchId > lastId) {
          val merged = merge(Seq(
              prior.select(keys.map(col): _*), mom(batch)))
            .withColumn("last_batch_id", lit(batchId))
          StagedWrite.overwrite(merged, statePath)
        }
      }
      .start()

  /** The canonical moment relation from a [[pcaMomentsIngestSink]]
    * state table — drop the ledger column; feed
    * [[graft.ext.Pca.covFromMoments]]. */
  def pcaMomentsState(spark: SparkSession, statePath: String): DataFrame =
    spark.read.parquet(statePath).select("i", "j", "s", "cnt")

  def attributionStream(events: DataFrame, fromType: String,
                        toType: String, tolSeconds: Long,
                        timeoutFlush: Boolean = false,
                        watermarkDelay: String = "0 seconds"
                       ): Dataset[AttributionResult] = {
    val spark = events.sparkSession
    import spark.implicits._
    val tolUs = tolSeconds * 1000000L
    val timeoutConf =
      if (timeoutFlush) GroupStateTimeout.EventTimeTimeout
      else GroupStateTimeout.NoTimeout
    val projected = events
      .filter(col("event_type").isin(fromType, toType))
      .select(col("user_id").cast("long"),
        unix_micros(col("ts").cast("timestamp")).as("ts_us"),
        col("event_id").cast("long"),
        when(col("event_type") === toType, 1).otherwise(0).as("kind"),
        col("ts").cast("timestamp").as("__event_ts"))
    val withWm =
      if (timeoutFlush) projected.withWatermark("__event_ts", watermarkDelay)
      else projected
    withWm
      .as[(Long, Long, Long, Int, java.sql.Timestamp)]
      .groupByKey(_._1)
      .flatMapGroupsWithState[List[(Long, Long)], AttributionResult](
        OutputMode.Append, timeoutConf) { (user, it, gs) =>
        // pending sources as (event_id, ts_us), arrival order = time order
        var pending: List[(Long, Long)] = if (gs.exists) gs.get else Nil
        val out = List.newBuilder[AttributionResult]
        it.toSeq.sortBy(r => (r._2, r._4, r._3)).foreach {
          case (_, ts, id, kind, _) =>
            if (kind == 0) pending = pending :+ (id -> ts)
            else {
              val (decided, rest) = pending.partition(_._2 <= ts)
              decided.foreach { case (srcId, srcTs) =>
                val lagUs = ts - srcTs
                out += (if (lagUs <= tolUs)
                  AttributionResult(user, srcId, srcTs, Some(id), Some(ts),
                    Some(lagUs / 1000000L))
                else AttributionResult(user, srcId, srcTs, None, None, None))
              }
              pending = rest
            }
        }
        if (timeoutFlush) {
          // watermark-expired sources are DECIDED null (strict <: a
          // target at exactly ts = wm still attributes with lag = tol)
          val wmUs = gs.getCurrentWatermarkMs() * 1000L
          val (expired, alive) = pending.partition(_._2 + tolUs < wmUs)
          expired.foreach { case (srcId, srcTs) =>
            out += AttributionResult(user, srcId, srcTs, None, None, None)
          }
          pending = alive
          if (pending.nonEmpty)
            gs.setTimeoutTimestamp(
              pending.map(_._2).min / 1000L + tolSeconds * 1000L + 1L)
        }
        if (pending.isEmpty) { if (gs.exists) gs.remove() }
        else gs.update(pending)
        out.result().iterator
      }
  }
}
