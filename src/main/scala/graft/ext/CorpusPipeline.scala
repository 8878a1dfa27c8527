package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** End-to-end training-corpus preparation: the composition the
  * individual `graft.ext` operators exist for, in the order a
  * production pipeline runs them (cheap row-local filters first, the
  * expensive pairwise stage last-but-one, assignment as a pure
  * projection at the end):
  *
  *   1. quality gate      — row-local, drops the worst docs before
  *                          anything pays a shuffle for them
  *   2. exact dedup       — one keyed shuffle on the canonical word-set
  *                          key; collapses literal/permuted copies
  *   3. near-dup best-keep — banded SimHash pairs, keep the
  *                          highest-quality representative
  *   4. contamination gate — drop docs overlapping the eval slice
  *                          (train/test leakage)
  *   5. stratified sample — hash-deterministic per-language rebalance
  *   6. split assignment  — train/val/test, stateless projection
  *
  * Mirrors [[graft.Pipeline]]'s role for the warehouse: the stages are
  * the tested operators, this object owns only their order and the
  * stage accounting (the run-log analog: row counts per stage, so a
  * collapsing corpus is visible instead of silent).
  *
  * Everything is deterministic — rerunning yields the identical corpus
  * (hash sampling, total-order keep rules, no rand()) — so the whole
  * pipeline is idempotent and resumable from any stage.
  */
object CorpusPipeline {

  /** Per-stage surviving row count, in execution order. `secs` is the
    * wall time of that stage's count ACTION — i.e. the cost of
    * materializing the pipeline up to and including the stage (counts
    * re-execute upstream lineage, so deltas between successive rows
    * approximate per-stage cost only while no stage is cached). */
  final case class StageCount(stage: String, rows: Long, secs: Double = 0.0)

  /** The per-stage frames of [[prepare]], in execution order, NO
    * actions — the single source [[prepare]]'s counting and the
    * declared `corpus_funnel` audit query both consume (a stage
    * added here shows up in both automatically). Last frame = the
    * prepared corpus. */
  def stageFrames(docs: DataFrame,
                  evalPred: Column,
                  minQuality: Double = 0.3,
                  maxContamination: Double = 0.5,
                  shingle: Int = 3,
                  rates: Seq[(String, Int)] = Seq.empty,
                  defaultPermille: Int = 1000): Seq[(String, DataFrame)] = {
    val base = docs

    // 1. quality gate (split once behind an alias boundary; the score
    // references the words array four times — see qualityScoreFrom)
    val scored = base
      .withColumn("__w", split(col("text"), " "))
      .withColumn("quality", TextAnalysis.qualityScoreFrom(col("__w")))
      .drop("__w")
    val qualityOk = scored.filter(col("quality") >= minQuality)

    // 2. exact dedup: keep the min doc_id per canonical word-set key
    val keyed = qualityOk.withColumn("__k", Dedup.wordSetKey(col("text")))
    val keep = keyed.groupBy(col("__k"))
      .agg(min(col("doc_id")).as("doc_id"))
    val exact = keyed.join(keep, Seq("__k", "doc_id"), "left_semi")
      .drop("__k")

    // 3. near-dup best-keep (quality DESC, id ASC total order)
    val nearDeduped =
      Dedup.nearDupBestKeep(exact, col("doc_id"), col("text"),
          col("quality"), maxHamming = 3)
        .join(exact.drop("quality"), Seq("doc_id"))

    // 4. contamination gate: drop docs sharing too many n-grams with
    // the eval slice (the eval docs themselves also leave the corpus)
    val contaminated = Corpus.contamination(base, col("doc_id"),
        col("text"), evalPred, shingle, maxContamination)
      .select(col("doc_id"))
    val clean = nearDeduped.filter(!evalPred)
      .join(contaminated, Seq("doc_id"), "left_anti")

    // 5 + 6. rebalance, then assign splits (independent permutations)
    val sampled = Corpus.stratifiedSample(clean, col("doc_id"),
      col("lang"), rates, defaultPermille)
    val out = Corpus.sampleSplit(sampled, col("doc_id"))
    Seq("input" -> base, "quality_gate" -> qualityOk,
      "exact_dedup" -> exact, "neardup_best_keep" -> nearDeduped,
      "contamination_gate" -> clean, "stratified_sample" -> sampled,
      "split_assign" -> out)
  }

  /** Run the full preparation over a `documents`-shaped frame
    * (doc_id, text, lang, source). Returns the prepared corpus
    * (original columns + quality, bucket1k/rate_permille, bucket,
    * split) and the per-stage counts.
    *
    * `countStages=false` skips the per-stage actions (one job each) —
    * at 100 TB run the accounting only when auditing; note exact
    * dedup + best-keep each still materialize their own shuffles
    * either way. */
  def prepare(docs: DataFrame,
              evalPred: Column,
              minQuality: Double = 0.3,
              maxContamination: Double = 0.5,
              shingle: Int = 3,
              rates: Seq[(String, Int)] = Seq.empty,
              defaultPermille: Int = 1000,
              countStages: Boolean = true): (DataFrame, Seq[StageCount]) = {
    val frames = stageFrames(docs, evalPred, minQuality,
      maxContamination, shingle, rates, defaultPermille)
    val counts =
      if (!countStages) Seq.empty
      else frames.map { case (name, df) =>
        val t0 = System.nanoTime()
        val n = df.count()
        StageCount(name, n, (System.nanoTime() - t0) / 1e9)
      }
    (frames.last._2, counts)
  }

  /** The funnel as DATA: one row per pipeline stage with the
    * surviving doc count — the waterfall table a curation run
    * publishes (prepare's StageCount
    * accounting, declared as an oracle-checked query instead of a
    * driver-side log). Each stage's count re-executes its upstream
    * lineage (the same trade prepare(countStages=true) makes — run
    * the audit when auditing, not on every ingest). */
  def funnel(docs: DataFrame, evalPred: Column,
             minQuality: Double = 0.3,
             maxContamination: Double = 0.5,
             shingle: Int = 3): DataFrame = {
    val frames = stageFrames(docs, evalPred, minQuality,
      maxContamination, shingle)
    frames.zipWithIndex.map { case ((name, df), i) =>
      df.agg(count(lit(1)).cast("long").as("n_rows"))
        .select(lit(i + 1L).as("stage_no"), lit(name).as("stage"),
          col("n_rows"))
    }.reduce(_ union _)
  }

  /** DuckDB twin of [[funnel]] over `documents`. */
  def funnelOracleSql(evalPred: String,
                      minQuality: Double = 0.3,
                      maxContamination: Double = 0.5,
                      shingle: Int = 3): String = {
    val (bucket1k, rate) = Corpus.stratifiedSampleSql(
      "doc_id", "lang", Seq.empty, 1000)
    s"""
    |WITH q0 AS (SELECT doc_id, text, lang, source,
    |  ${TextAnalysis.qualityScoreSql("text")} AS quality FROM documents),
    |qg AS (SELECT * FROM q0 WHERE quality >= $minQuality),
    |ekeep AS (SELECT ${Dedup.wordSetKeySql} AS k, min(doc_id) AS doc_id
    |          FROM qg GROUP BY 1),
    |ex AS (SELECT qg.* FROM qg JOIN ekeep ON qg.doc_id = ekeep.doc_id),
    |${Dedup.simhashCtesFrom("ex")},
    |pairs AS (
    |  SELECT DISTINCT a.doc_id AS d1, b.doc_id AS d2
    |  FROM bands a JOIN bands b
    |    ON a.band = b.band AND a.bv = b.bv AND a.doc_id < b.doc_id
    |  WHERE bit_count(xor(a.simhash, b.simhash)) <= 3),
    |edges AS (SELECT d1 AS x, d2 AS y FROM pairs
    |          UNION ALL SELECT d2 AS x, d1 AS y FROM pairs),
    |dropped AS (
    |  SELECT DISTINCT e.x AS doc_id
    |  FROM edges e
    |  JOIN ex qx ON qx.doc_id = e.x
    |  JOIN ex qy ON qy.doc_id = e.y
    |  WHERE qy.quality > qx.quality
    |     OR (qy.quality = qx.quality AND e.y < e.x)),
    |nd AS (SELECT * FROM ex
    |       WHERE NOT EXISTS (SELECT 1 FROM dropped
    |                         WHERE dropped.doc_id = ex.doc_id)),
    |${Corpus.contaminationCtes(evalPred, shingle)},
    |clean AS (
    |  SELECT * FROM nd
    |  WHERE NOT ($evalPred)
    |    AND NOT EXISTS (SELECT 1 FROM cont_ct
    |                    WHERE cont_ct.doc_id = nd.doc_id
    |                      AND cont_ct.contamination_frac >= $maxContamination)),
    |samp AS (SELECT * FROM clean WHERE $bucket1k < $rate)
    |SELECT CAST(1 AS BIGINT) AS stage_no, 'input' AS stage,
    |  CAST(count(*) AS BIGINT) AS n_rows FROM documents
    |UNION ALL SELECT 2, 'quality_gate', count(*) FROM qg
    |UNION ALL SELECT 3, 'exact_dedup', count(*) FROM ex
    |UNION ALL SELECT 4, 'neardup_best_keep', count(*) FROM nd
    |UNION ALL SELECT 5, 'contamination_gate', count(*) FROM clean
    |UNION ALL SELECT 6, 'stratified_sample', count(*) FROM samp
    |UNION ALL SELECT 7, 'split_assign', count(*) FROM samp
    |ORDER BY stage_no
    |""".stripMargin.trim
  }

  /** [[prepare]] chained into [[Corpus.seqPack]]: clean the corpus,
    * keep the train split, pack its token stream into fixed-budget
    * training sequences — the last mile from raw documents to the
    * sequence layout a trainer reads. The packing sees only surviving
    * train docs, so sequence offsets are dense over the FINAL corpus
    * (packing before filtering would leave holes in every sequence). */
  def preparePack(docs: DataFrame, evalPred: Column, budget: Int,
                  nShards: Int,
                  rates: Seq[(String, Int)] = Seq.empty): DataFrame = {
    val (corpus, _) = prepare(docs, evalPred, rates = rates,
      countStages = false)
    Corpus.seqPack(corpus.filter(col("split") === "train"),
      col("doc_id"), col("text"), budget, nShards)
  }

  /** [[preparePack]] with a CDC span scrub between the train slice
    * and the packer: duplicated content-defined chunks leave the
    * corpus (canonical first occurrence survives), fully-scrubbed
    * docs drop out, and the packer sees the SCRUBBED token stream —
    * so sequence offsets are dense over the text a trainer actually
    * reads. The deepest composition in the library (quality → exact
    * dedup → near-dup best-keep → contamination → sample → split →
    * CDC scrub → pack), oracle-checked as ONE query. */
  def preparePackScrubbed(docs: DataFrame, evalPred: Column, budget: Int,
                          nShards: Int, win: Int = 4, mod: Int = 8,
                          rates: Seq[(String, Int)] = Seq.empty): DataFrame = {
    val (corpus, _) = prepare(docs, evalPred, rates = rates,
      countStages = false)
    val train = corpus.filter(col("split") === "train")
      .select(col("doc_id"), col("text"))
    val scrubbed = Dedup.cdcScrub(train, col("doc_id"), col("text"),
        win, mod)
      .filter(col("scrubbed") =!= "")
      .select(col("doc_id"), col("scrubbed").as("text"))
    Corpus.seqPack(scrubbed, col("doc_id"), col("text"), budget, nShards)
  }

  /** DuckDB twin of [[preparePackScrubbed]]: prepare chain → train
    * slice → the spliced [[Dedup.cdcScrubCtes]] → packing chain over
    * the scrubbed relation. */
  def preparePackScrubbedOracleSql(evalPred: String, budget: Int,
                                   nShards: Int, win: Int = 4,
                                   mod: Int = 8,
                                   rates: Seq[(String, Int)] = Seq.empty): String = {
    val packSql = Corpus.seqPackOracleSql(budget, nShards, rel = "tr")
    require(packSql.startsWith("WITH "), "splice point moved")
    s"""
    |WITH prepared AS (
    |${prepareOracleSql(evalPred, rates = rates)}),
    |tr0 AS (
    |  SELECT p.doc_id, d.text
    |  FROM prepared p JOIN documents d ON p.doc_id = d.doc_id
    |  WHERE p.split = 'train'),
    |${Dedup.cdcScrubCtes(win, mod, "s", rel = "tr0")},
    |tr AS (
    |  SELECT doc_id, scrubbed AS text FROM sscrubrows
    |  WHERE scrubbed <> ''),
    |${packSql.stripPrefix("WITH ")}
    |""".stripMargin.trim
  }

  /** DuckDB twin of [[preparePack]]: the prepare chain as a CTE, the
    * train slice re-joined to `documents` for text, and the packing
    * chain spliced on (its WITH folds into the shared prologue). */
  def preparePackOracleSql(evalPred: String, budget: Int, nShards: Int,
                           rates: Seq[(String, Int)] = Seq.empty): String = {
    val packSql = Corpus.seqPackOracleSql(budget, nShards, rel = "tr")
    require(packSql.startsWith("WITH "), "splice point moved")
    s"""
    |WITH prepared AS (
    |${prepareOracleSql(evalPred, rates = rates)}),
    |tr AS (
    |  SELECT p.doc_id, d.text
    |  FROM prepared p JOIN documents d ON p.doc_id = d.doc_id
    |  WHERE p.split = 'train'),
    |${packSql.stripPrefix("WITH ")}
    |""".stripMargin.trim
  }

  /** DuckDB twin of the WHOLE [[prepare]] composition over
    * `documents` — every stage's oracle chained as CTEs (quality from
    * [[TextAnalysis.qualityScoreSql]], exact keys from
    * [[Dedup.wordSetKeySql]], the simhash band chain from
    * `Dedup.simhashCtesFrom` over the deduped subset, contamination
    * from `Corpus.contaminationCtes`, sampling/split expressions from
    * their builders). The end-to-end pipeline is oracle-checked as ONE
    * query, so a drift in any stage's semantics — or in how the stages
    * hand off — fails the gate, not just the per-op twins. */
  def prepareOracleSql(evalPred: String,
                       minQuality: Double = 0.3,
                       maxContamination: Double = 0.5,
                       shingle: Int = 3,
                       rates: Seq[(String, Int)] = Seq.empty,
                       defaultPermille: Int = 1000): String = {
    val (bucket1k, rate) = Corpus.stratifiedSampleSql(
      "doc_id", "lang", rates, defaultPermille)
    val (bucket, split) = Corpus.sampleSplitSql("doc_id")
    s"""
    |WITH q0 AS (SELECT doc_id, text, lang, source,
    |  ${TextAnalysis.qualityScoreSql("text")} AS quality FROM documents),
    |qg AS (SELECT * FROM q0 WHERE quality >= $minQuality),
    |ekeep AS (SELECT ${Dedup.wordSetKeySql} AS k, min(doc_id) AS doc_id
    |          FROM qg GROUP BY 1),
    |ex AS (SELECT qg.* FROM qg JOIN ekeep ON qg.doc_id = ekeep.doc_id),
    |${Dedup.simhashCtesFrom("ex")},
    |pairs AS (
    |  SELECT DISTINCT a.doc_id AS d1, b.doc_id AS d2
    |  FROM bands a JOIN bands b
    |    ON a.band = b.band AND a.bv = b.bv AND a.doc_id < b.doc_id
    |  WHERE bit_count(xor(a.simhash, b.simhash)) <= 3),
    |edges AS (SELECT d1 AS x, d2 AS y FROM pairs
    |          UNION ALL SELECT d2 AS x, d1 AS y FROM pairs),
    |dropped AS (
    |  SELECT DISTINCT e.x AS doc_id
    |  FROM edges e
    |  JOIN ex qx ON qx.doc_id = e.x
    |  JOIN ex qy ON qy.doc_id = e.y
    |  WHERE qy.quality > qx.quality
    |     OR (qy.quality = qx.quality AND e.y < e.x)),
    |nd AS (SELECT * FROM ex
    |       WHERE NOT EXISTS (SELECT 1 FROM dropped
    |                         WHERE dropped.doc_id = ex.doc_id)),
    |${Corpus.contaminationCtes(evalPred, shingle)},
    |clean AS (
    |  SELECT * FROM nd
    |  WHERE NOT ($evalPred)
    |    AND NOT EXISTS (SELECT 1 FROM cont_ct
    |                    WHERE cont_ct.doc_id = nd.doc_id
    |                      AND cont_ct.contamination_frac >= $maxContamination))
    |SELECT doc_id, lang, source, quality,
    |  $bucket1k AS bucket1k, $rate AS rate_permille,
    |  $bucket AS bucket, $split AS split
    |FROM clean
    |WHERE $bucket1k < $rate
    |ORDER BY doc_id
    |""".stripMargin.trim
  }
}
