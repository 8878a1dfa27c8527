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

  /** Per-stage surviving row count, in execution order. */
  final case class StageCount(stage: String, rows: Long)

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
    val counts = Seq.newBuilder[StageCount]
    def stage(name: String, df: DataFrame): DataFrame = {
      if (countStages) counts += StageCount(name, df.count())
      df
    }

    val base = stage("input", docs)

    // 1. quality gate (split once behind an alias boundary; the score
    // references the words array four times — see qualityScoreFrom)
    val scored = base
      .withColumn("__w", split(col("text"), " "))
      .withColumn("quality", TextAnalysis.qualityScoreFrom(col("__w")))
      .drop("__w")
    val qualityOk = stage("quality_gate",
      scored.filter(col("quality") >= minQuality))

    // 2. exact dedup: keep the min doc_id per canonical word-set key
    val keyed = qualityOk.withColumn("__k", Dedup.wordSetKey(col("text")))
    val keep = keyed.groupBy(col("__k"))
      .agg(min(col("doc_id")).as("doc_id"))
    val exact = stage("exact_dedup",
      keyed.join(keep, Seq("__k", "doc_id"), "left_semi").drop("__k"))

    // 3. near-dup best-keep (quality DESC, id ASC total order)
    val nearDeduped = stage("neardup_best_keep",
      Dedup.nearDupBestKeep(exact, col("doc_id"), col("text"),
          col("quality"), maxHamming = 3)
        .join(exact.drop("quality"), Seq("doc_id")))

    // 4. contamination gate: drop docs sharing too many n-grams with
    // the eval slice (the eval docs themselves also leave the corpus)
    val contaminated = Corpus.contamination(base, col("doc_id"),
        col("text"), evalPred, shingle, maxContamination)
      .select(col("doc_id"))
    val clean = stage("contamination_gate",
      nearDeduped.filter(!evalPred)
        .join(contaminated, Seq("doc_id"), "left_anti"))

    // 5 + 6. rebalance, then assign splits (independent permutations)
    val sampled = stage("stratified_sample",
      Corpus.stratifiedSample(clean, col("doc_id"), col("lang"),
        rates, defaultPermille))
    val out = stage("split_assign",
      Corpus.sampleSplit(sampled, col("doc_id")))
    (out, counts.result())
  }
}
