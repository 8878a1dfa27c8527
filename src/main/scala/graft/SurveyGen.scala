package graft

import java.nio.file.{Files, Paths, Path}
import scala.jdk.CollectionConverters._

/** Generates `SURVEY_QUERIES.md` — the authoritative per-query table
  * behind SURVEY.md §7.3 — straight from the runtime registry
  * (`Queries.all`), so the declared surface and the doc cannot drift:
  *
  *  - **name + oracle flag** come from the registry itself (an entry
  *    with `Some(sql)` is oracle-checked by the driver's DuckDB gate;
  *    `None` would be rows-only — there are none since round 6).
  *  - **family** is assigned by [[family]]; the generator THROWS on an
  *    unclassified name, so adding a query without classifying it
  *    breaks `SurveyGen`/`SurveyGenSpec` instead of silently
  *    desyncing the doc.
  *  - **since round** is derived from the checked-in
  *    `CORRECTNESS_r*.json` driver artifacts (first round a name
  *    appears in); names not yet in any artifact are the current
  *    round's additions, rendered `r{max+1}*`.
  *
  * Run `graft.SurveyGen [repoRoot]` to regenerate; `SurveyGenSpec`
  * asserts the checked-in file's name set and counts match the
  * registry (byte-stability of the round column is NOT asserted —
  * the next driver artifact legitimately refines `r{max+1}*`).
  */
object SurveyGen {

  /** Family taxonomy for the declared surface. Explicit sets, not
    * regex guesses: totality is enforced (unknown name → error). */
  def family(name: String): String = {
    def in(xs: String*) = xs.contains(name)
    def pre(p: String) = name.startsWith(p)
    if (in("dim_date_build", "delta_extract", "deleted_keys", "scd2_dim",
        "surrogate_keys", "unknown_member", "asof_join", "anti_new_rows",
        "fact_delta", "fact_build", "latest_per_key", "mart_current",
        "dup_check", "overlap_check", "overlap_runs", "ref_integrity",
        "reconcile_totals", "reconcile_rows", "distinct_values",
        "string_funcs", "top_violations", "dim_snapshot", "scd2_churn"))
      "parity (§2 warehouse core)"
    else if (pre("sa_")) "suffix-array dedup"
    else if (pre("cdc_") || pre("dup_span") || pre("winnow") ||
        pre("chunk_scrub")) "span/chunk dedup"
    else if (pre("minhash") || pre("simhash") || pre("ngram_") ||
        pre("edit_") || pre("dedup_") || pre("neardup_") ||
        in("exact_dedup", "source_overlap", "dup_rate_by_source",
          "split_leakage", "component_split",
          "containment_estimate", "contamination_check",
          "doc_fingerprint", "k_anonymity", "l_diversity", "t_closeness",
          "suppressed_rollup", "pii_mask", "leakage_scrub", "band_join",
          "dup_payment_audit"))
      "document dedup / LSH"
    else if (pre("semantic_dedup") || pre("cluster_") ||
        pre("embedding_") || pre("ann_") || pre("srp_") || pre("knn_") ||
        pre("pca_") ||
        in("kmeans_update", "feature_hash", "pq_drift_audit",
          "cos_histogram", "label_separation"))
      "similarity / ANN / semantic dedup"
    else if (pre("bpe_") || pre("quality") || pre("gopher") ||
        pre("lang_") || pre("length_") ||
        in("token_count", "vocab_topk", "vocab_coverage", "hapax_stats",
          "tfidf_topk",
          "ttr_stats", "repetition_score", "boilerplate_ratio",
          "phrase_bigrams", "zipf_bands", "lm_fit", "ngram_novelty",
          "doc_chunk", "source_terms", "textrank_keywords"))
      "text analysis / quality"
    else if (pre("corpus_") || pre("mix_") || pre("dsir") ||
        pre("seq_pack") ||
        in("epoch_shuffle", "curriculum_manifest", "pack_manifest",
          "token_budget_sample", "shard_balance", "domain_cap",
          "domain_cap_incremental", "weighted_quantiles",
          "vocab_growth"))
      "corpus prep / packing"
    else if (in("bm25_topk", "hybrid_rrf_topk", "hybrid_rrf_serve",
        "bm25_prf_expand",
        "bm25_persisted", "lex_index_stats", "lex_search_batch",
        "hybrid_serve_batch", "hybrid_rrf_serve_recall",
        "retrieval_mrr", "retrieval_recall_at_k", "retrieval_ndcg",
        "retrieval_ap", "retrieval_summary", "retrieval_by_label",
        "lex_retrieval_mrr",
        "hard_negatives", "hard_negatives_pq", "hard_negatives_pq_recall",
        "triplet_mining",
        "triplet_mining_summary", "triplet_manifest") ||
        pre("eval_"))
      "retrieval"
    else if (pre("bt_")) "preference ranking (Bradley–Terry)"
    else if (pre("graph_") || pre("community_") || pre("walk_") ||
        in("clustering_coeff", "basket_lift", "component_size_hist",
          "link_predict", "link_predict_approx",
          "link_predict_approx_recall", "link_predict_approx_persisted",
          "link_predict_ra",
          "degree_assortativity", "degree_histogram", "kcore_rounds",
        "hits_scores"))
      "graph analytics"
    else if (in("profile_stats", "equi_depth_hist", "drift_check",
        "cusum_drift", "benford_audit", "table_checksum",
        "checksum_incremental", "late_data_audit",
        "winsorized_stats", "forward_fill", "hhi_concentration",
        "theil_sen_trend",
        "zscore_outliers", "mad_outliers", "gini_revenue",
        "spearman_corr", "boxplot_stats", "pareto_abc", "calendar_fill",
        "ewma_volume", "volume_autocorr", "corpus_diff"))
      "profiler / anomaly"
    else if (in("sessionization", "funnel_steps", "attribution_asof",
        "event_transitions", "sliding_event_window", "sliding_window",
        "tumbling_window", "conversion_lag_stats", "event_dedup",
        "interval_union", "event_trigrams"))
      "sessions / event windows"
    else if (in("mart_region_revenue", "mart_top_orders",
        "retention_cohort", "rfm_segments", "new_vs_returning",
        "aov_trend", "supply_risk", "activity_heatmap", "growth_rates",
        "seasonality_profile", "seasonal_split", "order_ship_lag",
        "return_rate_trend", "purchase_intervals", "trending_topk",
        "decay_topk", "cohort_ltv", "cohort_ltv_incremental",
        "ab_test_audit", "rank_movers", "dead_stock"))
      "marts / BI"
    else if (in("bloom_prune", "layout_skipping", "zorder_key",
        "cms_topk_audit", "skew_join", "salted_agg", "sample_estimate",
        "sample_split", "stratified_sample", "fixed_n_sample",
        "priority_sample", "approx_distinct", "approx_quantile",
        "join_size_audit", "partition_planner", "grid_quantiles",
        "resample_stability"))
      "scale devices / sampling"
    else if (in("multimodal_features", "frame_sample", "media_dedup",
        "audio_segments"))
      "multimodal plumbing"
    else if (in("date_funcs", "regex_funcs", "array_funcs",
        "json_extract", "rank_funcs", "lag_lead", "running_total",
        "set_ops", "group_topk", "pivot_agg", "rollup_agg", "cube_agg",
        "grouping_sets"))
      "SQL function surface"
    else sys.error(s"SurveyGen: unclassified query '$name' — " +
      "add it to SurveyGen.family before regenerating")
  }

  /** First round each name appears in a `CORRECTNESS_r*.json`
    * artifact (top-level keys), via Jackson from the Spark jars. */
  def firstRounds(root: Path): Map[String, Int] = {
    val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
    val files = Files.list(root).iterator().asScala
      .filter(_.getFileName.toString.matches("CORRECTNESS_r\\d+\\.json"))
      .toSeq.sortBy(_.getFileName.toString)
    files.foldLeft(Map.empty[String, Int]) { (acc, f) =>
      val r = f.getFileName.toString
        .replaceAll("[^0-9]", "").toInt
      val names = mapper.readTree(f.toFile).fieldNames.asScala.toSeq
      names.foldLeft(acc)((m, n) => if (m.contains(n)) m else m + (n -> r))
    }
  }

  def render(root: Path): String = {
    val reg = Queries.all.map { case (n, _, sql) => (n, sql.isDefined) }
    val seen = firstRounds(root)
    val cur = (if (seen.isEmpty) 0 else seen.values.max) + 1
    val rows = reg
      .map { case (n, o) =>
        (family(n), n, o, seen.get(n).map("r" + _).getOrElse(s"r$cur*")) }
      .sortBy { case (f, n, _, _) => (f, n) }
    val withOracle = reg.count(_._2)
    val sb = new StringBuilder
    sb ++= "# Declared query surface (GENERATED — do not edit)\n\n"
    sb ++= "Regenerate with `graft.SurveyGen` (reads `Queries.all` + " +
      "`CORRECTNESS_r*.json`).\nKept in sync by `SurveyGenSpec`: the " +
      "name set below must equal the runtime\nregistry " +
      "`SparkEntry.queries` exactly.\n\n"
    sb ++= s"**${reg.size} queries; $withOracle oracle-checked " +
      s"(DuckDB twin), ${reg.size - withOracle} rows-only.** " +
      s"`r$cur*` = added\nthis round, not yet in a driver artifact.\n\n"
    sb ++= "| family | query | since | oracle |\n|---|---|---|---|\n"
    var last = ""
    rows.foreach { case (f, n, o, r) =>
      val fc = if (f == last) "" else f
      last = f
      sb ++= s"| $fc | `$n` | $r | ${if (o) "yes" else "rows-only"} |\n"
    }
    val famCounts = rows.groupBy(_._1).view.mapValues(_.size).toSeq
      .sortBy(-_._2).map { case (f, c) => s"$f $c" }.mkString("; ")
    sb ++= s"\nBy family: $famCounts.\n"
    sb.toString
  }

  def main(args: Array[String]): Unit = {
    val root = Paths.get(if (args.nonEmpty) args(0) else ".")
    val out = root.resolve("SURVEY_QUERIES.md")
    Files.write(out, render(root).getBytes("UTF-8"))
    println(s"wrote $out (${Queries.all.size} queries)")
  }
}
