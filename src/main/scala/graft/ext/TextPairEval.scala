package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Pairwise text-overlap evals — ROUGE-n (Lin, ACL 2004 "ROUGE: A
  * Package for Automatic Evaluation of Summaries") and a BLEU-style
  * clipped-precision score (Papineni et al., ACL 2002) — the
  * generation-eval leg the retrieval-eval shelf
  * ([[RetrievalEval]]) doesn't cover: those score EMBEDDINGS against
  * labels; these score TEXT against reference text, the metric a
  * training pipeline runs over (candidate, reference) pairs after
  * every fine-tune.
  *
  * All metrics are exact integer fixed point (ppm), zero floats and
  * zero transcendentals, matching the repo-wide determinism contract:
  *  - ROUGE-n: clip = Σ_g min(count_cand(g), count_ref(g)) over word
  *    n-grams as MULTISETS (the paper's clipped match — "the the the"
  *    vs one "the" matches once, where a set intersection would both
  *    over- and under-count). P = clip/|cand grams|,
  *    R = clip/|ref grams|, F1 = 2·clip/(|cand|+|ref|) — the last
  *    identity holds exactly because P and R share the numerator, so
  *    F1 needs no float harmonic mean.
  *  - BLEU proxy: clipped p1, p2 as ppm, a LINEAR brevity factor
  *    bp = min(1, cand_len/ref_len) instead of the paper's
  *    exp(1 − r/c) (transcendental-free; same direction, same
  *    saturation at cand ≥ ref), and
  *    `bleu2_ppm = (bp·p1·p2) / 1e12` — the PRODUCT of the three
  *    terms. The paper's BLEU-2 is bp·sqrt(p1·p2); sqrt is monotone,
  *    so ranking candidates by the product is RANK-EQUIVALENT to
  *    ranking by linear-BP BLEU-2 — the ordering a data pipeline
  *    consumes (filter/sort by score) is preserved while every
  *    arithmetic step stays exact int64/decimal.
  *
  * Pair source: production runs hand this a (cand_id, ref_id, texts)
  * table from the eval harness. The fixture twin pairs CONSECUTIVE
  * documents within each source (row r with row r+1, odd r, ordered
  * by doc_id) — deterministic, engine-agnostic, and it exercises the
  * interesting range: same-source docs share vocabulary, so clipped
  * counts are non-trivial without being self-comparisons.
  *
  * Scale shape: one projection computes per-doc gram counts (keyed
  * explode + agg, map-side combinable), the pair map is built once,
  * and the clip join is keyed by (pair, gram) — corpus-linear state,
  * no per-pair recomputation of either side's grams, never all-pairs
  * (the pair list IS the input). The within-source row_number window
  * exists only in the fixture pairing, not the metric; a 100 TB eval
  * run brings its own pair table.
  */
object TextPairEval {

  /** Fixture pair map: (cand_id, ref_id) — consecutive same-source
    * docs, each doc in at most one pair. */
  def selfPairs(docs: DataFrame, id: Column, source: Column): DataFrame = {
    val w = Window.partitionBy(col("__src")).orderBy(col("__id"))
    val ranked = docs.select(id.as("__id"), source.as("__src"))
      .withColumn("__r", row_number().over(w))
    val cand = ranked.filter(col("__r") % 2 === 1)
      .select(col("__src"), col("__id").as("cand_id"), col("__r").as("__rc"))
    val ref = ranked.filter(col("__r") % 2 === 0)
      .select(col("__src").as("__s2"), col("__id").as("ref_id"),
        (col("__r") - 1).as("__rr"))
    cand.join(ref, col("__src") === col("__s2") && col("__rc") === col("__rr"))
      .select(col("cand_id"), col("ref_id"))
  }

  /** Per-doc multiset n-gram counts: (doc_id, gram, c). */
  private def gramCounts(docs: DataFrame, id: Column, text: Column,
                         n: Int): DataFrame =
    docs.select(id.as("doc_id"), Dedup.words(text).as("__w"))
      .select(col("doc_id"),
        explode(Dedup.wordGramsFrom(col("__w"), n)).as("gram"))
      .groupBy(col("doc_id"), col("gram")).agg(count(lit(1)).as("c"))

  /** Per-doc total n-gram count (exact, including zero-gram docs). */
  private def gramTotals(docs: DataFrame, id: Column, text: Column,
                         n: Int): DataFrame =
    docs.select(id.as("doc_id"),
      greatest(size(Dedup.words(text)) - lit(n - 1), lit(0))
        .cast("long").as("n_grams"))

  /** Clipped match per pair: (cand_id, ref_id, clip). Inner join on
    * gram, so zero-overlap pairs are absent — callers left-join and
    * coalesce to 0. */
  private def clippedMatches(pairs: DataFrame, counts: DataFrame): DataFrame = {
    val cand = Dedup.spread(
      pairs.join(counts.withColumnRenamed("doc_id", "cand_id"), "cand_id")
        .select(col("cand_id"), col("ref_id"), col("gram"),
          col("c").as("c_cand")),
      col("ref_id"), col("gram"))
    val ref = counts.select(col("doc_id").as("__rid"),
      col("gram").as("__g2"), col("c").as("c_ref"))
    cand.join(ref, col("ref_id") === col("__rid") && col("gram") === col("__g2"))
      .groupBy(col("cand_id"), col("ref_id"))
      .agg(sum(least(col("c_cand"), col("c_ref"))).as("clip"))
  }

  /** ROUGE-n over (cand_id, ref_id) pairs: clipped P/R/F1 in ppm. */
  def rougeN(docs: DataFrame, id: Column, source: Column, text: Column,
             n: Int): DataFrame = {
    val pairs = selfPairs(docs, id, source)
    val counts = gramCounts(docs, id, text, n)
    val totals = gramTotals(docs, id, text, n)
    pairs
      .join(clippedMatches(pairs, counts), Seq("cand_id", "ref_id"), "left")
      .join(totals.select(col("doc_id").as("cand_id"),
        col("n_grams").as("n_cand")), "cand_id")
      .join(totals.select(col("doc_id").as("ref_id"),
        col("n_grams").as("n_ref")), "ref_id")
      .select(col("cand_id"), col("ref_id"),
        coalesce(col("clip"), lit(0L)).as("clip"),
        col("n_cand"), col("n_ref"))
      .select(col("cand_id"), col("ref_id"), col("clip"), col("n_cand"),
        col("n_ref"),
        when(col("n_cand") > 0, expr("(clip * 1000000) div n_cand"))
          .otherwise(lit(0L)).as("p_ppm"),
        when(col("n_ref") > 0, expr("(clip * 1000000) div n_ref"))
          .otherwise(lit(0L)).as("r_ppm"),
        when(col("n_cand") + col("n_ref") > 0,
          expr("(2 * clip * 1000000) div (n_cand + n_ref)"))
          .otherwise(lit(0L)).as("f_ppm"))
  }

  /** DuckDB twin of [[rougeN]] over `documents`. */
  def rougeNOracleSql(n: Int): String =
    s"""
    |WITH ${pairCtes(n)}
    |SELECT p.cand_id, p.ref_id,
    |  CAST(coalesce(cl.clip, 0) AS BIGINT) AS clip,
    |  tc.n_grams AS n_cand, tr.n_grams AS n_ref,
    |  CAST(CASE WHEN tc.n_grams > 0
    |       THEN (coalesce(cl.clip, 0) * 1000000) // tc.n_grams
    |       ELSE 0 END AS BIGINT) AS p_ppm,
    |  CAST(CASE WHEN tr.n_grams > 0
    |       THEN (coalesce(cl.clip, 0) * 1000000) // tr.n_grams
    |       ELSE 0 END AS BIGINT) AS r_ppm,
    |  CAST(CASE WHEN tc.n_grams + tr.n_grams > 0
    |       THEN (2 * coalesce(cl.clip, 0) * 1000000) // (tc.n_grams + tr.n_grams)
    |       ELSE 0 END AS BIGINT) AS f_ppm
    |FROM pairs p
    |LEFT JOIN clip cl ON cl.cand_id = p.cand_id AND cl.ref_id = p.ref_id
    |JOIN totals tc ON tc.doc_id = p.cand_id
    |JOIN totals tr ON tr.doc_id = p.ref_id
    |ORDER BY p.cand_id
    |""".stripMargin.trim

  /** Shared oracle CTEs: fixture pairs, multiset gram counts for
    * order `n`, totals, clipped matches. */
  private def pairCtes(n: Int): String =
    s"""ranked AS (
    |  SELECT doc_id, source,
    |         row_number() OVER (PARTITION BY source ORDER BY doc_id) AS r
    |  FROM documents),
    |pairs AS (
    |  SELECT a.doc_id AS cand_id, b.doc_id AS ref_id
    |  FROM ranked a JOIN ranked b
    |    ON a.source = b.source AND a.r % 2 = 1 AND b.r = a.r + 1),
    |w AS (SELECT doc_id, str_split(text, ' ') AS w FROM documents),
    |gc AS (
    |  SELECT doc_id, gram, count(*) AS c
    |  FROM (SELECT doc_id,
    |          unnest(list_transform(range(greatest(len(w) - ${n - 1}, 0)),
    |            i -> ${(1 to n).map(x => s"w[i + $x]").mkString(" || ' ' || ")})) AS gram
    |        FROM w)
    |  GROUP BY doc_id, gram),
    |totals AS (
    |  SELECT doc_id, greatest(len(w) - ${n - 1}, 0) AS n_grams FROM w),
    |clip AS (
    |  SELECT p.cand_id, p.ref_id, sum(least(a.c, b.c)) AS clip
    |  FROM pairs p
    |  JOIN gc a ON a.doc_id = p.cand_id
    |  JOIN gc b ON b.doc_id = p.ref_id AND b.gram = a.gram
    |  GROUP BY 1, 2)""".stripMargin

  /** BLEU proxy over the fixture pairs: clipped p1/p2 ppm, linear
    * brevity bp_ppm, and the rank-equivalent product score. */
  def bleuProxy(docs: DataFrame, id: Column, source: Column,
                text: Column): DataFrame = {
    val pairs = selfPairs(docs, id, source)
    def leg(n: Int, out: String): DataFrame = {
      val counts = gramCounts(docs, id, text, n)
      val totals = gramTotals(docs, id, text, n)
      pairs
        .join(clippedMatches(pairs, counts), Seq("cand_id", "ref_id"), "left")
        .join(totals.select(col("doc_id").as("cand_id"),
          col("n_grams").as("__nc")), "cand_id")
        .select(col("cand_id"), col("ref_id"),
          when(col("__nc") > 0,
            expr("(coalesce(clip, 0) * 1000000) div __nc"))
            .otherwise(lit(0L)).as(out))
    }
    val lens = docs.select(id.as("doc_id"),
      size(Dedup.words(text)).cast("long").as("len"))
    pairs
      .join(leg(1, "p1_ppm"), Seq("cand_id", "ref_id"))
      .join(leg(2, "p2_ppm"), Seq("cand_id", "ref_id"))
      .join(lens.select(col("doc_id").as("cand_id"),
        col("len").as("cand_len")), "cand_id")
      .join(lens.select(col("doc_id").as("ref_id"),
        col("len").as("ref_len")), "ref_id")
      .select(col("cand_id"), col("ref_id"), col("cand_len"), col("ref_len"),
        col("p1_ppm"), col("p2_ppm"),
        when(col("ref_len") > 0,
          least(lit(1000000L), expr("(cand_len * 1000000) div ref_len")))
          .otherwise(lit(0L)).as("bp_ppm"))
      .select(col("cand_id"), col("ref_id"), col("cand_len"), col("ref_len"),
        col("p1_ppm"), col("p2_ppm"), col("bp_ppm"),
        expr("""(cast(bp_ppm as decimal(38,0)) * p1_ppm * p2_ppm)
                div 1000000000000""").cast("long").as("bleu2_ppm"))
  }

  /** DuckDB twin of [[bleuProxy]]. */
  def bleuProxyOracleSql: String = {
    def legSql(n: Int, gc: String, tot: String, cl: String, out: String) =
      s"""g$n AS (
      |  SELECT doc_id, gram, count(*) AS c
      |  FROM (SELECT doc_id,
      |          unnest(list_transform(range(greatest(len(w) - ${n - 1}, 0)),
      |            i -> ${(1 to n).map(x => s"w[i + $x]").mkString(" || ' ' || ")})) AS gram
      |        FROM w)
      |  GROUP BY doc_id, gram),
      |$tot AS (SELECT doc_id, greatest(len(w) - ${n - 1}, 0) AS n_grams FROM w),
      |$cl AS (
      |  SELECT p.cand_id, p.ref_id, sum(least(a.c, b.c)) AS clip
      |  FROM pairs p
      |  JOIN g$n a ON a.doc_id = p.cand_id
      |  JOIN g$n b ON b.doc_id = p.ref_id AND b.gram = a.gram
      |  GROUP BY 1, 2),
      |$out AS (
      |  SELECT p.cand_id, p.ref_id,
      |    CAST(CASE WHEN t.n_grams > 0
      |         THEN (coalesce(c.clip, 0) * 1000000) // t.n_grams
      |         ELSE 0 END AS BIGINT) AS p_ppm
      |  FROM pairs p
      |  LEFT JOIN $cl c ON c.cand_id = p.cand_id AND c.ref_id = p.ref_id
      |  JOIN $tot t ON t.doc_id = p.cand_id)""".stripMargin
    s"""
    |WITH ranked AS (
    |  SELECT doc_id, source,
    |         row_number() OVER (PARTITION BY source ORDER BY doc_id) AS r
    |  FROM documents),
    |pairs AS (
    |  SELECT a.doc_id AS cand_id, b.doc_id AS ref_id
    |  FROM ranked a JOIN ranked b
    |    ON a.source = b.source AND a.r % 2 = 1 AND b.r = a.r + 1),
    |w AS (SELECT doc_id, str_split(text, ' ') AS w FROM documents),
    |lens AS (SELECT doc_id, len(w) AS len FROM w),
    |${legSql(1, "g1", "t1", "c1", "leg1")},
    |${legSql(2, "g2", "t2", "c2", "leg2")}
    |SELECT p.cand_id, p.ref_id,
    |  lc.len AS cand_len, lr.len AS ref_len,
    |  l1.p_ppm AS p1_ppm, l2.p_ppm AS p2_ppm,
    |  CASE WHEN lr.len > 0
    |       THEN least(1000000, (lc.len * 1000000) // lr.len)
    |       ELSE 0 END AS bp_ppm,
    |  CAST((CAST(CASE WHEN lr.len > 0
    |             THEN least(1000000, (lc.len * 1000000) // lr.len)
    |             ELSE 0 END AS HUGEINT)
    |        * l1.p_ppm * l2.p_ppm) // 1000000000000 AS BIGINT) AS bleu2_ppm
    |FROM pairs p
    |JOIN leg1 l1 ON l1.cand_id = p.cand_id AND l1.ref_id = p.ref_id
    |JOIN leg2 l2 ON l2.cand_id = p.cand_id AND l2.ref_id = p.ref_id
    |JOIN lens lc ON lc.doc_id = p.cand_id
    |JOIN lens lr ON lr.doc_id = p.ref_id
    |ORDER BY p.cand_id
    |""".stripMargin.trim
  }
}
