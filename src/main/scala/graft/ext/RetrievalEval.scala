package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Label-based retrieval evaluation over the embedding table — the
  * EMBEDDING-quality eval, distinct from the index-quality audits
  * (`ann_recall` and friends compare an ANN index against brute
  * force; this compares brute force against ground truth).
  *
  * With labels as relevance (same label = relevant), the standard
  * eval is: rank the corpus by exact cosine for each query, find the
  * first relevant hit, report reciprocal rank. A retrieval-training
  * pipeline runs exactly this after each embedding refresh — a
  * falling MRR means the new embedding is worse at putting relatives
  * first, whatever the ANN index does downstream.
  *
  * Exactness: the cosine is the decimal-dot/correctly-rounded-sqrt
  * double of [[Similarity.cosineTopK]] (bit-identical across
  * engines), ranks tie-break by candidate id, and the reciprocal
  * rank is integer ppm (`1e6 DIV rank`) — no float averaging
  * anywhere.
  *
  * Scale shape: the query side is BOUNDED and broadcast; the corpus
  * streams through ONE scored scan (spread like every brute-force
  * family member), one window ranks per query, and the relevant-hit
  * reduction is a keyed min — |Q| output rows. Queries whose label
  * has no other member emit no row (no relevant document exists;
  * oracle mirrors). */
object RetrievalEval {

  /** Per-query first-relevant rank + reciprocal rank (ppm):
    * `(query_id, label, first_rel_rank, rr_ppm)` for queries
    * `vec_id < qMax`. */
  def labelMrr(emb: DataFrame, qMax: Long): DataFrame = {
    val q = emb.filter(col("vec_id") < qMax)
      .select(col("vec_id").as("query_id"), col("label").as("q_label"),
        col("embedding").as("q_emb"))
      .withColumn("q_n2", Similarity.dot(col("q_emb"), col("q_emb")))
    val c = Dedup.spread(emb.select(col("vec_id").as("cand_id"),
      col("label").as("c_label"), col("embedding").as("c_emb")),
      col("cand_id"))
      .withColumn("c_n2", Similarity.dot(col("c_emb"), col("c_emb")))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cos").desc, col("cand_id").asc)
    c.crossJoin(broadcast(q))
      .filter(col("query_id") =!= col("cand_id"))
      .withColumn("cos", Similarity.cosine(
        Similarity.dot(col("q_emb"), col("c_emb")),
        col("q_n2"), col("c_n2")))
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("c_label") === col("q_label"))
      .groupBy(col("query_id"), col("q_label"))
      .agg(min(col("rank")).as("first_rel_rank"))
      .select(col("query_id"), col("q_label").as("label"),
        col("first_rel_rank"),
        expr("1000000 DIV first_rel_rank").as("rr_ppm"))
  }

  /** DuckDB twin of [[labelMrr]]. */
  def labelMrrOracleSql(dim: Int, qMax: Long): String =
    s"""
    |WITH q AS (
    |  SELECT vec_id AS query_id, label AS q_label, embedding AS q_emb
    |  FROM embeddings WHERE vec_id < $qMax),
    |c AS (
    |  SELECT vec_id AS cand_id, label AS c_label, embedding AS c_emb
    |  FROM embeddings),
    |scored AS (
    |  SELECT query_id, q_label, cand_id, c_label,
    |    CAST(${Similarity.dotSql("q_emb", "c_emb", dim)} AS DOUBLE) /
    |      (sqrt(CAST(${Similarity.dotSql("q_emb", "q_emb", dim)} AS DOUBLE)) *
    |       sqrt(CAST(${Similarity.dotSql("c_emb", "c_emb", dim)} AS DOUBLE)))
    |      AS cos
    |  FROM c, q WHERE query_id <> cand_id),
    |ranked AS (
    |  SELECT query_id, q_label, c_label,
    |    row_number() OVER (PARTITION BY query_id
    |                       ORDER BY cos DESC, cand_id) AS rank
    |  FROM scored)
    |SELECT query_id, q_label AS label,
    |  min(rank) AS first_rel_rank,
    |  1000000 // min(rank) AS rr_ppm
    |FROM ranked WHERE c_label = q_label
    |GROUP BY query_id, q_label
    |ORDER BY query_id
    |""".stripMargin.trim
}
