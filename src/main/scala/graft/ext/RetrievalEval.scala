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
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cos").desc, col("cand_id").asc)
    Similarity.scoredPairs(emb, emb.filter(col("vec_id") < qMax),
        qCarry = Seq("label"), cCarry = Seq("label"))
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("c_label") === col("q_label"))
      .groupBy(col("query_id"), col("q_label"))
      .agg(min(col("rank")).as("first_rel_rank"))
      .select(col("query_id"), col("q_label").as("label"),
        col("first_rel_rank"),
        expr("1000000 DIV first_rel_rank").as("rr_ppm"))
  }

  /** Inter-label centroid separation, float-free: for every label
    * pair, the squared cosine between centroid vectors in exact ppm
    * (`(dot² · 1e6) DIV (‖a‖²·‖b‖²)`) plus the dot's sign — the
    * embedding-quality audit that complements [[labelMrr]]: MRR reads
    * per-query rank quality, this reads whether the CLASSES are
    * globally separated at all (two labels whose centroids run near
    * parallel are classes the embedding cannot distinguish).
    *
    * cos² avoids any sqrt/double: centroids are 1e6-scale integer
    * means from the grouped moment relation ([[Pca.momentsBy]] — one
    * corpus pass, |labels|·d cells), all pairwise math is decimal
    * integer, and the NULL sentinel covers a zero-norm centroid on
    * BOTH engines. |labels|² output rows — driver-scale by the
    * bounded-label contract. */
  def labelSeparation(emb: DataFrame, dim: Int): DataFrame = {
    val m = Pca.momentsBy(emb, col("label"), col("vec_id"),
      col("embedding"), dim).localCheckpoint()
    val s1 = m.filter(col("j") === 0)
    val n = s1.filter(col("i") === 1)
      .select(col("grp"), col("cnt").as("n"))
    val cent = s1.join(broadcast(n), Seq("grp"))
      .select(col("grp"), col("i"), expr("CAST(s DIV n AS BIGINT)").as("c"))
    val a = cent.select(col("grp").as("la"), col("i"),
      col("c").as("ca"))
    val b = cent.select(col("grp").as("lb"), col("i"),
      col("c").as("cb"))
    a.join(b, Seq("i")).filter(col("la") < col("lb"))
      .groupBy(col("la"), col("lb"))
      .agg(
        sum((col("ca") * col("cb")).cast(DecimalType38)).as("dot"),
        sum((col("ca") * col("ca")).cast(DecimalType38)).as("da"),
        sum((col("cb") * col("cb")).cast(DecimalType38)).as("db"))
      .select(col("la").as("label_a"), col("lb").as("label_b"),
        expr("CASE WHEN dot < 0 THEN -1L WHEN dot > 0 THEN 1L " +
          "ELSE 0L END").as("sgn"),
        expr("CASE WHEN da * db = 0 THEN CAST(NULL AS BIGINT) " +
          "ELSE CAST((dot * dot * 1000000) DIV (da * db) AS BIGINT) " +
          "END").as("cos2_ppm"))
  }

  private val DecimalType38 =
    org.apache.spark.sql.types.DecimalType(38, 0)

  /** DuckDB twin of [[labelSeparation]]. */
  def labelSeparationOracleSql(dim: Int): String =
    s"""
    |WITH xq AS MATERIALIZED (
    |  SELECT label AS grp, vec_id, CAST(i AS BIGINT) AS i,
    |    CAST(round(CAST(embedding[i] AS DOUBLE) * 1000000) AS HUGEINT)
    |      AS q
    |  FROM embeddings, range(1, ${dim + 1}) t(i)),
    |cent AS MATERIALIZED (
    |  SELECT grp, i,
    |    sum(q) // CAST(count(DISTINCT vec_id) AS HUGEINT) AS c
    |  FROM xq GROUP BY grp, i),
    |pairs AS (
    |  SELECT a.grp AS label_a, b.grp AS label_b,
    |    sum(a.c * b.c) AS dot, sum(a.c * a.c) AS da,
    |    sum(b.c * b.c) AS db
    |  FROM cent a JOIN cent b ON a.i = b.i AND a.grp < b.grp
    |  GROUP BY a.grp, b.grp)
    |SELECT label_a, label_b,
    |  CAST(CASE WHEN dot < 0 THEN -1 WHEN dot > 0 THEN 1 ELSE 0 END
    |    AS BIGINT) AS sgn,
    |  CASE WHEN da * db = 0 THEN CAST(NULL AS BIGINT)
    |       ELSE CAST((dot * dot * 1000000) // (da * db) AS BIGINT)
    |  END AS cos2_ppm
    |FROM pairs ORDER BY label_a, label_b
    |""".stripMargin.trim

  /** Sampled pair-cosine histogram — the similarity-DENSITY
    * pre-flight: before picking an LSH band threshold, a SemDeDup
    * epsilon, or a near-dup cutoff, a deployment needs the shape of
    * the cosine distribution between UNRELATED vectors (how much
    * accidental similarity the space carries). This is that shape as
    * a 20-bin census over hash-adjacent sampled pairs.
    *
    * Sampling is scale-clean by construction: vectors sample by a
    * [[graft.functions.Hashing.permBucket]] predicate (rate = the
    * declared 1/sampleMod), land in `parts` hash partitions, and
    * pair with their NEIGHBOR IN HASH ORDER inside each partition —
    * a keyed window, so pairs ≈ sample − parts with zero self-join
    * and no global sort; hash order makes the pairing
    * as-if-random while staying deterministic on both engines.
    * Zero vectors are excluded (no cosine exists; quantizedTopK
    * precedent). The cos double is bit-identical across engines
    * (decimal dot, correctly-rounded sqrt/divide), so bucket edges
    * cannot flip. */
  def cosHistogram(emb: DataFrame, sampleMod: Int,
                   parts: Int = 16, bins: Int = 20): DataFrame = {
    import graft.functions.Hashing
    val s = emb
      .filter(Hashing.permBucket(col("vec_id"), 1, sampleMod) === 0)
      .withColumn("__n2", Similarity.dot(col("embedding"),
        col("embedding")))
      .filter(col("__n2").cast("double") > 0.0)
      .select(col("vec_id"), col("embedding"), col("__n2"),
        Hashing.permBucket(col("vec_id"), 2, parts).as("pk"),
        Hashing.permBucket(col("vec_id"), 3, 1000000).as("h"))
    val w = Window.partitionBy(col("pk"))
      .orderBy(col("h"), col("vec_id"))
    val r = s.withColumn("rn", row_number().over(w))
    val a = r.select(col("pk"), col("rn").as("k"),
      col("embedding").as("ea"), col("__n2").as("na"))
    val b = r.select(col("pk"), (col("rn") - 1).as("k"),
      col("embedding").as("eb"), col("__n2").as("nb"))
    a.join(b, Seq("pk", "k"))
      .withColumn("cos", Similarity.cosine(
        Similarity.dot(col("ea"), col("eb")), col("na"), col("nb")))
      .withColumn("bucket",
        least(greatest(floor((col("cos") + 1) * bins / 2), lit(0L)),
          lit((bins - 1).toLong)).cast("long"))
      .groupBy(col("bucket")).agg(count(lit(1)).as("n_pairs"))
  }

  /** DuckDB twin of [[cosHistogram]]. */
  def cosHistogramOracleSql(dim: Int, sampleMod: Int,
                            parts: Int = 16, bins: Int = 20): String = {
    import graft.functions.Hashing
    val dot = Similarity.dotSql("a.ea", "b.eb", dim)
    s"""
    |WITH s AS MATERIALIZED (
    |  SELECT vec_id, embedding,
    |    CAST(${Similarity.dotSql("embedding", "embedding", dim)}
    |      AS DOUBLE) AS n2,
    |    ${Hashing.permBucketSql("vec_id", 2, parts)} AS pk,
    |    ${Hashing.permBucketSql("vec_id", 3, 1000000)} AS h
    |  FROM embeddings
    |  WHERE ${Hashing.permBucketSql("vec_id", 1, sampleMod)} = 0),
    |r AS MATERIALIZED (
    |  SELECT vec_id, embedding AS ea, embedding AS eb, n2, pk,
    |    row_number() OVER (PARTITION BY pk ORDER BY h, vec_id) AS rn
    |  FROM s WHERE n2 > 0),
    |scored AS (
    |  SELECT CAST($dot AS DOUBLE) / (sqrt(a.n2) * sqrt(b.n2)) AS cos
    |  FROM r a JOIN r b ON b.pk = a.pk AND b.rn = a.rn + 1)
    |SELECT CAST(least(greatest(floor((cos + 1) * $bins / 2), 0),
    |    ${bins - 1}) AS BIGINT) AS bucket,
    |  count(*) AS n_pairs
    |FROM scored GROUP BY 1 ORDER BY 1
    |""".stripMargin.trim
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
