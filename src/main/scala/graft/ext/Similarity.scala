package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Approximate-nearest-neighbor search over an embedding column
  * (`array<float>`) — extension surface, SURVEY §7.6.
  *
  * Numeric determinism: dot products and norms are accumulated as
  * DECIMAL(38,12) (each double product cast before summing), because
  * decimal addition is exact and order-independent — a float sum would
  * hash-differ between Spark's fold order and the oracle's. The final
  * cosine is then a fixed sequence of IEEE double ops on identical
  * inputs, hence bit-identical across engines.
  */
object Similarity {

  // DECIMAL(25,12): far below Spark's precision cap of 38, so the
  // fold's `(acc + v).cast(Acc)` is width-narrowing only (the scale
  // never changes -> no rounding, exact and order-independent).
  private val Acc = DecimalType(25, 12)

  /** Exact decimal dot product of two float-array columns. */
  def dot(a: Column, b: Column): Column =
    aggregate(
      zip_with(a, b, (x, y) => (x.cast("double") * y.cast("double")).cast(Acc)),
      lit(0L).cast(Acc), (acc, v) => (acc + v).cast(Acc))

  /** DuckDB twin of [[dot]] for `dim`-length vectors. */
  def dotSql(a: String, b: String, dim: Int): String =
    s"list_reduce(list_prepend(CAST(0 AS DECIMAL(25,12)), " +
      s"list_transform(range(1, ${dim + 1}), " +
      s"i -> CAST(CAST($a[i] AS DOUBLE) * CAST($b[i] AS DOUBLE) AS DECIMAL(25,12)))), " +
      s"(acc, v) -> CAST(acc + v AS DECIMAL(25,12)))"

  /** cosine(a,b) as a double from decimal dot/norms. */
  def cosine(dotAb: Column, norm2A: Column, norm2B: Column): Column =
    dotAb.cast("double") /
      (sqrt(norm2A.cast("double")) * sqrt(norm2B.cast("double")))

  /** Brute-force cosine top-k: every query vector against the full
    * corpus. The baseline ANN path — O(|Q|·|C|) but embarrassingly
    * parallel: queries broadcast (bounded query set), corpus streams,
    * top-k via window over (query, cosine desc). At 100 TB use
    * [[lshCosineTopK]] to bound the candidate set instead. */
  def cosineTopK(corpus: DataFrame, queries: DataFrame, k: Int): DataFrame = {
    val q = queries.select(col("vec_id").as("query_id"),
      col("embedding").as("q_emb"))
    val c = corpus.select(col("vec_id").as("cand_id"),
      col("embedding").as("c_emb"))
    val scored = c.crossJoin(broadcast(q))
      .filter(col("query_id") =!= col("cand_id"))
      .withColumn("cos", cosine(
        dot(col("q_emb"), col("c_emb")),
        dot(col("q_emb"), col("q_emb")),
        dot(col("c_emb"), col("c_emb"))))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cos").desc, col("cand_id").asc)
    scored.withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("cand_id"), col("cos"), col("rank"))
  }

  /** DuckDB oracle for [[cosineTopK]] with queries = vec_id < maxQueryId. */
  def cosineTopKOracleSql(dim: Int, k: Int, maxQueryId: Long): String =
    s"""
    |WITH q AS (SELECT vec_id AS query_id, embedding AS q_emb FROM embeddings
    |           WHERE vec_id < $maxQueryId),
    |c AS (SELECT vec_id AS cand_id, embedding AS c_emb FROM embeddings),
    |scored AS (
    |  SELECT query_id, cand_id,
    |    CAST(${dotSql("q_emb", "c_emb", dim)} AS DOUBLE) /
    |      (sqrt(CAST(${dotSql("q_emb", "q_emb", dim)} AS DOUBLE)) *
    |       sqrt(CAST(${dotSql("c_emb", "c_emb", dim)} AS DOUBLE))) AS cos
    |  FROM c, q WHERE query_id <> cand_id),
    |ranked AS (
    |  SELECT query_id, cand_id, cos,
    |    row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, cand_id) AS rank
    |  FROM scored)
    |SELECT query_id, cand_id, cos, rank FROM ranked WHERE rank <= $k
    |ORDER BY query_id, rank
    |""".stripMargin.trim

  /** Scale path: sign-random-projection LSH buckets (Charikar 2002).
    * `nPlanes` pseudo-random hyperplanes with deterministic ±1 weights
    * (parity of a per-(plane,dim) integer hash); bucket = packed sign
    * bits. Search joins query and corpus on the bucket, then scores
    * exactly within the bucket — candidate set bounded by bucket
    * occupancy instead of corpus size. */
  def srpBucket(emb: Column, dim: Int, nPlanes: Int): Column = {
    val signs = (0 until nPlanes).map { p =>
      // deterministic ±1 weight per (plane, dimension)
      val proj = aggregate(
        zip_with(emb, typedLit((0 until dim).map(d => weight(p, d))),
          (x, wgt) => x.cast("double") * wgt),
        lit(0.0), (acc, v) => acc + v)
      when(proj >= 0, lit(1L << p)).otherwise(lit(0L))
    }
    signs.reduce(_ + _)
  }

  private def weight(plane: Int, d: Int): Double = {
    val h = (plane.toLong * 1315423911L + d.toLong * 2654435761L) % 2038074743L
    if ((h & 1L) == 1L) 1.0 else -1.0
  }

  /** ANN top-k within SRP buckets; recall < 1 by construction (probe
    * multiple buckets / fewer planes for higher recall). */
  def lshCosineTopK(corpus: DataFrame, queries: DataFrame, k: Int,
                    dim: Int, nPlanes: Int = 8): DataFrame = {
    val q = queries.select(col("vec_id").as("query_id"),
      col("embedding").as("q_emb"),
      srpBucket(col("embedding"), dim, nPlanes).as("bucket"))
    val c = corpus.select(col("vec_id").as("cand_id"),
      col("embedding").as("c_emb"),
      srpBucket(col("embedding"), dim, nPlanes).as("__bucket2"))
    val scored = c.join(broadcast(q), col("bucket") === col("__bucket2") &&
        col("query_id") =!= col("cand_id"))
      .withColumn("cos", cosine(
        dot(col("q_emb"), col("c_emb")),
        dot(col("q_emb"), col("q_emb")),
        dot(col("c_emb"), col("c_emb"))))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cos").desc, col("cand_id").asc)
    scored.withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("cand_id"), col("cos"), col("rank"))
  }
}
