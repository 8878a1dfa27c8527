package graft

import org.apache.spark.sql.functions._

import graft.ext.Similarity

class SimilaritySpec extends SparkSpec {

  private lazy val emb = spark.read.parquet(s"$sf/embeddings.parquet")

  test("self-cosine is 1.0 (decimal dot product is exact)") {
    val selfCos = emb.limit(20).select(
      Similarity.cosine(
        Similarity.dot(col("embedding"), col("embedding")),
        Similarity.dot(col("embedding"), col("embedding")),
        Similarity.dot(col("embedding"), col("embedding"))).as("cos"))
      .collect().map(_.getDouble(0))
    selfCos.foreach(c => assert(math.abs(c - 1.0) < 1e-12))
  }

  test("brute-force topK returns k ranked neighbors per query") {
    val out = Similarity.cosineTopK(emb, emb.filter(col("vec_id") < 5), 3)
      .collect()
    assert(out.length == 15)
    val byQuery = out.groupBy(_.getLong(0))
    byQuery.foreach { case (_, rows) =>
      val ranked = rows.sortBy(_.getAs[Long]("rank"))
      assert(ranked.map(_.getAs[Long]("rank")).toSeq == Seq(1L, 2L, 3L))
      // cosine non-increasing with rank
      val cos = ranked.map(_.getAs[Double]("cos"))
      assert(cos.zip(cos.tail).forall { case (a, b) => a >= b })
    }
  }

  test("SRP-LSH topK is a subset-quality approximation of brute force") {
    val queries = emb.filter(col("vec_id") < 5)
    val approx = Similarity.lshCosineTopK(emb, queries, 3, 64, 6)
    // every returned neighbor must share the query's bucket -> recall
    // may be < 1, but all results must be genuine corpus vectors with
    // valid rank ordering
    val rows = approx.collect()
    assert(rows.forall(_.getAs[Long]("rank") <= 3))
    assert(rows.forall(r => r.getLong(0) != r.getLong(1)))
  }
}
