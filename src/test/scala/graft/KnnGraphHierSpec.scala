package graft

import org.apache.spark.sql.functions._

import graft.ext.Similarity

/** Two-level kNN graph: with sProbe = nSuper every super is probed,
  * so the child shortlist covers ALL cells and the hier assignment
  * must reproduce the flat assignment exactly — the edge set, cos
  * values, ranks, and mutuality flags all match the flat graph at
  * the same (nCells, nProbe). The declared query then dials sProbe
  * below nSuper for the actual assignment saving. */
class KnnGraphHierSpec extends SparkSpec {

  private lazy val emb = spark.read.parquet(s"$sf/embeddings.parquet")
  private val dim = 64

  test("hier graph at sProbe = nSuper == flat graph, row for row") {
    val flat = Similarity.knnGraph(emb, "vec_id", "embedding", dim,
        k = 5, nCells = 8, nProbe = 2)
      .orderBy("vec_id", "rank").collect().toSeq
    val hier = Similarity.knnGraphHier(emb, "vec_id", "embedding", dim,
        k = 5, nCells = 8, nSuper = 4, nProbe = 2, sProbe = 4)
      .orderBy("vec_id", "rank").collect().toSeq
    assert(flat.nonEmpty)
    assert(hier == flat,
      "hier assignment with full super coverage drifted from flat")
  }

  test("restricted sProbe yields a graph with every source covered") {
    val g = Similarity.knnGraphHier(emb, "vec_id", "embedding", dim,
      k = 3, nCells = 8, nSuper = 4, nProbe = 2, sProbe = 2)
    val n = emb.count()
    // every vector keeps at least one neighbor (cells are non-trivial
    // on the fixture) and mutual is 0/1
    val srcs = g.select(countDistinct(col("vec_id"))).collect()(0).getLong(0)
    assert(srcs == n, s"sources covered $srcs of $n")
    assert(g.filter(!col("mutual").isin(0L, 1L)).count() == 0)
  }
}
