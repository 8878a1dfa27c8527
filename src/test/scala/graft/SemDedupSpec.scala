package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.ext.SemDedup

/** SemDeDup family: assignment sanity on the fixture corpus plus an
  * engineered-geometry corpus that pins the keep-least-prototypical
  * drop rule, the D4 prune count, and the outlier audit exactly. */
class SemDedupSpec extends SparkSpec {

  private lazy val emb = spark.read.parquet(s"$sf/embeddings.parquet")
  private val dim = 64

  /** 2 orthogonal sample centroids (ids 0, 1) + satellites:
    * id 2 = 0.9·c0 + 0.1·c1 (cluster 0, dup of the centroid),
    * id 3 = 0.6·c1 + 0.3·c0 (cluster 1, cos_c ≈ .894 — no dup partner
    * at τ=0.9), id 4 = mostly off-axis (cluster 1, cos_c ≈ .217 —
    * outlier, and below τ to every cluster-1 member). */
  private def tiny: DataFrame = {
    def v(x0: Float, x1: Float, x2: Float = 0f): Seq[Float] =
      Seq(x0, x1, x2) ++ Seq.fill(dim - 3)(0f)
    import spark.implicits._
    Seq(
      (0L, v(1f, 0f)), (1L, v(0f, 1f)),
      (2L, v(0.9f, 0.1f)), (3L, v(0.3f, 0.6f)), (4L, v(0.02f, 0.2f, 0.9f)))
      .toDF("vec_id", "embedding")
      .withColumn("embedding", col("embedding").cast("array<float>"))
  }

  test("semanticAssign: centroids assign to themselves at cos_c = 1") {
    val out = SemDedup.semDedup(emb, "vec_id", "embedding",
      nClusters = 16, tau = 0.4).collect()
    assert(out.length == emb.count())
    val byId = out.map(r => r.getLong(0) -> r).toMap
    (0L until 16L).foreach { c =>
      assert(byId(c).getLong(1) == c,
        s"centroid $c not assigned to its own cluster")
      assert(math.abs(byId(c).getDouble(2) - 1.0) < 1e-9)
    }
    out.foreach(r => assert(r.getLong(1) >= 0 && r.getLong(1) < 16))
  }

  test("semDedup drops the MORE prototypical end of a duplicate pair") {
    val out = SemDedup.semDedup(tiny, "vec_id", "embedding",
      nClusters = 2, tau = 0.9)
      .collect().map(r => r.getLong(0) -> r).toMap
    // ids 0 and 2 are a cluster-0 pair at cos ≈ 0.994 ≥ 0.9; cos_c(0)=1
    // beats cos_c(2) ≈ 0.994, so the CENTROID is the dropped copy
    assert(!out(0L).getBoolean(3), "prototypical end should be dropped")
    assert(out(2L).getBoolean(3), "atypical end should be kept")
    // no other duplicates: everything else keeps
    Seq(1L, 3L, 4L).foreach(i => assert(out(i).getBoolean(3)))
    // cluster assignment sanity on the planted geometry
    assert(out(2L).getLong(1) == 0L)
    assert(out(3L).getLong(1) == 1L)
    assert(out(4L).getLong(1) == 1L)
  }

  test("hier assignment with every super probed equals the flat path") {
    // nSuper=2 <= sProbe=2: both supers probed, full cell
    // reachability — the two-level ranking must reproduce the flat
    // argmax (and hence identical keep/drop decisions) exactly
    val flat = SemDedup.semDedup(emb, "vec_id", "embedding",
      nClusters = 16, tau = 0.4)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2),
        r.getBoolean(3))).sortBy(_._1).toSeq
    val hier = SemDedup.semDedupHier(emb, "vec_id", "embedding",
      nClusters = 16, nSuper = 2, tau = 0.4, sProbe = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2),
        r.getBoolean(3))).sortBy(_._1).toSeq
    assert(flat == hier, "full-reachability hier diverged from flat")
  }

  test("clusterPrune drops exactly ⌊dropFrac·n⌋ top-ranked per cluster") {
    val out = SemDedup.clusterPrune(emb, "vec_id", "embedding",
      nClusters = 16, dropFrac = 0.25).collect()
    val byCluster = out.groupBy(_.getLong(1))
    byCluster.foreach { case (c, rows) =>
      val n = rows.length
      val dropped = rows.count(!_.getBoolean(4))
      assert(dropped == math.floor(0.25 * n).toInt,
        s"cluster $c: dropped $dropped of $n")
      // dropped = exactly the rank prefix; ranks are 1..n
      val ranks = rows.map(_.getLong(3)).sorted
      assert(ranks.toSeq == (1L to n.toLong))
      rows.foreach(r =>
        assert(r.getBoolean(4) == (r.getLong(3) > math.floor(0.25 * n))))
    }
    // rank 1 is the most prototypical (max cos_c, id tiebreak)
    byCluster.foreach { case (_, rows) =>
      val byRank = rows.sortBy(_.getLong(3)).map(_.getDouble(2))
      byRank.zip(byRank.tail).foreach { case (a, b) => assert(a >= b) }
    }
  }

  test("clusterHealth counts outliers below the cut, one row per cluster") {
    val out = SemDedup.clusterHealth(tiny, "vec_id", "embedding",
      nClusters = 2, minCos = 0.995)
      .collect().map(r => r.getLong(0) -> r).toMap
    assert(out.size == 2)
    // cluster 0: {0 (cos 1), 2 (cos .9939)} → one outlier below .995
    assert(out(0L).getLong(1) == 2 && out(0L).getLong(2) == 1)
    // cluster 1: {1 (cos 1), 3 (cos .894), 4 (cos .217)} → two outliers
    assert(out(1L).getLong(1) == 3 && out(1L).getLong(2) == 2)
    assert(out(1L).getDouble(3) < out(0L).getDouble(3))
  }
}
