package graft

import org.apache.spark.sql.functions._

import graft.ext.{Dedup, Similarity}

/** Round-7 additions: reciprocal-rank fusion over the two integer
  * scan legs, and fixed-point PageRank over the near-dup pair graph. */
class RrfPageRankSpec extends SparkSpec {

  private lazy val emb = spark.read.parquet(s"$sf/embeddings.parquet")

  test("rrfFuseTopK: k rows per query, score non-increasing, " +
    "every candidate from a leg, score arithmetic self-consistent") {
    val queries = emb.filter(col("vec_id") < 5)
    val out = Similarity.rrfFuseTopK(emb, queries, 5, 64).collect()
    assert(out.length == 25)
    out.groupBy(_.getAs[Long]("query_id")).foreach { case (_, rows) =>
      val ranked = rows.sortBy(_.getAs[Long]("rank"))
      assert(ranked.map(_.getAs[Long]("rank")).toSeq == (1L to 5L))
      val scores = ranked.map(_.getAs[Long]("rrf_fp"))
      assert(scores.zip(scores.tail).forall { case (a, b) => a >= b })
    }
    out.foreach { r =>
      val i = r.getAs[Long]("int8_rank")
      val s = r.getAs[Long]("sign_rank")
      assert(i > 0 || s > 0, "fused candidate came from neither leg")
      val expect = (if (i > 0) 1000000000L / (i + 60) else 0L) +
        (if (s > 0) 1000000000L / (s + 60) else 0L)
      assert(r.getAs[Long]("rrf_fp") == expect,
        s"rrf_fp drifted from its own ranks: $r")
    }
  }

  test("rrfRecall: fused recall is no worse than the weaker leg " +
    "and positive on the fixture") {
    val queries = emb.filter(col("vec_id") < 5)
    def mean(df: org.apache.spark.sql.DataFrame): Double = {
      val rows = df.select(avg(col("recall_at_k"))).collect()
      rows.head.getDouble(0)
    }
    val fused = mean(Similarity.rrfRecall(emb, queries, 5, 64))
    val sign = mean(Similarity.binaryRecall(emb, queries, 5, 64,
      shortlist = 20))
    // int8 leg recall vs exact, via the same join shape
    val exact = Similarity.cosineTopK(emb, queries, 5)
      .select(col("query_id"), col("cand_id"))
    val int8 = Similarity.quantizedTopK(emb, queries, 5)
      .select(col("query_id"), col("cand_id"), lit(1L).as("__hit"))
    val int8Recall = exact.join(int8, Seq("query_id", "cand_id"), "left")
      .groupBy(col("query_id"))
      .agg((sum(coalesce(col("__hit"), lit(0L))) / 5.0).as("recall_at_k"))
    val int8R = mean(int8Recall)
    assert(fused > 0.0)
    assert(fused >= math.min(sign, int8R) - 1e-9,
      s"fused $fused below both legs (sign $sign, int8 $int8R)")
  }

  test("pairPageRank: hand-computed star graph, one iteration") {
    import spark.implicits._
    // star: 1 is the center of {2,3,4}
    val pairs = Seq((1L, 2L), (1L, 3L), (1L, 4L)).toDF("d1", "d2")
    val out = Dedup.pairPageRank(pairs, iters = 1).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Long]("deg"), r.getAs[Long]("pr_fp"))).toMap
    // n=4, p0 = 250000000000 each, base = (15*250000000000) div 100
    assert(out(1L) == ((3L, 37500000000L + 85L * 750000000000L / 100L)))
    val leaf = 37500000000L + 85L * (250000000000L / 3L) / 100L
    assert(out(2L) == ((1L, leaf)))
    assert(out(3L) == ((1L, leaf)))
    assert(out(4L) == ((1L, leaf)))
  }

  test("pairPageRank: center of the star dominates after 3 iterations; " +
    "symmetric pairs tie exactly") {
    import spark.implicits._
    val pairs = Seq((1L, 2L), (1L, 3L), (1L, 4L), (10L, 11L))
      .toDF("d1", "d2")
    val out = Dedup.pairPageRank(pairs, iters = 3).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("pr_fp")).toMap
    assert(out(1L) > out(2L) && out(1L) > out(3L) && out(1L) > out(4L))
    assert(out(2L) == out(3L) && out(3L) == out(4L))
    // the isolated symmetric pair: identical rank by symmetry
    assert(out(10L) == out(11L))
    // total fixed-point mass is conserved up to floor loss (< 1 unit
    // per integer division performed)
    val total = out.values.sum
    assert(total <= 1000000000000L && total > 999999990000L)
  }
}
