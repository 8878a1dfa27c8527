package graft

import graft.ext.Pca
import org.apache.spark.sql.functions._

/** PCA family: an exact driver-side BigInt twin of the fixed-point
  * arithmetic, convergence on a known-anisotropic fixture, the
  * zero-variance guard, and the scale invariants the scaladoc
  * promises. */
class PcaSpec extends SparkSpec {
  import spark.implicits._

  /** Driver-side twin: quantize, moments, covariance — same
    * truncating integer arithmetic, BigInt so overflow is impossible
    * by construction. */
  private def bruteCov(vecs: Seq[Array[Float]], dim: Int)
      : Map[(Long, Long), Long] = {
    val q = vecs.map(_.map(x => math.round(x.toDouble * Pca.QScale)))
    val n = BigInt(q.size)
    (for { i <- 0 until dim; j <- i until dim } yield {
      val s2 = q.map(v => BigInt(v(i)) * BigInt(v(j))).sum
      val s1i = q.map(v => BigInt(v(i))).sum
      val s1j = q.map(v => BigInt(v(j))).sum
      ((i + 1).toLong, (j + 1).toLong) -> (n * s2 - s1i * s1j) / (n * n)
    }).map { case (k, v) => k -> v.toLong }.toMap
  }

  private def embDf(vecs: Seq[Array[Float]]) =
    vecs.zipWithIndex.map { case (v, i) => (i.toLong, v) }
      .toDF("vec_id", "embedding")

  /** Anisotropic fixture: dominant variance along dim 2 (0-based
    * index 1), a little noise elsewhere — the top component is known
    * up to sign. */
  private def aniso: Seq[Array[Float]] = (0 until 40).map { k =>
    val main = (if (k % 2 == 0) 1.0f else -1.0f) * (0.3f + 0.01f * (k % 7))
    Array(0.01f * (k % 3 - 1), main, 0.02f * (k % 5 - 2), 0.005f * (k % 2))
  }

  test("covariance equals the BigInt driver twin (testdata slice)") {
    val emb = spark.read.parquet(s"$sf/embeddings.parquet")
    val vecs = emb.orderBy("vec_id")
      .select("embedding").as[Array[Float]].collect().toSeq
    val want = bruteCov(vecs, 64)
    val got = Pca.covariance(emb, col("vec_id"), col("embedding"), 64)
      .as[(Long, Long, Long)].collect()
      .map { case (i, j, c) => (i, j) -> c }.toMap
    assert(got.size == 64 * 65 / 2)
    assert(got == want)
  }

  test("power iteration finds the dominant axis on the aniso fixture") {
    val cov = Pca.covariance(embDf(aniso), col("vec_id"),
      col("embedding"), 4)
    val v = Pca.powerIteration(cov, dim = 4, iters = 8)
      .as[(Long, Long)].collect().toMap
    // max-abs normalization puts the dominant component at ±1e6
    assert(math.abs(v(2L)) == Pca.VScale, s"dominant component: $v")
    // every other axis carries <5% of the direction
    Seq(1L, 3L, 4L).foreach { i =>
      assert(math.abs(v(i)) < Pca.VScale / 20, s"axis $i too large: $v")
    }
  }

  test("explained_ppm: dominant-axis fixture concentrates >90% variance") {
    val cov = Pca.covariance(embDf(aniso), col("vec_id"),
      col("embedding"), 4)
    val e = Pca.explained(cov, Pca.powerIteration(cov, 4, 8))
      .select("lambda_fp", "trace_fp", "explained_ppm")
      .as[(Long, Long, Long)].head()
    assert(e._1 <= e._2, s"lambda > trace: $e")
    assert(e._3 > 900000L && e._3 <= 1000000L, s"explained_ppm: $e")
  }

  test("projection equals the BigInt driver twin and orders by the axis") {
    val df = embDf(aniso)
    val cov = Pca.covariance(df, col("vec_id"), col("embedding"), 4)
    val v = Pca.powerIteration(cov, 4, 8)
    val vm = v.as[(Long, Long)].collect().toMap
    val got = Pca.project(df, col("vec_id"), col("embedding"), v)
      .as[(Long, Long)].collect().toMap
    aniso.zipWithIndex.foreach { case (vec, id) =>
      val dot = (0 until 4).map(i =>
        BigInt(math.round(vec(i).toDouble * Pca.QScale)) *
          BigInt(vm((i + 1).toLong))).sum
      assert(got(id.toLong) == (dot / BigInt(Pca.QScale)).toLong,
        s"vec $id")
    }
    // the projection separates the fixture's two sign groups
    val pos = aniso.indices.filter(_ % 2 == 0).map(i => got(i.toLong))
    val neg = aniso.indices.filter(_ % 2 == 1).map(i => got(i.toLong))
    assert(pos.min > neg.max || neg.min > pos.max,
      s"projection does not separate the sign groups: $got")
  }

  test("constant corpus: zero covariance, uniform vector, NULL ppm") {
    val const = embDf(Seq.fill(10)(Array(0.25f, 0.25f, 0.25f, 0.25f)))
    val cov = Pca.covariance(const, col("vec_id"), col("embedding"), 4)
    assert(cov.filter(col("cov_fp") =!= 0L).count() == 0)
    val v = Pca.powerIteration(cov, 4, 3).as[(Long, Long)].collect()
    assert(v.forall(_._2 == Pca.VScale), s"not uniform: ${v.toSeq}")
    val e = Pca.explained(cov, Pca.powerIteration(cov, 4, 3))
    assert(e.select("explained_ppm").head().isNullAt(0),
      "expected NULL sentinel on zero trace")
  }

  test("second component: orthogonal to PC1, finds the second axis") {
    val cov = Pca.covariance(embDf(aniso), col("vec_id"),
      col("embedding"), 4)
    val v1 = Pca.powerIteration(cov, 4, 8).as[(Long, Long)]
      .collect().toMap
    val v2 = Pca.powerIteration2(cov, 4, 8).as[(Long, Long)]
      .collect().toMap
    // the fixture's second-variance axis is dim 3 (8e-4 vs 6.7e-5
    // and 6e-6 on the others)
    assert(math.abs(v2(3L)) == Pca.VScale, s"v2: $v2")
    // exact-integer Gram-Schmidt: residual dot is truncation-sized
    // (each component truncates at most 1 unit per round), far under
    // any real angle — |v1·v2| ≪ |v1|² / 100
    val dot = (1L to 4L).map(i => BigInt(v1(i)) * BigInt(v2(i))).sum
    val vv1 = (1L to 4L).map(i => BigInt(v1(i)) * BigInt(v1(i))).sum
    assert(dot.abs * 100 < vv1, s"not orthogonal: dot=$dot vv1=$vv1")
  }

  test("explained2: cumulative spectrum on the aniso fixture") {
    val cov = Pca.covariance(embDf(aniso), col("vec_id"),
      col("embedding"), 4)
    val v1 = Pca.powerIteration(cov, 4, 8)
    val v2 = Pca.powerIteration2(cov, 4, 8)
    val r = Pca.explainedTop2(cov, v1, v2)
      .select("lambda1_fp", "lambda2_fp", "trace_fp", "explained2_ppm")
      .as[(Long, Long, Long, Long)].head()
    assert(r._2 < r._1, s"lambda2 >= lambda1: $r")
    assert(r._1 + r._2 <= r._3, s"spectrum exceeds trace: $r")
    val top1 = Pca.explained(cov, v1).select("explained_ppm")
      .as[Long].head()
    assert(r._4 >= top1, s"cumulative below top-1: $r vs $top1")
    assert(r._4 > 990000L && r._4 <= 1000000L,
      s"4-dim fixture with 2 real axes: $r")
  }

  test("project2: score1 equals project's PC1 coordinate") {
    val df = embDf(aniso)
    val cov = Pca.covariance(df, col("vec_id"), col("embedding"), 4)
    val v1 = Pca.powerIteration(cov, 4, 8)
    val v2 = Pca.powerIteration2(cov, 4, 8)
    val p1 = Pca.project(df, col("vec_id"), col("embedding"), v1)
      .as[(Long, Long)].collect().toMap
    val p2 = Pca.project2(df, col("vec_id"), col("embedding"), v1, v2)
      .as[(Long, Long, Long)].collect()
      .map(r => r._1 -> (r._2, r._3)).toMap
    assert(p1.keySet == p2.keySet)
    p1.foreach { case (id, s1) => assert(p2(id)._1 == s1, s"vec $id") }
  }

  test("outliers: the planted anomaly ranks first; BigInt driver twin") {
    val base = (0 until 30).map { k =>
      Array(0.1f + 0.001f * (k % 5), 0.1f - 0.001f * (k % 3),
        0.05f, 0.2f)
    }
    val planted = Array(0.9f, -0.9f, 0.05f, 0.2f)
    val df = embDf(base :+ planted)
    val got = Pca.outliers(df, col("vec_id"), col("embedding"),
      dim = 4, k = 5).as[(Long, Long, Long)].collect().toSeq
    assert(got.head._1 == 30L, s"planted anomaly not first: $got")
    assert(got.map(_._3) == (1L to 5L))
    // driver twin of the score arithmetic for the planted row
    val vecs = base :+ planted
    val q = vecs.map(_.map(x => math.round(x.toDouble * Pca.QScale)))
    val n = q.size
    val mean = (0 until 4).map(i =>
      q.map(v => BigInt(v(i))).sum / n)
    val varr = (0 until 4).map { i =>
      val s1 = q.map(v => BigInt(v(i))).sum
      val s2 = q.map(v => BigInt(v(i)) * v(i)).sum
      ((n * s2 - s1 * s1) / (BigInt(n) * n) / Pca.QScale).max(1)
    }
    val want = (0 until 4).map { i =>
      val d = BigInt(q(30)(i)) - mean(i)
      d * d / varr(i)
    }.sum
    assert(got.head._2 == want.toLong, s"twin drift: $got vs $want")
  }

  test("outliers: a constant dimension coming alive is maximally anomalous") {
    // dim 3 constant except ONE tiny deviation across 100 rows: the
    // variance rounds below the 1e-6 floor, the divisor clamps to 1,
    // and the deviant's dev^2 lands unscaled -> dominates every score
    val rows = (0 until 99).map(k =>
      Array(0.1f * (k % 3), 0.2f, 0.3f, 0.4f)) :+
      Array(0.0f, 0.2f, 0.301f, 0.4f)
    val got = Pca.outliers(embDf(rows), col("vec_id"),
      col("embedding"), dim = 4, k = 3)
      .as[(Long, Long, Long)].collect()
    assert(got.head._1 == 99L, s"deviant on dead dim not first: " +
      s"${got.toSeq}")
  }

  test("outliersByLabel: mixture corpus — minority domain is NOT the " +
      "outlier, the within-label anomaly is") {
    // label 0: 30 rows near 0.1; label 1: 10 rows near 0.9 (the
    // minority mode a GLOBAL mean would flag wholesale); one planted
    // anomaly inside label 0
    val rows: Seq[(Long, Array[Float], Int)] =
      (0 until 30).map(k => (k.toLong,
        Array(0.1f + 0.001f * (k % 5), 0.1f - 0.001f * (k % 3),
          0.05f, 0.2f), 0)) ++
      (0 until 10).map(k => (100L + k,
        Array(0.9f - 0.001f * (k % 4), 0.9f + 0.001f * (k % 3),
          0.05f, 0.2f), 1)) :+
      ((999L, Array(0.5f, -0.4f, 0.05f, 0.2f), 0))
    val df = rows.toDF("vec_id", "embedding", "label")
    val got = Pca.outliersByLabel(df, col("label"), col("vec_id"),
        col("embedding"), dim = 4, k = 3)
      .as[(Long, Long, Long, Long)].collect().toSeq
    // top of label 0 is the planted anomaly, by a wide margin
    val l0 = got.filter(_._1 == 0L).sortBy(_._4)
    assert(l0.head._2 == 999L, s"planted anomaly not first: $l0")
    // the minority label's own top score is ordinary next to it:
    // within-label scoring does not flag the domain
    val l1Top = got.filter(_._1 == 1L).map(_._3).max
    assert(l0.head._3 > 10L * l1Top,
      s"minority domain scored like an anomaly: ${l0.head._3} vs $l1Top")
    // ranks are 1..k within each label
    Seq(0L, 1L).foreach { g =>
      assert(got.filter(_._1 == g).map(_._4).sorted == (1L to 3L))
    }
    // the salted two-phase prune is exact: driver twin of per-label
    // top-k over the full scored relation
    val full = Pca.outliersByLabel(df, col("label"), col("vec_id"),
        col("embedding"), dim = 4, k = 41)
      .as[(Long, Long, Long, Long)].collect().toSeq
    val wantTop = full.groupBy(_._1).view.mapValues(
      _.sortBy(r => (-r._3, r._2)).take(3).map(r => (r._2, r._3)))
    got.groupBy(_._1).foreach { case (g, rs) =>
      assert(rs.sortBy(_._4).map(r => (r._2, r._3)) == wantTop(g),
        s"two-phase prune diverged for label $g")
    }
  }

  test("projectHist: floor buckets on negatives, census sums to n") {
    val df = embDf(aniso)
    val cov = Pca.covariance(df, col("vec_id"), col("embedding"), 4)
    val v = Pca.powerIteration(cov, 4, 8)
    val scores = Pca.project(df, col("vec_id"), col("embedding"), v)
      .as[(Long, Long)].collect().map(_._2)
    val w = 100000L
    val got = Pca.projectHist(df, col("vec_id"), col("embedding"),
      v, binWidthFp = w).as[(Long, Long)].collect().toMap
    // driver twin with FLOOR semantics (not truncation): a score in
    // (-w, 0) must land in bucket -1, never fold into bucket 0
    val want = scores.groupBy(x => Math.floorDiv(x, w))
      .map { case (b, xs) => b -> xs.size.toLong }
    assert(got == want, s"got $got want $want")
    assert(got.values.sum == aniso.size)
    assert(got.keys.exists(_ < 0) && got.keys.exists(_ >= 0),
      "fixture must straddle zero for the floor check to bite")
  }

  test("enrich: one-pass table equals the composed standalone queries") {
    val df = embDf(aniso)
    val enriched = Pca.enrich(df, col("vec_id"), col("embedding"),
      dim = 4, iters = 8).as[(Long, Long, Long, Long)]
      .collect().map(r => r._1 -> (r._2, r._3, r._4)).toMap
    val cov = Pca.covariance(df, col("vec_id"), col("embedding"), 4)
    val v1 = Pca.powerIteration(cov, 4, 8)
    val v2 = Pca.powerIteration2(cov, 4, 8)
    val p2 = Pca.project2(df, col("vec_id"), col("embedding"), v1, v2)
      .as[(Long, Long, Long)].collect()
      .map(r => r._1 -> (r._2, r._3)).toMap
    assert(enriched.keySet == p2.keySet)
    enriched.foreach { case (id, (s1, s2, _)) =>
      assert((s1, s2) == p2(id), s"coordinates drifted for vec $id")
    }
    // the outlier ranking derived from enrich matches outliers()
    val topFromEnrich = enriched.toSeq
      .sortBy { case (id, (_, _, m)) => (-m, id) }.take(5).map(_._1)
    val topDirect = Pca.outliers(df, col("vec_id"), col("embedding"),
      dim = 4, k = 5).as[(Long, Long, Long)].collect()
      .map(_._1).toSeq
    assert(topFromEnrich == topDirect, "outlier ranking drifted")
  }

  test("enrichByLabel == per-slice global enrich, label by label") {
    // interleaved labels over the aniso fixture: each label's slice
    // is its own corpus, so the per-label table must equal enrich()
    // run on the filtered slice — pins eigenvectors, projections,
    // and mean/var to the single-label chain in one property
    val df = embDf(aniso).withColumn("label",
      (col("vec_id") % 2).cast("int"))
    val byLabel = Pca.enrichByLabel(df, col("label"), col("vec_id"),
      col("embedding"), dim = 4, iters = 8)
      .as[(Long, Long, Long, Long, Long)].collect()
      .map(r => (r._1, r._2) -> (r._3, r._4, r._5)).toMap
    Seq(0L, 1L).foreach { l =>
      val slice = Pca.enrich(df.filter(col("label") === l),
        col("vec_id"), col("embedding"), dim = 4, iters = 8)
        .as[(Long, Long, Long, Long)].collect()
        .map(r => r._1 -> (r._2, r._3, r._4)).toMap
      slice.foreach { case (id, want) =>
        assert(byLabel((l, id)) == want,
          s"label $l vec $id drifted from the single-label chain")
      }
    }
    assert(byLabel.size == aniso.size, "every vector scored once")
  }

  test("grouped covariance == per-slice covariance, label by label") {
    val df = embDf(aniso).withColumn("label",
      (col("vec_id") % 2).cast("int"))
      .withColumnRenamed("embedding", "embedding")
    val grouped = Pca.covarianceByLabel(
      df.select(col("vec_id"), col("embedding"), col("label")), 4)
      .as[(Int, Long, Long, Long)].collect()
      .groupBy(_._1).map { case (l, rows) =>
        l -> rows.map(r => (r._2, r._3) -> r._4).toMap }
    Seq(0, 1).foreach { l =>
      val slice = Pca.covariance(df.filter(col("label") === l),
        col("vec_id"), col("embedding"), 4)
        .as[(Long, Long, Long)].collect()
        .map(r => (r._1, r._2) -> r._3).toMap
      assert(grouped(l) == slice, s"label $l drifted")
    }
  }

  test("moment additivity: incremental merge == whole-corpus covariance") {
    val df = embDf(aniso)
    val base = df.filter(col("vec_id") < 25)
    val batch = df.filter(col("vec_id") >= 25)
    val inc = Pca.covarianceIncremental(
      Pca.moments(base, col("vec_id"), col("embedding"), 4)
        .localCheckpoint(),
      batch, col("vec_id"), col("embedding"), 4)
      .as[(Long, Long, Long)].collect().toSeq.sorted
    val whole = Pca.covariance(df, col("vec_id"), col("embedding"), 4)
      .as[(Long, Long, Long)].collect().toSeq.sorted
    assert(inc == whole, "merged moments drifted from the whole")
  }

  test("covariance plan: one corpus pass, moments reused from the checkpoint") {
    val emb = spark.read.parquet(s"$sf/embeddings.parquet")
    val p = Pca.covariance(emb, col("vec_id"), col("embedding"), 64)
      .queryExecution.executedPlan.toString
    // every downstream consumer (cells, s1 twice, n) reads the
    // CHECKPOINTED moment relation — a FileScan of embeddings in the
    // final plan would mean a second corpus pass at 100 TB
    assert(!p.contains("FileScan"), s"corpus re-scanned downstream:\n$p")
    assert(!p.contains("SortMergeJoin"), s"sort-merge sneaked in:\n$p")
    val shuffles = "Exchange hashpartitioning".r.findAllIn(p).size
    assert(shuffles == 0, s"expected 0 hash exchanges, got $shuffles:\n$p")
    val broadcasts = "BroadcastHashJoin|BroadcastNestedLoopJoin".r
      .findAllIn(p).size
    assert(broadcasts >= 3, s"moment slices must broadcast:\n$p")
  }
}
