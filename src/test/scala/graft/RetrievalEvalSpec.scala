package graft

import graft.ext.RetrievalEval
import org.apache.spark.sql.functions._

/** Label-MRR eval: hand fixture with a known cosine order, the
  * self-exclusion rule, and the no-relevant-document omission. */
class RetrievalEvalSpec extends SparkSpec {
  import spark.implicits._

  // Query 0 (label 1) along e1; its relative (id 2, label 1) at 45°;
  // two closer non-relatives (label 2): id 1 almost-parallel, id 3
  // mid-angle. Exact ranking for query 0: 1 (cos≈.995), 3 (≈.89),
  // 2 (≈.71) → first same-label hit at rank 3.
  private def fixture = Seq(
    (0L, Array(1.0f, 0.0f), 1),
    (1L, Array(0.9f, 0.1f), 2),
    (2L, Array(0.5f, 0.5f), 1),
    (3L, Array(0.8f, 0.4f), 2))
    .toDF("vec_id", "embedding", "label")

  test("first relevant rank and rr_ppm on the known ordering") {
    val got = RetrievalEval.labelMrr(fixture, qMax = 1L)
      .as[(Long, Int, Long, Long)].collect().toSeq
    assert(got == Seq((0L, 1, 3L, 333333L)))
  }

  test("a query is never its own relevant document") {
    // every vector a query: self-pairs excluded, so query 2's best
    // relative is 0 (not itself)
    val got = RetrievalEval.labelMrr(fixture, qMax = 4L)
      .as[(Long, Int, Long, Long)].collect()
      .map(r => r._1 -> r._3).toMap
    assert(got.keySet == Set(0L, 1L, 2L, 3L))
    assert(got.values.forall(_ >= 1L))
  }

  test("a label singleton emits no row (no relevant document exists)") {
    val singleton = Seq(
      (0L, Array(1.0f, 0.0f), 7),
      (1L, Array(0.9f, 0.1f), 2),
      (2L, Array(0.5f, 0.5f), 2))
      .toDF("vec_id", "embedding", "label")
    val got = RetrievalEval.labelMrr(singleton, qMax = 3L)
      .select("query_id").as[Long].collect().toSet
    assert(got == Set(1L, 2L), s"singleton leaked: $got")
  }
}
