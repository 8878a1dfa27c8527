package graft

import org.apache.spark.sql.functions._
import graft.ext.TextPairEval

/** Hand-computed pins for the ROUGE/BLEU pairwise eval family —
  * the properties the oracle compare can't isolate: multiset
  * clipping, the shared-numerator F1 identity, brevity saturation,
  * and the fixture pairing's odd-count behavior. */
class TextPairEvalSpec extends SparkSpec {
  import spark.implicits._

  private def docs(rows: (Long, String, String)*) =
    rows.toDF("doc_id", "source", "text")

  test("selfPairs: consecutive same-source docs, odd one out unpaired") {
    val d = docs((1L, "a", "x"), (2L, "a", "x"), (3L, "a", "x"),
      (10L, "b", "x"), (11L, "b", "x"))
    val p = TextPairEval.selfPairs(d, col("doc_id"), col("source"))
      .orderBy("cand_id").collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(p.toSeq == Seq((1L, 2L), (10L, 11L))) // doc 3 unpaired
  }

  test("rouge1 clips multisets: 'the the the' vs 'the x' matches once") {
    val d = docs((1L, "a", "the the the"), (2L, "a", "the x"))
    val r = TextPairEval.rougeN(d, col("doc_id"), col("source"),
      col("text"), 1).collect().head
    assert(r.getAs[Long]("clip") == 1L)     // min(3, 1), not 3 and not 0
    assert(r.getAs[Long]("n_cand") == 3L && r.getAs[Long]("n_ref") == 2L)
    assert(r.getAs[Long]("p_ppm") == 1000000L / 3)   // 1/3
    assert(r.getAs[Long]("r_ppm") == 500000L)        // 1/2
    assert(r.getAs[Long]("f_ppm") == 2000000L / 5)   // 2·1/(3+2)
  }

  test("rouge2 zero-overlap pair appears with clip=0, all ppm 0") {
    val d = docs((1L, "a", "p q r"), (2L, "a", "x y z"))
    val r = TextPairEval.rougeN(d, col("doc_id"), col("source"),
      col("text"), 2).collect().head
    assert(r.getAs[Long]("clip") == 0L)
    assert(r.getAs[Long]("p_ppm") == 0L && r.getAs[Long]("f_ppm") == 0L)
  }

  test("f1 identity 2·clip/(nc+nr) holds on the fixture corpus") {
    val d = spark.read.parquet(s"$sf/documents.parquet")
    val r = TextPairEval.rougeN(d, col("doc_id"), col("source"),
      col("text"), 1)
    val bad = r.filter(
      col("f_ppm") =!= when(col("n_cand") + col("n_ref") > 0,
        expr("(2 * clip * 1000000) div (n_cand + n_ref)")).otherwise(0L)
    ).count()
    assert(bad == 0L)
  }

  test("bleu: brevity saturates at 1e6 when cand >= ref; product score") {
    // cand 4 words, ref 2 words -> bp = 1e6 (saturated)
    val d = docs((1L, "a", "u v u v"), (2L, "a", "u v"))
    val r = TextPairEval.bleuProxy(d, col("doc_id"), col("source"),
      col("text")).collect().head
    assert(r.getAs[Long]("bp_ppm") == 1000000L)
    // p1: cand grams {u:2, v:2}, ref {u:1, v:1} -> clip 2 of 4
    assert(r.getAs[Long]("p1_ppm") == 500000L)
    // p2: cand bigrams {uv:2, vu:1}, ref {uv:1} -> clip 1 of 3
    assert(r.getAs[Long]("p2_ppm") == 1000000L / 3)
    val expected = (BigInt(1000000) * 500000 * (1000000 / 3) /
      BigInt("1000000000000")).toLong
    assert(r.getAs[Long]("bleu2_ppm") == expected)
  }

  test("bleu: short candidate pays linear brevity") {
    // cand 1 word, ref 4 words -> bp = 250000
    val d = docs((1L, "a", "u"), (2L, "a", "u u u u"))
    val r = TextPairEval.bleuProxy(d, col("doc_id"), col("source"),
      col("text")).collect().head
    assert(r.getAs[Long]("bp_ppm") == 250000L)
    assert(r.getAs[Long]("p1_ppm") == 1000000L) // "u" fully clipped
    assert(r.getAs[Long]("p2_ppm") == 0L)       // cand has no bigram
    assert(r.getAs[Long]("bleu2_ppm") == 0L)    // product zeroes
  }
}
