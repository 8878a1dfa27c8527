package graft

import org.apache.spark.sql.functions._

import graft.ext.TextAnalysis

class TextAnalysisSpec extends SparkSpec {

  test("repetitionFeatures: hand-computed fractions on crafted docs") {
    import spark.implicits._
    val docs = Seq(
      (1L, "a a a a"),   // one word repeated: bigram "a a" x3
      (2L, "a b c d"),   // all distinct
      (3L, "x")          // too short for a bigram -> no row
    ).toDF("doc_id", "text")
    val out = TextAnalysis.repetitionFeatures(docs, col("doc_id"),
      col("text"), 2).collect().map(r => r.getLong(0) -> r).toMap

    assert(out.keySet == Set(1L, 2L), "doc 3 has no bigrams")
    val d1 = out(1L)
    assert(d1.getAs[Double]("dup_word_frac") == 0.75)   // 1 - 1/4
    assert(d1.getAs[Long]("n_grams") == 3)
    assert(d1.getAs[Double]("dup_gram_frac") == 1.0)
    assert(d1.getAs[Double]("top_gram_frac") == 1.0)
    val d2 = out(2L)
    assert(d2.getAs[Double]("dup_word_frac") == 0.0)
    assert(d2.getAs[Long]("n_grams") == 3)
    assert(d2.getAs[Double]("dup_gram_frac") == 0.0)
    assert(d2.getAs[Double]("top_gram_frac") == 1.0 / 3.0)
  }

  test("lmFit: hand-computed continuation ratios on crafted docs") {
    import spark.implicits._
    val docs = Seq((1L, "a b"), (2L, "a b"), (3L, "a c"))
      .toDF("doc_id", "text")
    val out = TextAnalysis.lmFit(docs, col("doc_id"), col("text"))
      .collect().map(r => r.getLong(0) -> r).toMap
    // cw(a)=3; cb(a b)=2 -> r = 2e6 div 3; cb(a c)=1 -> r = 1e6 div 3
    assert(out(1L).getAs[Long]("fit_q") == 2000000L / 3)
    assert(out(2L).getAs[Long]("fit_q") == 2000000L / 3)
    assert(out(3L).getAs[Long]("fit_q") == 1000000L / 3)
    assert(out.values.forall(_.getAs[Long]("n_bigrams") == 1L))
  }

  test("repetitionFeatures: fractions bounded and consistent on the fixture") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    val rep = TextAnalysis.repetitionFeatures(docs, col("doc_id"),
      col("text"), 2)
    val bad = rep.filter(
      col("dup_gram_frac") < 0 || col("dup_gram_frac") > 1 ||
        col("top_gram_frac") <= 0 || col("top_gram_frac") > 1 ||
        col("dup_word_frac") < 0 || col("dup_word_frac") >= 1 ||
        // top occupancy can never be below 1/n_grams (tolerance for
        // the double division round-trip: x/y*y can land one ulp low)
        col("top_gram_frac") * col("n_grams") < 1 - 1e-9).count()
    assert(bad == 0)
    // every doc with >= 2 words emits exactly one row
    assert(rep.count() ==
      docs.filter(size(split(col("text"), " ")) >= 2).count())
  }

  test("featureHash kernel is bit-identical to the agg formulation") {
    import spark.implicits._
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    val kern = TextAnalysis.featureHash(docs, col("doc_id"), col("text"))
    val agg = TextAnalysis.featureHashViaAgg(docs, col("doc_id"), col("text"))
    assert(kern.exceptAll(agg).isEmpty && agg.exceptAll(kern).isEmpty)
    // edge shapes: empty text (one empty token -> bucket of hash 0),
    // single word, beyond-BMP unicode
    val edge = Seq((1L, ""), (2L, "one"), (3L, "x 😀 y")).toDF("doc_id", "text")
    val ek = TextAnalysis.featureHash(edge, col("doc_id"), col("text"))
    val ea = TextAnalysis.featureHashViaAgg(edge, col("doc_id"), col("text"))
    assert(ek.exceptAll(ea).isEmpty && ea.exceptAll(ek).isEmpty)
  }

  test("featureHash: vector mass equals token count, dim fixed") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    val fh = TextAnalysis.featureHash(docs, col("doc_id"), col("text"))
    val bad = fh
      .join(docs.select(col("doc_id"),
        size(split(col("text"), " ")).cast("long").as("n_toks")), "doc_id")
      .filter(size(col("features")) =!= 64 ||
        aggregate(col("features"), lit(0L), _ + _) =!= col("n_toks"))
      .count()
    assert(bad == 0)
    assert(fh.count() == docs.count())
  }
}
