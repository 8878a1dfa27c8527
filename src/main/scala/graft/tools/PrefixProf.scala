package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

import graft.ext.Dedup

/** Throwaway stage profiler for the PPJoin prefix pipeline. */
object PrefixProf {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    def time(name: String)(f: => Long): Unit = {
      for (i <- 1 to 3) {
        val t0 = System.nanoTime()
        val n = f
        println(f"$name run $i: ${(System.nanoTime() - t0) / 1e9}%.2f s ($n)")
      }
    }
    val grams = Dedup.explodedGrams(docs, col("doc_id"), col("text"), 3)
    time("grams")(grams.count())
    val docFreq = grams.groupBy(col("gram")).agg(count(lit(1)).as("df"))
    time("docFreq")(docFreq.count())
    val ranked = grams.join(docFreq, "gram")
      .withColumn("rank", row_number().over(
        Window.partitionBy(col("doc_id"))
          .orderBy(col("df").asc, col("gram").asc)))
      .withColumn("n_grams", count(lit(1)).over(
        Window.partitionBy(col("doc_id"))))
    time("ranked")(ranked.count())
    val prefix = ranked.filter(col("rank") <= col("n_grams") -
        expr("(n_grams * 4 + 4) div 5") + 1)
      .select(col("gram"), col("doc_id"), col("n_grams"))
    time("prefix(no ckpt)")(prefix.count())
    time("full path")(Dedup.ngramJaccardPairsPrefix(docs, col("doc_id"),
      col("text"), 3, 4, 5).count())
    // decompose the tail: checkpointed prefix, candidate join, verify
    val t0 = System.nanoTime()
    val pfx = prefix.localCheckpoint()
    println(f"ckpt: ${(System.nanoTime() - t0) / 1e9}%.2f s")
    val cand = Dedup.spread(pfx.select(col("gram"), col("doc_id").as("d1"),
        col("n_grams").as("__n1")), col("gram"))
      .join(pfx.select(col("gram").as("__g2"), col("doc_id").as("d2"),
        col("n_grams").as("__n2")),
        col("gram") === col("__g2") && col("d1") < col("d2") &&
          col("__n1") * lit(4) <= col("__n2") * lit(5) &&
          col("__n2") * lit(4) <= col("__n1") * lit(5))
      .select(col("d1"), col("d2")).distinct()
    time("cand join")(cand.count())
    val t1 = System.nanoTime()
    val candCk = cand.localCheckpoint()
    println(f"cand ckpt: ${(System.nanoTime() - t1) / 1e9}%.2f s")
    val candIds = candCk.select(explode(array(col("d1"), col("d2")))
      .as("__cand_doc")).distinct()
    val scoped = docs.join(candIds, col("doc_id") === col("__cand_doc"),
      "left_semi")
    val sets = Dedup.explodedGrams(scoped, col("doc_id"), col("text"), 3)
      .groupBy(col("doc_id"))
      .agg(sort_array(collect_list(col("gram"))).as("grams"),
        count(lit(1)).as("n_grams"))
    time("gramSets(scoped)")(sets.count())
    val ver = candCk
      .join(sets.select(col("doc_id").as("d1"), col("grams").as("g1"),
        col("n_grams").as("n1")), "d1")
      .join(sets.select(col("doc_id").as("d2"), col("grams").as("g2"),
        col("n_grams").as("n2")), "d2")
      .withColumn("inter",
        size(array_intersect(col("g1"), col("g2"))).cast("long"))
      .filter(col("inter") * lit(5) >=
        (col("n1") + col("n2") - col("inter")) * lit(4))
    time("verify")(ver.count())
    spark.stop()
  }
}
