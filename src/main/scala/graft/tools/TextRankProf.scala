package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.GraftConf

/** Stage decomposition for textrank_keywords: where does the wall go
  * — the bigram pair aggregate, the adj materialization, or the
  * PageRank rounds? `TextRankProf <sfDir>`.
  *
  * Deliberately keeps the STRING-KEYED round formulation (and the
  * plain-long contribution) that production REJECTED — this harness
  * is the measured baseline behind SCALE.md §47's dictionary-encoding
  * decision: string-keyed rounds read ~4.8 s each at ×10 (decimal
  * product) / ~2.7 s (long product); the shipped dict-encoded rounds
  * read the whole query at 4.4 s. */
object TextRankProf {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = GraftConf.applyBase(SparkSession.builder()
        .master(s"local[$cpus]"), cpus.toInt)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"$label: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    for (trial <- 1 to 2) {
      println(s"-- trial $trial")
      val words = docs.select(split(col("text"), " ").as("__w"))
      val pairs = words
        .select(explode(expr(
          """transform(slice(__w, 1, size(__w) - 1),
            |  (x, i) -> struct(
            |    least(x, element_at(__w, i + 2)) AS u,
            |    greatest(x, element_at(__w, i + 2)) AS v))"""
            .stripMargin)).as("__b"))
        .select(col("__b.u"), col("__b.v"))
        .filter(col("u") =!= col("v"))
        .groupBy(col("u"), col("v")).agg(count(lit(1)).as("w"))
      val pairsP = time("pairs agg + pin")(graft.ext.Pin.pin(pairs))
      val adj = time("adj spread + checkpoint")(
        graft.ext.Dedup.spread(pairsP
          .select(col("u").as("src"), col("v").as("dst"), col("w"))
          .unionByName(pairsP.select(col("v").as("src"),
            col("u").as("dst"), col("w"))), col("src"))
          .localCheckpoint())
      val wsum = adj.groupBy(col("src")).agg(sum(col("w")).as("wsum"))
      var ranks = time("ranks init")(wsum
        .crossJoin(broadcast(wsum.agg(count(lit(1)).as("__n"))))
        .withColumn("pr_fp", expr("1000000000000 DIV __n"))
        .localCheckpoint())
      for (r <- 1 to 3) {
        val contrib = adj
          .join(ranks.select(col("src"), col("pr_fp"), col("wsum")),
            Seq("src"))
          .select(col("dst"), expr(
            "(pr_fp * w) DIV wsum").as("__c"))
          .groupBy(col("dst"))
          .agg(sum(col("__c")).as("__in"))
        ranks = time(s"round $r")(ranks.drop("pr_fp")
          .join(contrib.withColumnRenamed("dst", "src"), Seq("src"),
            "left")
          .withColumn("pr_fp", expr(
            "(15 * (1000000000000 DIV __n)) DIV 100 + " +
              "(85 * coalesce(CAST(__in AS BIGINT), 0L)) DIV 100"))
          .drop("__in")
          .localCheckpoint())
      }
      time("topk")(ranks.orderBy(col("pr_fp").desc, col("src").asc)
        .limit(20).collect())
    }
    spark.stop()
  }
}
