package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.ext.{Graph, Walks}

/** Persisted-walk-corpus economics, measured
  * (`WalkCorpusProf <sfDir> [length] [extraSteps]`): build the
  * corpus at `length` over the co-order graph, then extend it by
  * `extraSteps` from disk — the claim under test is that the extend
  * leg prices at the MARGINAL steps (≈ extra/length of the build
  * wall plus the frontier read), not at a regeneration. Also
  * re-reads the corpus and checks the row census, so the number is
  * a working corpus's, not a fire-and-forget write. */
object WalkCorpusProf {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val length = if (args.length > 1) args(1).toInt else 8
    val extra = if (args.length > 2) args(2).toInt else 4
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = graft.GraftConf.applyBase(SparkSession.builder()
        .master(s"local[$cpus]"), cpus.toInt)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dir = java.nio.file.Files
      .createTempDirectory("walk-corpus-prof").toString + "/wc"
    val edges = Graph.coEdges(
      spark.read.parquet(s"$sfDir/lineitem.parquet"),
      col("l_orderkey"), col("l_partkey")).localCheckpoint()
    println(s"edges: ${edges.count()}")
    def time[T](tag: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"$tag: ${(System.nanoTime() - t0) / 1e9}%.1f s"); r
    }
    time(s"build L=$length") {
      Walks.walkWriteCorpus(edges, length, dir)
    }
    time(s"extend +$extra (persisted)") {
      Walks.walkExtendPersisted(spark, edges, dir, extra)
    }
    val n = time("read-back census") {
      Walks.walkReadCorpus(spark, dir).count()
    }
    val walks = n / (length + extra + 1)
    println(s"rows: $n (= $walks walks x ${length + extra + 1} steps)")
    spark.stop()
  }
}
