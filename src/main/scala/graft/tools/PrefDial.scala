package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.ext.{Community, Graph, Prefs}

/** Decade probes for the round-11 families
  * (`PrefDial <mode> <dir> [args...]`, SCALE.md §33 protocol:
  * min-of-N walls on a quiet box):
  *
  *  - `bt <dir> x1,x2,... [n] [players]` — Bradley–Terry's two-leg
  *    cost split at match-log scale ×x (the log replicated from a
  *    pinned base, so pair structure is unchanged and only volume
  *    grows): wall of the ONE corpus aggregate (pairStats → pin) vs
  *    wall of the MM solve + leaderboard on the aggregated relation.
  *    The design claim under test: the first leg is linear in
  *    matches, the second does not move at all.
  *  - `btk <dir> k1,k2,... [n]` — the solver's own scaling dial:
  *    players = user_id % k, so the aggregated relation grows ~k²
  *    while the corpus stays fixed. Solve wall must track the pair
  *    count, not the match count.
  *  - `lpa <dir> maxRounds [n]` — sync-LPA marginal round cost over
  *    the dir's part co-order graph: wall at rounds=1..maxRounds.
  *    The claim: each round adds one edges⋈labels join + one top-1,
  *    so the wall is ~linear in rounds with no blowup term.
  */
object PrefDial {
  def main(args: Array[String]): Unit = {
    val mode = args(0)
    val dir = args(1)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = graft.GraftConf.applyBase(SparkSession.builder()
        .master(s"local[$cpus]"), cpus.toInt)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(1000).count()

    def events: DataFrame = graft.Queries.eventsTable(spark, dir)
    def li: DataFrame = spark.read.parquet(s"$dir/lineitem.parquet")
    def timeIt[T](n: Int)(f: => T): (Double, T) = {
      var best = Double.MaxValue
      var last: Option[T] = None
      (1 to n).foreach { _ =>
        val t0 = System.nanoTime()
        last = Some(f)
        best = math.min(best, (System.nanoTime() - t0) / 1e9)
      }
      (best, last.get)
    }

    mode match {
      case "bt" =>
        val xs = args(2).split(",").map(_.toInt).toSeq
        val n = if (args.length > 3) args(3).toInt else 3
        val players = if (args.length > 4) args(4).toInt else 16
        // one materialization of the base log; replicas scan it, so
        // ×100 measures 100× the AGGREGATE's input, not 100× the
        // match-derivation join
        val base = Prefs.matchesFrom(events, players).localCheckpoint()
        val m0 = base.count()
        xs.foreach { x =>
          val log = (1 to x).map(_ => base).reduce(_ unionAll _)
          val (tAgg, pairs) = timeIt(n) {
            val p = Prefs.pairStats(log).localCheckpoint()
            (p.count(), p)
          }
          val (tSolve, rows) =
            timeIt(n)(Prefs.btRating(pairs._2, iters = 4).count())
          println(f"bt x$x%-4d matches=${m0 * x}%9d pairs=${pairs._1}%5d " +
            f"agg=$tAgg%7.2f s  solve=$tSolve%6.2f s  (min-of-$n, $rows players)")
        }

      case "btk" =>
        val ks = args(2).split(",").map(_.toInt).toSeq
        val n = if (args.length > 3) args(3).toInt else 3
        ks.foreach { k =>
          val pairs = graft.ext.Pin.pin(
            Prefs.pairStats(Prefs.matchesFrom(events, k)))
          val np = pairs.count()
          val (tSolve, rows) =
            timeIt(n)(Prefs.btRating(pairs, iters = 4).count())
          println(f"btk k=$k%-5d pairs=$np%7d solve=$tSolve%6.2f s " +
            f"(min-of-$n, $rows players)")
        }

      case "lpa" =>
        val maxRounds = args(2).toInt
        val n = if (args.length > 3) args(3).toInt else 3
        val edges = Graph.coEdges(li, col("l_orderkey"), col("l_partkey"))
          .localCheckpoint()
        val m = edges.count()
        (1 to maxRounds).foreach { r =>
          val (tw, rows) = timeIt(n)(Community.lpa(edges, r).count())
          println(f"lpa rounds=$r edges=$m%8d wall=$tw%6.2f s " +
            f"(min-of-$n, $rows nodes)")
        }

      case other => sys.error(s"unknown mode $other")
    }
    spark.stop()
  }
}
