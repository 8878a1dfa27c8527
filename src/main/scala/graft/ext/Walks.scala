package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.Hashing

/** Deterministic random walks over undirected edge relations — the
  * corpus-generation step of DeepWalk-style graph embeddings
  * (Perozzi, Al-Rfou & Skiena, "DeepWalk", KDD 2014; Grover &
  * Leskovec, "node2vec", KDD 2016 — both public): emit walks, then
  * window co-occurrence pairs, and those pairs are the skip-gram
  * training corpus for node embeddings.
  *
  * "Random" is DETERMINISTIC hash-driven selection — the
  * [[graft.functions.Hashing]] discipline: at step s, a walk at node
  * v moves to neighbor number
  *
  *   pick = ((walk_id mod P2 + s·7919) · 32771 + 11) mod P2 mod deg(v)
  *
  * over the node's neighbors ranked by id. Every quantity is exact
  * int64 on both engines (operands nonnegative, products < 2⁴⁷), so
  * the full walk corpus is oracle-checkable AND reproducible across
  * reruns/cluster sizes — the property a training pipeline actually
  * needs from its walk generator (true RNG walks can't be re-derived
  * when a shard is lost; hash walks can). The (a, b) pair is
  * [[Hashing.Perms]](0) and the step stride 7919 is
  * [[Hashing.Stage2]]'s additive constant, reused so the family has
  * ONE source of hash coefficients.
  *
  * Scale shape: one pinned adjacency with per-node neighbor ranks
  * (row_number over the 2m-row relation — deg rows per hub, never
  * deg²), then per step exactly two equi-joins keyed on the current
  * node (degree lookup → pick, then (node, rank) lookup → next
  * node). A length-L walk set over n start nodes costs L joins of an
  * n-row frontier — linear in walks·length, no pair blowup anywhere.
  * Walks may revisit nodes (standard for DeepWalk corpora).
  */
object Walks {

  private val P2 = Hashing.P2
  private val (wa, wb) = Hashing.Perms(0)
  private val stride = Hashing.Stage2._2

  /** Directed adjacency with neighbor ranks and degrees, pinned —
    * every walk step joins it twice. */
  private def rankedAdjacency(edges: DataFrame): DataFrame = {
    val adj = edges
      .select(col("u").cast("long").as("node"), col("v").cast("long").as("nbr"))
      .unionAll(edges
        .select(col("v").cast("long").as("node"), col("u").cast("long").as("nbr")))
    Pin.pin(adj
      .withColumn("rk", row_number().over(
        Window.partitionBy(col("node")).orderBy(col("nbr"))) - 1L)
      .withColumn("d", count(lit(1)).over(Window.partitionBy(col("node")))
        .cast("long")))
  }

  /** The hash-selected neighbor index at step `s` for `walk_id`,
    * given degree column `d` — nonnegative ids only (graph node ids
    * here are part keys ≥ 0), so `%` agrees across engines. */
  private def pickExpr(s: Int): String =
    s"(((walk_id % $P2) + $s * $stride) * $wa + $wb) % $P2 % d"

  /** `length`-step deterministic walks, one walk per node of
    * `edges`: rows (walk_id, step, node_id), step 0 = the start
    * node. Output is walks·(length+1) rows. */
  def walks(edges: DataFrame, length: Int): DataFrame = {
    val adj = rankedAdjacency(edges)
    val deg = adj.groupBy(col("node")).agg(first(col("d")).as("d"))
      .withColumnRenamed("node", "cur")
    var frontier = Pin.pin(adj.select(col("node")).distinct()
      .select(col("node").as("walk_id"), col("node").as("cur")))
    var out = frontier.select(col("walk_id"), lit(0L).as("step"),
      col("cur").as("node_id"))
    for (s <- 1 to length) {
      val picked = frontier
        .join(deg, Seq("cur"))
        .select(col("walk_id"), col("cur"),
          expr(pickExpr(s)).as("__pick"))
      frontier = Pin.pin(picked
        .join(adj.select(col("node").as("__an"), col("nbr"), col("rk")),
          col("cur") === col("__an") && col("rk") === col("__pick"))
        .select(col("walk_id"), col("nbr").as("cur")))
      out = out.unionAll(frontier.select(col("walk_id"),
        lit(s.toLong).as("step"), col("cur").as("node_id")))
    }
    out.orderBy("walk_id", "step")
  }

  /** Per-node visit census of [[walks]] joined with the node degree:
    * (node_id, degree, visits, visit_ppm). The statistical sanity
    * read — an undirected random walk's stationary distribution is
    * ∝ degree, so visit_ppm tracking degree share is the check that
    * the hash selection isn't systematically biased. */
  def visitStats(edges: DataFrame, length: Int): DataFrame = {
    val adj = rankedAdjacency(edges)
    val deg = adj.groupBy(col("node"))
      .agg(first(col("d")).cast("long").as("degree"))
    val w = walks(edges, length)
    val visits = w.groupBy(col("node_id"))
      .agg(count(lit(1)).cast("long").as("visits"))
    val tot = visits.agg(sum(col("visits")).as("__tv"))
    deg.withColumnRenamed("node", "node_id")
      .join(visits, Seq("node_id"), "left")
      .withColumn("visits", coalesce(col("visits"), lit(0L)))
      .crossJoin(broadcast(tot))
      .select(col("node_id"), col("degree"), col("visits"),
        expr("(visits * 1000000L) div __tv").as("visit_ppm"))
      .orderBy("node_id")
  }

  /** Skip-gram co-occurrence pairs from [[walks]]: unordered node
    * pairs within `window` steps of each other on the same walk,
    * counted, top `k` by (count, pair) — the bounded corpus head a
    * training run inspects before generating the full pair set. */
  def cooccurrence(edges: DataFrame, length: Int, window: Int,
                   k: Int): DataFrame = {
    val w = Pin.pin(walks(edges, length))
    val a = w.select(col("walk_id"), col("step").as("__s1"),
      col("node_id").as("__n1"))
    val b = w.select(col("walk_id"), col("step").as("__s2"),
      col("node_id").as("__n2"))
    a.join(b, Seq("walk_id"))
      .filter(col("__s2") > col("__s1") &&
        col("__s2") - col("__s1") <= window &&
        col("__n1") =!= col("__n2"))
      .select(least(col("__n1"), col("__n2")).as("a"),
        greatest(col("__n1"), col("__n2")).as("b"))
      .groupBy(col("a"), col("b"))
      .agg(count(lit(1)).cast("long").as("n_cooc"))
      .orderBy(col("n_cooc").desc, col("a"), col("b"))
      .limit(k)
  }

  // ------------------------------------------------------------------
  // DuckDB twins (part co-order graph, the [[Graph.coEdges]] chain)
  // ------------------------------------------------------------------

  /** Edge + ranked-adjacency + unrolled walk CTEs: `e0`, `adjr`,
    * `deg`, `w0` .. `w$length`, `allw`. */
  def walkCtes(length: Int): String = {
    val sb = new StringBuilder
    sb ++= s"""g AS MATERIALIZED (
    |  SELECT DISTINCT l_orderkey AS o, CAST(l_partkey AS BIGINT) AS i
    |  FROM lineitem),
    |ok AS MATERIALIZED (
    |  SELECT o FROM g GROUP BY o
    |  HAVING count(*) <= ${Graph.DefaultMaxGroupSize}),
    |e0 AS MATERIALIZED (
    |  SELECT DISTINCT a.i AS u, b.i AS v
    |  FROM g a JOIN g b ON a.o = b.o AND a.i < b.i
    |  WHERE a.o IN (SELECT o FROM ok)),
    |adj AS MATERIALIZED (
    |  SELECT u AS node, v AS nbr FROM e0
    |  UNION ALL SELECT v, u FROM e0),
    |adjr AS MATERIALIZED (
    |  SELECT node, nbr,
    |    CAST(row_number() OVER (PARTITION BY node ORDER BY nbr) - 1
    |      AS BIGINT) AS rk
    |  FROM adj),
    |deg AS MATERIALIZED (
    |  SELECT node, CAST(count(*) AS BIGINT) AS d FROM adj GROUP BY 1),
    |w0 AS MATERIALIZED (
    |  SELECT node AS walk_id, node AS cur FROM deg)""".stripMargin
    for (s <- 1 to length) {
      val p = s - 1
      sb ++= s""",
      |w$s AS MATERIALIZED (
      |  SELECT pk.walk_id, a.nbr AS cur
      |  FROM (
      |    SELECT w.walk_id, w.cur,
      |      (((w.walk_id % $P2) + $s * $stride) * $wa + $wb)
      |        % $P2 % d.d AS pick
      |    FROM w$p w JOIN deg d ON d.node = w.cur) pk
      |  JOIN adjr a ON a.node = pk.cur AND a.rk = pk.pick)""".stripMargin
    }
    val unions = (0 to length).map(s =>
      s"SELECT walk_id, CAST($s AS BIGINT) AS step, cur AS node_id FROM w$s")
      .mkString("\n  UNION ALL ")
    sb ++= s""",
    |allw AS MATERIALIZED (
    |  $unions)""".stripMargin
    sb.toString
  }

  /** DuckDB twin of [[walks]] over the part co-order graph. */
  def walksOracleSql(length: Int): String =
    s"""
    |WITH ${walkCtes(length)}
    |SELECT walk_id, step, node_id FROM allw
    |ORDER BY walk_id, step
    |""".stripMargin.trim

  /** DuckDB twin of [[visitStats]]. */
  def visitStatsOracleSql(length: Int): String =
    s"""
    |WITH ${walkCtes(length)},
    |vis AS (
    |  SELECT node_id, CAST(count(*) AS BIGINT) AS visits
    |  FROM allw GROUP BY 1),
    |tv AS (SELECT SUM(visits) AS tv FROM vis)
    |SELECT d.node AS node_id, d.d AS degree,
    |  CAST(coalesce(v.visits, 0) AS BIGINT) AS visits,
    |  CAST((coalesce(v.visits, 0) * 1000000) // tv.tv AS BIGINT)
    |    AS visit_ppm
    |FROM deg d LEFT JOIN vis v ON v.node_id = d.node CROSS JOIN tv
    |ORDER BY node_id
    |""".stripMargin.trim

  /** DuckDB twin of [[cooccurrence]]. */
  def cooccurrenceOracleSql(length: Int, window: Int, k: Int): String =
    s"""
    |WITH ${walkCtes(length)}
    |SELECT LEAST(a.node_id, b.node_id) AS a,
    |  GREATEST(a.node_id, b.node_id) AS b,
    |  CAST(count(*) AS BIGINT) AS n_cooc
    |FROM allw a JOIN allw b ON a.walk_id = b.walk_id
    |  AND b.step > a.step AND b.step - a.step <= $window
    |  AND a.node_id <> b.node_id
    |GROUP BY 1, 2
    |ORDER BY n_cooc DESC, a, b
    |LIMIT $k
    |""".stripMargin.trim
}
