package graft

import graft.ext.{Bfs, Hits}
import org.apache.spark.sql.functions._

/** HITS + multi-source BFS: exact BigInt driver twins on hand
  * fixtures, shortest-path semantics, and the bounded-seed /
  * stable-node-set contracts. */
class HitsBfsSpec extends SparkSpec {
  import spark.implicits._

  // ---- HITS ----

  /** Driver twin of the fixed-point HITS rounds. */
  private def bruteHits(edges: Seq[(Long, Long)], iters: Int)
      : (Map[Long, Long], Map[Long, Long]) = {
    val cs = edges.map(_._1).distinct
    var h = cs.map(_ -> BigInt(Hits.Scale)).toMap
    var a = Map.empty[Long, BigInt]
    for (_ <- 1 to iters) {
      val ar = edges.groupBy(_._2).map { case (s, es) =>
        s -> es.map(e => h(e._1)).sum }
      val amx = ar.values.max
      a = ar.map { case (s, v) => s -> v * Hits.Scale / amx }
      val hr = edges.groupBy(_._1).map { case (c, es) =>
        c -> es.map(e => a(e._2)).sum }
      val hmx = hr.values.max
      h = hr.map { case (c, v) => c -> v * Hits.Scale / hmx }
    }
    (h.map { case (k, v) => k -> v.toLong },
      a.map { case (k, v) => k -> v.toLong })
  }

  private val biEdges: Seq[(Long, Long)] = Seq(
    (1L, 10L), (2L, 10L), (3L, 10L), // supplier 10: bought by all
    (1L, 11L), (2L, 11L),            // supplier 11: two buyers
    (3L, 12L))                       // supplier 12: one buyer

  test("hits equals the BigInt driver twin on the bipartite fixture") {
    val df = biEdges.toDF("c", "s")
    val got = Hits.hits(df, iters = 3)
      .as[(String, Long, Long)].collect().toSeq
    val (h, a) = bruteHits(biEdges, 3)
    val want = a.toSeq.map { case (s, v) => ("supplier", s, v) } ++
      h.toSeq.map { case (c, v) => ("customer", c, v) }
    assert(got.sorted == want.sorted)
    // the all-buyer supplier is the max-normalized authority
    assert(got.contains(("supplier", 10L, Hits.Scale)))
  }

  test("hits node sets are stable: one row per node per kind") {
    val got = Hits.hits(biEdges.toDF("c", "s"), iters = 2)
      .as[(String, Long, Long)].collect().toSeq
    assert(got.count(_._1 == "customer") == 3)
    assert(got.count(_._1 == "supplier") == 3)
    assert(got.map(r => (r._1, r._2)).distinct.size == got.size)
    // scores stay in (0, Scale] — non-negative, max-normalized
    assert(got.forall(r => r._3 > 0 && r._3 <= Hits.Scale))
  }

  // ---- BFS ----

  test("bfs reach: path graph distances, horizon cut at maxHops") {
    val path = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L))
      .toDF("u", "v")
    val got = Bfs.reach(path, seedMax = 2L, maxHops = 3)
      .as[(Long, Long, Long)].collect().toSet
    assert(got == Set((1L, 1L, 0L), (1L, 2L, 1L), (1L, 3L, 2L),
      (1L, 4L, 3L))) // node 5 is 4 hops out: beyond the horizon
  }

  test("bfs reach: diamond graph takes the SHORTEST distance") {
    // 1-2, 1-3, 2-4, 3-4, 4-5: node 4 reachable two ways at dist 2
    val dia = Seq((1L, 2L), (1L, 3L), (2L, 4L), (3L, 4L), (4L, 5L))
      .toDF("u", "v")
    val got = Bfs.reach(dia, seedMax = 2L, maxHops = 3)
      .as[(Long, Long, Long)].collect()
    assert(got.count(_._2 == 4L) == 1, "node must appear once per seed")
    assert(got.toSet.contains((1L, 4L, 2L)))
    assert(got.toSet.contains((1L, 5L, 3L)))
  }

  test("bfs reach: seeds never cross a component boundary") {
    val twoComp = Seq((1L, 2L), (2L, 3L), (10L, 11L)).toDF("u", "v")
    val got = Bfs.reach(twoComp, seedMax = 5L, maxHops = 3)
      .as[(Long, Long, Long)].collect()
    assert(got.forall(r => r._2 < 10L), s"leaked across components: " +
      s"${got.toSeq}")
    // seeds = graph nodes under the bound: 1, 2, 3 (10/11 excluded)
    assert(got.map(_._1).distinct.sorted.toSeq == Seq(1L, 2L, 3L))
  }

  test("sssp: a light two-hop path beats a heavy direct edge") {
    import graft.ext.Sssp
    // direct 1-3 co-occurs once (len 1e6); 1-2 and 2-3 co-occur 10x
    // (len 1e5 each): the weighted shortest path is 2e5 via node 2
    val edges = Seq((1L, 3L, 1L), (1L, 2L, 10L), (2L, 3L, 10L))
      .toDF("u", "v", "w")
    val got = Sssp.sssp(edges, seedMax = 2L, rounds = 3)
      .as[(Long, Long, Long)].collect()
      .map(r => (r._1, r._2) -> r._3).toMap
    assert(got((1L, 1L)) == 0L)
    assert(got((1L, 2L)) == 100000L)
    assert(got((1L, 3L)) == 200000L, s"direct edge won: $got")
  }

  test("sssp is monotone: extra rounds change nothing once converged") {
    import graft.ext.Sssp
    val edges = Seq((1L, 2L, 2L), (2L, 3L, 2L), (3L, 4L, 2L))
      .toDF("u", "v", "w")
    val r3 = Sssp.sssp(edges, 2L, 3).as[(Long, Long, Long)]
      .collect().toSet
    val r5 = Sssp.sssp(edges, 2L, 5).as[(Long, Long, Long)]
      .collect().toSet
    assert(r3 == r5, "converged distances moved")
  }

  test("closeness: reach count and exact integer mean, self excluded") {
    import graft.ext.Sssp
    // path 1 -[w2]- 2 -[w2]- 3: from seed 1, dist(2)=5e5, dist(3)=1e6
    val edges = Seq((1L, 2L, 2L), (2L, 3L, 2L)).toDF("u", "v", "w")
    val got = Sssp.closeness(edges, seedMax = 2L, rounds = 3)
      .as[(Long, Long, Long)].collect().toSeq
    assert(got == Seq((1L, 2L, 750000L)), s"got $got")
  }

  test("bfs levels census sums to the reach row count") {
    val dia = Seq((1L, 2L), (1L, 3L), (2L, 4L), (3L, 4L), (4L, 5L))
      .toDF("u", "v")
    val reach = Bfs.reach(dia, seedMax = 2L, maxHops = 2).count()
    val levels = Bfs.levels(dia, seedMax = 2L, maxHops = 2)
      .agg(sum("n_nodes")).as[Long].head()
    assert(reach == levels)
  }
}
