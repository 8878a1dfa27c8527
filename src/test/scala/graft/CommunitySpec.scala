package graft

import graft.ext.Community

/** Sync LPA + modularity: hand-propagated fixtures (every round's
  * plurality/tie-break worked out by hand) and the textbook
  * two-triangles-and-a-bridge modularity value. */
class CommunitySpec extends SparkSpec {
  import spark.implicits._

  // two triangles {1,2,3} and {4,5,6} joined by the bridge 3-4
  private def bridged = Seq((1L, 2L), (1L, 3L), (2L, 3L),
    (4L, 5L), (4L, 6L), (5L, 6L), (3L, 4L)).toDF("u", "v")

  test("lpa: 3 sync rounds split the bridged triangles cleanly") {
    val got = Community.lpa(bridged, rounds = 3)
      .as[(Long, Long)].collect().toMap
    // hand propagation: l1 = (1→2, 2→1, 3→1, 4→3, 5→4, 6→4);
    // l2 = (1→1, 2→1, 3→1, 4→4, 5→3, 6→3);
    // l3 = ({1,2,3}→1, {4,5,6}→3)
    assert(got == Map(1L -> 1L, 2L -> 1L, 3L -> 1L,
      4L -> 3L, 5L -> 3L, 6L -> 3L))
  }

  test("lpa intermediate round matches the hand propagation") {
    val got = Community.lpa(bridged, rounds = 2)
      .as[(Long, Long)].collect().toMap
    assert(got == Map(1L -> 1L, 2L -> 1L, 3L -> 1L,
      4L -> 4L, 5L -> 3L, 6L -> 3L))
  }

  test("lpaRounds census tracks the consolidation") {
    val got = Community.lpaRounds(bridged, rounds = 3)
      .as[(Long, Long, Long)].collect().toSeq
    assert(got.head == ((0L, 6L, 1L)))       // all singletons
    assert(got.last == ((3L, 2L, 3L)))       // two triangles
    assert(got.map(_._1) == Seq(0L, 1L, 2L, 3L))
  }

  test("modularity: textbook value on the clean 2-community split") {
    // m=7; each triangle community: intra=3, d_c=7 ->
    // q = 3e6 div 7 - 49e6 div 196 = 428571 - 250000 = 178571
    val rows = Community.modularity(bridged, rounds = 3)
      .as[(Long, Long, Long, Long, Long)].collect().toSeq
    assert(rows == Seq((1L, 3L, 3L, 7L, 178571L),
      (3L, 3L, 3L, 7L, 178571L)))
    assert(rows.map(_._5).sum == 357142L)  // Q ~ 5/14
  }

  test("modularity: single community scores ~0 (everything intra)") {
    // a path 1-2-3: one community after enough rounds? sync LPA on a
    // path oscillates; pin the partition by scoring round-0 labels
    // via a triangle instead: all nodes one community after 2 rounds
    val tri = Seq((1L, 2L), (1L, 3L), (2L, 3L)).toDF("u", "v")
    val rows = Community.modularity(tri, rounds = 2)
      .as[(Long, Long, Long, Long, Long)].collect().toSeq
    // one community holding everything: e_c/m = 1, (d_c/2m)^2 = 1
    assert(rows.map(_._5).sum == 0L)
    assert(rows.size == 1 && rows.head._2 == 3L && rows.head._3 == 3L)
  }

  test("lpa is deterministic across reruns and labels every node") {
    val a = Community.lpa(bridged, rounds = 2).collect().toSeq
    val b = Community.lpa(bridged, rounds = 2).collect().toSeq
    assert(a == b)
    assert(a.size == 6)
  }
}
