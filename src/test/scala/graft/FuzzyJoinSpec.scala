package graft

import org.apache.spark.sql.functions._
import graft.ext.FuzzyJoin

/** Edit-distance join: the pigeonhole blocking must be LOSSLESS —
  * the joined pair set equals the brute-force pair set exactly. */
class FuzzyJoinSpec extends SparkSpec {
  import spark.implicits._

  private val corpus = Seq(
    (1L, "kitten"),
    (2L, "sitting"),          // ed(kitten, sitting) = 3
    (3L, "kitten"),           // exact dup of 1
    (4L, "mitten"),           // ed(kitten, mitten) = 1
    (5L, "flamingo"),
    (6L, "flamingos"),        // ed = 1 (insert)
    (7L, "ab"),               // short bucket (len <= k)
    (8L, "abc"),              // short bucket
    (9L, "abcdef"),           // partner of shorts within band? |6-3|=3 ok
    (10L, "zzzzzzzzzzzzzzzzzzzz"),
    (11L, "entirely different text here"),
    (12L, "entirely different text hero") // ed = 1
  ).toDF("doc_id", "text")

  test("editNeardup finds known pairs with exact distances") {
    val got = FuzzyJoin.editNeardup(corpus, col("doc_id"), col("text"), 40, 3)
      .as[(Long, Long, Long)].collect().toSet
    assert(got.contains((1L, 2L, 3L)))   // kitten/sitting
    assert(got.contains((1L, 3L, 0L)))   // exact dup
    assert(got.contains((1L, 4L, 1L)))   // kitten/mitten
    assert(got.contains((5L, 6L, 1L)))
    assert(got.contains((11L, 12L, 1L)))
    assert(!got.exists { case (a, b, _) => a == 10L || b == 10L })
  }

  test("blocking is lossless: joined pairs == brute-force pairs") {
    val fast = FuzzyJoin.editNeardup(corpus, col("doc_id"), col("text"), 40, 3)
      .as[(Long, Long, Long)].collect().toSet
    val brute = FuzzyJoin.editNeardupBrute(corpus, col("doc_id"), col("text"), 40, 3)
      .as[(Long, Long, Long)].collect().toSet
    assert(fast == brute)
  }

  test("short bucket covers len <= k strings") {
    val got = FuzzyJoin.editNeardup(corpus, col("doc_id"), col("text"), 40, 3)
      .as[(Long, Long, Long)].collect().toSet
    assert(got.contains((7L, 8L, 1L)))   // ab/abc
    // abc -> abcdef is 3 inserts: short (len 3) x partner (len 6)
    assert(got.contains((8L, 9L, 3L)))
  }

  test("incremental: exactly the cross pairs, lossless vs brute") {
    val idx = corpus.filter(col("doc_id") <= 6)
    val batch = corpus.filter(col("doc_id") > 6)
    val got = FuzzyJoin.editNeardupIncremental(idx, batch,
        col("doc_id"), col("text"), 40, 3)
      .as[(Long, Long, Long)].collect().toSet
    // brute cross pairs: full brute restricted to idx x batch
    val brute = FuzzyJoin.editNeardupBrute(corpus, col("doc_id"),
        col("text"), 40, 3)
      .as[(Long, Long, Long)].collect().toSet
      .filter(p => p._1 <= 6 && p._2 > 6)
    assert(got == brute)
    // the short-cross pair (ab=7 in batch? no: 7,8 in batch) —
    // idx-side "flamingo"(5)/"flamingos"(6) never pair intra-index
    assert(got.forall { case (a, b, _) => a <= 6 && b > 6 })
  }

  test("editComponents: the kitten chain resolves to one canonical") {
    val got = FuzzyJoin.editComponents(corpus, col("doc_id"),
        col("text"), 40, 3)
      .as[(Long, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    // kitten(1)/sitting(2)/kitten(3)/mitten(4) chain -> component 1
    assert(got(1L) == ((1L, 1L)))
    assert(got(2L) == ((1L, 0L)))
    assert(got(3L) == ((1L, 0L)))
    assert(got(4L) == ((1L, 0L)))
    // flamingo family -> component 5
    assert(got(5L) == ((5L, 1L)))
    assert(got(6L) == ((5L, 0L)))
    // singleton stays self-labeled canonical
    assert(got(10L) == ((10L, 1L)))
    assert(got.size == corpus.count())
  }

  test("lossless on the sf0.001 documents fixture") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    val fast = FuzzyJoin.editNeardup(docs, col("doc_id"), col("text"), 40, 3)
      .as[(Long, Long, Long)].collect().toSet
    val brute = FuzzyJoin.editNeardupBrute(docs, col("doc_id"), col("text"), 40, 3)
      .as[(Long, Long, Long)].collect().toSet
    assert(fast == brute)
    assert(fast.nonEmpty) // the fixture's near-dup docs produce pairs
  }

  test("bandSelfJoinAgg: bucketed equi-join == brute theta join, " +
      "negatives and exact-delta gaps included") {
    // deterministic pseudo-random values straddling zero, plus
    // planted exact-boundary pairs: |x| == delta (kept) and
    // delta+1 (dropped), and a cross-zero pair (-3, 2)
    val rng = new scala.util.Random(42)
    val rand = (1 to 300).map(i =>
      (i.toLong, if (i % 2 == 0) "g1" else "g2",
        (rng.nextInt(4001) - 2000).toLong))
    val planted = Seq(
      (1001L, "g1", -3L), (1002L, "g1", 2L),    // cross-zero, gap 5
      (1003L, "g2", 100L), (1004L, "g2", 150L), // gap == delta: kept
      (1005L, "g2", 201L))                      // 1004->1005 gap 51 > delta
    val df = (rand ++ planted).toDF("k", "g", "x")
    val fast = FuzzyJoin.bandSelfJoinAgg(df, col("g"), col("k"),
      col("x"), 50L).as[(String, Long, Long, Long, Long)].collect().toSeq
    val brute = FuzzyJoin.bandSelfJoinAggBrute(df, col("g"), col("k"),
      col("x"), 50L).as[(String, Long, Long, Long, Long)].collect().toSeq
    assert(fast == brute)
    assert(fast.nonEmpty && fast.map(_._2).sum > 10)
  }

  test("band2dPairs: 3x3 grid replication is lossless vs the brute " +
      "theta join, including both-dims-at-delta corners") {
    val rng = new scala.util.Random(11)
    val rand = (1 to 200).map(i => (i.toLong, (i % 3).toString,
      (rng.nextInt(201) - 100).toLong, (rng.nextInt(201) - 100).toLong))
    val planted = Seq(
      // exactly at delta on both axes: kept
      (901L, "0", 500L, 500L), (902L, "0", 510L, 507L),
      // inside x, one past delta on y: dropped
      (903L, "1", 500L, 500L), (904L, "1", 505L, 508L))
    val df = (rand ++ planted).toDF("k", "g", "x", "y")
    val fast = FuzzyJoin.band2dPairs(df, col("g"), col("k"),
        col("x"), col("y"), 10L, 7L)
      .as[(String, Long, Long, Long, Long)].collect().toSeq
    val a = df.select(col("g"), col("k").as("ka"), col("x").as("xa"),
      col("y").as("ya"))
    val b = df.select(col("g").as("gb"), col("k").as("kb"),
      col("x").as("xb"), col("y").as("yb"))
    val brute = a.join(b, col("g") === col("gb") &&
        col("ka") < col("kb") &&
        abs(col("xa") - col("xb")) <= 10L &&
        abs(col("ya") - col("yb")) <= 7L)
      .select(col("g"), col("ka"), col("kb"),
        abs(col("xa") - col("xb")).cast("long"),
        abs(col("ya") - col("yb")).cast("long"))
      .orderBy("g", "ka", "kb")
      .as[(String, Long, Long, Long, Long)].collect().toSeq
    assert(fast == brute)
    assert(fast.contains(("0", 901L, 902L, 10L, 7L)))
    assert(!fast.exists(p => p._2 == 903L && p._3 == 904L))
    assert(fast.size > 5)
  }

  test("bandSelfJoinAgg: hand-checked pairs on a tiny group") {
    // values 0, 40, 100: pairs within delta=60 are (0,40) and
    // (40,100) — (0,100) is out; gaps 40 and 60
    val df = Seq((1L, "g", 0L), (2L, "g", 40L), (3L, "g", 100L))
      .toDF("k", "g", "x")
    val got = FuzzyJoin.bandSelfJoinAgg(df, col("g"), col("k"),
      col("x"), 60L).as[(String, Long, Long, Long, Long)].collect().toSeq
    assert(got == Seq(("g", 2L, 40L, 60L, 100L)))
  }
}
