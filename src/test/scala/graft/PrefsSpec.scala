package graft

import org.apache.spark.sql.functions._
import graft.ext.Prefs

/** Bradley–Terry: hand-checked match construction + an exact
  * fixed-point brute twin of the MM chain (the repo's spec-only
  * reference pattern: same arithmetic, collected to the driver). */
class PrefsSpec extends SparkSpec {
  import spark.implicits._

  private def events(rows: Seq[(Long, Long, Double)]) =
    rows.toDF("event_id", "user_id", "value")

  test("matchesFrom pairs (2k, 2k+1), higher value wins, tie to low id") {
    val e = events(Seq(
      (0L, 3L, 5.0), (1L, 7L, 2.0),   // 3 vs 7 -> 3 wins
      (2L, 7L, 1.0), (3L, 3L, 9.0),   // 7 vs 3 -> 3 wins
      (4L, 2L, 4.0), (5L, 6L, 4.0),   // tie -> 2 wins
      (6L, 5L, 1.0), (7L, 5L, 2.0),   // same player -> dropped
      (8L, 1L, 1.0)))                 // unpaired -> dropped
    val got = Prefs.matchesFrom(e, 16)
      .as[(Long, Long, Long)].collect().sorted.toSeq
    assert(got == Seq((2L, 6L, 2L), (3L, 7L, 3L), (3L, 7L, 3L)))
  }

  test("pairStats aggregates wins of the low-id side") {
    val e = events(Seq(
      (0L, 1L, 9.0), (1L, 2L, 1.0),   // 1 beats 2
      (2L, 1L, 1.0), (3L, 2L, 9.0),   // 2 beats 1
      (4L, 1L, 9.0), (5L, 2L, 1.0),   // 1 beats 2
      (6L, 2L, 9.0), (7L, 3L, 1.0)))  // 2 beats 3
    val got = Prefs.pairStats(Prefs.matchesFrom(e, 16))
      .as[(Long, Long, Long, Long)].collect().sorted.toSeq
    assert(got == Seq((1L, 2L, 3L, 2L), (2L, 3L, 1L, 1L)))
  }

  /** Driver-side twin of [[Prefs.ratingChain]]'s integer MM update —
    * same micro-unit arithmetic, Long division truncation and all. */
  private def bruteMm(pairs: Seq[(Long, Long, Long, Long)],
                      iters: Int): Map[Long, Long] = {
    val S = Prefs.S; val S2 = S * S
    val sym = pairs.flatMap { case (lo, hi, n, wLo) =>
      Seq((lo, hi, n + 2, wLo + 1), (hi, lo, n + 2, n - wLo + 1))
    }
    var p = sym.map(_._1).distinct.map(_ -> S).toMap
    for (_ <- 1 to iters) {
      val byPlayer = sym.groupBy(_._1)
      p = byPlayer.map { case (a, rows) =>
        val ws = rows.map(_._4).sum
        val denom = rows.map { case (_, b, n, _) => n * S2 / (p(a) + p(b)) }.sum
        a -> ws * S2 / denom
      }
    }
    p
  }

  test("btRating equals the driver-side fixed-point MM twin exactly") {
    // round-robin with a clear strength order 1 > 2 > 3 (player 1
    // always wins, 2 beats 3), plus a winless player 4
    val e = events(Seq(
      (0L, 1L, 9.0), (1L, 2L, 1.0),
      (2L, 1L, 9.0), (3L, 3L, 1.0),
      (4L, 2L, 9.0), (5L, 3L, 1.0),
      (6L, 1L, 9.0), (7L, 4L, 1.0),
      (8L, 2L, 9.0), (9L, 4L, 1.0)))
    val pairs = Prefs.pairStats(Prefs.matchesFrom(e, 16))
    val pairRows = pairs.as[(Long, Long, Long, Long)].collect().toSeq
    val pK = bruteMm(pairRows, iters = 4)
    val sp = pK.values.sum
    val expected = pK.map { case (pl, v) => pl -> v * Prefs.S / sp }
    val got = Prefs.btRating(pairs, iters = 4)
      .as[(Long, Long, Long, Long)].collect()
      .map(r => r._1 -> r._2).toMap
    assert(got == expected)
    // strength order survives normalization; the winless player is
    // rated (smoothing keeps the chain total) and rated last
    assert(got(1L) > got(2L) && got(2L) > got(3L))
    assert(got.values.forall(_ > 0L))
    assert(got(4L) == got.values.min)
  }

  test("btConvergence: deltas shrink and the scale stays pinned") {
    val e = events((0L until 400L).map(i =>
      (i, i * 7 % 13, (i * 31 % 97).toDouble)))
    val pairs = Prefs.pairStats(Prefs.matchesFrom(e, 8))
    val rows = Prefs.btConvergence(pairs, iters = 4)
      .as[(Long, Long, Long)].collect().toSeq
    assert(rows.map(_._1) == Seq(1L, 2L, 3L, 4L))
    assert(rows.last._2 < rows.head._2)  // MM contraction
    // sum_p drift stays within 1% of nPlayers * S across rounds
    val n = pairs.select(col("p_lo")).unionAll(pairs.select(col("p_hi")))
      .distinct().count()
    rows.foreach { case (_, _, sp) =>
      assert(math.abs(sp - n * Prefs.S) < n * Prefs.S / 100) }
  }

  test("btRatingByDay: each day's keyed solve equals btRating on " +
      "that day's slice alone (per-window independence)") {
    // two days with DIFFERENT outcomes for the same pair, plus a
    // player that exists only on day 2 — cross-day leakage in any
    // join would corrupt at least one slice
    val e = spark.createDataFrame(Seq(
      (0L, 1L, 9.0, "2024-01-01 10:00:00"),
      (1L, 2L, 1.0, "2024-01-01 10:05:00"),
      (2L, 1L, 9.0, "2024-01-01 11:00:00"),
      (3L, 2L, 1.0, "2024-01-01 11:05:00"),
      (4L, 2L, 9.0, "2024-01-02 10:00:00"),
      (5L, 1L, 1.0, "2024-01-02 10:05:00"),
      (6L, 2L, 9.0, "2024-01-02 11:00:00"),
      (7L, 3L, 1.0, "2024-01-02 11:05:00")))
      .toDF("event_id", "user_id", "value", "tss")
      .withColumn("ts", col("tss").cast("timestamp_ntz")).drop("tss")
    val dated = Prefs.datedMatchesFrom(e, 16)
    val keyed = Prefs.btRatingByDay(Prefs.pairStatsByDay(dated), iters = 3)
      .as[(java.sql.Date, Long, Long, Long, Long)].collect()
      .groupBy(_._1.toString)
      .map { case (d, rows) =>
        d -> rows.map(r => (r._2, r._3, r._4, r._5)).toSeq.sorted }
    val sliced = Seq("2024-01-01", "2024-01-02").map { day =>
      val m = dated.filter(col("match_day") === lit(day))
        .select("p_lo", "p_hi", "winner")
      day -> Prefs.btRating(Prefs.pairStats(m), iters = 3)
        .as[(Long, Long, Long, Long)].collect().toSeq.sorted
    }.toMap
    assert(keyed.keySet == sliced.keySet)
    keyed.foreach { case (d, rows) => assert(rows == sliced(d),
      s"day $d keyed != sliced") }
    // day 1: player 1 dominant; day 2: player 2 dominant — the keyed
    // solve must show the flip, which cross-day leakage would smear
    val byDay = keyed.map { case (d, rows) =>
      d -> rows.map(r => r._1 -> r._2).toMap }
    assert(byDay("2024-01-01")(1L) > byDay("2024-01-01")(2L))
    assert(byDay("2024-01-02")(2L) > byDay("2024-01-02")(1L))
  }

  test("wins/n_matches in the leaderboard are the raw (unsmoothed) stats") {
    val e = events(Seq(
      (0L, 1L, 9.0), (1L, 2L, 1.0),
      (2L, 1L, 9.0), (3L, 2L, 1.0),
      (4L, 2L, 9.0), (5L, 3L, 1.0)))
    val got = Prefs.btRating(
        Prefs.pairStats(Prefs.matchesFrom(e, 16)), iters = 2)
      .as[(Long, Long, Long, Long)].collect()
      .map(r => r._1 -> ((r._3, r._4))).toMap
    assert(got(1L) == ((2L, 2L)))  // 2 wins in 2 matches
    assert(got(2L) == ((1L, 3L)))  // 1 win (over 3) in 3 matches
    assert(got(3L) == ((0L, 1L)))
  }
}
