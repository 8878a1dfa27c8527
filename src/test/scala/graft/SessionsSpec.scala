package graft

import org.apache.spark.sql.functions._

import graft.ext.Sessions

class SessionsSpec extends SparkSpec {

  private lazy val events = Queries.eventsTable(spark, sf)

  test("session numbers start at 1 and are contiguous per user") {
    val sess = Sessions.sessionize(events, "user_id", "ts", 1800,
      Seq("event_id"))
    val perUser = sess.groupBy("user_id")
      .agg(min("session_num").as("lo"), max("session_num").as("hi"),
        countDistinct("session_num").as("n"))
      .filter(col("lo") =!= 1L || col("hi") =!= col("n"))
    assert(perUser.count() == 0)
  }

  test("no intra-session gap exceeds the threshold; inter-session gaps do") {
    val gap = 1800L
    val sess = Sessions.sessionize(events, "user_id", "ts", gap,
      Seq("event_id"))
    val withPrev = sess.selectExpr("user_id", "session_num",
      "unix_micros(cast(ts as timestamp)) as us",
      "lag(unix_micros(cast(ts as timestamp))) over " +
        "(partition by user_id order by ts, event_id) as prev_us",
      "lag(session_num) over (partition by user_id order by ts, event_id) " +
        "as prev_sess")
      .filter(col("prev_us").isNotNull)
    val intraViolations = withPrev
      .filter(col("session_num") === col("prev_sess") &&
        col("us") - col("prev_us") > gap * 1000000L).count()
    val interViolations = withPrev
      .filter(col("session_num") =!= col("prev_sess") &&
        col("us") - col("prev_us") <= gap * 1000000L).count()
    assert(intraViolations == 0)
    assert(interViolations == 0)
  }

  test("sessionStats aggregates match a recount") {
    val stats = Sessions.sessionStats(events, "user_id", "ts", "value", 1800,
      Seq("event_id"))
    val total = stats.agg(sum("n_events")).head().getLong(0)
    assert(total == events.count())
  }

  test("funnel stages are strictly ordered and null-terminated") {
    val f = Sessions.funnel(events, col("user_id"), col("ts"),
      col("event_type"), Seq("view", "click", "purchase")).collect()
    assert(f.nonEmpty)
    f.foreach { r =>
      val ts = Seq("t1", "t2", "t3").map(c =>
        Option(r.getAs[java.time.LocalDateTime](c)))
      assert(ts.head.isDefined, "entering the funnel requires stage 1")
      // strictly increasing while present
      ts.sliding(2).foreach {
        case Seq(Some(a), Some(b)) => assert(a.isBefore(b))
        case _ =>
      }
      // once a stage is missed, no later stage may be reached
      ts.sliding(2).foreach {
        case Seq(None, later) => assert(later.isEmpty)
        case _ =>
      }
    }
  }

  test("retentionCohort: full attendance at offset zero, none negative") {
    val rc = Sessions.retentionCohort(events, col("user_id"), col("ts"))
      .collect()
    assert(rc.forall(_.getAs[Long]("day_offset") >= 0))
    // every user is active on their own first day, so offset 0 holds
    // the whole cohort
    val firstSeen = events.groupBy("user_id")
      .agg(min(to_date(col("ts"))).as("d")).groupBy("d").count().collect()
      .map(r => r.getDate(0).toString -> r.getLong(1)).toMap
    rc.filter(_.getAs[Long]("day_offset") == 0).foreach { r =>
      assert(r.getAs[Long]("n_users") ==
        firstSeen(r.getDate(0).toString))
    }
  }

  test("transitionCounts: session breaks are not transitions, " +
    "ppm rows are exact and sum to <= 1e6 per prev_type") {
    import spark.implicits._
    // user 1: a->b->a within one session, then a 1h gap, then c->a:
    // transitions a->b, b->a, c->a (the break a->c is NOT counted)
    val t0 = java.sql.Timestamp.valueOf("2024-01-01 10:00:00")
    def ts(sec: Long) = new java.sql.Timestamp(t0.getTime + sec * 1000)
    val ev = Seq(
      (1L, ts(0), 1L, "a"), (2L, ts(10), 1L, "b"), (3L, ts(20), 1L, "a"),
      (4L, ts(3800), 1L, "c"), (5L, ts(3810), 1L, "a"))
      .toDF("event_id", "ts", "user_id", "event_type")
      .withColumn("ts", col("ts").cast("timestamp_ntz"))
    val out = Sessions.transitionCounts(ev, 1800).collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        (r.getAs[Long]("n_trans"), r.getAs[Long]("p_ppm"))).toMap
    assert(out.keySet == Set(("a", "b"), ("b", "a"), ("c", "a")))
    assert(out(("a", "b")) == ((1L, 1000000L)))
    assert(out(("b", "a")) == ((1L, 1000000L)))
    assert(out(("c", "a")) == ((1L, 1000000L)))
    // fixture-wide: per-prev ppm mass can only round DOWN from 1e6
    val mass = Sessions.transitionCounts(events, 1800)
      .groupBy("prev_type").agg(sum("p_ppm").as("mass"))
      .collect().map(_.getAs[Long]("mass"))
    assert(mass.nonEmpty)
    mass.foreach(m => assert(m <= 1000000L && m > 999000L))
  }

  test("cohortLtv: hand-checked cumulative curve and per-user division") {
    import spark.implicits._
    // user 1, 2 acquired in 2024-01; user 3 in 2024-02
    val orders = Seq(
      (1L, "2024-01-05", 10.00), (1L, "2024-02-10", 20.00),
      (2L, "2024-01-20", 5.00),
      (3L, "2024-02-02", 7.00)
    ).toDF("cust", "d", "amt").select(col("cust"),
      to_date(col("d")).as("d"), col("amt"))
    val got = Sessions.cohortLtv(orders, col("cust"), col("d"), col("amt"))
      .as[(Long, Long, Long, Long, Long, Long)].collect().toSeq
    val jan = 2024 * 12 + 0
    val feb = jan + 1
    assert(got == Seq(
      // cohort Jan: offset 0 -> both users, 1500 cents, ltv 750
      (jan, 0L, 2L, 1500L, 1500L, 750L),
      // offset 1 -> user 1 only, 2000 cents, cum 3500, ltv 1750
      (jan, 1L, 1L, 2000L, 3500L, 1750L),
      (feb, 0L, 1L, 700L, 700L, 700L)))
  }

  test("eventTrigrams: paths follow per-user time order and never " +
      "cross users") {
    import spark.implicits._
    def ts(s: String) = java.sql.Timestamp.valueOf(s)
    val ev = Seq(
      (1L, "view", ts("2024-01-01 10:00:00"), 1L),
      (1L, "click", ts("2024-01-01 10:00:10"), 2L),
      (1L, "purchase", ts("2024-01-01 10:00:20"), 3L),
      (1L, "view", ts("2024-01-01 10:00:30"), 4L),
      // user 2 contributes the same leading pair but then diverges;
      // a cross-user path (view,click,purchase)x2 would be wrong
      (2L, "view", ts("2024-01-01 11:00:00"), 5L),
      (2L, "click", ts("2024-01-01 11:00:10"), 6L)
    ).toDF("user_id", "event_type", "ts", "event_id")
    val got = Sessions.eventTrigrams(ev, 10)
      .as[(String, String, String, Long)].collect().toSeq
    assert(got.toSet == Set(
      ("view", "click", "purchase", 1L),
      ("click", "purchase", "view", 1L)))
  }

  test("intervalUnion: overlapping spans merge, disjoint ones don't, " +
      "coverage never exceeds the naive duration sum") {
    import spark.implicits._
    def ts(s: String) = java.sql.Timestamp.valueOf(s)
    val ev = Seq(
      // user 1: events at 0s and 100s, pad 300 -> one merged span
      // [0, 400): coverage 400; then a far event -> its own 300
      (1L, ts("2024-01-01 10:00:00"), 1L),
      (1L, ts("2024-01-01 10:01:40"), 2L),
      (1L, ts("2024-01-01 12:00:00"), 3L),
      // user 2: touching spans (gap exactly = pad) merge
      (2L, ts("2024-01-01 10:00:00"), 4L),
      (2L, ts("2024-01-01 10:05:00"), 5L)
    ).toDF("user_id", "ts", "event_id")
    val got = Sessions.intervalUnion(ev, 300L)
      .as[(Long, Long, Long)].collect().toSeq
    assert(got == Seq((1L, 2L, 700L), (2L, 1L, 600L)))
  }

  test("cohortLtvIncremental equals the full recompute, including a " +
      "retro-dated delta that moves a user's cohort") {
    import spark.implicits._
    def mk(rows: Seq[(Long, String, Double)]) =
      rows.toDF("cust", "dt", "amt")
        .select(col("cust"), to_date(col("dt")).as("dt"), col("amt"))
    val base = mk(Seq(
      (1L, "2024-02-05", 10.00), (1L, "2024-03-01", 20.00),
      (2L, "2024-02-20", 5.00),
      (3L, "2024-01-10", 8.00)))
    // delta: new user 4, more volume for 2, and a RETRO order that
    // moves user 1's cohort from Feb to Jan
    val delta = mk(Seq(
      (4L, "2024-04-01", 7.00),
      (2L, "2024-04-15", 6.00),
      (1L, "2024-01-02", 3.00)))
    val inc = Sessions.cohortLtvIncremental(base, delta, col("cust"),
      col("dt"), col("amt"))
    val full = Sessions.cohortLtv(base.unionByName(delta), col("cust"),
      col("dt"), col("amt"))
    assert(inc.exceptAll(full).isEmpty && full.exceptAll(inc).isEmpty,
      "incremental drifted from the full recompute")
    // and the untouched-cohort carry-forward path is exercised: a
    // delta touching nobody leaves everything to the base-only leg
    val noTouch = mk(Seq((9L, "2024-06-01", 1.00)))
    val inc2 = Sessions.cohortLtvIncremental(base, noTouch, col("cust"),
      col("dt"), col("amt"))
    val full2 = Sessions.cohortLtv(base.unionByName(noTouch), col("cust"),
      col("dt"), col("amt"))
    assert(inc2.exceptAll(full2).isEmpty && full2.exceptAll(inc2).isEmpty)
  }

  test("eventDedup: chained bursts collapse to the first event and " +
      "count what they absorbed") {
    import spark.implicits._
    def ts(s: String) = java.sql.Timestamp.valueOf(s)
    val ev = Seq(
      // user 1 click burst: 0s, 40s, 80s chain within 60s gaps ->
      // ONE burst (chained-gap), keep the first, absorb 3
      (1L, "click", ts("2024-01-01 10:00:00"), 1L),
      (1L, "click", ts("2024-01-01 10:00:40"), 2L),
      (1L, "click", ts("2024-01-01 10:01:20"), 3L),
      // then a 61s gap -> new burst
      (1L, "click", ts("2024-01-01 10:02:21"), 4L),
      // different type at the same instant is its own stream
      (1L, "view", ts("2024-01-01 10:00:00"), 5L),
      // user 2: singleton
      (2L, "click", ts("2024-01-01 10:00:00"), 6L)
    ).toDF("user_id", "event_type", "ts", "event_id")
    val got = Sessions.eventDedup(ev, 60L)
      .select("event_id", "n_collapsed")
      .as[(Long, Long)].collect().toSeq
    assert(got == Seq((1L, 3L), (4L, 1L), (5L, 1L), (6L, 1L)))
  }
}
