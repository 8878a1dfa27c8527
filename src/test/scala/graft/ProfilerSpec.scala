package graft

import org.apache.spark.sql.functions._

import graft.ext.{Profiler, Sessions}

class ProfilerSpec extends SparkSpec {

  test("profileStats counts nulls, exact distincts, rows per column") {
    import spark.implicits._
    val df = Seq(
      (Some(1), Some("a"), Some(1.5)),
      (Some(1), None, Some(1.5)),
      (Some(2), Some("b"), None),
      (None, Some("a"), Some(2.5))
    ).toDF("i", "s", "d")
    val got = Profiler.profileStats(df, Seq("i", "s", "d"))
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    assert(got("i") == (1L, 2L, 4L))
    assert(got("s") == (1L, 2L, 4L))
    assert(got("d") == (1L, 2L, 4L))
  }

  test("profileStats distinguishes equal renderings across columns") {
    import spark.implicits._
    // "1" as string in one column, 1 as int in another: counted
    // independently per column, no cross-column interference
    val df = Seq((1, "1"), (2, "1"), (1, "2")).toDF("i", "s")
    val got = Profiler.profileStats(df, Seq("i", "s"))
      .collect().map(r => r.getString(0) -> r.getLong(2)).toMap
    assert(got == Map("i" -> 2L, "s" -> 2L))
  }

  test("paretoAbc bands match a driver-side recomputation") {
    import spark.implicits._
    // revenues engineered across many partitions: part k has k+1
    // line items of price 10.00 each
    val li = (0 until 50).flatMap(k => Seq.fill(k + 1)((k.toLong, 10.0)))
      .toDF("l_partkey", "l_extendedprice").repartition(7)
    val got = Profiler.paretoAbc(li, col("l_partkey"), col("l_extendedprice"))
      .collect().map(r =>
        r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getString(3))).toMap
    val revs = (0 until 50).map(k => k.toLong -> (k + 1) * 1000L)
    val totalC = revs.map(_._2).sum
    var cum = 0L
    val want = revs.sortBy { case (k, c) => (-c, k) }.map { case (k, c) =>
      cum += c
      val ppm = cum * 1000000L / totalC
      k -> (c, ppm, if (ppm <= 800000) "A" else if (ppm <= 950000) "B" else "C")
    }.toMap
    assert(got == want)
    assert(got.values.map(_._3).toSet == Set("A", "B", "C"))
  }

  private def ev(day: Int, n: Int, typ: String = "t"): Seq[(String, java.sql.Timestamp)] =
    Seq.fill(n)((typ,
      java.sql.Timestamp.valueOf(f"2024-01-$day%02d 12:00:00")))

  test("zscoreOutliers flags a spike over a flat baseline, never the flat run") {
    import spark.implicits._
    // 9 days at 10 events, then day 10 spikes to 30
    val events = ((1 to 9).flatMap(d => ev(d, 10)) ++ ev(10, 30))
      .toDF("event_type", "ts")
    val got = Sessions.zscoreOutliers(events, col("event_type"), col("ts"))
      .collect().map(r => r.getDate(1).toString ->
        (r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    assert(got("2024-01-10") == (30L, 7L, 1L), "spike day must flag")
    (4 to 9).foreach { d =>
      assert(got(f"2024-01-$d%02d")._3 == 0L, s"flat day $d must not flag")
    }
  }

  test("zscoreOutliers never flags with under 3 baseline observations") {
    import spark.implicits._
    val events = (ev(1, 5) ++ ev(2, 100) ++ ev(3, 500))
      .toDF("event_type", "ts")
    val got = Sessions.zscoreOutliers(events, col("event_type"), col("ts"))
      .collect()
    assert(got.forall(_.getLong(4) == 0L))
    assert(got.map(_.getLong(3)).sorted.toSeq == Seq(0L, 1L, 2L))
  }

  test("zscoreOutliers baselines are per event type") {
    import spark.implicits._
    // type a flat at 10; type b flat at 10 but spikes on day 8;
    // a's day-8 must not flag off b's spike
    val events = ((1 to 8).flatMap(d => ev(d, 10, "a")) ++
      (1 to 7).flatMap(d => ev(d, 10, "b")) ++ ev(8, 40, "b"))
      .toDF("event_type", "ts")
    val got = Sessions.zscoreOutliers(events, col("event_type"), col("ts"))
      .collect().map(r => (r.getString(0), r.getDate(1).toString) ->
        r.getLong(4)).toMap
    assert(got(("b", "2024-01-08")) == 1L)
    assert(got(("a", "2024-01-08")) == 0L)
  }

  test("driftCheck: identical halves have zero drift; a shift shows") {
    import spark.implicits._
    import java.sql.Timestamp
    def li(cents: Long, ok: Long, ship: String) =
      (cents / 100.0, ok, 1L, Timestamp.valueOf(s"$ship 00:00:00"))
    // ref: prices 100..1000 (cents 10000..100000); cmp identical
    val same = (1 to 100).map(i => li(i * 1000L, i, "1998-01-01")) ++
      (1 to 100).map(i => li(i * 1000L, 1000L + i, "1999-01-01"))
    val df0 = same.toDF("l_extendedprice", "l_orderkey", "l_linenumber",
      "l_shipdate")
    val zero = Profiler.driftCheck(df0, "1998-06-01")
      .agg(sum("drift_ppm")).first().getLong(0)
    assert(zero == 0L)

    // cmp shifted entirely above ref's max -> all rows in bin 10
    val shifted = (1 to 100).map(i => li(i * 1000L, i, "1998-01-01")) ++
      (1 to 100).map(i => li(500000L + i * 1000L, 1000L + i, "1999-01-01"))
    val df1 = shifted.toDF("l_extendedprice", "l_orderkey", "l_linenumber",
      "l_shipdate")
    val got = Profiler.driftCheck(df1, "1998-06-01")
      .select("bin", "n_ref", "n_cmp", "drift_ppm")
      .as[(Long, Long, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    assert(got.size == 10)
    (1L to 9L).foreach { b =>
      assert(got(b) == ((10L, 0L, 100000L)), s"bin $b: ${got(b)}")
    }
    assert(got(10L) == ((10L, 100L, 900000L)))
  }

  test("boxplotStats: hand-checked quartiles, fences, outliers") {
    import spark.implicits._
    // group a: 1..8 plus outlier 100.
    // sorted: 1,2,3,4,5,6,7,8,100 (n=9): q1 at pos 2 -> 3, med 5, q3 7.
    // fences: 3-1.5*4=-3, 7+1.5*4=13 -> only 100 is out.
    val df = ((1L to 8L) :+ 100L).map(("a", _)).toDF("g", "v")
    val got = Profiler.boxplotStats(df, col("g"), col("v"))
      .as[(String, Long, Long, Long, Long, Long, Long)].collect().head
    assert(got == (("a", 9L, 12L, 20L, 28L, 16L, 1L)))
  }

  test("boxplotStats: interpolated quartiles are exact quarters") {
    import spark.implicits._
    // n=4: 10,20,30,40 -> q1 pos 0.75 -> 17.5 (x4=70), med 25 (x4=100),
    // q3 pos 2.25 -> 32.5 (x4=130)
    val df = Seq(10L, 20L, 30L, 40L).map(("a", _)).toDF("g", "v")
    val got = Profiler.boxplotStats(df, col("g"), col("v"))
      .as[(String, Long, Long, Long, Long, Long, Long)].collect().head
    assert(got == (("a", 4L, 70L, 100L, 130L, 60L, 0L)))
  }

  test("equiDepthHist: depths differ by at most 1 and cover all rows") {
    import spark.implicits._
    // skewed data: equi-width would put 90% in one bucket
    val df = ((1L to 90L).map(_ => 5L) ++ (1L to 10L).map(i => i * 1000L))
      .zipWithIndex.map { case (v, i) => (v, i.toLong) }.toDF("v", "id")
    val got = Profiler.equiDepthHist(df, col("v"), Seq(col("id")), 10)
      .orderBy("bin").as[(Long, Long, Long, Long)].collect()
    assert(got.length == 10)
    assert(got.map(_._4).sum == 100L)
    assert(got.map(_._4).forall(n => n == 10L))  // 100 rows / 10 bins
    // bins are ordered and non-overlapping in value space
    got.sliding(2).foreach { case Array(a, b) => assert(a._3 <= b._2) }
  }

  test("spearmanCorr: perfect monotone -> 1e6, reversed -> -1e6") {
    import spark.implicits._
    val up = (1L to 50L).map(i => (i, i * 7L, i)).toDF("a", "b", "id")
    val gotUp = Profiler.spearmanCorr(up, col("a"), col("b"),
      Seq(col("id"))).first()
    assert(gotUp.getLong(2) == 1000000L)
    val down = (1L to 50L).map(i => (i, -i * 3L, i)).toDF("a", "b", "id")
    val gotDown = Profiler.spearmanCorr(down, col("a"), col("b"),
      Seq(col("id"))).first()
    // exact anti-monotone: rho = -1 exactly
    assert(gotDown.getLong(2) == -1000000L)
  }

  test("spearmanCorr: duplicate caller keys do not multiply rows") {
    import spark.implicits._
    import org.apache.spark.sql.expressions.Window
    // caller key 'id' repeats (the lineitem fixture's
    // (orderkey, linenumber) is not unique either) — n_rows must stay
    // n and Σd² must equal the single-window ground truth
    val df = Seq((1L, 10L, 1L), (1L, 10L, 1L), (2L, 5L, 1L),
      (3L, 30L, 2L), (4L, 1L, 2L), (5L, 50L, 2L)).toDF("a", "b", "id")
    val got = Profiler.spearmanCorr(df, col("a"), col("b"),
      Seq(col("id"))).first()
    assert(got.getLong(0) == 6L, s"row count inflated: $got")
    // ground truth via unpartitioned windows + canonical occ pairing
    val ra = df.withColumn("ra", row_number().over(
      Window.orderBy(col("a"), col("b"), col("id"))))
    val rb = df.withColumn("rb", row_number().over(
      Window.orderBy(col("b"), col("a"), col("id"))))
    val occ = Window.partitionBy("a", "b", "id")
    val truth = ra.withColumn("occ", row_number().over(occ.orderBy("ra")))
      .join(rb.withColumn("occ", row_number().over(occ.orderBy("rb"))),
        Seq("a", "b", "id", "occ"))
      .selectExpr("sum((ra - rb) * (ra - rb)) as sd2").first().getLong(0)
    assert(got.getLong(1) == truth)
  }

  test("growthRates: hand-checked MoM, negative growth, gap months") {
    import spark.implicits._
    import java.sql.Timestamp
    def o(date: String, amt: Double) =
      (Timestamp.valueOf(s"$date 00:00:00"), amt)
    // Jan 100, Feb 150 (+50%), Mar 75 (-50%), May 75 (gap -> null MoM)
    val df = Seq(o("2024-01-15", 100.0), o("2024-02-15", 150.0),
      o("2024-03-15", 75.0), o("2024-05-15", 75.0))
      .toDF("o_orderdate", "o_totalprice")
    val got = Profiler.growthRates(df, col("o_orderdate"),
        col("o_totalprice")).orderBy("year", "month")
      .select("month", "mom_ppm")
      .as[(Long, Option[Long])].collect().toSeq
    assert(got == Seq((1L, None), (2L, Some(500000L)),
      (3L, Some(-500000L)), (5L, None)))
  }

  test("rfmSegments: quintile scores are balanced and monotone") {
    val orders = spark.read.parquet(s"$sf/orders.parquet")
    val got = Profiler.rfmSegments(orders, col("o_custkey"),
      col("o_orderdate"), col("o_totalprice"))
    got.cache()
    // each score dimension splits customers into 5 near-equal bands
    Seq("r_score", "f_score", "m_score").foreach { c =>
      val sizes = got.groupBy(c).count().collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(sizes.keySet == Set(1L, 2L, 3L, 4L, 5L), s"$c: $sizes")
      assert(sizes.values.max - sizes.values.min <= 1, s"$c: $sizes")
    }
    // monotone: a higher m_score band never has lower max spend
    val bands = got.groupBy("m_score")
      .agg(min("spend_cents").as("lo"), max("spend_cents").as("hi"))
      .orderBy("m_score").collect()
    bands.sliding(2).foreach { case Array(a, b) =>
      assert(a.getLong(2) <= b.getLong(1),
        s"m bands overlap: $a vs $b")
    }
    got.unpersist()
  }

  test("newVsReturning: every customer is new exactly once") {
    val orders = spark.read.parquet(s"$sf/orders.parquet")
    val got = Profiler.newVsReturning(orders, col("o_custkey"),
      col("o_orderdate"))
    val totNew = got.agg(sum("n_new")).first().getLong(0)
    val nCust = orders.select("o_custkey").distinct().count()
    assert(totNew == nCust)
    // monthly actives = distinct (customer, month) pairs
    val actives = orders.select(col("o_custkey"),
        (year(to_date(col("o_orderdate"))) * 12 +
          month(to_date(col("o_orderdate")))).as("m"))
      .distinct().count()
    val totAll = got.agg(sum("n_new") + sum("n_returning")).first()
      .getLong(0)
    assert(totAll == actives)
  }

  test("volumeAutocorr bounds and degenerate perfect case") {
    import spark.implicits._
    import java.sql.Timestamp
    // weekly-periodic volumes: day d has d%7+1 events -> lag-7 rho = 1
    val rows = (0 until 28).flatMap { d =>
      (0 to d % 7).map(i => (d * 100L + i,
        Timestamp.valueOf(f"2024-01-${d + 1}%02d 10:00:00"), 1L, "a", 1.0,
        "{}"))
    }.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val rho = Profiler.volumeAutocorr(rows, col("ts"), 7)
      .first().getLong(2)
    assert(rho == 1000000L)
  }

  test("calendarFill: spine is dense, gaps zero-filled, totals conserved") {
    import spark.implicits._
    import java.sql.Timestamp
    val df = Seq(("2024-01-01", 10.0), ("2024-01-01", 5.0),
      ("2024-01-04", 7.0))
      .map { case (d, a) => (Timestamp.valueOf(s"$d 00:00:00"), a) }
      .toDF("o_orderdate", "o_totalprice")
    val got = Profiler.calendarFill(df, col("o_orderdate"),
        col("o_totalprice")).orderBy("date_value")
      .as[(java.sql.Date, Long, Long, Long)].collect().toSeq
    assert(got.map(_._1.toString) ==
      Seq("2024-01-01", "2024-01-02", "2024-01-03", "2024-01-04"))
    assert(got.map(_._2) == Seq(2L, 0L, 0L, 1L))
    assert(got.map(_._3) == Seq(1500L, 0L, 0L, 700L))
    assert(got.map(_._4) == Seq(0L, 1L, 1L, 0L))
  }

  test("sampleEstimate: estimates scale the sample, errors are sane") {
    val li = spark.read.parquet(s"$sf/lineitem.parquet")
    val r = Profiler.sampleEstimate(li, 64).first()
    val (nTrue, revTrue, nSamp) = (r.getLong(0), r.getLong(1), r.getLong(2))
    assert(r.getLong(3) == nSamp * 64)           // n_est
    assert(nSamp > 0 && nSamp < nTrue)
    assert(revTrue > 0)
    // ~1.5% sampling at 6k rows: the deterministic fixture error is
    // well inside +-35% — this pins the scaling arithmetic, not luck
    assert(math.abs(r.getLong(5)) < 350000L, s"n_err ${r.getLong(5)}")
    assert(math.abs(r.getLong(6)) < 350000L, s"rev_err ${r.getLong(6)}")
  }

  test("purchaseIntervals: non-negative gaps, gap count conserved") {
    val orders = spark.read.parquet(s"$sf/orders.parquet")
    val got = Profiler.purchaseIntervals(orders, col("o_custkey"),
      col("o_orderdate")).collect()
    assert(got.nonEmpty)
    // every gap row comes from a customer with >= 2 orders: total
    // gaps = total orders - customers-with-orders
    val nGaps = got.map(_.getLong(1)).sum
    val expect = orders.count() -
      orders.select("o_custkey").distinct().count()
    assert(nGaps == expect)
    // quartiles are non-negative (orders never go back in time)
    got.foreach(r => assert(r.getLong(2) >= 0))
  }

  test("giniConcentration: uniform ~0, single-holder -> (n-1)/n") {
    import spark.implicits._
    val uniform = (1L to 100L).map(i => (i, 50.0))
      .toDF("o_custkey", "o_totalprice")
    val g0 = Profiler.giniConcentration(uniform, col("o_custkey"),
      col("o_totalprice")).first().getLong(2)
    assert(g0 == 0L)
    // one customer holds everything: G = (n-1)/n = 0.99
    val single = ((1L to 99L).map(i => (i, 0.0)) :+ (100L, 1000.0))
      .toDF("o_custkey", "o_totalprice")
    val g1 = Profiler.giniConcentration(single, col("o_custkey"),
      col("o_totalprice")).first().getLong(2)
    assert(g1 == 990000L)
  }

  test("layoutSkipping: zorder scans fewer files than natural on a " +
    "cross-dimension predicate; matching rows are never skipped") {
    val orders = spark.read.parquet(s"$sf/orders.parquet")
    val got = graft.ext.Layout.layoutSkipping(orders, 64,
        100L, 199L, "1997-06-01", "1997-08-31")
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    val (nfN, fsN, rsN, m) = got("natural")
    val (nfZ, fsZ, rsZ, m2) = got("zorder")
    assert(nfN == nfZ && m == m2)
    // zone maps are sound: scanned rows always cover the matches
    assert(rsN >= m && rsZ >= m)
    // and the z-order layout prunes at least as well as time-append
    assert(fsZ <= fsN)
  }

  test("partitionPlanner: ceil division covers the bytes, and " +
      "rows_per_partition is flat under 10x data growth") {
    val li = spark.read.parquet(s"$sf/lineitem.parquet")
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    // small target so the fixture spans several partitions
    val plan = graft.ext.Layout.partitionPlanner(li, docs, 65536L)
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2),
        r.getLong(4), r.getLong(5))).toMap
    plan.foreach { case (t, (n, bytes, parts, rpp)) =>
      assert(parts >= 1, t)
      // ceil: partitions cover the bytes, and not one more than needed
      assert(parts * 65536L >= bytes && (parts - 1) * 65536L < bytes, t)
      assert(rpp == n / parts, t)
    }
    // 10x the data -> ~10x partitions, rows_per_partition stays flat
    val li10 = (1 to 10).map(_ => li).reduce(_ unionAll _)
    val docs10 = (1 to 10).map(_ => docs).reduce(_ unionAll _)
    val plan10 = graft.ext.Layout.partitionPlanner(li10, docs10, 65536L)
      .collect().map(r => r.getString(0) -> (r.getLong(4), r.getLong(5)))
      .toMap
    plan.foreach { case (t, (_, _, parts, rpp)) =>
      val (parts10, rpp10) = plan10(t)
      assert(parts10 >= 9 * parts && parts10 <= 10 * parts + 1, t)
      // flat within ceil-rounding wiggle
      assert(math.abs(rpp10 - rpp) <= rpp / 8 + 1, t)
    }
  }

  test("seasonalSplit: constant series decomposes to itself, a " +
      "recurring weekly spike lands in the seasonal index, gap " +
      "weeks are zero-filled") {
    import spark.implicits._
    def d(w: Int) = java.sql.Date.valueOf(
      java.time.LocalDate.of(1990, 1, 8).plusWeeks(w))
    // 104 weeks at $100; every week-of-year 10 spikes to $204;
    // week 30 of the first year is MISSING (a gap, not a zero sale
    // in the input — the spine must reintroduce it as zero)
    val rows = (0 until 104).filter(_ != 30).map { w =>
      (d(w), if (w % 52 == 10) 204.00 else 100.00) }
    val got = Profiler.seasonalSplit(rows.toDF("dt", "amt"),
        col("dt"), col("amt"))
      .as[(Long, Long, Long, Long, Long, Long)].collect()
    assert(got.length == 104) // dense spine including the gap week
    val byWeek = got.map(r => r._1 -> r).toMap
    val w0 = got.map(_._1).min
    // the gap week exists with rev 0
    assert(byWeek(w0 + 30)._2 == 0L)
    // seasonal index: the spiking week-of-year is strongly positive,
    // a mid-quiet week-of-year is mildly negative (it pays for the
    // spike inside its trend window)
    val spikeWoy = got.find(_._2 == 20400L).get._5
    val seasonalAt = got.groupBy(_._5).view.mapValues(_.head._6)
    assert(seasonalAt(spikeWoy) > 8000L,
      s"spike woy index: ${seasonalAt(spikeWoy)}")
    // far from spike and gap, trend == rev and resid == 0
    val quiet = got.filter(r => r._2 == 10000L &&
      math.abs(r._5 - spikeWoy) > 8 && math.abs(r._1 - (w0 + 30)) > 8 &&
      r._1 > w0 + 6 && r._1 < w0 + 97)
    assert(quiet.nonEmpty && quiet.forall(r => r._3 == 10000L && r._4 == 0L))
  }

  test("theilSenTrend: recovers a clean linear slope through a " +
      "planted outlier that would drag a mean-based fit") {
    import spark.implicits._
    def d(i: Int) = java.sql.Date.valueOf(
      java.time.LocalDate.of(1990, 1, 1).plusDays(i))
    // daily revenue 1.00 + 0.02*i dollars; day 15 explodes 100x
    val rows = (0 until 30).map(i =>
      (d(i), if (i == 15) 300.00 else 1.00 + 0.02 * i))
    val orders = rows.toDF("dt", "amt")
    val got = Profiler.theilSenTrend(orders, col("dt"), col("amt"),
        bucketDays = 1)
      .as[(Long, Long)].head()
    // true slope: 2 cents/day -> 2,000,000 ppm; the outlier touches
    // only 29 of 435 pairs, the median never sees it
    assert(got._1 == 435L)
    assert(got._2 == 2000000L, s"robust slope off: ${got._2}")
    // the mean of pairwise slopes IS dragged (sanity that the
    // median is doing the work)
    val mean = {
      val rev = rows.map(r => math.round(r._2 * 100))
      val slopes = for (i <- rev.indices; j <- rev.indices if i < j)
        yield (rev(j) - rev(i)) * 1000000L / (j - i)
      slopes.sum / slopes.length
    }
    assert(math.abs(mean - 2000000L) > 500000L)
  }

  test("hhiBands: single-source hits 1e6, an even 4-way split ~250k, " +
      "every part lands in exactly one band") {
    import spark.implicits._
    // part 1: one supplier -> HHI 1e6 (band 10)
    // part 2: four equal suppliers -> 4 * 250000^2 / 1e6 = 250000
    val li = (Seq((1L, 10L, 100.00)) ++
      (1L to 4L).map(s => (2L, s, 50.00)))
      .toDF("l_partkey", "l_suppkey", "l_extendedprice")
    val got = Profiler.hhiBands(li)
      .as[(Long, Long, Long, Long)].collect().toSeq
    assert(got == Seq(
      (2L, 1L, 250000L, 250000L),    // part 2 in band 2
      (10L, 1L, 1000000L, 1000000L)) // part 1 fully concentrated
    )
    assert(got.map(_._2).sum == 2L)  // both parts banded once
  }

  test("rankMovers: a planted head-to-tail crash is the top mover") {
    import spark.implicits._
    def d(s: String) = java.sql.Date.valueOf(s)
    // 1996: part 1 rev 300, part 2 rev 200, part 3 rev 100
    // 1997: part 1 rev 10 (crashes to rank 3), others keep order
    val li = Seq(
      (1L, 300.00, d("1996-05-01")), (2L, 200.00, d("1996-05-01")),
      (3L, 100.00, d("1996-05-01")),
      (1L, 10.00, d("1997-05-01")), (2L, 200.00, d("1997-05-01")),
      (3L, 100.00, d("1997-05-01"))
    ).toDF("l_partkey", "l_extendedprice", "l_shipdate")
    val got = Profiler.rankMovers(li, 1996, 1997, 10)
      .as[(Long, Long, Long, Long, Long, Long)].collect().toSeq
    // part 1: rank1=1 -> rank2=3, delta -2, the biggest |move|
    assert(got.head == ((1L, 30000L, 1000L, 1L, 3L, -2L)))
    // parts 2,3 each move up one
    assert(got.map(r => r._1 -> r._6).toMap == Map(1L -> -2L,
      2L -> 1L, 3L -> 1L))
  }

  test("lateDataAudit: planted disorder lands in the right buckets, " +
      "per-user streams are independent") {
    import spark.implicits._
    def ts(s: String) = java.sql.Timestamp.valueOf(s)
    // user 1 arrival order (event_id): t0, t+100s, then one event
    // 5s BEFORE the max seen (late 105s -> bucket 3_upto_1m? no:
    // 105s > 60s -> 4_upto_10m), then in-order again
    val ev = Seq(
      (1L, ts("2024-01-01 10:00:00"), 1L),
      (1L, ts("2024-01-01 10:01:40"), 2L),
      (1L, ts("2024-01-01 09:59:55"), 3L),  // 105s late
      (1L, ts("2024-01-01 10:02:00"), 4L),
      // user 2: 1s-late event; first events are always in order
      (2L, ts("2024-01-01 10:00:00"), 5L),
      (2L, ts("2024-01-01 09:59:59"), 6L)   // exactly 1s late
    ).toDF("user_id", "ts", "event_id")
    val got = Profiler.lateDataAudit(ev)
      .as[(String, Long, Long)].collect().map(r => r._1 -> r._2).toMap
    assert(got == Map(
      "0_in_order" -> 4L, "1_upto_1s" -> 1L, "4_upto_10m" -> 1L))
  }

  test("checksumIncremental: combine equals full on a clean split, " +
      "and flags a corrupted delta") {
    import spark.implicits._
    val df = (1L to 500L).map(i => (i, s"row$i")).toDF("k", "s")
    val cols = (d: org.apache.spark.sql.DataFrame) => Seq(d("k"), d("s"))
    val ok = Profiler.checksumIncremental(
      df.filter(col("k") <= 250), df.filter(col("k") > 250), df, cols)
      .select("matches", "n_combined").as[(Long, Long)].head()
    assert(ok == ((1L, 500L)))
    // corrupt one delta row -> combined checksum must diverge
    val corrupted = df.filter(col("k") > 250)
      .withColumn("s", when(col("k") === 400L, lit("rowX"))
        .otherwise(col("s")))
    val bad = Profiler.checksumIncremental(
      df.filter(col("k") <= 250), corrupted, df, cols)
      .select("matches").as[Long].head()
    assert(bad == 0L)
  }

  test("resampleStability: half-samples cover ~half the rows each, " +
      "are reproducible, and every replicate mean is sane") {
    import spark.implicits._
    val df = (1L to 1000L).map(i => (i, 100.0 + (i % 7))).toDF("k", "amt")
    val got = Profiler.resampleStability(df, col("k"), col("amt"))
      .as[(Long, Long, Long)].collect().toSeq
    assert(got.map(_._1) == (0L to 7L))
    got.foreach { case (_, n, m) =>
      assert(n > 350 && n < 650, s"half-sample size off: $n")
      assert(m > 10000 && m < 10700, s"replicate mean off: $m")
    }
    val again = Profiler.resampleStability(df, col("k"), col("amt"))
      .as[(Long, Long, Long)].collect().toSeq
    assert(got == again)
  }

  test("abTestAudit: a planted arm effect is significant, the A/A " +
      "hash split is not") {
    import spark.implicits._
    // amounts depend on the SAME hash bit used for arming -> a real
    // treatment effect the audit must flag
    val armBit = graft.functions.Hashing.permBucket(col("k"), 2, 2)
    val planted = (1L to 4000L).toDF("k")
      .select(col("k"), when(armBit === 0, 200.0).otherwise(100.0)
        .as("amt"))
    val eff = Profiler.abTestAudit(planted, col("k"), col("amt"), 15000L)
      .select("significant", "z2_x100").as[(Long, Long)].head()
    assert(eff._1 == 1L && eff._2 > 384L)
    // independent amounts -> A/A, no significance
    val aa = (1L to 4000L).map(i => (i, 100.0 + (i % 100)))
      .toDF("k", "amt")
    val aaRes = Profiler.abTestAudit(aa, col("k"), col("amt"), 15000L)
      .select("significant").as[Long].head()
    assert(aaRes == 0L)
    // degenerate rate (everything converts) publishes z2 = 0
    val degen = Profiler.abTestAudit(aa, col("k"), col("amt"), 0L)
      .select("z2_x100").as[Long].head()
    assert(degen == 0L)
  }

  test("gridQuantiles: one-to-one grid is exact, coarse grid stays " +
      "within one cell width of the exact quantile") {
    import spark.implicits._
    // 0..1023 with grid 1024: every cell holds exactly one value,
    // so the estimate IS the exact quantile
    val df = (0L to 1023L).toDF("x")
    val fine = Profiler.gridQuantiles(df, col("x"), 1024,
      Seq(500000L, 990000L)).as[(Long, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    assert(fine(500000L) == ((511L, 511L)))
    assert(fine(990000L) == ((1013L, 1013L)))
    // coarse grid 16: error bounded by one cell width (64)
    val coarse = Profiler.gridQuantiles(df, col("x"), 16,
      Seq(500000L, 990000L)).as[(Long, Long, Long)].collect()
    coarse.foreach { case (p, _, est) =>
      val exact = (1023L * p) / 1000000L
      assert(est >= exact && est - exact <= 64L, s"p=$p est=$est")
    }
  }

  test("winsorizedStats matches a driver-side reference with " +
      "planted outliers") {
    import spark.implicits._
    val rng = new scala.util.Random(7)
    val xs = (1 to 200).map(i => (i.toLong, 0L,
      (1000 + rng.nextInt(500)).toLong)) ++
      Seq((201L, 0L, 1000000L), (202L, 0L, -999999L)) // fat tails
    val df = xs.toDF("k0", "k1", "x")
    val got = Profiler.winsorizedStats(df, col("x"),
        Seq(col("k0"), col("k1")))
      .as[(Long, Long, Long, Long, Long, Long, Long)].head()
    // reference: rank-fence at ceil(p*n), clip, integer means
    val sorted = xs.map(_._3).sorted
    val n = sorted.length
    def fence(ppm: Long) =
      sorted(((n * ppm + 999999L) / 1000000L).toInt - 1)
    val (lo, hi) = (fence(50000L), fence(950000L))
    val clipped = sorted.map(v => math.min(math.max(v, lo), hi))
    assert(got == ((n.toLong, lo, hi,
      sorted.count(_ < lo).toLong, sorted.count(_ > hi).toLong,
      // Spark decimal `div` truncates toward zero; sums are positive
      sorted.sum / n, clipped.sum / n)))
    // the whole point: raw mean is dragged, winsorized is not
    assert(math.abs(got._7 - 1250) < 100 && got._6 != got._7)
  }

  test("forwardFill: gap days carry the last observation, days " +
      "before the first observation are zero") {
    import spark.implicits._
    val df = Seq(
      ("A", "2024-01-01", 0.10), ("A", "2024-01-03", 0.30),
      ("B", "2024-01-02", 0.20)
    ).toDF("key", "d", "amt")
      .select(col("key"), to_date(col("d")).as("d"), col("amt"))
    val got = Profiler.forwardFill(df, col("key"), col("d"), col("amt"))
      .collect().map(r => (r.getString(0), r.getDate(1).toString,
        r.getLong(2), r.getLong(3))).toSeq
    assert(got == Seq(
      ("A", "2024-01-01", 10L, 1L),
      ("A", "2024-01-02", 10L, 0L),  // carried
      ("A", "2024-01-03", 30L, 1L),
      ("B", "2024-01-01", 0L, 0L),   // before first observation
      ("B", "2024-01-02", 20L, 1L),
      ("B", "2024-01-03", 20L, 0L))) // carried
  }

  test("benfordAudit: digits counted from the significand, shares " +
      "and deviations exact") {
    import spark.implicits._
    // 3 values leading 1, 2 leading 2, 1 leading 9; 0.5 -> digit 5
    val df = Seq(1.23, 10.0, 199.99, 2.5, 25.0, 900.0, 0.5).toDF("v")
    val got = Profiler.benfordAudit(df, col("v"))
      .as[(Long, Long, Long, Long, Long)].collect().toSeq
    val byDigit = got.map(r => r._1 -> r).toMap
    assert(byDigit(1L)._2 == 3L && byDigit(2L)._2 == 2L &&
      byDigit(5L)._2 == 1L && byDigit(9L)._2 == 1L)
    // share_ppm: 3/7 = 428571 ppm; benford(1) = 301029; dev = 127542
    assert(byDigit(1L)._3 == 428571L)
    assert(byDigit(1L)._4 == 301029L && byDigit(1L)._5 == 127542L)
    // shares are consistent: every dev = |share - benford|
    got.foreach { case (_, _, s, b, dv) => assert(dv == math.abs(s - b)) }
  }

  test("tableChecksum: order/partition-invariant, byte-sensitive") {
    import spark.implicits._
    val df = Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("k", "s")
    val base = Profiler.tableChecksum(df, Seq(col("k"), col("s")))
      .as[(Long, Long)].head()
    assert(base._1 == 3L)
    // row order and partitioning do not move the fingerprint
    val shuffled = Profiler.tableChecksum(
      df.orderBy(col("s").desc).repartition(7),
      Seq(col("k"), col("s"))).as[(Long, Long)].head()
    assert(shuffled == base)
    // one changed byte does
    val tweaked = Profiler.tableChecksum(
      Seq((1L, "a"), (2L, "b"), (3L, "d")).toDF("k", "s"),
      Seq(col("k"), col("s"))).as[(Long, Long)].head()
    assert(tweaked._2 != base._2)
    // and column order is part of the identity
    val swapped = Profiler.tableChecksum(df, Seq(col("s"), col("k")))
      .as[(Long, Long)].head()
    assert(swapped._2 != base._2)
  }

  test("cusumDrift: window form equals the textbook recursion, " +
      "creep alarms where spikes alone would not") {
    import spark.implicits._
    // 20 quiet days at ~100, then 10 days of sustained creep: each
    // creep day is an unremarkable single observation (the +40% is
    // under 2x the quiet-day spread once mu absorbs the shift), but
    // the CUSUM accumulates ~2000 cents/day and crosses h = mu
    val days = (1 to 20).map(i => (f"2024-01-$i%02d", 100.00 + (i % 3))) ++
      (1 to 10).map(i => (f"2024-02-$i%02d", 140.00 + (i % 3)))
    val orders = days.toDF("d", "amt")
      .select(to_date(col("d")).as("d"), col("amt"))
    val got = Profiler.cusumDrift(orders, col("d"), col("amt"))
      .collect().map(r => (r.getDate(0).toString, r.getLong(1),
        r.getLong(2), r.getLong(3)))
    // driver-side reference: the literal recursion
    val rev = got.map(_._2)
    val mu = rev.sum / rev.length
    val slack = mu / 20
    var s = 0L
    val expected = rev.map { x =>
      s = math.max(0L, s + (x - mu - slack)); s }
    assert(got.map(_._3).toSeq == expected.toSeq)
    // quiet phase never alarms; the creep phase eventually does
    val alarms = got.map(_._4)
    assert(alarms.take(20).forall(_ == 0L))
    assert(alarms.drop(20).contains(1L))
    // and once alarming under sustained creep it stays alarming
    val firstAlarm = alarms.indexOf(1L)
    assert(alarms.drop(firstAlarm).forall(_ == 1L))
  }
}
