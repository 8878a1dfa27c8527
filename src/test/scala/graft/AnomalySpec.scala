package graft

import java.sql.Timestamp
import org.apache.spark.sql.functions._
import graft.ext.Sessions

/** EWMA / MAD / forward-as-of: hand-checked values + invariants. */
class AnomalySpec extends SparkSpec {
  import spark.implicits._

  private def ev(id: Long, ts: String, user: Long, typ: String) =
    (id, Timestamp.valueOf(ts), user, typ, 1.0, "{}")

  private def toDf(rows: Seq[(Long, Timestamp, Long, String, Double, String)]) =
    rows.toDF("event_id", "ts", "user_id", "event_type", "value", "props")

  test("ewmaVolume: hand-checked dyadic weights") {
    // type 'a': 3 days with counts 4, 2, 8
    val rows = (1 to 4).map(i => ev(i, "2024-01-01 10:00:00", 1, "a")) ++
      (5 to 6).map(i => ev(i, "2024-01-02 10:00:00", 1, "a")) ++
      (7 to 14).map(i => ev(i, "2024-01-03 10:00:00", 1, "a"))
    val got = Sessions.ewmaVolume(toDf(rows), col("event_type"), col("ts"))
      .orderBy("day").select("n_events", "ewma_ppm")
      .as[(Long, Long)].collect().toSeq
    // day1: num=4*128, den=128 -> 4.0 => 4_000_000 ppm
    // day2: num=2*128+4*64, den=192 -> (512)/192 = 2.666..
    // day3: num=8*128+2*64+4*32, den=224 -> 1280/224 = 5.714..
    assert(got == Seq(
      (4L, 4000000L),
      (2L, 512L * 1000000L / 192L),
      (8L, 1280L * 1000000L / 224L)))
  }

  test("madOutliers: a 100x spike is flagged, the rest are not") {
    // 9 quiet days of ~4 events, one day with 400
    val quiet = (0 until 9).flatMap { d =>
      (1 to 4).map(i => ev(d * 10L + i, f"2024-01-${d + 1}%02d 10:00:00", 1, "a"))
    }
    val spike = (1 to 400).map(i => ev(1000L + i, "2024-01-10 10:00:00", 1, "a"))
    val got = Sessions.madOutliers(toDf(quiet ++ spike), col("event_type"),
        col("ts"))
      .select("day", "is_outlier").as[(java.sql.Date, Long)].collect().toMap
    assert(got(java.sql.Date.valueOf("2024-01-10")) == 1L)
    assert(got.count(_._2 == 1L) == 1)
  }

  test("madOutliers matches mean-free definition: |x-med| > 3*MAD") {
    val events = Queries.eventsTable(spark, sf)
    val out = Sessions.madOutliers(events, col("event_type"), col("ts"))
    // invariant: flag consistent with its own published med2/mad4
    val bad = out.filter(
      (abs(col("n_events") * 2 - col("med2")) * 2 > col("mad4") * 3) =!=
        (col("is_outlier") === 1L)).count()
    assert(bad == 0)
  }

  test("attributionAsof: first purchase at-or-after, tolerance nulls") {
    val rows = Seq(
      ev(1, "2024-01-01 10:00:00", 1, "click"),
      ev(2, "2024-01-01 10:20:00", 1, "purchase"), // first match for 1
      ev(3, "2024-01-01 10:30:00", 1, "purchase"), // not the match
      ev(4, "2024-01-01 12:00:00", 1, "click"),    // no purchase after
      ev(5, "2024-01-02 09:00:00", 2, "click"),
      ev(6, "2024-01-02 11:00:00", 2, "purchase"), // beyond 1h tolerance
      ev(7, "2024-01-03 08:00:00", 3, "purchase"), // before the click
      ev(8, "2024-01-03 09:00:00", 3, "click"),
      ev(9, "2024-01-03 09:00:00", 3, "purchase")) // same instant: matches
    val got = Sessions.attributionAsof(toDf(rows), "click", "purchase", 3600L)
      .select("event_id", "to_event_id", "lag_s")
      .as[(Long, Option[Long], Option[Long])].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    assert(got(1L) == ((Some(2L), Some(1200L))))
    assert(got(4L) == ((None, None)))
    assert(got(5L) == ((None, None)))    // match exists but out of tolerance
    assert(got(8L) == ((Some(9L), Some(0L))))
    assert(got.size == 4)                // one row per click
  }
}
