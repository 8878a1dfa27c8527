package graft

import org.apache.spark.sql.functions._

import graft.checks.Checks
import graft.dims.DateDim
import graft.ext.TextAnalysis

class DateDimChecksSpec extends SparkSpec {

  test("date dim: one row per day, keys unique, calendar fields consistent") {
    val dd = DateDim.build(spark, "2023-12-25", "2024-03-10").cache()
    assert(dd.count() == 77L) // 7 (dec) + 31 + 29 (leap) + 10
    assert(Checks.duplicates(dd, Seq("date_key")).count() == 0)
    assert(dd.filter(col("date_key") =!=
      col("year") * 10000 + col("month") * 100 + col("day")).count() == 0)
    // 2024-02-29 exists (leap year) with correct day name (Thursday)
    val leap = dd.filter(col("date_value") === to_date(lit("2024-02-29")))
    assert(leap.count() == 1)
    assert(leap.head().getAs[String]("day_name") == "Thursday")
    assert(leap.head().getAs[Long]("day_of_week") == 4L)
    // weekend flag matches day_of_week
    assert(dd.filter((col("day_of_week") >= 6) =!=
      (col("is_weekend") === 1L)).count() == 0)
    dd.unpersist()
  }

  test("Swedish calendar names match the reference's locale validation sets") {
    // the reference builds under SET LANGUAGE Svenska and validates the
    // distinct day/month name sets (SQL:1651-1656) — mirror that check
    val dd = DateDim.build(spark, "2024-01-01", "2024-12-31").cache()
    def distinctOf(c: String): Set[String] =
      dd.select(c).distinct().collect().map(_.getString(0)).toSet
    assert(distinctOf("day_name_sv") == Set("måndag", "tisdag", "onsdag",
      "torsdag", "fredag", "lördag", "söndag"))
    assert(distinctOf("month_name_sv") == Set("januari", "februari", "mars",
      "april", "maj", "juni", "juli", "augusti", "september", "oktober",
      "november", "december"))
    assert(distinctOf("weekday_flag") == Set("weekday", "weekend"))
    // long-form date (format 'D' under Svenska), spot-checked
    val row = dd.filter(col("date_value") === to_date(lit("2024-02-29")))
      .head()
    assert(row.getAs[String]("full_date_sv") == "den 29 februari 2024")
    assert(row.getAs[String]("day_name_sv") == "torsdag")
    assert(row.getAs[String]("year_quarter_name") == "2024-Q1")
    assert(row.getAs[String]("year_quarter_number") == "2024-1")
    // flag agrees with the numeric weekend marker everywhere
    assert(dd.filter((col("weekday_flag") === "weekend") =!=
      (col("is_weekend") === 1L)).count() == 0)
    dd.unpersist()
  }

  test("overlappingPairs flags constructed overlaps, clears tiled intervals") {
    import spark.implicits._
    val overlapping = Seq(
      (1L, 10L, "2024-01-01 00:00:00", "2024-01-01 02:00:00"),
      (1L, 11L, "2024-01-01 01:00:00", "2024-01-01 03:00:00"),
      (2L, 20L, "2024-01-01 00:00:00", "2024-01-01 01:00:00"),
      (2L, 21L, "2024-01-01 01:00:00", "2024-01-01 02:00:00"))
      .toDF("k", "id", "f_s", "t_s")
      .withColumn("f", col("f_s").cast("timestamp_ntz"))
      .withColumn("t", col("t_s").cast("timestamp_ntz"))
    val pairs = Checks.overlappingPairs(overlapping, "k", "id", "f", "t")
    assert(pairs.collect().map(r => (r.getLong(1), r.getLong(2))).toSet ==
      Set((10L, 11L))) // key 2 tiles half-open -> no overlap
  }

  test("lang_id picks the language whose markers dominate") {
    import spark.implicits._
    val docs = Seq(
      (1L, "the cat and the dog of the house"),
      (2L, "el que la de y los"),
      (3L, "xyzzy qwerty")).toDF("doc_id", "text")
    val out = docs.select(col("doc_id"),
      TextAnalysis.langId(col("text")).as("lang"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out(1L) == "en")
    assert(out(2L) == "es")
    assert(out(3L) == "und")
  }
}
