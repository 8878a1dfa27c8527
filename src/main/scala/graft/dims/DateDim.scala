package graft.dims

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Date dimension builder — reference `createDimDate` (SQL:182-237).
  *
  * The reference generates one row per day with a recursive CTE capped
  * by `OPTION (MAXRECURSION 20000)` (SQL:197-228); Spark-first this is
  * a single `sequence()` + `explode` — one narrow stage, no shuffle,
  * bounded by construction.
  *
  * Calendar names are derived from a static in-plan lookup (arrays
  * indexed by month / ISO weekday) instead of the reference's
  * `SET LANGUAGE` session locale (SQL:189-192): locale-free, codegen
  * friendly, and expressible 1:1 in the DuckDB oracle (SURVEY §7.7.3).
  * Week numbering is pinned to ISO-8601 (SURVEY §7.7; the reference's
  * `DATEPART(wk)` under `DATEFIRST 1` is SQL-Server-specific).
  */
object DateDim {

  private val monthNames = Seq("January", "February", "March", "April",
    "May", "June", "July", "August", "September", "October", "November",
    "December")
  private val dayNames = Seq("Monday", "Tuesday", "Wednesday", "Thursday",
    "Friday", "Saturday", "Sunday")

  /** Swedish calendar names — the reference runs its whole build under
    * `SET LANGUAGE Svenska; SET DATEFIRST 1` (SQL:189-192) and
    * validates the distinct Swedish day/month name sets
    * (SQL:1651-1656). Static lookups, not a session locale: the same
    * values on every engine and executor, no JVM/ICU locale-data
    * dependency. Lowercase per SQL Server's sys.syslanguages entries
    * for Svenska. */
  val monthNamesSv: Seq[String] = Seq("januari", "februari", "mars",
    "april", "maj", "juni", "juli", "augusti", "september", "oktober",
    "november", "december")
  val dayNamesSv: Seq[String] = Seq("måndag", "tisdag", "onsdag",
    "torsdag", "fredag", "lördag", "söndag")
  val monthAbbrevSv: Seq[String] = Seq("jan", "feb", "mar", "apr", "maj",
    "jun", "jul", "aug", "sep", "okt", "nov", "dec")
  val dayAbbrevSv: Seq[String] = Seq("mån", "tis", "ons", "tors", "fre",
    "lör", "sön")

  /** ISO day-of-week 1=Monday..7=Sunday from Spark's 1=Sunday..7=Saturday. */
  def isoDayOfWeek(d: Column): Column = pmod(dayofweek(d) + lit(5), lit(7)) + lit(1)

  /** One row per day in [start, end]. 16 locale-free calendar columns
    * plus the Swedish-locale surface of the reference's 19-column
    * DimDate (SQL:156-177): localized day/month names and
    * abbreviations (`datename(dw)`/`format 'ddd'`/`format 'MMM'`
    * under Svenska), the long-form date (`format(d, 'D')` →
    * "den 3 januari 1995"), year-quarter composites, and the
    * weekday/weekend flag — every reference column is covered by a
    * same-semantics column here (the reference's `week` under
    * `DATEFIRST 1` is pinned to ISO-8601 `week_of_year`, §7.7). */
  def build(spark: SparkSession, start: String, end: String): DataFrame = {
    // Spark's sequence() silently steps BACKWARD when start > end while
    // the DuckDB oracle's range() returns zero rows — fail loudly
    // instead of building a descending calendar that diverges
    require(java.time.LocalDate.parse(start)
      .compareTo(java.time.LocalDate.parse(end)) <= 0,
      s"date dim range is inverted: $start > $end")
    val days = spark.range(1).select(
      explode(sequence(lit(start).cast("date"), lit(end).cast("date")))
        .as("date_value"))
    days
      .withColumn("date_key",
        (year(col("date_value")) * 10000 + month(col("date_value")) * 100 +
          dayofmonth(col("date_value"))).cast("long"))
      .withColumn("year", year(col("date_value")).cast("long"))
      .withColumn("quarter", quarter(col("date_value")).cast("long"))
      .withColumn("month", month(col("date_value")).cast("long"))
      .withColumn("day", dayofmonth(col("date_value")).cast("long"))
      .withColumn("day_of_year", dayofyear(col("date_value")).cast("long"))
      .withColumn("day_of_week", isoDayOfWeek(col("date_value")).cast("long"))
      .withColumn("week_of_year", weekofyear(col("date_value")).cast("long"))
      .withColumn("month_name",
        element_at(array(monthNames.map(lit): _*), month(col("date_value"))))
      .withColumn("day_name",
        element_at(array(dayNames.map(lit): _*),
          isoDayOfWeek(col("date_value")).cast("int")))
      .withColumn("quarter_name",
        concat(lit("Q"), quarter(col("date_value")).cast("string")))
      .withColumn("year_month",
        concat(year(col("date_value")).cast("string"), lit("-"),
          lpad(month(col("date_value")).cast("string"), 2, "0")))
      .withColumn("is_weekend",
        when(isoDayOfWeek(col("date_value")) >= 6, 1L).otherwise(0L))
      .withColumn("first_of_month", trunc(col("date_value"), "month"))
      .withColumn("last_of_month", last_day(col("date_value")))
      .withColumn("day_name_sv",
        element_at(array(dayNamesSv.map(lit): _*),
          isoDayOfWeek(col("date_value")).cast("int")))
      .withColumn("day_abbrev_sv",
        element_at(array(dayAbbrevSv.map(lit): _*),
          isoDayOfWeek(col("date_value")).cast("int")))
      .withColumn("month_name_sv",
        element_at(array(monthNamesSv.map(lit): _*), month(col("date_value"))))
      .withColumn("month_abbrev_sv",
        element_at(array(monthAbbrevSv.map(lit): _*), month(col("date_value"))))
      .withColumn("full_date_sv",
        concat(lit("den "), dayofmonth(col("date_value")).cast("string"),
          lit(" "), col("month_name_sv"),
          lit(" "), year(col("date_value")).cast("string")))
      .withColumn("year_quarter_name",
        concat(year(col("date_value")).cast("string"), lit("-Q"),
          quarter(col("date_value")).cast("string")))
      .withColumn("year_quarter_number",
        concat(year(col("date_value")).cast("string"), lit("-"),
          quarter(col("date_value")).cast("string")))
      .withColumn("weekday_flag",
        when(isoDayOfWeek(col("date_value")) <= 5, "weekday")
          .otherwise("weekend"))
  }

  /** Matching DuckDB oracle SQL (same columns, same semantics). */
  def oracleSql(start: String, end: String): String = {
    val m = monthNames.map(n => s"'$n'").mkString(", ")
    val d = dayNames.map(n => s"'$n'").mkString(", ")
    val msv = monthNamesSv.map(n => s"'$n'").mkString(", ")
    val dsv = dayNamesSv.map(n => s"'$n'").mkString(", ")
    val masv = monthAbbrevSv.map(n => s"'$n'").mkString(", ")
    val dasv = dayAbbrevSv.map(n => s"'$n'").mkString(", ")
    s"""
    |SELECT
    |  cast(range AS DATE) AS date_value,
    |  year(range)*10000 + month(range)*100 + day(range) AS date_key,
    |  year(range) AS year,
    |  quarter(range) AS quarter,
    |  month(range) AS month,
    |  day(range) AS day,
    |  dayofyear(range) AS day_of_year,
    |  isodow(range) AS day_of_week,
    |  weekofyear(range) AS week_of_year,
    |  ([$m])[month(range)] AS month_name,
    |  ([$d])[isodow(range)] AS day_name,
    |  'Q' || cast(quarter(range) AS VARCHAR) AS quarter_name,
    |  cast(year(range) AS VARCHAR) || '-' || lpad(cast(month(range) AS VARCHAR), 2, '0') AS year_month,
    |  CASE WHEN isodow(range) >= 6 THEN 1 ELSE 0 END::BIGINT AS is_weekend,
    |  cast(date_trunc('month', range) AS DATE) AS first_of_month,
    |  cast(last_day(cast(range AS DATE)) AS DATE) AS last_of_month,
    |  ([$dsv])[isodow(range)] AS day_name_sv,
    |  ([$dasv])[isodow(range)] AS day_abbrev_sv,
    |  ([$msv])[month(range)] AS month_name_sv,
    |  ([$masv])[month(range)] AS month_abbrev_sv,
    |  'den ' || cast(day(range) AS VARCHAR) || ' ' || ([$msv])[month(range)] ||
    |    ' ' || cast(year(range) AS VARCHAR) AS full_date_sv,
    |  cast(year(range) AS VARCHAR) || '-Q' || cast(quarter(range) AS VARCHAR) AS year_quarter_name,
    |  cast(year(range) AS VARCHAR) || '-' || cast(quarter(range) AS VARCHAR) AS year_quarter_number,
    |  CASE WHEN isodow(range) <= 5 THEN 'weekday' ELSE 'weekend' END AS weekday_flag
    |FROM range(DATE '$start', DATE '$end' + INTERVAL 1 DAY, INTERVAL 1 DAY)
    |ORDER BY date_value
    |""".stripMargin.trim
  }
}
