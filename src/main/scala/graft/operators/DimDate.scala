package graft.operators

import java.time.LocalDate
import java.time.temporal.ChronoUnit

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Date-dimension generator replicating the reference's
  * `populate_dim_date.py:36-81` (19 calendar attributes, Vietnamese
  * labels) as pure column expressions over `spark.range` — fully
  * distributed and codegen'd, vs the reference's driver-side Python loop +
  * executemany (populate_dim_date.py:94).
  *
  * Faithfully preserved semantics:
  *   - `date_sk` is 1-based day offset from the range start (the dump's
  *     AUTO_INCREMENT order, sql_script/db_staging.sql:51 ff.).
  *   - week numbering: week containing Jan 1 can be week 0 or 1 depending
  *     on where the week STARTS — `(week_start - jan1).days // 7 + 1` with
  *     Python floor division, so a week starting in late December yields 0
  *     (fixture: 2020-01-01 → sun_week_of_year 0, sun_week 2019-12-29).
  *   - holiday is the constant 'Không'; weekend = Sat/Sun → 'Cuối tuần'.
  */
object DimDate {
  /** Python weekday(): Mon=0..Sun=6, from Spark dayofweek (Sun=1..Sat=7). */
  private def pyWeekday(d: Column): Column = (dayofweek(d) + 5) % 7

  /** Reference week numbering: floor((weekStart - Jan1)/7) + 1. */
  private def weekOfYear(weekStart: Column, d: Column): Column =
    floor(datediff(weekStart, make_date(year(d), lit(1), lit(1))) / 7.0).cast("int") + 1

  val weekdayNamesVi: Seq[String] =
    Seq("Thứ Hai", "Thứ Ba", "Thứ Tư", "Thứ Năm", "Thứ Sáu", "Thứ Bảy", "Chủ Nhật")

  def generate(
      spark: SparkSession,
      start: String = "2020-01-01",
      end: String = "2030-12-31"): DataFrame = {
    val startDay = LocalDate.parse(start)
    val nDays = ChronoUnit.DAYS.between(startDay, LocalDate.parse(end)).toInt + 1
    val base = spark
      .range(0, nDays)
      .select(
        (col("id") + 1).cast("int").as("date_sk"),
        date_add(to_date(lit(start)), col("id").cast("int")).as("full_date"))
    withCalendarAttrs(base, col("full_date"))
  }

  /** Derive the 19 reference calendar attributes from date column `d`.
    * Usable both by [[generate]] and to decorate an arbitrary fact date.
    */
  def withCalendarAttrs(df: DataFrame, d: Column): DataFrame = {
    val wd = pyWeekday(d)
    val sunWeek = date_sub(d, ((wd + 1) % 7).cast("int"))
    val monWeek = date_sub(d, wd.cast("int"))
    val sunWoy = weekOfYear(sunWeek, d)
    val monWoy = weekOfYear(monWeek, d)
    val weekdayName = array(weekdayNamesVi.map(lit): _*)(wd)
    df.select(
      df.columns.map(col) ++ Seq(
        dayofmonth(d).as("int_day"),
        month(d).as("int_month"),
        weekdayName.as("day_of_week"),
        concat(lit("Tháng "), month(d).cast("string")).as("calendar_month"),
        year(d).as("calendar_year"),
        date_format(d, "yyyy-MM").as("calendar_year_month"),
        dayofmonth(d).as("date_of_month"),
        dayofyear(d).as("day_of_year"),
        sunWoy.as("sun_week_of_year"),
        format_string("%d-W%02d (Sun)", year(d), sunWoy).as("sun_year_week"),
        sunWeek.as("sun_week"),
        monWoy.as("mon_week_of_year"),
        format_string("%d-W%02d (Mon)", year(d), monWoy).as("mon_year_week"),
        monWeek.as("mon_week"),
        concat(lit("Q"), quarter(d).cast("string")).as("quarter"),
        trunc(d, "quarter").as("quarter_of_year"),
        lit("Không").as("holiday"),
        when(wd >= 5, "Cuối tuần").otherwise("Ngày thường").as("day_type")): _*)
  }
}
