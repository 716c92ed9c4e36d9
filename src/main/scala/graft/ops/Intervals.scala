package graft.ops

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DayTimeIntervalType

/** Duration / Interval column surface (minarrow `Duration32/64` +
  * `Interval(YearMonth/DayTime/MonthDaysNs)` — reference
  * src/ffi/arrow_dtype.rs:84-121, src/enums/time_units.rs:68-73; interval
  * arithmetic datetime_ops.rs:78-90).
  *
  * Type mapping (extends SURVEY.md §7.4.5):
  *  - `Duration64(s/ms/µs)` and `Interval(DayTime)` → `DayTimeIntervalType`
  *    (µs-precision day-time interval; ordering, codegen arithmetic and
  *    timestamp addition are native);
  *  - `Interval(YearMonth)` → `YearMonthIntervalType` (make_ym_interval);
  *  - `Interval(MonthDaysNs)` has no lossless Spark analog — it decomposes
  *    into a (YearMonth, DayTime) pair. Documented divergence: Spark
  *    intervals are ANSI two-family, the three-field form is Arrow-specific.
  *  - `Time32/Time64` (clock-of-day): represented as µs-since-midnight
  *    LongType (`timeOfDayMicros` below) — total ordering and arithmetic
  *    match Time64(µs); no dedicated Spark type exists to carry it.
  *
  * Everything here is expression-level: codegen'd, shuffle-free, no UDFs.
  */
object Intervals {

  /** Elapsed duration a−b as a DayTimeInterval (Duration64 analog). */
  def durationBetween(a: Column, b: Column): Column =
    a.cast("timestamp") - b.cast("timestamp")

  /** Whole seconds in a day-time interval (truncated toward zero —
    * chrono whole_seconds, datetime_ops.rs:96).
    */
  def wholeSeconds(itv: Column): Column = itv.cast("long")

  /** The day field of a day-time interval (whole_days for ts-differences). */
  def dayField(itv: Column): Column = date_part(lit("DAY"), itv).cast("long")

  /** Duration64 ingestion: a numeric seconds column → day-time interval. */
  def durationFromSeconds(n: Column): Column =
    n.cast(DayTimeIntervalType(DayTimeIntervalType.SECOND, DayTimeIntervalType.SECOND))

  /** Interval scaling (duration * k — numeric_ops on Duration arrays). */
  def scale(itv: Column, k: Column): Column = itv * k

  /** Timestamp + day-time/year-month interval. */
  def shift(ts: Column, itv: Column): Column = ts + itv

  /** Year-month interval constructor (Interval(YearMonth) analog). */
  def yearMonth(years: Int, months: Int): Column =
    make_ym_interval(lit(years), lit(months))

  /** Day-time interval constructor (Interval(DayTime) analog). */
  def dayTime(days: Int, hours: Int, mins: Int, secs: Double): Column =
    make_dt_interval(lit(days), lit(hours), lit(mins), lit(secs))

  /** Time-of-day (Time64(µs) analog): µs since midnight of the ts's day. */
  def timeOfDayMicros(ts: Column): Column =
    unix_micros(ts.cast("timestamp")) - unix_micros(date_trunc("day", ts.cast("timestamp")))
}
