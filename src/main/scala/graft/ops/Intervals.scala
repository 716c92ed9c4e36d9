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
  *  - `Interval(MonthDaysNs)` → struct(months, days, nanos) — Spark's ANSI
  *    intervals are two-family so the lossless carrier is a struct column;
  *    see [[monthDayNano]] and the mdn* ops below (q132 oracle-checks the
  *    whole surface against DuckDB's native month/day/µs INTERVAL).
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

  // ------------------------------------------ Interval(MonthDaysNs)

  /** Arrow `Interval(MonthDaysNs)` (reference time_units.rs:71, FFI tag
    * `tin` arrow_c_ffi.rs:346): three INDEPENDENT fields — months, days,
    * nanoseconds — that deliberately do not normalize into each other
    * (a month isn't a fixed number of days, a day isn't a fixed number of
    * ns across DST). Spark's ANSI intervals are two-family (year-month /
    * day-time), so the lossless carrier here is a struct column; all
    * arithmetic below is field-wise codegen projection. DuckDB's INTERVAL
    * is the same triple at µs precision, which is what makes the q132
    * oracle cell-exact on the µs-representable subset.
    */
  def monthDayNano(months: Column, days: Column, nanos: Column): Column =
    struct(months.cast("int").as("months"), days.cast("int").as("days"),
      nanos.cast("long").as("nanos"))

  /** Field-wise interval addition (Arrow MonthDayNano add semantics:
    * no carry between fields).
    */
  def mdnAdd(a: Column, b: Column): Column =
    monthDayNano(a.getField("months") + b.getField("months"),
      a.getField("days") + b.getField("days"),
      a.getField("nanos") + b.getField("nanos"))

  def mdnNegate(a: Column): Column =
    monthDayNano(-a.getField("months"), -a.getField("days"), -a.getField("nanos"))

  def mdnSubtract(a: Column, b: Column): Column = mdnAdd(a, mdnNegate(b))

  /** Scale by an integral factor, field-wise. */
  def mdnScale(a: Column, k: Column): Column =
    monthDayNano(a.getField("months") * k, a.getField("days") * k,
      a.getField("nanos") * k)

  /** Timestamp + MonthDayNano: months first (calendar add, end-of-month
    * clamped — same rule in Spark and DuckDB), then days, then nanos.
    * The ns field is truncated toward zero to Spark's µs timestamp
    * precision at this boundary (the one lossy step; sub-µs resolution
    * has no Spark timestamp carrier — documented divergence, SURVEY
    * §7.4.5).
    */
  def mdnShift(ts: Column, itv: Column): Column = {
    val afterMonths = ts.cast("timestamp") +
      make_ym_interval(lit(0), itv.getField("months"))
    val afterDays = afterMonths +
      make_dt_interval(itv.getField("days"), lit(0), lit(0), lit(0.0))
    timestamp_micros(unix_micros(afterDays) +
      (itv.getField("nanos") / 1000L).cast("long"))
  }
}
