package graft.ops

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Datetime kernel surface (minarrow trait `DatetimeOps`,
  * src/traits/datetime_ops.rs:39-137; impl
  * src/structs/variants/datetime/datetime_ops.rs — e.g. `year` :417,
  * `add_months` :185, `diff` :252, `truncate` :635).
  *
  * Unit policy (SURVEY.md §7.4.5): minarrow carries Seconds/Millis/Micros/
  * Nanos/Days per column (`TimeUnit`, src/enums/time_units.rs:42-57); Spark
  * normalizes to µs timestamps + DateType at the boundary. All extraction /
  * arithmetic below is expression-level — codegen'd, shuffle-free.
  */
object Datetime {
  // ---- extraction (datetime_ops.rs trait lines :39-70)
  def yearOf(c: Column): Column = year(c)
  def monthOf(c: Column): Column = month(c)
  def dayOf(c: Column): Column = dayofmonth(c)
  def hourOf(c: Column): Column = hour(c)
  def minuteOf(c: Column): Column = minute(c)
  def secondOf(c: Column): Column = second(c)

  /** Monday=0 … Sunday=6 (Rust chrono `weekday().num_days_from_monday()`
    * convention used by the reference).
    */
  def weekday(c: Column): Column = ((dayofweek(c) + lit(5)) % 7)

  def dayOfYearOf(c: Column): Column = dayofyear(c)
  def isoWeek(c: Column): Column = weekofyear(c)
  def quarterOf(c: Column): Column = quarter(c)

  // ---- predicates (:73, :103-109)
  def isLeapYear(c: Column): Column = {
    val y = year(c)
    (y % 4 === 0) && ((y % 100 =!= 0) || (y % 400 === 0))
  }
  def isBefore(a: Column, b: Column): Column = a < b
  def isAfter(a: Column, b: Column): Column = a > b
  def betweenTs(c: Column, lo: Column, hi: Column): Column = c.between(lo, hi)

  // ---- arithmetic (:78-90)
  def addDays(c: Column, n: Int): Column = date_add(c.cast("date"), n)
  def addMonths(c: Column, n: Int): Column = add_months(c.cast("date"), n)
  def addYears(c: Column, n: Int): Column = add_months(c.cast("date"), n * 12)
  def addDuration(c: Column, interval: String): Column = c + expr(s"INTERVAL $interval")
  def subDuration(c: Column, interval: String): Column = c - expr(s"INTERVAL $interval")

  // ---- differencing in a chosen unit (:96-99)
  // Reference semantics are chrono's whole_days()/whole_seconds(): the µs
  // delta divided with truncation toward zero (23:00→01:00 next day is 0
  // whole days, not 1 calendar day; a 1.5 s delta is 1, not 1.5). `div` is
  // Catalyst IntegralDivide — exact long arithmetic, no double rounding.
  private def truncDiv(a: Column, divisor: Long): Column = {
    import org.apache.spark.sql.graft.ColumnBridge.{column => toCol, expression => toExpr}
    toCol(org.apache.spark.sql.catalyst.expressions.IntegralDivide(toExpr(a), toExpr(lit(divisor))))
  }
  def diffDays(a: Column, b: Column): Column = truncDiv(diffMicros(a, b), 86400000000L)
  def diffSeconds(a: Column, b: Column): Column = truncDiv(diffMicros(a, b), 1000000L)
  def diffMicros(a: Column, b: Column): Column =
    unix_micros(a.cast("timestamp")) - unix_micros(b.cast("timestamp"))
  def absDiffDays(a: Column, b: Column): Column = abs(diffDays(a, b))

  // ---- truncation (:114) — unit ∈ year|quarter|month|week|day|hour|minute|second
  def truncate(c: Column, unit: String): Column = date_trunc(unit, c)

  // ---- unit casts (:117-137): normalize an epoch column in `unit` to µs timestamp
  def fromEpoch(c: Column, unit: String): Column = unit match {
    case "s"  => timestamp_seconds(c)
    case "ms" => timestamp_millis(c)
    case "us" => timestamp_micros(c)
    // integer division: epoch-ns exceeds double's 53-bit mantissa, so the
    // `/`-then-cast route would corrupt microseconds
    case "ns" => timestamp_micros(Arith.floorDivI(c, lit(1000L)))
    case "d"  => date_add(to_date(lit("1970-01-01")), c.cast("int"))
    case u    => throw new IllegalArgumentException(s"unit $u")
  }
  def toEpochMicros(c: Column): Column = unix_micros(c.cast("timestamp"))

  // ---- timezone surface (minarrow lookup_timezone, datetime/tz.rs:502:
  // IANA names + offsets; Spark carries the IANA db in the JVM)
  /** Reinterpret a UTC timestamp as wall-clock time in `tz`. */
  def toTimezone(c: Column, tz: String): Column = from_utc_timestamp(c, tz)

  /** Reinterpret a wall-clock time in `tz` back to UTC. */
  def fromTimezone(c: Column, tz: String): Column = to_utc_timestamp(c, tz)

  /** Wall-clock shift between two zones (convert_timezone analog). */
  def convertTz(c: Column, fromTz: String, toTz: String): Column =
    from_utc_timestamp(to_utc_timestamp(c, fromTz), toTz)
}
