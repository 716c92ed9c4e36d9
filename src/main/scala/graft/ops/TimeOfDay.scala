package graft.ops

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Time-of-day (wall-clock TIME) operator surface — the analog of the
  * reference's `Time32/Time64(TimeUnit)` arrays (minarrow
  * src/ffi/arrow_dtype.rs:84-121, src/enums/time_units.rs), which store
  * time-since-midnight at second/milli/micro/nano resolution.
  *
  * Spark 4.1 ships a native `TIME(n)` type (micros-since-midnight
  * internally — the Time64(Microsecond) layout) behind
  * `spark.sql.timeType.enabled`; GraftConf.tune switches it on. Everything
  * here is built-in Catalyst expressions: codegen'd, shuffle-free,
  * pushdown-transparent.
  *
  * The one semantic divergence vs the reference's modulo layout: Spark's
  * `TIME + INTERVAL` raises on midnight overflow instead of wrapping, so
  * [[addMicrosWrap]] implements the reference's wraparound arithmetic
  * explicitly in exact integer µs (matching DuckDB's wrapping
  * `TIME + INTERVAL`).
  */
object TimeOfDay {

  private val MicrosPerDay = 86400000000L

  /** TIME-of-day of a timestamp (micros resolution). Spark has no
    * TIMESTAMP→TIME cast yet; compose from the field extractors —
    * `date_part('SECOND')` carries the fractional seconds as DECIMAL(8,6),
    * so no precision is lost.
    */
  def ofTimestamp(ts: Column): Column =
    call_function("make_time", hour(ts), minute(ts), date_part(lit("SECOND"), ts))

  /** Parse "HH:mm:ss[.SSSSSS]" (or an explicit pattern) into TIME. */
  def parse(c: Column): Column = c.cast("time(6)")
  def parse(c: Column, pattern: String): Column =
    call_function("to_time", c, lit(pattern))

  /** Build TIME from integral fields + decimal seconds (reference
    * Time64 constructor shape).
    */
  def makeTime(h: Column, m: Column, s: Column): Column =
    call_function("make_time", h, m, s)

  /** Micros since midnight as BIGINT — the reference's Time64 physical
    * value. CAST(TIME AS DECIMAL) yields seconds.micros exactly; scaling
    * by 1e6 inside decimal math keeps it exact.
    */
  def microsOfDay(t: Column): Column =
    (t.cast(DecimalType(18, 6)) * lit(1000000L)).cast("long")

  /** TIME from micros-since-midnight (values outside [0, 86400e6) are the
    * caller's bug — use [[addMicrosWrap]] for modulo arithmetic).
    */
  def ofMicrosOfDay(us: Column): Column =
    makeTime(
      (us / lit(3600000000L)).cast("int"),
      ((us / lit(60000000L)) % 60).cast("int"),
      (us % lit(60000000L)).cast(DecimalType(18, 6)) / lit(1000000L))

  /** Field extractors (hour/minute work natively on TIME; secondExact
    * keeps the DECIMAL(8,6) fractional seconds).
    */
  def hourOf(t: Column): Column = hour(t)
  def minuteOf(t: Column): Column = minute(t)
  def secondOf(t: Column): Column = second(t)
  def secondExact(t: Column): Column = date_part(lit("SECOND"), t)

  /** Truncate to a unit (HOUR/MINUTE/SECOND/MILLISECOND). */
  def truncTo(unit: String, t: Column): Column =
    call_function("time_trunc", lit(unit), t)

  /** t + delta µs with wraparound at midnight (reference modulo-day
    * semantics; Spark's native `+ INTERVAL` raises at the boundary
    * instead). Double-mod keeps negative deltas in range.
    */
  def addMicrosWrap(t: Column, deltaMicros: Column): Column = {
    val us = (microsOfDay(t) + deltaMicros) % MicrosPerDay
    ofMicrosOfDay((us + MicrosPerDay) % MicrosPerDay)
  }

  /** Signed µs delta a − b (no day wrap — both are within one day). */
  def diffMicros(a: Column, b: Column): Column = microsOfDay(a) - microsOfDay(b)
}
