package graft

import graft.ops.Datetime
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.apache.spark.sql.Row

/** Datetime kernel semantics (minarrow §2.4): extraction conventions,
  * leap years, month-end clamping, truncation, unit diffs.
  */
class DatetimeSpec extends SparkSpec {

  private def tsDf(vs: Seq[Option[String]]) = {
    val schema = StructType(Seq(StructField("t", TimestampType, nullable = true)))
    spark.createDataFrame(
      spark.sparkContext.parallelize(
        vs.map(v => Row(v.map(java.sql.Timestamp.valueOf).orNull))), schema)
  }

  test("weekday convention Mon=0..Sun=6 (chrono num_days_from_monday)") {
    val df = tsDf(Seq(
      Some("2024-01-01 10:00:00"), // Monday
      Some("2024-01-06 10:00:00"), // Saturday
      Some("2024-01-07 10:00:00"), // Sunday
      None))
    assert(col1[Int](df.select(Datetime.weekday(col("t")))) ===
      Seq(Some(0), Some(5), Some(6), None))
  }

  test("leap year predicate incl. century rules (datetime_ops.rs:73)") {
    val df = tsDf(Seq(
      Some("2024-06-01 00:00:00"), Some("2023-06-01 00:00:00"),
      Some("2000-06-01 00:00:00"), Some("1900-06-01 00:00:00")))
    assert(col1[Boolean](df.select(Datetime.isLeapYear(col("t")))) ===
      Seq(Some(true), Some(false), Some(true), Some(false)))
  }

  test("add_months clamps to month end (datetime_ops.rs:185)") {
    val df = tsDf(Seq(Some("2024-01-31 00:00:00")))
    assert(col1[java.sql.Date](df.select(Datetime.addMonths(col("t"), 1))) ===
      Seq(Some(java.sql.Date.valueOf("2024-02-29"))))
    assert(col1[java.sql.Date](df.select(Datetime.addMonths(col("t"), 13))) ===
      Seq(Some(java.sql.Date.valueOf("2025-02-28"))))
  }

  test("truncate to units (datetime_ops.rs:635)") {
    val df = tsDf(Seq(Some("2024-02-15 13:45:27")))
    assert(col1[java.sql.Timestamp](df.select(Datetime.truncate(col("t"), "month"))) ===
      Seq(Some(java.sql.Timestamp.valueOf("2024-02-01 00:00:00"))))
    assert(col1[java.sql.Timestamp](df.select(Datetime.truncate(col("t"), "hour"))) ===
      Seq(Some(java.sql.Timestamp.valueOf("2024-02-15 13:00:00"))))
  }

  test("diff in chosen units truncates like whole_days/whole_seconds (datetime_ops.rs:252)") {
    val df = tsDf(Seq(Some("2024-03-01 12:00:00")))
    val origin = lit("2024-02-28 00:00:00").cast("timestamp")
    assert(col1[Long](df.select(Datetime.diffDays(col("t"), origin))) === Seq(Some(2L)))
    assert(col1[Long](df.select(Datetime.diffSeconds(col("t"), origin))) ===
      Seq(Some(2L * 86400 + 12 * 3600)))
    assert(col1[Long](df.select(Datetime.absDiffDays(origin, col("t")))) === Seq(Some(2L)))
    // 23:00 -> 01:00 next day: 2h elapsed = 0 whole days (calendar datediff
    // would say 1 — the reference counts elapsed duration, not boundaries)
    val lateNight = tsDf(Seq(Some("2024-03-02 01:00:00")))
    val prevEvening = lit("2024-03-01 23:00:00").cast("timestamp")
    assert(col1[Long](lateNight.select(Datetime.diffDays(col("t"), prevEvening))) === Seq(Some(0L)))
    // fractional seconds truncate toward zero in both directions
    val t1 = tsDf(Seq(Some("2024-03-01 00:00:01.500")))
    val base = lit("2024-03-01 00:00:00").cast("timestamp")
    assert(col1[Long](t1.select(Datetime.diffSeconds(col("t"), base))) === Seq(Some(1L)))
    assert(col1[Long](t1.select(Datetime.diffSeconds(base, col("t")))) === Seq(Some(-1L)))
  }

  test("interval/duration column ops (Duration64 + Interval, arrow_dtype.rs:84-121)") {
    import graft.ops.Intervals
    val df = tsDf(Seq(Some("1995-01-03 10:30:00")))
    val base = lit("1995-01-01 08:00:00").cast("timestamp")
    val itv = Intervals.durationBetween(col("t"), base) // 2d 2:30:00
    assert(col1[Long](df.select(Intervals.wholeSeconds(itv))) === Seq(Some(181800L)))
    assert(col1[Long](df.select(Intervals.dayField(itv))) === Seq(Some(2L)))
    assert(col1[Long](df.select(Intervals.wholeSeconds(Intervals.scale(itv, lit(2))))) ===
      Seq(Some(363600L)))
    assert(col1[java.sql.Timestamp](df.select(Intervals.shift(base, Intervals.dayTime(0, 1, 30, 0)))) ===
      Seq(Some(java.sql.Timestamp.valueOf("1995-01-01 09:30:00"))))
    assert(col1[java.sql.Timestamp](df.select(Intervals.shift(base, Intervals.yearMonth(0, 3)))) ===
      Seq(Some(java.sql.Timestamp.valueOf("1995-04-01 08:00:00"))))
    assert(col1[java.sql.Timestamp](df.select(Intervals.shift(base, Intervals.durationFromSeconds(lit(3600L))))) ===
      Seq(Some(java.sql.Timestamp.valueOf("1995-01-01 09:00:00"))))
    // Time64 analog: µs since midnight
    assert(col1[Long](df.select(Intervals.timeOfDayMicros(col("t")))) ===
      Seq(Some((10L * 3600 + 30 * 60) * 1000000L)))
    // duration ordering is native: min/max aggregate over intervals
    val two = tsDf(Seq(Some("1995-01-03 10:30:00"), Some("1995-01-02 00:00:00")))
    val mx = two.agg(max(Intervals.durationBetween(col("t"), base)).cast("long")).collect()
    assert(mx.head.getLong(0) === 181800L)
  }

  test("timezone conversion (lookup_timezone, datetime/tz.rs:502)") {
    val df = tsDf(Seq(Some("2024-06-15 12:00:00"))) // UTC session
    assert(col1[java.sql.Timestamp](df.select(Datetime.toTimezone(col("t"), "America/New_York"))) ===
      Seq(Some(java.sql.Timestamp.valueOf("2024-06-15 08:00:00")))) // EDT = UTC-4
    assert(col1[java.sql.Timestamp](df.select(Datetime.toTimezone(col("t"), "+05:30"))) ===
      Seq(Some(java.sql.Timestamp.valueOf("2024-06-15 17:30:00")))) // raw offset
    // round-trip law
    assert(col1[java.sql.Timestamp](df.select(
      Datetime.fromTimezone(Datetime.toTimezone(col("t"), "Europe/Berlin"), "Europe/Berlin"))) ===
      Seq(Some(java.sql.Timestamp.valueOf("2024-06-15 12:00:00"))))
  }

  test("timezone conversion respects DST transitions") {
    // America/New_York: EST (UTC-5) in winter, EDT (UTC-4) in summer
    val df = tsDf(Seq(Some("2024-01-15 12:00:00"), Some("2024-07-15 12:00:00")))
    assert(col1[java.sql.Timestamp](df.select(Datetime.toTimezone(col("t"), "America/New_York"))) ===
      Seq(Some(java.sql.Timestamp.valueOf("2024-01-15 07:00:00")),
          Some(java.sql.Timestamp.valueOf("2024-07-15 08:00:00"))))
  }

  test("ns epoch normalization is exact beyond double precision") {
    val ns = 1704067200123456789L // .123456789 s — µs must survive
    val df = longs("e", Seq(Some(ns)))
    val us = col1[Long](df.select(Datetime.toEpochMicros(Datetime.fromEpoch(col("e"), "ns"))))
    assert(us === Seq(Some(1704067200123456L)))
  }

  test("epoch unit normalization round-trips (time_units.rs:42)") {
    val df = longs("e", Seq(Some(1704067200L))) // 2024-01-01 00:00:00 UTC
    assert(col1[java.sql.Timestamp](df.select(Datetime.fromEpoch(col("e"), "s"))) ===
      Seq(Some(java.sql.Timestamp.valueOf("2024-01-01 00:00:00"))))
    val us = col1[Long](df.select(Datetime.toEpochMicros(Datetime.fromEpoch(col("e"), "s"))))
    assert(us === Seq(Some(1704067200000000L)))
  }

  test("time-of-day surface: roundtrip, wraparound, midnight edges") {
    import graft.ops.TimeOfDay
    GraftConf.tune(spark) // TIME(n) is flag-gated
    // µs-of-day roundtrip at the edges of the day and at full µs precision
    val edges = Seq(Some(0L), Some(1L), Some(47107123456L), Some(86399999999L), None)
    val df = longs("us", edges)
    assert(col1[Long](df.select(TimeOfDay.microsOfDay(TimeOfDay.ofMicrosOfDay(col("us"))))) ===
      edges)
    // wraparound add: +2h over midnight, negative delta under midnight
    val t = df.select(TimeOfDay.ofMicrosOfDay(col("us")).as("t"))
    assert(col1[Long](t.select(TimeOfDay.microsOfDay(
      TimeOfDay.addMicrosWrap(col("t"), lit(7200000000L))))) ===
      Seq(Some(7200000000L), Some(7200000001L), Some(54307123456L),
        Some(7199999999L), None))
    assert(col1[Long](t.select(TimeOfDay.microsOfDay(
      TimeOfDay.addMicrosWrap(col("t"), lit(-1L))))) ===
      Seq(Some(86399999999L), Some(0L), Some(47107123455L), Some(86399999998L), None))
    // parse both forms; extraction keeps fractional seconds exactly
    val p = strings("s", Seq(Some("13:05:07.123456")))
      .select(TimeOfDay.parse(col("s")).as("t"))
    assert(col1[Int](p.select(TimeOfDay.hourOf(col("t")))) === Seq(Some(13)))
    assert(col1[java.math.BigDecimal](p.select(TimeOfDay.secondExact(col("t"))))
      .map(_.map(_.toPlainString)) === Seq(Some("7.123456")))
    val pp = strings("s", Seq(Some("13-05-07")))
      .select(TimeOfDay.parse(col("s"), "HH-mm-ss").as("t"))
    assert(col1[Long](pp.select(TimeOfDay.microsOfDay(col("t")))) === Seq(Some(47107000000L)))
    // trunc to minute
    assert(col1[Long](p.select(TimeOfDay.microsOfDay(
      TimeOfDay.truncTo("MINUTE", col("t"))))) === Seq(Some(47100000000L)))
  }

  test("MonthDayNano interval: no field carry, negatives, EOM clamp, ns->us truncation") {
    import graft.ops.Intervals
    val df = tsDf(Seq(Some("2024-01-31 12:00:00")))
    // fields stay independent: 1 month + 40 days + 25h-of-ns does NOT
    // normalize (Arrow MonthDayNano semantics)
    val big = Intervals.monthDayNano(lit(1), lit(40), lit(25L * 3600L * 1000000000L))
    val fields = df.select(
      big.getField("months"), big.getField("days"), big.getField("nanos")).head
    assert((fields.getInt(0), fields.getInt(1), fields.getLong(2)) ===
      ((1, 40, 90000000000000L)))
    // shift applies months first (EOM clamp: Jan 31 + 1m = Feb 29 in a
    // leap year), then days, then nanos
    val shifted = col1[java.sql.Timestamp](df.select(
      Intervals.mdnShift(col("t"), big))).head.get
    assert(shifted === java.sql.Timestamp.valueOf("2024-04-10 13:00:00"))
    // add/scale/negate are field-wise; subtracting a scaled copy returns
    // to a pure negative of the base
    val b = Intervals.monthDayNano(lit(2), lit(3), lit(4000L))
    val combo = Intervals.mdnSubtract(b, Intervals.mdnScale(b, lit(2)))
    val cf = df.select(combo.getField("months"), combo.getField("days"),
      combo.getField("nanos")).head
    assert((cf.getInt(0), cf.getInt(1), cf.getLong(2)) === ((-2, -3, -4000L)))
    // negative ns truncate toward zero at the us boundary: -1500ns -> -1us
    val tiny = Intervals.monthDayNano(lit(0), lit(0), lit(-1500L))
    val back = col1[java.sql.Timestamp](df.select(
      Intervals.mdnShift(col("t"), tiny))).head.get
    assert(back === java.sql.Timestamp.valueOf("2024-01-31 11:59:59.999999"))
  }
}
