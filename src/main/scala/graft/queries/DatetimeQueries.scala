package graft.queries

import graft.{QueryDef, Tables}
import graft.ops.Datetime
import org.apache.spark.sql.functions._

/** Datetime kernel queries (SURVEY.md §2.4 — minarrow trait DatetimeOps,
  * src/traits/datetime_ops.rs:39-137). events.ts is parquet TIMESTAMP(NANOS);
  * both Spark and DuckDB truncate to µs on read, keeping values comparable.
  */
object DatetimeQueries {

  val defs: Seq[QueryDef] = Seq(

    // Extraction surface. weekday() uses the reference convention Mon=0..Sun=6
    // (chrono num_days_from_monday); DuckDB isodow is Mon=1..Sun=7.
    QueryDef.sql(
      "q22_dt_extract",
      """SELECT event_id,
        |  CAST(year(ts) AS BIGINT) AS y, CAST(month(ts) AS BIGINT) AS mo,
        |  CAST(day(ts) AS BIGINT) AS dd, CAST(hour(ts) AS BIGINT) AS hh,
        |  CAST(minute(ts) AS BIGINT) AS mi, CAST(second(ts) AS BIGINT) AS ss,
        |  CAST(isodow(ts) - 1 AS BIGINT) AS wd,
        |  CAST(dayofyear(ts) AS BIGINT) AS doy,
        |  CAST(weekofyear(ts) AS BIGINT) AS iw,
        |  CAST(quarter(ts) AS BIGINT) AS q,
        |  CAST(epoch_us(ts) - epoch_us(date_trunc('day', ts)) AS BIGINT) AS tod_us
        |FROM events WHERE event_id < 300 ORDER BY event_id""".stripMargin) { (s, d) =>
      Tables.events(s, d).filter(col("event_id") < 300)
        .select(
          col("event_id"),
          Datetime.yearOf(col("ts")).cast("long").as("y"),
          Datetime.monthOf(col("ts")).cast("long").as("mo"),
          Datetime.dayOf(col("ts")).cast("long").as("dd"),
          Datetime.hourOf(col("ts")).cast("long").as("hh"),
          Datetime.minuteOf(col("ts")).cast("long").as("mi"),
          Datetime.secondOf(col("ts")).cast("long").as("ss"),
          Datetime.weekday(col("ts")).cast("long").as("wd"),
          Datetime.dayOfYearOf(col("ts")).cast("long").as("doy"),
          Datetime.isoWeek(col("ts")).cast("long").as("iw"),
          Datetime.quarterOf(col("ts")).cast("long").as("q"),
          graft.ops.Intervals.timeOfDayMicros(col("ts")).as("tod_us"))
        .orderBy(col("event_id"))
    },

    // Arithmetic + truncation + differencing (datetime_ops.rs :78-99, :114).
    QueryDef.sql(
      "q23_dt_arith",
      """SELECT l_orderkey, l_linenumber,
        |  CAST(CAST(l_shipdate AS DATE) + 30 AS TIMESTAMP) AS ship_plus30,
        |  CAST(CAST(l_shipdate AS DATE) + INTERVAL 2 MONTH AS TIMESTAMP) AS ship_plus2m,
        |  CAST(CAST(l_shipdate AS DATE) + INTERVAL 36 MONTH AS TIMESTAMP) AS ship_plus3y,
        |  CAST(date_trunc('month', CAST(l_shipdate AS DATE)) AS TIMESTAMP) AS ship_month,
        |  CAST(date_diff('day', DATE '1995-01-01', CAST(l_shipdate AS DATE)) AS BIGINT) AS days_since,
        |  (year(l_shipdate) % 4 = 0 AND (year(l_shipdate) % 100 <> 0 OR year(l_shipdate) % 400 = 0)) AS leap
        |FROM lineitem WHERE l_orderkey < 1500
        |ORDER BY l_orderkey, l_linenumber""".stripMargin) { (s, d) =>
      Tables.lineitem(s, d).filter(col("l_orderkey") < 1500)
        .select(
          col("l_orderkey"), col("l_linenumber"),
          Datetime.addDays(col("l_shipdate"), 30).cast("timestamp").as("ship_plus30"),
          Datetime.addMonths(col("l_shipdate"), 2).cast("timestamp").as("ship_plus2m"),
          Datetime.addYears(col("l_shipdate"), 3).cast("timestamp").as("ship_plus3y"),
          trunc(col("l_shipdate").cast("date"), "month").cast("timestamp").as("ship_month"),
          Datetime.diffDays(col("l_shipdate"), to_date(lit("1995-01-01"))).as("days_since"),
          Datetime.isLeapYear(col("l_shipdate")).as("leap"))
        .orderBy(col("l_orderkey"), col("l_linenumber"))
    },

    // Duration/Interval column surface (Duration64 + Interval(YearMonth/
    // DayTime), arrow_dtype.rs:84-121): interval-typed columns flow through
    // the plan (subtraction -> scaling -> extraction -> timestamp shift);
    // only the final projection lands on scalar types for the oracle.
    // DuckDB INTERVAL is the oracle. Broadcast join: the filtered orders
    // side is tiny; lineitem is never shuffled.
    QueryDef.sql(
      "q71_interval_ops",
      """WITH j AS (
        |  SELECT l_orderkey, l_linenumber, l_shipdate, o_orderdate,
        |    l_shipdate - o_orderdate AS itv
        |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |  WHERE l_orderkey < 1500)
        |SELECT l_orderkey, l_linenumber,
        |  CAST(date_part('day', itv) AS BIGINT) AS lag_days,
        |  CAST(epoch(itv) AS BIGINT) AS lag_secs,
        |  CAST(epoch(itv * 2) AS BIGINT) AS lag_secs_x2,
        |  l_shipdate + INTERVAL 90 MINUTE AS ship_plus_90m,
        |  o_orderdate + INTERVAL 3 MONTH AS ord_plus_q,
        |  l_shipdate + to_seconds(3600) AS ship_plus_dur
        |FROM j ORDER BY l_orderkey, l_linenumber""".stripMargin) { (s, d) =>
      import graft.ops.Intervals
      val li = Tables.lineitem(s, d).filter(col("l_orderkey") < 1500)
        .select(col("l_orderkey"), col("l_linenumber"), col("l_shipdate"))
      val ord = Tables.orders(s, d).filter(col("o_orderkey") < 1500)
        .select(col("o_orderkey"), col("o_orderdate"))
      val itv = Intervals.durationBetween(col("l_shipdate"), col("o_orderdate"))
      li.join(broadcast(ord), col("l_orderkey") === col("o_orderkey"))
        .select(
          col("l_orderkey"), col("l_linenumber"),
          Intervals.dayField(itv).as("lag_days"),
          Intervals.wholeSeconds(itv).as("lag_secs"),
          Intervals.wholeSeconds(Intervals.scale(itv, lit(2))).as("lag_secs_x2"),
          Intervals.shift(col("l_shipdate"), Intervals.dayTime(0, 1, 30, 0)).as("ship_plus_90m"),
          Intervals.shift(col("o_orderdate"), Intervals.yearMonth(0, 3)).as("ord_plus_q"),
          Intervals.shift(col("l_shipdate"), Intervals.durationFromSeconds(lit(3600L))).as("ship_plus_dur"))
        .orderBy(col("l_orderkey"), col("l_linenumber"))
    },

    // Interval(MonthDaysNs) — Arrow's three-field month/day/nanosecond
    // interval (time_units.rs:71), which Spark's two-family ANSI intervals
    // can't carry losslessly: struct-backed (months, days, nanos) with
    // field-wise make/add/negate/scale and a calendar-correct timestamp
    // shift (months with end-of-month clamping, then days, then nanos
    // truncated to µs at the timestamp boundary). DuckDB's INTERVAL is the
    // SAME triple at µs precision, so the oracle replays every op
    // natively; the gate keeps nanos on multiples of 1000 so the ns→µs
    // boundary is exact both sides. Projection-only: codegen, shuffle-free.
    QueryDef.sql(
      "q132_interval_mdn",
      """SELECT o_orderkey,
        |  CAST((o_orderkey % 7) * 2 + 1 AS INT) AS months,
        |  CAST((o_orderkey % 29) * 2 + 2 AS INT) AS days,
        |  CAST(((o_orderkey % 86400) * 1000000 + 45000) * 2 + 3000 AS BIGINT) AS nanos,
        |  CAST(o_orderdate AS TIMESTAMP)
        |    + to_months(CAST((o_orderkey % 7) * 2 + 1 AS INT))
        |    + to_days(CAST((o_orderkey % 29) * 2 + 2 AS INT))
        |    + to_microseconds((CAST((o_orderkey % 86400) * 1000000 + 45000 AS BIGINT) * 2 + 3000) // CAST(1000 AS BIGINT)) AS shifted,
        |  CAST(o_orderdate AS TIMESTAMP)
        |    + to_months(CAST(-(o_orderkey % 7) AS INT))
        |    + to_days(CAST(-(o_orderkey % 29) AS INT))
        |    + to_microseconds(-(CAST((o_orderkey % 86400) * 1000000 + 45000 AS BIGINT)) // CAST(1000 AS BIGINT)) AS shifted_back
        |FROM orders WHERE o_orderkey < 2000
        |ORDER BY o_orderkey""".stripMargin) { (s, d) =>
      import graft.ops.Intervals
      val base = Intervals.monthDayNano(
        col("o_orderkey") % 7,
        col("o_orderkey") % 29,
        (col("o_orderkey") % 86400) * 1000000L + 45000L)
      val itv = Intervals.mdnAdd(
        Intervals.mdnScale(base, lit(2)),
        Intervals.monthDayNano(lit(1), lit(2), lit(3000L)))
      Tables.orders(s, d).filter(col("o_orderkey") < 2000)
        .select(col("o_orderkey"),
          itv.getField("months").as("months"),
          itv.getField("days").as("days"),
          itv.getField("nanos").as("nanos"),
          Intervals.mdnShift(col("o_orderdate"), itv).as("shifted"),
          Intervals.mdnShift(col("o_orderdate"), Intervals.mdnNegate(base)).as("shifted_back"))
        .orderBy(col("o_orderkey"))
    },

    // Tumbling-window aggregation over the event stream's time column —
    // batch form of the streaming windowed agg (SURVEY.md §2.11); the same
    // date_trunc bucketing runs under Structured Streaming in
    // graft.streaming.
    QueryDef.sql(
      "q24_dt_bucketed_agg",
      """SELECT date_trunc('hour', ts) AS bucket, event_type,
        |  CAST(COUNT(*) AS BIGINT) AS n,
        |  ROUND(SUM(value), 2) AS total_value
        |FROM events
        |GROUP BY bucket, event_type
        |ORDER BY bucket, event_type""".stripMargin) { (s, d) =>
      Tables.events(s, d)
        .groupBy(
          Datetime.truncate(col("ts"), "hour").as("bucket"),
          col("event_type"))
        .agg(
          count(lit(1)).as("n"),
          round(sum(col("value")), 2).as("total_value"))
        .orderBy(col("bucket"), col("event_type"))
    },

    // Time-of-day (TIME) surface: Spark 4.1's native TIME(6) type as the
    // reference's Time64(Microsecond) analog — construct from a timestamp,
    // extract fields, truncate, wraparound arithmetic, compare. Output is
    // all-integer (the TIME values' µs physical form) so the oracle
    // compare stays engine-neutral; DuckDB computes the same fields from
    // CAST(ts AS TIME).
    QueryDef.sql(
      "q96_time_of_day",
      """SELECT event_id,
        |  CAST(date_part('hour', t) AS INT) AS h,
        |  CAST(date_part('minute', t) AS INT) AS m,
        |  CAST(date_part('second', t) AS INT) AS s_int,
        |  epoch_us(t) AS us_day,
        |  (epoch_us(t) // 60000000) * 60000000 AS trunc_min_us,
        |  (epoch_us(t) + 26580000000) % 86400000000 AS wrap_us,
        |  t < TIME '12:00:00' AS am
        |FROM (SELECT event_id, CAST(ts AS TIME) AS t FROM events
        |      WHERE event_id < 2000)
        |ORDER BY event_id""".stripMargin) { (s, d) =>
      import graft.ops.TimeOfDay
      val t = TimeOfDay.ofTimestamp(col("ts"))
      Tables.events(s, d).filter(col("event_id") < 2000)
        .select(col("event_id"), t.as("t"))
        .select(
          col("event_id"),
          TimeOfDay.hourOf(col("t")).as("h"),
          TimeOfDay.minuteOf(col("t")).as("m"),
          TimeOfDay.secondOf(col("t")).as("s_int"),
          TimeOfDay.microsOfDay(col("t")).as("us_day"),
          TimeOfDay.microsOfDay(TimeOfDay.truncTo("MINUTE", col("t"))).as("trunc_min_us"),
          // +7h23m — crosses midnight for late events, exercising the wrap
          TimeOfDay.microsOfDay(TimeOfDay.addMicrosWrap(col("t"), lit(26580000000L))).as("wrap_us"),
          (col("t") < TimeOfDay.parse(lit("12:00:00"))).as("am"))
        .orderBy(col("event_id"))
    },

    // Timezone conversion against the IANA database (tz.rs:502 lookup
    // surface), oracle-checked: UTC → America/New_York wall time, the
    // derived UTC offset (flips -5/-4 across the DST edges — events are
    // spread over 12 months via month arithmetic to cover both), and a
    // half-hour zone (Asia/Kolkata, +330 min). Offsets are derived from
    // the µs epochs, so both engines do exact integer arithmetic; the
    // ambiguous fall-back hour is avoided by using only instant-total
    // conversions (UTC→local), never local→UTC.
    QueryDef.sql(
      "q114_timezone",
      """WITH e AS (
        |  SELECT event_id, ts + TO_MONTHS(CAST(event_id % 12 AS INT)) AS ts2
        |  FROM events WHERE event_id < 2000),
        |n AS (
        |  SELECT event_id, ts2,
        |    timezone('America/New_York', CAST(ts2 AS TIMESTAMPTZ)) AS ny,
        |    timezone('Asia/Kolkata', CAST(ts2 AS TIMESTAMPTZ)) AS ist
        |  FROM e)
        |SELECT event_id, ny AS ny_wall,
        |  CAST(hour(ny) AS BIGINT) AS ny_hour,
        |  CAST((epoch_us(ny) - epoch_us(ts2)) // CAST(3600000000 AS BIGINT) AS BIGINT) AS ny_off_h,
        |  CAST((epoch_us(ist) - epoch_us(ts2)) // CAST(60000000 AS BIGINT) AS BIGINT) AS ist_off_min
        |FROM n ORDER BY event_id""".stripMargin) { (s, d) =>
      val e = Tables.events(s, d).filter(col("event_id") < 2000)
        .select(col("event_id"),
          expr("timestampadd(MONTH, CAST(event_id % 12 AS INT), ts)").as("ts2"))
      e.select(col("event_id"), col("ts2"),
          Datetime.toTimezone(col("ts2"), "America/New_York").as("ny"),
          Datetime.toTimezone(col("ts2"), "Asia/Kolkata").as("ist"))
        .select(col("event_id"),
          col("ny").cast("timestamp_ntz").as("ny_wall"),
          hour(col("ny")).cast("long").as("ny_hour"),
          expr("(unix_micros(ny) - unix_micros(ts2)) div 3600000000L").as("ny_off_h"),
          expr("(unix_micros(ist) - unix_micros(ts2)) div 60000000L").as("ist_off_min"))
        .orderBy(col("event_id"))
    }
  )
}
