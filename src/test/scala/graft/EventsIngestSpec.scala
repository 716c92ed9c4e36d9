package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Pins the schema-adaptive events ingest boundary (Tables.normalizeTs).
  *
  * The driver's `events.parquet` fixture has shipped in two physical forms
  * across generations — parquet TIMESTAMP(NANOS) (arriving as Long
  * epoch-nanos under `spark.sql.legacy.parquet.nanosAsLong`) and plain
  * `timestamp[us]` with isAdjustedToUTC=false (arriving as TIMESTAMP_NTZ).
  * A regeneration from one form to the other once took down 27 gate
  * queries; this spec makes the boundary contract explicit so it can't
  * silently regress again. Reference semantics: minarrow's per-unit
  * `TimeUnit` normalization (src/enums/time_units.rs:42-57).
  */
class EventsIngestSpec extends SparkSpec {

  private val instantsUs = Seq(
    1700000000000000L,          // 2023-11-14T22:13:20Z
    1700000000123456L,          // sub-second µs precision survives
    0L,                         // epoch
    -5000000000123456L)         // 1811, negative but inside the ±292-year
                                // window TIMESTAMP(NANOS) can represent

  test("normalizeTs: Long epoch-nanos form truncates exactly to µs TimestampType") {
    val schema = StructType(Seq(StructField("ts", LongType, nullable = true)))
    // include a non-zero sub-µs remainder on the positive instants: NANOS →
    // µs must TRUNCATE (DuckDB parity), not round. Negative instants keep
    // remainder 0 — `DIV` truncates toward zero, and the fixture contract
    // has no sub-µs negative timestamps to define a direction against.
    val rows = instantsUs.map(us => Row(us * 1000L + (if (us >= 0) 999L else 0L))) :+ Row(null)
    val df = spark.createDataFrame(spark.sparkContext.parallelize(rows), schema)
    val out = Tables.normalizeTs(df)
    assert(out.schema("ts").dataType === TimestampType)
    val got = out.select(unix_micros(col("ts"))).collect().map(r => Option(r.get(0)))
    assert(got.toSeq === instantsUs.map(us => Some(us)) :+ None)
  }

  test("normalizeTs: TIMESTAMP_NTZ form is instant-preserving under the UTC session") {
    GraftConf.tune(spark)
    val ntz = spark.range(1)
      .select(explode(lit(instantsUs.toArray)).as("us"))
      .select(timestamp_micros(col("us")).cast(TimestampNTZType).as("ts"), col("us"))
    assert(ntz.schema("ts").dataType === TimestampNTZType)
    val out = Tables.normalizeTs(ntz)
    assert(out.schema("ts").dataType === TimestampType)
    assert(out.filter(unix_micros(col("ts")) =!= col("us")).count() === 0L)
  }

  test("normalizeTs: TimestampType passes through unchanged") {
    val df = spark.range(3).select(timestamp_micros(col("id") * 1000000L).as("ts"))
    val out = Tables.normalizeTs(df)
    assert(out.schema("ts").dataType === TimestampType)
    assert(out.select(unix_micros(col("ts"))).collect().map(_.getLong(0)).sorted.toSeq
      === Seq(0L, 1000000L, 2000000L))
  }

  test("a µs parquet round trip through Tables.events matches the in-memory NTZ path") {
    // Write a tiny timestamp[us] events fixture the way the driver now does
    // (Spark writes TIMESTAMP_NTZ as parquet timestamp[us],
    // isAdjustedToUTC=false) and run it through the REAL loader entry point.
    GraftConf.tune(spark)
    val dir = java.nio.file.Files.createTempDirectory("graft_events_us").toString
    spark.range(1)
      .select(explode(lit(instantsUs.toArray)).as("us"))
      .select(timestamp_micros(col("us")).cast(TimestampNTZType).as("ts"),
        (col("us") % 7).as("event_id"))
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val out = Tables.events(spark, dir)
    assert(out.schema("ts").dataType === TimestampType)
    assert(out.select(unix_micros(col("ts"))).collect().map(_.getLong(0)).sorted.toSeq
      === instantsUs.sorted)
  }

  test("the live driver fixture loads as µs TimestampType regardless of its physical form") {
    val sf = "/root/testdata/sf0.001"
    val out = Tables.events(spark, sf)
    assert(out.schema("ts").dataType === TimestampType)
    assert(out.count() > 0)
    // sanity: timestamps land in a plausible range (year 2000..2100), which
    // catches a unit-confusion (ns read as µs would land in year ~1970)
    val (lo, hi) = (946684800000000L, 4102444800000000L)
    assert(out.filter(unix_micros(col("ts")) < lo || unix_micros(col("ts")) > hi).count() === 0L)
  }
}
