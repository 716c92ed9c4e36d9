package graft

import graft.ops.Introspect
import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.types._
import java.time.Instant

/** Golden-file display parity (SURVEY.md §5 pattern-1 translation): pins
  * `Introspect.render` / `schemaTree` output character-for-character
  * against committed golden files, the analog of the reference's Display
  * assertions (`/root/reference/src/structs/table.rs:934` Display for
  * Table, `/root/reference/src/traits/print.rs:49` value_to_string).
  *
  * Regenerate after an INTENTIONAL format change with:
  *   GRAFT_REGEN_GOLDEN=1 sbt "testOnly graft.IntrospectGoldenSpec"
  * then review the diff like any other code change.
  */
class IntrospectGoldenSpec extends SparkSpec {

  private val goldenDir = java.nio.file.Paths.get("src/test/resources/golden")

  private def checkGolden(name: String, actual: String): Unit = {
    val path = goldenDir.resolve(name)
    if (sys.env.contains("GRAFT_REGEN_GOLDEN")) {
      java.nio.file.Files.createDirectories(goldenDir)
      java.nio.file.Files.write(path, actual.getBytes("UTF-8"))
      info(s"regenerated $path")
    } else {
      assert(java.nio.file.Files.exists(path), s"missing golden file $path — run with GRAFT_REGEN_GOLDEN=1")
      val expected = new String(java.nio.file.Files.readAllBytes(path), "UTF-8")
      assert(actual === expected, s"render drifted from golden $name")
    }
  }

  /** One table covering every §1.2 display-relevant type: ints of all
    * widths, floats (trim/NaN/negative), bool, string, dict-tagged
    * string, date, timestamp (midnight + fractional) — each with a null.
    */
  private def typesFixture: DataFrame = {
    val schema = StructType(Seq(
      StructField("i64", LongType), StructField("i32", IntegerType),
      StructField("i16", ShortType), StructField("i8", ByteType),
      StructField("f64", DoubleType), StructField("f32", FloatType),
      StructField("b", BooleanType), StructField("s", StringType),
      StructField("cat", StringType), StructField("d", DateType),
      StructField("ts", TimestampType)))
    def ts(s: String) = java.sql.Timestamp.from(Instant.parse(s))
    def dt(epochDay: Long) = new java.sql.Date(epochDay * 86400000L)
    val rows = Seq(
      Row(1L, 10, 100.toShort, 1.toByte, 1.5, 2.5f, true, "alpha", "red", dt(0L), ts("2024-03-01T12:34:56.789Z")),
      Row(-9223372036854775808L, -2147483648, -32768.toShort, -128.toByte, 123.456789, -0.25f, false, "", "green", dt(19810L), ts("2024-03-01T00:00:00Z")),
      Row(42L, 7, 0.toShort, 0.toByte, 0.000001, 1e6f, true, "héllo wörld", "red", dt(-1L), ts("1969-12-31T23:59:59.999999Z")),
      Row(null, null, null, null, Double.NaN, null, null, null, null, null, null),
      Row(7L, 8, 9.toShort, 10.toByte, -1000000.0, 0.5f, false, "tab\tsep", "blue", dt(20000L), ts("2038-01-19T03:14:07.5Z")))
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(rows.toIndexedSeq, 1), schema)
    Introspect.tagDictionary(df, "cat")
  }

  test("render matches the committed golden for every §1.2 type") {
    checkGolden("render_types.txt", Introspect.render(typesFixture, name = "types"))
  }

  test("schemaTree matches the committed golden") {
    checkGolden("schema_types.txt", Introspect.schemaTree(typesFixture))
  }

  test("render matches the golden preview shape past MAX_PREVIEW (first 10 … last 10)") {
    val schema = StructType(Seq(
      StructField("id", LongType, nullable = false),
      StructField("sq", DoubleType, nullable = false)))
    val rows = (0L until 55L).map(i => Row(i, i * i / 4.0))
    val df = spark.createDataFrame(spark.sparkContext.parallelize(rows, 1), schema)
    checkGolden("render_preview.txt", Introspect.render(df, name = "preview"))
  }

  test("format primitives pin the reference's conventions") {
    // format_float (print.rs:174): {:.6} trimmed
    assert(Introspect.formatFloat(1.5) === "1.5")
    assert(Introspect.formatFloat(123.456789) === "123.456789")
    assert(Introspect.formatFloat(0.000001) === "0.000001")
    assert(Introspect.formatFloat(1.0e-7) === "0") // rounds away at 6 digits, then trims
    assert(Introspect.formatFloat(2.0) === "2")
    assert(Introspect.formatFloat(-0.25) === "-0.25")
    assert(Introspect.formatFloat(Double.NaN) === "NaN")
    assert(Introspect.formatFloat(Double.PositiveInfinity) === "inf")
    // time-crate Display (print.rs:202): unpadded hour, minimal fraction
    assert(Introspect.formatDatetimeMicros(0L) === "1970-01-01 0:00:00.0 +00:00:00")
    assert(Introspect.formatDatetimeMicros(1709296496789000L) === "2024-03-01 12:34:56.789 +00:00:00")
    assert(Introspect.formatDatetimeMicros(-1L) === "1969-12-31 23:59:59.999999 +00:00:00")
    assert(Introspect.formatDatetimeMicros(1500000L) === "1970-01-01 0:00:01.5 +00:00:00")
  }

  test("date cells render the local date, not a UTC millis division") {
    // collect() pins java.sql.Date to LOCAL midnight; in a +09:00 zone
    // the old getTime/86400000 form printed the PREVIOUS day. Construct
    // the Date under Tokyo time exactly as a collect() there would.
    val old = java.util.TimeZone.getDefault
    try {
      java.util.TimeZone.setDefault(java.util.TimeZone.getTimeZone("Asia/Tokyo"))
      val d = java.sql.Date.valueOf("2024-03-28")
      assert(Introspect.valueToString(d, DateType)
        .startsWith("2024-03-28 "), "date shifted by the JVM timezone")
    } finally java.util.TimeZone.setDefault(old)
  }
}
