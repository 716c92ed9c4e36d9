package graft

import graft.sources.TextSources
import org.apache.spark.sql.functions._

/** CSV / JSON-lines round-trips with explicit schemas (§2.10). */
class TextSourcesSpec extends SparkSpec {

  private def ordersSample = Tables.orders(spark, "/root/testdata/sf0.001").limit(200)

  test("CSV round-trip preserves values incl. timestamps") {
    val dir = java.nio.file.Files.createTempDirectory("graft_csv").toString
    val src = ordersSample
    TextSources.writeCsv(src, dir)
    val back = TextSources.readCsv(spark, dir, src.schema)
    val a = src.orderBy(col("o_orderkey")).collect().map(_.toSeq)
    val b = back.orderBy(col("o_orderkey")).collect().map(_.toSeq)
    assert(a.toSeq === b.toSeq)
  }

  test("NTZ timestamps with non-zero microseconds survive CSV and JSON round-trips") {
    // timestampFormat does NOT apply to TIMESTAMP_NTZ columns (separate
    // timestampNTZFormat option) — without it, sub-second precision is
    // silently truncated to the default millis pattern
    import org.apache.spark.sql.types._
    val schema = StructType(Seq(
      StructField("id", LongType), StructField("t", TimestampNTZType)))
    val src = spark.createDataFrame(
      java.util.Arrays.asList(
        org.apache.spark.sql.Row(1L, java.time.LocalDateTime.parse("2024-03-01T12:34:56.123456")),
        org.apache.spark.sql.Row(2L, java.time.LocalDateTime.parse("2024-03-01T00:00:00.000001"))),
      schema)
    for ((write, read) <- Seq[((org.apache.spark.sql.DataFrame, String) => Unit,
        (org.apache.spark.sql.SparkSession, String, StructType) => org.apache.spark.sql.DataFrame)](
      (TextSources.writeCsv _, TextSources.readCsv _),
      (TextSources.writeJsonLines _, TextSources.readJsonLines _))) {
      val dir = java.nio.file.Files.createTempDirectory("graft_ntz").toString
      write(src, dir)
      val back = read(spark, dir, schema)
      assert(back.orderBy(col("id")).collect().map(_.toSeq).toSeq ===
        src.orderBy(col("id")).collect().map(_.toSeq).toSeq)
    }
  }

  test("JSON-lines round-trip preserves values incl. timestamps") {
    val dir = java.nio.file.Files.createTempDirectory("graft_json").toString
    val src = ordersSample
    TextSources.writeJsonLines(src, dir)
    val back = TextSources.readJsonLines(spark, dir, src.schema)
    val a = src.orderBy(col("o_orderkey")).collect().map(_.toSeq)
    val b = back.orderBy(col("o_orderkey")).collect().map(_.toSeq)
    assert(a.toSeq === b.toSeq)
  }

  test("quarantine read routes malformed lines without failing or dropping") {
    import org.apache.spark.sql.types._
    val dir = java.nio.file.Files.createTempDirectory("graft_quarantine").toString
    java.nio.file.Files.writeString(java.nio.file.Paths.get(dir, "data.jsonl"),
      """{"id": 1, "v": 10.5}
        |{"id": 2, "v": "not-a-number"}
        |this is not json at all
        |{"id": 4, "v": 2.25}
        |{"id": 5 BROKEN
        |""".stripMargin)
    val schema = StructType(Seq(
      StructField("id", LongType), StructField("v", DoubleType)))
    val (good, bad) = TextSources.readJsonLinesQuarantine(spark, dir, schema)
    val g = good.collect().map(r => (r.getLong(0), r.getDouble(1))).sorted.toSeq
    assert(g === Seq((1L, 10.5), (4L, 2.25)))
    val q = bad.collect().map(_.getString(0)).toSeq
    assert(q.length === 3, s"expected 3 quarantined lines, got: $q")
    assert(q.exists(_.contains("not-a-number")) && q.exists(_.contains("not json")) &&
      q.exists(_.contains("BROKEN")))
  }
}
