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

  test("JSON-lines round-trip preserves values incl. timestamps") {
    val dir = java.nio.file.Files.createTempDirectory("graft_json").toString
    val src = ordersSample
    TextSources.writeJsonLines(src, dir)
    val back = TextSources.readJsonLines(spark, dir, src.schema)
    val a = src.orderBy(col("o_orderkey")).collect().map(_.toSeq)
    val b = back.orderBy(col("o_orderkey")).collect().map(_.toSeq)
    assert(a.toSeq === b.toSeq)
  }
}
