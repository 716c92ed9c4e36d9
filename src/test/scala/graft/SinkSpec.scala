package graft

import org.apache.spark.sql.functions._

/** Sink-side scale mechanics: partitioned parquet layout + partition
  * pruning, and the typed Dataset endpoint (SURVEY §1.3).
  */
class SinkSpec extends SparkSpec {
  import spark.implicits._

  test("partitionBy sink + partition-pruned scan") {
    import graft.sources.Sinks
    val out = java.nio.file.Files.createTempDirectory("graft_part").toString
    Sinks.writePartitioned(Tables.events(spark, "/root/testdata/sf0.001"), out, Seq("event_type"))
    val dirs = new java.io.File(out).listFiles().filter(_.isDirectory).map(_.getName)
    assert(dirs.count(_.startsWith("event_type=")) === 5)
    val pruned = Sinks.readPartitioned(spark, out).filter(col("event_type") === "signup")
    val plan = pruned.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters: [isnotnull(event_type"), s"no partition pruning:\n$plan")
    assert(pruned.count() === Tables.events(spark, "/root/testdata/sf0.001")
      .filter(col("event_type") === "signup").count())
  }

  test("typed Dataset endpoint: case-class rows with compile-time fields") {
    val ds = Tables.lineitem(spark, "/root/testdata/sf0.001")
      .select(col("l_orderkey"), col("l_quantity"), col("l_returnflag"))
      .as[(Long, Double, String)]
    val byFlag = ds.filter(_._2 > 25.0).groupByKey(_._3).count().collect().toMap
    val sqlCounts = Tables.lineitem(spark, "/root/testdata/sf0.001")
      .filter(col("l_quantity") > 25).groupBy(col("l_returnflag")).count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(byFlag === sqlCounts)
  }
}
