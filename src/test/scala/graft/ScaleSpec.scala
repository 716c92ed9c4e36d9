package graft

import graft.ops.AsOfJoin
import org.apache.spark.sql.functions._

/** Scale-mechanics checks: bucketed co-located joins eliminate shuffles;
  * as-of join correctness against a hand-computed model.
  */
class ScaleSpec extends SparkSpec {
  import spark.implicits._

  test("bucketed tables join without a shuffle exchange") {
    spark.sql("DROP TABLE IF EXISTS li_b")
    spark.sql("DROP TABLE IF EXISTS ord_b")
    // the in-memory catalog forgets tables across JVMs but their files
    // persist in spark-warehouse — clear the locations too
    Seq("li_b", "ord_b").foreach { t =>
      val dir = new java.io.File(s"spark-warehouse/$t")
      if (dir.exists()) {
        java.nio.file.Files.walk(dir.toPath).sorted(java.util.Comparator.reverseOrder())
          .forEach(p => java.nio.file.Files.deleteIfExists(p))
      }
    }
    Tables.lineitem(spark, "/root/testdata/sf0.001")
      .write.bucketBy(8, "l_orderkey").sortBy("l_orderkey").saveAsTable("li_b")
    Tables.orders(spark, "/root/testdata/sf0.001")
      .withColumnRenamed("o_orderkey", "l_orderkey")
      .write.bucketBy(8, "l_orderkey").sortBy("l_orderkey").saveAsTable("ord_b")
    // disable auto-broadcast so the join would otherwise shuffle
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val joined = spark.table("li_b").join(spark.table("ord_b"), "l_orderkey")
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"), s"bucketed join still shuffles:\n$plan")
      assert(joined.count() === 6000L)
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  test("asOf join matches a hand-computed model") {
    val quotes = Seq( // key, time, price
      ("a", 1L, 10.0), ("a", 5L, 11.0), ("a", 9L, 12.0),
      ("b", 2L, 20.0)).toDF("k", "qt", "price")
    val trades = Seq( // key, time
      ("a", 0L), ("a", 1L), ("a", 6L), ("a", 100L),
      ("b", 1L), ("b", 3L)).toDF("k", "tt")
    val out = AsOfJoin.asOf(trades, quotes, "tt", "qt", Seq("k"))
      .orderBy(col("k"), col("tt"))
      .collect().map(r => (r.getString(0), r.getLong(1),
        if (r.isNullAt(3)) None else Some(r.getDouble(3))))
    assert(out.toSeq === Seq(
      ("a", 0L, None),        // before first quote
      ("a", 1L, Some(10.0)),  // inclusive at equal time
      ("a", 6L, Some(11.0)),
      ("a", 100L, Some(12.0)),
      ("b", 1L, None),
      ("b", 3L, Some(20.0))))
  }
}
