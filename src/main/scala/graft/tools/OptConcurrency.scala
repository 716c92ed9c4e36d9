package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Wall-clock comparison of serial vs bounded-concurrent
  * optimizePartitioned on a MANY-SMALL-PARTITION fixture (orders
  * partitioned by month — the shape where one partition's job cannot
  * saturate the cluster and the Delta-style concurrent OPTIMIZE pays).
  * Result content is cross-checked between the two runs.
  *
  * Usage: runMain graft.tools.OptConcurrency <sfDir> [maxConcurrent]
  */
object OptConcurrency {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val conc = if (args.length > 1) args(1).toInt else 4
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .appName("graft-opt-concurrency")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_SHUFFLE_PARTITIONS", cpus))
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val src = spark.read.parquet(sfDir + "/orders.parquet")
      .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"),
        date_format(col("o_orderdate"), "yyyy-MM").as("o_month"))
    def build(dir: String): Unit =
      src.repartition(8).write.partitionBy("o_month").mode("overwrite").parquet(dir)
    def contentHash(dir: String): (Long, Long) = {
      // xor-fold (order-independent; rows are key-unique) — a SUM of
      // 64-bit hashes overflows under ANSI mode
      val r = spark.read.parquet(dir)
        .agg(bit_xor(xxhash64(col("o_orderkey"), col("o_custkey"),
          col("o_totalprice"), col("o_month"))), count(lit(1))).collect()(0)
      (r.getLong(0), r.getLong(1))
    }
    def run(mc: Int): (Double, Int, (Long, Long)) = {
      val dir = java.nio.file.Files
        .createTempDirectory(s"graft_opt_conc_$mc").toString
      build(dir)
      val t0 = System.nanoTime()
      val done = graft.ops.ZOrder.optimizePartitioned(spark, dir, "o_month",
        Seq("o_custkey", "o_totalprice"), filesPerPartition = 2,
        maxConcurrent = mc)
      val sec = (System.nanoTime() - t0) / 1e9
      val h = contentHash(dir)
      graft.ops.Layout.deleteRecursively(java.nio.file.Paths.get(dir))
      (sec, done.size, h)
    }
    val (serialSec, nSerial, hSerial) = run(1)
    val (concSec, nConc, hConc) = run(conc)
    require(nSerial == nConc && hSerial == hConc,
      "serial and concurrent OPTIMIZE disagree on content")
    println(s"""{"tool":"opt-concurrency","sf_dir":"$sfDir","partitions":$nSerial,""" +
      s""""serial_sec":$serialSec,"concurrent_sec":$concSec,""" +
      s""""max_concurrent":$conc,"speedup":${serialSec / concSec}}""")
    spark.stop()
  }
}
