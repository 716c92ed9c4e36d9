package graft.tools
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
object OptProfile {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val spark = SparkSession.builder().master("local[32]")
      .appName("opt-profile")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def t[A](tag: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"STAGE $tag%-28s ${(System.nanoTime()-t0)/1e9}%.2f s"); r
    }
    val dir = "/tmp/graft_opt_profile"
    graft.ops.Layout.deleteRecursively(java.nio.file.Paths.get(dir))
    t("write-partitioned-copy") {
      graft.Tables.lineitem(spark, sfDir)
        .select(col("l_returnflag"), col("l_quantity"), col("l_extendedprice"),
          col("l_orderkey"), col("l_partkey"), col("l_suppkey"))
        .repartition(4)
        .write.partitionBy("l_returnflag").mode("overwrite").parquet(dir)
    }
    val live = new java.io.File(dir).listFiles().filter(_.getName.startsWith("l_returnflag=")).head
    val part = spark.read.parquet(live.getPath)
    t("one-partition-count") { part.count() }
    val cuts = t("one-partition-quantiles") {
      part.stat.approxQuantile(Array("l_partkey", "l_suppkey"),
        (1 until 256).map(_.toDouble / 256).toArray, 0.01)
    }
    t("one-partition-cluster-write") {
      graft.ops.ZOrder.cluster(part,
        Seq(graft.ops.ZOrder.quantileRank(col("l_partkey"), cuts(0)),
            graft.ops.ZOrder.quantileRank(col("l_suppkey"), cuts(1))), 2, 8)
        .write.mode("overwrite").parquet(dir + "_stage_test")
    }
    t("full-optimizePartitioned") {
      graft.ops.ZOrder.optimizePartitioned(spark, dir, "l_returnflag",
        Seq("l_partkey", "l_suppkey"), filesPerPartition = 2)
    }
    t("final-aggregate") {
      spark.read.parquet(dir).groupBy(col("l_returnflag"))
        .agg(count(lit(1))).collect()
    }
    spark.stop()
  }
}
