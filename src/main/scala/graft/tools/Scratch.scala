package graft.tools

import graft.SparkEntry

/** Ad-hoc profiling harness: time named gate queries (warmup pass then
  * two measured passes, min reported) against a given sf dir —
  * `runMain graft.tools.Scratch <sfDir> <q1,q2,...>`.
  */
object Scratch {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val names = args(1).split(",").toSeq
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master("local[32]")
      .appName("graft-scratch")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val defs = SparkEntry.allDefs.filter(q => names.contains(q.name))
    defs.foreach { q =>
      def once(): Double = {
        val t0 = System.nanoTime()
        val df = q.fn(spark, sfDir)
        df.write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      }
      once() // warmup
      val t = math.min(once(), once())
      println(f"SCRATCH ${q.name}%-30s ${t}%8.3f s")
    }
    spark.stop()
  }
}
