package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch profiling main (not part of the driver contract). */
object Scratch {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val names = if (args.length > 1) args.drop(1).toSeq else Seq("q113_semantic_dedup")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val n = f
      println(f"$label%-28s ${(System.nanoTime() - t0) / 1e9}%8.2f s   out=$n")
      n
    }

    for (name <- names) {
      val fn = SparkEntry.queries(name)
      for (pass <- 1 to 3) {
        // noop sink, same as Bench: count() would let Catalyst prune the
        // computed columns and under-report projection-heavy queries
        time(s"$name pass $pass") {
          fn(spark, sfDir).write.format("noop").mode("overwrite").save(); "-"
        }
        graft.ops.CacheRegistry.releaseAll()
      }
    }
    spark.stop()
  }
}
