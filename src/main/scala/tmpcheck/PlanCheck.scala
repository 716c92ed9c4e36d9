import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft._
object PlanCheck {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val docs = Tables.documents(spark, "/root/testdata/sf0.1")
    val t0 = System.nanoTime()
    val n = graft.llm.Dedup.simHashPairs(docs, "doc_id", "text", maxHamming = 6).count()
    println(f"kernel pairs sf0.1: $n  ${(System.nanoTime()-t0)/1e9}%.1f s")
    spark.stop()
  }
}
