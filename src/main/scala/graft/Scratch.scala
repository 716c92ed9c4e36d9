package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch profiling main (not part of the driver contract). */
object Scratch {
  def main(args: Array[String]): Unit = {
    val sfDir = "/root/testdata/sf0.1"
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

    import graft.llm.Similarity
    val corpus = Tables.embeddings(spark, sfDir)
      .select(col("vec_id").as("id"), col("embedding").as("vec"))
    val centroids = time("ivfTrain")(Similarity.ivfTrain(corpus, k = 8))
    val keep = Similarity.semanticDedup(corpus, centroids, threshold = 0.35)
    time("semanticDedup e2e")(keep.count())
    val docs = Tables.documents(spark, sfDir)
    time("dedupCorpus (q57)")(graft.llm.Dedup
      .dedupCorpus(docs, "doc_id", "text").count())
    spark.stop()
  }
}
