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
    // warmup pass
    SparkEntry.queries("q113_semantic_dedup")(spark, sfDir).count()
    graft.ops.CacheRegistry.releaseAll()

    val corpus = Tables.embeddings(spark, sfDir)
      .select(col("vec_id").as("id"), col("embedding").as("vec"))
    val centroids = time("ivfTrain")(Similarity.ivfTrain(corpus, k = 8))
    val assigned = corpus.select(col("id"),
      col("vec").cast("array<double>").as("v"),
      Similarity.ivfCell(col("vec"), centroids).as("cell")).persist()
    time("assign")(assigned.count())
    val l = assigned.select(col("cell"), col("id").as("id1"), col("v").as("v1"))
    val r = assigned.select(col("cell"), col("id").as("id2"), col("v").as("v2"))
    val pairs = l.join(r, Seq("cell")).filter(col("id1") < col("id2"))
      .select(col("id1"), col("id2"), Similarity.cosine(col("v1"), col("v2")).as("cos"))
      .filter(col("cos") >= 0.35)
      .select(col("id1"), col("id2"))
    val comp = time("cc total")(graft.llm.Dedup.connectedComponents(pairs))
    time("keep")(assigned.select(col("id"))
      .join(comp, Seq("id"), "left")
      .filter(col("component").isNull || col("component") === col("id"))
      .select(col("id")).count())
    spark.stop()
  }
}
