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

    def time(label: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"$label%-28s ${(System.nanoTime() - t0) / 1e9}%8.2f s   rows=$n")
    }

    val docs = Tables.documents(spark, sfDir)
    val tok = docs.select(col("doc_id").as("id"), graft.llm.Dedup.shingles(col("text"), 3).as("toks"))
    time("shingles")(tok.count())
    val inv = tok.select(col("id"), explode(col("toks")).as("w"))
    time("inverted index")(inv.count())
    time("distinct shingles")(inv.select(col("w")).distinct().count())
    val selfJoin = inv.as("a").join(inv.as("b"),
      col("a.w") === col("b.w") && col("a.id") < col("b.id"))
    time("self join")(selfJoin.count())
    val pairs = selfJoin.groupBy(col("a.id").as("id1"), col("b.id").as("id2"))
      .agg(count(lit(1)).as("inter"))
    time("pair agg")(pairs.count())
    val full = graft.llm.Dedup.ngramJaccardPairs(docs, "doc_id", "text", 0.6)
    time("inv-index variant")(full.count())
    val pf = graft.llm.Dedup.ngramJaccardPairsPrefix(docs, "doc_id", "text", 0.6)
    time("prefix-filter variant")(pf.count())
    time("prefix again")(pf.count())
    // equality of results
    val a = full.select(col("id1"), col("id2")).collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val b = pf.select(col("id1"), col("id2")).collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    println(s"results equal: ${a == b} (${a.size} pairs)")
    spark.stop()
  }
}
