package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Throwaway: band-key collision rate between DISJOINT synthetic docs. */
object DebugBandColl {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[16]")
      .appName("dbg").config("spark.sql.shuffle.partitions", "16")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def synthDocs(from: Long, n: Long) =
      spark.range(from, from + n).select(col("id").as("doc_id"),
        array_join(transform(sequence(lit(0), lit(39)),
          i => substring(md5(concat(col("id").cast("string"), lit("_"),
            i.cast("string"))), 1, 8)), " ").as("text"))
    val docs = synthDocs(0, 32000)
    val st = graft.llm.Dedup.portableState(docs, "doc_id", "text")
    val bands = st.select(col("id"), explode(array((0 until 4).map { t =>
        struct((lit(t).as("band") +:
          (0 until 4).map(r => col(s"s${t * 4 + r}").as(s"v$r"))): _*)
      }: _*)).as("bb"))
      .select(col("id"), col("bb.band"), col("bb.v0"), col("bb.v1"),
        col("bb.v2"), col("bb.v3"))
    val dup = bands.groupBy("band", "v0", "v1", "v2", "v3")
      .agg(count(lit(1)).as("n")).filter(col("n") > 1)
    println("DUPKEYS " + dup.agg(count(lit(1)), sum(col("n"))).collect()(0))
    dup.orderBy(col("n").desc).show(10, false)
    // per-slot collision check: distinct counts of each sig slot
    val sl = st.agg(countDistinct(col("s0")), countDistinct(col("s1")),
      countDistinct(col("s15")), count(lit(1))).collect()(0)
    println("SLOTS " + sl)
    // docs in the top cluster: do they share an hs value (a shingle-hash
    // collision) or is the minhash arithmetic at fault?
    val cl = bands.filter(col("band") === 0 && col("v0") === 14924570L)
      .select(col("id")).limit(5).collect().map(_.getLong(0))
    println("CLUSTER sample " + cl.toSeq)
    val hs = st.filter(col("id").isin(cl: _*))
      .select(col("id"), explode(col("hs")).as("h"))
    val shared = hs.groupBy(col("h")).agg(count(lit(1)).as("n"))
      .filter(col("n") > 1).orderBy(col("n").desc)
    shared.show(5, false)
    // expected min-h: 4939947 present in how many docs corpus-wide?
    val all = st.select(explode(col("hs")).as("h")).filter(col("h") === 4939947L)
    println("H4939947 count " + all.count())
    spark.stop()
  }
}
