package graft.llm

import graft.ops.RowIndex
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Sequence packing for pretraining batches (north-star extension): lay
  * documents head-to-tail in a deterministic order and slice the token
  * stream into fixed-budget context windows ("concat-then-chunk", the
  * standard packing used by public LLM training pipelines — documents may
  * span window boundaries).
  *
  * 100 TB shape: the only heavy step is the distributed prefix sum
  * (RowIndex.withRunningTotal — ONE range shuffle on the order key, a
  * numPartitions-row driver aggregate, a per-partition sequential scan).
  * Everything downstream is arithmetic on (offset, budget): codegen,
  * shuffle-free. No single-partition window anywhere.
  */
object Packing {

  /** Per-document placement in the packed token stream:
    * start_off (global token offset), bin (= context-window index of the
    * document's first token), bin_off (offset inside that window), and
    * end_bin (window of the last token; zero-token docs keep end_bin =
    * bin). `order` must be a total order (add an id tiebreak) for exact
    * reproducibility, and may reference any column of `df` — all input
    * columns pass through to the output. Project `df` down to the columns
    * you need BEFORE calling: the prefix-sum scan crosses the Row boundary,
    * so slim input is the scan-economical shape.
    */
  def packSequences(df: DataFrame, tokenCol: String,
      budget: Long, order: Seq[Column]): DataFrame = {
    require(budget > 0, s"token budget must be positive: $budget")
    val cum = RowIndex.withRunningTotal(df, "__cum", col(tokenCol), order)
    cum
      .withColumn("start_off", col("__cum") - col(tokenCol))
      .withColumn("bin", expr(s"start_off div ${budget}L"))
      .withColumn("bin_off", pmod(col("start_off"), lit(budget)))
      .withColumn("end_bin",
        when(col(tokenCol) > 0, expr(s"(__cum - 1) div ${budget}L"))
          .otherwise(expr(s"start_off div ${budget}L")))
      .drop("__cum")
  }

  /** Sequence-length histogram: fixed-width token-count bins with document
    * count, token mass, and the fraction of documents per bin — the
    * distribution a pipeline inspects to pick max_seq_len before packing
    * (what share of documents fit; where the token mass actually lives).
    * Bin edges are INTEGER arithmetic (`n DIV width * width`) so both
    * engines bucket identically with no float floor-at-a-power edge cases.
    * One map-side-combined shuffle of (bin, count, mass) pairs; the scalar
    * doc total joins back as a provably-one-row broadcast.
    */
  def lengthHistogram(df: DataFrame, tokenCol: String, binWidth: Int = 16): DataFrame = {
    require(binWidth > 0, s"bin width must be positive: $binWidth")
    // Column-API bin edge (n - n mod width == n DIV width * width for
    // non-negative counts) — no raw identifier interpolation, so column
    // names that would need backticks (spaces, dots) work like everywhere
    // else in this file
    val n = col(tokenCol).cast("long")
    val binned = df.select(
      (n - pmod(n, lit(binWidth.toLong))).as("bin_lo"), n.as("n"))
    val total = binned.agg(count(lit(1)).cast("double").as("total"))
    binned.groupBy(col("bin_lo"))
      .agg(count(lit(1)).as("n_docs"), sum(col("n")).as("tokens"))
      .crossJoin(total)
      .select(col("bin_lo"), col("n_docs"), col("tokens"),
        round(col("n_docs") / col("total"), 6).as("doc_frac"))
  }
}
