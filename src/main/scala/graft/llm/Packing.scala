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

  /** First-fit-decreasing bin packing — the PRODUCTION packer: documents
    * are placed whole (never split across windows, unlike
    * [[packSequences]]' concat-then-chunk) into fixed `budget`-token
    * bins, with `sepTokens` separator accounting per placed document
    * (BOS/EOS — a doc costs `n_tokens + sepTokens` of its bin). FFD
    * order is (effective length DESC, id ASC); each document lands in
    * the FIRST bin with enough remaining capacity — the classic 11/9
    * OPT + 6/9 bound, and measurably better bin utilization than any
    * in-order greedy on real length mixes. A document whose effective
    * length exceeds the budget gets a bin of its own (flagged
    * `oversize`, never silently dropped). Deterministic and
    * oracle-replayable: the DuckDB gate replays the identical fold as a
    * recursive CTE.
    *
    * Output: id, n_tokens, eff (n_tokens + sepTokens, min 1), bin
    * (0-based), slot (0-based placement order within the bin), bin_off
    * (token offset of the document's slot inside its bin, separators
    * included), oversize.
    *
    * Scale shape: lengths are interchangeable for placement, so the fold
    * runs on the LENGTH HISTOGRAM (≤ max-length rows, one map-side-
    * combined aggregate), not on documents — per length run, consecutive
    * equal-length items fill the first fitting bin to capacity before
    * moving on (provably identical to item-by-item FFD: placing into
    * bin b only shrinks b, so earlier non-fitting bins stay non-fitting
    * for the same length). Placements come back as RANGE rows
    * ((rankStart, cnt) → bin arithmetic, runs of fresh bins compressed
    * to one row via perBin chunking), broadcast-joined to documents
    * ranked within their length group by the distributed RowIndex — no
    * skewed per-length window, no driver pass over documents. Driver
    * state is O(#bins + #lengths) — the histogram analog of the
    * quantile-cut arrays; for corpora whose BIN LIST outgrows the
    * driver, pack bounded shards (range-split by id) independently.
    */
  def ffdPack(df: DataFrame, idCol: String, tokenCol: String, budget: Long,
      sepTokens: Long = 2L): DataFrame = {
    require(budget > 0, s"token budget must be positive: $budget")
    require(sepTokens >= 0, s"sepTokens must be non-negative: $sepTokens")
    val spark = df.sparkSession
    // every doc costs >= 1 so zero-token docs still occupy a slot (and
    // the per-bin chunk arithmetic below never divides by zero)
    val slim = df.select(col(idCol).as("id"),
      coalesce(col(tokenCol).cast("long"), lit(0L)).as("n_tokens"),
      greatest(coalesce(col(tokenCol).cast("long"), lit(0L)) + sepTokens, lit(1L))
        .as("eff"))
    // ONE aggregate pass: the length histogram, length-descending
    val hist = slim.groupBy(col("eff")).agg(count(lit(1)).as("c"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).sortBy(-_._1)
    // driver fold over the histogram: placement RANGES, not documents.
    // Row: (len, rankStart, cnt, binStart, perBin, slotBase, offBase) —
    // doc at in-group rank r ∈ [rankStart, rankStart+cnt) lands in
    //   bin  = binStart + (r - rankStart) / perBin
    //   slot = slotBase + (r - rankStart) % perBin
    //   off  = offBase  + ((r - rankStart) % perBin) * len
    // (existing-bin rows use perBin = cnt → div 0 / identity mod;
    // fresh-bin and oversize runs chunk by perBin per bin)
    val placements = scala.collection.mutable.ArrayBuffer
      .empty[(Long, Long, Long, Long, Long, Long, Long)]
    val rem = scala.collection.mutable.ArrayBuffer.empty[Long]
    val slots = scala.collection.mutable.ArrayBuffer.empty[Long]
    val offs = scala.collection.mutable.ArrayBuffer.empty[Long]
    for ((len, total) <- hist) {
      var c = total
      var rankStart = 0L
      if (len <= budget) {
        var b = 0
        while (c > 0 && b < rem.length) {
          val k = math.min(c, rem(b) / len)
          if (k > 0) {
            placements += ((len, rankStart, k, b.toLong, k, slots(b), offs(b)))
            rem(b) -= k * len; slots(b) += k; offs(b) += k * len
            rankStart += k; c -= k
          }
          b += 1
        }
      }
      if (c > 0) {
        // fresh bins (or one-per-doc for oversize): filled to capacity in
        // creation order — one compressed placement row for the whole run
        val perBin = math.max(1L, budget / len)
        placements += ((len, rankStart, c, rem.length.toLong, perBin, 0L, 0L))
        var left = c
        while (left > 0) {
          val k = math.min(left, perBin)
          rem += (budget - k * len); slots += k; offs += k * len
          left -= k
        }
      }
    }
    val placed = spark.createDataFrame(placements.toSeq)
      .toDF("eff", "rank_start", "cnt", "bin_start", "per_bin",
        "slot_base", "off_base")
    // in-group rank WITHOUT a per-length window (a common length would
    // make that window single-partition): global RowIndex in (eff, id)
    // order minus the group's first index — the start offsets are one
    // histogram-sized aggregate, broadcast back on eff
    val ranked = graft.ops.RowIndex.withRowIndex(slim, "__g",
      Seq(col("eff"), col("id")))
    val starts = ranked.groupBy(col("eff")).agg(min(col("__g")).as("__g0"))
    val r = col("__g") - col("__g0") - col("rank_start")
    ranked
      .join(broadcast(starts), "eff")
      .join(broadcast(placed.withColumnRenamed("eff", "__pl_eff")),
        col("eff") === col("__pl_eff") &&
          col("__g") - col("__g0") >= col("rank_start") &&
          col("__g") - col("__g0") < col("rank_start") + col("cnt"))
      .select(col("id"), col("n_tokens"), col("eff"),
        (col("bin_start") + graft.ops.Arith.floorDivI(r, col("per_bin"))).as("bin"),
        (col("slot_base") + pmod(r, col("per_bin"))).as("slot"),
        (col("off_base") + pmod(r, col("per_bin")) * col("eff")).as("bin_off"),
        (col("eff") > budget).as("oversize"))
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
