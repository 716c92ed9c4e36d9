package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Exact interpolated per-group percentiles WITHOUT per-group value
  * buffering (reference agg battery §2.6; Spark's built-in `percentile`
  * holds every value of a group in one aggregation buffer — unbounded
  * state, the classic 100 TB scale-killer).
  *
  * Distributed shape (no per-key window — measured at sf0.1, a
  * `Window.partitionBy(key)` over the distinct-value frame funnels ~600k
  * rows into |groups| sort partitions, the exact skew the 100 TB brief
  * forbids, and costs ~0.5 s of the query's 1.4 s):
  *
  *  1. `groupBy(key, value).count()` — a map-side-combining shuffle whose
  *     output is bounded by DISTINCT values per group, not rows;
  *  2. GLOBAL running total of counts under (key, value) order via
  *     [[RowIndex.withRunningTotal]] — one 32-way range shuffle + a
  *     partition-count-bounded offsets collect, full parallelism at any
  *     group skew;
  *  3. per-key base/total from a tiny (|groups|-row) aggregate, broadcast
  *     back: per-key cumulative = global cumulative − key base. The
  *     broadcast is bounded by the GROUP COUNT — the same "the result fits
  *     somewhere" contract any groupBy answer already assumes;
  *  4. per requested p, the target rank t = (n−1)·p is bracketed by the
  *     two distinct values whose cumulative ranges straddle ⌊t⌋/⌈t⌉, and
  *     linearly interpolated (quantile_cont semantics).
  *
  * Exactness is unchanged — only the state shape differs. The sketch-based
  * alternative for when even distinct-values-per-group is unbounded is
  * `approx_percentile` (q70).
  */
object Percentiles {

  /** One row per group: key column plus one exact interpolated percentile
    * column per entry of `ps`, named by `names`. Groups whose values are
    * all NULL appear with NULL percentiles (builtin/quantile_cont parity).
    */
  def exactPercentiles(df: DataFrame, keyCol: String, valCol: String,
      ps: Seq[Double], names: Seq[String]): DataFrame = {
    require(ps.nonEmpty && ps.length == names.length)
    // one scan; NULL values ride along so their group keys stay alive
    // without a second scan of the base table
    val counts0 = df
      .groupBy(col(keyCol), col(valCol).cast("double").as("__v"))
      .agg(count(lit(1)).as("__c"))
    // global prefix sum under (key, value): NULLs range-sort FIRST within
    // their key, so a non-NULL row's prefix already includes the key's
    // NULL counts and the per-key base below subtracts them correctly.
    // NOTE (round-15 measurement): persisting this frame (and keyStats)
    // was tried and REVERTED — the formatted plan shows the prefix-sum
    // RDD scanned 3×, but RowIndex already caches the ranged input, so
    // each re-scan is a cache read + the prefix map; adding a second
    // cache layer here only moved the conversion into a cache write and
    // cost a barrier (q69 ~+6%, q195 ~+8%, q170/q186 flat at sf0.1).
    val cumG = RowIndex.withRunningTotal(
      counts0, "__cumG", col("__c"), Seq(col(keyCol), col("__v")))
    // per-key base (global prefix before the key's first non-NULL value)
    // and non-NULL total — |groups| rows, the broadcast side
    val keyStats = cumG.groupBy(col(keyCol)).agg(
      min(when(col("__v").isNotNull, col("__cumG") - col("__c"))).as("__base"),
      sum(when(col("__v").isNotNull, col("__c"))).as("__n"))
    // joins below use <=> — a NULL group key is a real group (GROUP BY
    // semantics on both engines)
    val cum = cumG.filter(col("__v").isNotNull).as("cg")
      .join(broadcast(keyStats.as("ks")), col(s"cg.$keyCol") <=> col(s"ks.$keyCol"))
      .select(col(s"cg.$keyCol").as(keyCol), col("__v"), col("__c"),
        (col("__cumG") - col("__base")).as("__cumEnd"), col("__n"))
      .withColumn("__cumStart", col("__cumEnd") - col("__c"))

    // 0-based target rank t = (n-1)*p; value at 0-based rank k is the
    // distinct value v with cumStart <= k < cumEnd
    val aggs = ps.zipWithIndex.flatMap { case (p, i) =>
      val t = (col("__n") - 1) * lit(p)
      val lo = floor(t)
      val hi = ceil(t)
      Seq(
        max(when(col("__cumStart") <= lo && lo < col("__cumEnd"), col("__v"))).as(s"__lo_$i"),
        max(when(col("__cumStart") <= hi && hi < col("__cumEnd"), col("__v"))).as(s"__hi_$i"))
    }
    val agged = cum.groupBy(col(keyCol)).agg(aggs.head, aggs.tail: _*)
    val joined = keyStats.as("ks").join(agged.as("ag"),
        col(s"ks.$keyCol") <=> col(s"ag.$keyCol"), "left")
    val outCols = col(s"ks.$keyCol").as(keyCol) +: ps.zipWithIndex.map { case (p, i) =>
      val t = (col("__n") - 1) * lit(p)
      val frac = t - floor(t)
      // Spark Percentile's op order: lower*(ceil(t)-t) + higher*(t-floor(t))
      // when the bracket is split, else the exact value
      when(col(s"__lo_$i") === col(s"__hi_$i"), col(s"__lo_$i"))
        .otherwise(col(s"__lo_$i") * (lit(1.0) - frac) + col(s"__hi_$i") * frac)
        .as(names(i))
    }
    joined.select(outCols: _*)
  }
}
