package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Exact interpolated per-group percentiles WITHOUT per-group value
  * buffering (reference agg battery §2.6; Spark's built-in `percentile`
  * holds every value of a group in one aggregation buffer — unbounded
  * state, the classic 100 TB scale-killer).
  *
  * Two-pass distributed shape instead:
  *
  *  1. `groupBy(key, value).count()` — a map-side-combining shuffle whose
  *     output is bounded by DISTINCT values per group, not rows;
  *  2. cumulative counts over the distinct values (window per group — a
  *     task holds |distinct values|, not |rows|);
  *  3. per requested p, the target rank t = (n−1)·p is bracketed by the
  *     two distinct values whose cumulative ranges straddle ⌊t⌋/⌈t⌉, and
  *     linearly interpolated (quantile_cont semantics).
  *
  * Exactness is unchanged — only the state shape differs. The sketch-based
  * alternative for when even distinct-values-per-group is unbounded is
  * `approx_percentile` (q70).
  */
object Percentiles {

  /** One row per group: key column plus one exact interpolated percentile
    * column per entry of `ps`, named by `names`.
    */
  def exactPercentiles(df: DataFrame, keyCol: String, valCol: String,
      ps: Seq[Double], names: Seq[String]): DataFrame = {
    require(ps.nonEmpty && ps.length == names.length)
    // one scan: NULL values keep their group key alive in the same pass
    // (a separate df.select(key).distinct() would rescan the base table
    // just for the all-NULL-group edge). No persist — for a continuous
    // measure the counts frame is ~table-sized; instead both consumers
    // sit on the SAME aggregation subtree, so Catalyst's exchange reuse
    // scans the base once and replays the shuffle output for the second
    // branch.
    val counts0 = df
      .groupBy(col(keyCol), col(valCol).cast("double").as("__v"))
      .agg(count(lit(1)).as("__c"))
    val counts = counts0.filter(col("__v").isNotNull)
    val w = Window.partitionBy(col(keyCol)).orderBy(col("__v"))
    val cum = counts
      .withColumn("__cumEnd", sum(col("__c")).over(w))
      .withColumn("__cumStart", col("__cumEnd") - col("__c"))
      .withColumn("__n", sum(col("__c")).over(Window.partitionBy(col(keyCol))))

    // 0-based target rank t = (n-1)*p; value at 0-based rank k is the
    // distinct value v with cumStart <= k < cumEnd
    val aggs = ps.zipWithIndex.flatMap { case (p, i) =>
      val t = (col("__n") - 1) * lit(p)
      val lo = floor(t)
      val hi = ceil(t)
      Seq(
        max(when(col("__cumStart") <= lo && lo < col("__cumEnd"), col("__v"))).as(s"__lo_$i"),
        max(when(col("__cumStart") <= hi && hi < col("__cumEnd"), col("__v"))).as(s"__hi_$i"),
        max(col("__n")).as(s"__n_$i"))
    }
    // groups whose values are ALL NULL must still appear (with NULL
    // percentiles) — the builtin and quantile_cont both emit them, and the
    // isNotNull filter above would otherwise drop the key entirely
    val allKeys = counts0.select(col(keyCol)).distinct()
    val agged = allKeys.join(cum.groupBy(col(keyCol)).agg(aggs.head, aggs.tail: _*),
      Seq(keyCol), "left")
    val outCols = col(keyCol) +: ps.zipWithIndex.map { case (p, i) =>
      val t = (col(s"__n_$i") - 1) * lit(p)
      val frac = t - floor(t)
      // Spark Percentile's op order: lower*(ceil(t)-t) + higher*(t-floor(t))
      // when the bracket is split, else the exact value
      when(col(s"__lo_$i") === col(s"__hi_$i"), col(s"__lo_$i"))
        .otherwise(col(s"__lo_$i") * (lit(1.0) - frac) + col(s"__hi_$i") * frac)
        .as(names(i))
    }
    agged.select(outCols: _*)
  }
}
