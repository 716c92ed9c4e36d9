package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Point-in-interval range join via time binning. Spark plans a raw
  * range predicate as BroadcastNestedLoop (quadratic work, broadcast
  * pressure); binning turns it into an equi-join: each interval explodes
  * to the bins it covers, each point maps to exactly one bin, the join
  * runs on (keys..., bin) and an exact residual filter refines. One
  * shuffle, no nested loop — the composed-operator answer (SURVEY §7.3
  * preference (a)) to the classic interval-join gap.
  *
  * Choose binWidthUs near the typical interval length: intervals then
  * explode to O(1) bins while bins stay selective.
  */
object RangeJoin {

  /** Bin id of a point timestamp — ONE definition of the bin-boundary
    * arithmetic, shared by the explicit operator and the optimizer rule
    * (plans.RangeJoinRule); a divergence between the two would silently
    * change which candidate pairs the residual filter sees.
    */
  def pointBin(ts: Column, binWidthUs: Long): Column =
    (unix_micros(ts) / binWidthUs).cast("long")

  /** All bins an interval [lo, hi) or [lo, hi] covers (exploded). */
  def intervalBins(lo: Column, hi: Column, binWidthUs: Long, inclusiveHi: Boolean): Column = {
    val hiBin =
      if (inclusiveHi) (unix_micros(hi) / binWidthUs).cast("long")
      else ((unix_micros(hi) - 1) / binWidthUs).cast("long")
    explode(sequence((unix_micros(lo) / binWidthUs).cast("long"), hiBin))
  }

  /** `left` point rows (ptCol: timestamp) joined to `right` interval rows
    * ([startCol, endCol) timestamps) sharing `keys`. Output: left columns
    * + right columns (names must not overlap except keys).
    */
  def pointInInterval(left: DataFrame, right: DataFrame,
      ptCol: String, startCol: String, endCol: String,
      keys: Seq[String], binWidthUs: Long): DataFrame = {
    val l = left.withColumn("__bin", pointBin(col(ptCol), binWidthUs))
    val r = right
      .withColumn("__bin", intervalBins(col(startCol), col(endCol), binWidthUs, inclusiveHi = false))
    l.join(r, keys :+ "__bin")
      .filter(col(ptCol) >= col(startCol) && col(ptCol) < col(endCol))
      .drop("__bin")
  }

  /** Interval-overlap join: pairs whose half-open windows [loL, hiL) and
    * [loR, hiR) intersect, sharing `keys` — the other classic range-join
    * shape (concurrency detection, conflict windows). Both sides explode
    * to covered bins and equi-join on (keys..., bin); a pair sharing
    * several bins is emitted ONCE by keeping only the bin of the overlap
    * START, max(loL, loR) — a filter, not a distinct, so no extra shuffle
    * over wide rows. Still one shuffle total, no nested loop.
    */
  def intervalOverlap(left: DataFrame, right: DataFrame,
      loL: String, hiL: String, loR: String, hiR: String,
      keys: Seq[String], binWidthUs: Long): DataFrame = {
    val l = left.withColumn("__bin", intervalBins(col(loL), col(hiL), binWidthUs, inclusiveHi = false))
    val r = right.withColumn("__bin", intervalBins(col(loR), col(hiR), binWidthUs, inclusiveHi = false))
    l.join(r, keys :+ "__bin")
      .filter(col(loL) < col(hiR) && col(loR) < col(hiL))
      .filter(col("__bin") === pointBin(greatest(col(loL), col(loR)), binWidthUs))
      .drop("__bin")
  }
}
