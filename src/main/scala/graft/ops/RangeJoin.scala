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

  /** `left` point rows (ptCol: timestamp) joined to `right` interval rows
    * ([startCol, endCol) timestamps) sharing `keys`. Output: left columns
    * + right columns (names must not overlap except keys).
    */
  def pointInInterval(left: DataFrame, right: DataFrame,
      ptCol: String, startCol: String, endCol: String,
      keys: Seq[String], binWidthUs: Long): DataFrame = {
    val l = left.withColumn("__bin", (unix_micros(col(ptCol)) / binWidthUs).cast("long"))
    val r = right
      .withColumn("__bin", explode(sequence(
        (unix_micros(col(startCol)) / binWidthUs).cast("long"),
        ((unix_micros(col(endCol)) - 1) / binWidthUs).cast("long"))))
    l.join(r, keys :+ "__bin")
      .filter(col(ptCol) >= col(startCol) && col(ptCol) < col(endCol))
      .drop("__bin")
  }
}
