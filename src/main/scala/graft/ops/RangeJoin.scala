package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Point-in-interval range join via time binning. Spark plans a raw
  * range predicate as BroadcastNestedLoop (quadratic work, broadcast
  * pressure); binning turns it into an equi-join: each interval explodes
  * to the bins it covers, each point maps to exactly one bin, the join
  * runs on (keys..., bin) and an exact residual filter refines. One
  * shuffle, no nested loop — the composed-operator answer (SURVEY §7.3
  * preference (a)) to the classic interval-join gap.
  *
  * Choose binWidth near the typical interval length: intervals then
  * explode to O(1) bins while bins stay selective.
  *
  * The range axis may be TIMESTAMP / TIMESTAMP_NTZ (bin width in µs),
  * DATE (width in days), or INT/BIGINT (width in value units) — the same
  * type on both sides.
  */
object RangeJoin {

  /** Supported range-axis types. */
  val axisTypes: Set[DataType] =
    Set(TimestampType, TimestampNTZType, DateType, LongType, IntegerType)

  /** The column projected onto a LONG axis (µs / days / value). ONE
    * definition shared by the explicit operators and the optimizer rule
    * (plans.RangeJoinRule) — a divergence would silently change which
    * candidate pairs the residual filter sees.
    */
  def axisOf(c: Column, dt: DataType): Column = dt match {
    case TimestampType => unix_micros(c)
    // NTZ reinterpreted under the session TZ; consistent because both
    // sides of a join carry the same type
    case TimestampNTZType => unix_micros(c.cast(TimestampType))
    case DateType => unix_date(c).cast(LongType)
    case LongType | IntegerType => c.cast(LongType)
    case other => throw new IllegalArgumentException(s"unsupported range axis: $other")
  }

  private def binOfAxis(axis: Column, binWidth: Long): Column =
    (axis / binWidth).cast("long")

  /** Bin id of a point value. */
  def pointBin(pt: Column, dt: DataType, binWidth: Long): Column =
    binOfAxis(axisOf(pt, dt), binWidth)

  /** Timestamp-axis convenience (the original surface). */
  def pointBin(ts: Column, binWidthUs: Long): Column =
    pointBin(ts, TimestampType, binWidthUs)

  /** All bins an interval [lo, hi) or [lo, hi] covers (exploded). The top
    * bin is clamped to at least the bottom bin: an empty or inverted
    * interval otherwise makes `sequence` count DOWNWARD (step defaults to
    * -1), silently exploding junk bins. Clamped, such intervals cost one
    * bin, and the residual + overlap-start-dedupe filters stay exact.
    */
  def intervalBins(lo: Column, hi: Column, dt: DataType, binWidth: Long,
      inclusiveHi: Boolean): Column = {
    val hiAxis = if (inclusiveHi) axisOf(hi, dt) else axisOf(hi, dt) - 1
    val loBin = binOfAxis(axisOf(lo, dt), binWidth)
    explode(sequence(loBin, greatest(binOfAxis(hiAxis, binWidth), loBin)))
  }

  def intervalBins(lo: Column, hi: Column, binWidthUs: Long, inclusiveHi: Boolean): Column =
    intervalBins(lo, hi, TimestampType, binWidthUs, inclusiveHi)

  /** The shared axis type of a set of columns on one DataFrame — the
    * operators dispatch bin math on it and refuse mixed-type ranges.
    */
  private def axisType(df: DataFrame, cols: Seq[String]): DataType = {
    val dts = cols.map(c => df.schema(c).dataType).distinct
    require(dts.length == 1 && axisTypes.contains(dts.head),
      s"range columns ${cols.mkString(",")} must share one axis type " +
        s"(${axisTypes.mkString(", ")}); got ${dts.mkString(", ")}")
    dts.head
  }

  /** `left` point rows (ptCol) joined to `right` interval rows
    * ([startCol, endCol)) sharing `keys`. Output: left columns
    * + right columns (names must not overlap except keys).
    */
  def pointInInterval(left: DataFrame, right: DataFrame,
      ptCol: String, startCol: String, endCol: String,
      keys: Seq[String], binWidthUs: Long): DataFrame = {
    val dt = axisType(left, Seq(ptCol))
    require(axisType(right, Seq(startCol, endCol)) == dt,
      s"point/interval axis types differ: $dt vs ${axisType(right, Seq(startCol, endCol))}")
    val l = left.withColumn("__bin", pointBin(col(ptCol), dt, binWidthUs))
    val r = right
      .withColumn("__bin", intervalBins(col(startCol), col(endCol), dt, binWidthUs, inclusiveHi = false))
    l.join(r, keys :+ "__bin")
      .filter(col(ptCol) >= col(startCol) && col(ptCol) < col(endCol))
      .drop("__bin")
  }

  /** Broadcast variant of [[pointInInterval]] for dimension-sized interval
    * sets (calendars, rate tables, config windows): the intervals collapse
    * to one array per key, broadcast onto the points, and each point
    * filter-scans its key's array — the FACT side never shuffles and
    * never explodes to bins (the same admission contract as any broadcast
    * join: interval lists per key must stay broadcast-sized). A point in
    * k intervals emits k rows, identical to the binned form.
    */
  def pointInIntervalBroadcast(left: DataFrame, right: DataFrame,
      ptCol: String, startCol: String, endCol: String,
      keys: Seq[String]): DataFrame = {
    val rightCols = right.columns.filterNot(keys.contains)
    val leftCols = left.columns.filterNot(keys.contains)
    require(leftCols.intersect(rightCols).isEmpty,
      s"overlapping non-key columns: ${leftCols.intersect(rightCols).mkString(",")}")
    val packed = right.groupBy(keys.map(col): _*)
      .agg(collect_list(struct(rightCols.map(col): _*)).as("__ivs"))
    val pt = col(ptCol)
    left.join(broadcast(packed), keys, "inner")
      .withColumn("__hit", explode(filter(col("__ivs"),
        e => pt >= e.getField(startCol) && pt < e.getField(endCol))))
      .select((left.columns.map(col) ++
        rightCols.map(c => col(s"__hit.$c").as(c))).toIndexedSeq: _*)
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
    val dt = axisType(left, Seq(loL, hiL))
    require(axisType(right, Seq(loR, hiR)) == dt,
      s"interval axis types differ: $dt vs ${axisType(right, Seq(loR, hiR))}")
    val l = left.withColumn("__bin", intervalBins(col(loL), col(hiL), dt, binWidthUs, inclusiveHi = false))
    val r = right.withColumn("__bin", intervalBins(col(loR), col(hiR), dt, binWidthUs, inclusiveHi = false))
    l.join(r, keys :+ "__bin")
      .filter(col(loL) < col(hiR) && col(loR) < col(hiL))
      .filter(col("__bin") === pointBin(greatest(col(loL), col(loR)), dt, binWidthUs))
      .drop("__bin")
  }
}
