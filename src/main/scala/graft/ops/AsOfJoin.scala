package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of join: for each left row, the most recent right row with
  * rightTime <= leftTime within the same key — the canonical time-series
  * enrichment operator (an engine-layer op the reference's host is
  * expected to supply; composed from existing Spark ops per the
  * custom-operator preference order, SURVEY.md §7.3 (a)).
  *
  * Implementation is the distributed merge-asof: tag both sides, union,
  * sort within key by (time, side) — right rows first at equal times so
  * the match is inclusive — then carry the last right payload forward
  * with a running `last(ignoreNulls)` window and keep left rows.
  *
  * Scale shape: ONE shuffle on the key, one per-partition sort; no
  * range-explosion join, no broadcast requirement on either side.
  */
object AsOfJoin {

  /** `left` and `right` must share no column names except `keys`.
    * Right payload columns arrive nullable (no match ⇒ NULL).
    *
    * `direction`: "backward" (most recent right with rightTime <= leftTime,
    * the default and the reference shape) or "forward" (earliest right with
    * rightTime >= leftTime) — both inclusive, pandas merge_asof parity.
    * `tolerance`: optional predicate (leftT, matchedRightT) => keep; a match
    * farther than the tolerance reverts to NULL. Same one-shuffle plan.
    */
  def asOf(left: DataFrame, right: DataFrame,
      leftTime: String, rightTime: String, keys: Seq[String],
      direction: String = "backward",
      tolerance: Option[(Column, Column) => Column] = None): DataFrame = {
    require(direction == "backward" || direction == "forward", s"direction: $direction")
    val leftCols = left.columns.filterNot(keys.contains)
    val rightCols = right.columns.filterNot(keys.contains)
    require(leftCols.intersect(rightCols).isEmpty,
      s"overlapping non-key columns: ${leftCols.intersect(rightCols).mkString(",")}")

    val taggedRight = right.select(
      keys.map(col) ++ Seq(
        col(rightTime).as("__t"),
        lit(0).as("__side"), // right sorts before left at equal times (inclusive match)
        struct(rightCols.map(col): _*).as("__rpay")) ++
        leftCols.map(c => lit(null).as(c)): _*)
    val taggedLeft = left.select(
      keys.map(col) ++ Seq(
        col(leftTime).as("__t"),
        lit(1).as("__side"),
        lit(null).cast(taggedRight.schema("__rpay").dataType).as("__rpay")) ++
        leftCols.map(col): _*)

    val timeOrder = if (direction == "backward") col("__t").asc else col("__t").desc
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(timeOrder, col("__side"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val merged = taggedRight.unionByName(taggedLeft)
      .withColumn("__carried", last(col("__rpay"), ignoreNulls = true).over(w))
      // the matched right row's own time, for tolerance — same running-last
      // window, non-null exactly where __rpay is, so it tracks the same row
      .withColumn("__carried_t", last(when(col("__side") === 0, col("__t")), ignoreNulls = true).over(w))

    val withinTol = tolerance match {
      case None => lit(true)
      case Some(p) => p(col("__t"), col("__carried_t"))
    }
    val unpacked = rightCols.foldLeft(merged.filter(col("__side") === 1)) {
      (df, c) => df.withColumn(c, when(withinTol, col(s"__carried.$c")))
    }
    unpacked
      .withColumn(leftTime, col("__t"))
      .drop("__t", "__side", "__rpay", "__carried", "__carried_t")
  }

  /** The same join through the physical operator
    * (`plans.AsOfJoinPlan/AsOfJoinExec` — SURVEY §7.3 (c) taken to the
    * SparkPlan layer): Catalyst plans one keys-only hash exchange and one
    * sort per side, then a single-pass per-partition merge with O(1) state
    * per key — no union materialization, no window carry state. Same output
    * contract as [[asOf]] (left columns + nullable right payload).
    *
    * `tolerance`: keep a match only if |leftTime − matchedRightTime| is
    * within this many of the time column's AXIS UNITS (pandas merge_asof
    * `tolerance`): microseconds for TIMESTAMP/TIMESTAMP_NTZ, days for
    * DATE, raw value units for INT/BIGINT time columns.
    */
  def asOfPhysical(left: DataFrame, right: DataFrame,
      leftTime: String, rightTime: String, keys: Seq[String],
      direction: String = "backward",
      tolerance: Option[Long] = None): DataFrame = {
    require(direction == "backward" || direction == "forward", s"direction: $direction")
    val leftCols = left.columns.filterNot(keys.contains)
    val rightCols = right.columns.filterNot(keys.contains)
    require(leftCols.intersect(rightCols).isEmpty,
      s"overlapping non-key columns: ${leftCols.intersect(rightCols).mkString(",")}")

    import org.apache.spark.sql.graft.{ColumnBridge, PlanBridge}
    val spark = left.sparkSession
    ensureStrategy(spark)
    val lPlan = PlanBridge.analyzed(left)
    val rPlan = PlanBridge.analyzed(right)
    def attr(p: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan, n: String) =
      p.output.find(_.name == n).getOrElse(sys.error(s"no column $n"))
    val node = graft.plans.AsOfJoinPlan(
      lPlan, rPlan,
      keys.map(attr(lPlan, _)), keys.map(attr(rPlan, _)),
      attr(lPlan, leftTime), attr(rPlan, rightTime),
      forward = direction == "forward", tolerance = tolerance)
    // keep left columns + non-key right payload (keys are on both sides;
    // select by attribute, not name, to disambiguate)
    val keep = lPlan.output ++ rPlan.output.filterNot(a => keys.contains(a.name))
    PlanBridge.ofRows(spark, node).select(keep.map(ColumnBridge.column(_)): _*)
  }

  /** Register the planner strategy on this session (idempotent). Sessions
    * built with `spark.sql.extensions=graft.GraftExtensions` already have it.
    */
  def ensureStrategy(spark: SparkSession): Unit = {
    val es = spark.experimental
    if (!es.extraStrategies.contains(graft.plans.AsOfJoinStrategy))
      es.extraStrategies = es.extraStrategies :+ graft.plans.AsOfJoinStrategy
  }

  /** Broadcast as-of join — the THIRD plan for the same semantics, for
    * the most common production shape: a huge fact stream enriched
    * against a dimension-sized reference series (rates, prices, configs).
    * [[asOf]] and [[asOfPhysical]] both shuffle the FACT side on the key;
    * here the right side collapses to one sorted struct-array per key,
    * broadcast-joins onto the left, and the match is found with a
    * higher-order-function scan — the fact side never shuffles, never
    * sorts, and stays in one codegen stage end to end.
    *
    * Same output contract as [[asOf]] (left columns + nullable right
    * payload, inclusive matches both directions; null keys match the
    * null-key series group, as in the window/physical plans — the join
    * is null-safe). Requires (keys, rightTime) unique on the right
    * (merge_asof's dedup precondition) so the match is well-defined. Per-row cost is O(|series per key|) —
    * the broadcast bound (a few MB per key list) is the operator's
    * admission contract, exactly like any broadcast join.
    */
  def asOfBroadcast(left: DataFrame, right: DataFrame,
      leftTime: String, rightTime: String, keys: Seq[String],
      direction: String = "backward",
      tolerance: Option[Long] = None): DataFrame = {
    require(direction == "backward" || direction == "forward", s"direction: $direction")
    val leftCols = left.columns.filterNot(keys.contains)
    // payload = ALL non-key right columns incl. rightTime (asOf's output
    // contract: the matched row's own time column comes along)
    val rightCols = right.columns.filterNot(keys.contains)
    require(leftCols.intersect(rightCols).isEmpty,
      s"overlapping non-key columns: ${leftCols.intersect(rightCols).mkString(",")}")
    // NULL right times can never satisfy an inequality — drop them up
    // front or they'd sort to the array head and shift every rank
    val series = right.filter(col(rightTime).isNotNull)
      .groupBy(keys.map(col): _*)
      .agg(sort_array(collect_list(struct(
        col(rightTime).as("__t"),
        struct(rightCols.map(col): _*).as("__p")))).as("__arr"))
      // rename series keys so the join can use NULL-SAFE equality: the
      // window/physical asOf plans group null keys together (null left
      // rows match the null-key series), and a plain equi-join here would
      // silently diverge from them on exactly those rows
      .select(keys.map(k => col(k).as(s"__k_$k")) :+ col("__arr"): _*)
    val lt = col(leftTime)
    val cond = keys.map(k => col(k) <=> col(s"__k_$k")).reduce(_ && _)
    val joined = left.join(broadcast(series), cond, "left")
      .drop(keys.map(k => s"__k_$k"): _*)
    // backward: last element with __t <= lt == element at rank |{__t <= lt}|;
    // forward: first element with __t >= lt == element at rank |{__t < lt}|+1
    val (rank, ok) =
      if (direction == "backward") {
        val r = size(filter(col("__arr"), e => e.getField("__t") <= lt))
        (r, r >= 1)
      } else {
        val r = size(filter(col("__arr"), e => e.getField("__t") < lt)) + 1
        (r, r <= size(col("__arr")))
      }
    val withHit = joined.withColumn("__hit",
      when(col("__arr").isNotNull && ok, element_at(col("__arr"), rank)))
    val withinTol = tolerance match {
      case None => col("__hit").isNotNull
      case Some(tol) =>
        col("__hit").isNotNull && abs(unix_micros(lt.cast("timestamp")) -
          unix_micros(col("__hit.__t").cast("timestamp"))) <= tol
    }
    rightCols.foldLeft(withHit) { (df, c) =>
      df.withColumn(c, when(withinTol, col(s"__hit.__p.$c")))
    }.drop("__arr", "__hit")
  }
}
