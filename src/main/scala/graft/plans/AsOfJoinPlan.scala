package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, Partitioning}
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan, SparkStrategy}
import org.apache.spark.sql.execution.metric.SQLMetrics
import org.apache.spark.sql.types._

/** Whole-operator as-of join at the physical layer — SURVEY §7.3 preference
  * (c) taken all the way down: a logical node, a planner Strategy, and a
  * SparkPlan whose distribution/ordering REQUIREMENTS make Catalyst plan the
  * shuffle and sort, leaving a streaming per-partition merge as the operator
  * body. This is the engine-layer counterpart of `ops.AsOfJoin.asOf` (the
  * window-composed form): same semantics — for each left row, the most
  * recent right row with rightTime <= leftTime on the same key ("backward",
  * inclusive; "forward" = earliest at-or-after), optional tolerance in the
  * time column's axis units (µs for timestamps, days for dates, value
  * units for ints) — but the physical form never materializes the union or
  * carries window state; it walks both sorted streams once with O(1) state
  * per key.
  *
  * Scale shape: EnsureRequirements plans one hash exchange per side (keys
  * only — no time-range explosion), one per-partition sort each, then a
  * single-pass merge. Left rows stream through unbuffered, so a 100 TB fact
  * side never holds more than the current right match per key in memory.
  *
  * Reference: engine-layer time-series enrichment the reference's host is
  * expected to supply (minarrow delegates relational composition —
  * SURVEY.md §2.9); direction/tolerance parity with pandas merge_asof.
  */
case class AsOfJoinPlan(
    left: LogicalPlan,
    right: LogicalPlan,
    leftKeys: Seq[Expression],
    rightKeys: Seq[Expression],
    leftTime: Expression,
    rightTime: Expression,
    forward: Boolean,
    tolerance: Option[Long]) extends BinaryNode {

  require(leftKeys.nonEmpty && leftKeys.length == rightKeys.length,
    "as-of join needs at least one equi-key, aligned left/right")

  // right payload arrives nullable (no match => NULL), as with outer joins
  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))

  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): AsOfJoinPlan =
    copy(left = newLeft, right = newRight)
}

/** Planner strategy: one physical candidate for the logical node. */
object AsOfJoinStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case AsOfJoinPlan(l, r, lk, rk, lt, rt, fwd, tol) =>
      AsOfJoinExec(planLater(l), planLater(r), lk, rk, lt, rt, fwd, tol) :: Nil
    case _ => Nil
  }
}

/** Physical merge-asof. Children are hash-clustered on the equi-keys and
  * sorted by (keys, time) — time ascending for backward, descending for
  * forward, so both directions run the same "remember the last right row
  * that satisfied the inequality" loop.
  *
  * NULL semantics match SQL equi-joins: a NULL in any right key or in the
  * right time can never match (skipped at the scan); a NULL in any left
  * key or the left time yields a NULL payload.
  */
case class AsOfJoinExec(
    left: SparkPlan,
    right: SparkPlan,
    leftKeys: Seq[Expression],
    rightKeys: Seq[Expression],
    leftTime: Expression,
    rightTime: Expression,
    forward: Boolean,
    tolerance: Option[Long]) extends BinaryExecNode {

  private val timeTypes: Set[DataType] =
    Set(TimestampType, TimestampNTZType, LongType, IntegerType, DateType)
  require(leftTime.dataType == rightTime.dataType &&
    timeTypes.contains(leftTime.dataType),
    s"as-of time columns must share an integral/temporal type, " +
      s"got ${leftTime.dataType} vs ${rightTime.dataType}")
  require(leftKeys.map(_.dataType) == rightKeys.map(_.dataType),
    "as-of key types must align left/right")

  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))

  override lazy val metrics = Map(
    "numOutputRows" -> SQLMetrics.createMetric(sparkContext, "number of output rows"),
    "numMatched" -> SQLMetrics.createMetric(sparkContext, "number of matched left rows"))

  // keys only — the planner shuffles each side once, never on time
  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(leftKeys) :: ClusteredDistribution(rightKeys) :: Nil

  private def timeDir: SortDirection = if (forward) Descending else Ascending

  override def requiredChildOrdering: Seq[Seq[SortOrder]] = Seq(
    leftKeys.map(SortOrder(_, Ascending)) :+ SortOrder(leftTime, timeDir),
    rightKeys.map(SortOrder(_, Ascending)) :+ SortOrder(rightTime, timeDir))

  // left rows pass through in place: partitioning and ordering survive
  override def outputPartitioning: Partitioning = left.outputPartitioning
  override def outputOrdering: Seq[SortOrder] = left.outputOrdering

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): AsOfJoinExec =
    copy(left = newLeft, right = newRight)

  override protected def doExecute(): RDD[InternalRow] = {
    val numOutputRows = longMetric("numOutputRows")
    val numMatched = longMetric("numMatched")
    val fwd = forward
    val tol = tolerance
    val keyTypes = leftKeys.map(_.dataType)
    val lKeyExprs = leftKeys
    val rKeyExprs = rightKeys
    val lTimeExpr = leftTime
    val rTimeExpr = rightTime
    val lOutput = left.output
    val rOutput = right.output
    val allOutput = output

    left.execute().zipPartitions(right.execute()) { (lIter, rIter) =>
      val lKeyProj = UnsafeProjection.create(lKeyExprs, lOutput)
      val rKeyProj = UnsafeProjection.create(rKeyExprs, rOutput)
      val lTime = BindReferences.bindReference(lTimeExpr, lOutput)
      val rTime = BindReferences.bindReference(rTimeExpr, rOutput)
      val keyOrd: Ordering[InternalRow] =
        RowOrdering.createNaturalAscendingOrdering(keyTypes)
      val resultProj = UnsafeProjection.create(allOutput, allOutput)
      val nullRight = new GenericInternalRow(rOutput.length)
      val joined = new JoinedRow

      def timeOf(e: Expression, row: InternalRow): java.lang.Long =
        e.eval(row) match {
          case null => null
          case n: java.lang.Number => n.longValue()
        }
      // scan-order predicate: with time ascending (backward) keep rights at
      // or before the left time; descending (forward) keep rights at or after
      def inReach(rt: Long, lt: Long): Boolean = if (fwd) rt >= lt else rt <= lt

      new Iterator[InternalRow] {
        // lookahead right row (rows with NULL key/time can never match: skipped)
        private var rRow: InternalRow = advanceRight()
        // last right row satisfying the inequality, with its key and time
        private var matchRow: InternalRow = _
        private var matchKey: UnsafeRow = _
        private var matchT: Long = _

        private def advanceRight(): InternalRow = {
          while (rIter.hasNext) {
            val r = rIter.next()
            if (!rKeyProj(r).anyNull && timeOf(rTime, r) != null) return r
          }
          null
        }

        override def hasNext: Boolean = lIter.hasNext

        override def next(): InternalRow = {
          val lRow = lIter.next()
          val lk = lKeyProj(lRow)
          val lt = timeOf(lTime, lRow)
          if (!lk.anyNull && lt != null) {
            // consume rights up to this left row's (key, time) frontier
            var break = false
            while (!break && rRow != null) {
              val rk = rKeyProj(rRow)
              val c = keyOrd.compare(rk, lk)
              if (c < 0) rRow = advanceRight()
              else {
                val rt = if (c == 0) timeOf(rTime, rRow).longValue() else 0L
                if (c == 0 && inReach(rt, lt)) {
                  matchRow = rRow.copy()
                  matchKey = rk.copy()
                  matchT = rt
                  rRow = advanceRight()
                } else break = true
              }
            }
          }
          val hit = matchRow != null && !lk.anyNull && lt != null &&
            keyOrd.compare(matchKey, lk) == 0 &&
            tol.forall(t => math.abs(lt - matchT) <= t)
          numOutputRows += 1
          if (hit) {
            numMatched += 1
            resultProj(joined(lRow, matchRow))
          } else resultProj(joined(lRow, nullRight))
        }
      }
    }
  }
}
