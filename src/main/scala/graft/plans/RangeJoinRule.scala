package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.Inner
import org.apache.spark.sql.catalyst.plans.logical.{Join, LogicalPlan, Project}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DataType

/** Opt-in Catalyst optimizer rule (SURVEY §7.3 preference (c)): rewrites the
  * two classic range-join shapes — which Spark would execute as
  * BroadcastNestedLoop, quadratic work — into the binned equi-join shapes of
  * `ops.RangeJoin` (explode intervals to covered bins, join on
  * (equi-keys..., bin), exact residual filter):
  *
  *  - point-in-interval: `pt >= lo AND pt <(=) hi`
  *  - interval-overlap:  `loL < hiR AND loR < hiL` (half-open windows;
  *    deduplicated by keeping only the overlap-START bin — a filter, not a
  *    distinct)
  *
  * The range axis may be TIMESTAMP/TIMESTAMP_NTZ (bin width in µs), DATE
  * (width in days), or INT/BIGINT (width in value units) — the same type on
  * all range columns of a join (`ops.RangeJoin.axisTypes`).
  *
  * HINT-DRIVEN like production range-join optimizations: inert unless the
  * session sets a bin width FOR THE JOIN'S AXIS TYPE — bin width is a
  * data-dependent, unit-bearing choice, so each axis family has its own
  * key and one session can safely mix axis types:
  *
  *  - `spark.graft.rangeJoin.binSizeUs`    (TIMESTAMP/TIMESTAMP_NTZ, µs)
  *  - `spark.graft.rangeJoin.binSizeDays`  (DATE)
  *  - `spark.graft.rangeJoin.binSizeUnits` (INT/BIGINT raw units)
  *
  * A join over an axis whose key is unset/0 is left untouched. Matched shape:
  * Inner join whose condition is a conjunction of equi-conjuncts plus
  * exactly one of the two range patterns over supported axis columns, point
  * and interval sides on opposite inputs. Anything else is left untouched.
  * The rewrite never rematches (the new join's condition is pure equality;
  * the residual lives in a Filter).
  */
case class RangeJoinRule(spark: SparkSession) extends Rule[LogicalPlan] {

  private def confLong(k: String): Long =
    try spark.conf.get(k, "0").toLong catch { case _: NumberFormatException => 0L }

  /** Bin width for one axis type — 0 (no rewrite) unless its key is set. */
  private def widthFor(dt: DataType): Long = dt match {
    case org.apache.spark.sql.types.TimestampType |
         org.apache.spark.sql.types.TimestampNTZType =>
      confLong("spark.graft.rangeJoin.binSizeUs")
    case org.apache.spark.sql.types.DateType =>
      confLong("spark.graft.rangeJoin.binSizeDays")
    case org.apache.spark.sql.types.LongType |
         org.apache.spark.sql.types.IntegerType =>
      confLong("spark.graft.rangeJoin.binSizeUnits")
    case _ => 0L
  }

  private def anyWidthSet: Boolean =
    confLong("spark.graft.rangeJoin.binSizeUs") > 0 ||
      confLong("spark.graft.rangeJoin.binSizeDays") > 0 ||
      confLong("spark.graft.rangeJoin.binSizeUnits") > 0

  override def apply(plan: LogicalPlan): LogicalPlan = {
    if (!anyWidthSet) return plan
    plan.transform {
      // user-hinted joins are left alone (the rewrite would discard the
      // hint and silently override an explicit broadcast request)
      case j @ Join(left, right, Inner, Some(cond), hint)
          if hint == org.apache.spark.sql.catalyst.plans.logical.JoinHint.NONE =>
        tryRewrite(j, left, right, cond).getOrElse(j)
    }
  }

  private val BinCol = "__graft_rjbin"

  private def splitConjuncts(e: Expression): Seq[Expression] = e match {
    case And(a, b) => splitConjuncts(a) ++ splitConjuncts(b)
    case other => Seq(other)
  }

  private def tryRewrite(j: Join, left: LogicalPlan, right: LogicalPlan,
      cond: Expression): Option[LogicalPlan] = {
    // column names must be unambiguous for the Dataset-level
    // reconstruction — compared case-insensitively (Spark's default
    // resolution), and the bin column name is reserved. The BinCol check
    // is also the explicit no-rematch marker: predicate pushdown can fold
    // the residual filter back into the rewritten join's condition, and
    // without this bail the fixed-point optimizer would re-bin forever.
    val names = (left.output.map(_.name) ++ right.output.map(_.name)).map(_.toLowerCase)
    if (names.distinct.length != names.length) return None
    if (names.contains(BinCol)) return None

    val conjuncts = splitConjuncts(cond)
    val lAttrs = left.outputSet
    val rAttrs = right.outputSet

    def side(e: Expression): Option[Boolean] = e match {
      case a: Attribute if lAttrs.contains(a) => Some(true)
      case a: Attribute if rAttrs.contains(a) => Some(false)
      case _ => None
    }
    def isAxis(e: Expression): Boolean = graft.ops.RangeJoin.axisTypes.contains(e.dataType)
    def crossSide(a: Expression, b: Expression): Boolean =
      side(a).isDefined && side(b).isDefined && side(a) != side(b)

    // classify conjuncts: >= bounds, strict/inclusive < bounds, equi pairs;
    // bail on anything else
    var lowers = Vector.empty[(Attribute, Attribute)]           // (pt, lo): pt >= lo
    var uppers = Vector.empty[(Attribute, Attribute, Boolean)]  // (a, b, inclusive): a <(=) b
    var equis = Vector.empty[(Attribute, Attribute)]            // (left, right)
    for (c <- conjuncts) c match {
      case GreaterThanOrEqual(a: Attribute, b: Attribute)
          if isAxis(a) && a.dataType == b.dataType && crossSide(a, b) =>
        lowers :+= ((a, b))
      // a cross-side `x <= y` is ambiguous (lo <= pt vs pt <= hi): first
      // one seen becomes the lower — the final shape match re-validates
      // via pt1/pt2 identity, so a misread just means no rewrite
      case LessThanOrEqual(b: Attribute, a: Attribute)
          if isAxis(a) && a.dataType == b.dataType && crossSide(a, b) && lowers.isEmpty =>
        lowers :+= ((a, b))
      case LessThan(a: Attribute, b: Attribute)
          if isAxis(a) && a.dataType == b.dataType && crossSide(a, b) =>
        uppers :+= ((a, b, false))
      case LessThanOrEqual(a: Attribute, b: Attribute)
          if isAxis(a) && a.dataType == b.dataType && crossSide(a, b) =>
        uppers :+= ((a, b, true))
      case EqualTo(a: Attribute, b: Attribute) if crossSide(a, b) =>
        equis :+= (if (side(a).contains(true)) (a, b) else (b, a))
      case _ => return None
    }

    (lowers, uppers) match {
      // point-in-interval: pt >= lo AND pt <(=) hi, bounds on one side
      case (Vector((pt1, lo)), Vector((pt2, hi, inclusive))) if pt1.semanticEquals(pt2) =>
        val ptOnLeft = side(pt1).get
        if (side(lo) == side(pt1) || side(hi) == side(pt1)) return None
        if (side(lo) != side(hi)) return None
        val bin = widthFor(pt1.dataType)
        if (bin <= 0) return None
        Some(buildPoint(j, left, right, pt1, lo, hi, inclusive, ptOnLeft, equis, bin))
      // interval-overlap: loL < hiR AND loR < hiL (both strict), one
      // lower-attr on each side, four distinct columns (a degenerate
      // pt > lo AND pt < hi also reaches here — shared attrs — and is
      // deliberately not matched)
      case (Vector(), Vector((x1, y1, false), (x2, y2, false)))
          if side(x1) != side(x2) &&
            Seq(x1, y1, x2, y2).map(_.exprId).distinct.length == 4 &&
            Seq(y1, x2, y2).forall(_.dataType == x1.dataType) =>
        // orient so (loL, hiL) is on the left input
        val (loL, hiR, loR, hiL) =
          if (side(x1).contains(true)) (x1, y1, x2, y2) else (x2, y2, x1, y1)
        if (side(hiL) != Some(true) || side(hiR) != Some(false)) return None
        val bin = widthFor(loL.dataType)
        if (bin <= 0) return None
        Some(buildOverlap(j, left, right, loL, hiL, loR, hiR, equis, bin))
      case _ => None
    }
  }

  /** Analyzed-plan → DataFrame bridges for the rewrite body. */
  private def dfs(left: LogicalPlan, right: LogicalPlan) = {
    import org.apache.spark.sql.graft.PlanBridge
    (PlanBridge.ofRows(spark, left), PlanBridge.ofRows(spark, right))
  }

  private def buildPoint(j: Join, left: LogicalPlan, right: LogicalPlan,
      pt: Attribute, lo: Attribute, hi: Attribute, inclusive: Boolean,
      ptOnLeft: Boolean, equis: Seq[(Attribute, Attribute)], bin: Long): LogicalPlan = {
    import org.apache.spark.sql.graft.PlanBridge
    val (ldf, rdf) = dfs(left, right)
    val (ptDf, ivDf) = if (ptOnLeft) (ldf, rdf) else (rdf, ldf)
    val dt: DataType = pt.dataType

    // bin arithmetic shared with the explicit operator — one definition
    val ptBinned = ptDf.withColumn(BinCol,
      graft.ops.RangeJoin.pointBin(col(pt.name), dt, bin))
    val ivBinned = ivDf
      .filter(col(lo.name) <= col(hi.name)) // inverted intervals match nothing
      .withColumn(BinCol,
        graft.ops.RangeJoin.intervalBins(col(lo.name), col(hi.name), dt, bin, inclusive))

    val equiCond = equis.map { case (la, ra) =>
      if (ptOnLeft) ptBinned(la.name) === ivBinned(ra.name)
      else ivBinned(la.name) === ptBinned(ra.name)
    }
    val joinCond = (equiCond :+
      (ptBinned(BinCol) === ivBinned(BinCol))).reduce(_ && _)
    val residual = col(pt.name) >= col(lo.name) &&
      (if (inclusive) col(pt.name) <= col(hi.name) else col(pt.name) < col(hi.name))

    val joined = ptBinned.join(ivBinned, joinCond)
      .filter(residual)
      .drop(BinCol)
    // restore the original output order/attributes — child attr ids pass
    // through the reconstruction untouched, so this Project resolves
    Project(j.output, PlanBridge.analyzed(joined))
  }

  private def buildOverlap(j: Join, left: LogicalPlan, right: LogicalPlan,
      loL: Attribute, hiL: Attribute, loR: Attribute, hiR: Attribute,
      equis: Seq[(Attribute, Attribute)], bin: Long): LogicalPlan = {
    import org.apache.spark.sql.graft.PlanBridge
    val (ldf, rdf) = dfs(left, right)
    val dt: DataType = loL.dataType

    val lBinned = ldf.withColumn(BinCol,
      graft.ops.RangeJoin.intervalBins(col(loL.name), col(hiL.name), dt, bin, inclusiveHi = false))
    val rBinned = rdf.withColumn(BinCol,
      graft.ops.RangeJoin.intervalBins(col(loR.name), col(hiR.name), dt, bin, inclusiveHi = false))

    val equiCond = equis.map { case (la, ra) => lBinned(la.name) === rBinned(ra.name) }
    val joinCond = (equiCond :+ (lBinned(BinCol) === rBinned(BinCol))).reduce(_ && _)
    val residual = col(loL.name) < col(hiR.name) && col(loR.name) < col(hiL.name)
    // each overlapping pair shares many bins; keep only the overlap-START
    // bin — same distinct-free dedupe as ops.RangeJoin.intervalOverlap.
    // Dataset-qualified: both sides still carry BinCol at this point (the
    // join condition equates them, so either qualifies)
    val dedupe = lBinned(BinCol) ===
      graft.ops.RangeJoin.pointBin(greatest(col(loL.name), col(loR.name)), dt, bin)

    val joined = lBinned.join(rBinned, joinCond)
      .filter(residual)
      .filter(dedupe)
      .drop(BinCol)
    Project(j.output, PlanBridge.analyzed(joined))
  }
}
