package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.Inner
import org.apache.spark.sql.catalyst.plans.logical.{Join, LogicalPlan, Project}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.TimestampType

/** Opt-in Catalyst optimizer rule (SURVEY §7.3 preference (c)): rewrites a
  * point-in-interval inner join — which Spark would execute as
  * BroadcastNestedLoop, quadratic work — into the binned equi-join shape of
  * `ops.RangeJoin.pointInInterval` (explode intervals to covered bins, join
  * on (equi-keys..., bin), exact residual filter).
  *
  * HINT-DRIVEN like production range-join optimizations: inert unless the
  * session sets `spark.graft.rangeJoin.binSizeUs` (> 0) — bin width is a
  * data-dependent choice the user makes (near the typical interval length).
  * Matched shape: Inner join whose condition is a conjunction of
  * equi-conjuncts plus exactly one `pt >= lo AND pt <(=) hi` pair over
  * TIMESTAMP columns, point side and interval side on opposite inputs.
  * Anything else is left untouched. The rewrite never rematches (the new
  * join's condition is pure equality; the residual lives in a Filter).
  */
case class RangeJoinRule(spark: SparkSession) extends Rule[LogicalPlan] {

  private val ConfKey = "spark.graft.rangeJoin.binSizeUs"

  private def binUs: Long =
    try spark.conf.get(ConfKey, "0").toLong catch { case _: NumberFormatException => 0L }

  override def apply(plan: LogicalPlan): LogicalPlan = {
    val bin = binUs
    if (bin <= 0) return plan
    plan.transform {
      // user-hinted joins are left alone (the rewrite would discard the
      // hint and silently override an explicit broadcast request)
      case j @ Join(left, right, Inner, Some(cond), hint)
          if hint == org.apache.spark.sql.catalyst.plans.logical.JoinHint.NONE =>
        tryRewrite(j, left, right, cond, bin).getOrElse(j)
    }
  }

  private def attrsOf(p: LogicalPlan): AttributeSet = p.outputSet

  private val BinCol = "__graft_rjbin"

  private def tryRewrite(j: Join, left: LogicalPlan, right: LogicalPlan,
      cond: Expression, bin: Long): Option[LogicalPlan] = {
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
    val lAttrs = attrsOf(left)
    val rAttrs = attrsOf(right)

    def side(e: Expression): Option[Boolean] = e match {
      case a: Attribute if lAttrs.contains(a) => Some(true)
      case a: Attribute if rAttrs.contains(a) => Some(false)
      case _ => None
    }
    def isTs(e: Expression): Boolean = e.dataType == TimestampType

    // classify conjuncts: lower bound, upper bound, equi pairs; bail on rest
    var lower: Option[(Attribute, Attribute)] = None            // (pt, lo)
    var upper: Option[(Attribute, Attribute, Boolean)] = None   // (pt, hi, inclusive)
    var equis = Vector.empty[(Attribute, Attribute)]            // (left, right)
    for (c <- conjuncts) c match {
      case GreaterThanOrEqual(a: Attribute, b: Attribute)
          if isTs(a) && isTs(b) && lower.isEmpty && side(a).isDefined &&
            side(b).isDefined && side(a) != side(b) =>
        lower = Some((a, b))
      case LessThanOrEqual(b: Attribute, a: Attribute)
          if isTs(a) && isTs(b) && lower.isEmpty && side(a).isDefined &&
            side(b).isDefined && side(a) != side(b) =>
        lower = Some((a, b))
      case LessThan(a: Attribute, b: Attribute)
          if isTs(a) && isTs(b) && upper.isEmpty && side(a).isDefined &&
            side(b).isDefined && side(a) != side(b) =>
        upper = Some((a, b, false))
      case LessThanOrEqual(a: Attribute, b: Attribute)
          if isTs(a) && isTs(b) && upper.isEmpty && side(a).isDefined &&
            side(b).isDefined && side(a) != side(b) =>
        upper = Some((a, b, true))
      case EqualTo(a: Attribute, b: Attribute)
          if side(a).isDefined && side(b).isDefined && side(a) != side(b) =>
        equis :+= (if (side(a).contains(true)) (a, b) else (b, a))
      case _ => return None
    }
    (lower, upper) match {
      case (Some((pt1, lo)), Some((pt2, hi, inclusive))) if pt1.semanticEquals(pt2) =>
        // point attr on one side, both bounds on the other
        val ptOnLeft = side(pt1).get
        if (side(lo) == side(pt1) || side(hi) == side(pt1)) return None
        if (side(lo) != side(hi)) return None
        Some(build(j, left, right, pt1, lo, hi, inclusive, ptOnLeft, equis, bin))
      case _ => None
    }
  }

  private def splitConjuncts(e: Expression): Seq[Expression] = e match {
    case And(a, b) => splitConjuncts(a) ++ splitConjuncts(b)
    case other => Seq(other)
  }

  private def build(j: Join, left: LogicalPlan, right: LogicalPlan,
      pt: Attribute, lo: Attribute, hi: Attribute, inclusive: Boolean,
      ptOnLeft: Boolean, equis: Seq[(Attribute, Attribute)], bin: Long): LogicalPlan = {
    import org.apache.spark.sql.graft.PlanBridge
    val ldf = PlanBridge.ofRows(spark, left)
    val rdf = PlanBridge.ofRows(spark, right)
    val (ptDf, ivDf) = if (ptOnLeft) (ldf, rdf) else (rdf, ldf)

    // bin arithmetic shared with the explicit operator — one definition
    val ptBinned = ptDf.withColumn(BinCol,
      graft.ops.RangeJoin.pointBin(col(pt.name), bin))
    val ivBinned = ivDf
      .filter(col(lo.name) <= col(hi.name)) // inverted intervals match nothing
      .withColumn(BinCol,
        graft.ops.RangeJoin.intervalBins(col(lo.name), col(hi.name), bin, inclusive))

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
}
