package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.ExpressionInfo

/** SparkSessionExtensions entry point — the idiomatic packaging for a
  * Spark-extension library (SURVEY.md §7.3 preference order (c)): every
  * custom kernel function is injected at SESSION BUILD time, so
  *
  * {{{
  * spark-submit --conf spark.sql.extensions=graft.GraftExtensions ...
  * }}}
  *
  * gives `spark.sql` users the whole kernel surface on every session with
  * no per-session `GraftFunctions.registerAll` call. Same builder table as
  * the imperative path — one source of truth.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    GraftFunctions.builders.foreach { case (name, builder) =>
      ext.injectFunction((
        FunctionIdentifier(name),
        new ExpressionInfo("graft", name),
        builder))
    }
    // hint-driven range-join rewrite (inert unless
    // spark.graft.rangeJoin.binSizeUs is set on the session)
    ext.injectOptimizerRule(session => graft.plans.RangeJoinRule(session))
    // physical as-of join (inert unless an AsOfJoinPlan node is present)
    ext.injectPlannerStrategy(_ => graft.plans.AsOfJoinStrategy)
  }
}
