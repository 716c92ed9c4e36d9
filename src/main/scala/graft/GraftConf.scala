package graft

import org.apache.spark.sql.SparkSession

/** Session configuration the engine's semantics depend on. Applied lazily at
  * query-construction time so it also takes effect under externally-created
  * sessions (the driver's Verify session).
  */
object GraftConf {
  def tune(spark: SparkSession): Unit = {
    // minarrow masked semantics: div/rem by zero → NULL, overflow wraps
    // (src/enums/operators.rs:27-29; std.rs:41 WrappingAdd bounds) — that is
    // Spark's non-ANSI mode. Spark 4 defaults ANSI on, so switch it off.
    spark.conf.set("spark.sql.ansi.enabled", "false")
    // events.ts is parquet TIMESTAMP(NANOS), unsupported by Spark's reader:
    // read as Long nanos, normalized to µs in Tables.events.
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    spark.conf.set("spark.sql.adaptive.enabled", "true")
    // native TIME(n) type (Spark 4.1, flag-gated) — the reference's
    // Time64(Microsecond) analog (ops/TimeOfDay.scala)
    spark.conf.set("spark.sql.timeType.enabled", "true")
    // InferFiltersFromGenerate synthesizes `isnotnull(g) AND size(g) > 0`
    // below every explode and predicate-pushdown then INLINES the
    // generator input into that filter — for this engine's computed
    // token/gram kernels over text (explode(ascii_tokens(text)) etc.,
    // the dominant generate shape here) that re-evaluates the whole
    // byte-scan kernel 1-2 extra times PER ROW, and the inferred filter
    // can never reach a parquet scan anyway (it guards a computed
    // expression, not a stored column). Measured on q82: the generate
    // branch ran the tokenizer 3× per row with the rule on, 1× with it
    // off. Scale-independent: the recompute grows with data, the
    // filter's benefit here is zero. (Stored-ARRAY-column generates,
    // where the inferred isnotnull could push to a scan, do not occur
    // on this engine's hot paths.)
    spark.conf.set("spark.sql.optimizer.excludedRules",
      "org.apache.spark.sql.catalyst.optimizer.InferFiltersFromGenerate")
  }
}
