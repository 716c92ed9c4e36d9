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
  }
}
