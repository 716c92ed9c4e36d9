package graft.ops

import org.apache.spark.sql.{Column, DataFrame, Observation, Row, SparkSession}

/** Pipeline QA metrics as a zero-extra-pass side-output — Spark's
  * `Observation` API (an accumulator-backed observe node in the plan).
  *
  * At 100 TB the naive way to collect row counts / null counts / value
  * ranges for a data-quality gate is a SECOND aggregation scan over the
  * pipeline output; `observe` folds the aggregates into the pipeline's
  * own action, so the stats arrive with the write for free. This is the
  * engine-level analog of the reference's display/introspection surface
  * (SURVEY §2.13) applied to production pipelines: the metrics are exact
  * aggregates, not samples.
  *
  * Constraint inherited from Spark: observed metrics must be aggregates
  * over the observed plan node and cannot reference non-deterministic
  * expressions; an Observation yields exactly one row per action.
  */
object Observe {

  /** Run `df` through a no-output action (`noop` datasource — planning,
    * codegen and the full scan happen, rows are discarded at the sink)
    * and return the observed aggregates as a one-row DataFrame whose
    * column names/types mirror the metric expressions.
    */
  def observedStats(spark: SparkSession, df: DataFrame,
      metrics: Seq[(String, Column)]): DataFrame = {
    require(metrics.nonEmpty, "at least one observed metric required")
    val named = metrics.map { case (n, c) => c.as(n) }
    val obs = Observation()
    df.observe(obs, named.head, named.tail: _*)
      .write.format("noop").mode("overwrite").save()
    // schema comes from the same expressions resolved against df — typed
    // without executing anything extra
    val schema = df.select(named: _*).schema
    val row = Row.fromSeq(schema.fieldNames.map(obs.get(_)).toSeq)
    spark.createDataFrame(
      java.util.Collections.singletonList(row), schema)
  }

  /** Same, but the action is a real parquet write of the pipeline output:
    * the production shape — data lands AND the QA row comes back, one scan.
    */
  def writeWithStats(spark: SparkSession, df: DataFrame, outPath: String,
      metrics: Seq[(String, Column)]): DataFrame = {
    require(metrics.nonEmpty, "at least one observed metric required")
    val named = metrics.map { case (n, c) => c.as(n) }
    val obs = Observation()
    df.observe(obs, named.head, named.tail: _*)
      .write.mode("overwrite").parquet(outPath)
    val schema = df.select(named: _*).schema
    val row = Row.fromSeq(schema.fieldNames.map(obs.get(_)).toSeq)
    spark.createDataFrame(
      java.util.Collections.singletonList(row), schema)
  }
}
