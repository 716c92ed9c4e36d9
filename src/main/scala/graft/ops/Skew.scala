package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation for hot join keys (SURVEY.md scale notes; AQE's
  * skew-join split handles sort-merge cases at runtime, salting is the
  * explicit-plan variant that also works for hash joins and pre-Spark-AQE
  * pipelines).
  *
  * `saltedJoin`: the skewed (large) side gets a DETERMINISTIC salt in
  * [0, factor) derived from a hash of its whole row, splitting each hot
  * key into `factor` sub-keys; the other side is replicated `factor`
  * times. One shuffle on (key, salt); each sub-key lands on a different
  * task. Deterministic (no rand()) so results are replayable.
  */
object Skew {

  def withSalt(df: DataFrame, factor: Int, saltCol: String = "__salt"): DataFrame =
    df.withColumn(saltCol,
      pmod(hash(df.columns.map(col): _*), lit(factor)).cast("int"))

  def replicated(df: DataFrame, factor: Int, saltCol: String = "__salt"): DataFrame =
    df.withColumn(saltCol, explode(sequence(lit(0), lit(factor - 1))))
      .withColumn(saltCol, col(saltCol).cast("int"))

  /** Inner/left join `skewed ⋈ other` on `keys`, salted `factor` ways. */
  def saltedJoin(skewed: DataFrame, other: DataFrame, keys: Seq[String],
      factor: Int, joinType: String = "inner"): DataFrame = {
    val l = withSalt(skewed, factor)
    val r = replicated(other, factor)
    l.join(r, keys :+ "__salt", joinType).drop("__salt")
  }

  /** Two-phase grouped aggregation with an explicit salt: partial agg on
    * (key, salt), final agg on key. Spark's hash aggregate already does
    * partial+final map-side combine; this variant exists for agg functions
    * without partial pushdown (e.g. exact collect-based ones) where a hot
    * key would otherwise serialize into one reducer.
    */
  def saltedDistinctCount(df: DataFrame, key: Column, value: Column, factor: Int): DataFrame =
    df.withColumn("__salt", pmod(hash(value), lit(factor)))
      .groupBy(key.as("k"), col("__salt"))
      .agg(countDistinct(value).as("partial"))
      .groupBy(col("k"))
      .agg(sum(col("partial")).as("n_distinct"))
}
