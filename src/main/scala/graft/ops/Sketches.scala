package graft.ops

import java.io.ByteArrayInputStream

import org.apache.spark.sql.{Column, DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}
import org.apache.spark.util.sketch.CountMinSketch

/** Count-min sketch point-frequency estimation — the frequency sibling of
  * the HLL cardinality estimators (SURVEY §2.6) and the mergeable-summary
  * complement of the Misra-Gries heavy-hitter aggregator: MG answers
  * "which items are frequent", CMS answers "how frequent is THIS item"
  * for any probe, in eps·N error with fixed memory.
  *
  * Built with Spark's `count_min_sketch` SQL aggregate (codegen'd partial
  * aggregation; partial sketches merge by cell-wise addition, so the
  * result is EXACTLY merge-order independent — estimates are deterministic
  * for a fixed seed no matter how the data is partitioned). The finished
  * sketch is a few KiB of binary collected to the driver — the same
  * bounded-materialization contract as `DataFrameStatFunctions
  * .countMinSketch` — and decoded with the public
  * `org.apache.spark.util.sketch.CountMinSketch` reader.
  *
  * Reference surface: minarrow's estimator battery exposes exact value
  * counts (`src/kernels/aggregate.rs` count paths); CMS is the 100 TB
  * path when the vocabulary no longer fits an exact hash aggregate.
  */
object Sketches {

  /** Aggregate `c` into a count-min sketch and decode it driver-side. */
  def countMinSketch(df: DataFrame, c: Column, eps: Double, confidence: Double,
      seed: Int): CountMinSketch = {
    val bytes = df
      .agg(call_function("count_min_sketch", c, lit(eps), lit(confidence), lit(seed))
        .as("sk"))
      .head().getAs[Array[Byte]](0)
    CountMinSketch.readFrom(new ByteArrayInputStream(bytes))
  }

  /** Estimated frequency of each string probe: one row (probe, est).
    * Estimates never undercount; overcount is bounded by eps·N with the
    * sketch's confidence.
    */
  def countMinEstimates(spark: SparkSession, df: DataFrame, c: Column,
      probes: Seq[String], eps: Double = 1e-4, confidence: Double = 0.99,
      seed: Int = 42): DataFrame = {
    val sketch = countMinSketch(df, c, eps, confidence, seed)
    val rows = probes.map(p => Row(p, sketch.estimateCount(p)))
    val schema = StructType(Seq(
      StructField("probe", StringType, nullable = false),
      StructField("est", LongType, nullable = false)))
    spark.createDataFrame(spark.sparkContext.parallelize(rows, 1), schema)
  }

  /** Sampling-based cardinality-ratio estimate — the reference's OWN
    * estimator contract (utils.rs:327 estimate_categorical_cardinality,
    * utils.rs:348 estimate_string_cardinality): visit every `step`-th row
    * in order (step = max(n/sampleSize, 1)), count distinct values seen
    * (capped at sampleSize — the reference breaks once the set fills),
    * return distinct / min(sampleSize, n). Deterministic given the order
    * column, hence SQL-replayable cell-exactly — unlike the HLL twin
    * (q29) whose error is engine-specific.
    *
    * Distributed shape: the systematic row pick rides [[RowIndex]] (one
    * range shuffle, or a single narrow stage under its dimension-size
    * fast path); the distinct count then runs over ~sampleSize rows.
    */
  def sampleCardinalityRatio(df: DataFrame, valueCol: String,
      order: Seq[Column], sampleSize: Int): DataFrame = {
    require(sampleSize > 0, "sampleSize must be positive")
    val n = df.count()
    if (n == 0) {
      val spark = df.sparkSession
      import spark.implicits._
      return Seq(0.0).toDF("ratio")
    }
    val step = math.max(n / sampleSize, 1L)
    RowIndex.withRowIndex(df.select((col(valueCol) +: order): _*), "__i", order)
      .filter(col("__i") % step === 0)
      .agg((least(countDistinct(col(valueCol)), lit(sampleSize.toLong))
        / lit(math.min(sampleSize.toLong, n))).as("ratio"))
  }
}
