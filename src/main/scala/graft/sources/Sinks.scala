package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** At-rest layout API (SURVEY.md §2.10 sink surface): the three layouts
  * that decide 100 TB read cost, as first-class operations.
  *
  *  - PARTITIONED parquet: directory-per-value layout; predicate on the
  *    partition column becomes partition PRUNING (directories never
  *    listed, verified in SinkSpec via PartitionFilters).
  *  - BUCKETED table: pre-hashed layout on the join/agg key; equal keys
  *    co-locate, so later joins/aggregations on that key run with ZERO
  *    shuffle (verified in ScaleSpec: no Exchange in the joined plan).
  *  - Arrow batch directory: raw record-batch payloads for zero-ETL
  *    handoff (ArrowInterop.writeBatchDir).
  *
  * Parquet remains the at-rest encoding (the reference's own storage
  * boundary); these wrappers pin the repo's layout conventions.
  */
object Sinks {

  /** Partitioned parquet sink — reads filtered on `partitionCols` prune. */
  def writePartitioned(df: DataFrame, path: String, partitionCols: Seq[String]): Unit =
    df.write.mode("overwrite").partitionBy(partitionCols: _*).parquet(path)

  /** Bucketed+sorted managed table — joins/aggs on `keys` shuffle-free.
    * (Bucketing requires the table catalog; plain file sinks can't carry
    * the bucket spec.)
    */
  def writeBucketed(df: DataFrame, table: String, buckets: Int, keys: Seq[String]): Unit =
    df.write.mode("overwrite")
      .bucketBy(buckets, keys.head, keys.tail: _*)
      .sortBy(keys.head, keys.tail: _*)
      .saveAsTable(table)

  /** Read back a partitioned dataset (partition columns reappear as data
    * columns; filters on them prune directories).
    */
  def readPartitioned(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(path)
}
