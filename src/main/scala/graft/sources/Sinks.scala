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

  /** Per-file column-statistics manifest: (file, n_rows, min_c/max_c per
    * requested column) — the data-skipping index a 100 TB table keeps
    * next to its files (Delta/Iceberg metadata, Hudi column-stats index).
    * Built with ONE columnar scan of just the requested columns (parquet
    * reads only those pages), grouped by `input_file_name`; built once
    * per layout rewrite, consulted by every subsequent query.
    */
  def statsManifest(spark: SparkSession, path: String, cols: Seq[String]): DataFrame = {
    import org.apache.spark.sql.functions._
    val aggs = count(lit(1)).as("n_rows") +:
      cols.flatMap(c => Seq(min(col(c)).as(s"min_$c"), max(col(c)).as(s"max_$c")))
    spark.read.parquet(path)
      .groupBy(input_file_name().as("file"))
      .agg(aggs.head, aggs.tail: _*)
  }

  /** Manifest-pruned read: keep only files whose [min,max] range on `c`
    * can overlap [lo, hi], then apply the residual row filter. With a
    * z-ordered or sorted layout most files drop out at the MANIFEST
    * (driver-side, one tiny row per file) before any data IO — the
    * skipping path that makes multi-dimensional clustering pay off.
    * Files with null stats (all-null column) are kept: absence of
    * evidence is not exclusion. Result ≡ full-scan filter, exactly.
    */
  def readPruned(spark: SparkSession, path: String, c: String, lo: Long, hi: Long): DataFrame = {
    import org.apache.spark.sql.functions._
    require(lo <= hi, s"empty range [$lo, $hi]")
    val m = statsManifest(spark, path, Seq(c))
      .select(col("file"), col(s"min_$c").cast("long"), col(s"max_$c").cast("long"))
      .collect()
    val keep = m.filter { r =>
      r.isNullAt(1) || r.isNullAt(2) || !(r.getLong(2) < lo || r.getLong(1) > hi)
    }.map(_.getString(0))
    val base = if (keep.isEmpty) spark.read.parquet(path).limit(0)
      else spark.read.parquet(keep.toIndexedSeq: _*)
    base.filter(col(c).between(lo, hi))
  }
}
