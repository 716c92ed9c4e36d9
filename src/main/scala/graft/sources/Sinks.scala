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

  /** MERGE / upsert into a partitioned parquet layout — the missing DML
    * verb for an at-rest table: rows in `updates` replace same-key rows,
    * new keys append. The rewrite is PARTITION-LIMITED: only partitions
    * present in `updates` are read, merged (anti-join on the keys) and
    * swapped via dynamic partition overwrite — a 100 TB table with a
    * day's worth of updates rewrites a day's partitions, not the table.
    *
    * Contract: updates must keep each key's partition value (the
    * date-partitioned-fact norm). A partition-moving update would leave
    * the old row alive in its old partition — detecting that requires a
    * full key scan, which is exactly the cost this operator exists to
    * avoid; use a full rewrite when keys can change partitions.
    */
  def mergeUpsert(spark: SparkSession, path: String, updates: org.apache.spark.sql.DataFrame,
      keys: Seq[String], partitionCol: String): Unit = {
    import org.apache.spark.sql.functions.col
    val affected = updates.select(col(partitionCol)).distinct().collect().map(_.get(0))
    val target = spark.read.parquet(path)
      .filter(col(partitionCol).isin(affected.toIndexedSeq: _*))
    val merged = updates.unionByName(
      target.join(updates.select(keys.map(col): _*).distinct(), keys, "left_anti"))
    // the overwrite replaces partitions the merge plan READS, so the
    // merged working set must be materialized first — and DURABLY: an
    // unreplicated localCheckpoint would make the merged rows' only copy
    // an executor's local blocks, so losing one mid-overwrite strands the
    // table with no recovery source. Stage to a sibling directory instead
    // (the compactBatchDir pattern): the overwrite then sources from
    // at-rest parquet independent of the rows it replaces, and a crash
    // mid-commit is replayable from the stage.
    val stage = path.stripSuffix("/") + ".__graft_merge_stage"
    merged.write.mode("overwrite").parquet(stage)
    spark.read.parquet(stage).write.mode("overwrite")
      .option("partitionOverwriteMode", "dynamic")
      .partitionBy(partitionCol)
      .parquet(path)
    val fs = new org.apache.hadoop.fs.Path(stage)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.delete(new org.apache.hadoop.fs.Path(stage), true)
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
    val keep = prunedFiles(spark, path, c, lo, hi).collect().map(_.getString(0))
    val base = if (keep.isEmpty) spark.read.parquet(path).limit(0)
      else spark.read.parquet(keep.toIndexedSeq: _*)
    base.filter(col(c).between(lo, hi))
  }

  /** Surviving file paths for a range predicate — the overlap test runs
    * as a DISTRIBUTED filter over the manifest DataFrame, so the driver
    * only ever materializes files the scan plan will actually read
    * (bounded by predicate selectivity, the Delta/Iceberg planning
    * contract), never the full million-file listing with its stats.
    */
  def prunedFiles(spark: SparkSession, path: String, c: String, lo: Long, hi: Long): DataFrame = {
    import org.apache.spark.sql.functions._
    require(lo <= hi, s"empty range [$lo, $hi]")
    val mn = col(s"min_$c").cast("long")
    val mx = col(s"max_$c").cast("long")
    statsManifest(spark, path, Seq(c))
      .filter(mn.isNull || mx.isNull || !(mx < lo || mn > hi))
      .select(col("file"))
  }
}
