package graft.llm

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** The shared micro-batch shell of the epoch-state streaming harnesses
  * (unigram drift q158, quality-quantile q170, NB training q171): one
  * place for the session-clone + conf-retune + adaptive-shuffle-sizing +
  * file-stream + drain plumbing and for the epoch-state append/read
  * protocol, so a fix to the at-least-once/compaction contract (like the
  * round-10 attempt-dir race fix in Dedup) lands once instead of three
  * times.
  */
private[llm] object EpochStream {

  /** Run `body` per micro-batch over a maxFilesPerTrigger=1 file stream
    * of `stagedDir`, on a session CLONE with semantics confs re-applied
    * and shuffle partitions sized to the staged source
    * (`shufflePartitions <= 0` = auto — a fixed small count makes every
    * per-batch aggregate run the whole scaled increment through that
    * many partitions; measured superlinear at the 100× replay fixture).
    * Returns the parquet read-back of `outDir` on the CALLER's session.
    */
  def run(spark: SparkSession, stagedDir: String, schema: StructType,
      checkpointDir: Option[String], shufflePartitions: Int, outDir: String)(
      body: (DataFrame, Long) => Unit): DataFrame = {
    val s2 = spark.newSession()
    // newSession() rebuilds SQLConf from the context's SparkConf, DROPPING
    // the runtime-set semantics confs (ANSI off, ns-as-long, …) — re-apply
    graft.GraftConf.tune(s2)
    s2.conf.set("spark.sql.shuffle.partitions",
      (if (shufflePartitions > 0) shufflePartitions
       else graft.ops.Layout.adaptivePartsForDir(stagedDir)).toString)
    val stream = s2.readStream.schema(schema)
      .option("maxFilesPerTrigger", 1)
      .parquet(stagedDir)
    val writer = stream.writeStream.foreachBatch(body)
    val q = checkpointDir.fold(writer)(c => writer.option("checkpointLocation", c)).start()
    try q.processAllAvailable() finally q.stop()
    spark.read.parquet(outDir)
  }

  /** Idempotent epoch-state append: a re-run of the same batch replaces
    * its own `epoch=batchId` partition (dynamic overwrite), never
    * touching settled history.
    */
  def appendEpoch(bt: DataFrame, stateDir: String, batchId: Long): Unit =
    bt.withColumn("epoch", lit(batchId))
      .write.mode("overwrite").option("partitionOverwriteMode", "dynamic")
      .partitionBy("epoch").parquet(stateDir)

  /** The SETTLED state rows (`epoch < batchId`, so this batch's own
    * re-runs stay invisible), projected to `bt`'s columns. The
    * has-data check is NOT redundant even right after [[appendEpoch]]:
    * an all-empty write leaves only `_SUCCESS` in `stateDir`, and a
    * naked parquet read of that directory fails schema inference — the
    * empty frame fallback keeps a stream of empty batches alive.
    */
  def settled(bt: DataFrame, stateDir: String, batchId: Long): DataFrame = {
    val cols = bt.columns.map(col).toIndexedSeq
    val sp = new org.apache.hadoop.fs.Path(stateDir)
    val hasState = graft.ops.Layout.hasParquetData(
      sp.getFileSystem(bt.sparkSession.sparkContext.hadoopConfiguration), sp)
    if (!hasState) bt.select(cols: _*).limit(0)
    // the writer below appended bt's exact columns + the epoch partition
    // column — pass that schema instead of re-inferring it from footers
    // on the driver every trigger (~65-80 ms warm, measured round 16)
    else bt.sparkSession.read.schema(org.apache.spark.sql.types.StructType(
        bt.schema.fields :+ org.apache.spark.sql.types.StructField(
          "epoch", org.apache.spark.sql.types.LongType)))
      .parquet(stateDir)
      .filter(col("epoch") < batchId)
      .select(cols: _*)
  }

  /** Per-batch snapshot write, idempotent under at-least-once re-runs
    * (dynamic overwrite of this batch's own partition).
    */
  def writeSnapshot(df: DataFrame, outDir: String, batchId: Long): Unit =
    df.withColumn("batch_id", lit(batchId))
      .write.mode("overwrite").option("partitionOverwriteMode", "dynamic")
      .partitionBy("batch_id").parquet(outDir)
}
