package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.graft.ArrowBridge

/** Arrow interchange surface (SURVEY.md §2.10): the reference's I/O
  * boundary is the Arrow C data interface (export_to_c / import_from_c /
  * record-batch streams, src/ffi/arrow_c_ffi.rs). The Spark-native
  * equivalent is serialized Arrow record batches — one payload per
  * partition, produced and consumed without row-by-row conversion.
  *
  * Parquet remains the at-rest format (scan/sink); this surface is for
  * zero-ETL handoff to Arrow-consuming processes (Python workers, FFI).
  */
object ArrowInterop {

  /** DataFrame → Arrow record-batch payloads (distributed; one IPC-format
    * batch blob per partition).
    */
  def exportBatches(df: DataFrame): org.apache.spark.rdd.RDD[Array[Byte]] =
    ArrowBridge.toArrowBatches(df)

  /** Arrow batch payloads + schema JSON → DataFrame (driver-side iterator;
    * bounded handoffs like dimension tables or FFI control channels).
    */
  def importBatches(spark: SparkSession, batches: Iterator[Array[Byte]],
      schemaJson: String): DataFrame =
    ArrowBridge.fromArrowBatches(spark, batches, schemaJson)

  /** Distributed import: an RDD of batch payloads (one or more IPC blobs
    * per partition) deserialized executor-side — the unbounded
    * record-batch-stream analog (arrow_c_ffi.rs:2104). This is the 100 TB
    * path: payload bytes stay on executors end to end.
    */
  def importBatchesDistributed(spark: SparkSession,
      batches: org.apache.spark.rdd.RDD[Array[Byte]],
      schemaJson: String): DataFrame =
    ArrowBridge.fromArrowBatchRdd(spark, batches, schemaJson)

  /** Full export→import round trip (the reference's FFI loop, EP3 in
    * SURVEY.md §3) through the DISTRIBUTED path: batches never leave the
    * executors, so the loop survives any table size.
    */
  def roundTrip(spark: SparkSession, df: DataFrame): DataFrame =
    importBatchesDistributed(spark, exportBatches(df), df.schema.json)

  /** Driver-side round trip — kept for bounded handoffs where a local
    * Iterator boundary is the point (e.g. feeding an in-process consumer).
    */
  def roundTripLocal(spark: SparkSession, df: DataFrame): DataFrame = {
    val schemaJson = df.schema.json
    val batches = exportBatches(df).collect().iterator
    importBatches(spark, batches, schemaJson)
  }
}
