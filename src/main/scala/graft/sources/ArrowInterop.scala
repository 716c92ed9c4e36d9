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

  /** Arrow batch payloads + schema JSON → DataFrame. */
  def importBatches(spark: SparkSession, batches: Iterator[Array[Byte]],
      schemaJson: String): DataFrame =
    ArrowBridge.fromArrowBatches(spark, batches, schemaJson)

  /** Full export→import round trip (the reference's FFI loop, EP3 in
    * SURVEY.md §3). Driver-side collect of batch payloads — use for
    * bounded handoffs, not full-corpus materialization.
    */
  def roundTrip(spark: SparkSession, df: DataFrame): DataFrame = {
    val schemaJson = df.schema.json
    val batches = exportBatches(df).collect().iterator
    importBatches(spark, batches, schemaJson)
  }
}
