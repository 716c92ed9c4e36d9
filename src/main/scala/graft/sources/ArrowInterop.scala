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

  /** At-rest Arrow batch directory sink: every partition writes its IPC
    * record-batch payloads as `part-*.arrowbatch` files EXECUTOR-SIDE (no
    * driver funnel), plus one driver-written `schema.json` sidecar. The
    * graft-native spill/handoff format when parquet's encode cost isn't
    * wanted — payloads are raw Arrow record-batch messages keyed by the
    * sidecar schema. `path` must be storage every executor can reach
    * (shared/distributed FS on a real cluster — with executor-local disks
    * the files would land scattered and the reader would see a subset).
    */
  def writeBatchDir(df: DataFrame, path: String): Unit = {
    val dir = java.nio.file.Paths.get(path)
    java.nio.file.Files.createDirectories(dir)
    // overwrite semantics: clear previous part files first, or a rewrite
    // that produces fewer batches leaves stale payloads the reader globs
    // back in as duplicated/mixed data. (Files.list holds a directory fd
    // until closed — bracket it.)
    scala.util.Using.resource(java.nio.file.Files.list(dir)) { s =>
      s.forEach { p =>
        if (p.getFileName.toString.endsWith(".arrowbatch")) java.nio.file.Files.delete(p)
      }
    }
    java.nio.file.Files.writeString(dir.resolve("schema.json"), df.schema.json)
    // one FILE per batch payload: a partition can emit several IPC batch
    // messages (maxRecordsPerBatch), and the deserializer takes one
    // message per byte array
    exportBatches(df).mapPartitionsWithIndex { (pid, it) =>
      it.zipWithIndex.foreach { case (bytes, i) =>
        java.nio.file.Files.write(
          java.nio.file.Paths.get(path, f"part-$pid%05d-$i%03d.arrowbatch"), bytes)
      }
      Iterator.single(pid)
    }.count(): Unit
  }

  /** Distributed read of a batch directory: `binaryFiles` splits the files
    * across executors, payloads deserialize per-partition via the
    * distributed import — the driver only reads the schema sidecar.
    */
  def readBatchDir(spark: SparkSession, path: String): DataFrame = {
    val schemaJson = java.nio.file.Files.readString(
      java.nio.file.Paths.get(path, "schema.json"))
    val payloads = spark.sparkContext
      .binaryFiles(s"$path/part-*.arrowbatch")
      .map(_._2.toArray())
    importBatchesDistributed(spark, payloads, schemaJson)
  }

  /** Small-files compaction for a batch directory — the OPTIMIZE verb
    * for this layout. Streaming appends (ArrowDirBatchWrite per trigger)
    * accrete many small payloads; every reader then pays one task +
    * one file open per payload. Compaction rewrites the directory into
    * ⌈totalBytes / targetBytes⌉ consolidated payloads (distributed
    * read → repartition → rewrite staged in a sibling dir, then swapped
    * in), preserving rows exactly — batch boundaries are not data.
    *
    * Single-writer maintenance op by contract (like any OPTIMIZE):
    * concurrent appends during the swap window can be lost. Returns the
    * resulting payload-file count; no-ops (returning the current count)
    * when the directory already meets the target granularity.
    */
  def compactBatchDir(spark: SparkSession, path: String,
      targetBytes: Long = 64L << 20): Int = {
    import java.nio.file.{Files, Paths, StandardCopyOption}
    import scala.jdk.CollectionConverters._
    val dir = Paths.get(path)
    val files = scala.util.Using.resource(Files.list(dir))(
      _.iterator().asScala
        .filter(_.getFileName.toString.endsWith(".arrowbatch")).toVector)
    if (files.isEmpty) return 0
    val total = files.map(Files.size).sum
    val nOut = math.max(1, math.ceil(total.toDouble / targetBytes).toInt)
    if (nOut >= files.size) return files.size
    val staged = readBatchDir(spark, path).repartition(nOut)
    val tmp = path + ".compacting"
    writeBatchDir(staged, tmp)
    // swap: stale payloads out, consolidated payloads in, stage dir gone
    files.foreach(Files.delete)
    val tmpDir = Paths.get(tmp)
    val moved = scala.util.Using.resource(Files.list(tmpDir))(
      _.iterator().asScala
        .filter(_.getFileName.toString.endsWith(".arrowbatch"))
        .map { p =>
          Files.move(p, dir.resolve(p.getFileName), StandardCopyOption.REPLACE_EXISTING)
          1
        }.sum)
    Files.deleteIfExists(tmpDir.resolve("schema.json"))
    Files.deleteIfExists(tmpDir)
    moved
  }

  // ---------------------------------------------- Arrow string width tags

  /** Key under which a string column's ORIGINAL Arrow physical width is
    * carried ("utf8" | "large_utf8" | "utf8_view" — ffi/arrow_dtype.rs:
    * 84-121). Spark has one logical StringType and Tungsten owns physical
    * layout, so the width is metadata, not representation; tagging on
    * ingest makes the round trip lossless at the SCHEMA level (an
    * exporter reads the tag to pick offset width / view layout).
    */
  val StringWidthKey = "graft.arrow.string_width"

  /** Tag string columns with their source Arrow width (unknown columns
    * left untouched). Metadata rides StructType.json, so batch-dir
    * sidecars and [[roundTrip]] both preserve it.
    */
  def withArrowStringWidth(df: DataFrame, widths: Map[String, String]): DataFrame = {
    val allowed = Set("utf8", "large_utf8", "utf8_view")
    require(widths.values.forall(allowed), s"widths must be in $allowed")
    import org.apache.spark.sql.types.MetadataBuilder
    import org.apache.spark.sql.functions.col
    df.select(df.schema.fields.map { f =>
      widths.get(f.name) match {
        case Some(w) =>
          val md = new MetadataBuilder().withMetadata(f.metadata)
            .putString(StringWidthKey, w).build()
          col(f.name).as(f.name, md)
        case None => col(f.name)
      }
    }.toIndexedSeq: _*)
  }

  /** Read back a column's tagged Arrow width, if any. */
  def arrowStringWidth(df: DataFrame, column: String): Option[String] = {
    val f = df.schema(column)
    if (f.metadata.contains(StringWidthKey)) Some(f.metadata.getString(StringWidthKey))
    else None
  }

  // ---------------------------------------------- table-level metadata map

  /** Key under which the TABLE-level metadata map rides (the reference's
    * `Table.metadata: BTreeMap<String, String>`, structs/table.rs:103 —
    * feature `table_metadata`). Spark has no table-level slot: schemas
    * carry metadata per FIELD only, so the map is attached to the first
    * field under this reserved key. That carrier is preserved by every
    * boundary this repo ships — parquet footers (Spark stores the full
    * schema JSON in the footer key-value metadata and restores it on
    * read), batch-dir `schema.json` sidecars, and the Arrow round trip —
    * so the map survives at-rest and interchange like the reference's.
    * Carrier-at-boundary semantics: attach right before a sink; a
    * projection that drops or rebuilds the first column drops the map
    * (same as any schema metadata in Spark).
    */
  val TableMetaKey = "graft.arrow.table_metadata"

  private def metaToJson(meta: Map[String, String]): String = {
    import org.json4s.JsonDSL._
    org.json4s.jackson.JsonMethods.compact(
      org.json4s.jackson.JsonMethods.render(
        meta.toList.sortBy(_._1).foldLeft(org.json4s.JObject()) {
          case (o, (k, v)) => o ~ (k -> v) }))
  }

  private def metaFromJson(json: String): Map[String, String] = {
    import org.json4s._
    org.json4s.jackson.JsonMethods.parse(json) match {
      case JObject(fields) => fields.collect { case (k, JString(v)) => k -> v }.toMap
      case _ => Map.empty
    }
  }

  /** Attach a table-level metadata map (BTreeMap semantics: string→string,
    * stored key-sorted). Merges over any existing map; an empty argument
    * is a no-op that preserves what is already there.
    */
  def withTableMetadata(df: DataFrame, meta: Map[String, String]): DataFrame = {
    require(df.schema.fields.nonEmpty, "cannot attach table metadata to a zero-column frame")
    if (meta.isEmpty) return df
    import org.apache.spark.sql.types.MetadataBuilder
    import org.apache.spark.sql.functions.col
    val merged = tableMetadata(df) ++ meta
    val f0 = df.schema.fields.head
    val md = new MetadataBuilder().withMetadata(f0.metadata)
      .putString(TableMetaKey, metaToJson(merged)).build()
    df.select((col(f0.name).as(f0.name, md) +:
      df.schema.fields.tail.map(f => col(f.name))).toIndexedSeq: _*)
  }

  /** The table-level metadata map, empty when none was ever attached. */
  def tableMetadata(df: DataFrame): Map[String, String] =
    df.schema.fields.headOption
      .filter(_.metadata.contains(TableMetaKey))
      .map(f => metaFromJson(f.metadata.getString(TableMetaKey)))
      .getOrElse(Map.empty)
}
