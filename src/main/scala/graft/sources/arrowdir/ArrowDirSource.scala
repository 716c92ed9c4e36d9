package graft.sources.arrowdir

import java.util

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{BoundReference, UnsafeProjection}
import org.apache.spark.sql.connector.catalog.{SupportsRead, SupportsWrite, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.connector.write._
import org.apache.spark.sql.graft.ArrowBridge
import org.apache.spark.sql.internal.SQLConf
import org.apache.spark.sql.types.{DataType, StructType}
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/** DataSource V2 read path for the Arrow batch-directory layout written by
  * `sources.ArrowInterop.writeBatchDir` (`part-*.arrowbatch` IPC payloads +
  * a `schema.json` sidecar) — the idiomatic Spark packaging of the
  * reference's record-batch-stream import (import_from_c /
  * export_record_batch_stream, arrow_c_ffi.rs:640/2104):
  *
  * {{{
  *   spark.read.format("graft.sources.arrowdir").load(dir)
  * }}}
  *
  * Scale shape: the driver touches only the file LISTING and the schema
  * sidecar; each payload file becomes one InputPartition whose bytes are
  * read and deserialized on an executor. Column pruning is pushed into the
  * reader (SupportsPushDownRequiredColumns): Arrow IPC payloads are
  * row-group-less so all columns are decoded per batch, but only the
  * pruned columns are materialized into UnsafeRows crossing into the
  * query — `.explain` shows the narrowed ReadSchema.
  */
class ArrowDirSource extends TableProvider {

  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    ArrowDirSource.sidecarSchema(ArrowDirSource.pathOf(options))

  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: util.Map[String, String]): Table = {
    // a user-supplied schema skips inferSchema (the other path guard)
    val p = properties.get("path")
    require(p != null, "graft.sources.arrowdir needs a path: spark.read.format(...).load(dir)")
    ArrowDirTable(p, schema)
  }

  override def supportsExternalMetadata(): Boolean = true
}

/** Lets `.format("graft.sources.arrowdir")` resolve (Spark's provider
  * lookup appends `.DefaultSource` to package-style format names).
  */
class DefaultSource extends ArrowDirSource

object ArrowDirSource {
  def pathOf(options: CaseInsensitiveStringMap): String = {
    val p = options.get("path")
    require(p != null, "graft.sources.arrowdir needs a path: spark.read.format(...).load(dir)")
    p
  }

  def sidecarPath(path: String): java.nio.file.Path =
    java.nio.file.Paths.get(path, "schema.json")

  /** Writes never reach here (supportsExternalMetadata: Spark hands the
    * query schema straight to getTable), so a missing sidecar on READ is a
    * user error — fail with the real story, not an empty DataFrame.
    */
  def sidecarSchema(path: String): StructType = {
    val sidecar = sidecarPath(path)
    require(java.nio.file.Files.exists(sidecar),
      s"$path is not an arrowdir (no schema.json sidecar)")
    DataType.fromJson(java.nio.file.Files.readString(sidecar)).asInstanceOf[StructType]
  }

  def listStaged(path: String): Array[String] = listBySuffix(path, ".arrowbatch.staged")

  def listPayloads(path: String): Array[String] = listBySuffix(path, ".arrowbatch")

  private def listBySuffix(path: String, suffix: String): Array[String] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    // Files.list holds a directory handle until closed — and this runs on
    // the driver once per (re-)planning
    val st = java.nio.file.Files.list(java.nio.file.Paths.get(path))
    try st.forEach { p =>
      if (p.getFileName.toString.endsWith(suffix)) out += p.toString
    } finally st.close()
    out.sorted.toArray
  }
}

case class ArrowDirTable(path: String, tableSchema: StructType)
    extends Table with SupportsRead with SupportsWrite {
  override def name(): String = s"graft-arrowdir:$path"
  override def schema(): StructType = tableSchema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ, TableCapability.MICRO_BATCH_READ,
      TableCapability.BATCH_WRITE, TableCapability.TRUNCATE)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new ArrowDirScanBuilder(path, tableSchema)
  override def newWriteBuilder(info: LogicalWriteInfo): WriteBuilder =
    new ArrowDirWriteBuilder(path, info.schema())
}

class ArrowDirScanBuilder(path: String, fullSchema: StructType)
    extends ScanBuilder with SupportsPushDownRequiredColumns with SupportsPushDownFilters {
  import org.apache.spark.sql.catalyst.expressions.{And => CAnd, EqualTo => CEq, Expression, GreaterThan => CGt, GreaterThanOrEqual => CGte, In => CIn, IsNotNull => CNotNull, IsNull => CNull, LessThan => CLt, LessThanOrEqual => CLte, Literal, Not => CNot, Or => COr}
  import org.apache.spark.sql.sources._

  private var required: StructType = fullSchema
  private var pushed: Array[Filter] = Array.empty
  private var pushedExpr: Option[Expression] = None

  override def pruneColumns(requiredSchema: StructType): Unit = {
    // preserve the payload's field order — the row projection below binds
    // by position in the FULL schema
    val keep = requiredSchema.fieldNames.toSet
    required = StructType(fullSchema.fields.filter(f => keep.contains(f.name)))
  }

  /** Arrow payloads carry no row-group statistics, so "pushdown" here is
    * row-level: translatable filters are evaluated inside the reader,
    * BEFORE rows are materialized/projected into the query. Spark skips
    * re-evaluating whatever we accept, so only exactly-translatable
    * shapes are taken; the rest stay with Spark as post-scan filters.
    */
  private def translate(f: Filter): Option[Expression] = {
    def ref(name: String): Option[org.apache.spark.sql.catalyst.expressions.BoundReference] =
      fullSchema.fields.indexWhere(_.name == name) match {
        case -1 => None
        case i =>
          val fld = fullSchema.fields(i)
          Some(org.apache.spark.sql.catalyst.expressions.BoundReference(i, fld.dataType, fld.nullable))
      }
    def lit(v: Any, dt: org.apache.spark.sql.types.DataType): Option[Literal] =
      try Some(Literal.create(v, dt)) catch { case _: RuntimeException => None }
    f match {
      case EqualTo(a, v) => for (r <- ref(a); l <- lit(v, r.dataType)) yield CEq(r, l)
      case GreaterThan(a, v) => for (r <- ref(a); l <- lit(v, r.dataType)) yield CGt(r, l)
      case GreaterThanOrEqual(a, v) => for (r <- ref(a); l <- lit(v, r.dataType)) yield CGte(r, l)
      case LessThan(a, v) => for (r <- ref(a); l <- lit(v, r.dataType)) yield CLt(r, l)
      case LessThanOrEqual(a, v) => for (r <- ref(a); l <- lit(v, r.dataType)) yield CLte(r, l)
      case In(a, vs) => ref(a).flatMap { r =>
        val ls = vs.map(v => lit(v, r.dataType))
        if (ls.contains(None)) None else Some(CIn(r, ls.flatten.toSeq))
      }
      case IsNull(a) => ref(a).map(CNull)
      case IsNotNull(a) => ref(a).map(CNotNull)
      case And(l, r) => for (a <- translate(l); b <- translate(r)) yield CAnd(a, b)
      case Or(l, r) => for (a <- translate(l); b <- translate(r)) yield COr(a, b)
      case Not(c) => translate(c).map(CNot)
      case _ => None
    }
  }

  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    val translated = filters.map(f => f -> translate(f))
    pushed = translated.collect { case (f, Some(_)) => f }
    pushedExpr = translated.flatMap(_._2).reduceOption(CAnd)
    // return what we canNOT handle — Spark keeps evaluating those
    translated.collect { case (f, None) => f }
  }

  override def pushedFilters(): Array[Filter] = pushed

  override def build(): Scan = {
    // session state is reachable only at planning time — capture what the
    // executor-side Arrow deserializer needs NOW
    val conf = SQLConf.get
    ArrowDirScan(path, fullSchema, required,
      conf.sessionLocalTimeZone, conf.arrowUseLargeVarTypes,
      pushedExpr, pushed.mkString("[", ", ", "]"))
  }
}

case class ArrowDirScan(path: String, fullSchema: StructType, required: StructType,
    tz: String, largeVarTypes: Boolean,
    filter: Option[org.apache.spark.sql.catalyst.expressions.Expression] = None,
    filterDesc: String = "[]")
    extends Scan with Batch with SupportsReportStatistics {
  override def readSchema(): StructType = required
  override def toBatch: Batch = this
  override def description(): String =
    s"graft-arrowdir $path, ReadSchema: ${required.catalogString}, PushedFilters: $filterDesc"

  /** Payload bytes ≈ in-memory size (Arrow IPC is the uncompressed wire
    * form), so the file-length sum is an honest sizeInBytes — it lets
    * Catalyst pick BroadcastHashJoin for small arrowdir tables instead of
    * defaulting to the conservative "unknown" estimate. Computed once per
    * Scan (Catalyst may ask several times), skipping files a concurrent
    * overwrite sweeps between listing and stat.
    */
  private lazy val payloadBytes: Long = ArrowDirSource.listPayloads(path)
    .map { f =>
      try java.nio.file.Files.size(java.nio.file.Paths.get(f))
      catch { case _: java.io.IOException => 0L }
    }.sum

  override def estimateStatistics(): Statistics = new Statistics {
    override def sizeInBytes(): util.OptionalLong = util.OptionalLong.of(payloadBytes)
    override def numRows(): util.OptionalLong = util.OptionalLong.empty()
  }

  override def planInputPartitions(): Array[InputPartition] =
    ArrowDirSource.listPayloads(path).map(f => ArrowDirPartition(f): InputPartition)

  override def createReaderFactory(): PartitionReaderFactory =
    ArrowDirReaderFactory(fullSchema, required, tz, largeVarTypes, filter)

  override def toMicroBatchStream(checkpointLocation: String): org.apache.spark.sql.connector.read.streaming.MicroBatchStream =
    ArrowDirMicroBatchStream(path, fullSchema, required, tz, largeVarTypes, filter)
}

/** Micro-batch streaming read over an arrowdir: each trigger picks up
  * payload files not yet seen, so `writeStream` pipelines can tail a
  * directory that DSv2 batch writes keep appending to — the streaming leg
  * of the reference's record-batch-stream interchange
  * (export_record_batch_stream, arrow_c_ffi.rs:2104).
  *
  * Offsets are the SET of committed payload names (sorted-JSON encoded),
  * not a position: payload names carry a random job tag, so listing order
  * is not arrival order, and an mtime watermark would race the
  * staged-rename commit protocol (bytes are written before the commit
  * rename makes them visible, so a slow job's files can surface with old
  * mtimes). A self-describing set survives checkpoint recovery with no
  * driver-side log. Scale note: offset size grows with the directory's
  * file count — the production path for millions of files is a compacted
  * seen-file log in the checkpoint (Spark's FileStreamSource shape) with
  * index offsets; at the batch sizes arrowdir targets (thousands of
  * payloads), self-describing offsets stay a few hundred KB and remove a
  * whole class of log-compaction bugs.
  *
  * A file in `start` that has vanished from the directory (external
  * truncate while a stream is up) fails the batch loudly rather than
  * silently re-reading or skipping — same contract as Spark's file source.
  */
case class ArrowDirMicroBatchStream(path: String, fullSchema: StructType,
    required: StructType, tz: String, largeVarTypes: Boolean,
    filter: Option[org.apache.spark.sql.catalyst.expressions.Expression])
    extends org.apache.spark.sql.connector.read.streaming.MicroBatchStream {
  import org.apache.spark.sql.connector.read.streaming.Offset

  override def initialOffset(): Offset = ArrowDirOffset(Set.empty)

  override def latestOffset(): Offset =
    ArrowDirOffset(ArrowDirSource.listPayloads(path)
      .map(f => new java.io.File(f).getName).toSet)

  override def deserializeOffset(json: String): Offset = ArrowDirOffset.fromJson(json)

  override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] = {
    val seen = start.asInstanceOf[ArrowDirOffset].files
    val now = end.asInstanceOf[ArrowDirOffset].files
    // files that vanished from the directory mean an external truncate/
    // overwrite raced the stream — fail loudly: silently continuing would
    // re-deliver the rewritten rows under their new job-tag names
    val vanished = seen -- now
    require(vanished.isEmpty,
      s"arrowdir $path was rewritten under a running stream " +
        s"(${vanished.size} already-read payload(s) vanished, e.g. " +
        s"${vanished.take(3).mkString(", ")}); restart the stream from a " +
        "fresh checkpoint to re-read the new contents")
    (now -- seen).toArray.sorted
      .map(n => ArrowDirPartition(java.nio.file.Paths.get(path, n).toString): InputPartition)
  }

  override def createReaderFactory(): PartitionReaderFactory =
    ArrowDirReaderFactory(fullSchema, required, tz, largeVarTypes, filter)

  override def commit(end: Offset): Unit = ()
  override def stop(): Unit = ()
}

case class ArrowDirOffset(files: Set[String])
    extends org.apache.spark.sql.connector.read.streaming.Offset {
  /** Sorted array → byte-identical JSON for equal sets (the engine
    * compares offsets by serialized form to decide "no new data").
    */
  override def json(): String =
    ArrowDirOffset.mapper.writeValueAsString(files.toArray.sorted)
}

object ArrowDirOffset {
  private val mapper = new com.fasterxml.jackson.databind.ObjectMapper
  def fromJson(json: String): ArrowDirOffset =
    ArrowDirOffset(mapper.readValue(json, classOf[Array[String]]).toSet)
}

case class ArrowDirPartition(file: String) extends InputPartition

/** Write path: each task serializes its rows into `maxRecordsPerBatch`
  * chunks (bounded memory — one Arrow batch in flight per task) under
  * UNIQUE staged names; the driver's commit writes the schema sidecar and
  * sweeps files no committed task claims (covering aborted/speculative
  * attempts, and pre-existing payloads under truncate/overwrite).
  */
class ArrowDirWriteBuilder(path: String, schema: StructType)
    extends WriteBuilder with SupportsTruncate {
  private var truncateRequested = false
  override def truncate(): WriteBuilder = { truncateRequested = true; this }
  override def build(): Write = new Write {
    override def toBatch: BatchWrite = {
      // append must match the existing sidecar field-for-field (payloads
      // decode positionally): committing a different schema would rewrite
      // the sidecar and silently corrupt every earlier payload. Spark's
      // by-name validation can't catch this — supportsExternalMetadata
      // hands it the query's own schema as the table schema.
      val sidecar = ArrowDirSource.sidecarPath(path)
      val commitSchema =
        if (!truncateRequested && java.nio.file.Files.exists(sidecar)) {
          val existing = ArrowDirSource.sidecarSchema(path)
          // nullability-insensitive, order- and type-sensitive comparison
          def shape(s: StructType) = s.fields.map(f => (f.name, f.dataType.catalogString)).toSeq
          require(shape(existing) == shape(schema),
            s"append schema ${schema.catalogString} does not match " +
              s"arrowdir schema ${existing.catalogString} at $path")
          // the committed sidecar must stay valid for EARLIER payloads too:
          // a field that was ever nullable stays nullable (an append of a
          // non-null frame must not constant-fold IS NULL over old nulls)
          StructType(existing.fields.zip(schema.fields).map { case (e, n) =>
            e.copy(nullable = e.nullable || n.nullable)
          })
        } else schema
      val conf = SQLConf.get
      ArrowDirBatchWrite(path, commitSchema, truncateRequested,
        conf.arrowMaxRecordsPerBatch, conf.sessionLocalTimeZone, conf.arrowUseLargeVarTypes)
    }
  }
}

case class ArrowDirCommit(files: Seq[String]) extends WriterCommitMessage

case class ArrowDirBatchWrite(path: String, schema: StructType, truncate: Boolean,
    maxRecords: Int, tz: String, largeVarTypes: Boolean) extends BatchWrite {

  // file names carry this write job's tag, so the commit sweep can tell
  // "orphan of THIS job" (failed/speculative attempt) from "data of an
  // earlier write" (which append mode must keep)
  private val jobTag: String = java.util.UUID.randomUUID().toString.take(8)

  override def createBatchWriterFactory(info: PhysicalWriteInfo): DataWriterFactory = {
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(path))
    ArrowDirWriterFactory(path, jobTag, schema.json, maxRecords, tz, largeVarTypes)
  }

  // prefix match, not contains: a contains("-tag-") could collide with the
  // unpadded decimal taskId segment of an EARLIER job's committed file and
  // sweep real data
  private def thisJobs(fileName: String): Boolean =
    fileName.startsWith(s"part-$jobTag-")

  /** Tasks stage under `.staged` names (invisible to listPayloads' glob);
    * commit RENAMES the committed set to final names, so readers never see
    * uncommitted data — a driver crash mid-job leaves only `.staged` files
    * behind, which every later job's commit sweeps as stale.
    */
  override def commit(messages: Array[WriterCommitMessage]): Unit = {
    val committed = messages.flatMap { case ArrowDirCommit(fs) => fs }.toSet
    committed.foreach { n =>
      java.nio.file.Files.move(
        java.nio.file.Paths.get(path, n + ArrowDirWriterFactory.StagedSuffix),
        java.nio.file.Paths.get(path, n),
        java.nio.file.StandardCopyOption.REPLACE_EXISTING)
    }
    // sweep staged leftovers (this job's failed/speculative attempts, and
    // any earlier crashed job's debris) + committed payloads under truncate
    ArrowDirSource.listStaged(path)
      .foreach(f => java.nio.file.Files.deleteIfExists(java.nio.file.Paths.get(f)))
    if (truncate) {
      ArrowDirSource.listPayloads(path)
        .map(f => new java.io.File(f).getName)
        .filterNot(committed.contains)
        .foreach(n => java.nio.file.Files.deleteIfExists(java.nio.file.Paths.get(path, n)))
    }
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(path, "schema.json"), schema.json)
  }

  /** Drop everything this job staged — nothing was renamed, so committed
    * data from earlier jobs is untouched by construction.
    */
  override def abort(messages: Array[WriterCommitMessage]): Unit =
    ArrowDirSource.listStaged(path)
      .filter(f => thisJobs(new java.io.File(f).getName))
      .foreach(f => java.nio.file.Files.deleteIfExists(java.nio.file.Paths.get(f)))
}

object ArrowDirWriterFactory {
  /** Staged files don't end in .arrowbatch, so readers can't glob them. */
  val StagedSuffix = ".staged"
}

case class ArrowDirWriterFactory(path: String, jobTag: String, schemaJson: String,
    maxRecords: Int, tz: String, largeVarTypes: Boolean) extends DataWriterFactory {

  override def createWriter(partitionId: Int, taskId: Long): DataWriter[InternalRow] =
    new DataWriter[InternalRow] {
      // parse once per task, not once per flush
      private val schema = org.apache.spark.sql.types.DataType.fromJson(schemaJson)
        .asInstanceOf[org.apache.spark.sql.types.StructType]
      private val buf = scala.collection.mutable.ArrayBuffer.empty[InternalRow]
      private val written = scala.collection.mutable.ArrayBuffer.empty[String]
      private var chunk = 0

      private def flush(): Unit = if (buf.nonEmpty) {
        // maxRecords <= 0 means "no limit" (Spark's documented semantics
        // for arrow.maxRecordsPerBatch) — one batch of everything buffered
        val payloads = ArrowBridge.serializeBatches(
          buf.iterator, schema, maxRecords.toLong, tz, largeVarTypes)
        payloads.foreach { bytes =>
          val name = f"part-$jobTag-$partitionId%05d-$taskId-$chunk%03d.arrowbatch"
          java.nio.file.Files.write(
            java.nio.file.Paths.get(path, name + ArrowDirWriterFactory.StagedSuffix), bytes)
          written += name
          chunk += 1
        }
        buf.clear()
      }

      // <= 0 ("no limit"): buffer until task commit, like ArrowConverters
      private val flushAt = if (maxRecords <= 0) Int.MaxValue else maxRecords

      override def write(record: InternalRow): Unit = {
        buf += record.copy()
        if (buf.length >= flushAt) flush()
      }
      override def commit(): WriterCommitMessage = { flush(); ArrowDirCommit(written.toSeq) }
      override def abort(): Unit = {
        written.foreach(f => java.nio.file.Files.deleteIfExists(
          java.nio.file.Paths.get(path, f + ArrowDirWriterFactory.StagedSuffix)))
      }
      override def close(): Unit = buf.clear()
    }
}

case class ArrowDirReaderFactory(fullSchema: StructType,
    required: StructType, tz: String, largeVarTypes: Boolean,
    filter: Option[org.apache.spark.sql.catalyst.expressions.Expression] = None)
    extends PartitionReaderFactory {

  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val file = partition.asInstanceOf[ArrowDirPartition].file
    new PartitionReader[InternalRow] {
      private val rows: Iterator[InternalRow] = {
        val bytes = java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(file))
        val decoded = ArrowBridge.deserializeBatch(bytes, fullSchema.json, tz, largeVarTypes)
        // pushed filters run against the FULL row before any projection,
        // so filtered-out rows never materialize as UnsafeRows
        val full = filter match {
          case None => decoded
          case Some(e) =>
            val p = org.apache.spark.sql.catalyst.expressions.Predicate.create(e)
            p.initialize(0)
            decoded.filter(p.eval)
        }
        if (required == fullSchema) full
        else {
          val refs = required.fields.map { f =>
            val i = fullSchema.fieldIndex(f.name)
            BoundReference(i, f.dataType, f.nullable)
          }
          val proj = UnsafeProjection.create(refs)
          full.map(proj)
        }
      }
      private var current: InternalRow = _
      override def next(): Boolean = { val h = rows.hasNext; if (h) current = rows.next(); h }
      override def get(): InternalRow = current
      override def close(): Unit = ()
    }
  }
}
