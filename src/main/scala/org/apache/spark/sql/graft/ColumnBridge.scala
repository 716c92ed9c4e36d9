package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Bridge between Catalyst `Expression`s and public `Column`s.
  *
  * Spark 4 made `Column` representation-agnostic, so the expression
  * constructor is `private[sql]`; extension libraries reach it from the
  * `org.apache.spark.sql` namespace (same approach as other Catalyst-level
  * Spark extensions). This is the only file outside the `graft` package.
  */
object ColumnBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}

/** Arrow interop bridge (minarrow's core I/O boundary is the Arrow C data
  * interface — SURVEY.md §2.10; Spark's equivalent serialized-batch APIs
  * are `private[sql]`, reached from this package like ColumnBridge).
  */
object ArrowBridge {
  import org.apache.spark.sql.classic.{Dataset => CDataset, SparkSession => CSparkSession}
  import org.apache.spark.sql.execution.arrow.ArrowConverters
  import org.apache.spark.sql.{DataFrame, Row, SparkSession}

  /** Export: one Arrow IPC record-batch payload per partition
    * (export_record_batch_stream analog, arrow_c_ffi.rs:2104).
    */
  def toArrowBatches(df: DataFrame): org.apache.spark.rdd.RDD[Array[Byte]] =
    df.asInstanceOf[CDataset[Row]].toArrowBatchRdd

  /** Import: rebuild a DataFrame from Arrow batch payloads + schema json
    * (import_from_c analog, arrow_c_ffi.rs:640). Driver-side iterator —
    * bounded handoffs only.
    */
  def fromArrowBatches(spark: SparkSession, batches: Iterator[Array[Byte]],
      schemaJson: String): DataFrame =
    ArrowConverters.toDataFrame(batches, schemaJson, spark.asInstanceOf[CSparkSession])

  /** Executor-side: one serialized IPC record-batch payload → InternalRows.
    * The building block for the DataSource V2 reader (sources.arrowdir);
    * `tz`/`largeVarTypes` must be captured from the session at PLANNING
    * time and shipped, since executors have no session state.
    */
  def deserializeBatch(bytes: Array[Byte], schemaJson: String, tz: String,
      largeVarTypes: Boolean): Iterator[org.apache.spark.sql.catalyst.InternalRow] = {
    import org.apache.spark.sql.types.{DataType, StructType}
    val schema = DataType.fromJson(schemaJson).asInstanceOf[StructType]
    ArrowConverters.fromBatchIterator(
      Iterator.single(bytes), schema, tz,
      /* errorOnDuplicatedFieldNames = */ true,
      largeVarTypes,
      org.apache.spark.TaskContext.get())
  }

  /** Executor-side inverse of [[deserializeBatch]]: InternalRows → one IPC
    * payload per `maxRecordsPerBatch` chunk (the DSv2 writer's building
    * block). Conf values ship from planning time, as above.
    */
  def serializeBatches(rows: Iterator[org.apache.spark.sql.catalyst.InternalRow],
      schema: org.apache.spark.sql.types.StructType, maxRecordsPerBatch: Long, tz: String,
      largeVarTypes: Boolean): Iterator[Array[Byte]] =
    ArrowConverters.toBatchIterator(
      rows, schema, maxRecordsPerBatch, tz,
      /* errorOnDuplicatedFieldNames = */ true,
      largeVarTypes,
      org.apache.spark.TaskContext.get())

  /** Distributed import: batch payloads living on executors (one or more
    * IPC blobs per partition) are deserialized per-partition into
    * InternalRows — the unbounded record-batch-stream analog
    * (export_record_batch_stream, arrow_c_ffi.rs:2104). Nothing ever
    * touches the driver.
    */
  def fromArrowBatchRdd(spark: SparkSession,
      batches: org.apache.spark.rdd.RDD[Array[Byte]],
      schemaJson: String): DataFrame = {
    import org.apache.spark.sql.types.{DataType, StructType}
    val cs = spark.asInstanceOf[CSparkSession]
    val schema = DataType.fromJson(schemaJson).asInstanceOf[StructType]
    val tz = cs.sessionState.conf.sessionLocalTimeZone
    // must mirror the export side's conf — toArrowBatchRdd serializes
    // string/binary as large_utf8/large_binary under this flag
    val largeVarTypes = cs.sessionState.conf.arrowUseLargeVarTypes
    val rows = batches.mapPartitions { it =>
      ArrowConverters.fromBatchIterator(
        it, schema, tz,
        /* errorOnDuplicatedFieldNames = */ true,
        largeVarTypes,
        org.apache.spark.TaskContext.get())
    }
    cs.internalCreateDataFrame(rows, schema, isStreaming = false)
  }
}

/** Session bridge: build a sibling SparkSession (shared SparkContext,
  * fresh state) with a SparkSessionExtensions applied — what
  * `spark.sql.extensions` does at startup, reachable mid-JVM for tests
  * and embedded use.
  */
object SessionBridge {
  import org.apache.spark.sql.SparkSessionExtensions
  import org.apache.spark.sql.classic.SparkSession

  def newSessionWithExtensions(spark: org.apache.spark.sql.SparkSession,
      f: SparkSessionExtensions => Unit): org.apache.spark.sql.SparkSession = {
    // getOrCreate returns the existing default session (ignoring
    // withExtensions), so clear the default/active pointers, build a fresh
    // session over the SAME SparkContext, and restore them
    val prevDefault = SparkSession.getDefaultSession
    val prevActive = SparkSession.getActiveSession
    SparkSession.clearDefaultSession()
    SparkSession.clearActiveSession()
    try {
      val s2 = SparkSession.builder().withExtensions(f).getOrCreate()
      require(s2.sparkContext eq spark.sparkContext,
        "extension session must share the caller's SparkContext")
      s2
    } finally {
      // restore OR clear — with no prior session, foreach(None) would leak
      // the extension session as the JVM-wide default
      prevDefault match {
        case Some(s) => SparkSession.setDefaultSession(s)
        case None => SparkSession.clearDefaultSession()
      }
      prevActive match {
        case Some(s) => SparkSession.setActiveSession(s)
        case None => SparkSession.clearActiveSession()
      }
    }
  }
}

/** Listener-bus bridge: flush queued scheduler events so a measurement
  * listener's counters are complete before being read
  * (`listenerBus.waitUntilEmpty` is `private[spark]`).
  */
object MetricsBridge {
  def waitListenerBusEmpty(sc: org.apache.spark.SparkContext): Unit =
    sc.listenerBus.waitUntilEmpty()
}

/** Logical-plan bridge: wrap a LogicalPlan as a DataFrame (and back) so
  * optimizer rules can express rewrites with the Column API instead of
  * hand-building Catalyst trees. `Dataset.ofRows` is `private[sql]`.
  */
object PlanBridge {
  import org.apache.spark.sql.{DataFrame, SparkSession}
  import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
  import org.apache.spark.sql.classic.{Dataset => CDataset, SparkSession => CSparkSession}

  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    CDataset.ofRows(spark.asInstanceOf[CSparkSession], plan)

  def analyzed(df: DataFrame): LogicalPlan = df.queryExecution.analyzed
}

/** Function-registry bridge: registers Catalyst expression builders as
  * SQL-callable functions on an existing session (the registry is
  * `private[sql]`).
  */
object FunctionBridge {
  import org.apache.spark.sql.SparkSession
  import org.apache.spark.sql.classic.{SparkSession => CSparkSession}

  def register(spark: SparkSession, name: String,
      builder: Seq[Expression] => Expression): Unit =
    spark.asInstanceOf[CSparkSession].sessionState.functionRegistry
      .createOrReplaceTempFunction(name, builder, "scala_udf")
}
