package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.types._

/** Introspection surface (SURVEY.md §2.13 — minarrow Print/Shape/ByteSize
  * traits): shape, size estimation, schema rendering, and the reference's
  * table pretty-printer reproduced character-for-character
  * (`/root/reference/src/structs/table.rs:934-1006` Display for Table,
  * `/root/reference/src/traits/print.rs:49-181` value_to_string /
  * print_rule / print_header_row / print_ellipsis_row / format_float).
  *
  * All metadata-level except `shape` (a count) and `render` (a bounded
  * driver-side collect — ≤ MAX_PREVIEW rows regardless of table size, so
  * the printer is safe to call on a 100 TB table: it costs one count plus
  * a 10-row head and tail, never a full materialization).
  */
object Introspect {
  /** (n_rows, n_cols) — minarrow Shape trait. */
  def shape(df: DataFrame): (Long, Int) = (df.count(), df.columns.length)

  /** Optimizer's size estimate in bytes (ByteSize analog; no action). */
  def estimatedBytes(df: DataFrame): BigInt =
    df.queryExecution.optimizedPlan.stats.sizeInBytes

  /** Schema as a tree string (Print trait analog). */
  def schemaTree(df: DataFrame): String = df.schema.treeString

  /** Preview cap: the reference shows all rows up to 50, else the first 10
    * + an ellipsis row + the last 10 (print.rs:27 MAX_PREVIEW, table.rs:941).
    */
  val MaxPreview = 50

  /** Field-metadata key marking a logically dictionary-encoded string
    * column (Spark keeps dict encoding physical — parquet/Tungsten — so
    * the reference's `Dictionary(UInt32)` dtype is a logical tag here,
    * like the Arrow string-width tags in ArrowInterop).
    */
  val DictTagKey = "graft.arrow.dictionary"

  /** Mark a string column as dictionary-encoded for display/interchange
    * (reference `TextArray::Categorical32`, ArrowType::Dictionary).
    */
  def tagDictionary(df: DataFrame, colName: String): DataFrame = {
    import org.apache.spark.sql.functions.col
    val md = new MetadataBuilder()
      .withMetadata(df.schema(colName).metadata)
      .putBoolean(DictTagKey, value = true).build()
    df.withColumn(colName, col(colName).as(colName, md))
  }

  /** The reference's float formatter (print.rs:174-181): `{:.6}` then
    * trailing zeros and a bare decimal point trimmed. Rust prints NaN as
    * "NaN" and infinities as "inf"/"-inf".
    */
  def formatFloat(v: Double): String = {
    if (v.isNaN) return "NaN"
    if (v.isPosInfinity) return "inf"
    if (v.isNegInfinity) return "-inf"
    val s = String.format(java.util.Locale.ROOT, "%.6f", Double.box(v))
    if (s.contains('.')) s.reverse.dropWhile(_ == '0').dropWhile(_ == '.').reverse else s
  }

  /** `time` crate Display for OffsetDateTime at UTC, the reference's
    * datetime cell format (print.rs:202-234: epoch → OffsetDateTime →
    * `to_string()`): `{date} {H}:{MM}:{SS}.{frac} +00:00:00` where the
    * hour is NOT zero-padded and the fraction keeps the minimal digits
    * (trailing zeros trimmed; exactly "0" when the subsecond is zero).
    */
  def formatDatetimeMicros(micros: Long): String = {
    val dt = java.time.LocalDateTime.ofEpochSecond(
      Math.floorDiv(micros, 1000000L),
      (Math.floorMod(micros, 1000000L) * 1000L).toInt,
      java.time.ZoneOffset.UTC)
    val nanos = dt.getNano
    val frac =
      if (nanos == 0) "0"
      else {
        var v = nanos; var width = 9
        while (v % 10 == 0) { v /= 10; width -= 1 }
        s"%0${width}d".format(v)
      }
    f"${dt.getYear}%04d-${dt.getMonthValue}%02d-${dt.getDayOfMonth}%02d " +
      f"${dt.getHour}%d:${dt.getMinute}%02d:${dt.getSecond}%02d.$frac%s +00:00:00"
  }

  /** The reference's dtype label in column headers (`{:?}` of ArrowType,
    * table.rs:955 `format!("{}:{:?}", name, dtype)`), mapped from the
    * Spark type (§1.2 correspondence table in SURVEY.md).
    */
  def dtypeLabel(f: StructField): String = f.dataType match {
    case _ if f.metadata.contains(DictTagKey) && f.dataType == StringType =>
      "Dictionary(UInt32)"
    case LongType      => "Int64"
    case IntegerType   => "Int32"
    case ShortType     => "Int16"
    case ByteType      => "Int8"
    case DoubleType    => "Float64"
    case FloatType     => "Float32"
    case StringType    => "String"
    case BooleanType   => "Boolean"
    case DateType      => "Date32"
    case TimestampType | TimestampNTZType => "Timestamp(Microseconds, None)"
    case other         => other.simpleString // Spark-only types keep their own label
  }

  /** value_to_string (print.rs:49-131): "null" for nulls, trimmed `{:.6}`
    * floats, bare ints, true/false, strings as-is, datetimes via the
    * `time` crate's UTC Display. Dates are TimeUnit::Days rendered at
    * midnight (print.rs:219-226).
    */
  def valueToString(v: Any, dt: DataType): String = v match {
    case null => "null"
    case d: Double => formatFloat(d)
    case fl: Float => formatFloat(fl.toDouble)
    case t: java.sql.Timestamp =>
      // getTime is epoch millis (zone-free); nanos carries the full subsecond
      formatDatetimeMicros(Math.floorDiv(t.getTime, 1000L) * 1000000L + t.getNanos / 1000L)
    case t: java.time.Instant =>
      formatDatetimeMicros(t.getEpochSecond * 1000000L + t.getNano / 1000L)
    case t: java.time.LocalDateTime =>
      formatDatetimeMicros(t.toEpochSecond(java.time.ZoneOffset.UTC) * 1000000L + t.getNano / 1000)
    case d: java.sql.Date =>
      // NOT getTime/86400000: collect() pins java.sql.Date to LOCAL
      // midnight, so the millis division is off by one day east of UTC
      formatDatetimeMicros(d.toLocalDate.toEpochDay * 86400L * 1000000L)
    case d: java.time.LocalDate => formatDatetimeMicros(d.toEpochDay * 86400L * 1000000L)
    case other => other.toString
  }

  private def center(s: String, w: Int): String = {
    // Rust's `{:^w$}` puts the extra space on the RIGHT (print.rs:151-154)
    val pad = w - s.length
    if (pad <= 0) s else (" " * (pad / 2)) + s + (" " * (pad - pad / 2))
  }

  private def rule(idxWidth: Int, widths: Seq[Int]): String =
    ("+" + "-" * (idxWidth + 2)) + widths.map(w => "-" * (w + 2)).mkString("+", "+", "+")

  /** The reference's table printer (Display for Table, table.rs:934-1006):
    * `Table "{name}" [{rows} rows × {cols} cols]`, a boxed grid with a
    * right-aligned `idx` column, `name:DType` headers, centered cells,
    * and a first-10/…/last-10 preview past MAX_PREVIEW rows. Column
    * widths fit the previewed cells only, like the reference.
    */
  def render(df: DataFrame, name: String = "table"): String = {
    val schema = df.schema
    if (schema.fields.isEmpty)
      return s"""Table  "$name" [0 rows × 0 cols] – empty""" + "\n"

    val nRows = df.count()
    val (headRows, tailRows) =
      if (nRows <= MaxPreview) (df.limit(MaxPreview).collect().toSeq, Seq.empty[org.apache.spark.sql.Row])
      else (df.head(10).toSeq, df.tail(10).toSeq)
    val rowIdx: Seq[Long] =
      if (nRows <= MaxPreview) headRows.indices.map(_.toLong)
      else (0L until 10L) ++ ((nRows - 10) until nRows)
    val cells: Seq[Seq[String]] = (headRows ++ tailRows).map { r =>
      schema.fields.toSeq.zipWithIndex.map { case (f, i) => valueToString(r.get(i), f.dataType) }
    }

    val headers = schema.fields.toSeq.map(f => s"${f.name}:${dtypeLabel(f)}")
    val widths = headers.zipWithIndex.map { case (h, i) =>
      (h.length +: cells.map(_(i).length)).max
    }
    // idx column width: max(3, digits of the largest printed index) —
    // table.rs:974 computes this via log10 (we sidestep its n_rows<=1 wrap)
    val idxWidth = math.max(3, if (nRows <= 1) 1 else (nRows - 1).toString.length)

    val sb = new StringBuilder
    sb.append(s"""Table "$name" [$nRows rows × ${schema.fields.length} cols]""").append('\n')
    sb.append(rule(idxWidth, widths)).append('\n')
    sb.append(s"| ${center("idx", idxWidth)} |")
    headers.zip(widths).foreach { case (h, w) => sb.append(s" ${center(h, w)} |") }
    sb.append('\n').append(rule(idxWidth, widths)).append('\n')
    cells.zipWithIndex.foreach { case (row, logical) =>
      sb.append(s"| ${rowIdx(logical).toString.reverse.padTo(idxWidth, ' ').reverse} |")
      row.zip(widths).foreach { case (c, w) => sb.append(s" ${center(c, w)} |") }
      sb.append('\n')
      if (logical == 9 && nRows > MaxPreview) {
        sb.append(s"| ${center("…", idxWidth)} |")
        widths.foreach { w => sb.append(s" ${center("…", w)} |") }
        sb.append('\n')
      }
    }
    sb.append(rule(idxWidth, widths)).append('\n')
    sb.toString
  }

  /** Back-compat: first-n preview of the old pipe-separated renderer. */
  def render(df: DataFrame, n: Int): String =
    render(df.limit(n))
}
