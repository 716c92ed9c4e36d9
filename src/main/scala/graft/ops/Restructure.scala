package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Restructuring surface (SURVEY.md §2.8): concat / split / insert /
  * column ops / chunk management.
  *
  * Chunk model: minarrow's `SuperTable` (ordered batches,
  * src/structs/chunked/super_table.rs) maps to a partitioned DataFrame —
  * `rechunk` is `repartition`, `consolidate` is `coalesce(1)` (an explicit
  * single-node materialization the caller opts into, never implicit).
  */
object Restructure {

  /** Concatenate::concat (src/traits/concatenate.rs:96) — schema-checked
    * union. unionByName keeps it robust to column order.
    */
  def concatTables(tables: Seq[DataFrame]): DataFrame =
    tables.reduce(_ unionByName _)

  /** Table::add_col (src/structs/table.rs:212). */
  def addCol(df: DataFrame, name: String, c: Column): DataFrame = df.withColumn(name, c)

  /** Table::remove_col (table.rs:322). */
  def removeCol(df: DataFrame, name: String): DataFrame = df.drop(name)

  /** Table::rename_columns (table.rs:256). */
  def renameColumns(df: DataFrame, renames: Map[String, String]): DataFrame =
    renames.foldLeft(df) { case (d, (from, to)) => d.withColumnRenamed(from, to) }

  /** Table::map_col (table.rs:424): transform one column in place. */
  def mapCol(df: DataFrame, name: String, f: Column => Column): DataFrame =
    df.withColumn(name, f(col(name)))

  /** Table::map_all_cols (table.rs:480): apply f to every column. */
  def mapAllCols(df: DataFrame, f: Column => Column): DataFrame =
    df.select(df.columns.map(n => f(col(n)).as(n)): _*)

  /** Positional row insert (table.rs:520): union + re-sort on an explicit
    * index column. Opt-in (needs a row index; SURVEY.md §7.4.4).
    */
  def insertRowsAt(df: DataFrame, rows: DataFrame, idxCol: String): DataFrame =
    df.unionByName(rows).orderBy(col(idxCol))

  /** Table::split → chunked (table.rs:603): positional split into n chunks
    * by row-index ranges over an explicit index column.
    */
  def splitByIndex(df: DataFrame, idxCol: String, boundaries: Seq[Long]): Seq[DataFrame] = {
    val lo = Long.MinValue +: boundaries
    val hi = boundaries :+ Long.MaxValue
    lo.zip(hi).map { case (l, h) => df.filter(col(idxCol) >= l && col(idxCol) < h) }
  }

  /** SuperTable::rechunk (super_table.rs:445) / RechunkStrategy. */
  def rechunk(df: DataFrame, nChunks: Int): DataFrame = df.repartition(nChunks)

  /** Rechunk co-partitioned by key — the distributed-aware strategy the
    * reference's `RechunkStrategy` (super_array.rs:51) can't express:
    * co-locates equal keys so later joins/aggs on `keys` avoid a shuffle.
    */
  def rechunkByKey(df: DataFrame, nChunks: Int, keys: Column*): DataFrame =
    df.repartition(nChunks, keys: _*)

  /** Consolidate::consolidate (src/traits/consolidate.rs:68) — chunks→one. */
  def consolidate(df: DataFrame): DataFrame = df.coalesce(1)

  /** Table⊕Table positional column-wise zip (minarrow broadcast
    * `broadcast_table_with_operator`, src/kernels/broadcast/table.rs:31-63):
    * equal column counts required; rows paired positionally. A distributed
    * table has no inherent position, so both sides take explicit order keys
    * and pair via RowIndex.withRowIndex — a range shuffle + partitioned
    * row_number per side (SURVEY.md §2.5 — opt-in, costs a sort, but never
    * a single-task global window), then a hash join on the index.
    * Output keeps the left table's column names.
    */
  def zipTables(a: DataFrame, b: DataFrame,
      orderA: Seq[Column], orderB: Seq[Column],
      op: (Column, Column) => Column): DataFrame = {
    require(a.columns.length == b.columns.length,
      s"positional zip needs equal column counts (${a.columns.length} vs ${b.columns.length})")
    val ra = RowIndex.withRowIndex(a, "__rn", orderA)
    val rb = RowIndex.withRowIndex(b, "__rn", orderB)
      .toDF(b.columns.map(c => s"__b_$c") :+ "__rn": _*)
    val joined = ra.join(rb, "__rn")
    joined.select(a.columns.zip(b.columns).map { case (ca, cb) =>
      op(col(ca), col(s"__b_$cb")).as(ca)
    }: _*)
  }

  /** Cube analog (minarrow `Cube`, src/structs/cube.rs:77 — 3-D stack of
    * same-schema tables along a snapshot/category axis): a partition-labeled
    * union. The axis becomes a first-class column, so slicing along it is
    * partition pruning, and per-snapshot ops are groupBy(axis).
    */
  def stack(tables: Seq[(String, DataFrame)], axisCol: String = "snapshot"): DataFrame =
    tables.map { case (label, df) => df.withColumn(axisCol, lit(label)) }
      .reduce(_ unionByName _)

  /** Matrix interop (minarrow `Matrix`, src/structs/matrix.rs:74,
    * `TryFrom<Table>` :15-18): collect numeric columns into a row-major
    * local matrix. EXPLICITLY driver-side — the reference's Matrix is a
    * single-node BLAS container; at scale use Spark MLlib distributed
    * matrices instead. Caller opts in by bounding `maxRows`.
    */
  def toLocalMatrix(df: DataFrame, cols: Seq[String], maxRows: Int = 1 << 20): Array[Array[Double]] = {
    val rows = df.select(cols.map(c => col(c).cast("double")): _*).limit(maxRows).collect()
    // NULL cells surface as NaN (the BLAS-friendly missing marker) rather
    // than a driver-side NPE after the collect already ran
    rows.map(r => Array.tabulate(cols.length)(i => if (r.isNullAt(i)) Double.NaN else r.getDouble(i)))
  }
}
