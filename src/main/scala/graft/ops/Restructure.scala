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
}
