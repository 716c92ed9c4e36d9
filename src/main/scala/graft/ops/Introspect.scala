package graft.ops

import org.apache.spark.sql.DataFrame

/** Introspection surface (SURVEY.md §2.13 — minarrow Print/Shape/ByteSize
  * traits): shape, size estimation, schema rendering. All metadata-level;
  * `shape` is the only action (a count).
  */
object Introspect {
  /** (n_rows, n_cols) — minarrow Shape trait. */
  def shape(df: DataFrame): (Long, Int) = (df.count(), df.columns.length)

  /** Optimizer's size estimate in bytes (ByteSize analog; no action). */
  def estimatedBytes(df: DataFrame): BigInt =
    df.queryExecution.optimizedPlan.stats.sizeInBytes

  /** Schema as a tree string (Print trait analog). */
  def schemaTree(df: DataFrame): String = df.schema.treeString

  /** First-n rows rendered as the reference's table printer would. */
  def render(df: DataFrame, n: Int = 20): String = {
    val rows = df.limit(n).collect()
    val header = df.columns.mkString(" | ")
    (header +: rows.map(_.toSeq.map(v => if (v == null) "null" else v.toString).mkString(" | ")))
      .mkString("\n")
  }
}
