package graft

import graft.ops.{GraftTable, Restructure}
import org.apache.spark.sql.functions._

/** Selection DSL + restructuring semantics (minarrow §2.7-2.8,
  * tests/test_selection.rs behavior matrix).
  */
class SelectionSpec extends SparkSpec {
  import spark.implicits._

  private lazy val t = Seq(
    (0L, "a", 10.0), (1L, "b", 11.0), (2L, "c", 12.0),
    (3L, "d", 13.0), (4L, "e", 14.0), (5L, "f", 15.0), (6L, "g", 16.0)
  ).toDF("id", "name", "v")

  test("c() selects by name, cIdx by position, cRange by range") {
    assert(GraftTable(t).c("name", "v").toDF.columns.toSeq === Seq("name", "v"))
    assert(GraftTable(t).cIdx(2, 0).toDF.columns.toSeq === Seq("v", "id"))
    assert(GraftTable(t).cRange(0 until 2).toDF.columns.toSeq === Seq("id", "name"))
  }

  test("r() takes a contiguous row range under explicit order") {
    val out = GraftTable(t).r(2, 5, col("id")).toDF.collect().map(_.getLong(0)).toSeq
    assert(out === Seq(2L, 3L, 4L))
  }

  test("rIdx() takes arbitrary row indices under explicit order") {
    val out = GraftTable(t).rIdx(Seq(0L, 3L, 6L), col("id").desc).toDF
      .collect().map(_.getLong(0)).sorted.toSeq
    assert(out === Seq(0L, 3L, 6L))
  }

  test("chained .c().r() composes like Selection2D") {
    val out = GraftTable(t).c("id", "name").r(1, 3, col("id")).toDF.collect()
    assert(out.map(_.getLong(0)).toSeq === Seq(1L, 2L))
    assert(out.head.length === 2)
  }

  test("materialize caches the view (table_view.rs:376 to_table analog)") {
    val g = GraftTable(t.filter(col("id") > 2)).materialize()
    assert(g.toDF.storageLevel.useMemory)
    assert(g.toDF.count() === 4)
    g.toDF.unpersist()
  }

  test("concat + split round-trip preserves rows (concatenate.rs:96, table.rs:603)") {
    val parts = Restructure.splitByIndex(t, "id", Seq(3L))
    assert(parts.length === 2)
    val merged = Restructure.concatTables(parts)
    assert(merged.count() === 7)
    assert(merged.select(sum(col("v"))).head.getDouble(0) === t.select(sum(col("v"))).head.getDouble(0))
  }

  test("column ops: add/remove/rename/map (table.rs:212-519)") {
    val out = Restructure.mapCol(
      Restructure.renameColumns(
        Restructure.addCol(t, "v2", col("v") * 2), Map("name" -> "label")),
      "v2", _ + 1)
    assert(out.columns.toSeq === Seq("id", "label", "v", "v2"))
    assert(out.orderBy(col("id")).head.getDouble(3) === 21.0)
  }

  test("rechunk/consolidate control partitioning (super_table.rs:445)") {
    assert(Restructure.rechunk(t, 4).rdd.getNumPartitions === 4)
    assert(Restructure.consolidate(t).rdd.getNumPartitions === 1)
    assert(Restructure.rechunkByKey(t, 3, col("name")).rdd.getNumPartitions === 3)
  }

  test("insertRowsAt re-sorts on index (table.rs:520)") {
    val extra = Seq((10L, "z", 99.0)).toDF("id", "name", "v")
    val out = Restructure.insertRowsAt(t, extra, "id")
    assert(out.count() === 8)
    assert(out.orderBy(col("id")).collect().last.getString(1) === "z")
  }
}
