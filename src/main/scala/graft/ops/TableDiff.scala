package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Data reconciliation operators — the ops tooling around at-rest tables:
  * what changed between two snapshots (anti-entropy / migration
  * verification), and how to roll a delta into an additive aggregate
  * table without rescanning the base (incremental view maintenance).
  */
object TableDiff {

  /** Row-level diff of two same-schema frames by key: one row per key
    * whose presence or payload differs, with status `added` (only in
    * `after`), `removed` (only in `before`) or `changed` (payload
    * differs). Identical rows are dropped — on a 100 TB reconciliation
    * the output is the (small) drift, never the table. Payload equality
    * is null-safe struct comparison — no serialization, no hashing
    * collisions. One full-outer shuffle on the keys.
    *
    * PRECONDITION: `keys` must uniquely identify a row on EACH side
    * (same as [[AsOfJoin.asOfBroadcast]]'s dedup precondition) —
    * duplicate keys would turn the full-outer join into a per-key
    * cartesian with contradictory status rows. Not checked by default
    * (a check costs two aggregate passes over 100 TB); pass
    * `checkUniqueKeys = true` to pay for the assertion.
    */
  def diff(before: DataFrame, after: DataFrame, keys: Seq[String],
      checkUniqueKeys: Boolean = false): DataFrame = {
    require(before.columns.sorted.sameElements(after.columns.sorted),
      s"schemas differ: ${before.columns.mkString(",")} vs ${after.columns.mkString(",")}")
    if (checkUniqueKeys) {
      for ((df, side) <- Seq((before, "before"), (after, "after"))) {
        val dup = df.groupBy(keys.map(col): _*).count().filter(col("count") > 1).limit(1).collect()
        require(dup.isEmpty,
          s"diff keys not unique on $side side, e.g. ${dup.head.toSeq.init.mkString(",")}")
      }
    }
    val payload = before.columns.filterNot(keys.contains).sorted
    def packed(df: DataFrame, name: String, pfx: String) = df.select(
      keys.map(k => col(k).as(pfx + k)) :+ struct(payload.map(col): _*).as(name): _*)
    // the key match must be NULL-SAFE (<=>): an equi-join would report a
    // NULL-key row present unchanged in both snapshots as added AND
    // removed — phantom churn in the one primitive whose job is an exact
    // change ledger (the deleteByKeys NULL lesson, diff-shaped)
    val b = packed(before, "__b", "__bk_")
    val a = packed(after, "__a", "__ak_")
    val cond = keys.map(k => col("__bk_" + k) <=> col("__ak_" + k)).reduce(_ && _)
    b.join(a, cond, "full_outer")
      .withColumn("status",
        when(col("__b").isNull, lit("added"))
          .when(col("__a").isNull, lit("removed"))
          .when(!(col("__a") <=> col("__b")), lit("changed")))
      .filter(col("status").isNotNull)
      .select(keys.map(k =>
        coalesce(col("__bk_" + k), col("__ak_" + k)).as(k)) :+ col("status"): _*)
  }

  /** Additive aggregate maintenance: fold a pre-aggregated `delta` into a
    * `silver` aggregate table keyed by `keys` — valid for ADDITIVE
    * measures (counts, sums; the mergeable-sketch variant for distincts
    * is q100's hll_union). The base table is never rescanned: cost is
    * one shuffle over |silver| + |delta| group rows.
    */
  def mergeAdditive(silver: DataFrame, delta: DataFrame, keys: Seq[String]): DataFrame = {
    require(silver.columns.sorted.sameElements(delta.columns.sorted),
      s"schemas differ: ${silver.columns.mkString(",")} vs ${delta.columns.mkString(",")}")
    val measures = silver.columns.filterNot(keys.contains)
    val aggs = measures.map(c => sum(col(c)).as(c))
    silver.unionByName(delta)
      .groupBy(keys.map(col): _*)
      .agg(aggs.head, aggs.tail: _*)
  }
}
