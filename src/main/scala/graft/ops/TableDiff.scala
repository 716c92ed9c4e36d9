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
    def packed(df: DataFrame, name: String) = df.select(
      keys.map(col) :+ struct(payload.map(col): _*).as(name): _*)
    packed(before, "__b").join(packed(after, "__a"), keys, "full_outer")
      .withColumn("status",
        when(col("__b").isNull, lit("added"))
          .when(col("__a").isNull, lit("removed"))
          .when(!(col("__a") <=> col("__b")), lit("changed")))
      .filter(col("status").isNotNull)
      .select(keys.map(col) :+ col("status"): _*)
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
