package graft.llm

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Deterministic dataset splits for training pipelines (north-star
  * extension): split assignment is a pure function of the row id (md5
  * prefix mod `buckets`), which makes it
  *
  *  - reproducible across runs, engines and cluster sizes (no RNG state);
  *  - stable under data growth — adding rows never moves an existing row
  *    to a different split (the classic leakage bug with `randomSplit`);
  *  - shuffle-free — one codegen projection, filterable at scan time.
  */
object Splits {

  /** Stable bucket in [0, buckets) from the id's md5 prefix. */
  def splitBucket(id: Column, buckets: Int = 100): Column =
    conv(substring(md5(id.cast("string")), 1, 4), 16, 10).cast("long") % buckets

  /** train/val/test label with the given percentages (rest = test). */
  def assignSplit(id: Column, trainPct: Int = 90, valPct: Int = 5): Column = {
    require(trainPct + valPct <= 100)
    val b = splitBucket(id)
    when(b < trainPct, "train")
      .when(b < trainPct + valPct, "val")
      .otherwise("test")
  }
}
