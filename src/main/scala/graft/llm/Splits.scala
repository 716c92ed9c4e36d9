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

  /** Deterministic hash sample: keep ~`fraction` of rows, decided purely by
    * the id (no RNG, stable across runs/engines, filterable at scan time).
    * Resolution: 1/65536 (the 4-hex-digit bucket).
    */
  def hashSample(id: Column, fraction: Double): Column = {
    require(fraction >= 0 && fraction <= 1)
    splitBucket(id, 65536) < (fraction * 65536).toLong
  }

  /** Stratified deterministic sample: per-class keep fractions — the
    * balanced-downsampling op (shrink over-represented classes) with the
    * same hash determinism. Classes absent from `fractions` keep
    * `defaultFraction`.
    */
  def stratifiedHashSample(id: Column, label: Column,
      fractions: Map[String, Double], defaultFraction: Double = 1.0): Column = {
    (fractions.values.toSeq :+ defaultFraction).foreach(f =>
      require(f >= 0 && f <= 1, s"fraction out of [0,1]: $f"))
    val b = splitBucket(id, 65536)
    fractions.foldLeft(when(lit(false), lit(false))) { case (acc, (cls, f)) =>
      acc.when(label === cls, b < (f * 65536).toLong)
    }.otherwise(b < (defaultFraction * 65536).toLong)
  }
}
