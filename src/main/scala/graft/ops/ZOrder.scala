package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Z-order (Morton-curve) data clustering — the multi-dimensional layout
  * operator a 100 TB table needs so that range predicates on SEVERAL
  * columns all prune files/row-groups. Sorting by one column gives perfect
  * pruning on it and none on the others; sorting by the interleaved-bit
  * z-value bounds every clustered dimension's min/max per file, so parquet
  * footer statistics skip most of the table for box queries on any subset
  * of the dimensions (the layout behind Delta/Iceberg OPTIMIZE ZORDER).
  *
  * The z-value is plain bit arithmetic over built-in expressions —
  * whole-stage-codegen'd, no UDF, and replayable as integer arithmetic in
  * any engine (the gate oracle recomputes it in DuckDB).
  */
object ZOrder {

  /** Interleave the low `bits` bits of each column: bit j of column i
    * lands at output position j*k + i (column 0 in the lowest lanes).
    * Inputs must already be non-negative ints < 2^bits — normalization
    * (rank, scale, clamp) is the caller's, because at scale the
    * normalization constants must come from ONE pass, not per-row work.
    * k * bits must fit a signed long (≤ 63).
    */
  def zValue(cols: Seq[Column], bits: Int = 16): Column = {
    val k = cols.size
    require(k >= 1, "zValue needs at least one column")
    require(k * bits <= 63, s"$k cols × $bits bits overflows a long")
    val terms = for {
      (c, i) <- cols.zipWithIndex
      j <- 0 until bits
    } yield shiftleft(shiftright(c.cast("long"), j).bitwiseAND(lit(1L)), j * k + i)
    terms.reduce(_ bitwiseOR _)
  }

  /** Rewrite a frame into a z-clustered layout: range-partition by
    * z-value into `numFiles` tasks (one range-sample pass — the standard
    * OPTIMIZE cost), sort within each, and drop the helper column. Each
    * output file then covers a compact z-range, i.e. a bounded box in
    * every clustered dimension.
    */
  def cluster(df: DataFrame, dims: Seq[Column], numFiles: Int, bits: Int = 16): DataFrame = {
    val z = "__graft_z"
    df.withColumn(z, zValue(dims, bits))
      .repartitionByRange(numFiles, col(z))
      .sortWithinPartitions(col(z))
      .drop(z)
  }

  /** cluster + parquet write (the OPTIMIZE ZORDER verb). */
  def clusterWrite(df: DataFrame, dims: Seq[Column], numFiles: Int, path: String,
      bits: Int = 16): Unit =
    cluster(df, dims, numFiles, bits).write.mode("overwrite").parquet(path)

  /** Equi-depth cutpoints for one dimension — the ONE-PASS normalization
    * constants the zValue docstring demands: 2^bits−1 approx quantiles
    * computed driver-side (Greenwald-Khanna sketch; bounded memory, one
    * scan), so any numeric distribution maps onto the full bit lane.
    */
  def quantileCuts(df: DataFrame, dim: String, bits: Int,
      relErr: Double = 0.001): Array[Double] = {
    require(bits >= 1 && bits <= 10,
      s"quantile normalization supports bits <= 10 (the rank scan is O(2^bits)/row); got $bits")
    val lanes = 1 << bits
    val probs = (1 until lanes).map(_.toDouble / lanes).toArray
    df.stat.approxQuantile(dim, probs, relErr)
  }

  /** Rank of a value against precomputed cutpoints: |{cut <= v}| ∈
    * [0, 2^bits) — a codegen HOF scan over a broadcast literal array.
    * NULLs rank 0 (lowest lane), keeping them clustered together.
    */
  def quantileRank(c: Column, cuts: Array[Double]): Column =
    coalesce(size(filter(lit(cuts), x => x <= c.cast("double"))), lit(0))

  /** Z-cluster on quantile-NORMALIZED dimensions: every dim fills its
    * lane regardless of distribution or unit (the skew-proof form of
    * [[cluster]] — raw skewed dims would leave most of a lane empty and
    * give that dim no effective locality). All dims' cutpoints come from
    * ONE scan (the multi-column approxQuantile overload), so the whole
    * rewrite costs two passes regardless of dimension count.
    */
  def clusterByQuantile(df: DataFrame, dims: Seq[String], numFiles: Int,
      bits: Int = 8): DataFrame = {
    require(bits >= 1 && bits <= 10,
      s"quantile normalization supports bits <= 10; got $bits")
    val lanes = 1 << bits
    val probs = (1 until lanes).map(_.toDouble / lanes).toArray
    val allCuts = df.stat.approxQuantile(dims.toArray, probs, 0.001)
    val ranked = dims.zip(allCuts).map { case (d, cuts) => quantileRank(col(d), cuts) }
    cluster(df, ranked, numFiles, bits)
  }
}
