package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Bloom-filter semi-join reduction — the runtime-filter pattern for
  * selective star joins at 100 TB (Spark's own `InjectRuntimeFilter`
  * materializes the same shape via a bloom subquery; this is the explicit
  * operator form with the filter built from the dimension side).
  *
  * The fact side is prefiltered by a compact bit-set membership test
  * BEFORE its join shuffle, so rows that cannot match never leave the
  * scan stage. Bloom filters have no false negatives, so the subsequent
  * exact join keeps results identical to the unfiltered join — false
  * positives only cost a little shuffled data, never correctness.
  *
  * Everything is built-in column arithmetic (xxhash64 + bit ops): the
  * membership test stays inside whole-stage codegen (no UDF, no custom
  * expression needed), and the filter itself is a dense Array[Long] bit
  * set aggregated distributedly with `bit_or` and collected to the driver
  * (m/64 longs — for the default 2^20 bits that is 128 KiB, the same
  * bounded-materialization contract as Spark's runtime-filter subquery,
  * cf. `spark.sql.optimizer.runtime.bloomFilter.maxNumBits`).
  *
  * Reference surface: minarrow's membership kernels (`in_mask`,
  * src/kernels/logical.rs) are exact; this operator is the scale-path
  * sibling for when the probe set no longer fits in an `isin` literal.
  */
object BloomJoin {

  /** Position of hash `i` of `keys` in a bit set of `numBits` (pow-2) bits.
    * Seeding by PREPENDING a literal to the hashed tuple gives k
    * independent hash functions from the one xxhash64 kernel.
    */
  private def bitPos(keys: Seq[Column], i: Int, numBits: Int): Column =
    xxhash64((lit(i) +: keys): _*).bitwiseAND(lit(numBits - 1L))

  private def checkedBits(numBits: Int): Unit = {
    require(numBits >= 64 && (numBits & (numBits - 1)) == 0,
      s"numBits must be a power of two >= 64, got $numBits")
    require(numBits <= (1 << 27),
      s"numBits=$numBits exceeds the 2^27 driver-materialization cap (16 MiB)")
  }

  /** Optimal bloom geometry for `expectedItems` at `fpp`: m rounded UP to
    * the next power of two (cheap masking instead of modulo), k from the
    * standard m/n·ln2 formula against the rounded m.
    */
  def geometry(expectedItems: Long, fpp: Double): (Int, Int) = {
    require(expectedItems > 0 && fpp > 0 && fpp < 1)
    val mReal = math.ceil(-expectedItems * math.log(fpp) / (math.log(2) * math.log(2)))
    val m = math.max(64, Integer.highestOneBit(math.min(mReal, 1 << 27).toInt - 1) << 1)
    val k = math.max(1, math.round(m.toDouble / expectedItems * math.log(2)).toInt)
    (m, math.min(k, 16))
  }

  /** Build the dense bit set over `keys` of `dim` as Array[Long] (length
    * numBits/64). One distributed pass: explode the k positions per row,
    * `bit_or` words map-side-combined, collect only the populated words.
    * No `distinct` — OR-ing a duplicate key is idempotent, so the build
    * skips that extra shuffle.
    */
  def buildBits(dim: DataFrame, keys: Seq[Column], numBits: Int, numHashes: Int): Array[Long] = {
    checkedBits(numBits)
    val pos = array((0 until numHashes).map(i => bitPos(keys, i, numBits)): _*)
    val words = dim
      .select(explode(pos).as("__pos"))
      .select(shiftright(col("__pos"), 6).cast("int").as("__word"),
        call_function("shiftleft", lit(1L),
          col("__pos").bitwiseAND(lit(63L)).cast("int")).as("__bit"))
      .groupBy(col("__word"))
      .agg(bit_or(col("__bit")).as("__bits"))
      .collect()
    val dense = new Array[Long](numBits / 64)
    words.foreach(r => dense(r.getInt(0)) = r.getLong(1))
    dense
  }

  /** Codegen membership test of `keys` against a built bit set: AND over
    * the k probed bits. NULL keys hash like any value (xxhash64 skips
    * nulls), matching the join's behavior of dropping them exactly.
    */
  def mightContain(keys: Seq[Column], bits: Array[Long], numHashes: Int): Column = {
    val words = lit(bits)
    (0 until numHashes).map { i =>
      val pos = bitPos(keys, i, bits.length * 64)
      element_at(words, shiftright(pos, 6).cast("int") + lit(1))
        .bitwiseAND(call_function("shiftleft", lit(1L),
          pos.bitwiseAND(lit(63L)).cast("int")))
        .=!=(lit(0L))
    }.reduce(_ && _)
  }

  /** Inner join `fact ⋈ dim` on `keys`, with the fact side bloom-prefiltered
    * by the dimension's key set. Result is EXACTLY the plain join (no false
    * negatives; false positives die in the join) — only the data volume
    * entering the fact shuffle changes. `dim` is re-evaluated for the build
    * pass; pass a persisted frame if its lineage is expensive.
    */
  def bloomFilteredJoin(fact: DataFrame, dim: DataFrame, keys: Seq[String],
      expectedItems: Long, fpp: Double = 0.01): DataFrame = {
    val (m, k) = geometry(expectedItems, fpp)
    val bits = buildBits(dim, keys.map(dim(_)), m, k)
    fact.filter(mightContain(keys.map(fact(_)), bits, k)).join(dim, keys)
  }
}
