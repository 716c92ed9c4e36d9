package graft.llm

import graft.expressions.SimHash64
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.ColumnBridge.{column => toCol, expression => toExpr}

/** Deduplication operators for training-data pipelines (north-star
  * extension). Four families, each chosen for 100 TB shape:
  *
  *  - exact: hash-groupBy on a fingerprint — one shuffle on a short key,
  *    never on the full document text;
  *  - MinHash+LSH: shingle → k minhashes → band buckets → candidate pairs
  *    only within buckets (no all-pairs O(n²) stage anywhere), then exact
  *    Jaccard verification of candidates;
  *  - SimHash: 64-bit signature, near-dup = small Hamming distance; bucket
  *    by 16-bit chunks (pigeonhole: ≤3 differing bits ⇒ one chunk equal);
  *  - n-gram Jaccard: exact similarity via inverted index self-join on
  *    shingles (pairs sharing ≥1 shingle), linear in index size.
  *
  * All signature math is Spark higher-order functions over arrays —
  * codegen'd, no UDFs, no driver-side loops.
  */
object Dedup {

  /** Exact dedup: keep the minimum id per key group. The groupBy key should
    * be a fingerprint (md5/rolling-hash) rather than raw content so the
    * shuffle moves 16-byte keys, not documents.
    */
  def exact(df: DataFrame, keyCol: Column, idCol: Column): DataFrame =
    df.groupBy(keyCol.as("dup_key"))
      .agg(min(idCol).as("keep_id"), count(lit(1)).as("n_dups"))

  /** Distinct lowercase word-token array. */
  def tokens(text: Column): Column = array_distinct(TextAnalysis.wordTokens(text))

  /** Distinct n-word shingles (default 3) from the token stream. */
  def shingles(text: Column, n: Int = 3): Column = {
    val toks = TextAnalysis.wordTokens(text)
    array_distinct(
      when(size(toks) < n, array(concat_ws(" ", toks)))
        .otherwise(transform(sequence(lit(0), size(toks) - n),
          i => concat_ws(" ", slice(toks, i + 1, lit(n))))))
  }

  // MinHash over a 31-bit prime field: x = base hash of shingle in [0,p);
  // signature_i = min over shingles of (a_i*x + b_i) mod p. a_i,b_i are
  // deterministic (seeded) so signatures are reproducible across runs.
  private val P = 2147483647L // 2^31-1: a*x stays < 2^62, no Long overflow
  private def perms(k: Int, seed: Long): Seq[(Long, Long)] = {
    val rnd = new scala.util.Random(seed)
    Seq.fill(k)((1L + rnd.nextInt((P - 1).toInt).toLong, rnd.nextInt(P.toInt).toLong))
  }

  /** k-permutation MinHash signature (array<long>) of a shingle array. */
  def minHashSignature(shingleCol: Column, k: Int = 32, seed: Long = 42L): Column = {
    val hashes = transform(shingleCol, s => pmod(xxhash64(s), lit(P)))
    array(perms(k, seed).map { case (a, b) =>
      array_min(transform(hashes, x => pmod(x * a + b, lit(P))))
    }: _*)
  }

  /** LSH candidate pairs: band the signature (bands × rowsPerBand = k),
    * bucket-join docs sharing any band, verify with exact Jaccard over
    * shingle sets. `maxBucket` caps pathological buckets (skew guard —
    * at scale a hot bucket would otherwise quadratically explode one task).
    *
    * Returns (id1, id2, jaccard) with id1 < id2, jaccard >= threshold.
    */
  def minHashLshPairs(
      df: DataFrame, idCol: String, textCol: String,
      bands: Int = 8, rowsPerBand: Int = 4,
      threshold: Double = 0.5, maxBucket: Int = 1000): DataFrame = {
    val withSig = df.select(
      col(idCol).as("id"),
      shingles(col(textCol)).as("sh"))
      .withColumn("sig", minHashSignature(col("sh"), bands * rowsPerBand))
    val banded = withSig.select(
      col("id"), col("sh"),
      explode(array((0 until bands).map(b =>
        struct(lit(b).as("band"), hash(slice(col("sig"), b * rowsPerBand + 1, rowsPerBand)).as("bkey"))): _*)).as("bb"))
      .select(col("id"), col("sh"), col("bb.band"), col("bb.bkey"))
    // skew guard: drop buckets above maxBucket before the self-join
    val counted = banded.withColumn("bsz",
      count(lit(1)).over(org.apache.spark.sql.expressions.Window.partitionBy(col("band"), col("bkey"))))
      .filter(col("bsz") <= maxBucket)
    val l = counted.select(col("band"), col("bkey"), col("id").as("id1"), col("sh").as("sh1"))
    val r = counted.select(col("band"), col("bkey"), col("id").as("id2"), col("sh").as("sh2"))
    val cand = l.join(r, Seq("band", "bkey")).filter(col("id1") < col("id2"))
      .select(col("id1"), col("id2"), col("sh1"), col("sh2")).distinct()
    cand
      .withColumn("inter", size(array_intersect(col("sh1"), col("sh2"))).cast("double"))
      .withColumn("jaccard",
        col("inter") / (size(col("sh1")) + size(col("sh2")) - col("inter")))
      .filter(col("jaccard") >= threshold)
      .select(col("id1"), col("id2"), col("jaccard"))
  }

  /** 64-bit SimHash signature (custom codegen expression). */
  def simHash(text: Column): Column = toCol(SimHash64(toExpr(text.cast("string"))))

  /** SimHash near-dup pairs with Hamming distance <= maxHamming, bucketing
    * by 16-bit signature chunks (pigeonhole guarantee for maxHamming <= 3).
    */
  def simHashPairs(df: DataFrame, idCol: String, textCol: String,
      maxHamming: Int = 3): DataFrame = {
    val sigs = df.select(col(idCol).as("id"), simHash(col(textCol)).as("sig"))
    val banded = sigs.select(col("id"), col("sig"),
      explode(array((0 until 4).map(b =>
        struct(lit(b).as("band"),
          shiftrightunsigned(col("sig"), b * 16).bitwiseAND(lit(0xffffL)).as("chunk"))): _*)).as("bb"))
      .select(col("id"), col("sig"), col("bb.band"), col("bb.chunk"))
    val l = banded.select(col("band"), col("chunk"), col("id").as("id1"), col("sig").as("sig1"))
    val r = banded.select(col("band"), col("chunk"), col("id").as("id2"), col("sig").as("sig2"))
    l.join(r, Seq("band", "chunk")).filter(col("id1") < col("id2"))
      .select(col("id1"), col("id2"),
        bit_count(col("sig1").bitwiseXOR(col("sig2"))).cast("long").as("hamming"))
      .distinct()
      .filter(col("hamming") <= maxHamming)
  }

  /** Exact n-gram (word) Jaccard pairs via inverted-index self-join: only
    * pairs sharing at least one token are ever materialized.
    */
  def ngramJaccardPairs(df: DataFrame, idCol: String, textCol: String,
      threshold: Double): DataFrame = {
    val tok = df.select(col(idCol).as("id"), tokens(col(textCol)).as("toks"))
    val inv = tok.select(col("id"), explode(col("toks")).as("w"))
    val sizes = tok.select(col("id"), size(col("toks")).as("n"))
    val pairs = inv.as("a").join(inv.as("b"),
        col("a.w") === col("b.w") && col("a.id") < col("b.id"))
      .groupBy(col("a.id").as("id1"), col("b.id").as("id2"))
      .agg(count(lit(1)).as("inter"))
    pairs
      .join(sizes.withColumnRenamed("id", "id1").withColumnRenamed("n", "n1"), "id1")
      .join(sizes.withColumnRenamed("id", "id2").withColumnRenamed("n", "n2"), "id2")
      .withColumn("jaccard",
        col("inter").cast("double") / (col("n1") + col("n2") - col("inter")).cast("double"))
      .filter(col("jaccard") >= threshold)
      .select(col("id1"), col("id2"), col("inter"), col("n1"), col("n2"), col("jaccard"))
  }
}
