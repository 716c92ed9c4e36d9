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

  /** Hard per-group cap — "at most `n` docs per domain/source", the
    * domain-balancing verb (a quota, not a rate: [[stratifiedHashSample]]
    * keeps a FRACTION per class; this keeps a COUNT). Selection is
    * deterministic and engine-portable: each group keeps its `n` smallest
    * rows by `(md5(id), id)`, so the kept set is stable across runs,
    * engines and cluster sizes, and adding rows to a group never swaps in
    * a row that a previous run rejected unless it hashes below the old
    * boundary (hash-order stability, same contract as [[hashSample]]).
    *
    * Scale shape — the naive form (`row_number() OVER (PARTITION BY
    * group ORDER BY md5(id))` then filter) sorts EVERY row of a group on
    * one reducer, which dies on a skewed domain holding 10% of a 100 TB
    * corpus. This does rank-by-hash-range instead:
    *
    *  1. count rows per (group, hash-bucket) — a map-side-combined
    *     aggregate over two slim columns (the parquet scan prunes to
    *     group + id);
    *  2. per group, a cumulative sum over its ≤`buckets` counts finds
    *     each bucket's decision: keep-all (quota not yet reached at the
    *     bucket's end), drop-all (quota exhausted before it), or
    *     boundary (exactly one bucket per group straddles the quota);
    *  3. rows join the per-(group,bucket) decision table — `buckets` ×
    *     |groups| rows, broadcast whenever it fits — and only the
    *     BOUNDARY bucket's rows (≈ groupSize/`buckets`) are ranked.
    *
    * Because the bucket is a numeric prefix of the md5 hex key, ordering
    * by (bucket, md5, id) IS ordering by (md5, id): the result is
    * row-identical to the naive form over non-null-id rows (LlmSpec
    * asserts equality), while the worst reducer sorts `buckets`× fewer
    * rows and untouched columns ride along only for surviving buckets.
    *
    * NULL ids are EXCLUDED from the output (md5(null) has no bucket) —
    * the library-wide hash-selection convention: [[hashSample]] /
    * [[stratifiedHashSample]] likewise never keep a null id, because a
    * null has no hash and so no deterministic fate. Spec-pinned.
    */
  def capPerGroup(df: org.apache.spark.sql.DataFrame, groupCol: String,
      idCol: String, n: Int, buckets: Int = 256): org.apache.spark.sql.DataFrame = {
    require(n > 0, s"cap must be positive: $n")
    require(buckets >= 1 && buckets <= 256, s"buckets out of [1,256]: $buckets")
    import org.apache.spark.sql.expressions.Window
    val key = md5(col(idCol).cast("string"))
    // numeric value of the first two hex digits, scaled to `buckets`
    // ranges — a PREFIX of the lexicographic md5 order, so bucket order
    // refines into md5 order (Column `/` is double division; the cast
    // floors it back — exact for these small ints — so joins and sorts
    // run on an int, not a normalized float)
    val bkt = (conv(substring(key, 1, 2), 16, 10).cast("int") * buckets / 256).cast("int")
    // null ids are out of scope entirely — excluded here too, or the
    // null bucket (sorting first) would silently consume quota slots
    val slim = df.filter(col(idCol).isNotNull)
      .select(col(groupCol).as("__g"), bkt.as("__b"))
    val counts = slim.groupBy(col("__g"), col("__b")).agg(count(lit(1)).as("__c"))
    val wcum = Window.partitionBy(col("__g")).orderBy(col("__b"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val dec = counts
      .withColumn("__cumBefore", sum(col("__c")).over(wcum) - col("__c"))
      .filter(col("__cumBefore") < n) // drop-all buckets never join back
      .select(col("__g").as("__dg"), col("__b").as("__db"),
        (col("__cumBefore") + col("__c") <= n).as("__all"),
        (lit(n.toLong) - col("__cumBefore")).as("__quota"))
    val tagged = df.withColumn("__k", key).withColumn("__b", bkt)
      .join(dec, col(groupCol) <=> col("__dg") && col("__b") === col("__db"))
    // ONE pass over `tagged`: the former keepAll/boundary split referenced
    // it twice (two full evaluations of `df` and the broadcast join — at
    // scale, two scans of the corpus), then unioned. Ranking every
    // surviving bucket and filtering (__all OR rank ≤ quota) keeps the
    // identical row set — full buckets pass on __all without consulting
    // the rank — for one window exchange over the capped groups' rows.
    val wrank = Window.partitionBy(col("__dg"), col("__db"))
      .orderBy(col("__k"), col(idCol))
    tagged.withColumn("__rn", row_number().over(wrank))
      .filter(col("__all") || col("__rn") <= col("__quota"))
      .select(df.columns.map(col).toIndexedSeq: _*)
  }

  /** Reproducible global corpus shuffle — the training-order verb: every
    * epoch's data order must be random-LOOKING but exactly replayable
    * (resume-from-step, ablation reruns, multi-worker sharding all need
    * position `i` to mean the same row everywhere). Position = rank of
    * `(md5(seed || id), id)`: a pure function of (seed, id) — no RNG
    * state, engine-portable, and a new seed is a fresh permutation.
    *
    * Scale shape: the rank comes from [[graft.ops.RowIndex.withRowIndex]]
    * (one range shuffle + a partition-count-bounded offsets collect), not
    * a global `row_number()` window, which would funnel 100 TB through a
    * single task. Downstream sharding is then a filter on `pos % workers`
    * or a range read of `pos` — both scan-prunable after a sort-by-pos
    * write.
    */
  def shuffleDeterministic(df: org.apache.spark.sql.DataFrame, idCol: String,
      seed: Long, posCol: String = "pos"): org.apache.spark.sql.DataFrame =
    graft.ops.RowIndex.withRowIndex(df, posCol,
      Seq(md5(concat(lit(seed.toString), col(idCol).cast("string"))), col(idCol)))
}
