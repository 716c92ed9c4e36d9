package graft.llm

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Benchmark decontamination for training corpora (north-star extension):
  * flag training documents sharing any word n-gram with an evaluation/
  * benchmark set — the standard leakage check run before pretraining
  * (the n-gram-overlap family used by public LLM data pipelines).
  *
  * 100 TB shape: the benchmark side is small (eval suites are MBs, not
  * TBs) — its DISTINCT n-gram set is broadcast, so the training corpus is
  * never shuffled on text. The only shuffle carries (doc_id, matched-gram)
  * pairs — hits only, a vanishing fraction of the corpus. Shingling is the
  * single-pass ShingleTokens codegen kernel, evaluated once per side per
  * pass (two corpus scans: hit-count + size; scan CPU is cheaper at scale
  * than shuffling every gram of every document).
  */
object Decontaminate {

  /** Per-training-document overlap report against `bench`:
    * (doc_id, n_grams, n_matched = distinct shared n-grams, contamination
    * = n_matched/n_grams, contaminated = any overlap). Every training row
    * appears exactly once; documents with fewer than `n` words form one
    * whole-text gram (ShingleTokens semantics), letterless documents have
    * zero grams and are never contaminated.
    */
  def ngramOverlap(train: DataFrame, bench: DataFrame,
      idCol: String, textCol: String, n: Int = 5): DataFrame = {
    // ShingleExplode generator: kernel + explode fused, no intermediate array
    val benchGrams = bench
      .select(Dedup.shingleRows(col(textCol), n))
      .select(col("shingle").as("g")).distinct()
    val grams = train.select(col(idCol).as("doc_id"), Dedup.shingleRows(col(textCol), n))
      .select(col("doc_id"), col("shingle").as("g"))
    val hits = grams.join(broadcast(benchGrams), Seq("g"))
      .groupBy(col("doc_id")).agg(countDistinct(col("g")).as("n_matched"))
    val sizes = train.select(col(idCol).as("doc_id"),
      size(Dedup.shingles(col(textCol), n)).cast("long").as("n_grams"))
    sizes.join(hits, Seq("doc_id"), "left")
      .select(col("doc_id"), col("n_grams"),
        coalesce(col("n_matched"), lit(0L)).as("n_matched"),
        when(col("n_grams") > 0,
          coalesce(col("n_matched"), lit(0L)) / col("n_grams"))
          .otherwise(lit(0.0)).as("contamination"),
        (coalesce(col("n_matched"), lit(0L)) > 0).as("contaminated"))
  }

  /** The keep-list complement: training rows with no benchmark overlap
    * (optionally tolerating up to `maxMatched` shared grams).
    */
  def clean(train: DataFrame, bench: DataFrame,
      idCol: String, textCol: String, n: Int = 5, maxMatched: Long = 0L): DataFrame = {
    val report = ngramOverlap(train, bench, idCol, textCol, n)
      .filter(col("n_matched") <= maxMatched)
      .select(col("doc_id"))
    train.join(report.withColumnRenamed("doc_id", idCol), Seq(idCol), "left_semi")
  }

  /** Near-duplicate decontamination: per training document, the maximum
    * n-gram-Jaccard similarity against ANY benchmark document, plus a
    * `contaminated` verdict at `threshold` — the fuzzy companion to
    * [[ngramOverlap]]. Verbatim-gram overlap catches quoted spans; this
    * catches lightly-edited copies of eval items (the dedup threshold the
    * public pipeline reports apply between train and test splits).
    *
    * LOSSLESS blocking, unlike the LSH dedup family: a pair with
    * Jaccard > 0 must share at least one shingle, so joining training
    * shingles to the benchmark's inverted index enumerates every
    * qualifying pair exactly — no recall argument, no signature seeds,
    * hence a plain SQL oracle.
    *
    * 100 TB shape: eval suites are MBs, so the bench inverted index and
    * bench sizes BROADCAST; the training corpus is shingled in one kernel
    * pass and never shuffled on text — only (doc, bench, hit-count)
    * triples (hits only) reach the exchange, and the per-doc argmax
    * window is keyed by doc_id (no global sort).
    *
    * Output, every training row exactly once:
    * (doc_id, n_grams, best_bench — NULL when no shared gram,
    *  max_jaccard — 0.0 when none, contaminated).
    */
  def fuzzyOverlap(train: DataFrame, bench: DataFrame,
      idCol: String, textCol: String, n: Int = 3, threshold: Double = 0.5): DataFrame =
    fuzzyOverlapFromToks(
      train.select(col(idCol).as("id"), Dedup.shingles(col(textCol), n).as("toks")),
      bench.select(col(idCol).as("id"), Dedup.shingles(col(textCol), n).as("toks")),
      threshold)

  /** [[fuzzyOverlap]] over PRE-TOKENIZED `(id, toks)` sides whose lifetime
    * the caller owns — gate consumers share the q31/q32 shingle table so
    * the kernel pass is paid once per fixture, not once per query.
    */
  def fuzzyOverlapFromToks(train: DataFrame, bench: DataFrame,
      threshold: Double): DataFrame = {
    // NULL toks (a null-text doc) must report n_grams = 0, not size(null) = -1
    val nToks = size(coalesce(col("toks"), array()))
    val bInv = bench.select(col("id").as("bench_id"), explode(col("toks")).as("g"))
    val bSizes = bench.select(col("id").as("bench_id"), nToks.cast("long").as("nb"))
    // size carried through the explode so the hit-count aggregate needs no
    // second join back to a sizes table for the training side
    val tGrams = train.select(col("id").as("doc_id"),
      nToks.cast("long").as("n_grams"), explode(col("toks")).as("g"))
    // toks are SETS (ShingleTokens dedups), so plain count = |intersection|
    val hits = tGrams.join(broadcast(bInv), Seq("g"))
      .groupBy(col("doc_id"), col("n_grams"), col("bench_id"))
      .agg(count(lit(1)).as("inter"))
    // int/int quotient: bit-identical on any engine, so the argmax order
    // (j DESC, bench_id ASC tie-break) is deterministic without rounding
    val scored = hits.join(broadcast(bSizes), Seq("bench_id"))
      .withColumn("j", col("inter").cast("double") /
        (col("n_grams") + col("nb") - col("inter")).cast("double"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("doc_id")).orderBy(col("j").desc, col("bench_id"))
    val best = scored.withColumn("rn", row_number().over(w)).filter(col("rn") === 1)
      .select(col("doc_id"), col("bench_id").as("best_bench"), col("j"))
    train.select(col("id").as("doc_id"), nToks.cast("long").as("n_grams"))
      .join(best, Seq("doc_id"), "left")
      .select(col("doc_id"), col("n_grams"), col("best_bench"),
        coalesce(col("j"), lit(0.0)).as("max_jaccard"),
        coalesce(col("j") >= threshold, lit(false)).as("contaminated"))
  }
}
