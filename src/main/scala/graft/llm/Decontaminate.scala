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
}
