package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Data-mixture sampling for pretraining corpora (north-star extension):
  * downsample each source/domain deterministically so the kept corpus
  * approximates target mixture WEIGHTS within a total token budget — the
  * "domain reweighting" step every public LLM data recipe runs between
  * curation and packing.
  *
  * 100 TB shape: per-source token totals are a tiny aggregate (one row per
  * source) joined back via broadcast; the corpus itself is scanned once and
  * never shuffled. The keep decision is the stable md5 bucket
  * (Splits.splitBucket semantics) — reproducible across runs, engines and
  * cluster sizes, and filterable at scan time.
  */
object Mixing {

  /** Per-source sampling rate: min(1, weight·targetTokens / sourceTokens).
    * Sources absent from `weights` get weight 0 and are dropped. Rates are
    * capped at 1 — an under-represented source can't be upsampled, so the
    * realized mixture is "as close as dropping-only allows" (the standard
    * single-epoch behavior; document repetition is a training-loop choice,
    * not a data-op).
    */
  def mixtureRates(df: DataFrame, tokenCol: String, sourceCol: String,
      weights: Map[String, Double], targetTokens: Long): DataFrame = {
    require(targetTokens > 0, s"token budget must be positive: $targetTokens")
    weights.values.foreach(w => require(w >= 0, s"negative weight: $w"))
    val w = weights.foldLeft(when(lit(false), lit(0.0))) { case (acc, (s, v)) =>
      acc.when(col(sourceCol) === s, lit(v))
    }.otherwise(lit(0.0))
    df.groupBy(col(sourceCol))
      .agg(sum(col(tokenCol)).cast("long").as("source_tokens"))
      .withColumn("rate",
        least(lit(1.0), w * targetTokens / col("source_tokens")))
  }

  /** The kept rows under the mixture: join the (broadcast) per-source rate
    * back and keep rows whose stable bucket clears it. Same 1/65536 bucket
    * resolution as Splits.hashSample, but with a per-row (column) rate.
    */
  def sampleToMixture(df: DataFrame, idCol: String, tokenCol: String,
      sourceCol: String, weights: Map[String, Double], targetTokens: Long): DataFrame = {
    val rates = mixtureRates(df, tokenCol, sourceCol, weights, targetTokens)
      .select(col(sourceCol), col("rate"))
    df.join(broadcast(rates), Seq(sourceCol))
      .filter(Splits.splitBucket(col(idCol), 65536) < (col("rate") * 65536).cast("long"))
      .drop("rate")
  }
}
