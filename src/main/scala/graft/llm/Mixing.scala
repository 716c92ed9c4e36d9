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
    sampleAtRates(df, idCol, rates, sourceCol)
  }

  /** Temperature-flattened mixture weights — the multilingual sampling
    * rule (mC4 / XLM-R style): source weight ∝ (source tokens)^alpha,
    * alpha ∈ (0, 1]. alpha = 1 keeps the corpus's natural distribution;
    * alpha → 0 approaches uniform-over-sources, boosting small domains.
    * Unlike [[mixtureRates]] the weights derive FROM the corpus, so no
    * hand-tuned map is needed as sources appear/disappear upstream.
    *
    * Shape: one per-source aggregate (|sources| rows), one 1-row total
    * joined back as a provably-scalar cross (Catalyst maxRows = 1 —
    * PlanSweep-clean); the corpus is never touched here. The rate is
    * round(·, 6)-quantized so the oracle's libm pow and the JVM's agree
    * on the downstream bucket threshold.
    */
  def temperatureRates(df: DataFrame, tokenCol: String, sourceCol: String,
      alpha: Double, targetTokens: Long): DataFrame = {
    require(alpha > 0 && alpha <= 1, s"temperature alpha must be in (0,1]: $alpha")
    require(targetTokens > 0, s"token budget must be positive: $targetTokens")
    val tot = df.groupBy(col(sourceCol))
      .agg(sum(col(tokenCol)).cast("long").as("source_tokens"))
    val wsum = tot.agg(sum(pow(col("source_tokens"), lit(alpha))).as("wsum"))
    tot.crossJoin(broadcast(wsum))
      .withColumn("weight", pow(col("source_tokens"), lit(alpha)) / col("wsum"))
      .withColumn("rate", least(lit(1.0),
        round(col("weight") * lit(targetTokens.toDouble) / col("source_tokens"), 6)))
      .drop("wsum")
  }

  /** Kept rows under the temperature mixture (same stable-bucket keep rule
    * as [[sampleToMixture]]).
    */
  def sampleToTemperature(df: DataFrame, idCol: String, tokenCol: String,
      sourceCol: String, alpha: Double, targetTokens: Long): DataFrame =
    sampleAtRates(df, idCol,
      temperatureRates(df, tokenCol, sourceCol, alpha, targetTokens)
        .select(col(sourceCol), col("rate")),
      sourceCol)

  /** Token-budget epoch solver with a repetition cap — the mixture
    * arithmetic a multi-epoch pretraining recipe actually runs (the
    * Llama-style "how many passes over each source" table): allocate a
    * total token budget across sources proportionally to temperature
    * weights w_s ∝ n_s^α, but cap every source at `maxEpochs` passes over
    * its own tokens and WATER-FILL the freed budget back into the
    * uncapped sources. Unlike [[temperatureRates]] (single-epoch,
    * dropping-only: rate ≤ 1) this models UPSAMPLING — a small
    * high-weight source is repeated, up to the cap that protects the run
    * from memorizing it.
    *
    * `iters` rounds of water-filling, each one deterministic arithmetic:
    *   rem  = budget − Σ_capped cap_s        (budget left for the pool)
    *   raw_s = w_s / Σ_uncapped w · rem      (the pool splits it by weight)
    *   alloc_s = min(raw_s, cap_s), newly over-cap sources leave the pool.
    * One round caps at least one source or changes nothing, so
    * |sources| rounds are exact for ANY input; the default (iters ≤ 0)
    * auto-sizes to the source count so no residual budget is ever left
    * silently unspent. An explicit iters pins the round count (the
    * oracle-replay path, where the SQL unrolls a fixed number).
    *
    * Scale shape: one corpus aggregate to a |sources|-row frame, then
    * `iters` scalar-aggregate rounds over that frame, each round's two
    * pool scalars materialized as literals (a bounded metadata pass) —
    * the corpus is scanned once and never shuffled, exactly like
    * [[temperatureRates]]. Output one row per source:
    * (source, n_tok, weight, alloc_tok, epochs, capped).
    */
  def tokenBudgetEpochs(df: DataFrame, tokenCol: String, sourceCol: String,
      alpha: Double, budgetTokens: Long, maxEpochs: Double,
      iters: Int = 0): DataFrame = {
    require(alpha > 0 && alpha <= 1, s"temperature alpha must be in (0,1]: $alpha")
    require(budgetTokens > 0, s"token budget must be positive: $budgetTokens")
    require(maxEpochs > 0, s"epoch cap must be positive: $maxEpochs")
    val tot = df.groupBy(col(sourceCol).as("source"))
      .agg(sum(col(tokenCol)).cast("long").as("n_tok"))
      .persist() // |sources| rows; every round re-reads it
    graft.ops.CacheRegistry.register(tot)
    // each round caps ≥1 source or is a fixpoint, so |sources| rounds are
    // EXACT for any input; iters ≤ 0 (the default) auto-sizes to that —
    // a fixed small round count would silently under-allocate when more
    // sources cap sequentially than there are rounds. tot is |sources|
    // rows and persisted, so the sizing count is a bounded metadata pass.
    val rounds = if (iters >= 1) iters else math.max(1, tot.count().toInt)
    // The round scalars (wsum_all once; wsum/rem per round) are 1-row
    // aggregates of the |sources|-row frame: materialize them as LITERALS
    // (the tot.count() bounded-metadata-pass convention) instead of
    // nesting a broadcast-agg subtree per round. The all-frame form
    // referenced `cur` twice per round (pool + main), DOUBLING the plan
    // each round — ~2^rounds broadcast exchanges executed by the final
    // action (optimization guide §7.3: very large plans are their own
    // bottleneck; measured on q182's 4-round gate: 65 jobs -> 13,
    // formatted plan 1713 -> 160 lines, min-of-5 2.09 -> 0.99 s).
    // Arithmetic is unchanged: the identical doubles ride in as literals.
    def dlit(r: org.apache.spark.sql.Row, i: Int): Column =
      if (r.isNullAt(i)) lit(null).cast("double") else lit(r.getDouble(i))
    val wsumAll = dlit(tot.agg(sum(pow(col("n_tok"), lit(alpha)))).head(), 0)
    var cur = tot
      .withColumn("wsum_all", wsumAll)
      .withColumn("w", pow(col("n_tok"), lit(alpha)))
      .withColumn("cap", col("n_tok").cast("double") * maxEpochs)
      .withColumn("capped", lit(false))
      .withColumn("alloc", lit(0.0))
    for (_ <- 1 to rounds) {
      val pool = cur.agg(
        sum(when(!col("capped"), col("w"))).as("wsum"),
        (lit(budgetTokens.toDouble)
          - coalesce(sum(when(col("capped"), col("alloc"))), lit(0.0))).as("rem"))
        .head()
      val (wsum, rem) = (dlit(pool, 0), dlit(pool, 1))
      cur = cur
        .withColumn("raw", when(col("capped"), col("alloc")).otherwise(
          when(wsum > 0 && rem > 0,
            col("w") / wsum * rem).otherwise(lit(0.0))))
        .select(col("source"), col("n_tok"), col("w"), col("cap"), col("wsum_all"),
          (col("capped") || col("raw") >= col("cap")).as("capped"),
          least(col("raw"), col("cap")).as("alloc"))
    }
    cur.select(col("source"), col("n_tok"),
        round(col("w") / col("wsum_all"), 6).as("weight"),
        round(col("alloc"), 4).as("alloc_tok"),
        round(col("alloc") / col("n_tok"), 6).as("epochs"),
        col("capped"))
  }

  /** Kept rows under an explicit per-source `(source, rate)` frame — the
    * shared keep rule of [[sampleToMixture]] / [[sampleToTemperature]].
    * Public so a caller that already computed the rates (to emit them)
    * can reuse that frame instead of re-deriving it — the rates derive
    * from a corpus aggregate, so recomputing them re-scans (and for
    * kernel-priced token counts, re-tokenizes) the whole corpus
    * (round 16: q161 ran the full-byte BPE count 5× for one answer).
    */
  def sampleAtRates(df: DataFrame, idCol: String, rates: DataFrame,
      sourceCol: String): DataFrame =
    df.join(broadcast(rates), Seq(sourceCol))
      .filter(Splits.splitBucket(col(idCol), 65536) < (col("rate") * 65536).cast("long"))
      .drop("rate")

  /** DSIR-style importance weights (Xie et al. 2023, "Data Selection for
    * Language Models via Importance Resampling"): score every document by
    * how much its hashed-unigram feature distribution resembles a TARGET
    * slice versus the whole corpus —
    * dsir_logw(d) = Σ_b c_db · ln(p_target(b) / p_corpus(b)) / n_d,
    * over `buckets` hashed feature buckets with add-α smoothing on both
    * distributions (so buckets absent from the target stay finite). A
    * selection pass keeps the top-weighted documents; emitting the raw
    * per-doc log-weight keeps that policy (threshold, quantile, gumbel
    * top-k) out of the scoring operator.
    *
    * The bucket hash is the portable md5-prefix rule ([[Splits.splitBucket]]
    * semantics, applied to the token), so weights are reproducible across
    * engines, runs, and cluster sizes. Distributed shape: one tokenization
    * pass to (doc, bucket) count triplets; both distributions re-aggregate
    * those counts into `buckets`-row frames that broadcast into the scoring
    * join — documents never shuffle whole. Zero-token docs emit
    * (n_tok=0, NULL); an empty target slice yields NULL weights everywhere
    * (there is no distribution to resample toward).
    */
  def dsirWeights(df: DataFrame, idCol: String, textCol: String, targetPred: Column,
      buckets: Int = 64, alpha: Double = 0.5,
      tokens: Column => Column = TextAnalysis.wordTokens): DataFrame = {
    require(buckets > 0, s"bucket count must be positive: $buckets")
    require(alpha > 0, s"smoothing alpha must be positive: $alpha")
    val toks = df.select(col(idCol).as("id"), targetPred.as("is_target"),
      explode(tokens(col(textCol))).as("term"))
    val bc = toks
      .select(col("id"), col("is_target"),
        (conv(substring(md5(col("term")), 1, 4), 16, 10).cast("long") % buckets).as("bucket"))
      .groupBy(col("id"), col("is_target"), col("bucket")).agg(count(lit(1)).as("c"))
      .persist() // both distributions and the scoring pass reuse the counts
    graft.ops.CacheRegistry.register(bc)
    // ONE bucket-keyed aggregate carries both distributions (the old
    // tgt/cor/tTot/cTot quartet ran four separate passes over the cached
    // counts); the two grand totals re-aggregate the |buckets|-row frame,
    // not the counts. Conditional long sums are the same sums in the same
    // order per bucket — values identical.
    val byBucket = bc.groupBy(col("bucket")).agg(
        sum(col("c")).as("cc"),
        sum(when(col("is_target"), col("c"))).as("tc"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    graft.ops.CacheRegistry.register(byBucket)
    val tots = byBucket.agg(sum(col("cc")).cast("double").as("ct"),
      sum(col("tc")).cast("double").as("tt"))
    val aB = alpha * buckets
    val pT = (coalesce(col("tc"), lit(0L)) + alpha) / (col("tt") + aB)
    val pC = (col("cc") + alpha) / (col("ct") + aB)
    val scored = bc.join(broadcast(byBucket), "bucket")
      .crossJoin(broadcast(tots))
      .groupBy(col("id"))
      .agg(sum(col("c")).as("n_tok"),
        (sum(col("c") * log(pT / pC)) / sum(col("c"))).as("w"))
    df.select(col(idCol).as("id")).join(scored, Seq("id"), "left")
      .select(col("id"), coalesce(col("n_tok"), lit(0L)).as("n_tok"),
        round(col("w"), 6).as("dsir_logw"))
  }
}
