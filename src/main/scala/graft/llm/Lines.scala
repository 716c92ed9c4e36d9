package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Line-level crawl cleaning (the C4 recipe, Raffel et al. 2020 §2.2):
  * corpus-wide exact LINE deduplication (the published C4 rule — web
  * boilerplate repeats as whole lines: nav footers, cookie banners,
  * subscribe prompts) and the C4 line-rule battery (terminal
  * punctuation, minimum words, brace/keyword drops). Sits between the
  * document-grain dedup family (q30/q31/…) and the arbitrary-alignment
  * substring family (q155/q159): line grain is what the published C4
  * pipeline actually ran.
  *
  * 100 TB shape: lines shuffle once as (fingerprint, doc, idx) triplets
  * keyed by fingerprint for the first-owner decision, then once by doc
  * for the rebuild — document text never shuffles whole, and the rule
  * battery is pure per-row column arithmetic.
  */
object Lines {

  /** Per-line first-owner verdicts: one row per non-blank line with
    * `kept` = this (doc, idx) is the corpus-wide FIRST occurrence of the
    * line's trimmed content (owner order: doc_id, then line index —
    * deterministic, engine-portable). Blank/whitespace-only lines are
    * dropped from the survey entirely (they carry no content and would
    * all collide).
    */
  def lineDedup(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val lines = df.select(col(idCol).as("id"),
        posexplode(split(col(textCol), "\n")).as(Seq("line_idx", "line")))
      .filter(trim(col("line")) =!= "")
    val w = Window.partitionBy(trim(col("line"))).orderBy(col("id"), col("line_idx"))
    lines
      .withColumn("rn", row_number().over(w))
      .select(col("id"), col("line_idx").cast("long").as("line_idx"), col("line"),
        (col("rn") === 1).as("kept"))
  }

  /** Documents rebuilt with only their corpus-first lines ([[lineDedup]]
    * apply step): every input row survives (a doc whose lines were all
    * owned elsewhere keeps an empty text), kept lines rejoin in original
    * order.
    */
  def removeDuplicateLines(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val kept = lineDedup(df, idCol, textCol).filter(col("kept"))
      .groupBy(col("id"))
      .agg(sort_array(collect_list(struct(col("line_idx"), col("line")))).as("ls"))
      .select(col("id"),
        array_join(transform(col("ls"), x => x.getField("line")), "\n").as("text"))
    df.select(col(idCol).as("id")).join(kept, Seq("id"), "left")
      .select(col("id"), coalesce(col("text"), lit("")).as("text"))
  }

  /** INCREMENTAL corpus-wide line dedup — [[lineDedup]]'s first-owner
    * rule extended across ingest batches against the persistent
    * fingerprint index (the exact shape a continuously-crawling pipeline
    * runs: a boilerplate line seen in ANY earlier epoch stays dropped
    * forever). Built directly on [[Dedup.exactDedupIncrement]] with a
    * synthetic line id `doc_id·10⁶ + line_idx`, so the within-batch
    * keep-min rule IS the (doc, idx) owner order and the cross-batch
    * rule is first-epoch-wins; the index stores only (fp, epoch) — ~16
    * bytes per unique line ever seen — and inherits the lease, epoch
    * isolation, compaction and crash contracts wholesale.
    * Returns one row per non-blank line: (id, line_idx, line, kept).
    */
  def lineDedupIncrement(batch: DataFrame, idCol: String, textCol: String,
      indexDir: String, epoch: Long): DataFrame = {
    // the packed key is only injective when the doc id is a non-null long
    // ≤ ~9.2e12 and the doc has < 10⁶ lines — outside that envelope the
    // key silently collides (or nulls) and corrupts verdicts, so fail
    // LOUDLY per-row instead (raise_error evaluates lazily in the plan)
    val packable = col("id").isNotNull &&
      col("line_idx") < 1000000L && abs(col("id")) < 9200000000000L
    val lines = batch.select(col(idCol).cast("long").as("id"),
        posexplode(split(col(textCol), "\n")).as(Seq("line_idx", "line")))
      .filter(trim(col("line")) =!= "")
      .withColumn("__lid", when(packable, col("id") * 1000000L + col("line_idx"))
        .otherwise(raise_error(concat(
          lit("lineDedupIncrement: unpackable line key (need non-null long id < 9.2e12, < 1e6 lines/doc); id="),
          coalesce(col("id").cast("string"), lit("NULL")),
          lit(" line_idx="), col("line_idx").cast("string")))))
    val verdicts = Dedup.exactDedupIncrement(lines, "__lid",
      md5(trim(col("line")).cast("binary")), indexDir, epoch)
    lines.join(verdicts.select(col("id").as("__lid"), col("kept")), Seq("__lid"))
      .select(col("id"), col("line_idx").cast("long").as("line_idx"),
        col("line"), col("kept"))
  }

  /** The C4 line-rule battery, one boolean per rule plus the conjunctive
    * keep — auditable like [[TextAnalysis.gopherRules]]:
    *   - `ok_punct`: ends in terminal punctuation (. ! ? or closing
    *     quote after one);
    *   - `ok_words`: at least `minWords` whitespace words;
    *   - `ok_brace`: no curly brace (code/markup tell);
    *   - `ok_js`: does not mention "javascript" (the enable-JS banner).
    * Blank lines fail everything. Pure column arithmetic, shuffle-free.
    */
  def c4LineRules(df: DataFrame, idCol: String, textCol: String,
      minWords: Int = 5): DataFrame = {
    val lines = df.select(col(idCol).as("id"),
      posexplode(split(col(textCol), "\n")).as(Seq("line_idx", "line")))
    val t = trim(col("line"))
    val okPunct = t.rlike("[.!?][\"']?$")
    val okWords = size(filter(split(t, " "), x => x =!= "")) >= minWords
    val okBrace = !t.contains("{") && !t.contains("}")
    val okJs = !lower(t).contains("javascript")
    lines.select(col("id"), col("line_idx").cast("long").as("line_idx"), col("line"),
      okPunct.as("ok_punct"), okWords.as("ok_words"),
      okBrace.as("ok_brace"), okJs.as("ok_js"),
      (okPunct && okWords && okBrace && okJs).as("kept"))
  }

  /** Documents rebuilt with only their rule-passing lines, plus the line
    * accounting a curation report needs. Every input row survives.
    */
  def c4Filter(df: DataFrame, idCol: String, textCol: String,
      minWords: Int = 5): DataFrame = {
    val rules = c4LineRules(df, idCol, textCol, minWords)
    val agg = rules.groupBy(col("id"))
      .agg(count(lit(1)).as("n_lines"),
        sum(when(col("kept"), 1L).otherwise(0L)).as("n_kept"),
        sort_array(collect_list(when(col("kept"),
          struct(col("line_idx"), col("line"))))).as("ls"))
      .select(col("id"), col("n_lines"), col("n_kept"),
        array_join(transform(col("ls"), x => x.getField("line")), "\n").as("text"))
    df.select(col(idCol).as("id")).join(agg, Seq("id"), "left")
      .select(col("id"), coalesce(col("n_lines"), lit(0L)).as("n_lines"),
        coalesce(col("n_kept"), lit(0L)).as("n_kept"),
        coalesce(col("text"), lit("")).as("text"))
  }
}
