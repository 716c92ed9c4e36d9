package graft.llm

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** HTML → text extraction (the step every web corpus runs before any
  * quality/dedup pass): script/style block removal, tag stripping,
  * entity decoding, whitespace collapse, plus title extraction and link
  * counting. Deliberately REGEX-GRADE (the trafilatura/jusText
  * DOM-aware extractors are a model-quality concern): every pattern is
  * in the Java-regex ∩ RE2 common subset so the DuckDB oracle replays
  * the identical text, and everything is per-row column arithmetic —
  * codegen'd, shuffle-free, 100 TB-linear.
  */
object Html {

  /** `(?s)` so block content spans newlines; non-greedy so adjacent
    * blocks don't merge. Both supported by Java regex and RE2.
    */
  private[graft] val ScriptBlock = "(?s)<script[^>]*>.*?</script>"
  private[graft] val StyleBlock = "(?s)<style[^>]*>.*?</style>"
  private[graft] val Comment = "(?s)<!--.*?-->"
  private[graft] val Tag = "<[^>]*>"

  /** The five named entities every extractor must fold plus numeric
    * `&#NN;` for the apostrophe — applied AFTER tag stripping so an
    * entity can never assemble into a tag ("&lt;script&gt;" stays
    * text). `&amp;` is decoded LAST: decoding it first would
    * double-decode "&amp;lt;" into "<".
    */
  private[graft] val Entities: Seq[(String, String)] = Seq(
    "&nbsp;" -> " ", "&lt;" -> "<", "&gt;" -> ">",
    "&quot;" -> "\"", "&#39;" -> "'", "&amp;" -> "&")

  /** Visible text of an HTML payload: drop comments and script/style
    * blocks, strip tags to spaces, decode entities, collapse whitespace.
    */
  def extractText(html: Column): Column = {
    val noBlocks = regexp_replace(regexp_replace(regexp_replace(
      html.cast("string"), Comment, " "), ScriptBlock, " "), StyleBlock, " ")
    val noTags = regexp_replace(noBlocks, Tag, " ")
    val decoded = Entities.foldLeft(noTags) { case (acc, (e, r)) =>
      regexp_replace(acc, e, r)
    }
    trim(regexp_replace(decoded, "[ \t\n\f\r]+", " "))
  }

  /** Content of the first <title> element ('' when absent), entities
    * decoded with the same ordered fold as the body text.
    */
  def title(html: Column): Column =
    Entities.foldLeft(
      regexp_extract(html.cast("string"), "(?s)<title[^>]*>(.*?)</title>", 1)) {
      case (acc, (e, r)) => regexp_replace(acc, e, r)
    }

  /** Number of anchor OPENING tags — the outlink count per page (the
    * crawl-frontier statistic; pair with [[Urls.registrableDomain]] for
    * per-domain outlink rates). Comments are dropped first (a
    * commented-out anchor is not an outlink), and the match is
    * case-insensitive with any whitespace after the tag name — legacy
    * '<A HREF=…>' and wrapped '<a\n href' markup count too.
    */
  def linkCount(html: Column): Column =
    size(regexp_extract_all(regexp_replace(html.cast("string"), Comment, " "),
      lit("(?i)<a[ \t\n\f\r>]"), lit(0))).cast("long")
}
