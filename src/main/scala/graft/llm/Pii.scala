package graft.llm

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** PII scrubbing for training corpora — the redaction pass every public
  * LLM data recipe runs before release (emails, phone numbers, IP
  * addresses, SSN-shaped ids → typed placeholder tokens). Deliberately
  * REGEX-GRADE like [[Html]]: every pattern sits in the Java-regex ∩ RE2
  * common subset so the DuckDB oracle replays the identical matches, and
  * everything is per-row column arithmetic — codegen'd, shuffle-free,
  * 100 TB-linear. The NER-grade name/address scrubbers are a
  * model-quality concern, out of scope by the same argument as
  * trafilatura-grade extraction.
  *
  * Patterns apply IN ORDER (email, SSN, IPv4, phone) with each count
  * taken on the text state at that pattern's turn — the SSN/IP matches
  * are consumed before the looser phone pattern can swallow them, so
  * counts equal replacements made.
  */
object Pii {

  /** (pattern, placeholder) in application order. */
  val Patterns: Seq[(String, String, String)] = Seq(
    ("email", "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}", "[EMAIL]"),
    ("ssn", "\\b[0-9]{3}-[0-9]{2}-[0-9]{4}\\b", "[SSN]"),
    ("ipv4", "\\b([0-9]{1,3}\\.){3}[0-9]{1,3}\\b", "[IP]"),
    // Phone: each branch demands either a +/( anchor or consistent
    // -/. separators with a 4-digit tail — the old catch-all
    // [0-9() -]{7,} swallowed ANY spaced digit run ("1999 2000 2001",
    // score lists) and collapsed numeric prose to [PHONE]. Dates
    // (2024-12-25) miss the {4}-tail branches; bare digit runs and
    // space-separated groups without an anchor are deliberately NOT
    // phones. Still Java∩RE2 (no lookaround/backrefs) so the DuckDB
    // oracle replays identical matches.
    ("phone",
      "\\+[0-9]{1,3}[ -]?(\\([0-9]{1,4}\\)[ -]?)?[0-9]{2,4}([ -]?[0-9]{2,4}){0,3}\\b" +
        "|\\([0-9]{3,4}\\)[ -]?[0-9]{3,4}[ -]?[0-9]{3,4}\\b" +
        "|\\b[0-9]{3}-[0-9]{3}-[0-9]{4}\\b" +
        "|\\b[0-9]{3}\\.[0-9]{3}\\.[0-9]{4}\\b" +
        "|\\b[0-9]{3}-[0-9]{4}\\b",
      "[PHONE]"))

  /** Per-document redaction report: one count column per pattern
    * (`n_email`, `n_ssn`, `n_ipv4`, `n_phone` — matches at that
    * pattern's turn in the staged fold) plus the fully-redacted text.
    */
  def redactReport(text: Column): Seq[Column] = {
    var cur = text.cast("string")
    val counts = Patterns.map { case (name, re, repl) =>
      val n = size(regexp_extract_all(cur, lit(re), lit(0))).cast("long").as(s"n_$name")
      cur = regexp_replace(cur, re, repl)
      n
    }
    counts :+ cur.as("redacted")
  }
}
