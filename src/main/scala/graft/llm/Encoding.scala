package graft.llm

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Encoding-damage repair (the ftfy core case): text that went through a
  * UTF-8 → read-as-cp1252 → re-encode-as-UTF-8 round trip ("mojibake" —
  * `café` stored as `cafÃ©`, `’` as `â€™`). The practical fix is
  * TABLE-DRIVEN, exactly like ftfy's own core: every 2-/3-byte UTF-8
  * sequence of the Latin-1 Supplement letters and the common
  * Windows-1252 punctuation, decoded as cp1252, becomes a confusable
  * digraph/trigraph that essentially never occurs in clean text; the
  * repair replaces each with its original character.
  *
  * The pair table is GENERATED at build time from the JVM's own cp1252
  * codec (one source of truth — the oracle renders the identical table
  * as SQL literals), longest patterns first so trigraphs are consumed
  * before their digraph prefixes. Repair semantics are a SEQUENTIAL
  * chained literal replace (pattern k over the output of pattern k-1) —
  * deterministic and replayable in any engine, applied as per-row
  * projection arithmetic: shuffle-free, 100 TB-safe by construction.
  */
object Encoding {

  /** (mojibake, original) pairs: Latin-1 Supplement (U+00A0–U+00FF) plus
    * the common cp1252 punctuation block (curly quotes, dashes,
    * ellipsis, €, •, ‹›, ˆ, Œœ, ™). Pairs whose mojibake form contains a
    * control character OR U+FFFD are excluded: the five cp1252 holes
    * (0x81/8D/8F/90/9D, hit by Á Í Ï Ð Ý) decode to the REPLACEMENT
    * CHARACTER in the JVM codec, so their "patterns" are identical
    * `Ã<FFFD>` strings — ambiguous (five originals share one pattern)
    * and never reliable evidence in real text. Those five characters'
    * damage is unrepairable by construction; the repair leaves them
    * as-is rather than guessing. Longest-first, then lexicographic: a
    * deterministic application order shared with the oracle.
    */
  val MojibakePairs: Seq[(String, String)] = {
    val cp1252 = java.nio.charset.Charset.forName("windows-1252")
    val codepoints =
      (0x2018 to 0x201E) ++ // curly quotes, low quotes
        Seq(0x2013, 0x2014, 0x2026, 0x20AC, 0x2022, 0x2030, 0x2039, 0x203A,
          0x02C6, 0x02DC, 0x0152, 0x0153, 0x0160, 0x0161, 0x017D, 0x017E,
          0x0192, 0x2020, 0x2021, 0x2122) ++
        (0xA0 to 0xFF)
    codepoints.flatMap { cp =>
      val orig = new String(Character.toChars(cp))
      val moji = new String(orig.getBytes("UTF-8"), cp1252)
      val printable = moji.forall(ch =>
        ch >= 0x20 && !(ch >= 0x7f && ch <= 0x9f) && ch != '�')
      if (printable && moji != orig) Some(moji -> orig) else None
    }.sortBy { case (m, _) => (-m.length, m) }
  }

  /** Chained-replace repair of a text column (the pair table applied in
    * [[MojibakePairs]] order). Pure projection — no UDF, no shuffle.
    */
  def fixMojibake(text: Column): Column =
    MojibakePairs.foldLeft(text) { case (c, (m, o)) =>
      call_function("replace", c, lit(m), lit(o))
    }

  /** The same chain as a DuckDB SQL expression over `expr` (literal
    * single-quote escaping included) — the oracle's replay of
    * [[fixMojibake]], generated from the same table.
    */
  def fixMojibakeSql(expr: String): String =
    MojibakePairs.foldLeft(expr) { case (e, (m, o)) =>
      s"replace($e, '${m.replace("'", "''")}', '${o.replace("'", "''")}')"
    }

  /** Driver-side mojibake-ifier for fixtures/tests: the exact damage the
    * repair undoes (UTF-8 bytes re-read as cp1252).
    */
  def mojibakeOf(clean: String): String =
    new String(clean.getBytes("UTF-8"),
      java.nio.charset.Charset.forName("windows-1252"))
}
