package graft.ops

import graft.expressions.{CountMatch, FindStr0, NfcNormalize, RollingHash, StripAccents, StrDivide, StrMulLen, StrSubtract}
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.ColumnBridge.{column => toCol, expression => toExpr}

/** String kernel surface (minarrow src/kernels/string.rs, 3,042 LoC;
  * SURVEY.md §2.3). The reference ships every op in `_str` and `_dict`
  * (dictionary) variants; Spark has no logical dictionary type — parquet
  * dictionary encoding + Catalyst handle the physical side — so one
  * logical op covers both (SURVEY.md §7.4.3).
  *
  * All scalar ops are codegen'd expressions; `joinStr`/`minStr`/`maxStr`/
  * `countDistinctStr`/`crossTabulate` are aggregations (partial+final).
  */
object Strings {
  // concat_str_str / concat_dict_* family, string.rs:80-339
  def concatStr(a: Column, b: Column): Column = concat(a, b)

  /** Empty-needle rule for the whole predicate family: the reference
    * returns FALSE, never a vacuous true (`!needle.is_empty() && …`,
    * string.rs:588; regex twin string.rs:633; pinned by
    * test_contains_empty_pattern / test_regex_empty_pattern_always_false,
    * string.rs:2474,2542). Spark's builtins return true here, so the empty
    * case is rewritten to a null-preserving constant false (NULL input →
    * NULL output, matching the reference's validity mask). The needle is a
    * Scala literal at every call site, so the branch is plan-time.
    */
  private def emptyNeedleFalse(c: Column, needle: String)(p: => Column): Column =
    if (needle.isEmpty) when(c.isNotNull, lit(false)) else p

  // contains/starts_with/ends_with ×{str,dict}², string.rs:376-615
  def containsStr(c: Column, sub: String): Column =
    emptyNeedleFalse(c, sub)(c.contains(sub))
  def startsWithStr(c: Column, p: String): Column =
    emptyNeedleFalse(c, p)(c.startsWith(p))
  def endsWithStr(c: Column, p: String): Column =
    emptyNeedleFalse(c, p)(c.endsWith(p))

  // regex_* (match → bool), string.rs:679-808
  def regexMatch(c: Column, pattern: String): Column =
    emptyNeedleFalse(c, pattern)(c.rlike(pattern))

  // len (char count) string.rs:840; byte_length string.rs:1256
  def lenChars(c: Column): Column = length(c)
  def byteLen(c: Column): Column = octet_length(c)

  // case / trim / reverse, string.rs:1093-1251
  def toUpper(c: Column): Column = upper(c)
  def toLower(c: Column): Column = lower(c)
  def trimStr(c: Column): Column = trim(c)
  def ltrimStr(c: Column): Column = ltrim(c)
  def rtrimStr(c: Column): Column = rtrim(c)
  def reverseStr(c: Column): Column = reverse(c)

  /** 0-based byte offset of first match, NULL if absent (find_str, string.rs:1322). */
  def find0(c: Column, sub: Column): Column =
    toCol(FindStr0(toExpr(c.cast("string")), toExpr(sub.cast("string"))))

  /** Non-overlapping substring count (count_match_str, string.rs:1388). */
  def countMatch(c: Column, sub: Column): Column =
    toCol(CountMatch(toExpr(c.cast("string")), toExpr(sub.cast("string"))))

  // substring / replace / repeat / pads, string.rs:1457-1815 (1-based pos like Spark)
  def substr(c: Column, pos: Int, len: Int): Column = substring(c, pos, len)
  def replaceStr(c: Column, find: String, repl: String): Column =
    regexp_replace(c, java.util.regex.Pattern.quote(find),
      java.util.regex.Matcher.quoteReplacement(repl))
  def repeatStr(c: Column, n: Int): Column = repeat(c, n)

  /** str⊕str arithmetic beyond Add (feature str_arithmetic, apply_str_str,
    * src/kernels/arithmetic/string.rs:643-790): `−` removes the FIRST
    * occurrence, `÷` splits on the separator and rejoins with '|', `×`
    * repeats the left side by the BYTE length of the right (capped at
    * STRING_MULTIPLICATION_LIMIT). Empty right side leaves `−`/`÷`
    * unchanged. All three are byte-exact codegen kernels.
    */
  def strSubtract(l: Column, r: Column): Column =
    toCol(StrSubtract(toExpr(l.cast("string")), toExpr(r.cast("string"))))
  def strDivide(l: Column, r: Column): Column =
    toCol(StrDivide(toExpr(l.cast("string")), toExpr(r.cast("string"))))
  def strMultiply(l: Column, r: Column): Column =
    toCol(StrMulLen(toExpr(l.cast("string")), toExpr(r.cast("string"))))
  def padLeft(c: Column, len: Int, pad: String): Column = lpad(c, len, pad)
  def padRight(c: Column, len: Int, pad: String): Column = rpad(c, len, pad)

  // regex_replace, string.rs:1919 (replaces ALL matches, like Spark)
  def regexReplace(c: Column, pattern: String, repl: String): Column =
    regexp_replace(c, pattern, repl)

  /** Collapse a whole column into one delimited string (join_str,
    * string.rs:1889) — an aggregation in Spark. Sorted for a deterministic
    * result under distributed execution (the reference is single-threaded
    * and order-preserving; stable order is the distributed analog).
    */
  def joinStr(c: Column, delim: String): Column =
    concat_ws(delim, sort_array(collect_list(c)))

  // min/max/count_distinct over strings, string.rs:941-1068
  def minStr(c: Column): Column = min(c)
  def maxStr(c: Column): Column = max(c)
  def countDistinctStr(c: Column): Column = countDistinct(c)

  /** Deterministic 64-bit content fingerprint (rolling hash over bytes). */
  def fingerprint(c: Column): Column = toCol(RollingHash(toExpr(c)))

  /** Unicode canonical composition / diacritic removal (UnicodeNorm
    * kernels) — the corpus-normalization pass every downstream hash/token
    * kernel assumes has already run.
    */
  def nfcNormalize(c: Column): Column = toCol(NfcNormalize(toExpr(c)))
  def stripAccents(c: Column): Column = toCol(StripAccents(toExpr(c)))

  /** Dictionary-aware string transform (minarrow's dict kernels operate on
    * `unique_values` only — e.g. regex_replace_dict rewrites the dictionary
    * not the rows, string.rs:1965-2021). For a low-cardinality column:
    * compute the transform over DISTINCT values and broadcast-join the
    * result back — the expensive function runs |dictionary| times instead
    * of |rows| times. Worth it when cardinality ≪ rows (the flag/status
    * columns at 100 TB); for high-cardinality columns use the direct
    * expression.
    */
  def dictAwareTransform(df: DataFrame, colName: String, f: Column => Column,
      outName: String): DataFrame = {
    // null-safe equality (<=>): distinct() puts the NULL key in the
    // dictionary, and a plain equi-join would silently drop those rows —
    // a transform must be row-preserving
    val dict = df.select(col(colName)).distinct()
      .withColumn(outName, f(col(colName)))
      .withColumnRenamed(colName, "__graft_dict_key")
    df.join(broadcast(dict), col(colName) <=> col("__graft_dict_key"))
      .drop("__graft_dict_key")
  }

  /** cross_tabulate (string.rs:2034-2140): contingency counts of two
    * text columns. `values` pins the pivot domain so the plan is a single
    * shuffle (no extra distinct-scan to discover categories).
    */
  def crossTabulate(df: DataFrame, rowCol: String, colCol: String, values: Seq[String]): DataFrame =
    df.groupBy(col(rowCol)).pivot(col(colCol), values).count().na.fill(0L, values)
}
