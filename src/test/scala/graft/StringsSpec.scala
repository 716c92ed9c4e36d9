package graft

import graft.ops.Strings
import org.apache.spark.sql.functions._

/** String kernel semantics (minarrow §2.3): byte-offset find, non-overlap
  * count, null masks, join aggregation.
  */
class StringsSpec extends SparkSpec {

  test("find0 returns 0-based BYTE offset, null when absent (string.rs:1322)") {
    val df = strings("s", Seq(Some("hello"), Some("xyz"), None, Some("héllo")))
    assert(col1[Long](df.select(Strings.find0(col("s"), lit("llo")))) ===
      Seq(Some(2L), None, None, Some(3L))) // é is 2 bytes -> byte offset 3
  }

  test("find0 empty needle is 0") {
    val df = strings("s", Seq(Some("abc")))
    assert(col1[Long](df.select(Strings.find0(col("s"), lit("")))) === Seq(Some(0L)))
  }

  test("countMatch counts non-overlapping occurrences (string.rs:1388)") {
    val df = strings("s", Seq(Some("ololol"), Some("aaaa"), Some(""), None))
    assert(col1[Long](df.select(Strings.countMatch(col("s"), lit("ol")))) ===
      Seq(Some(3L), Some(0L), Some(0L), None))
    assert(col1[Long](df.select(Strings.countMatch(col("s"), lit("aa")))) ===
      Seq(Some(0L), Some(2L), Some(0L), None))
    // empty needle = char boundaries (chars+1): the reference delegates to
    // Rust str::matches (string.rs:1408) — "abc".matches("").count() == 4
    assert(col1[Long](df.select(Strings.countMatch(col("s"), lit("")))) ===
      Seq(Some(7L), Some(5L), Some(1L), None))
  }

  test("str arithmetic subtract/divide/multiply match the reference vectors (arithmetic/string.rs:1625-1716)") {
    // test_subtract_str: remove the FIRST occurrence; no match → unchanged
    val sub = strings("s", Seq(Some("hello"), Some("goodbye"), Some("test"), None))
    assert(col1[String](sub.select(Strings.strSubtract(col("s"),
        element_at(typedLit(Map("hello" -> "l", "goodbye" -> "bye", "test" -> "xyz")), col("s"))))) ===
      Seq(Some("helo"), Some("good"), Some("test"), None))
    // empty rhs → unchanged (string.rs:740)
    assert(col1[String](sub.select(Strings.strSubtract(col("s"), lit("")))) ===
      Seq(Some("hello"), Some("goodbye"), Some("test"), None))
    // test_divide_str: split + rejoin with '|'; empty separator → unchanged
    val div = strings("s", Seq(Some("a,b,c"), Some("a--b--c"), Some("abc")))
    assert(col1[String](div.select(Strings.strDivide(col("s"), lit(",")))) ===
      Seq(Some("a|b|c"), Some("a--b--c"), Some("abc")))
    assert(col1[String](div.select(Strings.strDivide(col("s"), lit("--")))) ===
      Seq(Some("a,b,c"), Some("a|b|c"), Some("abc")))
    assert(col1[String](div.select(Strings.strDivide(col("s"), lit("")))) ===
      Seq(Some("a,b,c"), Some("a--b--c"), Some("abc")))
    // test_multiply_str: lhs repeated rhs.len() (BYTES) times
    val mul = strings("s", Seq(Some("x"), Some("ab"), Some("c")))
    assert(col1[String](mul.select(Strings.strMultiply(col("s"),
        element_at(typedLit(Map("x" -> "123", "ab" -> "12", "c" -> "long_string")), col("s"))))) ===
      Seq(Some("xxx"), Some("abab"), Some("c" * 11)))
  }

  test("predicate family is FALSE on an empty needle, null-preserving (string.rs:588,633)") {
    // Spark's builtins return a vacuous TRUE for contains/startsWith/
    // endsWith/rlike with an empty pattern; the reference pins FALSE
    // (test_contains_empty_pattern string.rs:2474,
    // test_regex_empty_pattern_always_false string.rs:2542) with the
    // validity mask carried through (NULL in → NULL out).
    val df = strings("s", Seq(Some("foo"), Some(""), None))
    for (p <- Seq[org.apache.spark.sql.Column => org.apache.spark.sql.Column](
        Strings.containsStr(_, ""), Strings.startsWithStr(_, ""),
        Strings.endsWithStr(_, ""), Strings.regexMatch(_, ""))) {
      assert(col1[Boolean](df.select(p(col("s")))) ===
        Seq(Some(false), Some(false), None))
    }
    // non-empty needles still route to the builtins
    assert(col1[Boolean](df.select(Strings.containsStr(col("s"), "o"))) ===
      Seq(Some(true), Some(false), None))
    assert(col1[Boolean](df.select(Strings.regexMatch(col("s"), "^f"))) ===
      Seq(Some(true), Some(false), None))
  }

  test("transform kernels preserve null masks") {
    val df = strings("s", Seq(Some("Alpha"), None, Some("  pad  ")))
    assert(col1[String](df.select(Strings.toUpper(col("s")))) ===
      Seq(Some("ALPHA"), None, Some("  PAD  ")))
    assert(col1[String](df.select(Strings.trimStr(col("s")))) ===
      Seq(Some("Alpha"), None, Some("pad")))
    assert(col1[String](df.select(Strings.reverseStr(col("s")))) ===
      Seq(Some("ahplA"), None, Some("  dap  ")))
  }

  test("byte length vs char length on multibyte") {
    val df = strings("s", Seq(Some("héllo")))
    assert(col1[Int](df.select(Strings.lenChars(col("s")))) === Seq(Some(5)))
    assert(col1[Int](df.select(Strings.byteLen(col("s")))) === Seq(Some(6)))
  }

  test("kernels handle multibyte content without corruption") {
    val df = strings("s", Seq(Some("héllo wörld"), Some("日本語 text")))
    // find0 counts BYTES; char ops stay char-based
    assert(col1[Long](df.select(Strings.find0(col("s"), lit("wörld")))) ===
      Seq(Some(7L), None)) // h-é(2B)-l-l-o-space = 7 bytes
    assert(col1[Int](df.select(Strings.lenChars(col("s")))) === Seq(Some(11), Some(8)))
    assert(col1[String](df.select(Strings.toUpper(col("s")))) ===
      Seq(Some("HÉLLO WÖRLD"), Some("日本語 TEXT")))
  }

  test("replaceStr is literal (regex metachars inert)") {
    val df = strings("s", Seq(Some("a.b.c")))
    assert(col1[String](df.select(Strings.replaceStr(col("s"), ".", "-"))) ===
      Seq(Some("a-b-c")))
  }

  test("joinStr collapses a column deterministically (string.rs:1889)") {
    val df = strings("s", Seq(Some("b"), Some("a"), Some("c")))
    assert(col1[String](df.agg(Strings.joinStr(col("s"), ","))) === Seq(Some("a,b,c")))
  }

  test("fingerprint is deterministic and distinct across content") {
    val df = strings("s", Seq(Some("doc one"), Some("doc one"), Some("doc two")))
    val fps = col1[Long](df.select(Strings.fingerprint(col("s"))))
    assert(fps(0) === fps(1))
    assert(fps(0) !== fps(2))
  }

  test("dictAwareTransform equals the direct expression (regex_replace_dict, string.rs:1965)") {
    import spark.implicits._
    val df = Seq("A-F", "B-O", "A-F", "C-P", "B-O").toDF("s")
    val direct = df.withColumn("out", regexp_replace(col("s"), "-", "_"))
      .collect().map(r => (r.getString(0), r.getString(1))).sorted.toSeq
    val dictAware = Strings.dictAwareTransform(df, "s", c => regexp_replace(c, "-", "_"), "out")
      .collect().map(r => (r.getString(0), r.getString(1))).sorted.toSeq
    assert(direct === dictAware)
  }

  test("dictAwareTransform preserves NULL rows (row-preserving transform)") {
    import spark.implicits._
    val df = Seq(Some("A-F"), None, Some("B-O"), None).toDF("s")
    val out = Strings.dictAwareTransform(df, "s", c => regexp_replace(c, "-", "_"), "out")
    assert(out.count() === 4L, "transform dropped NULL-key rows")
    val nulls = out.filter(col("s").isNull).collect()
    assert(nulls.length === 2 && nulls.forall(_.isNullAt(1)))
  }

  test("crossTabulate equals groupBy-pivot-count (string.rs:2034)") {
    import spark.implicits._
    val df = Seq(("a", "x"), ("a", "y"), ("b", "x"), ("a", "x")).toDF("r", "c")
    val ct = Strings.crossTabulate(df, "r", "c", Seq("x", "y")).orderBy(col("r")).collect()
    assert(ct.map(_.toSeq).toSeq === Seq(Seq("a", 2L, 1L), Seq("b", 1L, 0L)))
  }

  test("unicode normalization: NFC composes, strip_accents drops marks only") {
    val decomposed = "école"  // e + combining acute
    val composed = "école"     // é precomposed
    val df = strings("s", Seq(
      Some(decomposed), Some(composed), Some("ﬁn æß"), // ﬁn æß
      Some("naïve"), Some(""), None))
    val out = df.select(
      Strings.nfcNormalize(col("s")).as("n"),
      Strings.stripAccents(col("s")).as("a")).collect()
    // NFC: both encodings land on the composed bytes; ﬁ (compat-only
    // decomposition) and æ/ß (none) are untouched
    assert(out.map(r => if (r.isNullAt(0)) null else r.getString(0)).toSeq ===
      Seq(composed, composed, "ﬁn æß", "naïve", "", null))
    // strip: marks removed whether precomposed or combining; æ/ß kept
    assert(out.map(r => if (r.isNullAt(1)) null else r.getString(1)).toSeq ===
      Seq("ecole", "ecole", "ﬁn æß", "naive", "", null))
    // SQL surface
    GraftFunctions.registerAll(spark)
    val sql = spark.sql(
      s"SELECT nfc_normalize('$decomposed') AS n, strip_accents('$decomposed') AS a").collect()(0)
    assert(sql.getString(0) === composed && sql.getString(1) === "ecole")
  }
}
