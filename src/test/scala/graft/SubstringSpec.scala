package graft

import graft.llm.{Chunking, Substrings, TextAnalysis}
import org.apache.spark.sql.functions._

/** Exact-substring dedup at arbitrary alignment (q155's operator): span
  * semantics, the chunk-boundary blind spot it exists to close, and
  * kernel-vs-declarative fingerprint equivalence.
  */
class SubstringSpec extends SparkSpec {
  import spark.implicits._

  // letter-only distinct words: the [A-Za-z]+ tokenizer treats digits as
  // separators, so a digit suffix would collapse every filler word to the
  // same token
  private def words(prefix: String, n: Int): String =
    (0 until n).map(i =>
      s"$prefix${('a' + i % 26).toChar}${('a' + i / 26).toChar}").mkString(" ")

  test("finds a cross-document span at arbitrary alignment, maximal extent") {
    // doc 0 carries a 20-token quote at offset 7; doc 1 the same quote at
    // offset 3 — different alignments, unique filler elsewhere
    val quote = words("quote", 20)
    val df = Seq(
      (0L, words("azero", 7) + " " + quote + " " + words("bzero", 9)),
      (1L, words("aone", 3) + " " + quote + " " + words("bone", 5))
    ).toDF("doc_id", "text")
    val spans = Substrings.duplicateSpans(df, "doc_id", "text", k = 8)
      .orderBy(col("doc_id")).collect()
    assert(spans.length === 2)
    // maximal: exactly the 20 quote tokens, in each doc's own coordinates
    assert(spans(0).getLong(1) === 7L && spans(0).getLong(2) === 26L)
    assert(spans(1).getLong(1) === 3L && spans(1).getLong(2) === 22L)
    assert(spans.forall(_.getLong(3) == 20L))
  }

  test("span crossing a chunk boundary: invisible to chunk-grain dedup, found here") {
    // q105's chunk dedup fingerprints windows of 24 tokens at stride 16.
    // Place a 16-token duplicate run so it STRADDLES the first stride
    // boundary (tokens 8..23 — parts of two different chunks in doc 0,
    // differently aligned in doc 1): every chunk text then differs
    // between the docs, so chunk-fingerprint dedup sees nothing, while
    // the k-gram span machinery recovers the exact run.
    val run = words("dup", 16)
    val a = words("fillera", 8) + " " + run + " " + words("taila", 24)
    val b = words("fillerb", 2) + " " + run + " " + words("tailb", 30)
    val df = Seq((0L, a), (1L, b)).toDF("doc_id", "text")

    val chunks = Chunking.chunkByTokens(df, "doc_id", "text", size = 24, stride = 16)
      .withColumn("fp", md5(col("chunk_text").cast("binary")))
    // chunk-grain: no fingerprint shared across the two docs
    val shared = chunks.groupBy(col("fp"))
      .agg(countDistinct(col("doc_id")).as("nd")).filter(col("nd") > 1).count()
    assert(shared === 0L, "chunk-grain dedup should be blind to this span")

    val spans = Substrings.duplicateSpans(df, "doc_id", "text", k = 8)
      .orderBy(col("doc_id")).collect()
    assert(spans.length === 2)
    assert(spans(0).getLong(1) === 8L && spans(0).getLong(2) === 23L)
    assert(spans(1).getLong(1) === 2L && spans(1).getLong(2) === 17L)
    assert(spans.forall(_.getLong(3) == 16L))
  }

  test("within-document repetition alone is NOT a cross-document span") {
    val rep = words("echo", 10)
    val df = Seq(
      (0L, rep + " " + words("mid", 5) + " " + rep), // repeats only internally
      (1L, words("other", 30))
    ).toDF("doc_id", "text")
    assert(Substrings.duplicateSpans(df, "doc_id", "text", k = 8).count() === 0L)
  }

  test("disjoint duplicate runs yield separate spans; minSpan filters short ones") {
    val r1 = words("alpha", 12)
    val r2 = words("beta", 9)
    val df = Seq(
      (0L, r1 + " " + words("gapzero", 10) + " " + r2),
      (1L, r2 + " " + words("gapone", 14) + " " + r1)
    ).toDF("doc_id", "text")
    val spans = Substrings.duplicateSpans(df, "doc_id", "text", k = 8)
      .orderBy(col("doc_id"), col("span_start")).collect()
    assert(spans.length === 4)
    assert(spans.map(_.getLong(3)).sorted.toSeq === Seq(9L, 9L, 12L, 12L))
    val long = Substrings.duplicateSpans(df, "doc_id", "text", k = 8, minSpan = 10)
    assert(long.count() === 2L)
    assert(long.collect().forall(_.getLong(3) == 12L))
  }

  test("docs shorter than k, empty and null text emit no grams") {
    val df = Seq((0L, "only three words"), (1L, ""), (2L, null.asInstanceOf[String]),
      (3L, words("x", 20))).toDF("doc_id", "text")
    assert(Substrings.gramFingerprints(df, "doc_id", "text", 8)
      .groupBy(col("id")).count().collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      === Map(3L -> 13L))
  }

  test("removeDuplicateSpans: owner keeps its copy, others lose exactly the span") {
    val quote = words("quote", 20)
    val head1 = words("aone", 3)
    val tail1 = words("bone", 5)
    val df = Seq(
      (0L, words("azero", 7) + " " + quote + " " + words("bzero", 9)),
      (1L, head1 + " " + quote + " " + tail1)
    ).toDF("doc_id", "text")
    val out = Substrings.removeDuplicateSpans(df, "doc_id", "text", k = 8)
      .orderBy(col("doc_id")).collect()
    // doc 0 is the owner (min doc_id) — untouched
    assert(out(0).getLong(3) === 0L)
    assert(out(0).getString(1).split(" ").length === 36)
    // doc 1 loses exactly the 20 quote tokens, filler survives in order
    assert(out(1).getLong(2) === 8L && out(1).getLong(3) === 20L)
    assert(out(1).getString(1) === head1 + " " + tail1)
  }

  test("removeDuplicateSpans: a verbatim-subset doc empties; within-doc repeats survive") {
    val run = words("copy", 12)
    val rep = words("echo", 9)
    val df = Seq(
      (0L, words("ctx", 4) + " " + run + " " + words("more", 6)),
      (1L, run),                                    // pure subset of doc 0's text
      (2L, rep + " " + words("mid", 3) + " " + rep) // repeats only internally
    ).toDF("doc_id", "text")
    val out = Substrings.removeDuplicateSpans(df, "doc_id", "text", k = 8)
      .orderBy(col("doc_id")).collect()
    assert(out(0).getLong(3) === 0L)                 // owner untouched
    assert(out(1).getString(1) === "" && out(1).getLong(2) === 0L
      && out(1).getLong(3) === 12L)                  // fully deduplicated
    assert(out(2).getLong(3) === 0L)                 // within-doc only: kept
  }

  test("removeDuplicateSpans keeps every input doc, including null/empty text") {
    val df = Seq((0L, words("x", 20)), (1L, ""), (2L, null.asInstanceOf[String]))
      .toDF("doc_id", "text")
    val out = Substrings.removeDuplicateSpans(df, "doc_id", "text", k = 8)
      .orderBy(col("doc_id")).collect()
    assert(out.length === 3)
    assert(out.forall(_.getLong(3) == 0L))
    assert(out(1).getString(1) === "" && out(2).getString(1) === "")
  }

  test("in-kernel FNV fingerprints decide dups exactly like gram strings") {
    // the declarative twin: gram string via HOFs + md5 — the oracle's
    // formulation — must produce the same span set as the fused kernel
    val docs = Tables.documents(spark, "/root/testdata/sf0.001")
    val k = 8
    val toks = docs.select(col("doc_id").as("id"),
      TextAnalysis.wordTokens(col("text")).as("ws"))
    val grams = toks.filter(size(col("ws")) >= k)
      .select(col("id"), posexplode(transform(
        sequence(lit(0), size(col("ws")) - k),
        i => md5(array_join(slice(col("ws"), i + 1, lit(k)), " ").cast("binary"))))
        .as(Seq("pos", "fp")))
    val dupFps = grams.groupBy(col("fp"))
      .agg(min(col("id")).as("mn"), max(col("id")).as("mx"))
      .filter(col("mn") =!= col("mx")).select(col("fp"))
    val declPos = grams.join(dupFps, Seq("fp"), "left_semi")
      .select(col("id"), col("pos").cast("long").as("pos"))
    val kernelPos = Substrings.gramFingerprints(docs, "doc_id", "text", k)
      .groupBy(col("fp")).agg(min(col("id")).as("mn"), max(col("id")).as("mx"),
        collect_list(struct(col("id"), col("pos"))).as("ps"))
      .filter(col("mn") =!= col("mx"))
      .select(explode(col("ps")).as("p"))
      .select(col("p.id").as("id"), col("p.pos").cast("long").as("pos"))
    assert(declPos.exceptAll(kernelPos).count() === 0L)
    assert(kernelPos.exceptAll(declPos).count() === 0L)
  }
}
