package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.ColumnBridge.{column => toCol, expression => toExpr}

/** Deterministic FULL-BYTE BPE tokenizer (frozen, fixture-trained merge
  * table): makes every token-denominated operator (packing, chunking,
  * mixing, DSIR) price in real subword tokens instead of whole-word
  * proxies. The base alphabet is the GPT-2-style 256-byte set (every
  * UTF-8 byte is a base symbol, rendered through the printable
  * byte-to-unicode mapping — [[graft.expressions.BpeKernels.ByteSym]]),
  * and text splits on a total letter/digit/whitespace/other byte-run
  * pre-tokenizer — so digits, punctuation, whitespace structure, and
  * non-Latin scripts all carry token mass, the property multilingual
  * mixture corpora (mC4/XLM-R family, q149/q161) require.
  *
  * DETERMINISM is the design axis, not tokenization quality: training
  * picks the globally most frequent adjacent symbol pair each round with
  * a total tie order (count desc, then lexicographic pair), and encode
  * applies merges in rank order, each exhaustively leftmost — so the
  * frozen artifact is byte-reproducible from the fixture (SubwordSpec
  * retrains and compares) and the DuckDB oracle can replay encode as a
  * recursive fold over the literal merge table, with the byte→symbol
  * mapping replayed from `hex(encode(w))` against a 256-entry literal.
  *
  * Shape at scale: training runs on the (pre-token, count) VOCABULARY
  * table — Heaps-law-bounded, not corpus-sized — one pair-count shuffle
  * per merge, argmax-only (one row) to the driver per round; documents
  * never shuffle. Encoding is a fused per-row kernel
  * ([[graft.expressions.BpeKernels]]) carrying the merge table as a
  * codegen reference object, exactly the IVF codebook pattern.
  */
object Bpe {

  /** The checked-in merge table (trained on the sf0.001 documents fixture
    * by [[graft.tools.GenBpe]]; regenerate with that main and diff —
    * SubwordSpec asserts reproducibility). Symbols are in MAPPED
    * (printable) space, so the TSV is line/tab-safe by construction.
    */
  lazy val frozenMerges: Seq[(String, String)] = {
    val in = getClass.getResourceAsStream("/graft/bpe_merges.tsv")
    require(in != null, "bpe_merges.tsv resource missing")
    try scala.io.Source.fromInputStream(in, "UTF-8").getLines()
      .filter(_.nonEmpty).map { l =>
        val t = l.split('\t')
        require(t.length == 2, s"bad merge line: $l")
        (t(0), t(1))
      }.toList
    finally in.close()
  }

  /** First-occurrence-deduplicated vocabulary: the 256 base byte symbols
    * (id = byte value), then each merge's concatenation. Token id = index
    * in this list — a pure string lookup, so ids are oracle-replayable
    * even if two merge paths ever minted the same string.
    */
  def vocab(merges: Seq[(String, String)] = frozenMerges): Seq[String] = {
    val out = scala.collection.mutable.LinkedHashSet.empty[String]
    graft.expressions.BpeKernels.ByteSym.foreach(out += _)
    merges.foreach { case (a, b) => out += (a + b) }
    out.toList
  }

  /** The raw pre-token stream (total letter/digit/whitespace/other
    * byte-run partition; concatenates back to the text).
    */
  def preTokens(text: Column): Column =
    toCol(graft.expressions.BpePreTokens(toExpr(text.cast("string"))))

  /** array<string> subword tokens of `text` (all pre-tokens, in order;
    * token strings are in mapped printable space).
    */
  def encode(text: Column, merges: Seq[(String, String)] = frozenMerges): Column =
    toCol(graft.expressions.BpeEncode(toExpr(text.cast("string")), merges))

  /** LONG subword-token count of `text` — the budget column. */
  def countTokens(text: Column, merges: Seq[(String, String)] = frozenMerges): Column =
    toCol(graft.expressions.BpeCount(toExpr(text.cast("string")), merges))

  /** STRING detokenization: concatenate a token array and invert the
    * byte→printable map — decode ∘ encode is the identity on ANY input
    * (KernelLaws property + the q176 gate round trip); a token outside
    * the mapped alphabet throws rather than silently corrupting text.
    */
  def decode(tokens: Column): Column =
    toCol(graft.expressions.BpeDecode(toExpr(tokens)))

  /** array<int> token ids for an encoded token array (map-literal lookup,
    * O(1) per token; vocabulary is merge-table-sized, a true constant).
    */
  def tokenIds(tokens: Column, merges: Seq[(String, String)] = frozenMerges): Column = {
    val v = vocab(merges)
    val m = typedlit(v.zipWithIndex.toMap)
    transform(tokens, t => element_at(m, t))
  }

  /** Driver-side byte→printable mapping of a string (test/debug utility —
    * the exact image `encode` concatenates back to).
    */
  def mapToPrintable(s: String): String = {
    val b = s.getBytes("UTF-8")
    val sb = new java.lang.StringBuilder(b.length)
    b.foreach(x => sb.append(graft.expressions.BpeKernels.ByteSym(x & 0xff)))
    sb.toString
  }

  /** Leftmost non-overlapping single application of merge (a,b) to a
    * symbol array — the declarative twin of the kernel's per-rank scan
    * (used by training, where the table is still growing).
    */
  private def applyMerge(syms: Column, a: String, b: String): Column =
    aggregate(syms, array().cast("array<string>"),
      (acc, x) => when(size(acc) > 0 &&
          element_at(acc, -1) === lit(a) && x === lit(b),
        concat(slice(acc, lit(1), size(acc) - 1), array(lit(a + b))))
        .otherwise(concat(acc, array(x))))

  /** Train `numMerges` merges on the corpus' pre-token-frequency table.
    * Stops early when the best remaining pair occurs fewer than
    * `minPairCount` times. Deterministic: ties break on the
    * lexicographically smallest (a, b) in mapped-symbol space.
    */
  def trainMerges(df: DataFrame, textCol: String, numMerges: Int,
      minPairCount: Long = 2L): Seq[(String, String)] = {
    require(numMerges >= 0)
    val words = df
      .select(explode(preTokens(col(textCol))).as("w"))
      .groupBy(col("w")).agg(count(lit(1)).as("cnt"))
    // localCheckpoint each round: the symbol table is re-derived ~numMerges
    // times, and WITHOUT lineage truncation every round re-analyzes the
    // whole stack of aggregate-lambda projections — measured superlinear
    // analysis blowup by round 40. The checkpoint keeps each round's plan
    // one projection deep over a materialized vocabulary table (which is
    // Heaps-law bounded, never corpus-sized).
    var cur = words
      .select(toCol(graft.expressions.BpeByteSymbols(toExpr(col("w")))).as("syms"),
        col("cnt"))
      .localCheckpoint(true)
    val merges = scala.collection.mutable.ListBuffer.empty[(String, String)]
    var done = false
    var round = 0
    while (round < numMerges && !done) {
      val best = cur.filter(size(col("syms")) >= 2)
        .select(col("cnt"), explode(transform(
          sequence(lit(0), size(col("syms")) - 2),
          j => struct(element_at(col("syms"), j + 1).as("a"),
            element_at(col("syms"), j + 2).as("b")))).as("p"))
        .groupBy(col("p.a").as("a"), col("p.b").as("b"))
        .agg(sum(col("cnt")).as("c"))
        .orderBy(col("c").desc, col("a"), col("b"))
        .limit(1).collect()
      if (best.isEmpty || best(0).getLong(2) < minPairCount) done = true
      else {
        val a = best(0).getString(0)
        val b = best(0).getString(1)
        merges += ((a, b))
        cur = cur.select(applyMerge(col("syms"), a, b).as("syms"), col("cnt"))
          .localCheckpoint(true)
      }
      round += 1
    }
    merges.toList
  }
}
