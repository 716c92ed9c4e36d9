package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Document chunking — split long documents into overlapping token
  * windows (context-window prep for training / retrieval corpora). The
  * sibling of [[Packing]]: packing concatenates SHORT docs up to a window,
  * chunking slices LONG docs down to one.
  *
  * Shape at scale: tokens are materialized once per document in a
  * projection (HOF lambdas re-evaluate captured expressions — see
  * [[TextAnalysis]]), chunk starts come from `sequence()`, and each chunk
  * is a `slice` + `array_join` — all codegen'd builtins, shuffle-free,
  * one row out per chunk via `posexplode`. Documents never shuffle; the
  * operator is a pure flat-map.
  */
object Chunking {

  /** Chunk each document's word tokens into windows of `size` tokens
    * advancing by `stride` (`stride < size` ⇒ overlap). Every document
    * emits at least one chunk (a short/empty doc yields its whole token
    * list as chunk 0). The last chunk may be shorter than `size`; a final
    * window that would start at-or-past the end is not emitted.
    *
    * Output: idCol, chunk_id (0-based LONG), chunk_text (tokens joined by
    * one space), n_tokens (LONG tokens in the chunk).
    */
  def chunkByTokens(df: DataFrame, idCol: String, textCol: String,
      size: Int, stride: Int,
      tokenize: Column => Column = TextAnalysis.wordTokens): DataFrame = {
    require(size > 0 && stride > 0, s"size/stride must be positive: $size/$stride")
    // `tokenize` plugs the token convention: word tokens by default,
    // Bpe.encode for context windows budgeted in real subword tokens
    val toks = df.select(col(idCol), tokenize(col(textCol)).as("__toks"))
      .withColumn("__n", org.apache.spark.sql.functions.size(col("__toks")))
    // last start = the largest multiple of stride strictly below n (so a
    // window never starts past the end); docs with n <= size get start 0
    val lastStart = when(col("__n") <= size, lit(0))
      // `/` on ints is DOUBLE division in Spark — truncate back to int
      // (operands are positive here, so trunc == floor)
      .otherwise(((col("__n") - 1) / stride).cast("int") * stride)
    val starts = sequence(lit(0), lastStart, lit(stride))
    toks
      .select(col(idCol), col("__toks"), col("__n"),
        posexplode(starts).as(Seq("chunk_id", "__start")))
      .select(
        col(idCol),
        col("chunk_id").cast("long").as("chunk_id"),
        array_join(slice(col("__toks"), col("__start") + 1, lit(size)), " ").as("chunk_text"),
        // pure arithmetic — evaluating the slice a second time would
        // allocate another size-element array per chunk on the hot path
        // (every start is < n, so the clamp is just least(size, n - start))
        least(lit(size), col("__n") - col("__start")).cast("long").as("n_tokens"))
  }
}
