package graft.expressions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Deterministic byte-level BPE over the library's `[a-z]+` token stream
  * (case-folded ASCII — byte == code point by construction, so byte-level
  * and char-level coincide). The merge table is a frozen, fixture-trained
  * artifact ([[graft.llm.Bpe]]); ENCODE semantics are defined to be
  * SQL-replayable: merges apply in RANK ORDER, each rank exhaustively
  * left-to-right non-overlapping (a single forward scan — provably equal
  * to the left-fold formulation the DuckDB oracle uses, since a merged
  * token `a+b` can never equal its own left side `a`). This is also
  * exactly how training applied them, so encode ∘ train is consistent.
  * Extends the reference's byte-level string surface
  * (`src/kernels/string.rs` tokenize-adjacent kernels) with the subword
  * vocabulary a token-budgeted pipeline prices in.
  */
object BpeKernels {

  /** Apply the merge table to one word (rank order, leftmost
    * non-overlapping per rank). Returns the subword symbol list.
    */
  def encodeWord(w: String, merges: Array[Array[String]]): java.util.ArrayList[String] = {
    var syms = new java.util.ArrayList[String](w.length)
    var i = 0
    while (i < w.length) { syms.add(String.valueOf(w.charAt(i))); i += 1 }
    var r = 0
    while (r < merges.length && syms.size > 1) {
      val a = merges(r)(0)
      val b = merges(r)(1)
      var j = 0
      var changed = false
      // cheap pre-scan: most ranks don't occur in most words
      while (j + 1 < syms.size && !changed) {
        changed = syms.get(j) == a && syms.get(j + 1) == b
        j += 1
      }
      if (changed) {
        val out = new java.util.ArrayList[String](syms.size)
        j = 0
        while (j < syms.size) {
          if (j + 1 < syms.size && syms.get(j) == a && syms.get(j + 1) == b) {
            out.add(a + b); j += 2
          } else { out.add(syms.get(j)); j += 1 }
        }
        syms = out
      }
      r += 1
    }
    syms
  }

  /** Subword tokens of the whole text: tokenize, encode each word,
    * concatenate in order. One byte pass + per-word merge scans.
    */
  def bpeTokens(s: UTF8String, merges: Array[Array[String]]): ArrayData = {
    val b = s.getBytes
    val spans = TextKernels.tokenSpans(b)
    val out = new java.util.ArrayList[Any]()
    var i = 0
    while (i < spans.size()) {
      val (st, en) = spans.get(i)
      val syms = encodeWord(TextKernels.lowerToken(b, st, en), merges)
      var j = 0
      while (j < syms.size) { out.add(UTF8String.fromString(syms.get(j))); j += 1 }
      i += 1
    }
    new GenericArrayData(out.toArray)
  }

  /** Total subword-token count of the text — the same pass, count only
    * (no token array materialized): the column every token-budgeted
    * operator (packing, chunking, mixing) prices in.
    */
  def bpeCount(s: UTF8String, merges: Array[Array[String]]): Long = {
    val b = s.getBytes
    val spans = TextKernels.tokenSpans(b)
    var n = 0L
    var i = 0
    while (i < spans.size()) {
      val (st, en) = spans.get(i)
      n += encodeWord(TextKernels.lowerToken(b, st, en), merges).size
      i += 1
    }
    n
  }
}

/** array<string> subword tokens of `child` under the frozen merge table. */
case class BpeEncode(child: Expression, merges: Seq[(String, String)])
    extends UnaryExpression with Serializable {
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "bpe_encode"
  @transient private lazy val table: Array[Array[String]] =
    merges.map(m => Array(m._1, m._2)).toArray
  override protected def nullSafeEval(v: Any): Any =
    BpeKernels.bpeTokens(v.asInstanceOf[UTF8String], table)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("bpeMerges", table, "java.lang.String[][]")
    defineCodeGen(ctx, ev, v => s"graft.expressions.BpeKernels.bpeTokens($v, $ref)")
  }
  override protected def withNewChildInternal(c: Expression): BpeEncode = copy(child = c)
}

/** LONG subword-token count of `child` under the frozen merge table. */
case class BpeCount(child: Expression, merges: Seq[(String, String)])
    extends UnaryExpression with Serializable {
  override def dataType: DataType = LongType
  override def prettyName: String = "bpe_count"
  @transient private lazy val table: Array[Array[String]] =
    merges.map(m => Array(m._1, m._2)).toArray
  override protected def nullSafeEval(v: Any): Any =
    BpeKernels.bpeCount(v.asInstanceOf[UTF8String], table)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("bpeMerges", table, "java.lang.String[][]")
    defineCodeGen(ctx, ev, v => s"graft.expressions.BpeKernels.bpeCount($v, $ref)")
  }
  override protected def withNewChildInternal(c: Expression): BpeCount = copy(child = c)
}
