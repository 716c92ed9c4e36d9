package graft.expressions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Deterministic FULL-BYTE BPE (GPT-2-style byte-level alphabet): every
  * one of the 256 byte values is a base symbol, rendered through the
  * published byte-to-printable mapping so merge tables and token strings
  * stay printable, quotable SQL literals. Digits, punctuation, whitespace
  * structure, and non-Latin scripts (every UTF-8 byte) are all priced —
  * the property the reference's byte-offset string layout
  * (`src/structs/variants/string.rs:106-115`) makes the ground truth.
  *
  * PRE-TOKENIZATION is a total partition of the byte stream into maximal
  * single-class runs — ASCII letters, ASCII digits, ASCII whitespace
  * ([ \t\n\f\r]), and everything else (all remaining bytes, including the
  * whole >= 0x80 range, so multibyte UTF-8 characters never split across
  * pre-tokens: their bytes share one class). Merges apply only WITHIN a
  * pre-token (the GPT-2 boundary rule), and the four classes are disjoint,
  * so the equivalent RE2 alternation
  * `[A-Za-z]+|[0-9]+|[ \t\n\f\r]+|[^A-Za-z0-9 \t\n\f\r]+` replays the
  * split unambiguously on any regex engine — the oracle's formulation.
  *
  * ENCODE semantics are defined to be SQL-replayable: merges apply in
  * RANK ORDER, each rank exhaustively left-to-right non-overlapping (a
  * single forward scan — provably equal to the left-fold formulation the
  * DuckDB oracle uses, since a merged token `a+b` can never equal its own
  * left side `a`). This is also exactly how training applied them, so
  * encode ∘ train is consistent.
  */
object BpeKernels {

  /** The GPT-2 byte-to-printable mapping: bytes that are printable in
    * latin-1 ('!'..'~', '¡'..'¬', '®'..'ÿ') map to their own code point;
    * the remaining 68 (controls, space, DEL, 0x80-0xA0, 0xAD) map to
    * U+0100 + n in increasing byte order. Injective, all single-char,
    * no quote/backslash/control output for the remapped set — which is
    * what keeps the merge artifact TSV-safe and SQL-quotable.
    */
  val ByteSym: Array[String] = {
    val keep = ((33 to 126) ++ (161 to 172) ++ (174 to 255)).toSet
    val out = new Array[String](256)
    var n = 0
    var b = 0
    while (b < 256) {
      if (keep(b)) out(b) = String.valueOf(b.toChar)
      else { out(b) = String.valueOf((256 + n).toChar); n += 1 }
      b += 1
    }
    out
  }

  // byte-class codes for the pre-tokenizer
  private def byteClass(c: Byte): Int = {
    if ((c >= 'a' && c <= 'z') || (c >= 'A' && c <= 'Z')) 0      // letter
    else if (c >= '0' && c <= '9') 1                             // digit
    else if (c == ' ' || c == '\t' || c == '\n' || c == '\f' || c == '\r') 2 // ws
    else 3                                                       // other
  }

  /** Maximal same-class byte runs — a TOTAL partition (spans concatenate
    * back to the input).
    */
  def preTokenSpans(b: Array[Byte]): java.util.ArrayList[(Int, Int)] = {
    val spans = new java.util.ArrayList[(Int, Int)]()
    var i = 0
    while (i < b.length) {
      val cls = byteClass(b(i))
      var j = i + 1
      while (j < b.length && byteClass(b(j)) == cls) j += 1
      spans.add((i, j))
      i = j
    }
    spans
  }

  /** Mapped base symbols of one span, one per byte. */
  def byteSymbols(b: Array[Byte], s: Int, e: Int): java.util.ArrayList[String] = {
    val syms = new java.util.ArrayList[String](e - s)
    var i = s
    while (i < e) { syms.add(ByteSym(b(i) & 0xff)); i += 1 }
    syms
  }

  /** Apply the merge table to one pre-token's symbol list (rank order,
    * leftmost non-overlapping per rank). Mutates and returns.
    */
  def encodeSyms(syms0: java.util.ArrayList[String],
      merges: Array[Array[String]]): java.util.ArrayList[String] = {
    var syms = syms0
    var r = 0
    while (r < merges.length && syms.size > 1) {
      val a = merges(r)(0)
      val b = merges(r)(1)
      var j = 0
      var changed = false
      // cheap pre-scan: most ranks don't occur in most pre-tokens
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

  /** Subword tokens of the whole text: pre-tokenize, encode each
    * pre-token, concatenate in order. One byte pass + per-token merge
    * scans. Token strings are in MAPPED (printable) space.
    */
  def bpeTokens(s: UTF8String, merges: Array[Array[String]]): ArrayData = {
    val b = s.getBytes
    val spans = preTokenSpans(b)
    val out = new java.util.ArrayList[Any]()
    var i = 0
    while (i < spans.size()) {
      val (st, en) = spans.get(i)
      val syms = encodeSyms(byteSymbols(b, st, en), merges)
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
    val spans = preTokenSpans(b)
    var n = 0L
    var i = 0
    while (i < spans.size()) {
      val (st, en) = spans.get(i)
      n += encodeSyms(byteSymbols(b, st, en), merges).size
      i += 1
    }
    n
  }

  /** Raw pre-token substrings, in order (the training/oracle word stream).
    * Zero-copy per span: each is a byte-range view of the input.
    */
  def preTokens(s: UTF8String): ArrayData = {
    val b = s.getBytes
    val spans = preTokenSpans(b)
    val out = new Array[Any](spans.size())
    var i = 0
    while (i < spans.size()) {
      val (st, en) = spans.get(i)
      out(i) = UTF8String.fromBytes(b, st, en - st)
      i += 1
    }
    new GenericArrayData(out)
  }

  /** Mapped base-symbol list of an entire string (one symbol per byte) —
    * the initial state of the training fold, where the merge table is
    * still growing and encode must run declaratively.
    */
  def byteSymbolsAll(s: UTF8String): ArrayData = {
    val b = s.getBytes
    val out = new Array[Any](b.length)
    var i = 0
    while (i < b.length) { out(i) = UTF8String.fromString(ByteSym(b(i) & 0xff)); i += 1 }
    new GenericArrayData(out)
  }

  /** Inverse of [[ByteSym]]: mapped code point → original byte. Total on
    * the mapped alphabet (ByteSym is injective over 256 inputs whose
    * images all fit in one char).
    */
  private val SymByte: Array[Int] = {
    val out = Array.fill(maxSymCodePoint + 1)(-1)
    var b = 0
    while (b < 256) { out(ByteSym(b).charAt(0).toInt) = b; b += 1 }
    out
  }
  private def maxSymCodePoint: Int = {
    var m = 0
    var b = 0
    while (b < 256) { m = math.max(m, ByteSym(b).charAt(0).toInt); b += 1 }
    m
  }

  /** DECODE (detokenization): concatenate the token strings and map each
    * mapped-space character back to its byte — the exact inverse of the
    * byte→printable rendering, so decode ∘ encode is the identity on any
    * input (KernelLaws proves it property-based). Characters outside the
    * mapped alphabet (a forged token) throw — silent corruption of a
    * training corpus is the one thing a detokenizer must never do.
    */
  def bpeDecode(tokens: ArrayData): UTF8String = {
    val sb = new java.io.ByteArrayOutputStream()
    var i = 0
    while (i < tokens.numElements()) {
      val u = tokens.getUTF8String(i)
      if (u == null) throw new IllegalArgumentException(
        s"null token at index $i is not decodable")
      val t = u.toString
      var j = 0
      while (j < t.length) {
        val cp = t.charAt(j).toInt
        val b = if (cp < SymByte.length) SymByte(cp) else -1
        if (b < 0) throw new IllegalArgumentException(
          s"not a mapped-alphabet symbol: '${t.charAt(j)}' (U+${cp.toHexString})")
        sb.write(b)
        j += 1
      }
      i += 1
    }
    UTF8String.fromBytes(sb.toByteArray)
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

/** STRING detokenization of an array<string> of mapped-space tokens. */
case class BpeDecode(child: Expression)
    extends UnaryExpression with Serializable {
  override def dataType: DataType = StringType
  override def prettyName: String = "bpe_decode"
  override protected def nullSafeEval(v: Any): Any =
    BpeKernels.bpeDecode(v.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, v => s"graft.expressions.BpeKernels.bpeDecode($v)")
  override protected def withNewChildInternal(c: Expression): BpeDecode = copy(child = c)
}

/** array<string> raw pre-tokens of `child` (total byte-run partition). */
case class BpePreTokens(child: Expression)
    extends UnaryExpression with Serializable {
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "bpe_pre_tokens"
  override protected def nullSafeEval(v: Any): Any =
    BpeKernels.preTokens(v.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, v => s"graft.expressions.BpeKernels.preTokens($v)")
  override protected def withNewChildInternal(c: Expression): BpePreTokens = copy(child = c)
}

/** array<string> mapped base symbols of `child`, one per UTF-8 byte. */
case class BpeByteSymbols(child: Expression)
    extends UnaryExpression with Serializable {
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "bpe_byte_symbols"
  override protected def nullSafeEval(v: Any): Any =
    BpeKernels.byteSymbolsAll(v.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, v => s"graft.expressions.BpeKernels.byteSymbolsAll($v)")
  override protected def withNewChildInternal(c: Expression): BpeByteSymbols = copy(child = c)
}
